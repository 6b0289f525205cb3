package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for NAMED queries into one
  * file each — the per-round before/after plan evidence under
  * `plans/rNN/` (PlanDump owns the committed PLANS.md battery; this
  * tool exists so an optimization round can snapshot exactly the rows
  * it touches, at the bench's own scale and partitioning, without
  * regenerating the whole battery).
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.PlanFile plans/r21 _before q1 q2 ..."`
  */
object PlanFile {
  /** Non-registry frames worth plan evidence: internal stages whose
    * shape a spec pins but whose registry row hides them behind a
    * lineage truncate (the composed corpus builds read a LogicalRDD,
    * so only the STAGE plan shows the join shapes). */
  private val extra: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map(
      "bestkeep_flagpass" -> ((s, d) => operators.Sampling.corpusBuildFlagsBestKeep(s, d)),
      "corpus_flagpass"   -> ((s, d) => operators.Sampling.corpusBuildFlags(s, d))
    )

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans")
    val suffix = args.lift(1).getOrElse("_before")
    val names  = args.drop(2).toSeq
    val sfDir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val unknown = names.filterNot(n => Registry.byName.contains(n) || extra.contains(n))
    if (unknown.nonEmpty) {
      System.err.println(s"[planfile] unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val df = extra.get(name) match {
        case Some(f) => f(spark, sfDir)
        case None    => Registry.byName(name).run(spark, sfDir)
      }
      val plan = df.queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
        // same binary-literal truncation as PlanDump
        .replaceAll("(0x[0-9A-Fa-f]{16})[0-9A-Fa-f]{48,}", "$1<binary literal, truncated>")
      val p = java.nio.file.Paths.get(outDir, s"$name$suffix.txt")
      java.nio.file.Files.writeString(p, plan)
      println(s"[planfile] wrote $p")
    }
    spark.stop()
  }
}
