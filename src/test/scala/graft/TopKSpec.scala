package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.TopKPerGroup

/** The custom TopKPerGroup Catalyst operator: agreement with the
  * window-function formulation, physical-plan shape (map-side partial →
  * exchange on the group key → final), and boundary semantics.
  */
class TopKSpec extends SparkSuite {

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= k)
  }

  private def viaTopK(k: Int) =
    TopKPerGroup(
      Tables.orders(spark, sf).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      Seq("o_custkey"), Seq("o_totalprice" -> true, "o_orderkey" -> false), k)

  test("matches the window formulation exactly (k=3)") {
    val a = viaTopK(3).collect().map(_.toSeq).toSet
    val b = viaWindow(3).collect().map(_.toSeq).toSet
    assert(a == b, s"topk=${a.size} window=${b.size} diff=${(a diff b).take(3)}")
  }

  test("k larger than every group returns all rows ranked") {
    val n = Tables.orders(spark, sf).count()
    assert(viaTopK(1000000).count() == n)
  }

  test("k=1 returns one row per group — the argmax pattern") {
    val groups = Tables.orders(spark, sf).select(col("o_custkey")).distinct().count()
    val top1 = viaTopK(1)
    assert(top1.count() == groups)
    assert(top1.filter(col("rn") =!= 1).count() == 0)
  }

  test("physical plan is partial -> exchange on group key -> final") {
    val df = viaTopK(3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroupPartial"), p.take(2000))
    assert(p.contains("TopKPerGroupFinal"), p.take(2000))
    assert(p.contains("hashpartitioning(o_custkey"), p.take(2000))
    // the partial must sit BELOW the exchange (map-side pruning)
    val lines = p.linesIterator.toSeq
    val iFinal = lines.indexWhere(_.contains("TopKPerGroupFinal"))
    val iEx = lines.indexWhere(_.contains("Exchange hashpartitioning"), iFinal)
    val iPartial = lines.indexWhere(_.contains("TopKPerGroupPartial"), iEx)
    assert(iFinal >= 0 && iEx > iFinal && iPartial > iEx, p.take(3000))
  }

  test("partial prunes the shuffle: exchange input is at most k rows per (group, partition)") {
    // 15k orders, 1k customers, k=2: the window plan shuffles all 15k
    // rows; the custom plan's exchange sees ≤ k·groups·inputPartitions.
    val base = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val inParts = base.rdd.getNumPartitions
    val groups = base.select(col("o_custkey")).distinct().count()
    val total = base.count()
    val cap = 2L * groups * inParts
    assert(cap < total, s"fixture too small to demonstrate pruning: cap=$cap total=$total")
    val df = TopKPerGroup(base, Seq("o_custkey"), Seq("o_totalprice" -> true, "o_orderkey" -> false), 2)
    assert(df.count() <= cap)
  }

  test("optimizer rule rewrites the window+filter idiom into TopKPerGroup") {
    TopKPerGroup.register(spark)
    val df = viaWindow(3) // plain row_number window + rn <= 3 filter
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroupPartial") && p.contains("TopKPerGroupFinal"), p.take(3000))
    assert(!p.contains("Window "), s"window exec survived the rewrite: ${p.take(3000)}")
  }

  test("rewritten idiom returns the same rows as the un-rewritten window") {
    TopKPerGroup.register(spark)
    val rewritten = viaWindow(3).collect().map(_.toSeq).toSet
    // suppress the rewrite by filtering on a non-literal bound Spark
    // can't recognize — semantically still rn <= 3
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val control = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= lit(2) + lit(1))
      .collect().map(_.toSeq).toSet
    assert(rewritten == control)
  }

  test("rewrite keeps residual conjuncts and equality bounds") {
    TopKPerGroup.register(spark)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 2 && col("o_totalprice") > 1000)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroupFinal"), p.take(3000))
    // every surviving row is exactly the 2nd-ranked order of its customer
    assert(df.filter(col("rn") =!= 2).count() == 0)
    val expected = viaWindow(2).filter(col("rn") === 2 && col("o_totalprice") > 1000)
      .withColumn("rn", col("rn").cast("int")).collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == expected)
  }

  test("rank()-based filters are NOT rewritten (ties admit more than k rows)") {
    TopKPerGroup.register(spark)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
    val df = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), rank().over(w).as("rnk"))
      .filter(col("rnk") <= 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("TopKPerGroup"), p.take(3000))
  }

  test("randomized agreement with the window formulation (ties, nulls, varied k)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // seeded: deterministic cases
    for (round <- 1 to 8) {
      val n = 50 + rnd.nextInt(400)
      val nGroups = 1 + rnd.nextInt(12)
      val k = 1 + rnd.nextInt(6)
      // values drawn from a tiny domain so ties are common; ~10% null
      val rows = (0 until n).map { i =>
        val v: Option[Int] = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(7))
        (i.toLong, s"g${rnd.nextInt(nGroups)}", v)
      }
      val df = rows.toDF("id", "g", "v")
      val viaOp = TopKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), k)
        .select(col("g"), col("id"), col("rn"))
        .collect().map(_.toSeq).toSet
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      val viaWin = df
        .select(col("g"), col("id"), row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= k)
        .collect().map(_.toSeq).toSet
      assert(viaOp == viaWin, s"round=$round n=$n groups=$nGroups k=$k diff=${(viaOp diff viaWin).take(3)}")
    }
  }

  test("partial flush under a tiny group cap stays correct (pruning degrades, results don't)") {
    val key = "spark.graft.topk.maxGroupsPerPartition"
    spark.conf.set(key, "3") // orders has 1000 customers: constant flushing
    try {
      val a = viaTopK(3).collect().map(_.toSeq).toSet
      val b = viaWindow(3).collect().map(_.toSeq).toSet
      assert(a == b)
    } finally spark.conf.unset(key)
  }

  test("GraftExtensions injects the strategy and the rewrite rule") {
    import org.apache.spark.sql.graftx.ExtensionsProbe
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(ExtensionsProbe.strategies(ext, spark).contains(org.apache.spark.sql.graftx.TopKPerGroupStrategy))
    assert(ExtensionsProbe.rules(ext, spark).contains(org.apache.spark.sql.graftx.WindowTopKRewrite))
  }

  test("SQL metrics report pruning output and flush count") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = viaTopK(3)
    df.collect()
    // AQE hides operators inside query stages; descend through them
    def collectAll(p: SparkPlan): Seq[org.apache.spark.sql.graftx.TopKPerGroupExec] =
      p.collect { case e: org.apache.spark.sql.graftx.TopKPerGroupExec => e } ++
        p.collect { case s: QueryStageExec => s }.flatMap(s => collectAll(s.plan))
    val execs = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case p                        => collectAll(p)
    }
    assert(execs.size == 2, df.queryExecution.executedPlan.toString.take(2000))
    val fin = execs.find(!_.partial).get
    assert(fin.metrics("numOutputRows").value == df.count())
    // default cap (128k) with 1000 groups: the safety valve must NOT fire
    assert(execs.find(_.partial).get.metrics("numFlushes").value == 0)
  }

  test("native expressions are callable from SQL once registered") {
    org.apache.spark.sql.graftx.GraftFunctions.registerFunctions(spark)
    val r = spark.sql(
      "SELECT float_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d, " +
        "sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS c"
    ).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(1) == 2)
  }

  test("register is idempotent") {
    TopKPerGroup.register(spark)
    TopKPerGroup.register(spark)
    val n = spark.experimental.extraStrategies
      .count(_ == org.apache.spark.sql.graftx.TopKPerGroupStrategy)
    assert(n == 1, s"strategy registered $n times")
  }
}
