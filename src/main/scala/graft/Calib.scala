package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only window-quality probe (not part of the driver contract):
  * runs [[Bench]]'s fixed 200M-row xxhash64 calibration N times and
  * prints each reading, so a measurement session can gate its A/Bs on
  * the same quiet-window criterion the bench artifacts use
  * (quiet baseline calib ~0.234 at 32 cores; see
  * plans/r21/bench_detail_baseline.json and the round notes).
  *
  * Usage: `runMain graft.Calib [n]` (env `SPARK_GRAFT_CPUS` as in Bench).
  */
object Calib {
  def main(args: Array[String]): Unit = {
    val n    = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one throwaway to absorb codegen/JIT of the probe plan itself
    spark.range(0L, 10000000L, 1L, cpus.toInt)
      .select(sum(shiftrightunsigned(xxhash64(col("id")), 40)).as("h")).head()
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      spark.range(0L, 200000000L, 1L, cpus.toInt)
        .select(sum(shiftrightunsigned(xxhash64(col("id")), 40)).as("h")).head()
      println(f"[calib] $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
