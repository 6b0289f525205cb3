package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._

/** Exactly-once under TASK RETRY — the failure mode the DSv2 commit
  * protocol exists for: a write task that fails after buffering rows
  * is retried, and the sink must keep exactly the committed attempt's
  * rows (the aborted attempt's buffer is discarded, never merged).
  * The session runs with 2 task attempts (`local[4, 2]`, mirroring
  * cluster retry defaults) and the test injects a deterministic
  * first-attempt failure into one partition of the write job.
  */
class SinkRetrySpec extends SparkSuite {

  test("DSv2 sink keeps exactly one copy of every row when a write task retries") {
    import spark.implicits._
    val n = 1000L
    val df = spark
      .range(0, n, 1, 8)
      .as[Long]
      .mapPartitions { it =>
        val tc = TaskContext.get()
        // first attempt of partition 3 dies AFTER producing rows — the
        // sink sees a partially-buffered writer that must be aborted
        if (tc.partitionId() == 3 && tc.attemptNumber() == 0) {
          val burned = it.take(10).toArray // consume some input first
          if (burned.length >= 0) throw new RuntimeException("injected task failure")
        }
        it
      }
      .toDF("id")
    df.write
      .format("graft.sources.MemoryTableSink")
      .option("name", "retry_rt")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .save()
    val back = spark.read
      .format("graft.sources.MemoryTableSink")
      .option("name", "retry_rt")
      .load()
    assert(back.count() == n, s"expected $n rows after retried write, got ${back.count()}")
    assert(back.select(col("id")).distinct().count() == n, "duplicate rows from an aborted attempt")
  }
}
