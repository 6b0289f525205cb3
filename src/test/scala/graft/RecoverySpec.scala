package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming fault-tolerance semantics: a checkpointed query stopped
  * and restarted resumes from its offsets (no reprocessing, no loss),
  * and foreachBatch gives transactional-batch custom sinks.
  */
class RecoverySpec extends SparkSuite {

  test("checkpointed file-sink query resumes exactly-once across restarts") {
    val root = Files.createTempDirectory("graft_ckpt").toString
    val in = s"$root/in"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    val ev = Tables
      .events(spark, sf)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"), col("value"))
    val half = ev.count() / 2
    ev.filter(col("event_id") <= half).coalesce(1).write.mode("overwrite").parquet(in)

    def start() = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

    val q1 = start()
    q1.awaitTermination()
    // restart with MORE input: only the new file may be processed
    ev.filter(col("event_id") > half).coalesce(1).write.mode("append").parquet(in)
    val q2 = start()
    q2.awaitTermination()

    val result = spark.read.parquet(out)
    assert(result.count() == ev.count(), "restart lost or replayed rows")
    assert(result.select(col("event_id")).distinct().count() == ev.count(), "duplicates after restart")
  }

  test("foreachBatch sink sees each micro-batch exactly once with its id") {
    val root = Files.createTempDirectory("graft_feb").toString
    val in = s"$root/in"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"))
    ev.coalesce(2).write.mode("overwrite").parquet(in)
    val seen = scala.collection.concurrent.TrieMap[Long, Long]()
    val q = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // the (batchId → rowCount) ledger a transactional sink would keep
        seen.put(id, batch.count())
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(seen.keySet == seen.keySet.min.to(seen.keySet.max).toSet, "batch ids not contiguous")
    assert(seen.values.sum == ev.count(), s"foreachBatch saw ${seen.values.sum} rows")
  }

  test("iterative dedup_clusters survives on reliable checkpoints when a ckpt dir is set") {
    // Local-path result first — valid only while NO checkpoint dir is
    // configured, so guard the premise against suite-ordering drift.
    assert(
      spark.sparkContext.getCheckpointDir.isEmpty,
      "another suite set a checkpoint dir before this test; the local-path premise is void"
    )
    val local = operators.Dedup.dedupClusters.run(spark, sf).collect().toSet

    // Flip the session to reliable checkpointing — on a real cluster
    // this would be an HDFS/object-store path, making mid-iteration
    // executor loss recoverable instead of fatal. NOTE: this flips the
    // JVM-wide shared session permanently (there is no unsetCheckpointDir),
    // so every later suite runs Dedup.truncate on the reliable path —
    // acceptable here because that path is semantically identical and
    // this is exactly the cross-suite exposure this test wants.
    val ckptDir = Files.createTempDirectory("graft_reliable_ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    val reliable = operators.Dedup.dedupClusters.run(spark, sf).collect().toSet

    assert(reliable == local, "reliable-checkpoint path changed the clustering result")
    val written = new java.io.File(ckptDir).listFiles()
    assert(written != null && written.nonEmpty, "reliable path wrote nothing to the checkpoint dir")
  }
}
