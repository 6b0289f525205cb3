package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful Structured Streaming beyond windowed aggregation:
  * exactly-once ingest dedup (`dropDuplicates` + watermark) and a
  * custom per-key state machine (`flatMapGroupsWithState`). Verified in
  * StatefulSpec against batch ground truth.
  *
  * 100 TB notes: both operators keep state partitioned by key across
  * executors in the state store; the watermark bounds dedup state (an
  * event id older than the watermark can no longer collide, so its
  * entry is evicted) and the state machine emits incrementally instead
  * of holding history — the pattern for unbounded per-user streams.
  */
object StatefulDemos {

  /** Ingest-dedup: drop re-delivered events by event_id within the
    * watermark horizon — the streaming twin of exact dedup, i.e.
    * at-least-once delivery → exactly-once processing. */
  def dedupEvents(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "2 hours")
      .dropDuplicates("event_id")

  /** Per-user running counter + max-value tracker via an explicit
    * state machine: emits one row per incoming batch-group with the
    * updated totals. */
  case class UserAgg(user_id: Long, n_events: Long, max_value: Double)

  def userTotals(spark: SparkSession, events: DataFrame): Dataset[UserAgg] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(user, 0L, Double.MinValue))
          var n = prev.n_events
          var mx = prev.max_value
          rows.foreach { case (_, v) =>
            n += 1
            if (v > mx) mx = v
          }
          val next = UserAgg(user, n, mx)
          state.update(next)
          Iterator(next)
      }
  }
}
