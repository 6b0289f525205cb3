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

  /** Per-user streaming EWMA — the incremental form of `ts_ewma`'s
    * batch fold. State carries (n, acc): each micro-batch's rows are
    * sorted (ts, event_id) within the group and folded from the
    * carried acc, so on a time-ordered source the final state equals
    * the batch left-fold exactly (StatefulSpec asserts bit-equality).
    * This is the 100 TB form of the operator: two numbers of state per
    * user — O(users), never O(events) — where the batch formulation
    * collects each user's full history. */
  case class EwmaAgg(user_id: Long, n: Long, ewma: Double)

  def userEwma(spark: SparkSession, events: DataFrame): Dataset[EwmaAgg] = {
    import spark.implicits._
    events
      .filter(col("value").isNotNull)
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp)) AS tsm", "event_id", "value")
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, Double)], state: GroupState[EwmaAgg]) =>
          val prev = state.getOption.getOrElse(EwmaAgg(user, 0L, 0.0))
          var n = prev.n
          var acc = prev.ewma
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
            acc = 0.8 * acc + 0.2 * r._4
            n += 1
          }
          val next = EwmaAgg(user, n, acc)
          state.update(next)
          Iterator(next)
      }
  }

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
