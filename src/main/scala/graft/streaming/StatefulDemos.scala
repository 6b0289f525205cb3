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

  /** Epoch microseconds of `c`, session-zone-free for NTZ inputs: a
    * naive column is reinterpreted as UTC micros ([[graft.Det.ntzMicros]]);
    * an instant column is `unix_micros` (no zone in either direction).
    * Never spelled `unix_micros(cast(c as timestamp))` — for NTZ that
    * cast consults the session zone and the demos' state ordering /
    * as-of arithmetic would shift in a non-UTC library session. */
  private def epochUs(df: DataFrame, c: String) =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType => graft.Det.ntzMicros(col(c))
      case _                                           => unix_micros(col(c).cast("timestamp"))
    }

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
      .select(col("user_id"), epochUs(events, "ts").as("tsm"), col("event_id"), col("value"))
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

  /** Emitted closed session. */
  case class Sess(user_id: Long, start_us: Long, end_us: Long, n_events: Long)
  // not `private`: the state encoder's generated code needs public access
  case class OpenSess(start_us: Long, last_us: Long, n: Long)

  /** Session tracking as an explicit state machine with EVENT-TIME
    * TIMEOUTS — the state-API capability `session_window` hides: one
    * OpenSess per user in the state store, sessions closed by a
    * later-arriving event emit immediately, and sessions closed by
    * SILENCE emit when the watermark passes last_event + gap
    * (`GroupStateTimeout.EventTimeTimeout` + `setTimeoutTimestamp`) —
    * no unbounded wait on a key that went quiet, which is exactly what
    * a per-user stream needs at 100 TB: state is O(active users) and
    * the timeout sweep is the state store's own eviction scan, not a
    * query. StatefulSpec pins the semantics against batch
    * sessionization: on a single-batch finite source the emitted set
    * is precisely every batch session EXCEPT each user's last (still
    * open; no later watermark advance fires its timeout).
    */
  def sessionTracker(spark: SparkSession, events: DataFrame, gapMin: Int = 30): Dataset[Sess] = {
    import spark.implicits._
    val gapUs = gapMin * 60L * 1000000L
    events
      .withWatermark("ts", "1 hour")
      // the watermark-TAGGED ts column must survive the projection or
      // the analyzer rejects the event-time timeout
      .select(col("user_id"), col("ts"), epochUs(events, "ts").as("tu"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long)],
         state: GroupState[OpenSess]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Sess(user, s.start_us, s.last_us, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._3, r._4))
            var open = state.getOption
            val closed = Seq.newBuilder[Sess]
            for ((_, _, tu, _) <- sorted) {
              open match {
                case Some(o) if tu - o.last_us <= gapUs =>
                  open = Some(o.copy(last_us = tu, n = o.n + 1))
                case Some(o) =>
                  closed += Sess(user, o.start_us, o.last_us, o.n)
                  open = Some(OpenSess(tu, tu, 1))
                case None =>
                  open = Some(OpenSess(tu, tu, 1))
              }
            }
            open.foreach { o =>
              state.update(o)
              // timeout is in EVENT-TIME ms: fires once the watermark
              // passes the session's gap horizon
              state.setTimeoutTimestamp(o.last_us / 1000 + gapMin * 60L * 1000 + 1)
            }
            closed.result().iterator
          }
      }
  }

  /** Emitted enriched purchase. */
  case class AsOfEnriched(event_id: Long, user_id: Long, ts_us: Long, last_click_us: Option[Long])
  // not `private`: the state encoder's generated code needs public access
  case class LastClick(us: Long)

  /** Streaming as-of enrichment — the INCREMENTAL form of the backward
    * as-of join (batch twins: `join_asof`'s union-window and
    * `join_asof_native`'s ordered merge): every purchase is stamped
    * with the user's latest click at-or-before it, from ONE long of
    * state per user. Within a micro-batch rows fold in
    * (time, click-before-purchase, event_id) order, so an equal-time
    * click is visible to its purchase — the same inclusive tie rule as
    * DuckDB `ASOF ... ON p.ts >= c.ts` and both batch forms; on a
    * time-ordered source the emitted set equals the batch join exactly
    * (StatefulSpec). At 100 TB this is the enrichment shape that
    * replaces re-joining the full click history every batch: state is
    * O(users) — add a `GroupStateTimeout` TTL to evict idle users when
    * the key space is unbounded. */
  def lastClickEnrich(spark: SparkSession, events: DataFrame): Dataset[AsOfEnriched] = {
    import spark.implicits._
    events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), epochUs(events, "ts").as("tu"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, String)], state: GroupState[LastClick]) =>
          var last = state.getOption.map(_.us)
          val out = Seq.newBuilder[AsOfEnriched]
          rows.toSeq
            .sortBy(r => (r._2, if (r._4 == "click") 0 else 1, r._3))
            .foreach { r =>
              if (r._4 == "click") last = Some(r._2)
              else out += AsOfEnriched(r._3, user, r._2, last)
            }
          last.foreach(us => state.update(LastClick(us)))
          out.result().iterator
      }
  }

  /** Streaming SCD2 — the incremental form of `maint_scd2`'s batch
    * dimension build: per customer the state is ONE open version
    * (version, status, valid_from-as-epoch-days, n_orders). Each
    * micro-batch folds its rows in (date, orderkey) order: a same-
    * status row bumps the open run's count; a status change EMITS the
    * closed interval (valid_to = the new valid_from, is_current=false)
    * and opens the next version; the open version is re-emitted each
    * batch with valid_to=None so downstream upsert sinks always hold
    * the current row. On an ordered replay the emission set (latest
    * per (cust, version)) equals the batch build exactly —
    * StatefulSpec.
    *
    * 100 TB: this replaces re-running the full-history window build
    * every batch; state is O(dimension keys) — one small row each —
    * and only changed versions are written downstream (CDC-style). */
  case class Scd2Ver(
      o_custkey: Long,
      version: Long,
      status: String,
      valid_from_days: Long,
      valid_to_days: Option[Long],
      is_current: Boolean,
      n_orders: Long
  )
  case class Scd2State(version: Long, status: String, fromDays: Long, n: Long)

  def scd2Stream(spark: SparkSession, orders: DataFrame): Dataset[Scd2Ver] = {
    import spark.implicits._
    orders
      .selectExpr(
        "o_custkey",
        "o_orderkey",
        "datediff(o_orderdate, DATE '1970-01-01') AS days",
        "o_orderstatus"
      )
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (cust: Long, rows: Iterator[(Long, Long, Long, String)], state: GroupState[Scd2State]) =>
          var cur = state.getOption
          val out = Seq.newBuilder[Scd2Ver]
          rows.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, _, days, status) =>
            cur match {
              case None =>
                cur = Some(Scd2State(1L, status, days, 1L))
              case Some(s) if s.status == status =>
                cur = Some(s.copy(n = s.n + 1))
              case Some(s) =>
                out += Scd2Ver(cust, s.version, s.status, s.fromDays, Some(days), is_current = false, s.n)
                cur = Some(Scd2State(s.version + 1, status, days, 1L))
            }
          }
          cur.foreach { s =>
            state.update(s)
            // re-emit the open version: Update-mode upsert of the current row
            out += Scd2Ver(cust, s.version, s.status, s.fromDays, None, is_current = true, s.n)
          }
          out.result().iterator
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

  /** [[userTotals]] through Spark 4's `transformWithState` — the
    * arbitrary-state API that supersedes `flatMapGroupsWithState`:
    * typed state HANDLES (`ValueState`/`ListState`/`MapState`)
    * acquired in `init` from a `StatefulProcessorHandle`, per-state
    * TTL, timers, and a RocksDB-backed store (the API requires the
    * RocksDB provider; the spec sets `spark.sql.streaming.stateStore
    * .providerClass` around the query). Semantics identical to
    * [[userTotals]], so StatefulSpec pins BOTH state APIs and the
    * batch aggregate on the same final per-user states — the
    * migration recipe for every state machine in this file: the
    * per-group fold body moves verbatim into `handleInputRows`, the
    * `GroupState` becomes a named `ValueState` handle. */
  class UserTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Double), UserAgg] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var totals: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)](
        "totals", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)
    override def handleInputRows(
        user: Long,
        rows: Iterator[(Long, Double)],
        timers: TimerValues): Iterator[UserAgg] = {
      val (n0, mx0) = if (totals.exists()) totals.get() else (0L, Double.MinValue)
      var n  = n0
      var mx = mx0
      rows.foreach { case (_, v) =>
        n += 1
        if (v > mx) mx = v
      }
      totals.update((n, mx))
      Iterator(UserAgg(user, n, mx))
    }
  }

  def userTotalsTws(spark: SparkSession, events: DataFrame): Dataset[UserAgg] = {
    import org.apache.spark.sql.streaming.TimeMode
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new UserTotalsProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** A CHUNKED (never replayed) (user_id, value) events stream: the
    * events table split into two parquet files in a per-SF staging
    * dir, one file per trigger — two micro-batches that exercise
    * state CARRY-OVER without duplicate delivery (a counter state
    * machine is deliberately not replay-idempotent; the at-least-once
    * story for event streams is [[dedupEvents]] upstream). Staged
    * once per corpus generation: the `_SUCCESS` marker must be no
    * older than the source file, else re-staged (the stageCopy
    * staleness rule, directory-level). */
  private def chunkedUserValueStream(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    import java.nio.charset.StandardCharsets.UTF_8
    val src = Paths.get(s"$dir/events.parquet")
    require(Files.exists(src), s"events source missing: $src")
    val staged = Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_stream_events_chunks",
      dir.replaceAll("[^a-zA-Z0-9]", "_"))
    // staleness is judged on (size, mtime) of the SOURCE — the
    // stageCopy rule: a marker-mtime-only check would keep serving
    // stale chunks after an older corpus snapshot is restored in
    // place with preserved timestamps (marker still >= source)
    val meta = staged.resolve("_staging_meta")
    val want = s"${Files.size(src)}|${Files.getLastModifiedTime(src).toMillis}"
    val fresh = Files.exists(meta) &&
      new String(Files.readAllBytes(meta), UTF_8) == want
    if (!fresh) {
      graft.Tables.events(spark, dir)
        .select(col("user_id"), col("value"))
        .coalesce(2)
        .write.mode("overwrite").parquet(staged.toString)
      Files.write(meta, want.getBytes(UTF_8))
      ()
    }
    val schema = spark.read.parquet(staged.toString).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString)
  }

  /** Final per-user (n_events, max_value) state of the totals machine
    * over the chunked stream, through EITHER state API — the shared
    * runner behind the `stream_state_api_parity` row. The driver map
    * is bounded by |users| (update-mode emissions are cumulative
    * states, so last-put-wins per user IS the final state). */
  private[graft] def finalUserTotals(
      spark: SparkSession,
      dir: String,
      useTws: Boolean): Map[Long, (Long, Double)] = {
    val stream = chunkedUserValueStream(spark, dir)
    val ds     = if (useTws) userTotalsTws(spark, stream) else userTotals(spark, stream)
    val rows   = scala.collection.concurrent.TrieMap.empty[Long, (Long, Double)]
    val q = ds.writeStream
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[UserAgg], _: Long) =>
        b.collect().foreach(u => rows.put(u.user_id, (u.n_events, u.max_value))) // bounded: |users|
        ()
      }
      .start()
    q.awaitTermination()
    rows.toMap
  }
}
