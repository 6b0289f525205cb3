package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling / mixture operators for training-data
  * pipelines. Nothing here uses rand(): sampling keys are md5-derived
  * integers so every engine, run, and retry selects the identical
  * subset (SURVEY §2.9.6 bans nondeterministic built-ins in verified
  * output) — which is also the production-correct choice at 100 TB,
  * where a resumable/idempotent sample beats a seeded RNG whose output
  * depends on partitioning.
  *
  * Scale notes: hash-percent sampling is a pure map-side filter;
  * stratified top-k is one shuffle on the stratum key; interleaving is
  * one shuffle on the source key then a mixture-order sort — the
  * standard "round-robin by (position, source)" schedule used to mix
  * corpora for training.
  */
object Sampling {

  /** 32-bit md5-derived sampling key — identical in both engines. */
  private def hkey(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  private def oHkey(e: String): String =
    s"('0x' || substr(md5(cast($e as varchar)), 1, 8))::BIGINT"

  /** ~10% deterministic sample: keep docs whose hash bucket is 0. */
  val sampleHashPct: Q = Q(
    "sample_hash_pct",
    Some(
      s"SELECT doc_id, lang, source FROM documents WHERE ${oHkey("doc_id")} % 10 = 0 " +
        "ORDER BY doc_id"
    ),
    (spark, dir) =>
      Tables
        .documents(spark, dir)
        .filter(hkey(col("doc_id")) % 10 === 0)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
  )

  /** Stratified sample: exactly (up to) 20 docs per language, chosen by
    * hash order — balanced strata regardless of the corpus's language
    * skew (en is ~44% of this corpus). */
  val sampleStratified: Q = Q(
    "sample_stratified",
    Some(
      "SELECT lang, doc_id FROM (SELECT lang, doc_id, " +
        s"row_number() OVER (PARTITION BY lang ORDER BY ${oHkey("doc_id")}, doc_id) AS rn " +
        "FROM documents) WHERE rn <= 20 ORDER BY lang, doc_id"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang")).orderBy(hkey(col("doc_id")), col("doc_id"))
      Tables
        .documents(spark, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    }
  )

  /** Mixture interleave: within each source, order docs by hash
    * (deterministic shuffle), then emit the first 5 rounds of a
    * round-robin over sources — the (round, source) order is the
    * training-time mixture schedule. */
  val interleaveSources: Q = Q(
    "interleave_sources",
    Some(
      "SELECT round, source, doc_id FROM (SELECT source, doc_id, " +
        s"row_number() OVER (PARTITION BY source ORDER BY ${oHkey("doc_id")}, doc_id) AS round " +
        "FROM documents) WHERE round <= 5 ORDER BY round, source"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(hkey(col("doc_id")), col("doc_id"))
      Tables
        .documents(spark, dir)
        .withColumn("round", row_number().over(w))
        .filter(col("round") <= 5)
        .select(col("round").cast("long").as("round"), col("source"), col("doc_id"))
        .orderBy(col("round"), col("source"))
    }
  )

  /** Per-user time-range join: for each purchase, how many views the
    * same user made in the preceding hour. Equi-join on user_id (high
    * cardinality — parallelizes) with the time window as a residual
    * condition; the window-function as-of pattern is its sibling
    * (Joins.asOf). */
  val joinRangeEvents: Q = Q(
    "join_range_events",
    Some(
      "SELECT p.event_id, p.user_id, count(v.event_id) AS views_1h, " +
        Det.oRN("coalesce(" + Det.oSum("v.value") + ", 0)", 6) + " AS view_value " +
        "FROM events p LEFT JOIN events v ON p.user_id = v.user_id " +
        "AND v.event_type = 'view' AND v.ts < p.ts " +
        "AND v.ts >= p.ts - INTERVAL 1 HOUR " +
        "WHERE p.event_type = 'purchase' " +
        "GROUP BY p.event_id, p.user_id ORDER BY p.event_id"
    ),
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
      val p = ev
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      val v = ev
        .filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("value").as("v_value"))
      p.join(
        v,
        col("p_user") === col("v_user") &&
          col("v_ts") < col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
        "left"
      )
        .groupBy(col("p_id").as("event_id"), col("p_user").as("user_id"))
        .agg(
          count(col("v_ts")).as("views_1h"),
          Det.rN(coalesce(Det.dsum(col("v_value")), lit(0.0)), 6).as("view_value")
        )
        .orderBy(col("event_id"))
    }
  )

  def qs: Seq[Q] = Seq(sampleHashPct, sampleStratified, interleaveSources, joinRangeEvents)
}
