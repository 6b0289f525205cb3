package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Coverage beyond the SURVEY §2 inventory: pivot, exact percentiles,
  * bitwise functions, and a partitioned-sink/partition-pruning demo —
  * operators a user of a general analytics engine reaches for that the
  * core inventory doesn't exercise.
  */
object Extras {

  /** Pivot order counts+revenue: priorities × status columns. Spark's
    * relational pivot with explicit values (no discovery pass); oracle
    * is the equivalent CASE aggregation. */
  val aggPivot: Q = Q(
    "agg_pivot",
    Some(
      "SELECT o_orderpriority, " +
        "cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) as bigint) AS n_f, " +
        "cast(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) as bigint) AS n_o, " +
        "cast(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) as bigint) AS n_p, " +
        Det.oRN(Det.oSum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END"), 2) + " AS rev_f " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    (spark, dir) => {
      val p = Tables
        .orders(spark, dir)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(
          count(lit(1)).as("n"),
          Det.rN(Det.dsum(col("o_totalprice")), 2).as("rev")
        )
      p.select(
        col("o_orderpriority"),
        col("F_n").as("n_f"),
        col("O_n").as("n_o"),
        col("P_n").as("n_p"),
        col("F_rev").as("rev_f")
      ).orderBy(col("o_orderpriority"))
    }
  )

  /** Exact interpolated percentiles (median/p25/p75) of account
    * balances per segment. Both engines linear-interpolate over the
    * sorted values; trunc-rounded to 4 dp (balances can be negative →
    * signed rounding). */
  val aggPercentile: Q = Q(
    "agg_percentile",
    Some(
      "SELECT c_mktsegment, " +
        Det.oRS("quantile_cont(c_acctbal::DOUBLE, 0.5)", 4) + " AS p50, " +
        Det.oRS("quantile_cont(c_acctbal::DOUBLE, 0.25)", 4) + " AS p25, " +
        Det.oRS("quantile_cont(c_acctbal::DOUBLE, 0.75)", 4) + " AS p75 " +
        "FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"
    ),
    (spark, dir) =>
      Tables
        .customer(spark, dir)
        .groupBy(col("c_mktsegment"))
        .agg(
          Det.rS(expr("percentile(c_acctbal, 0.5)"), 4).as("p50"),
          Det.rS(expr("percentile(c_acctbal, 0.25)"), 4).as("p25"),
          Det.rS(expr("percentile(c_acctbal, 0.75)"), 4).as("p75")
        )
        .orderBy(col("c_mktsegment"))
  )

  /** Bitwise functions on integer keys: and/or/xor, shifts, popcount. */
  val fnBitwise: Q = Q(
    "fn_bitwise",
    Some(
      "SELECT p_partkey, p_partkey & 255 AS b_and, p_partkey | 4096 AS b_or, " +
        "xor(p_partkey, 1365) AS b_xor, p_partkey << 2 AS b_shl, " +
        "p_partkey >> 1 AS b_shr, cast(bit_count(p_partkey) as bigint) AS pop " +
        "FROM part ORDER BY p_partkey"
    ),
    (spark, dir) =>
      Tables
        .part(spark, dir)
        .select(
          col("p_partkey"),
          expr("p_partkey & 255").as("b_and"),
          expr("p_partkey | 4096").as("b_or"),
          expr("p_partkey ^ 1365").as("b_xor"),
          expr("shiftleft(p_partkey, 2)").as("b_shl"),
          expr("shiftright(p_partkey, 1)").as("b_shr"),
          expr("bit_count(p_partkey)").cast("long").as("pop")
        )
        .orderBy(col("p_partkey"))
  )

  /** Partitioned parquet sink + partition-pruned read-back (no oracle —
    * side-effecting). Writes lineitem partitioned by l_returnflag, then
    * reads ONE partition back; the scan must touch only that
    * directory (partition pruning — the 100 TB layout pattern: data
    * organized so predicates skip whole files). ExtrasSpec asserts the
    * pruned plan reads a single partition. */
  val snkPartitioned: Q = Q(
    "snk_partitioned",
    // oracle = the same aggregate on the parquet original: the
    // partitioned write/pruned read must be value-invisible (the plan
    // assertion stays in ExtrasSpec)
    Some(
      "SELECT l_returnflag, cast(count(*) as bigint) AS n, " +
        graft.Det.oRN(graft.Det.oSum("l_quantity"), 2) + " AS qty " +
        "FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    (spark, dir) => {
      val base = graft.Staging.dir("graft_snk_part")
      Tables
        .lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
        // repartition ON the partition column before the write: without
        // it every input task opens a file per partition VALUE it sees
        // (~tasks × values small files — the classic 100 TB partitioned-
        // write mistake that maint_compact then has to clean up); with
        // it each partition directory gets one writer. At real scale a
        // skewed value adds a salt term (repartition(col, pmod(hash, k)))
        // and spark.sql.files.maxRecordsPerFile bounds file size.
        .repartition(col("l_returnflag"))
        .write
        .mode("overwrite")
        .partitionBy("l_returnflag")
        .parquet(base)
      spark.read
        .parquet(base)
        .filter(col("l_returnflag") === "R")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), Det.rN(Det.dsum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("l_returnflag"))
    }
  )

  /** Bucketed-table co-located join (no oracle — catalog side effect).
    * lineitem and orders are written bucketed by order key into the
    * session catalog; joining the bucketed tables then needs NO shuffle
    * on either side (ExtrasSpec asserts the plan has no Exchange before
    * the join). This is the 100 TB pattern for repeated fact-to-fact
    * joins: pay the partitioning once at write time, never at read. */
  val snkBucketed: Q = Q(
    "snk_bucketed",
    // oracle = the join+aggregate on the parquet originals: bucketing
    // changes the plan (no-exchange SMJ, ExtrasSpec), never the values
    Some(
      "SELECT l_orderkey, cast(count(*) as bigint) AS n_lines, " +
        graft.Det.oRN(graft.Det.oSum("l_quantity"), 2) + " AS qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 1000"
    ),
    (spark, dir) => {
      val nBuckets = 8
      val base = graft.Staging.dir("graft_bucketed")
      // repartition(nBuckets, bucketCol) uses the SAME Murmur3
      // HashPartitioning as the bucketed write, so each task holds
      // exactly one bucket and writes exactly one file — without it
      // every input task writes a file per bucket it sees (~tasks ×
      // buckets small files, the bucketed flavor of the partitioned-
      // write mistake above).
      Tables
        .lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_quantity"))
        .repartition(nBuckets, col("l_orderkey"))
        .write
        .mode("overwrite")
        .option("path", s"$base/lineitem")
        .bucketBy(nBuckets, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("graft_lineitem_b")
      Tables
        .orders(spark, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .repartition(nBuckets, col("o_orderkey"))
        .write
        .mode("overwrite")
        .option("path", s"$base/orders")
        .bucketBy(nBuckets, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("graft_orders_b")
      spark
        .table("graft_lineitem_b")
        // merge hint: without it the small pruned orders side would
        // auto-broadcast and hide the shuffle-free bucketed SMJ
        .join(spark.table("graft_orders_b").hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"), Det.rN(Det.dsum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("l_orderkey"))
        .limit(1000)
    }
  )

  /** SCD1 latest-wins MERGE (upsert): an updates set — here a derived
    * 10% slice of orders with repriced totals, plus synthetic new keys
    * above the current max — merged into the base so updated keys take
    * the new row, new keys append, and untouched rows pass through.
    * Shape: base ANTI-JOIN updates ∪ updates — exactly two shuffles
    * (or one, when the updates side broadcasts: the common CDC case of
    * a small change set against a 100 TB base — Spark picks
    * BroadcastHashJoin for the anti join automatically then). This is
    * the engine-level move behind MERGE INTO in table formats. */
  val mergeUpsert: Q = Q(
    "merge_upsert",
    Some(
      "WITH upd AS (SELECT o_orderkey, " + Det.oR2("o_totalprice * 1.1") + " AS price, " +
        "'updated' AS src FROM orders WHERE o_orderkey % 10 = 0 " +
        "UNION ALL SELECT o_orderkey + (SELECT max(o_orderkey) FROM orders), " +
        Det.oR2("o_totalprice") + ", 'inserted' FROM orders WHERE o_orderkey % 100 = 0), " +
        "base AS (SELECT o_orderkey, " + Det.oR2("o_totalprice") + " AS price, " +
        "'kept' AS src FROM orders) " +
        "SELECT * FROM (SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd) " +
        "UNION ALL SELECT * FROM upd) ORDER BY o_orderkey, src"
    ),
    (spark, dir) => {
      val orders = Tables.orders(spark, dir)
      // global max as a broadcast 1-row scalar, not a window over an
      // empty partition spec (which would funnel all rows to one task)
      val mk = orders.agg(max(col("o_orderkey")).as("mk"))
      val upd = orders
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), Det.r2(col("o_totalprice") * 1.1).as("price"), lit("updated").as("src"))
        .unionByName(
          orders
            .crossJoin(broadcast(mk))
            .filter(col("o_orderkey") % 100 === 0)
            .select((col("o_orderkey") + col("mk")).as("o_orderkey"),
              Det.r2(col("o_totalprice")).as("price"), lit("inserted").as("src"))
        )
      val base = orders
        .select(col("o_orderkey"), Det.r2(col("o_totalprice")).as("price"), lit("kept").as("src"))
      base
        .join(upd.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
        .unionByName(upd)
        .orderBy(col("o_orderkey"), col("src"))
    }
  )

  /** Explicit skew-salted aggregation: token counts over the exploded
    * corpus, where a 31-word vocabulary makes every token a heavy
    * hitter. Phase 1 groups on (token, salt) — spreading each hot key
    * over 16 reducers — phase 2 merges the partials. Same result as a
    * direct groupBy (the oracle); the point is the two-shuffle shape
    * that keeps reducers balanced when one key dominates at scale.
    * Salt = doc_id % 16: deterministic, engine-independent. */
  val aggSalted: Q = Q(
    "agg_salted",
    Some(
      "SELECT tok, count(*) AS n FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS tok FROM documents) " +
        "GROUP BY tok ORDER BY tok"
    ),
    (spark, dir) =>
      Tables
        .documents(spark, dir)
        .select((col("doc_id") % 16).as("salt"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"), col("salt"))
        .agg(count(lit(1)).as("pn"))
        .groupBy(col("tok"))
        .agg(sum(col("pn")).cast("long").as("n"))
        .orderBy(col("tok"))
  )

  /** Unpivot (melt): wide per-part numeric columns to long
    * (part, metric, value) form — the inverse of agg_pivot. */
  val aggUnpivot: Q = Q(
    "agg_unpivot",
    Some(
      "SELECT * FROM (UNPIVOT (SELECT p_partkey, p_retailprice, cast(p_size as double) AS p_size_d " +
        "FROM part) ON p_retailprice, p_size_d INTO NAME metric VALUE val) " +
        "ORDER BY p_partkey, metric"
    ),
    (spark, dir) =>
      Tables
        .part(spark, dir)
        .select(col("p_partkey"), col("p_retailprice"), col("p_size").cast("double").as("p_size_d"))
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size_d")),
          "metric",
          "val"
        )
        .orderBy(col("p_partkey"), col("metric"))
  )

  /** Z-score outlier flagging per event_type — population moments from
    * order-independent decimal sums (mean = Σx/n, var = Σx²/n − mean²,
    * both IEEE on identical operands cross-engine), broadcast back
    * onto the stream, |z| > 2.5 flagged. The per-group-stats-then-score
    * shape every monitoring pipeline runs; emits only the outliers. */
  val eventsAnomaly: Q = graft.Q(
    "events_anomaly",
    Some(
      "WITH m AS (SELECT event_type, " +
        Det.oSum("value") + " / count(*) AS mu, " +
        "sqrt(" + Det.oSum("value * value") + " / count(*) - " +
        "pow(" + Det.oSum("value") + " / count(*), 2)) AS sigma " +
        "FROM events GROUP BY 1) " +
        "SELECT e.event_id, e.event_type, e.value, " +
        Det.oRS("(e.value - m.mu) / m.sigma", 6) + " AS z " +
        "FROM events e JOIN m ON e.event_type = m.event_type " +
        "WHERE abs((e.value - m.mu) / m.sigma) > 2.5 " +
        "ORDER BY e.event_id"
    ),
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
      val m = ev
        .groupBy(col("event_type"))
        .agg(
          (Det.dsum(col("value")) / count(lit(1))).as("mu"),
          sqrt(
            Det.dsum(col("value") * col("value")) / count(lit(1)) -
              pow(Det.dsum(col("value")) / count(lit(1)), 2)
          ).as("sigma")
        )
      ev.join(broadcast(m), Seq("event_type"))
        .withColumn("z", (col("value") - col("mu")) / col("sigma"))
        .filter(abs(col("z")) > 2.5)
        .select(col("event_id"), col("event_type"), col("value"), Det.rS(col("z"), 6).as("z"))
        .orderBy(col("event_id"))
    }
  )

  /** Small-file compaction — the table-maintenance job every long-lived
    * 100 TB dataset needs (streaming ingest and partitioned writes
    * accumulate small files; scan cost and NameNode/listing pressure
    * grow with file COUNT, not bytes). Stage: orders sliced into 64
    * deliberately-small files; compact: read back and rewrite into
    * max(1, ceil(bytes / 128 MB)) size-targeted files. Returns
    * (smallPath, compactedPath, n_small_files, n_compacted_files) —
    * shared by the registry row and the spec-side report. */
  private def runCompaction(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, String, Long, Long) = {
    import org.apache.hadoop.fs.Path
    val base = graft.Staging.dir("graft_compact")
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stats(p: String): (Long, Long) = {
      val files = fs.listStatus(new Path(p)).filter(_.getPath.getName.endsWith(".parquet"))
      (files.length.toLong, files.map(_.getLen).sum)
    }
    val src = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    src.repartition(64).write.mode("overwrite").parquet(s"$base/small")
    val (nSmall, bytes) = stats(s"$base/small")
    val target = math.max(1L, (bytes + (128L << 20) - 1) / (128L << 20)).toInt
    spark.read.parquet(s"$base/small")
      .repartition(target).write.mode("overwrite").parquet(s"$base/compacted")
    val (nCompact, _) = stats(s"$base/compacted")
    (s"$base/small", s"$base/compacted", nSmall, nCompact)
  }

  /** The registry row runs the FULL maintenance cycle (stage 64 small
    * files → size-targeted rewrite) and returns the compacted table
    * READ BACK in total key order — so the DuckDB oracle (the original
    * orders projection, same ORDER BY) proves end-to-end that
    * compaction preserved the exact row multiset and every value bit:
    * any lost/duplicated row or corrupted cell hash-mismatches.
    * (Graduated from no-oracle in r11 — the side effect itself isn't
    * DuckDB-expressible, but its read-back content is, which is the
    * same ratchet src_csv_badrecords took in r10.) File-count
    * mechanics (64 before, collapsed after) stay pinned by ExtrasSpec
    * via [[compactReport]]. */
  val maintCompact: Q = Q(
    "maint_compact",
    Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_orderkey"),
    (spark, dir) => {
      val (_, compacted, _, _) = runCompaction(spark, dir)
      spark.read.parquet(compacted)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }
  )

  /** Spec-side before/after (n_files, n_rows, checksum) report, where
    * checksum is an order-independent content hash (sum of a 40-bit
    * slice of the per-row xxhash64 over every column — the
    * pipeline_manifest spelling; 2^40 · 150 k rows stays far inside a
    * long, so ANSI sum can't overflow): compaction must be
    * value-invisible, and ExtrasSpec asserts row AND checksum
    * preservation plus the file-count collapse. */
  private[graft] def compactReport(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val (small, compacted, nSmall, nCompact) = runCompaction(spark, dir)
    def audit(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df
        .agg(
          count(lit(1)).as("n"),
          sum(shiftrightunsigned(xxhash64(df.columns.map(col).toIndexedSeq: _*), 24)).as("chk")
        )
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val (nRowsSmall, chkSmall)     = audit(spark.read.parquet(small))
    val (nRowsCompact, chkCompact) = audit(spark.read.parquet(compacted))
    import spark.implicits._
    Seq(
      ("before", nSmall, nRowsSmall, chkSmall),
      ("after", nCompact, nRowsCompact, chkCompact)
    ).toDF("phase", "n_files", "n_rows", "checksum").orderBy(col("phase"))
  }

  /** Expose the z-value for ExtrasSpec's real-file skipping proof —
    * the on-disk step the `maint_zorder` row's bucket-span report
    * (Maintenance.scala) argues for: that spec WRITES the two layouts
    * and measures per-FILE spans, completing cells → files. No second
    * registry row: the cell math is maint_zorder's, and the interleave
    * is the SAME [[Morton]] kernel that row plans (one curve
    * definition, two proofs). */
  private[graft] def zValueOf(x: Column, y: Column): Column = Morton.zval(x, y, 14)

  def qs: Seq[Q] =
    Seq(aggPivot, aggUnpivot, aggPercentile, fnBitwise, snkPartitioned, snkBucketed, aggSalted,
      mergeUpsert, eventsAnomaly, maintCompact)
}
