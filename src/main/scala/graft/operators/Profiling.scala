package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-join planning diagnostics + exact-k sampling.
  *
  * Before committing a join strategy on a 100 TB fact table you need
  * three numbers that no amount of optimizer magic supplies for free:
  * how SKEWED each candidate join key is (salt or AQE-skew-join?),
  * WHICH keys are hot (an explicit salting list beats blind salting),
  * and how big the join OUTPUT will be (a 31× fanout discovered after
  * eight hours of shuffle is a postmortem, not a plan). Each
  * diagnostic here costs one partial-aggregate pass over the fact
  * table — the per-key count table it reduces to is |distinct keys|
  * rows, exponentially smaller than the fact — so the *decision* is
  * made on kilobytes, never by running the candidate join.
  *
  * `sample_reservoir` is the exact-k companion: a deterministic
  * bottom-k-by-hash-rank sample (the KMV / reservoir-sampling
  * equivalent with the randomness replaced by an md5 rank, per the
  * engine-wide no-rand() rule). It plans as TakeOrderedAndProject:
  * each partition keeps a k-sized heap and the driver merges k·P
  * candidate rows — no shuffle of the data, resumable, and every
  * engine/run/retry selects the identical k rows.
  */
object Profiling {

  /** The three candidate join keys this corpus would actually join on. */
  private val skewTargets: Seq[(String, String, (org.apache.spark.sql.SparkSession, String) => DataFrame)] =
    Seq(
      ("l_partkey", "lineitem", (s, d) => Tables.lineitem(s, d)),
      ("l_suppkey", "lineitem", (s, d) => Tables.lineitem(s, d)),
      ("o_custkey", "orders", (s, d) => Tables.orders(s, d))
    )

  /** Join-key skew report: per candidate key, the count-per-key
    * distribution (min/p50/p99/max) and the skew ratio
    * max·keys/rows (1.0 = perfectly uniform). Two-phase aggregate per
    * key: fact → |keys| count rows → one summary row. The percentiles
    * are exact over the count table (thousands of rows even when the
    * fact is billions), not a sketch.
    */
  val profileSkew: Q = Q(
    "profile_skew",
    Some {
      def branch(key: String, table: String): String =
        s"SELECT '$key' AS key_col, count(*) AS n_keys, cast(sum(cnt) as bigint) AS n_rows, " +
          "min(cnt) AS min_cnt, " +
          Det.oRS("quantile_cont(cnt::DOUBLE, 0.5)", 4) + " AS p50_cnt, " +
          Det.oRS("quantile_cont(cnt::DOUBLE, 0.99)", 4) + " AS p99_cnt, " +
          "max(cnt) AS max_cnt, " +
          "(max(cnt)::DOUBLE * count(*)::DOUBLE) / cast(sum(cnt) as bigint)::DOUBLE AS skew " +
          s"FROM (SELECT count(*) AS cnt FROM $table GROUP BY $key)"
      "SELECT * FROM (" +
        skewTargets.map { case (k, t, _) => branch(k, t) }.mkString(" UNION ALL ") +
        ") ORDER BY key_col"
    },
    (spark, dir) => {
      def branch(key: String, load: (org.apache.spark.sql.SparkSession, String) => DataFrame): DataFrame =
        load(spark, dir)
          .groupBy(col(key))
          .agg(count(lit(1)).as("cnt"))
          .agg(
            count(lit(1)).as("n_keys"),
            sum(col("cnt")).as("n_rows"),
            min(col("cnt")).as("min_cnt"),
            Det.rS(expr("percentile(cnt, 0.5)"), 4).as("p50_cnt"),
            Det.rS(expr("percentile(cnt, 0.99)"), 4).as("p99_cnt"),
            max(col("cnt")).as("max_cnt")
          )
          .select(
            lit(key).as("key_col"),
            col("n_keys"),
            col("n_rows"),
            col("min_cnt"),
            col("p50_cnt"),
            col("p99_cnt"),
            col("max_cnt"),
            (col("max_cnt").cast("double") * col("n_keys").cast("double") /
              col("n_rows").cast("double")).as("skew")
          )
      skewTargets
        .map { case (k, _, load) => branch(k, load) }
        .reduce(_.unionAll(_))
        .orderBy(col("key_col"))
    }
  )

  /** The identity of the hot keys: top-5 heaviest values per candidate
    * join key with their row share — the explicit salting / skew-hint
    * list. Per key: one partial aggregate to the count table, then
    * TakeOrderedAndProject (per-partition top-5 heaps, no global
    * sort), then a broadcast scalar join for the share denominator.
    */
  val profileHotKeys: Q = Q(
    "profile_hot_keys",
    Some {
      def branch(key: String, table: String): String =
        s"SELECT '$key' AS key_col, key_val, cnt, " +
          s"cnt::DOUBLE / (SELECT count(*) FROM $table)::DOUBLE AS share " +
          s"FROM (SELECT $key AS key_val, count(*) AS cnt FROM $table " +
          "GROUP BY 1 ORDER BY cnt DESC, key_val LIMIT 5)"
      "SELECT * FROM (" +
        skewTargets.map { case (k, t, _) => branch(k, t) }.mkString(" UNION ALL ") +
        ") ORDER BY key_col, cnt DESC, key_val"
    },
    (spark, dir) => {
      def branch(key: String, load: (org.apache.spark.sql.SparkSession, String) => DataFrame): DataFrame = {
        val df    = load(spark, dir)
        val total = df.agg(count(lit(1)).as("total"))
        df.groupBy(col(key).cast("long").as("key_val"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("key_val"))
          .limit(5)
          .crossJoin(broadcast(total))
          .select(
            lit(key).as("key_col"),
            col("key_val"),
            col("cnt"),
            (col("cnt").cast("double") / col("total").cast("double")).as("share")
          )
      }
      skewTargets
        .map { case (k, _, load) => branch(k, load) }
        .reduce(_.unionAll(_))
        .orderBy(col("key_col"), col("cnt").desc, col("key_val"))
    }
  )

  /** Exact join-output accounting WITHOUT running the join: for each
    * candidate join, Σ over keys of cnt_left·cnt_right — computed by
    * joining the two |keys|-sized count tables, never the facts. The
    * lineitem self-join on l_partkey is the cautionary row: ~31×
    * fanout at every SF (the "accidental many-to-many" this diagnostic
    * exists to catch before the shuffle is paid for).
    */
  val profileFanout: Q = Q(
    "profile_fanout",
    Some(
      "SELECT join_name, left_rows, right_rows, out_rows, " +
        "out_rows::DOUBLE / left_rows::DOUBLE AS fanout FROM (" +
        "SELECT 'lineitem_lineitem_partkey' AS join_name, " +
        "(SELECT count(*) FROM lineitem) AS left_rows, " +
        "(SELECT count(*) FROM lineitem) AS right_rows, " +
        "(SELECT cast(sum(nl*nl) as bigint) FROM (SELECT count(*) AS nl FROM lineitem GROUP BY l_partkey)) AS out_rows " +
        "UNION ALL SELECT 'lineitem_orders_orderkey', " +
        "(SELECT count(*) FROM lineitem), (SELECT count(*) FROM orders), " +
        "(SELECT cast(sum(nl*nr) as bigint) FROM " +
        "(SELECT l_orderkey AS k, count(*) AS nl FROM lineitem GROUP BY 1) a JOIN " +
        "(SELECT o_orderkey AS k, count(*) AS nr FROM orders GROUP BY 1) b USING (k)) " +
        "UNION ALL SELECT 'lineitem_part_partkey', " +
        "(SELECT count(*) FROM lineitem), (SELECT count(*) FROM part), " +
        "(SELECT cast(sum(nl*nr) as bigint) FROM " +
        "(SELECT l_partkey AS k, count(*) AS nl FROM lineitem GROUP BY 1) a JOIN " +
        "(SELECT p_partkey AS k, count(*) AS nr FROM part GROUP BY 1) b USING (k))" +
        ") ORDER BY join_name"
    ),
    (spark, dir) => {
      def fanout(
          name: String,
          l: DataFrame,
          lk: String,
          r: DataFrame,
          rk: String
      ): DataFrame = {
        val lc = l.groupBy(col(lk).as("k")).agg(count(lit(1)).as("nl"))
        val rc = r.groupBy(col(rk).as("k")).agg(count(lit(1)).as("nr"))
        val out =
          lc.join(rc, "k").agg(coalesce(sum(col("nl") * col("nr")), lit(0L)).as("out_rows"))
        val lrows = l.agg(count(lit(1)).as("left_rows"))
        val rrows = r.agg(count(lit(1)).as("right_rows"))
        out
          .crossJoin(broadcast(lrows))
          .crossJoin(broadcast(rrows))
          .select(
            lit(name).as("join_name"),
            col("left_rows"),
            col("right_rows"),
            col("out_rows"),
            (col("out_rows").cast("double") / col("left_rows").cast("double")).as("fanout")
          )
      }
      val li  = Tables.lineitem(spark, dir)
      val ord = Tables.orders(spark, dir)
      val prt = Tables.part(spark, dir)
      Seq(
        fanout("lineitem_lineitem_partkey", li, "l_partkey", li, "l_partkey"),
        fanout("lineitem_orders_orderkey", li, "l_orderkey", ord, "o_orderkey"),
        fanout("lineitem_part_partkey", li, "l_partkey", prt, "p_partkey")
      ).reduce(_.unionAll(_)).orderBy(col("join_name"))
    }
  )

  /** Exact-k (k=100) uniform deterministic sample of lineitem: rank
    * every row by a 32-bit md5 of its primary key and keep the bottom
    * 100 — the deterministic reservoir/KMV sample. Plan:
    * TakeOrderedAndProject (per-partition k-heaps, driver merges k·P
    * rows); the final re-sort touches only the 100 winners.
    */
  val sampleReservoir: Q = Q(
    "sample_reservoir",
    Some {
      val rk = Sampling.oHkey(
        "cast(l_orderkey as varchar) || ':' || cast(l_linenumber as varchar)"
      )
      "SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (" +
        s"SELECT * FROM lineitem ORDER BY $rk, l_orderkey, l_linenumber LIMIT 100" +
        ") ORDER BY l_orderkey, l_linenumber"
    },
    (spark, dir) =>
      Tables
        .lineitem(spark, dir)
        .withColumn(
          "rk",
          Sampling.hkey(
            concat(col("l_orderkey").cast("string"), lit(":"), col("l_linenumber").cast("string"))
          )
        )
        .orderBy(col("rk"), col("l_orderkey"), col("l_linenumber"))
        .limit(100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
  )

  def qs: Seq[Q] = Seq(profileSkew, profileHotKeys, profileFanout, sampleReservoir)
}
