package graft.functions

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** User-defined function surface (SURVEY §2.8 bottom): a scalar Scala
  * UDF, a typed Aggregator UDAF, and a generator (UDTF-equivalent)
  * built from higher-order functions.
  *
  * 100 TB notes: a JVM Scala UDF runs inside the executor's codegen
  * pipeline with only boxing overhead (no IPC, unlike non-Arrow Python
  * UDFs) — acceptable off the hot path; the built-in-function twin of
  * each UDF is preferred where one exists. The Aggregator participates
  * in partial aggregation (reduce/merge), so it shuffles only one
  * buffer per group per partition — the same two-phase shape as
  * built-in aggregates. The bigram generator is pure array algebra
  * inside codegen; no custom Generator class is needed.
  */
object Udx {

  /** Whitespace normalization UDF: collapse runs of spaces, trim,
    * lowercase. The oracle is the equivalent built-in pipeline — the
    * UDF exists to exercise the UDF surface, not because built-ins
    * can't express it. */
  private val normalizeUdf = udf { s: String =>
    if (s == null) null else s.replaceAll(" +", " ").trim.toLowerCase
  }

  val udfScalar: Q = Q(
    "udf_scalar",
    Some(
      "SELECT doc_id, lower(trim(regexp_replace(text, ' +', ' ', 'g'))) AS norm_text " +
        "FROM documents ORDER BY doc_id"
    ),
    (spark, dir) => {
      spark.udf.register("graft_normalize", normalizeUdf)
      Tables
        .documents(spark, dir)
        .select(col("doc_id"), normalizeUdf(col("text")).as("norm_text"))
        .orderBy(col("doc_id"))
    }
  )

  /** Quantity-weighted average price: sum(p*q)/sum(q). Plain double
    * sums in the buffer — the final division + 4-dp trunc-round washes
    * out order-dependent last-ulp differences (SURVEY §2.9.2 rationale;
    * magnitudes here leave >8 digits of slack). */
  private[graft] object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    def finish(r: (Double, Double)): Double = if (r._2 == 0) 0.0 else r._1 / r._2
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val udafWeightedAvg: Q = Q(
    "udaf_weighted_avg",
    Some(
      "SELECT l_returnflag, " +
        Det.oRN("sum(l_extendedprice * l_quantity) / sum(l_quantity)", 4) + " AS w_avg_price " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    (spark, dir) => {
      val wavg = udaf(WeightedAvg)
      Tables
        .lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(Det.rN(wavg(col("l_extendedprice"), col("l_quantity")), 4).as("w_avg_price"))
        .orderBy(col("l_returnflag"))
    }
  )

  /** Generator: token bigrams per doc (zip the token array with its
    * own tail), then global bigram counts. DuckDB twin uses list_zip,
    * whose null-padding matches zip_with exactly. */
  val udtfBigrams: Q = Q(
    "udtf_bigrams",
    Some(
      "WITH bg AS (SELECT doc_id, unnest(list_filter(" +
        "list_transform(list_zip(string_split(text, ' '), string_split(text, ' ')[2:]), " +
        "x -> x[1] || ' ' || x[2]), v -> v IS NOT NULL)) AS bigram FROM documents) " +
        "SELECT bigram, count(*) AS n, count(DISTINCT doc_id) AS n_docs " +
        "FROM bg GROUP BY bigram ORDER BY bigram"
    ),
    (spark, dir) => {
      val t = split(col("text"), " ")
      val bg = filter(
        zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))), (x, y) => concat(x, lit(" "), y)),
        v => v.isNotNull
      )
      Tables
        .documents(spark, dir)
        .select(col("doc_id"), explode(bg).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("bigram"))
    }
  )

  def qs: Seq[Q] = Seq(udfScalar, udafWeightedAvg, udtfBigrams)
}
