package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Dataset

/** Typed `Dataset[T]` API surface: case-class Encoders, typed filters,
  * `groupByKey` + `mapGroups`.
  *
  * Where typed helps: compile-time schema checks and business logic
  * that reads as plain Scala. Where it costs: lambdas are opaque to
  * Catalyst — no predicate pushdown, no map-side partial aggregation,
  * no codegen through the lambda. The pipeline below is the honest
  * hybrid for scale: the selective predicate is a COLUMN filter first
  * (pushed into the parquet scan), the typed lambda only refines it,
  * and `mapGroups` is reserved for a low-cardinality key (5 languages)
  * where the absence of partial aggregation cannot hurt — each group
  * streams through its iterator without materializing. For
  * high-cardinality keys, use untyped `agg` (see Aggregates.scala) or
  * an `Aggregator` (see Udx.scala), both of which keep map-side
  * combine.
  *
  * Determinism: the sum is exact long arithmetic (order-independent),
  * the average is a single IEEE division of identical operands — no
  * decimal detour needed.
  */
object Typed {

  final case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  final case class LangStats(lang: String, n_docs: Long, avg_chars: Double, max_doc: Long)

  val typedDocStats: Q = Q(
    "typed_doc_stats",
    Some(
      "SELECT lang, count(*)::BIGINT AS n_docs, " +
        "sum(n_chars)::DOUBLE / count(*) AS avg_chars, max(doc_id) AS max_doc " +
        "FROM documents WHERE n_chars >= 150 AND len(string_split(text, ' ')) >= 20 " +
        "GROUP BY lang ORDER BY lang"
    ),
    (spark, dir) => {
      import spark.implicits._
      val docs: Dataset[Doc] = Tables
        .documents(spark, dir)
        .filter(col("n_chars") >= 150) // column predicate: reaches the scan
        .as[Doc]
      docs
        // limit -1 keeps trailing empty tokens, matching DuckDB
        // string_split (and Spark SQL split) semantics exactly
        .filter(d => d.text.split(" ", -1).length >= 20) // typed refinement
        .groupByKey(_.lang)
        .mapGroups { (lang, ds) =>
          var n = 0L
          var sumChars = 0L
          var maxDoc = Long.MinValue
          ds.foreach { d =>
            n += 1
            sumChars += d.n_chars
            if (d.doc_id > maxDoc) maxDoc = d.doc_id
          }
          LangStats(lang, n, sumChars.toDouble / n, maxDoc)
        }
        .toDF()
        .orderBy(col("lang"))
    }
  )

  def qs: Seq[Q] = Seq(typedDocStats)
}
