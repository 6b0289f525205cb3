/* In org.apache.spark.sql (like the expressions themselves) because
 * FunctionRegistry access via sessionState is package-private. */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's native expressions exposed as SQL functions, so
  * `spark.sql("SELECT float_dot(a, b) ...")` plans the same codegen'd
  * expression the DataFrame API uses. Installed by
  * `graft.GraftExtensions` (spark.sql.extensions) or at runtime via
  * [[registerFunctions]] on sessions the engine does not build.
  */
object GraftFunctions {

  private def two(
      name: String,
      usage: String,
      make: (Expression, Expression) => Expression
  ): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (
      FunctionIdentifier(name),
      new ExpressionInfo(GraftFunctions.getClass.getName, name, usage),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
        make(args(0), args(1))
      }
    )

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    two(
      "float_dot",
      "float_dot(a, b) - dot product of two float32 arrays, double accumulation",
      FloatDot(_, _)
    ),
    two(
      "sorted_intersect_count",
      "sorted_intersect_count(a, b) - intersection size of two sorted distinct long arrays",
      SortedLongIntersectCount(_, _)
    ),
    two(
      "long_bloom_might_contain",
      "long_bloom_might_contain(bloomBytes, key) - probe a long key against a " +
        "serialized spark BloomFilter held in a foldable binary literal",
      LongBloomMightContain(_, _)
    ),
    (
      FunctionIdentifier("count_min_topk"),
      new ExpressionInfo(
        GraftFunctions.getClass.getName,
        "count_min_topk",
        "count_min_topk(col, k) - top-k heavy hitters of a string column " +
          "via a mergeable count-min sketch; returns array<struct<token, est>>"
      ),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"count_min_topk expects 2 arguments, got ${args.length}")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
          case other =>
            throw new IllegalArgumentException(
              s"count_min_topk's k must be an integer literal, got $other")
        }
        // returning the AggregateFunction directly: the analyzer wraps
        // it in an AggregateExpression, as with built-in aggregates
        CountMinTopK(args.head, k)
      }
    )
  )

  /** Runtime twin of the extension injection — registration overwrites
    * idempotently. */
  def registerFunctions(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
