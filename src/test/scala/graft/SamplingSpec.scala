package graft

import org.apache.spark.sql.functions._

/** Sampling/mixture invariants: strata are balanced and capped,
  * interleave rounds are dense per source, the hash sample is
  * reproducible, and salted aggregation equals the direct aggregation.
  */
class SamplingSpec extends SparkSuite {

  test("stratified sample takes at most 20 docs per language") {
    val s = operators.Sampling.sampleStratified.run(spark, sf)
    val per = s.groupBy(col("lang")).count().collect().map(r => r.getString(0) -> r.getLong(1))
    assert(per.nonEmpty)
    for ((lang, n) <- per) assert(n <= 20, s"$lang has $n")
  }

  test("hash sample is a stable subset near the target rate") {
    val a = operators.Sampling.sampleHashPct.run(spark, sf).collect().map(_.getLong(0)).toSet
    val b = operators.Sampling.sampleHashPct.run(spark, sf).collect().map(_.getLong(0)).toSet
    assert(a == b)
    val total = Tables.documents(spark, sf).count()
    val rate = a.size.toDouble / total
    assert(rate > 0.02 && rate < 0.25, s"rate=$rate")
  }

  test("interleave emits dense rounds per source") {
    val i = operators.Sampling.interleaveSources.run(spark, sf).collect()
    for ((_, rows) <- i.groupBy(_.getString(1))) {
      val rounds = rows.map(_.getLong(0)).sorted
      assert(rounds.zipWithIndex.forall { case (r, k) => r == k + 1 })
    }
  }

  test("salted aggregation equals direct aggregation") {
    val salted = operators.Extras.aggSalted.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }
}
