package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.LongBloomMightContain
import org.apache.spark.util.sketch.BloomFilter

/** The runtime bloom-prune probe must (a) never produce a false
  * negative — or `join_bloom_prune` would silently drop matching fact
  * rows — (b) actually prune (the whole point is shrinking the
  * pre-join volume), and (c) agree between codegen and interpreted
  * eval, since the probe sits in the scan's fused loop in the query
  * but may be interpreted in other contexts.
  */
class BloomPruneSpec extends SparkSuite {

  private def dimKeys: Set[Long] =
    Tables
      .supplier(spark, sf)
      .filter(col("s_suppkey") % 10 === 0)
      .select(col("s_suppkey"))
      .collect()
      .map(_.getLong(0))
      .toSet

  private def bloomBytes: Array[Byte] = {
    val bf = BloomFilter.create(10000L, 0.01)
    dimKeys.foreach(bf.putLong)
    LongBloomMightContain.serialize(bf)
  }

  test("no false negatives: every true dim key passes the probe") {
    val bytes = bloomBytes
    val keys = dimKeys
    assert(keys.nonEmpty, "fixture: the selective dim subset must be non-empty")
    // every lineitem row whose key IS in the dim set must survive
    val trueMatches = Tables
      .lineitem(spark, sf)
      .filter(col("l_suppkey").isin(keys.toSeq: _*))
      .count()
    val survivingTrue = Tables
      .lineitem(spark, sf)
      .filter(col("l_suppkey").isin(keys.toSeq: _*))
      .filter(LongBloomMightContain.probe(bytes, col("l_suppkey")))
      .count()
    assert(trueMatches == survivingTrue, "a matching fact row was pruned (false negative)")
  }

  test("the probe prunes: surviving rows are a strict, small superset of true matches") {
    val bytes = bloomBytes
    val total = Tables.lineitem(spark, sf).count()
    val surviving = Tables
      .lineitem(spark, sf)
      .filter(LongBloomMightContain.probe(bytes, col("l_suppkey")))
      .count()
    val trueMatches = Tables
      .lineitem(spark, sf)
      .filter(col("l_suppkey").isin(dimKeys.toSeq: _*))
      .count()
    assert(surviving >= trueMatches, "bloom cannot undercount")
    // at 1% fpp over a ~90%-non-matching fact the filter must cut most rows
    assert(
      surviving < total / 2,
      s"probe pruned nothing: $surviving of $total survived (true $trueMatches)"
    )
  }

  test("codegen and interpreted eval agree row-for-row") {
    val bytes = bloomBytes
    val df = Tables.lineitem(spark, sf).select(col("l_suppkey")).limit(2000)
    val viaPlan = df
      .filter(LongBloomMightContain.probe(bytes, col("l_suppkey")))
      .collect()
      .map(_.getLong(0))
    // interpreted: drive the expression's eval() directly
    val bf = BloomFilter.readFrom(bytes)
    val viaEval = df.collect().map(_.getLong(0)).filter(bf.mightContainLong)
    assert(viaPlan.sorted.toSeq == viaEval.sorted.toSeq)
  }

  test("join_bloom_prune equals its bloom-free twin") {
    val q = Registry.byName("join_bloom_prune")
    val withBloom = q.run(spark, sf).collect().map(_.toSeq)
    val dim = Tables
      .supplier(spark, sf)
      .filter(col("s_suppkey") % 10 === 0)
      .select(col("s_suppkey"), col("s_name"))
    val without = Tables
      .lineitem(spark, sf)
      .join(broadcast(dim), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(
        count(lit(1)).as("n_items"),
        round(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue")
      )
      .orderBy(col("s_suppkey"))
      .collect()
      .map(_.toSeq)
    assert(withBloom.toSeq == without.toSeq)
  }

  test("SQL function registration: long_bloom_might_contain plans the native expression") {
    org.apache.spark.sql.graftx.GraftFunctions.registerFunctions(spark)
    val bytes = bloomBytes
    spark.createDataFrame(Seq(Tuple1(1L))).toDF("k").createOrReplaceTempView("bloom_probe_t")
    val lit64 = bytes.map(b => f"$b%02x").mkString
    val n = spark
      .sql(s"SELECT long_bloom_might_contain(unhex('$lit64'), k) AS hit FROM bloom_probe_t")
      .collect()
    assert(n.length == 1) // value depends on fixture keys; planning is what's under test
  }
}
