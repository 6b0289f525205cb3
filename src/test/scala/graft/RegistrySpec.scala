package graft

import org.apache.spark.sql.functions._

/** Contract-level checks: every registry query runs and returns rows at
  * sf0.001, names are unique, oracles pair with queries, and results
  * are deterministic across repeated runs (SURVEY §5.6).
  */
class RegistrySpec extends SparkSuite {

  test("entry returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique and oracle keys are query keys") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every query returns rows at sf0.001") {
    for (q <- Registry.all) {
      val n = q.run(spark, sf).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("no oracle-checked output carries a top-level complex type (SURVEY 2.9.3)") {
    // the driver's comparator sorts every column in pandas; list/map/
    // struct columns make that sort throw (unhashable ndarray) and the
    // query silently fails the round — serialize with array_join &co
    // instead. Schema-only check: planning, no execution.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    for (q <- Registry.all if q.oracle.nonEmpty) {
      val bad = q.run(spark, sf).schema.fields.filter(f =>
        f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType])
      assert(
        bad.isEmpty,
        s"${q.name}: column(s) ${bad.map(_.name).mkString(", ")} would break the driver comparator"
      )
    }
  }

  test("repeated runs are identical (determinism, sampled)") {
    val sample = Seq("agg_group_pricing", "sim_cosine_topk", "dedup_near_jaccard",
      "ts_session_30m", "text_fingerprint", "win_ranking")
    for (name <- sample) {
      val q = Registry.byName(name)
      val a = q.run(spark, sf).collect().toSeq
      val b = q.run(spark, sf).collect().toSeq
      assert(a == b, s"$name differs across runs")
    }
  }
}
