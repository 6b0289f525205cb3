package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Grids

/** Pins [[graft.operators.Grids]]' two-level cumulative decomposition to the
  * naive single-partition global window it replaces (spelled with a
  * constant partition key, which is the identical one-partition
  * computation minus the per-task WindowExec warning — keeping the
  * suite's warning channel clean for real regressions) — on a HIGH-cardinality
  * synthetic frame (≈40k distinct values over 50k rows, far above any bucket
  * count), exact equality, not approximation. This is the guard SCALING.md
  * promises for the KS/AUC grid scan: the bucketed path is the DEFAULT and it
  * is exact, so there is no cardinality threshold to tune at all.
  */
class GridsSpec extends SparkSuite {

  private def synth = {
    import spark.implicits._
    spark
      .range(50000)
      .select(
        col("id"),
        pmod(xxhash64(col("id")), lit(40000L)).as("v"),
        (pmod(xxhash64(col("id"), lit(7)), lit(1000L)) - 500L).as("x")
      )
  }

  test("runningSums equals the naive global window on a high-cardinality frame (asc)") {
    val d = synth
    val w = Window.partitionBy(Det.onePart(col("id"))).orderBy(col("v"), col("id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = d.select(col("id"), sum(col("x")).over(w).as("cx"), sum(lit(1L)).over(w).as("rnk"))
    val fast = Grids
      .runningSums(d, "v", desc = false, Seq("id"), Seq((col("x"), "cx"), (lit(1L), "rnk")))
      .select(col("id"), col("cx"), col("rnk"))
    assert(naive.exceptAll(fast).isEmpty && fast.exceptAll(naive).isEmpty)
  }

  test("runningSums equals the naive global window (desc order)") {
    val d = synth
    val w =
      Window.partitionBy(Det.onePart(col("id"))).orderBy(col("v").desc, col("id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = d.select(col("id"), sum(col("x")).over(w).as("cx"))
    val fast = Grids
      .runningSums(d, "v", desc = true, Seq("id"), Seq((col("x"), "cx")))
      .select(col("id"), col("cx"))
    assert(naive.exceptAll(fast).isEmpty && fast.exceptAll(naive).isEmpty)
  }

  test("runningSums is exact on adversarial frames (negatives, heavy ties, few buckets)") {
    // buckets = 4 forces many bucket-boundary crossings; each frame is a
    // distinct hazard: negative value range (bucket formula around a
    // negative lo), 90% of rows tied on one value (one bucket holds
    // nearly everything), and values denser than buckets (empty buckets
    // in the offset table).
    val frames = Seq(
      "negatives"  -> spark.range(5000).select(col("id"), (pmod(xxhash64(col("id")), lit(2000L)) - 1500L).as("v")),
      "heavy-ties" -> spark.range(5000).select(col("id"),
        when(pmod(col("id"), lit(10L)) < 9, lit(42L)).otherwise(pmod(xxhash64(col("id")), lit(100L))).as("v")),
      "sparse"     -> spark.range(5000).select(col("id"), (pmod(xxhash64(col("id")), lit(3L)) * 1000000L).as("v"))
    )
    for ((tag, d) <- frames; desc <- Seq(false, true)) {
      val ord = if (desc) Seq(col("v").desc, col("id")) else Seq(col("v"), col("id"))
      val w = Window.partitionBy(Det.onePart(col("id"))).orderBy(ord: _*).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = d.select(col("id"), sum(col("v")).over(w).as("cv"), sum(lit(1L)).over(w).as("rnk"))
      val fast = Grids
        .runningSums(d, "v", desc, Seq("id"), Seq((col("v"), "cv"), (lit(1L), "rnk")), buckets = 4)
        .select(col("id"), col("cv"), col("rnk"))
      assert(naive.exceptAll(fast).isEmpty && fast.exceptAll(naive).isEmpty, s"$tag desc=$desc")
    }
  }

  test("equi-depth mode is exactly equal to the naive global window too") {
    val d = synth
    for (desc <- Seq(false, true)) {
      val ord   = if (desc) Seq(col("v").desc, col("id")) else Seq(col("v"), col("id"))
      val w     = Window.partitionBy(Det.onePart(col("id"))).orderBy(ord: _*).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = d.select(col("id"), sum(col("x")).over(w).as("cx"), sum(lit(1L)).over(w).as("rnk"))
      val fast = Grids
        .runningSums(d, "v", desc, Seq("id"), Seq((col("x"), "cx"), (lit(1L), "rnk")), equiDepth = true)
        .select(col("id"), col("cx"), col("rnk"))
      assert(naive.exceptAll(fast).isEmpty && fast.exceptAll(naive).isEmpty, s"desc=$desc")
    }
  }

  test("equi-depth bounds bucket occupancy on distributional skew where equal-width collapses") {
    // 99% of rows take (mostly distinct) values in [0, 1e5); 1% sit near
    // 1e12. Equal-width with B=256 makes the bucket width ≈ 4e9, so the
    // dense region — and with it ~99% of the frame — lands in ONE bucket:
    // exactly the degradation Grids' scaladoc warns about. Equi-depth
    // boundaries come from the same-pass percentile sketch, so occupancy
    // stays ≈ N/B no matter how the values are distributed.
    val n = 50000L
    val d = spark
      .range(n)
      .select(
        col("id"),
        when(pmod(col("id"), lit(100L)) === 0, lit(1000000000000L) + col("id"))
          .otherwise(pmod(xxhash64(col("id")), lit(100000L)))
          .as("v")
      )
    val B = 256
    def maxOccupancy(equiDepth: Boolean): Long =
      Grids
        .bucketed(d, "v", desc = false, B, equiDepth)
        .groupBy(col("_bkt"))
        .count()
        .agg(max(col("count")))
        .collect()(0)
        .getLong(0)
    val widthMax = maxOccupancy(equiDepth = false)
    val depthMax = maxOccupancy(equiDepth = true)
    assert(widthMax >= (n * 9) / 10, s"equal-width should collapse here (got max=$widthMax)")
    assert(depthMax <= 3L * n / B, s"equi-depth occupancy should stay ≈N/B (got max=$depthMax, N/B=${n / B})")
    // and the skewed frame still cumulates exactly under equi-depth
    val w     = Window.partitionBy(Det.onePart(col("id"))).orderBy(col("v"), col("id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = d.select(col("id"), sum(col("v")).over(w).as("cv"))
    val fast = Grids
      .runningSums(d, "v", desc = false, Seq("id"), Seq((col("v"), "cv")), buckets = B, equiDepth = true)
      .select(col("id"), col("cv"))
    assert(naive.exceptAll(fast).isEmpty && fast.exceptAll(naive).isEmpty)
  }

  test("reserved-name collisions are rejected up front") {
    val ok = spark.range(10).select(col("id"), col("id").cast("double").as("v"))
    intercept[IllegalArgumentException] {
      Grids.runningSums(ok.withColumn("_bkt", lit(1)), "v", desc = false, Seq("id"), Seq((lit(1L), "rnk")))
    }
    intercept[IllegalArgumentException] { // sum name shadows an input column
      Grids.runningSums(ok, "v", desc = false, Seq("id"), Seq((lit(1L), "v")))
    }
    intercept[IllegalArgumentException] { // duplicate sum names
      Grids.runningSums(ok, "v", desc = false, Seq("id"), Seq((lit(1L), "s"), (lit(2L), "s")))
    }
  }

  test("runningSums survives the all-one-value degenerate frame") {
    val d = spark.range(1000).select(col("id"), lit(5.0).as("v"))
    val fast = Grids.globalRank(d, "v", desc = false, Seq("id"), "rnk")
    assert(fast.agg(max(col("rnk")), min(col("rnk"))).collect()(0).toSeq == Seq(1000L, 1L))
  }

  test("SortedLowerBound equals the filter spelling on sorted arrays with duplicates") {
    import org.apache.spark.sql.graftx.SortedLowerBound
    // values land below, on, between and above boundaries; the boundary
    // array carries duplicates (a heavy quantile tie) — the binary
    // search must count strictly-smaller elements exactly like
    // size(filter(bnds, b -> b < v)) in every case
    val bnds = array(Seq(-2.0, 0.0, 0.0, 1.5, 1.5, 1.5, 7.25, 9.0).map(lit): _*)
    val d = spark
      .range(0, 1000)
      .select(((col("id").cast("double") - 500) / 40).as("v"))
    val bad = d
      .select(
        SortedLowerBound.count(bnds, col("v")).as("fast"),
        size(filter(bnds, b => b < col("v"))).as("slow")
      )
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(bad == 0L)
    // degenerate arrays
    val edge = spark.range(1).select(
      SortedLowerBound.count(array().cast("array<double>"), lit(3.0)).as("empty"),
      SortedLowerBound.count(array(lit(5.0)), lit(5.0)).as("eq"),
      SortedLowerBound.count(array(lit(5.0)), lit(5.1)).as("above")
    ).collect()(0)
    assert(edge.getInt(0) == 0 && edge.getInt(1) == 0 && edge.getInt(2) == 1)
  }

  test("debug-mode order-uniqueness check accepts unique orders and rejects ambiguous ones") {
    val key = "graft.grids.checkUniqueOrder"
    spark.conf.set(key, "true")
    try {
      val d = spark.range(100).select(col("id"), (col("id") % 10).cast("double").as("v"))
      // unique (v, id) order: passes with the check on
      val ok = Grids.runningSums(d, "v", desc = false, Seq("id"), Seq((lit(1L), "rnk")))
      assert(ok.count() == 100)
      // ambiguous order (v alone, 10-way ties): the check must fail fast
      val e = intercept[IllegalArgumentException] {
        Grids.runningSums(d, "v", desc = false, Nil, Seq((lit(1L), "rnk"))).count()
      }
      assert(e.getMessage.contains("not unique"))
    } finally spark.conf.set(key, "false")
  }

  test("ntileFromRank matches ntile() bucket-for-bucket on real data, asc and desc") {
    val o = Tables.orders(spark, sf).select(col("o_totalprice").as("v"), col("o_orderkey"))
    val n = o.agg(count(lit(1)).as("_n"))
    for (desc <- Seq(false, true)) {
      val ord   = if (desc) Seq(col("v").desc, col("o_orderkey")) else Seq(col("v"), col("o_orderkey"))
      val naive = o.select(col("o_orderkey"), ntile(10).over(Window.partitionBy(Det.onePart(col("o_orderkey"))).orderBy(ord: _*)).cast("long").as("b"))
      val fast = Grids
        .globalRank(o, "v", desc, Seq("o_orderkey"), "rnk")
        .crossJoin(broadcast(n))
        .select(col("o_orderkey"), Grids.ntileFromRank(col("rnk"), col("_n"), 10).as("b"))
      assert(naive.exceptAll(fast).isEmpty && fast.exceptAll(naive).isEmpty, s"desc=$desc")
    }
  }

  test("ntileFromRank handles N < n (every row its own bucket)") {
    val d = spark.range(4).select(col("id"), col("id").cast("double").as("v"))
    val n = d.agg(count(lit(1)).as("_n"))
    val r = Grids
      .globalRank(d, "v", desc = false, Seq("id"), "rnk")
      .crossJoin(broadcast(n))
      .select(Grids.ntileFromRank(col("rnk"), col("_n"), 10).as("b"))
      .orderBy(col("b"))
      .collect()
      .map(_.getLong(0))
      .toSeq
    assert(r == Seq(1L, 2L, 3L, 4L))
  }
}
