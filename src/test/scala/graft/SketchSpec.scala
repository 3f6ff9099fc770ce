package graft

import graft.ops.Sketch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch invariants: estimates never undercount, exact when
  * the matrix is collision-free, matrix size is bounded by d·w, and the
  * build is one exchange. */
class SketchSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("estimates are exact overestimates, exact without collisions") {
    import spark.implicits._
    // 10 distinct keys with known counts 1..10
    val rows = (1 to 10).flatMap(k => Seq.fill(k)(k.toLong))
    val df = rows.toDF("k")
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

    // wide matrix: collisions vanish → exact
    val wide = Sketch.countMin(df, "k", width = 4096, depth = 4)
    val keys = (1 to 10).map(_.toLong).toDF("k")
    val exact = Sketch.estimate(wide, keys, "k", width = 4096, depth = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact == truth)

    // tiny matrix: collisions → still never BELOW the true count
    val tiny = Sketch.countMin(df, "k", width = 4, depth = 2)
    val approx = Sketch.estimate(tiny, keys, "k", width = 4, depth = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) =>
      assert(approx(k) >= n, s"undercount for $k: ${approx(k)} < $n") }
  }

  test("matrix is bounded by d·w and never negative") {
    import spark.implicits._
    val df = (0 until 500).map(_.toLong % 37).toDF("k")
    val m = Sketch.countMin(df, "k", width = 8, depth = 3)
    val cells = m.collect()
    assert(cells.length <= 8 * 3)
    assert(cells.forall(_.getLong(2) > 0))
    val total = cells.map(_.getLong(2)).sum
    assert(total == 500L * 3) // every row lands once per depth
  }

  test("unseen keys estimate to zero on an empty row cell") {
    import spark.implicits._
    val df = Seq(1L, 1L, 2L).toDF("k")
    val m = Sketch.countMin(df, "k", width = 1024, depth = 4)
    val est = Sketch.estimate(m, Seq(99L).toDF("k"), "k",
      width = 1024, depth = 4)
      .collect().head.getLong(1)
    assert(est == 0L)
  }

  test("heavy hitters are exact, even under total sketch collision") {
    import spark.implicits._
    // counts 1..20; threshold 12 → keys 12..20
    val rows = (1 to 20).flatMap(k => Seq.fill(k)(k.toLong))
    val df = rows.toDF("k")
    val expected = (12 to 20).map(k => k.toLong -> k.toLong).toMap
    val wide = Sketch.heavyHitters(df, "k", width = 4096, depth = 4,
      minCount = 12L).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wide == expected)
    // width=1: every key collides into one cell, estimates are the total
    // row count — pruning passes everything, the recount stays exact
    val collided = Sketch.heavyHitters(df, "k", width = 1, depth = 1,
      minCount = 12L).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(collided == expected)
  }

  test("heavy hitters fall back to broadcast-join probes past the literal-cell cap") {
    import spark.implicits._
    val rows = (1 to 20).flatMap(k => Seq.fill(k)(k.toLong))
    val df = rows.toDF("k")
    val expected = (12 to 20).map(k => k.toLong -> k.toLong).toMap
    // force the fallback: 4096*4 cells > 8 → probe via broadcast joins
    spark.conf.set("spark.graft.sketchMaxLiteralCells", "8")
    try {
      val hh = Sketch.heavyHitters(df, "k", width = 4096, depth = 4,
        minCount = 12L)
      val got = hh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
      // the probe really is joins, not a driver-inlined literal map
      val plan = hh.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    } finally spark.conf.unset("spark.graft.sketchMaxLiteralCells")
  }

  test("bloom semi-join works when fact and dim share the key name") {
    import spark.implicits._
    val fact = (0 until 200).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    val dim = Seq(3L, 7L, 49L).toDF("k")
    val expected = fact.join(dim.withColumnRenamed("k", "dk"),
      $"k" === $"dk", "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Sketch.bloomSemiJoin(fact, "k", dim, "k", bits = 1 << 10, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("bloom semi-join is exact and the prefilter actually prunes") {
    import spark.implicits._
    val fact = (0 until 2000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "v")
    val dim = Seq(3L, 7L, 250L, 499L).toDF("dk")
    val expected = fact.join(dim, $"k" === $"dk", "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Sketch.bloomSemiJoin(fact, "k", dim, "dk", bits = 1 << 12, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    // tiny bitmap (64 bits, 1 hash): false positives everywhere — the
    // exact semi-join still removes them all
    val collided = Sketch.bloomSemiJoin(fact, "k", dim, "dk", bits = 64, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(collided == expected)
    // the map-side prefilter alone passes far fewer rows than the corpus
    // at a sane bitmap size (4/500 true selectivity)
    val words = Sketch.bloomFilter(dim, "dk", bits = 1 << 12, k = 3)
    assert(words.map(java.lang.Long.bitCount).sum <= 12)
  }

  test("hll registers are bounded by m and ranks stay in [1, q+1]") {
    import spark.implicits._
    val df = (0 until 50000).map(_.toLong).toDF("k")
    // duplicates must not move any register
    val regs = Sketch.hllRegisters(df.union(df), "k", p = 6).collect()
    assert(regs.length <= 64)
    assert(regs.forall { r =>
      val reg = r.getInt(1); reg >= 1 && reg <= 43 })
    val once = Sketch.hllRegisters(df, "k", p = 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(regs.map(r => r.getLong(0) -> r.getInt(1)).toMap == once)
  }

  test("grouped hll matches the single-group estimator per group") {
    import spark.implicits._
    // two groups of very different cardinality
    val df = ((0 until 20000).map(i => ("big", i.toLong)) ++
      (0 until 300).map(i => ("small", i.toLong))).toDF("g", "k")
    val grouped = Sketch.hllDistinctByGroup(df, Seq("g"), "k", p = 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // per-group result must equal running the single-group pipeline on
    // each slice — same registers, same exact-integer estimate math
    for (g <- Seq("big", "small")) {
      val solo = Sketch.hllEstimate(
        Sketch.hllRegisters(df.filter($"g" === g), "k", p = 6), p = 6)
        .collect().head.getLong(0)
      assert(grouped(g) == solo, s"group $g: ${grouped(g)} != $solo")
    }
    // and the small group's linear-counting path stays near-exact
    assert(math.abs(grouped("small") - 300.0) / 300.0 < 0.2,
      s"small est=${grouped("small")}")
  }

  test("hll estimate lands within the expected error band") {
    import spark.implicits._
    val df = (0 until 50000).map(_.toLong).toDF("k")
    val est = Sketch.hllEstimate(Sketch.hllRegisters(df, "k", p = 6), p = 6)
      .collect().head.getLong(0)
    // std error at m=64 is 1.04/sqrt(64) = 13%; allow 3 sigma
    assert(math.abs(est - 50000.0) / 50000.0 < 0.39, s"est=$est")
  }

  test("hll small cardinalities fall back to linear counting") {
    import spark.implicits._
    val df = (0 until 10).map(_.toLong).toDF("k")
    val est = Sketch.hllEstimate(Sketch.hllRegisters(df, "k", p = 6), p = 6)
      .collect().head.getLong(0)
    // linear counting is near-exact this far below m
    assert(est >= 8 && est <= 12, s"est=$est")
  }

  test("log-histogram quantiles: hand-computed buckets, <=2x overestimate") {
    import spark.implicits._
    // bit lengths: 1->1, 2->2, 3->2, 8->4, 100->7
    val df = (Seq(1L, 2L, 3L, 8L, 100L).map(("a", _)) ++
      Seq(("b", 16L))).toDF("g", "v")
    val got = Sketch.logHistogramQuantiles(df, "g", "v",
      Seq(("p50", 1, 2), ("p90", 9, 10)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // a: n=5, p50 rank 3 -> cum reaches 3 at bucket 2 -> est 3;
    //    p90 rank 5 -> bucket 7 -> est 127. b: single value 16 -> 31.
    assert(got == Map(("a", "p50") -> 3L, ("a", "p90") -> 127L,
      ("b", "p50") -> 31L, ("b", "p90") -> 31L))
    // the contract: est >= exact type-1 quantile and < 2*(max(est_val,1))
    val exact = Seq(1L, 2L, 3L, 8L, 100L).sorted.apply(2) // rank 3
    assert(got(("a", "p50")) >= exact && got(("a", "p50")) < 2 * exact.max(1L))
  }

  test("histogram finisher over pre-merged cells equals the one-shot op") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val df = (0 until 400)
      .map(i => (s"g${i % 3}", rnd.nextInt(5000).toLong)).toDF("g", "v")
    val specs = Seq(("p50", 1, 2), ("p95", 19, 20))
    val oneShot = Sketch.logHistogramQuantiles(df, "g", "v", specs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // merge-by-sum: cells built in two halves and summed, as a
    // streaming window aggregation would maintain them
    val halves = df.withColumn("__bkt",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.bin($"v")))
      .withColumn("__half", $"v" % 2)
      .groupBy("g", "__half", "__bkt").count()
      .groupBy("g", "__bkt")
      .agg(org.apache.spark.sql.functions.sum("count").as("__c"))
    val fromCells = Sketch.histogramQuantilesFromCells(halves, "g",
      "__bkt", "__c", specs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(fromCells == oneShot)
  }

  test("hll set ops: union equals the rebuilt single sketch (closure)") {
    import spark.implicits._
    // groups a and b with a 300-element overlap
    val df = ((0 until 800).map(i => ("a", i.toLong)) ++
      (500 until 1300).map(i => ("b", i.toLong))).toDF("g", "x")
    val ops = Sketch.hllSetOpsByGroup(df, "g", "x", p = 6).collect()
    assert(ops.length === 1)
    val row = ops.head
    assert((row.getString(0), row.getString(1)) === ("a", "b"))
    // HLL closure: the pairwise union estimate must EQUAL the estimate
    // of one sketch built over the concatenated items — not merely
    // approximate it
    val rebuilt = Sketch.hllEstimate(
      Sketch.hllRegisters(df.select("x"), "x", p = 6), p = 6)
      .collect().head.getLong(0)
    assert(row.getLong(4) === rebuilt)
    // inclusion–exclusion identity holds exactly on the emitted columns
    assert(row.getLong(5) ===
      math.max(row.getLong(2) + row.getLong(3) - row.getLong(4), 0L))
    // estimates land in the p=6 error band (~13% rse; allow 3σ)
    assert(math.abs(row.getLong(2) - 800L) <= 320)
    assert(math.abs(row.getLong(4) - 1300L) <= 520)
  }

  test("hll set ops: identical groups intersect to their own estimate") {
    import spark.implicits._
    val df = ((0 until 600).map(i => ("x", i.toLong)) ++
      (0 until 600).map(i => ("y", i.toLong))).toDF("g", "v")
    val row = Sketch.hllSetOpsByGroup(df, "g", "v", p = 6).collect().head
    // identical registers ⇒ union register table = each side's table
    assert(row.getLong(2) === row.getLong(3))
    assert(row.getLong(4) === row.getLong(2))
    assert(row.getLong(5) === row.getLong(2))
  }
}
