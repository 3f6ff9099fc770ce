package graft

import graft.ops.Timeseries
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Daily gap-fill + last-observation-carried-forward. */
class TimeseriesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def ts(day: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s"$day 10:00:00")

  test("ewma: hand-computed adjusted weights, window truncation, key isolation") {
    import spark.implicits._
    val df = Seq(
      // key a: 3 points — exact rational EWMA values
      ("a", 1L, 100L), ("a", 2L, 200L), ("a", 3L, 50L),
      // key b: single point — EWMA is the point itself
      ("b", 1L, 7L)).toDF("k", "o", "v")
    val out = graft.ops.Timeseries.ewma(df, "k", Seq("o"), "v",
      window = 16, wNum = 3, wDen = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    def ref(xs: Seq[Long]): Double = {
      // adjusted EWMA with decay 3/4: Σ x_{t−k}(3/4)^k / Σ (3/4)^k
      val n = xs.size
      val num = xs.zipWithIndex.map { case (x, j) =>
        BigInt(x) * BigInt(3).pow(n - 1 - j) * BigInt(4).pow(j) }.sum
      val den = xs.indices.map(j =>
        BigInt(3).pow(n - 1 - j) * BigInt(4).pow(j)).sum
      BigDecimal(num.toDouble / den.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(("a", 1L)) == 100.0)
    assert(out(("a", 2L)) == ref(Seq(100L, 200L)))
    assert(out(("a", 3L)) == ref(Seq(100L, 200L, 50L)))
    assert(out(("b", 1L)) == 7.0)

    // window truncation: with window=2 only the last 2 points weigh in
    val w2 = graft.ops.Timeseries.ewma(df, "k", Seq("o"), "v",
      window = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(w2(("a", 3L)) == ref(Seq(200L, 50L)))

    intercept[IllegalArgumentException] {
      graft.ops.Timeseries.ewma(df, "k", Seq("o"), "v", wNum = 5, wDen = 4)
    }
  }

  test("holes are spined, LOCF-filled, and flagged; keys independent") {
    import spark.implicits._
    val df = Seq(
      // key a: days 1, 3, 6 — holes at 2, 4, 5; day 3 has two events
      ("a", ts("2024-01-01"), 10.0), ("a", ts("2024-01-03"), 5.0),
      ("a", ts("2024-01-03"), 7.0), ("a", ts("2024-01-06"), 1.0),
      // key b: a single day — one spine row, no holes
      ("b", ts("2024-02-10"), 3.5)).toDF("k", "ts", "v")
    val out = Timeseries.gapFillDaily(df, "k", "ts", "v")
      .orderBy("k", "day").collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        Option(r.getDecimal(2)).map(_.doubleValue),
        r.getDecimal(3).doubleValue, r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01", Some(10.0), 10.0, true),
      ("a", "2024-01-02", None, 10.0, false),
      ("a", "2024-01-03", Some(12.0), 12.0, true),
      ("a", "2024-01-04", None, 12.0, false),
      ("a", "2024-01-05", None, 12.0, false),
      ("a", "2024-01-06", Some(1.0), 1.0, true),
      ("b", "2024-02-10", Some(3.5), 3.5, true)))
  }

  test("no gaps means spine equals the observed days") {
    import spark.implicits._
    val df = Seq(("k", ts("2024-03-01"), 1.0), ("k", ts("2024-03-02"), 2.0))
      .toDF("k", "ts", "v")
    val out = Timeseries.gapFillDaily(df, "k", "ts", "v").collect()
    assert(out.length == 2)
    assert(out.forall(_.getBoolean(4)))
  }

  private def spans(iv: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    Timeseries.mergeIntervals(iv.toDF("k", "s", "e"), "k", "s", "e")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("mergeIntervals: overlap, touch, nest, gap — per key") {
    assert(spans(Seq(
      ("a", 0L, 10L), ("a", 5L, 20L),   // overlap -> [0,20]
      ("a", 20L, 30L),                  // touches end -> extends to 30
      ("a", 40L, 50L), ("a", 42L, 44L), // nested inside [40,50]
      ("a", 60L, 61L),                  // isolated
      ("b", 0L, 5L)                     // other key unaffected
    )) === Set(
      ("a", 0L, 30L, 3L), ("a", 40L, 50L, 2L), ("a", 60L, 61L, 1L),
      ("b", 0L, 5L, 1L)))
  }

  test("mergeIntervals: an early long interval swallows later shorts") {
    // running-max (not lag) semantics: [0,100] covers [10,20] AND
    // [30,40] even though [10,20] ends before [30,40] starts
    assert(spans(Seq(("k", 0L, 100L), ("k", 10L, 20L), ("k", 30L, 40L)))
      === Set(("k", 0L, 100L, 3L)))
  }

  test("mergeIntervals: duplicate intervals merge deterministically") {
    assert(spans(Seq(("k", 1L, 2L), ("k", 1L, 2L), ("k", 3L, 4L)))
      === Set(("k", 1L, 2L, 2L), ("k", 3L, 4L, 1L)))
  }

  test("changepointByGroup: level shift found, flat ties earliest, tiny") {
    import spark.implicits._
    val rows =
      Seq(10L, 10L, 10L, 50L, 50L).zipWithIndex.map { case (v, i) =>
        ("shift", i + 1, v) } ++
      Seq(("flat", 1, 7L), ("flat", 2, 7L), ("flat", 3, 7L)) ++
      Seq(("one", 1, 5L))
    val out = graft.ops.Timeseries.changepointByGroup(
      rows.toDF("k", "t", "x"), "k", "t", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getInt(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val stat = math.rint(math.sqrt(3.0 * 2.0 / 5.0) * 40.0 * 1e6) / 1e6
    assert(out("shift") == ((5L, 3, stat, 10.0, 50.0)))
    // flat: every split scores 0 → earliest wins
    assert(out("flat") == ((3L, 1, 0.0, 7.0, 7.0)))
    // a single point has no split
    assert(!out.contains("one"))
  }

  test("seasonalNaiveError: perfect season, flat NULL mase, NULL drop") {
    import spark.implicits._
    val rows =
      // k1: period-2 alternation — seasonal forecast is perfect
      Seq(10L, 12L, 10L, 12L, 10L, 12L).zipWithIndex.map { case (v, t) =>
        ("k1", t + 1, Some(v)) } ++
      // k2: flat — naive error 0, skill undefined
      Seq(("k2", 1, Some(5L)), ("k2", 2, Some(5L)), ("k2", 3, Some(5L))) ++
      // k3: a NULL row is dropped BEFORE the row-based lags
      Seq(("k3", 1, Some(4L)), ("k3", 2, Option.empty[Long]),
        ("k3", 3, Some(6L)), ("k3", 4, Some(8L)))
    val out = graft.ops.Timeseries.seasonalNaiveError(
      rows.toDF("k", "t", "v"), "k", "t", "v", season = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          Option(r.get(4))))).toMap
    assert(out("k1") == ((4L, 0.0, 2.0, Some(0.0))))
    assert(out("k2") == ((1L, 0.0, 0.0, None)))
    // k3 after the drop: [4, 6, 8] — one scored row: |8−4|=4, |8−6|=2
    assert(out("k3") == ((1L, 4.0, 2.0, Some(2.0))))
  }

  test("ewma: out-of-range decay parameters error instead of wrapping") {
    import spark.implicits._
    val df = Seq(("k", 1, 100L), ("k", 2, 200L)).toDF("k", "t", "v")
    // wDen=10, window=20 -> 10^19 > Long.MaxValue: must throw, not wrap
    val e = intercept[IllegalArgumentException] {
      graft.ops.Timeseries.ewma(df, "k", Seq("t"), "v",
        window = 20, wNum = 9, wDen = 10)
    }
    assert(e.getMessage.contains("overflows Long"))
    // the largest safe table at wDen=10 is window=19 (10^18 < 2^63)
    val ok = graft.ops.Timeseries.ewma(df, "k", Seq("t"), "v",
      window = 19, wNum = 9, wDen = 10).collect()
    assert(ok.length == 2)
  }
}
