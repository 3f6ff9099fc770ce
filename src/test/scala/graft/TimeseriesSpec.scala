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
}
