package graft

import graft.ops.Cdc
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CDC changelog compaction (SCD-1) and history reconstruction (SCD-2). */
class CdcSpec extends AnyFunSuite {

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

  // (key, ts, seq, op, payload)
  private def log() = {
    import spark.implicits._
    Seq(
      // k1: plain upsert chain — latest wins
      (1L, 10L, 1L, "U", "a"), (1L, 20L, 2L, "U", "b"),
      (1L, 30L, 3L, "U", "c"),
      // k2: inserted then deleted — gone from the compacted state
      (2L, 10L, 4L, "U", "d"), (2L, 20L, 5L, "D", ""),
      // k3: delete first (stale tombstone), then re-inserted — present
      (3L, 10L, 6L, "D", ""), (3L, 20L, 7L, "U", "e"),
      // k4: two changes at the SAME ts — seq breaks the tie
      (4L, 10L, 8L, "U", "old"), (4L, 10L, 9L, "U", "new"))
      .toDF("k", "t", "seq", "op", "v")
  }

  test("compact keeps the latest surviving row per key") {
    val out = Cdc.compact(log(), Seq("k"), "t", Seq("seq"), "op")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(4)))
    assert(out.toSeq == Seq((1L, "c"), (3L, "e"), (4L, "new")))
  }

  test("history: deletes close intervals but emit nothing") {
    val out = Cdc.history(log(), Seq("k"), "t", Seq("seq"), "op")
      .orderBy("k", "valid_from", "seq").collect()
      .map(r => (r.getLong(0), r.getString(4),
        r.getLong(5), Option(r.get(6)).map(_.asInstanceOf[Long]),
        r.getBoolean(7)))
    assert(out.toSeq == Seq(
      (1L, "a", 10L, Some(20L), false),
      (1L, "b", 20L, Some(30L), false),
      (1L, "c", 30L, None, true),
      // k2's only row is CLOSED at the delete's ts, not left current
      (2L, "d", 10L, Some(20L), false),
      (3L, "e", 20L, None, true),
      // same-ts tie: the seq-earlier row's interval is [10, 10)
      (4L, "old", 10L, Some(10L), false),
      (4L, "new", 10L, None, true)))
  }

  test("compact and history agree on current rows") {
    val compacted = Cdc.compact(log(), Seq("k"), "t", Seq("seq"), "op")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val current = Cdc.history(log(), Seq("k"), "t", Seq("seq"), "op")
      .filter("is_current")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(compacted == current)
  }

  test("missing columns are rejected") {
    intercept[IllegalArgumentException] {
      Cdc.compact(log(), Seq("nope"), "t", Nil, "op")
    }
  }
}
