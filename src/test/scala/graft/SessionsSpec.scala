package graft

import graft.ops.Sessions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Batch sessionization semantics: 1-based per-key session indices split
  * on gaps STRICTLY greater than the threshold, keys isolated, and both
  * windows share one exchange in the physical plan. */
class SessionsSpec extends AnyFunSuite {

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

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("sessions split on gap > threshold, boundary gap stays together") {
    import spark.implicits._
    val df = Seq(
      ("u1", ts(0)), ("u1", ts(100)),   // session 1
      ("u1", ts(200)),                  // gap exactly 100 → SAME session
      ("u1", ts(301)),                  // gap 101 > 100 → session 2
      ("u2", ts(0))                     // other key → its own session 1
    ).toDF("user_id", "ts")
    val out = Sessions.assign(df, "user_id", "ts", gapSeconds = 100L)
    val got = out.collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000,
        r.getLong(2))).toSet
    assert(got == Set(
      ("u1", 0L, 1L), ("u1", 100L, 1L), ("u1", 200L, 1L),
      ("u1", 301L, 2L), ("u2", 0L, 1L)))
  }

  test("both windows plan over a single exchange") {
    import spark.implicits._
    val df = (0 until 50).map(i => (s"u${i % 5}", ts(i * 400L)))
      .toDF("user_id", "ts")
    val out = Sessions.assign(df, "user_id", "ts", gapSeconds = 300L)
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, plan.take(2000))
  }

  test("tie columns make equal-timestamp ordering deterministic") {
    import spark.implicits._
    val df = Seq(("u1", ts(0), 2L), ("u1", ts(0), 1L), ("u1", ts(500), 3L))
      .toDF("user_id", "ts", "event_id")
    val out = Sessions.assign(df, "user_id", "ts", gapSeconds = 100L,
      tieCols = Seq("event_id"))
    val got = out.collect()
      .map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("transitions count adjacent pairs per key and row-normalize") {
    import spark.implicits._
    // u1: a→b→a→b  u2: a→b  ⇒ from a: {b:3}, from b: {a:1}; u2's last
    // b has no successor (no cross-key adjacency)
    val df = Seq(
      ("u1", ts(0), "a"), ("u1", ts(1), "b"),
      ("u1", ts(2), "a"), ("u1", ts(3), "b"),
      ("u2", ts(0), "a"), ("u2", ts(1), "b")
    ).toDF("user_id", "ts", "event_type")
    val got = Sessions.transitions(df, "user_id", "ts", "event_type")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      ("a", "b") -> (3L, 1.0),
      ("b", "a") -> (1L, 1.0)))
  }

  test("transitions drop NULL states before pairing") {
    import spark.implicits._
    // a→NULL→b with the NULL dropped makes a→b adjacent — the matrix
    // is over OBSERVED states, not raw positions
    val df = Seq(
      ("u1", ts(0), Some("a")), ("u1", ts(1), None),
      ("u1", ts(2), Some("b"))
    ).toDF("user_id", "ts", "event_type")
    val got = Sessions.transitions(df, "user_id", "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "b", 1L)))
  }

  test("cooccurrenceLift: hand lift/support, absent pair, NULL drop") {
    import spark.implicits._
    val df = Seq(
      ("u1", Some("a")), ("u1", Some("b")), ("u1", Some("a")), // dup a
      ("u2", Some("a")), ("u2", Some("b")),
      ("u3", Some("a")), ("u3", None),
      ("u4", Some("c"))).toDF("user_id", "event_type")
    val out = graft.ops.Sessions.cooccurrenceLift(df, "user_id",
      "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // N=4 keys; a in 3, b in 2, both in 2:
    // support = 2/4, lift = 2·4/(3·2) = 4/3
    assert(out(("a", "b")) ==
      ((2L, 0.5, math.rint(4.0 / 3.0 * 1e6) / 1e6)))
    // c never co-occurs with anything — its pairs are absent
    assert(out.size == 1)
  }

  test("gapRegularity: clockwork scores 0, hand CV, guards drop keys") {
    import spark.implicits._
    val df = Seq(
      // u1: perfect 10s clock → CV exactly 0, most bot-like
      ("u1", ts(0), 1L), ("u1", ts(10), 2L), ("u1", ts(20), 3L),
      ("u1", ts(30), 4L),
      // u2: gaps 10/20/60 s → CV = sqrt(4200)/90
      ("u2", ts(0), 5L), ("u2", ts(10), 6L), ("u2", ts(30), 7L),
      ("u2", ts(90), 8L),
      // u3: too few events
      ("u3", ts(0), 9L), ("u3", ts(10), 10L),
      // u4: same-instant burst → all-zero gaps, CV undefined
      ("u4", ts(5), 11L), ("u4", ts(5), 12L), ("u4", ts(5), 13L),
      ("u4", ts(5), 14L)
    ).toDF("user_id", "ts", "event_id")
    val out = graft.ops.Sessions.gapRegularity(df, "user_id", "ts",
      Seq("event_id"), minEvents = 4, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getInt(4)))
    val cv2 = math.rint(math.sqrt(4200.0) / 90.0 * 1e6).toLong
    assert(out.toSeq == Seq(
      ("u1", 3L, 0L, 1), ("u2", 3L, cv2, 2)))
  }

  test("transitions probability splits across destinations") {
    import spark.implicits._
    // one a→x pair per key (so no other adjacencies sneak in):
    // from a: b twice, c once, d once ⇒ p = .5/.25/.25
    val df = Seq(
      ("u1", ts(0), "a"), ("u1", ts(1), "b"),
      ("u2", ts(0), "a"), ("u2", ts(1), "c"),
      ("u3", ts(0), "a"), ("u3", ts(1), "b"),
      ("u4", ts(0), "a"), ("u4", ts(1), "d")
    ).toDF("user_id", "ts", "event_type")
    val got = Sessions.transitions(df, "user_id", "ts", "event_type")
      .collect().map(r => (r.getString(1), r.getDouble(3))).toMap
    assert(got == Map("b" -> 0.5, "c" -> 0.25, "d" -> 0.25))
  }
}
