package graft

import graft.ops.Funnel
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Ordered-funnel semantics: step i counts only at-or-after step i−1's
  * first completion, out-of-order events don't advance the funnel, and
  * the whole computation is one aggregation (single exchange). */
class FunnelSpec extends AnyFunSuite {

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

  test("funnel depth honors step order, not mere presence") {
    import spark.implicits._
    val df = Seq(
      // u1: full ordered funnel
      ("u1", "signup", ts(1)), ("u1", "click", ts(2)), ("u1", "purchase", ts(3)),
      // u2: purchase BEFORE click → depth 2 (signup, click), not 3
      ("u2", "signup", ts(1)), ("u2", "purchase", ts(2)), ("u2", "click", ts(3)),
      // u3: no signup → depth 0 even with later steps present
      ("u3", "click", ts(1)), ("u3", "purchase", ts(2)),
      // u4: signup only → depth 1
      ("u4", "signup", ts(5)),
      // u5: simultaneous signup+click (same ts) → at-or-after counts → 2
      ("u5", "signup", ts(7)), ("u5", "click", ts(7))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.depth(df, "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase"))
    val got = out.collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("u1" -> 3, "u2" -> 2, "u3" -> 0, "u4" -> 1, "u5" -> 2))
  }

  test("funnel retries: a later second occurrence can complete the chain") {
    import spark.implicits._
    // click@2 is before signup's first completion? no — signup@1, click@2
    // completes step 2; purchase@1 (before click) doesn't count but
    // purchase@9 does
    val df = Seq(
      ("u1", "purchase", ts(1)), ("u1", "signup", ts(1)),
      ("u1", "click", ts(2)), ("u1", "purchase", ts(9))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.depth(df, "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase"))
    assert(out.collect().head.getInt(1) == 3)
  }

  test("maxPerStep bounds buffers without changing early completions") {
    import spark.implicits._
    // a "bot" key with 1000 signup events and a normal completion path
    val bot = (0 until 1000).map(i => ("bot", "signup", ts(i)))
    val tail = Seq(("bot", "click", ts(500)), ("bot", "purchase", ts(600)))
    val df = (bot ++ tail).toDF("user_id", "event_type", "ts")
    val capped = Funnel.depth(df, "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase"), maxPerStep = Some(10))
    // signup's first completion is ts(0) — inside the cap — so the full
    // funnel still completes
    assert(capped.collect().head.getInt(1) == 3)

    // the horizon is real: a click whose rank exceeds the cap is not
    // seen, so a completion that NEEDS it is missed
    val spam = (0 until 20).map(i => ("u", "click", ts(i))) ++
      Seq(("u", "signup", ts(100)), ("u", "click", ts(200)))
    val df2 = spam.toDF("user_id", "event_type", "ts")
    val uncapped = Funnel.depth(df2, "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase"))
    val capped2 = Funnel.depth(df2, "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase"), maxPerStep = Some(10))
    assert(uncapped.collect().head.getInt(1) == 2) // click@200 counts
    assert(capped2.collect().head.getInt(1) == 1)  // click@200 beyond cap
  }

  test("funnel plans as a single aggregation exchange — bounded by default") {
    import spark.implicits._
    val df = (0 until 60).map(i =>
      (s"u${i % 6}", Seq("signup", "click", "purchase")(i % 3), ts(i)))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.depth(df, "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase"))
    val plan = out.queryExecution.executedPlan.toString
    // the default-on buffer bound shows as a row_number pre-pass, and the
    // (key, step) ranking window + final aggregate both reuse the one
    // key-hash exchange
    assert(plan.contains("row_number"), plan.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan.take(2000))
  }

  test("streaming funnel equals the batch operator on bounded input") {
    val sfDir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$sfDir/events.parquet")))
    val steps = Seq("signup", "click", "purchase")
    val streamed = graft.streaming.StreamingOps
      .funnelDepth(spark, sfDir, steps)
      .groupBy("funnel_depth").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val batch = Funnel.depth(
      graft.Tables(spark, sfDir, "events"), "user_id", "event_type", "ts",
      steps)
      .groupBy("funnel_depth").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"stream=$streamed batch=$batch")
  }

  test("buffer bound defaults on via conf, 0 disables") {
    import spark.implicits._
    val spam = (0 until 20).map(i => ("u", "click", ts(i))) ++
      Seq(("u", "signup", ts(100)), ("u", "click", ts(200)))
    val df = spam.toDF("user_id", "event_type", "ts")
    // conf-driven cap (no explicit maxPerStep): same horizon semantics
    // as passing the parameter
    spark.conf.set("spark.graft.funnelMaxPerStep", "10")
    try {
      val capped = Funnel.depth(df, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      assert(capped.collect().head.getInt(1) == 1) // click@200 beyond cap
      spark.conf.set("spark.graft.funnelMaxPerStep", "0")
      val unbounded = Funnel.depth(df, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      assert(unbounded.collect().head.getInt(1) == 2) // click@200 counts
      assert(!unbounded.queryExecution.executedPlan.toString
        .contains("row_number"))
    } finally spark.conf.unset("spark.graft.funnelMaxPerStep")
  }

  test("conversion window caps every later step at t0 + within") {
    import spark.implicits._
    val df = Seq(
      // u1: everything inside the 10s window → 3
      ("u1", "signup", ts(1)), ("u1", "click", ts(3)),
      ("u1", "purchase", ts(9)),
      // u2: click inside, purchase at t0+11 → 2
      ("u2", "signup", ts(1)), ("u2", "click", ts(3)),
      ("u2", "purchase", ts(12)),
      // u3: the FIRST in-order click is out of window; a pre-signup
      // click doesn't count either → depth 1
      ("u3", "click", ts(0)), ("u3", "signup", ts(1)),
      ("u3", "click", ts(20)), ("u3", "purchase", ts(21)),
      // u4: boundary — click at exactly t0+10 is IN (inclusive) → 2
      ("u4", "signup", ts(5)), ("u4", "click", ts(15))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.depth(df, "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase"),
      withinMicros = Some(10000000L))
    val got = out.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("u1" -> 3, "u2" -> 2, "u3" -> 1, "u4" -> 2))
    // control: without the window u2 and u3 convert fully
    val free = Funnel.depth(df, "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(free == Map("u1" -> 3, "u2" -> 3, "u3" -> 3, "u4" -> 2))
  }
}
