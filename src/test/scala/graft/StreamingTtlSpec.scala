package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.time.Duration

/** State TTL for the continuous-stream mode of sessionize/funnel: per-key
  * state is bounded, but without a timeout the KEY COUNT grows without
  * bound on a continuous deployment — an inactive key must expire (for
  * sessions: emitting its open tail) and a re-arriving key must start
  * from fresh state. The bounded AvailableNow oracles run with TTL off,
  * so their batch-equivalence contract is untouched (q_stream_sessionize
  * / q_stream_funnel stay green).
  *
  * Test mechanics: with ProcessingTimeTimeout armed, every micro-batch
  * re-arms timeouts, so the engine ALWAYS has another batch to run and
  * `processAllAvailable` never returns — assertions therefore POLL the
  * memory sink with a deadline instead. */
class StreamingTtlSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      // armed processing-time timeouts make the engine run micro-batches
      // continuously; the 4.1 checksum checkpoint manager deadlocks its
      // async-close future under that churn (task threads park forever in
      // ChecksumCancellableFSDataOutputStream.close) — plain checkpoint
      // files sidestep it, and the throttled trigger calms the rate
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val trigger =
    org.apache.spark.sql.streaming.Trigger.ProcessingTime("150 milliseconds")

  /** Poll `cond` until true or the deadline passes; returns the final
    * evaluation (timeouts fire on batch boundaries, so expiry effects
    * land asynchronously ~one TTL + one trigger after the last event). */
  private def awaitCond(cond: => Boolean, timeoutMs: Long = 30000): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (System.nanoTime() < deadline && !cond) Thread.sleep(100)
    cond
  }

  test("sessionize TTL: inactive key emits its tail session, re-arrival starts fresh") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    // 10x the probe sleep below: a GC pause or loaded box would need to
    // stall micro-batches for >5 s for the no-emit probe to race the TTL
    val ttl = Duration.ofMillis(6000)
    val out = StreamingOps.sessionizeStream(mem.toDS(), gapMinutes = 30,
      ttl = Some(ttl))
    val q = out.writeStream.format("memory").queryName("ttl_sessions")
      .outputMode("append").trigger(trigger).start()
    try {
      def rows() = spark.table("ttl_sessions")
        .selectExpr("user_id", "unix_micros(session_start)",
          "unix_micros(session_end)", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq

      mem.addData((1L, 1000L), (1L, 2000L))   // open session for key 1
      val armNanos = System.nanoTime()
      Thread.sleep(600)                        // a few triggers, well < TTL
      // gate on elapsed time, not just the sleep: if the box stalled past
      // half the TTL the no-emit claim is no longer safe to assert
      if ((System.nanoTime() - armNanos) / 1000000L < ttl.toMillis / 2)
        assert(rows().isEmpty, "an open session must not emit while live")

      // TTL passes with no key-1 events → the next batch's timeout sweep
      // closes its tail session by inactivity and emits it
      assert(awaitCond(rows().contains((1L, 1000L, 2000L, 2L))),
        s"expired key must emit its tail session: ${rows()}")

      // key 1 re-arrives AFTER expiry → FRESH state: a brand-new session
      // whose start is the new event (not a continuation), which itself
      // expires one TTL later and emits as a 1-event session
      mem.addData((1L, 9000L))
      assert(awaitCond(rows().contains((1L, 9000L, 9000L, 1L))),
        s"re-arrival must start a new session: ${rows()}")
    } finally q.stop()
  }

  test("funnel TTL: an expired key restarts from scratch") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val steps = Seq("click", "purchase")
    val ttl = Duration.ofMillis(6000)
    val mem = MemoryStream[(Long, String, Long)]
    val out = StreamingOps.funnelDepthStream(mem.toDS(), steps, cap = 10,
      ttl = Some(ttl))
    val q = out.writeStream.format("memory").queryName("ttl_funnel")
      .outputMode("append").trigger(trigger).start()
    try {
      def lastDepth(user: Long): Option[Int] = spark.table("ttl_funnel")
        .filter(s"user_id = $user")
        .selectExpr("max_by(funnel_depth, update_idx)")
        .collect().headOption.filterNot(_.isNullAt(0)).map(_.getInt(0))

      mem.addData((1L, "click", 100L))
      assert(awaitCond(lastDepth(1L).contains(1)),
        s"click alone reaches depth 1, got ${lastDepth(1L)}")

      // TTL passes → a later batch's sweep drops key 1's state silently
      // (generous margin: continuous 150ms triggers sweep soon after)
      Thread.sleep(ttl.toMillis + 2000)

      // a purchase arriving AFTER expiry finds NO remembered click:
      // depth 0 — with surviving state this would have been depth 2
      mem.addData((1L, "purchase", 200L))
      assert(awaitCond(lastDepth(1L).contains(0)),
        s"expired key must restart from scratch, got ${lastDepth(1L)}")
    } finally q.stop()
  }

  test("dedup TTL: seen-flags expire, a late duplicate re-emits (windowed dedup)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ttl = Duration.ofMillis(6000)
    val mem = MemoryStream[(Long, Long, String)]
    val out = StreamingOps.streamingDedupStream(mem.toDS(), ttl = Some(ttl))
    val q = out.writeStream.format("memory").queryName("ttl_dedup")
      .outputMode("append").trigger(trigger).start()
    try {
      def emitted(): Long =
        spark.table("ttl_dedup").filter("event_id = 1").count()

      mem.addData((1L, 10L, "click"), (1L, 10L, "click")) // dup in-batch
      assert(awaitCond(emitted() == 1), s"first occurrence wins: ${emitted()}")

      // a duplicate INSIDE the horizon stays suppressed (gated on
      // elapsed time: if the box stalled past half the TTL, the
      // no-re-emit claim is no longer safe to assert)
      val dupNanos = System.nanoTime()
      mem.addData((1L, 10L, "click"))
      Thread.sleep(600)
      if ((System.nanoTime() - dupNanos) / 1000000L < ttl.toMillis / 2)
        assert(emitted() == 1, "within-horizon duplicate must not re-emit")

      // the seen-flag expires → a LATE duplicate re-emits (windowed
      // dedup semantics — the bounded-state trade, not a bug)
      Thread.sleep(ttl.toMillis + 2000)
      mem.addData((1L, 10L, "click"))
      assert(awaitCond(emitted() == 2),
        s"post-horizon duplicate re-emits: ${emitted()}")
    } finally q.stop()
  }

  test("without TTL the same sequence keeps state across batches (control)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val out = StreamingOps.funnelDepthStream(mem.toDS(),
      Seq("click", "purchase"), cap = 10, ttl = None)
    val q = out.writeStream.format("memory").queryName("nottl_funnel")
      .outputMode("append").trigger(trigger).start()
    try {
      mem.addData((1L, "click", 100L))
      q.processAllAvailable() // NoTimeout ⇒ no perpetual re-arm, safe here
      Thread.sleep(6500) // longer than the TTL the other tests use
      mem.addData((1L, "purchase", 200L))
      q.processAllAvailable()
      val depth = spark.table("nottl_funnel").filter("user_id = 1")
        .selectExpr("max_by(funnel_depth, update_idx)").collect()(0).getInt(0)
      assert(depth == 2, s"NoTimeout state must persist across batches: $depth")
    } finally q.stop()
  }

  test("cdc compaction TTL: an expired key forgets its latest, stale re-emits") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val ttl = Duration.ofMillis(3000)
    val out = StreamingOps.cdcCompactStream(mem.toDS(), ttl = Some(ttl))
    val q = out.writeStream.format("memory").queryName("ttl_cdc")
      .outputMode("append").trigger(trigger).start()
    try {
      def rows() = spark.table("ttl_cdc")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSeq

      mem.addData((1L, 100L, 1L, "U", 1.0))
      assert(awaitCond(rows().contains((1L, 100L, 1L, "U"))))
      // wait out the TTL with no traffic: the key's latest-state is freed
      assert(awaitCond(rows().nonEmpty))
      Thread.sleep(ttl.toMillis + 2000)
      // a STALE change (ts 50 < 100) now re-emits as if fresh — the
      // documented bounded-state trade
      mem.addData((1L, 50L, 2L, "U", 9.0))
      assert(awaitCond(rows().contains((1L, 50L, 2L, "U"))),
        s"stale change must re-emit after expiry: ${rows()}")
    } finally q.stop()
  }

  test("cdc compaction: batches emit only state ADVANCES, tombstones included") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val out = StreamingOps.cdcCompactStream(mem.toDS())
    val q = out.writeStream.format("memory").queryName("cdc_stream")
      .outputMode("append").trigger(trigger).start()
    try {
      def rows() = spark.table("cdc_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4))).toSet

      // batch 1: two upserts for k1 (only the newer emits), one for k2
      mem.addData((1L, 10L, 1L, "U", 1.0), (1L, 20L, 2L, "U", 2.0),
        (2L, 10L, 3L, "U", 3.0))
      q.processAllAvailable()
      assert(rows() == Set((1L, 20L, 2L, "U", 2.0), (2L, 10L, 3L, "U", 3.0)))

      // batch 2: stale change for k1 (no emission), delete for k2
      // (tombstone emits), fresh k3
      mem.addData((1L, 5L, 4L, "U", 9.0), (2L, 20L, 5L, "D", 0.0),
        (3L, 15L, 6L, "U", 4.0))
      q.processAllAvailable()
      assert(rows() == Set(
        (1L, 20L, 2L, "U", 2.0), (2L, 10L, 3L, "U", 3.0),
        (2L, 20L, 5L, "D", 0.0), (3L, 15L, 6L, "U", 4.0)))

      // same-ts tie advances on seq
      mem.addData((3L, 15L, 7L, "U", 5.0))
      q.processAllAvailable()
      assert(rows().contains((3L, 15L, 7L, "U", 5.0)))
    } finally q.stop()
  }

  test("transition stream: state bridges batch boundaries, sorts in-batch") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val out = StreamingOps.transitionStream(mem.toDS())
    val q = out.writeStream.format("memory").queryName("trans_stream")
      .outputMode("append").trigger(trigger).start()
    try {
      def pairs() = spark.table("trans_stream")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted

      // batch 1, deliberately out of order: u1 sees a(10) → b(20)
      mem.addData((1L, 20L, 2L, "b"), (1L, 10L, 1L, "a"))
      q.processAllAvailable()
      assert(pairs() == Seq(("a", "b")))

      // batch 2: the bridge b→c comes from STATE, then c→d in-batch;
      // u2 contributes its own first pair, no cross-key leakage
      mem.addData((1L, 30L, 3L, "c"), (1L, 40L, 4L, "d"),
        (2L, 5L, 5L, "x"), (2L, 6L, 6L, "y"))
      q.processAllAvailable()
      assert(pairs() == Seq(("a", "b"), ("b", "c"), ("c", "d"),
        ("x", "y")))
    } finally q.stop()
  }

  test("transition stream TTL: an expired key loses its bridge") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val out = StreamingOps.transitionStream(mem.toDS(),
      ttl = Some(Duration.ofMillis(800)))
    val q = out.writeStream.format("memory").queryName("trans_ttl")
      .outputMode("append").trigger(trigger).start()
    try {
      def n() = spark.table("trans_ttl").count()
      mem.addData((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"))
      assert(awaitCond(n() == 1))
      // wait well past the TTL so the key's last-event state expires
      Thread.sleep(8000)
      // a re-arriving pair starts fresh: c→d only, NO b→c bridge
      mem.addData((1L, 30L, 3L, "c"), (1L, 40L, 4L, "d"))
      assert(awaitCond(n() == 2))
      val got = spark.table("trans_ttl")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == Set(("a", "b"), ("c", "d")))
    } finally q.stop()
  }
}
