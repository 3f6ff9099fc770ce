package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Backward as-of join semantics: greatest right ts at-or-before each
  * left row per key, inclusive ties, null when nothing precedes, and a
  * staleness tolerance — all from one union + window plan (no range or
  * nested-loop join in the physical plan). */
class AsofJoinSpec extends AnyFunSuite {

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

  test("backward as-of matches latest at-or-before, per key, null before first") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", ts(5)),   // after r@3 → 30.0
      (2L, "u1", ts(10)),  // tie with r@10 → inclusive → 100.0
      (3L, "u1", ts(2)),   // before any right row → null
      (4L, "u2", ts(7)),   // u2's only right row is r@7 → 70.0 (not u1's)
      (5L, "u3", ts(9))    // key with no right rows at all → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u1", ts(3), 30.0),
      ("u1", ts(10), 100.0),
      ("u2", ts(7), 70.0)
    ).toDF("user_id", "ts", "pval")

    val out = AsofJoin.backward(left, right, Seq("user_id"), "ts", "ts",
      Seq("pval"))
    val got = out.collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("pval")).map(_.toDouble)).toMap
    assert(got == Map(1L -> Some(30.0), 2L -> Some(100.0), 3L -> None,
      4L -> Some(70.0), 5L -> None))

    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("Join"), physical.take(2000))
  }

  test("toleranceMicros nulls out stale matches") {
    import spark.implicits._
    val left = Seq((1L, "u1", ts(100)), (2L, "u1", ts(9)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(("u1", ts(5), 50.0)).toDF("user_id", "ts", "pval")
    val out = AsofJoin.backward(left, right, Seq("user_id"), "ts", "ts",
      Seq("pval"), toleranceMicros = Some(10L * 1000000))
    val got = out.collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("pval")).map(_.toDouble)).toMap
    // 95 s gap > 10 s tolerance → null; 4 s gap → match
    assert(got == Map(1L -> None, 2L -> Some(50.0)))
  }

  test("forward as-of matches earliest at-or-after, with tolerance") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", ts(5)),   // next right is r@10 → 100.0
      (2L, "u1", ts(10)),  // tie at 10 → inclusive → 100.0
      (3L, "u1", ts(11)),  // nothing after → null
      (4L, "u2", ts(0))    // u2 has no right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(("u1", ts(3), 30.0), ("u1", ts(10), 100.0))
      .toDF("user_id", "ts", "pval")
    val out = AsofJoin.forward(left, right, Seq("user_id"), "ts", "ts",
      Seq("pval"))
    val got = out.collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("pval")).map(_.toDouble)).toMap
    assert(got == Map(1L -> Some(100.0), 2L -> Some(100.0), 3L -> None,
      4L -> None))

    // 5s→10s gap is 5 s; tolerance 4 s nulls it, 5 s keeps it
    val tight = AsofJoin.forward(left, right, Seq("user_id"), "ts", "ts",
      Seq("pval"), toleranceMicros = Some(4L * 1000000))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("pval"))).toMap
    assert(tight(1L).isEmpty && tight(2L).isDefined)
  }

  test("null payload values come from the matched row, not an older one") {
    import spark.implicits._
    // The nearest right row (t=8) carries a NULL pval and a non-null
    // qual; the match must return BOTH fields from that row — pval null,
    // qual "b" — never pval 30.0 grafted from the older t=3 row.
    val left = Seq((1L, "u1", ts(9))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u1", ts(3), Option(30.0), Option("a")),
      ("u1", ts(8), Option.empty[Double], Option("b"))
    ).toDF("user_id", "ts", "pval", "qual")

    val row = AsofJoin.backward(left, right, Seq("user_id"), "ts", "ts",
      Seq("pval", "qual")).collect().head
    assert(row.getAs[Any]("pval") == null, "pval must be the matched row's null")
    assert(row.getAs[String]("qual") == "b")

    // tolerance must be measured against the matched row's timestamp too:
    // gap is 1 s to the t=8 row, so a 2 s tolerance keeps qual "b"
    val tol = AsofJoin.backward(left, right, Seq("user_id"), "ts", "ts",
      Seq("pval", "qual"), toleranceMicros = Some(2L * 1000000))
      .collect().head
    assert(tol.getAs[String]("qual") == "b")
  }

  test("randomized: backward/forward match a naive reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813)
    val keys = Seq("a", "b", "c")
    val left = (0 until 200).map(i =>
      (i.toLong, keys(rnd.nextInt(3)), ts(rnd.nextInt(50))))
    // right timestamps unique per key (the operator's match is
    // well-defined up to exact (key, ts) duplicates)
    val right = keys.zipWithIndex.flatMap { case (k, ki) =>
      rnd.shuffle((0 until 50).toList).take(35).map { t =>
        val p: Option[Double] =
          if (rnd.nextBoolean()) Some(rnd.nextInt(100).toDouble) else None
        (k, ts(t), p, (ki * 100 + t).toLong)
      }
    }
    val ldf = left.toDF("event_id", "k", "ts")
    val rdf = right.toDF("k", "ts", "pval", "rid")
    val tol = 7L * 1000000

    // naive reference: nearest right row by (|gap|, then latest/earliest
    // preference irrelevant — exact ties on (k, ts) resolved by taking
    // the LAST right row in input order, matching last() over the window
    def naive(forward: Boolean) = left.map { case (id, k, lts) =>
      val cands = right.zipWithIndex.filter { case ((rk, rts, _, _), _) =>
        rk == k && (if (forward) rts.getTime >= lts.getTime
                    else rts.getTime <= lts.getTime) }
      val best =
        if (cands.isEmpty) None
        else Some(cands.maxBy { case ((_, rts, _, _), idx) =>
          // nearest wins; among equal timestamps the window's last()
          // keeps the final row in (ts, side) sort order = input order
          val t = rts.getTime
          (if (forward) -t else t, idx)
        }._1)
      val inTol = best.exists { case (_, rts, _, _) =>
        math.abs(lts.getTime - rts.getTime) * 1000 <= tol }
      id -> (if (inTol) best.flatMap(_._3) else None)
    }.toMap

    for (fwd <- Seq(false, true)) {
      val got = (if (fwd)
        AsofJoin.forward(ldf, rdf, Seq("k"), "ts", "ts", Seq("pval"),
          toleranceMicros = Some(tol))
      else
        AsofJoin.backward(ldf, rdf, Seq("k"), "ts", "ts", Seq("pval"),
          toleranceMicros = Some(tol)))
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Double]("pval")).map(_.toDouble)).toMap
      assert(got == naive(fwd), s"forward=$fwd diverged from naive")
    }
  }

  test("payload name collisions are rejected") {
    import spark.implicits._
    val l = Seq((1L, "u", ts(1), 2.0)).toDF("event_id", "user_id", "ts", "pval")
    val r = Seq(("u", ts(1), 3.0)).toDF("user_id", "ts", "pval")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.backward(l, r, Seq("user_id"), "ts", "ts", Seq("pval"))
    }
    assert(e.getMessage.contains("collide"))
  }
}
