package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed range join: result equality with a naive non-equi join, no
  * nested-loop/cartesian in the physical plan, no duplicate pairs even
  * when an interval spans many buckets. */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("matches the naive non-equi join, without a nested-loop plan") {
    import spark.implicits._
    val points = (0L until 200L).map(i => (s"k${i % 5}", i * 7L))
      .toDF("key", "p")
    // intervals of varied lengths, some spanning many buckets, some empty
    val intervals = Seq(
      ("k0", 0L, 100L, 1L), ("k0", 50L, 60L, 2L), ("k1", 500L, 1400L, 3L),
      ("k2", 10L, 10L, 4L), ("k3", 2000L, 3000L, 5L), ("k4", 90L, 400L, 6L)
    ).toDF("key", "s", "e", "iv_id")

    val bucketed = RangeJoin.pointInInterval(points, intervals, Seq("key"),
      "p", "s", "e", bucketWidth = 50L)
    val naive = points.join(intervals, Seq("key"))
      .filter($"p" >= $"s" && $"p" <= $"e")

    val a = bucketed.select("key", "p", "iv_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val b = naive.select("key", "p", "iv_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a == b)
    assert(a.distinct.size == a.size, "bucketing must not duplicate pairs")
    assert(a.nonEmpty)

    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("interval overlap matches the naive join, no duplicates, no BNLJ") {
    import spark.implicits._
    // varied lengths: some spanning many buckets, zero-width, touching
    val lhs = Seq(
      ("k0", 0L, 100L, 1L), ("k0", 100L, 100L, 2L), ("k0", 101L, 250L, 3L),
      ("k1", 0L, 1000L, 4L), ("k1", 999L, 2000L, 5L), ("k2", 5L, 10L, 6L)
    ).toDF("key", "ls", "le", "l_id")
    val rhs = Seq(
      ("k0", 100L, 130L, 10L), ("k0", 260L, 270L, 11L),
      ("k1", 500L, 600L, 12L), ("k1", 2000L, 2000L, 13L),
      ("k2", 10L, 20L, 14L), ("k3", 0L, 9999L, 15L)
    ).toDF("key", "rs", "re", "r_id")

    val bucketed = RangeJoin.intervalOverlap(lhs, rhs, Seq("key"),
      "ls", "le", "rs", "re", bucketWidth = 50L)
    val naive = lhs.join(rhs, Seq("key"))
      .filter($"ls" <= $"re" && $"rs" <= $"le")

    val a = bucketed.select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = naive.select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
    assert(a.distinct.size == a.size, "bucketing must not duplicate pairs")
    // touching endpoints count (1-10, 2-10, 5-13, 6-14); key isolation (no 15)
    assert(a.contains((2L, 10L)) && a.contains((5L, 13L)) &&
      a.contains((6L, 14L)))
    assert(!a.exists(_._2 == 15L))

    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("inclusive bounds and key isolation") {
    import spark.implicits._
    val points = Seq(("a", 10L), ("a", 20L), ("b", 10L)).toDF("key", "p")
    val intervals = Seq(("a", 10L, 20L, 1L)).toDF("key", "s", "e", "iv_id")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("key"),
      "p", "s", "e", bucketWidth = 100L)
      .select("key", "p").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // both endpoints match; key b's point does not see key a's interval
    assert(got == Set(("a", 10L), ("a", 20L)))
  }
}
