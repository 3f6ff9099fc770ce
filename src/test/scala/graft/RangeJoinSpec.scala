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
