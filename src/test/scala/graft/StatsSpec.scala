package graft

import graft.ops.Stats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Windowed exact quantiles: type-1 (discrete) semantics, integer
  * target indexing, no per-group buffering. */
class StatsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("quantile values match the sort-and-index definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- Seq("a", "b", "c")
      _ <- 0 until (if (g == "a") 101 else 37)
    } yield (g, rnd.nextInt(1000))
    val df = rows.toDF("g", "v")
    val got = Stats.quantilesByGroup(df, "g", "v",
      Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2))
      .toMap
    // reference: sorted values, index ceil(p*n) (1-based)
    for ((g, vs) <- rows.groupBy(_._1)) {
      val sorted = vs.map(_._2).sorted
      val n = sorted.size
      for ((label, num, den) <- Seq(("p50", 1, 2), ("p90", 9, 10),
          ("p99", 99, 100))) {
        val k = (n * num + den - 1) / den
        assert(got((g, label)) == sorted(k - 1),
          s"$g/$label: ${got((g, label))} != ${sorted(k - 1)}")
      }
    }
    // exactly one row per (group, quantile)
    assert(got.size == 9)
  }

  test("ties and tiny groups stay well-defined; plan has no group buffers") {
    import spark.implicits._
    // all-equal values: every quantile is that value; n=1 group: ditto
    val df = (Seq.fill(10)(("t", 5)) :+ (("one", 42))).toDF("g", "v")
    val out = Stats.quantilesByGroup(df, "g", "v", Seq(("p50", 1, 2),
      ("p99", 99, 100)))
    val got = out.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(got == Map(("t", "p50") -> 5, ("t", "p99") -> 5,
      ("one", "p50") -> 42, ("one", "p99") -> 42))
    // scale shape: pure window ranking — no collect_list/sort_array
    // aggregation buffers anywhere in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), plan.take(2000))
  }
}
