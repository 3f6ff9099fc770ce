package graft

import graft.ops.Graph
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Integer-exact PageRank: hand-computed iterations (floor divisions and
  * all), uniform-cycle fixed point, dangling-node teleport floor,
  * weighted split, iters=0 identity. */
class GraphSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def run(edges: Seq[(Int, Int, Long)], nodes: Seq[Int],
      iters: Int): Map[Int, BigDecimal] = {
    import spark.implicits._
    Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        nodes.toDF("id"), "id", iters)
      .collect().map(r => r.getInt(0) -> BigDecimal(r.getDecimal(1))).toMap
  }

  test("iters=0 gives the uniform floor(unit/N) start vector") {
    assert(run(Seq((1, 2, 1L)), Seq(1, 2, 3), 0) ===
      Map(1 -> BigDecimal(333333333333L), 2 -> BigDecimal(333333333333L),
        3 -> BigDecimal(333333333333L)))
  }

  test("uniform 3-cycle is a fixed point of the integer recurrence") {
    val edges = Seq((1, 2, 1L), (2, 3, 1L), (3, 1, 1L))
    val uniform = Map(1 -> BigDecimal(333333333333L),
      2 -> BigDecimal(333333333333L), 3 -> BigDecimal(333333333333L))
    assert(run(edges, Seq(1, 2, 3), 1) === uniform)
    assert(run(edges, Seq(1, 2, 3), 7) === uniform)
  }

  test("dangling node: two hand-computed iterations") {
    // 1 → 2 only; node 2's mass is not redistributed (pseudo-PageRank)
    val edges = Seq((1, 2, 1L))
    // r1: tele = floor(3e12/40) = 75e9;
    //     r1(2) = 75e9 + floor(17·5e11/20) = 75e9 + 425e9 = 5e11
    assert(run(edges, Seq(1, 2), 1) ===
      Map(1 -> BigDecimal(75000000000L), 2 -> BigDecimal(500000000000L)))
    // r2(2) = 75e9 + floor(17·75e9/20) = 75e9 + 63750000000
    assert(run(edges, Seq(1, 2), 2) ===
      Map(1 -> BigDecimal(75000000000L), 2 -> BigDecimal(138750000000L)))
  }

  test("weighted split floors each contribution separately") {
    // 1 → 2 (w=3), 1 → 3 (w=1): contribs floor(r0·3/4), floor(r0/4)
    val edges = Seq((1, 2, 3L), (1, 3, 1L))
    assert(run(edges, Seq(1, 2, 3), 1) === Map(
      1 -> BigDecimal(50000000000L),
      2 -> BigDecimal(262499999999L),
      3 -> BigDecimal(120833333333L)))
  }

  test("total mass never exceeds unit and ranks are non-negative") {
    val edges = Seq((1, 2, 5L), (2, 1, 1L), (2, 3, 2L), (3, 1, 7L),
      (4, 1, 1L))
    val r = run(edges, Seq(1, 2, 3, 4, 5), 5)
    assert(r.values.forall(_ >= 0))
    assert(r.values.sum <= BigDecimal(1000000000000L))
  }

  private def tris(edges: Seq[(Int, Int)]): Map[Int, Long] = {
    import spark.implicits._
    graft.ops.Graph.triangleCounts(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  test("triangleCounts: one triangle plus a pendant edge") {
    // {1,2,3} closed; 4 hangs off 1 — counted in nothing
    assert(tris(Seq((1, 2), (2, 3), (1, 3), (1, 4))) ===
      Map(1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  test("triangleCounts: K4 gives every node 3 of the 4 triangles") {
    val k4 = for (i <- 1 to 4; j <- (i + 1) to 4) yield (i, j)
    assert(tris(k4) === Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 3L))
  }

  test("triangleCounts: stars have no triangles; canonicalization holds") {
    // hub-and-spokes → empty result
    assert(tris((2 to 8).map(i => (1, i))) === Map.empty)
    // duplicates, reversed duplicates, and self-loops collapse away
    assert(tris(Seq((1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 1))) ===
      Map(1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  test("checkpointEvery: 25 iterations, values unchanged, lineage bounded") {
    import spark.implicits._
    val edges = Seq((1, 2, 1L), (2, 3, 1L), (3, 1, 1L), (1, 3, 2L))
    val nodes = Seq(1, 2, 3)
    def rank(cp: Option[Int]) =
      Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w",
          nodes.toDF("id"), "id", iters = 25, checkpointEvery = cp)
    val plain = rank(None)
    val chk = rank(Some(5))
    // localCheckpoint is a materialization boundary, never a value change
    assert(chk.collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap ===
      plain.collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap)
    // the checkpointed plan must be bounded: its tree no longer nests all
    // 25 iterations (the plain plan string grows ~linearly per iteration)
    val plainDepth = plain.queryExecution.optimizedPlan.toString.length
    val chkDepth = chk.queryExecution.optimizedPlan.toString.length
    assert(chkDepth < plainDepth / 2,
      s"checkpointed plan ($chkDepth chars) should be far smaller " +
        s"than the unbounded one ($plainDepth chars)")
    assert(intercept[IllegalArgumentException] {
      rank(Some(0))
    }.getMessage.contains("checkpointEvery"))
  }
}
