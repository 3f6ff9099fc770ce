package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hilbert-curve key: state machine ≡ the classic rotation algorithm,
  * the adjacency property Morton lacks, and the physical layout. */
class ZorderSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Reference implementation: the classic iterative xy2d rotation
    * algorithm, independent of the operator's state-machine tables. */
  private def xy2d(n: Int, x0: Int, y0: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbertKey equals the rotation algorithm on the full 256x256 grid") {
    import spark.implicits._
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y => (x, y)))
      .toDF("bx", "by")
    val got = grid.select(col("bx"), col("by"),
      graft.ops.Zorder.hilbertKey(col("bx"), col("by")).as("h"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.size == 65536)
    // full exhaustive check against the independent reference
    for (x <- 0 until 256; y <- 0 until 256)
      assert(got((x, y)) == xy2d(256, x, y), s"mismatch at ($x, $y)")
  }

  test("consecutive keys are grid-adjacent (the property Morton lacks)") {
    import spark.implicits._
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y)))
      .toDF("bx", "by")
    val byKey = grid.select(
      graft.ops.Zorder.hilbertKey(col("bx"), col("by")).as("h"),
      col("bx"), col("by"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(_._1)
    // keys are a permutation of 0..4095 (bijective on the sub-grid: the
    // low 6 bits of an 8-level walk starting from state 0 coincide with
    // a 6-level walk, so the 64x64 corner is itself a Hilbert square)
    assert(byKey.map(_._1).toSeq == (0L until 4096L))
    byKey.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
    // Morton on the same grid DOES jump (sanity that the property is
    // non-trivial): (3,1)->(0,2) at the d=7->8 boundary
    val mk = grid.select(
      graft.ops.Zorder.mortonKey(Seq(col("bx"), col("by"))).as("m"),
      col("bx"), col("by"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(_._1)
    val jumps = mk.sliding(2).count { case Array((_, x1, y1), (_, x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(jumps > 0)
  }

  test("layoutHilbert preserves rows and rejects wrong arity") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, (i * 37 % 101).toDouble))
      .toDF("a", "b")
    val out = graft.ops.Zorder.layoutHilbert(df, Seq("a", "b"))
    assert(out.count() == 1000)
    assert(out.columns.toSeq == Seq("a", "b"))
    intercept[IllegalArgumentException] {
      graft.ops.Zorder.layoutHilbert(df, Seq("a"))
    }
  }
}
