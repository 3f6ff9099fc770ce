package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write layout for MULTI-dimensional data skipping
  * — the Spark-parquet analogue of Delta's OPTIMIZE ZORDER BY.
  *
  * `sort_by` gives perfect skipping on its FIRST key and none on the
  * others (each file spans the full domain of every later key). Z-order
  * interleaves the bits of per-column quantile buckets so files are tight
  * little hyper-rectangles: a selective predicate on ANY of the z-ordered
  * columns prunes most files via parquet min/max stats.
  *
  * Shape: one driver-side exact-quantile pass per column builds 256
  * bucket boundaries (`approxQuantile` with relativeError 0 — a
  * deterministic sketch pass, no full sort); bucket assignment + bit
  * interleave are then MAP-SIDE expressions, and the write range-shuffles
  * once on the z-key, exactly like sort_by. The z-key is a derived column
  * dropped after layout — the table schema is unchanged.
  */
object Zorder {

  private val Buckets = 256 // 8 bits per dimension

  /** Per-column quantile boundaries (255 cut points → 256 buckets) for
    * ALL columns from ONE sketch pass (the multi-column approxQuantile
    * overload — per-column calls would rescan the input once per
    * dimension). Deterministic for a given dataset (relativeError 0 =
    * exact Greenwald-Khanna), order-independent. */
  private[graft] def boundaries(df: DataFrame,
      columns: Seq[String]): Seq[Array[Double]] =
    df.stat.approxQuantile(columns.toArray,
      (1 until Buckets).map(_.toDouble / Buckets).toArray, 0.0).toSeq

  /** Map-side bucket id in [0, 256): index of the first boundary ≥ value
    * — a chain of comparisons over a broadcast 255-element literal array
    * (codegen'd; no join, no shuffle). Empty boundaries (zero non-null
    * rows — e.g. an --empty dry run) and null values land in bucket 0. */
  private[graft] def bucketOf(column: String, bounds: Array[Double]): Column =
    if (bounds.isEmpty) lit(0)
    else {
      // width_bucket semantics via SQL: count boundaries strictly below x
      val arr = bounds.mkString("array(", "D, ", "D)")
      expr(s"size(filter($arr, b -> b < CAST(`$column` AS DOUBLE)))")
    }

  /** Interleave the low 8 bits of each dimension's bucket id into one
    * Morton key (bit j of dim d lands at j * ndims + d). */
  private[graft] def mortonKey(buckets: Seq[Column]): Column = {
    val n = buckets.length
    val terms = for {
      (b, d) <- buckets.zipWithIndex
      j <- 0 until 8
    } yield (shiftright(b, j) % 2).cast("long") * lit(1L << (j * n + d))
    terms.reduce(_ + _)
  }

  /** 2D Hilbert state machine, derived from the classic rotation
    * algorithm (the xy2d loop) and verified against it over the full
    * 256×256 bucket grid in ZorderSpec: at each level the quadrant
    * (2·x_bit + y_bit) indexes OUT for the emitted base-4 digit and
    * NEXT for the successor state. Only 4 of D4's 8 symmetries are
    * reachable, so the inter-level state is 2 bits. */
  private val HilbertOut = Seq(0, 1, 3, 2, 0, 3, 1, 2, 2, 1, 3, 0, 2, 3, 1, 0)
  private val HilbertNext = Seq(1, 0, 2, 0, 0, 3, 1, 1, 2, 2, 0, 3, 3, 1, 3, 2)

  /** Hilbert-curve key over two 8-bit bucket ids — the continuity
    * upgrade to [[mortonKey]]: consecutive key values are always
    * GRID-ADJACENT cells (verified exhaustively in the spec), where the
    * Morton curve jumps across the space at every power-of-2 boundary.
    * Files cut from a Hilbert-sorted stream are therefore tighter
    * rectangles — better parquet min/max pruning for the same sort
    * cost. Pure codegen'd expression: the 2-bit state threads through 8
    * `element_at` lookups on the two 16-element literal tables — no
    * join, no shuffle, no UDF. */
  def hilbertKey(bx: Column, by: Column): Column = {
    val outArr = array(HilbertOut.map(lit): _*)
    val nextArr = array(HilbertNext.map(lit): _*)
    var state: Column = lit(0)
    var d: Column = lit(0L)
    for (lvl <- 7 to 0 by -1) {
      val quad = (shiftright(bx, lvl) % 2) * 2 + shiftright(by, lvl) % 2
      val idx = (state * 4 + quad + 1).cast("int") // element_at is 1-based
      d = d * 4 + element_at(outArr, idx).cast("long")
      state = element_at(nextArr, idx)
    }
    d
  }

  /** Rewrite `df` into Hilbert order on exactly two columns: same
    * quantile-bucket + range-partition + in-file-sort shape as
    * [[layout]], with the Hilbert key replacing Morton. */
  def layoutHilbert(df: DataFrame, columns: Seq[String]): DataFrame = {
    val (withKey, keyCol) = withCurveKey(df, columns, "hilbert")
    withKey.repartitionByRange(col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .drop(keyCol)
  }

  /** Attach the curve key as a derived column and return (frame, key
    * column name) — for callers that must compose the curve with OTHER
    * partitioning keys (compaction of a partitioned + zordered table
    * range-partitions on (partition cols, curve key) at an explicit
    * task count; the plain [[layout]]/[[layoutHilbert]] shuffle on the
    * curve alone would scatter partition values across every task and
    * the partitioned write would fan out to tasks × values files). The
    * caller drops the column after shaping. */
  def withCurveKey(df: DataFrame, columns: Seq[String],
      curve: String): (DataFrame, String) = {
    // arity checks BEFORE the quantile pass — boundaries() is a full
    // sketch scan of the input, far too expensive to pay for a
    // misconfiguration that can fail here for free
    if (curve == "hilbert")
      require(columns.size == 2,
        s"hilbert layout takes exactly 2 columns, got ${columns.size}")
    else
      require(columns.size >= 2 && columns.size <= 4,
        s"zorder_by takes 2-4 columns, got ${columns.size}")
    val keyCol = "__graft_curve_key"
    val bounds = boundaries(df, columns)
    val keys = columns.zip(bounds).map { case (c, b) => bucketOf(c, b) }
    val key =
      if (curve == "hilbert") hilbertKey(keys(0), keys(1))
      else mortonKey(keys)
    (df.withColumn(keyCol, key), keyCol)
  }

  /** Rewrite `df` into Z-order: derived z-key → range partition → in-file
    * sort → key dropped. The caller writes the result with no further
    * ordering. */
  def layout(df: DataFrame, columns: Seq[String]): DataFrame = {
    val (withKey, keyCol) = withCurveKey(df, columns, "morton")
    withKey.repartitionByRange(col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .drop(keyCol)
  }
}
