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

  /** Rewrite `df` into Z-order: derived z-key → range partition → in-file
    * sort → key dropped. The caller writes the result with no further
    * ordering. */
  def layout(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.size >= 2 && columns.size <= 4,
      s"zorder_by takes 2-4 columns, got ${columns.size}")
    val bounds = boundaries(df, columns)
    val zkey = mortonKey(columns.zip(bounds).map {
      case (c, b) => bucketOf(c, b)
    })
    df.withColumn("__graft_zkey", zkey)
      .repartitionByRange(col("__graft_zkey"))
      .sortWithinPartitions(col("__graft_zkey"))
      .drop("__graft_zkey")
  }
}
