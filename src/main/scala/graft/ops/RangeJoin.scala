package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join: equi-keyed point-in-interval matching without
  * the nested-loop/cartesian plan Spark falls back to for non-equi join
  * conditions.
  *
  * Technique (the standard interval-bucketing rewrite): pick a bucket
  * width W; a point lands in bucket ⌊p/W⌋, an interval [s, e] explodes
  * to every bucket it touches (⌊s/W⌋..⌊e/W⌋). Points and intervals can
  * then EQUI-join on (keys, bucket) — a hash shuffle Spark scales
  * linearly — with the exact s ≤ p ≤ e predicate as a post-filter. A
  * (point, interval) pair meets in exactly ONE bucket (the point's), so
  * no dedup is needed. Interval replication is ⌈len/W⌉+1×: pick W near
  * the typical interval length to keep it ~2×. A hot (key, bucket) —
  * many points and intervals in one time slice — is plain equi-join
  * skew, which AQE's skew-join split handles; for pathological single
  * buckets compose with [[Skew.saltedJoin]]'s salting on the bucket
  * column. */
object RangeJoin {

  /** Inner-join `points` rows to `intervals` rows sharing `keys` with
    * pointCol ∈ [startCol, endCol] (inclusive). The three range columns
    * must be LONGs in a common unit (epoch micros, cents, …) — callers
    * convert timestamps with `unix_micros` first. Non-key column names
    * must be disjoint across the two sides. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet) -- keys
    require(clash.isEmpty, s"non-key columns collide across sides: $clash")
    // exact floor-div (also for negative values): subtracting the
    // nonnegative pmod makes the numerator an exact multiple of W, so
    // the double division is exact for |v| < 2^53 (epoch µs ≈ 1.7e15)
    def bucketOf(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(bucketWidth))) / bucketWidth).cast("long")
    val p = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val iv = intervals
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    p.join(iv, keys :+ "__bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
