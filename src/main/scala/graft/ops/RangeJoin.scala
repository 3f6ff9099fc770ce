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

  /** Inner-join `left` interval rows to `right` interval rows sharing
    * `keys` whose [start, end] ranges OVERLAP (inclusive:
    * lStart ≤ rEnd AND rStart ≤ lEnd) — the interval×interval sibling of
    * [[pointInInterval]], same bucketing rewrite. Both sides explode to
    * every bucket they touch and equi-join on (keys, bucket); an
    * overlapping pair meets in every bucket BOTH touch, so dedup is by
    * canonical bucket: the pair counts only in the bucket of
    * max(lStart, rStart), which lies in both sides' ranges exactly when
    * they overlap. All four bound columns must be LONGs in a common
    * unit; non-key column names must be disjoint across the sides. */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val clash = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(clash.isEmpty, s"non-key columns collide across sides: $clash")
    def bucketOf(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(bucketWidth))) / bucketWidth).cast("long")
    val l = left.withColumn("__bucket",
      explode(sequence(bucketOf(col(lStart)), bucketOf(col(lEnd)))))
    val r = right.withColumn("__bucket",
      explode(sequence(bucketOf(col(rStart)), bucketOf(col(rEnd)))))
    l.join(r, keys :+ "__bucket")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(bucketOf(greatest(col(lStart), col(rStart))) === col("__bucket"))
      .drop("__bucket")
  }
}
