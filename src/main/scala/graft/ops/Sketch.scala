package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch: sub-linear frequency estimation for heavy-hitter
  * queries over corpora too large to groupBy exactly. The sketch is a
  * d×w counter matrix; item x increments row i at column
  * hash_i(x) mod w, and the estimate for x is the MIN across rows —
  * always an overestimate, within εN with probability 1−δ for
  * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * The row hashes are md5-derived (same 48-bit idiom as
  * [[Sampling.hashBucket]]) so the whole sketch is a pure deterministic
  * function of the data — any engine reproduces it bit-for-bit, which is
  * what makes an approximate structure oracle-checkable.
  *
  * Scale shape: building the sketch is a d× map-side expand followed by
  * ONE partial-aggregated count shuffle of (row, bucket) pairs — d·w
  * cells total regardless of input size (the point of a sketch). Probing
  * broadcast-joins the d·w cell table to the query keys. */
object Sketch {

  private def bucket(row: Int, c: Column, width: Int): Column =
    pmod(conv(substring(md5(concat_ws(":", lit(row), c.cast("string"))),
      1, 12), 16, 10).cast("long"), lit(width.toLong))

  /** The d×w counter matrix as rows (row, bucket, cnt). Cells never
    * touched stay absent (zero). */
  def countMin(df: DataFrame, itemCol: String, width: Int,
      depth: Int): DataFrame = {
    require(width > 0 && depth > 0, s"width/depth must be positive")
    val rows = explode(array((0 until depth).map(i =>
      struct(lit(i).as("row"),
        bucket(i, col(itemCol), width).as("bucket"))): _*)).as("cell")
    df.select(rows)
      .groupBy(col("cell.row").as("row"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `keys` (a small DataFrame with `keyCol`):
    * min over rows of the matching cell, 0 when a row's cell is empty.
    * `sketch` is the [[countMin]] output — d·w rows, broadcast side. */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      width: Int, depth: Int): DataFrame = {
    val probes = keys
      .withColumn("row", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("bucket", bucket0(col("row"), col(keyCol), width))
    probes.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** [[bucket]] with the row index as a Column (probe side explodes
    * rows at runtime). */
  private def bucket0(row: Column, c: Column, width: Int): Column =
    pmod(conv(substring(md5(concat_ws(":", row, c.cast("string"))),
      1, 12), 16, 10).cast("long"), lit(width.toLong))
}
