package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the right row with
  * the nearest right timestamp at-or-before (backward) or at-or-after
  * (forward) the left row's timestamp within the same key. The
  * feature-store / market-data join Spark has no built-in operator for.
  *
  * Spark-first shape instead of a range join: tag both sides, UNION, and
  * run ONE `last(_, ignoreNulls)` window over a struct of the whole
  * right row (timestamp + every payload column together, so all matched
  * fields come from the SAME right row even when some payload values are
  * null) in (key, ts, side) order — the right struct fills onto every
  * covered left row. Cost at 100 TB: ONE shuffle by key + one sort, no per-key
  * state, no range-join explosion, and ties at equal timestamps resolve
  * right-before-left so "at-or-X" is inclusive. A `toleranceMicros`
  * bound nulls out matches farther than the window (market-data
  * staleness semantics), applied post-window so it costs nothing
  * extra. */
object AsofJoin {

  /** Latest right row at-or-before each left row (lookback).
    *
    * @param keys      equi-join keys present on both sides
    * @param leftTs    left timestamp column
    * @param rightTs   right timestamp column
    * @param payload   right columns to carry onto matches (names must not
    *                  collide with left columns — rename on the right
    *                  side first)
    * @param toleranceMicros match only if leftTs − rightTs ≤ this many
    *                  microseconds (None → unbounded lookback) */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame =
    join(left, right, keys, leftTs, rightTs, payload, toleranceMicros,
      forward = false)

  /** Earliest right row at-or-after each left row (lookahead) — same
    * machinery on the reversed time axis. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame =
    join(left, right, keys, leftTs, rightTs, payload, toleranceMicros,
      forward = true)

  private def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      toleranceMicros: Option[Long], forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key")
    val clash = payload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"payload columns collide with left: $clash")

    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftOther =
      left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTs)
    val tsType = right.schema(rightTs).dataType

    // The entire right row rides in ONE struct so a single
    // last(ignoreNulls) window fills it atomically — filling each payload
    // column with its own window would mix rows whenever a right row
    // carries a NULL payload value (the null would be skipped and an
    // OLDER row's value surface next to the newer row's timestamp).
    val rStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rts", tsType) +:
        payload.map(p =>
          org.apache.spark.sql.types.StructField(p, rightTypes(p))))

    // same column set on both sides, nulls where a side has no value
    val l2 = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftOther.map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val r2 = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(rightTs).as("__rts") +: payload.map(p => col(p)): _*)
          .as("__r"): _*)

    // right rows (side 0) sort before left rows at the same instant in
    // EITHER direction — a right row AT the left timestamp is a match;
    // forward mode just walks time in reverse
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = l2.unionByName(r2)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))

    val mTs = col("__m").getField("__rts")
    val gap =
      if (forward) unix_micros(mTs) - unix_micros(col("__ts"))
      else unix_micros(col("__ts")) - unix_micros(mTs)
    val inWindow = toleranceMicros match {
      case Some(tol) => gap <= tol
      case None => lit(true)
    }
    filled.filter(col("__side") === 1)
      .select(
        keys.map(col) ++
          Seq(col("__ts").as(leftTs)) ++
          leftOther.map(col) ++
          payload.map(p =>
            when(inWindow, col("__m").getField(p)).otherwise(lit(null)).as(p)): _*)
  }
}
