package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series regularization: turn an irregular event stream into a
  * dense per-key daily series — the resample + fill-forward step every
  * metrics/feature pipeline runs before rolling computations (a rolling
  * mean over a series with silent holes is wrong; RANGE frames fix the
  * window, gap-fill fixes the series itself).
  */
object Timeseries {

  /** Dense per-key daily series with last-observation-carried-forward:
    * aggregate `valueCol` per (key, day), generate every calendar day
    * between each key's first and last observation, and fill the holes
    * with the previous observed value.
    *
    * Output: (key, day, day_value, filled, observed) — `day_value` is
    * the day's exact DECIMAL(18,4) total (NULL on gap days), `filled`
    * the LOCF value (never NULL: day one is always observed), `observed`
    * the gap flag. Decimal stays decimal here; callers project to
    * DOUBLE at the edge (the moneyOut contract).
    *
    * Scale shape: the daily pre-aggregate is one partial-agg'd shuffle
    * on (key, day); the spine explodes MAP-SIDE from a 2-dates-per-key
    * aggregate (days-per-key is calendar-bounded, ~3.6k rows/key/decade
    * — never corpus-sized); the join and the LOCF window both hash on
    * the key, and the window's running `last(ignoreNulls)` frame is a
    * single forward pass with O(1) state per cursor. */
  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = df
      .select(col(keyCol), to_date(col(tsCol)).as("day"),
        col(valueCol).cast(DecimalType(18, 4)).as("__v"))
      .groupBy(col(keyCol), col("day"))
      .agg(sum(col("__v")).as("__v"))
    val spine = daily
      .groupBy(col(keyCol))
      .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(col(keyCol),
        explode(expr("sequence(__lo, __hi, interval 1 day)")).as("day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    spine
      .join(daily, Seq(keyCol, "day"), "left_outer")
      .withColumn("observed", col("__v").isNotNull)
      .withColumn("filled", last(col("__v"), ignoreNulls = true).over(w))
      .select(col(keyCol), col("day"), col("__v").as("day_value"),
        col("filled"), col("observed"))
  }

  /** Merge overlapping (or touching) intervals per key — the coverage
    * union: activity spans, retention-window coalescing, any "how much
    * of the timeline does this key cover" question. Intervals [s,e] and
    * [s',e'] with s' ≤ e merge (closed-interval semantics: touching ends
    * merge too).
    *
    * The classic sequential sweep becomes two window passes over integer
    * bounds, no per-group buffers:
    *   1. order intervals by (start, end) per key; a NEW span starts
    *      where start > the running max of all PREVIOUS ends (strictly —
    *      equality touches and therefore merges);
    *   2. the running sum of new-span flags labels each row with its
    *      span id; (key, span) then aggregates to min(start), max(end),
    *      and the member count.
    *
    * All arithmetic is integer comparisons on the caller's bound columns
    * (micros, days — any integral type), so the result is engine-exact.
    *
    * Scale shape: one shuffle on the key for the windows (ranking state
    * is O(1) per cursor — a billion-interval key costs no memory, only
    * sort), one partial-agg'd groupBy on (key, span). The span id is
    * per-key (prefix sum within the partition), never a global sequence.
    *
    * Output: (key, span_start, span_end, n_intervals), one row per
    * merged span. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val byStart = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol).asc, col(endCol).asc)
    val prevMaxEnd = max(col(endCol)).over(
      byStart.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df
      .select(col(keyCol), col(startCol), col(endCol))
      .withColumn("__new", when(
        prevMaxEnd.isNull || (col(startCol) > prevMaxEnd), 1L).otherwise(0L))
      .withColumn("__span", sum(col("__new")).over(
        byStart.rowsBetween(Window.unboundedPreceding, 0)))
    flagged
      .groupBy(col(keyCol), col("__span"))
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_intervals"))
      .select(col(keyCol), col("span_start"), col("span_end"),
        col("n_intervals"))
  }

  /** Finite-window exponentially-weighted moving average per key — the
    * standard smoothing pass over metric streams, made ENGINE-EXACT by
    * keeping every weight an integer: with decay 1−α = wNum/wDen and a
    * rolling window of the last `window` observations, the adjusted
    * (pandas `adjust=True`) EWMA
    *   Σ x_{t−k}·(1−α)^k / Σ (1−α)^k
    * multiplies through by wDen^(n−1) into
    *   Σ x_j·wNum^(age_j)·wDen^(j−1) / Σ wNum^(age_j)·wDen^(j−1)
    * — exact integer numerator and denominator (DECIMAL(38,0); bounds:
    * |x|·wDen^(window−1)·window < 10^38, e.g. cents × 4^15 × 16 ≈ 10^16
    * at window 16), with ONE final correctly-rounded double division +
    * round(6). α never appears as a float anywhere.
    *
    * Scale shape: one key-hash shuffle; the rolling collect is a
    * ROWS-frame window whose buffer is capped at `window` values (O(W)
    * per cursor, not per key), and the weighted sums are codegen'd
    * higher-order array expressions over literal power tables — no
    * join, no second shuffle. (orderCols must totally order each key's
    * rows or the frame is nondeterministic.) `valueCol` must be
    * integer-typed (cast cents/micros first — the corrByGroup
    * contract). */
  def ewma(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, window: Int = 16, wNum: Int = 3,
      wDen: Int = 4): DataFrame = {
    require(window >= 1 && window <= 32, s"window out of range: $window")
    require(wNum > 0 && wDen > wNum,
      s"decay must satisfy 0 < wNum < wDen: $wNum/$wDen")
    // the Long power tables wrap silently past 2^63 (e.g. wDen=10 at
    // window>=20: 10^19 > Long.MaxValue) — the 10^38 DECIMAL bound below
    // covers only the accumulation, so the table itself must be checked
    require(BigInt(wDen).pow(window - 1).isValidLong,
      s"wDen^(window-1) = $wDen^${window - 1} overflows Long — " +
        "use a smaller window or a smaller decay denominator")
    val d38 = DecimalType(38, 0)
    // literal power tables: POW[k+1] = base^k, k = 0..window−1
    def pows(base: Int): Seq[Long] =
      Iterator.iterate(1L)(_ * base).take(window).toSeq
    val powNum = array(pows(wNum).map(lit): _*)
    val powDen = array(pows(wDen).map(lit): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    // position i is 0-based oldest-first; age = n−1−i; element_at 1-based
    val n = size(col("__a"))
    def weight(i: Column) =
      element_at(powNum, (n - lit(1) - i + lit(1)).cast("int")).cast(d38) *
        element_at(powDen, (i + lit(1)).cast("int")).cast(d38)
    val num = aggregate(
      transform(col("__a"), (x, i) => x.cast(d38) * weight(i)),
      lit(0).cast(d38), (acc, t) => acc + t).cast(d38)
    val den = aggregate(
      transform(col("__a"), (_, i) => weight(i)),
      lit(0).cast(d38), (acc, t) => acc + t).cast(d38)
    df.filter(col(valueCol).isNotNull)
      .withColumn("__a", collect_list(col(valueCol).cast("long")).over(w))
      .withColumn("ewma",
        round(num.cast("double") / den.cast("double"), 6))
      .drop("__a")
  }

  /** Single changepoint detection by binary segmentation — for each
    * key's ordered integer series, the split point maximizing the
    * scaled mean-shift statistic √(t·(n−t)/n)·|mean_left − mean_right|
    * (the CUSUM-equivalent first step of binary segmentation; where
    * did this metric's LEVEL move). Everything derives from per-key
    * prefix sums: one sort window computes every candidate split in
    * one pass — no recursion, no per-key buffers. The argmax ranks on
    * the ROUNDED statistic (ulp-safe cut, the TF-IDF precedent) with
    * earliest-split ties. Keys with < 2 points emit nothing. Returns
    * (key, n, split_after, stat, mean_before, mean_after) where
    * `split_after` is the order value of the LAST point in the left
    * segment.
    *
    * Determinism: prefix/total sums exact integers; means and the
    * statistic are pinned double trees over exact-integer inputs
    * (one sqrt), round(6) on outputs and on the ranking key. Shape at
    * 100 TB: one key-hash shuffle + sort window, then a ranking window
    * over the same partitioning — a single exchange. */
  def changepointByGroup(series: DataFrame, keyCol: String,
      orderCol: String, valueCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val wn = Window.partitionBy(col(keyCol))
    val base = series.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(orderCol),
        col(valueCol).cast("long").as("__x"))
      .withColumn("__t", row_number().over(w))
      .withColumn("__ps", sum(col("__x").cast(d38)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("__s", sum(col("__x").cast(d38)).over(wn))
      .filter(col("__t") < col("__n"))
    val tD = col("__t").cast("double")
    val nD = col("__n").cast("double")
    val meanL = col("__ps").cast("double") / tD
    val meanR = (col("__s") - col("__ps")).cast("double") / (nD - tD)
    val stat = round(
      sqrt(tD * (nD - tD) / nD) * abs(meanL - meanR), 6)
    val scored = base.withColumn("__stat", stat)
    val wr = Window.partitionBy(col(keyCol))
      .orderBy(col("__stat").desc, col("__t"))
    scored.withColumn("__rk", row_number().over(wr))
      .filter(col("__rk") === 1)
      .select(col(keyCol), col("__n").as("n"),
        col(orderCol).as("split_after"), col("__stat").as("stat"),
        round(meanL, 6).as("mean_before"),
        round(meanR, 6).as("mean_after"))
  }

  /** Seasonal-naive forecast skill (MASE): per key, score the
    * "same value as one season ago" forecast against the "same value
    * as yesterday" naive baseline over an ordered series —
    * mase = Σ|v − v(t−season)| / Σ|v − v(t−1)| on the rows where BOTH
    * lags exist (< 1 means real seasonality worth modeling, NULL when
    * the series is flat and the naive error is 0). Also emits both
    * MAEs. The go/no-go audit before a pipeline invests in per-key
    * forecasting or season-aware anomaly thresholds.
    *
    * Lags are ROW-based — pass a dense series (compose with
    * [[gapFillDaily]] when the calendar has holes) with integer-valued
    * `valueCol` (counts/cents). Exactness: absolute errors are exact
    * integers summed in DECIMAL(38,0); each output is ONE double
    * division + round(6). Shape at 100 TB: one key-hash shuffle feeds
    * a single sort serving both lag windows, then a
    * three-number-per-key partial-agg'd aggregate. */
  def seasonalNaiveError(series: DataFrame, keyCol: String,
      orderCol: String, valueCol: String, season: Int): DataFrame = {
    require(season >= 2, s"season must be >= 2: $season")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val v = col(valueCol).cast("long")
    val scored = series.filter(col(valueCol).isNotNull)
      .withColumn("__ls", lag(v, season).over(w))
      .withColumn("__l1", lag(v, 1).over(w))
      .filter(col("__ls").isNotNull && col("__l1").isNotNull)
    scored.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_scored"),
        sum(abs(v - col("__ls")).cast(d38)).as("__es"),
        sum(abs(v - col("__l1")).cast(d38)).as("__e1"))
      .select(col(keyCol), col("n_scored"),
        round(col("__es").cast("double") / col("n_scored").cast("double"),
          6).as("mae_seasonal"),
        round(col("__e1").cast("double") / col("n_scored").cast("double"),
          6).as("mae_naive"),
        when(col("__e1") > 0,
          round(col("__es").cast("double") / col("__e1").cast("double"), 6))
          .as("mase"))
  }
}
