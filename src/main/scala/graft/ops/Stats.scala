package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution statistics over unbounded groups — the profiling pass a
  * curation pipeline runs before choosing filter thresholds. */
object Stats {

  /** Exact per-group discrete quantiles WITHOUT per-group buffers: rank
    * every row with one window pass and keep the rows whose rank hits
    * each quantile's target index — one shuffle, no `collect_list`, so
    * a group of 10⁹ rows costs the same memory as a group of 10. This
    * is the scale-safe exact alternative to both sort-and-index (a
    * per-group array buffer) and `percentile_approx` (not
    * engine-reproducible).
    *
    * Quantiles are RATIONALS (label, numerator, denominator): the
    * target index is the all-integer ceil division
    * (n·num + den − 1) div den, never `ceil(p·n)` on a float — a 1-ulp
    * quotient error would pick the neighboring row. Discrete (type-1)
    * quantile semantics: the value whose rank is ⌈p·n⌉; ties in the
    * value order don't matter because rank k's VALUE is determined by
    * the multiset alone. Output: one row per (group, quantile label),
    * with the quantile value in `valueCol`'s type. */
  def quantilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
      quantiles: Seq[(String, Int, Int)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (l, num, den) =>
      require(num > 0 && den > 0 && num <= den,
        s"quantile $l must have 0 < num <= den: $num/$den") }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol).asc)
    val wn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val targets: Column = array(quantiles.map { case (label, num, den) =>
      struct(lit(label).as("q"),
        expr(s"(__n * $num + ${den - 1}) div $den").as("k"))
    }: _*)
    df.select(col(groupCol), col(valueCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("__hit",
        filter(targets, t => t.getField("k") === col("__rn")))
      .filter(size(col("__hit")) > 0)
      .select(col(groupCol), explode(col("__hit")).as("__q"), col(valueCol))
      .select(col(groupCol), col("__q.q").as("quantile"), col(valueCol))
  }

  /** Exact per-group WEIGHTED median — the robust location estimate
    * when observations carry mass (token counts, revenue, sample
    * weights): the smallest value whose cumulative weight reaches half
    * the group's total, i.e. the lower weighted median (the
    * quantilesByGroup type-1 convention generalized to weights;
    * uniform weights reproduce its median exactly). Rows with NULL or
    * non-positive weight are out of scope. Output:
    * (group, total_weight, weighted_median).
    *
    * Exactness: the cumulative-weight threshold test is
    * 2·cum ≥ total in INTEGERS — no halving division, no doubles
    * anywhere. Shape at 100 TB: one key-hash shuffle feeds a
    * per-group (value, tie) sort window for the running weight sum
    * (the winsorize/quantile window pattern), then a 1-row-per-group
    * argmin. */
  def weightedMedianByGroup(df: DataFrame, groupCol: String,
      valueCol: String, weightCol: String): DataFrame = {
    val in = df.filter(col(valueCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(groupCol), col(valueCol),
        col(weightCol).cast("long").as("__w"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol).asc)
    val wn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    in
      // default RANGE frame: cum(v) = weight of ALL values <= v, so
      // tied values share one cumulative — no intra-tie order anywhere
      .withColumn("__cum", sum(col("__w")).over(w))
      .withColumn("__tot", sum(col("__w")).over(wn))
      .filter(lit(2) * col("__cum") >= col("__tot"))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol)).orderBy(col(valueCol).asc)))
      .filter(col("__rk") === 1)
      .select(col(groupCol), col("__tot").as("total_weight"),
        col(valueCol).as("weighted_median"))
  }

  /** Robust per-group outlier flags via Median Absolute Deviation: a row
    * is an outlier when |x − median| > k · MAD, with median and MAD both
    * the exact type-1 (discrete) per-group medians of [[quantilesByGroup]]
    * — the robust alternative to mean/stddev z-scores, whose thresholds
    * the outliers themselves drag (a curation pipeline filtering, say,
    * per-source document lengths or per-event-type metric values wants
    * fences the pathology can't move).
    *
    * Engine-exact: median and MAD are actual data values (no
    * interpolation), |x − med| and k·MAD are each ONE IEEE double
    * operation, so the flag is bit-reproducible in any IEEE engine — even
    * the boolean column oracle-checks. Rows with NULL values are dropped
    * (they have no deviation and would rank differently across engines).
    *
    * Scale shape: two ranking-window passes and two joins, ALL keyed by
    * the group column — no per-group buffers anywhere, so group size
    * never bounds executor memory; the median/MAD tables are one row per
    * group and broadcast under AQE.
    *
    * Degenerate groups: when over half a group's values are identical,
    * MAD = 0 and every other value is flagged — the standard MAD caveat;
    * pick a coarser group or a larger k if that bites. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val in = df.filter(col(valueCol).isNotNull)
    val med = quantilesByGroup(in, groupCol, valueCol, Seq(("med", 1, 2)))
      .select(col(groupCol), col(valueCol).as("group_median"))
    val dev = in.join(med, Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol) - col("group_median")))
    val mad = quantilesByGroup(
      dev.select(col(groupCol), col("__dev")), groupCol, "__dev",
      Seq(("mad", 1, 2)))
      .select(col(groupCol), col("__dev").as("group_mad"))
    dev.join(mad, Seq(groupCol))
      .withColumn("is_outlier", col("__dev") > lit(k) * col("group_mad"))
      .drop("__dev")
  }

  /** Per-group winsorization: clip values into the group's exact
    * [p-lo, p-hi] type-1 quantile band — the robust feature-normalization
    * step that pairs with [[madOutliers]] (flagging) when the pipeline
    * wants to KEEP rows but bound their leverage. Quantiles are the same
    * rational spec as [[quantilesByGroup]], so for integer value columns
    * the clipped value is engine-exact by construction. Rows with NULL
    * values are dropped (they have no rank). Output: the input columns
    * plus `lo`, `hi`, and `clipped`.
    *
    * Scale shape: one ranking-window pass for both bounds, one
    * group-keyed join of the 2-rows-per-group bounds table (broadcast
    * under AQE) — no per-group buffers anywhere. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      loNum: Int = 1, loDen: Int = 100, hiNum: Int = 99,
      hiDen: Int = 100): DataFrame = {
    val in = df.filter(col(valueCol).isNotNull)
    in.join(winsorizeBounds(df, groupCol, valueCol, loNum, loDen,
        hiNum, hiDen), Seq(groupCol))
      .withColumn("clipped",
        least(greatest(col(valueCol), col("lo")), col("hi")))
  }

  /** [[winsorize]]'s training half as a standalone table: the exact
    * type-1 per-group [p-lo, p-hi] bounds, ONE ROW PER GROUP — the
    * persistable clip-bounds artifact an incremental pipeline freezes
    * on its first run (bounded by group cardinality, never corpus
    * size). [[clipWithBounds]] is the matching apply half; on the
    * training input the pair reproduces [[winsorize]] exactly. */
  def winsorizeBounds(df: DataFrame, groupCol: String, valueCol: String,
      loNum: Int = 1, loDen: Int = 100, hiNum: Int = 99,
      hiDen: Int = 100): DataFrame = {
    require(loNum.toLong * hiDen <= hiNum.toLong * loDen,
      s"lo must not exceed hi: $loNum/$loDen > $hiNum/$hiDen")
    val in = df.filter(col(valueCol).isNotNull)
    quantilesByGroup(in, groupCol, valueCol,
      Seq(("lo", loNum, loDen), ("hi", hiNum, hiDen)))
      .groupBy(col(groupCol))
      .agg(max(when(col("quantile") === "lo", col(valueCol))).as("lo"),
        max(when(col("quantile") === "hi", col(valueCol))).as("hi"))
  }

  /** Clip a value column into a STORED (group, lo, hi) bounds table —
    * [[winsorize]] under a frozen artifact instead of this input's own
    * quantiles. Groups absent from the bounds table pass UNCLIPPED (an
    * unseen stratum has no frozen band; passing through is the
    * least-surprise default and the spec-pinned contract). NULL values
    * and NULL groups drop, like [[winsorize]] (whose inner bounds join
    * never matches a NULL key) — run-1 parity holds row-for-row. One
    * broadcast-sized left join. */
  def clipWithBounds(df: DataFrame, groupCol: String, valueCol: String,
      bounds: DataFrame): DataFrame = {
    val in = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
    in.join(bounds.select(col(groupCol), col("lo"), col("hi")),
        Seq(groupCol), "left")
      .withColumn("clipped",
        least(greatest(col(valueCol), coalesce(col("lo"), col(valueCol))),
          coalesce(col("hi"), col(valueCol))))
  }

  /** [[madOutliers]]'s training half as a standalone table: the exact
    * type-1 per-group median and MAD, ONE ROW PER GROUP — the
    * persistable robust-fence artifact an incremental pipeline freezes
    * on its first run. [[madFlagWithBounds]] is the matching apply
    * half; on the training input the pair reproduces [[madOutliers]]'s
    * flags exactly (same |x − med| > k·MAD doubles). */
  def madBounds(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val in = df.filter(col(valueCol).isNotNull)
    val med = quantilesByGroup(in, groupCol, valueCol, Seq(("med", 1, 2)))
      .select(col(groupCol), col(valueCol).as("group_median"))
    val dev = in.join(med, Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol) - col("group_median")))
    val mad = quantilesByGroup(
      dev.select(col(groupCol), col("__dev")), groupCol, "__dev",
      Seq(("mad", 1, 2)))
      .select(col(groupCol), col("__dev").as("group_mad"))
    med.join(mad, Seq(groupCol))
  }

  /** Flag outliers against a STORED (group, group_median, group_mad)
    * table — [[madOutliers]] under a frozen artifact instead of this
    * input's own statistics. Groups absent from the bounds table are
    * never outliers (no frozen fence to violate). NULL values and NULL
    * groups drop, like [[madOutliers]] (whose inner statistics join
    * never matches a NULL key) — run-1 parity holds row-for-row. One
    * broadcast-sized left join. */
  def madFlagWithBounds(df: DataFrame, groupCol: String,
      valueCol: String, k: Int, bounds: DataFrame): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val in = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
    in.join(bounds.select(col(groupCol), col("group_median"),
        col("group_mad")), Seq(groupCol), "left")
      .withColumn("is_outlier",
        when(col("group_mad").isNull, lit(false))
          .otherwise(abs(col(valueCol) - col("group_median")) >
            lit(k) * col("group_mad")))
  }

  /** Per-group trimmed mean: the mean over values inside the exact
    * type-1 [lo, hi] quantile band — [[winsorize]]'s sibling that DROPS
    * the tails instead of clipping them (the robust location estimate
    * dashboards quote as "p1–p99 mean"). Same ranking-window quantile
    * bounds, same 2-rows-per-group bounds join; the kept values
    * accumulate in DECIMAL(18,4) (order-independent), and the only
    * floating-point step is one final correctly-rounded double division
    * after the (38,4)→double exact hop — so the mean hash-matches any
    * engine. NULL values are dropped. Output: (group, n_kept,
    * trimmed_mean). */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
      loNum: Int = 1, loDen: Int = 100, hiNum: Int = 99,
      hiDen: Int = 100): DataFrame = {
    val in = df.filter(col(valueCol).isNotNull)
    val bounds = quantilesByGroup(in, groupCol, valueCol,
      Seq(("lo", loNum, loDen), ("hi", hiNum, hiDen)))
      .groupBy(col(groupCol))
      .agg(max(when(col("quantile") === "lo", col(valueCol))).as("lo"),
        max(when(col("quantile") === "hi", col(valueCol))).as("hi"))
    in.join(bounds, Seq(groupCol))
      .filter(col(valueCol) >= col("lo") && col(valueCol) <= col("hi"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .as("__s"))
      .select(col(groupCol), col("n_kept"),
        (col("__s").cast(org.apache.spark.sql.types.DecimalType(38, 4))
          .cast("double") / col("n_kept")).as("trimmed_mean"))
  }

  /** Per-group Pearson correlation of two INTEGER-valued columns, exact
    * up to the final division — the feature-association profile a
    * curation pipeline reads before trusting a proxy metric (does
    * `n_chars` track token count per source? is a cheap feature a
    * usable stand-in for an expensive one?).
    *
    * Engine-exact where it matters: the five sufficient statistics
    * (Σx, Σy, Σxy, Σx², Σy², n) accumulate in DECIMAL(38,0) — integer
    * sums are order-independent, so any partition/merge order produces
    * identical values, unlike `corr()`'s streaming double covariance
    * (order-dependent, never oracle-matchable). The numerator
    * n·Σxy − Σx·Σy and the two variance terms are exact DECIMAL
    * products (caller contract: n·Σx² < 10³⁸ — holds for any realistic
    * corpus: 10¹² rows of |x| ≤ 10⁶ gives 10³⁰); only the final
    * r = cov / √(varx·vary) runs in IEEE doubles (one mul, one sqrt,
    * one div — each correctly rounded), rounded to 6 places.
    *
    * Per-row products run in LONG (caller contract: |x·y| < 2⁶³ per
    * ROW — a bound on value magnitudes, not corpus size). Zero-variance
    * groups yield NULL r. Scale shape: ONE partial-agg'd shuffle of six
    * numbers per group; no windows, no joins. */
  def corrByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val in = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
    val stats = in.groupBy(col(groupCol)).agg(
      count(lit(1)).cast(d38).as("__n"),
      sum(col("__x").cast(d38)).as("__sx"),
      sum(col("__y").cast(d38)).as("__sy"),
      sum((col("__x") * col("__y")).cast(d38)).as("__sxy"),
      sum((col("__x") * col("__x")).cast(d38)).as("__sxx"),
      sum((col("__y") * col("__y")).cast(d38)).as("__syy"))
    val cov = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val varx = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val vary = col("__n") * col("__syy") - col("__sy") * col("__sy")
    stats.select(col(groupCol), col("__n").cast("bigint").as("n"),
      when(varx > 0 && vary > 0,
        round(cov.cast("double") /
          sqrt(varx.cast("double") * vary.cast("double")), 6)).as("r"))
  }

  /** Per-group simple linear regression y = a + b·x — [[corrByGroup]]'s
    * sibling on the SAME five exact sufficient statistics (one
    * six-number-per-group partial-agg'd shuffle, no windows/joins):
    * slope b = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) and intercept
    * a = (Σy − b·Σx)/n, both from exact DECIMAL(38,0) integer sums with
    * ONE IEEE double division each (numerator and denominator are
    * exactly representable up to 2⁵³ after the decimal→double hop;
    * the final divisions + round(6) are the only inexact ops, the
    * corrByGroup contract). Degenerate groups (zero x-variance) yield
    * NULL slope/intercept. Caller contract as corrByGroup: per-row
    * |x·y| < 2⁶³. */
  def linregByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val in = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
    val stats = in.groupBy(col(groupCol)).agg(
      count(lit(1)).cast(d38).as("__n"),
      sum(col("__x").cast(d38)).as("__sx"),
      sum(col("__y").cast(d38)).as("__sy"),
      sum((col("__x") * col("__y")).cast(d38)).as("__sxy"),
      sum((col("__x") * col("__x")).cast(d38)).as("__sxx"))
    val num = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val den = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val slope = num.cast("double") / den.cast("double")
    val intercept = (col("__sy").cast("double") -
      slope * col("__sx").cast("double")) / col("__n").cast("double")
    stats.select(col(groupCol), col("__n").cast("bigint").as("n"),
      when(den > 0, round(slope, 6)).as("slope"),
      when(den > 0, round(intercept, 6)).as("intercept"))
  }

  /** Per-group distribution shape: population mean, variance, skewness
    * (g1 = m3/m2^{3/2}) and EXCESS kurtosis (g2 = m4/m2² − 3) — the
    * profiling row that tells a pipeline whether a metric is symmetric,
    * heavy-tailed, or binned wrong, from ONE pass of four power sums
    * (n, Σx, Σx², Σx³, Σx⁴) in exact DECIMAL(38,0).
    *
    * The central-moment combinations stay EXACT decimals:
    * B = n·S2 − S1², A = n²·S3 − 3n·S1·S2 + 2·S1³,
    * C = n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3·S1⁴ — then the n-powers
    * cancel: g1 = A/B^{3/2}, g2 = C/B² − 3, each ONE pinned double
    * tree over two decimal→double conversions (correctly rounded on
    * both engines), round(6). Zero-variance groups yield NULL
    * g1/g2. NULL values dropped.
    *
    * Caller contract: integer-valued column with n·max|x| ≲ 10⁹ so the
    * fourth-power terms keep 38-digit headroom (quantity-/count-scale
    * columns; the oracle's HUGEINT has the same bound). For larger
    * magnitudes at extreme row counts, the scale path is the two-pass
    * variant — broadcast the exact mean, then sum small centered
    * powers — which keeps the same output contract. Shape: one
    * five-number-per-group partial-agg'd shuffle, no windows/joins. */
  def momentsByGroup(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val in = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("long").as("__x"))
    val stats = in.groupBy(col(groupCol)).agg(
      count(lit(1)).cast(d38).as("__n"),
      sum(col("__x").cast(d38)).as("__s1"),
      sum((col("__x") * col("__x")).cast(d38)).as("__s2"),
      sum((col("__x") * col("__x") * col("__x")).cast(d38)).as("__s3"),
      sum((col("__x") * col("__x") * col("__x") * col("__x")).cast(d38))
        .as("__s4"))
    val n = col("__n")
    val b = n * col("__s2") - col("__s1") * col("__s1")
    val a = n * n * col("__s3") -
      lit(3) * n * col("__s1") * col("__s2") +
      lit(2) * col("__s1") * col("__s1") * col("__s1")
    val cc = n * n * n * col("__s4") -
      lit(4) * n * n * col("__s1") * col("__s3") +
      lit(6) * n * col("__s1") * col("__s1") * col("__s2") -
      lit(3) * col("__s1") * col("__s1") * col("__s1") * col("__s1")
    val bD = b.cast("double")
    stats.select(col(groupCol), n.cast("bigint").as("n"),
      round(col("__s1").cast("double") / n.cast("double"), 6).as("mean"),
      round(bD / (n.cast("double") * n.cast("double")), 6).as("variance"),
      when(b > 0,
        round(a.cast("double") / (bD * sqrt(bD)), 6)).as("skewness"),
      when(b > 0,
        round(cc.cast("double") / (bD * bD) - lit(3.0), 6)).as("kurtosis"))
  }

  /** Per-group equi-width histogram over a fixed [lo, hi) range — the
    * distribution-shape profiling row when quantiles are too coarse
    * and a full sort too much: bin = floor((x−lo)·bins/(hi−lo)),
    * out-of-range values CLAMP into the edge bins (the calibration
    * clamp convention — mass is never silently dropped). Returns
    * (group, bin, n, share) for non-empty bins; share = ONE
    * exact-integer double division + round(6). NULLs dropped.
    *
    * Determinism: the bin split is floor of an exact (<2^53) double
    * product over integer values — engine-identical. Shape at 100 TB:
    * one map-side bin projection into a groups×bins-bounded
    * partial-agg'd count; the share window runs over that bounded
    * table. */
  def histogramEquiWidth(df: DataFrame, groupCol: String,
      valueCol: String, lo: Long, hi: Long, bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    require(hi > lo, s"need hi > lo: [$lo, $hi)")
    val x = col(valueCol).cast("long")
    val raw = floor((x - lit(lo)).cast("double") * bins /
      lit((hi - lo).toDouble)).cast("int")
    val bin = least(lit(bins - 1), greatest(lit(0), raw))
    val counts = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), bin.as("bin"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n"))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    counts.withColumn("share",
      round(col("n").cast("double") /
        sum(col("n")).over(wg).cast("double"), 6))
  }

  /** Pairwise Pearson correlation matrix over k integer-valued columns
    * from ONE scan — the feature-redundancy screen a pipeline runs
    * before training a scorer (a single aggregate computes every Σxᵢ,
    * Σxᵢ², and Σxᵢxⱼ; corrByGroup would need a pass per pair). Rows
    * with a NULL in ANY column are dropped (listwise deletion — every
    * pair shares one n). Output: (col_a, col_b, n, r) for each
    * unordered pair in input-column order; zero-variance pairs NULL.
    *
    * Exactness: the corrByGroup contract — DECIMAL(38,0) sufficient
    * sums, exact decimal cov/variance combinations, ONE double
    * division over a sqrt of exact-integer-derived doubles, round(6).
    * Shape at 100 TB: one partial-agg'd scan to a SINGLE row of
    * 1 + k + k(k+1)/2 numbers, then a map-side explode of the
    * pairs-bounded struct array — the input is never rescanned per
    * pair. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"corrMatrix needs >= 2 columns: $cols")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val in = df
      .filter(cols.map(c => col(s"`$c`").isNotNull).reduce(_ && _))
      .select(cols.map(c => col(s"`$c`").cast("long").as(c)): _*)
    val pairIdx = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val sumAggs = cols.map(c => sum(col(c).cast(d38)).as(s"__s_$c")) ++
      cols.map(c =>
        sum(col(c).cast(d38) * col(c).cast(d38)).as(s"__q_$c")) ++
      pairIdx.map { case (a, b) =>
        sum(col(a).cast(d38) * col(b).cast(d38)).as(s"__p_${a}__$b") }
    val aggs = count(lit(1)).cast(d38).as("__n") +: sumAggs
    val s = in.agg(aggs.head, aggs.tail: _*)
    def rExpr(a: String, b: String) = {
      val n = col("__n")
      val cov = n * col(s"__p_${a}__$b") - col(s"__s_$a") * col(s"__s_$b")
      val va = n * col(s"__q_$a") - col(s"__s_$a") * col(s"__s_$a")
      val vb = n * col(s"__q_$b") - col(s"__s_$b") * col(s"__s_$b")
      when(va > 0 && vb > 0,
        round(cov.cast("double") /
          sqrt(va.cast("double") * vb.cast("double")), 6))
    }
    val pairStructs = array(pairIdx.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"), rExpr(a, b).as("r"))
    }: _*)
    s.select(col("__n").cast("bigint").as("n"),
        explode(pairStructs).as("__pr"))
      .select(col("__pr.col_a").as("col_a"), col("__pr.col_b").as("col_b"),
        col("n"), col("__pr.r").as("r"))
  }

  /** Per-group Gini coefficient — the concentration audit next to
    * entropy ("is this slice's mass dominated by a few members?"):
    * G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n over the ascending-sorted
    * NON-NEGATIVE values (equal values make the rank weighting
    * order-invariant, so ties need no tie-break). 0 = perfectly even,
    * → 1 = one member holds everything. Zero-sum groups have no
    * defined concentration (NULL); NULL values dropped.
    *
    * Exactness: values in integer units; ranks and values multiply in
    * DECIMAL(38,0) (i·x overflows a long at ~10¹² rows × 10⁷ units);
    * the G combination is ONE pinned double tree over two
    * decimal→double conversions, round(6). Shape at 100 TB: one
    * key-hash shuffle feeds the per-group ranking window (the
    * winsorize/quantile window pattern), then a
    * three-number-per-group aggregate. */
  def giniByGroup(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val in = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("long").as("__x"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__x"))
    val ranked = in.withColumn("__i", row_number().over(w))
    val s = ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(col("__x").cast(d38)).as("__s"),
      sum(col("__i").cast(d38) * col("__x").cast(d38)).as("__w"))
    s.select(col(groupCol), col("n"),
      when(col("__s") > 0,
        round(lit(2.0) * col("__w").cast("double") /
          (col("n").cast("double") * col("__s").cast("double")) -
          (col("n") + 1).cast("double") / col("n").cast("double"), 6))
        .as("gini"))
  }

  /** Exact per-group mode (most frequent value, the categorical
    * location estimate profiling reports alongside quantiles): two
    * partial-agg'd shuffles — (group, value) counts, then an argmax
    * ranking window over the count table, whose size is bounded by
    * group×distinct-values, never the input. Deterministic tie-break:
    * count desc, then value ASC in the column's own ordering — no
    * "whichever partition finished first". NULL values are dropped
    * (the mode of nothing is no row, matching DuckDB's `mode`
    * semantics only when ties are impossible — hence the pinned
    * tie-break instead of the built-in). Output: group, mode value
    * (input type), its count. */
  def modeByGroup(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("n_mode"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("n_mode").desc, col(valueCol))
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
