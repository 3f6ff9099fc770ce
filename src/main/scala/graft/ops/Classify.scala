package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained quality classifier: full-batch logistic regression
  * by gradient descent, the standard "distill an expensive gate into a
  * cheap scorer" setup (FastText-style quality classifiers in
  * pretraining pipelines — e.g. the GPT-3/CCNet quality filters —
  * are exactly this shape: a linear model over cheap features,
  * trained against a reference labeling; here the reference labeling
  * is the engine's own Gopher rule gate, so the whole loop is
  * self-contained and oracle-able).
  *
  * The load-bearing choice is the link function: the classic sigmoid
  * needs `exp`, whose last-bit behavior differs across libm
  * implementations and COMPOUNDS across training iterations. We use
  * the algebraic fast sigmoid σ̃(z) = 0.5 + z / (2·(1 + |z|)) — same
  * S-shape, range (0,1), σ̃(0) = 0.5 — built ONLY from IEEE add /
  * multiply / divide / abs, each correctly rounded and therefore
  * bit-identical in any IEEE engine. Every per-row term in the
  * gradient is a pinned expression tree of exact-portable doubles;
  * per-feature gradient SUMS run in DECIMAL(38,18) (order-independent
  * — a double sum over a distributed scan would be partition-order-
  * dependent and never hash-match); the weight update divides the
  * decimal total (one correctly-rounded decimal→double conversion) by
  * the exact row count. So the entire trained weight vector is
  * deterministic at any parallelism and reproducible in SQL by
  * unrolling the iterations — the k-means / BPE trainer precedent
  * applied to gradient descent.
  *
  * Scale shape: one pass per iteration (a single partial-agg'd
  * aggregate of 1 + |w| decimal sums — no shuffle of rows, only
  * partials), driver state = the weight vector. Scoring is one
  * map-side expression. The feature frame should be cached by the
  * caller across iterations ([[gateFeatures]] does). */
object Classify {

  /** Quality features + Gopher-gate label for [[train]]: x1 = token
    * count / 100, x2 = mean word length / 10, x3 = stopword ratio,
    * x4 = punctuation ratio (the [[TextAnalysis.qualityFeatures]]
    * definitions, scaled into comparable ranges by exact constants;
    * [[train]] additionally standardizes per-feature — constant-factor
    * scaling alone cannot fix the conditioning of a near-constant
    * feature), y = 1.0 iff the row passes
    * every Gopher rule. NULL-text rows drop (their label is
    * undefined). Returns (idCol, carryCols..., x1..x4, y), cached —
    * the training loop reads it iters+1 times; `carryCols` are
    * pass-through columns for downstream grouping (default the
    * documents table's `source`). Features AND label come out of ONE
    * map-side pass: [[TextAnalysis.gopherFilter]] already carries
    * `n_tokens` + `keep`, and the quality ratios are pure column
    * expressions over the same text — no second scan, no join. */
  def gateFeatures(docs: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String] = Seq("source")): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull)
    val carry = carryCols.map(c => col(s"`$c`"))
    val g = TextAnalysis.gopherFilter(
      base.select(col(idCol) +: carry :+ col(textCol): _*), textCol)
    val nChars = length(col(textCol))
    val meanWordLen = when(col("n_tokens") > 0,
      (nChars - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      .otherwise(lit(0.0))
    val stopRatio = when(col("n_tokens") > 0,
      graft.expressions.PipelineExpressions
        .token_hit_count(col(textCol), TextAnalysis.markers("en"))
        .cast("double") / col("n_tokens"))
      .otherwise(lit(0.0))
    val punctRatio = when(nChars > 0,
      (nChars - length(regexp_replace(col(textCol), "[.,!?;:]", "")))
        .cast("double") / nChars)
      .otherwise(lit(0.0))
    val sel = g.select(col(idCol) +: carry :+
      (col("n_tokens").cast("double") / lit(100.0)).as("x1") :+
      (meanWordLen / lit(10.0)).as("x2") :+
      stopRatio.as("x3") :+
      punctRatio.as("x4") :+
      when(col("keep"), lit(1.0)).otherwise(lit(0.0)).as("y"): _*)
    // lazy localCheckpoint, not cache(): both materialize once under the
    // policy, but the checkpoint also truncates the LOGICAL plan — the
    // gate's large regex/marker expression trees otherwise re-enter
    // analysis + optimization for every one of the training loop's
    // serial aggregates (driver-side, measured ~100 ms per pass)
    if (Dedup.cacheSignaturesOn(docs.sparkSession)) sel.localCheckpoint(false)
    else sel
  }

  /** The linear score w₀ + Σ wⱼ·xⱼ as a pinned left-associated
    * expression tree (the oracle writes the same tree). */
  def z(weights: Seq[Double], xCols: Seq[String]): Column = {
    require(weights.length == xCols.length + 1,
      s"need ${xCols.length + 1} weights (bias first): got ${weights.length}")
    xCols.zipWithIndex.foldLeft(lit(weights.head): Column) {
      case (acc, (c, j)) => acc + lit(weights(j + 1)) * col(c)
    }
  }

  /** Fast sigmoid of a score column: 0.5 + z / (2·(1 + |z|)) — exact
    * IEEE ops only, no libm. */
  def fastSigmoid(zc: Column): Column =
    lit(0.5) + zc / (lit(2.0) * (lit(1.0) + abs(zc)))

  /** Scalar inverse of the fast sigmoid: the z with σ̃(z) = p — the
    * model-consistent "logit" (2·(p−0.5)) / (1 − 2·|p−0.5|), a pinned
    * tree of correctly-rounded IEEE ops (no `ln`, which would put a
    * libm call into the portable contract). Degenerate p (≤0 or ≥1,
    * where the true logit is ±∞) maps to 0 — a single-class corpus has
    * no boundary to place. */
  private[graft] def fastLogit(p: Double): Double =
    if (p <= 0.0 || p >= 1.0) 0.0
    else {
      val d = p - 0.5
      (2.0 * d) / (1.0 - 2.0 * math.abs(d))
    }

  /** `iters` full-batch GD iterations at fixed learning rate:
    * wⱼ ← wⱼ − lr·(Σ (σ̃(z) − y)·xⱼ) / n. Returns the weight vector
    * (bias first) IN RAW-FEATURE SPACE — callers score with
    * `fastSigmoid(z(w, xCols))` over the same columns they trained on.
    * One aggregate job per iteration plus one up-front moments pass;
    * cache `feat` (as [[gateFeatures]] does) or each iteration
    * re-derives it.
    *
    * Default training recipe (both opt-outable):
    *
    * `biasInit = true`: the BIAS starts at [[fastLogit]] of the label
    * base rate p = Σy/n (feature weights at zero), so the untrained
    * model already scores every row at p and GD refines from the class
    * prior instead of from σ̃ = 0.5. Zero-init on imbalanced labels
    * leaves few-iteration runs entirely on one side of 0.5 — a scorer
    * whose conventional decision boundary never fires.
    *
    * `standardize = true`: GD runs over (xⱼ − μⱼ)/σⱼ and the learned
    * weights FOLD BACK to raw space (wⱼ/σⱼ; bias − Σ (wⱼ/σⱼ)·μⱼ, a
    * pinned left-associated chain). Raw-space GD on these features is
    * hopeless conditioning: a near-constant feature (σ ≈ 0.02) carries
    * most of the label signal but contributes ~σ² to the gradient, so
    * fixed-lr GD needs thousands of iterations to move its weight —
    * measured on the bench corpus, unstandardized scores never cross
    * 0.5 at any (iters ≤ 256, lr ≤ 2) while standardized GD separates
    * by iteration 8. Constant features (σ = 0) pin σ := 1 and keep
    * weight 0.
    *
    * Exactness: μ/σ/p come from ONE pass of DECIMAL(38,18) sums
    * (order-independent) with pinned double combinations — σ is one
    * correctly-rounded `sqrt` (IEEE-exact in any engine, like +,×,÷),
    * variance ≤ 0 (rounding) pins σ := 1. Every standardized value,
    * gradient term, update, and the final fold is the same pinned tree
    * in the oracle's unrolled-CTE re-derivation, so the returned
    * vector is bit-identical at any parallelism and in any engine. */
  def train(feat: DataFrame, xCols: Seq[String], yCol: String,
      iters: Int, lr: Double, biasInit: Boolean = true,
      standardize: Boolean = true): Array[Double] = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    val k = xCols.length
    var w: Array[Double] = Array.fill(k + 1)(0.0)
    // one moments pass serves the bias init AND the standardization
    val momAggs = count(lit(1)).as("n") +:
      sum(col(yCol).cast("decimal(38,18)")).as("sy") +:
      xCols.flatMap(c => Seq(
        sum(col(c).cast("decimal(38,18)")),
        sum((col(c) * col(c)).cast("decimal(38,18)"))))
    val mom = feat.agg(momAggs.head, momAggs.tail: _*).head()
    val nRows = mom.getLong(0)
    if (nRows == 0) return w
    val nD = nRows.toDouble
    if (biasInit && !mom.isNullAt(1))
      w(0) = fastLogit(mom.getDecimal(1).doubleValue / nD)
    val mu = Array.tabulate(k)(j => mom.getDecimal(2 + 2 * j).doubleValue / nD)
    val sd = Array.tabulate(k) { j =>
      val ex2 = mom.getDecimal(3 + 2 * j).doubleValue / nD
      val v = ex2 - mu(j) * mu(j)
      if (v <= 0.0) 1.0 else math.sqrt(v)
    }
    // the per-iteration standardization is a 5-column map over `feat`,
    // which gateFeatures hands over lineage-truncated — each iteration's
    // agg() plans against a leaf, not the gate's expression forest
    val gdFeat =
      if (!standardize) feat
      else feat.select(col(yCol) +: xCols.zipWithIndex.map { case (c, j) =>
        ((col(c) - lit(mu(j))) / lit(sd(j))).as(c) }: _*)
    for (_ <- 0 until iters) {
      val resid = fastSigmoid(z(w.toSeq, xCols)) - col(yCol)
      val aggs = count(lit(1)).cast("double").as("n") +:
        sum(resid.cast("decimal(38,18)")).as("s0") +:
        xCols.zipWithIndex.map { case (c, j) =>
          sum((resid * col(c)).cast("decimal(38,18)")).as(s"s${j + 1}") }
      val r = gdFeat.agg(aggs.head, aggs.tail: _*).head()
      val n = r.getDouble(0)
      w = Array.tabulate(w.length)(j =>
        w(j) - lr * (r.getDecimal(j + 1).doubleValue / n))
    }
    if (!standardize) w
    else {
      // fold back to raw space: wⱼ → wⱼ/σⱼ, bias → b − Σ (wⱼ/σⱼ)·μⱼ
      // as a pinned left-associated subtraction chain (the oracle
      // writes the identical chain)
      val folded = Array.tabulate(k)(j => w(j + 1) / sd(j))
      var b = w(0)
      var j = 0
      while (j < k) { b -= folded(j) * mu(j); j += 1 }
      b +: folded
    }
  }

  /** Calibration / reliability table for a [0,1] score column: fixed-
    * width bins (score 1.0 clamps into the top bin), per-bin count,
    * positive count, positive rate, and mean score — the "is my quality
    * classifier's 0.8 actually an 80%?" audit that decides whether a
    * gate threshold is trustworthy. Returns
    * (bin, n, n_pos, pos_rate, mean_score).
    *
    * Determinism: binning is floor of an exact-portable double product
    * (the scores themselves are exact-portable by the fast-sigmoid
    * contract); the mean-score SUM runs in order-independent
    * DECIMAL(38,18); rates are ONE double division + round(6). Shape at
    * 100 TB: one map-side bin projection into a ≤bins-row partial-agg'd
    * count — nothing after is input-sized. */
  def calibration(scored: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    val bin = least(floor(col(scoreCol) * bins).cast("int"), lit(bins - 1))
    scored
      .select(bin.as("bin"), col(scoreCol).as("__s"), col(labelCol).as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y") === 1.0, 1L).otherwise(0L)).as("n_pos"),
        sum(col("__s").cast("decimal(38,18)")).as("__ss"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"),
        round(col("__ss").cast("double") / col("n").cast("double"), 6)
          .as("mean_score"))
  }

  /** Precision/recall curve over pinned thresholds — the
    * gate-threshold tuning table: for each candidate cut, how many
    * rows the gate would keep and at what precision/recall/F1 against
    * the reference label. Decisions compare the UNROUNDED score
    * (exact-portable by the fast-sigmoid contract) to literal
    * thresholds, so every cell is an exact integer; rates are single
    * divisions + round(6), F1 in the single-division
    * 2·tp/(2·tp+fp+fn) form. Returns one row per threshold:
    * (threshold, n_pred_pos, tp, precision, recall, f1); zero
    * denominators NULL.
    *
    * Shape at 100 TB: each row fans out to the ≤|thresholds| grid
    * MAP-SIDE (explode of a literal array) into a thresholds-bounded
    * partial-agg'd count — the input is scanned once. */
  def prCurve(scored: DataFrame, scoreCol: String, labelCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val th = explode(array(thresholds.map(lit): _*)).as("threshold")
    val base = scored.select(col(scoreCol).as("__s"),
      col(labelCol).as("__y"), th)
    val agg = base.groupBy(col("threshold")).agg(
      sum(when(col("__s") >= col("threshold"), 1L).otherwise(0L))
        .as("n_pred_pos"),
      sum(when(col("__s") >= col("threshold") && col("__y") === 1.0, 1L)
        .otherwise(0L)).as("tp"),
      sum(when(col("__y") === 1.0, 1L).otherwise(0L)).as("__pos"))
    val fp = col("n_pred_pos") - col("tp")
    val fn = col("__pos") - col("tp")
    agg.select(col("threshold"), col("n_pred_pos"), col("tp"),
      when(col("n_pred_pos") > 0,
        round(col("tp").cast("double") / col("n_pred_pos").cast("double"),
          6)).as("precision"),
      when(col("__pos") > 0,
        round(col("tp").cast("double") / col("__pos").cast("double"), 6))
        .as("recall"),
      when(lit(2) * col("tp") + fp + fn > 0,
        round((lit(2) * col("tp")).cast("double") /
          (lit(2) * col("tp") + fp + fn).cast("double"), 6)).as("f1"))
  }

  /** Cohen's kappa from a (label, predicted, n) confusion table — the
    * chance-corrected agreement behind "is this classifier better than
    * the base rate?" and annotator-vs-annotator audits. κ =
    * (p_o − p_e)/(1 − p_e) with p_o the diagonal share and p_e the
    * marginal-product chance agreement; κ is NULL when p_e = 1 (a
    * degenerate single-cell matrix has no chance-corrected signal).
    * Returns one row (n, po, pe, kappa).
    *
    * Determinism: counts and marginals exact integers; the p_e
    * numerator Σ row_l·col_l accumulates in DECIMAL(38,0) (marginal
    * PRODUCTS overflow 2^53 long before counts do), then po/pe/κ are
    * pinned exact-portable double trees — κ computed from the
    * UNROUNDED po/pe, round(6) only on output. Shape: everything after
    * the confusion input is labels²-bounded. */
  def kappaFromConfusion(conf0: DataFrame, labelCol: String,
      predCol: String, nCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val conf = Dedup.maybeCache(conf0.select(
      col(labelCol).cast("string").as("__l"),
      col(predCol).cast("string").as("__p"),
      col(nCol).cast("long").as("__n")))
    val tot = conf.agg(sum(col("__n")).as("__N"),
      sum(when(col("__l") === col("__p"), col("__n")).otherwise(0L))
        .as("__diag"))
    val rows = conf.groupBy(col("__l")).agg(sum(col("__n")).as("__rn"))
    val cols = conf.groupBy(col("__p")).agg(sum(col("__n")).as("__cn"))
    val peNum = rows.join(cols, col("__l") === col("__p"))
      .agg(coalesce(sum(col("__rn").cast(d38) * col("__cn").cast(d38)),
        lit(0).cast(d38)).as("__penum"))
    val po = col("__diag").cast("double") / col("__N").cast("double")
    val pe = col("__penum").cast("double") /
      (col("__N").cast("double") * col("__N").cast("double"))
    tot.crossJoin(peNum)
      .select(col("__N").as("n"), po.as("__po"), pe.as("__pe"))
      .select(col("n"), round(col("__po"), 6).as("po"),
        round(col("__pe"), 6).as("pe"),
        when(col("__pe") =!= 1.0,
          round((col("__po") - col("__pe")) / (lit(1.0) - col("__pe")), 6))
          .as("kappa"))
  }

  /** Per-class precision / recall / F1 from a (label, predicted, n)
    * confusion table — the class-level companion to the single-number
    * [[kappaFromConfusion]]: which classes the classifier actually
    * serves. tp = the diagonal cell, fp = column total − tp, fn = row
    * total − tp; precision = tp/(tp+fp), recall = tp/(tp+fn),
    * F1 = 2·tp/(2·tp+fp+fn) — the harmonic mean in its single-division
    * integer-denominator form, so every metric is ONE exact-integer
    * double division + round(6) (no compounding of rounded factors).
    * Classes appearing only as labels or only as predictions still get
    * a row (full-outer marginals); zero denominators yield NULL.
    * Everything past the confusion input is labels²-bounded. */
  def classMetrics(conf0: DataFrame, labelCol: String, predCol: String,
      nCol: String): DataFrame = {
    val conf = Dedup.maybeCache(conf0.select(
      col(labelCol).as("__l"), col(predCol).as("__p"),
      col(nCol).cast("long").as("__n")))
    val rows = conf.groupBy(col("__l")).agg(sum(col("__n")).as("__rn"))
    val cols = conf.groupBy(col("__p")).agg(sum(col("__n")).as("__cn"))
    val diag = conf.filter(col("__l") === col("__p"))
      .groupBy(col("__l").as("label")).agg(sum(col("__n")).as("__tp"))
    val marg = rows.join(cols, col("__l") === col("__p"), "full_outer")
      .select(coalesce(col("__l"), col("__p")).as("label"),
        coalesce(col("__rn"), lit(0L)).as("__rn"),
        coalesce(col("__cn"), lit(0L)).as("__cn"))
    val tp = coalesce(col("__tp"), lit(0L))
    val fp = col("__cn") - tp
    val fn = col("__rn") - tp
    marg.join(diag, Seq("label"), "left")
      .select(col("label"), tp.as("tp"), fp.as("fp"), fn.as("fn"),
        when(col("__cn") > 0,
          round(tp.cast("double") / col("__cn").cast("double"), 6))
          .as("precision"),
        when(col("__rn") > 0,
          round(tp.cast("double") / col("__rn").cast("double"), 6))
          .as("recall"),
        when(lit(2) * tp + fp + fn > 0,
          round((lit(2) * tp).cast("double") /
            (lit(2) * tp + fp + fn).cast("double"), 6)).as("f1"))
  }

  /** Cohen's kappa between two per-item labelings (classifier vs
    * classifier, annotator vs annotator): inner-join on the item key —
    * items labeled by only one side are out of scope — count the
    * labels² confusion cells, and hand off to [[kappaFromConfusion]].
    * One key-hash join + one labels²-bounded aggregate. */
  def agreement(a: DataFrame, b: DataFrame, keyCol: String,
      aLabelCol: String, bLabelCol: String): DataFrame = {
    val conf = a.select(col(keyCol), col(aLabelCol).as("__la"))
      .join(b.select(col(keyCol), col(bLabelCol).as("__lb")), keyCol)
      .groupBy(col("__la"), col("__lb"))
      .agg(count(lit(1)).as("__cnt"))
    kappaFromConfusion(conf, "__la", "__lb", "__cnt")
  }
}
