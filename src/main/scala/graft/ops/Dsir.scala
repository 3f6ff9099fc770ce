package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling"): score every
  * raw-corpus document by how much more likely its hashed n-gram features
  * are under a target-domain distribution than under the raw-corpus
  * distribution, then keep the highest-scoring docs — the
  * domain-targeting selector of a pretraining pipeline (pick the
  * Wikipedia-like slice of a web crawl).
  *
  * Model: bag of hashed features (word unigrams + bigrams hashed into
  * `buckets` buckets — the paper's hashed n-gram feature space), with
  * Laplace-smoothed bucket probabilities
  * p(b) = (c_b + 1)/(C + buckets) fit separately on the target slice and
  * the raw corpus. A document's score is the length-normalized log
  * importance ratio (Σ_f [ln p_t(b_f) − ln p_r(b_f)]) / n_features; the
  * per-feature term expands to four ln factors of EXACT-integer-valued
  * doubles (every count < 2⁵³), so there is no integer-product overflow
  * at any corpus size.
  *
  * Determinism (the oracle contract): counts are exact integers; each
  * bucket's log-ratio is ln applied to exact-integer doubles (JVM↔DuckDB
  * libm agree to ≤1 ulp); the per-doc sum runs in DECIMAL(38,18) —
  * order-independent, so partitioning never changes the hash. The bucket
  * hash is the engine-wide md5 convention
  * (`conv(substring(md5(f),1,12),16,10) % buckets`), reproducible in
  * DuckDB as `('0x' || substr(md5(f),1,12))::BIGINT % buckets`.
  *
  * Scale shape: two feature-count aggregates whose OUTPUT is bounded by
  * `buckets` (partial-agg'd, ≤ buckets reduce keys each); the per-bucket
  * log-ratio table is ≤ `buckets` rows and is the ONLY broadcast —
  * bounded by construction, never corpus-sized; scoring is one explode +
  * broadcast hash join + one per-doc decimal-sum shuffle. Selection is a
  * distributed TakeOrdered (no global sort).
  */
object Dsir {

  /** Hashed-feature array for one document: word unigrams + bigrams.
    * The 1-token guard mirrors lmSurprise: Spark's sequence(1, 0) is
    * the DESCENDING [1, 0], not empty. */
  private def featureExpr(textCol: String): Column = {
    val uni = split(col(textCol), " ")
    val bi = when(size(uni) >= 2, expr(
      s"""transform(sequence(1, size(split($textCol, ' ')) - 1),
         |  i -> concat(element_at(split($textCol, ' '), i), ' ',
         |              element_at(split($textCol, ' '), i + 1)))"""
        .stripMargin))
      .otherwise(array().cast("array<string>"))
    concat(uni, bi)
  }

  /** md5-convention bucket id for a feature string. */
  private def bucketExpr(f: Column, buckets: Int): Column =
    pmod(conv(substring(md5(f), 1, 12), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** (doc id, feature bucket) pairs with multiplicity. */
  private def docBuckets(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docs.select(col(idCol), explode(featureExpr(textCol)).as("__f"))
      .select(col(idCol), bucketExpr(col("__f"), buckets).as("__b"))

  /** Per-document length-normalized log importance ratio of the raw
    * corpus against the target slice: (idCol, n_feats, logw). Documents
    * with zero features (empty text never splits to zero tokens, so in
    * practice: none) drop out. `logw` > 0 means "more target-like than
    * the raw average". */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val rawPairs = Dedup.maybeCache(
      docBuckets(Dedup.spread(raw.select(col(idCol), col(textCol))),
        idCol, textCol, buckets))
    val tCounts = docBuckets(target, idCol, textCol, buckets)
      .groupBy(col("__b")).agg(count(lit(1)).as("__tc"))
    val rCounts = rawPairs.groupBy(col("__b")).agg(count(lit(1)).as("__rc"))
    val tTot = tCounts.agg(sum(col("__tc")).as("__tt"))
    val rTot = rCounts.agg(sum(col("__rc")).as("__rt"))
    // every bucket a raw doc can hit appears in rCounts (the doc's own
    // features are part of the raw counts), so rCounts is the spine
    val ratio = rCounts
      .join(tCounts, Seq("__b"), "left_outer")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("__b"),
        (log(coalesce(col("__tc"), lit(0L)).cast("double") + lit(1.0)) -
          log(col("__tt").cast("double") + lit(buckets.toDouble)) -
          log(col("__rc").cast("double") + lit(1.0)) +
          log(col("__rt").cast("double") + lit(buckets.toDouble)))
          .as("__lr"))
    rawPairs
      .join(broadcast(ratio), Seq("__b"))
      .withColumn("__s", col("__lr").cast("decimal(38,18)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__s")).as("__sum"))
      .select(col(idCol), col("n_feats"),
        round(col("__sum").cast("double") /
          col("n_feats").cast("double"), 6).as("logw"))
  }

  /** Top-k DSIR selection: the k most target-like raw docs by
    * (logw desc, id asc) — a distributed TakeOrdered, no global sort. */
  def selectTopK(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 4096): DataFrame =
    importanceWeights(raw, target, idCol, textCol, buckets)
      .orderBy(col("logw").desc, col(idCol).asc)
      .limit(k)

  /** The per-bucket log importance-ratio table as a PERSISTABLE frozen
    * artifact: (bucket, lr) for every feature bucket the raw corpus
    * hits — the SAME smoothed four-ln expression [[importanceWeights]]
    * computes internally, so scoring the training corpus under the
    * persisted table reproduces it bit-for-bit — PLUS one sentinel row
    * (bucket = −1, the real buckets are ≥ 0) carrying the unseen-bucket
    * default ln(((0+1)·(rt+B)) / ((tt+B)·(0+1))): the smoothing
    * evaluated at tc = rc = 0, so held-out text whose features miss the
    * table still scores under the same model. ≤ buckets + 1 rows —
    * bounded by construction, never corpus-sized. */
  def bucketRatios(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val rawPairs = docBuckets(Dedup.spread(raw.select(col(idCol),
      col(textCol))), idCol, textCol, buckets)
    val tCounts = docBuckets(target, idCol, textCol, buckets)
      .groupBy(col("__b")).agg(count(lit(1)).as("__tc"))
    val rCounts = Dedup.maybeCache(
      rawPairs.groupBy(col("__b")).agg(count(lit(1)).as("__rc")))
    val tTot = tCounts.agg(sum(col("__tc")).as("__tt"))
    val rTot = rCounts.agg(sum(col("__rc")).as("__rt"))
    def lrExpr(tc: Column, rc: Column): Column =
      log(tc.cast("double") + lit(1.0)) -
        log(col("__tt").cast("double") + lit(buckets.toDouble)) -
        log(rc.cast("double") + lit(1.0)) +
        log(col("__rt").cast("double") + lit(buckets.toDouble))
    val real = rCounts
      .join(tCounts, Seq("__b"), "left_outer")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("__b").as("bucket"),
        lrExpr(coalesce(col("__tc"), lit(0L)), col("__rc")).as("lr"))
    val dflt = tTot.crossJoin(rTot)
      .select(lit(-1L).as("bucket"), lrExpr(lit(0L), lit(0L)).as("lr"))
    real.unionByName(dflt)
  }

  /** Score documents under a FROZEN [[bucketRatios]] table: the same
    * length-normalized per-doc mean log-ratio as [[importanceWeights]].
    * On the training corpus every bucket hits the table (its spine is
    * the raw corpus's own buckets), so the coalesce is a no-op and the
    * result is the inline trainer bit-for-bit — the run-1 parity an
    * incremental pipeline needs; on new text, unseen buckets coalesce
    * to the sentinel default. The ratio table broadcasts (bounded by
    * `buckets`); scoring stays one explode + broadcast join + one
    * per-doc decimal-sum shuffle. */
  def scoreWithRatios(docs: DataFrame, idCol: String, textCol: String,
      ratios: DataFrame, buckets: Int = 4096): DataFrame = {
    val pairs = docBuckets(Dedup.spread(docs.select(col(idCol),
      col(textCol))), idCol, textCol, buckets)
    val real = ratios.filter(col("bucket") >= 0)
      .select(col("bucket").as("__b"), col("lr").as("__lr"))
    val dflt = ratios.filter(col("bucket") < 0)
      .select(col("lr").as("__dl"))
    pairs
      .join(broadcast(real), Seq("__b"), "left_outer")
      .crossJoin(broadcast(dflt))
      .withColumn("__s",
        coalesce(col("__lr"), col("__dl")).cast("decimal(38,18)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__s")).as("__sum"))
      .select(col(idCol), col("n_feats"),
        round(col("__sum").cast("double") /
          col("n_feats").cast("double"), 6).as("logw"))
  }
}
