package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for dataset curation: every decision
  * is a pure function of the row's key, so splits are reproducible across
  * runs, engines, and cluster sizes — the property `df.sample()` (seeded
  * per-partition RNG) does NOT have under repartitioning. At 100 TB these
  * are map-side filters: no shuffle, no state, trivially parallel.
  *
  * The hash is md5-derived (first 12 hex digits → BIGINT) rather than
  * xxhash64 so any SQL engine can reproduce the assignment bit-for-bit;
  * 12 hex digits = 48 bits, uniform, and exactly representable. */
object Skew {

  /** Salted equi-join for skewed keys: the big (skewed) side gets a
    * per-row salt in [0, saltFactor), the small side is exploded
    * saltFactor× so every (key, salt) pair still matches — one hot key's
    * rows spread over saltFactor reducers instead of one. The salt only
    * changes row DISTRIBUTION, never the join result, so any salt source
    * works; we derive it from a per-row random with a fixed seed. AQE's
    * skew-join split handles moderate skew automatically; explicit salting
    * is for the pathological keys AQE can't split (single key >> one
    * executor's memory). Inner joins only (the salt would break outer
    * semantics for unmatched small-side rows). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive: $saltFactor")
    val saltCol = "__graft_salt"
    val b = big.withColumn(saltCol,
      (rand(42) * saltFactor).cast("int"))
    val s = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    b.join(s, keys :+ saltCol).drop(saltCol)
  }
}

object Sampling {

  /** Uniform bucket in [0, buckets) from the key's md5. */
  def hashBucket(keyCol: String, buckets: Int): Column =
    pmod(conv(substring(md5(col(keyCol).cast("string")), 1, 12), 16, 10)
      .cast("long"), lit(buckets.toLong))

  /** Keep a deterministic `rate` fraction of rows (0.0-1.0). */
  def sampleByHash(df: DataFrame, keyCol: String, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate out of range: $rate")
    df.filter(hashBucket(keyCol, 10000) < math.round(rate * 10000))
  }

  /** Assign each row a named split by cumulative hash-bucket ranges, e.g.
    * `Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)`. Fractions must
    * sum to 1 (±1e-9); every row gets exactly one label. */
  def deterministicSplit(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1: $fractions")
    val bounds = fractions.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 10000)
    }.tail
    val b = hashBucket(keyCol, 10000)
    // nested when-chain checked in ascending bound order (foldRight makes
    // the first fraction the outermost test); rounding can leave bucket
    // 9999 past the last bound, so the last label is the default
    val labeled = fractions.zip(bounds)
      .foldRight(lit(fractions.last._1): Column) {
        case (((name, _), bound), acc) => when(b < bound, lit(name)).otherwise(acc)
      }
    df.withColumn(splitCol, labeled)
  }

  /** Leakage-safe deterministic split: near-duplicate documents land on
    * the SAME side. Naive per-doc hash splitting puts paraphrases of
    * training rows into the held-out set — the eval-leakage failure mode
    * measured directly by Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better"). Every document in a near-dup
    * component ([[graft.ops.Dedup.connectedComponents]] over any pair
    * operator's output) hashes on its component's canonical id instead
    * of its own, so whole clusters move together; documents without a
    * near-dup hash on their own id, reproducing [[deterministicSplit]]
    * bit-for-bit.
    *
    * Scale shape: component labels exist only for paired documents
    * (tiny next to the corpus), so the label join broadcasts under AQE;
    * the split itself stays the pure map-side md5 bucket. */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, idCol: String,
      fractions: Seq[(String, Double)], idACol: String = "id_a",
      idBCol: String = "id_b", splitCol: String = "split"): DataFrame = {
    val cc = graft.ops.Dedup.connectedComponents(pairs, idACol, idBCol)
    val keyed = docs.join(
        cc.select(col("id").as("__cc_id"), col("component_id")),
        col(idCol) === col("__cc_id"), "left")
      .withColumn("__split_key",
        coalesce(col("component_id"), col(idCol)))
      .drop("__cc_id", "component_id")
    deterministicSplit(keyed, "__split_key", fractions, splitCol)
      .drop("__split_key")
  }

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis 2006 priority sampling): keep the k rows with the highest
    * priority u^(1/w), where u is a per-key md5-uniform in (0, 1] and w
    * the row's positive weight — inclusion probability proportional to
    * weight, no replacement, ONE pass. The curation use: sample a
    * fixed-size corpus slice biased toward quality/length weights
    * without ever materializing cumulative distributions.
    *
    * Determinism contract: u = (h48 + 1) / 2^48 is EXACT (a ≤ 2^48
    * integer over a power of two); the priority needs `ln`/`exp`
    * (computed as exp(ln(u)/w) — both correctly rounded to ≤1 ulp in
    * JVM and DuckDB libm), so the cut ranks on the ROUNDED round(…, 9)
    * priority with an id tie-break — the collocations ulp-safe-cut
    * convention (round 9, not 6: priorities live in (0,1], so 1e-9
    * resolution keeps collision groups small while still absorbing the
    * last-bit spread). Selection is a distributed TakeOrdered; nothing
    * shuffles but the k winners. Non-positive or NULL weights drop. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val h48 = conv(substring(md5(col(keyCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    val u = (h48.cast("double") + lit(1.0)) / lit(281474976710656.0) // 2^48
    val pri = round(exp(log(u) / col(weightCol).cast("double")), 9)
    // the rank window runs over the limit(k) winners only
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("priority").desc, col(keyCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("priority", pri)
      .orderBy(col("priority").desc, col(keyCol))
      .limit(k)
      .withColumn("sample_rank", row_number().over(w))
  }

  /** Stratified deterministic sampling: a different keep-rate per stratum
    * (e.g. downsample boilerplate-heavy sources, keep all of a rare
    * language). Rows whose stratum has no configured rate keep
    * `defaultRate`. Same md5-bucket determinism as [[sampleByHash]] —
    * a pure map-side filter, no shuffle, reproducible on any engine. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate out of range: $r"))
    val b = hashBucket(keyCol, 10000)
    val threshold = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(math.round(defaultRate * 10000)): Column) {
        case (acc, (stratum, rate)) =>
          when(col(stratumCol) === stratum,
            lit(math.round(rate * 10000))).otherwise(acc)
      }
    df.filter(b < threshold)
  }

  /** Domain-mixture sampling: subsample each stratum (source/domain) so
    * the kept corpus approaches a target token mix — stratum s with
    * integer weight w_s out of Σw gets ≈ (w_s/Σw)·budget tokens, i.e.
    * keep-rate min(1, w_s·budget / (Σw·total_s)). Strata without a weight
    * are dropped (weight 0). The rate test is the same md5-bucket pure
    * function as [[stratifiedSample]], expressed as the cross-multiplied
    * integer inequality bucket·Σw·total_s < w_s·budget·10000 in
    * DECIMAL(38,0), so any engine reproduces the exact row set — no
    * float rounding at the threshold.
    *
    * Scale shape: per-stratum token totals are one partial-agg shuffle of
    * (stratum, count) pairs; the totals and weight tables are broadcast
    * back (strata counts are small by definition); the filter itself is
    * map-side. No driver-side loop, no collect. */
  def mixByTokenWeights(df: DataFrame, keyCol: String, stratumCol: String,
      tokensCol: String, weights: Seq[(String, Long)],
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(weights.nonEmpty, "weights must not be empty")
    weights.foreach { case (s, w) =>
      require(w > 0, s"weight must be positive for stratum '$s': $w") }
    val wsum = weights.map(_._2).sum
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toDF(stratumCol, "__wgt")
    val totals = df.groupBy(col(stratumCol))
      .agg(sum(col(tokensCol)).cast("decimal(38,0)").as("__total"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    df.join(broadcast(totals), Seq(stratumCol))
      .join(broadcast(w), Seq(stratumCol)) // inner: unweighted strata drop
      .filter(dec(hashBucket(keyCol, 10000)) * col("__total") * dec(lit(wsum))
        < dec(lit(budget)) * dec(col("__wgt")) * dec(lit(10000L)))
      .drop("__total", "__wgt")
  }

  /** Deterministic fixed-SIZE per-group sample: the k rows of each group
    * with the smallest md5 key hash — the eval-set/debug-slice
    * counterpart to the rate-based samplers (a rate cannot promise
    * "exactly k per stratum"; hash order makes the choice a pure
    * function of the keys, stable across runs, partitionings, and
    * engines). One key-hash shuffle for the ranking window; ties on the
    * 48-bit hash break by key. Emits `rankCol` (1..k) for downstream
    * ordering. */
  def sampleKPerGroup(df: DataFrame, keyCol: String, groupCol: String,
      k: Int, rankCol: String = "rn"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val hv = conv(substring(md5(col(keyCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(hv.asc, col(keyCol).asc)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }

  /** Temperature-scaled (α = 0.5) domain mixing — the standard
    * multilingual/multi-domain rebalancing (XLM-R style): sampling mass
    * per stratum ∝ (token share)^α, so small domains are upweighted and
    * giant domains downweighted relative to natural proportions. α is
    * fixed at 0.5 because `sqrt` is the one power IEEE 754 requires to
    * be correctly rounded — `floor(sqrt(total))` is bit-identical in
    * every engine, which keeps the whole mix oracle-checkable (a general
    * `pow(x, α)` is not correctly rounded and may differ in the last ulp
    * across engines, flipping boundary rows).
    *
    * Implementation: per-stratum integer weights floor(sqrt(token
    * total)) feed the same exact-decimal acceptance filter as
    * [[mixByTokenWeights]] — two broadcast joins onto the corpus, the
    * accept test is map-side integer/decimal math, no second shuffle. */
  def temperatureMixByTokens(df: DataFrame, keyCol: String,
      stratumCol: String, tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    // cache the totals: wsum folds IT, not a re-derivation of the
    // caller's whole upstream plan — without the boundary the weight-sum
    // chain re-evaluated the input corpus a second time (a third,
    // counting the probe join below). Unconditional (not the maybeCache
    // local-mode policy): the table is strata-bounded — a handful of
    // rows at any corpus size — so the cache is safe on a cluster too.
    val totals = df.groupBy(col(stratumCol))
      .agg(sum(col(tokensCol)).cast("decimal(38,0)").as("__total"))
      .withColumn("__wgt",
        floor(sqrt(col("__total").cast("double"))).cast("decimal(38,0)"))
      .cache()
    val wsum = totals.agg(sum(col("__wgt")).cast("decimal(38,0)").as("__wsum"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    df.join(broadcast(totals), Seq(stratumCol))
      .crossJoin(broadcast(wsum))
      .filter(dec(hashBucket(keyCol, 10000)) * col("__total") * col("__wsum")
        < dec(lit(budget)) * col("__wgt") * dec(lit(10000L)))
      .drop("__total", "__wgt", "__wsum")
  }

  /** Token-budget shard packing: assign documents to consecutive training
    * shards so each shard holds ≈ `budget` tokens. Deterministic packing
    * order = `orderCol` (a unique integral key); shard id =
    * floor(exclusive running token sum / budget) — all-integer, no driver
    * loop. A document straddling a boundary belongs to the shard where
    * its first token landed (shards overflow by at most one document, the
    * standard pretraining-shard contract). The running sum is
    * [[Packing.exclusiveRunningSum]]'s bucketed distributed prefix sum,
    * so no window ever sees more than ~1/buckets of the corpus — the
    * global packing order costs one ≤buckets-row shuffle plus an
    * O(buckets) driver cumsum, not a single-partition window. */
  def packByTokenBudget(df: DataFrame, orderCol: String, tokensCol: String,
      budget: Long, shardCol: String = "shard",
      buckets: Int = 256): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    Packing.exclusiveRunningSum(df, orderCol,
        col(tokensCol).cast("long"), shardCol, buckets)
      .withColumn(shardCol, expr(s"$shardCol div ${budget}L"))
  }

  /** Poisson-bootstrap standard error of a mean (Chamandy et al. 2012,
    * "Estimating Uncertainty for Massive Data Streams" — THE
    * distributed bootstrap): instead of resampling n rows with
    * replacement (impossible to coordinate across executors), every
    * row draws an independent Poisson(1) replication count per
    * replica, which converges to the multinomial bootstrap at scale
    * and needs NO shuffle beyond two partial-agg'd aggregates. Returns
    * one row: n, mean (exact point estimate), n_replicas, boot_se (sd
    * of the replica means), and the ±1.96·se normal CI — the
    * error-bar every pipeline metric should ship with.
    *
    * Determinism: the per-(row, replica) Poisson draw inverts a PINNED
    * 10-decimal CDF table against the md5-exact uniform
    * (h48+1)/2^48 — exact-portable doubles compared to literal
    * constants, the weightedSample convention, so every engine draws
    * the identical counts. Replica sums run in DECIMAL(38,0); replica
    * means and their sd accumulate in order-independent
    * DECIMAL(38,18); every output is a pinned double tree + round(6)
    * (CI from the UNROUNDED mean/se). Empty replicas (possible only on
    * tiny inputs) drop out. Shape at 100 TB: a `replicas`× map-side
    * explode into a partial-agg'd ≤replicas-row aggregate, a 1-row
    * point-estimate aggregate, and a cross of two bounded rows. */
  def bootstrapMean(df: DataFrame, keyCol: String, valueCol: String,
      replicas: Int = 32): DataFrame = {
    require(replicas >= 2, s"need >= 2 replicas: $replicas")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val d18 = org.apache.spark.sql.types.DecimalType(38, 18)
    val in = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).cast("string").as("__k"),
        col(valueCol).cast("long").as("__x"))
    val pt = in.agg(count(lit(1)).as("__n"),
      sum(col("__x").cast(d38)).as("__sx"))
    val seeded = in.select(col("__k"), col("__x"),
      explode(array((0 until replicas).map(lit): _*)).as("__b"))
    val h48 = conv(substring(
      md5(concat(col("__k"), lit("_"), col("__b"))), 1, 12), 16, 10)
      .cast("long")
    val u = (h48.cast("double") + lit(1.0)) / lit(281474976710656.0)
    // Poisson(1) inverse CDF, pinned to 10 decimals (tail mass folded
    // into the last bucket)
    val wgt = when(u < 0.3678794412, 0)
      .when(u < 0.7357588823, 1)
      .when(u < 0.9196986029, 2)
      .when(u < 0.9810118431, 3)
      .when(u < 0.9963401532, 4)
      .otherwise(5)
    val rep = seeded.withColumn("__w", wgt.cast("long"))
      .groupBy(col("__b"))
      .agg(sum(col("__w")).as("__nw"),
        sum(col("__w").cast(d38) * col("__x").cast(d38)).as("__sw"))
      .filter(col("__nw") > 0)
      .select((col("__sw").cast("double") / col("__nw").cast("double"))
        .as("__m"))
    // Center each replica mean on the exact point estimate BEFORE the
    // moment sums: the deviations are se-sized, so their
    // double→DECIMAL(38,18) quantization stays far below round(6) —
    // accumulating raw means would square metric-sized magnitudes and
    // amplify the engines' last-digit double→decimal differences
    // through the variance cancellation (observed: 2e-6 on boot_se).
    val mean = col("__sx").cast("double") / col("__n").cast("double")
    val centered = rep.crossJoin(broadcast(pt))
      .select(col("__n"), col("__sx"), (col("__m") - mean).as("__dv"))
    val st = centered.agg(max(col("__n")).as("__n"),
      max(col("__sx")).as("__sx"),
      count(lit(1)).as("__nr"),
      sum(col("__dv").cast(d18)).as("__sm"),
      sum((col("__dv") * col("__dv")).cast(d18)).as("__sq"))
    val nrD = col("__nr").cast("double")
    val smD = col("__sm").cast("double")
    val sqD = col("__sq").cast("double")
    val se = sqrt(greatest(
      sqD / nrD - (smD / nrD) * (smD / nrD), lit(0.0)))
    st.select(col("__n").as("n"), round(mean, 6).as("mean"),
      col("__nr").as("n_replicas"), round(se, 6).as("boot_se"),
      round(mean - lit(1.96) * se, 6).as("ci_lo"),
      round(mean + lit(1.96) * se, 6).as("ci_hi"))
  }

  /** Curriculum ordering: split the corpus into `bands` difficulty
    * bands by a score column (easy → hard) and emit an integer
    * `interleave_key` whose ascending order serves one item from each
    * band in rotation — the anti-curriculum-shock schedule ("don't
    * front-load all the easy web text") that still trends easy→hard
    * WITHIN each band position. Returns
    * (key, band, band_rank, interleave_key) with
    * interleave_key = (band_rank − 1)·bands + band, globally unique.
    *
    * Banding is the Packing prefix-sum discipline, NOT a global ntile
    * (a single-partition window over the corpus is not a 100 TB plan):
    * scores collapse map-side to ROUNDED-score keys (round(·,4) —
    * caller contract: normalized or integer-valued difficulty, so the
    * distinct-key table is bounded), the band boundaries come from a
    * cumulative count over that bounded histogram, and each item's
    * within-band rank = the histogram's strictly-before count plus a
    * row_number over its OWN rounded-score partition (ties ordered by
    * the unique key) — the only input-sized window, partitioned by the
    * score keys. All-integer, engine-exact; the band split is floor of
    * an exact (<2^53) double product. NULL scores dropped. */
  def curriculumOrder(df: DataFrame, keyCol: String, scoreCol: String,
      bands: Int): DataFrame = {
    require(bands > 0, s"bands must be positive: $bands")
    val base = df.filter(col(scoreCol).isNotNull)
      .withColumn("__r", round(col(scoreCol).cast("double"), 4))
    val hist = base.groupBy(col("__r")).agg(count(lit(1)).as("__c"))
    // bounded-table windows only (the histogram, never the input)
    val one = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val cum = hist
      .withColumn("__cumprev",
        sum(col("__c")).over(one.orderBy(col("__r"))) - col("__c"))
      .withColumn("__tot", sum(col("__c")).over(one))
    val bandTab = cum.withColumn("__band",
      least(lit(bands - 1),
        floor(col("__cumprev").cast("double") * bands /
          col("__tot").cast("double")).cast("int")))
    val bstart = bandTab.groupBy(col("__band"))
      .agg(min(col("__cumprev")).as("__bstart"))
    val lookup = bandTab.join(bstart, "__band")
      .select(col("__r"), col("__band"),
        (col("__cumprev") - col("__bstart")).as("__before"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__r")).orderBy(col(keyCol))
    base.join(broadcast(lookup), "__r")
      .withColumn("__rn", row_number().over(wr))
      .select(col(keyCol), col("__band").as("band"),
        (col("__before") + col("__rn")).as("band_rank"),
        ((col("__before") + col("__rn") - 1) * bands + col("__band"))
          .as("interleave_key"))
  }
}
