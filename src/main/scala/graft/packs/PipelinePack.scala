package graft.packs

import graft.Tables
import graft.ops.{Bpe, Classify, Dedup, Multimodal, Packing, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over the documents/embeddings tables:
  * dedup family, similarity search, text analysis, multimodal plumbing.
  * Every deterministic operator carries a DuckDB oracle; the approximate
  * ANN variant is rows-only by design. */
object PipelinePack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup over a deliberately duplicated corpus
    "q_dedup_exact" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select("doc_id", "text")
      val dup = docs.withColumn("doc_id", col("doc_id") + 100000)
      Dedup.exact(docs.unionByName(dup), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // MinHash + LSH banding, exact-Jaccard verified
    "q_dedup_minhash" -> ((s, dir) => {
      Dedup.minhashNearDups(Tables(s, dir, "documents"), "doc_id", "text",
        k = 3, perms = 128, bands = 21, threshold = 0.8)
        .orderBy("id_a", "id_b")
    }),

    // exact n-gram Jaccard (quadratic baseline, shingle-share pruned)
    "q_dedup_ngram" -> ((s, dir) => {
      Dedup.ngramJaccard(Tables(s, dir, "documents"), "doc_id", "text",
        k = 3, threshold = 0.8)
        .orderBy("id_a", "id_b")
    }),

    // containment (asymmetric Jaccard ≥ 0.6): catches subset duplication
    // — a doc quoted whole inside a longer one — that symmetric Jaccard
    // misses; verified over a corpus where short docs embed in long ones
    "q_dedup_containment" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      // synthesize guaranteed subset-dups: every 41st doc also appears
      // wrapped inside a longer synthetic host document
      val hosts = docs.filter(col("doc_id") % 41 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(lit("prefix words before the quoted body "), col("text"),
            lit(" and trailing commentary after the quote")).as("text"))
      Dedup.containmentPairs(
        docs.select("doc_id", "text").unionByName(hosts),
        "doc_id", "text", k = 3, threshold = 0.6)
        .orderBy("id_a", "id_b")
    }),

    // connected components over the MinHash near-dup pair graph: every
    // clustered doc labeled with its cluster's minimum id
    "q_dedup_components" -> ((s, dir) => {
      val pairs = Dedup.minhashNearDups(Tables(s, dir, "documents"),
        "doc_id", "text", k = 3, perms = 128, bands = 21, threshold = 0.8)
      Dedup.connectedComponents(pairs, "id_a", "id_b").orderBy("id")
    }),

    // near-dup cluster-size distribution: how big do duplicate families
    // get — the one-table summary a dedup run reports; everything past
    // the pair graph is component-bounded
    "q_dedup_sizes" -> ((s, dir) => {
      val pairs = Dedup.minhashNearDups(Tables(s, dir, "documents"),
        "doc_id", "text", k = 3, perms = 128, bands = 21, threshold = 0.8)
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .groupBy("component_id").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_clusters"))
        .orderBy("size")
    }),

    // corpus-level dedup: drop non-canonical cluster members, annotate
    // survivors with cluster size
    "q_dedup_canonical" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        k = 3, perms = 128, bands = 21, threshold = 0.8)
      Dedup.canonicalCorpus(docs, pairs, "doc_id")
        .select(col("doc_id"), col("n_dups")).orderBy("doc_id")
    }),

    // best-of-cluster dedup: per near-dup component keep the LONGEST
    // document (tie -> min id) instead of the min id
    "q_dedup_best" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        k = 3, perms = 128, bands = 21, threshold = 0.8)
      Dedup.canonicalCorpusBy(docs, pairs, "doc_id", "n_chars")
        .select(col("doc_id"), col("n_chars"), col("n_dups"))
        .orderBy("doc_id")
    }),

    // SimHash with pigeonhole banding
    "q_dedup_simhash" -> ((s, dir) => {
      Dedup.simhashNearDups(Tables(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // embedding-cosine near-dup pairs
    "q_dedup_embedding" -> ((s, dir) => {
      Dedup.embeddingNearDups(Tables(s, dir, "embeddings"), "vec_id",
        "embedding", threshold = 0.45)
        .orderBy("id_a", "id_b")
    }),

    // banded-LSH embedding near-dups — the sub-quadratic scale path:
    // candidates from the (band, 8-bit hyperplane signature) equi-join,
    // verified with the exact decimal cosine. The oracle mirrors the
    // banding (not just the cosine threshold), so band-filtered recall
    // is part of the checked contract.
    "q_dedup_embedding_lsh" -> ((s, dir) => {
      Dedup.embeddingNearDupsLsh(Tables(s, dir, "embeddings"), "vec_id",
        "embedding", threshold = 0.45)
        .orderBy("id_a", "id_b")
    }),

    // SemDeDup: k-means cells → within-cell cosine near-dup components →
    // keep the member farthest from its centroid (training included in
    // the oracle)
    "q_dedup_semantic" -> ((s, dir) => {
      Dedup.semanticDedup(Tables(s, dir, "embeddings"), "vec_id",
        "embedding", nlist = 8, iters = 2, threshold = 0.4)
        .select(col("id").as("vec_id"), col("cid").cast("int").as("cid"),
          col("n_dups"))
        .orderBy("vec_id")
    }),

    // brute-force exact cosine top-k
    "q_ann_bruteforce" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed ANN (approximate → rows-only check)
    "q_ann_lsh" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.lshTopK(queries, emb, "vec_id", "embedding", k = 5, bits = 6)
        .orderBy("query_id", "rank")
    }),

    // IVF ANN: deterministic k-means training + nprobe search — the whole
    // pipeline (training included) is oracle-checked
    "q_ann_ivf" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.ivfTopK(queries, emb, "vec_id", "embedding", k = 5,
        nlist = 8, nprobe = 2, iters = 2)
        .orderBy("query_id", "rank")
    }),

    // product-quantization ANN: per-subspace decimal k-means codebooks,
    // corpus compressed to m codes, queries rank by ADC table lookups —
    // the memory-scale ANN path, bit-reproducible end to end
    "q_ann_pq" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.pqTopK(queries, emb, "vec_id", "embedding", k = 5,
        m = 4, codebookSize = 16, iters = 1)
        .orderBy("query_id", "rank")
    }),

    // IVF+PQ ANN: coarse k-means cells prune the probe to nprobe lists
    // per query, PQ ADC tables rank inside the probed lists — the
    // composition that removes plain PQ's every-query-scans-every-code
    // linear pass while keeping the compression; both trainings
    // deterministic, the whole pipeline oracle-checked
    "q_ann_ivfpq" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.ivfpqTopK(queries, emb, "vec_id", "embedding", k = 5,
        nlist = 8, nprobe = 2, coarseIters = 1, m = 4, codebookSize = 16,
        iters = 1)
        .orderBy("query_id", "rank")
    }),

    // language ID distribution
    "q_text_langid" -> ((s, dir) => {
      Dedup.spread(Tables(s, dir, "documents"))
        .withColumn("predicted_lang", TextAnalysis.languageId("text"))
        .groupBy("predicted_lang").agg(count(lit(1)).as("n"))
        .orderBy("predicted_lang")
    }),

    // langid audited against the labeled lang column: the confusion
    // matrix, then its chance-corrected kappa — the classifier-audit
    // family composed onto a text op
    "q_text_lang_confusion" -> ((s, dir) => {
      Dedup.spread(Tables(s, dir, "documents"))
        .withColumn("predicted", TextAnalysis.languageId("text"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    }),

    "q_text_lang_kappa" -> ((s, dir) => {
      val conf = Dedup.spread(Tables(s, dir, "documents"))
        .withColumn("predicted", TextAnalysis.languageId("text"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
      Classify.kappaFromConfusion(conf, "lang", "predicted", "n")
    }),

    // quality features + composite score
    "q_text_quality" -> ((s, dir) => {
      TextAnalysis.qualityFeatures(
        Tables(s, dir, "documents").filter(col("doc_id") % 23 === 0)
          .select("doc_id", "text"), "text")
        .select("doc_id", "n_chars_actual", "n_tokens", "mean_word_len",
          "stopword_ratio", "punct_ratio", "quality_score")
        .orderBy("doc_id")
    }),

    // token counting: whitespace + BPE-ish subword estimate
    "q_text_tokens" -> ((s, dir) => {
      Tables(s, dir, "documents").filter(col("doc_id") % 23 === 0)
        .select(col("doc_id"),
          TextAnalysis.tokenCount("text").as("n_tokens"),
          TextAnalysis.subwordCount("text").as("n_subwords"))
        .orderBy("doc_id")
    }),

    // concat-and-chunk sequence packing: global token offsets via the
    // bucketed distributed prefix sum; per-doc sequence-id spans
    "q_pack_sequences" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount("text").cast("long").as("n_tokens"))
      Packing.packSequences(docs, "doc_id", "n_tokens", seqLen = 512)
        .select("doc_id", "n_tokens", "tok_start", "seq_first", "seq_last")
        .orderBy("doc_id")
    }),

    // materialized training sequences: every 512-token sequence of the
    // concatenated corpus stream (EOS-separated), bodies md5-pinned
    "q_pack_assemble" -> ((s, dir) => {
      Packing.assembleSequences(Tables(s, dir, "documents"), "doc_id",
        "text", seqLen = 512)
        .select(col("seq_id"), col("n_tokens"),
          md5(col("seq_text")).as("h"))
        .orderBy("seq_id")
    }),

    // packing-quality summary: stream length, sequence count, and how many
    // documents straddle a sequence boundary at seqLen=512
    "q_pack_stats" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount("text").cast("long").as("n_tokens"))
      Packing.packSequences(docs, "doc_id", "n_tokens", seqLen = 512)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens") + 1).as("stream_tokens"),
          expr("(sum(n_tokens + 1) + 511) div 512").as("n_sequences"),
          sum(when(col("seq_first") =!= col("seq_last"), 1L)
            .otherwise(0L)).as("n_boundary_docs"))
    }),

    // salted skew join: orders (big, skewed on status — only 3 values)
    // joined to a tiny per-status dim through an 8-way salt; result must
    // equal the plain join
    "q_skew_join" -> ((s, dir) => {
      import s.implicits._
      val dim = Seq(("F", "finished"), ("O", "open"), ("P", "pending"))
        .toDF("o_orderstatus", "status_name")
      graft.ops.Skew.saltedJoin(
        Tables(s, dir, "orders"), dim, Seq("o_orderstatus"), saltFactor = 8)
        .groupBy("status_name")
        .agg(count(lit(1)).as("n"),
          moneyOut(sum(col("o_totalprice").cast("decimal(18,4)"))).as("total"))
        .orderBy("status_name")
    }),

    // deterministic hash split: reproducible train/val/test assignment as
    // a pure function of the key (md5 buckets) — a map-side filter at scale
    "q_sample_split" -> ((s, dir) => {
      val split = graft.ops.Sampling.deterministicSplit(
        Tables(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      split.groupBy("split").agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_id"))
        .orderBy("split")
    }),

    // leakage-safe split: near-dup clusters (the SAME minhash pair graph
    // as q_dedup_components) hash on their canonical id, so paraphrase
    // families land on one side of train/val/test as a unit; unpaired
    // docs reproduce q_sample_split's assignment exactly
    "q_sample_leakage_split" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        k = 3, perms = 128, bands = 21, threshold = 0.8)
      graft.ops.Sampling.leakageSafeSplit(docs.select("doc_id"), pairs,
        "doc_id", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .orderBy("doc_id")
    }),

    // DSIR importance weights (Xie et al. 2023): every doc's
    // length-normalized log ratio of hashed-ngram likelihood under the
    // zh-language target slice vs the whole corpus
    "q_sample_dsir" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.ops.Dsir.importanceWeights(
        docs.select("doc_id", "text"),
        docs.filter(col("lang") === "zh").select("doc_id", "text"),
        "doc_id", "text", buckets = 1024)
        .orderBy("doc_id")
    }),

    // FROZEN DSIR artifact: the per-bucket log-ratio table trained on
    // the doc_id % 3 != 0 slice (target = its zh docs), ROUND-TRIPPED
    // THROUGH PARQUET (exactly how the incremental pipeline persists
    // it), then EVERY doc scored under the frozen table — train-slice
    // docs whose buckets all hit reproduce the inline trainer;
    // held-out docs with unseen buckets exercise the sentinel-default
    // OOV path (bucket −1 = the smoothing evaluated at tc = rc = 0)
    "q_sample_dsir_frozen" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 3 =!= 0)
      val ratios = graft.ops.Dsir.bucketRatios(
        train.select("doc_id", "text"),
        train.filter(col("lang") === "zh").select("doc_id", "text"),
        "doc_id", "text", buckets = 1024)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_dsir_frozen").toString
      ratios.write.mode("overwrite").parquet(tmp)
      graft.ops.Dsir.scoreWithRatios(docs.select("doc_id", "text"),
        "doc_id", "text", s.read.parquet(tmp), buckets = 1024)
        .orderBy("doc_id")
    }),

    // DSIR selection: the 50 most target-like docs (logw desc, id asc)
    "q_sample_dsir_topk" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.ops.Dsir.selectTopK(
        docs.select("doc_id", "text"),
        docs.filter(col("lang") === "zh").select("doc_id", "text"),
        "doc_id", "text", k = 50, buckets = 1024)
    }),

    // stratified sampling: per-language keep rates, md5-deterministic
    "q_sample_stratified" -> ((s, dir) => {
      graft.ops.Sampling.stratifiedSample(
        Tables(s, dir, "documents"), "doc_id", "lang",
        rates = Map("en" -> 0.5, "de" -> 1.0), defaultRate = 0.25)
        .groupBy("lang").agg(count(lit(1)).as("n"), min("doc_id").as("min_id"))
        .orderBy("lang")
    }),

    // ordered funnel: signup → click → purchase progression per user,
    // first-completion semantics, one shuffle. The first-two-days slice
    // spreads users across all four depths (the full month converges to
    // everyone completing)
    "q_funnel" -> ((s, dir) => {
      graft.ops.Funnel.depth(
        Tables(s, dir, "events")
          .filter(expr("ts < TIMESTAMP '2024-01-03'")),
        "user_id", "event_type", "ts", Seq("signup", "click", "purchase"))
        .groupBy("funnel_depth")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("funnel_depth")
    }),

    // conversion-window funnel: same cascade over the FULL month (where
    // the unconstrained funnel converges to everyone completing) but
    // every step must land within 8h of the first signup — the
    // "converted within N" product-analytics contract
    "q_funnel_window" -> ((s, dir) => {
      graft.ops.Funnel.depth(
        Tables(s, dir, "events"),
        "user_id", "event_type", "ts", Seq("signup", "click", "purchase"),
        withinMicros = Some(28800000000L))
        .groupBy("funnel_depth")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("funnel_depth")
    }),

    // z-order key: the Morton bit-interleave that drives the zorder
    // write layout, oracle-pinned on explicit bucket ids (the layout
    // itself — repartitionByRange — is physical and spec-tested)
    "q_zorder_key" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
        .withColumn("bx", pmod(col("o_custkey"), lit(256)).cast("int"))
        .withColumn("by",
          pmod(floor(col("o_totalprice")).cast("long"), lit(256)).cast("int"))
      orders.select(col("o_orderkey"),
        graft.ops.Zorder.mortonKey(Seq(col("bx"), col("by"))).as("zkey"))
        .orderBy("o_orderkey")
    }),

    // forward as-of: every click gets the user's NEXT purchase value
    // at-or-after it (conversion attribution) — same one-window shape
    // on the reversed time axis
    "q_asof_forward" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("value").as("purchase_value"))
      graft.ops.AsofJoin.forward(clicks, purchases, Seq("user_id"),
        "ts", "ts", Seq("purchase_value"))
        .select("event_id", "user_id", "value", "purchase_value")
        .orderBy("event_id")
    }),

    // count-min sketch: d×w deterministic counter matrix over user ids,
    // probed for 20 users against exact counts — the md5 rows make an
    // approximate structure engine-reproducible
    "q_sketch_cms" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val sketch = graft.ops.Sketch.countMin(ev, "user_id",
        width = 256, depth = 4)
      val probeKeys = ev.filter(col("user_id") < 20)
        .select("user_id").distinct()
      val est = graft.ops.Sketch.estimate(sketch, probeKeys, "user_id",
        width = 256, depth = 4)
      val truth = ev.filter(col("user_id") < 20)
        .groupBy("user_id").agg(count(lit(1)).as("true_cnt"))
      est.join(truth, "user_id")
        .select("user_id", "est", "true_cnt")
        .orderBy("user_id")
    }),

    // bloom-pruned exact semi-join: the broadcast bitmap prefilters the
    // fact side map-side; the exact semi-join removes false positives,
    // so only might-match rows shuffle and the answer stays exact
    "q_bloom_semijoin" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val urgent = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      graft.ops.Sketch.bloomSemiJoin(li, "l_orderkey", urgent, "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // sketch-pruned exact heavy hitters: count-min estimates gate which
    // rows reach the aggregation shuffle; the exact recount of survivors
    // makes the output identical to a plain groupBy-HAVING
    "q_sketch_hh" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      graft.ops.Sketch.heavyHitters(ev, "user_id", width = 256, depth = 4,
        minCount = 75L)
        .orderBy("user_id")
    }),

    // power-of-two histogram quantiles: sort-free per-source length
    // quantiles from one bounded (group, bucket) count shuffle
    "q_sketch_histq" -> ((s, dir) => {
      graft.ops.Sketch.logHistogramQuantiles(
        Tables(s, dir, "documents"), "source", "n_chars",
        Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
        .orderBy("source", "label")
    }),

    // HyperLogLog distinct count: the register table is a deterministic
    // function of the data and the estimate divides two exact integers,
    // so even the approximate answer hash-matches the oracle
    "q_sketch_hll" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val regs = graft.ops.Sketch.hllRegisters(ev, "event_id", p = 6)
      val est = graft.ops.Sketch.hllEstimate(regs, p = 6)
      val exact = ev.agg(countDistinct(col("event_id")).as("exact"))
      regs.crossJoin(est).crossJoin(exact)
        .select(col("bucket"), col("register").cast("long").as("register"),
          col("est"), col("exact"))
        .orderBy("bucket")
    }),

    // per-group HLL distinct counts: distinct users per event type from
    // register sketches — groups × 2^p rows shuffle instead of a raw
    // countDistinct expansion, estimates exact-integer reproducible
    "q_sketch_hll_group" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val est = graft.ops.Sketch.hllDistinctByGroup(
        ev, Seq("event_type"), "user_id", p = 6)
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact"))
      est.join(exact, Seq("event_type")).orderBy("event_type")
    }),

    // interval coverage union: each event opens a 30-minute activity
    // window; overlapping/touching windows merge into per-user spans —
    // two O(1)-state window passes + one partial-agg'd groupBy, exact
    // integer micros end to end
    "q_ts_intervals" -> ((s, dir) => {
      val iv = Tables(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("s"),
          (unix_micros(col("ts")) + lit(1800000000L)).as("e"))
      graft.ops.Timeseries.mergeIntervals(iv, "user_id", "s", "e")
        .orderBy("user_id", "span_start")
    }),

    // HLL set operations: distinct-user overlap between event types —
    // union = register-wise max (HLL's closure property), intersection =
    // inclusion–exclusion on the exact-integer estimate path
    "q_sketch_hll_setops" -> ((s, dir) => {
      graft.ops.Sketch.hllSetOpsByGroup(
        Tables(s, dir, "events"), "event_type", "user_id", p = 6)
        .orderBy("group_a", "group_b")
    }),

    // bucketed range join: errors within ±4h of each click per user —
    // interval bucketing turns the non-equi predicate into a hash join
    "q_range_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), unix_micros(col("ts")).as("err_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"),
          (unix_micros(col("ts")) - 14400000000L).as("w_start"),
          (unix_micros(col("ts")) + 14400000000L).as("w_end"))
      graft.ops.RangeJoin.pointInInterval(errors, clicks, Seq("user_id"),
        "err_us", "w_start", "w_end", bucketWidth = 14400000000L)
        .groupBy("event_id").agg(count(lit(1)).as("n_errors"))
        .orderBy("event_id")
    }),

    // cohort retention: signup-week cohorts × weeks-since-signup active
    // user counts — two narrow aggregates + one user-keyed join, week
    // arithmetic in exact integer microseconds
    "q_retention" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val cohorts = ev.filter(col("event_type") === "signup")
        .groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val activity = ev.select(col("user_id"),
        date_trunc("week", col("ts")).as("active_week")).distinct()
      activity.join(cohorts, "user_id")
        .withColumn("week_offset", expr(
          "(unix_micros(active_week) - unix_micros(cohort_week)) div 604800000000"))
        .filter(col("week_offset") >= 0)
        .groupBy(col("cohort_week").cast("date").as("cohort_week"),
          col("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy("cohort_week", "week_offset")
    }),

    // batch sessionization: 8h-inactivity sessions per user with
    // per-session stats — one shuffle+sort drives both windows
    "q_sessionize" -> ((s, dir) => {
      val withSess = graft.ops.Sessions.assign(
        Tables(s, dir, "events"), "user_id", "ts", gapSeconds = 28800L)
      withSess.groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
            .as("duration_us"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"))
        .orderBy("user_id", "session_idx")
    }),

    // per-source exact-duplicate rate: how dirty is each slice — share
    // of docs whose text occurs 2+ times anywhere in the corpus; one
    // md5-partition window, per-source rollup
    "q_dedup_rate" -> ((s, dir) => {
      graft.ops.Audit.dupRate(Tables(s, dir, "documents"), "source", "text")
        .orderBy("source")
    }),

    // most machine-regular users: lowest coefficient of variation of
    // inter-event gaps — the timing side of bot detection; exact
    // integer radicand, one sqrt+division, TakeOrdered cut
    "q_audit_bots" -> ((s, dir) => {
      graft.ops.Sessions.gapRegularity(
        Tables(s, dir, "events"), "user_id", "ts",
        tieCols = Seq("event_id"), minEvents = 5, k = 20)
    }),

    // teleport-smoothed stationary distribution of the behavior Markov
    // chain (PageRank 17/20 on the transition graph — the standard
    // absorbing-state fix): where does a long random session SPEND its
    // time; composition of the transitions op with the exact-integer
    // power iteration, everything states-bounded after the pair counts
    "q_seq_stationary" -> ((s, dir) => {
      val edges = graft.ops.Sessions.transitions(
        Tables(s, dir, "events"), "user_id", "ts", "event_type",
        tieCols = Seq("event_id"))
        .select(col("from_state").as("src"), col("to_state").as("dst"),
          col("n").as("w"))
      val nodes = edges.select(col("src").as("id"))
        .union(edges.select(col("dst"))).distinct()
      graft.ops.Graph.pageRank(edges, "src", "dst", "w", nodes, "id",
        iters = 5)
        .select(col("id").as("event_type"),
          col("ru").cast("bigint").as("rank_u"))
        .orderBy("event_type")
    }),

    // event-type co-occurrence lift across users: which behaviors
    // travel together (lift > 1) vs repel — the order-blind affinity
    // twin of the transition matrix; states²-bounded throughout
    "q_seq_cooccurrence" -> ((s, dir) => {
      graft.ops.Sessions.cooccurrenceLift(
        Tables(s, dir, "events"), "user_id", "event_type")
        .orderBy("state_a", "state_b")
    }),

    // token-weighted median document length per source: the length of
    // the doc the MEDIAN TOKEN lives in (token-budget planning sees
    // tokens, not documents) — integer threshold test 2·cum ≥ tot,
    // no halving division anywhere
    "q_stats_weighted_median" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("source"), col("n_chars"),
          TextAnalysis.tokenCount("text").as("n_tok"))
      graft.ops.Stats.weightedMedianByGroup(
        docs, "source", "n_chars", "n_tok")
        .orderBy("source")
    }),

    // as-of with a staleness bound: each click's most recent purchase
    // value, but only within 24h — market-data tolerance semantics,
    // applied post-window so it costs nothing extra
    "q_asof_tolerance" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase" &&
          col("value").isNotNull)
        .select(col("user_id"), col("ts").as("pts"),
          col("value").as("purchase_value"))
      graft.ops.AsofJoin.backward(clicks, purchases, Seq("user_id"),
        "ts", "pts", Seq("purchase_value"),
        toleranceMicros = Some(86400000000L))
        .select("event_id", "user_id", "purchase_value")
        .orderBy("event_id")
    }),

    // first-order Markov transition matrix over per-user event
    // sequences: adjacent (from, to) observations counted + row-
    // normalized — one key-window shuffle, then states²-bounded tables
    "q_seq_transitions" -> ((s, dir) => {
      graft.ops.Sessions.transitions(Tables(s, dir, "events"),
        "user_id", "ts", "event_type", tieCols = Seq("event_id"))
        .orderBy("from_state", "to_state")
    }),

    // backward as-of join: every click gets the user's most recent
    // purchase value at-or-before the click — one union + one window
    // pass, never a range join
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("value").as("purchase_value"))
      graft.ops.AsofJoin.backward(clicks, purchases, Seq("user_id"),
        "ts", "ts", Seq("purchase_value"))
        .select("event_id", "user_id", "value", "purchase_value")
        .orderBy("event_id")
    }),

    // domain mixing: weighted per-source subsampling toward a token
    // budget — src0-4 weigh 3x src5-9, the other sources drop out
    "q_sample_mix" -> ((s, dir) => {
      val weights = (0 to 4).map(i => s"src$i" -> 3L) ++
        (5 to 9).map(i => s"src$i" -> 1L)
      val withTokens = Tables(s, dir, "documents")
        .withColumn("n_tok", size(split(col("text"), " ")))
      graft.ops.Sampling.mixByTokenWeights(withTokens, "doc_id", "source",
        "n_tok", weights, budget = 8000L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy("source")
    }),

    // deterministic k-per-group sample: exactly 3 docs per source by
    // md5 hash order — pure function of the keys, engine-reproducible
    "q_sample_k_group" -> ((s, dir) => {
      graft.ops.Sampling.sampleKPerGroup(
        Tables(s, dir, "documents"), "doc_id", "source", k = 3)
        .select(col("source"), col("doc_id"), col("rn"))
        .orderBy("source", "rn")
    }),

    // α=0.5 temperature mixing: per-source weights = floor(sqrt(token
    // total)) feed the same exact-decimal acceptance filter — small
    // domains upweighted relative to natural share, all integer math
    "q_sample_mix_temp" -> ((s, dir) => {
      val withTokens = Tables(s, dir, "documents")
        .withColumn("n_tok", size(split(col("text"), " ")))
      graft.ops.Sampling.temperatureMixByTokens(withTokens, "doc_id",
        "source", "n_tok", budget = 8000L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy("source")
    }),

    // token-budget shard packing: bucketed exclusive running sum → shard id
    "q_sample_shards" -> ((s, dir) => {
      val withTokens = Tables(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokenCount("text").as("n_tokens"))
      graft.ops.Sampling.packByTokenBudget(
        withTokens, "doc_id", "n_tokens", budget = 10000)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"),
          min("doc_id").as("first_doc"))
        .orderBy("shard")
    }),

    // benchmark decontamination: corpus docs sharing any word 5-gram with
    // the benchmark slice; broadcast semi-join over a map-side explode
    "q_dedup_contamination" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      Dedup.contaminated(
        docs.filter(col("doc_id") % 37 =!= 1),
        docs.filter(col("doc_id") % 37 === 1),
        "doc_id", "text", k = 5)
        .orderBy("doc_id")
    }),

    // repetition metrics (Gopher/C4 quality filters): dup-word and
    // top-bigram fractions from one native map-side pass
    "q_text_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionFeatures(
        Tables(s, dir, "documents").filter(col("doc_id") % 23 === 0), "text")
        .select("doc_id", "n_words", "n_distinct_words", "top_bigram_count",
          "dup_word_frac", "top_bigram_frac")
        .orderBy("doc_id")
    }),

    // Gopher-style rule gate: every fraction threshold cross-multiplied
    // into integer comparisons, so the keep decision never sits on a
    // float boundary — per-rule audit booleans + keep flag
    "q_text_gopher" -> ((s, dir) => {
      // project BEFORE the operator: its spread() cache boundary is a
      // leaf Catalyst cannot prune columns through
      TextAnalysis.gopherFilter(
        Tables(s, dir, "documents").filter(col("doc_id") % 7 === 0)
          .select("doc_id", "text"), "text")
        .select("doc_id", "n_tokens", "r_min_tokens", "r_max_tokens",
          "r_word_len", "r_stopwords", "r_dup_words", "r_top_bigram", "keep")
        .orderBy("doc_id")
    }),

    // exact per-source length quantiles, windowed (no per-group buffer):
    // rank rows once, keep ranks hitting each integer target index —
    // 10^9-row groups cost the same memory as 10-row groups
    "q_stats_quantiles" -> ((s, dir) => {
      graft.ops.Stats.quantilesByGroup(
        Tables(s, dir, "documents"), "source", "n_chars",
        Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
        .orderBy("source", "quantile")
    }),

    // robust per-group outlier fences: |x − med| > k·MAD with median and
    // MAD the exact type-1 per-group medians — n_chars is BIGINT, so every
    // intermediate (median, deviation, MAD, the k·MAD comparison) is pure
    // integer math and the flag is engine-exact by construction
    "q_stats_mad" -> ((s, dir) => {
      graft.ops.Stats.madOutliers(
        Tables(s, dir, "documents").select("doc_id", "source", "n_chars"),
        "source", "n_chars", k = 3)
        .select("doc_id", "source", "n_chars", "group_median", "group_mad",
          "is_outlier")
        .orderBy("doc_id")
    }),

    // per-group winsorization: clip n_chars into each source's exact
    // [p1, p99] type-1 quantile band — integer-exact end to end.
    // NOTE: the oracle SQL pins the default bounds (1/100 and 99/100 in
    // its ceil-division rank targets); change them here and the oracle
    // text must change in lockstep.
    // daily gap-fill + LOCF: dense per-user day spine between first and
    // last event, holes carry the previous observed total forward
    "q_ts_gapfill" -> ((s, dir) => {
      val filled = graft.ops.Timeseries.gapFillDaily(
        Tables(s, dir, "events"), "user_id", "ts", "value")
      filled.select(col("user_id"), col("day"),
        col("day_value").cast(org.apache.spark.sql.types.DecimalType(38, 4))
          .cast("double").as("day_total"),
        col("filled").cast(org.apache.spark.sql.types.DecimalType(38, 4))
          .cast("double").as("filled"),
        col("observed"))
        .orderBy("user_id", "day")
    }),

    // audit_helper compare_relations: documents vs a perturbed twin
    // (edits, deletes, inserts) — ONE null-safe full-outer join, exact
    // per-status counts
    "q_audit_diff" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select("doc_id", "text", "source")
      graft.ops.Audit.compareSummary(docs, auditTwin(docs),
        Seq("doc_id"), Seq("text", "source"))
        .orderBy("status")
    }),

    // row-level audit diff: every non-identical key with its side hashes
    "q_audit_rows" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select("doc_id", "text", "source")
      graft.ops.Audit.compareRelations(docs, auditTwin(docs),
        Seq("doc_id"), Seq("text", "source"))
        .filter(col("status") =!= "identical")
        .select(col("doc_id"), col("status"),
          md5(coalesce(col("a_text"), lit("__null__"))).as("a_hash"),
          md5(coalesce(col("b_text"), lit("__null__"))).as("b_hash"))
        .orderBy("doc_id")
    }),

    // dbt-profiler relation profile: one aggregate pass over one scan,
    // per-column rows from a map-side stack of the single result row
    "q_audit_profile" -> ((s, dir) => {
      graft.ops.Audit.profile(
        Tables(s, dir, "documents")
          .select("doc_id", "lang", "source", "n_chars"),
        Seq("doc_id", "lang", "source", "n_chars"))
        .orderBy("column")
    }),

    // edit-distance fuzzy join: a deterministically-typo'd "dirty batch"
    // (1 in 20 customers; deletion / substitution / insertion by class)
    // matched against the full master list at maxDist=1 — Ed-Join prefix
    // blocking + exact levenshtein verify, checked by a blocking-free
    // quadratic oracle
    "q_fuzzy_join" -> ((s, dir) => {
      val cust = Tables(s, dir, "customer").select("c_custkey", "c_name")
      val dirty = cust.filter(col("c_custkey") % 20 === 0)
        .select(col("c_custkey").as("dirty_id"),
          when(col("c_custkey") % 60 === 0,
            concat(substring(col("c_name"), 1, 9),
              substring(col("c_name"), 11, 1000000)))
            .when(col("c_custkey") % 60 === 20,
              expr("replace(c_name, '#', '-')"))
            .otherwise(concat(col("c_name"), lit("q"))).as("dirty_name"))
      graft.ops.FuzzyJoin.editDistanceJoin(
        dirty, "dirty_id", "dirty_name",
        cust.select(col("c_custkey").as("cust_id"), col("c_name")),
        "cust_id", "c_name", maxDist = 1)
        .select(col("dirty_id"), col("cust_id"), col("dist"))
        .orderBy("dirty_id", "cust_id")
    }),

    // edit-distance self-join over the distinct part-name vocabulary at
    // maxDist=2: within-set near-duplicate surface forms, the
    // title-collapsing shape
    "q_fuzzy_selfjoin" -> ((s, dir) => {
      val names = Tables(s, dir, "part").select("p_name").distinct()
      graft.ops.FuzzyJoin.editDistanceSelfJoin(
        names, "p_name", "p_name", maxDist = 2)
        .orderBy("id_a", "id_b")
    }),

    // incremental MinHash dedup: the doc_id % 3 == 0 slice arrives as a
    // "new batch" and dedups against the persisted signature index of
    // the rest — old×old pairs never enumerated, history touched only
    // through its signature table
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select("doc_id", "text")
      val index = Dedup.minhashSignatures(
        docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
      Dedup.minhashNearDupsIncremental(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", index)
        .orderBy("id_a", "id_b")
    }),

    // edit-distance near-dup collapse over the part-name vocabulary:
    // pairs → transitive components → min-id canonical + unpaired
    // survivors, annotated with component size
    "q_dedup_fuzzy" -> ((s, dir) => {
      val names = Tables(s, dir, "part").select("p_name").distinct()
      graft.ops.FuzzyJoin.fuzzyDedup(names, "p_name", "p_name",
        maxDist = 1)
        .orderBy("p_name")
    }),

    // integer-exact weighted PageRank over the nation trade graph
    // (customer-nation → supplier-nation edges weighted by lineitem
    // count): 5 power iterations in DECIMAL(38,0) micro-units — the
    // distributed edge aggregation is the heavy part, the recurrence is
    // one join + one groupBy per iteration at any graph size
    "q_graph_pagerank" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val o = Tables(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = Tables(s, dir, "customer").select("c_custkey", "c_nationkey")
      val su = Tables(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val nat = Tables(s, dir, "nation").select("n_nationkey", "n_name")
      val edges = li
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
      graft.ops.Graph.pageRank(edges, "src", "dst", "w",
          nat.select("n_nationkey"), "n_nationkey", iters = 5)
        .join(nat, col("id") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          col("ru").cast("long").as("rank_u"))
        .orderBy("nation")
    }),

    // per-source Pearson correlation between chars and tokens: the five
    // sufficient statistics are exact DECIMAL(38,0) sums (one shuffle of
    // six numbers per group); only the final r is IEEE double
    "q_stats_corr" -> ((s, dir) => {
      graft.ops.Stats.corrByGroup(
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            TextAnalysis.tokenCount("text").as("n_tokens")),
        "source", "n_chars", "n_tokens")
        .orderBy("source")
    }),

    // per-source OLS fit of token count on char count — corr's sibling
    // on the same exact integer sufficient statistics
    "q_stats_linreg" -> ((s, dir) => {
      graft.ops.Stats.linregByGroup(
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            TextAnalysis.tokenCount("text").as("n_tokens")),
        "source", "n_chars", "n_tokens")
        .orderBy("source")
    }),

    // Poisson-bootstrap error bar for the mean order total (cents):
    // 32 deterministic md5-seeded replicas, no resampling shuffle —
    // the uncertainty every pipeline metric should ship with
    "q_sample_bootstrap" -> ((s, dir) => {
      graft.ops.Sampling.bootstrapMean(
        Tables(s, dir, "orders")
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents")),
        "o_orderkey", "cents", replicas = 32)
    }),

    // curriculum ordering: 4 difficulty bands over doc length with a
    // band-rotating interleave key — banding via the bounded-histogram
    // prefix sum, never a global ntile window
    "q_sample_curriculum" -> ((s, dir) => {
      graft.ops.Sampling.curriculumOrder(
        Tables(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", bands = 4)
        .orderBy("doc_id")
    }),

    // per-flag distribution shape of order quantities: mean, variance,
    // skewness, excess kurtosis from one pass of exact decimal power
    // sums — the symmetric/heavy-tail/mis-binned profiling row
    "q_stats_moments" -> ((s, dir) => {
      graft.ops.Stats.momentsByGroup(
        Tables(s, dir, "lineitem").select("l_returnflag", "l_quantity"),
        "l_returnflag", "l_quantity")
        .orderBy("l_returnflag")
    }),

    // equi-width histogram of order totals (cents) per status: 12 bins
    // over [0, 6e7), out-of-range clamps to the edges — map-side bins,
    // groups×bins-bounded tables
    "q_stats_histogram" -> ((s, dir) => {
      graft.ops.Stats.histogramEquiWidth(
        Tables(s, dir, "orders")
          .select(col("o_orderstatus"),
            round(col("o_totalprice") * 100).cast("long").as("cents")),
        "o_orderstatus", "cents", lo = 0L, hi = 60000000L, bins = 12)
        .orderBy("o_orderstatus", "bin")
    }),

    // single-scan correlation matrix of quantity / price-cents /
    // discount-permil — the feature-redundancy screen; one aggregate
    // row, pairs exploded map-side, the input never rescanned per pair
    "q_stats_corrmatrix" -> ((s, dir) => {
      graft.ops.Stats.corrMatrix(
        Tables(s, dir, "lineitem")
          .select(col("l_quantity").cast("long").as("quantity"),
            round(col("l_extendedprice") * 100).cast("long").as("cents"),
            round(col("l_discount") * 100).cast("long").as("permil")),
        Seq("quantity", "cents", "permil"))
        .orderBy("col_a", "col_b")
    }),

    // revenue-concentration audit: Gini of order totals (cents) per
    // priority class — the "few members hold the mass?" signal next to
    // entropy; one rank window + a 3-number-per-group aggregate
    "q_stats_gini" -> ((s, dir) => {
      graft.ops.Stats.giniByGroup(
        Tables(s, dir, "orders")
          .select(col("o_orderpriority"),
            round(col("o_totalprice") * 100).cast("long").as("cents")),
        "o_orderpriority", "cents")
        .orderBy("o_orderpriority")
    }),

    "q_stats_winsorize" -> ((s, dir) => {
      graft.ops.Stats.winsorize(
        Tables(s, dir, "documents").select("doc_id", "source", "n_chars"),
        "source", "n_chars")
        .select("doc_id", "source", "n_chars", "lo", "hi", "clipped")
        .orderBy("doc_id")
    }),

    // p1–p99 trimmed mean per source: winsorize's drop-the-tails
    // sibling; DECIMAL sum + one final double division, engine-exact
    "q_stats_trimmed_mean" -> ((s, dir) => {
      graft.ops.Stats.trimmedMean(
        Tables(s, dir, "documents").select("source", "n_chars"),
        "source", "n_chars")
        .orderBy("source")
    }),

    // token-window chunking: 40-token windows, stride 30 (10-token
    // overlap) — the pre-embedding segmentation, map-side only; chunk
    // bodies are hashed so the oracle compares exact text without
    // shipping it
    "q_text_chunks" -> ((s, dir) => {
      TextAnalysis.chunk(
        Tables(s, dir, "documents").filter(col("doc_id") % 23 === 0)
          .select("doc_id", "text"),
        "text", chunkTokens = 40, strideTokens = 30)
        .select(col("doc_id"), col("chunk_id"),
          md5(col("chunk_text")).as("chunk_hash"),
          size(split(col("chunk_text"), " ")).as("n_chunk_tokens"))
        .orderBy("doc_id", "chunk_id")
    }),

    // the curation pipeline END TO END: quality gate → exact dedup
    // (min-id canonical per text) → α=0.5 temperature mix — three
    // operators composed into one oracle-checked query, because a
    // pipeline's correctness is about the composition, not just the
    // stages
    "q_pipeline_curation" -> ((s, dir) => {
      // project to the pipeline's columns before the gate's spread()
      // cache boundary, keeping the parquet scan 3-column
      val docs = Tables(s, dir, "documents")
        .select("doc_id", "source", "text")
      val kept = TextAnalysis.gopherFilter(docs, "text")
        .filter(col("keep"))
        .select("doc_id", "source", "text")
      // cache boundary: the mixer consumes the deduped corpus twice
      // (stratum totals + the acceptance probe) — without it the whole
      // gate + dedup chain re-evaluates per consumer.
      // The dedup keys on md5(text), not text (the Dedup.exact
      // convention, ops/Dedup.scala): the output needs only
      // (doc_id, source, n_tok), so with n_tok computed map-side the
      // aggregate shuffles a constant-width digest per row instead of
      // document bytes, and the min(struct) SortAggregate sorts 32-char
      // keys instead of documents
      val deduped = graft.ops.Dedup.maybeCache(kept
        .select(col("doc_id"), col("source"), md5(col("text")).as("__h"),
          size(split(col("text"), " ")).as("n_tok"))
        .groupBy(col("__h"))
        // lexicographic struct min = the (unique) min-doc_id row WITH
        // its own source — never fields mixed from different rows
        // (n_tok is constant within a group: identical text)
        .agg(min(struct(col("doc_id"), col("source"), col("n_tok")))
          .as("m"))
        .select(col("m.doc_id").as("doc_id"), col("m.source").as("source"),
          col("m.n_tok").as("n_tok")))
      graft.ops.Sampling.temperatureMixByTokens(deduped, "doc_id",
        "source", "n_tok", budget = 5000L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy("source")
    }),

    // PII masking: deterministic synthetic PII is injected into a slice of
    // documents (same injection SQL on the oracle side), then masked and
    // counted — one map-side pass, identical regexes in both engines
    "q_text_pii" -> ((s, dir) => {
      val counts = TextAnalysis.piiCounts("text")
      Tables(s, dir, "documents")
        .filter(col("doc_id") % 23 === 0)
        .withColumn("text", concat(col("text"),
          when(col("doc_id") % 2 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com or +1-555-"),
              lpad(col("doc_id").cast("string"), 6, "0")))
            .otherwise(lit(""))))
        .select(col("doc_id"),
          md5(TextAnalysis.maskPii("text")).as("masked_hash"),
          counts(0), counts(1))
        .orderBy("doc_id")
    }),

    // Flesch-style reading ease from codegen'd regexp builtins
    "q_text_readability" -> ((s, dir) => {
      Tables(s, dir, "documents").filter(col("doc_id") % 23 === 0)
        .select(col("doc_id"),
          TextAnalysis.tokenCount("text").as("n_words"),
          greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
            .as("n_sentences"),
          regexp_count(lower(col("text")), lit("[aeiouy]+"))
            .as("n_syllables"),
          TextAnalysis.readingEase("text").as("reading_ease"))
        .orderBy("doc_id")
    }),

    // Okapi BM25 lexical retrieval: one map-side tf/dl pass, a 1-row
    // corpus-stats broadcast, distributed top-k — the topical-slice
    // selector of a curation pipeline. Terms/topK here are pinned by
    // bm25Sql below (the oracle is GENERATED from the same list).
    "q_text_bm25" -> ((s, dir) => {
      TextAnalysis.bm25(Tables(s, dir, "documents"), "doc_id", "text",
        bm25Terms, topK = 20)
        .orderBy("doc_id")
    }),

    // CCNet-style bigram LM surprise: mean negative log-probability of
    // each document under the corpus's own Laplace-smoothed bigram
    // model — the perplexity quality filter, decimal-exact per-doc sums
    "q_text_lm_surprise" -> ((s, dir) => {
      TextAnalysis.lmSurprise(
        Tables(s, dir, "documents").select("doc_id", "text"),
        "doc_id", "text")
        .orderBy("doc_id")
    }),

    // FROZEN bigram LM: counts trained on the doc_id % 3 != 0 slice
    // (the "settled corpus"), then EVERY document scored under that
    // frozen model — training-slice docs reproduce the inline trainer
    // (run-1 parity), held-out docs exercise the smoothed-OOV left-join
    // path. The artifacts round-trip through parquet exactly as the
    // incremental pipeline persists them, so the scoring plan reads the
    // model as a stored relation, not a live subplan
    "q_text_lm_frozen" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select("doc_id", "text")
      val (big, uni, voc) = TextAnalysis.lmCounts(
        docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_lm_frozen").toString
      big.write.mode("overwrite").parquet(s"$tmp/bigrams")
      uni.write.mode("overwrite").parquet(s"$tmp/prefixes")
      voc.write.mode("overwrite").parquet(s"$tmp/vocab")
      TextAnalysis.lmSurpriseScore(docs, "doc_id", "text",
        s.read.parquet(s"$tmp/bigrams"), s.read.parquet(s"$tmp/prefixes"),
        s.read.parquet(s"$tmp/vocab"))
        .orderBy("doc_id")
    }),

    // per-source token-distribution KL drift vs the corpus mix: the
    // domain-slice monitoring check; dense (source × vocab) grid so
    // absent tokens still carry their smoothed mass
    "q_text_kl_drift" -> ((s, dir) => {
      TextAnalysis.tokenKlDrift(
        Tables(s, dir, "documents").select("source", "text"),
        "source", "text")
        .orderBy("source")
    }),

    // the bounded-grid variant: drift over the 100 globally most
    // frequent tokens only — the open-vocabulary cap a 100 TB corpus
    // needs (grid size becomes |groups| × 100 regardless of scale)
    "q_text_kl_drift_capped" -> ((s, dir) => {
      TextAnalysis.tokenKlDrift(
        Tables(s, dir, "documents").select("source", "text"),
        "source", "text", maxVocab = Some(100))
        .orderBy("source")
    }),

    // rolling-hash fingerprints
    "q_text_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprint(
        Tables(s, dir, "documents").filter(col("doc_id") % 23 === 0)
          .select("doc_id", "text"), "text")
        .select("doc_id", "content_hash", "min_gram_hash", "n_distinct_grams")
        .orderBy("doc_id")
    }),

    // corpus n-gram statistics: top bigrams by frequency (the vocabulary/
    // stats step of a curation pipeline) — map-side explode, one count
    // shuffle of (bigram, partial count) pairs, never documents
    "q_text_topgrams" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(explode(Dedup.shingleExpr("text", 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram")).limit(20)
    }),

    // line-level boilerplate removal: lines shared by >2 documents are
    // dropped corpus-wide, survivors reassemble in order. The synthetic
    // docs are single-line, so line structure is derived first with a
    // LITERAL replace (same left-to-right non-overlapping semantics in
    // Spark and DuckDB) — a real corpus feeds newline-delimited text in
    // directly
    "q_text_linededup" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"),
          expr("replace(text, ' table ', '\n')").as("text"))
      Dedup.lineDedup(docs, "doc_id", "text", maxDocFreq = 2)
        .orderBy("doc_id")
    }),

    // corpus-trained BPE token counting: the tokenizer-true token
    // budget. Training = ONE distributed word-count aggregate + a
    // driver-side merge loop over that bounded table (the sufficient
    // statistic); counting = a map-side codegen'd replace chain, no
    // join/shuffle, OOV-correct. Oracle re-learns the same merges via
    // an unrolled MATERIALIZED-CTE chain (same pair counts, same
    // count-desc/pair-asc tie-break, same literal-replace convention).
    "q_text_bpe" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val merges = Bpe.train(docs, "text", numMerges = bpeNumMerges)
      docs.select(col("doc_id"),
          Bpe.wordCount("text").as("n_words"),
          Bpe.tokenCount("text", merges).as("n_bpe"))
        .orderBy("doc_id")
    }),

    // PMI collocations: strongest adjacent-bigram associations (Church
    // & Hanks), min-count 5, top 50 by ulp-safe rounded PMI
    "q_text_collocations" -> ((s, dir) => {
      TextAnalysis.collocations(Tables(s, dir, "documents"), "text",
        minCount = 5, topK = 50)
    }),

    // BPE vocabulary coverage per source: the OOV-rate signal — what
    // fraction of word occurrences the trained tokenizer keeps whole
    // (n_syms = 1) and the total piece inflation. Map-side merge replay
    // per occurrence (no lexicon join/shuffle); all-integer output
    "q_text_bpe_coverage" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val merges = Bpe.train(docs, "text", numMerges = bpeNumMerges)
      docs.select(col("source"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .withColumn("n_syms",
          size(split(Bpe.pieces(col("word"), merges), " ")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"),
          sum(when(col("n_syms") === 1, 1L).otherwise(0L)).as("n_whole"),
          sum(col("n_syms")).as("n_pieces"))
        .orderBy("source")
    }),

    // distilled quality classifier: full-batch logistic GD (fast
    // sigmoid — exact IEEE ops, no libm) trained against the engine's
    // own Gopher gate; per-source confusion counts pin the trained
    // decision boundary (integer-exact output)
    "q_classify_gate" -> ((s, dir) => {
      val feat = Classify.gateFeatures(
        Tables(s, dir, "documents").select("doc_id", "source", "text"),
        "doc_id", "text")
      val w = Classify.train(feat, classifyX, "y",
        iters = classifyIters, lr = classifyLr)
      feat.withColumn("__z", Classify.z(w.toSeq, classifyX))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("n_keep"),
          sum(when(col("__z") >= 0, 1L).otherwise(0L)).as("n_pred_keep"),
          sum(when((col("__z") >= 0) === (col("y") === 1.0), 1L)
            .otherwise(0L)).as("n_agree"))
        .orderBy("source")
    }),

    // the same trained model's per-doc scores (rounded fast-sigmoid) —
    // value-level verification of the full iteration chain, not just
    // the decision sign
    "q_classify_scores" -> ((s, dir) => {
      val feat = Classify.gateFeatures(
        Tables(s, dir, "documents").select("doc_id", "source", "text"),
        "doc_id", "text")
      val w = Classify.train(feat, classifyX, "y",
        iters = classifyIters, lr = classifyLr)
      val zc = Classify.z(w.toSeq, classifyX)
      feat.filter(col("doc_id") % 23 === 0)
        .select(col("doc_id"),
          round(Classify.fastSigmoid(zc), 6).as("score"),
          (zc >= 0).as("pred"))
        .orderBy("doc_id")
    }),

    // calibration table for the same trained scorer: 100 fixed-width
    // score bins × (count, positive rate, mean score) — the "is 0.8
    // really 80%?" reliability audit; map-side bin, ≤10-row aggregate
    "q_classify_calibration" -> ((s, dir) => {
      val feat = Classify.gateFeatures(
        Tables(s, dir, "documents").select("doc_id", "source", "text"),
        "doc_id", "text")
      val w = Classify.train(feat, classifyX, "y",
        iters = classifyIters, lr = classifyLr)
      val scored = feat.withColumn("__score",
        Classify.fastSigmoid(Classify.z(w.toSeq, classifyX)))
      Classify.calibration(scored, "__score", "y", bins = 100)
        .orderBy("bin")
    }),

    // threshold-tuning table for the trained scorer: keep-count,
    // precision, recall, F1 at 7 pinned cuts inside the score spread —
    // decisions on the UNROUNDED exact-portable score
    "q_classify_pr_curve" -> ((s, dir) => {
      val feat = Classify.gateFeatures(
        Tables(s, dir, "documents").select("doc_id", "source", "text"),
        "doc_id", "text")
      val w = Classify.train(feat, classifyX, "y",
        iters = classifyIters, lr = classifyLr)
      val scored = feat.withColumn("__score",
        Classify.fastSigmoid(Classify.z(w.toSeq, classifyX)))
      Classify.prCurve(scored, "__score", "y",
        Seq(0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8))
        .orderBy("threshold")
    }),

    // Cohen's kappa of the nearest-centroid classifier against the
    // true labels — chance-corrected separability in one number;
    // everything past the confusion matrix is labels²-bounded
    "q_classify_kappa" -> ((s, dir) => {
      val conf = graft.ops.Similarity.centroidClassify(
        Tables(s, dir, "embeddings"), "label", "embedding")
      Classify.kappaFromConfusion(conf, "label", "predicted", "n")
    }),

    // inter-classifier agreement: do the local (k-NN) and prototype
    // (centroid) views of the embedding space label alike? kappa over
    // their joined per-query predictions
    "q_classify_agreement" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val knn = Similarity.knnClassify(
        emb.filter(col("vec_id") % 100 === 0), emb,
        "vec_id", "embedding", "label", k = 5)
        .select(col("query_id"), col("predicted").as("knn_pred"))
      val cent = Similarity.centroidPredictions(emb, "label", "embedding")
        .select(col("vec_id").as("query_id"),
          col("predicted").as("cent_pred"))
      Classify.agreement(knn, cent, "query_id", "knn_pred", "cent_pred")
    }),

    // per-class precision/recall/F1 of the same classifier — which
    // classes it actually serves; F1 in its single-division
    // integer-denominator form so nothing compounds rounded factors
    "q_classify_metrics" -> ((s, dir) => {
      val conf = graft.ops.Similarity.centroidClassify(
        Tables(s, dir, "embeddings"), "label", "embedding")
      Classify.classMetrics(conf, "label", "predicted", "n")
        .orderBy("label")
    }),

    // reciprocal-rank fusion of the IVF and LSH candidate lists — the
    // calibration-free consensus re-rank over two k-bounded lists
    "q_ann_rrf" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      val ivf = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        k = 5, nlist = 8, nprobe = 2, iters = 2)
      val lsh = Similarity.lshTopK(queries, emb, "vec_id", "embedding",
        k = 5, bits = 6)
      Similarity.rrfFuse(ivf, lsh, "query_id", "neighbor_id", "rank",
        kc = 60, topK = 5)
        .orderBy("query_id", "rank")
    }),

    // recall@5 of the IVF probe against the exact brute-force top-5 —
    // the standard ANN quality audit, per query
    "q_ann_recall" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      val ivf = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        k = 5, nlist = 8, nprobe = 2, iters = 2)
      val bf = Similarity.bruteForceTopK(queries, emb, "vec_id",
        "embedding", k = 5)
      Similarity.recallAtK(ivf, bf, "query_id", "neighbor_id")
        .orderBy("query_id")
    }),

    // the learned BPE lexicon itself: every corpus word's trained
    // segmentation as a piece string — counts can collide, piece
    // strings cannot, so this pins the tokenizer's actual behavior.
    // Spark REPLAYS the merges map-side over the distinct-word table;
    // the oracle reads the final vocab CTE of its re-learned chain.
    "q_text_bpe_lexicon" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val merges = Bpe.train(docs, "text", numMerges = bpeNumMerges)
      docs.select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .distinct()
        .select(col("word"), Bpe.pieces(col("word"), merges).as("pieces"))
        .orderBy("word")
    }),

    // cross-document duplicated-SPAN gate: winnowed rolling-hash
    // fingerprints (any shared span of ≥ k+w−1 normalized chars plants an
    // identical fingerprint in both docs at ANY alignment); documents past
    // the integer-exact dup-fraction threshold fail `keep`.
    // NOTE: the q_dedup_spans oracle SQL hardcodes these parameters —
    // k=8 and w=8 in its window arithmetic ('- 8 + 2', slice 'j:j+7'),
    // minDocFreq=2 in 'ndocs >= 2', and the 1/2 threshold in '* 2 <= * 1'.
    // Change any argument here and the oracle text must change in lockstep.
    "q_dedup_spans" -> ((s, dir) => {
      Dedup.duplicateSpans(Tables(s, dir, "documents"), "doc_id", "text",
        k = 8, w = 8, minDocFreq = 2, maxDupFracNum = 1, maxDupFracDen = 2)
        .orderBy("doc_id")
    }),

    // int8 symmetric embedding quantization (4x smaller vectors for
    // storage/transfer at scale): scale = 127/max|x| per vector, one
    // explode + two narrow shuffles; checksum pins every quantized value
    "q_embed_quantize" -> ((s, dir) => {
      val ex = Tables(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
        .withColumn("x", col("x").cast("double"))
      val scales = ex.groupBy("vec_id")
        .agg(max(abs(col("x"))).as("absmax"))
        .withColumn("scale",
          when(col("absmax") > 0, lit(127.0) / col("absmax")).otherwise(lit(0.0)))
      ex.join(scales, "vec_id")
        .withColumn("q", round(col("x") * col("scale")).cast("int"))
        .groupBy("vec_id")
        .agg(min(col("q")).as("q_min"), max(col("q")).as("q_max"),
          sum(col("q") * (col("d") + 1)).as("q_checksum"))
        .orderBy("vec_id")
    }),

    // multimodal: binary payloads + batch metadata decode (stub codec)
    "q_multimodal_meta" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(
        Tables(s, dir, "documents").filter(col("doc_id") % 7 === 0))
      Multimodal.decodeMeta(media)
        .select("doc_id", "media_type", "width", "height", "channels",
          "n_bytes", "valid")
        .orderBy("doc_id")
    }),

    // multimodal: frame sampling (1 media row → N frame rows)
    "q_multimodal_frames" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(
        Tables(s, dir, "documents").filter(col("doc_id") % 31 === 0))
      Multimodal.frameSample(media, stride = 64)
        .orderBy("doc_id", "frame_no")
    }),

    // media exact dedup through the media_dedup STEP closure: every
    // 4th media doc re-appears under id+500000 — its GRFT header dims
    // differ (they derive from the new id) but the BODY is identical,
    // and the (n_bytes, body-checksum) key merges them; documents'
    // own duplicate texts merge the same way. Min-id keep.
    "q_media_dedup_exact" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .filter(col("doc_id") % 5 === 0).select("doc_id", "text")
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") % 4 === 0)
          .withColumn("doc_id", col("doc_id") + 500000L))
      val step = graft.mat.PipelineSteps.parse(Some(Seq(Map(
        "op" -> "media_dedup", "method" -> "exact")))).head
      step.apply(Multimodal.syntheticMedia(corpus))
        .select("doc_id", "media_type").orderBy("doc_id")
    }),

    // media near-dup dedup through the media_dedup STEP closure: the
    // stub perceptual bit-signature (64-bit simhash over body tokens)
    // banded through the same 4-chunk pigeonhole core as text
    // simhash_dedup; every 3rd media doc re-appears under id+500000
    // with one appended body token — a small hamming perturbation —
    // and components within hamming ≤ 3 collapse to the min id.
    "q_media_dedup_near" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .filter(col("doc_id") % 7 === 0).select("doc_id", "text")
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") % 3 === 0)
          .withColumn("doc_id", col("doc_id") + 500000L)
          .withColumn("text", concat(col("text"), lit(" tailmark"))))
      val step = graft.mat.PipelineSteps.parse(Some(Seq(Map(
        "op" -> "media_dedup", "method" -> "simhash")))).head
      step.apply(Multimodal.syntheticMedia(corpus))
        .select("doc_id", "media_type").orderBy("doc_id")
    }),

    // media perceptual near-dup dedup through the media_dedup STEP
    // closure, `method: phash` — the REAL DCT pHash (graft.ops.Phash)
    // over the decoded gray pixels, banded through the same 4-chunk
    // pigeonhole core. Fixture: the syntheticMedia2D mosaic corpus
    // (equal texts → identical images; any byte difference →
    // decorrelated images, measured min cross hamming 14 at sf0.1),
    // plus TWO re-encoded variants of every 2nd/3rd image — a 2×
    // pixel-replication upscale with a +9 brightness shift, and a 3×
    // upscale — whose hashes equal the original's exactly (box-filter
    // + AC-median invariances), so each variant merges into its
    // original and the min-id keep retains exactly one row per text.
    "q_media_dedup_phash" -> ((s, dir) => {
      // dims ≥ 8×8 (the builder derives w/h from the id): 1-pixel
      // strips are the no-signal sentinel's domain, not a merge fixture
      val docs = Tables(s, dir, "documents")
        .filter(col("doc_id") % 6 === 0 && length(col("text")) >= 60 &&
          col("doc_id") % 640 >= 7 && col("doc_id") % 480 >= 7)
        .select("doc_id", "text")
      val media = Multimodal.syntheticMedia2D(docs)
      val re = udf((p: Array[Byte], sc: Int, b: Int) =>
        graft.ops.Phash.reencodeGray(p, sc, b))
      val v1 = media.filter(col("doc_id") % 12 === 0)
        .withColumn("doc_id", col("doc_id") + 500000L)
        .withColumn("payload", re(col("payload"), lit(2), lit(9)))
      val v2 = media.filter(col("doc_id") % 18 === 0)
        .withColumn("doc_id", col("doc_id") + 600000L)
        .withColumn("payload", re(col("payload"), lit(3), lit(0)))
      val step = graft.mat.PipelineSteps.parse(Some(Seq(Map(
        "op" -> "media_dedup", "method" -> "phash")))).head
      step.apply(media.unionByName(v1).unionByName(v2))
        .select("doc_id", "media_type").orderBy("doc_id")
    }),

    // audio near-dup dedup through the media_dedup STEP closure,
    // `method: audio` — the envelope-spectrum fingerprint over DECODED
    // PCM (real WAV containers via the JDK's javax.sound.sampled):
    // gain-scaled and resampled (keep-1-in-k, header rate follows)
    // re-encodes of one recording merge into its
    // min-id; unrelated recordings sit at the ~32-bit background
    // distance. Fixture: syntheticAudioWav renders each text as a
    // 32-step amplitude staircase (segment-FNV avalanche — equal texts
    // identical audio, any byte difference decorrelated), and every
    // 2nd/3rd original re-appears as a re-mastered variant. Oracle =
    // min-id per text, exactly the audio components.
    "q_media_dedup_audio" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .filter(col("doc_id") % 7 === 0 && length(col("text")) >= 32)
        .select("doc_id", "text")
      val media = Multimodal.syntheticAudioWav(docs)
      val re = udf((p: Array[Byte], g: Double, dec: Int, q8: Boolean) =>
        graft.ops.AudioHash.reencode(p, g, dec, q8))
      val v1 = media.filter(col("doc_id") % 14 === 0)
        .withColumn("doc_id", col("doc_id") + 500000L)
        .withColumn("payload",
          re(col("payload"), lit(0.7), lit(1), lit(false)))
      // gain and resampling are EXACT invariances of the envelope
      // hash; 8-bit quantization is approximate (noise can flip
      // near-median coefficients past the pigeonhole-3 guarantee — see
      // AudioHashSpec) and stays out of the oracle fixture
      val v2 = media.filter(col("doc_id") % 21 === 0)
        .withColumn("doc_id", col("doc_id") + 600000L)
        .withColumn("payload",
          re(col("payload"), lit(0.85), lit(2), lit(false)))
      val step = graft.mat.PipelineSteps.parse(Some(Seq(Map(
        "op" -> "media_dedup", "method" -> "audio")))).head
      step.apply(media.unionByName(v1).unionByName(v2))
        .select("doc_id", "media_type").orderBy("doc_id")
    }),

    // media frame-overlap dedup through the media_dedup STEP closure,
    // `method: frames` — clip/re-mux detection: the payload body slices
    // into 64-byte frames every 32 bytes, digested with md5, and
    // frame-set CONTAINMENT >= 0.5 components collapse (min-id keep)
    // via the same n-gram postings machinery as text. Fixture: every
    // 2nd long-enough doc re-appears as a CLIP (body minus its first
    // 64 bytes — a stride-aligned cut, so the clip's frame set is a
    // subset of the original's and containment is exactly 1). The
    // oracle recomputes the ENTIRE chain in SQL (frames are md5s of
    // text substrings — the corpus is all-ASCII, so char offsets are
    // byte offsets), including transitive closure — no fixture
    // assumptions about which texts merge.
    "q_media_dedup_frames" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .filter(col("doc_id") % 9 === 0).select("doc_id", "text")
      val media = Multimodal.syntheticMedia(docs)
      val clip = udf { (p: Array[Byte]) =>
        Multimodal.StubCodec.encode(320, 240, 1, p.drop(16 + 64))
      }
      val clips = media
        .filter(col("doc_id") % 18 === 0 && length(col("payload")) >= 166)
        .withColumn("doc_id", col("doc_id") + 500000L)
        .withColumn("payload", clip(col("payload")))
        .withColumn("media_type",
          when(col("doc_id") % 3 === 0, lit("image"))
            .when(col("doc_id") % 3 === 1, lit("audio"))
            .otherwise(lit("video")))
      val step = graft.mat.PipelineSteps.parse(Some(Seq(Map(
        "op" -> "media_dedup", "method" -> "frames")))).head
      step.apply(media.unionByName(clips))
        .select("doc_id", "media_type").orderBy("doc_id")
    }),

    // CDC SCD-1 compaction: events as a per-user changelog ('error' =
    // account deletion, anything else upserts) — latest surviving row
    // per key from one window shuffle, no per-group buffers
    "q_cdc_compact" -> ((s, dir) => {
      val log = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "error", lit("D"))
            .otherwise(lit("U")).as("op"),
          col("event_type"), col("value"))
      graft.ops.Cdc.compact(log, Seq("user_id"), "ts", Seq("event_id"), "op")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"), col("value"))
        .orderBy("user_id")
    }),

    // CDC SCD-2 reconstruction: validity intervals straight from the
    // change stream — a delete closes its predecessor's interval but
    // emits no row; the single window sort serves compaction and lead
    "q_cdc_history" -> ((s, dir) => {
      val log = Tables(s, dir, "events").filter(col("user_id") < 400)
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "error", lit("D"))
            .otherwise(lit("U")).as("op"),
          col("value"))
      graft.ops.Cdc.history(log, Seq("user_id"), "ts", Seq("event_id"), "op")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("valid_from")).as("vf_us"),
          unix_micros(col("valid_to")).as("vt_us"),
          col("is_current"), col("value"))
        .orderBy("user_id", "vf_us", "event_id")
    }),

    // interval×interval overlap join: ±2h click activity windows vs
    // ±2h error windows per user — bucketing turns the overlap
    // predicate into a hash join, canonical-bucket rule dedups pairs
    "q_range_overlap" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          (unix_micros(col("ts")) - 7200000000L).as("c_start"),
          (unix_micros(col("ts")) + 7200000000L).as("c_end"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"),
          (unix_micros(col("ts")) - 7200000000L).as("e_start"),
          (unix_micros(col("ts")) + 7200000000L).as("e_end"))
      graft.ops.RangeJoin.intervalOverlap(clicks, errors, Seq("user_id"),
        "c_start", "c_end", "e_start", "e_end",
        bucketWidth = 14400000000L)
        .groupBy("click_id").agg(count(lit(1)).as("n_overlaps"))
        .orderBy("click_id")
    }),

    // TF-IDF keyword extraction: top-3 most characteristic terms per
    // doc — rank taken on the ROUNDED score (ulp-safe cut), term asc
    // tie-break; restricted to every 11th doc to keep output moderate
    "q_text_tfidf" -> ((s, dir) => {
      TextAnalysis.tfidfTopTerms(
        Tables(s, dir, "documents"), "doc_id", "text", k = 3)
        .filter(col("doc_id") % 11 === 0)
        .orderBy("doc_id", "rank")
    }),

    // class centroids: per-label mean-pooled embeddings in exact
    // micro-units — one posexplode + one groups×dim shuffle
    "q_embed_centroids" -> ((s, dir) => {
      graft.ops.Similarity.classCentroids(
        Tables(s, dir, "embeddings"), "label", "embedding")
        .orderBy("label", "dim")
    }),

    // k-NN majority-vote labels over the exact top-5 — ties break
    // (votes desc, label asc); the local twin of the centroid audit
    "q_embed_knn" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      graft.ops.Similarity.knnClassify(
        emb.filter(col("vec_id") % 100 === 0), emb,
        "vec_id", "embedding", "label", k = 5)
        .orderBy("query_id")
    }),

    // class-separation matrix: pairwise centroid L2 — which classes
    // are confusable BEFORE running a classifier; labels²×dim-bounded
    "q_embed_separation" -> ((s, dir) => {
      graft.ops.Similarity.classSeparation(
        Tables(s, dir, "embeddings"), "label", "embedding")
        .orderBy("label_a", "label_b")
    }),

    // degenerate-embedding detector: per-label MAD outlier summary over
    // exact micro-unit vector norms — collapsed/exploded vectors are
    // norm outliers; the robust-stats family composed onto embeddings
    "q_embed_norm_outliers" -> ((s, dir) => {
      val norms = Tables(s, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .select(col("vec_id"), col("label"),
          round(Similarity.normExact("embedding") * 1000000)
            .cast("long").as("norm_u"))
      graft.ops.Stats.madOutliers(norms, "label", "norm_u", k = 3)
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(col("is_outlier").cast("long")).as("n_outliers"),
          max(col("group_median")).as("median_u"),
          max(col("group_mad")).as("mad_u"))
        .orderBy("label")
    }),

    // hard-negative mining: top-5 most-similar DIFFERENT-label vectors
    // per anchor — the contrastive-training near-miss set; broadcast
    // anchors + map-side label filter, same rerank as brute-force k-NN
    "q_embed_hardneg" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      graft.ops.Similarity.hardNegatives(
        emb.filter(col("vec_id") % 100 === 0), emb,
        "vec_id", "embedding", "label", k = 5)
        .orderBy("query_id", "rank")
    }),

    // nearest-centroid classifier confusion matrix: map-side exact
    // decimal assignment against the driver-bounded prototype table
    "q_embed_confusion" -> ((s, dir) => {
      graft.ops.Similarity.centroidClassify(
        Tables(s, dir, "embeddings"), "label", "embedding")
        .orderBy("label", "predicted")
    }),

    // adjacent-repeat token collapse: stutter cleanup before token
    // budgeting — md5-pinned cleaned bodies, map-side only
    "q_text_collapse" -> ((s, dir) => {
      val (cleaned, removed) =
        TextAnalysis.collapseRepeatTokens("text")
      Tables(s, dir, "documents")
        .filter(col("doc_id") % 7 === 0 && col("text").isNotNull)
        .select(col("doc_id"), removed.as("n_removed"),
          md5(cleaned).as("cleaned_md5"))
        .orderBy("doc_id")
    }),

    // c-TF-IDF: the 5 terms most characteristic of each SOURCE (the
    // BERTopic topic-labeling shape) — group-as-document tf-idf with
    // the ulp-safe rounded-rank cut
    "q_text_ctfidf" -> ((s, dir) => {
      TextAnalysis.tfidfTopTermsByGroup(
        Tables(s, dir, "documents"), "source", "text", k = 5)
        .orderBy("source", "rank")
    }),

    // exact per-group mode: each user's most frequent event type —
    // count-table argmax with a pinned (count desc, value asc) tie-break
    "q_stats_mode" -> ((s, dir) => {
      graft.ops.Stats.modeByGroup(
        Tables(s, dir, "events"), "user_id", "event_type")
        .orderBy("user_id")
    }),

    // lexical diversity per source: type-token ratio (distinct tokens /
    // tokens) — the vocabulary-collapse diagnostic for template-heavy
    // or looped sources; two vocab-bounded aggregates, one division
    "q_text_ttr" -> ((s, dir) => {
      val tok = Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
      tok.groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("term")).as("n_types"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          round(col("n_types").cast("double") /
            col("n_tokens").cast("double"), 6).as("ttr"))
        .orderBy("source")
    }),

    // bursty-term mining: top-20 VMR terms at df ≥ 5 — topical
    // vocabulary + template phrases; exact-integer num/den, rounded
    // ulp-safe rank cut, 1-row N broadcast, TakeOrdered
    "q_text_bursty" -> ((s, dir) => {
      TextAnalysis.burstyTerms(
        Tables(s, dir, "documents"), "doc_id", "text",
        k = 20, minDf = 5L)
    }),

    // Zipf slope per source: ln(freq)-on-ln(rank) OLS over each
    // slice's frequency table — the one-number naturalness audit;
    // everything past the map-side count is vocabulary-bounded
    "q_text_zipf" -> ((s, dir) => {
      TextAnalysis.zipfFit(
        Tables(s, dir, "documents"), "source", "text")
        .orderBy("source")
    }),

    // per-source token-distribution Shannon entropy + ln(V)-normalized
    // variant: the internal-diversity twin of the KL drift audit —
    // vocab-bounded counts, groups-bounded broadcast, decimal term sum
    "q_text_entropy" -> ((s, dir) => {
      TextAnalysis.tokenEntropy(
        Tables(s, dir, "documents"), "source", "text")
        .orderBy("source")
    }),

    // k-anonymity audit: (source, lang, length) quasi-identifier
    // combinations shared by < 5 docs — one combination-bounded groupBy
    // + a 1-row rollup; the pre-release re-identification screen
    "q_audit_kanon" -> ((s, dir) => {
      graft.ops.Audit.kAnonymity(
        Tables(s, dir, "documents"),
        Seq("source", "lang", "n_chars"), k = 5)
    }),

    // Benford first-digit audit on order totals: observed digit shares
    // vs log10(1+1/d) — integer-cents leading digit, 9-row tables only
    "q_audit_benford" -> ((s, dir) => {
      graft.ops.Audit.benford(
        Tables(s, dir, "orders"), "o_totalprice")
        .orderBy("digit")
    }),

    // hapax share per source: fraction of the vocabulary occurring
    // exactly once — high = OCR noise / typo soup, low = templated;
    // the third vocabulary-health number next to TTR and entropy
    "q_text_hapax" -> ((s, dir) => {
      val gt = Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy("source", "term").agg(count(lit(1)).as("c"))
      gt.groupBy("source")
        .agg(count(lit(1)).as("n_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_types"), col("n_hapax"),
          round(col("n_hapax").cast("double") /
            col("n_types").cast("double"), 6).as("hapax_ratio"))
        .orderBy("source")
    }),

    // cross-source vocabulary overlap: pairwise shared-term counts +
    // Jaccard — the mixing/redundancy audit; vocab-bounded distinct,
    // term-keyed equi self-join, groups²-bounded output
    "q_text_overlap" -> ((s, dir) => {
      TextAnalysis.vocabOverlap(
        Tables(s, dir, "documents"), "text", "source")
        .orderBy("group_a", "group_b")
    }),

    // daily-count anomaly flags: each event type's day counts scored
    // against the type's own median ± 3·MAD — integer-exact monitoring
    // built by composing the daily aggregate with the robust outlier op
    "q_ts_anomaly" -> ((s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      graft.ops.Stats.madOutliers(daily, "event_type", "n", k = 3)
        .orderBy("event_type", "day")
    }),

    // day-of-week seasonal profile: mean daily volume by ISO weekday
    // per type — the SHAPE behind the autocorrelation number; two
    // bounded aggregates (weekday+1 = DuckDB isodow)
    "q_ts_seasonal_profile" -> ((s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_day"))
      daily
        .groupBy(col("event_type"),
          (weekday(col("day")) + 1).as("isodow"))
        .agg(count(lit(1)).as("n_days"), sum(col("n_day")).as("__s"))
        .select(col("event_type"), col("isodow"), col("n_days"),
          round(col("__s").cast("double") / col("n_days").cast("double"),
            6).as("mean_daily"))
        .orderBy("event_type", "isodow")
    }),

    // weekly autocorrelation of daily counts per type: corr(x_t,
    // x_{t−7}) — the direct seasonality strength number next to MASE;
    // the exact-corr op composed onto a lag window (row-based lags
    // over the dense synthetic calendar)
    "q_ts_autocorr" -> ((s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_day"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
      val lagged = daily
        .withColumn("lag7", lag(col("n_day"), 7).over(w))
        .filter(col("lag7").isNotNull)
      graft.ops.Stats.corrByGroup(lagged, "event_type", "n_day", "lag7")
        .orderBy("event_type")
    }),

    // per-type volume trend: OLS slope of daily counts on the day
    // index — "is this metric growing?"; the linreg op composed onto a
    // row_number time axis, exact integer sufficient statistics
    "q_ts_trend" -> ((s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_day"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
      val idx = daily.withColumn("t", row_number().over(w))
      graft.ops.Stats.linregByGroup(idx, "event_type", "t", "n_day")
        .orderBy("event_type")
    }),

    // single changepoint per event type: the day its daily volume
    // LEVEL moved, by binary segmentation over prefix sums — one sort
    // window + one ranking window, no recursion
    "q_ts_changepoint" -> ((s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_day"))
      graft.ops.Timeseries.changepointByGroup(daily, "event_type",
        "day", "n_day")
        .orderBy("event_type")
    }),

    // seasonal-naive forecast skill: each event type's daily counts
    // scored week-over-week vs the day-over-day naive baseline —
    // MASE < 1 means weekly seasonality is real; exact integer errors
    "q_ts_mase" -> ((s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      graft.ops.Timeseries.seasonalNaiveError(daily, "event_type",
        "day", "n", season = 7)
        .orderBy("event_type")
    }),

    // exact-decimal EWMA: per-user smoothed purchase value (cents) —
    // integer weight tables keep every intermediate exact; one final
    // double division
    "q_ts_ewma" -> ((s, dir) => {
      val ev = Tables(s, dir, "events").filter(col("user_id") < 200)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          floor(dec(col("value")) * 100).cast("long").as("cents"))
      graft.ops.Timeseries.ewma(ev, "user_id", Seq("ts_us", "event_id"),
        "cents")
        .select("user_id", "event_id", "cents", "ewma")
        .orderBy("user_id", "event_id")
    }),

    // join-key skew profile: the 20 heaviest supplier keys of lineitem
    // with corpus share — the pre-join salting/AQE diagnosis
    "q_audit_skew" -> ((s, dir) => {
      graft.ops.Audit.keySkew(
        Tables(s, dir, "lineitem"), "l_suppkey", k = 20)
        .orderBy(col("n_rows").desc, col("key"))
    }),

    // temporal state lookup (SCD-2 dimension join at event time): every
    // click reads the user state current at its instant — the CDC
    // version stream (same-instant changes collapsed to the seq-latest
    // so the match is deterministic) as-of joined backward; a
    // delete-as-latest nulls the lookup (the key didn't exist then)
    "q_cdc_lookup" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val wv = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "ts").orderBy(col("event_id").desc)
      val versions = ev.filter(col("event_type") =!= "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "error", lit("D"))
            .otherwise(lit("U")).as("op"),
          col("value"))
        .withColumn("__rn", row_number().over(wv))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("ts").as("vts"),
          col("event_id").as("version_id"), col("op"),
          col("value").as("state_value"))
      val probes = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("probe_id"), col("ts"))
      graft.ops.AsofJoin.backward(probes, versions, Seq("user_id"),
        "ts", "vts", Seq("version_id", "op", "state_value"))
        .select(col("probe_id"), col("user_id"),
          when(col("op") === "D", lit(null)).otherwise(col("version_id"))
            .as("version_id"),
          when(col("op") === "D", lit(null)).otherwise(col("state_value"))
            .as("state_value"))
        .orderBy("probe_id")
    }),

    // weighted sampling without replacement: 100 docs with inclusion
    // probability ∝ n_chars — E-S priorities on md5-exact uniforms,
    // ulp-safe rounded cut, distributed TakeOrdered
    "q_sample_weighted" -> ((s, dir) => {
      graft.ops.Sampling.weightedSample(
        Tables(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", k = 100)
        .orderBy("sample_rank")
    }),

    // per-node triangle counts over the STRONG nation trade graph
    // (edges with ≥ 1/650 of all lineitems — an integer relative cut so
    // the graph stays comparable across scales): degree-oriented wedge
    // join, each triangle counted once, all integer
    "q_graph_triangles" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val o = Tables(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = Tables(s, dir, "customer").select("c_custkey", "c_nationkey")
      val su = Tables(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val nat = Tables(s, dir, "nation").select("n_nationkey", "n_name")
      val w = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
      val tot = li.agg(count(lit(1)).as("__n"))
      val edges = w.crossJoin(broadcast(tot))
        .filter(col("w") * 650 >= col("__n"))
      graft.ops.Graph.triangleCounts(edges, "src", "dst")
        .join(nat, col("id") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("n_triangles"))
        .orderBy("nation")
    }),

    // Hilbert key: the state-machine curve that drives the hilbert
    // write layout, oracle-pinned on the same explicit bucket ids as
    // q_zorder_key (the layout itself is physical and spec-tested)
    "q_hilbert_key" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
        .withColumn("bx", pmod(col("o_custkey"), lit(256)).cast("int"))
        .withColumn("by",
          pmod(floor(col("o_totalprice")).cast("long"), lit(256)).cast("int"))
      orders.select(col("o_orderkey"),
        graft.ops.Zorder.hilbertKey(col("bx"), col("by")).as("hkey"))
        .orderBy("o_orderkey")
    })
  )

  // ---- DuckDB oracles ---------------------------------------------------

  /** Shared shingle CTE (word 3-shingles, distinct) — byte-identical to
    * Dedup.shingleExpr (defined below at `shingleCte`).
    *
    * Perturbed documents twin for the audit queries: every 17th doc
    * deleted, every 13th edited, every 19th re-inserted under a new key
    * — deterministic, same arithmetic in the oracle's `b` CTE. */
  private def auditTwin(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.filter(col("doc_id") % 17 =!= 3)
      .withColumn("text",
        when(col("doc_id") % 13 === 1, concat(col("text"), lit(" [edited]")))
          .otherwise(col("text")))
      .unionByName(docs.filter(col("doc_id") % 19 === 2)
        .select((col("doc_id") + 500000).as("doc_id"), col("text"),
          col("source")))

  /** Shared audit-diff status CTEs (documents vs [[auditTwin]]). */
  private val auditCtes =
    """WITH b AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 1 THEN text || ' [edited]' ELSE text END AS text,
      |    source
      |  FROM documents WHERE doc_id % 17 <> 3
      |  UNION ALL
      |  SELECT doc_id + 500000, text, source FROM documents WHERE doc_id % 19 = 2),
      |j AS (
      |  SELECT a.doc_id AS ka, b.doc_id AS kb, a.text AS a_text,
      |    a.source AS a_src, b.text AS b_text, b.source AS b_src
      |  FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id),
      |st AS (
      |  SELECT COALESCE(ka, kb) AS doc_id,
      |    CASE WHEN ka IS NULL THEN 'only_in_b'
      |         WHEN kb IS NULL THEN 'only_in_a'
      |         WHEN a_text IS NOT DISTINCT FROM b_text
      |          AND a_src IS NOT DISTINCT FROM b_src THEN 'identical'
      |         ELSE 'changed' END AS status,
      |    a_text, b_text
      |  FROM j)""".stripMargin

  /** Shared DSIR CTEs: hashed unigram+bigram features (md5-convention
    * buckets, B=1024), Laplace-smoothed target(lang='zh')/raw bucket
    * log-ratios, per-doc DECIMAL(38,18) sums — the oracle twin of
    * [[graft.ops.Dsir.importanceWeights]]. */
  private[packs] val dsirCtes =
    """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
      |feats AS (
      |  SELECT doc_id, lang, unnest(w) AS f FROM d
      |  UNION ALL
      |  SELECT doc_id, lang, unnest(list_transform(range(1, len(w)),
      |    i -> w[i] || ' ' || w[i+1])) AS f FROM d),
      |fb AS (SELECT doc_id, lang,
      |  ('0x' || substr(md5(f), 1, 12))::BIGINT % 1024 AS b FROM feats),
      |tc AS (SELECT b, count(*) AS tc FROM fb WHERE lang = 'zh' GROUP BY 1),
      |rc AS (SELECT b, count(*) AS rc FROM fb GROUP BY 1),
      |tots AS (SELECT (SELECT sum(tc) FROM tc) AS tt,
      |                (SELECT sum(rc) FROM rc) AS rt),
      |lr AS (
      |  SELECT rc.b,
      |    ln(CAST(COALESCE(tc.tc, 0) AS DOUBLE) + 1.0)
      |      - ln(CAST(tt AS DOUBLE) + 1024.0)
      |      - ln(CAST(rc.rc AS DOUBLE) + 1.0)
      |      + ln(CAST(rt AS DOUBLE) + 1024.0) AS lr
      |  FROM rc LEFT JOIN tc ON rc.b = tc.b CROSS JOIN tots),
      |doc AS (
      |  SELECT fb.doc_id, count(*) AS n_feats,
      |    SUM(CAST(lr AS DECIMAL(38,18))) AS s
      |  FROM fb JOIN lr ON fb.b = lr.b GROUP BY 1),
      |scored AS (
      |  SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats,
      |    round(CAST(s AS DOUBLE) / n_feats, 6) AS logw
      |  FROM doc)""".stripMargin

  private val shingleCte =
    """sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(len(string_split(text, ' ')) - 2),
      |    i -> array_to_string(list_slice(string_split(text, ' '), i + 1, i + 3), ' '))) AS s
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3)""".stripMargin

  /** Unrolled HUGEINT power-iteration CTE chain mirroring
    * Graph.pageRank exactly: same floor divisions, same 17/20 damping,
    * same 1e12 unit. `edgeSql` must yield (src, dst, w); `nodeSql`
    * must yield (id) and may reference `e`. The final rank table is
    * `r<iters>` (id, ru). */
  private[packs] def pagerankCtes(iters: Int, edgeSql: String,
      nodeSql: String): String = {
    val base =
      s"""e AS MATERIALIZED (
         |$edgeSql),
         |ow AS MATERIALIZED (SELECT src, sum(w) AS ow FROM e GROUP BY 1),
         |n AS ($nodeSql),
         |cnt AS (SELECT count(*) AS nn FROM n),
         |r0 AS (
         |  SELECT id, CAST(1000000000000 AS HUGEINT) // cnt.nn AS ru
         |  FROM n CROSS JOIN cnt)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT n.id,
         |    (CAST(3 AS HUGEINT) * 1000000000000) // (20 * cnt.nn)
         |    + (17 * COALESCE(inf.s, CAST(0 AS HUGEINT))) // 20 AS ru
         |  FROM n CROSS JOIN cnt
         |  LEFT JOIN (
         |    SELECT e.dst AS id, sum((r.ru * e.w) // ow.ow) AS s
         |    FROM e JOIN r${k - 1} r ON r.id = e.src
         |    JOIN ow ON ow.src = e.src
         |    GROUP BY 1) inf USING (id))""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  private def pagerankSql(iters: Int): String = {
    val edges =
      """  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
        |    count(*) AS w
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  GROUP BY 1, 2""".stripMargin
    s"""WITH ${pagerankCtes(iters, edges, "SELECT n_nationkey AS id FROM nation")}
       |SELECT nt.n_name AS nation, CAST(r.ru AS BIGINT) AS rank_u
       |FROM r$iters r JOIN nation nt ON nt.n_nationkey = r.id
       |ORDER BY nation""".stripMargin
  }

  private val jaccardPairsSql =
    s"""WITH $shingleCte
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  round(len(list_intersect(a.s, b.s)) * 1.0 /
       |        len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE len(list_intersect(a.s, b.s)) * 1.0 /
       |      len(list_distinct(list_concat(a.s, b.s))) >= 0.8
       |ORDER BY id_a, id_b""".stripMargin

  /** Near-dup pair graph → transitive closure, as a recursive CTE: the
    * oracle for connectedComponents. `reach` enumerates, for every node,
    * every id reachable from it (set semantics terminate the recursion);
    * the component label is the minimum. Mirrors the same 0.8-Jaccard
    * MinHash pair set the Spark side clusters. */
  private val ccCtes =
    s"""${shingleCte.replace("sh AS (", "sh AS MATERIALIZED (")},
       |pairs AS MATERIALIZED (
       |  SELECT a.doc_id AS u, b.doc_id AS v
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.s, b.s)) * 1.0 /
       |        len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
       |edges AS MATERIALIZED (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
       |reach(id, lab) AS (
       |  SELECT u, u FROM edges
       |  UNION
       |  SELECT e.u, r.lab FROM edges e JOIN reach r ON r.id = e.v),
       |cc AS (SELECT id, min(lab) AS component_id FROM reach GROUP BY id)""".stripMargin

  /** DuckDB mirror of Dedup.withSimhashChunks: md5 bit votes per token,
    * 64 sign bits packed into four 16-bit int chunks — ends in a
    * `chunks(doc_id, c0..c3)` CTE shared by the pair oracle and the
    * incremental-pipeline composition. */
  /** [[simhashChunkCtes]] over an arbitrary (doc_id, text) relation —
    * the media near-dup oracle chunks a synthetic corpus CTE. */
  private[packs] def simhashChunkCtesFrom(from: String): String =
    simhashChunkCtes.replace("FROM documents)", s"FROM $from)")

  private[packs] val simhashChunkCtes: String =
    """toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |bitsum AS (
      |  SELECT doc_id, j,
      |    SUM(CASE WHEN (((strpos('0123456789abcdef',
      |          substr(md5(t), CAST(floor(j / 4) AS INT) + 1, 1)) - 1)
      |          >> (3 - (j % 4))) & 1) = 1
      |        THEN 1 ELSE -1 END) AS w
      |  FROM toks CROSS JOIN range(64) r(j)
      |  GROUP BY doc_id, j),
      |chunks AS MATERIALIZED (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN w > 0 AND j BETWEEN 0 AND 15 THEN (1 << j) ELSE 0 END) AS INT) AS c0,
      |    CAST(SUM(CASE WHEN w > 0 AND j BETWEEN 16 AND 31 THEN (1 << (j - 16)) ELSE 0 END) AS INT) AS c1,
      |    CAST(SUM(CASE WHEN w > 0 AND j BETWEEN 32 AND 47 THEN (1 << (j - 32)) ELSE 0 END) AS INT) AS c2,
      |    CAST(SUM(CASE WHEN w > 0 AND j BETWEEN 48 AND 63 THEN (1 << (j - 48)) ELSE 0 END) AS INT) AS c3
      |  FROM bitsum GROUP BY doc_id)""".stripMargin

  /** DuckDB mirror of Similarity.hyperplaneSignature: integer quantization
    * (round(x·10^6) as BIGINT, ties away from zero in both engines) dotted
    * with md5-derived integer weights — bit-identical buckets. Inline
    * derived-table form so it can sit in a JOIN clause. */
  private def sigSql(bits: Int): String =
    s"""(SELECT vec_id,
       |   CAST(list_sum(list_transform(range(0, $bits), i ->
       |     CASE WHEN CAST(list_sum(list_transform(range(0, len(embedding)), d ->
       |         CAST(round(CAST(embedding[d+1] AS DOUBLE) * 1000000) AS BIGINT) *
       |         (((('0x' || substr(md5('hp' || i || '_' || d), 1, 15))::BIGINT) % 2001) - 1000)
       |     )) AS BIGINT) > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS bucket
       | FROM embeddings)""".stripMargin

  /** DuckDB mirror of Similarity.bandSignatures: per band b, an r-bit
    * signature whose bit j is the sign of the integer dot with global
    * hyperplane b·r+j — the same quantization/weight math as [[sigSql]],
    * emitted as one (vec_id, band, sig) row per band. `from` lets the
    * incremental oracle band a sliced derived table. */
  private[packs] def bandSigCte(name: String, bands: Int, r: Int,
      from: String = "embeddings"): String =
    s"""$name AS (
       |  SELECT vec_id, bb.band,
       |    CAST(list_sum(list_transform(range(0, $r), j ->
       |      CASE WHEN CAST(list_sum(list_transform(range(0, len(embedding)), d ->
       |          CAST(round(CAST(embedding[d+1] AS DOUBLE) * 1000000) AS BIGINT) *
       |          (((('0x' || substr(md5('hp' || (bb.band * $r + j) || '_' || d), 1, 15))::BIGINT) % 2001) - 1000)
       |      )) AS BIGINT) > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS sig
       |  FROM $from, (SELECT unnest(range(0, $bands)) AS band) bb
       |  WHERE embedding IS NOT NULL)""".stripMargin

  // (the decimal-exact cosine-pairs oracle itself is `cosineSql` below)
  /** Nearest-centroid confusion chain (mirror of
    * Similarity.centroidClassify): per-label micro-unit mean centroids,
    * exact DECIMAL(38,18) distances, (d2, cid) argmax assignment, ending
    * in a `conf(label, predicted, n)` CTE — shared by the confusion
    * query and the kappa query built on top of it. */
  private val confusionCtes: String =
    """exd AS (
      |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
      |    CAST(unnest(embedding) AS DOUBLE) AS xd
      |  FROM embeddings WHERE embedding IS NOT NULL),
      |cent AS (
      |  SELECT label AS clab, i,
      |    round(CAST(sum(CAST(round(xd * 1000000) AS HUGEINT)) AS DOUBLE)
      |      / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS mean
      |  FROM exd GROUP BY 1, 2),
      |lab AS (
      |  SELECT clab, CAST(ROW_NUMBER() OVER (ORDER BY clab) - 1 AS INT)
      |    AS cid
      |  FROM (SELECT DISTINCT clab FROM cent) t),
      |dist AS (
      |  SELECT e.vec_id, e.label, l.cid,
      |    SUM(CAST((e.xd - c.mean) * (e.xd - c.mean)
      |        AS DECIMAL(38,18))) AS d2
      |  FROM exd e
      |  JOIN cent c ON c.i = e.i
      |  JOIN lab l ON l.clab = c.clab
      |  GROUP BY 1, 2, 3),
      |asg AS (
      |  SELECT vec_id, label, cid FROM (
      |    SELECT vec_id, label, cid,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      |    FROM dist) t WHERE rn = 1),
      |conf AS (
      |  SELECT a.label, l.clab AS predicted, CAST(count(*) AS BIGINT) AS n
      |  FROM asg a JOIN lab l USING (cid)
      |  GROUP BY 1, 2)""".stripMargin

  /** Language-ID prediction CTE chain (mirror of
    * TextAnalysis.languageId's marker-hit argmax, zero hits → 'und'),
    * ending in `pred(doc_id, lang, predicted)` — shared by the
    * distribution, confusion, and kappa oracles. */
  private def langPredCtes: String = langPredCtesFrom("documents", Nil)

  /** Same chain over any FROM source, optionally carrying extra columns
    * through `scored`/`pred` (the engine-macro oracle needs source +
    * text alongside the prediction). */
  private[packs] def langPredCtesFrom(from: String,
      extra: Seq[String]): String = {
    val langs = TextAnalysis.markers.toSeq.sortBy(_._1)
    val ex = extra.map(c => s", $c").mkString
    val hitCols = langs.map { case (l, ws) =>
      val list = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(lower(text), ' '), t -> t IN ($list))) AS h_$l"
    }.mkString(",\n    ")
    val maxExpr = langs.map { case (l, _) => s"h_$l" }
      .mkString("greatest(", ", ", ")")
    val argmax = langs.map { case (l, _) =>
      s"WHEN h_$l = $maxExpr THEN '$l'"
    }.mkString("\n      ")
    s"""scored AS (
       |  SELECT doc_id, lang$ex,
       |    $hitCols
       |  FROM $from),
       |pred AS (
       |  SELECT doc_id, lang$ex,
       |    CASE WHEN $maxExpr = 0 THEN 'und'
       |      $argmax
       |      END AS predicted
       |  FROM scored)""".stripMargin
  }

  /** Cohen's-kappa finisher over a `conf(label, predicted, n)` CTE —
    * HUGEINT marginal products, kappa from UNROUNDED po/pe. Shared by
    * the centroid-classifier and language-ID kappa oracles. */
  private val kappaTailSql: String =
    """tot AS (
      |  SELECT sum(n) AS nn,
      |    sum(CASE WHEN CAST(label AS VARCHAR) = CAST(predicted AS VARCHAR)
      |        THEN n ELSE 0 END) AS diag
      |  FROM conf),
      |rn AS (SELECT CAST(label AS VARCHAR) AS l, sum(n) AS rr
      |       FROM conf GROUP BY 1),
      |cn AS (SELECT CAST(predicted AS VARCHAR) AS p, sum(n) AS cc
      |       FROM conf GROUP BY 1),
      |pen AS (
      |  SELECT coalesce(sum(CAST(rn.rr AS HUGEINT) *
      |    CAST(cn.cc AS HUGEINT)), 0) AS penum
      |  FROM rn JOIN cn ON cn.p = rn.l)
      |SELECT CAST(t.nn AS BIGINT) AS n,
      |  round(CAST(t.diag AS DOUBLE) / CAST(t.nn AS DOUBLE), 6) AS po,
      |  round(CAST(p.penum AS DOUBLE) /
      |    (CAST(t.nn AS DOUBLE) * CAST(t.nn AS DOUBLE)), 6) AS pe,
      |  CASE WHEN CAST(p.penum AS DOUBLE) /
      |      (CAST(t.nn AS DOUBLE) * CAST(t.nn AS DOUBLE)) <> 1.0
      |    THEN round((CAST(t.diag AS DOUBLE) / CAST(t.nn AS DOUBLE) -
      |      CAST(p.penum AS DOUBLE) /
      |        (CAST(t.nn AS DOUBLE) * CAST(t.nn AS DOUBLE))) /
      |      (1.0 - CAST(p.penum AS DOUBLE) /
      |        (CAST(t.nn AS DOUBLE) * CAST(t.nn AS DOUBLE))), 6)
      |  END AS kappa
      |FROM tot t CROSS JOIN pen p""".stripMargin

  private def cosineSql(filterA: String, filterB: String, pred: String,
      select: String, order: String) =
    s"""WITH ex AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         unnest(embedding) AS x
       |  FROM embeddings),
       |dots AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    CAST(SUM(CAST(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS dot
       |  FROM ex a JOIN ex b ON a.i = b.i AND $pred
       |  WHERE $filterA AND $filterB
       |  GROUP BY a.vec_id, b.vec_id),
       |norms AS (
       |  SELECT vec_id,
       |    sqrt(CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
       |  FROM ex GROUP BY vec_id)
       |$select
       |$order""".stripMargin

  /** DuckDB mirror of Similarity.kmeansCentroids + ivfTopK: Lloyd's
    * iterations unrolled as CTE chains (c0 → dist_i/asg_i → c_{i+1}),
    * every accumulation in DECIMAL(38,18) exactly as the Spark
    * expressions do it, so centroids, assignments, probes, and the final
    * rerank are bit-identical.
    *
    * Coarse k-means CTE chain over `exd` (c0 init → per-iteration
    * dist/asg/next → final dist$iters/asg$iters), shared by the IVF and
    * IVFPQ oracles — Lloyd's iterations unrolled, every accumulation in
    * DECIMAL(38,18) exactly as the Spark expressions do it. */
  private def coarseDistCte(n: Int, pred: String = "TRUE") =
    s"""dist$n AS (
       |  SELECT e.vec_id, c.cid,
       |    SUM(CAST((e.xd - c.val) * (e.xd - c.val) AS DECIMAL(38,18))) AS d2
       |  FROM exd e JOIN c$n c ON c.i = e.i
       |  WHERE $pred
       |  GROUP BY e.vec_id, c.cid)""".stripMargin
  private def coarseAsgCte(n: Int) =
    s"""asg$n AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
       |    FROM dist$n) t WHERE rn = 1)""".stripMargin
  private def coarseNextCte(n: Int) =
    s"""c${n + 1} AS (
       |  SELECT p.cid, p.i, COALESCE(m.mean, p.val) AS val
       |  FROM c$n p LEFT JOIN (
       |    SELECT a.cid, e.i,
       |      CAST(SUM(CAST(e.xd AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS mean
       |    FROM asg$n a JOIN exd e ON e.vec_id = a.vec_id
       |    GROUP BY a.cid, e.i) m ON m.cid = p.cid AND m.i = p.i)""".stripMargin
  /** `trainMod` > 1 trains on the deterministic id-arithmetic sample
    * (vec_id % trainMod = 0): init and every ITERATION distance pass see
    * only the sample, but the FINAL dist/asg pair (encode + probe
    * source) always covers the full corpus — mirrors
    * Similarity.ivfpqTopK's trainSampleMod exactly. */
  private def coarseKmeansCtes(nlist: Int, iters: Int,
      trainMod: Int = 1): String = {
    val initPred = if (trainMod == 1) "TRUE" else s"vec_id % $trainMod = 0"
    val iterPred = if (trainMod == 1) "TRUE" else s"e.vec_id % $trainMod = 0"
    coarseKmeansCtesWhere(nlist, iters, initPred, iterPred)
  }

  /** [[coarseKmeansCtes]] with arbitrary training predicates — the
    * frozen-centroid oracle trains on a SLICE (init and every iteration
    * narrowed to it) while the final dist/asg pair still covers the full
    * corpus, mirroring a frozen `cluster_assign` artifact applied to
    * later batches. */
  private[packs] def coarseKmeansCtesWhere(nlist: Int, iters: Int,
      initPred: String, iterPred: String): String = {
    val iterCtes = (0 until iters)
      .map(n => s"${coarseDistCte(n, iterPred)},\n${coarseAsgCte(n)},\n${coarseNextCte(n)}")
      .mkString(",\n")
    s"""c0 AS (
       |  SELECT CAST(r.rn - 1 AS INT) AS cid, e.i, e.xd AS val
       |  FROM (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
       |        FROM embeddings WHERE $initPred ORDER BY vec_id LIMIT $nlist) r
       |  JOIN exd e ON e.vec_id = r.vec_id),
       |$iterCtes,
       |${coarseDistCte(iters)},
       |${coarseAsgCte(iters)}""".stripMargin
  }

  /** DuckDB mirror of Dedup.semanticDedup: the coarse k-means chain,
    * within-cell exact-decimal cosine pairs, recursive-CTE components,
    * and the farthest-from-centroid (d2 DESC, id ASC) keep rule.
    * asg/dist are re-aliased AS MATERIALIZED — each is referenced 2-3
    * times and DuckDB's default inlining would re-run the whole Lloyd
    * chain per reference (the BPE oracle lesson). */
  private def semdedupSql(nlist: Int, iters: Int,
      threshold: Double): String =
    s"""WITH RECURSIVE ex AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         unnest(embedding) AS x
       |  FROM embeddings),
       |exd AS MATERIALIZED (
       |  SELECT vec_id, i, CAST(x AS DOUBLE) AS xd FROM ex),
       |${coarseKmeansCtes(nlist, iters)},
       |asgm AS MATERIALIZED (SELECT * FROM asg$iters),
       |distm AS MATERIALIZED (SELECT * FROM dist$iters),
       |cellp AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM asgm a JOIN asgm b ON a.cid = b.cid AND a.vec_id < b.vec_id),
       |dots AS (
       |  SELECT p.id_a, p.id_b,
       |    CAST(SUM(CAST(ea.xd * eb.xd AS DECIMAL(38,18))) AS DOUBLE) AS dot
       |  FROM cellp p JOIN exd ea ON ea.vec_id = p.id_a
       |               JOIN exd eb ON eb.vec_id = p.id_b AND eb.i = ea.i
       |  GROUP BY 1, 2),
       |norms AS (
       |  SELECT vec_id,
       |    sqrt(CAST(SUM(CAST(xd * xd AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
       |  FROM exd GROUP BY vec_id),
       |spairs AS MATERIALIZED (
       |  SELECT d.id_a AS u, d.id_b AS v FROM dots d
       |  JOIN norms na ON na.vec_id = d.id_a
       |  JOIN norms nb ON nb.vec_id = d.id_b
       |  WHERE d.dot / (na.nrm * nb.nrm) >= $threshold),
       |edges AS MATERIALIZED (
       |  SELECT u, v FROM spairs UNION SELECT v, u FROM spairs),
       |reach(id, lab) AS (
       |  SELECT u, u FROM edges
       |  UNION
       |  SELECT e.u, r.lab FROM edges e JOIN reach r ON r.id = e.v),
       |cc AS MATERIALIZED (
       |  SELECT id, min(lab) AS component_id FROM reach GROUP BY id),
       |pri AS MATERIALIZED (
       |  SELECT a.vec_id, a.cid, d.d2
       |  FROM asgm a JOIN distm d ON d.vec_id = a.vec_id AND d.cid = a.cid),
       |csize AS (SELECT component_id, count(*) AS n FROM cc GROUP BY 1),
       |keep AS (
       |  SELECT id, component_id FROM (
       |    SELECT c.id, c.component_id,
       |      ROW_NUMBER() OVER (PARTITION BY c.component_id
       |        ORDER BY p.d2 DESC, c.id) AS rn
       |    FROM cc c JOIN pri p ON p.vec_id = c.id) t WHERE rn = 1)
       |SELECT k.id AS vec_id, CAST(p.cid AS INT) AS cid,
       |  CAST(cs.n AS BIGINT) AS n_dups
       |FROM keep k JOIN csize cs USING (component_id)
       |            JOIN pri p ON p.vec_id = k.id
       |UNION ALL
       |SELECT p.vec_id, CAST(p.cid AS INT), CAST(1 AS BIGINT)
       |FROM pri p WHERE p.vec_id NOT IN (SELECT id FROM cc)
       |ORDER BY vec_id""".stripMargin

  private[packs] def ivfSql(nlist: Int, nprobe: Int, iters: Int, k: Int): String = {
    s"""WITH ex AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         unnest(embedding) AS x
       |  FROM embeddings),
       |exd AS (SELECT vec_id, i, CAST(x AS DOUBLE) AS xd FROM ex),
       |${coarseKmeansCtes(nlist, iters)},
       |probes AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
       |    FROM dist$iters WHERE vec_id % 100 = 0) t WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN asg$iters a ON a.cid = p.cid
       |  WHERE a.vec_id <> p.query_id),
       |dots AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    CAST(SUM(CAST(qa.xd * qb.xd AS DECIMAL(38,18))) AS DOUBLE) AS dot
       |  FROM cand c JOIN exd qa ON qa.vec_id = c.query_id
       |              JOIN exd qb ON qb.vec_id = c.neighbor_id AND qb.i = qa.i
       |  GROUP BY c.query_id, c.neighbor_id),
       |norms AS (
       |  SELECT vec_id,
       |    sqrt(CAST(SUM(CAST(xd * xd AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
       |  FROM exd GROUP BY vec_id)
       |SELECT * FROM (
       |  SELECT d.query_id, d.neighbor_id,
       |    round(d.dot / (na.nrm * nb.nrm), 6) AS cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY d.query_id
       |      ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.neighbor_id) AS INT) AS rank
       |  FROM dots d JOIN norms na ON na.vec_id = d.query_id
       |              JOIN norms nb ON nb.vec_id = d.neighbor_id) t
       |WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Product-quantization oracle: per-subspace k-means (same decimal
    * contract as [[ivfSql]]) → corpus codes → per-query ADC tables →
    * exact-decimal ADC ranking. `iters` = 1 training update per
    * codebook; subspace s covers dims [s·subDim+1, (s+1)·subDim].
    *
    * Per-subspace PQ CTE chain (sub-vector slice → 1-update k-means
    * codebook → corpus codes → per-query ADC distance table), shared by
    * the PQ and IVFPQ oracles. */
  private def pqSubspaceCtes(s: Int, subDim: Int, codebookSize: Int): String = {
      val lo = s * subDim + 1
      val hi = (s + 1) * subDim
      s"""sub$s AS (
         |  SELECT vec_id, i, xd FROM exd WHERE i BETWEEN $lo AND $hi),
         |c${s}_0 AS (
         |  SELECT CAST(r.rn - 1 AS INT) AS cid, e.i, e.xd AS val
         |  FROM (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
         |        FROM embeddings ORDER BY vec_id LIMIT $codebookSize) r
         |  JOIN sub$s e ON e.vec_id = r.vec_id),
         |dist${s}_0 AS (
         |  SELECT e.vec_id, c.cid,
         |    SUM(CAST((e.xd - c.val) * (e.xd - c.val)
         |        AS DECIMAL(38,18))) AS d2
         |  FROM sub$s e JOIN c${s}_0 c ON c.i = e.i
         |  GROUP BY e.vec_id, c.cid),
         |asg${s}_0 AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM dist${s}_0) t WHERE rn = 1),
         |c${s}_1 AS (
         |  SELECT p.cid, p.i, COALESCE(q.mean, p.val) AS val
         |  FROM c${s}_0 p LEFT JOIN (
         |    SELECT a.cid, e.i,
         |      CAST(SUM(CAST(e.xd AS DECIMAL(38,18))) AS DOUBLE)
         |        / COUNT(*) AS mean
         |    FROM asg${s}_0 a JOIN sub$s e ON e.vec_id = a.vec_id
         |    GROUP BY a.cid, e.i) q ON q.cid = p.cid AND q.i = p.i),
         |dist${s}_1 AS (
         |  SELECT e.vec_id, c.cid,
         |    SUM(CAST((e.xd - c.val) * (e.xd - c.val)
         |        AS DECIMAL(38,18))) AS d2
         |  FROM sub$s e JOIN c${s}_1 c ON c.i = e.i
         |  GROUP BY e.vec_id, c.cid),
         |code$s AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM dist${s}_1) t WHERE rn = 1),
         |qd$s AS (
         |  SELECT vec_id AS query_id, cid, d2 FROM dist${s}_1
         |  WHERE vec_id % 100 = 0)""".stripMargin
  }

  /** The k-NN vote statement (exact top-5 CTEs + (votes desc, label)
    * argmax), shared by the q_embed_knn oracle and the
    * inter-classifier agreement oracle. */
  private def knnPredSql: String = cosineSql(
    "a.vec_id % 100 = 0", "TRUE", "a.vec_id <> b.vec_id",
    """SELECT p.query_id, q.label, p.predicted FROM (
      |  SELECT v.query_id, v.n_label AS predicted,
      |    ROW_NUMBER() OVER (PARTITION BY v.query_id
      |      ORDER BY v.nv DESC, v.n_label) AS rn
      |  FROM (
      |    SELECT t.query_id, e.label AS n_label, count(*) AS nv
      |    FROM (
      |      SELECT * FROM (
      |        SELECT d.id_a AS query_id, d.id_b AS neighbor_id,
      |          CAST(ROW_NUMBER() OVER (PARTITION BY d.id_a
      |            ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.id_b)
      |            AS INT) AS rank
      |        FROM dots d JOIN norms na ON na.vec_id = d.id_a
      |                    JOIN norms nb ON nb.vec_id = d.id_b) x
      |      WHERE rank <= 5) t
      |    JOIN embeddings e ON e.vec_id = t.neighbor_id
      |    GROUP BY 1, 2) v) p
      |JOIN embeddings q ON q.vec_id = p.query_id
      |WHERE p.rn = 1""".stripMargin,
    "ORDER BY query_id")

  /** The LSH top-k statement (bucketed candidates + exact rerank),
    * shared by the q_ann_lsh oracle and the RRF fusion oracle. */
  private def lshTopKSql: String = cosineSql(
    "a.vec_id % 100 = 0", "TRUE", "a.vec_id <> b.vec_id",
    s"""SELECT * FROM (
       |  SELECT d.id_a AS query_id, d.id_b AS neighbor_id,
       |    round(d.dot / (na.nrm * nb.nrm), 6) AS cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY d.id_a
       |      ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.id_b) AS INT) AS rank
       |  FROM dots d JOIN norms na ON na.vec_id = d.id_a
       |              JOIN norms nb ON nb.vec_id = d.id_b
       |              JOIN ${sigSql(6)} sa ON sa.vec_id = d.id_a
       |              JOIN ${sigSql(6)} sb ON sb.vec_id = d.id_b
       |                AND sa.bucket = sb.bucket) t
       |WHERE rank <= 5""".stripMargin,
    "ORDER BY query_id, rank")

  /** RRF fusion oracle: the IVF and LSH statements run as scoped
    * subqueries, full-outer joined per (query, item), each reciprocal
    * one exact-portable division, re-rank on the UNROUNDED fused
    * score. */
  private def annRrfSql(kc: Int, topK: Int): String = {
    val ivf = ivfSql(nlist = 8, nprobe = 2, iters = 2, k = 5)
    s"""WITH la AS (
       |  SELECT query_id, neighbor_id, rank FROM ($ivf) s),
       |lb AS (
       |  SELECT query_id, neighbor_id, rank FROM ($lshTopKSql) s),
       |f AS (
       |  SELECT coalesce(a.query_id, b.query_id) AS query_id,
       |    coalesce(a.neighbor_id, b.neighbor_id) AS neighbor_id,
       |    coalesce(1.0 / ($kc.0 + CAST(a.rank AS DOUBLE)), 0.0) +
       |    coalesce(1.0 / ($kc.0 + CAST(b.rank AS DOUBLE)), 0.0) AS rrf
       |  FROM la a FULL OUTER JOIN lb b
       |    ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id)
       |SELECT * FROM (
       |  SELECT query_id, neighbor_id, round(rrf, 6) AS rrf,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY rrf DESC, neighbor_id) AS INT) AS rank
       |  FROM f) t
       |WHERE rank <= $topK
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Recall@k audit oracle: the exact brute-force chain and the IVF
    * chain each run as a SCOPED subquery (their private WITH names
    * don't collide), then one (query, neighbor) join scores the
    * overlap. */
  private def annRecallSql: String = {
    val bf = cosineSql("a.vec_id % 100 = 0", "TRUE",
      "a.vec_id <> b.vec_id",
      """SELECT * FROM (
        |  SELECT d.id_a AS query_id, d.id_b AS neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY d.id_a
        |      ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.id_b) AS rank
        |  FROM dots d JOIN norms na ON na.vec_id = d.id_a
        |              JOIN norms nb ON nb.vec_id = d.id_b) t
        |WHERE rank <= 5""".stripMargin, "")
    val ivf = ivfSql(nlist = 8, nprobe = 2, iters = 2, k = 5)
    s"""WITH exact AS (
       |  SELECT query_id, neighbor_id FROM ($bf) s),
       |approx AS (
       |  SELECT query_id, neighbor_id FROM ($ivf) s),
       |j AS (
       |  SELECT e.query_id, count(*) AS ke,
       |    sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |      AS hits
       |  FROM exact e LEFT JOIN approx a
       |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
       |  GROUP BY 1)
       |SELECT query_id, CAST(ke AS BIGINT) AS k_exact,
       |  CAST(hits AS BIGINT) AS hits,
       |  round(CAST(hits AS DOUBLE) / CAST(ke AS DOUBLE), 6) AS recall
       |FROM j ORDER BY query_id""".stripMargin
  }

  /** Shared ADC tail: ranked `rank <= k` projection over an `adc` CTE of
    * (query_id, neighbor_id, d2) rows. */
  private def adcTopKSql(k: Int): String =
    s"""SELECT * FROM (
       |  SELECT query_id, neighbor_id,
       |    CAST(round(d2, 6) AS DOUBLE) AS adc_d2,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY d2, neighbor_id) AS INT) AS rank
       |  FROM adc) t
       |WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  private def pqSql(m: Int, subDim: Int, codebookSize: Int, k: Int): String = {
    val codeJoins = (1 until m)
      .map(s => s"JOIN code$s a$s ON a$s.vec_id = a0.vec_id").mkString("\n")
    val qdJoins = (0 until m).map(s =>
      s"JOIN qd$s q$s ON q$s.cid = a$s.cid" +
        (if (s == 0) "" else " AND q$s.query_id = q0.query_id")
          .replace("$s", s.toString)).mkString("\n")
    val adcSum = (0 until m).map(s => s"q$s.d2").mkString(" + ")
    s"""WITH ex AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         unnest(embedding) AS x
       |  FROM embeddings),
       |exd AS (SELECT vec_id, i, CAST(x AS DOUBLE) AS xd FROM ex),
       |${(0 until m).map(pqSubspaceCtes(_, subDim, codebookSize)).mkString(",\n")},
       |adc AS (
       |  SELECT q0.query_id, a0.vec_id AS neighbor_id,
       |    $adcSum AS d2
       |  FROM code0 a0
       |$codeJoins
       |$qdJoins
       |  WHERE a0.vec_id <> q0.query_id)
       |${adcTopKSql(k)}""".stripMargin
  }

  /** IVF+PQ oracle: the coarse k-means chain of [[ivfSql]] (cell
    * assignments asg$coarseIters + per-query probes from
    * dist$coarseIters) composed with the per-subspace PQ chain of
    * [[pqSql]] — candidates are the probed cells' members only, ranked
    * by the same exact-decimal ADC sums. CTE namespaces don't collide:
    * coarse uses c0/dist0/asg0…, subspaces use c0_0/dist0_0/code0/qd0. */
  private def ivfpqSql(nlist: Int, nprobe: Int, coarseIters: Int, m: Int,
      subDim: Int, codebookSize: Int, k: Int, trainMod: Int): String = {
    val codeJoins = (0 until m)
      .map(s => s"JOIN code$s a$s ON a$s.vec_id = c.neighbor_id").mkString("\n")
    val qdJoins = (0 until m).map(s =>
      s"JOIN qd$s q$s ON q$s.query_id = c.query_id AND q$s.cid = a$s.cid")
      .mkString("\n")
    val adcSum = (0 until m).map(s => s"q$s.d2").mkString(" + ")
    s"""WITH ex AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         unnest(embedding) AS x
       |  FROM embeddings),
       |exd AS (SELECT vec_id, i, CAST(x AS DOUBLE) AS xd FROM ex),
       |${coarseKmeansCtes(nlist, coarseIters, trainMod)},
       |${(0 until m).map(pqSubspaceCtes(_, subDim, codebookSize)).mkString(",\n")},
       |probes AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
       |    FROM dist$coarseIters WHERE vec_id % 100 = 0) t
       |  WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN asg$coarseIters a ON a.cid = p.cid
       |  WHERE a.vec_id <> p.query_id),
       |adc AS (
       |  SELECT c.query_id, c.neighbor_id, $adcSum AS d2
       |  FROM cand c
       |$codeJoins
       |$qdJoins)
       |${adcTopKSql(k)}""".stripMargin
  }

  /** DuckDB mirror of TextAnalysis.tokenKlDrift: the SAME exact-integer
    * counts and the SAME ln ratio of four exact-double factors (each
    * count < 2^53 casts exactly; multiply/divide are correctly-rounded
    * IEEE ops, bit-identical across engines); per-group sums in
    * DECIMAL(38,18). `maxVocab` mirrors the operator's top-V cap
    * (frequency desc, token asc tie-break). */
  private def klDriftSql(maxVocab: Option[Int]): String = {
    val toksCte = maxVocab match {
      case Some(v) =>
        s"""keep AS (
           |  SELECT t FROM (
           |    SELECT t, count(*) AS kc FROM toks0 GROUP BY 1
           |    ORDER BY kc DESC, t LIMIT $v)),
           |toks AS (
           |  SELECT source, t FROM toks0
           |  WHERE t IN (SELECT t FROM keep)),""".stripMargin
      case None => "toks AS (SELECT source, t FROM toks0),"
    }
    s"""WITH toks0 AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS t
       |  FROM documents),
       |$toksCte
       |gt AS (SELECT source, t, count(*) AS cgt FROM toks GROUP BY 1, 2),
       |g AS (SELECT source, count(*) AS ng FROM toks GROUP BY 1),
       |tv AS (SELECT t, count(*) AS ct FROM toks GROUP BY 1),
       |tot AS (SELECT count(*) AS n, count(DISTINCT t) AS v FROM toks),
       |grid AS (
       |  SELECT g.source, tv.t, g.ng, tv.ct, tot.n, tot.v,
       |    COALESCE(gt.cgt, 0) AS cgt
       |  FROM g CROSS JOIN tv CROSS JOIN tot
       |  LEFT JOIN gt ON gt.source = g.source AND gt.t = tv.t),
       |terms AS (
       |  SELECT source, ng,
       |    CAST((CAST(cgt AS DOUBLE) + 1.0)
       |           / (CAST(ng AS DOUBLE) + CAST(v AS DOUBLE))
       |         * ln(((CAST(cgt AS DOUBLE) + 1.0)
       |                * (CAST(n AS DOUBLE) + CAST(v AS DOUBLE)))
       |              / ((CAST(ng AS DOUBLE) + CAST(v AS DOUBLE))
       |                 * (CAST(ct AS DOUBLE) + 1.0)))
       |      AS DECIMAL(38,18)) AS kl_term
       |  FROM grid)
       |SELECT source, max(ng) AS n_tokens,
       |  round(CAST(sum(kl_term) AS DOUBLE), 6) AS kl
       |FROM terms GROUP BY source ORDER BY source""".stripMargin
  }

  /** Query-term bag shared by the q_text_bm25 operator call AND its
    * generated oracle — one definition, no drift. */
  private val bm25Terms = Seq("join", "scan", "merge")

  /** Merge budget shared by the q_text_bpe operator call and its
    * generated oracle — one definition, no drift. */
  private val bpeNumMerges = 20

  /** DuckDB mirror of Bpe.train + Bpe.tokenCount: the merge loop
    * unrolls into `numMerges` CTE steps — pair counts over the current
    * segmentation, the (count desc, p1 asc, p2 asc) argmax, one literal
    * replace (DuckDB's `replace` shares Spark/Java's leftmost
    * non-overlapping resume-in-source semantics, the operator's pinned
    * convention) — and per-doc counts come from joining doc words onto
    * the trained lexicon (equivalent to the operator's map-side replay:
    * applying the same merges to the same word is deterministic). The
    * vocab CTEs are MATERIALIZED: each is referenced twice (pair counts
    * + the next step), and inlining would go exponential in the step
    * count.
    *
    * The BPE training chain as CTE text: word counts over `src` (any
    * CTE/table with a `text` column) → `numMerges` unrolled merge
    * steps → `lex` (word → trained symbol count). Shared by
    * [[bpeSql]] and EnginePack's project-surface BPE mix oracle. */
  private[packs] def bpeLexCtes(src: String, numMerges: Int): String = {
    // the top-1M (cnt DESC, w ASC) truncation mirrors Bpe.train's
    // DefaultMaxWords driver-state cap — a no-op on bench-sized
    // vocabularies, but keeping the oracle word table EXACTLY the
    // trainer's word table at any corpus size (DuckDB and Spark both
    // compare strings by UTF-8 bytes, so the tie-break agrees too)
    val head = s"""words AS (
      |  SELECT w, cnt FROM (
      |    SELECT w, count(*) AS cnt FROM (
      |      SELECT unnest(string_split(text, ' ')) AS w
      |      FROM $src WHERE text IS NOT NULL)
      |    WHERE w <> '' GROUP BY 1)
      |  ORDER BY cnt DESC, w LIMIT ${graft.ops.Bpe.DefaultMaxWords}),
      |vocab0 AS MATERIALIZED (
      |  SELECT w, cnt, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS syms
      |  FROM words)""".stripMargin
    val steps = (0 until numMerges).map { i =>
      s"""pairs$i AS (
         |  SELECT p[1] AS p1, p[2] AS p2, sum(cnt) AS c FROM (
         |    SELECT cnt,
         |      unnest(list_transform(range(1, len(s)), j -> [s[j], s[j+1]])) AS p
         |    FROM (SELECT cnt, string_split(trim(syms), ' ') AS s FROM vocab$i))
         |  GROUP BY 1, 2),
         |best$i AS (SELECT p1, p2 FROM pairs$i ORDER BY c DESC, p1, p2 LIMIT 1),
         |vocab${i + 1} AS MATERIALIZED (
         |  SELECT v.w, v.cnt,
         |    replace(v.syms, ' ' || b.p1 || ' ' || b.p2 || ' ',
         |                    ' ' || b.p1 || b.p2 || ' ') AS syms
         |  FROM vocab$i v CROSS JOIN best$i b)""".stripMargin
    }
    s"""$head,
       |${steps.mkString(",\n")},
       |lex AS (
       |  SELECT w, len(string_split(trim(syms), ' ')) AS n_syms
       |  FROM vocab$numMerges)""".stripMargin
  }

  /** Feature names / iteration budget shared by the classifier
    * queries and their generated oracles. */
  private val classifyX = Seq("x1", "x2", "x3", "x4")
  // 8 standardized-GD iterations at lr 0.5 separate the bench labels
  // (scores straddle 0.5 from iteration ~8; see Classify.train scaladoc)
  private val classifyIters = 8
  private val classifyLr = 0.5
  /** lr as the SQL literal — 0.5 is exactly representable, so the
    * parsed double is bit-identical in both engines. */
  private val classifyLrSql = "0.5"

  /** DuckDB mirror of Classify.gateFeatures + Classify.train: the
    * feature CTE reuses the proven q_text_quality formula text (plus
    * the Gopher rule conjunction as the label); a one-pass moments CTE
    * re-derives the base-rate bias init (the fast-logit pinned tree)
    * and the per-feature μ/σ standardization (σ = one correctly-
    * rounded sqrt, variance ≤ 0 pinned to 1); each GD iteration
    * unrolls into (z join, decimal gradient sums, weight update) CTEs
    * over the STANDARDIZED features — the same pinned expression trees
    * the Spark side evaluates: fast sigmoid 0.5 + z/(2·(1+|z|)) (exact
    * IEEE, no libm), DECIMAL(38,18) gradient sums, one decimal→double
    * conversion per weight per step — and the final weights fold back
    * to raw space through the identical left-associated chain, so
    * `scoredz` scores raw features exactly as every Spark caller does.
    * `cfeat` and the gradient CTEs are MATERIALIZED (multi-referenced;
    * inlining goes exponential in iters). */
  private def logisticCtes(iters: Int): String =
    logisticCtes(iters, trainPred = "TRUE")

  /** `trainPred` narrows the TRAINING population (moments, bias init,
    * standardization, every GD pass) to a doc_id slice while `scoredz`
    * still scores EVERY doc — the frozen-model shape: run 1 trains on
    * the slice and persists, run 2 scores the full corpus under the
    * persisted weights (EnginePack's q_engine_frozen_classifier). */
  private[packs] def logisticCtes(iters: Int, trainPred: String): String = {
    val punct = "length(replace(replace(replace(replace(replace(replace(" +
      "b.text,'.',''),',',''),'!',''),'?',''),';',''),':',''))"
    val head = s"""${gopherCtes("text IS NOT NULL")},
      |cfeat AS MATERIALIZED (
      |  SELECT f.doc_id, b.source,
      |    CAST(f.n_tokens AS DOUBLE) / 100.0 AS x1,
      |    (CASE WHEN f.n_tokens > 0
      |          THEN (f.n_chars - (f.n_tokens - 1)) * 1.0 / f.n_tokens
      |          ELSE 0.0 END) / 10.0 AS x2,
      |    CASE WHEN f.n_tokens > 0 THEN f.sw * 1.0 / f.n_tokens
      |         ELSE 0.0 END AS x3,
      |    CASE WHEN f.n_chars > 0 THEN (f.n_chars - $punct) * 1.0 / f.n_chars
      |         ELSE 0.0 END AS x4,
      |    CASE WHEN r.r_min_tokens AND r.r_max_tokens AND r.r_word_len
      |          AND r.r_stopwords AND r.r_dup_words AND r.r_top_bigram
      |         THEN 1.0 ELSE 0.0 END AS y
      |  FROM feat f JOIN base b USING (doc_id) JOIN rules r USING (doc_id)),
      |mom AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
      |    ${(1 to 4).map(j =>
                s"CAST(sum(CAST(x$j AS DECIMAL(38,18))) AS DOUBLE) AS s$j, " +
                s"CAST(sum(CAST(x$j * x$j AS DECIMAL(38,18))) AS DOUBLE) AS q$j")
                .mkString(",\n      |    ")}
      |  FROM cfeat WHERE $trainPred),
      |clfstats AS MATERIALIZED (
      |  SELECT sy / n AS p,
      |    ${(1 to 4).map(j =>
                s"s$j / n AS mu$j,\n      |    " +
                s"CASE WHEN (q$j / n) - (s$j / n) * (s$j / n) <= 0.0 THEN 1.0 " +
                s"ELSE sqrt((q$j / n) - (s$j / n) * (s$j / n)) END AS sd$j")
                .mkString(",\n      |    ")}
      |  FROM mom),
      |sfeat AS MATERIALIZED (
      |  SELECT c.doc_id, c.source,
      |    (c.x1 - s.mu1) / s.sd1 AS x1, (c.x2 - s.mu2) / s.sd2 AS x2,
      |    (c.x3 - s.mu3) / s.sd3 AS x3, (c.x4 - s.mu4) / s.sd4 AS x4,
      |    c.y
      |  FROM cfeat c CROSS JOIN clfstats s WHERE $trainPred),
      |w0 AS (
      |  SELECT CASE WHEN p <= 0.0 OR p >= 1.0 THEN CAST(0.0 AS DOUBLE)
      |    ELSE (2.0 * (p - 0.5)) / (1.0 - 2.0 * abs(p - 0.5)) END AS b,
      |    CAST(0.0 AS DOUBLE) AS w1, CAST(0.0 AS DOUBLE) AS w2,
      |    CAST(0.0 AS DOUBLE) AS w3, CAST(0.0 AS DOUBLE) AS w4
      |  FROM clfstats)""".stripMargin
    val sig = "(0.5 + z / (2.0 * (1.0 + abs(z))) - y)"
    val lr = classifyLrSql
    val steps = (0 until iters).map { i =>
      s"""z$i AS (
         |  SELECT c.*, $zExprSql AS z
         |  FROM sfeat c CROSS JOIN w$i w),
         |g$i AS MATERIALIZED (
         |  SELECT CAST(count(*) AS DOUBLE) AS n,
         |    sum(CAST($sig AS DECIMAL(38,18))) AS s0,
         |    sum(CAST($sig * x1 AS DECIMAL(38,18))) AS s1,
         |    sum(CAST($sig * x2 AS DECIMAL(38,18))) AS s2,
         |    sum(CAST($sig * x3 AS DECIMAL(38,18))) AS s3,
         |    sum(CAST($sig * x4 AS DECIMAL(38,18))) AS s4
         |  FROM z$i),
         |w${i + 1} AS (
         |  SELECT w.b - $lr * (CAST(g.s0 AS DOUBLE) / g.n) AS b,
         |    w.w1 - $lr * (CAST(g.s1 AS DOUBLE) / g.n) AS w1,
         |    w.w2 - $lr * (CAST(g.s2 AS DOUBLE) / g.n) AS w2,
         |    w.w3 - $lr * (CAST(g.s3 AS DOUBLE) / g.n) AS w3,
         |    w.w4 - $lr * (CAST(g.s4 AS DOUBLE) / g.n) AS w4
         |  FROM w$i w CROSS JOIN g$i g)""".stripMargin
    }
    s"""$head,
       |${steps.mkString(",\n")},
       |wf AS (
       |  SELECT w.b - (w.w1 / s.sd1) * s.mu1 - (w.w2 / s.sd2) * s.mu2
       |      - (w.w3 / s.sd3) * s.mu3 - (w.w4 / s.sd4) * s.mu4 AS b,
       |    w.w1 / s.sd1 AS w1, w.w2 / s.sd2 AS w2,
       |    w.w3 / s.sd3 AS w3, w.w4 / s.sd4 AS w4
       |  FROM w$iters w CROSS JOIN clfstats s),
       |scoredz AS (
       |  SELECT c.*, $zExprSql AS z
       |  FROM cfeat c CROSS JOIN wf w)""".stripMargin
  }

  /** The pinned left-associated linear score (SQL + is left-assoc,
    * like the Column fold in Classify.z). */
  private val zExprSql =
    "w.b + w.w1 * c.x1 + w.w2 * c.x2 + w.w3 * c.x3 + w.w4 * c.x4"

  /** Survivor counts after thresholding the trained fast-sigmoid score
    * — the oracle for the `quality_classifier_filter` pipeline step
    * run from a project fixture (EnginePack). The comparison is on the
    * UNROUNDED score: every factor is an exact-portable double, so the
    * threshold decision is deterministic across engines. */
  private[packs] def classifySurvivorsSql(threshold: String,
      trainPred: String = "TRUE"): String =
    s"""WITH ${logisticCtes(classifyIters, trainPred)}
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |FROM scoredz
       |WHERE 0.5 + z / (2.0 * (1.0 + abs(z))) >= $threshold
       |GROUP BY source ORDER BY source""".stripMargin

  private def classifyGateSql(iters: Int): String =
    s"""WITH ${logisticCtes(iters)}
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |  CAST(sum(CASE WHEN z >= 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_pred_keep,
       |  CAST(sum(CASE WHEN (z >= 0) = (y = 1.0) THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_agree
       |FROM scoredz GROUP BY source ORDER BY source""".stripMargin

  private def classifyScoresSql(iters: Int): String =
    s"""WITH ${logisticCtes(iters)}
       |SELECT doc_id,
       |  round(0.5 + z / (2.0 * (1.0 + abs(z))), 6) AS score,
       |  z >= 0 AS pred
       |FROM scoredz WHERE doc_id % 23 = 0 ORDER BY doc_id""".stripMargin

  /** Calibration bins over the trained scorer: floor of an
    * exact-portable double product (CAST(floor AS INT) — DuckDB's bare
    * double→int cast ROUNDS), score 1.0 clamped into the top bin,
    * mean score summed in DECIMAL(38,18). */
  private def classifyCalibrationSql(iters: Int, bins: Int): String =
    s"""WITH ${logisticCtes(iters)},
       |binned AS (
       |  SELECT LEAST(CAST(floor((0.5 + z / (2.0 * (1.0 + abs(z)))) * $bins)
       |      AS INT), ${bins - 1}) AS bin,
       |    0.5 + z / (2.0 * (1.0 + abs(z))) AS s, y
       |  FROM scoredz)
       |SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  round(CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE), 6) AS pos_rate,
       |  round(CAST(sum(CAST(s AS DECIMAL(38,18))) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE), 6) AS mean_score
       |FROM binned GROUP BY bin ORDER BY bin""".stripMargin

  /** Threshold sweep over scoredz: the grid is a literal VALUES list
    * (cast to DOUBLE — a bare numeric literal would type the column
    * DECIMAL and hash-mismatch), decisions on the UNROUNDED score. */
  private def classifyPrCurveSql(iters: Int,
      thresholds: Seq[Double]): String = {
    val vals = thresholds.map(t => s"($t)").mkString(", ")
    s"""WITH ${logisticCtes(iters)},
       |th AS (SELECT CAST(v AS DOUBLE) AS threshold
       |       FROM (VALUES $vals) t(v)),
       |g AS (
       |  SELECT th.threshold,
       |    sum(CASE WHEN 0.5 + z / (2.0 * (1.0 + abs(z))) >= th.threshold
       |        THEN 1 ELSE 0 END) AS npp,
       |    sum(CASE WHEN 0.5 + z / (2.0 * (1.0 + abs(z))) >= th.threshold
       |        AND y = 1.0 THEN 1 ELSE 0 END) AS tp,
       |    sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS pos
       |  FROM scoredz CROSS JOIN th GROUP BY 1)
       |SELECT threshold, CAST(npp AS BIGINT) AS n_pred_pos,
       |  CAST(tp AS BIGINT) AS tp,
       |  CASE WHEN npp > 0 THEN
       |    round(CAST(tp AS DOUBLE) / CAST(npp AS DOUBLE), 6)
       |  END AS "precision",
       |  CASE WHEN pos > 0 THEN
       |    round(CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE), 6)
       |  END AS recall,
       |  CASE WHEN 2 * tp + (npp - tp) + (pos - tp) > 0 THEN
       |    round(CAST(2 * tp AS DOUBLE) /
       |      CAST(2 * tp + (npp - tp) + (pos - tp) AS DOUBLE), 6)
       |  END AS f1
       |FROM g ORDER BY threshold""".stripMargin
  }

  private def bpeSql(numMerges: Int): String = {
    s"""WITH ${bpeLexCtes("documents", numMerges)},
       |docw AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |counted AS (
       |  SELECT d.doc_id, count(*) AS n_words, sum(l.n_syms) AS n_bpe
       |  FROM docw d JOIN lex l ON d.w = l.w
       |  WHERE d.w <> '' GROUP BY 1)
       |SELECT b.doc_id, CAST(COALESCE(c.n_words, 0) AS INT) AS n_words,
       |  CAST(COALESCE(c.n_bpe, 0) AS INT) AS n_bpe
       |FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) b
       |LEFT JOIN counted c ON b.doc_id = c.doc_id
       |ORDER BY b.doc_id""".stripMargin
  }

  /** DuckDB mirror of TextAnalysis.bm25: the SAME IEEE double-op tree
    * (casts, parenthesization, literal constants, left-assoc term sum)
    * over exact-integer tf/df/dl, one `ln` per term (JVM↔DuckDB libm
    * agree to ≤1 ulp on the idf input family; round(6) absorbs it). */
  private def bm25Sql(terms: Seq[String], topK: Int): String = {
    val tfDefs = terms.indices.map(i =>
      s"    len(list_filter(w, x -> x = '${terms(i)}')) AS tf$i")
      .mkString(",\n")
    val dfDefs = terms.indices.map(i =>
      s"    sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i")
      .mkString(",\n")
    val termScores = terms.indices.map { i =>
      s"""ln((CAST(c.n AS DOUBLE) - CAST(c.df$i AS DOUBLE) + 0.5) / (CAST(c.df$i AS DOUBLE) + 0.5) + 1.0)
         |     * (CAST(s.tf$i AS DOUBLE) * 2.2)
         |     / (CAST(s.tf$i AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(s.dl AS DOUBLE) / (CAST(c.s AS DOUBLE) / CAST(c.n AS DOUBLE)))))""".stripMargin
    }.mkString("\n   + ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w
       |  FROM documents WHERE text IS NOT NULL),
       |stats AS (
       |  SELECT doc_id, len(w) AS dl,
       |$tfDefs
       |  FROM toks),
       |corpus AS (
       |  SELECT count(*) AS n, sum(dl) AS s,
       |$dfDefs
       |  FROM stats),
       |scored AS (
       |  SELECT s.doc_id,
       |   $termScores AS score
       |  FROM stats s CROSS JOIN corpus c)
       |SELECT doc_id, round(score, 6) AS bm25,
       |  CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
       |FROM scored
       |QUALIFY rank <= $topK
       |ORDER BY doc_id""".stripMargin
  }

  /** The Gopher-rule CTE chain (base → feat → stats → tops → rules) over
    * `documents WHERE pred` — shared between the per-rule audit oracle
    * and the composed curation-pipeline oracle so both pin the same
    * rule text. `base` carries `source` for downstream stages. */
  private[packs] def gopherCtes(pred: String): String = {
    val stop = TextAnalysis.markers("en").map(w => s"'$w'").mkString(", ")
    s"""base AS (
       |  SELECT doc_id, source, text, trim(text) AS t
       |  FROM documents WHERE $pred),
       |feat AS (
       |  SELECT doc_id, length(text) AS n_chars,
       |    CASE WHEN length(t) = 0 THEN 0
       |         ELSE len(string_split_regex(t, ' +')) END AS n_tokens,
       |    len(list_filter(string_split(lower(text), ' '),
       |        x -> x IN (STOPLIST))) AS sw,
       |    CASE WHEN length(t) = 0 THEN []::VARCHAR[]
       |         ELSE string_split_regex(t, ' +') END AS w
       |  FROM base),
       |stats AS (
       |  SELECT doc_id, n_chars, n_tokens, sw,
       |    len(w) AS n_words, len(list_distinct(w)) AS n_distinct_words,
       |    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS bgs
       |  FROM feat),
       |tops AS (
       |  SELECT s.doc_id, COALESCE(MAX(b.cnt), 0) AS top_bigram_count
       |  FROM stats s LEFT JOIN (
       |    SELECT doc_id, bg, count(*) AS cnt
       |    FROM (SELECT doc_id, unnest(bgs) AS bg FROM stats)
       |    GROUP BY 1, 2) b ON s.doc_id = b.doc_id
       |  GROUP BY 1),
       |rules AS (
       |  SELECT s.doc_id, CAST(s.n_tokens AS INT) AS n_tokens,
       |    s.n_tokens >= 8 AS r_min_tokens,
       |    s.n_tokens <= 5000 AS r_max_tokens,
       |    (s.n_tokens > 0 AND s.n_tokens <= (s.n_chars - (s.n_tokens - 1))
       |     AND (s.n_chars - (s.n_tokens - 1)) <= 12 * s.n_tokens)
       |      AS r_word_len,
       |    s.sw >= 2 AS r_stopwords,
       |    2 * (s.n_words - s.n_distinct_words) <= s.n_words AS r_dup_words,
       |    (s.n_words <= 1 OR 5 * t.top_bigram_count <= s.n_words - 1)
       |      AS r_top_bigram
       |  FROM stats s JOIN tops t ON s.doc_id = t.doc_id)""".stripMargin
      .replace("STOPLIST", stop)
  }

  def oracles: Map[String, String] = Map(
    "q_ann_ivf" -> ivfSql(nlist = 8, nprobe = 2, iters = 2, k = 5),
    "q_ann_recall" -> annRecallSql,
    "q_ann_rrf" -> annRrfSql(kc = 60, topK = 5),
    "q_ann_pq" -> pqSql(m = 4, subDim = 16, codebookSize = 16, k = 5),
    "q_ann_ivfpq" -> ivfpqSql(nlist = 8, nprobe = 2, coarseIters = 1,
      m = 4, subDim = 16, codebookSize = 16, k = 5, trainMod = 4),
    "q_text_bm25" -> bm25Sql(bm25Terms, topK = 20),

    // corpus-trained BPE: the oracle re-learns the merge table from
    // scratch (unrolled CTE steps), so training AND counting are both
    // independently verified
    "q_text_bpe" -> bpeSql(bpeNumMerges),

    // bigram-space marginals, four-ln left-associated PMI, rounded cut
    "q_text_collocations" ->
      """WITH pairs AS MATERIALIZED (
        |  SELECT w[i] AS w1, w[i + 1] AS w2
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents) t
        |  CROSS JOIN LATERAL (SELECT unnest(range(1, len(w))) AS i) r),
        |big AS (
        |  SELECT w1, w2, count(*) AS n_pair FROM pairs
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |c1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1),
        |c2 AS (SELECT w2, count(*) AS c2 FROM pairs GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM pairs)
        |SELECT b.w1, b.w2, b.n_pair,
        |  round(ln(CAST(b.n_pair AS DOUBLE)) + ln(CAST(n.n AS DOUBLE))
        |    - ln(CAST(c1.c1 AS DOUBLE)) - ln(CAST(c2.c2 AS DOUBLE)), 6)
        |    AS pmi
        |FROM big b
        |JOIN c1 ON c1.w1 = b.w1
        |JOIN c2 ON c2.w2 = b.w2
        |CROSS JOIN n
        |ORDER BY pmi DESC, b.w1, b.w2 LIMIT 50""".stripMargin,

    // vocabulary coverage: per-occurrence piece counts from the
    // re-learned lexicon's n_syms (Spark replays merges map-side;
    // identical segmentations either way)
    "q_text_bpe_coverage" ->
      s"""WITH ${bpeLexCtes("documents", bpeNumMerges)},
         |occ AS (
         |  SELECT source, w FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS w
         |    FROM documents WHERE text IS NOT NULL)
         |  WHERE w <> '')
         |SELECT o.source, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(CASE WHEN l.n_syms = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_whole,
         |  CAST(sum(l.n_syms) AS BIGINT) AS n_pieces
         |FROM occ o JOIN lex l ON l.w = o.w
         |GROUP BY 1 ORDER BY o.source""".stripMargin,

    // distilled gate classifier: confusion counts + per-doc scores,
    // weights re-learned by the oracle's own unrolled GD chain
    "q_classify_gate" -> classifyGateSql(classifyIters),
    "q_classify_scores" -> classifyScoresSql(classifyIters),
    "q_classify_calibration" ->
      classifyCalibrationSql(classifyIters, bins = 100),
    "q_classify_pr_curve" -> classifyPrCurveSql(classifyIters,
      Seq(0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8)),

    // the trained lexicon's piece strings, straight from the final
    // vocab CTE of the re-learned chain
    "q_text_bpe_lexicon" ->
      s"""WITH ${bpeLexCtes("documents", bpeNumMerges)}
         |SELECT w AS word, trim(syms) AS pieces FROM vocab$bpeNumMerges
         |ORDER BY w""".stripMargin,

    // KL drift: exact-integer counts, ln of a four-exact-double-factor
    // ratio (no integer-product overflow at any corpus size),
    // DECIMAL(38,18) order-independent group sums
    "q_text_kl_drift" -> klDriftSql(maxVocab = None),
    // same contract over the 100 globally most frequent tokens only
    // (frequency desc, token asc tie-break) — the bounded-grid variant
    "q_text_kl_drift_capped" -> klDriftSql(maxVocab = Some(100)),

    // bigram LM surprise: counts are exact integers, each bigram's ln is
    // over an exact rational, and the per-doc sum runs in DECIMAL(38,18)
    // (order-independent — a double sum over a join would never match)
    "q_text_lm_surprise" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |pairs AS (
        |  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        |  FROM toks
        |  CROSS JOIN LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
        |uni AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1),
        |vocab AS (SELECT count(DISTINCT w1) AS v FROM pairs),
        |scored AS (
        |  SELECT p.doc_id,
        |    CAST(ln((CAST(u.c1 AS DOUBLE) + CAST(vb.v AS DOUBLE))
        |             / (CAST(b.c12 AS DOUBLE) + 1.0)) AS DECIMAL(38,18)) AS s
        |  FROM pairs p
        |  JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
        |  JOIN uni u ON u.w1 = p.w1
        |  CROSS JOIN vocab vb)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS surprise
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // frozen bigram LM: counts from the doc_id % 3 != 0 slice only,
    // every doc scored under them — LEFT joins + COALESCE(…, 0) are the
    // smoothed-OOV extension; on the training slice every join hits, so
    // those rows are the inline trainer bit-for-bit
    "q_text_lm_frozen" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |pairs AS (
        |  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        |  FROM toks
        |  CROSS JOIN LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
        |train AS (SELECT * FROM pairs WHERE doc_id % 3 <> 0),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM train GROUP BY 1, 2),
        |uni AS (SELECT w1, count(*) AS c1 FROM train GROUP BY 1),
        |vocab AS (SELECT count(DISTINCT w1) AS v FROM train),
        |scored AS (
        |  SELECT p.doc_id,
        |    CAST(ln((CAST(COALESCE(u.c1, 0) AS DOUBLE) + CAST(vb.v AS DOUBLE))
        |             / (CAST(COALESCE(b.c12, 0) AS DOUBLE) + 1.0))
        |      AS DECIMAL(38,18)) AS s
        |  FROM pairs p
        |  LEFT JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
        |  LEFT JOIN uni u ON u.w1 = p.w1
        |  CROSS JOIN vocab vb)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS surprise
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents)
        |SELECT min(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM corpus GROUP BY text ORDER BY doc_id""".stripMargin,

    "q_dedup_minhash" -> jaccardPairsSql,
    "q_dedup_ngram" -> jaccardPairsSql,

    // the full exact-Jaccard pair set MINUS the settled old×old pairs —
    // exactly what the incremental operator must reproduce
    "q_dedup_incremental" ->
      s"""WITH $shingleCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(len(list_intersect(a.s, b.s)) * 1.0 /
         |        len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE (a.doc_id % 3 = 0 OR b.doc_id % 3 = 0)
         |  AND len(list_intersect(a.s, b.s)) * 1.0 /
         |      len(list_distinct(list_concat(a.s, b.s))) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_containment" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000,
        |    'prefix words before the quoted body ' || text ||
        |    ' and trailing commentary after the quote'
        |  FROM documents WHERE doc_id % 41 = 0),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(len(string_split(text, ' ')) - 2),
        |    i -> array_to_string(list_slice(string_split(text, ' '), i + 1, i + 3), ' '))) AS s
        |  FROM corpus
        |  WHERE len(string_split(text, ' ')) >= 3)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_intersect(a.s, b.s)) * 1.0 /
        |        least(len(a.s), len(b.s)), 6) AS containment
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.s, b.s)) * 1.0 /
        |      least(len(a.s), len(b.s)) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_components" ->
      s"""WITH RECURSIVE $ccCtes
         |SELECT id, component_id FROM cc ORDER BY id""".stripMargin,

    "q_dedup_sizes" ->
      s"""WITH RECURSIVE $ccCtes,
         |sizes AS (SELECT component_id, count(*) AS n FROM cc GROUP BY 1)
         |SELECT CAST(n AS BIGINT) AS size,
         |  CAST(count(*) AS BIGINT) AS n_clusters
         |FROM sizes GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dedup_canonical" ->
      s"""WITH RECURSIVE $ccCtes,
         |sizes AS (SELECT component_id, count(*) AS n FROM cc GROUP BY 1)
         |SELECT d.doc_id, COALESCE(s.n, CAST(1 AS BIGINT)) AS n_dups
         |FROM documents d
         |LEFT JOIN cc ON cc.id = d.doc_id
         |LEFT JOIN sizes s ON s.component_id = d.doc_id
         |WHERE cc.id IS NULL OR cc.id = cc.component_id
         |ORDER BY doc_id""".stripMargin,

    "q_dedup_best" ->
      s"""WITH RECURSIVE $ccCtes,
         |ranked AS (
         |  SELECT cc.component_id, d.doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY cc.component_id
         |      ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
         |  FROM cc JOIN documents d ON d.doc_id = cc.id),
         |keepers AS (SELECT component_id, doc_id FROM ranked WHERE rn = 1),
         |sizes AS (SELECT component_id, count(*) AS n FROM cc GROUP BY 1)
         |SELECT d.doc_id, d.n_chars, COALESCE(s.n, CAST(1 AS BIGINT)) AS n_dups
         |FROM documents d
         |LEFT JOIN cc ON cc.id = d.doc_id
         |LEFT JOIN keepers k ON k.doc_id = d.doc_id
         |LEFT JOIN sizes s ON s.component_id = k.component_id
         |WHERE cc.id IS NULL OR k.doc_id IS NOT NULL
         |ORDER BY d.doc_id""".stripMargin,

    "q_dedup_simhash" ->
      s"""WITH $simhashChunkCtes
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1)) +
        |       bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) AS INT) AS hamming
        |FROM chunks a JOIN chunks b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1)) +
        |      bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_semantic" -> semdedupSql(nlist = 8, iters = 2,
      threshold = 0.4),

    // banding mirrored exactly: candidates = pairs colliding on any
    // (band, sig) bucket; only those are cosine-verified, so a true
    // near-dup the bands miss is (correctly) absent from both engines
    "q_dedup_embedding_lsh" ->
      s"""WITH ${bandSigCte("bsig", 16, 8)},
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bsig a JOIN bsig b
         |    ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
         |ex AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         |         unnest(embedding) AS x
         |  FROM embeddings),
         |dots AS (
         |  SELECT c.id_a, c.id_b,
         |    CAST(SUM(CAST(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS dot
         |  FROM cand c
         |  JOIN ex a ON a.vec_id = c.id_a
         |  JOIN ex b ON b.vec_id = c.id_b AND a.i = b.i
         |  GROUP BY c.id_a, c.id_b),
         |norms AS (
         |  SELECT vec_id,
         |    sqrt(CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
         |  FROM ex GROUP BY vec_id)
         |SELECT d.id_a, d.id_b, round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
         |FROM dots d JOIN norms na ON na.vec_id = d.id_a
         |            JOIN norms nb ON nb.vec_id = d.id_b
         |WHERE d.dot / (na.nrm * nb.nrm) >= 0.45
         |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_embedding" -> cosineSql(
      "TRUE", "TRUE", "a.vec_id < b.vec_id",
      """SELECT d.id_a, d.id_b, round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
        |FROM dots d JOIN norms na ON na.vec_id = d.id_a
        |            JOIN norms nb ON nb.vec_id = d.id_b
        |WHERE d.dot / (na.nrm * nb.nrm) >= 0.45""".stripMargin,
      "ORDER BY id_a, id_b"),

    "q_ann_bruteforce" -> cosineSql(
      "a.vec_id % 100 = 0", "TRUE", "a.vec_id <> b.vec_id",
      """SELECT * FROM (
        |  SELECT d.id_a AS query_id, d.id_b AS neighbor_id,
        |    round(d.dot / (na.nrm * nb.nrm), 6) AS cosine,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY d.id_a
        |      ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.id_b) AS INT) AS rank
        |  FROM dots d JOIN norms na ON na.vec_id = d.id_a
        |              JOIN norms nb ON nb.vec_id = d.id_b) t
        |WHERE rank <= 5""".stripMargin,
      "ORDER BY query_id, rank"),

    // k-NN vote over the same exact top-5 CTEs as q_ann_bruteforce,
    // then a (votes desc, label asc) argmax per query
    "q_embed_knn" -> knnPredSql,

    // inter-classifier agreement: the k-NN chain and the centroid
    // chain as scoped subqueries, joined per query, kappa finisher
    "q_classify_agreement" ->
      s"""WITH knn AS (
         |  SELECT query_id, predicted FROM ($knnPredSql) s),
         |cent AS (
         |  SELECT vec_id, predicted FROM (
         |    WITH $confusionCtes
         |    SELECT a.vec_id, l.clab AS predicted
         |    FROM asg a JOIN lab l USING (cid)) s),
         |conf AS (
         |  SELECT k.predicted AS label, c.predicted,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM knn k JOIN cent c ON c.vec_id = k.query_id
         |  GROUP BY 1, 2),
         |$kappaTailSql""".stripMargin,

    // q_ann_lsh: approximate in recall yet fully deterministic — the
    // integer signature math (Similarity.hyperplaneSignature) is
    // reproduced here, so the bucketed result is oracle-checkable.
    "q_ann_lsh" -> lshTopKSql,

    "q_text_langid" ->
      s"""WITH $langPredCtes
         |SELECT predicted AS predicted_lang, COUNT(*) AS n FROM pred
         |GROUP BY predicted_lang ORDER BY predicted_lang""".stripMargin,

    // langid vs the labeled lang column: the full confusion matrix —
    // the per-cell view behind the kappa number
    "q_text_lang_confusion" ->
      s"""WITH $langPredCtes
         |SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n
         |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the same prediction CTE + the shared kappa finisher
    "q_text_lang_kappa" ->
      s"""WITH $langPredCtes,
         |conf AS (
         |  SELECT lang AS label, predicted, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM pred GROUP BY 1, 2),
         |$kappaTailSql""".stripMargin,

    "q_text_quality" -> {
      val stop = TextAnalysis.markers("en").map(w => s"'$w'").mkString(", ")
      """SELECT doc_id,
        |  length(text) AS n_chars_actual,
        |  n_tokens,
        |  CASE WHEN n_tokens > 0
        |       THEN (length(text) - (n_tokens - 1)) * 1.0 / n_tokens ELSE 0.0 END AS mean_word_len,
        |  CASE WHEN n_tokens > 0 THEN sw * 1.0 / n_tokens ELSE 0.0 END AS stopword_ratio,
        |  CASE WHEN length(text) > 0
        |       THEN (length(text) - length(replace(replace(replace(replace(replace(replace(text,'.',''),',',''),'!',''),'?',''),';',''),':',''))) * 1.0 / length(text)
        |       ELSE 0.0 END AS punct_ratio,
        |  round(
        |    least(1.0, n_tokens / 50.0) * 0.4 +
        |    (CASE WHEN n_tokens > 0 THEN sw * 1.0 / n_tokens ELSE 0.0 END) * 0.3 +
        |    (1.0 - least(1.0,
        |      (CASE WHEN length(text) > 0
        |            THEN (length(text) - length(replace(replace(replace(replace(replace(replace(text,'.',''),',',''),'!',''),'?',''),';',''),':',''))) * 1.0 / length(text)
        |            ELSE 0.0 END) * 10.0)) * 0.3, 6) AS quality_score
        |FROM (
        |  SELECT doc_id, text,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), ' +')) END AS n_tokens,
        |    len(list_filter(string_split(lower(text), ' '), t -> t IN (STOPLIST))) AS sw
        |  FROM documents WHERE doc_id % 23 = 0) b
        |ORDER BY doc_id""".stripMargin.replace("STOPLIST", stop)
    },

    "q_text_tokens" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), ' +')) END AS n_tokens,
        |  CAST(list_sum(list_transform(string_split_regex(trim(text), ' +'),
        |    w -> CASE WHEN length(w) = 0 THEN 0
        |              ELSE CAST(ceil(length(w) / 4.0) AS BIGINT) END)) AS BIGINT) AS n_subwords
        |FROM documents WHERE doc_id % 23 = 0 ORDER BY doc_id""".stripMargin,

    "q_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), ' +')) END AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens + 1) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
        |  FROM t)
        |SELECT doc_id, n_tokens, CAST(tok_start AS BIGINT) AS tok_start,
        |  CAST(tok_start // 512 AS BIGINT) AS seq_first,
        |  CAST((tok_start + greatest(n_tokens - 1, 0)) // 512 AS BIGINT) AS seq_last
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_pack_assemble" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), ' +') END AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    COALESCE(SUM(len(toks) + 1) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
        |  FROM t),
        |ti AS (
        |  SELECT s, toks, unnest(range(1, len(toks) + 1)) AS j FROM c),
        |tok AS (
        |  SELECT s + j - 1 AS pos, toks[CAST(j AS INT)] AS tk FROM ti
        |  UNION ALL
        |  SELECT s + n AS pos, '</s>' AS tk FROM c)
        |SELECT CAST(pos // 512 AS BIGINT) AS seq_id,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  md5(string_agg(tk, ' ' ORDER BY pos)) AS h
        |FROM tok GROUP BY 1 ORDER BY seq_id""".stripMargin,

    "q_pack_stats" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), ' +')) END AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens + 1) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
        |  FROM t),
        |p AS (
        |  SELECT n_tokens,
        |    tok_start // 512 AS seq_first,
        |    (tok_start + greatest(n_tokens - 1, 0)) // 512 AS seq_last
        |  FROM c)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens + 1) AS BIGINT) AS stream_tokens,
        |  CAST((SUM(n_tokens + 1) + 511) // 512 AS BIGINT) AS n_sequences,
        |  CAST(SUM(CASE WHEN seq_first <> seq_last THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boundary_docs
        |FROM p""".stripMargin,

    "q_skew_join" ->
      """SELECT CASE o_orderstatus WHEN 'F' THEN 'finished'
        |       WHEN 'O' THEN 'open' ELSE 'pending' END AS status_name,
        |  count(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY status_name""".stripMargin,

    "q_sample_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT) % 10000 AS bucket
        |  FROM documents),
        |labeled AS (
        |  SELECT doc_id,
        |    CASE WHEN bucket < 9000 THEN 'train'
        |         WHEN bucket < 9500 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM b)
        |SELECT split, count(*) AS n, min(doc_id) AS min_id
        |FROM labeled GROUP BY split ORDER BY split""".stripMargin,

    // leakage-safe split: the components chain + the q_sample_split
    // bucket rule, keyed on COALESCE(component_id, doc_id)
    "q_sample_leakage_split" ->
      s"""WITH RECURSIVE $ccCtes,
        |keyed AS (
        |  SELECT d.doc_id, COALESCE(cc.component_id, d.doc_id) AS k
        |  FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
        |b AS (
        |  SELECT doc_id,
        |    (('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 12))::BIGINT) % 10000 AS bucket
        |  FROM keyed)
        |SELECT doc_id,
        |  CASE WHEN bucket < 9000 THEN 'train'
        |       WHEN bucket < 9500 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    "q_sample_stratified" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT) % 10000 AS bucket
        |  FROM documents)
        |SELECT lang, count(*) AS n, min(doc_id) AS min_id
        |FROM b
        |WHERE bucket < CASE lang WHEN 'en' THEN 5000
        |                         WHEN 'de' THEN 10000 ELSE 2500 END
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_funnel" ->
      """WITH e AS (
        |  SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-03'
        |), per_user AS (
        |  SELECT user_id,
        |    list_sort(list(epoch_us(ts)) FILTER (event_type = 'signup')) AS s0,
        |    list_sort(list(epoch_us(ts)) FILTER (event_type = 'click')) AS s1,
        |    list_sort(list(epoch_us(ts)) FILTER (event_type = 'purchase')) AS s2
        |  FROM e GROUP BY user_id
        |), c0 AS (
        |  SELECT user_id, s1, s2, s0[1] AS t0 FROM per_user
        |), c1 AS (
        |  SELECT user_id, s2, t0, list_filter(s1, x -> x >= t0)[1] AS t1 FROM c0
        |), c2 AS (
        |  SELECT user_id, t0, t1, list_filter(s2, x -> x >= t1)[1] AS t2 FROM c1
        |)
        |SELECT CASE WHEN t2 IS NOT NULL THEN 3
        |            WHEN t1 IS NOT NULL THEN 2
        |            WHEN t0 IS NOT NULL THEN 1 ELSE 0 END AS funnel_depth,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM c2 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_funnel_window" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |    list_sort(list(epoch_us(ts)) FILTER (event_type = 'signup')) AS s0,
        |    list_sort(list(epoch_us(ts)) FILTER (event_type = 'click')) AS s1,
        |    list_sort(list(epoch_us(ts)) FILTER (event_type = 'purchase')) AS s2
        |  FROM events GROUP BY user_id
        |), c0 AS (
        |  SELECT user_id, s1, s2, s0[1] AS t0 FROM per_user
        |), c1 AS (
        |  SELECT user_id, s2, t0,
        |    list_filter(s1, x -> x >= t0
        |      AND x <= t0 + 28800000000)[1] AS t1 FROM c0
        |), c2 AS (
        |  SELECT user_id, t0, t1,
        |    list_filter(s2, x -> x >= t1
        |      AND x <= t0 + 28800000000)[1] AS t2 FROM c1
        |)
        |SELECT CASE WHEN t2 IS NOT NULL THEN 3
        |            WHEN t1 IS NOT NULL THEN 2
        |            WHEN t0 IS NOT NULL THEN 1 ELSE 0 END AS funnel_depth,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM c2 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_zorder_key" ->
      """WITH b AS (
        |  SELECT o_orderkey,
        |    o_custkey % 256 AS bx,
        |    CAST(floor(o_totalprice) AS BIGINT) % 256 AS by
        |  FROM orders)
        |SELECT o_orderkey,
        |  CAST(list_sum(list_transform(range(8), j ->
        |    ((bx >> j) & 1) * (1::BIGINT << (2 * j)) +
        |    ((by >> j) & 1) * (1::BIGINT << (2 * j + 1)))) AS BIGINT) AS zkey
        |FROM b ORDER BY o_orderkey""".stripMargin,

    "q_asof_forward" ->
      """WITH u AS (
        |  SELECT user_id, ts, 1 AS is_left, event_id, value,
        |    NULL::DOUBLE AS r_val
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, 0, NULL, NULL, value
        |  FROM events WHERE event_type = 'purchase'
        |), w AS (
        |  SELECT user_id, ts, is_left, event_id, value,
        |    last_value(r_val IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, is_left
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS purchase_value
        |  FROM u
        |)
        |SELECT event_id, user_id, value, purchase_value
        |FROM w WHERE is_left = 1 ORDER BY event_id""".stripMargin,

    "q_sketch_cms" ->
      """WITH cells AS (
        |  SELECT row, bucket, count(*) AS cnt FROM (
        |    SELECT i.range AS row,
        |      ((('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
        |        + i.range * ((('0x' || substr(md5(CAST(user_id AS VARCHAR)),
        |            13, 12))::BIGINT) | 1)) % 256) AS bucket
        |    FROM events, range(4) i)
        |  GROUP BY 1, 2
        |), probes AS (
        |  SELECT u.user_id, i.range AS row,
        |    ((('0x' || substr(md5(CAST(u.user_id AS VARCHAR)), 1, 12))::BIGINT
        |      + i.range * ((('0x' || substr(md5(CAST(u.user_id AS VARCHAR)),
        |          13, 12))::BIGINT) | 1)) % 256) AS bucket
        |  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 20) u,
        |       range(4) i
        |), est AS (
        |  SELECT p.user_id, min(coalesce(c.cnt, 0)) AS est
        |  FROM probes p LEFT JOIN cells c USING (row, bucket) GROUP BY 1
        |), truth AS (
        |  SELECT user_id, count(*) AS true_cnt FROM events
        |  WHERE user_id < 20 GROUP BY 1
        |)
        |SELECT user_id, CAST(est AS BIGINT) AS est,
        |  CAST(true_cnt AS BIGINT) AS true_cnt
        |FROM est JOIN truth USING (user_id) ORDER BY user_id""".stripMargin,

    "q_bloom_semijoin" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_sketch_hh" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1 HAVING count(*) >= 75
        |ORDER BY 1""".stripMargin,

    "q_sketch_histq" ->
      """WITH cells AS (
        |  SELECT source, length(bin(n_chars)) AS bkt, count(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |cum AS (
        |  SELECT source, bkt,
        |    SUM(c) OVER (PARTITION BY source ORDER BY bkt) AS cum,
        |    SUM(c) OVER (PARTITION BY source) AS n
        |  FROM cells),
        |specs(label, num, den) AS (
        |  VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)),
        |hit AS (
        |  SELECT source, label, MIN(bkt) AS b
        |  FROM cum CROSS JOIN specs
        |  WHERE cum >= (n * num + den - 1) // den
        |  GROUP BY 1, 2)
        |SELECT source, label, CAST((1::BIGINT << b) - 1 AS BIGINT) AS est
        |FROM hit ORDER BY source, label""".stripMargin,

    "q_sketch_hll" ->
      """WITH h AS (
        |  SELECT (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))
        |          ::BIGINT) AS h48
        |  FROM events
        |), r AS (
        |  SELECT h48 % 64 AS bucket,
        |    CASE WHEN h48 // 64 = 0 THEN 43
        |         ELSE 43 - length(bin(h48 // 64)) END AS rank
        |  FROM h
        |), regs AS (
        |  SELECT bucket, max(rank) AS register FROM r GROUP BY 1
        |), agg AS (
        |  SELECT sum(1::BIGINT << (43 - register))
        |           + (64 - count(*)) * (1::BIGINT << 43) AS s,
        |         64 - count(*) AS zeros
        |  FROM regs
        |), est AS (
        |  SELECT CAST(floor(CASE
        |    WHEN ((0.709::DOUBLE * 4096.0) * 8796093022208.0)
        |           / CAST(s AS DOUBLE) <= 160.0 AND zeros > 0
        |      THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE))
        |    ELSE ((0.709::DOUBLE * 4096.0) * 8796093022208.0)
        |           / CAST(s AS DOUBLE) END) AS BIGINT) AS est
        |  FROM agg
        |), exact AS (
        |  SELECT CAST(count(DISTINCT event_id) AS BIGINT) AS exact
        |  FROM events
        |)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(register AS BIGINT) AS register, est, exact
        |FROM regs, est, exact ORDER BY bucket""".stripMargin,

    // the same sweep as two window passes — running max of previous
    // ends, prefix-sum span labels — in DuckDB's window dialect
    "q_ts_intervals" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + 1800000000 AS e
        |  FROM events),
        |f AS (
        |  SELECT user_id, s, e,
        |    CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           IS NULL
        |         OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS nf
        |  FROM iv),
        |g AS (
        |  SELECT user_id, s, e,
        |    sum(nf) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
        |  FROM f)
        |SELECT user_id, min(s) AS span_start, max(e) AS span_end,
        |  CAST(count(*) AS BIGINT) AS n_intervals
        |FROM g GROUP BY user_id, span
        |ORDER BY user_id, span_start""".stripMargin,

    // same register/estimate constants as q_sketch_hll_group (p=6), plus
    // the pair expansion: union registers = max over both sides' registers
    "q_sketch_hll_setops" ->
      """WITH h AS (
        |  SELECT event_type,
        |    (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
        |     ::BIGINT) AS h48
        |  FROM events
        |), r AS (
        |  SELECT event_type, h48 % 64 AS bucket,
        |    CASE WHEN h48 // 64 = 0 THEN 43
        |         ELSE 43 - length(bin(h48 // 64)) END AS rank
        |  FROM h
        |), regs AS MATERIALIZED (
        |  SELECT event_type, bucket, max(rank) AS register
        |  FROM r GROUP BY 1, 2
        |), est AS MATERIALIZED (
        |  SELECT event_type, CAST(floor(CASE
        |    WHEN ((0.709::DOUBLE * 4096.0) * 8796093022208.0)
        |           / CAST(s AS DOUBLE) <= 160.0 AND zeros > 0
        |      THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE))
        |    ELSE ((0.709::DOUBLE * 4096.0) * 8796093022208.0)
        |           / CAST(s AS DOUBLE) END) AS BIGINT) AS est
        |  FROM (
        |    SELECT event_type,
        |      sum(1::BIGINT << (43 - register))
        |        + (64 - count(*)) * (1::BIGINT << 43) AS s,
        |      64 - count(*) AS zeros
        |    FROM regs GROUP BY 1)
        |), pairs AS (
        |  SELECT a.event_type AS ga, b.event_type AS gb
        |  FROM (SELECT DISTINCT event_type FROM regs) a,
        |       (SELECT DISTINCT event_type FROM regs) b
        |  WHERE a.event_type < b.event_type
        |), uregs AS (
        |  SELECT ga, gb, bucket, max(register) AS register FROM (
        |    SELECT p.ga, p.gb, r.bucket, r.register
        |    FROM pairs p JOIN regs r ON r.event_type = p.ga
        |    UNION ALL
        |    SELECT p.ga, p.gb, r.bucket, r.register
        |    FROM pairs p JOIN regs r ON r.event_type = p.gb)
        |  GROUP BY 1, 2, 3
        |), uest AS (
        |  SELECT ga, gb, CAST(floor(CASE
        |    WHEN ((0.709::DOUBLE * 4096.0) * 8796093022208.0)
        |           / CAST(s AS DOUBLE) <= 160.0 AND zeros > 0
        |      THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE))
        |    ELSE ((0.709::DOUBLE * 4096.0) * 8796093022208.0)
        |           / CAST(s AS DOUBLE) END) AS BIGINT) AS est_union
        |  FROM (
        |    SELECT ga, gb,
        |      sum(1::BIGINT << (43 - register))
        |        + (64 - count(*)) * (1::BIGINT << 43) AS s,
        |      64 - count(*) AS zeros
        |    FROM uregs GROUP BY 1, 2)
        |)
        |SELECT u.ga AS group_a, u.gb AS group_b,
        |  ea.est AS est_a, eb.est AS est_b, u.est_union,
        |  greatest(ea.est + eb.est - u.est_union, 0) AS est_intersect
        |FROM uest u
        |JOIN est ea ON ea.event_type = u.ga
        |JOIN est eb ON eb.event_type = u.gb
        |ORDER BY group_a, group_b""".stripMargin,

    "q_sketch_hll_group" ->
      """WITH h AS (
        |  SELECT event_type,
        |    (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
        |     ::BIGINT) AS h48
        |  FROM events
        |), r AS (
        |  SELECT event_type, h48 % 64 AS bucket,
        |    CASE WHEN h48 // 64 = 0 THEN 43
        |         ELSE 43 - length(bin(h48 // 64)) END AS rank
        |  FROM h
        |), regs AS (
        |  SELECT event_type, bucket, max(rank) AS register
        |  FROM r GROUP BY 1, 2
        |), agg AS (
        |  SELECT event_type,
        |    sum(1::BIGINT << (43 - register))
        |      + (64 - count(*)) * (1::BIGINT << 43) AS s,
        |    64 - count(*) AS zeros
        |  FROM regs GROUP BY 1
        |), est AS (
        |  SELECT event_type, CAST(floor(CASE
        |    WHEN ((0.709::DOUBLE * 4096.0) * 8796093022208.0)
        |           / CAST(s AS DOUBLE) <= 160.0 AND zeros > 0
        |      THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE))
        |    ELSE ((0.709::DOUBLE * 4096.0) * 8796093022208.0)
        |           / CAST(s AS DOUBLE) END) AS BIGINT) AS est
        |  FROM agg
        |), exact AS (
        |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact
        |  FROM events GROUP BY 1
        |)
        |SELECT e.event_type, e.est, x.exact
        |FROM est e JOIN exact x USING (event_type)
        |ORDER BY 1""".stripMargin,

    "q_sample_k_group" ->
      """WITH h AS (
        |  SELECT source, doc_id,
        |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
        |     ::BIGINT) AS hv
        |  FROM documents
        |), r AS (
        |  SELECT source, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rn
        |  FROM h
        |)
        |SELECT source, doc_id, CAST(rn AS INT) AS rn FROM r
        |WHERE rn <= 3 ORDER BY source, rn""".stripMargin,

    "q_sample_mix_temp" ->
      """WITH tok AS (
        |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
        |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
        |     ::BIGINT) % 10000 AS bucket
        |  FROM documents
        |), tot AS (
        |  SELECT source, sum(n_tok) AS total,
        |    CAST(floor(sqrt(CAST(sum(n_tok) AS DOUBLE))) AS HUGEINT) AS wgt
        |  FROM tok GROUP BY source
        |), ws AS (
        |  SELECT sum(wgt) AS wsum FROM tot
        |), keep AS (
        |  SELECT t.doc_id, t.source, t.n_tok
        |  FROM tok t JOIN tot USING (source) CROSS JOIN ws
        |  WHERE CAST(t.bucket AS HUGEINT) * CAST(tot.total AS HUGEINT)
        |          * ws.wsum
        |      < CAST(tot.wgt AS HUGEINT) * 8000 * 10000
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM keep GROUP BY source ORDER BY source""".stripMargin,

    "q_range_join" ->
      """SELECT c.event_id, CAST(count(*) AS BIGINT) AS n_errors
        |FROM events c JOIN events e
        |  ON c.user_id = e.user_id
        | AND c.event_type = 'click' AND e.event_type = 'error'
        | AND epoch_us(e.ts) BETWEEN epoch_us(c.ts) - 14400000000
        |                        AND epoch_us(c.ts) + 14400000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_retention" ->
      """WITH cohorts AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id
        |), activity AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
        |  FROM events
        |)
        |SELECT CAST(c.cohort_week AS DATE) AS cohort_week,
        |  CAST((epoch_us(a.active_week) - epoch_us(c.cohort_week))
        |    // 604800000000 AS BIGINT) AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_active
        |FROM activity a JOIN cohorts c USING (user_id)
        |WHERE epoch_us(a.active_week) >= epoch_us(c.cohort_week)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_type,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 28800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id, ts, event_type,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM flagged
        |)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_purchases
        |FROM sess GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "q_dedup_rate" ->
      """WITH d AS (
        |  SELECT source, md5(text) AS h FROM documents
        |  WHERE text IS NOT NULL),
        |c AS (
        |  SELECT source, count(*) OVER (PARTITION BY h) AS cnt FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_docs,
        |  round(CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE), 6) AS dup_rate
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    "q_audit_bots" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS gp
        |  FROM events),
        |st AS (
        |  SELECT user_id, count(*) AS n_gaps,
        |    sum(CAST(gp AS HUGEINT)) AS s1,
        |    sum(CAST(gp AS HUGEINT) * CAST(gp AS HUGEINT)) AS s2
        |  FROM g WHERE gp IS NOT NULL
        |  GROUP BY user_id HAVING count(*) >= 4 AND sum(gp) > 0),
        |cv AS (
        |  SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
        |    CAST(floor(CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE))
        |      AS BIGINT) AS mean_gap_us,
        |    CAST(round(sqrt(CAST(CAST(n_gaps AS HUGEINT) * s2 - s1 * s1
        |        AS DOUBLE)) / CAST(s1 AS DOUBLE) * 1000000) AS BIGINT)
        |      AS cv_micro
        |  FROM st)
        |SELECT * FROM (
        |  SELECT user_id, n_gaps, mean_gap_us, cv_micro,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cv_micro, user_id) AS INT)
        |      AS rank
        |  FROM cv) t
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // the transition edges through the SAME unrolled HUGEINT power
    // iteration as the nation PageRank oracle (17/20, 5 steps)
    "q_seq_stationary" -> {
      val base =
        """WITH seq AS (
          |  SELECT event_type AS a,
          |    lead(event_type) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS b
          |  FROM events WHERE event_type IS NOT NULL),
          |e AS MATERIALIZED (
          |  SELECT a AS src, b AS dst, count(*) AS w FROM seq
          |  WHERE b IS NOT NULL GROUP BY 1, 2),
          |ow AS MATERIALIZED (SELECT src, sum(w) AS ow FROM e GROUP BY 1),
          |n AS (SELECT DISTINCT s AS id FROM (
          |  SELECT src AS s FROM e UNION SELECT dst FROM e) t),
          |cnt AS (SELECT count(*) AS nn FROM n),
          |r0 AS (
          |  SELECT id, CAST(1000000000000 AS HUGEINT) // cnt.nn AS ru
          |  FROM n CROSS JOIN cnt)""".stripMargin
      val steps = (1 to 5).map { k =>
        s"""r$k AS (
           |  SELECT n.id,
           |    (CAST(3 AS HUGEINT) * 1000000000000) // (20 * cnt.nn)
           |    + (17 * COALESCE(inf.s, CAST(0 AS HUGEINT))) // 20 AS ru
           |  FROM n CROSS JOIN cnt
           |  LEFT JOIN (
           |    SELECT e.dst AS id, sum((r.ru * e.w) // ow.ow) AS s
           |    FROM e JOIN r${k - 1} r ON r.id = e.src
           |    JOIN ow ON ow.src = e.src
           |    GROUP BY 1) inf USING (id))""".stripMargin
      }
      val fin =
        """SELECT r.id AS event_type, CAST(r.ru AS BIGINT) AS rank_u
          |FROM r5 r ORDER BY event_type""".stripMargin
      (base +: steps).mkString(",\n") + "\n" + fin
    },

    // the matched right TIMESTAMP rides its own IGNORE NULLS window
    // (purchases pre-filtered to non-null values, so ts/value pair);
    // stale matches null out at the inclusive 24h bound
    "q_asof_tolerance" ->
      """WITH u AS (
        |  SELECT user_id, ts, 1 AS is_left, event_id,
        |    NULL::TIMESTAMP AS r_ts, NULL::DOUBLE AS r_val
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, 0, NULL, ts, value
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |w AS (
        |  SELECT user_id, ts, is_left, event_id,
        |    last_value(r_ts IGNORE NULLS) OVER win AS m_ts,
        |    last_value(r_val IGNORE NULLS) OVER win AS m_val
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, is_left
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |  CASE WHEN m_ts IS NOT NULL
        |    AND epoch_us(ts) - epoch_us(m_ts) <= 86400000000
        |    THEN m_val END AS purchase_value
        |FROM w WHERE is_left = 1 ORDER BY event_id""".stripMargin,

    "q_seq_cooccurrence" ->
      """WITH ks AS (
        |  SELECT DISTINCT user_id AS k, event_type AS s
        |  FROM events WHERE event_type IS NOT NULL),
        |n AS (SELECT CAST(count(DISTINCT k) AS HUGEINT) AS nn FROM ks),
        |sc AS (SELECT s, CAST(count(*) AS HUGEINT) AS c FROM ks
        |       GROUP BY s),
        |pr AS (
        |  SELECT a.s AS state_a, b.s AS state_b,
        |    CAST(count(*) AS HUGEINT) AS nb
        |  FROM ks a JOIN ks b ON b.k = a.k AND a.s < b.s
        |  GROUP BY 1, 2)
        |SELECT pr.state_a, pr.state_b, CAST(pr.nb AS BIGINT) AS n_both,
        |  round(CAST(pr.nb AS DOUBLE) / CAST(n.nn AS DOUBLE), 6)
        |    AS support,
        |  round(CAST(pr.nb * n.nn AS DOUBLE) /
        |    CAST(ca.c * cb.c AS DOUBLE), 6) AS lift
        |FROM pr JOIN sc ca ON ca.s = pr.state_a
        |        JOIN sc cb ON cb.s = pr.state_b
        |CROSS JOIN n
        |ORDER BY state_a, state_b""".stripMargin,

    "q_stats_weighted_median" ->
      """WITH f AS (
        |  SELECT source, n_chars,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(trim(text), ' +')) END
        |      AS BIGINT) AS w
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND text IS NOT NULL),
        |g AS (SELECT source, n_chars, w FROM f WHERE w > 0),
        |c AS (
        |  SELECT source, n_chars, w,
        |    sum(w) OVER (PARTITION BY source ORDER BY n_chars) AS cum,
        |    sum(w) OVER (PARTITION BY source) AS tot
        |  FROM g),
        |sel AS (
        |  SELECT source, tot, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rk
        |  FROM c WHERE 2 * cum >= tot)
        |SELECT source, CAST(tot AS BIGINT) AS total_weight,
        |  n_chars AS weighted_median
        |FROM sel WHERE rk = 1 ORDER BY source""".stripMargin,

    "q_seq_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS from_state,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_state
        |  FROM events WHERE event_type IS NOT NULL)
        |SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(count(*) AS DOUBLE) /
        |    CAST(sum(count(*)) OVER (PARTITION BY from_state) AS DOUBLE), 6)
        |    AS p
        |FROM seq WHERE to_state IS NOT NULL
        |GROUP BY from_state, to_state
        |ORDER BY from_state, to_state""".stripMargin,

    "q_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, 1 AS is_left, event_id, value,
        |    NULL::DOUBLE AS r_val
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, 0, NULL, NULL, value
        |  FROM events WHERE event_type = 'purchase'
        |), w AS (
        |  SELECT user_id, ts, is_left, event_id, value,
        |    last_value(r_val IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, is_left
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS purchase_value
        |  FROM u
        |)
        |SELECT event_id, user_id, value, purchase_value
        |FROM w WHERE is_left = 1 ORDER BY event_id""".stripMargin,

    "q_sample_mix" ->
      """WITH tok AS (
        |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
        |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT) % 10000 AS bucket
        |  FROM documents
        |), tot AS (
        |  SELECT source, sum(n_tok) AS total FROM tok GROUP BY source
        |), w(source, wgt) AS (
        |  VALUES ('src0', 3), ('src1', 3), ('src2', 3), ('src3', 3),
        |         ('src4', 3), ('src5', 1), ('src6', 1), ('src7', 1),
        |         ('src8', 1), ('src9', 1)
        |), keep AS (
        |  SELECT t.doc_id, t.source, t.n_tok
        |  FROM tok t JOIN tot USING (source) JOIN w USING (source)
        |  WHERE CAST(t.bucket AS HUGEINT) * CAST(tot.total AS HUGEINT) * 20
        |      < CAST(w.wgt AS HUGEINT) * 8000 * 10000
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM keep GROUP BY source ORDER BY source""".stripMargin,

    "q_sample_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), ' +')) END AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
        |  FROM t)
        |SELECT CAST(floor(run / 10000) AS BIGINT) AS shard,
        |  count(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS tokens,
        |  min(doc_id) AS first_doc
        |FROM r GROUP BY 1 ORDER BY shard""".stripMargin,

    "q_dedup_contamination" ->
      """WITH grams AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(len(string_split(text, ' ')) - 4),
        |    i -> array_to_string(list_slice(string_split(text, ' '), i + 1, i + 5), ' '))) AS s
        |  FROM documents WHERE len(string_split(text, ' ')) >= 5),
        |bench AS (SELECT DISTINCT unnest(s) AS g FROM grams WHERE doc_id % 37 = 1),
        |corpus AS (SELECT doc_id, unnest(s) AS g FROM grams WHERE doc_id % 37 <> 1)
        |SELECT c.doc_id, CAST(count(DISTINCT c.g) AS BIGINT) AS n_hits
        |FROM corpus c JOIN bench b ON c.g = b.g
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q_text_repetition" ->
      """WITH base AS (
        |  SELECT doc_id, trim(text) AS t FROM documents WHERE doc_id % 23 = 0),
        |docs AS (
        |  SELECT doc_id,
        |    CASE WHEN length(t) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(t, ' +') END AS w
        |  FROM base),
        |stats AS (
        |  SELECT doc_id, len(w) AS n_words,
        |    len(list_distinct(w)) AS n_distinct_words,
        |    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS bgs
        |  FROM docs),
        |bg_counts AS (
        |  SELECT doc_id, bg, count(*) AS cnt
        |  FROM (SELECT doc_id, unnest(bgs) AS bg FROM stats)
        |  GROUP BY 1, 2),
        |tops AS (
        |  SELECT s.doc_id, COALESCE(MAX(b.cnt), 0) AS top_bigram_count
        |  FROM stats s LEFT JOIN bg_counts b ON s.doc_id = b.doc_id
        |  GROUP BY 1)
        |SELECT s.doc_id,
        |  CAST(s.n_words AS BIGINT) AS n_words,
        |  CAST(s.n_distinct_words AS BIGINT) AS n_distinct_words,
        |  CAST(t.top_bigram_count AS BIGINT) AS top_bigram_count,
        |  CASE WHEN s.n_words > 0
        |       THEN 1.0 - s.n_distinct_words * 1.0 / s.n_words
        |       ELSE 0.0 END AS dup_word_frac,
        |  CASE WHEN s.n_words > 1
        |       THEN t.top_bigram_count * 1.0 / (s.n_words - 1)
        |       ELSE 0.0 END AS top_bigram_frac
        |FROM stats s JOIN tops t ON s.doc_id = t.doc_id
        |ORDER BY s.doc_id""".stripMargin,

    "q_text_gopher" ->
      s"""WITH ${gopherCtes("doc_id % 7 = 0")}
        |SELECT doc_id, n_tokens, r_min_tokens, r_max_tokens, r_word_len,
        |  r_stopwords, r_dup_words, r_top_bigram,
        |  (r_min_tokens AND r_max_tokens AND r_word_len AND r_stopwords
        |   AND r_dup_words AND r_top_bigram) AS keep
        |FROM rules ORDER BY doc_id""".stripMargin,

    "q_stats_quantiles" ->
      """WITH ranked AS (
        |  SELECT source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents),
        |q(quantile, num, den) AS (
        |  VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100))
        |SELECT r.source, q.quantile, r.n_chars
        |FROM ranked r JOIN q
        |  ON r.rn = (r.n * q.num + q.den - 1) // q.den
        |ORDER BY source, quantile""".stripMargin,

    // MAD outliers: the same ranked type-1 median as q_stats_quantiles,
    // applied twice (values, then absolute deviations) — target index
    // (n+1) // 2 is the num=1/den=2 case of the integer ceil division.
    // All-BIGINT math end to end; k=3 pins the Scala call's default.
    "q_stats_mad" ->
      """WITH vals AS (
        |  SELECT doc_id, source, n_chars FROM documents),
        |med AS (
        |  SELECT source, n_chars AS group_median FROM (
        |    SELECT source, n_chars,
        |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |      COUNT(*) OVER (PARTITION BY source) AS n
        |    FROM vals) t
        |  WHERE rn = (n + 1) // 2),
        |dev AS (
        |  SELECT v.doc_id, v.source, v.n_chars, m.group_median,
        |    abs(v.n_chars - m.group_median) AS dv
        |  FROM vals v JOIN med m USING (source)),
        |mad AS (
        |  SELECT source, dv AS group_mad FROM (
        |    SELECT source, dv,
        |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY dv) AS rn,
        |      COUNT(*) OVER (PARTITION BY source) AS n
        |    FROM dev) t
        |  WHERE rn = (n + 1) // 2)
        |SELECT d.doc_id, d.source, d.n_chars, d.group_median, m.group_mad,
        |  d.dv > 3 * m.group_mad AS is_outlier
        |FROM dev d JOIN mad m USING (source)
        |ORDER BY d.doc_id""".stripMargin,

    // winsorize: the q_stats_quantiles ranked indexing for BOTH bounds
    // (lo = ceil(n/100), hi = ceil(99n/100)), then integer clipping
    "q_ts_gapfill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS v
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1),
        |spine AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds),
        |j AS (
        |  SELECT s.user_id, s.day, d.v
        |  FROM spine s LEFT JOIN daily d USING (user_id, day))
        |SELECT user_id, day,
        |  CAST(CAST(v AS DECIMAL(38,4)) AS DOUBLE) AS day_total,
        |  CAST(CAST(last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY day) AS DECIMAL(38,4)) AS DOUBLE)
        |    AS filled,
        |  v IS NOT NULL AS observed
        |FROM j ORDER BY user_id, day""".stripMargin,

    "q_audit_diff" -> (auditCtes +
      """
        |SELECT status, count(*) AS n FROM st GROUP BY 1 ORDER BY status"""
        .stripMargin),

    "q_audit_rows" -> (auditCtes +
      """
        |SELECT doc_id, status,
        |  md5(coalesce(a_text, '__null__')) AS a_hash,
        |  md5(coalesce(b_text, '__null__')) AS b_hash
        |FROM st WHERE status <> 'identical' ORDER BY doc_id"""
        .stripMargin),

    // blocking-free quadratic check of the Ed-Join result: the length-band
    // filter is provably safe (one edit moves length by at most 1), so the
    // oracle may carry it; everything else is brute force
    "q_fuzzy_join" ->
      """WITH dirty AS (
        |  SELECT c_custkey AS dirty_id,
        |    CASE WHEN c_custkey % 60 = 0
        |           THEN substr(c_name, 1, 9) || substr(c_name, 11)
        |         WHEN c_custkey % 60 = 20 THEN replace(c_name, '#', '-')
        |         ELSE c_name || 'q' END AS dirty_name
        |  FROM customer WHERE c_custkey % 20 = 0)
        |SELECT d.dirty_id, c.c_custkey AS cust_id,
        |  CAST(levenshtein(d.dirty_name, c.c_name) AS INTEGER) AS dist
        |FROM dirty d, customer c
        |WHERE abs(length(d.dirty_name) - length(c.c_name)) <= 1
        |  AND levenshtein(d.dirty_name, c.c_name) <= 1
        |ORDER BY dirty_id, cust_id""".stripMargin,

    "q_fuzzy_selfjoin" ->
      """WITH names AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS id_a, b.p_name AS id_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM names a, names b
        |WHERE a.p_name < b.p_name
        |  AND abs(length(a.p_name) - length(b.p_name)) <= 2
        |  AND levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // re-derives the full power iteration in HUGEINT: `//` floor division
    // is the twin of the engine's (a − a mod b)/b exact decimal floor
    "q_graph_pagerank" -> pagerankSql(iters = 5),

    // quadratic levenshtein pairs + recursive-CTE components + min-id
    // canonical keep — the q_dedup_canonical oracle shape over the
    // blocking-free fuzzy pair graph
    "q_dedup_fuzzy" ->
      """WITH RECURSIVE names AS MATERIALIZED (
        |  SELECT DISTINCT p_name FROM part),
        |pairs AS MATERIALIZED (
        |  SELECT a.p_name AS u, b.p_name AS v
        |  FROM names a JOIN names b ON a.p_name < b.p_name
        |  WHERE abs(length(a.p_name) - length(b.p_name)) <= 1
        |    AND levenshtein(a.p_name, b.p_name) <= 1),
        |edges AS MATERIALIZED (
        |  SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
        |reach(id, lab) AS (
        |  SELECT u, u FROM edges
        |  UNION
        |  SELECT e.u, r.lab FROM edges e JOIN reach r ON r.id = e.v),
        |cc AS (SELECT id, min(lab) AS component_id FROM reach GROUP BY id),
        |sizes AS (SELECT component_id, count(*) AS n FROM cc GROUP BY 1)
        |SELECT n.p_name, COALESCE(s.n, CAST(1 AS BIGINT)) AS n_dups
        |FROM names n
        |LEFT JOIN cc ON cc.id = n.p_name
        |LEFT JOIN sizes s ON s.component_id = n.p_name
        |WHERE cc.id IS NULL OR cc.id = cc.component_id
        |ORDER BY p_name""".stripMargin,

    "q_audit_profile" ->
      """SELECT col AS "column", n_rows, n_nulls, n_distinct,
        |  min_value, max_value
        |FROM (
        |  SELECT 'doc_id' AS col, COUNT(*) AS n_rows,
        |    COUNT(CASE WHEN doc_id IS NULL THEN 1 END) AS n_nulls,
        |    COUNT(DISTINCT doc_id) AS n_distinct,
        |    CAST(min(doc_id) AS VARCHAR) AS min_value,
        |    CAST(max(doc_id) AS VARCHAR) AS max_value
        |  FROM documents
        |  UNION ALL
        |  SELECT 'lang', COUNT(*),
        |    COUNT(CASE WHEN lang IS NULL THEN 1 END),
        |    COUNT(DISTINCT lang), min(lang), max(lang)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'source', COUNT(*),
        |    COUNT(CASE WHEN source IS NULL THEN 1 END),
        |    COUNT(DISTINCT source), min(source), max(source)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', COUNT(*),
        |    COUNT(CASE WHEN n_chars IS NULL THEN 1 END),
        |    COUNT(DISTINCT n_chars),
        |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        |  FROM documents) t
        |ORDER BY "column"""".stripMargin,

    "q_sample_dsir" -> (dsirCtes +
      """
        |SELECT doc_id, n_feats, logw FROM scored ORDER BY doc_id"""
        .stripMargin),

    "q_sample_dsir_topk" -> (dsirCtes +
      """
        |SELECT doc_id, n_feats, logw FROM scored
        |ORDER BY logw DESC, doc_id LIMIT 50""".stripMargin),

    // frozen DSIR: ratios from the doc_id % 3 != 0 slice only, every
    // doc scored under them — LEFT join + COALESCE to the sentinel
    // default (the smoothing evaluated at tc = rc = 0) is the
    // unseen-bucket extension; on the training slice every bucket hits,
    // so those rows are the inline trainer bit-for-bit
    "q_sample_dsir_frozen" ->
      """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |feats AS (
        |  SELECT doc_id, lang, unnest(w) AS f FROM d
        |  UNION ALL
        |  SELECT doc_id, lang, unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS f FROM d),
        |fb AS (SELECT doc_id, lang,
        |  ('0x' || substr(md5(f), 1, 12))::BIGINT % 1024 AS b FROM feats),
        |train AS (SELECT * FROM fb WHERE doc_id % 3 <> 0),
        |tc AS (SELECT b, count(*) AS tc FROM train WHERE lang = 'zh' GROUP BY 1),
        |rc AS (SELECT b, count(*) AS rc FROM train GROUP BY 1),
        |tots AS (SELECT (SELECT sum(tc) FROM tc) AS tt,
        |                (SELECT sum(rc) FROM rc) AS rt),
        |lr AS (
        |  SELECT rc.b,
        |    ln(CAST(COALESCE(tc.tc, 0) AS DOUBLE) + 1.0)
        |      - ln(CAST(tt AS DOUBLE) + 1024.0)
        |      - ln(CAST(rc.rc AS DOUBLE) + 1.0)
        |      + ln(CAST(rt AS DOUBLE) + 1024.0) AS lr
        |  FROM rc LEFT JOIN tc ON rc.b = tc.b CROSS JOIN tots),
        |dflt AS (
        |  SELECT ln(1.0) - ln(CAST(tt AS DOUBLE) + 1024.0)
        |       - ln(1.0) + ln(CAST(rt AS DOUBLE) + 1024.0) AS dl FROM tots),
        |doc AS (
        |  SELECT fb.doc_id, count(*) AS n_feats,
        |    SUM(CAST(COALESCE(lr.lr, dflt.dl) AS DECIMAL(38,18))) AS s
        |  FROM fb LEFT JOIN lr ON fb.b = lr.b CROSS JOIN dflt GROUP BY 1),
        |scored AS (
        |  SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats,
        |    round(CAST(s AS DOUBLE) / n_feats, 6) AS logw
        |  FROM doc)
        |SELECT doc_id, n_feats, logw FROM scored ORDER BY doc_id"""
        .stripMargin,

    "q_stats_corr" ->
      """WITH t AS (
        |  SELECT source, CAST(n_chars AS HUGEINT) AS x,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), ' +')) END AS HUGEINT) AS y
        |  FROM documents WHERE n_chars IS NOT NULL),
        |a AS (
        |  SELECT source, CAST(count(*) AS HUGEINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM t GROUP BY 1)
        |SELECT source, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |      sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |           CAST(n * syy - sy * sy AS DOUBLE)), 6)
        |  END AS r
        |FROM a ORDER BY source""".stripMargin,

    "q_stats_linreg" ->
      """WITH t AS (
        |  SELECT source, CAST(n_chars AS HUGEINT) AS x,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), ' +')) END AS HUGEINT) AS y
        |  FROM documents WHERE n_chars IS NOT NULL),
        |a AS (
        |  SELECT source, CAST(count(*) AS HUGEINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx
        |  FROM t GROUP BY 1),
        |f AS (
        |  SELECT source, n, sx, sy, n * sxx - sx * sx AS den,
        |    CAST(n * sxy - sx * sy AS DOUBLE) /
        |      CAST(n * sxx - sx * sx AS DOUBLE) AS b
        |  FROM a)
        |SELECT source, CAST(n AS BIGINT) AS n,
        |  CASE WHEN den > 0 THEN round(b, 6) END AS slope,
        |  CASE WHEN den > 0 THEN round(
        |    (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE), 6) END AS intercept
        |FROM f ORDER BY source""".stripMargin,

    "q_stats_histogram" ->
      """WITH v AS (
        |  SELECT o_orderstatus AS g,
        |    CAST(round(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)
        |      AS x
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |b AS (
        |  SELECT g,
        |    LEAST(11, GREATEST(0, CAST(floor(CAST(x - 0 AS DOUBLE) * 12 /
        |      60000000.0) AS INT))) AS bin
        |  FROM v),
        |c AS (SELECT g, bin, count(*) AS n FROM b GROUP BY 1, 2)
        |SELECT g AS o_orderstatus, bin, CAST(n AS BIGINT) AS n,
        |  round(CAST(n AS DOUBLE) /
        |    CAST(sum(n) OVER (PARTITION BY g) AS DOUBLE), 6) AS share
        |FROM c ORDER BY o_orderstatus, bin""".stripMargin,

    // one HUGEINT sufficient-statistics row, three UNION ALL pair
    // projections over it — the input scanned once
    "q_stats_corrmatrix" ->
      """WITH t AS (
        |  SELECT CAST(floor(l_quantity) AS HUGEINT) AS q,
        |    CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS HUGEINT)
        |      AS c,
        |    CAST(round(CAST(l_discount AS DOUBLE) * 100) AS HUGEINT) AS p
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL),
        |s AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |    sum(q) AS sq, sum(c) AS sc, sum(p) AS sp,
        |    sum(q*q) AS qq, sum(c*c) AS cc, sum(p*p) AS pp,
        |    sum(q*c) AS qc, sum(q*p) AS qp, sum(c*p) AS cp
        |  FROM t)
        |SELECT * FROM (
        |  SELECT 'quantity' AS col_a, 'cents' AS col_b,
        |    CAST(n AS BIGINT) AS n,
        |    CASE WHEN n*qq - sq*sq > 0 AND n*cc - sc*sc > 0 THEN
        |      round(CAST(n*qc - sq*sc AS DOUBLE) /
        |        sqrt(CAST(n*qq - sq*sq AS DOUBLE) *
        |             CAST(n*cc - sc*sc AS DOUBLE)), 6)
        |    END AS r FROM s
        |  UNION ALL
        |  SELECT 'quantity', 'permil', CAST(n AS BIGINT),
        |    CASE WHEN n*qq - sq*sq > 0 AND n*pp - sp*sp > 0 THEN
        |      round(CAST(n*qp - sq*sp AS DOUBLE) /
        |        sqrt(CAST(n*qq - sq*sq AS DOUBLE) *
        |             CAST(n*pp - sp*sp AS DOUBLE)), 6)
        |    END FROM s
        |  UNION ALL
        |  SELECT 'cents', 'permil', CAST(n AS BIGINT),
        |    CASE WHEN n*cc - sc*sc > 0 AND n*pp - sp*sp > 0 THEN
        |      round(CAST(n*cp - sc*sp AS DOUBLE) /
        |        sqrt(CAST(n*cc - sc*sc AS DOUBLE) *
        |             CAST(n*pp - sp*sp AS DOUBLE)), 6)
        |    END FROM s) u
        |ORDER BY col_a, col_b""".stripMargin,

    // ascending ranks (ties rank-weight-invariant), HUGEINT i·x sums,
    // one pinned double tree
    "q_stats_gini" ->
      """WITH v AS (
        |  SELECT o_orderpriority AS g,
        |    CAST(round(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)
        |      AS x
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |rk AS (
        |  SELECT g, x,
        |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) AS i
        |  FROM v),
        |s AS (
        |  SELECT g, count(*) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx,
        |    sum(CAST(i AS HUGEINT) * CAST(x AS HUGEINT)) AS w
        |  FROM rk GROUP BY g)
        |SELECT g AS o_orderpriority, CAST(n AS BIGINT) AS n,
        |  CASE WHEN sx > 0 THEN
        |    round(2.0 * CAST(w AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) -
        |      CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |  END AS gini
        |FROM s ORDER BY o_orderpriority""".stripMargin,

    // the same pinned Poisson(1) inverse-CDF literals against the
    // md5-exact uniform; replica sums HUGEINT, means/sd in
    // DECIMAL(38,18), CI from the UNROUNDED mean/se
    "q_sample_bootstrap" ->
      """WITH v AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS k,
        |    CAST(round(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT) AS x
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |pt AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx FROM v),
        |b AS (
        |  SELECT k, x, unnest(range(0, 32)) AS rb FROM v),
        |w AS (
        |  SELECT x, rb,
        |    CASE
        |      WHEN u < 0.3678794412 THEN 0
        |      WHEN u < 0.7357588823 THEN 1
        |      WHEN u < 0.9196986029 THEN 2
        |      WHEN u < 0.9810118431 THEN 3
        |      WHEN u < 0.9963401532 THEN 4
        |      ELSE 5 END AS wt
        |  FROM (
        |    SELECT x, rb,
        |      (CAST(('0x' || substr(md5(k || '_' || CAST(rb AS VARCHAR)),
        |          1, 12)) AS BIGINT) + 1.0) / 281474976710656.0 AS u
        |    FROM b) t),
        |rep AS (
        |  SELECT rb, sum(wt) AS nw,
        |    sum(CAST(wt AS HUGEINT) * CAST(x AS HUGEINT)) AS sw
        |  FROM w GROUP BY rb HAVING sum(wt) > 0),
        |m AS (SELECT CAST(sw AS DOUBLE) / CAST(nw AS DOUBLE) AS mv
        |      FROM rep),
        |c AS (
        |  SELECT pt.n, pt.sx,
        |    mv - CAST(pt.sx AS DOUBLE) / CAST(pt.n AS DOUBLE) AS dv
        |  FROM m CROSS JOIN pt),
        |st AS (
        |  SELECT max(n) AS n, max(sx) AS sx,
        |    CAST(count(*) AS BIGINT) AS nr,
        |    CAST(sum(CAST(dv AS DECIMAL(38,18))) AS DOUBLE) AS sm,
        |    CAST(sum(CAST(dv * dv AS DECIMAL(38,18))) AS DOUBLE) AS sq
        |  FROM c)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
        |  nr AS n_replicas,
        |  round(sqrt(GREATEST(sq / CAST(nr AS DOUBLE) -
        |    (sm / CAST(nr AS DOUBLE)) * (sm / CAST(nr AS DOUBLE)), 0.0)), 6)
        |    AS boot_se,
        |  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) -
        |    1.96 * sqrt(GREATEST(sq / CAST(nr AS DOUBLE) -
        |      (sm / CAST(nr AS DOUBLE)) * (sm / CAST(nr AS DOUBLE)), 0.0)),
        |    6) AS ci_lo,
        |  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) +
        |    1.96 * sqrt(GREATEST(sq / CAST(nr AS DOUBLE) -
        |      (sm / CAST(nr AS DOUBLE)) * (sm / CAST(nr AS DOUBLE)), 0.0)),
        |    6) AS ci_hi
        |FROM st""".stripMargin,

    // the same bounded-histogram band assignment: cumulative counts
    // over rounded-score keys, floor of an exact double product, then
    // before-count + per-score-key row_number
    "q_sample_curriculum" ->
      """WITH base AS (
        |  SELECT doc_id, round(CAST(n_chars AS DOUBLE), 4) AS r
        |  FROM documents WHERE n_chars IS NOT NULL),
        |hist AS (SELECT r, count(*) AS c FROM base GROUP BY r),
        |cum AS (
        |  SELECT r, c,
        |    sum(c) OVER (ORDER BY r) - c AS cumprev,
        |    sum(c) OVER () AS tot
        |  FROM hist),
        |bandtab AS (
        |  SELECT r, cumprev,
        |    LEAST(3, CAST(floor(CAST(cumprev AS DOUBLE) * 4 /
        |      CAST(tot AS DOUBLE)) AS INT)) AS band
        |  FROM cum),
        |bs AS (SELECT band, min(cumprev) AS bstart FROM bandtab
        |       GROUP BY band),
        |lk AS (
        |  SELECT b.r, b.band, b.cumprev - s.bstart AS bf
        |  FROM bandtab b JOIN bs s USING (band)),
        |rn AS (
        |  SELECT doc_id, r,
        |    ROW_NUMBER() OVER (PARTITION BY r ORDER BY doc_id) AS rn
        |  FROM base)
        |SELECT rn.doc_id, lk.band,
        |  CAST(lk.bf + rn.rn AS BIGINT) AS band_rank,
        |  CAST((lk.bf + rn.rn - 1) * 4 + lk.band AS BIGINT)
        |    AS interleave_key
        |FROM rn JOIN lk ON lk.r = rn.r
        |ORDER BY doc_id""".stripMargin,

    // HUGEINT power sums (floor-cast: DuckDB's bare double→int cast
    // ROUNDS), the same exact A/B/C combinations, n-powers cancelled
    "q_stats_moments" ->
      """WITH t AS (
        |  SELECT l_returnflag AS g,
        |    CAST(floor(l_quantity) AS HUGEINT) AS x
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |s AS (
        |  SELECT g, CAST(count(*) AS HUGEINT) AS n, SUM(x) AS s1,
        |    SUM(x * x) AS s2, SUM(x * x * x) AS s3,
        |    SUM(x * x * x * x) AS s4
        |  FROM t GROUP BY 1),
        |f AS (
        |  SELECT g, n, s1,
        |    n * s2 - s1 * s1 AS b,
        |    n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS a,
        |    n * n * n * s4 - 4 * n * n * s1 * s3 +
        |      6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS c
        |  FROM s)
        |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
        |  round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
        |  round(CAST(b AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS variance,
        |  CASE WHEN b > 0 THEN round(CAST(a AS DOUBLE) /
        |    (CAST(b AS DOUBLE) * sqrt(CAST(b AS DOUBLE))), 6)
        |  END AS skewness,
        |  CASE WHEN b > 0 THEN round(CAST(c AS DOUBLE) /
        |    (CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) - 3.0, 6)
        |  END AS kurtosis
        |FROM f ORDER BY l_returnflag""".stripMargin,

    "q_stats_winsorize" ->
      """WITH ranked AS (
        |  SELECT doc_id, source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents),
        |bounds AS (
        |  SELECT source,
        |    max(CASE WHEN rn = (n * 1 + 100 - 1) // 100 THEN n_chars END) AS lo,
        |    max(CASE WHEN rn = (n * 99 + 100 - 1) // 100 THEN n_chars END) AS hi
        |  FROM ranked GROUP BY source)
        |SELECT r.doc_id, r.source, r.n_chars, b.lo, b.hi,
        |  least(greatest(r.n_chars, b.lo), b.hi) AS clipped
        |FROM ranked r JOIN bounds b USING (source)
        |ORDER BY r.doc_id""".stripMargin,

    // same ranked bounds as the winsorize oracle, then drop-and-average:
    // DECIMAL(18,4) sum, (38,4)→DOUBLE hop, ONE double division
    "q_stats_trimmed_mean" ->
      """WITH ranked AS (
        |  SELECT source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents),
        |bounds AS (
        |  SELECT source,
        |    max(CASE WHEN rn = (n * 1 + 100 - 1) // 100 THEN n_chars END) AS lo,
        |    max(CASE WHEN rn = (n * 99 + 100 - 1) // 100 THEN n_chars END) AS hi
        |  FROM ranked GROUP BY source)
        |SELECT r.source, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(CAST(sum(CAST(r.n_chars AS DECIMAL(18,4))) AS DECIMAL(38,4))
        |       AS DOUBLE) / count(*) AS trimmed_mean
        |FROM ranked r JOIN bounds b USING (source)
        |WHERE r.n_chars >= b.lo AND r.n_chars <= b.hi
        |GROUP BY r.source
        |ORDER BY r.source""".stripMargin,

    "q_text_chunks" ->
      """WITH base AS (
        |  SELECT doc_id, trim(text) AS t
        |  FROM documents WHERE doc_id % 23 = 0),
        |toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(t) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(t, ' +') END AS w
        |  FROM base),
        |nz AS (SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) > 0),
        |ids AS (
        |  SELECT doc_id, w,
        |    unnest(range(0, greatest(0, (n - 40 + 30 - 1) // 30) + 1))
        |      AS chunk_id
        |  FROM nz),
        |chunks AS (
        |  SELECT doc_id, chunk_id,
        |    array_to_string(w[chunk_id * 30 + 1 : chunk_id * 30 + 40], ' ')
        |      AS chunk_text
        |  FROM ids)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |  md5(chunk_text) AS chunk_hash,
        |  CAST(len(string_split(chunk_text, ' ')) AS INT) AS n_chunk_tokens
        |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,

    "q_pipeline_curation" ->
      s"""WITH ${gopherCtes("TRUE")},
        |kept AS (
        |  SELECT b.doc_id, b.source, b.text
        |  FROM rules r JOIN base b USING (doc_id)
        |  WHERE r.r_min_tokens AND r.r_max_tokens AND r.r_word_len
        |    AND r.r_stopwords AND r.r_dup_words AND r.r_top_bigram),
        |dedup AS (
        |  SELECT min(doc_id) AS doc_id,
        |    arg_min(source, doc_id) AS source,
        |    len(string_split(text, ' ')) AS n_tok
        |  FROM kept GROUP BY text),
        |tok AS (
        |  SELECT doc_id, source, n_tok,
        |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
        |     ::BIGINT) % 10000 AS bucket
        |  FROM dedup),
        |tot AS (
        |  SELECT source, sum(n_tok) AS total,
        |    CAST(floor(sqrt(CAST(sum(n_tok) AS DOUBLE))) AS HUGEINT) AS wgt
        |  FROM tok GROUP BY source),
        |ws AS (SELECT sum(wgt) AS wsum FROM tot),
        |mixed AS (
        |  SELECT t.doc_id, t.source, t.n_tok
        |  FROM tok t JOIN tot USING (source) CROSS JOIN ws
        |  WHERE CAST(t.bucket AS HUGEINT) * CAST(tot.total AS HUGEINT)
        |          * ws.wsum
        |      < CAST(tot.wgt AS HUGEINT) * 5000 * 10000)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM mixed GROUP BY source ORDER BY source""".stripMargin,

    "q_text_pii" ->
      """WITH injected AS (
        |  SELECT doc_id,
        |    text || CASE WHEN doc_id % 2 = 0
        |      THEN ' contact user' || CAST(doc_id AS VARCHAR) ||
        |           '@example.com or +1-555-' || lpad(CAST(doc_id AS VARCHAR), 6, '0')
        |      ELSE '' END AS text
        |  FROM documents WHERE doc_id % 23 = 0)
        |SELECT doc_id,
        |  md5(regexp_replace(
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+\d{1,3}-\d{3}-\d{4,10}', '<PHONE>', 'g')) AS masked_hash,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\+\d{1,3}-\d{3}-\d{4,10}')) AS INT) AS n_phones
        |FROM injected ORDER BY doc_id""".stripMargin,

    "q_text_readability" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), ' +')) END AS n_words,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
        |  FROM documents WHERE doc_id % 23 = 0)
        |SELECT doc_id,
        |  CAST(n_words AS INT) AS n_words,
        |  CAST(n_sentences AS INT) AS n_sentences,
        |  CAST(n_syllables AS INT) AS n_syllables,
        |  round(206.835 - 1.015 * CAST(n_words AS DOUBLE) / n_sentences
        |        - 84.6 * CAST(n_syllables AS DOUBLE) / greatest(n_words, 1), 6)
        |    AS reading_ease
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_text_fingerprint" ->
      """WITH norm AS (
        |  SELECT doc_id, lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS t
        |  FROM documents WHERE doc_id % 23 = 0),
        |grams AS (
        |  SELECT doc_id, t,
        |    CASE WHEN length(t) >= 8
        |         THEN list_transform(range(1, length(t) - 8 + 2), i -> substr(t, i, 8))
        |         ELSE [t] END AS gs
        |  FROM norm),
        |hashed AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, c) -> (acc * 131 + c) % 1000000007) AS content_hash,
        |    list_transform(gs, g ->
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(g, ''), c -> CAST(ascii(c) AS BIGINT))),
        |        (acc, c) -> (acc * 131 + c) % 1000000007)) AS gram_hashes,
        |    gs
        |  FROM grams)
        |SELECT doc_id, content_hash,
        |  list_min(gram_hashes) AS min_gram_hash,
        |  len(list_distinct(gram_hashes)) AS n_distinct_grams
        |FROM hashed ORDER BY doc_id""".stripMargin,

    "q_text_topgrams" ->
      """WITH grams AS (
        |  SELECT unnest(list_distinct(list_transform(
        |    range(len(string_split(text, ' ')) - 1),
        |    i -> array_to_string(list_slice(string_split(text, ' '), i + 1, i + 2), ' ')))) AS bigram
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2)
        |SELECT bigram, count(*) AS n FROM grams
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin,

    "q_text_linededup" ->
      """WITH doc2 AS (
        |  SELECT doc_id, replace(text, ' table ', chr(10)) AS t FROM documents
        |), s AS (
        |  SELECT doc_id, string_split(t, chr(10)) AS arr FROM doc2
        |), l AS (
        |  SELECT doc_id, unnest(arr) AS line, generate_subscripts(arr, 1) AS pos FROM s
        |), d AS (
        |  SELECT line, count(DISTINCT doc_id) AS docfreq FROM l GROUP BY line
        |), kept AS (
        |  SELECT l.doc_id, l.pos, l.line FROM l JOIN d USING (line)
        |  WHERE d.docfreq <= 2
        |)
        |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS cleaned_text
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // winnowed fingerprints: the same Base-131 mod-1e9+7 rolling gram hash
    // as q_text_fingerprint, then min per window of 8 consecutive gram
    // hashes, distinct per doc
    "q_dedup_spans" ->
      """WITH norm AS (
        |  SELECT doc_id, lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    CASE WHEN length(t) >= 8
        |         THEN list_transform(range(1, length(t) - 8 + 2), i -> substr(t, i, 8))
        |         ELSE [t] END AS gs
        |  FROM norm),
        |hashed AS (
        |  SELECT doc_id,
        |    list_transform(gs, g ->
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(g, ''), c -> CAST(ascii(c) AS BIGINT))),
        |        (acc, c) -> (acc * 131 + c) % 1000000007)) AS gh
        |  FROM grams),
        |fps AS (
        |  SELECT doc_id,
        |    CASE WHEN len(gh) <= 8 THEN [list_min(gh)]
        |         ELSE list_distinct(list_transform(range(1, len(gh) - 8 + 2),
        |                j -> list_min(gh[j:j+7]))) END AS fp
        |  FROM hashed),
        |ex AS (SELECT doc_id, unnest(fp) AS fp FROM fps),
        |docfreq AS (SELECT fp, count(*) AS ndocs FROM ex GROUP BY fp)
        |SELECT e.doc_id,
        |  count(*) AS n_fingerprints,
        |  count(CASE WHEN d.ndocs >= 2 THEN 1 END) AS n_dup_fingerprints,
        |  count(CASE WHEN d.ndocs >= 2 THEN 1 END) * 2 <= count(*) * 1 AS keep
        |FROM ex e JOIN docfreq d USING (fp)
        |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin,

    "q_embed_quantize" ->
      """WITH ex AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |scales AS (
        |  SELECT vec_id, CASE WHEN max(abs(x)) > 0
        |         THEN 127.0 / max(abs(x)) ELSE 0.0 END AS scale
        |  FROM ex GROUP BY vec_id)
        |SELECT e.vec_id,
        |  CAST(min(round(e.x * s.scale)) AS INT) AS q_min,
        |  CAST(max(round(e.x * s.scale)) AS INT) AS q_max,
        |  CAST(SUM(CAST(round(e.x * s.scale) AS BIGINT) * e.d) AS BIGINT) AS q_checksum
        |FROM ex e JOIN scales s ON s.vec_id = e.vec_id
        |GROUP BY e.vec_id ORDER BY e.vec_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(doc_id % 640 + 1 AS INT) AS width,
        |  CAST(doc_id % 480 + 1 AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  CAST(16 + length(text) AS BIGINT) AS n_bytes,
        |  TRUE AS valid
        |FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_id""".stripMargin,

    "q_multimodal_frames" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(f AS INT) AS frame_no,
        |  CAST(f * 64 + 16 AS BIGINT) AS byte_offset
        |FROM documents
        |CROSS JOIN LATERAL (
        |  SELECT unnest(range(0, greatest(CAST(floor(length(text) / 64) AS INT), 1))) AS f) t
        |WHERE doc_id % 31 = 0 ORDER BY doc_id, frame_no""".stripMargin,

    // exact media dedup ≡ min-id per identical BODY: the stub checksum
    // covers body bytes alone (header excluded), and the body is the
    // UTF-8 text — so grouping by text over the duplicated corpus
    // reproduces the (n_bytes, checksum) merge exactly
    "q_media_dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 500000, text FROM documents WHERE doc_id % 20 = 0),
        |keep AS (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text)
        |SELECT k.doc_id,
        |  CASE WHEN k.doc_id % 3 = 0 THEN 'image'
        |       WHEN k.doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
        |    AS media_type
        |FROM keep k ORDER BY doc_id""".stripMargin,

    // media near-dup: the stub perceptual signature IS the 64-bit
    // simhash of the body tokens, so the oracle re-derives the same
    // chunks from the source text (+ the one-token perturbed twins),
    // pairs within hamming ≤ 3, transitive closure, min-id keep
    "q_media_dedup_near" ->
      s"""WITH RECURSIVE corpus AS MATERIALIZED (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0
         |  UNION ALL
         |  SELECT doc_id + 500000, text || ' tailmark' FROM documents
         |  WHERE doc_id % 21 = 0),
         |${simhashChunkCtesFrom("corpus")},
         |pr AS MATERIALIZED (
         |  SELECT a.doc_id AS u, b.doc_id AS v
         |  FROM chunks a JOIN chunks b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1)) +
         |        bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3))
         |        <= 3),
         |edges AS MATERIALIZED (
         |  SELECT u, v FROM pr UNION SELECT v, u FROM pr),
         |reach(id, lab) AS (
         |  SELECT u, u FROM edges
         |  UNION
         |  SELECT e.u, r.lab FROM edges e JOIN reach r ON r.id = e.v),
         |cc AS (SELECT id, min(lab) AS component_id FROM reach GROUP BY id)
         |SELECT c.doc_id,
         |  CASE WHEN c.doc_id % 3 = 0 THEN 'image'
         |       WHEN c.doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
         |    AS media_type
         |FROM corpus c LEFT JOIN cc ON cc.id = c.doc_id
         |WHERE cc.id IS NULL OR cc.id = cc.component_id
         |ORDER BY c.doc_id""".stripMargin,

    // frames: the oracle recomputes the WHOLE chain — frame digests
    // (md5 of 64-byte windows every 32 bytes; the body IS the text and
    // the corpus is all-ASCII so char offsets are byte offsets),
    // pairwise containment over distinct-frame sets, >= 0.5 filter,
    // transitive closure, min-id keep
    "q_media_dedup_frames" ->
      """WITH RECURSIVE corpus AS MATERIALIZED (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 9 = 0),
        |aug AS MATERIALIZED (
        |  SELECT doc_id, text FROM corpus
        |  UNION ALL
        |  SELECT doc_id + 500000, substring(text, 65) FROM corpus
        |  WHERE doc_id % 18 = 0 AND length(text) >= 150),
        |frames AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, md5(substring(text, 1 + f * 32, 64)) AS s
        |  FROM aug, LATERAL (SELECT unnest(range(0,
        |    greatest(CAST(floor((length(text) - 64) / 32.0) AS INT), 0)
        |      + 1)) AS f) t
        |  WHERE length(text) > 0),
        |counts AS MATERIALIZED (
        |  SELECT doc_id, count(*) AS n FROM frames GROUP BY doc_id),
        |shared AS MATERIALIZED (
        |  SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS c
        |  FROM frames a JOIN frames b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pr AS MATERIALIZED (
        |  SELECT u, v FROM shared
        |  JOIN counts cu ON cu.doc_id = shared.u
        |  JOIN counts cv ON cv.doc_id = shared.v
        |  WHERE c * 1.0 / least(cu.n, cv.n) >= 0.5),
        |edges AS MATERIALIZED (
        |  SELECT u, v FROM pr UNION SELECT v, u FROM pr),
        |reach(id, lab) AS (
        |  SELECT u, u FROM edges
        |  UNION
        |  SELECT e.u, r.lab FROM edges e JOIN reach r ON r.id = e.v),
        |cc AS (SELECT id, min(lab) AS component_id FROM reach GROUP BY id)
        |SELECT a.doc_id,
        |  CASE WHEN a.doc_id % 3 = 0 THEN 'image'
        |       WHEN a.doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
        |    AS media_type
        |FROM aug a LEFT JOIN cc ON cc.id = a.doc_id
        |WHERE cc.id IS NULL OR cc.id = cc.component_id
        |ORDER BY a.doc_id""".stripMargin,

    // phash merge components are exactly text-equality groups plus each
    // image's re-encoded variants: the mosaic fixture renders EQUAL
    // texts identically and any byte difference decorrelated (min cross
    // hamming 14 measured), and the DCT hash is exactly invariant to
    // the variants' transforms — so the kept set is min-id per text,
    // which SQL states without recomputing the hash
    "q_media_dedup_audio" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id % 7 = 0 AND length(text) >= 32),
        |keep AS (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text)
        |SELECT doc_id, 'audio' AS media_type
        |FROM keep ORDER BY doc_id""".stripMargin,

    "q_media_dedup_phash" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id % 6 = 0 AND length(text) >= 60
        |    AND doc_id % 640 >= 7 AND doc_id % 480 >= 7),
        |keep AS (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
        |    AS media_type
        |FROM keep ORDER BY doc_id""".stripMargin,

    "q_cdc_compact" ->
      """WITH log AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
        |FROM log WHERE rn = 1 AND op <> 'D'
        |ORDER BY user_id""".stripMargin,

    "q_cdc_history" ->
      """WITH log AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    value
        |  FROM events WHERE user_id < 400),
        |w AS (
        |  SELECT user_id, event_id, value, op, epoch_us(ts) AS vf_us,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) AS vt_us
        |  FROM log)
        |SELECT user_id, event_id, vf_us, vt_us,
        |  vt_us IS NULL AS is_current, value
        |FROM w WHERE op <> 'D'
        |ORDER BY user_id, vf_us, event_id""".stripMargin,

    "q_range_overlap" ->
      """WITH c AS (
        |  SELECT user_id, event_id AS click_id,
        |    epoch_us(ts) - 7200000000 AS c_start,
        |    epoch_us(ts) + 7200000000 AS c_end
        |  FROM events WHERE event_type = 'click'),
        |e AS (
        |  SELECT user_id,
        |    epoch_us(ts) - 7200000000 AS e_start,
        |    epoch_us(ts) + 7200000000 AS e_end
        |  FROM events WHERE event_type = 'error')
        |SELECT click_id, CAST(count(*) AS BIGINT) AS n_overlaps
        |FROM c JOIN e USING (user_id)
        |WHERE c_start <= e_end AND e_start <= c_end
        |GROUP BY click_id ORDER BY click_id""".stripMargin,

    "q_text_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM tok WHERE term <> '' GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
        |s AS (
        |  SELECT doc_id, term,
        |    round(CAST(tf AS DOUBLE) *
        |      (ln((1.0 + CAST(n AS DOUBLE)) / (1.0 + CAST(df AS DOUBLE)))
        |       + 1.0), 6) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT doc_id, term, tfidf,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, term) AS INT) AS rank
        |  FROM s)
        |SELECT doc_id, term, tfidf, rank FROM r
        |WHERE rank <= 3 AND doc_id % 11 = 0
        |ORDER BY doc_id, rank""".stripMargin,

    "q_embed_centroids" ->
      """WITH x AS (
        |  SELECT label, CAST(d.i - 1 AS INT) AS dim,
        |    CAST(round(CAST(embedding[d.i] AS DOUBLE) * 1000000)
        |      AS HUGEINT) AS mx
        |  FROM embeddings
        |  CROSS JOIN LATERAL
        |    (SELECT unnest(range(1, len(embedding) + 1)) AS i) d
        |  WHERE embedding IS NOT NULL)
        |SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(mx) AS DOUBLE) /
        |    (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS mean
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // only the cent CTE of the confusion chain is referenced (unused
    // CTE definitions are pruned); same round(6) means, decimal d²
    "q_embed_separation" ->
      s"""WITH $confusionCtes
        |SELECT a.clab AS label_a, b.clab AS label_b,
        |  round(sqrt(CAST(sum(CAST((a.mean - b.mean) * (a.mean - b.mean)
        |    AS DECIMAL(38,18))) AS DOUBLE)), 6) AS l2
        |FROM cent a JOIN cent b ON b.i = a.i AND a.clab < b.clab
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // micro-unit norms (the cosineSql norm contract) through the exact
    // type-1 MAD chain, summarized per label
    "q_embed_norm_outliers" ->
      """WITH exd AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS xd
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |nu AS (
        |  SELECT vec_id, label,
        |    CAST(round(sqrt(CAST(SUM(CAST(xd * xd AS DECIMAL(38,18)))
        |      AS DOUBLE)) * 1000000) AS BIGINT) AS norm_u
        |  FROM exd GROUP BY 1, 2),
        |med AS (
        |  SELECT label, norm_u AS group_median FROM (
        |    SELECT label, norm_u,
        |      ROW_NUMBER() OVER (PARTITION BY label ORDER BY norm_u) AS rn,
        |      COUNT(*) OVER (PARTITION BY label) AS cnt
        |    FROM nu) t
        |  WHERE rn = (cnt + 1) // 2),
        |dev AS (
        |  SELECT n.label, n.vec_id, n.norm_u, m.group_median,
        |    abs(n.norm_u - m.group_median) AS dv
        |  FROM nu n JOIN med m USING (label)),
        |mad AS (
        |  SELECT label, dv AS group_mad FROM (
        |    SELECT label, dv,
        |      ROW_NUMBER() OVER (PARTITION BY label ORDER BY dv) AS rn,
        |      COUNT(*) OVER (PARTITION BY label) AS cnt
        |    FROM dev) t
        |  WHERE rn = (cnt + 1) // 2),
        |fl AS (
        |  SELECT d.label, d.group_median, m.group_mad,
        |    d.dv > 3 * m.group_mad AS is_outlier
        |  FROM dev d JOIN mad m USING (label))
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  CAST(max(group_median) AS BIGINT) AS median_u,
        |  CAST(max(group_mad) AS BIGINT) AS mad_u
        |FROM fl GROUP BY label ORDER BY label""".stripMargin,

    // same exact dot/norm CTEs as q_ann_bruteforce; the label-mismatch
    // predicate filters BEFORE the per-anchor rank so the top-5 cut is
    // over negatives only
    "q_embed_hardneg" -> cosineSql(
      "a.vec_id % 100 = 0", "TRUE", "a.vec_id <> b.vec_id",
      """SELECT * FROM (
        |  SELECT d.id_a AS query_id, d.id_b AS neighbor_id,
        |    round(d.dot / (na.nrm * nb.nrm), 6) AS cosine,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY d.id_a
        |      ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.id_b) AS INT) AS rank
        |  FROM dots d JOIN norms na ON na.vec_id = d.id_a
        |              JOIN norms nb ON nb.vec_id = d.id_b
        |              JOIN embeddings ea ON ea.vec_id = d.id_a
        |              JOIN embeddings eb ON eb.vec_id = d.id_b
        |  WHERE ea.label <> eb.label) t
        |WHERE rank <= 5""".stripMargin,
      "ORDER BY query_id, rank"),

    "q_embed_confusion" ->
      s"""WITH $confusionCtes
        |SELECT label, predicted, n FROM conf ORDER BY 1, 2""".stripMargin,

    // the confusion chain + Cohen's kappa arithmetic: marginal products
    // in HUGEINT (the DECIMAL(38,0) twin), kappa from UNROUNDED po/pe
    "q_classify_kappa" ->
      s"""WITH $confusionCtes,
        |$kappaTailSql""".stripMargin,

    // the confusion chain + full-outer marginals; F1 in the
    // single-division integer-denominator form
    "q_classify_metrics" ->
      s"""WITH $confusionCtes,
        |rws AS (SELECT label AS l, sum(n) AS rn FROM conf GROUP BY 1),
        |cls AS (SELECT predicted AS p, sum(n) AS cn FROM conf GROUP BY 1),
        |mg AS (
        |  SELECT coalesce(r.l, c.p) AS label, coalesce(r.rn, 0) AS rn,
        |    coalesce(c.cn, 0) AS cn
        |  FROM rws r FULL OUTER JOIN cls c ON c.p = r.l),
        |dg AS (SELECT label, sum(n) AS tp FROM conf
        |       WHERE label = predicted GROUP BY 1)
        |SELECT m.label, CAST(coalesce(d.tp, 0) AS BIGINT) AS tp,
        |  CAST(m.cn - coalesce(d.tp, 0) AS BIGINT) AS fp,
        |  CAST(m.rn - coalesce(d.tp, 0) AS BIGINT) AS fn,
        |  CASE WHEN m.cn > 0 THEN round(CAST(coalesce(d.tp, 0) AS DOUBLE)
        |    / CAST(m.cn AS DOUBLE), 6) END AS "precision",
        |  CASE WHEN m.rn > 0 THEN round(CAST(coalesce(d.tp, 0) AS DOUBLE)
        |    / CAST(m.rn AS DOUBLE), 6) END AS recall,
  |  -- 2·tp + fp + fn = cn + rn exactly, so the integer denominator is
        |  -- the marginal sum
        |  CASE WHEN m.cn + m.rn > 0
        |    THEN round(CAST(2 * coalesce(d.tp, 0) AS DOUBLE) /
        |      CAST(m.cn + m.rn AS DOUBLE), 6) END AS f1
        |FROM mg m LEFT JOIN dg d ON d.label = m.label
        |ORDER BY m.label""".stripMargin,

    "q_text_collapse" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id % 7 = 0 AND text IS NOT NULL),
        |k AS (
        |  SELECT doc_id, toks,
        |    list_filter(toks, (x, i) -> i = 1 OR x <> toks[i - 1]) AS kept
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(toks) - len(kept) AS INT) AS n_removed,
        |  md5(list_aggregate(kept, 'string_agg', ' ')) AS cleaned_md5
        |FROM k ORDER BY doc_id""".stripMargin,

    "q_text_ctfidf" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (
        |  SELECT source, term, count(*) AS tf
        |  FROM tok WHERE term <> '' GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT source) AS n FROM tf),
        |s AS (
        |  SELECT source, term,
        |    round(CAST(tf AS DOUBLE) *
        |      (ln((1.0 + CAST(n AS DOUBLE)) / (1.0 + CAST(df AS DOUBLE)))
        |       + 1.0), 6) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT source, term, tfidf,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY tfidf DESC, term) AS INT) AS rank
        |  FROM s)
        |SELECT source, term, tfidf, rank FROM r
        |WHERE rank <= 5 ORDER BY source, rank""".stripMargin,

    "q_stats_mode" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS n_mode
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, event_type, CAST(n_mode AS BIGINT) AS n_mode,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY n_mode DESC, event_type) AS rn
        |  FROM c)
        |SELECT user_id, event_type, n_mode FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q_hilbert_key" -> hilbertSql,

    "q_text_ttr" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT term) AS BIGINT) AS n_types,
        |  round(CAST(count(DISTINCT term) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE), 6) AS ttr
        |FROM tok WHERE term <> ''
        |GROUP BY source ORDER BY source""".stripMargin,

    "q_text_bursty" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |n AS (SELECT CAST(count(*) AS HUGEINT) AS nn FROM d),
        |tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM d),
        |tc AS (
        |  SELECT t, doc_id, count(*) AS c FROM tok WHERE t <> ''
        |  GROUP BY 1, 2),
        |st AS (
        |  SELECT t, count(*) AS df, sum(CAST(c AS HUGEINT)) AS tf,
        |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS cc
        |  FROM tc GROUP BY t HAVING count(*) >= 5)
        |SELECT * FROM (
        |  SELECT t AS term, CAST(df AS BIGINT) AS df,
        |    CAST(tf AS BIGINT) AS tf,
        |    round(CAST(n.nn * cc - tf * tf AS DOUBLE) /
        |      CAST(n.nn * tf AS DOUBLE), 6) AS vmr,
        |    CAST(ROW_NUMBER() OVER (ORDER BY
        |      round(CAST(n.nn * cc - tf * tf AS DOUBLE) /
        |        CAST(n.nn * tf AS DOUBLE), 6) DESC, t) AS INT) AS rank
        |  FROM st CROSS JOIN n) x
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "q_text_zipf" ->
      """WITH tok AS (
        |  SELECT source AS g, unnest(string_split(text, ' ')) AS t
        |  FROM documents WHERE text IS NOT NULL),
        |gt AS (
        |  SELECT g, t, count(*) AS c FROM tok WHERE t <> '' GROUP BY g, t),
        |rk AS (
        |  SELECT g, c, ROW_NUMBER() OVER (PARTITION BY g
        |    ORDER BY c DESC, t) AS rank
        |  FROM gt),
        |xy AS (
        |  SELECT g, ln(CAST(rank AS DOUBLE)) AS x,
        |    ln(CAST(c AS DOUBLE)) AS y
        |  FROM rk),
        |s AS (
        |  SELECT g, count(*) AS nt,
        |    CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
        |  FROM xy GROUP BY g)
        |SELECT g AS source, CAST(nt AS BIGINT) AS n_types,
        |  CASE WHEN CAST(nt AS DOUBLE) * sxx - sx * sx > 0 THEN
        |    round((CAST(nt AS DOUBLE) * sxy - sx * sy) /
        |      (CAST(nt AS DOUBLE) * sxx - sx * sx), 6) END AS zipf_slope,
        |  CASE WHEN CAST(nt AS DOUBLE) * sxx - sx * sx > 0 THEN
        |    round((sy - ((CAST(nt AS DOUBLE) * sxy - sx * sy) /
        |      (CAST(nt AS DOUBLE) * sxx - sx * sx)) * sx) /
        |      CAST(nt AS DOUBLE), 6) END AS intercept
        |FROM s ORDER BY source""".stripMargin,

    "q_text_entropy" ->
      """WITH tok AS (
        |  SELECT source AS g, unnest(string_split(text, ' ')) AS t
        |  FROM documents WHERE text IS NOT NULL),
        |gt AS (
        |  SELECT g, t, count(*) AS c FROM tok WHERE t <> '' GROUP BY g, t),
        |gr AS (SELECT g, sum(c) AS n, count(*) AS v FROM gt GROUP BY g),
        |terms AS (
        |  SELECT gt.g, gr.n, gr.v,
        |    CAST((CAST(gt.c AS DOUBLE) / CAST(gr.n AS DOUBLE)) *
        |      ln(CAST(gr.n AS DOUBLE) / CAST(gt.c AS DOUBLE))
        |      AS DECIMAL(38,18)) AS h
        |  FROM gt JOIN gr ON gr.g = gt.g)
        |SELECT g AS source, CAST(max(n) AS BIGINT) AS n_tokens,
        |  CAST(max(v) AS BIGINT) AS n_types,
        |  round(CAST(sum(h) AS DOUBLE), 6) AS entropy,
        |  CASE WHEN max(v) > 1 THEN
        |    round(CAST(sum(h) AS DOUBLE) / ln(CAST(max(v) AS DOUBLE)), 6)
        |  END AS norm_entropy
        |FROM terms GROUP BY g ORDER BY g""".stripMargin,

    "q_audit_kanon" ->
      """WITH g AS (
        |  SELECT source, lang, n_chars, count(*) AS n
        |  FROM documents GROUP BY 1, 2, 3),
        |s AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating,
        |    CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |      AS n_rows_at_risk
        |  FROM g)
        |SELECT n_rows, n_groups, n_violating, n_rows_at_risk,
        |  round(CAST(n_rows_at_risk AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
        |    AS risk_share
        |FROM s""".stripMargin,

    "q_audit_benford" ->
      """WITH cents AS (
        |  SELECT CAST(round(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)
        |    AS c
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |d AS (
        |  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM cents WHERE c > 0),
        |cnt AS (SELECT digit, count(*) AS n FROM d GROUP BY digit)
        |SELECT digit, CAST(n AS BIGINT) AS n,
        |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 6)
        |    AS share,
        |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS expected
        |FROM cnt ORDER BY digit""".stripMargin,

    "q_text_hapax" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL),
        |gt AS (
        |  SELECT source, term, count(*) AS c FROM tok
        |  WHERE term <> '' GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE), 6) AS hapax_ratio
        |FROM gt GROUP BY source ORDER BY source""".stripMargin,

    "q_text_overlap" ->
      """WITH tok AS (
        |  SELECT source AS g, unnest(string_split(text, ' ')) AS t
        |  FROM documents WHERE text IS NOT NULL),
        |v AS (SELECT DISTINCT g, t FROM tok WHERE t <> ''),
        |sz AS (SELECT g, count(*) AS nv FROM v GROUP BY g),
        |inter AS (
        |  SELECT a.g AS group_a, b.g AS group_b, count(*) AS n_common
        |  FROM v a JOIN v b ON a.t = b.t AND a.g < b.g
        |  GROUP BY 1, 2)
        |SELECT i.group_a, i.group_b,
        |  CAST(sa.nv AS BIGINT) AS v_a, CAST(sb.nv AS BIGINT) AS v_b,
        |  CAST(i.n_common AS BIGINT) AS n_common,
        |  round(CAST(i.n_common AS DOUBLE) /
        |    CAST(sa.nv + sb.nv - i.n_common AS DOUBLE), 6) AS jaccard
        |FROM inter i JOIN sz sa ON sa.g = i.group_a
        |             JOIN sz sb ON sb.g = i.group_b
        |ORDER BY group_a, group_b""".stripMargin,

    "q_ts_seasonal_profile" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(isodow(day) AS INT) AS isodow,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  round(CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS mean_daily
        |FROM daily GROUP BY 1, 2
        |ORDER BY event_type, isodow""".stripMargin,

    // the corr oracle arithmetic over a 7-day lag window
    "q_ts_autocorr" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS HUGEINT) AS x
        |  FROM events GROUP BY 1, 2),
        |lg AS (
        |  SELECT event_type, x,
        |    lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS y
        |  FROM daily),
        |t AS (SELECT event_type, x, y FROM lg WHERE y IS NOT NULL),
        |a AS (
        |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM t GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |      sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |           CAST(n * syy - sy * sy AS DOUBLE)), 6)
        |  END AS r
        |FROM a ORDER BY event_type""".stripMargin,

    // the linreg oracle arithmetic over a row_number day index
    "q_ts_trend" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS HUGEINT) AS y
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, y,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY day) AS HUGEINT) AS x
        |  FROM daily),
        |a AS (
        |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx
        |  FROM idx GROUP BY 1),
        |f AS (
        |  SELECT event_type, n, sx, sy, n * sxx - sx * sx AS den,
        |    CAST(n * sxy - sx * sy AS DOUBLE) /
        |      CAST(n * sxx - sx * sx AS DOUBLE) AS b
        |  FROM a)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CASE WHEN den > 0 THEN round(b, 6) END AS slope,
        |  CASE WHEN den > 0 THEN round(
        |    (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE), 6) END AS intercept
        |FROM f ORDER BY event_type""".stripMargin,

    "q_ts_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |b AS (
        |  SELECT event_type, day, x,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
        |    SUM(CAST(x AS HUGEINT)) OVER (PARTITION BY event_type
        |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS ps,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n,
        |    SUM(CAST(x AS HUGEINT)) OVER (PARTITION BY event_type) AS s
        |  FROM daily),
        |c AS (
        |  SELECT event_type, day, n, t,
        |    CAST(ps AS DOUBLE) / CAST(t AS DOUBLE) AS ml,
        |    CAST(s - ps AS DOUBLE) /
        |      (CAST(n AS DOUBLE) - CAST(t AS DOUBLE)) AS mr,
        |    round(sqrt(CAST(t AS DOUBLE) *
        |        (CAST(n AS DOUBLE) - CAST(t AS DOUBLE)) /
        |        CAST(n AS DOUBLE)) *
        |      abs(CAST(ps AS DOUBLE) / CAST(t AS DOUBLE) -
        |        CAST(s - ps AS DOUBLE) /
        |        (CAST(n AS DOUBLE) - CAST(t AS DOUBLE))), 6) AS stat
        |  FROM b WHERE t < n),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY stat DESC, t) AS rk
        |  FROM c)
        |SELECT event_type, CAST(n AS BIGINT) AS n, day AS split_after,
        |  stat, round(ml, 6) AS mean_before, round(mr, 6) AS mean_after
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,

    "q_ts_mase" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, n,
        |    lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS ls,
        |    lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1
        |  FROM daily),
        |sc AS (
        |  SELECT * FROM lagged WHERE ls IS NOT NULL AND l1 IS NOT NULL)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
        |  round(CAST(sum(abs(n - ls)) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE), 6) AS mae_seasonal,
        |  round(CAST(sum(abs(n - l1)) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE), 6) AS mae_naive,
        |  CASE WHEN sum(abs(n - l1)) > 0 THEN
        |    round(CAST(sum(abs(n - ls)) AS DOUBLE) /
        |      CAST(sum(abs(n - l1)) AS DOUBLE), 6) END AS mase
        |FROM sc GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_ts_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT event_type, n AS group_median FROM (
        |    SELECT event_type, n,
        |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n) AS rn,
        |      COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |    FROM daily) t
        |  WHERE rn = (cnt + 1) // 2),
        |dev AS (
        |  SELECT d.event_type, d.day, d.n, m.group_median,
        |    abs(d.n - m.group_median) AS dv
        |  FROM daily d JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, dv AS group_mad FROM (
        |    SELECT event_type, dv,
        |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dv) AS rn,
        |      COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |    FROM dev) t
        |  WHERE rn = (cnt + 1) // 2)
        |SELECT d.event_type, d.day, d.n, d.group_median, m.group_mad,
        |  d.dv > 3 * m.group_mad AS is_outlier
        |FROM dev d JOIN mad m USING (event_type)
        |ORDER BY event_type, day""".stripMargin,

    "q_ts_ewma" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(floor(CAST(value AS DECIMAL(18,4)) * 100) AS BIGINT)
        |      AS cents
        |  FROM events WHERE user_id < 200),
        |a AS (
        |  SELECT user_id, event_id, ts_us, cents,
        |    list(cents) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS arr
        |  FROM e)
        |SELECT user_id, event_id, cents,
        |  round(
        |    CAST(list_sum(list_transform(arr, (x, i) ->
        |      CAST(x AS HUGEINT) *
        |      [1,3,9,27,81,243,729,2187,6561,19683,59049,177147,531441,
        |       1594323,4782969,14348907][len(arr) - i + 1] *
        |      [1,4,16,64,256,1024,4096,16384,65536,262144,1048576,
        |       4194304,16777216,67108864,268435456,1073741824][i]))
        |      AS DOUBLE) /
        |    CAST(list_sum(list_transform(arr, (x, i) ->
        |      CAST([1,3,9,27,81,243,729,2187,6561,19683,59049,177147,
        |       531441,1594323,4782969,14348907][len(arr) - i + 1]
        |        AS HUGEINT) *
        |      [1,4,16,64,256,1024,4096,16384,65536,262144,1048576,
        |       4194304,16777216,67108864,268435456,1073741824][i]))
        |      AS DOUBLE), 6) AS ewma
        |FROM a ORDER BY user_id, event_id""".stripMargin,

    "q_audit_skew" ->
      """WITH c AS (
        |  SELECT coalesce(CAST(l_suppkey AS VARCHAR), '<NULL>') AS key,
        |    count(*) AS n_rows
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(n_rows) AS total FROM c)
        |SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
        |  round(CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
        |FROM c, t
        |ORDER BY n_rows DESC, key LIMIT 20""".stripMargin,

    "q_cdc_lookup" ->
      """WITH log AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    value,
        |    row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type <> 'click'),
        |v AS (
        |  SELECT user_id, ts AS vts, event_id AS version_id, op,
        |    value AS state_value
        |  FROM log WHERE rn = 1),
        |p AS (
        |  SELECT user_id, event_id AS probe_id, ts
        |  FROM events WHERE event_type = 'click'),
        |u AS (
        |  SELECT user_id, ts, 1 AS is_left, probe_id,
        |    NULL::STRUCT(version_id BIGINT, op VARCHAR,
        |                 state_value DOUBLE) AS r
        |  FROM p
        |  UNION ALL
        |  SELECT user_id, vts, 0, NULL,
        |    {'version_id': version_id, 'op': op,
        |     'state_value': state_value}
        |  FROM v),
        |w AS (
        |  SELECT user_id, ts, is_left, probe_id,
        |    last_value(r IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, is_left
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
        |  FROM u)
        |SELECT probe_id, user_id,
        |  CASE WHEN m.op = 'D' THEN NULL ELSE m.version_id END
        |    AS version_id,
        |  CASE WHEN m.op = 'D' THEN NULL ELSE m.state_value END
        |    AS state_value
        |FROM w WHERE is_left = 1 ORDER BY probe_id""".stripMargin,

    "q_sample_weighted" ->
      """WITH p AS (
        |  SELECT doc_id, n_chars,
        |    round(exp(ln(
        |      (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
        |         ::BIGINT AS DOUBLE) + 1.0) / 281474976710656.0)
        |      / CAST(n_chars AS DOUBLE)), 9) AS priority
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |r AS (
        |  SELECT doc_id, n_chars, priority,
        |    CAST(row_number() OVER (ORDER BY priority DESC, doc_id)
        |      AS INT) AS sample_rank
        |  FROM p)
        |SELECT doc_id, n_chars, priority, sample_rank FROM r
        |WHERE sample_rank <= 100 ORDER BY sample_rank""".stripMargin,

    "q_graph_triangles" ->
      """WITH tot AS (SELECT count(*) AS n FROM lineitem),
        |e AS (
        |  SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e, tot WHERE src <> dst AND w * 650 >= n),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM und e1
        |  JOIN und e2 ON e1.b = e2.a
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM (SELECT unnest([x, y, z]) AS id FROM tri) t
        |JOIN nation ON id = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )

  /** DuckDB mirror of Zorder.hilbertKey: the 8-level state machine
    * unrolls into one CTE per level, threading (d, st) through the same
    * two 16-element lookup tables the operator inlines. */
  private def hilbertSql: String = {
    val out = "[0,1,3,2,0,3,1,2,2,1,3,0,2,3,1,0]"
    val nxt = "[1,0,2,0,0,3,1,1,2,2,0,3,3,1,3,2]"
    val steps = (7 to 0 by -1).zipWithIndex.map { case (lvl, i) =>
      val prev = if (i == 0) "b" else s"h${i - 1}"
      val pd = if (i == 0) "CAST(0 AS BIGINT)" else "d"
      val ps = if (i == 0) "0" else "st"
      val quad = s"((bx >> $lvl) & 1) * 2 + ((by >> $lvl) & 1)"
      s"""h$i AS (
         |  SELECT o_orderkey, bx, by,
         |    $pd * 4 + CAST(list_extract($out,
         |      $ps * 4 + $quad + 1) AS BIGINT) AS d,
         |    list_extract($nxt, $ps * 4 + $quad + 1) AS st
         |  FROM $prev)""".stripMargin
    }
    s"""WITH b AS (
       |  SELECT o_orderkey,
       |    o_custkey % 256 AS bx,
       |    CAST(floor(o_totalprice) AS BIGINT) % 256 AS by
       |  FROM orders),
       |${steps.mkString(",\n")}
       |SELECT o_orderkey, d AS hkey FROM h7 ORDER BY o_orderkey""".stripMargin
  }
}
