package graft.ops

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.slf4j.LoggerFactory

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design notes (the point of each algorithm at 100 TB):
  *   - exact: one shuffle on a 128-bit content hash — never on the content
  *     itself (hash first, shuffle 16 bytes/row, not documents).
  *   - MinHash+LSH: signatures are computed MAP-SIDE with higher-order
  *     array expressions (no explode, no shuffle); only (band, bandhash)
  *     pairs shuffle — 32 ints/doc. Candidate pairs are verified with exact
  *     Jaccard so precision is 1; banding (b=32, r=4) gives recall
  *     1-(1-s^4)^32 ≈ 1-4e-8 at s=0.8.
  *   - SimHash: 64-bit signature map-side; pigeonhole banding into 4
  *     16-bit chunks means a pair with hamming ≤ 3 must share a chunk —
  *     candidates come from 4 equi-joins, verified with bit_count(xor).
  *   - n-gram Jaccard: the exact quadratic baseline — kept for correctness
  *     oracles and small slices; the LSH paths are the scale story.
  */
object Dedup {

  private val log = LoggerFactory.getLogger("graft.ops.Dedup")

  /** Single-split inputs starve signature compute of parallelism, so in
    * LOCAL mode the corpus is repartitioned to 2×parallelism. The
    * repartition alone is NOT enough: the ColumnPruning rule pushes
    * deterministic projections below the exchange, putting the expensive
    * expressions back on the single input split — the cache() boundary
    * (InMemoryRelation is a leaf) pins the downstream compute above the
    * exchange.
    *
    * This is a SMALL-INPUT crutch, so the DEFAULT follows the master: in
    * `local[*]` runs it is on (single parquet files arrive as one split);
    * on a real cluster it is OFF automatically — parallelism comes from
    * the input splits themselves and caching a 100 TB corpus is not a
    * plan. `spark.graft.spreadInput` overrides either way.
    *
    * Callers must PROJECT before spreading: the cache boundary is a leaf
    * Catalyst cannot prune columns through, so spread(df.select(needed))
    * keeps both the parquet ReadSchema and the cached footprint narrow. */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val dflt = spark.sparkContext.isLocal.toString
    if (!spark.conf.get("spark.graft.spreadInput", dflt).toBoolean) df
    else {
      val target = spark.sparkContext.defaultParallelism * 2
      df.repartition(target).cache()
    }
  }

  /** Signature-reuse cache: both sides of a band self-join read the same
    * signatures, so caching them halves the compute on a single box. Like
    * [[spread]], materializing the corpus is not a 100 TB plan — controlled
    * by `spark.graft.cacheSignatures`, which DEFAULTS to the
    * `spark.graft.spreadInput` value (itself defaulting to "is this a
    * local master", so cluster runs get streaming scans automatically)
    * but can be set independently: a cluster job may want streaming scans
    * (spreadInput=false) while still caching the — much narrower —
    * signature projection (cacheSignatures=true). */
  private[graft] def maybeCache(df: DataFrame): DataFrame =
    if (!cacheSignaturesOn(df.sparkSession)) df else df.cache()

  /** The [[maybeCache]] policy bit, exposed for operators that gate a
    * different materialization (e.g. a lineage-truncating
    * localCheckpoint) on the same "may this run hold a corpus-sized
    * intermediate" decision. */
  private[graft] def cacheSignaturesOn(spark: SparkSession): Boolean = {
    val dflt = spark.conf.get("spark.graft.spreadInput",
      spark.sparkContext.isLocal.toString)
    spark.conf.get("spark.graft.cacheSignatures", dflt).toBoolean
  }

  /** Band-bucket guard for the LSH candidate joins: a bucket holding f
    * rows emits f² candidate pairs, so a corpus with a large cluster of
    * IDENTICAL (or boilerplate-identical) documents turns every banded
    * self-join quadratic in that cluster's size — the same skew vector
    * the shingle-df cap closes for the exact paths. Buckets past
    * `spark.graft.maxBandBucket` (default 100000 — far above anything a
    * healthy corpus produces per 64-bit band key) are dropped before
    * pairing. Oversized buckets are usually exact-duplicate clusters in
    * disguise: run [[exact]] dedup FIRST (the standard pipeline order)
    * and they rarely form.
    *
    * Mechanism: candidate pairs come from ONE shuffle and ONE pass over
    * the data — repartition on the bucket key, sort within partitions
    * (external sort: spills, never OOMs), and stream each key run
    * through a bounded emitter that buffers at most cap+1 ids. A run
    * that exceeds the cap stops buffering (the buffer is released),
    * keeps counting, and emits a single SENTINEL row carrying the
    * bucket's size; a run within the cap lazily yields its C(n,2)
    * ordered pairs without ever materializing them. Memory is O(cap)
    * per bucket regardless of input skew — a 10⁸-row mega-cluster costs
    * a straggling (narrow-row) sort partition, never an executor OOM.
    * An earlier two-pass variant (count-per-key pre-pass, broadcast
    * anti-join, then `collect_list`) had the same memory bound but paid
    * a second full pass over the banded rows — measured 2-4× slower at
    * sf0.1 — and `collect_list` itself falls back to sort-based
    * aggregation past 128 distinct keys anyway, so the sort is not an
    * added cost. For corpora known to hold mega-clusters where even
    * shuffling the hot rows is unwanted, `spark.graft.bucketGuardPrepass
    * =true` re-enables the anti-join pre-pass (drops hot keys map-side,
    * before the shuffle) in front of the streaming emitter.
    *
    * Observability: dropping a bucket silently loses near-dup recall for
    * the docs inside it, so the sentinel rows feed an `observe` metric
    * and a session-wide [[QueryExecutionListener]] logs a WARN with the
    * dropped-bucket count and the worst bucket's size whenever the guard
    * filtered anything — no extra Spark job, the metric rides the main
    * query. `cap` ≤ 0 disables the guard, never the pattern. */
  private[graft] def bucketPairs(rows: DataFrame, keyCols: Seq[String],
      cap: Int): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = rows.sparkSession
    val keyN = keyCols.length
    val proj = rows.select(keyCols.map(col) :+ col("id"): _*)
    val idType = proj.schema.last.dataType
    val prepass = spark.conf.get("spark.graft.bucketGuardPrepass", "false").toBoolean
    val input =
      if (cap <= 0 || !prepass) proj
      else { // optional pre-shuffle drop of hot keys (see scaladoc) —
        // observed like the sentinel path: a prepass drop must be as
        // loud as a streaming drop
        registerGuardListener(spark)
        // count non-null ids only, matching the streaming emitter's cap
        // (null ids never pair) — both guard modes agree near the cap
        val hot = proj.groupBy(keyCols.map(col): _*)
          .agg(count(col("id")).as("__n")).filter(col("__n") > cap)
          .observe(s"graft_bucket_guard_${guardSeq.incrementAndGet()}" +
              s"_prepass_cap${cap}_${keyCols.mkString("_")}",
            count(lit(1)).as("dropped_buckets"),
            max(col("__n")).as("largest_bucket"))
          .select(keyCols.map(col): _*)
        proj.join(broadcast(hot), keyCols, "left_anti")
      }
    val outSchema = StructType(Seq(
      StructField("id_a", idType, nullable = true),
      StructField("id_b", idType, nullable = true),
      StructField("__dropped", LongType, nullable = true)))
    // N-less repartition on purpose: AQE sizes the exchange adaptively —
    // coalescing a small banded set to few tasks locally while a cluster
    // run over 100 TB keeps thousands of partitions
    val emitted = input
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col): _*)
      .mapPartitions { it =>
        val bit = it.buffered
        new Iterator[org.apache.spark.sql.Row] {
          private var pending: Iterator[org.apache.spark.sql.Row] = Iterator.empty
          private def cmp(a: Any, b: Any): Int =
            a.asInstanceOf[Comparable[Any]].compareTo(b)
          private def advance(): Unit =
            while (!pending.hasNext && bit.hasNext) {
              val first = bit.next()
              // null ids never pair (collect_list semantics: the cap and
              // the emitted pairs both see only non-null ids)
              val buf = scala.collection.mutable.ArrayBuffer[Any]()
              if (first.get(keyN) != null) buf += first.get(keyN)
              var n = 1L
              var overflow = false
              def same(r: org.apache.spark.sql.Row): Boolean = {
                var i = 0
                while (i < keyN) { if (r.get(i) != first.get(i)) return false; i += 1 }
                true
              }
              while (bit.hasNext && same(bit.head)) {
                val r = bit.next(); n += 1
                val v = r.get(keyN)
                if (!overflow && v != null) {
                  buf += v
                  if (cap > 0 && buf.length > cap) { overflow = true; buf.clear() }
                }
              }
              pending =
                if (overflow)
                  Iterator.single(org.apache.spark.sql.Row(null, null, n))
                else if (buf.length < 2) Iterator.empty
                else {
                  val ids = buf.sortWith(cmp(_, _) < 0)
                  ids.indices.iterator.flatMap(i =>
                    (i + 1 until ids.length).iterator.map(j =>
                      org.apache.spark.sql.Row(ids(i), ids(j), null)))
                }
            }
          override def hasNext: Boolean = { advance(); pending.hasNext }
          override def next(): org.apache.spark.sql.Row = { advance(); pending.next() }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
    val observed =
      if (cap <= 0) emitted
      else {
        registerGuardListener(spark)
        emitted.observe(s"graft_bucket_guard_${guardSeq.incrementAndGet()}" +
            s"_cap${cap}_${keyCols.mkString("_")}",
          count(when(col("id_a").isNull, lit(1))).as("dropped_buckets"),
          max(col("__dropped")).as("largest_bucket"))
      }
    observed.filter(col("id_a").isNotNull)
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Unique observe-metric names: Catalyst rejects duplicate
    * CollectMetrics names within one query, and a composed pipeline can
    * route several near-dup ops into a single plan. */
  private val guardSeq = new AtomicInteger(0)

  /** Sessions that already carry the guard listener (weak keys — a
    * retired session must not be pinned by the guard). */
  private val guardListenerSessions =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  private def registerGuardListener(spark: SparkSession): Unit =
    if (guardListenerSessions.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_bucket_guard") &&
                row.getAs[Long]("dropped_buckets") > 0L)
              log.warn(s"$name: dropped ${row.getAs[Long]("dropped_buckets")} " +
                s"oversized bucket(s), largest ${row.getAs[Long]("largest_bucket")} " +
                "rows — candidate pairs inside them are NOT emitted (silent " +
                "near-dup recall loss). Run exact dedup first, or raise " +
                "spark.graft.maxBandBucket / spark.graft.maxShingleDf.")
          }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }

  private[graft] def maxBandBucket(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.graft.maxBandBucket", "100000").toInt

  /** Word k-shingles, distinct, guarded for short docs. Shingle text is
    * space-joined so a DuckDB oracle can reproduce it byte-for-byte. */
  def shingleExpr(textCol: String, k: Int): Column = expr(
    s"""CASE WHEN size(split($textCol, ' ')) >= $k THEN
       |  array_distinct(transform(
       |    sequence(0, size(split($textCol, ' ')) - $k),
       |    i -> concat_ws(' ', slice(split($textCol, ' '), i + 1, $k))))
       |ELSE array() END""".stripMargin)

  /** Benchmark decontamination: flag corpus documents sharing any word
    * k-gram with a benchmark/eval set (the standard n-gram overlap test
    * applied before training). Shape: explode corpus k-grams (map-side),
    * semi-join against the benchmark's DISTINCT k-gram set — which is
    * small and broadcastable, so at 100 TB this is a broadcast semi-join
    * over a map-side explode, no corpus shuffle. Emits
    * (id, n_hits = how many distinct k-grams of the doc appear in the
    * benchmark). The oracle-checked form joins on shingle TEXT; for
    * longer grams at scale, join on xxhash64(shingle)
    * (`shingle_hashes`) to shrink the shuffle/broadcast width. */
  def contaminated(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val d = docs.select(col(idCol),
      explode(shingleExpr(textCol, k)).as("__gram"))
    val b = bench.select(explode(shingleExpr(textCol, k)).as("__gram")).distinct()
    d.join(broadcast(b), "__gram")
      .groupBy(col(idCol))
      .agg(countDistinct(col("__gram")).as("n_hits"))
  }

  /** Exact dedup: keep the lowest id per identical content. The shuffle
    * key is md5(content) — constant width regardless of document size. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.withColumn("__h", md5(col(contentCol)))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("__h")

  /** Line-level dedup (CCNet/Gopher boilerplate removal): drop every
    * LINE whose document frequency across the corpus exceeds `maxDocFreq`
    * (nav bars, cookie banners, license footers), keeping the remaining
    * lines in original order. Documents whose every line is boilerplate
    * drop out entirely.
    *
    * Scale shape: posexplode is narrow; the doc-frequency aggregate
    * shuffles (md5(line), doc) pairs — 16-byte keys, never documents; the
    * hot-line set is then LEFT ANTI joined back. Its size is bounded by
    * total_lines / maxDocFreq, so AQE turns the anti join into a
    * broadcast on real corpora; reassembly is one shuffle by doc id.
    * (reference has no line-level op — this is the training-data pipeline
    * extension; cf. CCNet §3.1 paragraph dedup, Gopher §A.1.1.) */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Int): DataFrame = {
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n"))
        .as(Seq("__pos", "__line")))
      .withColumn("__lh", md5(col("__line")))
    // doc frequency per line content; distinct first so a doc repeating
    // its own line counts once (two-phase partial agg either way)
    val hot = lines.select(col("__lh"), col(idCol)).distinct()
      .groupBy("__lh").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDocFreq)
      .select("__lh")
    lines.join(hot, Seq("__lh"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line")), "\n").as("cleaned_text"))
  }

  /** Cross-document duplicated-SPAN gate — the granularity between
    * whole-document dedup and [[lineDedup]]'s line dedup: detect documents
    * that share long verbatim substrings with other documents (templated
    * mirrors, quoted reposts, licence blocks mid-text), the signal behind
    * suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"). A distributed suffix
    * array is not a Spark-shaped plan; the scalable stand-in is winnowed
    * rolling-hash fingerprints (Schleimer et al. 2003): any shared span of
    * ≥ k + w − 1 normalized chars is GUARANTEED to plant at least one
    * identical fingerprint in both documents regardless of alignment —
    * tiled/strided k-gram schemes miss offset-shifted copies.
    *
    * Output per document: `n_fingerprints`, `n_dup_fingerprints` (those
    * shared with ≥ `minDocFreq`−1 OTHER documents), and `keep` — true iff
    * n_dup · den ≤ num · n_total with the duplicated-fraction threshold
    * `maxDupFrac = num/den` applied by INTEGER cross-multiplication (no
    * keep decision sits on a float boundary).
    *
    * Scale shape: fingerprints are selected MAP-SIDE in one O(len) native
    * pass (expected ~2·len/(w+1) 8-byte values per doc — the winnowing
    * density bound); only (fingerprint, doc) longs shuffle, never text.
    * The document-frequency aggregate is partial-agg'd; the hot set is
    * bounded by total_fps/minDocFreq so AQE broadcasts the rejoin; the
    * per-doc recount reuses the exploded pairs. Like every dedup guard
    * here, run [[exact]] dedup first so identical documents don't inflate
    * every span's frequency. */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 8, minDocFreq: Int = 2,
      maxDupFracNum: Int = 1, maxDupFracDen: Int = 2): DataFrame = {
    import graft.expressions.PipelineExpressions
    require(k >= 2 && w >= 1, s"need k >= 2, w >= 1: k=$k w=$w")
    require(minDocFreq >= 2, s"minDocFreq must be >= 2: $minDocFreq")
    require(maxDupFracDen > 0 && maxDupFracNum >= 0,
      s"threshold must be a nonnegative fraction: $maxDupFracNum/$maxDupFracDen")
    // the fingerprint table has TWO consumers (the document-frequency
    // aggregate and the per-doc recount join), and the normalize +
    // winnow projection sits ABOVE the spread cache — without a boundary
    // here both consumers re-run the regex + O(len) winnowing pass over
    // the corpus. The cached rows are (id, fp) longs, far narrower than
    // the text the spread cache holds.
    val fps = maybeCache(spread(df.select(col(idCol), col(textCol)))
      .withColumn("__norm",
        lower(regexp_replace(col(textCol), "[^a-zA-Z0-9 ]", "")))
      .select(col(idCol),
        explode(PipelineExpressions.winnowed_fingerprints(
          col("__norm"), k, w)).as("__fp")))
    // fingerprints are distinct per doc by construction, so the count per
    // __fp IS the document frequency
    val hot = fps.groupBy("__fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select(col("__fp"), lit(1).as("__dup"))
    fps.join(hot, Seq("__fp"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_fingerprints"),
        count(col("__dup")).as("n_dup_fingerprints"))
      .withColumn("keep",
        col("n_dup_fingerprints") * maxDupFracDen <=
          col("n_fingerprints") * maxDupFracNum)
  }

  /** MinHash signature via affine permutations over precomputed shingle
    * hashes: permutation p is h ↦ ((2p+3)·h + 12582917·p) mod (2^31−1) —
    * pure integer math, no per-permutation string hashing (the naive form
    * re-hashes every shingle per permutation and is ~50× slower
    * interpreted). Map-side only; products stay < 2^40 so ANSI overflow
    * checking never trips. */
  def minhashSignature(hashesCol: String, perms: Int): Column = expr(
    s"""transform(sequence(0, ${perms - 1}),
       |  p -> array_min(transform($hashesCol,
       |         h -> ((2L * p + 3L) * (h & 2147483647L) + 12582917L * p) % 2147483647L)))""".stripMargin)

  /** LSH candidate pairs from banded minhash signatures, verified with
    * exact Jaccard ≥ `threshold` over the shingle sets. Output: (id_a,
    * id_b, jaccard) with id_a < id_b.
    *
    * Default banding r=6 × b=21 (126 of 128 perms): for this corpus's
    * near-dup band (s ≥ 0.9) the per-pair miss probability is
    * (1−0.9^6)^21 ≈ 1e-7, while background pairs (s ≤ 0.3) collide on a
    * band with probability ≤ 21·0.3^6 ≈ 1.5% — candidate volume stays
    * linear-ish. Verification is over xxhash64'd shingles (long arrays),
    * not strings: same Jaccard modulo 2^-64 collisions, far cheaper
    * set ops and join payloads. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, perms: Int = 128, bands: Int = 21,
      threshold: Double = 0.8): DataFrame =
    minhashNearDupsFromSigs(
      maybeCache(minhashSignatures(df, idCol, textCol, k, perms)),
      perms, bands, threshold, maxBandBucket(df))

  /** [[minhashNearDups]] from an already-computed (id, shh, sig)
    * signature table — the entry point when the signatures are a
    * PERSISTED index (the incremental-pipeline state) rather than a
    * throwaway projection, so a run never re-shingles what it stored. */
  def minhashNearDupsFromSigs(sigs: DataFrame, perms: Int, bands: Int,
      threshold: Double, maxBucket: Int): DataFrame = {
    // Candidates come from the one-shuffle bucket-pairs aggregate over
    // narrow (id, band, bandhash) rows; the heavy shingle-hash arrays
    // join back ONLY for the deduplicated candidate pairs (the same
    // narrow-then-rejoin shape as [[shingleCandidates]]).
    val pairIds = bucketPairs(bandedOf(sigs, perms, bands),
      Seq("band", "bandhash"), maxBucket)
    val candidates = pairIds
      .join(sigs.select(col("id").as("id_a"), col("shh").as("sh_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("shh").as("sh_b")), "id_b")
    verifyJaccard(candidates, threshold)
  }

  /** The (id, shh, sig) signature table [[minhashNearDups]] computes
    * internally, exposed so it can be PERSISTED as a dedup index: an
    * incremental pipeline materializes this once per corpus slice (an
    * incremental model append is the natural home) and then dedups each
    * new batch against it with [[minhashNearDupsIncremental]] — never
    * re-reading, re-shingling, or re-pairing the historical corpus.
    * `shh` (the exact shingle-hash set) rides along because the exact
    * Jaccard verify needs it; storing it costs ~the corpus's distinct
    * k-gram footprint and is what keeps incremental precision at 1. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, perms: Int = 128): DataFrame = {
    import graft.expressions.PipelineExpressions._
    spread(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("id"),
        shingle_hashes(col(textCol), k).as("shh"))
      .filter(size(col("shh")) > 0)
      .withColumn("sig", minhash_sig(col("shh"), perms))
  }

  /** (id, band, bandhash) rows from a signature table. Band hash =
    * xxhash64 FOLD over the slice's longs (seeded with the band index) —
    * pure integer codegen; the stringify-and-concat form measured 2×
    * slower over the same slices with the identical candidate sets (any
    * injective-enough mix works, the exact-Jaccard verify keeps the
    * output independent of the hash choice).
    *
    * Public as [[bandedRows]] so an incremental pipeline can PERSIST
    * the banded twin of its signature index: batch runs then band the
    * history by scanning three integer columns instead of re-folding
    * xxhash over every stored 128-long signature array (at 100 TB the
    * index's sig/shh arrays dominate its bytes; the banded twin is the
    * only part the per-batch candidate join needs). */
  def bandedRows(sigs: DataFrame, perms: Int, bands: Int): DataFrame =
    bandedOf(sigs, perms, bands)

  private def bandedOf(sigs: DataFrame, perms: Int, bands: Int): DataFrame = {
    val r = perms / bands
    sigs.select(col("id"),
      posexplode(expr(
        s"""transform(sequence(0, ${bands - 1}),
           |  b -> aggregate(slice(sig, b * $r + 1, $r),
           |         xxhash64(b), (acc, v) -> xxhash64(acc, v)))""".stripMargin))
        .as(Seq("band", "bandhash")))
  }

  /** Incremental MinHash dedup: near-dup pairs of a NEW batch against
    * itself AND against a persisted [[minhashSignatures]] index — the
    * continuous-ingest shape. At 100 TB you dedup the daily slice, not
    * the corpus: this touches the historical data only through its
    * narrow signature table, and even that is pre-pruned to the buckets
    * the new batch actually collides with (a left-semi join on the
    * band keys), so settled old×old pairs are never enumerated, let
    * alone re-verified.
    *
    * Contract: batch and index ids are disjoint (same id space, new
    * docs only in the batch). Recall is the banding recall of the
    * parameters — identical per-pair to the full-corpus operator, since
    * band collision depends only on the two signatures involved.
    * Output: (id_a, id_b, jaccard) with id_a < id_b, exact-Jaccard
    * verified (precision 1), old×old pairs excluded by construction. */
  def minhashNearDupsIncremental(newDf: DataFrame, idCol: String,
      textCol: String, index: DataFrame, k: Int = 3, perms: Int = 128,
      bands: Int = 21, threshold: Double = 0.8): DataFrame =
    minhashNearDupsIncrementalFromSigs(
      minhashSignatures(newDf, idCol, textCol, k, perms), index,
      bandedOf(index, perms, bands), perms, bands, threshold,
      maxBandBucket(newDf))

  /** Core of [[minhashNearDupsIncremental]] over PRECOMPUTED batch
    * signatures and a banded index. `bandedIndex` is (id, band,
    * bandhash) — normally the PERSISTED banded twin of the signature
    * index (see [[bandedRows]]), so the history's heavy sig/shh arrays
    * are never read for banding; they join back only for the verified
    * candidate ids. The caller owns `newSigs`' lifecycle (an
    * incremental pipeline reuses the same frame for the deferred
    * index append). */
  def minhashNearDupsIncrementalFromSigs(newSigs: DataFrame,
      index: DataFrame, bandedIndex: DataFrame, perms: Int, bands: Int,
      threshold: Double, maxBucket: Int): DataFrame = {
    val ns = maybeCache(newSigs)
    val idxSigs = index.select(col("id"), col("shh"))
    // bandedNew is NOT cached: it is a cheap map-side derivation of the
    // cached signatures, and a per-batch cache here is exactly the
    // accumulating-blocks leak the pipeline's newSigs.unpersist() closes
    // — the caller can release ns, but not an internal cache
    val bandedNew = bandedOf(ns, perms, bands)
    // index rows survive only where a new row shares their bucket
    val bandedIdx = bandedIndex.select(col("id"), col("band"),
        col("bandhash"))
      .join(bandedNew.select("band", "bandhash").distinct(),
        Seq("band", "bandhash"), "left_semi")
    val pairIds = bucketPairs(bandedNew.unionByName(bandedIdx),
      Seq("band", "bandhash"), maxBucket)
    // drop the residual old×old pairs (two index docs colliding inside
    // a bucket the batch also touches)
    val aNew = ns.select(col("id").as("id_a"), lit(true).as("__an"))
    val bNew = ns.select(col("id").as("id_b"), lit(true).as("__bn"))
    val filtered = pairIds
      .join(aNew, Seq("id_a"), "left").join(bNew, Seq("id_b"), "left")
      .filter(coalesce(col("__an"), lit(false)) ||
        coalesce(col("__bn"), lit(false)))
      .select("id_a", "id_b")
    val allSigs = ns.select("id", "shh")
      .unionByName(idxSigs.select("id", "shh"))
    val candidates = filtered
      .join(allSigs.select(col("id").as("id_a"), col("shh").as("sh_a")),
        "id_a")
      .join(allSigs.select(col("id").as("id_b"), col("shh").as("sh_b")),
        "id_b")
    verifyJaccard(candidates, threshold)
  }

  /** Exact all-pairs n-gram Jaccard ≥ threshold (quadratic baseline,
    * shingle-share pruned via [[shingleCandidates]]). */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8): DataFrame =
    verifyJaccard(shingleCandidates(df, idCol, textCol, k), threshold)

  private def verifyJaccard(candidates: DataFrame, threshold: Double): DataFrame = {
    import graft.expressions.PipelineExpressions._
    candidates
      .withColumn("jaccard", jaccard_sets(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash packed into 4×16-bit int chunks (columns c0..c3).
    * Bit j's weight = Σ over tokens of (bit_j(md5(token)) ? +1 : -1); the
    * bit is set iff the weight is positive. Bits derive from md5 hex
    * digits, so any engine with md5 computes the identical signature —
    * that is what makes the DuckDB oracle possible. Map-side only. */
  def withSimhashChunks(df: DataFrame, textCol: String): DataFrame = {
    import graft.expressions.PipelineExpressions._
    df.withColumn("__chunks", simhash_chunks(col(textCol)))
      .withColumn("c0", expr("__chunks[0]")).withColumn("c1", expr("__chunks[1]"))
      .withColumn("c2", expr("__chunks[2]")).withColumn("c3", expr("__chunks[3]"))
      .drop("__chunks")
  }

  /** SimHash near-dups: pairs with hamming distance ≤ maxHamming. With 4
    * chunks and maxHamming ≤ 3, every qualifying pair shares ≥1 chunk
    * (pigeonhole), so candidates come from ONE banded equi-join on
    * (chunk index, chunk value) — each doc explodes to 4 narrow rows and
    * the whole candidate generation is a single shuffle, the same shape
    * as the MinHash banding (4 separate per-chunk joins produce the same
    * pairs with 4× the shuffle stages). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame =
    // one-shuffle bucket-pairs over narrow (id, band, bv) rows; chunks
    // join back only for the candidate pairs' hamming verification —
    // the SAME banding/verify core the persisted-index paths use, so
    // the operator and the index round trip cannot drift apart
    simhashNearDupsFromSigs(simhashSignatures(df, idCol, textCol),
      maxHamming, maxBandBucket(df))

  /** The (id, c0..c3) chunk table [[simhashNearDups]] derives internally,
    * exposed so it can be PERSISTED as a simhash-dedup index: an
    * incremental pipeline materializes it once per corpus slice and
    * dedups each new batch against it with
    * [[simhashNearDupsIncrementalFromSigs]]. Five ints per document —
    * the index never stores text. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    withSimhashChunks(spread(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("id"), col(textCol)), textCol)
      .select(col("id"), col("c0"), col("c1"), col("c2"), col("c3"))

  /** (id, band, bv) rows from a signature table — one row per 16-bit
    * chunk. Persisting it range-sorted by (band, bv) lets a batch run
    * band the history by scanning three integer columns with runtime
    * semi-join filters pruning row groups the batch's buckets don't
    * touch. */
  def simhashBandedRows(sigs: DataFrame): DataFrame =
    sigs.select(col("id"),
      posexplode(array(col("c0"), col("c1"), col("c2"), col("c3")))
        .as(Seq("band", "bv")))

  /** [[simhashNearDups]] over a PERSISTED signature table (id, c0..c3) —
    * the read-back half of the index round trip, so run 1 of an
    * incremental pipeline pairs under exactly the bytes run 2 reloads.
    * Same banding (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 shared chunk, so
    * recall is PERFECT, not probabilistic), verify, and output. */
  def simhashNearDupsFromSigs(sigs: DataFrame, maxHamming: Int,
      maxBucket: Int): DataFrame = {
    require(maxHamming <= 3,
      "4-chunk banding guarantees recall only for hamming <= 3")
    val s = maybeCache(sigs).select("id", "c0", "c1", "c2", "c3")
    verifyHamming(bucketPairs(simhashBandedRows(s), Seq("band", "bv"),
      maxBucket), s, maxHamming)
  }

  /** Incremental simhash dedup: near-dup pairs of a NEW batch against
    * itself AND a persisted [[simhashSignatures]] index — the
    * continuous-ingest twin of [[minhashNearDupsIncrementalFromSigs]]:
    * the index's banded twin is pre-pruned to the buckets the batch
    * touches (left-semi on the band keys), old×old pairs are excluded
    * by construction, and the chunk columns join back only for
    * candidate pairs' hamming verification. Signatures are a pure
    * function of the text (md5 bit votes), so per-pair recall equals
    * the full-corpus operator's — perfect at hamming ≤ 3. Contract:
    * batch and index ids disjoint. */
  def simhashNearDupsIncrementalFromSigs(newSigs: DataFrame,
      indexSigs: DataFrame, bandedIndex: DataFrame, maxHamming: Int,
      maxBucket: Int): DataFrame = {
    require(maxHamming <= 3,
      "4-chunk banding guarantees recall only for hamming <= 3")
    // cache-then-select: caching the caller's frame is a no-op when the
    // pipeline already cached it (and ITS unpersist releases the blocks);
    // a select-then-cache would mint a second, never-released entry.
    // bandedNew stays uncached — cheap projection of the cached frame.
    val ns = maybeCache(newSigs).select("id", "c0", "c1", "c2", "c3")
    val bandedNew = simhashBandedRows(ns)
    val bandedIdx = bandedIndex.select(col("id"), col("band"), col("bv"))
      .join(bandedNew.select("band", "bv").distinct(),
        Seq("band", "bv"), "left_semi")
    val pairIds = bucketPairs(bandedNew.unionByName(bandedIdx),
      Seq("band", "bv"), maxBucket)
    val aNew = ns.select(col("id").as("id_a"), lit(true).as("__an"))
    val bNew = ns.select(col("id").as("id_b"), lit(true).as("__bn"))
    val filtered = pairIds
      .join(aNew, Seq("id_a"), "left").join(bNew, Seq("id_b"), "left")
      .filter(coalesce(col("__an"), lit(false)) ||
        coalesce(col("__bn"), lit(false)))
      .select("id_a", "id_b")
    verifyHamming(filtered,
      ns.unionByName(indexSigs.select("id", "c0", "c1", "c2", "c3")),
      maxHamming)
  }

  private def verifyHamming(pairIds: DataFrame, sigs: DataFrame,
      maxHamming: Int): DataFrame =
    pairIds
      .join(sigs.select(col("id").as("id_a"), col("c0"), col("c1"),
        col("c2"), col("c3")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("c0").as("d0"),
        col("c1").as("d1"), col("c2").as("d2"), col("c3").as("d3")),
        "id_b")
      .withColumn("hamming",
        expr("bit_count(c0 ^ d0) + bit_count(c1 ^ d1) + " +
          "bit_count(c2 ^ d2) + bit_count(c3 ^ d3)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))

  /** Embedding-cosine near-dup pairs ≥ threshold — exact, expressed as a
    * BLOCKED equi-join instead of a nested-loop cross join: rows hash into
    * G = O(√parallelism) blocks, each side replicates G ways keyed by the
    * (block_a, block_b) cell, and the G² cells flow through a regular
    * hash/sort-merge join. Exact all-pairs compute is inherent for a
    * threshold this low on dense vectors (below ~0.8 cosine the hyperplane
    * bit-agreement of qualifying pairs approaches the background rate, so
    * banding cannot prune without recall loss — measured on this corpus:
    * qualifying pairs sit at cos 0.45-0.6 → p≈0.65 vs background p≈0.5-0.63),
    * but the blocked form spreads the O(N²) work evenly across the cluster
    * and never materializes a broadcast nested loop. For realistic near-dup
    * thresholds use [[embeddingNearDupsLsh]], which IS sub-quadratic. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blocks: Int = 0): DataFrame = {
    val g = if (blocks > 0) blocks
      else math.max(2, math.ceil(math.sqrt(
        df.sparkSession.sparkContext.defaultParallelism * 2.0)).toInt)
    val v = spread(df.select(col(idCol), col(vecCol)))
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        Similarity.normExact(vecCol).as("norm"))
      .withColumn("blk", pmod(col("id"), lit(g)).cast("int"))
    val partners = array((0 until g).map(lit): _*)
    // ordered pair (a, b) lands in exactly one cell: (blk_a, blk_b)
    val a = v.select(col("id").as("id_a"), col("v").as("va"),
      col("norm").as("na"), col("blk").as("cell_i"),
      explode(partners).as("cell_j"))
    val b = v.select(col("id").as("id_b"), col("v").as("vb"),
      col("norm").as("nb"), explode(partners).as("cell_i2"),
      col("blk").as("cell_j2"))
    a.join(b, col("cell_i") === col("cell_i2") &&
        col("cell_j") === col("cell_j2") && col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosineFromParts("va", "vb", "na", "nb"))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Containment near-dups: pairs where the SMALLER document's shingle
    * set is ≥ `threshold` contained in the other's —
    * containment(A,B) = |A∩B| / min(|A|,|B|). Symmetric Jaccard misses
    * subset duplication (a short doc quoted whole inside a long one
    * scores low Jaccard but containment 1.0); this is the LSH-Ensemble
    * notion of near-duplicate. Candidates come from the shared-shingle
    * equi-join (map-side explode, narrow shuffle) and are verified
    * exactly — same scale shape as [[ngramJaccard]], with the LSH banding
    * path available upstream when the corpus is large. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.9): DataFrame =
    verifyContainment(shingleCandidates(df, idCol, textCol, k), threshold)

  private def verifyContainment(candidates: DataFrame,
      threshold: Double): DataFrame =
    candidates
      .withColumn("containment",
        expr("size(array_intersect(sh_a, sh_b))").cast("double") /
          least(size(col("sh_a")), size(col("sh_b"))))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("containment"), 6).as("containment"))

  /** Exact pair verification for the n-gram family: `jaccard`
    * (symmetric |A∩B|/|A∪B|) or `containment` (asymmetric
    * |A∩B|/min(|A|,|B|) — the LSH-Ensemble notion that catches a short
    * doc quoted whole inside a long one). */
  private def verifyMeasure(candidates: DataFrame, threshold: Double,
      measure: String): DataFrame = measure match {
    case "containment" => verifyContainment(candidates, threshold)
    case "jaccard" => verifyJaccard(candidates, threshold)
    case other => throw new IllegalArgumentException(
      s"n-gram measure must be jaccard or containment, got `$other`")
  }

  /** Per-doc k-shingle hash sets (id, shh) — a pure function of the
    * text, so any later threshold/measure verifies against the same
    * stored sets. This is the HEAVY table an incremental n-gram index
    * persists; its narrow join surface is [[shinglePostings]]. Docs
    * shorter than k shingles are excluded (they can never pair). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import graft.expressions.PipelineExpressions._
    spread(df.select(col(s"`$idCol`"), col(s"`$textCol`")))
      .select(col(s"`$idCol`").as("id"),
        shingle_hashes(col(s"`$textCol`"), k).as("shh"))
      .filter(size(col("shh")) > 0)
  }

  /** Narrow postings twin (id, s) of a shingle-set table — one long per
    * (doc, distinct shingle hash). Persisted range-sorted by `s`, it is
    * the ONLY index surface a batch's candidate generation scans; the
    * heavy shh arrays join back for verified candidate ids alone. */
  def shinglePostings(sets: DataFrame): DataFrame =
    sets.select(col("id"), explode(col("shh")).as("s"))

  /** Candidate pairs + exact verification from a PRECOMPUTED shingle-set
    * table (the full-build path of the incremental n-gram index — pair
    * from the persisted bytes later batches will join against). */
  def ngramNearDupsFromSets(sets: DataFrame, threshold: Double,
      measure: String, maxDf: Int): DataFrame = {
    val sh = maybeCache(sets)
    val pairIds = bucketPairs(shinglePostings(sh), Seq("s"), maxDf)
    val candidates = pairIds
      .join(sh.select(col("id").as("id_a"), col("shh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shh").as("sh_b")), "id_b")
    verifyMeasure(candidates, threshold, measure)
  }

  /** Batch-vs-(itself + settled index) n-gram near-dup pairs over
    * PRECOMPUTED batch shingle sets and a persisted postings index.
    * `postingsIndex` is (id, s) — the narrow twin of the (id, shh)
    * index — so history participates in candidate generation through
    * long rows only, left-semi pruned to the shingles the batch
    * actually contains BEFORE pairing; the heavy stored arrays join
    * back for candidate ids alone. Residual old×old pairs (two settled
    * docs sharing a shingle the batch also touches) are dropped — they
    * were settled in an earlier run. The caller owns `newSets`'
    * lifecycle (the incremental pipeline reuses the frame for the
    * deferred index append). */
  def ngramNearDupsIncrementalFromSets(newSets: DataFrame,
      index: DataFrame, postingsIndex: DataFrame, threshold: Double,
      measure: String, maxDf: Int): DataFrame = {
    val ns = maybeCache(newSets)
    // postNew is NOT cached: a cheap map-side explode of the cached
    // sets, same policy as minhash's bandedNew
    val postNew = shinglePostings(ns)
    val postIdx = postingsIndex.select(col("id"), col("s"))
      .join(postNew.select("s").distinct(), Seq("s"), "left_semi")
    val pairIds = bucketPairs(postNew.unionByName(postIdx), Seq("s"), maxDf)
    val aNew = ns.select(col("id").as("id_a"), lit(true).as("__an"))
    val bNew = ns.select(col("id").as("id_b"), lit(true).as("__bn"))
    val filtered = pairIds
      .join(aNew, Seq("id_a"), "left").join(bNew, Seq("id_b"), "left")
      .filter(coalesce(col("__an"), lit(false)) ||
        coalesce(col("__bn"), lit(false)))
      .select("id_a", "id_b")
    val allSets = ns.select("id", "shh")
      .unionByName(index.select("id", "shh"))
    val candidates = filtered
      .join(allSets.select(col("id").as("id_a"), col("shh").as("sh_a")),
        "id_a")
      .join(allSets.select(col("id").as("id_b"), col("shh").as("sh_b")),
        "id_b")
    verifyMeasure(candidates, threshold, measure)
  }

  /** Shared candidate generation for the exact-verification near-dup ops:
    * shingle-hash each doc, prune the quadratic space to pairs sharing at
    * least one shingle (map-side explode + narrow self-join), and join
    * both sides' shingle sets back as sh_a/sh_b for the verifier.
    *
    * Hot-shingle guard: a shingle appearing in f documents emits f²
    * candidate pairs, so one viral boilerplate sentence at corpus scale
    * is a job-killing skew explosion. Standard practice (e.g. Lee et
    * al., "Deduplicating Training Data Makes Language Models Better") is
    * to drop shingles whose document frequency exceeds a cap before
    * pairing — a shingle shared by thousands of documents carries no
    * near-dup signal anyway. Candidates come from the one-shuffle
    * [[bucketPairs]] aggregate keyed on the shingle; the cap
    * (`spark.graft.maxShingleDf`, default 1000; ≤ 0 disables) is
    * enforced by bucketPairs' bounded-memory pre-pass, and any drop is
    * logged WARN with the dropped-shingle count (see bucketPairs —
    * recall loss is observable, never silent). Pairs that share ONLY
    * above-cap shingles are not candidates — at a Jaccard/containment
    * threshold worth verifying, real near-dups share many shingles,
    * almost all below any sane cap; but note a boilerplate cluster of
    * >cap NEAR-identical (not byte-identical) docs has every shingle
    * above cap, which is exactly the case the WARN surfaces. */
  private[graft] def shingleCandidates(df: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    val maxDf = df.sparkSession.conf.get("spark.graft.maxShingleDf", "1000").toInt
    val sh = maybeCache(shingleSets(df, idCol, textCol, k))
    val pairIds = bucketPairs(shinglePostings(sh), Seq("s"), maxDf)
    pairIds
      .join(sh.select(col("id").as("id_a"), col("shh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shh").as("sh_b")), "id_b")
  }

  /** Connected components over a near-dup pair graph: labels every node
    * with the MINIMUM id reachable from it, so each duplicate cluster gets
    * a stable canonical representative. Input is the (id_a, id_b) pair
    * output of any near-dup operator — expected DEDUPLICATED, which every
    * engine pair operator guarantees (duplicate pairs would not change the
    * result, only inflate per-iteration shuffle volume); output is
    * (id, component_id).
    *
    * Algorithm: iterative min-label propagation with pointer jumping
    * (label ← label(label) each round), the DataFrame form of the
    * MapReduce CC algorithms of Kiveris et al., "Connected Components in
    * MapReduce and Beyond" (SoCC'14). Propagation alone needs O(diameter)
    * rounds; the jumping step halves chain depth every round, giving
    * O(log d) — and near-dup graphs are dense clusters with tiny diameter,
    * so in practice this converges in 2-3 rounds.
    *
    * Scale shape: the graph holds only nodes that appear in some pair —
    * at 100 TB that is a small fraction of the corpus, and every shuffle
    * in the loop carries two longs per edge/node, never document content.
    * Each round checkpoints the label frontier to truncate lineage
    * (iterative joins otherwise grow the plan exponentially). Durability:
    * when a checkpoint directory is configured — either
    * `spark.graft.checkpointDir` or a prior `sc.setCheckpointDir` — the
    * frontier uses RELIABLE `checkpoint()` (survives executor loss, the
    * only safe mode mid-iteration on a real cluster); otherwise it falls
    * back to `localCheckpoint()`, fine for single-JVM runs. Convergence
    * is detected with a `limit(1)` existence probe, not a full count. */
  def connectedComponents(pairs: DataFrame, idACol: String, idBCol: String,
      maxIterations: Int = 50): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    val confDir = pairs.sparkSession.conf.get("spark.graft.checkpointDir", "")
    if (confDir.nonEmpty && sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(confDir)
    val reliable = sc.getCheckpointDir.isDefined
    // label each checkpoint/probe job (guide §1.5) so profilers can split
    // "the pair plan is expensive" from "the iteration machinery is" —
    // appended to (not replacing) the caller's own description
    val outerDesc = Option(sc.getLocalProperty("spark.job.description"))
    def labeled[T](phase: String)(f: => T): T = {
      sc.setJobDescription(outerDesc.fold(s"cc: $phase")(o => s"$o | cc: $phase"))
      try f finally sc.setJobDescription(outerDesc.orNull)
    }
    def save(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    // mirror each pair in ONE pass (explode of the two orientations),
    // not a self-union: the union's two branches differ in their final
    // projection, so the caller's pair plan — typically a banded
    // candidate join + an exact verify, the expensive part of any
    // near-dup operator — would evaluate TWICE inside this checkpoint
    // (stage reuse cannot dedupe subtrees with different projections).
    // Measured on q_engine_semantic_incremental: the pair-bearing
    // localCheckpoint actions dominated the run.
    // No distinct() on the mirrored edges: every engine pair operator
    // already emits a deduplicated (id_a < id_b) pair set (bucketPairs
    // ends in dropDuplicates; the fuzzy paths distinct() their
    // candidates), and the mirror of a duplicate-free ordered pair set
    // is duplicate-free, so the global dedup here was a pure extra
    // exchange + aggregate of the whole edge set inside the checkpoint.
    // Duplicate edges would be semantically harmless anyway (min-label
    // propagation is idempotent); a caller with a duplicate-heavy pair
    // source should dedupe before calling, not pay it here every time.
    val p = pairs.select(col(idACol).as("u"), col(idBCol).as("v"))
    val edges = labeled("edges")(save(p.select(explode(array(
        struct(col("u"), col("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("__e"))
      .select(col("__e.u").as("u"), col("__e.v").as("v"))))
    // init: label(v) = min(v, min direct neighbor)
    var labels = labeled("init")(save(edges.groupBy("u")
      .agg(min(col("v")).as("mn"))
      .select(col("u").as("id"), least(col("u"), col("mn")).as("label"))))
    var converged = labeled("probe0")(labels.isEmpty)
    var iter = 0
    while (!converged && iter < maxIterations) {
      // candidate per node: min label among neighbors
      val viaNeighbors = edges
        .join(labels.select(col("id").as("v2"), col("label").as("nl")),
          col("v") === col("v2"))
        .groupBy(col("u").as("id2")).agg(min(col("nl")).as("nlabel"))
      // carry the round's starting label through as __old: convergence
      // then probes the checkpointed frontier with a filter + limit(1) —
      // no per-round shuffle join just to detect quiescence
      val propagated = labels
        .join(viaNeighbors, col("id") === col("id2"), "left")
        .select(col("id"), col("label").as("__old"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      // pointer jumping: labels form a decreasing forest over node ids, so
      // label(label) is always defined and never leaves the component
      val jumped = labeled(s"iter$iter")(save(propagated
        .join(propagated.select(col("id").as("pid"), col("label").as("plabel")),
          col("label") === col("pid"), "left")
        .select(col("id"), col("__old"),
          coalesce(col("plabel"), col("label")).as("label"))))
      converged = labeled(s"probe$iter")(
        jumped.filter(col("label") =!= col("__old")).limit(1).isEmpty)
      labels.unpersist()
      labels = jumped.select(col("id"), col("label"))
      iter += 1
    }
    labels.select(col("id"), col("label").as("component_id"))
  }

  /** Corpus-level near-dup removal: given the corpus and a near-dup pair
    * set, keep ONE canonical document per duplicate cluster (the minimum
    * id) and every unclustered document, annotated with the cluster size
    * (`n_dups` = 1 for documents with no near-duplicate). The paired
    * subset (every id in some pair) is tiny relative to the corpus, so
    * its per-id verdict table broadcasts at scale — the corpus pays ONE
    * left join + filter and never shuffles (previously two passes: a
    * loser anti-join, then a canonical left join). */
  def canonicalCorpus(docs: DataFrame, pairs: DataFrame, idCol: String,
      idACol: String = "id_a", idBCol: String = "id_b"): DataFrame = {
    val cc = connectedComponents(pairs, idACol, idBCol)
    val sizes = cc.groupBy("component_id").agg(count(lit(1)).as("__n"))
    // per-paired-id verdict: __n non-null iff the id is its component's
    // canonical (minimum) member — one component-bounded join; unpaired
    // corpus ids simply miss the verdict table
    val verdict = cc.join(sizes, "component_id")
      .select(col("id").as("__vid"),
        when(col("id") === col("component_id"), col("__n")).as("__n"))
    docs.join(verdict, docs(idCol) === col("__vid"), "left")
      .filter(col("__vid").isNull || col("__n").isNotNull)
      .withColumn("n_dups", coalesce(col("__n"), lit(1L)))
      .drop("__vid", "__n")
  }

  /** Quality-priority near-dup removal: like [[canonicalCorpus]], but the
    * representative of each duplicate cluster is the document with the
    * HIGHEST `priorityCol` (ties → smaller id) rather than the smallest
    * id — "keep the best copy", the contract real curation uses when
    * duplicates differ in completeness (priority = length, quality score,
    * recency…). `priorityCol` must be numeric and non-null on every
    * paired document.
    *
    * Same scale shape as [[canonicalCorpus]]: components and the argmax
    * run over the paired subset only (tiny relative to the corpus); the
    * per-paired-id verdict table broadcasts at scale, so the corpus pays
    * ONE left join + filter — previously it was scanned twice (an
    * anti-join pass for unpaired survivors, an inner join for keepers)
    * and unioned. The priority lookup is the only other corpus read and
    * stays column-pruned to (id, priority). The argmax is
    * `min(struct(-priority, id))` — one partial agg, no per-cluster
    * window. */
  def canonicalCorpusBy(docs: DataFrame, pairs: DataFrame, idCol: String,
      priorityCol: String, idACol: String = "id_a",
      idBCol: String = "id_b"): DataFrame = {
    val cc = connectedComponents(pairs, idACol, idBCol)
    val sizes = cc.groupBy("component_id").agg(count(lit(1)).as("__n"))
    val pri = docs.select(col(idCol).as("__pid"), col(priorityCol).as("__p"))
    val best = cc.join(pri, col("id") === col("__pid"))
      .groupBy("component_id")
      .agg(min(struct((-col("__p")).as("np"), col("id").as("id"))).as("__b"))
      .select(col("component_id"), col("__b.id").as("__keep_id"))
    // per-paired-id verdict: __n non-null iff this id is its component's
    // argmax keeper — component-bounded joins only
    val verdict = cc.join(best, "component_id").join(sizes, "component_id")
      .select(col("id").as("__vid"),
        when(col("id") === col("__keep_id"), col("__n")).as("__n"))
    docs.join(verdict, docs(idCol) === col("__vid"), "left")
      .filter(col("__vid").isNull || col("__n").isNotNull)
      .withColumn("n_dups", coalesce(col("__n"), lit(1L)))
      .drop("__vid", "__n")
  }

  /** Banded-LSH embedding near-dups — the sub-quadratic scale path for
    * realistic thresholds (≥ ~0.8 cosine). Rows replicate once per band;
    * candidates come from an equi-join on (band, r-bit signature) and are
    * verified with the exact decimal cosine, so precision is 1 and recall
    * for a pair at cosine s is 1-(1-p^r)^L with p = 1-arccos(s)/π:
    * r=8, L=16 → recall ≈ 0.97 at s=0.9, ≈ 0.9998 at s=0.95, while
    * background pairs (s≈0) collide on a band with probability 2^-8 —
    * candidate volume stays near-linear. */
  def embeddingNearDupsLsh(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 16, rowsPerBand: Int = 8): DataFrame = {
    val v = maybeCache(spread(df.select(col(idCol), col(vecCol)))
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        Similarity.normExact(vecCol).as("norm"),
        Similarity.bandSignatures(vecCol, bands, rowsPerBand).as("sigs")))
    // one-shuffle bucket-pairs over narrow (id, band, sig) rows; the
    // dense vectors join back only for the exact-cosine verification
    val banded = v.select(col("id"),
      posexplode(col("sigs")).as(Seq("band", "sig")))
    val pairIds = bucketPairs(banded, Seq("band", "sig"), maxBandBucket(df))
    pairIds
      .join(v.select(col("id").as("id_a"), col("v").as("va"),
        col("norm").as("na")), "id_a")
      .join(v.select(col("id").as("id_b"), col("v").as("vb"),
        col("norm").as("nb")), "id_b")
      .withColumn("cosine", Similarity.cosineFromParts("va", "vb", "na", "nb"))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** The (id, v, norm) vector table [[embeddingNearDupsLsh]] derives
    * internally, exposed so it can be PERSISTED as a semantic-dedup
    * index: an incremental pipeline materializes it once per corpus
    * slice and dedups each new batch against it with
    * [[embeddingNearDupsLshIncremental]] — never re-reading or
    * re-pairing the historical vectors. The exact-decimal norm rides
    * along so the cosine verify of a later batch never re-folds the
    * stored vector's squared-sum. */
  def embeddingVectors(df: DataFrame, idCol: String, vecCol: String)
      : DataFrame =
    spread(df.select(col(idCol), col(vecCol)))
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        Similarity.normExact(vecCol).as("norm"))

  /** (id, band, sig) rows from a vector table — the NARROW banded twin
    * of [[embeddingVectors]]. Signatures come from the deterministic
    * integer hyperplane model ([[Similarity.bandSignatures]]), so the
    * twin is a pure derivation of the vectors; persisting it
    * range-sorted by (band, sig) lets a batch run band the history by
    * scanning three integer columns — never re-dotting 64 hyperplanes
    * against every stored dense vector — with runtime semi-join filters
    * pruning row groups the batch's buckets don't touch. */
  def embeddingBandedRows(vecs: DataFrame, bands: Int, rowsPerBand: Int)
      : DataFrame =
    vecs.select(col("id"),
      posexplode(Similarity.bandSignatures("v", bands, rowsPerBand))
        .as(Seq("band", "sig")))

  /** [[embeddingNearDupsLsh]] over a PERSISTED vector table (id, v,
    * norm) — the read-back half of the index round trip, so run 1 of an
    * incremental pipeline pairs under exactly the bytes run 2 will
    * reload. Same banding, verification, and output contract. */
  def embeddingNearDupsLshFromVecs(vecs: DataFrame, threshold: Double,
      bands: Int, rowsPerBand: Int, maxBucket: Int): DataFrame = {
    val v = maybeCache(vecs).select(col("id"), col("v"), col("norm"))
    val pairIds = bucketPairs(embeddingBandedRows(v, bands, rowsPerBand),
      Seq("band", "sig"), maxBucket)
    verifyCosine(pairIds, v, v, threshold)
  }

  /** Incremental banded-LSH semantic dedup: near-dup pairs of a NEW
    * batch of embeddings against itself AND a persisted
    * [[embeddingVectors]] index — the continuous-ingest twin of
    * [[minhashNearDupsIncrementalFromSigs]], with the same shape: the
    * history is touched only through its narrow banded twin, pre-pruned
    * to the buckets the batch actually collides with (left-semi on the
    * band keys); old×old pairs are excluded by construction; the dense
    * historical vectors join back ONLY for verified candidate ids.
    * Because band collision depends only on the two signatures involved
    * — and signatures come from the fixed hyperplane model, not trained
    * state — per-pair recall is identical to the full-corpus operator.
    * Contract: batch and index ids disjoint. The caller owns `newVecs`'
    * lifecycle (an incremental pipeline reuses the frame for the
    * deferred index append). */
  def embeddingNearDupsLshIncremental(newVecs: DataFrame,
      indexVecs: DataFrame, bandedIndex: DataFrame, threshold: Double,
      bands: Int, rowsPerBand: Int, maxBucket: Int): DataFrame = {
    val nv = maybeCache(newVecs)
    // uncached: a map-side re-derivation from the cached vectors per
    // use beats an internal per-batch cache no caller can release
    val bandedNew = embeddingBandedRows(nv, bands, rowsPerBand)
    // index rows survive only where a new row shares their bucket
    val bandedIdx = bandedIndex.select(col("id"), col("band"), col("sig"))
      .join(bandedNew.select("band", "sig").distinct(),
        Seq("band", "sig"), "left_semi")
    val pairIds = bucketPairs(bandedNew.unionByName(bandedIdx),
      Seq("band", "sig"), maxBucket)
    // drop the residual old×old pairs (two index vectors colliding
    // inside a bucket the batch also touches)
    val aNew = nv.select(col("id").as("id_a"), lit(true).as("__an"))
    val bNew = nv.select(col("id").as("id_b"), lit(true).as("__bn"))
    val filtered = pairIds
      .join(aNew, Seq("id_a"), "left").join(bNew, Seq("id_b"), "left")
      .filter(coalesce(col("__an"), lit(false)) ||
        coalesce(col("__bn"), lit(false)))
      .select("id_a", "id_b")
    val allVecs = nv.select("id", "v", "norm")
      .unionByName(indexVecs.select("id", "v", "norm"))
    verifyCosine(filtered, allVecs, allVecs, threshold)
  }

  private def verifyCosine(pairIds: DataFrame, vecsA: DataFrame,
      vecsB: DataFrame, threshold: Double): DataFrame =
    pairIds
      .join(vecsA.select(col("id").as("id_a"), col("v").as("va"),
        col("norm").as("na")), "id_a")
      .join(vecsB.select(col("id").as("id_b"), col("v").as("vb"),
        col("norm").as("nb")), "id_b")
      .withColumn("cosine", Similarity.cosineFromParts("va", "vb", "na", "nb"))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): k-means the embedding
    * space into `nlist` cells, find near-duplicate pairs ONLY within
    * each cell (cosine ≥ threshold), and keep one representative per
    * duplicate component — the paper's keep rule: the member FARTHEST
    * from its cell centroid (lowest centroid similarity retains the
    * least prototypical, most informative copy), ties → min id.
    *
    * Output: one row per SURVIVING id — (id, cid, n_dups), where cid is
    * the k-means cell and n_dups the size of the component it won
    * (1 for docs with no in-cell near-dup).
    *
    * Spark-first scale shape: clustering is [[Similarity.kmeansCentroids]]
    * (assignment map-side against broadcast centroids, update shuffles
    * only k×dim partial sums); the pair join is an equi-join ON THE CELL
    * ID — the quadratic cost is per-cell, Σ|cell|², which is the
    * operator's knob: SemDeDup scales `nlist` with the corpus so cells
    * stay ~constant-sized (the paper runs k=50k on 5B docs). Components
    * and the priority keep ride the existing iterative
    * [[connectedComponents]] + [[canonicalCorpusBy]] machinery; the
    * centroid distance used for the keep rule is the same exact-decimal
    * d2 the assignment already ranks, so the whole pipeline — training
    * included — is oracle-checkable.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, iters: Int = 2, threshold: Double = 0.7)
      : DataFrame = {
    import graft.expressions.PipelineExpressions
    require(nlist > 0 && iters >= 0, s"bad nlist=$nlist / iters=$iters")
    val centroids = Similarity.kmeansCentroids(df, idCol, vecCol,
      nlist, iters)
    val v = maybeCache(spread(df.select(col(idCol), col(vecCol)))
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        Similarity.normExact(vecCol).as("norm"),
        PipelineExpressions
          .nearest_centroids(col(vecCol), centroids, 1)(0).as("cid"),
        PipelineExpressions
          .centroid_distances(col(vecCol), centroids).as("__ds"))
      .withColumn("d2", element_at(col("__ds"), col("cid") + 1))
      .drop("__ds"))
    val a = v.select(col("id").as("id_a"), col("v").as("va"),
      col("norm").as("na"), col("cid"))
    val b = v.select(col("id").as("id_b"), col("v").as("vb"),
      col("norm").as("nb"), col("cid").as("__cid_b"))
    val pairs = a.join(b,
        col("cid") === col("__cid_b") && col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosineFromParts("va", "vb", "na", "nb"))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b")
    canonicalCorpusBy(v.select(col("id"), col("cid"), col("d2")),
      pairs, "id", "d2")
      .select(col("id"), col("cid"), col("n_dups"))
  }
}
