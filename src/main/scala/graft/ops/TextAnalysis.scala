package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions (codegen'd, map-side, no shuffle) with DuckDB-reproducible
  * arithmetic. */
object TextAnalysis {

  /** Tiny built-in marker lexicons (function words per language). A real
    * deployment swaps in a trained n-gram model; the operator shape —
    * score-per-language then argmax with deterministic tie-break — is the
    * same. */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "los", "de", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Predicted language: argmax marker-hit count, ties→lexicographic code,
    * zero hits→'und'. Native expression — the equivalent SQL formulation
    * (array_sort with a struct comparator) runs interpreted and ~20×
    * slower; the DuckDB oracle keeps the SQL shape. */
  def languageId(textCol: String): Column =
    graft.expressions.PipelineExpressions.lang_id(col(textCol), markers.toSeq)

  /** Whitespace token count (empty/blank → 0). */
  def tokenCount(textCol: String): Column =
    when(length(trim(col(textCol))) === 0, lit(0))
      .otherwise(size(split(trim(col(textCol)), " +")))

  /** Flesch-style reading-ease score from codegen'd builtins (one
    * map-side pass, no UDF): sentences = runs of [.!?], syllables =
    * vowel-group runs (the standard cheap heuristic), words = whitespace
    * tokens. Any SQL engine with regexp counting reproduces it exactly —
    * every division is double/double (deterministic IEEE). */
  def readingEase(textCol: String): Column = {
    val words = tokenCount(textCol).cast("double")
    val sentences = greatest(
      regexp_count(col(textCol), lit("[.!?]+")), lit(1)).cast("double")
    val syllables = regexp_count(lower(col(textCol)), lit("[aeiouy]+"))
      .cast("double")
    round(lit(206.835) - lit(1.015) * words / sentences -
      lit(84.6) * syllables / greatest(words, lit(1.0)), 6)
  }

  /** BPE-ish subword count: word-boundary pieces, ceil(len/4) per word
    * (mimics byte-pair splits of long words). Native one-pass expression;
    * the equivalent `aggregate(split(...))` HOF runs an interpreted
    * lambda per word and stays only as the DuckDB oracle mirror. */
  def subwordCount(textCol: String): Column =
    graft.expressions.PipelineExpressions.subword_count(col(textCol))

  /** PII scrubbing patterns — deliberately simple, RE2/Java-identical
    * regexes (no backrefs/lookaround) so the same pattern string runs in
    * Spark's codegen'd regexp_replace AND any warehouse-side validator.
    * A production deployment extends the pattern set; the operator shape
    * (mask + per-class counts, one map-side pass, no shuffle) is what
    * matters at 100 TB. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+\\d{1,3}-\\d{3}-\\d{4,10}"

  /** Mask emails then phones with typed placeholders. */
  def maskPii(textCol: String): Column =
    regexp_replace(
      regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Per-class PII hit counts (codegen'd regexp_count). */
  def piiCounts(textCol: String): Seq[Column] = Seq(
    regexp_count(col(textCol), lit(EmailPattern)).as("n_emails"),
    regexp_count(col(textCol), lit(PhonePattern)).as("n_phones"))

  /** Gopher/C4-style repetition metrics: duplicate-word fraction and
    * top-bigram fraction, the standard signals for filtering degenerate
    * (looping/boilerplate) documents from training data. One native
    * map-side pass per row; the fractions are plain double arithmetic so
    * any SQL engine reproduces them bit-for-bit. */
  def repetitionFeatures(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__rep",
        graft.expressions.PipelineExpressions.repetition_stats(col(textCol)))
      .withColumn("n_words", col("__rep.n_words"))
      .withColumn("n_distinct_words", col("__rep.n_distinct_words"))
      .withColumn("top_bigram_count", col("__rep.top_bigram_count"))
      .withColumn("dup_word_frac",
        when(col("n_words") > 0,
          lit(1.0) - col("n_distinct_words") * lit(1.0) / col("n_words"))
          .otherwise(lit(0.0)))
      .withColumn("top_bigram_frac",
        when(col("n_words") > 1,
          col("top_bigram_count") * lit(1.0) / (col("n_words") - 1))
          .otherwise(lit(0.0)))
      .drop("__rep")

  /** Quality features + composite score. Deterministic double arithmetic:
    * every engine computes the identical IEEE ops in the same order. */
  def qualityFeatures(df0: DataFrame, textCol: String): DataFrame = {
    val df = Dedup.spread(df0)
    df.withColumn("n_chars_actual", length(col(textCol)))
      .withColumn("n_tokens", tokenCount(textCol))
      .withColumn("mean_word_len",
        when(col("n_tokens") > 0,
          (col("n_chars_actual") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(col("n_tokens") > 0,
          graft.expressions.PipelineExpressions
            .token_hit_count(col(textCol), markers("en"))
            .cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(col("n_chars_actual") > 0,
          (col("n_chars_actual") -
            length(regexp_replace(col(textCol), "[.,!?;:]", ""))).cast("double") /
            col("n_chars_actual"))
          .otherwise(lit(0.0)))
      .withColumn("quality_score",
        round(
          least(lit(1.0), col("n_tokens").cast("double") / 50.0) * 0.4 +
            col("stopword_ratio") * 0.3 +
            (lit(1.0) - least(lit(1.0), col("punct_ratio") * 10.0)) * 0.3, 6))
  }

  /** Token-window chunking: split each document into fixed-size token
    * windows with overlap (stride < chunk ⇒ consecutive chunks share
    * chunk − stride tokens) — the standard pre-embedding segmentation.
    * Pure map-side: one split, one sequence/transform, one posexplode;
    * no shuffle, no UDF. Chunk k covers tokens [k·stride, k·stride +
    * chunk); the tail chunk may be shorter; documents with no tokens
    * emit nothing. Deterministic text math, so chunk ids and bodies are
    * engine-exact. */
  def chunk(df: DataFrame, textCol: String, chunkTokens: Int,
      strideTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(strideTokens > 0 && strideTokens <= chunkTokens,
      s"stride must be in [1, chunkTokens]: $strideTokens")
    df.withColumn("__toks",
        when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
          .otherwise(split(trim(col(textCol)), " +")))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col("*"),
        // chunk count − 1 = ceil((n − chunk)/stride), as INTEGER ceil
        // division — float ceil could land a 1-ulp-off quotient on the
        // wrong side when stride divides (n − chunk) exactly
        posexplode(expr(
          s"""transform(
             |  sequence(0, greatest(0,
             |    (__n - $chunkTokens + $strideTokens - 1) div $strideTokens)),
             |  k -> array_join(slice(__toks, k * $strideTokens + 1,
             |    $chunkTokens), ' '))""".stripMargin))
          .as(Seq("chunk_id", "chunk_text")))
      .drop("__toks", "__n", textCol)
  }

  /** Gopher-style rule filter (Rae et al. 2021 appendix A — the
    * standard pretraining quality gate), re-expressed so EVERY rule is
    * an all-integer comparison: each fraction threshold cross-multiplies
    * into integer arithmetic (dup fraction ≤ 1/2 ⟺
    * 2·(n_words − n_distinct) ≤ n_words), so no rule ever sits on a
    * float boundary and the keep decision is bit-identical in any
    * engine. One map-side codegen pass — rules come from the same
    * token/stopword/repetition machinery as the scoring operators.
    *
    * Emitted per document: the rule booleans (`r_*`), `n_tokens`, and
    * `keep` = AND of all rules — keep flags rather than a filtered
    * corpus, because pipelines audit WHICH rule dropped a document
    * (filter with `.where(col("keep"))`). */
  def gopherFilter(df0: DataFrame, textCol: String, minTokens: Int = 8,
      maxTokens: Int = 5000): DataFrame = {
    val df = Dedup.spread(df0)
    val rep = graft.expressions.PipelineExpressions
      .repetition_stats(col(textCol))
    val mwlNumer = col("__chars") - (col("n_tokens") - 1)
    df.withColumn("n_tokens", tokenCount(textCol))
      .withColumn("__chars", length(col(textCol)))
      .withColumn("__stop", graft.expressions.PipelineExpressions
        .token_hit_count(col(textCol), markers("en")))
      .withColumn("__rep", rep)
      .withColumn("r_min_tokens", col("n_tokens") >= minTokens)
      .withColumn("r_max_tokens", col("n_tokens") <= maxTokens)
      // 1 ≤ mean word length ≤ 12, cross-multiplied by n_tokens
      .withColumn("r_word_len",
        col("n_tokens") > 0 && col("n_tokens") <= mwlNumer &&
          mwlNumer <= col("n_tokens") * 12)
      .withColumn("r_stopwords", col("__stop") >= 2)
      .withColumn("r_dup_words",
        (col("__rep.n_words") - col("__rep.n_distinct_words")) * 2 <=
          col("__rep.n_words"))
      .withColumn("r_top_bigram",
        col("__rep.n_words") <= 1 ||
          col("__rep.top_bigram_count") * 5 <= col("__rep.n_words") - 1)
      .withColumn("keep",
        col("r_min_tokens") && col("r_max_tokens") && col("r_word_len") &&
          col("r_stopwords") && col("r_dup_words") && col("r_top_bigram"))
      .drop("__chars", "__stop", "__rep")
  }

  private val Mod = 1000000007L
  private val Base = 131L

  /** Polynomial rolling hash of a string expression (mod 1e9+7, base 131)
    * — the Rabin-Karp primitive, expressed portably (sequence+substring,
    * not split-on-empty, whose trailing-empty behavior varies by engine). */
  def polyHash(strExpr: String): String =
    s"""CASE WHEN length($strExpr) = 0 THEN 0L ELSE
       |  aggregate(sequence(1, length($strExpr)), 0L,
       |    (acc, i) -> (acc * $Base + ascii(substring($strExpr, i, 1))) % $Mod)
       |END""".stripMargin

  /** Document fingerprint: (content hash, winnowed min k-gram hash,
    * distinct k-gram count). The k-gram pass is the rolling-hash window of
    * winnowing; taking the global min is the 1-window degenerate case that
    * stays SQL-portable. Hashing runs in one native O(len) pass
    * (PipelineExpressions.FingerprintParts) — the interpreted HOF form of
    * the same math ([[polyHash]]) is O(len·k) per row and was the 4th
    * slowest bench entry; normalization stays in SQL where regexp_replace
    * is codegen'd. */
  def fingerprint(df0: DataFrame, textCol: String, k: Int = 8): DataFrame = {
    import graft.expressions.PipelineExpressions
    Dedup.spread(df0)
      .withColumn("__norm",
        lower(regexp_replace(col(textCol), "[^a-zA-Z0-9 ]", "")))
      .withColumn("__fp", PipelineExpressions.fingerprint_parts(col("__norm"), k))
      .withColumn("content_hash", col("__fp.content_hash"))
      .withColumn("min_gram_hash", col("__fp.min_gram_hash"))
      .withColumn("n_distinct_grams", col("__fp.n_distinct_grams"))
      .drop("__fp", "__norm")
  }

  /** Corpus-trained bigram language-model surprise per document — the
    * perplexity-style quality signal of CCNet (Wenzek et al. 2020):
    * documents whose token transitions are improbable under the
    * corpus's own bigram statistics score high and get filtered. For
    * each bigram (w1, w2), the Laplace-smoothed conditional is
    * (C(w1,w2) + 1) / (C(w1·) + V) where C(w1·) counts bigrams starting
    * with w1 and V is the prefix vocabulary size; a document's surprise
    * is the mean of ln((C(w1·) + V) / (C(w1,w2) + 1)) over its bigrams
    * (= mean negative log-probability; perplexity's monotone twin
    * without a library `exp`). Documents with fewer than 2 tokens have
    * no bigrams and drop out.
    *
    * Scale shape: one explode of token pairs, count aggregates keyed by
    * the bigram (partial-agg'd, like any vocabulary count), a 1-row
    * vocabulary broadcast, a co-partitioned join of doc-bigrams onto
    * their counts, and a per-doc aggregate. Nothing is ever buffered
    * per group.
    *
    * Determinism: counts and V are exact integers; each bigram's
    * surprise is one `ln` of an exact integer rational (JVM↔DuckDB libm
    * agree to ≤1 ulp); the PER-DOC SUM runs in DECIMAL(38,18) — exact
    * and ORDER-INDEPENDENT, because a double sum over an unordered join
    * result would be partition-order-dependent and never hash-match.
    * One final decimal→double cast + division + round(6). */
  def lmSurprise(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = Dedup.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), split(col(textCol), " ").as("__w"))
      // guard BEFORE the pair expression: Spark's sequence(1, 0) is the
      // DESCENDING [1, 0], not empty, so a 1-token doc would index past
      // its array instead of contributing no bigrams
      .filter(size(col("__w")) >= 2)
    // cache boundary: two corpus-sized consumers remain (the bigram-count
    // aggregate and the final per-doc join probe) — without it each
    // re-scans and re-explodes the whole corpus (the kmeansOnSpread
    // lesson applied to a query-shaped op)
    val pairs = Dedup.maybeCache(base
      .select(col(idCol), explode(expr(
        """transform(sequence(1, size(__w) - 1),
          |  i -> struct(element_at(__w, i) AS w1,
          |              element_at(__w, i + 1) AS w2))""".stripMargin))
        .as("__bg"))
      .select(col(idCol), col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2")))
    // prefix counts and vocabulary DERIVE from the bigram-count table
    // (exact-integer identities: C(w1·) = Σ_w2 C(w1,w2); V = |{w1}| =
    // row count of the prefix table) instead of re-aggregating the full
    // exploded corpus — two corpus-sized passes become vocabulary-bounded
    // re-aggregations, and under AQE the bigram partial-agg exchange is
    // shared between the join probe and the derivation (guide §2.3/§2.4:
    // aggregate the smallest sufficient table, share the exchange).
    // the cache boundary on the COUNT table is what makes the derivation
    // real: without it Catalyst re-derives big's whole subtree (another
    // pairs scan + aggregate) under uni and vocab — the join's notnull
    // pushdown makes those exchanges canonically different, so AQE stage
    // reuse cannot fold them either
    val big = Dedup.maybeCache(
      pairs.groupBy("__w1", "__w2").agg(count(lit(1)).as("__c12")))
    val uni = big.groupBy("__w1").agg(sum(col("__c12")).as("__c1"))
    val vocab = uni.agg(count(lit(1)).as("__v"))
    val surprise = log(
      (col("__c1").cast("double") + col("__v").cast("double")) /
        (col("__c12").cast("double") + lit(1.0)))
    pairs
      .join(big, Seq("__w1", "__w2"))
      .join(uni, Seq("__w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("__s", surprise.cast("decimal(38,18)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__s")).as("__sum"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__sum").cast("double") /
          col("n_bigrams").cast("double"), 6).as("surprise"))
  }

  /** The (doc id, w1, w2) bigram pairs [[lmSurprise]] explodes —
    * factored out so the trainable statistics and the scoring pass can
    * run against DIFFERENT corpora (the frozen-model shape). */
  private def bigramPairs(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val base = Dedup.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), split(col(textCol), " ").as("__w"))
      .filter(size(col("__w")) >= 2)
    base
      .select(col(idCol), explode(expr(
        """transform(sequence(1, size(__w) - 1),
          |  i -> struct(element_at(__w, i) AS w1,
          |              element_at(__w, i + 1) AS w2))""".stripMargin))
        .as("__bg"))
      .select(col(idCol), col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
  }

  /** The bigram language model [[lmSurprise]] trains internally, as
    * PERSISTABLE relations: (bigram counts (w1, w2, c12), prefix counts
    * (w1, c1), vocab (v)) — the frozen-model artifact an incremental
    * curation pipeline stores on its first run so later increments are
    * scored by the SAME model (training on each increment would gate
    * each batch against different statistics — not reproducible, and
    * wrong for drift measurement). Same count shapes as the inline
    * trainer; vocab is a 1-row relation. */
  def lmCounts(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame, DataFrame) = {
    // same derived-aggregate shape as [[lmSurprise]]: prefixes and vocab
    // fold the bigram-count table (vocabulary-bounded), not the corpus
    val pairs = bigramPairs(docs, idCol, textCol)
    val big = Dedup.maybeCache(
      pairs.groupBy("__w1", "__w2").agg(count(lit(1)).as("c12")))
    val uni = big.groupBy("__w1").agg(sum(col("c12")).as("c1"))
    (big.select(col("__w1").as("w1"), col("__w2").as("w2"), col("c12")),
     uni.select(col("__w1").as("w1"), col("c1")),
     uni.agg(count(lit(1)).cast("long").as("v")))
  }

  /** Score documents under a FROZEN bigram LM from [[lmCounts]]: the
    * same Laplace-smoothed mean surprise as [[lmSurprise]], with unseen
    * bigrams/prefixes coalescing to count 0 — on the training corpus
    * itself every bigram matches and the coalesces are no-ops, so this
    * is bit-identical to the inline trainer there (the run-1 parity the
    * incremental pipeline needs); on NEW text an out-of-vocabulary
    * bigram scores ln((c1+V)/1) and an unseen prefix ln(V), the
    * standard smoothed-model extension. Left joins keep the same
    * bigram-keyed shuffle shape; the counts tables are the model, so at
    * 100 TB they are vocabulary-bounded, never corpus-bounded. */
  def lmSurpriseScore(docs: DataFrame, idCol: String, textCol: String,
      bigrams: DataFrame, prefixes: DataFrame,
      vocab: DataFrame): DataFrame = {
    val pairs = bigramPairs(docs, idCol, textCol)
    val surprise = log(
      (coalesce(col("c1"), lit(0L)).cast("double") +
        col("v").cast("double")) /
        (coalesce(col("c12"), lit(0L)).cast("double") + lit(1.0)))
    pairs
      .join(bigrams, pairs("__w1") === bigrams("w1") &&
        pairs("__w2") === bigrams("w2"), "left")
      .drop("w1", "w2")
      .join(prefixes, pairs("__w1") === prefixes("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__s", surprise.cast("decimal(38,18)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__s")).as("__sum"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__sum").cast("double") /
          col("n_bigrams").cast("double"), 6).as("surprise"))
  }

  /** PMI collocations: the corpus's strongest adjacent-bigram
    * associations ("New York"-style multi-word expressions — Church &
    * Hanks 1990), a vocabulary-mining step tokenizer and phrase-merge
    * pipelines run over raw corpora.
    *
    * Counting convention (self-consistent, no mixed denominators): all
    * counts live in BIGRAM space — c12 = count of the pair, c1 = count
    * of bigrams with this first word, c2 = count with this second word,
    * N = total bigrams; PMI = ln(c12·N / (c1·c2)) computed as the fixed
    * left-associated sum ln(c12) + ln(N) − ln(c1) − ln(c2) over
    * exact-integer inputs — no product overflow at any corpus size (the
    * KL-drift lesson), each ln correctly rounded, round(6) absorbing the
    * ≤1-ulp libm spread. The top-k ranks on the ROUNDED value (ulp-safe
    * cutoff) with (w1, w2) tie-break, as a distributed TakeOrdered.
    *
    * `minCount` keeps rare-pair noise out (PMI is maximal for
    * hapax pairs — the standard failure mode). Scale shape: one explode,
    * three partial-agg'd count shuffles bounded by the bigram
    * vocabulary, two joins of count tables, a 1-row broadcast for N,
    * TakeOrdered for the cut. */
  def collocations(docs: DataFrame, textCol: String, minCount: Int = 5,
      topK: Int = 50): DataFrame = {
    // exploded pairs have exactly ONE consumer now (the pair-count
    // aggregate below) — the cache boundary moved to the much narrower
    // count table
    val pairs = Dedup.spread(docs.select(col(textCol)))
      .select(split(col(textCol), " ").as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(__w) - 1),
          |  i -> struct(element_at(__w, i) AS w1,
          |              element_at(__w, i + 1) AS w2))""".stripMargin))
        .as("__bg"))
      .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    // c1/c2/N derive from the UNFILTERED pair-count table (the lmSurprise
    // derived-aggregate shape): Σ counts over the bigram vocabulary equal
    // the corpus totals exactly, so three corpus-sized passes become
    // vocabulary-bounded folds of one shared aggregate
    val pc = Dedup.maybeCache(
      pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair")))
    val big = pc.filter(col("n_pair") >= minCount)
    val c1 = pc.groupBy("w1").agg(sum(col("n_pair")).as("__c1"))
    val c2 = pc.groupBy("w2").agg(sum(col("n_pair")).as("__c2"))
    val n = pc.agg(sum(col("n_pair")).as("__n"))
    val pmi = round(
      log(col("n_pair").cast("double")) + log(col("__n").cast("double")) -
        log(col("__c1").cast("double")) - log(col("__c2").cast("double")),
      6)
    big.join(c1, Seq("w1")).join(c2, Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("n_pair"), pmi.as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }

  /** Per-group token-distribution drift: KL(P_group ‖ P_corpus) with
    * Laplace smoothing over the corpus vocabulary — the mix-monitoring
    * check a training pipeline runs on its domain slices (a source
    * whose token distribution drifts from the corpus mix distorts
    * sampling temperatures and eval splits). Smoothed
    * P_g(t) = (c_gt + 1)/(n_g + V); the sum runs over the FULL corpus
    * vocabulary via a dense (group × vocab) grid, so tokens ABSENT from
    * a group still contribute their smoothed mass (dropping them
    * underestimates drift exactly where it matters). Output per group:
    * token count and KL in nats, rounded to 6.
    *
    * Scale shape: token counts are ordinary partial-agg'd count
    * aggregates; the grid is |groups| × |vocab| — the operator's
    * contract is drift across a HANDFUL of slices (sources, splits),
    * where the grid is a small multiple of the vocabulary. The
    * broadcast sides are the BOUNDED tables: the per-group totals
    * (|groups| rows) and the 1-row corpus totals; the per-token count
    * table is corpus-vocabulary-sized (open vocabularies grow ~n^0.5)
    * and is NEVER broadcast — it stays the streamed side of the grid
    * join. `maxVocab = Some(v)` additionally caps the whole
    * computation to the v globally most frequent tokens (frequency
    * desc, token asc tie-break — a distributed TakeOrdered, no global
    * sort), bounding the grid regardless of corpus size; counts,
    * totals, and V are then all over the capped vocabulary.
    *
    * Determinism: all counts exact integers; each term is
    * P_g (two exact casts, one division) times ln of a ratio whose
    * four factors are each an exact-integer double (every count
    * < 2^53) combined by correctly-rounded IEEE multiply/divide —
    * bit-identical in any IEEE engine, no integer-product overflow at
    * any corpus size — and the per-group sum runs in DECIMAL(38,18) —
    * order-independent, so partitioning never changes the hash. */
  def tokenKlDrift(docs: DataFrame, groupCol: String,
      textCol: String, maxVocab: Option[Int] = None): DataFrame = {
    maxVocab.foreach(v => require(v > 0, s"maxVocab must be positive: $v"))
    // uncapped: the exploded tokens have exactly ONE consumer (the
    // (group, token) count aggregate) — a cache boundary here would pay
    // a corpus-sized materialization for zero reuse; the capped path
    // below has two consumers and caches
    val toksAll0 = Dedup.spread(docs.select(col(groupCol), col(textCol)))
      .select(col(groupCol), explode(split(col(textCol), " ")).as("__t"))
    lazy val toksAll = Dedup.maybeCache(toksAll0)
    val toks = maxVocab match {
      case None => toksAll0
      case Some(v) =>
        // top-v tokens via TakeOrdered (orderBy+limit never globally
        // sorts); the kept-vocab table is ≤ v rows — AQE broadcasts the
        // semi-join
        val keep = toksAll.groupBy(col("__t"))
          .agg(count(lit(1)).as("__kc"))
          .orderBy(col("__kc").desc, col("__t")).limit(v)
          .select("__t")
        Dedup.maybeCache(toksAll.join(keep, Seq("__t"), "left_semi"))
    }
    val gt = toks.groupBy(col(groupCol), col("__t"))
      .agg(count(lit(1)).as("__cgt"))
    klFromTokenCounts(gt, groupCol, "__t", "__cgt")
  }

  /** The KL-drift grid from a PRE-COUNTED (group, token, count) table —
    * the [[tokenKlDrift]] math factored out so count tables from other
    * producers (e.g. a streaming window aggregation's sink) reuse the
    * same smoothed-KL contract: per-group totals, per-token totals,
    * and the 1-row corpus totals derive from the counts; the dense
    * grid, the four-exact-double-factor log ratio, and the
    * order-independent DECIMAL(38,18) group sums are identical.
    * Broadcast sides stay the bounded tables (groups + 1-row totals);
    * the token-keyed count table is never broadcast. */
  def klFromTokenCounts(counts: DataFrame, groupCol: String,
      tokenCol: String, cntCol: String): DataFrame = {
    val gt = Dedup.maybeCache(counts.select(col(groupCol),
      col(tokenCol).as("__t"), col(cntCol).cast("long").as("__cgt")))
    val g = gt.groupBy(col(groupCol)).agg(sum(col("__cgt")).as("__ng"))
    val tv = gt.groupBy(col("__t")).agg(sum(col("__cgt")).as("__ct"))
    val tot = gt.agg(sum(col("__cgt")).as("__n"),
      countDistinct(col("__t")).as("__v"))
    val grid = tv.crossJoin(broadcast(g)).crossJoin(broadcast(tot))
      .join(gt, Seq(groupCol, "__t"), "left")
      .withColumn("__cgt", coalesce(col("__cgt"), lit(0L)))
    val pg = (col("__cgt").cast("double") + lit(1.0)) /
      (col("__ng").cast("double") + col("__v").cast("double"))
    val num = (col("__cgt").cast("double") + lit(1.0)) *
      (col("__n").cast("double") + col("__v").cast("double"))
    val den = (col("__ng").cast("double") + col("__v").cast("double")) *
      (col("__ct").cast("double") + lit(1.0))
    grid.withColumn("__kl", (pg * log(num / den)).cast("decimal(38,18)"))
      .groupBy(col(groupCol))
      .agg(max(col("__ng")).as("n_tokens"),
        sum(col("__kl")).as("__sum"))
      .select(col(groupCol), col("n_tokens"),
        round(col("__sum").cast("double"), 6).as("kl"))
  }

  /** Collapse runs of immediately-repeated tokens ("the the the" →
    * "the") — the stutter-cleanup pass ASR transcripts, scraped chat
    * logs, and generation-loop outputs all need before token budgeting
    * (a loop artifact repeats one token thousands of times and
    * dominates every count-based metric downstream). Pure map-side
    * array expressions: keep token i iff i = 0 or it differs from
    * token i−1 — O(len) per row, no shuffle, order preserved, only
    * ADJACENT duplicates collapse (legitimate long-range reuse stays).
    * Returns (cleaned, n_removed) as two Columns derived from one
    * split. */
  def collapseRepeatTokens(textCol: String): (Column, Column) = {
    val toks = split(col(textCol), " ")
    // element_at is 1-based, the lambda index 0-based: element_at(toks, i)
    // IS the previous token
    val kept = filter(toks, (x, i) =>
      i === lit(0) || x =!= element_at(toks, i))
    (array_join(kept, " "), size(toks) - size(kept))
  }

  /** TF-IDF keyword extraction: the k most characteristic terms per
    * document — the corpus-relative twin of [[bm25]] (which scores docs
    * against a QUERY; this scores every term against its own corpus,
    * the per-doc tag/keyword step of search-index and topic-labeling
    * pipelines). Smoothed sklearn-style weight:
    * tfidf = tf · (ln((1+N)/(1+df)) + 1), so df = N costs nothing but
    * never divides by zero.
    *
    * Scale shape: one explode feeds a (doc, term) partial-agg'd count;
    * df folds that tf table again (both shuffles bounded by doc×vocab
    * and vocab); N rides a 1-row broadcast; the tf⋈df equi-join on the
    * term key is left UN-hinted (AQE broadcasts the vocab side only
    * while it is actually small — the tokenKlDrift lesson); the final
    * per-doc top-k is one ranking window. Nothing is ever all-pairs
    * and no unbounded table is forced into a broadcast.
    *
    * Determinism: tf/df/N are exact integers; the score is one `ln` of
    * an exact rational (JVM↔DuckDB libm agree to ≤1 ulp) under two
    * correctly-rounded double ops; `round(…, 6)` absorbs the ulp and
    * the RANK is taken on the ROUNDED value with a term-text tie-break
    * — the collocations ulp-safe-cut convention — so the top-k boundary
    * never sits on a last-bit difference. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val tf = Dedup.maybeCache(Dedup.spread(
      docs.filter(col(textCol).isNotNull)
        .select(col(idCol), col(textCol)))
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("__tf")))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val n = tf.agg(countDistinct(col(idCol)).as("__n"))
    val score = col("__tf").cast("double") *
      (log((lit(1.0) + col("__n").cast("double")) /
        (lit(1.0) + col("__df").cast("double"))) + lit(1.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfT, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(score, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tfidf"), col("rank"))
  }

  /** Class-based TF-IDF (c-TF-IDF, the BERTopic topic-labeling shape):
    * the k terms most characteristic of each GROUP (source, cluster,
    * topic) rather than each document — [[tfidfTopTerms]] with the
    * group as the "document": tf = the term's count in the group,
    * df = how many groups contain it, N = group count. Same scale
    * shape (group×vocab and vocab-bounded shuffles, un-hinted df join,
    * 1-row N broadcast, per-group ranking window) and the same
    * ulp-safe ROUNDED-rank cut with a term tie-break. */
  def tfidfTopTermsByGroup(docs: DataFrame, groupCol: String,
      textCol: String, k: Int = 5): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val tf = Dedup.maybeCache(Dedup.spread(
      docs.filter(col(textCol).isNotNull)
        .select(col(groupCol), col(textCol)))
      .select(col(groupCol), explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).as("__tf")))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val n = tf.agg(countDistinct(col(groupCol)).as("__n"))
    val score = col("__tf").cast("double") *
      (log((lit(1.0) + col("__n").cast("double")) /
        (lit(1.0) + col("__df").cast("double"))) + lit(1.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfT, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(score, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("term"), col("tfidf"), col("rank"))
  }

  /** Okapi BM25 relevance ranking for a bag of query terms (Robertson &
    * Zaragoza 2009; k1 = 1.2, b = 0.75) — the classic lexical retrieval
    * scorer a curation pipeline uses to pull topical slices out of a
    * corpus. Returns the `topK` highest-scoring documents
    * (id, bm25, rank), ties broken by id.
    *
    * Scale shape: term frequencies and document length come from ONE
    * map-side pass over whitespace tokens (array `filter` counts per
    * term — no explode, no per-token shuffle); the corpus statistics
    * (N, total tokens, per-term document frequencies) are a single
    * 1-row aggregate broadcast back over the corpus; the global top-k
    * is a distributed TakeOrdered, and rank assignment windows only the
    * k surviving rows. Nothing shuffles but the aggregate's partials
    * and the k winners.
    *
    * Determinism: tf / df / dl are exact integers; the score is a fixed
    * tree of IEEE double ops over them (divisions/multiplies/adds are
    * correctly-rounded, hence bit-identical in any engine evaluating
    * the same tree), plus one `ln` per term, where JVM and DuckDB libm
    * agree to ≤ 1 ulp (measured: 11 of 11,500 idf inputs differ at the
    * last bit) — `round(…, 6)` absorbs it. The oracle SQL mirrors the
    * operator's exact expression tree, generated from the same term
    * list. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(topK > 0, s"topK must be positive: $topK")
    val toks = split(col(textCol), " ")
    val tfCols = terms.indices.map(i =>
      size(filter(toks, x => x === lit(terms(i)))).as(s"__tf$i"))
    // NULL text guard: split(NULL) is a NULL array whose size() is -1,
    // which would poison dl, every tf, AND the corpus stats — such rows
    // are unscorable and drop (mirrored in bm25Sql)
    val stats = docs.filter(col(textCol).isNotNull).select(
      (col(idCol) +: size(toks).as("__dl") +: tfCols): _*)
    val aggHead = count(lit(1)).as("__n")
    val aggTail = sum(col("__dl")).as("__s") +:
      terms.indices.map(i =>
        sum((col(s"__tf$i") > 0).cast("long")).as(s"__df$i"))
    val corpus = stats.agg(aggHead, aggTail: _*)
    val avgdl = col("__s").cast("double") / col("__n").cast("double")
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i").cast("double")
      val dfT = col(s"__df$i").cast("double")
      val idf = log(
        (col("__n").cast("double") - dfT + lit(0.5)) / (dfT + lit(0.5)) +
          lit(1.0))
      idf * (tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(1.0) - lit(0.75) +
          lit(0.75) * (col("__dl").cast("double") / avgdl)))
    }.reduce(_ + _)
    val top = stats.crossJoin(broadcast(corpus))
      .withColumn("__score", score)
      .orderBy(col("__score").desc, col(idCol))
      .limit(topK)
    // rank over the already-limit(topK)'d rows — k rows on one
    // partition is the point (see Sessions.gapRegularity on the
    // WindowExec warning for audited post-limit sites)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__score").desc, col(idCol))
    top.withColumn("rank", row_number().over(w))
      .select(col(idCol), round(col("__score"), 6).as("bm25"), col("rank"))
  }

  /** Per-slice token-distribution Shannon entropy (plus the
    * ln(V)-normalized variant) — the diversity twin of the KL drift op:
    * KL says "slice A differs from the corpus", entropy says "slice A
    * is internally collapsed" (template/boilerplate-heavy slices score
    * low, organic text high). NULL texts and empty tokens dropped (the
    * TTR tokenization). Returns
    * (group, n_tokens, n_types, entropy, norm_entropy); `norm_entropy`
    * is NULL for single-type groups where ln(V) = 0.
    *
    * Shape at 100 TB: the corpus collapses map-side into a
    * vocabulary-bounded (group, token) count table; per-group totals
    * are groups-bounded and ride the only broadcast (the KL-drift
    * bounded-side rule). Determinism: counts exact integers; each term
    * is (c/n)·ln(n/c) from exact-integer doubles (correctly-rounded
    * IEEE ops + one ≤1-ulp ln), summed per group in ORDER-INDEPENDENT
    * DECIMAL(38,18); one final cast + round(6). */
  def tokenEntropy(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val gt = docs.filter(col(textCol).isNotNull)
      .select(col(groupCol), explode(split(col(textCol), " ")).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col(groupCol), col("__t"))
      .agg(count(lit(1)).as("__c"))
    entropyFromTokenCounts(gt, groupCol, "__t", "__c")
  }

  /** The entropy grid from a PRE-COUNTED (group, token, count) table —
    * [[tokenEntropy]]'s math factored out (the klFromTokenCounts
    * precedent) so count tables from other producers — e.g. a
    * streaming window aggregation's sink — reuse the same
    * decimal-summed entropy contract. Broadcast side stays the
    * groups-bounded totals table. */
  def entropyFromTokenCounts(counts: DataFrame, groupCol: String,
      tokenCol: String, cntCol: String): DataFrame = {
    // the vocabulary-bounded count table feeds the totals aggregate AND
    // the grid join — the klFromTokenCounts cache boundary
    val gt = Dedup.maybeCache(counts.select(col(groupCol),
      col(tokenCol).as("__et"), col(cntCol).cast("long").as("__ec")))
    val g = gt.groupBy(col(groupCol))
      .agg(sum(col("__ec")).as("__n"), count(lit(1)).as("n_types"))
    val term = (col("__ec").cast("double") / col("__n").cast("double")) *
      log(col("__n").cast("double") / col("__ec").cast("double"))
    gt.join(broadcast(g), Seq(groupCol))
      .withColumn("__h", term.cast("decimal(38,18)"))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n_tokens"),
        max(col("n_types")).as("n_types"),
        sum(col("__h")).as("__s"))
      .select(col(groupCol), col("n_tokens"), col("n_types"),
        round(col("__s").cast("double"), 6).as("entropy"),
        when(col("n_types") > 1,
          round(col("__s").cast("double") /
            log(col("n_types").cast("double")), 6)).as("norm_entropy"))
  }

  /** Bursty-term mining (Church & Gale 1995): per-term
    * variance-to-mean ratio of per-document occurrence counts, zero
    * docs included through N — content/topical words are bursty
    * (VMR ≫ 1: absent from most docs, repeated where present), function
    * words sit near the Poisson VMR ≈ 1. The topical-vocabulary miner
    * next to TF-IDF/PMI, and a template detector (boilerplate phrases
    * are EXTREME bursts). With mean = tf/N and
    * var = Σc²/N − mean², VMR = var/mean = (N·Σc² − tf²)/(N·tf) —
    * exact integer numerator and denominator, ONE double division +
    * round(6). Rank on the ROUNDED value (ulp-safe cut, the TF-IDF
    * precedent), term asc ties; `minDf` prunes hapax noise.
    *
    * Shape at 100 TB: (term, doc) counts collapse map-side (any tf
    * computation's shape), per-term stats are vocabulary-bounded, N
    * rides a 1-row broadcast, the cut is a distributed TakeOrdered. */
  def burstyTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minDf: Long): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), col(textCol))
    val n = base.agg(count(lit(1)).cast(d38).as("__N"))
    val tc = base
      .select(col(idCol), explode(split(col(textCol), " ")).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col("__t"), col(idCol)).agg(count(lit(1)).as("__c"))
    val st = tc.groupBy(col("__t")).agg(
        count(lit(1)).as("df"),
        sum(col("__c").cast(d38)).as("__tf"),
        sum(col("__c").cast(d38) * col("__c").cast(d38)).as("__cc"))
      .filter(col("df") >= minDf)
    val vmr = round(
      (col("__N") * col("__cc") - col("__tf") * col("__tf")).cast("double") /
        (col("__N") * col("__tf")).cast("double"), 6)
    val scored = st.crossJoin(broadcast(n)).withColumn("vmr", vmr)
    val top = scored.orderBy(col("vmr").desc, col("__t")).limit(k)
    // post-limit(k) rank — see the bm25 note
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("vmr").desc, col("__t"))
    top.withColumn("rank", row_number().over(w))
      .select(col("__t").as("term"), col("df"),
        col("__tf").cast("bigint").as("tf"), col("vmr"), col("rank"))
  }

  /** Zipf law fit per corpus slice: OLS slope of ln(frequency) on
    * ln(rank) over the slice's token frequency table — organic text
    * sits near the Zipfian −1; templated/generated slices flatten
    * (slope → 0) or cliff (≪ −1), making the slope a one-number
    * naturalness audit next to [[tokenEntropy]]. Ranks are total
    * ((count desc, token asc) tie-break). Returns
    * (group, n_types, zipf_slope, intercept); single-type groups have
    * no fit (NULL).
    *
    * Determinism: ranks and counts exact integers; each ln is one
    * libm call on an exact integer (the KL/PMI ≤1-ulp precedent);
    * the four sufficient sums run in order-independent
    * DECIMAL(38,18); the slope/intercept combinations are pinned
    * double trees over one decimal→double conversion per sum,
    * round(6). Shape at 100 TB: the corpus collapses map-side to the
    * vocabulary-bounded count table; the rank window partitions by
    * group over that bounded table; one four-number-per-group
    * aggregate after. */
  def zipfFit(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val d18 = org.apache.spark.sql.types.DecimalType(38, 18)
    val counts = docs.filter(col(textCol).isNotNull)
      .select(col(groupCol), explode(split(col(textCol), " ")).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col(groupCol), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__c").desc, col("__t"))
    val xy = counts.withColumn("__rank", row_number().over(w))
      .select(col(groupCol),
        log(col("__rank").cast("double")).as("__x"),
        log(col("__c").cast("double")).as("__y"))
    val s = xy.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_types"),
      sum(col("__x").cast(d18)).as("__dsx"),
      sum(col("__y").cast(d18)).as("__dsy"),
      sum((col("__x") * col("__y")).cast(d18)).as("__dsxy"),
      sum((col("__x") * col("__x")).cast(d18)).as("__dsxx"))
    val n = col("n_types").cast("double")
    val sx = col("__dsx").cast("double")
    val sy = col("__dsy").cast("double")
    val sxy = col("__dsxy").cast("double")
    val sxx = col("__dsxx").cast("double")
    val den = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy) / den
    s.select(col(groupCol), col("n_types"),
      when(den > 0, round(slope, 6)).as("zipf_slope"),
      when(den > 0, round((sy - slope * sx) / n, 6)).as("intercept"))
  }

  /** Pairwise vocabulary overlap between corpus slices — the
    * cross-source contamination/redundancy audit ("how much of wiki's
    * vocabulary does web already cover?") that guides mixing weights
    * and dedup scoping. For every unordered slice pair (a < b on the
    * group value): both vocabulary sizes, the shared-term count, and
    * Jaccard = |∩| / (|a| + |b| − |∩|) — exact integer counts, ONE
    * double division + round(6). Pairs with an empty intersection are
    * absent (inner join semantics on both engines). NULL texts dropped.
    *
    * Shape at 100 TB: the (group, term) distinct is a vocabulary-
    * bounded partial-agg'd shuffle (the corpus itself collapses
    * map-side); the self-join is a term-keyed EQUI-join whose per-term
    * fan-out is ≤ groups², and every table after is bounded by
    * groups — the corpus never shuffles twice and nothing is ever
    * all-pairs over rows. The size join is groups-bounded (AQE
    * broadcasts it). The distinct (group, term) table is read three
    * times (both join sides + sizes), so it rides the signature cache
    * (Dedup.maybeCache — caching the vocabulary-bounded projection is
    * sound at any corpus size; without it each reuse would rescan the
    * corpus). */
  def vocabOverlap(docs: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val terms = Dedup.maybeCache(docs.filter(col(textCol).isNotNull)
      .select(col(groupCol).as("__g"),
        explode(split(col(textCol), " ")).as("__t"))
      .filter(col("__t") =!= "")
      .distinct())
    val sizes = terms.groupBy(col("__g")).agg(count(lit(1)).as("__v"))
    val inter = terms.select(col("__g").as("group_a"), col("__t"))
      .join(terms.select(col("__g").as("group_b"), col("__t")), "__t")
      .filter(col("group_a") < col("group_b"))
      .groupBy("group_a", "group_b")
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("__g").as("group_a"), col("__v").as("v_a")),
        "group_a")
      .join(sizes.select(col("__g").as("group_b"), col("__v").as("v_b")),
        "group_b")
      .select(col("group_a"), col("group_b"), col("v_a"), col("v_b"),
        col("n_common"),
        round(col("n_common").cast("double") /
          (col("v_a") + col("v_b") - col("n_common")).cast("double"), 6)
          .as("jaccard"))
  }
}
