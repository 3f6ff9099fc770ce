package graft

import graft.adapter.SparkAdapter
import graft.core._
import graft.mat.{MatContext, PipelineMat}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Frozen trainer models + the incremental pipeline materialization:
  * run 1 trains and persists (model relations, the minhash signature
  * index), run 2 APPLIES run-1's artifacts verbatim — increments are
  * gated by the same statistics as the base corpus, dedup'd against the
  * settled index, and appended. Also the legality gate: corpus-global
  * steps are rejected by name inside incremental pipelines. */
class PipelineFrozenSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def freshAdapter(name: String): SparkAdapter = {
    val loc = Files.createTempDirectory(s"graft_$name").toString
    val schema = s"g_$name"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    new SparkAdapter(spark, schema, Some(loc))
  }

  private def node(name: String, cfg: NodeConfig): Node =
    Node(uniqueId = s"model.spec.$name", name = name, packageName = "spec",
      kind = NodeKind.Model, config = cfg)

  private def runPipeline(a: SparkAdapter, rel: Relation,
      steps: Seq[Map[String, Any]], df: DataFrame,
      incremental: Boolean = false, fullRefresh: Boolean = false): Unit =
    PipelineMat.run(MatContext(a, node(rel.identifier,
      NodeConfig(materialized = "pipeline", extra =
        Map("steps" -> steps.toVector) ++
          (if (incremental) Map("incremental" -> "true") else Map.empty))),
      rel, () => df, fullRefresh))

  // --- frozen trainer models -------------------------------------------

  test("frozen classifier: run 2 applies run-1's weights verbatim") {
    import spark.implicits._
    val a = freshAdapter("frozen_clf")
    val rel = Relation(a.defaultSchema, "gated")
    val modelRel = Relation(a.defaultSchema,
      "gated__model_quality_classifier_filter")
    val trainDocs = Seq(
      (1L, "the a of and to in is table scan row merge fast system"),
      (2L, "tiny words here"),
      (3L, "the and for are with his they this have from one had word"),
      (4L, "zz")).toDF("doc_id", "text")
    val step = Map[String, Any]("op" -> "quality_classifier_filter",
      "mode" -> "frozen", "threshold" -> 0.5)
    runPipeline(a, rel, Seq(step), trainDocs)
    assert(a.relationExists(modelRel), "run 1 persists the model")
    val w1 = a.read(modelRel).orderBy("idx").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(w1.length == 5, "bias + 4 features")

    // run 2: different corpus — the model must NOT retrain, and the
    // kept set must equal scoring under run-1's weights
    val newDocs = Seq(
      (10L, "the a of and to in is table scan row merge fast system"),
      (11L, "qq ww")).toDF("doc_id", "text")
    runPipeline(a, rel, Seq(step), newDocs)
    val w2 = a.read(modelRel).orderBy("idx").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(w2 == w1, "artifact unchanged after run 2 (no retrain)")
    val expected = {
      val feat = graft.ops.Classify.gateFeatures(
        newDocs, "doc_id", "text", carryCols = Nil)
      feat.filter(graft.ops.Classify.fastSigmoid(graft.ops.Classify.z(
        w1.map(_._2), Seq("x1", "x2", "x3", "x4"))) >= 0.5)
        .collect().map(_.getLong(0)).toSet
    }
    val got = a.read(rel).collect().map(_.getLong(0)).toSet
    assert(got == expected, s"run 2 scored under run-1 weights: $got")
  }

  test("frozen bpe token_count: run 2 counts under run-1's merge table") {
    import spark.implicits._
    val a = freshAdapter("frozen_bpe")
    val rel = Relation(a.defaultSchema, "counted")
    val modelRel = Relation(a.defaultSchema, "counted__model_token_count")
    val trainDocs = Seq((1L, "aaab aaab aaab"), (2L, "aaab xy"))
      .toDF("doc_id", "text")
    val step = Map[String, Any]("op" -> "token_count",
      "tokenizer" -> "bpe", "merges" -> 2, "mode" -> "frozen")
    runPipeline(a, rel, Seq(step), trainDocs)
    val merges1 = a.read(modelRel).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges1 == graft.ops.Bpe.train(trainDocs, "text", 2),
      "persisted merge table = the trainer's")

    // run 2: 'zz zz' is OOV under run-1's merges — counts must come from
    // the FROZEN table, not a retrain on the new corpus
    val newDocs = Seq((10L, "aaab zz")).toDF("doc_id", "text")
    runPipeline(a, rel, Seq(step), newDocs)
    assert(a.read(modelRel).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq == merges1,
      "artifact unchanged after run 2")
    val gotTok = a.read(rel).select("doc_id", "n_tok").head()
    val expTok = newDocs.select(col("doc_id"),
      graft.ops.Bpe.tokenCount("text", merges1).as("n_tok")).head()
    assert(gotTok.getLong(0) == expTok.getLong(0) &&
      gotTok.getInt(1) == expTok.getInt(1),
      s"frozen count: $gotTok vs $expTok")
  }

  test("frozen surprise_filter: run-1 parity with retrain on same input") {
    import spark.implicits._
    val a = freshAdapter("frozen_lm")
    val rel = Relation(a.defaultSchema, "kept")
    val docs = Seq(
      (1L, "a b a b a b a b"), (2L, "a b a b a b a b"),
      (3L, "q z k w m t r v"), (4L, "solo")).toDF("doc_id", "text")
    val scored = graft.ops.TextAnalysis.lmSurprise(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val cut = (scored(1L) + scored(3L)) / 2
    runPipeline(a, rel, Seq(Map[String, Any]("op" -> "surprise_filter",
      "max_surprise" -> cut, "mode" -> "frozen")), docs)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "frozen gate on the training corpus = the inline trainer's keeps")
    assert(a.relationExists(Relation(a.defaultSchema,
      "kept__model_surprise_filter")))
  }

  test("frozen dsir_select: scoreWithRatios∘bucketRatios ≡ importanceWeights") {
    import spark.implicits._
    val docs = ((1L to 12L).map { i =>
      (i, if (i % 3 == 0) "tgt" else "oth",
        if (i % 3 == 0) "cat mat cat" else "dog log fog")
    }).toDF("doc_id", "grp", "text")
    val slim = docs.select("doc_id", "text")
    val target = docs.filter(col("grp") === "tgt").select("doc_id", "text")
    val inline = graft.ops.Dsir.importanceWeights(
      slim, target, "doc_id", "text", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ratios = graft.ops.Dsir.bucketRatios(
      slim, target, "doc_id", "text", buckets = 64)
    val frozen = graft.ops.Dsir.scoreWithRatios(
      slim, "doc_id", "text", ratios, buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(frozen == inline, "run-1 parity, bit-for-bit")
    // held-out text with fully-unseen features scores the sentinel
    // default on every bucket: logw = round(lr_default, 6)
    val dflt = ratios.filter(col("bucket") < 0).head().getDouble(1)
    val held = Seq((99L, "zebra quagga")).toDF("doc_id", "text")
    val out = graft.ops.Dsir.scoreWithRatios(
      held, "doc_id", "text", ratios, buckets = 64).head()
    assert(out.getLong(1) == 3L, "2 unigrams + 1 bigram")
    assert(out.getDouble(2) == math.rint(dflt * 1e6) / 1e6,
      s"unseen features score the smoothed default: $out vs $dflt")

    // the frozen step keeps rows under the persisted table
    val aa = freshAdapter("frozen_dsir")
    val rel = Relation(aa.defaultSchema, "selected")
    runPipeline(aa, rel, Seq(Map[String, Any]("op" -> "dsir_select",
      "target_where" -> "grp = 'tgt'", "min_logw" -> 0.0,
      "buckets" -> 64, "mode" -> "frozen")), docs)
    val kept = aa.read(rel).collect().map(_.getString(1)).toSet
    assert(kept == Set("tgt"), s"only target-like rows clear logw≥0: $kept")
  }

  // --- the incremental pipeline ----------------------------------------

  test("incremental pipeline: batch 2 dedups against the settled index and appends") {
    import spark.implicits._
    val a = freshAdapter("incr_pipe")
    val rel = Relation(a.defaultSchema, "corpus")
    val sigsRel = Relation(a.defaultSchema,
      "corpus__state_minhash_dedup")
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "totally different words entirely here now for testing once"
    val steps = Seq(
      Map[String, Any]("op" -> "minhash_dedup"),
      Map[String, Any]("op" -> "token_count"))
    val bandsRel = Relation(a.defaultSchema,
      "corpus__state_minhash_dedup_bands")
    // batch 1: 1≈2 dup (min id 1 kept), 3 unique
    val b1 = Seq((1L, t1), (2L, t1), (3L, t2)).toDF("doc_id", "text")
    runPipeline(a, rel, steps, b1, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(a.relationExists(sigsRel), "signature index persisted")
    assert(a.read(sigsRel).count() == 3, "index holds every doc SEEN")
    assert(a.relationExists(bandsRel), "banded twin persisted")
    assert(a.read(bandsRel).count() == 3 * 21,
      "one banded row per (doc, band)")

    // batch 2: 10 dups a settled doc (drops — component touches the
    // index), 11≈12 are a new-new cluster (11 kept), 13 unique
    val t3 = "completely fresh material nothing shared with previous batches at all"
    val b2 = Seq((10L, t1), (11L, t3), (12L, t3),
      (13L, "unique new content appearing only in the second batch run"))
      .toDF("doc_id", "text")
    runPipeline(a, rel, steps, b2, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 11L, 13L),
      "settled rows stay; 10 drops against the index; 11 wins its cluster")
    assert(a.read(sigsRel).count() == 7, "batch sigs appended to the index")
    assert(a.read(bandsRel).count() == 7 * 21,
      "banded twin appended in lockstep")

    // pre-upgrade state (no banded twin): the batch derives it from
    // the signature table and persists it with the deferred writes
    a.dropRelation(bandsRel)
    val b3 = Seq((20L, t3),
      (21L, "yet another brand new never seen before document text here"))
      .toDF("doc_id", "text")
    runPipeline(a, rel, steps, b3, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 11L, 13L, 21L),
      "20 dups settled 11 and drops even without the banded twin on disk")
    assert(a.relationExists(bandsRel) && a.read(bandsRel).count() == 9 * 21,
      "banded twin rebuilt from the signature table")

    // --full-refresh rebuilds everything from the (new) full input
    runPipeline(a, rel, steps, b1.unionByName(b2), incremental = true,
      fullRefresh = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 11L, 13L))
    assert(a.read(sigsRel).count() == 7, "index rebuilt, not appended")
    assert(a.read(bandsRel).count() == 7 * 21, "banded twin rebuilt too")
  }

  test("incremental exact_dedup: settled texts drop, state appends, refresh rebuilds") {
    import spark.implicits._
    val a = freshAdapter("incr_exact")
    val rel = Relation(a.defaultSchema, "uniq")
    val stateRel = Relation(a.defaultSchema, "uniq__state_exact_dedup")
    val steps = Seq(Map[String, Any]("op" -> "exact_dedup"))
    // batch 1: "A" duplicated (1 kept, min id), "B" unique, 4 has NULL
    // text (sha2(NULL) is NULL — the index must store a marker, or NULL
    // canonicals leak through every later batch)
    val b1 = Seq((1L, "A"), (2L, "A"), (3L, "B"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    runPipeline(a, rel, steps, b1, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
    assert(a.relationExists(stateRel), "text-hash state persisted")
    assert(a.read(stateRel).count() == 3, "one hash per DISTINCT text seen")

    // batch 2: 10 repeats a settled text (drops), 11/12 duplicate a new
    // text (11 kept), 13 repeats the OTHER settled text (drops), 14 is
    // another NULL text (settled by 4 — must drop, not survive)
    val b2 = Seq((10L, "A"), (11L, "C"), (12L, "C"), (13L, "B"),
      (14L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    runPipeline(a, rel, steps, b2, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 4L, 11L),
      "settled canonicals stay; seen texts (incl. NULL) drop; 11 wins")
    assert(a.read(stateRel).count() == 4, "only the NEW hash appended")

    // lost state on a batch run fails loudly naming --full-refresh
    a.dropRelation(stateRel)
    val e = intercept[IllegalStateException](
      runPipeline(a, rel, steps, b2, incremental = true))
    assert(e.getMessage.contains("--full-refresh"))

    // --full-refresh rebuilds target and state from the new full input
    runPipeline(a, rel, steps, b1.unionByName(b2), incremental = true,
      fullRefresh = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 4L, 11L),
      "one NULL canonical after refresh — same as the batch composition")
    assert(a.read(stateRel).count() == 4, "state rebuilt, not appended")
  }

  test("frozen winsorize: batches clip under run-1's band; unseen groups pass") {
    import spark.implicits._
    val a = freshAdapter("frozen_wins")
    val rel = Relation(a.defaultSchema, "clipped")
    val modelRel = Relation(a.defaultSchema, "clipped__model_winsorize")
    // p25/p75 over 1..8: type-1 lo = 2nd value, hi = 6th value
    val step = Map[String, Any]("op" -> "winsorize", "group_col" -> "g",
      "value_col" -> "v", "lo_num" -> 1, "lo_den" -> 4,
      "hi_num" -> 3, "hi_den" -> 4)
    val b1 = (1 to 8).map(i => (i.toLong, "a", i.toDouble))
      .toDF("doc_id", "g", "v")
    runPipeline(a, rel, Seq(step), b1, incremental = true)
    assert(a.relationExists(modelRel), "bounds artifact persisted")
    assert(a.read(modelRel).collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet ==
      Set(("a", 2.0, 6.0)), "run-1 [p25, p75] band")
    // run-1 parity: same clip the inline operator computes
    assert(a.read(rel).orderBy("doc_id").collect().map(_.getDouble(2))
      .toSeq == Seq(2.0, 2.0, 3.0, 4.0, 5.0, 6.0, 6.0, 6.0))

    // batch: clipped under the FROZEN band (not this batch's own
    // quantiles); the unseen group passes unclipped
    val b2 = Seq((10L, "a", 0.0), (11L, "a", 100.0), (12L, "z", 999.0))
      .toDF("doc_id", "g", "v")
    runPipeline(a, rel, Seq(step), b2, incremental = true)
    val got = a.read(rel).filter(col("doc_id") >= 10L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == Map(10L -> 2.0, 11L -> 6.0, 12L -> 999.0), got.toString)

    // a changed band fraction must fail loudly, never clip silently
    val e = intercept[IllegalStateException](
      runPipeline(a, rel, Seq(step ++ Map("hi_num" -> 9,
        "hi_den" -> 10)), b2, incremental = true))
    assert(e.getMessage.contains("--full-refresh"))
  }

  test("frozen mad_outlier_filter: batches face run-1's fence; unseen groups pass") {
    import spark.implicits._
    val a = freshAdapter("frozen_mad")
    val rel = Relation(a.defaultSchema, "fenced")
    val modelRel = Relation(a.defaultSchema,
      "fenced__model_mad_outlier_filter")
    val step = Map[String, Any]("op" -> "mad_outlier_filter",
      "group_col" -> "g", "value_col" -> "v")
    // median 5, MAD 0: anything != 5 is outside the frozen fence
    val b1 = Seq((1L, "a", 5.0), (2L, "a", 5.0), (3L, "a", 5.0),
      (4L, "a", 5.0), (5L, "a", 100.0)).toDF("doc_id", "g", "v")
    runPipeline(a, rel, Seq(step), b1, incremental = true)
    assert(a.read(modelRel).collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet ==
      Set(("a", 5.0, 0.0)), "run-1 (median, MAD)")
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 4L), "run-1 parity: the 100 is outside the fence")

    // batch: judged by the FROZEN fence, not this batch's own median
    // (the batch's own median would be 7 and keep everything)
    val b2 = Seq((10L, "a", 5.0), (11L, "a", 7.0), (12L, "a", 7.0),
      (13L, "z", 999.0)).toDF("doc_id", "g", "v")
    runPipeline(a, rel, Seq(step), b2, incremental = true)
    assert(a.read(rel).filter(col("doc_id") >= 10L)
      .collect().map(_.getLong(0)).toSet == Set(10L, 13L),
      "7s violate the frozen MAD-0 fence; the unseen group passes")
  }

  test("incremental pipeline: frozen LM gates batch 2 by batch-1 statistics") {
    import spark.implicits._
    val a = freshAdapter("incr_lm")
    val rel = Relation(a.defaultSchema, "gated")
    val b1 = Seq(
      (1L, "a b a b a b a b"), (2L, "a b a b a b a b"),
      (3L, "a b a b a b a b")).toDF("doc_id", "text")
    // cut chosen so predictable text passes and scrambled text fails
    // UNDER THE BATCH-1 MODEL
    val scored = graft.ops.TextAnalysis.lmSurprise(b1, "doc_id", "text")
      .head().getDouble(2)
    val steps = Seq(Map[String, Any]("op" -> "surprise_filter",
      "max_surprise" -> (scored + 0.1)))
    runPipeline(a, rel, steps, b1, incremental = true)
    assert(a.read(rel).count() == 3)
    // batch 2: 10 repeats the in-model pattern (passes); 11 is OOV text
    // that would score ~ln(V)=ln(2)≈0.69 over... under the frozen model
    // every unseen bigram costs more than the in-vocab 'a b' transition
    val b2 = Seq((10L, "a b a b"), (11L, "q z k w m t r v"))
      .toDF("doc_id", "text")
    runPipeline(a, rel, steps, b2, incremental = true)
    val got = a.read(rel).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 10L),
      s"in-model batch-2 doc passes, OOV doc fails under frozen stats: $got")
  }

  test("incremental pipeline: simhash_dedup batches dedup against the signature index") {
    import spark.implicits._
    val a = freshAdapter("incr_sim")
    val rel = Relation(a.defaultSchema, "simcorpus")
    val sigsRel = Relation(a.defaultSchema, "simcorpus__state_simhash_dedup")
    val bandsRel = Relation(a.defaultSchema,
      "simcorpus__state_simhash_dedup_bands")
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "totally different words entirely here now for testing once"
    val t3 = "completely fresh material nothing shared with previous batches at all"
    val steps = Seq(Map[String, Any]("op" -> "simhash_dedup"))
    // batch 1: identical texts → hamming 0 (1 kept, min id), 3 distinct
    val b1 = Seq((1L, t1), (2L, t1), (3L, t2)).toDF("doc_id", "text")
    runPipeline(a, rel, steps, b1, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(a.relationExists(sigsRel), "signature index persisted")
    assert(a.read(sigsRel).count() == 3, "five ints per doc SEEN")
    assert(a.relationExists(bandsRel) && a.read(bandsRel).count() == 3 * 4,
      "one banded row per (doc, chunk)")

    // batch 2: 10 dups a settled doc (drops), 11≈12 new-new (11 kept),
    // 13 distinct
    val b2 = Seq((10L, t1), (11L, t3), (12L, t3),
      (13L, "unique new content appearing only in the second batch run"))
      .toDF("doc_id", "text")
    runPipeline(a, rel, steps, b2, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 11L, 13L),
      "settled rows stay; 10 drops against the index; 11 wins its cluster")
    assert(a.read(sigsRel).count() == 7, "batch sigs appended")
    assert(a.read(bandsRel).count() == 7 * 4, "banded twin in lockstep")

    // pre-upgrade state (no banded twin): derived in-memory, persisted
    // with the deferred writes
    a.dropRelation(bandsRel)
    val b3 = Seq((20L, t3),
      (21L, "yet another brand new never seen before document text here"))
      .toDF("doc_id", "text")
    runPipeline(a, rel, steps, b3, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 11L, 13L, 21L),
      "20 dups settled 11 and drops even without the banded twin on disk")
    assert(a.relationExists(bandsRel) && a.read(bandsRel).count() == 9 * 4,
      "banded twin rebuilt from the signature table")

    // --full-refresh rebuilds everything from the (new) full input
    runPipeline(a, rel, steps, b1.unionByName(b2), incremental = true,
      fullRefresh = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 11L, 13L))
    assert(a.read(sigsRel).count() == 7, "index rebuilt, not appended")
    assert(a.read(bandsRel).count() == 7 * 4, "banded twin rebuilt too")
  }

  /** Deterministic pseudo-random vector / near-duplicate (cosine ≈ 0.999)
    * — same recipe as DedupSpec's fixtures. */
  private def vec(seed: Int, dim: Int = 32): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)((r.nextDouble() - 0.5).toFloat)
  }
  private def nearDup(v: Array[Float], seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    v.map(x => x + (r.nextDouble() - 0.5).toFloat * 0.02f)
  }

  test("incremental pipeline: semantic_dedup batches dedup against the vector index") {
    import spark.implicits._
    val a = freshAdapter("incr_sem")
    val rel = Relation(a.defaultSchema, "vecs")
    val vecsRel = Relation(a.defaultSchema, "vecs__state_semantic_dedup")
    val bandsRel = Relation(a.defaultSchema,
      "vecs__state_semantic_dedup_bands")
    val steps = Seq(Map[String, Any]("op" -> "semantic_dedup",
      "method" -> "lsh", "id_col" -> "vec_id", "vec_col" -> "embedding",
      "threshold" -> 0.9))
    // batch 1: 1≈2 near-dup (min id 1 kept), 3 distinct
    val b1 = Seq((1L, vec(7)), (2L, nearDup(vec(7), 11)), (3L, vec(13)))
      .toDF("vec_id", "embedding")
    runPipeline(a, rel, steps, b1, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(a.relationExists(vecsRel), "vector index persisted")
    assert(a.read(vecsRel).count() == 3, "index holds every vector SEEN")
    assert(a.relationExists(bandsRel), "banded twin persisted")
    assert(a.read(bandsRel).count() == 3 * 16,
      "one banded row per (vector, band)")

    // batch 2: 10 dups a settled vector (component touches the index →
    // drops), 11≈12 are a new-new cluster (11 kept), 13 distinct
    val b2 = Seq((10L, nearDup(vec(7), 17)), (11L, vec(21)),
      (12L, nearDup(vec(21), 19)), (13L, vec(33)))
      .toDF("vec_id", "embedding")
    runPipeline(a, rel, steps, b2, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 11L, 13L),
      "settled rows stay; 10 drops against the index; 11 wins its cluster")
    assert(a.read(vecsRel).count() == 7, "batch vectors appended")
    assert(a.read(bandsRel).count() == 7 * 16,
      "banded twin appended in lockstep")

    // changed banding params must fail loudly, never band a stale index
    val e = intercept[IllegalStateException](
      runPipeline(a, rel, Seq(steps.head ++ Map("bands" -> 8)), b2,
        incremental = true))
    assert(e.getMessage.contains("--full-refresh"))

    // pre-upgrade state (no banded twin): derived from the vector table
    // and persisted with the deferred writes
    a.dropRelation(bandsRel)
    val b3 = Seq((20L, nearDup(vec(21), 23)), (21L, vec(44)))
      .toDF("vec_id", "embedding")
    runPipeline(a, rel, steps, b3, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 11L, 13L, 21L),
      "20 dups settled 11 and drops even without the banded twin on disk")
    assert(a.relationExists(bandsRel) && a.read(bandsRel).count() == 9 * 16,
      "banded twin rebuilt from the vector table")

    // --full-refresh rebuilds everything from the (new) full input
    runPipeline(a, rel, steps, b1.unionByName(b2), incremental = true,
      fullRefresh = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 11L, 13L))
    assert(a.read(vecsRel).count() == 7, "index rebuilt, not appended")
    assert(a.read(bandsRel).count() == 7 * 16, "banded twin rebuilt too")
  }

  test("frozen cluster_assign: batches route under run-1's centroids") {
    import spark.implicits._
    val a = freshAdapter("frozen_clus")
    val rel = Relation(a.defaultSchema, "routed")
    val modelRel = Relation(a.defaultSchema, "routed__model_cluster_assign")
    val step = Map[String, Any]("op" -> "cluster_assign", "k" -> 2,
      "iters" -> 2, "id_col" -> "vec_id", "vec_col" -> "embedding")
    // init = the 2 smallest ids' vectors: axis-aligned, so Lloyd's
    // separates the clusters immediately and deterministically
    val b1 = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f, 0f)), (4L, Array(0.1f, 0.9f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    runPipeline(a, rel, Seq(step), b1, incremental = true)
    assert(a.relationExists(modelRel), "centroid artifact persisted")
    assert(a.read(modelRel).count() == 2 * 4, "k×dim centroid rows")
    val got1 = a.read(rel).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got1 == Map(1L -> 0, 3L -> 0, 2L -> 1, 4L -> 1),
      s"run-1 assignment under the trained cells: $got1")

    // batch: routed by run-1's frozen centroids ([0.95,0.05,..] /
    // [0.05,0.95,..]) — NOT retrained on the batch's own two vectors
    // (batch-trained init would put 10 and 11 in separate cells at
    // centroid positions that flip 11's assignment)
    val b2 = Seq((10L, Array(0.8f, 0.2f, 0f, 0f)),
      (11L, Array(0.2f, 0.8f, 0f, 0f))).toDF("vec_id", "embedding")
    runPipeline(a, rel, Seq(step), b2, incremental = true)
    val got2 = a.read(rel).filter(col("vec_id") >= 10L).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got2 == Map(10L -> 0, 11L -> 1),
      s"batch routed under frozen cells: $got2")
    assert(a.read(modelRel).count() == 2 * 4,
      "artifact unchanged after the batch run")

    // a changed k must fail loudly, never route under a stale quantizer
    val e = intercept[IllegalStateException](
      runPipeline(a, rel, Seq(step ++ Map("k" -> 4)), b2,
        incremental = true))
    assert(e.getMessage.contains("--full-refresh"))
  }

  test("one incremental pipeline composes multiple state families") {
    import spark.implicits._
    val a = freshAdapter("incr_multi")
    val rel = Relation(a.defaultSchema, "multi")
    val steps = Seq(
      Map[String, Any]("op" -> "exact_dedup"),
      Map[String, Any]("op" -> "minhash_dedup"),
      Map[String, Any]("op" -> "token_count"))
    // 20 tokens differing only in the last → shingle Jaccard 17/19 ≈
    // 0.89, comfortably above the 0.8 minhash threshold (the estimate
    // is deterministic: fixed hash permutations)
    val t1 = ((1 to 19).map(i => s"w$i") :+ "end").mkString(" ")
    val t1near = ((1 to 19).map(i => s"w$i") :+ "changed").mkString(" ")
    val t2 = "totally different words entirely here now for testing once"
    // batch 1: 1=2 exact dups (1 kept), 3 distinct
    val b1 = Seq((1L, t1), (2L, t1), (3L, t2)).toDF("doc_id", "text")
    runPipeline(a, rel, steps, b1, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // each stateful step owns its own state relation
    val exactRel = Relation(a.defaultSchema, "multi__state_exact_dedup")
    val mhRel = Relation(a.defaultSchema, "multi__state_minhash_dedup")
    assert(a.relationExists(exactRel) && a.relationExists(mhRel),
      "both state families persisted side by side")
    assert(a.read(exactRel).count() == 2, "exact index: distinct texts")
    assert(a.read(mhRel).count() == 2,
      "minhash index sees the exact-dedup SURVIVORS (downstream step)")

    // batch 2: 10 exact-repeats a settled text (drops at the exact
    // index); 11 is a NEAR dup of settled 1 (passes exact, drops at the
    // minhash index); 12 is new (kept)
    val b2 = Seq((10L, t2), (11L, t1near),
      (12L, "yet another brand new never seen before document text here"))
      .toDF("doc_id", "text")
    runPipeline(a, rel, steps, b2, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 12L),
      "exact index drops 10, minhash index drops near-dup 11, 12 lands")
    assert(a.read(exactRel).count() == 4,
      "batch's NEW texts appended to the exact index (t1near + new)")
    assert(a.read(mhRel).count() == 4,
      "batch's exact-survivor signatures appended to the minhash index")
  }

  // --- legality + failure modes ----------------------------------------

  test("incremental pipeline: media_dedup(exact) batches drop EVER-seen " +
      "bodies via the checksum index; corrupt payloads always keep") {
    import graft.ops.Multimodal
    import spark.implicits._
    val a = freshAdapter("incr_media")
    val rel = Relation(a.defaultSchema, "mediacorpus")
    val stateRel = Relation(a.defaultSchema,
      "mediacorpus__state_media_dedup")
    val steps = Seq(Map[String, Any]("op" -> "media_dedup"))
    val t1 = "alpha beta gamma delta epsilon zeta"
    val t2 = "totally different body content here now"
    def media(rows: (Long, String)*): org.apache.spark.sql.DataFrame =
      Multimodal.syntheticMedia(rows.toSeq.toDF("doc_id", "text"))
    // batch 1: 1 and 2 share a body (headers differ — dims derive from
    // the id); 1 kept, both keys... the body is ONE key
    runPipeline(a, rel, steps, media((1L, t1), (2L, t1), (3L, t2)),
      incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(a.relationExists(stateRel), "checksum index persisted")
    assert(a.read(stateRel).count() == 2, "one key per distinct body")

    // batch 2: 10 repeats a settled body (drops); 11 is new; plus one
    // corrupt payload that must pass through and never enter the state
    val b2 = media((10L, t1), (11L, "brand new second batch body text"))
      .unionByName(Seq((99L, "audio", Array[Byte](9, 9)))
        .toDF("doc_id", "media_type", "payload"))
    runPipeline(a, rel, steps, b2, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 11L, 99L),
      "10 drops against the index; corrupt 99 kept")
    assert(a.read(stateRel).count() == 3,
      "only the fresh valid body's key appended")

    // switching method is a state-format change: loud error
    val e = intercept[IllegalStateException](
      runPipeline(a, rel,
        Seq(Map[String, Any]("op" -> "media_dedup", "method" -> "simhash")),
        media((20L, t2)), incremental = true))
    assert(e.getMessage.contains("--full-refresh"), e.getMessage)
  }

  test("incremental pipeline: fuzzy_dedup batches dedup against the " +
      "string index under the FROZEN gram-frequency order") {
    import spark.implicits._
    val a = freshAdapter("incr_fuzzy")
    val rel = Relation(a.defaultSchema, "titles")
    val strsRel = Relation(a.defaultSchema, "titles__state_fuzzy_dedup")
    val freqRel = Relation(a.defaultSchema,
      "titles__state_fuzzy_dedup_freq")
    val gramsRel = Relation(a.defaultSchema,
      "titles__state_fuzzy_dedup_grams")
    val steps = Seq(Map[String, Any]("op" -> "fuzzy_dedup",
      "id_col" -> "doc_id", "str_col" -> "title", "max_dist" -> 2))
    // base: 1≈2 typo pair (1 kept), 3 unique
    val b1 = Seq((1L, "evening report final"), (2L, "evening report finale"),
      (3L, "completely unrelated")).toDF("doc_id", "title")
    runPipeline(a, rel, steps, b1, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(a.relationExists(strsRel) && a.read(strsRel).count() == 3)
    assert(a.relationExists(freqRel), "frozen frequency table persisted")
    assert(a.relationExists(gramsRel), "prefix postings persisted")
    val frozenCount = a.read(freqRel).count()

    // batch: 10 is a typo of settled 2 (a DROPPED doc — still settles
    // it); 11≈12 pure-new pair (11 kept); 13 unique with grams the
    // frozen table has never seen (rarest-by-rule, still prefixed)
    val b2 = Seq((10L, "evening report finals"),
      (11L, "quarterly summary sheet"), (12L, "quarterly summary shet"),
      (13L, "zzz qqq jjj xxx")).toDF("doc_id", "title")
    runPipeline(a, rel, steps, b2, incremental = true)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 11L, 13L),
      "10 drops against the settled index; 11 wins its pure-new pair")
    assert(a.read(strsRel).count() == 7, "batch strings appended")
    assert(a.read(freqRel).count() == frozenCount,
      "the frozen frequency table is NEVER updated")
    // changed max_dist is a state-format change (prefix size): loud
    val e = intercept[IllegalStateException](
      runPipeline(a, rel,
        Seq(Map[String, Any]("op" -> "fuzzy_dedup", "id_col" -> "doc_id",
          "str_col" -> "title", "max_dist" -> 3)),
        Seq((20L, "whatever title")).toDF("doc_id", "title"),
        incremental = true))
    assert(e.getMessage.contains("--full-refresh"), e.getMessage)
  }

  test("incremental pipelines reject corpus-global steps by name") {
    import spark.implicits._
    val a = freshAdapter("incr_illegal")
    val docs = Seq((1L, "t", "s", 1L)).toDF("doc_id", "text", "source", "n")
    def run(step: Map[String, Any]) =
      runPipeline(a, Relation(a.defaultSchema, "x"), Seq(step), docs,
        incremental = true)
    val e1 = intercept[IllegalArgumentException](run(Map(
      "op" -> "temperature_mix", "id_col" -> "doc_id",
      "group_col" -> "source", "tokens_col" -> "n", "budget" -> 10)))
    assert(e1.getMessage.contains("corpus-global"))
    val e2 = intercept[IllegalArgumentException](run(Map(
      "op" -> "dsir_select", "target_where" -> "1=1", "top_k" -> 3)))
    assert(e2.getMessage.contains("min_logw"))
    val e3 = intercept[IllegalArgumentException](run(Map(
      "op" -> "minhash_dedup", "priority_col" -> "n")))
    assert(e3.getMessage.contains("priority_col"))
    val e4 = intercept[IllegalArgumentException](run(Map(
      "op" -> "quality_classifier_filter", "mode" -> "retrain")))
    assert(e4.getMessage.contains("frozen"))
    // retraining a robust-stats gate per batch is equally illegal —
    // increments would be clipped by batch-dependent quantiles
    val e5 = intercept[IllegalArgumentException](run(Map(
      "op" -> "winsorize", "group_col" -> "source", "value_col" -> "n",
      "mode" -> "retrain")))
    assert(e5.getMessage.contains("frozen"))
    // pack_sequences needs the corpus-global packing order
    val e6 = intercept[IllegalArgumentException](run(Map(
      "op" -> "pack_sequences", "id_col" -> "doc_id", "tokens_col" -> "n",
      "max_tokens" -> 10)))
    assert(e6.getMessage.contains("corpus-global"))
    // k-means semantic dedup needs corpus centroids; only the
    // hyperplane-banded variant is batch-composable
    val e7 = intercept[IllegalArgumentException](run(Map(
      "op" -> "semantic_dedup", "id_col" -> "doc_id", "vec_col" -> "v")))
    assert(e7.getMessage.contains("method: lsh"))
  }

  test("a lost model/state relation fails loudly on a batch run") {
    import spark.implicits._
    val a = freshAdapter("incr_lost")
    val rel = Relation(a.defaultSchema, "kept")
    val docs = Seq((1L, "a b a b"), (2L, "a b a b")).toDF("doc_id", "text")
    val steps = Seq(Map[String, Any]("op" -> "surprise_filter",
      "max_surprise" -> 100.0))
    runPipeline(a, rel, steps, docs, incremental = true)
    a.dropRelation(Relation(a.defaultSchema, "kept__model_surprise_filter"))
    val e = intercept[IllegalStateException](
      runPipeline(a, rel, steps,
        Seq((3L, "a b")).toDF("doc_id", "text"), incremental = true))
    assert(e.getMessage.contains("--full-refresh"))
  }

  test("changed training parameters fail loudly, never score silently") {
    import spark.implicits._
    // minhash: a batch run under different k/perms/bands would band the
    // stored index under the wrong values — garbage candidate pairs
    val a = freshAdapter("incr_params")
    val rel = Relation(a.defaultSchema, "kept")
    val docs = Seq((1L, "a b c d e f g h"), (2L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    runPipeline(a, rel, Seq(Map[String, Any]("op" -> "minhash_dedup")),
      docs, incremental = true)
    val e = intercept[IllegalStateException](runPipeline(a, rel,
      Seq(Map[String, Any]("op" -> "minhash_dedup", "perms" -> 64,
        "bands" -> 16)),
      Seq((3L, "x y z a b c d e")).toDF("doc_id", "text"),
      incremental = true))
    assert(e.getMessage.contains("training parameters") &&
      e.getMessage.contains("--full-refresh"), e.getMessage)

    // frozen classifier: a changed iters/lr config must not silently
    // keep scoring under the old weights
    val a2 = freshAdapter("frozen_params")
    val rel2 = Relation(a2.defaultSchema, "gated")
    val train = Seq(
      (1L, "the a of and to in is table scan row merge fast system"),
      (2L, "tiny words here")).toDF("doc_id", "text")
    runPipeline(a2, rel2, Seq(Map[String, Any](
      "op" -> "quality_classifier_filter", "mode" -> "frozen")), train)
    val e2 = intercept[IllegalStateException](runPipeline(a2, rel2,
      Seq(Map[String, Any]("op" -> "quality_classifier_filter",
        "mode" -> "frozen", "iters" -> 16)), train))
    assert(e2.getMessage.contains("training parameters"), e2.getMessage)
    // unchanged parameters still load fine (the happy path re-checked)
    runPipeline(a2, rel2, Seq(Map[String, Any](
      "op" -> "quality_classifier_filter", "mode" -> "frozen")), train)
  }

  test("--full-refresh renders is_incremental() false (full recovery)") {
    // the prescribed recovery path: a full-refresh run of an existing
    // `incremental: true` pipeline must compile the model SQL with
    // is_incremental() = FALSE, so the rebuilt target holds the FULL
    // corpus — not silently just the current batch's slice (r11 advice:
    // compileSql hardcoded fullRefresh=false)
    val proj = Files.createTempDirectory("graft_fr_pipe")
    def write(rel: String, content: String): Unit = {
      val p = proj.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    write("dbt_project.yml",
      """name: frpipe
        |model-paths: ["models"]
        |""".stripMargin)
    write("models/sources.yml",
      """version: 2
        |sources:
        |  - name: lake
        |    tables:
        |      - name: documents
        |        external:
        |          location: "/root/testdata/sf0.001/documents.parquet"
        |""".stripMargin)
    write("models/curated.sql",
      """select doc_id, source, text from {{ source('lake', 'documents') }}
        |{% if is_incremental() %}
        |  where doc_id >= 250
        |{% endif %}
        |""".stripMargin)
    write("models/schema.yml",
      """version: 2
        |models:
        |  - name: curated
        |    config:
        |      materialized: pipeline
        |      incremental: true
        |      steps:
        |        - op: token_count
        |          text_col: text
        |""".stripMargin)
    val schema = "g_fr_pipe"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val loc = Files.createTempDirectory("graft_fr_pipe_wh").toString
    def runOnce(fullRefresh: Boolean): Unit = {
      val r = new graft.run.Runner(spark,
        graft.project.ProjectLoader.load(proj.toString),
        targetSchema = schema, warehouseLocation = Some(loc))
      val bad = r.run(fullRefresh = fullRefresh).filter(_.status != "success")
      assert(bad.isEmpty, bad.mkString(" | "))
    }
    runOnce(fullRefresh = false) // base: all 500 docs
    assert(spark.table(s"$schema.curated").count() == 500)
    runOnce(fullRefresh = false) // batch: appends the >=250 slice again
    assert(spark.table(s"$schema.curated").count() == 750)
    runOnce(fullRefresh = true)  // recovery: FULL corpus, not the slice
    assert(spark.table(s"$schema.curated").count() == 500,
      "--full-refresh must rebuild from the full-corpus SELECT")
  }

  // --- microbatch × incremental pipeline ---------------------------------

  test("microbatch pipeline: event-time windows run as sequential index " +
      "batches; lookback re-runs are idempotent; late data still lands") {
    import spark.implicits._
    val a = freshAdapter("mb_pipe")
    val rel = Relation(a.defaultSchema, "stream_corpus")
    val sigsRel = Relation(a.defaultSchema,
      "stream_corpus__state_minhash_dedup")
    val bandsRel = Relation(a.defaultSchema,
      "stream_corpus__state_minhash_dedup_bands")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "totally different words entirely here now for testing once"
    val t3 = "completely fresh material nothing shared with previous batches at all"
    val cfg = NodeConfig(materialized = "pipeline",
      uniqueKey = Seq("doc_id"),
      eventTime = Some("ts"), batchSize = Some(BatchSize.Day),
      begin = Some("2025-01-01 00:00:00"),
      extra = Map(
        "steps" -> Vector(Map[String, Any]("op" -> "minhash_dedup")),
        "incremental" -> "true"))
    def runMb(df: DataFrame, now: java.sql.Timestamp,
        fullRefresh: Boolean = false) =
      PipelineMat.run(MatContext(a, node(rel.identifier, cfg), rel,
        () => df, fullRefresh, now = now))
    def ids() = a.read(rel).collect().map(_.getLong(0)).toSet

    // run 1 (target absent): one FULL build over the whole input —
    // trainers/indexes lay out over the complete history in one pass
    val day1 = Seq(
      (1L, t1, ts("2025-01-01 03:00:00")),
      (2L, t1, ts("2025-01-01 04:00:00")),
      (3L, t2, ts("2025-01-01 05:00:00"))).toDF("doc_id", "text", "ts")
    val r1 = runMb(day1, ts("2025-01-02 00:00:00"))
    assert(r1.message.startsWith("pipeline:"), r1.message)
    assert(ids() == Set(1L, 3L))
    assert(a.read(sigsRel).count() == 3)

    // run 2: the source now holds day 1 + day 2. lookback=1 reopens
    // [day1, day2): its rows are ALL settled — nothing may duplicate
    // in the target or the index. [day2, day3): 10 dups settled 1,
    // 11≈12 new-new cluster (11 kept), 13 unique.
    val day2 = Seq(
      (10L, t1, ts("2025-01-02 01:00:00")),
      (11L, t3, ts("2025-01-02 02:00:00")),
      (12L, t3, ts("2025-01-02 03:00:00")),
      (13L, "unique new content appearing only in the second batch run",
        ts("2025-01-02 04:00:00"))).toDF("doc_id", "text", "ts")
    val all2 = day1.unionByName(day2)
    val r2 = runMb(all2, ts("2025-01-03 00:00:00"))
    assert(r2.message.startsWith("pipeline microbatch: 2 windows of day"),
      r2.message)
    assert(ids() == Set(1L, 3L, 11L, 13L),
      "settled rows stay; 10 drops against the index; 11 wins its cluster")
    assert(a.read(sigsRel).count() == 7,
      "re-run window re-settles nothing; day-2 sigs appended once")
    assert(a.read(bandsRel).count() == 7 * 21,
      "banded twin appended in lockstep, no duplicates")

    // run 3: SAME inputs, same clock — the pure re-run. Both windows
    // reopen (resume = lookback before max event_time) and everything
    // is settled: target and index must be byte-for-byte stable.
    runMb(all2, ts("2025-01-03 00:00:00"))
    assert(ids() == Set(1L, 3L, 11L, 13L), "pure re-run appends no rows")
    assert(a.read(sigsRel).count() == 7, "pure re-run re-settles nothing")
    assert(a.read(bandsRel).count() == 7 * 21)

    // run 4: LATE data arrives inside the already-written day-2 window
    // (reopened by lookback): 14 dups settled 11 → drops against the
    // index; 15 is genuinely novel → lands, despite the window having
    // been processed twice already.
    val lateDay2 = Seq(
      (14L, t3, ts("2025-01-02 23:00:00")), // dups settled 11 → drops
      (15L, "late but genuinely novel text that belongs to day two window",
        ts("2025-01-02 22:00:00"))).toDF("doc_id", "text", "ts")
    val all3 = all2.unionByName(lateDay2)
    runMb(all3, ts("2025-01-03 00:00:00"))
    assert(ids() == Set(1L, 3L, 11L, 13L, 15L),
      "late dup drops against the settled index; late novel row lands")
    assert(a.read(sigsRel).count() == 9,
      "only the two late docs settle (14 and 15)")

    // run 5: an explicit backfill window reprocesses EXACTLY day 1
    // (resume suppressed) — still idempotent against settled state
    val lateDay1 = Seq(
      (4L, t2, ts("2025-01-01 23:00:00"))) // dups settled 3 → drops
      .toDF("doc_id", "text", "ts")
    PipelineMat.run(MatContext(a, node(rel.identifier, cfg.copy(
        begin = Some("2025-01-01 00:00:00"))), rel,
      () => all3.unionByName(lateDay1), fullRefresh = false,
      now = ts("2025-01-02 00:00:00"), explicitBackfill = true))
    assert(ids() == Set(1L, 3L, 11L, 13L, 15L),
      "backfilled late dup drops; nothing else changes")
    assert(a.read(sigsRel).count() == 10, "the late dup settles (4)")

    // contract errors are named: unique_key required, concurrent
    // batches rejected
    val e1 = intercept[IllegalArgumentException](
      PipelineMat.run(MatContext(a, node(rel.identifier,
        cfg.copy(uniqueKey = Nil)), rel, () => all3,
        now = ts("2025-01-03 00:00:00"))))
    assert(e1.getMessage.contains("unique_key"))
    val e2 = intercept[IllegalArgumentException](
      PipelineMat.run(MatContext(a, node(rel.identifier,
        cfg.copy(concurrentBatches = true)), rel, () => all3,
        now = ts("2025-01-03 00:00:00"))))
    assert(e2.getMessage.contains("sequential"))

    // an EXISTING target with zero event-time rows has no resume point:
    // without `begin:` the loop would emit one window per period since
    // epoch — the error names the recovery instead
    val aE = freshAdapter("mb_empty_resume")
    val relE = Relation(aE.defaultSchema, "stream_corpus")
    aE.writeTableAtomic(day1.limit(0), relE)
    val e3 = intercept[IllegalStateException](
      PipelineMat.run(MatContext(aE, node(relE.identifier,
        cfg.copy(begin = None)), relE, () => all3,
        now = ts("2025-01-03 00:00:00"))))
    assert(e3.getMessage.contains("begin") &&
      e3.getMessage.contains("--full-refresh"), e3.getMessage)
  }

  test("explicit backfill is append-only: a gate-only windowed pipeline " +
      "skips existing keys with changed values and NAMES the skip") {
    import spark.implicits._
    val a = freshAdapter("mb_backfill_warn")
    val rel = Relation(a.defaultSchema, "gated")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // a pure gate chain: the window guard's unique_key anti-join is the
    // ONLY idempotence mechanism — exactly where a silent skip would
    // masquerade as a successful rewrite
    val cfg = NodeConfig(materialized = "pipeline",
      uniqueKey = Seq("doc_id"),
      eventTime = Some("ts"), batchSize = Some(BatchSize.Day),
      begin = Some("2025-01-01 00:00:00"),
      extra = Map(
        "steps" -> Vector(Map[String, Any]("op" -> "token_count",
          "text_col" -> "text")),
        "incremental" -> "true"))
    val day1 = Seq(
      (1L, "alpha beta gamma", ts("2025-01-01 03:00:00")),
      (2L, "delta epsilon", ts("2025-01-01 05:00:00")))
      .toDF("doc_id", "text", "ts")
    PipelineMat.run(MatContext(a, node(rel.identifier, cfg), rel,
      () => day1, now = ts("2025-01-02 00:00:00")))
    assert(a.read(rel).count() == 2)
    // the source rewrote doc 1's text AND a novel key 9 arrived; an
    // explicit backfill of day 1 admits ONLY key 9 — and says so
    val rewritten = Seq(
      (1L, "rewritten body for doc one", ts("2025-01-01 03:00:00")),
      (2L, "delta epsilon", ts("2025-01-01 05:00:00")),
      (9L, "late novel", ts("2025-01-01 07:00:00")))
      .toDF("doc_id", "text", "ts")
    val errBuf = new java.io.ByteArrayOutputStream()
    val oldErr = System.err
    System.setErr(new java.io.PrintStream(errBuf, true))
    try PipelineMat.run(MatContext(a, node(rel.identifier, cfg), rel,
      () => rewritten, fullRefresh = false,
      now = ts("2025-01-02 00:00:00"), explicitBackfill = true))
    finally System.setErr(oldErr)
    assert(a.read(rel).count() == 3, "only the novel key lands")
    val text1 = a.read(rel).filter(col("doc_id") === 1L)
      .select("text").collect().map(_.getString(0)).toSeq
    assert(text1 == Seq("alpha beta gamma"),
      "append-only backfill must keep the settled row's text")
    assert(errBuf.toString.contains("admits only genuinely new keys") &&
      errBuf.toString.contains("2 surviving row"),
      s"the skipped rewrite must be named: <${errBuf.toString.take(300)}>")
  }

  test("--empty-trained fuzzy gram-frequency order fails a REAL run " +
      "loudly (the frozen order is a trained artifact)") {
    import spark.implicits._
    val a = freshAdapter("empty_fuzzy")
    val rel = Relation(a.defaultSchema, "titles")
    val steps = Seq(Map[String, Any]("op" -> "fuzzy_dedup",
      "id_col" -> "doc_id", "str_col" -> "title"))
    val docs = Seq((1L, "evening report final"), (2L, "evening report finale"))
      .toDF("doc_id", "title")
    // --empty full build: empty strings index + EMPTY frequency order
    PipelineMat.run(MatContext(a, node(rel.identifier,
      NodeConfig(materialized = "pipeline", extra = Map(
        "steps" -> steps.toVector, "incremental" -> "true"))),
      rel, () => docs.limit(0), emptyMode = true))
    assert(a.read(rel).count() == 0)
    // a real batch must NOT silently prefix under the degenerate order
    val e = intercept[IllegalStateException](
      PipelineMat.run(MatContext(a, node(rel.identifier,
        NodeConfig(materialized = "pipeline", extra = Map(
          "steps" -> steps.toVector, "incremental" -> "true"))),
        rel, () => docs)))
    assert(e.getMessage.contains("--empty") &&
      e.getMessage.contains("--full-refresh"), e.getMessage)
    // --full-refresh retrains on real data and recovers
    PipelineMat.run(MatContext(a, node(rel.identifier,
      NodeConfig(materialized = "pipeline", extra = Map(
        "steps" -> steps.toVector, "incremental" -> "true"))),
      rel, () => docs, fullRefresh = true))
    assert(a.read(rel).collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("microbatch pipeline: a run that DIES mid-window resumes to the " +
      "same state a never-failed run reaches (crash recovery)") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val texts = (0 until 5).map(g =>
      s"recovery group $g shares one long duplicated sentence body $g " +
        "for the minhash banding to catch")
    // days 1-3, 8 docs each; within-day dup pairs and cross-day repeats
    def allDocs = (0L until 24L).map { i =>
      val day = (i / 8 + 1).toInt
      (i, texts((i % 5).toInt), ts(s"2025-01-0$day 0${i % 8}:00:00"))
    }.toDF("doc_id", "text", "ts")
    val cfg = NodeConfig(materialized = "pipeline",
      uniqueKey = Seq("doc_id"), eventTime = Some("ts"),
      batchSize = Some(BatchSize.Day), begin = Some("2025-01-01 00:00:00"),
      extra = Map("incremental" -> "true",
        "steps" -> Vector(Map[String, Any]("op" -> "minhash_dedup"))))
    def runMb(a: SparkAdapter, rel: Relation, now: java.sql.Timestamp,
        failOn: Option[java.sql.Timestamp]): Unit =
      PipelineMat.run(MatContext(a, node(rel.identifier, cfg), rel,
        () => allDocs, now = now,
        compiledBatch = Some((ws, _) => {
          if (failOn.contains(ws)) throw new RuntimeException(
            s"injected executor loss in window $ws")
          allDocs
        })))
    def state(a: SparkAdapter, rel: Relation) = (
      a.read(rel).collect().map(_.getLong(0)).toSet,
      a.read(Relation(a.defaultSchema,
        s"${rel.identifier}__state_minhash_dedup")).count())

    // control: the never-failed run
    val aOk = freshAdapter("mb_recover_ok")
    val relOk = Relation(aOk.defaultSchema, "cur")
    runMb(aOk, relOk, ts("2025-01-02 00:00:00"), None) // full build day 1
    runMb(aOk, relOk, ts("2025-01-04 00:00:00"), None) // days 2-3
    val expected = state(aOk, relOk)

    // crash: day 3's window throws AFTER day 2 fully landed
    val aCr = freshAdapter("mb_recover_crash")
    val relCr = Relation(aCr.defaultSchema, "cur")
    runMb(aCr, relCr, ts("2025-01-02 00:00:00"), None)
    val boom = intercept[RuntimeException](
      runMb(aCr, relCr, ts("2025-01-04 00:00:00"),
        failOn = Some(ts("2025-01-03 00:00:00"))))
    assert(boom.getMessage.contains("injected"))
    // day 2 landed, day 3 did not — and the day-2 index appends were
    // flushed BEFORE the crash (windows are sequential index batches)
    val (midIds, _) = state(aCr, relCr)
    assert(midIds.forall(_ < 16L), "no day-3 row may have landed")

    // plain re-run: resume reopens from the target's max event_time,
    // re-sees day 2 (idempotent — nothing re-settles), lands day 3
    runMb(aCr, relCr, ts("2025-01-04 00:00:00"), None)
    assert(state(aCr, relCr) == expected,
      s"recovered state ${state(aCr, relCr)} != never-failed $expected")
  }
}
