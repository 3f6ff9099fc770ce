package graft

import graft.adapter.SparkAdapter
import graft.core._
import graft.mat.{MatContext, PipelineMat}
import graft.ops.{Dedup, FuzzyJoin, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Seeded randomized differential parity for ALL SEVEN incremental index
  * families (exact / minhash / simhash / embedding-LSH / ngram / fuzzy /
  * media): a random corpus under randomized parameters, split into an
  * old slice and a new batch, must satisfy
  *
  *   target(full build on OLD, then one incremental batch on NEW)
  *     ≡ the composed settled-keep contract evaluated in plain Scala
  *       from the FULL-corpus pair set over the union
  *
  * where the full-corpus pair set comes from the from-sigs/from-sets
  * operator functions — a code path INDEPENDENT of the incremental
  * *Incremental* variants and of the pipeline's state plumbing under
  * test. The reference model:
  *   - old docs: min-id keep per old-only component (what run 1 built);
  *   - new docs: components over pairs touching ≥1 new id (the exact
  *     pair set the incremental path must detect — "full minus
  *     old×old"); a component touching ANY old id drops every new
  *     member (settled-keep, settled rows never retracted), a pure-new
  *     component keeps its min id.
  *
  * Each family then RE-RUNS the same batch: the target must not change
  * and no index relation may grow — the idempotence discipline fixed
  * oracles cannot regress-test (re-seen ids must neither re-settle as
  * duplicate index rows nor re-append to the target). */
class RandomizedParitySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  // ---- reference model ---------------------------------------------------

  /** Connected components by union-find; returns node → root. */
  private def components(nodes: Set[Long],
      edges: Iterable[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    nodes.foreach(n => parent(n) = n)
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  /** The composed incremental contract from the union's full pair set. */
  private def expectedTarget(oldIds: Set[Long], newIds: Set[Long],
      unionPairs: Set[(Long, Long)]): Set[Long] = {
    val oldEdges = unionPairs.filter(p => oldIds(p._1) && oldIds(p._2))
    val oldComp = components(oldIds, oldEdges)
    val oldKept = oldIds.groupBy(oldComp).values.map(_.min).toSet
    val incEdges = unionPairs.filter(p => newIds(p._1) || newIds(p._2))
    val nodes = newIds ++ incEdges.flatMap(e => Seq(e._1, e._2))
    val comp = components(nodes, incEdges)
    val newKept = nodes.groupBy(comp).values.collect {
      case members if !members.exists(oldIds) => members.min
    }.toSet
    oldKept ++ (newKept intersect newIds)
  }

  private def pairSet(pairs: DataFrame): Set[(Long, Long)] =
    pairs.collect().map { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      (math.min(a, b), math.max(a, b))
    }.toSet

  /** Same-key cliques as a pair set (exact text / media body dedup). */
  private def cliquePairs(idsByKey: Iterable[Seq[Long]]): Set[(Long, Long)] =
    idsByKey.flatMap { ids =>
      val s = ids.sorted
      for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
    }.toSet

  // ---- harness -------------------------------------------------------------

  private def freshAdapter(name: String): SparkAdapter = {
    val loc = Files.createTempDirectory(s"graft_$name").toString
    val schema = s"g_$name"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    new SparkAdapter(spark, schema, Some(loc))
  }

  private def runPipeline(a: SparkAdapter, rel: Relation,
      steps: Seq[Map[String, Any]], df: DataFrame): Unit =
    PipelineMat.run(MatContext(a,
      Node(uniqueId = s"model.spec.${rel.identifier}", name = rel.identifier,
        packageName = "spec", kind = NodeKind.Model,
        config = NodeConfig(materialized = "pipeline", extra = Map(
          "steps" -> steps.toVector, "incremental" -> "true"))),
      rel, () => df))

  /** One family case: old full build + new batch ≡ reference model;
    * then the batch re-run changes nothing and grows no state. */
  private def parityCase(name: String, steps: Seq[Map[String, Any]],
      idCol: String, oldDf: DataFrame, newDf: DataFrame,
      unionPairs: Set[(Long, Long)]): Unit = {
    def ids(df: DataFrame): Set[Long] =
      df.select(col(idCol)).collect().map(_.getLong(0)).toSet
    val (oldIds, newIds) = (ids(oldDf), ids(newDf))
    assert((oldIds intersect newIds).isEmpty, s"$name: split must be disjoint")
    val expected = expectedTarget(oldIds, newIds, unionPairs)
    // the case must actually exercise the machinery: some pair crosses
    // the split, and not everything survives
    assert(unionPairs.exists(p => newIds(p._1) || newIds(p._2)),
      s"$name: seeded corpus produced no batch-side pairs — re-seed")
    assert(expected.size < (oldIds.size + newIds.size),
      s"$name: nothing deduped — re-seed")

    val a = freshAdapter(name)
    val rel = Relation(a.defaultSchema, "corpus")
    runPipeline(a, rel, steps, oldDf)
    runPipeline(a, rel, steps, newDf)
    val got = ids(a.read(rel))
    assert(got == expected,
      s"$name parity: extra=${(got diff expected).toSeq.sorted} " +
        s"missing=${(expected diff got).toSeq.sorted}")

    // idempotent batch re-run: target stable, no state relation grows
    val stateRels = a.listRelationsWithoutCaching(a.defaultSchema)
      .filter(_.identifier.contains("__state"))
    val before = stateRels.map(r => r.identifier -> a.read(r).count()).toMap
    runPipeline(a, rel, steps, newDf)
    assert(ids(a.read(rel)) == expected, s"$name: batch re-run changed the target")
    stateRels.foreach { r =>
      assert(a.read(r).count() == before(r.identifier),
        s"$name: ${r.identifier} grew on a re-run (re-settled rows)")
    }
  }

  // ---- seeded generators ---------------------------------------------------

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi")

  /** Adversarial text corpus: exact dups, one-token perturbations,
    * shorties, fresh docs — randomly split old/new. */
  private def textCorpus(seed: Int, n: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    def sentence(len: Int) =
      Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val bases = Vector.fill(10)(sentence(8 + rnd.nextInt(6)))
    val docs = (0L until n.toLong).map { i =>
      val b = bases(rnd.nextInt(bases.length))
      val t = rnd.nextInt(4) match {
        case 0 => b
        case 1 => b + " " + vocab(rnd.nextInt(vocab.length))
        case 2 => sentence(1 + rnd.nextInt(2))
        case _ => sentence(9 + rnd.nextInt(5))
      }
      (i, t)
    }
    val split = docs.map { case (i, t) => (i, t, rnd.nextBoolean()) }
    val all = docs.toDF("doc_id", "text")
    val oldDf = split.filter(!_._3).map(d => (d._1, d._2)).toDF("doc_id", "text")
    val newDf = split.filter(_._3).map(d => (d._1, d._2)).toDF("doc_id", "text")
    (all, oldDf, newDf)
  }

  // ---- the seven families --------------------------------------------------

  test("exact_dedup: randomized parity + idempotent re-run") {
    val (all, oldDf, newDf) = textCorpus(seed = 41001, n = 60)
    val groups = all.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).values.map(_.map(_._1).toSeq)
    parityCase("rp_exact",
      Seq(Map[String, Any]("op" -> "exact_dedup", "id_col" -> "doc_id")),
      "doc_id", oldDf, newDf, cliquePairs(groups))
  }

  test("minhash_dedup: randomized parity + idempotent re-run") {
    val rnd = new scala.util.Random(41002)
    val (k, perms, bands, thr) =
      (2 + rnd.nextInt(2), Seq(64, 128)(rnd.nextInt(2)),
        Seq(16, 32)(rnd.nextInt(2)), Seq(0.7, 0.8)(rnd.nextInt(2)))
    val (all, oldDf, newDf) = textCorpus(seed = 41002, n = 60)
    val pairs = pairSet(Dedup.minhashNearDupsFromSigs(
      Dedup.minhashSignatures(all, "doc_id", "text", k, perms),
      perms, bands, thr, 1000))
    parityCase("rp_minhash",
      Seq(Map[String, Any]("op" -> "minhash_dedup", "id_col" -> "doc_id",
        "k" -> k, "perms" -> perms, "bands" -> bands, "threshold" -> thr)),
      "doc_id", oldDf, newDf, pairs)
  }

  test("simhash_dedup: randomized parity + idempotent re-run") {
    val rnd = new scala.util.Random(41003)
    val maxHamming = 1 + rnd.nextInt(3)
    val (all, oldDf, newDf) = textCorpus(seed = 41003, n = 60)
    val pairs = pairSet(Dedup.simhashNearDupsFromSigs(
      Dedup.simhashSignatures(all, "doc_id", "text"), maxHamming, 1000))
    parityCase("rp_simhash",
      Seq(Map[String, Any]("op" -> "simhash_dedup", "id_col" -> "doc_id",
        "max_hamming" -> maxHamming)),
      "doc_id", oldDf, newDf, pairs)
  }

  test("semantic_dedup (embedding LSH): randomized parity + idempotent re-run") {
    import spark.implicits._
    val rnd = new scala.util.Random(41004)
    val (bands, rpb, thr) =
      (Seq(8, 16)(rnd.nextInt(2)), Seq(4, 8)(rnd.nextInt(2)),
        Seq(0.8, 0.9)(rnd.nextInt(2)))
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(32)((r.nextDouble() - 0.5).toFloat)
    }
    val bases = Vector.fill(8)(vec(rnd.nextInt(1 << 20)))
    val docs = (0L until 48L).map { i =>
      val v =
        if (rnd.nextBoolean()) bases(rnd.nextInt(bases.length))
          .map(x => x + (rnd.nextDouble() - 0.5).toFloat * 0.01f)
        else vec(rnd.nextInt(1 << 20))
      (i, v, rnd.nextBoolean())
    }
    val all = docs.map(d => (d._1, d._2)).toDF("vec_id", "embedding")
    val oldDf = docs.filter(!_._3).map(d => (d._1, d._2))
      .toDF("vec_id", "embedding")
    val newDf = docs.filter(_._3).map(d => (d._1, d._2))
      .toDF("vec_id", "embedding")
    val pairs = pairSet(Dedup.embeddingNearDupsLshFromVecs(
      Dedup.embeddingVectors(all, "vec_id", "embedding"),
      thr, bands, rpb, 1000))
    parityCase("rp_semantic",
      Seq(Map[String, Any]("op" -> "semantic_dedup", "method" -> "lsh",
        "id_col" -> "vec_id", "vec_col" -> "embedding", "bands" -> bands,
        "rows_per_band" -> rpb, "threshold" -> thr)),
      "vec_id", oldDf, newDf, pairs)
  }

  test("ngram_dedup: randomized parity + idempotent re-run") {
    val rnd = new scala.util.Random(41005)
    val (k, measure, thr) =
      (2 + rnd.nextInt(2), Seq("jaccard", "containment")(rnd.nextInt(2)),
        Seq(0.6, 0.7)(rnd.nextInt(2)))
    val (all, oldDf, newDf) = textCorpus(seed = 41005, n = 60)
    val pairs = pairSet(Dedup.ngramNearDupsFromSets(
      Dedup.shingleSets(all, "doc_id", "text", k), thr, measure, 1000))
    parityCase("rp_ngram",
      Seq(Map[String, Any]("op" -> "ngram_dedup", "id_col" -> "doc_id",
        "k" -> k, "measure" -> measure, "threshold" -> thr)),
      "doc_id", oldDf, newDf, pairs)
  }

  test("fuzzy_dedup: randomized parity + idempotent re-run (frozen order " +
      "vs union-trained order — exact verify makes the pair sets equal)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41006)
    val maxDist = 1 + rnd.nextInt(2)
    val bases = Vector.fill(8)(
      Seq.fill(3)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    def typo(s: String): String = {
      val i = rnd.nextInt(s.length)
      rnd.nextInt(3) match {
        case 0 => s.updated(i, ('a' + rnd.nextInt(26)).toChar) // substitute
        case 1 => s.take(i) + s.drop(i + 1)                    // delete
        case _ => s.take(i) + ('a' + rnd.nextInt(26)).toChar + s.drop(i)
      }
    }
    val docs = (0L until 50L).map { i =>
      val t = rnd.nextInt(3) match {
        case 0 => bases(rnd.nextInt(bases.length))
        case 1 => typo(bases(rnd.nextInt(bases.length)))
        case _ => Seq.fill(4)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      (i, t, rnd.nextBoolean())
    }
    val all = docs.map(d => (d._1, d._2)).toDF("doc_id", "title")
    val oldDf = docs.filter(!_._3).map(d => (d._1, d._2)).toDF("doc_id", "title")
    val newDf = docs.filter(_._3).map(d => (d._1, d._2)).toDF("doc_id", "title")
    val pairs = pairSet(FuzzyJoin.editDistanceSelfJoin(
      all, "doc_id", "title", maxDist, 2))
    parityCase("rp_fuzzy",
      Seq(Map[String, Any]("op" -> "fuzzy_dedup", "id_col" -> "doc_id",
        "str_col" -> "title", "max_dist" -> maxDist)),
      "doc_id", oldDf, newDf, pairs)
  }

  test("media_dedup: randomized parity + idempotent re-run, both methods") {
    import spark.implicits._
    // exact: body cliques (headers differ per id; the key is the body)
    val (all, oldDf, newDf) = textCorpus(seed = 41007, n = 50)
    val groups = all.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).values.map(_.map(_._1).toSeq)
    parityCase("rp_media_exact",
      Seq(Map[String, Any]("op" -> "media_dedup", "method" -> "exact",
        "id_col" -> "doc_id")),
      "doc_id", Multimodal.syntheticMedia(oldDf),
      Multimodal.syntheticMedia(newDf), cliquePairs(groups))

    // simhash: pairs from the body bit-signature through the SAME
    // 4-chunk pigeonhole core as text
    val rnd = new scala.util.Random(41008)
    val maxHamming = 1 + rnd.nextInt(3)
    val (all2, oldDf2, newDf2) = textCorpus(seed = 41008, n = 50)
    def bodySigs(docs: DataFrame): DataFrame =
      Dedup.simhashSignatures(
        Multimodal.syntheticMedia(docs)
          .filter(Multimodal.isGrft("payload"))
          .withColumn("__body", Multimodal.bodyText("payload")),
        "doc_id", "__body")
    val pairs = pairSet(
      Dedup.simhashNearDupsFromSigs(bodySigs(all2), maxHamming, 1000))
    parityCase("rp_media_near",
      Seq(Map[String, Any]("op" -> "media_dedup", "method" -> "simhash",
        "id_col" -> "doc_id", "max_hamming" -> maxHamming)),
      "doc_id", Multimodal.syntheticMedia(oldDf2),
      Multimodal.syntheticMedia(newDf2), pairs)

    // phash: the REAL DCT perceptual hash through the same incremental
    // core — re-encoded variants (2× pixel-replication upscale + a
    // brightness shift, hamming 0 from their originals) randomly split
    // from their originals are the guaranteed cross-split pairs; the
    // reference pair set is MEASURED by the full-corpus operator, so
    // whatever the mosaic corpus additionally merges (exact-dup texts
    // render identical images) flows into the same contract
    val rnd3 = new scala.util.Random(41009)
    val (all3, _, _) = textCorpus(seed = 41009, n = 30)
    val based = all3.withColumn("doc_id", col("doc_id") + 100L)
    val baseMedia = Multimodal.syntheticMedia2D(based)
    val reUdf = udf((p: Array[Byte], sc: Int, b: Int) =>
      graft.ops.Phash.reencodeGray(p, sc, b))
    val variants = baseMedia.filter(col("doc_id") % 2 === 0)
      .withColumn("doc_id", col("doc_id") + 1000L)
      .withColumn("payload", reUdf(col("payload"), lit(2), lit(7)))
    val corpus = baseMedia.unionByName(variants)
    val allIds = corpus.select("doc_id").collect().map(_.getLong(0))
    val newIds3 = allIds.filter(_ => rnd3.nextBoolean()).toSet
    val phashPairs = pairSet(
      Multimodal.mediaNearDupsPhash(corpus, "doc_id", "payload"))
    parityCase("rp_media_phash",
      Seq(Map[String, Any]("op" -> "media_dedup", "method" -> "phash",
        "id_col" -> "doc_id", "max_hamming" -> 3)),
      "doc_id", corpus.filter(!col("doc_id").isin(newIds3.toSeq: _*)),
      corpus.filter(col("doc_id").isin(newIds3.toSeq: _*)), phashPairs)

    // frames: clip/re-mux detection through the sets-postings
    // incremental core — exact-dup bodies (containment 1) and
    // 64-byte-aligned text clips (every clip frame is a source frame)
    // are the pair sources; the reference pair set is MEASURED by the
    // full-corpus operator over the same frame sets
    val rnd5 = new scala.util.Random(41013)
    def sent5(len: Int) =
      Seq.fill(len)(vocab(rnd5.nextInt(vocab.length))).mkString(" ")
    val bases5 = Vector.fill(8)(sent5(30 + rnd5.nextInt(10)))
    val docs5 = (0L until 30L).map { i =>
      val t = rnd5.nextInt(3) match {
        case 0 => bases5(rnd5.nextInt(bases5.length))
        case 1 => bases5(rnd5.nextInt(bases5.length)).drop(64)
        case _ => sent5(25 + rnd5.nextInt(10))
      }
      (i + 200L, t, rnd5.nextBoolean())
    }
    val mediaOf: Seq[(Long, String)] => DataFrame =
      ds => Multimodal.syntheticMedia(ds.toDF("doc_id", "text"))
    val framePairs = pairSet(Dedup.ngramNearDupsFromSets(
      Multimodal.frameSets(mediaOf(docs5.map(d => (d._1, d._2)))),
      0.5, "containment", 1000))
    parityCase("rp_media_frames",
      Seq(Map[String, Any]("op" -> "media_dedup", "method" -> "frames",
        "id_col" -> "doc_id")),
      "doc_id", mediaOf(docs5.filter(!_._3).map(d => (d._1, d._2))),
      mediaOf(docs5.filter(_._3).map(d => (d._1, d._2))), framePairs)

    // audio: the envelope-spectrum fingerprint through the same
    // incremental core — gain-scaled re-encodes (an EXACT invariance,
    // hamming 0 from their originals) randomly split from their
    // originals are the guaranteed cross-split pairs; the reference
    // pair set is MEASURED by the full-corpus operator, so whatever the
    // staircase corpus additionally merges (exact-dup texts render
    // identical audio) flows into the same contract
    val rnd6 = new scala.util.Random(41017)
    val (all6, _, _) = textCorpus(seed = 41017, n = 30)
    val audioBase = Multimodal.syntheticAudioWav(
      all6.withColumn("doc_id", col("doc_id") + 300L))
    val reA = udf((p: Array[Byte]) => graft.ops.AudioHash.reencode(p, 0.7))
    val audioVar = audioBase.filter(col("doc_id") % 2 === 0)
      .withColumn("doc_id", col("doc_id") + 1000L)
      .withColumn("payload", reA(col("payload")))
    val audioCorpus = audioBase.unionByName(audioVar)
    val audioIds = audioCorpus.select("doc_id").collect().map(_.getLong(0))
    val newIds6 = audioIds.filter(_ => rnd6.nextBoolean()).toSet
    val audioPairs = pairSet(
      Multimodal.mediaNearDupsAudio(audioCorpus, "doc_id", "payload"))
    parityCase("rp_media_audio",
      Seq(Map[String, Any]("op" -> "media_dedup", "method" -> "audio",
        "id_col" -> "doc_id", "max_hamming" -> 3)),
      "doc_id", audioCorpus.filter(!col("doc_id").isin(newIds6.toSeq: _*)),
      audioCorpus.filter(col("doc_id").isin(newIds6.toSeq: _*)), audioPairs)
  }

  // ---- windowed (microbatch × incremental pipeline) parity ---------------

  /** The WINDOWED composition under a random corpus: run 1 full-builds
    * over the early slice; run 2 sees the whole input (late rows
    * included) and windows it by event time — each window is one
    * sequential index batch. The reference model FOLDS the same
    * settled-keep contract chronologically: window N's unseen ids form
    * the batch, a component touching any already-seen id drops its new
    * members, a pure-new component keeps its min id, and the batch then
    * joins `seen`. The fold — not a flat two-slice split — is the
    * point: settled-keep is ORDER-dependent (a day-4 doc drops against
    * a settled day-3 doc even when the day-4 id is smaller, where a
    * single-batch model would keep the min id), and only the window
    * loop exercises that. Then the SAME windowed run repeats and
    * neither the target nor any state relation may change. */
  private def windowedParityCase(name: String,
      steps: Seq[Map[String, Any]], seed: Int,
      pairsOf: DataFrame => Set[(Long, Long)]): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val lookback = 1 + rnd.nextInt(2)
    val (all, _, _) = textCorpus(seed, n = 60)
    val texts = all.collect().map(r => (r.getLong(0), r.getString(1)))
    // early docs land on days 1-2 (one pinned to day 2 so the resume
    // point reopens day 2 for any lookback >= 1); late docs land on
    // days 2-4 — day-2 lates are the "late re-delivery into an
    // already-written window" case, days 3-4 are genuinely new windows
    val docs = texts.map { case (id, t) =>
      val early = id == 0L || rnd.nextInt(5) < 3
      val day = if (id == 0L) 2 else if (early) 1 + rnd.nextInt(2)
        else 2 + rnd.nextInt(3)
      (id, t, ts(f"2025-01-0$day%d 0${1 + rnd.nextInt(8)}%d:00:00"), early)
    }
    val allDf = docs.toSeq.map(d => (d._1, d._2, d._3))
      .toDF("doc_id", "text", "ts")
    val earlyDf = docs.toSeq.filter(_._4).map(d => (d._1, d._2, d._3))
      .toDF("doc_id", "text", "ts")
    val pairs = pairsOf(allDf)

    // reference fold
    val dayOf: ((Long, String, java.sql.Timestamp, Boolean)) => Int =
      d => d._3.toLocalDateTime.getDayOfMonth
    val earlyIds = docs.filter(_._4).map(_._1).toSet
    val earlyEdges = pairs.filter(p => earlyIds(p._1) && earlyIds(p._2))
    var kept = earlyIds.groupBy(components(earlyIds, earlyEdges))
      .values.map(_.min).toSet
    val seen = scala.collection.mutable.Set.empty[Long] ++ earlyIds
    var lateLanded = 0
    var lateDropped = 0
    for (day <- 1 to 4) {
      val batch = docs.filter(d => dayOf(d) == day && !seen(d._1))
        .map(_._1).toSet
      if (batch.nonEmpty) {
        val edges = pairs.filter(p =>
          (seen(p._1) || batch(p._1)) && (seen(p._2) || batch(p._2)) &&
            (batch(p._1) || batch(p._2)))
        val nodes = batch ++ edges.flatMap(e => Seq(e._1, e._2))
        val comp = components(nodes, edges)
        val keptHere = nodes.groupBy(comp).values.collect {
          case m if !m.exists(seen) => m.min
        }.toSet intersect batch
        kept ++= keptHere
        lateLanded += keptHere.size
        lateDropped += batch.size - (batch intersect keptHere).size
        seen ++= batch
      }
    }
    assert(lateLanded > 0 && lateDropped > 0,
      s"$name: degenerate seed (landed=$lateLanded dropped=$lateDropped) — re-seed")

    val a = freshAdapter(name)
    val rel = Relation(a.defaultSchema, "corpus")
    val cfg = NodeConfig(materialized = "pipeline",
      uniqueKey = Seq("doc_id"), eventTime = Some("ts"),
      batchSize = Some(BatchSize.Day), begin = Some("2025-01-01 00:00:00"),
      lookback = lookback,
      extra = Map("steps" -> steps.toVector, "incremental" -> "true"))
    def run(df: DataFrame, now: java.sql.Timestamp): Unit =
      PipelineMat.run(MatContext(a,
        Node(uniqueId = s"model.spec.${rel.identifier}",
          name = rel.identifier, packageName = "spec",
          kind = NodeKind.Model, config = cfg),
        rel, () => df, now = now))
    def ids(): Set[Long] =
      a.read(rel).select("doc_id").collect().map(_.getLong(0)).toSet

    run(earlyDf, ts("2025-01-03 00:00:00")) // full build (target absent)
    run(allDf, ts("2025-01-05 00:00:00"))   // windowed: reopen + days 3-4
    val got = ids()
    assert(got == kept,
      s"$name windowed parity: extra=${(got diff kept).toSeq.sorted} " +
        s"missing=${(kept diff got).toSeq.sorted}")

    // the same windowed run again: nothing may change or grow
    val stateRels = a.listRelationsWithoutCaching(a.defaultSchema)
      .filter(_.identifier.contains("__state"))
    val before = stateRels.map(r => r.identifier -> a.read(r).count()).toMap
    run(allDf, ts("2025-01-05 00:00:00"))
    assert(ids() == kept, s"$name: windowed re-run changed the target")
    stateRels.foreach { r =>
      assert(a.read(r).count() == before(r.identifier),
        s"$name: ${r.identifier} grew on a windowed re-run")
    }
  }

  test("windowed microbatch parity: exact_dedup under random event " +
      "times, lookback, and late rows") {
    windowedParityCase("rpw_exact",
      Seq(Map[String, Any]("op" -> "exact_dedup", "id_col" -> "doc_id")),
      seed = 41010,
      df => {
        val groups = df.collect().map(r => (r.getLong(0), r.getString(1)))
          .groupBy(_._2).values.map(_.map(_._1).toSeq)
        cliquePairs(groups)
      })
  }

  test("windowed microbatch parity: minhash_dedup under random event " +
      "times, lookback, and late rows") {
    windowedParityCase("rpw_minhash",
      Seq(Map[String, Any]("op" -> "minhash_dedup", "id_col" -> "doc_id",
        "text_col" -> "text")),
      seed = 41011,
      df => pairSet(Dedup.minhashNearDups(df, "doc_id", "text")))
  }

  test("windowed microbatch parity: simhash_dedup under random event " +
      "times, lookback, and late rows") {
    windowedParityCase("rpw_simhash",
      Seq(Map[String, Any]("op" -> "simhash_dedup", "id_col" -> "doc_id",
        "text_col" -> "text")),
      seed = 41012,
      df => pairSet(Dedup.simhashNearDups(df, "doc_id", "text")))
  }
}
