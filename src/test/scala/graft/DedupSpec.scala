package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Dedup operator shape + semantics tests: the blocked exact embedding
  * join must produce identical pairs to a naive all-pairs pass without a
  * nested-loop/cartesian physical join, and the banded-LSH variant must
  * recover planted high-cosine near-dups from an equi-join plan. */
class DedupSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Deterministic pseudo-random unit-ish vector from a seed. */
  private def vec(seed: Int, dim: Int = 64): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)((r.nextDouble() - 0.5).toFloat)
  }

  /** v + small perturbation → cosine ≈ 0.99. */
  private def nearDup(v: Array[Float], seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    v.map(x => (x + (r.nextDouble() - 0.5).toFloat * 0.02f))
  }

  private def corpus(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val base = (0 until 40).map(i => (i.toLong, vec(i)))
    val planted = Seq((100L, nearDup(vec(7), 1001)), (101L, nearDup(vec(13), 1002)))
    (base ++ planted).toDF("vec_id", "embedding")
  }

  test("blocked exact embedding dedup matches naive all-pairs, no nested loop") {
    val df = corpus()
    val blocked = Dedup.embeddingNearDups(df, "vec_id", "embedding",
      threshold = 0.9, blocks = 3)
    // naive reference computed driver-side
    val rows = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val expected = (for {
      (ia, va) <- rows; (ib, vb) <- rows if ia < ib
      dot = va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum
      na = math.sqrt(va.map(x => x.toDouble * x.toDouble).sum)
      nb = math.sqrt(vb.map(x => x.toDouble * x.toDouble).sum)
      if dot / (na * nb) >= 0.9
    } yield (ia, ib)).toSet
    val got = blocked.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(expected.size == 2) // both planted pairs, nothing else
    val physical = blocked.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical.take(2000))
    assert(!physical.contains("CartesianProduct"), physical.take(2000))
  }

  test("spreadInput=false removes every cache boundary from dedup plans") {
    import spark.implicits._
    val docs = (0 until 30)
      .map(i => (i.toLong, s"alpha beta gamma delta epsilon zeta token$i tail"))
      .toDF("doc_id", "text")
    spark.conf.set("spark.graft.spreadInput", "false")
    try {
      for (df <- Seq(
          Dedup.minhashNearDups(docs, "doc_id", "text"),
          Dedup.simhashNearDups(docs, "doc_id", "text"),
          Dedup.ngramJaccard(docs, "doc_id", "text"))) {
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("InMemoryTableScan") &&
          !plan.contains("InMemoryRelation"), plan.take(1500))
        assert(df.count() >= 0) // still executes
      }
    } finally spark.conf.set("spark.graft.spreadInput", "true")
  }

  test("cacheSignatures controls the signature cache independently of spreadInput") {
    import spark.implicits._
    val docs = (0 until 30)
      .map(i => (i.toLong, s"alpha beta gamma delta epsilon zeta token$i tail"))
      .toDF("doc_id", "text")
    // cacheSignatures=false alone strips the signature cache even with
    // spreadInput left on (the spread() cache is on the raw input, below
    // the signature projection — so an InMemoryRelation may remain from
    // spread; assert on the narrower maybeCache by turning spread off too)
    spark.conf.set("spark.graft.spreadInput", "false")
    spark.conf.set("spark.graft.cacheSignatures", "false")
    try {
      val plan = Dedup.minhashNearDups(docs, "doc_id", "text")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("InMemoryRelation"), plan.take(1500))
      // and the reverse split: signatures cached while scans stay streaming
      spark.conf.set("spark.graft.cacheSignatures", "true")
      val plan2 = Dedup.minhashNearDups(docs, "doc_id", "text")
        .queryExecution.executedPlan.toString
      assert(plan2.contains("InMemoryTableScan"), plan2.take(1500))
    } finally {
      spark.conf.set("spark.graft.spreadInput", "true")
      spark.conf.unset("spark.graft.cacheSignatures")
    }
  }

  test("deterministic sampling is repartition-stable") {
    import graft.ops.Sampling
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    val s1 = Sampling.sampleByHash(df, "id", 0.3)
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.sampleByHash(df.repartition(7), "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2) // pure function of the key — layout-independent
    assert(s1.size > 200 && s1.size < 400)
    val counts = Sampling.deterministicSplit(df, "id",
      Seq("a" -> 0.5, "b" -> 0.5))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("a", "b") && counts.values.sum == 1000L)
    assertThrows[IllegalArgumentException](
      Sampling.deterministicSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4)))
    assertThrows[IllegalArgumentException](
      Sampling.sampleByHash(df, "id", 1.5))
  }

  test("stratified sampling applies per-stratum rates deterministically") {
    import graft.ops.Sampling
    import spark.implicits._
    val df = (0L until 900L).map(i =>
      (i, Seq("en", "de", "fr")(i.toInt % 3))).toDF("id", "lang")
    val kept = Sampling.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.0, "de" -> 1.0), defaultRate = 0.5)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("en"))         // rate 0 drops the stratum
    assert(byLang("de") == 300L)           // rate 1 keeps everything
    assert(byLang("fr") > 100 && byLang("fr") < 200) // ≈ half
    // repartition-stable (pure function of the key)
    val again = Sampling.stratifiedSample(df.repartition(7), "id", "lang",
      Map("en" -> 0.0, "de" -> 1.0), defaultRate = 0.5)
      .select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
  }

  test("token-budget packing fills shards, overflowing by at most one doc") {
    import graft.ops.Sampling
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, 70L)).toDF("id", "n_tokens")
    val assigned = Sampling.packByTokenBudget(df.repartition(5), "id",
      "n_tokens", budget = 300)
      .select("id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // contract: shard = floor(exclusive running tokens / budget) in id order
    val expected = (1L to 100L).map(i => i -> (i - 1) * 70 / 300).toMap
    assert(assigned == expected)
    // a doc whose first token fits stays in that shard (overflow ≤ 1 doc):
    // no shard's token total short of the last exceeds budget + max doc
    val totals = assigned.groupBy(_._2).view.mapValues(_.size * 70L).toMap
    assert(totals.values.forall(_ <= 300 + 70))
  }

  test("salted join equals the plain join and spreads the hot key") {
    import graft.ops.Skew
    import spark.implicits._
    // 900 of 1000 rows share one key — the pathological single hot key
    val big = (0 until 1000)
      .map(i => (if (i < 900) "HOT" else s"k$i", i.toLong)).toDF("k", "v")
    val dim = Seq(("HOT", "h"), ("k950", "x")).toDF("k", "label")
    val salted = Skew.saltedJoin(big, dim, Seq("k"), saltFactor = 8)
    val plain = big.join(dim, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the small side really is exploded saltFactor ways
    assert(salted.queryExecution.executedPlan.toString.contains("Generate explode"))
  }

  test("hot-shingle guard bounds candidate pairs under a viral shingle") {
    import spark.implicits._
    // every doc contains the same boilerplate 3-gram; without the df cap
    // the self-join emits all C(40,2) = 780 pairs from that one shingle
    val docs = (0 until 40)
      .map(i => (i.toLong, s"common viral boilerplate unique$i filler$i tail$i"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.shingleCandidates(docs, "doc_id", "text", 3)
    assert(uncapped.count() == 780) // default cap 1000 leaves sf-test corpora intact
    spark.conf.set("spark.graft.maxShingleDf", "10")
    try {
      // the shared shingles all have df=40 > 10; per-doc uniqueN shingles
      // have df=1 → zero candidates survive the guard
      assert(Dedup.shingleCandidates(docs, "doc_id", "text", 3).isEmpty)
      // docs that ALSO share below-cap shingles still pair up
      val mixed = docs.union(Seq(
        (100L, "alpha beta gamma delta epsilon"),
        (101L, "alpha beta gamma delta zeta")).toDF("doc_id", "text"))
      val got = Dedup.shingleCandidates(mixed, "doc_id", "text", 3)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((100L, 101L)))
    } finally spark.conf.unset("spark.graft.maxShingleDf")
  }

  test("band-bucket cap bounds candidates under a giant duplicate cluster") {
    import spark.implicits._
    // 30 IDENTICAL docs: every band bucket holds all 30 rows, so without
    // the cap the banded self-join emits C(30,2)=435 pairs per band
    val docs = (0 until 30)
      .map(i => (i.toLong, "same words in every single document here"))
      .toDF("doc_id", "text")
    assert(Dedup.minhashNearDups(docs, "doc_id", "text").count() == 435)
    spark.conf.set("spark.graft.maxBandBucket", "10")
    try {
      // oversized buckets drop before the join in all three banded paths
      assert(Dedup.minhashNearDups(docs, "doc_id", "text").isEmpty)
      assert(Dedup.simhashNearDups(docs, "doc_id", "text").isEmpty)
      // docs in small buckets are untouched: distinct docs + one dup pair
      val mixed = (0 until 20)
        .map(i => (i.toLong, s"totally unique document number $i with words $i"))
        .toDF("doc_id", "text")
        .union(Seq((100L, "twin text alpha beta gamma delta"),
          (101L, "twin text alpha beta gamma delta")).toDF("doc_id", "text"))
      val got = Dedup.minhashNearDups(mixed, "doc_id", "text")
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((100L, 101L)))
    } finally spark.conf.unset("spark.graft.maxBandBucket")
  }

  test("bucket guard streams bounded runs — no unbounded collect, drops observable") {
    import spark.implicits._
    val rows = (0 until 20).map(i => (i.toLong, i % 3)).toDF("id", "k")
    // cap 6: k=0,1 (7 rows each) overflow the cap-bounded buffer and emit
    // only a sentinel; k=2 (6 rows) survives with C(6,2)=15 pairs. No
    // collect_list aggregate anywhere — memory is O(cap) by construction.
    val capped = Dedup.bucketPairs(rows, Seq("k"), 6)
    assert(capped.count() == 15)
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("collect_list"),
      s"bucket arrays must never materialize in an aggregation buffer:\n$plan")
    assert(plan.contains("CollectMetrics graft_bucket_guard"),
      "dropped buckets must be observable")
    // every key hot (cap 5) → nothing survives; cap 0 disables
    assert(Dedup.bucketPairs(rows, Seq("k"), 5).isEmpty)
    assert(Dedup.bucketPairs(rows, Seq("k"), 0).count() ==
      (21 + 21 + 15)) // C(7,2)+C(7,2)+C(6,2)
    assert(Dedup.bucketPairs(rows, Seq("k"), 7).count() == (21 + 21 + 15))
    // opt-in pre-pass for mega-cluster corpora: hot keys drop BEFORE the
    // shuffle via a broadcast anti-join, same output
    spark.conf.set("spark.graft.bucketGuardPrepass", "true")
    try {
      val pre = Dedup.bucketPairs(rows, Seq("k"), 6)
      assert(pre.count() == 15)
      assert(pre.queryExecution.executedPlan.toString.contains("LeftAnti"),
        "prepass mode must anti-join hot keys before the shuffle")
    } finally spark.conf.unset("spark.graft.bucketGuardPrepass")
  }

  test("null ids never pair and never crash the emitter") {
    import spark.implicits._
    val rows = Seq((Some(1L), 0), (Some(2L), 0), (None, 0), (Some(3L), 1),
      (None, 1)).toDF("id", "k")
    val got = Dedup.bucketPairs(rows, Seq("k"), 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L))) // the null in k=0 is skipped, k=1 has 1 real id
    // nulls don't count toward the cap either (collect_list semantics)
    assert(Dedup.bucketPairs(rows, Seq("k"), 2).count() == 1)
  }

  test("prepass mode reports dropped buckets through the observe metric") {
    import spark.implicits._
    val rows = (0 until 20).map(i => (i.toLong, i % 2)).toDF("id", "k")
    spark.conf.set("spark.graft.bucketGuardPrepass", "true")
    try {
      val pre = Dedup.bucketPairs(rows, Seq("k"), 5)
      val plan = pre.queryExecution.executedPlan.toString
      assert(plan.contains("CollectMetrics graft_bucket_guard"),
        s"prepass drops must stay observable:\n$plan")
      assert(pre.count() == 0) // both buckets (10 rows each) over cap 5
    } finally spark.conf.unset("spark.graft.bucketGuardPrepass")
  }

  test("bucket pairs order non-long ids correctly (string doc ids)") {
    import spark.implicits._
    // ops are generic over the id column type; the streaming emitter must
    // order pairs with the value's own comparator, not assume long
    val docs = Seq(
      ("doc-b", "twin text alpha beta gamma delta"),
      ("doc-a", "twin text alpha beta gamma delta"),
      ("doc-c", "completely different words here entirely now")
    ).toDF("doc_id", "text")
    val got = Dedup.minhashNearDups(docs, "doc_id", "text")
      .select("id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("doc-a", "doc-b"))) // lexicographic id_a < id_b
    val ints = (0 until 10).map(i => (i, i % 2)).toDF("id", "k")
    assert(Dedup.bucketPairs(ints, Seq("k"), 0).count() == 10 + 10) // C(5,2)×2
  }

  test("maxShingleDf <= 0 disables the hot-shingle guard") {
    import spark.implicits._
    val docs = (0 until 20)
      .map(i => (i.toLong, s"common viral boilerplate unique$i filler$i tail$i"))
      .toDF("doc_id", "text")
    spark.conf.set("spark.graft.maxShingleDf", "0")
    try assert(Dedup.shingleCandidates(docs, "doc_id", "text", 3).count() == 190)
    finally spark.conf.unset("spark.graft.maxShingleDf")
  }

  test("connected components use reliable checkpoint() when a dir is configured") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ccckpt").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)).toDF("id_a", "id_b")
    val plain = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      val reliable = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == plain)
      assert(reliable == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L))
      // checkpoint files actually materialized under the configured dir
      def fileCount(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(fileCount).sum else 1
      assert(fileCount(new java.io.File(dir)) > 0)
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("connected components label every cluster with its minimum id") {
    import spark.implicits._
    // two chains (multi-round propagation), one triangle, one isolated pair
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),      // chain 1..5
      (10L, 11L), (11L, 12L),                      // chain 10..12
      (20L, 21L), (21L, 22L), (20L, 22L),          // triangle
      (30L, 31L)                                   // pair
    ).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L))
  }

  test("connected components handle a long chain within the iteration cap") {
    import spark.implicits._
    // a 64-node path: worst case for plain propagation (diameter 63);
    // pointer jumping must converge it well inside maxIterations
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b", maxIterations = 12)
    assert(cc.filter(col("component_id") =!= 0L).isEmpty)
    assert(cc.count() == 64)
  }

  test("canonicalCorpus joins are hash joins — the corpus never nested-loops") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("canonspec").toString
    (1L to 200L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val plan = Dedup.canonicalCorpus(docs, pairs, "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("canonicalCorpus keeps one doc per cluster with cluster sizes") {
    import spark.implicits._
    val docs = (1L to 8L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.canonicalCorpus(docs, pairs, "doc_id")
      .select("doc_id", "n_dups")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept == Map(1L -> 3L, 4L -> 1L, 5L -> 2L, 7L -> 1L, 8L -> 1L))
  }

  test("canonical keep is one corpus pass — no anti-join, no union") {
    import spark.implicits._
    // r18 shape pin: the per-paired-id verdict table makes the corpus
    // pay ONE left join + filter; the old two-pass shape (loser
    // anti-join, keeper inner join + union) must not come back
    val docs = (1L to 50L).map(i => (i, i % 7)).toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val p1 = Dedup.canonicalCorpus(docs, pairs, "doc_id")
      .queryExecution.executedPlan.toString
    assert(!p1.contains("LeftAnti"), p1.take(2000))
    assert(!p1.contains("Union"), p1.take(2000))
    val p2 = Dedup.canonicalCorpusBy(docs, pairs, "doc_id", "n_chars")
      .queryExecution.executedPlan.toString
    assert(!p2.contains("LeftAnti"), p2.take(2000))
    assert(!p2.contains("Union"), p2.take(2000))
  }

  test("canonicalCorpusBy keeps the max-priority doc per cluster, tie->min id") {
    import spark.implicits._
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L),  // cluster {1,2,3}: max len ties 2/3 -> 2
      (4L, 5L),                          // unpaired
      (5L, 1L), (6L, 9L),                // cluster {5,6}: 6 wins on length
      (7L, 2L), (8L, 2L))                // unpaired
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.canonicalCorpusBy(docs, pairs, "doc_id", "n_chars")
      .select("doc_id", "n_dups")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept == Map(2L -> 3L, 4L -> 1L, 6L -> 2L, 7L -> 1L, 8L -> 1L))
  }

  test("banded LSH embedding dedup recovers planted near-dups via equi-join") {
    val df = corpus()
    val lsh = Dedup.embeddingNearDupsLsh(df, "vec_id", "embedding",
      threshold = 0.9)
    val got = lsh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((7L, 100L), (13L, 101L)))
    val physical = lsh.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical.take(2000))
    assert(!physical.contains("CartesianProduct"), physical.take(2000))
  }

  test("domain mixing keeps the weighted token share, drops unlisted strata") {
    import spark.implicits._
    val docs = (0 until 300).map { i =>
      val src = s"s${i % 3}" // s0, s1, s2 — 100 docs × 10 tokens each
      (i.toLong, src, 10)
    }.toDF("doc_id", "source", "n_tok")
    // budget 600 of 3000 tokens, s0:s1 = 2:1, s2 unlisted → dropped.
    // rate(s0) = 2/3·600/1000 = 0.4, rate(s1) = 1/3·600/1000 = 0.2
    val out = graft.ops.Sampling.mixByTokenWeights(
      docs, "doc_id", "source", "n_tok", Seq("s0" -> 2L, "s1" -> 1L), 600L)
    val bySrc = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("s2"))
    // md5 buckets are uniform-ish; 100 docs at rate 0.4/0.2 land within
    // a generous band
    assert(bySrc("s0") > 25 && bySrc("s0") < 55, bySrc)
    assert(bySrc("s1") > 10 && bySrc("s1") < 30, bySrc)
    // deterministic: same rows regardless of partitioning
    val again = graft.ops.Sampling.mixByTokenWeights(
      docs.repartition(7), "doc_id", "source", "n_tok",
      Seq("s0" -> 2L, "s1" -> 1L), 600L)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("token chunking: overlap, coverage, tail, and edge sizes") {
    import spark.implicits._
    val words = (1 to 95).map(i => s"w$i")
    val docs = Seq(
      (1L, words.mkString(" ")),   // 95 tokens → chunks at 0,30,60 (+tail)
      (2L, "a b c"),               // shorter than one chunk → 1 chunk
      (3L, "   "),                 // blank → no chunks
      (4L, words.take(40).mkString(" ")) // exactly one chunk, no second
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .chunk(docs, "text", chunkTokens = 40, strideTokens = 30)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id"),
        r.getAs[String]("chunk_text"))).toSeq
    val byDoc = out.groupBy(_._1)
    // 95 tokens: K = ceil((95-40)/30) = 2 → chunks 0..2
    assert(byDoc(1L).map(_._2).sorted == Seq(0, 1, 2))
    val c = byDoc(1L).sortBy(_._2).map(_._3.split(" ").toSeq)
    assert(c(0).size == 40 && c(1).size == 40 && c(2).size == 35)
    // overlap: chunk k+1's first 10 tokens == chunk k's last 10
    assert(c(0).takeRight(10) == c(1).take(10))
    assert(c(1).takeRight(10) == c(2).take(10))
    // coverage: stride-prefixes + last chunk reconstruct the document
    assert((c(0).take(30) ++ c(1).take(30) ++ c(2)) == words)
    assert(byDoc(2L).map(_._3) == Seq("a b c"))
    assert(!byDoc.contains(3L))
    assert(byDoc(4L).size == 1 && byDoc(4L).head._3.split(" ").length == 40)
  }

  test("gopher filter: each rule trips on its target pathology") {
    import spark.implicits._
    val good = "the cat sat on the mat and then the dog came in to see it"
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "too short"),                           // < 8 tokens
      (3L, Seq.fill(60)("spam spam").mkString(" ")), // dup words + bigram
      (4L, ("a " * 20) + "the of supercalifragilisticexpialidocious" * 6),
      (5L, "x y z w v u t s q r")                  // no stopwords
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.gopherFilter(docs, "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"),
          r.getAs[Boolean]("r_min_tokens"), r.getAs[Boolean]("r_dup_words"),
          r.getAs[Boolean]("r_stopwords"))).toMap
    assert(out(1L)._1, s"good doc must pass: ${out(1L)}")
    assert(!out(2L)._2 && !out(2L)._1, "short doc fails min_tokens")
    assert(!out(3L)._3 && !out(3L)._1, "spam doc fails dup_words")
    assert(!out(5L)._4 && !out(5L)._1, "stopword-free doc fails")
  }

  test("k-per-group sample: exact size, repartition-stable, prefix-nested") {
    import spark.implicits._
    val docs = (0 until 300).map(i => (i.toLong, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val k3 = graft.ops.Sampling.sampleKPerGroup(docs, "doc_id", "source", 3)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(k3.size == 9 && k3.groupBy(_._1).forall(_._2.size == 3))
    // same rows regardless of partitioning / input order
    val again = graft.ops.Sampling.sampleKPerGroup(
      docs.orderBy(col("doc_id").desc).repartition(7), "doc_id", "source", 3)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(k3 == again)
    // hash order makes samples prefix-nested: the k=2 sample is a
    // subset of the k=3 sample (growing an eval set never reshuffles it)
    val k2 = graft.ops.Sampling.sampleKPerGroup(docs, "doc_id", "source", 2)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(k2.subsetOf(k3))
  }

  test("temperature mixing upweights small domains relative to share") {
    import spark.implicits._
    // big: 900 docs × 10 tok = 9000; small: 100 docs × 10 tok = 1000.
    // natural share 9:1; α=0.5 weights sqrt(9000):sqrt(1000) ≈ 3:1, so
    // the small domain's ACCEPT RATE is ~3× the big one's
    // (rate ∝ wgt/total) while a proportional mix would keep rates equal
    val docs = (0 until 1000).map { i =>
      (i.toLong, if (i < 900) "big" else "small", 10)
    }.toDF("doc_id", "source", "n_tok")
    val out = graft.ops.Sampling.temperatureMixByTokens(
      docs, "doc_id", "source", "n_tok", budget = 2000L)
    val bySrc = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rateBig = bySrc.getOrElse("big", 0L) / 900.0
    val rateSmall = bySrc.getOrElse("small", 0L) / 100.0
    assert(rateSmall > 2.0 * rateBig,
      s"small-domain rate should dominate: $bySrc")
    // deterministic under repartitioning
    val again = graft.ops.Sampling.temperatureMixByTokens(
      docs.repartition(7), "doc_id", "source", "n_tok", budget = 2000L)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("line dedup drops corpus-hot lines, keeps order, drops empty docs") {
    import spark.implicits._
    // "footer" appears in 3 docs (> maxDocFreq=2) — must vanish; a doc
    // repeating its OWN line counts once, so "twice" (df=1) survives
    val docs = Seq(
      (1L, "alpha\nfooter\nbeta"),
      (2L, "footer\ngamma"),
      (3L, "delta\nfooter"),
      (4L, "twice\ntwice\nepsilon"),
      (5L, "footer")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text", maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "alpha\nbeta",
      2L -> "gamma",
      3L -> "delta",
      4L -> "twice\ntwice\nepsilon"))
    // doc 5 was pure boilerplate → dropped entirely
    assert(!out.contains(5L))
  }

  test("duplicate spans: shared substring detected at ANY alignment") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      // shared span embedded at different offsets in different hosts
      (1L, s"unique preamble one two three $shared tail alpha"),
      (2L, s"$shared completely different trailing content beta gamma"),
      // no shared content
      (3L, "entirely unrelated text with none of those words present here"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text",
        k = 8, w = 4, minDocFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // both hosts carry duplicated fingerprints despite the offset shift
    assert(out(1L)._2 > 0, s"doc 1 found no dup fingerprints: $out")
    assert(out(2L)._2 > 0, s"doc 2 found no dup fingerprints: $out")
    assert(out(3L)._2 == 0, s"doc 3 should be clean: $out")
    assert(out(3L)._3) // clean doc keeps
  }

  test("duplicate spans: keep flag applies the integer fraction threshold") {
    import spark.implicits._
    val span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, span), // wholly duplicated → fails any threshold < 1
      (2L, span),
      (3L, s"$span plus a very long unique suffix that dominates the " +
        "fingerprint population of this particular document easily " +
        "pushing the duplicated fraction far below the one half threshold " +
        "with many additional distinct words nobody else uses anywhere"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text",
        k = 8, w = 4, minDocFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(!out(1L)._3 && !out(2L)._3,
      s"wholly-duplicated docs must fail keep: $out")
    assert(out(3L)._3, s"mostly-unique doc must keep: $out")
    // the wholly-duplicated pair shares every fingerprint
    assert(out(1L)._1 == out(1L)._2)
  }

  test("duplicate spans: deterministic under repartition") {
    import spark.implicits._
    val docs = (0 until 30).map(i =>
      (i.toLong, s"document body number $i with shared license header " +
        "all rights reserved redistribution permitted")).toDF("doc_id", "text")
    val a = Dedup.duplicateSpans(docs, "doc_id", "text").orderBy("doc_id")
      .collect().toSeq
    val b = Dedup.duplicateSpans(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("semanticDedup keeps the farthest-from-centroid member per component") {
    import spark.implicits._
    // nlist=1, iters=0: the centroid is exactly v1 (smallest id's vector)
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f)),  // near-dup of v1, farther from centroid
      (3L, Array(0.0f, 1.0f)))    // dissimilar singleton
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, "vec_id", "embedding",
      nlist = 1, iters = 0, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // {1,2} form a component; 2 is farther from the centroid (= v1), so
    // the paper's keep rule retains 2 and drops the prototypical 1
    assert(out == Map(2L -> 2L, 3L -> 1L))
  }

  test("semanticDedup component sizes partition the corpus") {
    val df = corpus()
    val out = Dedup.semanticDedup(df, "vec_id", "embedding",
      nlist = 4, iters = 1, threshold = 0.9).collect()
    // every doc is in exactly one component: survivors' sizes sum to n
    assert(out.map(_.getLong(2)).sum == 42L)
    // the two planted near-dup pairs each collapse (at most 40 survive);
    // singletons keep n_dups = 1
    assert(out.length <= 40)
    assert(out.count(_.getLong(2) > 1L) >= 1)
  }

  test("incremental minhash equals full-corpus pairs minus old×old") {
    import spark.implicits._
    // duplicate groups that span the old/new split (ids % 3): the
    // incremental run must find new×new and new×old pairs and must NOT
    // emit the old×old ones the full run reports
    val texts = (0 until 8).map(g =>
      s"group $g shares this exact long duplicated sentence body number " +
        s"$g with several siblings across the split boundary")
    val docs = (0L until 24L).map(i => (i, texts((i % 8).toInt)))
      .toDF("id", "text")
    val oldDf = docs.filter(col("id") % 3 =!= 0)
    val newDf = docs.filter(col("id") % 3 === 0)

    val full = Dedup.minhashNearDups(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter { case (a, b) => a % 3 == 0 || b % 3 == 0 }
    assert(expected.nonEmpty && expected.size < full.size)

    val idx = Dedup.minhashSignatures(oldDf, "id", "text")
    val inc = Dedup.minhashNearDupsIncremental(newDf, "id", "text", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc === expected)
  }

  test("persisted banded twin: index banded from 3 narrow columns, " +
      "sig arrays never scanned, semi-join prunes before pairing") {
    import spark.implicits._
    // same split-spanning corpus as the derive-in-memory test above, but
    // with the index and its banded twin round-tripped through parquet —
    // the layout an incremental pipeline reads on every batch
    val texts = (0 until 8).map(g =>
      s"group $g shares this exact long duplicated sentence body number " +
        s"$g with several siblings across the split boundary")
    val docs = (0L until 24L).map(i => (i, texts((i % 8).toInt)))
      .toDF("id", "text")
    val oldDf = docs.filter(col("id") % 3 =!= 0)
    val newDf = docs.filter(col("id") % 3 === 0)
    val full = Dedup.minhashNearDups(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter { case (a, b) => a % 3 == 0 || b % 3 == 0 }

    val dir = java.nio.file.Files.createTempDirectory("graft_banded")
      .toString
    Dedup.minhashSignatures(oldDf, "id", "text")
      .write.parquet(s"$dir/sigs")
    val index = spark.read.parquet(s"$dir/sigs")
    Dedup.bandedRows(index, perms = 128, bands = 21)
      .write.parquet(s"$dir/bands")
    val banded = spark.read.parquet(s"$dir/bands")

    val pairs = Dedup.minhashNearDupsIncrementalFromSigs(
      Dedup.minhashSignatures(newDf, "id", "text"), index, banded,
      perms = 128, bands = 21, threshold = 0.8, maxBucket = 1000)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === expected, "persisted-twin path matches the in-memory path")

    val plan = pairs.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the only parquet scans are the index tables; neither may read the
    // heavy `sig` array — banding comes from the 3-int banded twin and
    // the sigs table is pruned to (id, shh) for the exact verify
    val readSchemas = plan.linesIterator
      .filter(_.trim.startsWith("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty, "expected parquet scans in the plan")
    assert(!readSchemas.exists(_.contains("sig:")),
      s"sig array must never be scanned:\n${readSchemas.mkString("\n")}")
    assert(readSchemas.exists(l =>
      l.contains("band:") && l.contains("bandhash:")),
      "banded twin scanned by its narrow columns")
    // history rows are dropped by a semi-join to the batch's buckets
    // BEFORE the bucket-pair shuffle
    assert(plan.contains("LeftSemi"),
      "index pre-pruned by a left-semi on the batch's band keys")
  }

  test("incremental simhash dedup: parity with the full-corpus pairs " +
      "through the persisted banded twin") {
    import spark.implicits._
    val texts = (0 until 8).map(g =>
      s"group $g shares this exact long duplicated sentence body number " +
        s"$g with several siblings across the split boundary")
    val docs = (0L until 24L).map(i => (i, texts((i % 8).toInt)))
      .toDF("id", "text")
    val oldDf = docs.filter(col("id") % 3 =!= 0)
    val newDf = docs.filter(col("id") % 3 === 0)
    val full = Dedup.simhashNearDups(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter { case (x, y) => x % 3 == 0 || y % 3 == 0 }
    assert(expected.nonEmpty && expected.size < full.size)

    val dir = java.nio.file.Files.createTempDirectory("graft_simidx")
      .toString
    Dedup.simhashSignatures(oldDf, "id", "text").write.parquet(s"$dir/sigs")
    val index = spark.read.parquet(s"$dir/sigs")
    Dedup.simhashBandedRows(index).write.parquet(s"$dir/bands")
    val banded = spark.read.parquet(s"$dir/bands")
    val pairs = Dedup.simhashNearDupsIncrementalFromSigs(
      Dedup.simhashSignatures(newDf, "id", "text"), index, banded,
      maxHamming = 3, maxBucket = 1000)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === expected, "persisted-index path matches the full-corpus subset")
    // the from-sigs full-build path pairs identically to the operator
    val fromSigs = Dedup.simhashNearDupsFromSigs(
      Dedup.simhashSignatures(docs, "id", "text"), maxHamming = 3,
      maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromSigs === full)

    val plan = pairs.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchemas = plan.linesIterator
      .filter(_.trim.startsWith("ReadSchema")).toSeq
    assert(readSchemas.exists(l => l.contains("band:") &&
      l.contains("bv:") && !l.contains("c0:")),
      s"banded twin scanned by its narrow columns:\n${readSchemas.mkString("\n")}")
    assert(plan.contains("LeftSemi"),
      "index pre-pruned by a left-semi on the batch's band keys")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), "no all-pairs fallback")
  }

  test("incremental n-gram dedup: parity with the full-corpus pairs, " +
      "postings twin scanned narrow, shh arrays only for candidates") {
    import spark.implicits._
    val texts = (0 until 8).map(g =>
      s"group $g shares this exact long duplicated sentence body number " +
        s"$g with several siblings across the split boundary")
    val docs = (0L until 24L).map(i => (i, texts((i % 8).toInt)))
      .toDF("id", "text")
    val oldDf = docs.filter(col("id") % 3 =!= 0)
    val newDf = docs.filter(col("id") % 3 === 0)
    val full = Dedup.ngramJaccard(docs, "id", "text", k = 3,
      threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter { case (a, b) => a % 3 == 0 || b % 3 == 0 }
    assert(expected.nonEmpty && expected.size < full.size)

    // index + postings twin round-tripped through parquet — the layout
    // an incremental pipeline reads on every batch
    val dir = java.nio.file.Files.createTempDirectory("graft_ngramidx")
      .toString
    Dedup.shingleSets(oldDf, "id", "text", 3).write.parquet(s"$dir/sets")
    val index = spark.read.parquet(s"$dir/sets")
    Dedup.shinglePostings(index).write.parquet(s"$dir/grams")
    val postings = spark.read.parquet(s"$dir/grams")
    val pairs = Dedup.ngramNearDupsIncrementalFromSets(
      Dedup.shingleSets(newDf, "id", "text", 3), index, postings,
      threshold = 0.8, measure = "jaccard", maxDf = 1000)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === expected, "persisted-index path matches the full-corpus subset")

    // the from-sets full-build path pairs identically to the operator
    val fromSets = Dedup.ngramNearDupsFromSets(
      Dedup.shingleSets(docs, "id", "text", 3), 0.8, "jaccard", 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromSets === full)

    val plan = pairs.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchemas = plan.linesIterator
      .filter(_.trim.startsWith("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty, "expected parquet scans in the plan")
    // candidate generation reads the narrow postings rows (id, s); the
    // heavy shh arrays are scanned only by the candidate verify join
    assert(readSchemas.exists(l => l.contains("s:") && !l.contains("shh:")),
      s"postings twin scanned by its narrow columns:\n${readSchemas.mkString("\n")}")
    assert(plan.contains("LeftSemi"),
      "index pre-pruned by a left-semi on the batch's shingles")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), "no all-pairs fallback")
  }

  test("randomized parity: incremental n-gram ≡ full-corpus minus " +
      "old×old, both measures, over a seeded adversarial corpus") {
    import spark.implicits._
    // fixed seed: exact dups, one-token perturbations, sub-3-word
    // shorties (empty shingle sets), and fresh docs, split arbitrarily
    val rnd = new scala.util.Random(20260815)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
    def sentence(n: Int) =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val bases = Vector.fill(12)(sentence(8 + rnd.nextInt(8)))
    val docs = (0L until 80L).map { i =>
      val b = bases(rnd.nextInt(bases.length))
      val t = rnd.nextInt(4) match {
        case 0 => b
        case 1 => b + " " + vocab(rnd.nextInt(vocab.length))
        case 2 => sentence(1 + rnd.nextInt(2))
        case _ => sentence(10 + rnd.nextInt(6))
      }
      (i, t)
    }.toDF("id", "text")
    val oldDf = docs.filter(col("id") % 2 === 0)
    val newDf = docs.filter(col("id") % 2 === 1)
    for (measure <- Seq("jaccard", "containment")) {
      val thr = if (measure == "containment") 0.7 else 0.6
      val full = Dedup.ngramNearDupsFromSets(
        Dedup.shingleSets(docs, "id", "text", 3), thr, measure, 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_prop_$measure").toString
      Dedup.shingleSets(oldDf, "id", "text", 3).write.parquet(s"$dir/sets")
      val index = spark.read.parquet(s"$dir/sets")
      Dedup.shinglePostings(index).write.parquet(s"$dir/grams")
      val inc = Dedup.ngramNearDupsIncrementalFromSets(
        Dedup.shingleSets(newDf, "id", "text", 3), index,
        spark.read.parquet(s"$dir/grams"), thr, measure, 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = full.filter { case (a, b) => a % 2 == 1 || b % 2 == 1 }
      assert(full.nonEmpty && expected.size < full.size, s"$measure corpus")
      assert(inc === expected,
        s"$measure: extra=${inc diff expected} missing=${expected diff inc}")
    }
  }

  test("incremental containment: a new doc quoting a settled doc whole " +
      "is caught; disjoint new docs never pair") {
    import spark.implicits._
    val oldDf = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "completely different settled content nothing shared here at all"))
      .toDF("id", "text")
    val newDf = Seq(
      (10L, "intro words alpha beta gamma delta epsilon zeta eta theta " +
        "closing remark"),
      (11L, "fresh novel body with no overlap whatsoever anywhere at hand"))
      .toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_contidx")
      .toString
    Dedup.shingleSets(oldDf, "id", "text", 3).write.parquet(s"$dir/sets")
    val index = spark.read.parquet(s"$dir/sets")
    Dedup.shinglePostings(index).write.parquet(s"$dir/grams")
    val postings = spark.read.parquet(s"$dir/grams")
    val rows = Dedup.ngramNearDupsIncrementalFromSets(
      Dedup.shingleSets(newDf, "id", "text", 3), index, postings,
      threshold = 0.9, measure = "containment", maxDf = 1000)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 10L)), "only the settled-quoted-inside-new pair survives")
    assert(rows.head.getDouble(2) == 1.0,
      "the quoted doc's shingles are fully contained")
  }

  test("incremental banded-LSH embedding dedup: parity with the full-corpus " +
      "pairs, banding never scans the dense vectors") {
    import spark.implicits._
    // clusters spanning the old/new split: old 7≈100, both ≈ new 200;
    // old 13 ≈ new 201 ≈ new 202
    val base = (0 until 40).map(i => (i.toLong, vec(i)))
    val df = (base ++ Seq(
      (100L, nearDup(vec(7), 1001)), (200L, nearDup(vec(7), 1003)),
      (201L, nearDup(vec(13), 1004)), (202L, nearDup(vec(13), 1005))))
      .toDF("vec_id", "embedding")
    val oldDf = df.filter(col("vec_id") < 200)
    val newDf = df.filter(col("vec_id") >= 200)
    // band collision depends only on the two fixed-hyperplane signatures
    // involved, so the incremental pairs must be EXACTLY the new-touching
    // subset of the full-corpus operator's pairs
    val full = Dedup.embeddingNearDupsLsh(df, "vec_id", "embedding",
      threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter { case (x, y) => x >= 200 || y >= 200 }
    assert(expected.nonEmpty && expected.size < full.size, full.toString)

    // index + banded twin round-tripped through parquet — the layout an
    // incremental pipeline reads on every batch
    val dir = java.nio.file.Files.createTempDirectory("graft_embidx")
      .toString
    Dedup.embeddingVectors(oldDf, "vec_id", "embedding")
      .write.parquet(s"$dir/vecs")
    val index = spark.read.parquet(s"$dir/vecs")
    Dedup.embeddingBandedRows(index, bands = 16, rowsPerBand = 8)
      .write.parquet(s"$dir/bands")
    val banded = spark.read.parquet(s"$dir/bands")
    val pairs = Dedup.embeddingNearDupsLshIncremental(
      Dedup.embeddingVectors(newDf, "vec_id", "embedding"), index, banded,
      threshold = 0.9, bands = 16, rowsPerBand = 8, maxBucket = 1000)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === expected, "persisted-index path matches the full-corpus subset")

    val plan = pairs.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchemas = plan.linesIterator
      .filter(_.trim.startsWith("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty, "expected parquet scans in the plan")
    // banding comes from the 3-column twin; the dense vectors are read
    // ONLY by the verify scan (id, v, norm), never exploded for banding
    assert(readSchemas.exists(l => l.contains("band:") &&
      l.contains("sig:") && !l.contains("v:")),
      s"banded twin scanned by its narrow columns:\n${readSchemas.mkString("\n")}")
    assert(plan.contains("LeftSemi"),
      "index pre-pruned by a left-semi on the batch's band keys")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), "no all-pairs fallback")
  }

  /** Independent reference for the E-S priority: plain-JVM md5 + the
    * same double tree the operator pins. */
  private def esPriority(id: Long, w: Double): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 12), 16)
    val u = (h.toDouble + 1.0) / 281474976710656.0
    BigDecimal(math.exp(math.log(u) / w))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("weightedSample: exact E-S priorities, ranked cut, weight edges") {
    import spark.implicits._
    val rows = (1L to 50L).map(i => (i, i.toDouble)) ++
      Seq((51L, 0.0), (52L, -3.0)) // non-positive weights drop
    val df = rows.toDF("id", "w")
    val got = graft.ops.Sampling.weightedSample(df, "id", "w", k = 10)
      .orderBy("sample_rank").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    val expected = (1L to 50L).map(i => (i, esPriority(i, i.toDouble)))
      .sortBy { case (id, p) => (-p, id) }.take(10)
    assert(got.map(t => (t._1, t._2)).toSeq == expected)
    assert(got.map(_._3).toSeq == (1 to 10))
    // k past the population returns every positive-weight row
    assert(graft.ops.Sampling.weightedSample(df, "id", "w", k = 99)
      .count() == 50)
  }

  test("weightedSample: inclusion is biased toward heavy weights") {
    import spark.implicits._
    val df = (1L to 2000L)
      .map(i => (i, if (i % 2 == 0) 1000.0 else 1.0)).toDF("id", "w")
    val top = graft.ops.Sampling.weightedSample(df, "id", "w", k = 50)
      .collect().map(_.getLong(0))
    assert(top.count(_ % 2 == 0) > 40,
      s"heavy ids in top-50: ${top.count(_ % 2 == 0)}")
  }
}
