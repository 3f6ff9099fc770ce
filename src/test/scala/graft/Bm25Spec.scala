package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Okapi BM25: textbook-formula equality, deterministic tie-break,
  * top-k truncation, and the no-explode plan claim. */
class Bm25Spec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Plain-Scala reference: the same double tree the operator builds. */
  private def ref(n: Long, s: Long, dl: Long, tfs: Seq[Long],
      dfs: Seq[Long]): Double = {
    val avgdl = s.toDouble / n.toDouble
    tfs.zip(dfs).map { case (tf, df) =>
      val idf = math.log((n.toDouble - df.toDouble + 0.5) /
        (df.toDouble + 0.5) + 1.0)
      idf * (tf.toDouble * 2.2) /
        (tf.toDouble + 1.2 * (1.0 - 0.75 +
          0.75 * (dl.toDouble / avgdl)))
    }.reduceLeft(_ + _)
  }

  test("scores equal the textbook formula; ranking and ties deterministic") {
    import spark.implicits._
    val docs = Seq(
      (1L, "join scan join"),
      (2L, "merge merge merge merge"),
      (3L, "other words here"),
      (4L, "join scan join")) // identical to doc 1 → exact tie, id breaks
      .toDF("doc_id", "text")
    val terms = Seq("join", "scan", "merge")
    val out = TextAnalysis.bm25(docs, "doc_id", "text", terms, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .sortBy(_._3)
    // corpus stats by hand: N=4, S=13; df(join)=2, df(scan)=2, df(merge)=1
    def score(dl: Long, tfs: Seq[Long]) =
      math.rint(ref(4, 13, dl, tfs, Seq(2, 2, 1)) * 1e6) / 1e6
    val s1 = score(3, Seq(2, 1, 0))
    val s2 = score(4, Seq(0, 0, 4))
    assert(out.map(_._1) == Seq(2L, 1L, 4L, 3L).take(out.size) ||
      out.head._1 == 2L, s"order: ${out.toSeq}")
    val byId = out.map(r => r._1 -> r._2).toMap
    assert(byId(1L) == s1, s"${byId(1L)} != $s1")
    assert(byId(2L) == s2, s"${byId(2L)} != $s2")
    assert(byId(4L) == s1, "identical doc scores identically")
    assert(byId(3L) == 0.0, "no query term → score 0")
    // tie between 1 and 4 broken by id: 1 ranks ahead
    val rank = out.map(r => r._1 -> r._3).toMap
    assert(rank(1L) < rank(4L), s"id tie-break: $rank")
  }

  test("topK truncates to the k best by (score desc, id)") {
    import spark.implicits._
    val docs = (1L to 9L).map(i =>
      (i, if (i % 2 == 0) "join join" else "nothing")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", "text", Seq("join"), topK = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(out.sorted == Seq(2L, 4L, 6L), s"3 best even ids: $out")
  }

  test("NULL-text rows drop instead of poisoning dl/tf/corpus stats") {
    import spark.implicits._
    val docs = Seq((1L, "join scan"), (2L, null.asInstanceOf[String]),
      (3L, "join")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text", Seq("join"),
      topK = 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(!got.contains(2L), s"null-text doc must not score: $got")
    // and the corpus stats (N, avgdl, df) see only the scorable docs:
    // identical to running with the null row pre-dropped
    val clean = TextAnalysis.bm25(docs.filter($"doc_id" =!= 2L), "doc_id",
      "text", Seq("join"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == clean)
  }

  test("plan is map-side: no Generate (explode) anywhere, one aggregate") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"join scan doc $i"))
      .toDF("doc_id", "text")
    val plan = TextAnalysis.bm25(docs, "doc_id", "text", Seq("join", "scan"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), plan.take(2000))
  }

  test("lmSurprise: Laplace bigram math by hand; 1-token docs drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"),   // bigrams (a,b),(b,a),(a,b)
      (2L, "a b"),       // one bigram (a,b)
      (3L, "x y"),       // one bigram (x,y)
      (4L, "solo"))      // no bigrams → no output row
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmSurprise(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // C(a,b)=3 C(b,a)=1 C(x,y)=1; C(a·)=3 C(b·)=1 C(x·)=1; V=3
    // s(a,b)=ln((3+3)/(3+1))=ln 1.5; s(b,a)=s(x,y)=ln((1+3)/(1+1))=ln 2
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out.keySet == Set(1L, 2L, 3L), s"doc 4 must drop: $out")
    assert(out(2L)._1 == 1 && out(2L)._2 == r6(math.log(1.5)), s"${out(2L)}")
    assert(out(3L)._1 == 1 && out(3L)._2 == r6(math.log(2.0)), s"${out(3L)}")
    assert(out(1L)._1 == 3)
    assert(out(1L)._2 == r6((2 * math.log(1.5) + math.log(2.0)) / 3.0),
      s"${out(1L)}")
    // the common transition scores LOWER surprise than the rare ones
    assert(out(1L)._2 < out(3L)._2)
  }

  test("lmCounts + lmSurpriseScore: run-1 parity; smoothed OOV held-out") {
    import spark.implicits._
    val train = Seq(
      (1L, "a b a b"), (2L, "a b"), (3L, "x y"), (4L, "solo"))
      .toDF("doc_id", "text")
    val (big, uni, voc) = TextAnalysis.lmCounts(train, "doc_id", "text")
    // run-1 parity: scoring the TRAINING corpus under the frozen
    // counts is bit-identical to the inline trainer — every bigram is
    // in-vocabulary there, so the left joins hit and the coalesces are
    // no-ops (the contract the incremental pipeline's first run relies
    // on when it persists the counts and re-reads them)
    val inline = TextAnalysis.lmSurprise(train, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val frozen = TextAnalysis
      .lmSurpriseScore(train, "doc_id", "text", big, uni, voc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(frozen == inline, s"run-1 parity: $frozen != $inline")
    // held-out text under the FROZEN model: an unseen bigram with a
    // seen prefix scores ln((c1+V)/(0+1)); an unseen prefix scores
    // ln((0+V)/(0+1)) = ln V — the scaladoc's smoothed-OOV extension.
    // Training stats: C(a·)=3, V=3.
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val held = Seq((10L, "a z"), (11L, "q r"), (12L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis
      .lmSurpriseScore(held, "doc_id", "text", big, uni, voc)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out.keySet == Set(10L, 11L), s"1-token doc must drop: $out")
    assert(out(10L) == ((1L, r6(math.log(6.0)))), s"${out(10L)}")
    assert(out(11L) == ((1L, r6(math.log(3.0)))), s"${out(11L)}")
  }

  test("tokenKlDrift: zero for the corpus itself, hand-math for slices") {
    import spark.implicits._
    // single source ⇒ P_g ≡ P_corpus even after smoothing ⇒ KL exactly 0
    val solo = Seq(("s1", "x x y"), ("s1", "y z"))
      .toDF("source", "text")
    val z = TextAnalysis.tokenKlDrift(solo, "source", "text").collect()
    assert(z.length == 1 && z(0).getDouble(2) == 0.0, z.toSeq.toString)

    // two sources: a = "x x y" (n=3), b = "y y y" (n=3); corpus n=6,
    // V=2; c(x)=2, c(y)=4
    val docs = Seq(("a", "x x y"), ("b", "y y y")).toDF("source", "text")
    val out = TextAnalysis.tokenKlDrift(docs, "source", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // the SAME four-exact-double-factor tree the operator builds (no
    // integer products — the op is overflow-free at any corpus size)
    def term(cgt: Long, ng: Long, ct: Long): Double =
      (cgt.toDouble + 1.0) / (ng.toDouble + 2.0) *
        math.log(((cgt.toDouble + 1.0) * (6.0 + 2.0)) /
          ((ng.toDouble + 2.0) * (ct.toDouble + 1.0)))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val klA = r6(term(2, 3, 2) + term(1, 3, 4)) // a: x=2, y=1
    val klB = r6(term(0, 3, 2) + term(3, 3, 4)) // b: x ABSENT still counts
    assert(out("a") == ((3L, klA)), s"${out("a")} != (3, $klA)")
    assert(out("b") == ((3L, klB)), s"${out("b")} != (3, $klB)")
    // the corpus mix is y-heavy (x:2, y:4): the x-heavy slice `a`
    // (P_a(x)=3/5 vs corpus 3/8) drifts farther than the all-y slice
    // `b` (P_b(y)=4/5 vs corpus 5/8)
    assert(out("a")._2 > out("b")._2)
  }

  test("klFromTokenCounts: the count-table path equals the exploded path") {
    import spark.implicits._
    val docs = Seq(("a", "x x y"), ("b", "y y y"), ("c", "x z z"))
      .toDF("source", "text")
    val viaText = TextAnalysis.tokenKlDrift(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val counts = Seq(("a", "x", 2L), ("a", "y", 1L), ("b", "y", 3L),
      ("c", "x", 1L), ("c", "z", 2L)).toDF("source", "tok", "n")
    val viaCounts = TextAnalysis
      .klFromTokenCounts(counts, "source", "tok", "n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(viaText === viaCounts)
  }

  test("tokenKlDrift maxVocab: caps to top-V by (freq desc, token asc)") {
    import spark.implicits._
    // corpus counts: x=3, y=3, z=1 → top-2 keeps {x, y} (z drops);
    // filtered slices: a = x x y (n=3), b = y y x (n=3); V=2, n=6,
    // c(x)=3, c(y)=3
    val docs = Seq(("a", "x x y z"), ("b", "y y x")).toDF("source", "text")
    val out = TextAnalysis.tokenKlDrift(docs, "source", "text",
      maxVocab = Some(2))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def term(cgt: Long, ng: Long, ct: Long): Double =
      (cgt.toDouble + 1.0) / (ng.toDouble + 2.0) *
        math.log(((cgt.toDouble + 1.0) * (6.0 + 2.0)) /
          ((ng.toDouble + 2.0) * (ct.toDouble + 1.0)))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val klA = r6(term(2, 3, 3) + term(1, 3, 3))
    val klB = r6(term(1, 3, 3) + term(2, 3, 3))
    // n_tokens = 3 for BOTH (z filtered out of a's count), not 4
    assert(out("a") == ((3L, klA)), s"${out("a")} != (3, $klA)")
    assert(out("b") == ((3L, klB)), s"${out("b")} != (3, $klB)")
    // a cap at least the vocab size reproduces the uncapped result
    val capped = TextAnalysis.tokenKlDrift(docs, "source", "text",
      maxVocab = Some(100)).collect().map(r => (r.getString(0),
        r.getLong(1), r.getDouble(2))).toSet
    val uncapped = TextAnalysis.tokenKlDrift(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(capped == uncapped)
  }

  test("tokenKlDrift plan: the vocab count table is never broadcast") {
    import spark.implicits._
    val docs = (1L to 200L)
      .map(i => (s"s${i % 3}", s"tok$i tok${i % 7} common words here"))
      .toDF("source", "text")
    // AQE off so the static plan's BroadcastExchange placement (driven
    // by the explicit hints) is inspectable directly
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextAnalysis.tokenKlDrift(docs, "source", "text")
        .queryExecution.executedPlan
      val bcasts = plan.collect {
        case b: org.apache.spark.sql.execution.exchange
            .BroadcastExchangeExec => b
      }
      assert(bcasts.nonEmpty, s"expected hinted broadcasts:\n$plan")
      // the vocab aggregate's count alias __ct must not sit under any
      // BroadcastExchange; the bounded sides (__ng groups, __n/__v
      // totals) are exactly what DOES broadcast
      bcasts.foreach { b =>
        val sub = b.child.toString
        assert(!sub.contains("__ct"),
          s"corpus-vocabulary table must not broadcast:\n${sub.take(1500)}")
      }
      assert(bcasts.exists(_.child.toString.contains("__ng")),
        "the per-group totals side should be a broadcast")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("collocations: hand-computed bigram-space PMI, ties break on words") {
    import spark.implicits._
    // corpus bigrams: (a,b)×3, (b,a)×1, (b,c)×1 — N=5
    // PMI(a,b) = ln(3·5/(3·3)) = ln(5/3); PMI(b,a) = ln(1·5/(2·1)) =
    // PMI(b,c) = ln(5/2) — an exact tie, resolved by (w1, w2)
    val docs = Seq("a b a b", "a b c").toDF("text")
    val out = graft.ops.TextAnalysis.collocations(docs, "text",
      minCount = 1, topK = 10)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    def pmi6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq === Seq(
      ("b", "a", 1L, pmi6(math.log(2.5))),
      ("b", "c", 1L, pmi6(math.log(2.5))),
      ("a", "b", 3L, pmi6(math.log(5.0 / 3.0)))))
  }

  test("collocations: minCount prunes hapax pairs, topK cuts the list") {
    import spark.implicits._
    val docs = Seq("x y x y x y", "p q").toDF("text")
    val pruned = graft.ops.TextAnalysis.collocations(docs, "text",
      minCount = 2, topK = 10).collect()
    assert(pruned.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("x", "y"), ("y", "x")))
    val cut = graft.ops.TextAnalysis.collocations(docs, "text",
      minCount = 1, topK = 1).collect()
    assert(cut.length === 1)
  }

  test("tfidfTopTerms: hand-computed smoothed weights, rounded-rank ties") {
    import spark.implicits._
    // N = 3 docs; 'rare' only in doc 1, 'mid' in docs 1+2, 'com' in all
    val docs = Seq(
      (1L, "rare rare mid com"),
      (2L, "mid com com"),
      (3L, "com"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.tfidfTopTerms(docs, "doc_id", "text",
      k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    def w(tf: Long, df: Long): Double = {
      val raw = tf.toDouble * (math.log((1.0 + 3.0) / (1.0 + df.toDouble)) + 1.0)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out.toSeq == Seq(
      (1L, "rare", w(2, 1), 1), (1L, "mid", w(1, 2), 2),
      (2L, "com", w(2, 3), 1), (2L, "mid", w(1, 2), 2),
      // doc 3 has only one term; the NULL doc contributes nothing
      (3L, "com", w(1, 3), 1)))
  }

  test("tfidfTopTermsByGroup: group-as-document weights, shared term sinks") {
    import spark.implicits._
    // 'shared' appears in both groups (df=2=N → weight tf·1.0);
    // 'only_a' is unique to g-a (df=1 → idf ln(3/2)+1)
    val docs = Seq(
      ("a", "only_a shared"), ("a", "only_a shared"),
      ("b", "shared shared shared")).toDF("src", "text")
    val out = graft.ops.TextAnalysis.tfidfTopTermsByGroup(
      docs, "src", "text", k = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    def w(tf: Long, df: Long): Double = {
      val raw = tf.toDouble *
        (math.log((1.0 + 2.0) / (1.0 + df.toDouble)) + 1.0)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out.toSeq == Seq(
      ("a", "only_a", w(2, 1), 1), ("a", "shared", w(2, 2), 2),
      ("b", "shared", w(3, 2), 1)))
  }

  test("collapseRepeatTokens: adjacent runs collapse, long-range reuse stays") {
    import spark.implicits._
    val df = Seq(
      (1L, "the the the cat sat sat on the mat"),
      (2L, "a b a b"),         // no ADJACENT repeats → untouched
      (3L, "x"),               // single token
      (4L, "y y y y y y")).toDF("doc_id", "text")
    val (cleaned, removed) =
      graft.ops.TextAnalysis.collapseRepeatTokens("text")
    val out = df.select($"doc_id", cleaned.as("c"), removed.as("r"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2))))
      .toMap
    assert(out(1L) == (("the cat sat on the mat", 3)))
    assert(out(2L) == (("a b a b", 0)))
    assert(out(3L) == (("x", 0)))
    assert(out(4L) == (("y", 5)))
  }

  test("tfidfTopTerms: equal rounded scores tie on term text") {
    import spark.implicits._
    // both terms: tf=1, df=1 → identical score; 'alpha' < 'beta'
    val docs = Seq((1L, "beta alpha")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.tfidfTopTerms(docs, "doc_id", "text",
      k = 2).orderBy("rank").collect().map(_.getString(1)).toSeq
    assert(out == Seq("alpha", "beta"))
  }

  test("burstyTerms: hand VMR, deterministic term scores 0, minDf cut") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x x z"), (2L, "y z"), (3L, "y z"), (4L, "y z")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.burstyTerms(docs, "doc_id", "text",
      k = 5, minDf = 1L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    // x: one doc, 4 hits → (4·16 − 16)/(4·4) = 3.0 — maximally bursty
    assert(out("x") == ((1L, 4L, 3.0, 1)))
    // y: 3 docs, 1 each → (12 − 9)/12 = 0.25 — near-uniform
    assert(out("y") == ((3L, 3L, 0.25, 2)))
    // z: exactly once everywhere → 0 — sub-Poisson determinism
    assert(out("z") == ((4L, 4L, 0.0, 3)))
    // minDf prunes x (df 1 < 2)
    val pruned = graft.ops.TextAnalysis.burstyTerms(docs, "doc_id",
      "text", k = 5, minDf = 2L).collect().map(_.getString(0)).toSet
    assert(pruned == Set("y", "z"))
  }

  test("zipfFit: hand OLS on a 3-type slice, single-type NULL fit") {
    import spark.implicits._
    // counts 4,2,1 → ranks 1,2,3; fit ln(c) on ln(rank) by hand
    val docs = Seq(
      (1L, "a a a a b b c", "s1"),
      (2L, "solo", "s2")).toDF("doc_id", "text", "source")
    val out = graft.ops.TextAnalysis.zipfFit(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val (n, sx, sy) = (3.0, xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    val got = out("s1")
    assert(got._1 == 3L)
    assert(math.abs(got._2.get.asInstanceOf[Double] - slope) < 1e-5)
    assert(math.abs(got._3.get.asInstanceOf[Double] - icept) < 1e-5)
    assert(got._2.get.asInstanceOf[Double] < -1.0, "near-Zipfian decay")
    // a single-type slice has zero rank variance: no fit
    assert(out("s2") == ((1L, None, None)))
  }

  test("tokenEntropy: uniform pair hits ln 2, single-type norm is NULL") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b", "s1"),                        // uniform: H = ln 2
      (2L, "x x x", "s2"),                      // single type: H = 0
      (3L, null.asInstanceOf[String], "s2")
    ).toDF("doc_id", "text", "source")
    val out = graft.ops.TextAnalysis.tokenEntropy(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(out("s1") == ((2L, 2L, math.rint(math.log(2.0) * 1e6) / 1e6,
      Some(1.0))))
    assert(out("s2") == ((3L, 1L, 0.0, None)))
  }

  test("vocabOverlap: hand-counted Jaccard, NULLs dropped, disjoint absent") {
    import spark.implicits._
    // s1 vocab {a,b,c}; s2 vocab {b,c,d,e} (duplicates collapse; the
    // empty token from the double space is dropped); s3 is disjoint
    val docs = Seq(
      (1L, "a b  c", "s1"), (2L, "b b", "s1"),
      (3L, "b c d", "s2"), (4L, "d e", "s2"),
      (5L, null.asInstanceOf[String], "s2"),
      (6L, "zz", "s3")
    ).toDF("doc_id", "text", "source")
    val out = graft.ops.TextAnalysis.vocabOverlap(docs, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // |s1|=3, |s2|=4, ∩={b,c} ⇒ J = 2/(3+4−2) = 0.4
    assert(out((("s1", "s2"))) == ((3L, 4L, 2L, 0.4)))
    // s3 shares nothing — inner-join semantics drop its pairs entirely
    assert(out.size == 1)
  }
}
