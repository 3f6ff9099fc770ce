package graft

import graft.mat.{PipelineSteps, StreamingTableMat}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The project-surface entry points for the curation library: the
  * `pipeline` step registry's typed parsing and column-neutral
  * semantics, and the `streaming_table` config layer (state_ttl
  * parsing, and the armed-TTL path a continuous deployment takes,
  * driven here with a MemoryStream through the SAME buildStream the
  * materialization uses). */
class PipelineMatSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def steps(yamlish: Seq[Map[String, Any]]) =
    PipelineSteps.parse(Some(yamlish.toVector))

  test("media_dedup: exact merges identical bodies across headers, " +
      "simhash merges perturbed bodies, corrupt payloads always kept") {
    import graft.ops.Multimodal
    import spark.implicits._
    val base = Seq(
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (7L, "totally different content with nothing shared at all here"))
      .toDF("doc_id", "text")
    // identical bodies, headers differ (dims derive from doc_id)
    val media = Multimodal.syntheticMedia(base)
      // plus one corrupt and one NULL payload: must survive BOTH
      // methods untouched (a NULL payload exercised the three-valued
      // isGrft that once dropped the row from the exact keep rule)
      .unionByName(Seq((99L, "audio", Array[Byte](1, 2, 3)))
        .toDF("doc_id", "media_type", "payload"))
      .unionByName(Seq((98L, "video", null.asInstanceOf[Array[Byte]]))
        .toDF("doc_id", "media_type", "payload"))
    val exact = steps(Seq(Map("op" -> "media_dedup")))
      .head.apply(media)
    assert(exact.columns.toSeq == media.columns.toSeq, "column-neutral")
    assert(exact.collect().map(_.getLong(0)).toSet == Set(2L, 7L, 98L, 99L),
      "identical bodies merge to min id despite different headers; " +
        "the corrupt and NULL payloads are kept")
    // simhash: one appended token is a small hamming perturbation
    val perturbed = Multimodal.syntheticMedia(Seq(
      (12L, "alpha beta gamma delta epsilon zeta eta theta iota kappa tail"))
      .toDF("doc_id", "text"))
    val near = steps(Seq(Map("op" -> "media_dedup",
      "method" -> "simhash")))
      .head.apply(media.unionByName(perturbed))
    val kept = near.collect().map(_.getLong(0)).toSet
    assert(!kept.contains(5L) && kept.contains(2L) && kept.contains(7L)
      && kept.contains(99L) && kept.contains(98L), kept.toString)
  }

  test("media_dedup frames: stride-aligned clips merge into their " +
      "source, unrelated and corrupt payloads are kept, params checked") {
    import graft.ops.Multimodal
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, udf}
    val longText = (1 to 60).map(i => f"token$i%02d").mkString(" ")
    val base = Seq(
      (3L, longText),
      (9L, "totally different content with nothing shared at all here " +
        "padded out to a few frames of length for the slicing"))
      .toDF("doc_id", "text")
    val media = Multimodal.syntheticMedia(base)
    // a clip: body minus its first 64 bytes — a stride-aligned cut, so
    // every clip frame is one of the source's frames (containment 1)
    val clipUdf = udf { (p: Array[Byte]) =>
      Multimodal.StubCodec.encode(8, 8, 1, p.drop(16 + 64))
    }
    val clip = media.filter($"doc_id" === 3L)
      .withColumn("doc_id", lit(1003L))
      .withColumn("payload", clipUdf($"payload"))
    val corrupt = Seq((99L, "audio", Array[Byte](7, 7)))
      .toDF("doc_id", "media_type", "payload")
    val out = steps(Seq(Map("op" -> "media_dedup", "method" -> "frames")))
      .head.apply(media.unionByName(clip).unionByName(corrupt))
    assert(out.columns.toSeq == media.columns.toSeq, "column-neutral")
    assert(out.collect().map(_.getLong(0)).toSet == Set(3L, 9L, 99L),
      "clip merges into its source; unrelated doc and corrupt kept")
    // bad params fail at parse time by name
    val e = intercept[IllegalArgumentException](
      steps(Seq(Map("op" -> "media_dedup", "method" -> "frames",
        "stride" -> 0))))
    assert(e.getMessage.contains("stride"), e.getMessage)
  }

  test("exact_dedup keeps the min-id row WITH its own fields") {
    import spark.implicits._
    val docs = Seq(
      (5L, "srcB", "same text"),
      (2L, "srcA", "same text"),   // min id → canonical, srcA must survive
      (9L, "srcC", "other text"))
      .toDF("doc_id", "source", "text")
    val out = steps(Seq(Map("op" -> "exact_dedup",
      "text_col" -> "text", "id_col" -> "doc_id")))
      .head.apply(docs)
    assert(out.columns.toSeq == Seq("doc_id", "source", "text"),
      "column order preserved")
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set((2L, "srcA", "same text"), (9L, "srcC", "other text")),
      s"canonical = min-id row with ITS source: $rows")
  }

  test("chunk step windows tokens with overlap; text column replaced") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", (1 to 7).map(i => s"w$i").mkString(" ")), // 7 tokens
      (2L, "s", "a b"),   // shorter than one chunk → 1 chunk
      (3L, "s", "  "))    // no tokens → no chunks
      .toDF("doc_id", "source", "text")
    val out = steps(Seq(Map("op" -> "chunk", "text_col" -> "text",
      "chunk_tokens" -> 4, "stride_tokens" -> 3)))
      .head.apply(docs)
    assert(out.columns.toSeq ==
      Seq("doc_id", "source", "chunk_id", "chunk_text"))
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getString(3))).toSet
    assert(rows == Set(
      (1L, 0, "w1 w2 w3 w4"), (1L, 1, "w4 w5 w6 w7"),
      (2L, 0, "a b")), s"chunks: $rows")
  }

  test("decontaminate drops k-gram overlap with the static benchmark") {
    import spark.implicits._
    val benchDir = java.nio.file.Files
      .createTempDirectory("graft_bench").toString + "/b"
    Seq((100L, "one two three four five six"))
      .toDF("doc_id", "text").write.parquet(benchDir)
    val docs = Seq(
      (1L, "s", "zz one two three four five tail words here"), // shares a 5-gram
      (2L, "s", "completely unrelated content with no overlap at all"),
      (3L, "s", "one two three"))  // under k tokens → no grams → clean
      .toDF("doc_id", "source", "text")
    val out = steps(Seq(Map("op" -> "decontaminate", "id_col" -> "doc_id",
      "text_col" -> "text", "against_location" -> benchDir, "k" -> 5)))
      .head.apply(docs)
    assert(out.columns.toSeq == docs.columns.toSeq, "column-neutral")
    assert(out.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    // the `against:` catalog-table form resolves through the session
    spark.read.parquet(benchDir).createOrReplaceTempView("bench_v")
    val viaTable = steps(Seq(Map("op" -> "decontaminate",
      "id_col" -> "doc_id", "text_col" -> "text",
      "against" -> "bench_v", "k" -> 5)))
      .head.apply(docs)
    assert(viaTable.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    // missing benchmark config is a named error at parse time
    val e = intercept[IllegalArgumentException](
      steps(Seq(Map("op" -> "decontaminate"))))
    assert(e.getMessage.contains("against_location"))
  }

  test("pagerank_weight: fractional weights rank exactly like their " +
      "integer-scaled equivalents") {
    import spark.implicits._
    // ranks depend only on the w/ow ratios under exact floor division,
    // so (0.5, 1.0, 2.5) must produce bit-identical ranks to (1, 2, 5);
    // the old per-row DECIMAL(38,0) cast rounded 0.5 to 0 or 1 per edge
    def run(ws: Seq[Double]) = {
      val docs = Seq(
        (1L, "a", "b", ws(0)), (2L, "a", "c", ws(1)), (3L, "b", "c", ws(2)))
        .toDF("doc_id", "src", "dst", "w")
      steps(Seq(Map("op" -> "pagerank_weight", "src_col" -> "src",
        "dst_col" -> "dst", "weight_col" -> "w", "iters" -> 4,
        "node_col" -> "dst", "out_col" -> "r")))
        .head.apply(docs)
        .select("doc_id", "r").collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
    }
    val frac = run(Seq(0.5, 1.0, 2.5))
    val scaled = run(Seq(1.0, 2.0, 5.0))
    assert(frac == scaled, s"$frac vs $scaled")
    // and the ratio genuinely matters: equal weights rank differently
    assert(run(Seq(1.0, 1.0, 1.0)) != scaled)
  }

  test("simhash_dedup step collapses identical texts; priority_col elects") {
    import spark.implicits._
    val docs = Seq(
      (5L, 9L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, 1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (7L, 3L, "totally different words entirely here now for testing"))
      .toDF("doc_id", "pri", "text")
    val out = steps(Seq(Map("op" -> "simhash_dedup")))
      .head.apply(docs)
    assert(out.columns.toSeq == docs.columns.toSeq, "column-neutral")
    assert(out.collect().map(_.getLong(0)).toSet == Set(2L, 7L),
      "min-id keep")
    val byPri = steps(Seq(Map("op" -> "simhash_dedup",
      "priority_col" -> "pri")))
      .head.apply(docs)
    assert(byPri.collect().map(_.getLong(0)).toSet == Set(5L, 7L),
      "priority_col elects the max-priority copy")
  }

  test("cluster_assign step trains inline and appends the cell id") {
    import spark.implicits._
    val docs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f, 0f)), (4L, Array(0.1f, 0.9f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = steps(Seq(Map("op" -> "cluster_assign", "k" -> 2,
      "iters" -> 2, "id_col" -> "vec_id", "vec_col" -> "embedding")))
      .head.apply(docs)
    assert(out.columns.toSeq == Seq("vec_id", "embedding", "cluster_id"))
    val got = out.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == Map(1L -> 0, 3L -> 0, 2L -> 1, 4L -> 1),
      s"axis-aligned init separates the clusters: $got")
  }

  test("semantic_dedup method lsh keeps the min-id member per component") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", Array(1f, 0f, 0f, 0f)),
      (2L, "a", Array(0.99f, 0.01f, 0f, 0f)), // cosine ≈ 1 vs 1 → drops
      (3L, "b", Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "grp", "embedding")
    val out = steps(Seq(Map("op" -> "semantic_dedup", "method" -> "lsh",
      "id_col" -> "vec_id", "vec_col" -> "embedding",
      "threshold" -> 0.9)))
      .head.apply(docs)
    assert(out.columns.toSeq == docs.columns.toSeq, "column-neutral")
    assert(out.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // an unknown method is a parse-time named error
    val e = intercept[IllegalArgumentException](
      steps(Seq(Map("op" -> "semantic_dedup", "method" -> "zzz"))))
    assert(e.getMessage.contains("kmeans"))
  }

  test("gopher_gate filters but never changes the schema") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", "the and for are with his they this have from one had word"),
      (2L, "s", "x"))  // 1 token → fails min_tokens
      .toDF("doc_id", "source", "text")
    val out = steps(Seq(Map("op" -> "gopher_gate", "text_col" -> "text")))
      .head.apply(docs)
    assert(out.columns.toSeq == docs.columns.toSeq)
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("token_count + temperature_mix compose; budget=huge keeps all rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "one two three"), (2L, "a", "four five"),
      (3L, "b", "six")).toDF("doc_id", "source", "text")
    val chain = steps(Seq(
      Map("op" -> "token_count", "text_col" -> "text",
        "out_col" -> "n_tok", "drop_text" -> true),
      Map("op" -> "temperature_mix", "id_col" -> "doc_id",
        "group_col" -> "source", "tokens_col" -> "n_tok",
        "budget" -> 1000000L)))
    val out = chain.foldLeft(docs)((df, s) => s.apply(df))
    assert(out.columns.toSet == Set("doc_id", "source", "n_tok"))
    val byId = out.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tok")).toMap
    assert(byId == Map(1L -> 3, 2L -> 2, 3L -> 1),
      s"a budget far above the corpus keeps every row: $byId")
  }

  test("token_count tokenizer: bpe trains on the step input and counts") {
    import spark.implicits._
    // same corpus as BpeSpec's hand-computed case: after 10 merges
    // "aaaa" and "ab" are single tokens, OOV "aaa" segments to [aa, a]
    val docs = Seq(
      (1L, "aaaa ab aaaa"), (2L, "aaaa ab")).toDF("doc_id", "text")
    val out = steps(Seq(Map("op" -> "token_count", "text_col" -> "text",
      "out_col" -> "n_bpe", "tokenizer" -> "bpe", "merges" -> 10)))
      .head.apply(docs)
    val byId = out.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Int]("n_bpe")).toMap
    assert(byId == Map(1L -> 3, 2L -> 2), s"got: $byId")
    val err = intercept[IllegalArgumentException] {
      steps(Seq(Map("op" -> "token_count", "tokenizer" -> "nope")))
        .head.apply(docs)
    }
    assert(err.getMessage.contains("whitespace or bpe"))
  }

  test("normalize step: lowercase + collapse default, strip opt-in") {
    import spark.implicits._
    val docs = Seq((1L, "Hello,  WORLD  x")).toDF("doc_id", "text")
    val out = steps(Seq(Map("op" -> "normalize"))).head.apply(docs)
      .head().getString(1)
    assert(out === "hello, world x")
    val stripped = steps(Seq(Map("op" -> "normalize",
      "strip_punct" -> true))).head.apply(docs).head().getString(1)
    assert(stripped === "hello world x")
  }

  test("fuzzy_dedup step collapses near-identical strings, stays column-neutral") {
    import spark.implicits._
    val docs = Seq(
      (1L, "red bolt", "a"), (2L, "red bolts", "b"),
      (9L, "something else entirely", "c")).toDF("doc_id", "text", "src")
    val out = steps(Seq(Map("op" -> "fuzzy_dedup", "max_dist" -> 1)))
      .head.apply(docs)
    assert(out.columns.toSeq === docs.columns.toSeq)
    assert(out.collect().map(_.getLong(0)).toSet === Set(1L, 9L))
  }

  test("pii_mask step replaces the text column in place") {
    import spark.implicits._
    val docs = Seq(
      (1L, "write to jane.doe@example.com or call +1-555-0199123"),
      (2L, "no pii here")).toDF("doc_id", "text")
    val out = steps(Seq(Map("op" -> "pii_mask"))).head.apply(docs)
    assert(out.columns.toSeq === docs.columns.toSeq)
    val byId = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(1L) === "write to <EMAIL> or call <PHONE>")
    assert(byId(2L) === "no pii here")
  }

  test("language_filter keeps listed languages, schema-stable") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat is in the house and the dog", "x"),
      (2L, "der hund ist ein tier und das haus", "y"),
      (3L, "el gato que vive en la casa y los perros", "z"))
      .toDF("doc_id", "text", "src")
    val out = steps(Seq(Map("op" -> "language_filter",
      "langs" -> Seq("en", "de")))).head.apply(docs)
    assert(out.columns.toSeq === docs.columns.toSeq)
    assert(out.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    intercept[IllegalArgumentException] {
      steps(Seq(Map("op" -> "language_filter")))
    }
  }

  test("surprise_filter drops high-perplexity rows and unscorable rows") {
    import spark.implicits._
    // 'a b' repeated is maximally predictable; the scrambled doc is not
    val docs = Seq(
      (1L, "a b a b a b a b"), (2L, "a b a b a b a b"),
      (3L, "q z k w m t r v"), (4L, "solo"))
      .toDF("doc_id", "text")
    val scored = graft.ops.TextAnalysis.lmSurprise(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(1L) < scored(3L))
    val cut = (scored(1L) + scored(3L)) / 2
    val out = steps(Seq(Map("op" -> "surprise_filter",
      "max_surprise" -> cut))).head.apply(docs)
    // doc 4 has one token: unscorable, drops with the high-surprise doc
    assert(out.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("collapse_repeats step replaces text in place, schema-stable") {
    import spark.implicits._
    val docs = Seq((1L, "go go go stop stop", "s")).toDF("doc_id", "text", "src")
    val out = steps(Seq(Map("op" -> "collapse_repeats"))).head.apply(docs)
    assert(out.columns.toSeq === docs.columns.toSeq)
    assert(out.head().getString(1) === "go stop")
  }

  test("weighted_sample step keeps exactly k by priority, column-neutral") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, i.toDouble, s"t$i"))
      .toDF("doc_id", "wt", "text")
    val out = steps(Seq(Map("op" -> "weighted_sample",
      "weight_col" -> "wt", "k" -> 10))).head.apply(docs)
    assert(out.columns.toSeq === docs.columns.toSeq)
    assert(out.count() === 10)
    // matches the operator's own selection
    val direct = graft.ops.Sampling.weightedSample(
      docs.select("doc_id", "wt"), "doc_id", "wt", 10)
      .collect().map(_.getLong(0)).toSet
    assert(out.collect().map(_.getLong(0)).toSet === direct)
    intercept[IllegalArgumentException] {
      steps(Seq(Map("op" -> "weighted_sample", "weight_col" -> "wt")))
    }
  }

  test("span_gate step: distinct docs pass, shared-span docs drop") {
    import spark.implicits._
    val shared = "abcdefghijklmnopqrstuvwxyz0123456789"
    val docs = Seq(
      (1L, shared), (2L, shared), // identical => 100% dup span fraction
      (3L, "completely different material without overlap at all"))
      .toDF("doc_id", "text")
    val out = steps(Seq(Map("op" -> "span_gate"))).head.apply(docs)
    assert(out.columns.toSeq === docs.columns.toSeq)
    assert(out.collect().map(_.getLong(0)).toSet === Set(3L))
  }

  test("quality_classifier_filter: thresholds 0 and 1 bound the gate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the a of and to in is table scan row merge fast system"),
      (2L, "tiny words here")).toDF("doc_id", "text")
    def run(t: Double) = steps(Seq(Map(
      "op" -> "quality_classifier_filter", "id_col" -> "doc_id",
      "text_col" -> "text", "threshold" -> t))).head.apply(docs)
    val all = run(0.0)
    assert(all.columns.toSeq === docs.columns.toSeq)
    assert(all.count() === 2L, "fast sigmoid is always > 0")
    assert(run(1.0).count() === 0L, "and always < 1")
  }

  test("winsorize step replaces the value column, schema unchanged") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, "g", i)).toDF("id", "g", "v")
    val out = steps(Seq(Map("op" -> "winsorize", "group_col" -> "g",
      "value_col" -> "v", "lo_num" -> 10, "lo_den" -> 100,
      "hi_num" -> 90, "hi_den" -> 100))).head.apply(df)
    assert(out.columns.toSeq == df.columns.toSeq)
    val vs = out.collect().map(_.getLong(2))
    assert(vs.min == 10L && vs.max == 90L, s"clipped to [p10, p90]: ${vs.min}..${vs.max}")
  }

  test("minhash_dedup priority_col keeps the best copy, not the min id") {
    import spark.implicits._
    // identical long texts -> certain near-dups; doc 2 is the longest copy
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, t, 10L), (2L, t, 99L), (3L, t, 50L),
      (9L, "totally different words entirely here now", 7L))
      .toDF("doc_id", "text", "n_chars")
    val out = steps(Seq(Map("op" -> "minhash_dedup",
      "text_col" -> "text", "id_col" -> "doc_id",
      "priority_col" -> "n_chars")))
      .head.apply(docs)
    assert(out.columns.toSeq == docs.columns.toSeq)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 9L))
  }

  test("semantic_dedup step drops in-cell near-dups, stays column-neutral") {
    import spark.implicits._
    // one cell (nlist=1, iters=0): centroid = min-id vector; the pair
    // {1,2} collapses to the farther member (2), 3 survives alone
    val docs = Seq(
      (1L, "a", Array(1.0f, 0.0f)),
      (2L, "b", Array(0.99f, 0.01f)),
      (3L, "c", Array(0.0f, 1.0f)))
      .toDF("doc_id", "source", "embedding")
    val out = steps(Seq(Map("op" -> "semantic_dedup",
      "id_col" -> "doc_id", "vec_col" -> "embedding",
      "nlist" -> 1, "iters" -> 0, "threshold" -> 0.9)))
      .head.apply(docs)
    assert(out.columns.toSeq == docs.columns.toSeq)
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((2L, "b"), (3L, "c")))
  }

  test("dsir_select step keeps top_k target-like rows; config validated") {
    import spark.implicits._
    val docs = ((1L to 12L).map { i =>
      (i, if (i % 3 == 0) "tgt" else "oth",
        if (i % 3 == 0) "cat mat cat" else "dog log fog")
    }).toDF("doc_id", "grp", "text")
    val out = steps(Seq(Map("op" -> "dsir_select",
      "id_col" -> "doc_id", "text_col" -> "text",
      "target_where" -> "grp = 'tgt'", "top_k" -> 3, "buckets" -> 64)))
      .head.apply(docs)
    assert(out.columns.toSeq == docs.columns.toSeq)
    // the target slice IS the cat-phrased rows — top 3 by logw are all tgt
    assert(out.collect().map(_.getString(1)).forall(_ == "tgt"))
    assert(out.count() == 3)
    val e = intercept[IllegalArgumentException] {
      steps(Seq(Map("op" -> "dsir_select", "target_where" -> "1=1")))
    }
    assert(e.getMessage.contains("top_k") && e.getMessage.contains("min_logw"))
  }

  test("pack_sequences + shard steps append offsets/spans/shards") {
    import spark.implicits._
    val docs = Seq((1L, 3L), (2L, 0L), (3L, 5L), (4L, 2L))
      .toDF("doc_id", "n_tok")
    val chain = steps(Seq(
      Map("op" -> "pack_sequences", "id_col" -> "doc_id",
        "tokens_col" -> "n_tok", "seq_len" -> 4),
      Map("op" -> "shard", "id_col" -> "doc_id",
        "tokens_col" -> "n_tok", "budget" -> 8L)))
    val out = chain.foldLeft(docs) { (df, s) => s.apply(df) }
    assert(out.columns.toSeq == Seq("doc_id", "n_tok", "tok_start",
      "seq_first", "seq_last", "shard"))
    val rows = out.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // contributions 4,1,6,3 -> offsets 0,4,5,11; shard = excl. sum of
    // n_tok (0,3,3,8) div 8
    assert(rows.toSeq == Seq(
      (1L, 0L, 0L, 0L, 0L), (2L, 4L, 1L, 1L, 0L),
      (3L, 5L, 1L, 2L, 0L), (4L, 11L, 2L, 3L, 1L)))
    val e = intercept[IllegalArgumentException](
      steps(Seq(Map("op" -> "pack_sequences"))).head)
    assert(e.getMessage.contains("tokens_col"))
  }

  test("curriculum step appends band + interleave key, matches the op") {
    import spark.implicits._
    val docs = (1L to 8L).map(i => (i, i * 10.0, s"t$i"))
      .toDF("doc_id", "difficulty", "text")
    val out = steps(Seq(Map("op" -> "curriculum",
      "score_col" -> "difficulty", "bands" -> 4))).head.apply(docs)
    assert(out.columns.toSeq ===
      docs.columns.toSeq ++ Seq("band", "interleave_key"))
    val direct = graft.ops.Sampling.curriculumOrder(
      docs.select("doc_id", "difficulty"), "doc_id", "difficulty", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("interleave_key")).toMap
      === direct)
    intercept[IllegalArgumentException] {
      steps(Seq(Map("op" -> "curriculum")))
    }
  }

  test("pipeline audits parse, apply the op, and reject bad configs") {
    import spark.implicits._
    import graft.mat.PipelineAudits
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"))
      .toDF("doc_id", "source")
    val audits = PipelineAudits.parse(Some(Seq(
      Map("op" -> "profile", "columns" -> Seq("doc_id", "source")),
      Map("op" -> "k_anonymity", "columns" -> Seq("source"), "k" -> 3))))
    assert(audits.map(_.op) == Seq("profile", "k_anonymity"))
    val prof = audits.head.apply(docs)
    assert(prof.columns.toSeq == Seq("column", "n_rows", "n_nulls",
      "n_distinct", "min_value", "max_value"))
    assert(prof.count() == 2)
    val kan = audits(1).apply(docs).head()
    // groups a(2), b(1) vs k=3: both violate, all 3 rows at risk
    assert((kan.getLong(0), kan.getLong(2), kan.getLong(3)) ==
      ((3L, 2L, 3L)))
    // the robust-stats audits route to their ops
    val more = PipelineAudits.parse(Some(Seq(
      Map("op" -> "moments", "group_col" -> "source",
        "value_col" -> "doc_id"),
      Map("op" -> "gini", "group_col" -> "source",
        "value_col" -> "doc_id"))))
    assert(more.head.apply(docs).columns.toSeq ==
      Seq("source", "n", "mean", "variance", "skewness", "kurtosis"))
    assert(more(1).apply(docs).columns.toSeq ==
      Seq("source", "n", "gini"))
    val e = intercept[IllegalArgumentException](
      PipelineAudits.parse(Some(Seq(Map("op" -> "bogus")))))
    assert(e.getMessage.contains("bogus"))
    val e2 = intercept[IllegalArgumentException](
      PipelineAudits.parse(Some(Seq(Map("op" -> "profile")))))
    assert(e2.getMessage.contains("columns"))
  }

  test("duplicate audit ops get occurrence-indexed side relations") {
    import graft.mat.PipelineAudits
    val audits = PipelineAudits.parse(Some(Seq(
      Map("op" -> "k_anonymity", "columns" -> Seq("a")),
      Map("op" -> "profile", "columns" -> Seq("a")),
      Map("op" -> "k_anonymity", "columns" -> Seq("b")),
      Map("op" -> "k_anonymity", "columns" -> Seq("c")))))
    // first occurrence keeps the stable name; repeats are numbered, so
    // two same-op audits can never silently overwrite each other
    assert(PipelineAudits.relationSuffixes(audits) == Seq(
      "__audit_k_anonymity", "__audit_profile",
      "__audit_k_anonymity_2", "__audit_k_anonymity_3"))
  }

  test("text analysis audits route to their ops") {
    import spark.implicits._
    import graft.mat.PipelineAudits
    val docs = Seq((1L, "a", "the cat sat on the mat"),
      (2L, "a", "the cat sat"), (3L, "b", "dogs bark loud"))
      .toDF("doc_id", "source", "text")
    val audits = PipelineAudits.parse(Some(Seq(
      Map("op" -> "tfidf_terms", "group_col" -> "source", "k" -> 2),
      Map("op" -> "collocations", "min_count" -> 1, "k" -> 3),
      Map("op" -> "zipf", "group_col" -> "source"),
      Map("op" -> "dup_rate", "group_col" -> "source"))))
    assert(audits.head.apply(docs).columns.toSeq ==
      Seq("source", "term", "tfidf", "rank"))
    assert(audits(1).apply(docs).columns.toSeq ==
      Seq("w1", "w2", "n_pair", "pmi"))
    assert(audits(2).apply(docs).columns.toSeq ==
      Seq("source", "n_types", "zipf_slope", "intercept"))
    assert(audits.head.apply(docs).count() == 4) // 2 groups × k=2
    // dup_rate: no duplicated texts here → residual rate 0 per group
    val dr = audits(3).apply(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(dr == Set(("a", 2L, 0L), ("b", 1L, 0L)), dr.toString)
  }

  test("unknown op and missing required params raise named errors") {
    val e1 = intercept[IllegalArgumentException](
      steps(Seq(Map("op" -> "nope"))).head)
    assert(e1.getMessage.contains("nope") && e1.getMessage.contains("known"))
    val e2 = intercept[IllegalArgumentException](
      steps(Seq(Map("op" -> "temperature_mix"))).head)
    assert(e2.getMessage.contains("temperature_mix") &&
      e2.getMessage.contains("requires"))
    val e3 = intercept[IllegalArgumentException](
      PipelineSteps.parse(Some("not a list")))
    assert(e3.getMessage.contains("list"))
  }

  test("state_ttl parses ISO-8601 and rejects junk by name") {
    assert(StreamingTableMat.parseTtl(Map("state_ttl" -> "PT1H"))
      .contains(java.time.Duration.ofHours(1)))
    assert(StreamingTableMat.parseTtl(Map.empty).isEmpty)
    val e = intercept[IllegalArgumentException](
      StreamingTableMat.parseTtl(Map("state_ttl" -> "1 hour")))
    assert(e.getMessage.contains("ISO-8601"))
  }

  test("armed state_ttl reaches the op: inactive session expires and emits") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val cfg = Map[String, Any]("stream_op" -> "sessionize",
      "gap_minutes" -> "30", "state_ttl" -> "PT6S",
      "user_col" -> "user_id", "ts_col" -> "ts")
    val stream = mem.toDS().toDF("user_id", "ts")
    // the SAME buildStream the materialization runs, continuous mode
    val out = StreamingTableMat.buildStream(cfg, stream, stream, armTtl = true)
    val q = out.writeStream.format("memory").queryName("mat_ttl_sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("150 milliseconds"))
      .start()
    try {
      def rows() = spark.table("mat_ttl_sessions")
        .selectExpr("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      mem.addData((7L, 1000L), (7L, 2000L))
      // armed TTL (PT6S) expires the inactive key: its open tail session
      // emits — the continuous-deployment behavior the config enables
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline && rows().isEmpty)
        Thread.sleep(100)
      assert(rows() == Seq((7L, 2L)),
        s"expired key must emit its 2-event tail session: ${rows()}")
    } finally q.stop()
  }

  test("bounded build never arms the TTL (AvailableNow must terminate)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val cfg = Map[String, Any]("stream_op" -> "sessionize",
      "state_ttl" -> "PT1S")
    val stream = mem.toDS().toDF("user_id", "ts")
    val out = StreamingTableMat.buildStream(cfg, stream, stream, armTtl = false)
    mem.addData((1L, 0L), (1L, 10000000000L)) // >30 min apart → 1 closed
    val q = out.writeStream.format("memory").queryName("mat_nottl_sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // with NoTimeout this terminates; an armed TTL would loop forever
    assert(q.awaitTermination(60000), "AvailableNow must terminate")
    val n = spark.table("mat_nottl_sessions").count()
    assert(n == 1, s"one closed session, open tail unemitted: $n")
  }

  test("stream_op media_dedup: first class occurrence wins across " +
      "micro-batches (min id within a batch); undecodable payloads " +
      "always pass; unknown method refused by name") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.Multimodal
    val bodyA = "the first shared body".getBytes("UTF-8")
    val bodyB = "a different second body".getBytes("UTF-8")
    val bodyC = "novel third body, batch two".getBytes("UTF-8")
    def grft(b: Array[Byte]) = Multimodal.StubCodec.encode(8, 8, 1, b)
    val junk = Array[Byte](9, 9, 9, 9) // fails the container sniff
    val mem = MemoryStream[(Long, Array[Byte])]
    val cfg = Map[String, Any]("stream_op" -> "media_dedup",
      "method" -> "exact", "id_col" -> "doc_id",
      "payload_col" -> "payload")
    val stream = mem.toDS().toDF("doc_id", "payload")
    val out = StreamingTableMat.buildStream(cfg, stream, stream,
      armTtl = false)
    val q = out.writeStream.format("memory").queryName("mat_media_dedup")
      .outputMode("append").start()
    try {
      // output is COLUMN-NEUTRAL like the batch step: the kept rows
      // carry every original column, not a bare id list
      assert(spark.table("mat_media_dedup").schema.fieldNames.toSeq
        == Seq("doc_id", "payload"))
      def got() = spark.table("mat_media_dedup")
        .collect().map(_.getLong(0)).toSet
      // batch 1: 1≈2 dup (min id 1 kept), 3 distinct, 4 undecodable
      mem.addData((2L, grft(bodyA)), (1L, grft(bodyA)),
        (3L, grft(bodyB)), (4L, junk))
      q.processAllAvailable()
      assert(got() == Set(1L, 3L, 4L), got())
      // the kept row for the in-batch dup class is id 1's, payload intact
      val keptA = spark.table("mat_media_dedup")
        .collect().find(_.getLong(0) == 1L).get
      assert(keptA.getAs[Array[Byte]](1).sameElements(grft(bodyA)))
      // batch 2: 10 re-delivers a SETTLED body (drops against state),
      // 11 is novel, 12 undecodable (always passes, even repeated)
      mem.addData((10L, grft(bodyA)), (11L, grft(bodyC)), (12L, junk))
      q.processAllAvailable()
      assert(got() == Set(1L, 3L, 4L, 11L, 12L), got())
    } finally q.stop()
    val e = intercept[IllegalArgumentException](
      StreamingTableMat.buildStream(
        Map[String, Any]("stream_op" -> "media_dedup",
          "method" -> "nope"), stream, stream, armTtl = false)
        .queryExecution.analyzed)
    assert(e.getMessage.contains("phash|audio|exact"), e.getMessage)
    // a non-integral id is refused by name, never silently null-cast
    val strIdStream = mem.toDS().toDF("doc_id", "payload")
      .withColumn("doc_id",
        org.apache.spark.sql.functions.col("doc_id").cast("string"))
    val e2 = intercept[IllegalArgumentException](
      StreamingTableMat.buildStream(cfg, strIdStream, strIdStream,
        armTtl = false))
    assert(e2.getMessage.contains("integral"), e2.getMessage)
    assert(e2.getMessage.contains("string"), e2.getMessage)
  }

  test("stream_op media_dedup armed state_ttl: an expired class frees " +
      "its state so a late re-arrival re-emits; in-horizon dups stay " +
      "suppressed") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.Multimodal
    val bodyA = "ttl shared media body".getBytes("UTF-8")
    def grft(b: Array[Byte]) = Multimodal.StubCodec.encode(8, 8, 1, b)
    val mem = MemoryStream[(Long, Array[Byte])]
    val cfg = Map[String, Any]("stream_op" -> "media_dedup",
      "method" -> "exact", "state_ttl" -> "PT6S")
    val stream = mem.toDS().toDF("doc_id", "payload")
    val out = StreamingTableMat.buildStream(cfg, stream, stream,
      armTtl = true)
    val q = out.writeStream.format("memory").queryName("mat_media_ttl")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("150 milliseconds"))
      .start()
    try {
      def got() = spark.table("mat_media_ttl")
        .collect().map(_.getLong(0)).toSet
      def awaitIds(want: Set[Long]): Unit = {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (System.nanoTime() < deadline && got() != want)
          Thread.sleep(100)
      }
      mem.addData((1L, grft(bodyA)))
      awaitIds(Set(1L))
      assert(got() == Set(1L), got())
      // in-horizon duplicate: suppressed (and its arrival re-arms)
      mem.addData((2L, grft(bodyA)))
      Thread.sleep(1500)
      assert(got() == Set(1L), s"in-horizon dup must stay suppressed: ${got()}")
      // past the 6 s horizon the class state expires; a late
      // re-arrival starts fresh and re-emits — the documented
      // bounded-state trade of every stream twin
      Thread.sleep(8000)
      mem.addData((3L, grft(bodyA)))
      awaitIds(Set(1L, 3L))
      assert(got() == Set(1L, 3L),
        s"post-horizon re-arrival must re-emit: ${got()}")
    } finally q.stop()
  }

  test("stream_op curate: micro-batches run as incremental index " +
      "batches; a full re-replay appends nothing; contracts are named") {
    import spark.implicits._
    import graft.adapter.SparkAdapter
    import graft.core.{Node, NodeConfig, NodeKind, Relation}
    import graft.mat.MatContext
    val loc = java.nio.file.Files.createTempDirectory("graft_curate_spec")
      .toString
    spark.sql("DROP DATABASE IF EXISTS g_curate_spec CASCADE")
    val a = new SparkAdapter(spark, "g_curate_spec", Some(loc))
    val rel = Relation("g_curate_spec", "cur")
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    val t2 = "completely different body for the second arrival slice here"
    // arrival slice 1 (low ids): 1≈2 exact dup; slice 2 (high ids):
    // 10 repeats a SETTLED text from slice 1 and must drop against the
    // hash index built by the earlier micro-batch
    val docs = Seq((1L, t1), (2L, t1), (3L, t2),
      (10L, t1), (11L, "novel content arriving only in slice two"))
      .toDF("doc_id", "text")
    def cfg(extra: (String, Any)*) = NodeConfig(
      materialized = "streaming_table",
      extra = Map[String, Any](
        "stream_op" -> "curate", "arrival_col" -> "doc_id",
        "stream_batches" -> 2,
        "steps" -> Vector(Map[String, Any]("op" -> "exact_dedup",
          "id_col" -> "doc_id"))) ++ extra.toMap)
    def run(c: NodeConfig) = graft.mat.StreamingTableMat.run(MatContext(a,
      Node(uniqueId = "model.spec.cur", name = "cur",
        packageName = "spec", kind = NodeKind.Model, config = c),
      rel, () => docs))
    val r1 = run(cfg())
    assert(r1.message.contains("2 micro-batches"), r1.message)
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 11L),
      "10 must drop against the state the FIRST micro-batch settled")
    assert(a.relationExists(Relation("g_curate_spec",
      "cur__state_exact_dedup")), "the index persists across micro-batches")
    // full re-replay: everything settled, nothing appends
    run(cfg())
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 11L), "re-replay appended rows")
    // contracts
    val e1 = intercept[IllegalArgumentException](
      run(cfg("steps" -> Vector.empty[Map[String, Any]])))
    assert(e1.getMessage.contains("steps"))
    val e2 = intercept[IllegalArgumentException](run(NodeConfig(
      materialized = "streaming_table",
      extra = Map[String, Any]("stream_op" -> "curate",
        "steps" -> Vector(Map[String, Any]("op" -> "exact_dedup"))))))
    assert(e2.getMessage.contains("arrival_col"))

    // an all-empty staged input (--empty dry run / empty source) must
    // still build the target SCHEMA-ONLY — success with no table is a
    // lie downstream reads expose as table-not-found
    val relE = Relation("g_curate_spec", "cur_empty")
    graft.mat.StreamingTableMat.run(MatContext(a,
      Node(uniqueId = "model.spec.cur_empty", name = "cur_empty",
        packageName = "spec", kind = NodeKind.Model, config = cfg()),
      relE, () => docs.limit(0)))
    assert(a.relationExists(relE), "empty replay must still create the target")
    assert(a.read(relE).count() == 0)
    assert(a.read(relE).schema.fieldNames.toSeq == Seq("doc_id", "text"))

    // a bare gate chain (no index-backed dedup) without unique_key has
    // no idempotence story: named error
    val gateOnly = Vector(Map[String, Any]("op" -> "token_count",
      "text_col" -> "text"))
    val e3 = intercept[IllegalArgumentException](run(NodeConfig(
      materialized = "streaming_table",
      extra = Map[String, Any]("stream_op" -> "curate",
        "arrival_col" -> "doc_id", "steps" -> gateOnly))))
    assert(e3.getMessage.contains("unique_key"), e3.getMessage)
    // WITH unique_key: replay-idempotent via the target-key anti-join
    val relG = Relation("g_curate_spec", "cur_gates")
    def runGates() = graft.mat.StreamingTableMat.run(MatContext(a,
      Node(uniqueId = "model.spec.cur_gates", name = "cur_gates",
        packageName = "spec", kind = NodeKind.Model,
        config = NodeConfig(materialized = "streaming_table",
          uniqueKey = Seq("doc_id"),
          extra = Map[String, Any]("stream_op" -> "curate",
            "arrival_col" -> "doc_id", "stream_batches" -> 2,
            "steps" -> gateOnly))),
      relG, () => docs))
    runGates()
    val n1 = a.read(relG).count()
    assert(n1 == 5, s"all 5 rows pass the gate chain: $n1")
    runGates() // full re-replay: every key already in the target
    assert(a.read(relG).count() == n1, "re-replay duplicated rows")

    // --full-refresh rebuilds from scratch (the recovery checkParams
    // errors prescribe must actually work for curate models)
    graft.mat.StreamingTableMat.run(MatContext(a,
      Node(uniqueId = "model.spec.cur", name = "cur",
        packageName = "spec", kind = NodeKind.Model, config = cfg()),
      rel, () => docs, fullRefresh = true))
    assert(a.read(rel).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 11L), "--full-refresh rebuild converges to the same set")
  }
  test("--empty builds an incremental TRAINER pipeline schema-only: " +
      "zero rows, full schema, success status (the CI dry-run shape)") {
    import spark.implicits._
    import java.nio.file.Files
    def write(dir: java.nio.file.Path, rel: String, content: String): Unit = {
      val p = dir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    val proj = Files.createTempDirectory("graft_emptypipe")
    val dataDir = Files.createTempDirectory("graft_emptypipe_src")
    Seq((1L, "alpha beta gamma delta", 10L), (2L, "epsilon zeta eta theta", 20L))
      .toDF("doc_id", "text", "n_chars").coalesce(1)
      .write.mode("overwrite").parquet(s"$dataDir/docs.parquet")
    write(proj, "dbt_project.yml", "name: ep\nmodel-paths: [\"models\"]\n")
    write(proj, "models/sources.yml",
      s"""version: 2
         |sources:
         |  - name: lake
         |    tables:
         |      - name: docs
         |        external:
         |          location: "$dataDir/docs.parquet"
         |""".stripMargin)
    write(proj, "models/cur.sql",
      "select doc_id, text, n_chars from {{ source('lake', 'docs') }}\n")
    write(proj, "models/schema.yml",
      """version: 2
        |models:
        |  - name: cur
        |    config:
        |      materialized: pipeline
        |      incremental: true
        |      steps:
        |        - op: exact_dedup
        |          text_col: text
        |        - op: surprise_filter
        |          text_col: text
        |          id_col: doc_id
        |          max_surprise: 6.0
        |        - op: winsorize
        |          group_col: text
        |          value_col: n_chars
        |          lo_num: 1
        |          lo_den: 10
        |          hi_num: 9
        |          hi_den: 10
        |""".stripMargin)
    val schema = "g_emptypipe"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val loc = Files.createTempDirectory("ep_wh").toString
    def runWith(empty: Boolean, fullRefresh: Boolean = false) = {
      val r = new graft.run.Runner(spark,
        graft.project.ProjectLoader.load(proj.toString),
        targetSchema = schema, emptyMode = empty,
        warehouseLocation = Some(loc))
      r.run(fullRefresh = fullRefresh)
    }
    val results = runWith(empty = true)
    assert(results.forall(_.status == "success"), results.mkString(" | "))
    assert(spark.table(s"$schema.cur").count() == 0,
      "--empty must build zero rows")
    assert(spark.table(s"$schema.cur").schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "n_chars"),
      "--empty must still produce the full schema")
    // a SECOND --empty run stays green (consistent dry runs)
    assert(runWith(empty = true).forall(_.status == "success"))
    // but a REAL incremental run must not silently score under the
    // empty-trained artifacts (empty LM counts / quantile bands) —
    // loud error naming the --empty provenance
    val real = runWith(empty = false)
    val bad = real.find(_.status == "error")
    assert(bad.exists(_.message.contains("--empty")),
      s"real run over empty-trained artifacts must fail loudly: $real")
    // --full-refresh retrains on real data and recovers
    val recovered = runWith(empty = false, fullRefresh = true)
    assert(recovered.forall(_.status == "success"), recovered.mkString(" | "))
    assert(spark.table(s"$schema.cur").count() > 0)
  }
}
