package graft

import graft.adapter.SparkAdapter
import graft.core._
import graft.mat.{MatContext, PipelineMat, StreamingTableMat}
import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.Files

/** Write-path scale-growth rehearsal: the empirical claim behind every
  * "scales to 100 TB" cell is that an incremental batch's cost grows
  * with the BATCH, not with the corpus the index already holds. This
  * main measures it directly for every persisted-index family:
  *
  *   for corpus ∈ {1×, 10×}:      (deterministic seeded generator)
  *     full build over the corpus  (timed, context)
  *     ONE incremental batch of a FIXED size and FIXED content (timed)
  *
  * and prints one JSON line with per-family build/batch seconds and the
  * batch_10x/batch_1x ratio. A family whose ratio tracks the corpus
  * multiplier has a corpus-sized term on its batch path — a finding.
  * Ratios near 1 are the evidence that history is touched only through
  * narrow, pruned index scans.
  *
  * Env knobs: SPARK_GRAFT_GROWTH_BASE (1× corpus docs, default 12000),
  * SPARK_GRAFT_GROWTH_MULT (default 10), SPARK_GRAFT_GROWTH_BATCH
  * (batch docs, default 2000), SPARK_GRAFT_CPUS (default 32). */
object BenchGrowth {

  private val vocab: Vector[String] =
    (0 until 400).map(i => s"w$i").toVector

  private def sentence(rnd: scala.util.Random, len: Int): String =
    Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")

  /** The shared hot pool: texts/vectors both corpora contain, so the
    * batch's dup-of-settled fraction hits settled state at BOTH scales. */
  private def hotTexts: Vector[String] = {
    val rnd = new scala.util.Random(7)
    Vector.fill(500)(sentence(rnd, 12))
  }

  private def hotVecs: Vector[Array[Float]] = {
    val rnd = new scala.util.Random(7)
    Vector.fill(500)(Array.fill(32)((rnd.nextDouble() - 0.5).toFloat))
  }

  /** n docs starting at idStart: 10% draws from the hot pool (dup
    * classes), 90% unique sentences. Seed pins the content. */
  private def texts(n: Int, idStart: Long, seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val hot = hotTexts
    (0 until n).map { i =>
      val t =
        if (rnd.nextInt(10) == 0) hot(rnd.nextInt(hot.length))
        else sentence(rnd, 12 + rnd.nextInt(5))
      (idStart + i, t)
    }
  }

  private def vecs(n: Int, idStart: Long, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    val hot = hotVecs
    (0 until n).map { i =>
      val v =
        if (rnd.nextInt(10) == 0)
          hot(rnd.nextInt(hot.length))
            .map(x => x + (rnd.nextDouble() - 0.5).toFloat * 0.01f)
        else Array.fill(32)((rnd.nextDouble() - 0.5).toFloat)
      (idStart + i, v)
    }
  }

  /** Short surface strings for the fuzzy family (typos of a hot pool).
    * Words are random LETTER strings, not the `wNNN` vocab: character
    * q-grams drive Ed-Join's prefix filter, and a digit-heavy vocab
    * collapses the gram space so every prefix bucket holds a large
    * fraction of the corpus (the quadratic generator artifact that
    * OOM'd the first run — real surface forms are frequency-skewed). */
  private def titleWord(rnd: scala.util.Random): String =
    Seq.fill(5 + rnd.nextInt(5))(('a' + rnd.nextInt(26)).toChar).mkString
  private def titles(n: Int, idStart: Long, seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val hotR = new scala.util.Random(7)
    val hot = Vector.fill(500)(
      Seq.fill(3)(titleWord(hotR)).mkString(" "))
    (0 until n).map { i =>
      val t =
        if (rnd.nextInt(10) == 0) hot(rnd.nextInt(hot.length))
        else Seq.fill(3)(titleWord(rnd)).mkString(" ")
      (idStart + i, t)
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = sys.env.getOrElse("SPARK_GRAFT_GROWTH_BASE", "12000").toInt
    val mult = sys.env.getOrElse("SPARK_GRAFT_GROWTH_MULT", "10").toInt
    val batchN = sys.env.getOrElse("SPARK_GRAFT_GROWTH_BATCH", "2000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def runPipeline(a: SparkAdapter, rel: Relation,
        steps: Seq[Map[String, Any]], df: DataFrame): Unit =
      PipelineMat.run(MatContext(a,
        Node(uniqueId = s"model.bench.${rel.identifier}",
          name = rel.identifier, packageName = "bench",
          kind = NodeKind.Model,
          config = NodeConfig(materialized = "pipeline", extra = Map(
            "steps" -> steps.toVector, "incremental" -> "true"))),
        rel, () => df))

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // locale-safe fixed-point for the machine-parsed JSON line: the f
    // interpolator formats %f with the JVM DEFAULT locale (de_DE
    // renders decimal COMMAS, corrupting the array arities); round +
    // Double.toString is locale-independent. stderr progress lines keep
    // %f — they are for humans.
    def j2(x: Double): String = (math.round(x * 100) / 100.0).toString
    def j1(x: Double): String = (math.round(x * 10) / 10.0).toString

    // family name → (steps, corpus generator, batch generator)
    type Gen = (Int, Long, Int) => DataFrame
    val textGen: Gen = (n, s, seed) => texts(n, s, seed).toDF("doc_id", "text")
    val vecGen: Gen = (n, s, seed) => vecs(n, s, seed).toDF("vec_id", "embedding")
    val titleGen: Gen = (n, s, seed) => titles(n, s, seed).toDF("doc_id", "title")
    val mediaGen: Gen = (n, s, seed) =>
      Multimodal.syntheticMedia(texts(n, s, seed).toDF("doc_id", "text"))
    def step(op: String, extra: (String, Any)*): Seq[Map[String, Any]] =
      Seq(Map[String, Any]("op" -> op) ++ extra.toMap)
    val families: Seq[(String, Seq[Map[String, Any]], Gen)] = Seq(
      ("exact", step("exact_dedup"), textGen),
      ("minhash", step("minhash_dedup"), textGen),
      ("simhash", step("simhash_dedup"), textGen),
      // rows_per_band=16: UNIFORM random vectors are near-orthogonal, so
      // an 8-bit band sig puts ~0.4% of ALL pairs in shared buckets —
      // quadratic at 120k rows. 16 bits drops orthogonal collisions to
      // 2^-16 while ~1°-apart near-dups still collide in ~93% of bands.
      // (Real embedding corpora cluster; the default 8 fits those.)
      ("semantic", step("semantic_dedup", "method" -> "lsh",
        "id_col" -> "vec_id", "vec_col" -> "embedding",
        "bands" -> 8, "rows_per_band" -> 16), vecGen),
      ("ngram", step("ngram_dedup"), textGen),
      // q=3: trigrams (17.5k-slot gram space) keep prefix buckets
      // selective over uniform random letters; bigrams (676 slots) put
      // ~0.7% of a 120k corpus in EVERY bucket
      ("fuzzy", step("fuzzy_dedup", "str_col" -> "title", "q" -> 3),
        titleGen),
      ("media", step("media_dedup"), mediaGen),
      // frames: clip/re-mux containment through the sets-postings core
      // — the media twin of the ngram family's growth row
      ("frames", step("media_dedup", "method" -> "frames"), mediaGen),
      // audio: the envelope-spectrum fingerprint through the shared
      // simhash signature core — per-row decode+DCT is the map-side
      // cost, the persisted index the only state
      ("audio", step("media_dedup", "method" -> "audio"),
        (n, s, seed) => Multimodal.syntheticAudioWav(
          texts(n, s, seed).toDF("doc_id", "text"))))

    // comma-separated family filter for partial re-runs
    val famFilter = sys.env.get("SPARK_GRAFT_GROWTH_FAMILIES")
      .map(_.split(",").map(_.trim).toSet)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    families.filter(f => famFilter.forall(_.contains(f._1)))
      .foreach { case (fam, steps, gen) =>
      val times = Seq(1, mult).map { m =>
        val n = base * m
        val schema = s"g_growth_${fam}_$m"
        spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
        val a = new SparkAdapter(spark, schema,
          Some(Files.createTempDirectory(s"graft_growth_$fam").toString))
        val rel = Relation(schema, "corpus")
        val build = timed(runPipeline(a, rel, steps, gen(n, 0L, 11 + m)))
        // the batch is IDENTICAL content at both scales (fixed seed,
        // ids above any corpus) — only the index size differs
        val batch = timed(runPipeline(a, rel, steps,
          gen(batchN, 10000000L, 99)))
        System.err.println(
          f"[growth] $fam%-9s ${m}x: corpus=$n%7d build=$build%7.2fs batch($batchN)=$batch%6.2fs")
        spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
        (build, batch)
      }
      val Seq((b1, t1), (bM, tM)) = times
      out(fam) = s"""{"build_1x":${j2(b1)},"batch_1x":${j2(t1)},""" +
        s""""build_${mult}x":${j2(bM)},"batch_${mult}x":${j2(tM)},""" +
        s""""batch_ratio":${j2(tM / t1)}}"""
    }
    // ---- windowed (microbatch × incremental pipeline) row ----------------
    // The composed window loop adds two costs the per-family batch rows
    // don't measure: the target-slice unique_key anti-join (the
    // index-less idempotence guard reads the target's OWN window slice)
    // and the per-window input recompile/filter. Shape: a settled
    // minhash corpus over days 1-28 at 1× and 10×, then THREE separate
    // single-window runs (days 31-33, fixed batch content at both
    // scales, `now` advancing a day per run so each invocation is one
    // new window + the lookback reopen of the settled previous day) —
    // in the DEPLOYMENT shape: a DATE event-time column, the target
    // PARTITIONED by it (the window guard's slice read prunes to the
    // window's partitions; etBound keeps the predicate cast-free), and
    // the input narrowed per run the way a real model's
    // is_incremental() SELECT narrows it. The first, unpartitioned
    // full-input run of this rehearsal measured window ratios
    // 1.4-2.3× under a 10× corpus — the whole-target slice scan and
    // the full-input per-window rescan are exactly what this shape
    // removes. Per-WINDOW wall time near-flat across 1×→10× (modulo
    // the lookback reopen, whose slice is inherently
    // corpus-per-window-sized on the FIRST run after a gap) is the
    // evidence the window machinery touches history only through
    // pruned scans.
    if (famFilter.forall(_.contains("windowed"))) {
      // 1-based day index (day 31 = Jan 31, day 32 = Feb 1)
      def dayDate(d: Int) = java.sql.Date.valueOf(
        java.time.LocalDate.of(2025, 1, 1).plusDays(d - 1))
      def dayTs(d: Int) = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2025, 1, 1).plusDays(d - 1).atStartOfDay)
      def withDt(df: DataFrame, dayOfId: Long => Int): DataFrame = {
        val dayUdf = org.apache.spark.sql.functions.udf(
          (id: Long) => dayDate(dayOfId(id)))
        df.withColumn("dt", dayUdf($"doc_id"))
      }
      val wTimes = Seq(1, mult).map { m =>
        val n = base * m
        val schema = s"g_growth_windowed_$m"
        spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
        val a = new SparkAdapter(spark, schema,
          Some(Files.createTempDirectory("graft_growth_w").toString))
        val rel = Relation(schema, "corpus")
        val cfg = NodeConfig(materialized = "pipeline",
          uniqueKey = Seq("doc_id"), eventTime = Some("dt"),
          batchSize = Some(BatchSize.Day),
          begin = Some("2025-01-01 00:00:00"),
          partitionBy = Seq("dt"),
          extra = Map(
            "steps" -> Vector(Map[String, Any]("op" -> "minhash_dedup")),
            "incremental" -> "true"))
        def run(df: DataFrame, now: java.sql.Timestamp): Unit =
          PipelineMat.run(MatContext(a,
            Node(uniqueId = s"model.bench.${rel.identifier}",
              name = rel.identifier, packageName = "bench",
              kind = NodeKind.Model, config = cfg),
            rel, () => df, now = now))
        val corpus = withDt(textGen(n, 0L, 11 + m),
          id => 1 + (id % 28).toInt)
        val build = timed(run(corpus, dayTs(29)))
        // three windows, IDENTICAL content at both scales; the input of
        // window w is the is_incremental()-narrowed source — the
        // settled corpus's resume-adjacent tail plus the new files —
        // exactly what a real model's batch SELECT compiles to
        val winSecs = (0 until 3).map { w =>
          val batch = withDt(textGen(batchN, 10000000L * (w + 1), 99 + w),
            _ => 31 + w)
          val in = corpus.filter(
              $"dt" >= org.apache.spark.sql.functions.lit(dayDate(28)))
            .unionByName(batch)
          timed(run(in, dayTs(32 + w)))
        }
        System.err.println(f"[growth] windowed  ${m}x: corpus=$n%7d " +
          f"build=$build%7.2fs windows=" +
          winSecs.map(s => f"$s%5.2f").mkString("[", ",", "]s"))
        spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
        (build, winSecs)
      }
      val Seq((b1, w1), (bM, wM)) = wTimes
      val ratios = w1.zip(wM).map { case (a1, aM) => aM / a1 }
      out("windowed_minhash") =
        s"""{"build_1x":${j2(b1)},"build_${mult}x":${j2(bM)},""" +
          s""""windows_1x":[${w1.map(j2).mkString(",")}],""" +
          s""""windows_${mult}x":[${wM.map(j2).mkString(",")}],""" +
          s""""window_ratios":[${ratios.map(j2).mkString(",")}]}"""
    }

    // ---- shared durable-curate scaffolding -------------------------------
    // One landed file per named slice — the arriving-files lake shape
    // every durable-curate row drains (three rows share this; a landing
    // protocol change must happen in exactly one place).
    def landPart(landing: java.nio.file.Path, name: String,
        df: DataFrame): Unit = {
      val tmp = Files.createTempDirectory("graft_growth_land_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .filter(_.getName.startsWith("part-")).head
      java.nio.file.Files.move(part.toPath,
        landing.resolve(s"$name.parquet"))
    }
    // One durable-curate invocation over a (doc_id, text) landing dir:
    // exact-dedup chain + unique_key replay guard, row-specific knobs
    // via `extra`.
    def runCurate(a: SparkAdapter, rel: Relation,
        landing: java.nio.file.Path, cp: String, mfpt: Int,
        extra: (String, Any)*): Unit =
      StreamingTableMat.run(MatContext(a,
        Node(uniqueId = s"model.bench.${rel.identifier}",
          name = rel.identifier, packageName = "bench",
          kind = NodeKind.Model,
          config = NodeConfig(materialized = "streaming_table",
            uniqueKey = Seq("doc_id"),
            extra = Map[String, Any]("stream_op" -> "curate",
              "landing_dir" -> landing.toString, "checkpoint_dir" -> cp,
              "max_files_per_trigger" -> mfpt,
              "steps" -> Vector(Map[String, Any]("op" -> "exact_dedup",
                "id_col" -> "doc_id"))) ++ extra.toMap)),
        rel, () => spark.range(0)
          .selectExpr("id AS doc_id", "'x' AS text")))

    // ---- durable continuous-curation row --------------------------------
    // The per-batch claim for `stream_op: curate` + `landing_dir:`: a
    // micro-batch's cost is the batch plus NARROW probes (the persisted
    // exact-dedup index AND the bucketed unique-key replay guard under
    // the checkpoint) — never a target-sized scan per landed file. The
    // r15 shape scanned the full target key column per micro-batch; this
    // row is the regression fence for its replacement. Protocol: drain a
    // corpus file into a fresh durable checkpoint (the full build), then
    // land 3 FIXED-content batch files and time their drain at
    // max_files_per_trigger=1 (3 micro-batches, each paying seal + guard
    // + index batch). per_batch_10x / per_batch_1x near 1 under a 10×
    // settled corpus is the bounded-guard evidence.
    if (famFilter.forall(_.contains("durable_curate"))) {
      val cTimes = Seq(1, mult).map { m =>
        val n = base * m
        val schema = s"g_growth_curate_$m"
        spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
        val a = new SparkAdapter(spark, schema,
          Some(Files.createTempDirectory("graft_growth_cur").toString))
        val rel = Relation(schema, "corpus")
        val landing = Files.createTempDirectory("graft_growth_land")
        val cp = Files.createTempDirectory("graft_growth_cp")
          .resolve("cp").toString
        landPart(landing, "corpus", textGen(n, 0L, 11 + m))
        val build = timed(runCurate(a, rel, landing, cp, 100))
        (0 until 3).foreach(i =>
          landPart(landing, s"b$i", textGen(batchN, 10000000L * (i + 1), 99 + i)))
        val drain = timed(runCurate(a, rel, landing, cp, 1))
        System.err.println(
          f"[growth] durable_curate ${m}x: corpus=$n%7d build=$build%7.2fs " +
            f"drain(3x$batchN)=$drain%6.2fs per_batch=${drain / 3}%5.2fs")
        spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
        (build, drain / 3)
      }
      val Seq((cb1, cp1), (cbM, cpM)) = cTimes
      out("durable_curate") =
        s"""{"build_1x":${j2(cb1)},"per_batch_1x":${j2(cp1)},""" +
          s""""build_${mult}x":${j2(cbM)},"per_batch_${mult}x":${j2(cpM)},""" +
          s""""batch_ratio":${j2(cpM / cp1)}}"""
    }

    // ---- durable-curate DRAIN-LENGTH row ---------------------------------
    // The corpus axis is fenced above; this row fences the OTHER axis:
    // per-batch cost across a LONG drain at max_files_per_trigger=1,
    // through in-drain key-index compactions. The suspected growth terms
    // are the accreted per-seal index files (the guard's read lists the
    // index tree each batch) and the sealed log; compaction-by-
    // re-derivation is the designed relief, now triggered mid-drain from
    // an in-memory accrual estimate. Protocol: build once, land 24
    // fixed-content files, drain them in 3 invocations of 8 batches
    // each, and compare per-batch wall across the thirds — flat
    // (ratio ≈ 1 between the 2nd and 3rd thirds; the 1st pays the
    // one-time post-build catch-up seal) is the evidence.
    if (famFilter.forall(_.contains("durable_curate_drain"))) {
      val schema = "g_growth_curate_drain"
      spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
      val a = new SparkAdapter(spark, schema,
        Some(Files.createTempDirectory("graft_growth_curd").toString))
      val rel = Relation(schema, "corpus")
      val landing = Files.createTempDirectory("graft_growth_curd_land")
      val cp = Files.createTempDirectory("graft_growth_curd_cp")
        .resolve("cp").toString
      val perFile = math.max(100, batchN / 4)
      // key_index_compact_files 200: threshold chosen to force ~2
      // mid-drain compactions over the 24 seals (accrual ≈
      // touched-buckets per seal, ≤ B ≈ 16 at 500-key batches) — the
      // row must cross the boundary it fences; the default (16 seals'
      // accrual) would compact less often by design
      landPart(landing, "corpus", textGen(base, 0L, 23))
      val build = timed(runCurate(a, rel, landing, cp, 100,
        "key_index_compact_files" -> 200))
      (0 until 24).foreach(i =>
        landPart(landing, f"d$i%02d",
          textGen(perFile, 20000000L + i * 100000L, 301 + i)))
      val thirds = (0 until 3).map { _ =>
        timed(runCurate(a, rel, landing, cp, 1,
          "key_index_compact_files" -> 200,
          "max_batches_per_run" -> 8)) / 8
      }
      val ratio = thirds(2) / thirds(1)
      System.err.println(
        f"[growth] durable_curate_drain: build=$build%6.2fs per_batch=" +
          thirds.map(s => f"$s%5.2f").mkString("[", ",", "]s") +
          f" ratio(3rd/2nd)=$ratio%.2f")
      spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
      out("durable_curate_drain") =
        s"""{"build":${j2(build)},"per_batch_thirds":[${thirds
          .map(j2).mkString(",")}],""" +
          s""""drain_ratio":${j2(ratio)}}"""
    }

    // ---- durable-curate TARGET-compaction row ----------------------------
    // The drain row above bounds the INDEX's accrual; this row fences the
    // TARGET's: one parquet file per micro-batch forever, plus the seal's
    // per-batch inputFiles listing and the sealed-log size growing with
    // them. `target_compact_files:` is the opt-in relief (full target
    // rewrite under the held lock + key-index reset/re-derive). Protocol:
    // same 24-file drain in 3 invocations of 8, threshold sized so the
    // 2nd AND 3rd thirds each cross one compaction boundary — per-batch
    // ratio(3rd/2nd) ≈ 1 AND a final target file count at ~the compacted
    // floor (not 25) is the evidence that the rewrite amortizes and the
    // relief is real.
    if (famFilter.forall(_.contains("durable_curate_target_compact"))) {
      val schema = "g_growth_curate_tc"
      spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
      val a = new SparkAdapter(spark, schema,
        Some(Files.createTempDirectory("graft_growth_curtc").toString))
      val rel = Relation(schema, "corpus")
      val landing = Files.createTempDirectory("graft_growth_curtc_land")
      val cp = Files.createTempDirectory("graft_growth_curtc_cp")
        .resolve("cp").toString
      val perFile = math.max(100, batchN / 4)
      // target_compact_files 10 at ~1 appended file per batch →
      // compactions near batches 10 and 20: one in the 2nd third, one
      // in the 3rd — the ratio compares thirds of EQUAL compaction load
      landPart(landing, "corpus", textGen(base, 0L, 29))
      val build = timed(runCurate(a, rel, landing, cp, 100,
        "target_compact_files" -> 10))
      (0 until 24).foreach(i =>
        landPart(landing, f"t$i%02d",
          textGen(perFile, 40000000L + i * 100000L, 601 + i)))
      val thirds = (0 until 3).map { _ =>
        timed(runCurate(a, rel, landing, cp, 1,
          "target_compact_files" -> 10, "max_batches_per_run" -> 8)) / 8
      }
      val ratio = thirds(2) / thirds(1)
      val files = a.read(rel).inputFiles.length
      System.err.println(
        f"[growth] durable_curate_target_compact: build=$build%6.2fs " +
          "per_batch=" + thirds.map(s => f"$s%5.2f")
            .mkString("[", ",", "]s") +
          f" ratio(3rd/2nd)=$ratio%.2f target_files=$files")
      spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
      out("durable_curate_target_compact") =
        s"""{"build":${j2(build)},"per_batch_thirds":[${thirds
          .map(j2).mkString(",")}],""" +
          s""""drain_ratio":${j2(ratio)},"target_files":$files}"""
    }

    // ---- media payload-size throughput row ------------------------------
    // The growth rows above measure STATE growth on text-sized payloads;
    // real images are 10^5-10^6 bytes and pHash is O(pixels) per row, so
    // the media family's scale story is BANDWIDTH, not state. This row
    // measures map-side pHash throughput (MB/s through phashSignatures →
    // noop) at ~100 KB and ~1 MB per image on a pre-materialized cached
    // corpus (generation excluded from the clock). per_mb_ratio near 1
    // means cost per byte is flat across payload sizes — the decode +
    // box-filter stream is the whole cost, with no per-row or per-size
    // superlinear term.
    if (famFilter.forall(_.contains("media_payload"))) {
      val mkBody = org.apache.spark.sql.functions.udf { (id: Long, edge: Int) =>
        val body = new Array[Byte](edge * edge)
        var y = 0
        while (y < edge) {
          var x = 0
          while (x < edge) {
            // gradient + per-image phase: genuine low-frequency signal,
            // cheap to generate
            body(y * edge + x) =
              ((x * 255 / edge + y * 97 / edge + id * 13) & 0xff).toByte
            x += 1
          }
          y += 1
        }
        Multimodal.StubCodec.encode(edge, edge, 1, body)
      }
      // SAME total bytes at both sizes: what varies is payload size, so
      // a flat per-MB cost isolates "bandwidth, not per-row/state terms"
      val mTimes = Seq(("100KB", 316, 3000), ("1MB", 1000, 300))
        .map { case (label, edge, nImgs) =>
        val media = spark.range(0, nImgs, 1, cpus.toInt)
          .select($"id".as("doc_id"), org.apache.spark.sql.functions
            .lit("image").as("media_type"),
            mkBody($"id", org.apache.spark.sql.functions.lit(edge))
              .as("payload"))
          .cache()
        media.count() // materialize generation off the clock
        val totalMb = nImgs.toDouble * edge * edge / 1e6
        def once() = timed(Multimodal.phashSignatures(media)
          .write.format("noop").mode("overwrite").save())
        once() // warmup: JIT + codegen of the hash path, off the clock
        val sec = math.min(once(), once())
        media.unpersist()
        val mbs = totalMb / sec
        System.err.println(
          f"[growth] media_payload $label%-5s: ${totalMb}%7.1f MB in " +
            f"$sec%6.2fs = $mbs%7.1f MB/s")
        (label, sec, mbs)
      }
      val Seq((_, s1, t1), (_, s2, t2)) = mTimes
      out("media_payload") =
        s"""{"sec_100kb":${j2(s1)},"mb_per_s_100kb":${j1(t1)},""" +
          s""""sec_1mb":${j2(s2)},"mb_per_s_1mb":${j1(t2)},""" +
          s""""per_mb_ratio":${j2(t1 / t2)}}"""
    }

    val fams = out.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"write_growth","base_docs":$base,"mult":$mult,""" +
      s""""batch_docs":$batchN,"families":$fams}""")
    spark.stop()
  }
}
