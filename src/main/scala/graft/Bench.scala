package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line with per-query wall seconds.
  *
  * Methodology: a warmup query first (JIT + codegen + parquet footer
  * caches — the same tax any engine pays once per cluster, not per query),
  * then each headline query executed once through the `noop` sink so every
  * column is materialized (a bare count() would let Catalyst prune the
  * projection and under-measure).
  */
object Bench {
  /** Read-path + pipeline-op headliners. Engine-write materializations are
    * excluded on purpose: they measure temp-table DDL, not query speed. */
  val headline: Seq[String] = Seq(
    "q1_agg", "q3_topk", "q5_star_join", "q_brand_agg", "q_window_topn",
    "q_window_running", "q_distinct", "q_above_avg", "q_anti_join",
    "q_rollup", "q_dedup_minhash", "q_dedup_simhash", "q_dedup_exact",
    "q_dedup_components",
    "q_ann_bruteforce", "q_ann_lsh", "q_ann_ivf", "q_text_langid",
    "q_text_quality", "q_text_fingerprint",
    // round-6 event/curation operators
    "q_asof_join", "q_sessionize", "q_range_join", "q_text_linededup",
    "q_sketch_hll", "q_sketch_hh",
    // round-7 operators: PQ ANN, grouped HLL, temperature mixing, the
    // funnel now that its buffer bound defaults on (plan changed), the
    // Gopher gate, and the composed curation pipeline
    "q_ann_pq", "q_sketch_hll_group", "q_sample_mix_temp", "q_funnel",
    "q_text_gopher", "q_pipeline_curation", "q_text_chunks",
    "q_stats_quantiles", "q_dedup_spans",
    // round-8 operators: IVF+PQ (the coarse-pruned PQ probe — must come
    // in at-or-under q_ann_pq's time), the MAD outlier pass, and BM25
    // lexical retrieval (map-side tf + 1-row stats broadcast)
    "q_ann_ivfpq", "q_stats_mad", "q_text_bm25", "q_text_lm_surprise",
    "q_text_kl_drift", "q_stats_winsorize", "q_text_bpe",
    "q_classify_gate",
    // round-9 operators: concat-and-chunk packing (bucketed prefix sum)
    // and best-of-cluster dedup (argmax representative over the minhash
    // component graph)
    "q_pack_sequences", "q_pack_assemble", "q_dedup_best",
    // round-9 additions: Ed-Join fuzzy matching (prefix-gram blocking),
    // iterative PageRank (cached edge list, 5 joined iterations), and
    // the interval coverage union (two O(1)-state window passes)
    "q_fuzzy_join", "q_graph_pagerank", "q_ts_intervals",
    // round-9 late additions: CDC compaction (one window shuffle),
    // interval-overlap join (bucketed, canonical-bucket dedup), TF-IDF
    // keyword extraction (vocab-bounded joins + per-doc window), and
    // degree-oriented triangle counting (wedge join)
    "q_cdc_compact", "q_range_overlap", "q_text_tfidf",
    "q_graph_triangles")
  // q_dedup_embedding stays oracle-only: it is the deliberately-exact
  // decimal all-pairs baseline (O(N²·d) BigDecimal math) that verifies
  // the sub-quadratic embeddingNearDupsLsh scale path — benching it would
  // measure the oracle, not the engine.

  /** 1-minute load average, or 0.0 if /proc/loadavg is unreadable. */
  private def loadAvg1m(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => 0.0 }

  /** Timings on a contended box are artifacts, not measurements (r2: the
    * same harness recorded 984 s contended vs 28.7 s idle). Wait, bounded,
    * for the 1-min load to drop below the threshold before timing. */
  private def awaitIdle(threshold: Double = 2.0, maxWaitSec: Int = 300): Double = {
    var load = loadAvg1m()
    var waited = 0
    while (load >= threshold && waited < maxWaitSec) {
      System.err.println(f"[bench] load average $load%.2f >= $threshold%.1f — waiting for idle ($waited/$maxWaitSec s)")
      Thread.sleep(15000); waited += 15
      load = loadAvg1m()
    }
    if (load >= threshold)
      System.err.println(f"[bench] WARNING: still contended (load $load%.2f) after $maxWaitSec s — timings may be inflated")
    load
  }

  /** Fixed calibration workload: a pinned integer hash-agg + sort over
    * generated data — no parquet, no operator code, just raw
    * shuffle/codegen/CPU throughput. Timed at the start AND end of the
    * bench and emitted in the JSON (`calib_sec` / `calib_sec_end`), so
    * round-over-round query times can be normalized by box speed
    * (r7 lesson: an environment ~1.5× slower than r6's made untouched
    * code read as a +52% regression) and mid-run contention shows up as
    * end ≫ start even when the start-of-run idle gate passed. */
  private def calibration(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    spark.range(0L, 20000000L, 1L, 32)
      .selectExpr("id % 999983 AS k", "id")
      .groupBy("k").agg(sum("id").as("s"), count(lit(1)).as("n"))
      .orderBy(desc("s"))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val startLoad = awaitIdle()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogTuning.quietBenignWindowWarning()

    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warmup: pay whole-stage-codegen compilation and JIT once, off the
    // clock (mirrors a warm long-running cluster).
    exec("q1_agg")
    exec("q_window_topn")

    // local-dev subset filter (the driver never sets it): run only the
    // named queries, e.g. SPARK_GRAFT_BENCH_ONLY=q_ann_ivf,q_dedup_minhash
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty) // set-but-empty env must not filter out everything

    // calibration: one untimed JIT pass, then min-of-2 (same protocol as
    // the queries — the minimum discards whichever run a burst landed in).
    // Subset runs skip it: calib exists to normalize DRIVER round-over-
    // round comparisons, and a dev loop shouldn't pay ~8 s for it.
    // Samples are ALSO interleaved mid-run (one every ~10 queries, below):
    // endpoint-only calibration measured the box at two instants that can
    // both miss mid-run contention — r17's driver run read per-query
    // median 0.84 vs r16 (faster) yet total_per_calib 45.9 vs 37.6
    // ("slower") because its two calib anchors ran anomalously fast while
    // the queries saw load 12. The MEDIAN of the interleaved samples sees
    // the same box states the queries saw; `total_per_calib_median` is
    // the contention-robust comparator (BASELINE.md documents the
    // adjudication order).
    val calibSamples = scala.collection.mutable.ArrayBuffer[Double]()
    val calibStart: Option[Double] =
      if (only.nonEmpty) None
      else {
        calibration(spark)
        calibSamples += calibration(spark)
        calibSamples += calibration(spark)
        Some(calibSamples.min)
      }
    var sinceCalib = 0
    def interleaveCalib(): Unit = if (only.isEmpty) {
      sinceCalib += 1
      if (sinceCalib >= 10) {
        sinceCalib = 0
        val c = calibration(spark)
        calibSamples += c
        System.err.println(f"[bench] calib sample $c%6.2f s")
      }
    }

    // per-query Spark-JOB counts (additive `jobs` JSON field): at sf0.1
    // most queries are job-latency-bound, so the job count — not the
    // seconds — is the signal a plan-shape change actually moves. Each
    // query runs under its own job group; the status tracker then counts
    // that group's jobs (recorded on pass 1 — counts are plan-determined
    // and pass-invariant modulo AQE ±1).
    val jobCounts = scala.collection.mutable.LinkedHashMap[String, Int]()

    // named non-headline queries are benchable locally too (one-off
    // measurements of oracle-only ops); driver runs keep the headline set
    def pass(passId: Int): Seq[(String, Double)] =
      (headline ++ only.toSeq.sorted.filterNot(headline.contains))
        .filter(SparkEntry.queries.contains)
        .filter(n => only.isEmpty || only(n)).map { name =>
        val group = s"bench-p$passId-$name"
        spark.sparkContext.setJobGroup(group, name)
        val t0 = System.nanoTime()
        try exec(name)
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val secs = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.clearJobGroup()
        if (passId == 1) jobCounts(name) =
          spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
        System.err.println(f"[bench] $name%-24s $secs%8.2f s")
        // operators cache intermediates (spread/signature reuse); drop them
        // between queries so later timings don't pay eviction/GC pressure
        spark.catalog.clearCache()
        interleaveCalib()
        name -> secs
      }

    // Two passes, per-query minimum: the start-of-run idle gate can't see
    // contention that begins mid-run (r3: a concurrent oracle process
    // inflated q_ann_bruteforce 2.7 s → 63 s); min-of-2 discards whichever
    // pass a burst landed in, and the second pass is fully warm anyway.
    val p1 = pass(1)
    System.err.println("[bench] --- pass 2 ---")
    val p2 = pass(2).toMap
    // queries whose two passes still disagree badly (>40%) get a THIRD
    // run: with pass-to-pass swings of 2–3× on a contended box (r7),
    // min-of-2 can retain a burst that hit BOTH passes of one query
    val noisy = p1.filter { case (k, v) =>
      math.abs(v - p2(k)) / math.min(v, p2(k)) > 0.4 }.map(_._1)
    val p3: Map[String, Double] =
      if (noisy.isEmpty) Map.empty
      else {
        System.err.println(s"[bench] --- pass 3 (noisy: ${noisy.mkString(",")}) ---")
        noisy.map { name =>
          val t0 = System.nanoTime()
          try exec(name)
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}") }
          spark.catalog.clearCache()
          name -> (System.nanoTime() - t0) / 1e9
        }.toMap
      }
    val results = p1.map { case (k, v) =>
      k -> math.min(math.min(v, p2(k)), p3.getOrElse(k, Double.MaxValue)) }
    val calibEnd: Option[Double] =
      if (only.nonEmpty) None
      else {
        val a = calibration(spark)
        val b = calibration(spark)
        calibSamples += a
        calibSamples += b
        Some(math.min(a, b))
      }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val endLoad = loadAvg1m()
    // subset (dev-loop) runs skip calibration — OMIT the fields rather
    // than emit 0.0, so a normalizing consumer can't divide by zero
    // alongside the raw total, a BOX-NORMALIZED total: raw seconds
    // divided by the mean of the two calibration timings (the pinned
    // hash-agg+sort workload, same protocol as the queries). Round-over-
    // round, the normalized number moves only when PLANS change — a
    // slower/contended box inflates raw and calib together (r15: a 46%
    // phantom raw regression cost a full two-commit bisection to refute;
    // its calib had degraded 2.27→3.52 in the same run).
    val calibJson = (calibStart, calibEnd) match {
      case (Some(a), Some(b)) =>
        val norm = total / ((a + b) / 2.0)
        // median of ALL samples (endpoints + one per ~10 queries): the
        // denominator then reflects the box states the queries actually
        // ran under, not just the two instants at the edges
        val sorted = calibSamples.sorted
        val med =
          if (sorted.size % 2 == 1) sorted(sorted.size / 2)
          else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0
        val normMed = total / med
        // Double.toString, never the f interpolator: %f is
        // default-locale-sensitive (de_DE renders "8,412") and this
        // line is machine-parsed JSON
        s""","calib_sec":$a,"calib_sec_end":$b""" +
          s""","calib_samples":[${calibSamples
            .map(c => (math.round(c * 1000) / 1000.0).toString)
            .mkString(",")}]""" +
          s""","total_per_calib":$norm,"total_per_calib_median":$normMed"""
      case _ => ""
    }
    val jobsJson = jobCounts.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"jobs":$jobsJson,"sf":"$sfDir"$calibJson,"noisy_requeried":${noisy.size},"loadavg_start":$startLoad,"loadavg_end":$endLoad}""")
    spark.stop()
  }
}
