package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parallelism spot-bench at a LARGER scale factor than the driver's
  * sf0.1 headline bench.
  *
  * Why it exists: at sf0.1 every headline query is job-latency-bound —
  * the round-18 scaling block measured 8 cores BEATING 32 across the
  * board — so the headline bench can verify plan-shape wins but cannot
  * see §2 parallelism wins or serial-driver regressions. This main
  * deterministically scales the sf0.1 inputs ×K (default 10, ≈ sf1)
  * into a scratch directory once, then times a spot set of the most
  * expensive shuffle-heavy queries under the SAME contract as
  * [[Bench]]: master local[$SPARK_GRAFT_CPUS], noop sink, min-of-2
  * passes, ONE JSON line. Run it at 32 and at 8 cores and compare.
  *
  * The scale-up is INPUT generation, not result caching: the scaled
  * parquet is a derived test dataset (copy 0 is the original data;
  * copies 1..K−1 shift every join key by a copy-sized base so fan-ins
  * are preserved), and every bench invocation still computes its
  * queries from parquet. Near-dup structure is preserved WITHIN a copy
  * and destroyed ACROSS copies on purpose — duplicated corpora would
  * otherwise turn every dedup query quadratic in K:
  *   - document text: every token is prefixed with a per-copy tag, so
  *     cross-copy shingles/grams never collide while within-copy
  *     token-equality structure is untouched;
  *   - customer names: a 4-char per-copy prefix puts every cross-copy
  *     pair ≥ 4 edits apart (the fuzzy join's band is 1–2);
  *   - embeddings: a per-(copy, dim) deterministic ±1 sign flip —
  *     within-copy dot products are EXACTLY preserved (signs square
  *     away), cross-copy cosines collapse toward 0.
  * nation/region/events pass through unscaled (dimensions).
  *
  * Env: SPARK_GRAFT_SF_DIR (source, default /root/testdata/sf0.1),
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_SPOT_DIR (scaled-data location,
  * default /root/testdata_scaled/sf1), SPARK_GRAFT_SPOT_K (default 10).
  */
object BenchSpot {

  /** The expensive, shuffle-heavy spot set (top of the r18/r19 bench). */
  val spot: Seq[String] = Seq(
    "q1_agg", "q5_star_join", "q_dedup_minhash", "q_dedup_components",
    "q_dedup_best", "q_fuzzy_join", "q_graph_pagerank", "q_ann_ivf",
    "q_text_lm_surprise")

  private def tag(k: Int): String = ('a' + k).toChar.toString

  /** Copy 0 is identity; copy k shifts keys by k·base and re-tags
    * content (see object scaladoc). Bases are fixed multiples of the
    * query moduli in use (e.g. c_custkey % 60) so every copy carries
    * the same filter pattern. */
  private def scaled(spark: SparkSession, src: String, name: String,
      copies: Int): DataFrame = {
    // events must go through Tables (normalizes the NANOS-vs-MICROS
    // timestamp generations); everything else reads raw
    val df =
      if (name == "events") Tables(spark, src, name)
      else spark.read.parquet(s"$src/$name.parquet")
    val union = (0 until copies).map { k =>
      val kk = lit(k.toLong)
      name match {
        case "lineitem" => df
          .withColumn("l_orderkey", col("l_orderkey") + kk * 100000000L)
          .withColumn("l_partkey", col("l_partkey") + kk * 10000000L)
          .withColumn("l_suppkey", col("l_suppkey") + kk * 1000000L)
        case "orders" => df
          .withColumn("o_orderkey", col("o_orderkey") + kk * 100000000L)
          .withColumn("o_custkey", col("o_custkey") + kk * 6000000L)
        case "customer" => df
          .withColumn("c_custkey", col("c_custkey") + kk * 6000000L)
          .withColumn("c_name",
            concat(lit(tag(k) * 4), col("c_name")))
        case "supplier" => df
          .withColumn("s_suppkey", col("s_suppkey") + kk * 1000000L)
        case "part" => df
          .withColumn("p_partkey", col("p_partkey") + kk * 10000000L)
        case "documents" => df
          .withColumn("doc_id", col("doc_id") + kk * 100000000L)
          .withColumn("text",
            array_join(transform(split(col("text"), " "),
              t => concat(lit(tag(k)), t)), " "))
        case "embeddings" => df
          .withColumn("vec_id", col("vec_id") + kk * 100000000L)
          .withColumn("embedding", transform(col("embedding"),
            (x, i) => when(pmod(xxhash64(kk, i), lit(2)) === 0, x)
              .otherwise(-x)))
        case _ => df // nation, region, events: single copy below
      }
    }
    name match {
      case "nation" | "region" | "events" => df
      case _ => union.reduce(_ unionByName _)
    }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SPOT_DIR",
      "/root/testdata_scaled/sf1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SPOT_K", "10").toInt
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

    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val marker = java.nio.file.Paths.get(outDir, "_SCALED_OK")
    if (!java.nio.file.Files.exists(marker)) {
      System.err.println(s"[benchspot] generating ${copies}x of $srcDir -> $outDir")
      tables.foreach { t =>
        scaled(spark, srcDir, t, copies)
          .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
        System.err.println(s"[benchspot]   $t done")
      }
      java.nio.file.Files.createFile(marker)
    }

    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, outDir)
        .write.format("noop").mode("overwrite").save()

    exec("q1_agg") // warmup: JIT + codegen off the clock

    val jobCounts = scala.collection.mutable.LinkedHashMap[String, Int]()
    def pass(passId: Int): Seq[(String, Double)] =
      spot.filter(SparkEntry.queries.contains).map { name =>
        val group = s"spot-p$passId-$name"
        spark.sparkContext.setJobGroup(group, name)
        val t0 = System.nanoTime()
        try exec(name)
        catch { case e: Throwable =>
          System.err.println(s"[benchspot] $name failed: ${e.getMessage}")
        }
        val secs = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.clearJobGroup()
        if (passId == 1) jobCounts(name) =
          spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
        System.err.println(f"[benchspot] $name%-24s $secs%8.2f s")
        spark.catalog.clearCache()
        name -> secs
      }

    val p1 = pass(1)
    System.err.println("[benchspot] --- pass 2 ---")
    val p2 = pass(2).toMap
    val results = p1.map { case (k, v) => k -> math.min(v, p2(k)) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val jobsJson = jobCounts.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"spot_total","value":$total,"unit":"sec","queries":$qs,"jobs":$jobsJson,"sf":"$outDir","copies":$copies,"cpus":$cpus}""")
    spark.stop()
  }
}
