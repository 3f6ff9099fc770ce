package graft

import org.apache.spark.sql.SparkSession

/** Scratch micro-bench for the LSH dedup paths (not part of the driver
  * contract; used to isolate bucketPairs guard costs). */
object BenchDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[dbench] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
    }

    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    exec("q_dedup_exact") // warmup

    if (args.headOption.contains("stages")) {
      import graft.expressions.PipelineExpressions._
      import org.apache.spark.sql.functions._
      import graft.ops.Dedup
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val docs = graft.Tables(spark, sfDir, "documents")
      for (_ <- 1 to 2) {
        val (perms, bands) = (128, 21); val r = perms / bands
        time("sigs (shingle+minhash sig)") {
          noop(docs.select(col("doc_id").as("id"),
            shingle_hashes(col("text"), 3).as("shh"))
            .filter(size(col("shh")) > 0)
            .withColumn("sig", minhash_sig(col("shh"), perms)))
        }
        val sigs = docs.select(col("doc_id").as("id"),
          shingle_hashes(col("text"), 3).as("shh"))
          .filter(size(col("shh")) > 0)
          .withColumn("sig", minhash_sig(col("shh"), perms)).cache()
        noop(sigs) // materialize cache off the clock
        val banded = sigs.select(col("id"),
          posexplode(expr(
            s"""transform(sequence(0, ${bands - 1}), b -> xxhash64(concat_ws(',',
               |  transform(slice(sig, b * $r + 1, $r), v -> cast(v AS STRING)))))""".stripMargin))
            .as(Seq("band", "bandhash")))
        noop(sigs) // refill the cache time() cleared
        time("banded rows from cached sigs")(noop(banded))
        noop(sigs)
        val pairIds = Dedup.bucketPairs(banded, Seq("band", "bandhash"), 100000)
        time("bucketPairs from cached sigs")(noop(pairIds))
        spark.catalog.clearCache()
        time("full q_dedup_minhash")(exec("q_dedup_minhash"))
      }
      spark.stop(); return
    }

    if (args.headOption.contains("counts")) {
      import graft.expressions.PipelineExpressions._
      import org.apache.spark.sql.functions._
      val docs = graft.Tables(spark, sfDir, "documents")
      val (perms, bands) = (128, 21); val r = perms / bands
      val sigs = docs.select(col("doc_id").as("id"),
        shingle_hashes(col("text"), 3).as("shh"))
        .filter(size(col("shh")) > 0)
        .withColumn("sig", minhash_sig(col("shh"), perms)).cache()
      val banded = sigs.select(col("id"),
        posexplode(expr(
          s"""transform(sequence(0, ${bands - 1}), b -> xxhash64(concat_ws(',',
             |  transform(slice(sig, b * $r + 1, $r), v -> cast(v AS STRING)))))""".stripMargin))
          .as(Seq("band", "bandhash")))
      println(s"[dbench] docs=${docs.count()} banded=${banded.count()}")
      val buckets = banded.groupBy("band", "bandhash").count()
      println("[dbench] bucket size histogram:")
      buckets.groupBy(col("count").as("bucket_size")).count()
        .orderBy(desc("bucket_size")).show(10, truncate = false)
      val pairs = graft.ops.Dedup.bucketPairs(banded, Seq("band", "bandhash"), 100000)
      println(s"[dbench] deduped pairs=${pairs.count()}")
      spark.stop(); return
    }
    for (v <- if (args.nonEmpty) args.toSeq
              else Seq("guard_on", "guard_off", "objhash")) {
      v match {
        case "guard_off" =>
          spark.conf.set("spark.graft.maxBandBucket", "0")
          spark.conf.set("spark.graft.maxShingleDf", "0")
        case "objhash" =>
          spark.conf.unset("spark.graft.maxBandBucket")
          spark.conf.unset("spark.graft.maxShingleDf")
          spark.conf.set(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            "10000000")
        case _ =>
          spark.conf.unset("spark.graft.maxBandBucket")
          spark.conf.unset("spark.graft.maxShingleDf")
      }
      time(s"$v q_dedup_minhash")(exec("q_dedup_minhash"))
      time(s"$v q_dedup_simhash")(exec("q_dedup_simhash"))
    }
    spark.stop()
  }
}
