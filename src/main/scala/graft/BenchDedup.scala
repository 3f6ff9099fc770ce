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
