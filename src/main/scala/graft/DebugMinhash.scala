package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing for the minhash pipeline (dev tool). */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[dbg] $label%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val df = Tables(spark, sfDir, "documents")
    val sh = time("shingles") {
      val x = df.repartition(64).select(col("doc_id").as("id"),
        Dedup.shingleExpr("text", 3).as("sh")).cache()
      x.count(); x
    }
    val sigs = time("signatures") {
      val x = sh
        .select(col("id"),
          expr("array_distinct(transform(sh, s -> xxhash64(s)))").as("shh"))
        .withColumn("sig", Dedup.minhashSignature("shh", 128)).cache()
      x.count(); x
    }
    time("full_pipeline") {
      Dedup.minhashNearDups(df, "doc_id", "text").count()
    }
    spark.stop()
  }
}
