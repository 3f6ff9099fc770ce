package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off demo main (not driver contract): Poisson-bootstrap standard
  * error at scale, validated against the analytic answer. Generates a
  * 10M-row id-arithmetic corpus with x = id % 1001 (uniform on
  * 0..1000: σ² = (1001² − 1)/12, mean 500), runs
  * Sampling.bootstrapMean, and prints boot_se next to the analytic
  * σ/√n — the honest check that the md5-seeded Poisson replication
  * actually estimates sampling error, not just a deterministic number.
  * Also times the run: the whole thing is one replicas×-explode
  * aggregate, so wall-clock ≈ replicas × a scan. */
object BenchBootstrap {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val replicas = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(n).select(col("id"),
      (col("id") % 1001).as("x"))
    val t0 = System.nanoTime()
    val r = graft.ops.Sampling.bootstrapMean(df, "id", "x", replicas)
      .head()
    val sec = (System.nanoTime() - t0) / 1e9
    val sigma = math.sqrt((1001.0 * 1001.0 - 1.0) / 12.0)
    val analytic = sigma / math.sqrt(n.toDouble)
    println(f"n=$n replicas=$replicas sec=$sec%.2f")
    println(f"mean=${r.getDouble(1)}%.6f (analytic 500.000000)")
    println(f"boot_se=${r.getDouble(3)}%.6f analytic_se=$analytic%.6f " +
      f"ratio=${r.getDouble(3) / analytic}%.3f")
    spark.stop()
  }
}
