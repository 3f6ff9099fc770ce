package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: write `.explain("formatted")` output for headline queries to
  * files (`plans/<round>/<query>_<suffix>.txt`) so plan-shape claims in the
  * optimization notes are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [name1,name2,...]
  * Session mirrors graft.Bench (same master/core/shuffle settings via
  * SPARK_GRAFT_CPUS / SPARK_GRAFT_SF_DIR) so the dumped plan is the plan
  * the bench runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [names]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names: Seq[String] =
      if (args.length >= 3) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Bench.headline
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    names.filter(SparkEntry.queries.contains).foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
        System.err.println(s"[plandump] wrote $name")
        spark.catalog.clearCache()
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
