package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan hygiene checker (dev tool): for each headline query, report
  * whether filters/projections reach the parquet scan, which joins
  * broadcast, and how wide the codegen spans are. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val pushed = plan.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .map(_.trim.take(140)).toSeq
      val joins = plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("BroadcastExchange"))
        .map(_.trim.replaceAll("\\(\\d+\\)", "").take(100)).toSeq.distinct
      // AQE only finalizes the physical plan on execution — count
      // whole-stage-codegen spans from the executed plan, not the explain
      df.write.format("noop").mode("overwrite").save()
      val codegenSpans = raw"\*\(\d+\)".r
        .findAllMatchIn(df.queryExecution.executedPlan.toString)
        .map(_.group(0)).toSet.size
      println(s"== $name")
      pushed.foreach(l => println(s"   scan: $l"))
      joins.foreach(l => println(s"   join: $l"))
      println(s"   codegen spans: $codegenSpans")
    }
    spark.stop()
  }
}
