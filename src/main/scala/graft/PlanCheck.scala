package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{ExplainMode, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Plan hygiene checker (dev tool): for each headline query, report
  * whether filters/projections reach the parquet scan, which joins
  * broadcast, and how wide the codegen spans are. */
object PlanCheck {

  /** Count whole-stage-codegen spans in an EXECUTED plan. Under AQE the
    * root is an AdaptiveSparkPlanExec that only finalizes when the plan
    * INSTANCE is executed — `df.write...` spawns a FRESH QueryExecution,
    * leaving the inspected instance at isFinalPlan=false with zero
    * codegen nodes (that is why the old counter reported 0 spans on
    * plans that really have them). Walk the tree structurally,
    * descending through the adaptive root's finalized plan and each
    * materialized query stage's subtree. Call only after executing the
    * same plan instance (see [[runPlan]]) — on a cold adaptive plan,
    * `finalPhysicalPlan` would trigger stage materialization itself. */
  private[graft] def codegenSpans(plan: SparkPlan): Int = {
    val children = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.finalPhysicalPlan)
      case q: QueryStageExec => Seq(q.plan)
      case p => p.children
    }
    (plan match { case _: WholeStageCodegenExec => 1; case _ => 0 }) +
      children.map(codegenSpans).sum
  }

  /** Execute exactly this plan instance (not a new QueryExecution), so
    * AQE finalizes it and span counting reflects the plan that ran. */
  private[graft] def runPlan(plan: SparkPlan): Unit = { plan.execute().count(); () }
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
      // AQE only finalizes the physical plan on execution, and only the
      // executed INSTANCE — run the inspected plan itself, then count
      val planInstance = df.queryExecution.executedPlan
      runPlan(planInstance)
      val spans = codegenSpans(planInstance)
      println(s"== $name")
      pushed.foreach(l => println(s"   scan: $l"))
      joins.foreach(l => println(s"   join: $l"))
      println(s"   codegen spans: $spans")
    }
    spark.stop()
  }
}
