package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Guards the PlanCheck dev tool's codegen-span counter: under AQE the
  * executed plan's toString hides the `*(n)` markers, so the old
  * regex-based counter reported 0 spans on plans that really have them.
  * The structural walk must see through the adaptive root. */
class PlanCheckSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("codegenSpans sees through the AQE root instead of reporting 0") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val df = (1 to 1000).toDF("n")
      .groupBy(($"n" % 7).as("k")).count()
    val plan = df.queryExecution.executedPlan
    assert(plan.isInstanceOf[AdaptiveSparkPlanExec], plan.getClass.getName)
    // the old tool executed a DIFFERENT QueryExecution (df.write spawns a
    // fresh one), so this instance stayed un-finalized and reported 0
    val beforeRun = raw"\*\(\d+\)".r
      .findAllMatchIn(plan.toString).map(_.group(0)).toSet.size
    assert(beforeRun == 0)
    PlanCheck.runPlan(plan)
    assert(PlanCheck.codegenSpans(plan) >= 2)
  }
}
