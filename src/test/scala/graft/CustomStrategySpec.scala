package graft

import graft.project.ProjectLoader
import graft.run.Runner
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** Custom incremental strategies (DbtIncrementalStrategy::Custom,
  * common.rs:572; dispatch base_adapter.rs:339): an unknown strategy name
  * resolves to the project's `get_incremental_<name>_sql(arg_dict)` macro,
  * which receives dbt's arg dict and returns the DML to execute against
  * the materialized temp relation. */
class CustomStrategySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def write(dir: Path, rel: String, content: String): Unit = {
    val p = dir.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  test("unknown strategy dispatches to get_incremental_<name>_sql macro") {
    val proj = Files.createTempDirectory("graft_custom")
    write(proj, "dbt_project.yml",
      """name: cust
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "macros/theirs.sql",
      """{% macro get_incremental_theirs_sql(arg_dict) %}
        |INSERT INTO {{ arg_dict['target_relation'] }}
        |SELECT * FROM {{ arg_dict['temp_relation'] }}
        |{% endmacro %}
        |""".stripMargin)
    write(proj, "models/m.sql",
      """{{ config(materialized='incremental', incremental_strategy='theirs') }}
        |select 1 as id, 'x' as v
        |""".stripMargin)
    val schema = "g_custom_strat"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val loc = Files.createTempDirectory("graft_custom_wh").toString
    val project = ProjectLoader.load(proj.toString)
    def runOnce(): Unit = {
      val r = new Runner(spark, project, targetSchema = schema,
        warehouseLocation = Some(loc))
      val bad = r.run().filter(_.status != "success")
      assert(bad.isEmpty, bad.mkString(" | "))
    }
    runOnce() // first run: CTAS
    runOnce() // second run: custom macro INSERTs the batch again
    assert(spark.table(s"$schema.m").count() == 2)
  }

  test("missing macro errors with a clear message") {
    val proj = Files.createTempDirectory("graft_custom_missing")
    write(proj, "dbt_project.yml",
      """name: custmiss
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/m2.sql",
      """{{ config(materialized='incremental', incremental_strategy='nope') }}
        |select 1 as id
        |""".stripMargin)
    val schema = "g_custom_miss"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val loc = Files.createTempDirectory("graft_custom_miss_wh").toString
    val project = ProjectLoader.load(proj.toString)
    def results() = new Runner(spark, project, targetSchema = schema,
      warehouseLocation = Some(loc)).run()
    assert(results().forall(_.status == "success")) // first run = CTAS, no dispatch
    val second = results()
    assert(second.exists(r => r.status == "error" &&
      r.message.contains("get_incremental_nope_sql")))
  }
}
