package graft

import graft.project.ProjectLoader
import graft.run.Runner
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** Microbatch input filter (reference model_config.rs:209-210): compiling
  * with a batch window must wrap event_time-declaring refs AND sources in a
  * `[start, end)`-filtered subquery so the per-batch scans prune at the
  * source, instead of re-scanning the full input every batch. */
class MicrobatchCompileSpec extends AnyFunSuite {

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

  test("batch window pushes into event_time refs and sources") {
    val proj = Files.createTempDirectory("graft_mbc")
    write(proj, "dbt_project.yml",
      """name: mbc
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/sources.yml",
      """version: 2
        |sources:
        |  - name: raw
        |    tables:
        |      - name: clicks
        |        config:
        |          event_time: ts
        |      - name: dims
        |""".stripMargin)
    write(proj, "models/upstream.sql",
      """{{ config(materialized='incremental', event_time='ts') }}
        |select * from {{ source('raw', 'clicks') }}
        |""".stripMargin)
    write(proj, "models/mb.sql",
      """{{ config(materialized='incremental', incremental_strategy='microbatch', event_time='ts', batch_size='day', begin='2024-01-01 00:00:00') }}
        |select a.*, d.name from {{ ref('upstream') }} a
        |join {{ source('raw', 'dims') }} d on a.k = d.k
        |""".stripMargin)
    val schema = "g_mbc"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val loc = Files.createTempDirectory("graft_mbc_wh").toString
    val runner = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema, warehouseLocation = Some(loc))
    val node = runner.resolved.nodes("model.mbc.mb")
    val w = Some((java.sql.Timestamp.valueOf("2024-01-05 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-06 00:00:00")))

    val sql = runner.compileSql(node, batchWindow = w)
    // the event_time ref is window-wrapped…
    assert(sql.contains("WHERE `ts` >= TIMESTAMP '2024-01-05"))
    assert(sql.contains("AND `ts` < TIMESTAMP '2024-01-06"))
    // …the no-event_time source is not
    assert(!sql.contains("dims WHERE"))
    // without a window, nothing is wrapped
    val plain = runner.compileSql(node)
    assert(!plain.contains("TIMESTAMP '2024-01-05"))

    // the event_time source is window-wrapped in its consumer
    val up = runner.resolved.nodes("model.mbc.upstream")
    val upSql = runner.compileSql(up, batchWindow = w)
    assert(upSql.contains("WHERE `ts` >= TIMESTAMP '2024-01-05"))
  }
}
