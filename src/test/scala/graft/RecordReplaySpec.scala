package graft

import graft.adapter.InteractionLog
import graft.project.ProjectLoader
import graft.run.Runner
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** Record & replay of warehouse interactions (reference
  * record_and_replay.rs): a golden run of a fixture project records
  * every adapter interaction to JSONL; a verify-mode re-run diffs the
  * live stream against the recording, so materialization-protocol
  * regressions show up as a concrete interaction diff instead of a
  * downstream data mismatch. */
class RecordReplaySpec extends AnyFunSuite {

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

  /** A small project covering the main interaction kinds: CTAS staged
    * swap (table), view create, incremental first build, and a hook
    * through adapter.execute. */
  private def fixtureProject(modelV: String = "'x' as v"): Path = {
    val proj = Files.createTempDirectory("graft_rr")
    write(proj, "dbt_project.yml",
      """name: rr
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/base.sql",
      s"""{{ config(materialized='table',
         |   post_hook='COMMENT ON TABLE {{ this }} IS "recorded"') }}
         |select 1 as id, $modelV
         |""".stripMargin)
    write(proj, "models/inc.sql",
      """{{ config(materialized='incremental', unique_key='id') }}
        |select id, v from {{ ref('base') }}
        |""".stripMargin)
    write(proj, "models/v.sql",
      """select count(*) as n from {{ ref('inc') }}
        |""".stripMargin)
    proj
  }

  private val schema = "g_rr"

  private def runProject(proj: Path): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val loc = Files.createTempDirectory("graft_rr_wh").toString
    val project = ProjectLoader.load(proj.toString)
    val r = new Runner(spark, project, targetSchema = schema,
      warehouseLocation = Some(loc))
    val bad = r.run().filter(_.status != "success")
    assert(bad.isEmpty, bad.mkString(" | "))
  }

  test("a recorded golden run replays green, and a changed run diffs") {
    val log = Files.createTempDirectory("graft_rr_log").resolve("run.jsonl")

    // 1) golden run: record every warehouse interaction
    spark.conf.set(InteractionLog.PathKey, log.toString)
    spark.conf.set(InteractionLog.ModeKey, "record")
    try {
      runProject(fixtureProject())
      val lines = Files.readAllLines(log)
      assert(lines.size > 5, s"expected a real interaction stream, got $lines")
      assert(lines.toString.contains("write_table"), lines.toString.take(500))
      assert(lines.toString.contains("create_view"), lines.toString.take(500))

      // 2) verify run: identical project replays the recording exactly
      spark.conf.set(InteractionLog.ModeKey, "verify")
      InteractionLog.reset(spark)
      runProject(fixtureProject())
      val diff = InteractionLog.report(spark)
      assert(diff.isEmpty, diff.take(5).mkString("\n"))

      // 3) regression: a changed model diverges, and the diff names the
      // first differing interaction rather than throwing mid-run
      InteractionLog.reset(spark)
      runProject(fixtureProject(modelV = "'CHANGED' as v"))
      val diff2 = InteractionLog.report(spark)
      assert(diff2.nonEmpty, "a changed model must produce a diff")
    } finally {
      spark.conf.set(InteractionLog.ModeKey, "off")
      spark.conf.unset(InteractionLog.PathKey)
      InteractionLog.reset(spark)
    }
  }

  test("CLI --record / --replay-verify drive the log and the exit code") {
    val proj = fixtureProject()
    val log = Files.createTempDirectory("graft_rr_cli").resolve("cli.jsonl")
    def cli(flags: String*): Int = {
      spark.sql(s"DROP DATABASE IF EXISTS `g_rr_cli` CASCADE")
      graft.cli.Main.run(spark, graft.cli.Main.parseArgs(
        Array("run", "--project-dir", proj.toString, "--schema", "g_rr_cli",
          "--target-path", Files.createTempDirectory("graft_rr_t").toString)
          ++ flags))
    }
    try {
      assert(cli("--record", log.toString) == 0)
      assert(Files.readAllLines(log).size > 5)
      assert(cli("--replay-verify", log.toString) == 0,
        "identical run must verify green")
      // a diverging run exits nonzero
      val proj2 = fixtureProject(modelV = "'CHANGED' as v")
      spark.sql(s"DROP DATABASE IF EXISTS `g_rr_cli` CASCADE")
      val rc = graft.cli.Main.run(spark, graft.cli.Main.parseArgs(
        Array("run", "--project-dir", proj2.toString, "--schema", "g_rr_cli",
          "--target-path", Files.createTempDirectory("graft_rr_t").toString,
          "--replay-verify", log.toString)))
      assert(rc != 0, "diverging run must fail the exit code")
    } finally {
      spark.conf.set(InteractionLog.ModeKey, "off")
      spark.conf.unset(InteractionLog.PathKey)
      InteractionLog.reset(spark)
    }
  }
}
