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

  /** The interaction log is session-scoped, but sbt runs suites
    * CONCURRENTLY in one JVM and every suite's getOrCreate returns the
    * same root session — another suite's adapter calls would interleave
    * into this suite's recording. newSession() shares the SparkContext
    * but is a distinct session object (and conf), so only THIS suite's
    * interactions are logged. */
  private lazy val isolated: SparkSession = spark.newSession()

  private def runProject(proj: Path): Unit = {
    isolated.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val loc = Files.createTempDirectory("graft_rr_wh").toString
    val project = ProjectLoader.load(proj.toString)
    val r = new Runner(isolated, project, targetSchema = schema,
      warehouseLocation = Some(loc))
    val bad = r.run().filter(_.status != "success")
    assert(bad.isEmpty, bad.mkString(" | "))
  }

  test("a recorded golden run replays green, and a changed run diffs") {
    val log = Files.createTempDirectory("graft_rr_log").resolve("run.jsonl")

    // 1) golden run: record every warehouse interaction
    isolated.conf.set(InteractionLog.PathKey, log.toString)
    isolated.conf.set(InteractionLog.ModeKey, "record")
    try {
      runProject(fixtureProject())
      val lines = Files.readAllLines(log)
      assert(lines.size > 5, s"expected a real interaction stream, got $lines")
      assert(lines.toString.contains("write_table"), lines.toString.take(500))
      assert(lines.toString.contains("create_view"), lines.toString.take(500))

      // 2) verify run: identical project replays the recording exactly
      isolated.conf.set(InteractionLog.ModeKey, "verify")
      InteractionLog.reset(isolated)
      runProject(fixtureProject())
      val diff = InteractionLog.report(isolated)
      assert(diff.isEmpty, diff.take(5).mkString("\n"))

      // 3) regression: a changed model diverges, and the diff names the
      // first differing interaction rather than throwing mid-run
      InteractionLog.reset(isolated)
      runProject(fixtureProject(modelV = "'CHANGED' as v"))
      val diff2 = InteractionLog.report(isolated)
      assert(diff2.nonEmpty, "a changed model must produce a diff")
    } finally {
      isolated.conf.set(InteractionLog.ModeKey, "off")
      isolated.conf.unset(InteractionLog.PathKey)
      InteractionLog.reset(isolated)
    }
  }

  test("verify is schedule-tolerant: parallel replay of a serial recording") {
    // two INDEPENDENT models: a parallel scheduler may materialize them
    // in either order, so verify compares the interaction MULTISET, not
    // the global sequence (the reference harness likewise matches per
    // node, not by order)
    val proj = Files.createTempDirectory("graft_rr_par")
    write(proj, "dbt_project.yml",
      """name: rrpar
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/left.sql",
      "{{ config(materialized='table') }}\nselect 1 as x\n")
    write(proj, "models/right.sql",
      "{{ config(materialized='table') }}\nselect 2 as y\n")
    val log = Files.createTempDirectory("graft_rr_par_log").resolve("p.jsonl")
    val parSchema = s"g_rr_par_${System.nanoTime()}"
    def cli(threads: Int, flag: String): Int = {
      isolated.sql(s"DROP DATABASE IF EXISTS `$parSchema` CASCADE")
      graft.cli.Main.run(isolated, graft.cli.Main.parseArgs(
        Array("run", "--project-dir", proj.toString, "--schema", parSchema,
          "--threads", threads.toString, flag, log.toString,
          "--target-path",
          Files.createTempDirectory("graft_rr_pt").toString)))
    }
    try {
      assert(cli(1, "--record") == 0)
      assert(cli(4, "--replay-verify") == 0,
        "a parallel schedule of the same interactions must verify green")
    } finally {
      isolated.conf.set(InteractionLog.ModeKey, "off")
      isolated.conf.unset(InteractionLog.PathKey)
      InteractionLog.reset(isolated)
    }
  }

  test("offline replay re-runs a recorded project with ZERO live table scans") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    // a project whose run READS the warehouse (run_query in a hook) and
    // writes three materializations — the recording must carry both the
    // interaction stream and the read results
    val proj = Files.createTempDirectory("graft_rr_off")
    write(proj, "dbt_project.yml",
      """name: rroff
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/base.sql",
      "{{ config(materialized='table') }}\nselect 1 as id, 'x' as v\n")
    write(proj, "models/inc.sql",
      """{{ config(materialized='incremental', unique_key='id',
        |   post_hook="{% set r = run_query('select count(*) as n from ' ~ this) %}COMMENT ON TABLE {{ this }} IS '{{ r.rows[0][0] }} rows'") }}
        |select id, v from {{ ref('base') }}
        |""".stripMargin)
    write(proj, "models/v.sql",
      "select count(*) as n from {{ ref('inc') }}\n")
    val log = Files.createTempDirectory("graft_rr_off_log").resolve("off.jsonl")
    val offSchema = s"g_rr_off_${System.nanoTime()}"
    def cli(flags: String*): Int =
      graft.cli.Main.run(isolated, graft.cli.Main.parseArgs(
        Array("run", "--project-dir", proj.toString, "--schema", offSchema,
          "--target-path",
          Files.createTempDirectory("graft_rr_off_t").toString) ++ flags))
    try {
      // 1) golden run: interactions → off.jsonl, read results → off.jsonl.cache/
      isolated.sql(s"DROP DATABASE IF EXISTS `$offSchema` CASCADE")
      assert(cli("--record", log.toString) == 0)
      assert(Files.isDirectory(log.resolveSibling("off.jsonl.cache")),
        "recording must include the query-result cache")

      // 2) destroy the warehouse: the reference's replay serves recorded
      // results WITHOUT a warehouse, so nothing may depend on the data
      isolated.sql(s"DROP DATABASE IF EXISTS `$offSchema` CASCADE")

      // per-session listener counting executed file scans (async
      // callbacks → settle-wait below)
      val scans = new java.util.concurrent.atomic.AtomicInteger(0)
      val actions = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new QueryExecutionListener {
        override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = {
          actions.incrementAndGet()
          // string match survives AQE wrappers that TreeNode.collect
          // does not descend into; physical scans always print FileScan
          if (qe.executedPlan.toString.contains("FileScan"))
            scans.incrementAndGet()
        }
        override def onFailure(f: String, qe: QueryExecution,
            e: Exception): Unit = ()
      }
      isolated.listenerManager.register(listener)
      try {
        assert(cli("--replay-offline", log.toString) == 0,
          "offline replay must verify green against the recording")
        // the hook's run_query was served from the recording: its LIVE
        // count (1) survives even though the offline table is EMPTY
        val cmt = isolated.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(
            "inc", Some(offSchema))).comment
        assert(cmt.contains("1 rows"), s"comment from replayed read: $cmt")
        // settle the async listener, then: zero file scans executed
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        var last = -1
        while (System.nanoTime() < deadline && actions.get() != last) {
          last = actions.get(); Thread.sleep(300)
        }
        assert(scans.get() == 0,
          s"offline replay executed ${scans.get()} file-scanning actions")
      } finally isolated.listenerManager.unregister(listener)
      // offline tables are schema-only: the run moved no rows (counted
      // AFTER the listener detaches — this count scans the empty table)
      assert(isolated.table(s"`$offSchema`.base").count() == 0)
    } finally {
      isolated.conf.set(InteractionLog.ModeKey, "off")
      isolated.conf.unset(InteractionLog.PathKey)
      isolated.conf.unset(graft.adapter.QueryCache.ModeKey)
      isolated.conf.unset(graft.adapter.QueryCache.PathKey)
      isolated.conf.unset(graft.adapter.SparkAdapter.OfflineKey)
      InteractionLog.reset(isolated)
    }
  }

  test("offline replay skips CTAS however phrased (AS WITH / AS VALUES)") {
    // a raw-SQL CTAS whose normalized text reads '... as with ...' must
    // NOT fall through to live execution in offline mode — the broad
    // non-view-CREATE rule catches every AS-clause phrasing
    val schema = s"g_rr_ctas_${System.nanoTime()}"
    val a = new graft.adapter.SparkAdapter(isolated, schema)
    isolated.conf.set(graft.adapter.SparkAdapter.OfflineKey, "true")
    try {
      val (s1, _) = a.execute(
        s"CREATE TABLE `$schema`.ctas_w AS WITH c AS (SELECT 1 AS x) " +
          "SELECT x FROM c", fetch = false)
      assert(s1.contains("offline skip"), s"AS WITH CTAS must skip: $s1")
      val (s2, _) = a.execute(
        s"CREATE TABLE `$schema`.ctas_v AS VALUES (1), (2) t(x)",
        fetch = false)
      assert(s2.contains("offline skip"), s"AS VALUES CTAS must skip: $s2")
      assert(!isolated.catalog.tableExists(s"`$schema`.ctas_w") &&
        !isolated.catalog.tableExists(s"`$schema`.ctas_v"),
        "skipped CTAS must not create tables")
      // catalog-only creates stay live: a plain CREATE VIEW ... AS SELECT
      val (s3, _) = a.execute(
        s"CREATE VIEW `$schema`.v_ok AS SELECT 1 AS x", fetch = false)
      assert(s3 == "OK" && isolated.catalog.tableExists(s"`$schema`.v_ok"),
        s"view DDL must stay live offline: $s3")
    } finally {
      isolated.conf.unset(graft.adapter.SparkAdapter.OfflineKey)
      isolated.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
      InteractionLog.reset(isolated)
    }
  }

  test("CLI --record / --replay-verify drive the log and the exit code") {
    val proj = fixtureProject()
    val log = Files.createTempDirectory("graft_rr_cli").resolve("cli.jsonl")
    // unique schema per invocation: a REUSED name would let createSchema's
    // cross-session table recovery resurrect a previous JVM's warehouse
    // directories, and the record run would legitimately take the
    // incremental/staged-swap paths while the verify run builds fresh
    val cliSchema = s"g_rr_cli_${System.nanoTime()}"
    def cli(flags: String*): Int = {
      isolated.sql(s"DROP DATABASE IF EXISTS `$cliSchema` CASCADE")
      graft.cli.Main.run(isolated, graft.cli.Main.parseArgs(
        Array("run", "--project-dir", proj.toString, "--schema", cliSchema,
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
      isolated.sql(s"DROP DATABASE IF EXISTS `$cliSchema` CASCADE")
      val rc = graft.cli.Main.run(isolated, graft.cli.Main.parseArgs(
        Array("run", "--project-dir", proj2.toString, "--schema", cliSchema,
          "--target-path", Files.createTempDirectory("graft_rr_t").toString,
          "--replay-verify", log.toString)))
      assert(rc != 0, "diverging run must fail the exit code")
    } finally {
      isolated.conf.set(InteractionLog.ModeKey, "off")
      isolated.conf.unset(InteractionLog.PathKey)
      InteractionLog.reset(isolated)
    }
  }
}
