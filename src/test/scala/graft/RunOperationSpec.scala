package graft

import graft.jinja.Jinja
import graft.project.ProjectLoader
import graft.run.Runner
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** `dbt run-operation` (reference: io_args.rs:88): project macros invoked
  * standalone with the full run context — statement/run_query hit the
  * adapter, args of any shape pass through unquoted. */
class RunOperationSpec extends AnyFunSuite {

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

  private def runner(): Runner = {
    val proj = Files.createTempDirectory("graft_runop")
    write(proj, "dbt_project.yml",
      """name: opdemo
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "macros/ops.sql",
      """{% macro make_audit(schema_name, rows=[]) %}
        |  {% do statement('create',
        |       'create schema if not exists ' ~ schema_name) %}
        |  {% do statement('ddl',
        |       'create or replace view ' ~ schema_name ~ '.audit as select ' ~
        |       (rows | join(' as n union all select ')) ~ ' as n') %}
        |  {% set t = run_query('select count(*) as c from ' ~ schema_name ~ '.audit') %}
        |  {{ return('rows=' ~ t.columns[0]['values']()[0]) }}
        |{% endmacro %}
        |""".stripMargin)
    new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = "g_runop")
  }

  test("init scaffolds a runnable starter project and refuses overwrite") {
    import graft.cli.Main
    val parent = Files.createTempDirectory("graft_init").toString
    val rc = Main.run(spark, Main.parseArgs(
      Array("init", "starterdemo", "--project-dir", parent)))
    assert(rc == 0)
    val root = java.nio.file.Path.of(parent, "starterdemo")
    assert(Files.exists(root.resolve("dbt_project.yml")))
    assert(Files.exists(root.resolve("models/example/schema.yml")))
    // the scaffold must actually build + test green end-to-end
    val schema = "g_init_demo"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val r = new graft.run.Runner(spark,
      graft.project.ProjectLoader.load(root.toString),
      targetSchema = schema,
      warehouseLocation = Some(Files.createTempDirectory("graft_init_wh").toString))
    val results = r.run()
    assert(results.nonEmpty)
    val bad = results.filter(x => x.status != "success" && x.status != "pass")
    assert(bad.isEmpty, bad.mkString(" | "))
    // second init into the same directory refuses
    assert(Main.run(spark, Main.parseArgs(
      Array("init", "starterdemo", "--project-dir", parent))) == 1)
    // bad names rejected
    assert(Main.run(spark, Main.parseArgs(
      Array("init", "bad-name!", "--project-dir", parent))) == 2)
  }

  test("python models surface a structured error node, not silence") {
    val proj = Files.createTempDirectory("graft_pymodel")
    write(proj, "dbt_project.yml",
      """name: pydemo
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/ok_model.sql", "select 1 as id")
    write(proj, "models/py_model.py",
      """def model(dbt, session):
        |    return session.createDataFrame([(1,)], ["id"])
        |""".stripMargin)
    val schema = "g_pymodel"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val loc = Files.createTempDirectory("graft_pymodel_wh").toString
    val r = new graft.run.Runner(spark,
      graft.project.ProjectLoader.load(proj.toString),
      targetSchema = schema, warehouseLocation = Some(loc))
    // the node exists in the manifest (not silently dropped)
    assert(r.resolved.nodes.contains("model.pydemo.py_model"))
    val results = r.run()
    val py = results.find(_.uniqueId == "model.pydemo.py_model").get
    assert(py.status == "error", py.message)
    assert(py.message.contains("Python models are not supported"), py.message)
    assert(py.message.contains("py_model.py"), py.message)
    // the SQL sibling still builds
    val ok = results.find(_.uniqueId == "model.pydemo.ok_model").get
    assert(ok.status == "success", ok.message)
  }

  test("a model name claimed by both .sql and .py is a duplicate error") {
    val proj = Files.createTempDirectory("graft_pydup")
    write(proj, "dbt_project.yml",
      """name: pydup
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/twin.sql", "select 1 as id")
    write(proj, "models/twin.py", "def model(dbt, session):\n    return None\n")
    val e = intercept[IllegalArgumentException] {
      new graft.run.Runner(spark,
        graft.project.ProjectLoader.load(proj.toString),
        targetSchema = "g_pydup",
        warehouseLocation =
          Some(Files.createTempDirectory("graft_pydup_wh").toString)).resolved
    }
    assert(e.getMessage.contains("duplicate model name"), e.getMessage)
    assert(e.getMessage.contains("model.pydup.twin"), e.getMessage)
  }

  test("run-operation invokes a macro with adapter access and structured args") {
    val out = runner().runOperation("make_audit",
      Map("schema_name" -> "g_runop_audit", "rows" -> Vector(1L, 2L, 3L)))
    assert(out == "rows=3")
    assert(spark.sql("select * from g_runop_audit.audit").count() == 3)
  }

  test("run-operation reaches adapter.compact: a partitioned target's " +
      "accreted small files rewrite down, rows and partitions identical") {
    val proj = Files.createTempDirectory("graft_compact_op")
    write(proj, "dbt_project.yml",
      """name: cdemo
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "macros/maint.sql",
      """{% macro compact_table(schema_name, table_name, parts=[]) %}
        |  {% set r = adapter.compact(schema_name, table_name,
        |       partition_by=parts) %}
        |  {{ return(r[0] ~ '->' ~ r[1]) }}
        |{% endmacro %}
        |""".stripMargin)
    val schema = "g_compact_op"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val loc = Files.createTempDirectory("graft_cop_wh").toString
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema, warehouseLocation = Some(loc))
    // the incremental-append reality: a partitioned table accreting one
    // small file per append
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$schema`")
    spark.sql(s"CREATE TABLE `$schema`.acc (id BIGINT, v STRING) " +
      "USING parquet PARTITIONED BY (grp STRING) " +
      s"LOCATION '$loc/acc'")
    (1 to 6).foreach(i => spark.sql(
      s"INSERT INTO `$schema`.acc PARTITION (grp='g${i % 2}') " +
        s"VALUES ($i, 'v$i')"))
    def snap() = spark.table(s"`$schema`.acc")
      .collect().map(_.toSeq).sortBy(_.toString)
    val rowsBefore = snap()
    val filesBefore = spark.table(s"`$schema`.acc").inputFiles.length
    assert(filesBefore >= 6, s"expected accreted small files: $filesBefore")
    // NO partition_by argument: the partition spec derives from the
    // catalog — a maintenance op must not depend on the caller
    // restating layout it could get wrong
    val out = r.runOperation("compact_table", Map(
      "schema_name" -> schema, "table_name" -> "acc")).trim
    val Array(b, a) = out.split("->").map(_.trim.toLong)
    assert(b == filesBefore, s"macro reported $out")
    assert(a < b, s"compaction must reduce the file count: $out")
    val filesAfter = spark.table(s"`$schema`.acc").inputFiles.length
    assert(filesAfter.toLong == a && filesAfter <= 2,
      s"one file per partition value expected, got $filesAfter")
    // row identity + the partition column survives the rewrite
    assert(snap().toSeq == rowsBefore.toSeq)
    assert(spark.sql(s"SHOW PARTITIONS `$schema`.acc").count() == 2)
    // a partition_by that CONTRADICTS the catalog refuses by name —
    // compaction preserves layout, it never changes it
    val e = intercept[Exception](r.runOperation("compact_table", Map(
      "schema_name" -> schema, "table_name" -> "acc",
      "parts" -> Vector("id"))))
    assert(e.getMessage.contains("preserves"), e.getMessage)
    // sort_by reaches the rewrite through the macro surface: write-time
    // clustering is layout the CATALOG cannot recover, so a sorted
    // model compacted without naming it would silently lose min/max
    // skipping — the binding must pass it through
    write(proj, "macros/maint_sorted.sql",
      """{% macro compact_sorted(schema_name, table_name) %}
        |  {% set r = adapter.compact(schema_name, table_name,
        |       target_files=2, sort_by=['id']) %}
        |  {{ return(r[0] ~ '->' ~ r[1]) }}
        |{% endmacro %}
        |""".stripMargin)
    spark.sql(s"CREATE TABLE `$schema`.srt (id BIGINT, v STRING) " +
      s"USING parquet LOCATION '$loc/srt'")
    (1 to 6).foreach(i => spark.sql(
      s"INSERT INTO `$schema`.srt VALUES ($i, 'v$i'), (${i + 100}, 'w$i')"))
    val r2 = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema, warehouseLocation = Some(loc))
    val out2 = r2.runOperation("compact_sorted", Map(
      "schema_name" -> schema, "table_name" -> "srt")).trim
    val Array(b2, a2) = out2.split("->").map(_.trim.toLong)
    assert(b2 >= 6 && a2 <= 2, s"sorted compaction must land at " +
      s"target_files: $out2")
    // the clustering is real: per-file id ranges are disjoint
    import org.apache.spark.sql.functions.{input_file_name,
      min => fmin, max => fmax}
    val spans = spark.table(s"`$schema`.srt")
      .groupBy(input_file_name())
      .agg(fmin("id").as("lo"), fmax("id").as("hi"))
      .collect().map(rr => (rr.getLong(1), rr.getLong(2))).sortBy(_._1)
    assert(spans.length == 2 && spans(0)._2 < spans(1)._1,
      s"sorted layout lost: ${spans.mkString(", ")}")
  }

  test("show --inline compiles ad-hoc Jinja-SQL with macros in scope") {
    val r = runner()
    val sql = r.compileInline(
      "select {{ 1 + 1 }} as two, '{{ 'x' | upper }}' as ux")
    assert(sql == "select 2 as two, 'X' as ux")
    val (_, t) = r.adapter.execute(s"SELECT * FROM ($sql) q LIMIT 5")
    assert(t.rows == Vector(Vector(2, "X")) || t.rows == Vector(Vector(2L, "X")))
  }

  test("--exclude subtracts from the selection (with and without --select)") {
    val proj = Files.createTempDirectory("graft_excl")
    write(proj, "dbt_project.yml",
      """name: excldemo
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/m1.sql", "select 1 as id\n")
    write(proj, "models/m2.sql", "select 2 as id\n")
    write(proj, "models/m3.sql", "select * from {{ ref('m1') }}\n")
    val schema = "g_excl"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema,
      warehouseLocation =
        Some(Files.createTempDirectory("graft_excl_wh").toString))
    // bare --exclude: everything except m2
    val ran = r.run(exclude = Some("m2")).map(_.uniqueId).toSet
    assert(ran == Set("model.excldemo.m1", "model.excldemo.m3"))
    // --select graph op minus --exclude
    val ran2 = r.run(select = Some("+m3"), exclude = Some("m1"))
      .map(_.uniqueId).toSet
    assert(ran2 == Set("model.excldemo.m3"))
  }

  test("retry re-runs only what failed, then reports nothing to retry") {
    import graft.cli.Main
    val proj = Files.createTempDirectory("graft_retry")
    write(proj, "dbt_project.yml",
      """name: retrydemo
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/m_ok.sql", "select 1 as id\n")
    write(proj, "models/m_bad.sql", "select * from this_table_is_missing\n")
    val schema = "g_retry"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val state = Files.createTempDirectory("graft_retry_state").toString
    val args0 = Main.Args(command = "build", projectDir = proj.toString,
      schema = schema, state = Some(state))
    assert(Main.run(spark, args0) == 1) // m_bad errors
    // fix the model, retry: only the failed node re-runs
    write(proj, "models/m_bad.sql", "select 2 as id\n")
    assert(Main.run(spark, args0.copy(command = "retry")) == 0)
    assert(spark.table(s"$schema.m_bad").count() == 1)
    // everything green now → nothing to retry
    assert(Main.run(spark, args0.copy(command = "retry")) == 0)
  }

  test("on-run-start/on-run-end hooks run once per invocation with results") {
    val proj = Files.createTempDirectory("graft_runhooks")
    write(proj, "dbt_project.yml",
      """name: hookdemo
        |model-paths: ["models"]
        |on-run-start:
        |  - "create schema if not exists g_runhooks_audit"
        |  - "create or replace view g_runhooks_audit.started as select 1 as ok"
        |on-run-end:
        |  - "{{ log_results(results, schemas) }}"
        |""".stripMargin)
    write(proj, "models/h1.sql", "select 1 as id\n")
    write(proj, "models/h2.sql", "select * from {{ ref('h1') }}\n")
    write(proj, "macros/log_results.sql",
      """{% macro log_results(results, schemas) %}
        |  {% set good = results | selectattr('status', 'equalto', 'success') | list %}
        |  create or replace view g_runhooks_audit.summary as
        |  select {{ good | length }} as n_success,
        |         {{ results | length }} as n_total,
        |         '{{ schemas | join(",") }}' as schemas
        |{% endmacro %}
        |""".stripMargin)
    val schema = "g_runhooks"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    spark.sql(s"DROP DATABASE IF EXISTS `${schema}_audit` CASCADE")
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema)
    r.run()
    // on-run-start ran before the models (view exists)
    assert(spark.sql("select ok from g_runhooks_audit.started").count() == 1)
    // on-run-end saw both results and the schema set
    val row = spark.sql(
      "select n_success, n_total, schemas from g_runhooks_audit.summary")
      .collect().head
    assert(row.getInt(0) == 2 && row.getInt(1) == 2)
    assert(row.getString(2) == schema)
  }

  test("--event-time-start/--event-time-end backfill exactly that window") {
    import spark.implicits._
    val a = graft.cli.Main.parseArgs(Array("run",
      "--event-time-start", "2026-01-02",
      "--event-time-end", "2026-01-04 00:00:00"))
    assert(a.eventTimeStart.contains("2026-01-02"))

    val proj = Files.createTempDirectory("graft_backfill")
    val dataDir = Files.createTempDirectory("graft_backfill_src")
    (1 to 6).map(d => (d.toLong,
      java.sql.Timestamp.valueOf(f"2026-01-0$d%d 10:00:00"), d * 10))
      .toDF("id", "ts", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dataDir/events.parquet")
    write(proj, "dbt_project.yml",
      "name: backfill\nmodel-paths: [\"models\"]\n")
    write(proj, "models/sources.yml",
      s"""version: 2
         |sources:
         |  - name: lake
         |    tables:
         |      - name: events
         |        config: {event_time: ts}
         |        external:
         |          location: "$dataDir/events.parquet"
         |""".stripMargin)
    write(proj, "models/daily.sql",
      """{{ config(materialized='incremental', incremental_strategy='microbatch',
        |   event_time='ts', batch_size='day', begin='2026-01-01 00:00:00',
        |   partition_by=['day']) }}
        |select id, ts, v, cast(ts as date) as day
        |from {{ source('lake', 'events') }}
        |""".stripMargin)
    val schema = "g_backfill"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    // backfill run with an explicit window builds ONLY days 2-3
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema,
      eventTimeStart = Some(java.sql.Timestamp.valueOf("2026-01-02 00:00:00")),
      eventTimeEnd = Some(java.sql.Timestamp.valueOf("2026-01-04 00:00:00")))
    val results = r.run()
    assert(results.forall(_.status == "success"), results.mkString("\n"))
    val days = spark.table(s"$schema.daily").select("day")
      .collect().map(_.getDate(0).toString).toSet
    assert(days == Set("2026-01-02", "2026-01-03"), days)
  }

  test("--event-time-start/--event-time-end backfill a MICROBATCH " +
      "PIPELINE window exactly, idempotent against settled state") {
    import spark.implicits._
    val proj = Files.createTempDirectory("graft_pipe_backfill")
    val dataDir = Files.createTempDirectory("graft_pipe_backfill_src")
    def stage(rows: Seq[(Long, String, String)]): Unit =
      rows.map { case (id, t, ts) =>
        (id, t, java.sql.Timestamp.valueOf(ts)) }
        .toDF("doc_id", "text", "ts").coalesce(1)
        .write.mode("overwrite").parquet(s"$dataDir/docs.parquet")
    val t1 = "alpha beta gamma delta epsilon zeta"
    val base = Seq(
      (1L, t1, "2026-01-01 10:00:00"),
      (2L, "day two body entirely its own", "2026-01-02 10:00:00"),
      (3L, "day three body also its own", "2026-01-03 10:00:00"))
    stage(base)
    write(proj, "dbt_project.yml",
      "name: pipebf\nmodel-paths: [\"models\"]\n")
    write(proj, "models/sources.yml",
      s"""version: 2
         |sources:
         |  - name: lake
         |    tables:
         |      - name: docs
         |        config: {event_time: ts}
         |        external:
         |          location: "$dataDir/docs.parquet"
         |""".stripMargin)
    write(proj, "models/cur.sql",
      "select doc_id, text, ts from {{ source('lake', 'docs') }}\n")
    write(proj, "models/schema.yml",
      """version: 2
        |models:
        |  - name: cur
        |    config:
        |      materialized: pipeline
        |      incremental: true
        |      unique_key: doc_id
        |      event_time: ts
        |      batch_size: day
        |      begin: '2026-01-01 00:00:00'
        |      steps:
        |        - op: exact_dedup
        |          text_col: text
        |          id_col: doc_id
        |""".stripMargin)
    val schema = "g_pipebf"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val loc = Files.createTempDirectory("graft_pipebf_wh").toString
    def runWith(start: Option[String], end: Option[String]): Unit = {
      val r = new Runner(spark, ProjectLoader.load(proj.toString),
        targetSchema = schema, warehouseLocation = Some(loc),
        eventTimeStart = start.map(java.sql.Timestamp.valueOf),
        eventTimeEnd = end.map(java.sql.Timestamp.valueOf))
      val bad = r.run().filter(_.status != "success")
      assert(bad.isEmpty, bad.mkString(" | "))
    }
    def ids() = spark.table(s"$schema.cur")
      .collect().map(_.getLong(0)).toSet
    runWith(None, None) // full build
    assert(ids() == Set(1L, 2L, 3L))
    // late data lands in BOTH day 2 (novel 20, dup-of-settled 21) and
    // day 3 (novel 30) — then backfill EXACTLY day 2: only 20 lands;
    // 21 drops against the settled index; day-3's 30 stays out because
    // the named window excludes it
    stage(base ++ Seq(
      (20L, "late novel day two content", "2026-01-02 20:00:00"),
      (21L, t1, "2026-01-02 21:00:00"),
      (30L, "late novel day three content", "2026-01-03 20:00:00")))
    runWith(Some("2026-01-02 00:00:00"), Some("2026-01-03 00:00:00"))
    assert(ids() == Set(1L, 2L, 3L, 20L),
      "backfill must land ONLY the named window's novel rows")
  }

  test("unit-test overrides.macros shadow prelude-defined macros") {
    val proj = Files.createTempDirectory("graft_unit_macro")
    write(proj, "dbt_project.yml",
      "name: utmacro\nmodel-paths: [\"models\"]\n")
    write(proj, "macros/bonus.sql",
      "{% macro bonus() %}100{% endmacro %}\n")
    write(proj, "models/base.sql", "select 1 as id\n")
    write(proj, "models/pay.sql",
      "select id, {{ bonus() }} as bonus from {{ ref('base') }}\n")
    write(proj, "models/schema.yml",
      """unit_tests:
        |  - name: ut_bonus_overridden
        |    model: pay
        |    given:
        |      - input: ref('base')
        |        rows:
        |          - {id: 7}
        |    expect:
        |      rows:
        |        - {id: 7, bonus: 5}
        |    overrides:
        |      macros:
        |        bonus: 5
        |""".stripMargin)
    val schema = "g_utmacro"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val results = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema).run()
    val ut = results.find(_.uniqueId == "unit_test.utmacro.ut_bonus_overridden")
    // passes ONLY if the override (5) shadowed the prelude macro (100)
    assert(ut.exists(_.status == "success"), results.mkString("\n"))
  }

  test("latest_version matching no declared version errors at resolve") {
    val proj = Files.createTempDirectory("graft_badlatest")
    write(proj, "dbt_project.yml",
      "name: badlatest\nmodel-paths: [\"models\"]\n")
    write(proj, "models/m_v1.sql", "select 1 as id\n")
    write(proj, "models/schema.yml",
      """models:
        |  - name: m
        |    latest_version: 3
        |    versions:
        |      - v: 1
        |""".stripMargin)
    assertThrows[IllegalArgumentException](
      new Runner(spark, ProjectLoader.load(proj.toString),
        targetSchema = "g_badlatest").resolved)
  }

  test("descriptions with non-doc Jinja pass through instead of failing") {
    val proj = Files.createTempDirectory("graft_descjinja")
    write(proj, "dbt_project.yml",
      "name: descdemo\nmodel-paths: [\"models\"]\n")
    write(proj, "models/m1.sql", "select 1 as id\n")
    write(proj, "models/schema.yml",
      """models:
        |  - name: m1
        |    description: "filters at {{ var('cutoff') }} — template example"
        |""".stripMargin)
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = "g_descjinja")
    assert(r.resolved.nodes("model.descdemo.m1").description
      .contains("{{ var('cutoff') }}"))
  }

  test("--fail-fast skips later levels after the first failure") {
    val proj = Files.createTempDirectory("graft_failfast")
    write(proj, "dbt_project.yml",
      "name: ffdemo\nmodel-paths: [\"models\"]\n")
    write(proj, "models/bad.sql", "select broken syntax from nowhere..\n")
    write(proj, "models/after.sql", "select * from {{ ref('bad') }}\n")
    write(proj, "models/independent.sql", "select 1 as id\n")
    val schema = "g_failfast"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema, threads = 1)
    val results = r.run(failFast = true)
      .map(x => x.uniqueId -> x).toMap
    assert(results("model.ffdemo.bad").status == "error")
    // downstream of the failure AND unrelated later work both skip
    assert(results("model.ffdemo.after").status == "skipped")
    val statuses = results.values.map(_.status).toSet
    assert(statuses.subsetOf(Set("error", "skipped", "success")))
    // nothing after the failing level ran as success except same-level peers
    assert(results("model.ffdemo.after").message.nonEmpty)
  }

  test("model access enforcement: private needs same group, protected same package") {
    def project(consumersYml: String): java.nio.file.Path = {
      val proj = Files.createTempDirectory("graft_access")
      write(proj, "dbt_project.yml",
        "name: accessdemo\nmodel-paths: [\"models\"]\n")
      write(proj, "models/secret.sql", "select 1 as id\n")
      write(proj, "models/reader.sql", "select * from {{ ref('secret') }}\n")
      write(proj, "models/schema.yml", consumersYml)
      proj
    }
    // private + different (absent) group on the consumer → resolve error
    val p1 = project(
      """groups:
        |  - name: finance
        |    owner: {name: fin-team}
        |models:
        |  - name: secret
        |    access: private
        |    group: finance
        |""".stripMargin)
    assertThrows[IllegalStateException](
      new Runner(spark, ProjectLoader.load(p1.toString),
        targetSchema = "g_access1").resolved)
    // same group on both sides → fine; groups land in the manifest
    val p2 = project(
      """groups:
        |  - name: finance
        |    owner: {name: fin-team, email: fin@corp.example}
        |models:
        |  - name: secret
        |    access: private
        |    group: finance
        |  - name: reader
        |    group: finance
        |""".stripMargin)
    val r2 = new Runner(spark, ProjectLoader.load(p2.toString),
      targetSchema = "g_access2")
    assert(r2.resolved.nodes.contains("model.accessdemo.reader"))
    assert(r2.resolved.groups("finance")("owner")
      .asInstanceOf[Map[String, Any]]("name") == "fin-team")
    // a declared groups block makes unknown group references an error
    val p4 = project(
      """groups:
        |  - name: finance
        |    owner: {name: fin-team}
        |models:
        |  - name: secret
        |    group: marketing
        |""".stripMargin)
    assertThrows[IllegalStateException](
      new Runner(spark, ProjectLoader.load(p4.toString),
        targetSchema = "g_access4").resolved)
    // protected within one package → fine (public too)
    val p3 = project(
      """models:
        |  - name: secret
        |    access: protected
        |""".stripMargin)
    assert(new Runner(spark, ProjectLoader.load(p3.toString),
      targetSchema = "g_access3").resolved.nodes.size >= 2)
  }

  test("dbt clone points this schema's models at --state relations") {
    import graft.cli.Main
    val proj = Files.createTempDirectory("graft_clone_cmd")
    write(proj, "dbt_project.yml",
      """name: clonedemo
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/m1.sql",
      "{{ config(materialized='table') }}\nselect 42 as answer\n")
    val prodSchema = "g_clone_prod"
    val devSchema = "g_clone_dev"
    Seq(prodSchema, devSchema).foreach(s =>
      spark.sql(s"DROP DATABASE IF EXISTS `$s` CASCADE"))
    val state = Files.createTempDirectory("graft_clone_state").toString
    // prod run records its manifest in the state dir
    assert(Main.run(spark, Main.Args(command = "run",
      projectDir = proj.toString, schema = prodSchema,
      state = Some(state))) == 0)
    java.nio.file.Files.copy(
      proj.resolve("target/manifest.json"),
      java.nio.file.Paths.get(state, "manifest.json"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // clone into the dev schema: view over the prod table
    assert(Main.run(spark, Main.Args(command = "clone",
      projectDir = proj.toString, schema = devSchema,
      state = Some(state))) == 0)
    val row = spark.sql(s"select answer from $devSchema.m1").collect().head
    assert(row.getInt(0) == 42 || row.getLong(0) == 42L)
    assert(spark.catalog.getTable(devSchema, "m1").tableType == "VIEW")
  }

  test("seed delimiter config loads non-comma csv") {
    import graft.core.NodeConfig
    val dir = Files.createTempDirectory("graft_seed_delim")
    Files.writeString(dir.resolve("pipe.csv"),
      "id|name|amount\n1|alpha|10.5\n2|beta|20.0\n")
    val df = graft.mat.SeedMat.load(spark,
      dir.resolve("pipe.csv").toString,
      NodeConfig(delimiter = Some("|"),
        columnTypes = Map("amount" -> "decimal(10,2)")))
    assert(df.columns.toSeq == Seq("id", "name", "amount"))
    assert(df.count() == 2)
    assert(df.schema("amount").dataType.typeName.startsWith("decimal"))
  }

  test("CLI arg parsing: run-operation <macro> --args dict") {
    val a = graft.cli.Main.parseArgs(Array(
      "run-operation", "make_audit", "--args", "{schema_name: s1, n: 5}"))
    assert(a.command == "run-operation")
    assert(a.macroName.contains("make_audit"))
    assert(a.macroArgs("schema_name") == "s1")
  }

  test("versioned models: ref() → latest, ref(v=N) pins, _vN aliases") {
    val proj = Files.createTempDirectory("graft_mver")
    write(proj, "dbt_project.yml",
      """name: verdemo
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/dim_v1.sql", "select 1 as id, 'one' as label\n")
    write(proj, "models/dim_v2.sql",
      "select 1 as id, 'one' as label, 'x' as extra\n")
    write(proj, "models/schema.yml",
      """models:
        |  - name: dim
        |    latest_version: 2
        |    versions:
        |      - v: 1
        |      - v: 2
        |""".stripMargin)
    write(proj, "models/use_latest.sql",
      "select count(*) as n, max(extra) as e from {{ ref('dim') }}\n")
    write(proj, "models/use_pinned.sql",
      "select count(*) as n from {{ ref('dim', v=1) }}\n")
    val schema = "g_mver"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema)
    // unique ids carry the version; both versions materialize as _vN
    assert(r.resolved.nodes.contains("model.verdemo.dim.v1"))
    assert(r.resolved.nodes.contains("model.verdemo.dim.v2"))
    assert(!r.resolved.nodes.contains("model.verdemo.dim_v1"))
    val results = r.run()
    assert(results.forall(_.status == "success"), results.mkString("\n"))
    assert(spark.table(s"$schema.dim_v1").columns.length == 2)
    assert(spark.table(s"$schema.dim_v2").columns.length == 3)
    // ref('dim') saw v2 (has `extra`); ref('dim', v=1) saw v1
    assert(spark.table(s"$schema.use_latest").collect().head.getString(1) == "x")
    assert(spark.table(s"$schema.use_pinned").collect().head.getLong(0) == 1L)
    // version selector method reads config.extra
    val v1 = r.resolved.nodes("model.verdemo.dim.v1")
    assert(v1.config.extra("version") == "1")
    assert(v1.config.extra("latest_version") == "2")
  }

  test("YAML unit_tests: given fixtures, csv format, expect, overrides") {
    val proj = Files.createTempDirectory("graft_unit")
    write(proj, "dbt_project.yml",
      """name: unitdemo
        |model-paths: ["models"]
        |vars:
        |  cutoff: 999
        |""".stripMargin)
    write(proj, "models/base.sql", "select 1 as id, 10 as amount\n")
    write(proj, "models/scored.sql",
      """select id, amount * 2 as doubled
        |from {{ ref('base') }}
        |where amount >= {{ var('cutoff') }}
        |""".stripMargin)
    write(proj, "models/schema.yml",
      """unit_tests:
        |  - name: ut_scored_doubles
        |    model: scored
        |    given:
        |      - input: ref('base')
        |        format: csv
        |        rows: |
        |          id,amount
        |          1,5
        |          2,7
        |          3,2
        |    expect:
        |      rows:
        |        - {id: 1, doubled: 10}
        |        - {id: 2, doubled: 14}
        |    overrides:
        |      vars:
        |        cutoff: 5
        |""".stripMargin)
    val schema = "g_unit"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema)
    val results = r.run()
    val ut = results.find(_.uniqueId == "unit_test.unitdemo.ut_scored_doubles")
    assert(ut.exists(_.status == "success"), results.mkString("\n"))
    // a wrong expectation fails: run again with cutoff var NOT overridden
    // (project cutoff=999 filters everything, expect is then wrong)
    write(proj, "models/schema.yml",
      """unit_tests:
        |  - name: ut_scored_doubles
        |    model: scored
        |    given:
        |      - input: ref('base')
        |        rows:
        |          - {id: 1, amount: 5}
        |    expect:
        |      rows:
        |        - {id: 1, doubled: 10}
        |""".stripMargin)
    val r2 = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema)
    val res2 = r2.run()
    val ut2 = res2.find(_.uniqueId == "unit_test.unitdemo.ut_scored_doubles")
    assert(ut2.exists(_.status == "fail"), ut2.toString)
    // dbt build gating: the unit test runs BEFORE the model; its failure
    // skips the model build
    assert(res2.find(_.uniqueId == "model.unitdemo.scored")
      .exists(_.status == "skipped"), res2.mkString("\n"))
  }

  test("--empty builds models with the full schema and zero rows") {
    val proj = Files.createTempDirectory("graft_empty")
    write(proj, "dbt_project.yml",
      """name: emptydemo
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/base.sql", "select 1 as id, 'x' as label\n")
    write(proj, "models/agg.sql",
      "select count(*) as n, max(label) as ml from {{ ref('base') }}\n")
    val schema = "g_empty"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema, emptyMode = true)
    val results = r.run()
    assert(results.forall(_.status == "success"), results.mkString("\n"))
    // base has no refs → still built (its own SELECT is untouched); agg
    // read base through LIMIT 0, so count(*) ran over zero input rows
    assert(spark.table(s"$schema.agg").columns.toSeq == Seq("n", "ml"))
    val row = spark.table(s"$schema.agg").collect().head
    assert(row.getLong(0) == 0L && row.isNullAt(1))
  }

  test("--vars overlays project and package vars with highest precedence") {
    val a = graft.cli.Main.parseArgs(Array(
      "run", "--vars", "{cutoff: 42, label: hot}"))
    assert(a.cliVars == Map("cutoff" -> 42L, "label" -> "hot"))

    val proj = Files.createTempDirectory("graft_vars")
    write(proj, "dbt_project.yml",
      """name: varsdemo
        |model-paths: ["models"]
        |vars:
        |  cutoff: 1
        |  keep: base
        |""".stripMargin)
    write(proj, "models/v1.sql",
      "select {{ var('cutoff') }} as cutoff, '{{ var('keep') }}' as keep\n")
    val schema = "g_vars"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val project = ProjectLoader.load(proj.toString)
      .withCliVars(Map("cutoff" -> 42L))
    new Runner(spark, project, targetSchema = schema).run()
    val row = spark.sql(s"select cutoff, keep from $schema.v1").collect().head
    // CLI wins on collision; untouched project vars survive
    assert(row.get(0).toString == "42" && row.getString(1) == "base")
  }

  test("graph variable exposes the flat node/source maps to macros") {
    val proj = Files.createTempDirectory("graft_graphvar")
    write(proj, "dbt_project.yml",
      """name: gdemo
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/sources.yml",
      """version: 2
        |sources:
        |  - name: raw
        |    schema: raw_schema
        |    tables: [{name: events}]
        |""".stripMargin)
    write(proj, "models/a.sql", "{{ config(tags=['gold']) }}\nselect 1 as id")
    write(proj, "models/b.sql", "select id from {{ ref('a') }}")
    write(proj, "macros/walk.sql",
      // the dbt-utils shape: filter graph.nodes.values() by resource
      // type + tag, then read sources through graph.sources
      """{% macro walk() %}
        |{% set golds = [] %}
        |{% for n in graph.nodes.values() %}
        |  {% if n.resource_type == 'model' and 'gold' in n.tags %}
        |    {% do golds.append(n.unique_id) %}
        |  {% endif %}
        |{% endfor %}
        |{{ return(golds | join(',') ~ ' | ' ~
        |   graph.sources.values() | map(attribute='relation_name') | join(',')) }}
        |{% endmacro %}
        |""".stripMargin)
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = "g_graphvar")
    val out = r.runOperation("walk")
    assert(out.startsWith("model.gdemo.a | "))
    assert(out.contains("raw_schema") && out.contains("events"))
    // dict methods exist alongside key lookup
    assert(Jinja.render("{{ d.items() | length }},{{ d.keys() | join('') }}," +
      "{{ d.get('x', 9) }},{{ d.get('a') }}",
      Map("d" -> Map("a" -> 1L, "b" -> 2L))) == "2,ab,9,1")
  }

  test("generic tests bind to sources and seeds, not just models") {
    val proj = Files.createTempDirectory("graft_srctests")
    write(proj, "dbt_project.yml",
      """name: srct
        |model-paths: ["models"]
        |seed-paths: ["seeds"]
        |""".stripMargin)
    val data = Files.createTempDirectory("graft_srct_data").resolve("raw.parquet")
    import spark.implicits._
    Seq(Some(1), Some(1), None).toDF("id").write.parquet(data.toString)
    write(proj, "models/sources.yml",
      s"""version: 2
         |sources:
         |  - name: lake
         |    tables:
         |      - name: raw
         |        external: {location: "$data"}
         |        columns:
         |          - name: id
         |            tests:
         |              - unique:
         |                  config: {severity: warn}
         |              - not_null:
         |                  config: {severity: warn}
         |""".stripMargin)
    write(proj, "seeds/lookup.csv", "code,label\nA,alpha\nA,dup\n")
    write(proj, "seeds/schema.yml",
      """version: 2
        |seeds:
        |  - name: lookup
        |    columns:
        |      - name: code
        |        tests:
        |          - unique:
        |              config: {severity: warn}
        |""".stripMargin)
    val schema = "g_srctests"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema,
      warehouseLocation =
        Some(Files.createTempDirectory("graft_srct_wh").toString))
    val results = r.run()
    val byId = results.map(x => x.uniqueId -> x).toMap
    // source tests read the external relation directly
    assert(byId("test.srct.unique_lake_raw_id").status == "warn")   // dup 1
    assert(byId("test.srct.unique_lake_raw_id").message == "failures=1")
    assert(byId("test.srct.not_null_lake_raw_id").status == "warn") // one null
    // seed tests run AFTER the seed loads (DAG edge through seed uid)
    assert(byId("test.srct.unique_lookup_code").status == "warn")
    assert(byId("test.srct.unique_lookup_code").message == "failures=1")
    // selection: source:lake picks up the source's tests directly
    assert(r.selectIds(Some("source:lake"), indirectSelection = "empty") ==
      Set("test.srct.unique_lake_raw_id", "test.srct.not_null_lake_raw_id"))
  }

  test("source freshness --select narrows to the chosen sources") {
    val proj = Files.createTempDirectory("graft_freshsel")
    write(proj, "dbt_project.yml",
      """name: fsel
        |model-paths: ["models"]
        |""".stripMargin)
    // two file-backed sources with metadata freshness (file mtime)
    val dataA = Files.createTempDirectory("graft_fsel_a").resolve("a.parquet")
    val dataB = Files.createTempDirectory("graft_fsel_b").resolve("b.parquet")
    import spark.implicits._
    Seq(1, 2).toDF("id").write.parquet(dataA.toString)
    Seq(3).toDF("id").write.parquet(dataB.toString)
    write(proj, "models/sources.yml",
      s"""version: 2
         |sources:
         |  - name: lakea
         |    freshness: {warn_after: {count: 9999, period: hour}}
         |    tables:
         |      - name: ta
         |        external: {location: "$dataA"}
         |  - name: lakeb
         |    freshness: {warn_after: {count: 9999, period: hour}}
         |    tables:
         |      - name: tb
         |        external: {location: "$dataB"}
         |""".stripMargin)
    def freshOut(extra: String*): Seq[String] = {
      val bos = new java.io.ByteArrayOutputStream
      Console.withOut(new java.io.PrintStream(bos)) {
        graft.cli.Main.run(spark, graft.cli.Main.parseArgs(Array(
          "source-freshness", "--project-dir", proj.toString) ++ extra))
      }
      bos.toString.linesIterator.toSeq.flatMap(_.split("\\s+")
        .find(_.startsWith("source.")))
    }
    assert(freshOut() == Seq("source.lakea.ta", "source.lakeb.tb"))
    assert(freshOut("--select", "source:lakea") == Seq("source.lakea.ta"))
    assert(freshOut("--select", "source:lakeb.tb") == Seq("source.lakeb.tb"))
    assert(freshOut("--select", "source:lake*.t*")
      == Seq("source.lakea.ta", "source.lakeb.tb"))
  }

  test("store_failures_as view: every builtin SQL twin runs and matches") {
    val proj = Files.createTempDirectory("graft_sfview")
    write(proj, "dbt_project.yml",
      """name: sfv
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/parent.sql",
      "{{ config(materialized='table') }}\n" +
        "select 1 as pid union all select 2 as pid")
    write(proj, "models/child.sql",
      "{{ config(materialized='table') }}\n" +
        "select * from values (1, 'a'), (1, 'b'), (2, 'x'), (3, 'x'), " +
        "(null, 'z') as t(pid, grp)")
    write(proj, "models/schema.yml",
      """version: 2
        |models:
        |  - name: child
        |    columns:
        |      - name: pid
        |        tests:
        |          - unique:
        |              config: {severity: warn, store_failures_as: view}
        |          - not_null:
        |              config: {severity: warn, store_failures_as: view}
        |          - relationships:
        |              to: ref('parent')
        |              field: pid
        |              config: {severity: warn, store_failures_as: view}
        |      - name: grp
        |        tests:
        |          - accepted_values:
        |              values: ['a', 'b']
        |              config: {severity: warn, store_failures_as: view}
        |""".stripMargin)
    val schema = "g_sfview"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    spark.sql(s"DROP DATABASE IF EXISTS `${schema}_failures` CASCADE")
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema,
      warehouseLocation =
        Some(Files.createTempDirectory("graft_sfview_wh").toString))
    val bad = r.run().filter(_.status == "error")
    assert(bad.isEmpty, bad.mkString(" | "))
    def viewCount(name: String): Long =
      spark.table(s"`${schema}_failures`.`$name`").count()
    assert(viewCount("unique_child_pid") == 1)        // pid 1 duplicated
    assert(viewCount("not_null_child_pid") == 1)      // one null pid
    assert(viewCount("relationships_child_pid") == 1) // pid 3 unparented
    assert(viewCount("accepted_values_child_grp") == 2) // 'x' and 'z'
    // all four persisted as catalog VIEWs, not snapshots
    Seq("unique_child_pid", "not_null_child_pid", "relationships_child_pid",
      "accepted_values_child_grp").foreach { v =>
      assert(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(v,
          Some(schema + "_failures"))).tableType.name == "VIEW", v)
    }
  }

  test("--warn-error promotes warn statuses and funcsign warnings to failures") {
    import graft.cli.Main
    val proj = Files.createTempDirectory("graft_warnerr")
    write(proj, "dbt_project.yml",
      """name: wedemo
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/m.sql", "select 1 as id union all select 1 as id\n")
    write(proj, "models/schema.yml",
      """version: 2
        |models:
        |  - name: m
        |    columns:
        |      - name: id
        |        tests:
        |          - unique:
        |              config: {severity: warn}
        |""".stripMargin)
    val schema = "g_warnerr"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    spark.sql(s"DROP DATABASE IF EXISTS `${schema}_failures` CASCADE")
    val base = Array("build", "--project-dir", proj.toString,
      "--schema", schema)
    // duplicate ids at warn severity: clean exit without the flag
    assert(Main.run(spark, Main.parseArgs(base)) == 0)
    // --warn-error: the same warn is a failure (io_args.rs:335)
    assert(Main.run(spark, Main.parseArgs(base :+ "--warn-error")) == 1)
    // a funcsign warning fails the load under --warn-error, before
    // anything executes
    write(proj, "macros/sig.sql",
      "-- funcsign: (col: string) -> string\n" +
        "{% macro shout(col) %}upper({{ col }}){% endmacro %}\n")
    // wrong literal type: funcsign warns, but the macro still renders
    // and the SQL still runs — only --warn-error makes it fatal
    write(proj, "models/uses.sql", "select {{ shout(123) }} as s\n")
    assert(Main.run(spark, Main.parseArgs(base)) == 0)
    assert(Main.run(spark, Main.parseArgs(base :+ "--warn-error")) == 1)
  }

  test("source_status:fresher parses ISO-8601 max_loaded_at from " +
      "dbt-written artifacts, not just 'yyyy-MM-dd HH:mm:ss'") {
    val proj = Files.createTempDirectory("graft_fresher_iso")
    write(proj, "dbt_project.yml",
      """name: fiso
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/m.sql", "select 1 as x\n")
    def artifact(dir: Path, stamps: Map[String, String]): Unit =
      write(dir, "sources.json",
        """{"results": [""" + stamps.map { case (uid, ts) =>
          s"""{"unique_id": "$uid", "max_loaded_at": "$ts"}"""
        }.mkString(", ") + "]}")
    val state = Files.createTempDirectory("graft_fresher_state")
    val cur = Files.createTempDirectory("graft_fresher_cur")
    // mixed-tool state: dbt writes ISO-8601 with 'T' and zone suffix
    artifact(state, Map(
      "source.p.a" -> "2025-01-01T00:00:00+00:00",
      "source.p.b" -> "2025-06-01T12:00:00Z"))
    artifact(cur, Map(
      "source.p.a" -> "2025-03-02 00:00:00",       // newer → fresher
      "source.p.b" -> "2025-06-01T12:00:00Z"))      // equal → not fresher
    // the zone-less SPACE form must anchor at UTC like the ISO forms —
    // '2025-06-01 12:00:00' ≡ '2025-06-01T12:00:00Z' regardless of the
    // JVM default zone, or the same logical stamp from two tools would
    // falsely select (or skip) the source
    locally {
      val state2 = Files.createTempDirectory("graft_fresher_tzs")
      val cur2 = Files.createTempDirectory("graft_fresher_tzc")
      artifact(state2, Map("source.p.b" -> "2025-06-01T12:00:00Z"))
      artifact(cur2, Map("source.p.b" -> "2025-06-01 12:00:00"))
      val rz = new Runner(spark, ProjectLoader.load(proj.toString),
        targetSchema = "g_fiso", stateDir = Some(state2.toString),
        currentSourcesJson = Some(cur2.resolve("sources.json").toString))
      assert(rz.fresherSources() == Some(Set.empty[String]),
        "equal stamps across formats must not read as fresher")
    }
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = "g_fiso", stateDir = Some(state.toString),
      currentSourcesJson = Some(cur.resolve("sources.json").toString))
    assert(r.fresherSources() == Some(Set("source.p.a")))
    // garbage still fails with the method's NAMED error
    artifact(cur, Map("source.p.a" -> "not-a-timestamp"))
    val r2 = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = "g_fiso", stateDir = Some(state.toString),
      currentSourcesJson = Some(cur.resolve("sources.json").toString))
    val e = intercept[IllegalStateException] { r2.fresherSources() }
    assert(e.getMessage.contains("max_loaded_at"))
  }

  test("run_started_at is invocation-constant: every node and hook of " +
      "one run sees the Runner's pinned `now`, not per-context clocks") {
    val proj = Files.createTempDirectory("graft_runstarted")
    write(proj, "dbt_project.yml",
      """name: rsat
        |model-paths: ["models"]
        |models:
        |  rsat:
        |    +post-hook: "create or replace view
        |      {{ this.schema }}.hook_stamp_{{ this.identifier }} as
        |      select '{{ run_started_at.isoformat() }}' as stamp"
        |""".stripMargin)
    write(proj, "models/a.sql",
      "select '{{ run_started_at.isoformat() }}' as stamp\n")
    write(proj, "models/b.sql",
      "select '{{ run_started_at.isoformat() }}' as stamp\n")
    val schema = "g_rsat"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    // a pinned `now` deliberately in the past: any context that falls
    // back to its own construction-time clock renders a different stamp
    val pinned = java.sql.Timestamp.valueOf("2025-05-14 09:02:03")
    val r = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema, now = pinned)
    val bad = r.run().filter(_.status != "success")
    assert(bad.isEmpty, bad.mkString("; "))
    val expect = "2025-05-14T09:02:03"
    for (t <- Seq("a", "b", "hook_stamp_a", "hook_stamp_b")) {
      val v = spark.sql(s"select stamp from $schema.$t").collect()(0).getString(0)
      assert(v == expect, s"$t: $v != $expect")
    }
  }
}
