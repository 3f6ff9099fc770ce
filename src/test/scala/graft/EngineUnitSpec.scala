package graft

import graft.core._
import graft.mat.{MicrobatchRunner, TestMat}
import graft.resolve.Resolver
import org.scalatest.funsuite.AnyFunSuite

class EngineUnitSpec extends AnyFunSuite {

  test("relation fqn quoting") {
    assert(Relation("analytics", "orders").fqn == "analytics.orders")
    assert(Relation("an-schema", "my table").fqn == "`an-schema`.`my table`")
    assert(Relation(Some("cat"), "s", "t").fqn == "cat.s.t")
    assert(Relation("s", "t").intermediate.identifier == "t__dbt_tmp")
    assert(Relation("s", "t").backup.identifier == "t__dbt_backup")
  }

  test("threshold expressions") {
    assert(TestMat.evalThreshold(5, "!= 0"))
    assert(!TestMat.evalThreshold(0, "!= 0"))
    assert(TestMat.evalThreshold(11, "> 10"))
    assert(!TestMat.evalThreshold(10, "> 10"))
    assert(TestMat.evalThreshold(10, ">= 10"))
    assert(TestMat.evalThreshold(3, "< 5"))
    assert(TestMat.evalThreshold(7, "= 7"))
    assertThrows[IllegalArgumentException](TestMat.evalThreshold(1, "bogus"))
  }

  test("builtin macros render and a later (root) definition overrides") {
    import graft.jinja.Jinja
    val builtin = graft.funcs.BuiltinMacros.prelude
    val sql = Jinja.render(builtin +
      "\nSELECT {{ graft_token_count('text') }} AS n", Map.empty).trim
    assert(sql.contains("size(split(trim(text), ' +'))"), sql)
    assert(Jinja.render(builtin +
      "\n{{ graft_lang_id('text') }}", Map.empty).contains("'und'"))
    assert(Jinja.render(builtin +
      "\n{{ graft_mask_pii('text') }}", Map.empty).contains("<EMAIL>"))
    val ratio = Jinja.render(builtin +
      "\n{{ graft_stopword_ratio('text') }}", Map.empty)
    assert(ratio.contains("'the'") && ratio.contains("CAST"), ratio)
    // builtin generic tests render with their kwargs bound
    val kan = Jinja.render(builtin +
      "\n{{ test_k_anonymous('s.t', 'c', k=3) }}", Map.empty)
    assert(kan.contains("HAVING count(*) < 3") && kan.contains("FROM s.t"),
      kan)
    val bf = Jinja.render(builtin +
      "\n{{ test_benford_plausible('s.t', 'v', tolerance=0.1) }}",
      Map.empty)
    assert(bf.contains("> 0.1") && bf.contains("log10"), bf)
    // Root > Core: a project macro of the same name, rendered AFTER the
    // builtin prelude (the Runner/Resolver concatenation order), wins
    val overridden = Jinja.render(builtin +
      "\n{% macro graft_token_count(col) %}custom({{ col }})" +
      "{% endmacro %}\nSELECT {{ graft_token_count('t') }}",
      Map.empty).trim
    assert(overridden == "SELECT custom(t)", overridden)
  }

  test("csv fixture line splitting") {
    import graft.mat.UnitTestMat.splitCsvLine
    assert(splitCsvLine("a,b,c") == Seq("a", "b", "c"))
    assert(splitCsvLine("1, two ,3") == Seq("1", "two", "3"))
    assert(splitCsvLine("\"a,b\",c") == Seq("a,b", "c"))
    assert(splitCsvLine("\"say \"\"hi\"\"\",x") == Seq("say \"hi\"", "x"))
    assert(splitCsvLine("a,,c") == Seq("a", "", "c"))
  }

  test("metadata freshness: file mtime stands in for max(loaded_at)") {
    import graft.mat.Freshness
    import java.nio.file.{Files, attribute}
    val dir = Files.createTempDirectory("graft_fresh")
    val f1 = Files.writeString(dir.resolve("part-0.parquet"), "x")
    val f2 = Files.writeString(dir.resolve("part-1.parquet"), "y")
    val success = Files.writeString(dir.resolve("_SUCCESS"), "")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def setM(p: java.nio.file.Path, ts: String) = Files.setLastModifiedTime(p,
      attribute.FileTime.fromMillis(java.sql.Timestamp.valueOf(ts).getTime))
    setM(f1, "2023-12-31 00:00:00")
    setM(f2, "2023-12-31 18:00:00") // newest data file → the loaded-at
    setM(success, "2024-01-01 00:00:00") // marker files don't count
    val r = Freshness.checkMetadata(dir.toString, t0,
      warnAfter = Some((5L, "hour")), errorAfter = Some((2L, "day")))
    assert(r.maxLoadedAt.contains(java.sql.Timestamp.valueOf("2023-12-31 18:00:00")))
    assert(r.status == "warn") // 6h old: past warn (5h), inside error (2d)
    assert(Freshness.checkMetadata(dir.toString, t0,
      Some((12L, "hour")), Some((2L, "day"))).status == "pass")
    assert(Freshness.checkMetadata(dir.toString,
      java.sql.Timestamp.valueOf("2024-01-03 00:00:00"),
      Some((12L, "hour")), Some((2L, "day"))).status == "error")
    assertThrows[IllegalArgumentException](
      Freshness.checkMetadata("/nonexistent/path", t0, None, None))
  }

  test("enum parsing round-trips") {
    assert(IncrementalStrategy.parse("delete+insert") == IncrementalStrategy.DeleteInsert)
    assert(OnSchemaChange.parse("append_new_columns") == OnSchemaChange.AppendNewColumns)
    assert(HardDeletes.parse("new_record") == HardDeletes.NewRecord)
    assert(BatchSize.parse("month") == BatchSize.Month)
    // unknown names parse as Custom (dbt-style: a user macro
    // get_incremental_upsert_sql resolves them; missing macro errors at run)
    assert(IncrementalStrategy.parse("upsert") == IncrementalStrategy.Custom("upsert"))
  }

  test("microbatch window computation: first run from begin") {
    val bs = MicrobatchRunner.batches(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-04 00:00:00"),
      BatchSize.Day, lookback = 1, lastRunEnd = None)
    assert(bs.map(_.start.toString.take(10)) == Seq("2024-01-01", "2024-01-02", "2024-01-03"))
    assert(bs.head.end == java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
  }

  test("microbatch window computation: lookback reopens completed batches") {
    val bs = MicrobatchRunner.batches(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-06 00:00:00"),
      BatchSize.Day, lookback = 2,
      lastRunEnd = Some(java.sql.Timestamp.valueOf("2024-01-04 00:00:00")))
    // restart 2 days before Jan 4 → Jan 2,3,4,5
    assert(bs.map(_.start.toString.take(10)) ==
      Seq("2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05"))
  }

  test("microbatch hour granularity truncates correctly") {
    val bs = MicrobatchRunner.batches(
      java.sql.Timestamp.valueOf("2024-01-01 05:30:00"),
      java.sql.Timestamp.valueOf("2024-01-01 08:00:00"),
      BatchSize.Hour, lookback = 0, lastRunEnd = None)
    assert(bs.map(_.start.toString.substring(11, 13)) == Seq("05", "06", "07"))
  }

  test("config tree walking scopes by directory path") {
    val tree = Map(
      "+materialized" -> "view",
      "demo" -> Map(
        "staging" -> Map("+tags" -> Vector("stg")),
        "marts" -> Map("+materialized" -> "table")))
    val stg = Resolver.projectTreeConfig(tree, Seq("demo", "staging"))
    assert(stg("materialized") == "view")
    assert(stg("tags") == Vector("stg"))
    val mart = Resolver.projectTreeConfig(tree, Seq("demo", "marts"))
    assert(mart("materialized") == "table")
    assert(!mart.contains("tags"))
  }

  test("toNodeConfig maps the full surface") {
    val cfg = Resolver.toNodeConfig(Map(
      "materialized" -> "incremental",
      "incremental_strategy" -> "merge",
      "unique_key" -> Vector("id", "ts"),
      "merge_exclude_columns" -> "created_at",
      "on_schema_change" -> "sync_all_columns",
      "partition_by" -> "event_date",
      "tags" -> Vector("hourly"),
      "severity" -> "warn",
      "warn_if" -> "> 5"))
    assert(cfg.materialized == "incremental")
    assert(cfg.incrementalStrategy.contains(IncrementalStrategy.Merge))
    assert(cfg.uniqueKey == Seq("id", "ts"))
    assert(cfg.mergeExcludeColumns == Seq("created_at"))
    assert(cfg.onSchemaChange == OnSchemaChange.SyncAllColumns)
    assert(cfg.partitionBy == Seq("event_date"))
    assert(cfg.severity == Severity.Warn)
    assert(cfg.warnIf == "> 5")
  }

  test("store_failures_as precedence over store_failures (common.rs:1007)") {
    import graft.core.NodeConfig
    // ephemeral disables persistence even with store_failures: true
    assert(NodeConfig(storeFailures = true,
      storeFailuresAs = Some("ephemeral")).effectiveStoreFailures.isEmpty)
    // table/view enable it even without store_failures
    assert(NodeConfig(storeFailuresAs = Some("view"))
      .effectiveStoreFailures.contains("view"))
    assert(NodeConfig(storeFailuresAs = Some("table"))
      .effectiveStoreFailures.contains("table"))
    // legacy store_failures: true defaults to a table
    assert(NodeConfig(storeFailures = true)
      .effectiveStoreFailures.contains("table"))
    assert(NodeConfig().effectiveStoreFailures.isEmpty)
    // unknown kinds are a named config error
    val e = intercept[IllegalArgumentException](
      Resolver.toNodeConfig(Map("store_failures_as" -> "parquet")))
    assert(e.getMessage.contains("ephemeral|table|view"))
  }
}
