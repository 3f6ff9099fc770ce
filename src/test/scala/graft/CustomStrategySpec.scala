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

  test("merge_aggregate: min/max merge, config and schema validation") {
    import spark.implicits._
    import graft.adapter.SparkAdapter
    import graft.core._
    import graft.mat.{IncrementalMat, MatContext}
    val loc = Files.createTempDirectory("graft_magg").toString
    spark.sql("DROP DATABASE IF EXISTS g_magg CASCADE")
    val a = new SparkAdapter(spark, "g_magg", Some(loc))
    val rel = graft.core.Relation("g_magg", "extremes")
    def cfg(extra: Map[String, Any]) = NodeConfig(
      materialized = "incremental",
      incrementalStrategy = Some(IncrementalStrategy.MergeAggregate),
      uniqueKey = Seq("k"), extra = extra)
    val good = cfg(Map("aggregate_columns" ->
      Map("lo" -> "min", "hi" -> "max")))
    val n = Node(uniqueId = "model.t.extremes", name = "extremes",
      packageName = "t", kind = NodeKind.Model, config = good)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val b1 = Seq(("a", 5L, 5L), ("b", 9L, 9L)).toDF("k", "lo", "hi")
    val b2 = Seq(("a", 2L, 7L), ("c", 1L, 1L)).toDF("k", "lo", "hi")
    IncrementalMat.run(MatContext(a, n, rel, () => b1, false, t0))
    IncrementalMat.run(MatContext(a, n, rel, () => b2, false, t0))
    val got = a.read(rel).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("a" -> ((2L, 7L)), "b" -> ((9L, 9L)),
      "c" -> ((1L, 1L))))

    def rerun(c: NodeConfig, df: org.apache.spark.sql.DataFrame) =
      IncrementalMat.run(MatContext(a,
        n.copy(config = c), rel, () => df, false, t0))
    // unknown merge fn
    intercept[IllegalArgumentException] {
      rerun(cfg(Map("aggregate_columns" -> Map("lo" -> "avg"))), b2)
    }
    // missing aggregate_columns
    intercept[IllegalArgumentException] { rerun(cfg(Map.empty), b2) }
    // schema mismatch: a configured aggregate column the model never
    // emits (a stray model column is on_schema_change's turf instead —
    // Ignore aligns it away before the strategy runs)
    intercept[IllegalArgumentException] {
      rerun(cfg(Map("aggregate_columns" ->
        Map("lo" -> "min", "hi" -> "max", "nope" -> "sum"))), b2)
    }
    // missing unique_key
    intercept[IllegalArgumentException] {
      rerun(good.copy(uniqueKey = Nil), b2)
    }
    // hash_buckets is a keyed-rewrite layout — the state table regroups
    // fully, so the combination errors by name, not via a misleading
    // schema-check message
    val e = intercept[IllegalArgumentException] {
      rerun(cfg(Map("aggregate_columns" -> Map("lo" -> "min"),
        "hash_buckets" -> 8)), b2)
    }
    assert(e.getMessage.contains("hash_buckets"))
  }
}
