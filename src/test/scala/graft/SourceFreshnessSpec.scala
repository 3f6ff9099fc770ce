package graft

import graft.project.ProjectLoader
import graft.run.Runner
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** `dbt source freshness` path (reference: MA/adapters/freshness.sql +
  * metadata/mod.rs:96): freshness blocks parse with table-over-source
  * precedence; loaded_at_field sources check max(loaded_at), sources
  * without one fall back to file mtime; results land in sources.json. */
class SourceFreshnessSpec extends AnyFunSuite {

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

  test("loaded_at and metadata freshness run per source; skips are explicit") {
    import spark.implicits._
    // a parquet source with a loaded_at column, frozen in time
    val dataDir = Files.createTempDirectory("graft_sf_data")
    Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2026-01-03 12:00:00")))
      .toDF("id", "loaded_at").coalesce(1)
      .write.mode("overwrite").parquet(s"$dataDir/rows.parquet")

    val proj = Files.createTempDirectory("graft_sf_proj")
    write(proj, "dbt_project.yml",
      """name: freshdemo
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/sources.yml",
      s"""version: 2
         |sources:
         |  - name: lake
         |    loaded_at_field: loaded_at
         |    freshness:
         |      warn_after: {count: 12, period: hour}
         |      error_after: {count: 7, period: day}
         |    tables:
         |      - name: with_field
         |        external:
         |          location: "$dataDir/rows.parquet"
         |      - name: by_mtime
         |        loaded_at_field: ""
         |        freshness:
         |          warn_after: {count: 1000000, period: hour}
         |        external:
         |          location: "$dataDir/rows.parquet"
         |      - name: no_freshness
         |        freshness: null
         |        external:
         |          location: "$dataDir/rows.parquet"
         |""".stripMargin)
    val runner = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = "g_sf_spec")
    // freshness config parsing: table-level empty loaded_at_field falls
    // back to... the SOURCE-level default, so blank it via empty string →
    // treated as absent below; no_freshness has no block at all
    val f = runner.resolved.sourceFreshness
    assert(f.contains(("lake", "with_field")))
    assert(f(("lake", "with_field")).loadedAtField.contains("loaded_at"))
    assert(f(("lake", "with_field")).warnAfter.contains((12L, "hour")))
    assert(f(("lake", "with_field")).errorAfter.contains((7L, "day")))
    // freshness: null at table level opts out of the inherited block
    assert(!f.contains(("lake", "no_freshness")))

    val now = java.sql.Timestamp.valueOf("2026-01-04 01:00:00")
    val results = runner.sourceFreshness(now).toMap
    // 13h after the newest loaded_at → past warn (12h), inside error (7d)
    val withField = results("source.lake.with_field").toOption.get
    assert(withField.maxLoadedAt
      .contains(java.sql.Timestamp.valueOf("2026-01-03 12:00:00")))
    assert(withField.status == "warn")
    // mtime path: files written moments ago, window enormous → pass
    val byMtime = results("source.lake.by_mtime").toOption.get
    assert(byMtime.status == "pass")
    assert(!results.contains("source.lake.no_freshness"))

    val out = Files.createTempDirectory("graft_sf_out").resolve("sources.json")
    runner.writeSourceFreshness(out.toString, runner.sourceFreshness(now))
    val parsed = graft.jinja.Json.parse(Files.readString(out))
      .asInstanceOf[Map[String, Any]]
    val rs = parsed("results").asInstanceOf[Seq[Map[String, Any]]]
    assert(rs.map(_("unique_id")).toSet ==
      Set("source.lake.with_field", "source.lake.by_mtime"))
  }

  test("loaded_at_query runs custom freshness SQL with {{ this }}") {
    import spark.implicits._
    val dataDir = Files.createTempDirectory("graft_sfq_data")
    Seq((1L, java.sql.Timestamp.valueOf("2026-02-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2026-02-02 06:00:00")))
      .toDF("id", "etl_ts").coalesce(1)
      .write.mode("overwrite").parquet(s"$dataDir/rows.parquet")
    val proj = Files.createTempDirectory("graft_sfq_proj")
    write(proj, "dbt_project.yml",
      """name: freshq
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/sources.yml",
      s"""version: 2
         |sources:
         |  - name: lake
         |    tables:
         |      - name: custom
         |        loaded_at_query: "select max(etl_ts) from {{ this }}"
         |        freshness:
         |          warn_after: {count: 12, period: hour}
         |          error_after: {count: 7, period: day}
         |        external:
         |          location: "$dataDir/rows.parquet"
         |""".stripMargin)
    val runner = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = "g_sfq_spec")
    assert(runner.resolved.sourceFreshness(("lake", "custom"))
      .loadedAtQuery.contains("select max(etl_ts) from {{ this }}"))
    // 19h after max(etl_ts): past warn (12h), inside error (7d)
    val now = java.sql.Timestamp.valueOf("2026-02-03 01:00:00")
    val r = runner.sourceFreshness(now).toMap
      .apply("source.lake.custom").toOption.get
    assert(r.maxLoadedAt
      .contains(java.sql.Timestamp.valueOf("2026-02-02 06:00:00")))
    assert(r.status == "warn")
  }
}
