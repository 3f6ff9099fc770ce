package graft

import graft.jinja.Json
import graft.project.ProjectLoader
import graft.resolve.Resolver
import graft.run.Runner
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** `enabled: false` semantics (reference: resolver.rs:162-212 — every
  * resolve_* step partitions into enabled/disabled nodes;
  * manifest.rs:255 build_disabled_map emits them as a Vec-valued map;
  * renderer.rs:364 DisabledModel status). A disabled node leaves the DAG
  * entirely: it never runs, never appears in `nodes`, its tests/unit
  * tests are auto-disabled with it, and an enabled node depending on it
  * is a named parse error — not a downstream "relation not found". */
class DisabledNodesSpec extends AnyFunSuite {

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

  private def baseProject(): Path = {
    val proj = Files.createTempDirectory("graft_disabled")
    write(proj, "dbt_project.yml",
      """name: disdemo
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/live.sql", "select 1 as id\n")
    proj
  }

  test("a disabled model leaves nodes and lands in disabledNodes; its tests follow") {
    val proj = baseProject()
    write(proj, "models/old.sql",
      "{{ config(enabled=false) }}\nselect 2 as id\n")
    write(proj, "models/schema.yml",
      """version: 2
        |models:
        |  - name: old
        |    columns:
        |      - name: id
        |        tests: [not_null]
        |unit_tests:
        |  - name: old_is_two
        |    model: old
        |    given: []
        |    expect:
        |      rows:
        |        - {id: 2}
        |""".stripMargin)
    val resolved = Resolver.resolve(ProjectLoader.load(proj.toString))
    assert(!resolved.nodes.contains("model.disdemo.old"))
    assert(resolved.nodes.contains("model.disdemo.live"))
    assert(resolved.disabledNodes.contains("model.disdemo.old"))
    // the generic test and the unit test on the disabled model are
    // auto-disabled with it, not left dangling in the DAG
    val (disTests, liveTests) =
      (resolved.disabledNodes.keySet ++ resolved.nodes.keySet)
        .filter(id => id.startsWith("test.") || id.startsWith("unit_test."))
        .partition(resolved.disabledNodes.contains)
    assert(disTests.exists(_.startsWith("test.")), s"got: $disTests")
    assert(disTests.exists(_.startsWith("unit_test.")), s"got: $disTests")
    assert(liveTests.isEmpty, s"enabled tests left behind: $liveTests")
  }

  test("an enabled model depending on a disabled one is a named error") {
    val proj = baseProject()
    write(proj, "models/old.sql",
      "{{ config(enabled=false) }}\nselect 2 as id\n")
    write(proj, "models/reader.sql", "select id from {{ ref('old') }}\n")
    val e = intercept[IllegalStateException](
      Resolver.resolve(ProjectLoader.load(proj.toString)))
    assert(e.getMessage.contains("model.disdemo.reader"))
    assert(e.getMessage.contains("model.disdemo.old"))
    assert(e.getMessage.toLowerCase.contains("disabled"))
  }

  test("manifest emits the disabled map Vec-valued and excludes them from nodes") {
    val proj = baseProject()
    write(proj, "models/old.sql",
      "{{ config(enabled=false) }}\nselect 2 as id\n")
    val runner = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = "g_disabled_spec")
    val out = Files.createTempDirectory("graft_dis_out").resolve("manifest.json")
    runner.writeManifest(out.toString)
    val m = Json.parse(Files.readString(out)).asInstanceOf[Map[String, Any]]
    val nodes = m("nodes").asInstanceOf[Map[String, Any]]
    assert(!nodes.contains("model.disdemo.old"))
    val dis = m("disabled").asInstanceOf[Map[String, Any]]
    assert(dis.keySet == Set("model.disdemo.old"))
    // Vec shape per build_disabled_map (BTreeMap<String, Vec<_>>)
    val entries = dis("model.disdemo.old").asInstanceOf[Seq[Any]]
    assert(entries.size == 1)
    val entry = entries.head.asInstanceOf[Map[String, Any]]
    assert(entry("resource_type") == "model")
    assert(entry("config").asInstanceOf[Map[String, Any]]("enabled") == false)
  }

  test("a disabled declared node (exposure) routes to the disabled map too") {
    val proj = baseProject()
    write(proj, "models/schema.yml",
      """version: 2
        |exposures:
        |  - name: retired_dash
        |    type: dashboard
        |    config: {enabled: false}
        |    depends_on: ["ref('live')"]
        |""".stripMargin)
    val resolved = Resolver.resolve(ProjectLoader.load(proj.toString))
    assert(resolved.disabledNodes.contains("exposure.disdemo.retired_dash"))
    assert(!resolved.nodes.contains("exposure.disdemo.retired_dash"))
  }
}
