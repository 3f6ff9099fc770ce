package graft

import graft.jinja.Json
import graft.project.ProjectLoader
import graft.run.Runner
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** Manifest v12 compatibility (reference: DbtManifestV12,
  * crates/dbt-schemas/src/schemas/manifest/v12.rs:23-42; node field
  * inventory CommonAttributes/NodeBaseAttributes nodes.rs:2781-2866).
  * Pins (a) the exact v12 top-level key set, (b) the node-level fields we
  * emit, and (c) an explicit list of intentionally-omitted fields so any
  * drift — emitting one accidentally or silently dropping one — fails. */
class ManifestV12Spec extends AnyFunSuite {

  /** v12.rs:23-42 DbtManifestV12 — all top-level sections. */
  private val V12TopLevel = Set(
    "metadata", "nodes", "sources", "macros", "unit_tests", "docs",
    "semantic_models", "saved_queries", "exposures", "metrics", "functions",
    "child_map", "parent_map", "group_map", "disabled", "selectors", "groups")

  /** The CommonAttributes + NodeBaseAttributes fields we emit per node. */
  private val EmittedNodeFields = Set(
    "unique_id", "name", "package_name", "fqn", "path", "original_file_path",
    "raw_code", "checksum", "language", "description", "tags", "meta",
    "database", "schema", "alias", "relation_name", "resource_type",
    "columns", "depends_on", "config")

  /** Intentionally omitted (nodes.rs:2781-2866), with the reason:
    *   - patch_path / build_path / compiled_path: we don't materialize a
    *     target/ compile tree; compiled SQL lives in run results
    *   - name_span / static_analysis(_off_reason): dbt-cloud static
    *     analysis metadata, no analyzer here
    *   - quoting / quoting_ignore_case: Spark identifiers are
    *     backtick-quoted uniformly by Relation.fqn
    *   - extended_model / deferred / docs / group / created_at /
    *     unrendered_config: dbt-cloud bookkeeping we don't track
    *   - refs / sources / functions / metrics (raw pre-resolution lists):
    *     superseded by the resolved depends_on.nodes edges
    *   - persist_docs is surfaced inside config instead of base attrs */
  private val OmittedNodeFields = Set(
    "patch_path", "build_path", "compiled_path", "name_span",
    "static_analysis", "static_analysis_off_reason", "quoting",
    "quoting_ignore_case", "extended_model", "deferred", "docs", "group",
    "created_at", "unrendered_config", "refs", "sources", "functions",
    "metrics", "persist_docs")

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

  private def manifest(): Map[String, Any] = {
    val proj = Files.createTempDirectory("graft_manifest")
    write(proj, "dbt_project.yml",
      """name: manidemo
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/base.sql", "select 1 as id, 'x' as label\n")
    write(proj, "models/overview.md",
      "{% docs id_doc %}The surrogate id.{% enddocs %}\n")
    write(proj, "models/derived.sql",
      "select id from {{ ref('base') }}\n")
    write(proj, "models/schema.yml",
      """version: 2
        |models:
        |  - name: derived
        |    description: ids only
        |    columns:
        |      - name: id
        |        tests: [not_null]
        |exposures:
        |  - name: dash
        |    type: dashboard
        |    depends_on: ["ref('derived')"]
        |metrics:
        |  - name: n_ids
        |    model: ref('derived')
        |saved_queries:
        |  - name: ids_weekly
        |    query_params:
        |      metrics: [n_ids]
        |""".stripMargin)
    val runner = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = "g_manifest_spec")
    val out = Files.createTempDirectory("graft_mani_out").resolve("manifest.json")
    runner.writeManifest(out.toString)
    Json.parse(Files.readString(out)).asInstanceOf[Map[String, Any]]
  }

  test("top-level keys are exactly the v12 section set") {
    val m = manifest()
    assert(m.keySet == V12TopLevel,
      s"missing=${V12TopLevel -- m.keySet} extra=${m.keySet -- V12TopLevel}")
    assert(m("metadata").asInstanceOf[Map[String, Any]]("dbt_schema_version") ==
      "https://schemas.getdbt.com/dbt/manifest/v12.json")
  }

  test("node entries carry the emitted field set; omissions are the declared ones") {
    val m = manifest()
    val nodes = m("nodes").asInstanceOf[Map[String, Any]]
    assert(nodes.contains("model.manidemo.base") &&
      nodes.contains("model.manidemo.derived"))
    nodes.values.foreach { n =>
      val keys = n.asInstanceOf[Map[String, Any]].keySet
      assert(keys == EmittedNodeFields,
        s"missing=${EmittedNodeFields -- keys} extra=${keys -- EmittedNodeFields}")
    }
    // the two inventories must stay disjoint — a field can't be both
    assert((EmittedNodeFields & OmittedNodeFields).isEmpty)
    // exposures/metrics route to their own v12 sections, not nodes
    assert(!nodes.keySet.exists(_.startsWith("exposure.")))
    assert(m("exposures").asInstanceOf[Map[String, Any]].keySet ==
      Set("exposure.manidemo.dash"))
    assert(m("metrics").asInstanceOf[Map[String, Any]].keySet ==
      Set("metric.manidemo.n_ids"))
    // saved queries are first-class v12 nodes (manifest.rs:368,1073), not
    // the always-empty map of earlier rounds
    assert(m("saved_queries").asInstanceOf[Map[String, Any]].keySet ==
      Set("saved_query.manidemo.ids_weekly"))
    // {% docs %} blocks emit as DbtDocsMacro entries (macros.rs:44-51)
    val docs = m("docs").asInstanceOf[Map[String, Any]]
    assert(docs.keySet == Set("doc.manidemo.id_doc"))
    assert(docs("doc.manidemo.id_doc").asInstanceOf[Map[String, Any]]
      .apply("block_contents") == "The surrogate id.")
  }

  test("parent_map and child_map mirror the resolved DAG") {
    val m = manifest()
    val parents = m("parent_map").asInstanceOf[Map[String, Any]]
    val children = m("child_map").asInstanceOf[Map[String, Any]]
    assert(parents("model.manidemo.derived")
      .asInstanceOf[Seq[Any]].contains("model.manidemo.base"))
    assert(children("model.manidemo.base")
      .asInstanceOf[Seq[Any]].contains("model.manidemo.derived"))
    // declared nodes participate in the maps too
    assert(parents("exposure.manidemo.dash")
      .asInstanceOf[Seq[Any]].contains("model.manidemo.derived"))
  }
}
