package graft

import graft.core.Relation
import graft.jinja.Json
import graft.project.ProjectLoader
import graft.run.Runner
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** persist_docs (MA/adapters/persist_docs.sql) + `docs generate`
  * catalog.json: YAML descriptions land as table/column comments in the
  * live catalog and round-trip into the catalog artifact. */
class DocsSpec extends AnyFunSuite {

  test("docs blocks resolve through doc() in descriptions") {
    val proj = java.nio.file.Files.createTempDirectory("graft_docblocks")
    def write(rel: String, content: String): Unit = {
      val p = proj.resolve(rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, content)
    }
    write("dbt_project.yml", "name: docdemo\nmodel-paths: [\"models\"]\n")
    write("models/overview.md",
      """{% docs orders_doc %}
        |All **orders**, one row per order.
        |{% enddocs %}
        |{% docs id_doc %}Primary key.{% enddocs %}
        |""".stripMargin)
    write("models/m.sql", "select 1 as id\n")
    write("models/schema.yml",
      """version: 2
        |models:
        |  - name: m
        |    description: "{{ doc('orders_doc') }}"
        |    columns:
        |      - name: id
        |        description: "{{ doc('id_doc') }}"
        |""".stripMargin)
    val p = graft.project.ProjectLoader.load(proj.toString)
    assert(p.docsBlocks("orders_doc").contains("one row per order"))
    val resolved = graft.resolve.Resolver.resolve(p, "analytics")
    val n = resolved.nodes("model.docdemo.m")
    assert(n.description == "All **orders**, one row per order.")
    assert(n.columns("id") == "Primary key.")
  }

  test("yaml/zip/set strict context functions") {
    import graft.jinja.{DbtContext, Jinja}
    val (b, _) = DbtContext.parseContext()
    assert(Jinja.render("{{ fromyaml('a: 1')['a'] }}", b) == "1")
    assert(Jinja.render("{{ toyaml({'k': [1]}) }}", b) == "{\"k\": [1]}")
    assert(Jinja.render("{{ zip_strict([1, 2], ['a', 'b'])[1][1] }}", b) == "b")
    assertThrows[Jinja.JinjaError](
      Jinja.render("{{ zip_strict([1], ['a', 'b']) }}", b))
    assert(Jinja.render("{{ set_strict([1, 1, 2]) | length }}", b) == "2")
    // dicts-of-lists, per-element case-insensitive diff, emptied keys drop
    assert(Jinja.render(
      "{{ diff_of_two_dicts({'select': ['A', 'b'], 'insert': ['x']}, " +
        "{'SELECT': ['a'], 'insert': ['x', 'y']}) }}", b) ==
      "{'select': ['b']}")
  }

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

  test("persist_docs writes comments; docs generate emits catalog.json") {
    val proj = Files.createTempDirectory("graft_docs")
    write(proj, "dbt_project.yml",
      """name: docsdemo
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/orders.sql",
      """{{ config(materialized='table', persist_docs={'relation': true, 'columns': true}) }}
        |select 1 as id, 'x' as label
        |""".stripMargin)
    write(proj, "models/props.yml",
      """version: 2
        |models:
        |  - name: orders
        |    description: All orders, one row per order
        |    columns:
        |      - name: id
        |        description: Primary key
        |""".stripMargin)
    val schema = "g_docs"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val loc = Files.createTempDirectory("graft_docs_wh").toString
    val runner = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema, warehouseLocation = Some(loc))
    val results = runner.run()
    assert(results.forall(_.status == "success"), results.mkString(" | "))

    val rel = Relation(schema, "orders")
    assert(runner.adapter.tableComment(rel)
      .contains("All orders, one row per order"))
    val idField = runner.adapter.getColumnsInRelation(rel)("id")
    assert(idField.getComment().contains("Primary key"))

    val catPath = proj.resolve("catalog.json")
    runner.writeCatalog(catPath.toString)
    val cat = Json.parse(Files.readString(catPath)).asInstanceOf[Map[String, Any]]
    val nodes = cat("nodes").asInstanceOf[Map[String, Any]]
    val orders = nodes("model.docsdemo.orders").asInstanceOf[Map[String, Any]]
    val meta = orders("metadata").asInstanceOf[Map[String, Any]]
    assert(meta("comment") == "All orders, one row per order")
    val cols = orders("columns").asInstanceOf[Map[String, Any]]
    val idCol = cols("id").asInstanceOf[Map[String, Any]]
    assert(idCol("comment") == "Primary key")
    assert(idCol("type").toString.equalsIgnoreCase("INT"))

    // static docs page: self-contained, carries the node inventory inline
    val idxPath = proj.resolve("index.html")
    runner.writeDocsIndex(idxPath.toString)
    val html = Files.readString(idxPath)
    assert(html.startsWith("<!doctype html>"))
    assert(html.contains("model.docsdemo.orders"))
    assert(html.contains("All orders, one row per order"))
    assert(!html.contains("src=")) // no external assets — works offline
  }

  test("docs index lists function and saved-query nodes with their " +
      "signatures and query_params") {
    val proj = Files.createTempDirectory("graft_docs_fnsq")
    write(proj, "dbt_project.yml",
      """name: fndocs
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "functions/price_band.sql",
      "case when x < 10.0 then 'low' else 'high' end\n")
    write(proj, "functions/schema.yml",
      """version: 2
        |functions:
        |  - name: price_band
        |    description: price band label
        |    arguments:
        |      - name: x
        |        data_type: double
        |    returns:
        |      data_type: string
        |""".stripMargin)
    write(proj, "models/m.sql", "select 1 as id\n")
    write(proj, "models/schema.yml",
      """version: 2
        |metrics:
        |  - name: revenue
        |    label: Revenue
        |saved_queries:
        |  - name: weekly_revenue
        |    description: weekly rollup
        |    query_params:
        |      metrics:
        |        - revenue
        |      group_by:
        |        - metric_time
        |      where:
        |        - "region = 'EU'"
        |""".stripMargin)
    val runner = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = "g_docs_fnsq")
    val idxPath = proj.resolve("index.html")
    runner.writeDocsIndex(idxPath.toString)
    val html = Files.readString(idxPath)
    // the function renders with its (arguments) -> returns signature
    assert(html.contains("function.fndocs.price_band"), "function listed")
    assert(html.contains("(x: double) -> string"), "function signature")
    // the saved query renders with its query_params
    assert(html.contains("saved_query.fndocs.weekly_revenue"),
      "saved query listed")
    assert(html.contains("metrics: revenue"), "query_params metrics")
    assert(html.contains("group_by: metric_time"), "query_params group_by")
    assert(html.contains("region = 'EU'"), "query_params where")
  }
}
