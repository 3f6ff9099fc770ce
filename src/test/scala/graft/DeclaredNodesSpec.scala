package graft

import graft.core.NodeKind
import graft.project.ProjectLoader
import graft.resolve.{Dag, Resolver, Selector}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** Exposures / metrics / semantic models / analyses as parsed nodes
  * (reference: nodes.rs:2100; selector methods node_selector.rs:59-88):
  * declaration-only DAG members whose refs resolve into edges, enabling
  * `+exposure:dash`-style impact selection. */
class DeclaredNodesSpec extends AnyFunSuite {

  private def write(dir: Path, rel: String, content: String): Unit = {
    val p = dir.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  private lazy val resolved = {
    val proj = Files.createTempDirectory("graft_decl")
    write(proj, "dbt_project.yml",
      """name: decl
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/orders.sql", "select 1 as id, 10 as amount")
    write(proj, "models/props.yml",
      """version: 2
        |exposures:
        |  - name: weekly_dash
        |    type: dashboard
        |    owner:
        |      name: data team
        |    depends_on:
        |      - ref('orders')
        |metrics:
        |  - name: revenue
        |    model: ref('orders')
        |    expression: sum(amount)
        |semantic_models:
        |  - name: orders_sm
        |    model: ref('orders')
        |saved_queries:
        |  - name: weekly_revenue
        |    label: Weekly revenue
        |    query_params:
        |      metrics:
        |        - revenue
        |      group_by:
        |        - metric_time
        |    exports:
        |      - name: weekly_revenue_table
        |        config:
        |          export_as: table
        |""".stripMargin)
    write(proj, "analyses/orders_probe.sql",
      "select count(*) from {{ ref('orders') }}")
    Resolver.resolve(ProjectLoader.load(proj.toString), "an")
  }

  test("declaration nodes parse with resolved edges") {
    val exp = resolved.nodes("exposure.decl.weekly_dash")
    assert(exp.kind == NodeKind.Exposure)
    assert(exp.dependsOn == Seq("model.decl.orders"))
    assert(resolved.nodes("metric.decl.revenue").dependsOn == Seq("model.decl.orders"))
    assert(resolved.nodes("semantic_model.decl.orders_sm").dependsOn ==
      Seq("model.decl.orders"))
    val an = resolved.nodes("analysis.decl.orders_probe")
    assert(an.kind == NodeKind.Analysis)
    assert(an.dependsOn == Seq("model.decl.orders"))
  }

  test("exposure/metric selector methods and upstream expansion") {
    val g = Dag.fromNodes(resolved.nodes)
    def sel(s: String) = Selector.select(Selector.parse(s), resolved.nodes, g)
    assert(sel("exposure:weekly_dash") == Set("exposure.decl.weekly_dash"))
    assert(sel("+exposure:weekly_dash") ==
      Set("exposure.decl.weekly_dash", "model.decl.orders"))
    assert(sel("metric:revenue") == Set("metric.decl.revenue"))
    assert(sel("resource_type:semantic_model") == Set("semantic_model.decl.orders_sm"))
  }

  test("saved queries parse with metric edges and select through them") {
    // saved_query.rs:18-48: query_params.metrics name metric nodes — the
    // resolver turns them into DAG edges so + walks to the backing model
    val sq = resolved.nodes("saved_query.decl.weekly_revenue")
    assert(sq.kind == NodeKind.SavedQuery)
    assert(sq.dependsOn == Seq("metric.decl.revenue"))
    val g = Dag.fromNodes(resolved.nodes)
    def sel(s: String) = Selector.select(Selector.parse(s), resolved.nodes, g)
    assert(sel("saved_query:weekly_revenue") == Set("saved_query.decl.weekly_revenue"))
    assert(sel("saved_query:weekly_*") == Set("saved_query.decl.weekly_revenue"))
    assert(sel("+saved_query:weekly_revenue") == Set(
      "saved_query.decl.weekly_revenue", "metric.decl.revenue",
      "model.decl.orders"))
  }

  test("list CLI golden: test_name / unit_test / access / saved_query " +
      "select through the real command") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val proj = Files.createTempDirectory("graft_list_cli")
    write(proj, "dbt_project.yml",
      """name: lcli
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/orders.sql", "select 1 as id")
    write(proj, "models/mart.sql", "select id from {{ ref('orders') }}")
    write(proj, "models/props.yml",
      """version: 2
        |models:
        |  - name: orders
        |    access: public
        |    columns:
        |      - name: id
        |        tests: [unique, not_null]
        |unit_tests:
        |  - name: ut_mart
        |    model: mart
        |    given:
        |      - input: ref('orders')
        |        rows:
        |          - {id: 1}
        |    expect:
        |      rows:
        |        - {id: 1}
        |saved_queries:
        |  - name: sq1
        |    query_params:
        |      metrics: []
        |""".stripMargin)
    def listOut(sel: String, extra: String*): Seq[String] = {
      val bos = new java.io.ByteArrayOutputStream
      val rc = Console.withOut(new java.io.PrintStream(bos)) {
        graft.cli.Main.run(spark, graft.cli.Main.parseArgs(Array(
          "list", "--select", sel, "--project-dir", proj.toString) ++ extra))
      }
      assert(rc == 0, s"list --select $sel exited $rc")
      bos.toString.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    }
    assert(listOut("test_name:unique") == Seq("test.lcli.unique_orders_id"))
    assert(listOut("test_name:not_null") == Seq("test.lcli.not_null_orders_id"))
    // eager indirect selection (the dbt default): selecting the model
    // attaches its tests (node_selector.rs:49-55)
    assert(listOut("access:public") == Seq("model.lcli.orders",
      "test.lcli.not_null_orders_id", "test.lcli.unique_orders_id"))
    // --indirect-selection empty: only the explicit match
    assert(listOut("access:public", "--indirect-selection", "empty")
      == Seq("model.lcli.orders"))
    assert(listOut("unit_test:ut_mart") == Seq("unit_test.lcli.ut_mart"))
    assert(listOut("saved_query:sq1") == Seq("saved_query.lcli.sq1"))

    // --resource-type / --exclude-resource-type (io_args.rs:287-289)
    // filter the selection by kind name, comma-splittable
    def listTyped(extra: String*): Seq[String] = {
      val bos = new java.io.ByteArrayOutputStream
      val rc = Console.withOut(new java.io.PrintStream(bos)) {
        graft.cli.Main.run(spark, graft.cli.Main.parseArgs(Array(
          "list", "--project-dir", proj.toString) ++ extra))
      }
      assert(rc == 0)
      bos.toString.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    }
    assert(listTyped("--resource-type", "model") ==
      Seq("model.lcli.mart", "model.lcli.orders"))
    assert(listTyped("--resource-type", "unit_test,saved_query") ==
      Seq("saved_query.lcli.sq1", "unit_test.lcli.ut_mart"))
    assert(!listTyped("--exclude-resource-type", "test")
      .exists(_.startsWith("test.")))
  }
}
