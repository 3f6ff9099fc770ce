package graft

import graft.project.ProjectLoader
import graft.run.Runner
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** SQL UDF function NODES (reference: DbtFunction nodes.rs:3875,
  * resolve_functions.rs, MethodName::Function node_selector.rs:63): a
  * .sql body under function-paths plus a `functions:` properties entry
  * (arguments/returns) loads as an executable node; `graft run` CREATEs
  * OR REPLACEs it as a catalog-persistent SQL function; models call it
  * via `{{ function('name') }}`, which resolves to the qualified name
  * and records the DAG edge so the function builds first. */
class FunctionNodeSpec extends AnyFunSuite {

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

  private def scaffold(): Path = {
    val proj = Files.createTempDirectory("graft_fnnode")
    write(proj, "dbt_project.yml",
      """name: fn
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "functions/order_bucket.sql",
      "case when x < 10.0 then 0 when x < 100.0 then 1 else 2 end\n")
    write(proj, "functions/schema.yml",
      """version: 2
        |functions:
        |  - name: order_bucket
        |    description: price band
        |    arguments:
        |      - name: x
        |        data_type: double
        |    returns:
        |      data_type: int
        |""".stripMargin)
    write(proj, "models/src_rows.sql",
      "select 5.0d as v union all select 50.0d union all select 500.0d")
    write(proj, "models/buckets.sql",
      "select v, {{ function('order_bucket') }}(v) as b " +
        "from {{ ref('src_rows') }}")
    proj
  }

  test("function node builds a persistent UDF; the model calls it " +
      "through function() with a DAG edge; manifest + selector see it") {
    val proj = scaffold()
    val schema = "g_fn_node"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val loc = Files.createTempDirectory("graft_fnnode_wh").toString
    val runner = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema, warehouseLocation = Some(loc))

    // the edge exists and orders the function BEFORE the model
    val buckets = runner.resolved.nodes("model.fn.buckets")
    assert(buckets.dependsOn.contains("function.fn.order_bucket"))

    val results = runner.run()
    val bad = results.filter(_.status != "success")
    assert(bad.isEmpty, bad.map(r => s"${r.uniqueId}: ${r.message}")
      .mkString(" | "))
    assert(results.exists(r => r.uniqueId == "function.fn.order_bucket" &&
      r.status == "success"))

    val rows = spark.table(s"`$schema`.`buckets`")
      .orderBy("v").collect().map(r => (r.getDouble(0), r.getInt(1)))
    assert(rows.toSeq == Seq((5.0, 0), (50.0, 1), (500.0, 2)))

    // catalog-persistent: visible to SHOW USER FUNCTIONS
    val fns = spark.sql(s"SHOW USER FUNCTIONS IN `$schema`")
      .collect().map(_.getString(0))
    assert(fns.exists(_.endsWith("order_bucket")), fns.mkString(", "))

    // manifest: its own v12 section, never in nodes
    val out = Files.createTempDirectory("graft_fnnode_m")
      .resolve("manifest.json")
    runner.writeManifest(out.toString)
    val m = graft.jinja.Json.parse(Files.readString(out))
      .asInstanceOf[Map[String, Any]]
    assert(m("functions").asInstanceOf[Map[String, Any]]
      .contains("function.fn.order_bucket"))
    assert(!m("nodes").asInstanceOf[Map[String, Any]]
      .contains("function.fn.order_bucket"))

    // selector: function: method + downstream expansion reach the model
    assert(runner.selectIds(Some("function:order_bucket")) ==
      Set("function.fn.order_bucket"))
    assert(runner.selectIds(Some("function:order_bucket+")) ==
      Set("function.fn.order_bucket", "model.fn.buckets"))

    // re-run: CREATE OR REPLACE is idempotent
    assert(runner.run().forall(_.status == "success"))
  }

  test("non-scalar kind and missing returns are structured node errors") {
    val proj = scaffold()
    write(proj, "functions/schema.yml",
      """version: 2
        |functions:
        |  - name: order_bucket
        |    type: aggregate
        |    returns:
        |      data_type: int
        |""".stripMargin)
    val schema = "g_fn_node_err"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val loc = Files.createTempDirectory("graft_fnnode_err_wh").toString
    val runner = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema, warehouseLocation = Some(loc))
    val results = runner.run(select = Some("order_bucket"))
    val r = results.find(_.uniqueId == "function.fn.order_bucket").get
    assert(r.status == "error" && r.message.contains("aggregate"),
      s"${r.status}: ${r.message}")

    write(proj, "functions/schema.yml",
      """version: 2
        |functions:
        |  - name: order_bucket
        |    arguments:
        |      - name: x
        |        data_type: double
        |""".stripMargin)
    val runner2 = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema, warehouseLocation = Some(loc))
    val r2 = runner2.run(select = Some("order_bucket"))
      .find(_.uniqueId == "function.fn.order_bucket").get
    assert(r2.status == "error" && r2.message.contains("returns"),
      s"${r2.status}: ${r2.message}")
  }

  test("unit tests on models calling function nodes create the function " +
      "on demand — fixtures mock DATA, functions are LOGIC and run real") {
    val proj = scaffold()
    write(proj, "models/schema.yml",
      """unit_tests:
        |  - name: ut_buckets
        |    model: buckets
        |    given:
        |      - input: ref('src_rows')
        |        rows:
        |          - {v: 7.0}
        |          - {v: 70.0}
        |    expect:
        |      rows:
        |        - {v: 7.0, b: 0}
        |        - {v: 70.0, b: 1}
        |""".stripMargin)
    val schema = "g_fn_unit"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val loc = Files.createTempDirectory("graft_fnunit_wh").toString
    val runner = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema, warehouseLocation = Some(loc))
    // run ONLY the unit test node — nothing else is built, so the
    // function exists only if the unit path created it on demand
    val ut = runner.resolved.nodes("unit_test.fn.ut_buckets")
    val res = runner.runNode(ut)
    assert(res.status == "success", s"${res.status}: ${res.message}")
    // the on-demand build is the real one: catalog-persistent
    val fns = spark.sql(s"SHOW USER FUNCTIONS IN `$schema`")
      .collect().map(_.getString(0))
    assert(fns.exists(_.endsWith("order_bucket")), fns.mkString(", "))
    // and the model itself was NOT built (only the function was)
    assert(!spark.catalog.tableExists(s"$schema.buckets"))
  }
}
