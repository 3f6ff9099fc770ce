package graft

import graft.jinja.{DbtContext, Jinja}
import graft.project.ProjectLoader
import graft.resolve.Resolver
import graft.run.Runner
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** Grants shim (reference: MA/adapters/apply_grants.sql;
  * funcs.rs:406 standardize_grants_dict): the grants: config parses into
  * the standardized privilege → grantees shape, renders one DCL statement
  * per grantee (spark__support_multiple_grantees_per_dcl_statement →
  * False), surfaces in the manifest, and is a structured-warning no-op
  * locally — Spark's embedded catalog has no authorization layer. */
class GrantsSpec extends AnyFunSuite {

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

  test("standardizeGrants lowercases privileges and coerces scalars") {
    assert(Resolver.standardizeGrants(Map(
      "SELECT" -> Vector("user_a", "user_b"),
      "Insert" -> "svc_writer")) ==
      Map("select" -> Seq("user_a", "user_b"), "insert" -> Seq("svc_writer")))
    assert(Resolver.standardizeGrants(Map("select" -> Vector())) == Map.empty)
    assertThrows[IllegalArgumentException](Resolver.standardizeGrants("bogus"))
  }

  test("grants config flows model → node → DCL render → manifest") {
    val proj = Files.createTempDirectory("graft_grants")
    write(proj, "dbt_project.yml",
      """name: grantsdemo
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/granted.sql",
      """{{ config(materialized='table',
        |   grants={'select': ['reporter', 'analyst'], 'insert': 'loader'}) }}
        |select 1 as id
        |""".stripMargin)
    val schema = "g_grants"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val runner = new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema,
      warehouseLocation = Some(Files.createTempDirectory("graft_gwh").toString))
    val node = runner.resolved.nodes("model.grantsdemo.granted")
    assert(node.config.grants ==
      Map("select" -> Seq("reporter", "analyst"), "insert" -> Seq("loader")))
    // run succeeds — grants must not fail the build on a no-ACL catalog
    val results = runner.run()
    assert(results.forall(_.status == "success"), results.mkString(" | "))
    // one statement per grantee, reference spark__get_grant_sql shape
    assert(runner.applyGrants(node) == Seq(
      s"GRANT INSERT ON TABLE $schema.granted TO `loader`",
      s"GRANT SELECT ON TABLE $schema.granted TO `reporter`",
      s"GRANT SELECT ON TABLE $schema.granted TO `analyst`"))
    val manifest = Files.createTempDirectory("graft_gm").resolve("manifest.json")
    runner.writeManifest(manifest.toString)
    val parsed = graft.jinja.Json.parse(Files.readString(manifest))
      .asInstanceOf[Map[String, Any]]
    val cfg = parsed("nodes").asInstanceOf[Map[String, Any]]("model.grantsdemo.granted")
      .asInstanceOf[Map[String, Any]]("config").asInstanceOf[Map[String, Any]]
    assert(cfg("grants") ==
      Map("select" -> Vector("reporter", "analyst"), "insert" -> Vector("loader")))
  }

  test("standardize_grants_dict macro function mirrors show-grants output") {
    val a = new graft.adapter.SparkAdapter(spark, "g_grants_sgd")
    val bindings = DbtContext.runContext(a, graft.core.Relation("s", "t"),
      (_, n, _) => n, (s, t) => s"$s.$t", isIncremental = false,
      Map.empty, Map.empty)
    val out = Jinja.render(
      """{% set g = adapter.standardize_grants_dict({'SELECT': 'bob'}) %}{{ g['select'][0] }}""",
      bindings)
    assert(out == "bob")
  }
}
