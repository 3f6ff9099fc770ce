package graft

import graft.project.ProjectLoader
import graft.run.Runner
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** query-comment parity (reference crates/dbt-adapter/src/query_comment.rs):
  * default JSON envelope, or a project-configured Jinja template over the
  * node; executed SQL carries it and runs unchanged. */
class QueryCommentSpec extends AnyFunSuite {

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

  private def mkRunner(projYml: String): Runner = {
    val proj = Files.createTempDirectory("graft_qc")
    write(proj, "dbt_project.yml", projYml)
    write(proj, "models/m.sql", "select 1 as id")
    val schema = s"g_qc_${System.nanoTime()}"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val loc = Files.createTempDirectory("graft_qc_wh").toString
    new Runner(spark, ProjectLoader.load(proj.toString),
      targetSchema = schema, warehouseLocation = Some(loc))
  }

  test("default comment is the JSON envelope; build still succeeds") {
    val r = mkRunner("name: qc\nmodel-paths: [\"models\"]\n")
    val c = r.renderQueryComment(r.resolved.nodes("model.qc.m"))
    assert(c.contains("\"app\""))
    assert(c.contains("model.qc.m"))
    assert(r.run().forall(_.status == "success"))
  }

  test("configured Jinja template renders over the node") {
    val r = mkRunner(
      """name: qc2
        |model-paths: ["models"]
        |query-comment: "run by graft for {{ node.unique_id }}"
        |""".stripMargin)
    val c = r.renderQueryComment(r.resolved.nodes("model.qc2.m"))
    assert(c == "run by graft for model.qc2.m")
    assert(r.run().forall(_.status == "success"))
  }
}
