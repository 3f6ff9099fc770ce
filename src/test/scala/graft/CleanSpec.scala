package graft

import graft.cli.Main
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** `dbt clean` (reference: execute_clean_command,
  * crates/dbt-loader/src/clean.rs:24-106): removes the target path plus
  * `clean-targets:` dirs and positional extras, with the reference's
  * safety rails — no absolute paths, nothing outside the project root,
  * nothing that is or contains a protected source dir, and a single
  * unsafe path aborts the whole run with nothing deleted. */
class CleanSpec extends AnyFunSuite {

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

  private def scaffold(cleanTargets: String = ""): Path = {
    val proj = Files.createTempDirectory("graft_clean")
    write(proj, "dbt_project.yml",
      s"""name: cleandemo
         |model-paths: ["models"]
         |$cleanTargets
         |""".stripMargin)
    write(proj, "models/m1.sql", "select 1 as x")
    write(proj, "target/manifest.json", "{}")
    write(proj, "dbt_packages/pkg/dbt_project.yml", "name: pkg")
    proj
  }

  test("clean removes target and clean-targets dirs, keeps sources") {
    val proj = scaffold("clean-targets: [\"dbt_packages\", \"logs\"]")
    write(proj, "logs/dbt.log", "hi")
    val rc = Main.run(spark, Main.parseArgs(
      Array("clean", "--project-dir", proj.toString)))
    assert(rc == 0)
    assert(!Files.exists(proj.resolve("target")))
    assert(!Files.exists(proj.resolve("dbt_packages")))
    assert(!Files.exists(proj.resolve("logs")))
    assert(Files.exists(proj.resolve("models/m1.sql")))
    assert(Files.exists(proj.resolve("dbt_project.yml")))
  }

  test("clean accepts positional extra dirs") {
    val proj = scaffold()
    write(proj, "scratch/tmp.txt", "x")
    val rc = Main.run(spark, Main.parseArgs(
      Array("clean", "scratch", "--project-dir", proj.toString)))
    assert(rc == 0)
    assert(!Files.exists(proj.resolve("scratch")))
    assert(!Files.exists(proj.resolve("target")))
  }

  test("clean refuses absolute paths and deletes nothing") {
    val proj = scaffold()
    val rc = Main.run(spark, Main.parseArgs(
      Array("clean", "/tmp/somewhere", "--project-dir", proj.toString)))
    assert(rc == 2)
    assert(Files.exists(proj.resolve("target/manifest.json")))
  }

  test("clean refuses protected and out-of-project dirs atomically") {
    val proj = scaffold("clean-targets: [\"models\"]")
    val rc = Main.run(spark, Main.parseArgs(
      Array("clean", "--project-dir", proj.toString)))
    assert(rc == 2)
    // one unsafe entry → nothing deleted, including the normally-safe target
    assert(Files.exists(proj.resolve("models/m1.sql")))
    assert(Files.exists(proj.resolve("target/manifest.json")))

    val escape = Main.run(spark, Main.parseArgs(
      Array("clean", "../outside", "--project-dir", proj.toString)))
    assert(escape == 2)
  }

  test("clean refuses a dir that contains a protected dir") {
    val proj = Files.createTempDirectory("graft_clean_nested")
    write(proj, "dbt_project.yml",
      """name: cleandemo
        |model-paths: ["src/models"]
        |""".stripMargin)
    write(proj, "src/models/m1.sql", "select 1 as x")
    write(proj, "target/manifest.json", "{}")
    // deleting "src" would take models with it — must refuse
    val rc = Main.run(spark, Main.parseArgs(
      Array("clean", "src", "--project-dir", proj.toString)))
    assert(rc == 2)
    assert(Files.exists(proj.resolve("src/models/m1.sql")))
  }

  test("debug passes on a valid project and fails on a missing one") {
    val proj = scaffold()
    val ok = Main.run(spark, Main.parseArgs(
      Array("debug", "--project-dir", proj.toString, "--schema", "g_debug")))
    assert(ok == 0)
    val empty = Files.createTempDirectory("graft_debug_none")
    val bad = Main.run(spark, Main.parseArgs(
      Array("debug", "--project-dir", empty.toString)))
    assert(bad == 2)
  }

  test("man prints the command reference without needing a project") {
    val empty = Files.createTempDirectory("graft_man_none")
    val rc = Main.run(spark, Main.parseArgs(
      Array("man", "--project-dir", empty.toString)))
    assert(rc == 0)
  }

  test("clean-targets parses from dbt_project.yml into the Project") {
    val proj = scaffold("clean-targets: [\"dbt_packages\"]")
    val p = graft.project.ProjectLoader.load(proj.toString)
    assert(p.cleanTargets == Seq("dbt_packages"))
    assert(p.macroPaths == Seq("macros"))
    assert(p.analysisPaths == Seq("analyses"))
  }
}
