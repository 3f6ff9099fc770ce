package graft

import graft.project.ProjectLoader
import graft.resolve.Resolver
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}
import scala.sys.process._

/** packages.yml `tarball:` kind (reference: packages.rs:278
  * TarballPackage) — a local .tar.gz unpacked into the package namespace,
  * loading exactly like a `local:` package: models resolvable cross-package
  * via ref('pkg', 'model'), macros merged into the shared prelude. */
class TarballPackageSpec extends AnyFunSuite {

  private def write(dir: Path, rel: String, content: String): Unit = {
    val p = dir.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  private def mkPackageTarball(topDir: String): Path = {
    val work = Files.createTempDirectory("graft_tarsrc")
    val pkg = work.resolve(topDir)
    write(pkg, "dbt_project.yml",
      """name: tarlib
        |model-paths: ["models"]
        |""".stripMargin)
    write(pkg, "models/tiers.sql",
      """select 'gold' as tier union all select 'silver'
        |""".stripMargin)
    write(pkg, "macros/shout.sql",
      """{% macro shout(col) %}upper({{ col }}){% endmacro %}""")
    val tarGz = Files.createTempDirectory("graft_tar").resolve("tarlib.tar.gz")
    val rc = Process(Seq("tar", "czf", tarGz.toString, "-C", work.toString,
      topDir)).!
    assert(rc == 0, "tar czf failed")
    tarGz
  }

  private def mkRoot(tarGz: Path): Path = {
    val proj = Files.createTempDirectory("graft_tarroot")
    write(proj, "dbt_project.yml",
      """name: rootproj
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "packages.yml",
      s"""packages:
         |  - tarball: ${tarGz.toString}
         |""".stripMargin)
    write(proj, "models/tier_count.sql",
      """select {{ shout("tier") }} as tier_u from {{ ref('tarlib', 'tiers') }}
        |""".stripMargin)
    proj
  }

  test("tarball package loads and resolves like a local package") {
    val proj = mkRoot(mkPackageTarball("tarlib-1.0.0"))
    val p = ProjectLoader.load(proj.toString)
    assert(p.packages.map(_.name) == Seq("tarlib"))
    assert(p.packages.head.models.contains("tiers"))
    assert(p.packages.head.macroSources.exists(_.contains("macro shout")))
    // cross-package ref resolves into the DAG
    val resolved = Resolver.resolve(p, "analytics")
    val tierCount = resolved.nodes("model.rootproj.tier_count")
    assert(tierCount.dependsOn.contains("model.tarlib.tiers"))
  }

  test("archive with dbt_project.yml at the root (no wrapper dir) loads") {
    val work = Files.createTempDirectory("graft_tarsrc2")
    write(work, "dbt_project.yml", "name: flatpkg\n")
    val tarGz = Files.createTempDirectory("graft_tar2").resolve("flat.tar.gz")
    assert(Process(Seq("tar", "czf", tarGz.toString, "-C", work.toString,
      "dbt_project.yml")).! == 0)
    val extracted = ProjectLoader.extractTarball(tarGz)
    assert(Files.exists(extracted.resolve("dbt_project.yml")))
  }

  test("missing tarball and archives without a project fail loudly") {
    assertThrows[IllegalArgumentException](
      ProjectLoader.extractTarball(Path.of("/nonexistent/x.tar.gz")))
    val work = Files.createTempDirectory("graft_tarsrc3")
    write(work, "notes.txt", "no project here")
    val tarGz = Files.createTempDirectory("graft_tar3").resolve("bad.tar.gz")
    assert(Process(Seq("tar", "czf", tarGz.toString, "-C", work.toString,
      "notes.txt")).! == 0)
    assertThrows[IllegalArgumentException](ProjectLoader.extractTarball(tarGz))
  }
}
