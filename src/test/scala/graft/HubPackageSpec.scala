package graft

import graft.project.ProjectLoader
import graft.resolve.Resolver
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}
import scala.sys.process._

/** packages.yml hub kind (reference: packages.rs:58-64 HubPackage,
  * hub_client.rs) — `package: org/name` + `version:` semver resolution
  * against a LOCAL mirror directory (`GRAFT_HUB_DIR` /
  * `-Dgraft.hub.dir`, layout `<org>/<name>/<version>.tar.gz`), since
  * this environment has no egress to hub.getdbt.com. */
class HubPackageSpec extends AnyFunSuite {

  private def write(dir: Path, rel: String, content: String): Unit = {
    val p = dir.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  /** Mirror with acme/widgets at 1.0.0, 1.2.0, and prerelease 2.0.0-b1 —
    * each version's single model SELECTs its own version string. */
  private lazy val mirror: Path = {
    val m = Files.createTempDirectory("graft_hub_mirror")
    for (v <- Seq("1.0.0", "1.2.0", "2.0.0-b1")) {
      val src = Files.createTempDirectory(s"graft_hub_src")
      val top = src.resolve(s"widgets-$v")
      write(top, "dbt_project.yml", "name: widgets\nmodel-paths: [\"models\"]\n")
      write(top, "models/widget_version.sql", s"select '$v' as v\n")
      val out = m.resolve(s"acme/widgets/$v.tar.gz")
      Files.createDirectories(out.getParent)
      assert(Process(Seq("tar", "czf", out.toString, "-C", src.toString,
        s"widgets-$v")).! == 0)
    }
    m
  }

  private def withMirror[T](f: => T): T = {
    sys.props("graft.hub.dir") = mirror.toString
    try f finally sys.props.remove("graft.hub.dir")
  }

  private def versionOf(p: Path): String = {
    val proj = ProjectLoader.load(p.toString)
    assert(proj.packages.map(_.name) == Seq("widgets"))
    // the version is baked into the model body as its literal
    proj.packages.head.models("widget_version").split("'")(1)
  }

  private def rootWith(versionYaml: String): Path = {
    val proj = Files.createTempDirectory("graft_hub_root")
    write(proj, "dbt_project.yml", "name: hubroot\nmodel-paths: [\"models\"]\n")
    write(proj, "packages.yml",
      s"""packages:
         |  - package: acme/widgets
         |$versionYaml
         |""".stripMargin)
    proj
  }

  test("no version picks the newest non-prerelease") {
    withMirror(assert(versionOf(rootWith("")) == "1.2.0"))
  }

  test("comparator list ANDs like dbt semver") {
    withMirror {
      assert(versionOf(rootWith(
        "    version: [\">=1.0.0\", \"<1.1.0\"]")) == "1.0.0")
      assert(versionOf(rootWith("    version: \">=1.1.0\"")) == "1.2.0")
    }
  }

  test("exact version pins, and install-prerelease admits prereleases") {
    withMirror {
      assert(versionOf(rootWith("    version: 1.0.0")) == "1.0.0")
      assert(versionOf(rootWith(
        "    version: \">=1.0.0\"\n    install-prerelease: true")) == "2.0.0-b1")
    }
  }

  test("hub package participates in the DAG like any other package") {
    withMirror {
      val proj = rootWith("    version: 1.2.0")
      write(proj, "models/uses_widget.sql",
        "select * from {{ ref('widgets', 'widget_version') }}\n")
      val resolved = Resolver.resolve(ProjectLoader.load(proj.toString), "tgt")
      assert(resolved.nodes("model.hubroot.uses_widget")
        .dependsOn.contains("model.widgets.widget_version"))
    }
  }

  test("unsatisfiable spec and missing mirror fail loudly") {
    withMirror {
      val e = intercept[IllegalArgumentException](
        ProjectLoader.resolveHubPackage("acme/widgets", Some(">=9.0.0")))
      assert(e.getMessage.contains("no version in mirror satisfies"))
      assertThrows[IllegalArgumentException](
        ProjectLoader.resolveHubPackage("acme/nope", None))
    }
    // without any mirror configured the error names the knob
    val e2 = intercept[IllegalArgumentException](
      ProjectLoader.resolveHubPackage("acme/widgets", None))
    assert(e2.getMessage.contains("GRAFT_HUB_DIR"))
  }

  test("deps writes package-lock.yml and later loads honor it until stale") {
    // dedicated mirror so adding versions can't disturb other tests
    val m = Files.createTempDirectory("graft_hub_lockmirror")
    def publish(v: String): Unit = {
      val src = Files.createTempDirectory("graft_hub_locksrc")
      val top = src.resolve(s"gadgets-$v")
      write(top, "dbt_project.yml", "name: gadgets\nmodel-paths: [\"models\"]\n")
      write(top, "models/gadget_version.sql", s"select '$v' as v\n")
      val out = m.resolve(s"acme/gadgets/$v.tar.gz")
      Files.createDirectories(out.getParent)
      assert(Process(Seq("tar", "czf", out.toString, "-C", src.toString,
        s"gadgets-$v")).! == 0)
    }
    publish("1.0.0"); publish("1.1.0")
    // a minimal git package for the sha-pinning half of the lock
    val repo = Files.createTempDirectory("graft_lock_git")
    def git(args: String*): Unit =
      assert(Process(Seq("git", "-C", repo.toString) ++ args).! == 0)
    git("init", "--quiet", "--initial-branch=main")
    git("config", "user.email", "t@t"); git("config", "user.name", "t")
    write(repo, "dbt_project.yml", "name: gitdep\n")
    git("add", "-A"); git("commit", "--quiet", "-m", "init")
    val proj = Files.createTempDirectory("graft_lock_root")
    write(proj, "dbt_project.yml", "name: lockroot\nmodel-paths: [\"models\"]\n")
    write(proj, "packages.yml",
      s"""packages:
         |  - package: acme/gadgets
         |    version: ">=1.0.0"
         |  - git: ${repo.toString}
         |    warn-unpinned: false
         |""".stripMargin)
    sys.props("graft.hub.dir") = m.toString
    try {
      val rc = graft.cli.Main.run(null, graft.cli.Main.parseArgs(
        Array("deps", "--project-dir", proj.toString)))
      assert(rc == 0)
      val lock = Files.readString(proj.resolve("package-lock.yml"))
      assert(lock.contains("version: 1.1.0"), lock)     // range pinned exact
      assert(lock.contains("revision: "), lock)         // git pinned to sha
      assert(lock.contains("sha1_hash: "), lock)
      // a newer version appears — the fresh lock still pins 1.1.0
      publish("1.2.0")
      def loadedVersion() = ProjectLoader.load(proj.toString)
        .packages.find(_.name == "gadgets").get
        .models("gadget_version").split("'")(1)
      assert(loadedVersion() == "1.1.0")
      // packages.yml changes → lock sha mismatch → float to newest again
      Files.writeString(proj.resolve("packages.yml"),
        Files.readString(proj.resolve("packages.yml")) + "# touched\n")
      assert(loadedVersion() == "1.2.0")
    } finally sys.props.remove("graft.hub.dir")
  }

  test("semver ordering and matching corner cases") {
    assert(ProjectLoader.semverMatches("1.2.0", ">=1.2.0"))
    assert(!ProjectLoader.semverMatches("1.2.0", ">1.2.0"))
    assert(ProjectLoader.semverMatches("1.10.0", ">1.9.0")) // numeric, not lexical
    assert(ProjectLoader.semverMatches("2.0.0-b1", "<2.0.0")) // prerelease < release
    assert(ProjectLoader.semverMatches("1.0.0", "1.0.0")) // bare spec = exact
    // semver §11 prerelease precedence: dot-separated identifiers compare
    // segment-wise — numeric segments numerically (rc.10 > rc.2)…
    assert(ProjectLoader.semverMatches("1.0.0-rc.10", ">1.0.0-rc.2"))
    assert(!ProjectLoader.semverMatches("1.0.0-rc.2", ">1.0.0-rc.10"))
    // …numeric < alphanumeric, and a shorter list precedes a longer one
    assert(ProjectLoader.semverMatches("1.0.0-1", "<1.0.0-alpha"))
    assert(ProjectLoader.semverMatches("1.0.0-rc", "<1.0.0-rc.1"))
    assert(ProjectLoader.semverMatches("1.0.0-alpha.1", "<1.0.0-alpha.beta"))
  }
}
