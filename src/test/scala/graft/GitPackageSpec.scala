package graft

import graft.project.ProjectLoader
import graft.resolve.Resolver
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}
import scala.sys.process._

/** packages.yml `git:` kind (reference: packages.rs:76-86 GitPackage) —
  * cloned with real git, `revision:` pins a tag/branch/sha, and
  * `subdirectory:` selects a project inside a monorepo. Exercised against
  * local repositories so the path is testable offline; an https remote
  * goes through the identical clone. */
class GitPackageSpec extends AnyFunSuite {

  private def write(dir: Path, rel: String, content: String): Unit = {
    val p = dir.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  private def git(repo: Path, args: String*): Unit = {
    val cmd = Seq("git", "-C", repo.toString) ++ args
    assert(Process(cmd).! == 0, s"git ${args.mkString(" ")} failed")
  }

  /** A package repo with two states: tag v1 has tiers gold/silver and a
    * shout() macro; HEAD renames the model and changes content. */
  private def mkPackageRepo(): Path = {
    val repo = Files.createTempDirectory("graft_gitlib")
    git(repo, "init", "--quiet", "--initial-branch=main")
    git(repo, "config", "user.email", "t@t")
    git(repo, "config", "user.name", "t")
    write(repo, "dbt_project.yml",
      """name: gitlib
        |model-paths: ["models"]
        |""".stripMargin)
    write(repo, "models/tiers.sql",
      "select 'gold' as tier union all select 'silver'\n")
    write(repo, "macros/shout.sql",
      """{% macro shout(col) %}upper({{ col }}){% endmacro %}""")
    git(repo, "add", "-A")
    git(repo, "commit", "--quiet", "-m", "v1")
    git(repo, "tag", "v1")
    write(repo, "models/tiers.sql",
      "select 'bronze' as tier\n")
    git(repo, "add", "-A")
    git(repo, "commit", "--quiet", "-m", "head changes tiers")
    repo
  }

  test("git package pinned to a tag loads that revision, not HEAD") {
    val repo = mkPackageRepo()
    val proj = Files.createTempDirectory("graft_gitroot")
    write(proj, "dbt_project.yml",
      """name: rootproj
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "packages.yml",
      s"""packages:
         |  - git: ${repo.toString}
         |    revision: v1
         |""".stripMargin)
    write(proj, "models/tier_count.sql",
      "select {{ shout(\"tier\") }} as tier_u from {{ ref('gitlib', 'tiers') }}\n")
    val p = ProjectLoader.load(proj.toString)
    assert(p.packages.map(_.name) == Seq("gitlib"))
    // the pinned revision's content, not HEAD's rewrite
    assert(p.packages.head.models("tiers").contains("silver"))
    assert(p.packages.head.macroSources.exists(_.contains("macro shout")))
    val resolved = Resolver.resolve(p, "analytics")
    assert(resolved.nodes("model.rootproj.tier_count")
      .dependsOn.contains("model.gitlib.tiers"))
  }

  test("unpinned git package floats to HEAD") {
    val repo = mkPackageRepo()
    val proj = Files.createTempDirectory("graft_gitroot2")
    write(proj, "dbt_project.yml", "name: rootproj2\n")
    write(proj, "packages.yml",
      s"""packages:
         |  - git: ${repo.toString}
         |    warn-unpinned: false
         |""".stripMargin)
    val p = ProjectLoader.load(proj.toString)
    assert(p.packages.head.models("tiers").contains("bronze"))
  }

  test("subdirectory selects a project inside a monorepo") {
    val repo = Files.createTempDirectory("graft_gitmono")
    git(repo, "init", "--quiet", "--initial-branch=main")
    git(repo, "config", "user.email", "t@t")
    git(repo, "config", "user.name", "t")
    write(repo, "README.md", "monorepo\n")
    write(repo, "pkgs/sub/dbt_project.yml", "name: sublib\n")
    git(repo, "add", "-A")
    git(repo, "commit", "--quiet", "-m", "init")
    val (root, sha) = ProjectLoader.resolveGitPackage(
      repo.toString, None, Some("pkgs/sub"), warnUnpinned = false)
    assert(Files.exists(root.resolve("dbt_project.yml")))
    assert(sha.matches("[0-9a-f]{40}"))
    // missing subdirectory project fails loudly
    assertThrows[IllegalArgumentException](
      ProjectLoader.resolveGitPackage(repo.toString, None, Some("nope"),
        warnUnpinned = false))
  }

  test("private package resolves through the provider base URL") {
    // provider base = a local root holding <org>/<repo> repos (the same
    // clone an https base with embedded credentials would take)
    val base = Files.createTempDirectory("graft_private_base")
    val repo = base.resolve("acme/utilslib")
    Files.createDirectories(repo)
    git(repo, "init", "--quiet", "--initial-branch=main")
    git(repo, "config", "user.email", "t@t")
    git(repo, "config", "user.name", "t")
    write(repo, "dbt_project.yml", "name: utilslib\nmodel-paths: [\"models\"]\n")
    write(repo, "models/util_model.sql", "select 7 as lucky\n")
    git(repo, "add", "-A")
    git(repo, "commit", "--quiet", "-m", "init")
    val proj = Files.createTempDirectory("graft_private_root")
    write(proj, "dbt_project.yml", "name: privroot\n")
    write(proj, "packages.yml",
      """packages:
        |  - private: acme/utilslib
        |    warn-unpinned: false
        |""".stripMargin)
    // no base configured → names the knob
    val e = intercept[IllegalArgumentException](ProjectLoader.load(proj.toString))
    assert(e.getMessage.contains("GRAFT_PRIVATE_GIT_BASE"))
    sys.props("graft.private.git.base") = base.toString
    try {
      val p = ProjectLoader.load(proj.toString)
      assert(p.packages.map(_.name) == Seq("utilslib"))
      assert(p.packages.head.models("util_model").contains("lucky"))
      // lock entry pins the private spec to the resolved sha
      assert(p.packageLock.exists(l => l.get("private").contains("acme/utilslib")
        && l.get("revision").exists(_.toString.matches("[0-9a-f]{40}"))))
    } finally sys.props.remove("graft.private.git.base")
  }

  test("bad revision fails loudly") {
    val repo = mkPackageRepo()
    assertThrows[IllegalArgumentException](
      ProjectLoader.resolveGitPackage(repo.toString, Some("no-such-rev"), None))
  }
}
