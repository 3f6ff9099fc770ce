package graft.project

import graft.core._

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** A loaded (not yet resolved) dbt-style project — the engine's `DbtState`
  * (reference: crates/dbt-loader/src/loader.rs:64 `load`, load_inner :409).
  * Single project, local packages only: the package-hub/git resolution of
  * crates/dbt-deps is out of scope (zero-egress anyway). */
final case class Project(
    name: String,
    root: String,
    vars: Map[String, Any],
    modelPaths: Seq[String],
    seedPaths: Seq[String],
    snapshotPaths: Seq[String],
    testPaths: Seq[String],
    /** analysis-paths / macro-paths — kept so `clean` can refuse to
      * delete them (reference: collect_protected_paths,
      * crates/dbt-loader/src/dbt_project_yml_loader.rs:222-234). */
    analysisPaths: Seq[String] = Seq("analyses"),
    macroPaths: Seq[String] = Seq("macros"),
    /** dbt_project.yml `clean-targets:` — extra directories `clean`
      * removes besides the target path (reference:
      * crates/dbt-loader/src/clean.rs:59-79). */
    cleanTargets: Seq[String] = Nil,
    /** dbt_project.yml `models:` config tree (project-level configs). */
    modelConfigs: Map[String, Any],
    seedConfigs: Map[String, Any],
    /** model name → raw Jinja-SQL */
    models: Map[String, String],
    /** model name → file path */
    modelFiles: Map[String, String],
    /** `.py` files under model-paths: name → path. Python models are NOT
      * supported by this engine (reference: submit_python_job,
      * crates/dbt-adapter/src/funcs.rs:107) — they load as error nodes so
      * the gap is a structured run_results failure, never silence. */
    pythonModels: Map[String, String] = Map.empty,
    seeds: Map[String, String], // seed name → csv path
    snapshots: Map[String, String], // snapshot name → raw body
    /** singular data tests: name of a .sql file under test-paths → raw
      * Jinja-SQL selecting failing rows (reference:
      * MA/materializations/tests/test.sql:1-66) */
    tests: Map[String, String],
    /** .sql files under analysis-paths — compiled, never executed
      * (reference: nodes.rs:2100 DbtAnalysis) */
    analyses: Map[String, String] = Map.empty,
    /** .sql files under function-paths — SQL UDF bodies (reference:
      * DbtFunction nodes.rs:3875, resolve_functions.rs); `functions:`
      * properties supply arguments/returns. */
    functions: Map[String, String] = Map.empty,
    /** parsed schema.yml property files, in file order */
    properties: Seq[Map[String, Any]],
    macroSources: Seq[String],
    /** diagnostics from `-- funcsign:` static macro type-checking
      * (reference: dbt-parser funcsign extraction + the minijinja
      * funcsign_parser grammar) — empty when clean; non-empty is a
      * warning by default and a load error under
      * `funcsign-severity: error`. */
    funcsignDiagnostics: Seq[String] = Nil,
    /** names of `{% test X %}` blocks found in macro files — referenced
      * from schema.yml like built-in generic tests (reference:
      * SqlResource::Test, dbt-jinja-utils/src/phases/parse/sql_resource.rs:27) */
    customTests: Set[String] = Set.empty,
    /** `{% materialization name, adapter %}` blocks found in macro files:
      * name → adapters it was defined for ('default', 'spark', …). Loaded
      * as macros `materialization_<name>_<adapter>` (the reference's
      * materialization_macro_name convention,
      * materialization_resolver.rs:96-120); the runner invokes the
      * most-specific one when `materialized:` names them. */
    customMaterializations: Map[String, Set[String]] = Map.empty,
    /** `{% docs name %}…{% enddocs %}` blocks from .md files (reference:
      * DbtDocsMacro; dbt's doc() function) — markdown bodies referenced
      * from YAML descriptions via `{{ doc('name') }}`. */
    docsBlocks: Map[String, String] = Map.empty,
    /** parsed selectors.yml document (reference:
      * crates/dbt-selector-parser/src/parser.rs) — named selector
      * definitions; empty when the project has none. */
    selectorsDoc: Map[String, Any] = Map.empty,
    /** query-comment from dbt_project.yml (reference:
      * crates/dbt-adapter/src/query_comment.rs): Jinja template rendered
      * per node and prepended (or appended) to executed SQL. None →
      * default JSON comment. */
    queryComment: Option[String] = None,
    queryCommentAppend: Boolean = false,
    /** dbt_project.yml `on-run-start:` / `on-run-end:` hooks (string or
      * list of strings; reference: HooksConfig in
      * crates/dbt-schemas/src/schemas/project/dbt_project.rs, rendered
      * once per invocation — not per node). Only the ROOT project's hooks
      * run (dbt ignores package-level on-run-* hooks since v1). */
    onRunStart: Seq[String] = Nil,
    onRunEnd: Seq[String] = Nil,
    /** dependency projects from packages.yml `local:` entries (reference:
      * crates/dbt-schemas/src/schemas/packages.rs:27-33 LocalPackage,
      * loader integration crates/dbt-loader/src/loader.rs:64). Hub/git
      * resolution is out of scope (zero-egress); local paths cover the
      * monorepo-package workflow. */
    packages: Seq[Project] = Nil,
    /** This project's DIRECT packages.yml entries with float-y specs
      * pinned to what resolution chose (hub version ranges → the exact
      * version, git refs → the commit sha) — the rows `deps` writes to
      * package-lock.yml (reference: DbtPackagesLock). */
    packageLock: Seq[Map[String, Any]] = Nil) {
  /** Root project first, then its packages (transitively flattened). */
  def allProjects: Seq[Project] = this +: packages

  /** CLI `--vars` overlay (reference: io_args.rs `vars`, resolved with
    * highest precedence in crates/dbt-jinja-utils/src/var_fn.rs): merged
    * over every project's vars — dbt CLI vars are global, they override
    * package vars too. */
  def withCliVars(cli: Map[String, Any]): Project =
    if (cli.isEmpty) this
    else copy(vars = vars ++ cli, packages = packages.map(_.withCliVars(cli)))
}

object ProjectLoader {

  def load(rootDir: String): Project = loadInner(rootDir, Set.empty)

  /** Hub package resolution (HubPackage packages.rs:58-64). The reference
    * resolves against hub.getdbt.com (hub_client.rs:15); this engine is
    * zero-egress, so the registry is a LOCAL MIRROR directory —
    * `$GRAFT_HUB_DIR` (or `-Dgraft.hub.dir`) laid out as
    * `<org>/<name>/<version>.tar.gz`, the same archives the hub serves.
    * `version:` accepts an exact version, a comparator string
    * (">=1.0.0"), or a list of comparators ANDed together (dbt semver,
    * semver.rs); absent → newest non-prerelease, with
    * `install-prerelease: true` admitting prereleases (packages.rs:63). */
  private[graft] def sha1(s: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Returns (extracted project root, the exact version chosen). Backend
    * order: `GRAFT_HUB_URL`/`-Dgraft.hub.url` (an HTTP registry speaking
    * the hub API — off by default, this sandbox has no egress) wins over
    * `GRAFT_HUB_DIR`/`-Dgraft.hub.dir` (a local mirror directory). Both
    * share the same semver selection and lock semantics. */
  private[graft] def resolveHubPackage(pkg: String, version: Option[Any],
      installPrerelease: Boolean = false): (Path, String) = {
    val hubUrl = sys.env.get("GRAFT_HUB_URL").orElse(sys.props.get("graft.hub.url"))
    hubUrl match {
      case Some(base) => resolveHubHttp(base.stripSuffix("/"), pkg, version,
        installPrerelease)
      case None => resolveHubMirror(pkg, version, installPrerelease)
    }
  }

  /** dbt-style semver selection over the registry's available versions:
    * every comparator must hold; prereleases are admitted only when
    * requested exactly or via install-prerelease (packages.rs:63). */
  private def chooseHubVersion(pkg: String, available: Seq[String],
      version: Option[Any], installPrerelease: Boolean, origin: String): String = {
    val specs: Seq[String] = version match {
      case None => Nil
      case Some(vs: Seq[_]) => vs.map(Yaml.str)
      case Some(v) => Seq(Yaml.str(v))
    }
    val exactRequested = specs.exists(s => !s.matches("(>=|<=|>|<|=).*"))
    val candidates = available
      .filter(v => specs.forall(semverMatches(v, _)))
      .filter(v => installPrerelease || exactRequested || !v.contains("-"))
    if (candidates.isEmpty) throw new IllegalArgumentException(
      s"hub package '$pkg': no version in $origin satisfies " +
        s"${if (specs.isEmpty) "(any)" else specs.mkString(", ")} " +
        s"(available: ${available.sorted.mkString(", ")})")
    candidates.max(semverOrdering)
  }

  private def resolveHubMirror(pkg: String, version: Option[Any],
      installPrerelease: Boolean): (Path, String) = {
    val mirror = sys.env.get("GRAFT_HUB_DIR")
      .orElse(sys.props.get("graft.hub.dir"))
      .getOrElse(throw new IllegalArgumentException(
        s"hub package '$pkg' needs GRAFT_HUB_DIR (or -Dgraft.hub.dir) " +
          "pointing at a local hub mirror, or GRAFT_HUB_URL (or " +
          "-Dgraft.hub.url) naming an HTTP registry — this environment " +
          "has no egress to hub.getdbt.com"))
    val dir = Paths.get(mirror).resolve(pkg)
    if (!Files.isDirectory(dir)) throw new IllegalArgumentException(
      s"hub package '$pkg' not found in mirror $mirror")
    val available = {
      val stream = Files.list(dir)
      try stream.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".tar.gz")).map(_.stripSuffix(".tar.gz")).toSeq
      finally stream.close()
    }
    val chosen = chooseHubVersion(pkg, available, version, installPrerelease,
      "mirror")
    (extractTarball(dir.resolve(s"$chosen.tar.gz")), chosen)
  }

  /** HTTP hub registry (reference: hub_client.rs — `GET
    * {base}/api/v1/{org}/{name}.json` returns a `versions` map whose
    * entries carry `downloads.tarball`; one `redirectnamespace`/
    * `redirectname` hop is followed like the hub client does). Downloads
    * cache per (base, pkg, version) for the JVM's lifetime, mirroring the
    * git-clone cache. */
  private val hubHttpCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), Path]()

  private def httpGet(url: String): Array[Byte] = {
    val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofSeconds(30)).build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(120)).GET().build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() / 100 != 2) throw new IllegalArgumentException(
      s"hub registry GET $url failed: HTTP ${resp.statusCode()}")
    resp.body()
  }

  private def resolveHubHttp(base: String, pkg: String, version: Option[Any],
      installPrerelease: Boolean, redirectHops: Int = 1): (Path, String) = {
    val doc = graft.jinja.Json.parse(
      new String(httpGet(s"$base/api/v1/$pkg.json"), "UTF-8"))
      .asInstanceOf[Map[String, Any]]
    // the hub emits both keys with null when unused — treat null as absent
    (doc.get("redirectnamespace").filter(_ != null),
        doc.get("redirectname").filter(_ != null)) match {
      case (ns, nm) if (ns.nonEmpty || nm.nonEmpty) && redirectHops > 0 =>
        val Array(org, name) = pkg.split("/", 2)
        val target = s"${ns.map(_.toString).getOrElse(org)}/" +
          s"${nm.map(_.toString).getOrElse(name)}"
        System.err.println(s"[warn] hub package $pkg redirects to $target")
        resolveHubHttp(base, target, version, installPrerelease, redirectHops - 1)
      case _ =>
        val versions = doc.getOrElse("versions", Map.empty)
          .asInstanceOf[Map[String, Any]]
        val chosen = chooseHubVersion(pkg, versions.keys.toSeq, version,
          installPrerelease, s"registry $base")
        val dir = hubHttpCache.computeIfAbsent((base, pkg, chosen), _ => {
          val tarballUrl = versions(chosen).asInstanceOf[Map[String, Any]]
            .get("downloads").collect { case d: Map[_, _] =>
              d.asInstanceOf[Map[String, Any]].get("tarball") }.flatten
            .map(_.toString).getOrElse(throw new IllegalArgumentException(
              s"hub package '$pkg' $chosen: registry entry has no " +
                "downloads.tarball URL"))
          val tmp = Files.createTempFile(s"graft_hub_${pkg.replace('/', '_')}",
            ".tar.gz")
          Files.write(tmp, httpGet(
            if (tarballUrl.startsWith("http")) tarballUrl
            else base + "/" + tarballUrl.stripPrefix("/")))
          extractTarball(tmp)
        })
        (dir, chosen)
    }
  }

  /** major.minor.patch[-prerelease]; release outranks its prereleases
    * (semver.rs ordering). */
  private def semverKey(v: String): (Long, Long, Long, Option[String]) = {
    val m = raw"(\d+)\.(\d+)\.(\d+)(?:-([0-9A-Za-z.-]+))?.*".r
    v match {
      case m(a, b, c, pre) => (a.toLong, b.toLong, c.toLong, Option(pre))
      case _ => throw new IllegalArgumentException(s"bad semver: $v")
    }
  }

  /** Semver §11 prerelease precedence: compare dot-separated identifiers
    * left to right — both numeric → numeric compare (rc.10 > rc.2),
    * numeric < alphanumeric, otherwise ASCII compare; a shorter
    * identifier list precedes a longer one with an equal prefix. */
  private def cmpPrerelease(p: String, q: String): Int = {
    val ps = p.split('.'); val qs = q.split('.')
    var i = 0
    while (i < math.min(ps.length, qs.length)) {
      val (a, b) = (ps(i), qs(i))
      val an = a.nonEmpty && a.forall(_.isDigit)
      val bn = b.nonEmpty && b.forall(_.isDigit)
      val c =
        if (an && bn) java.lang.Long.compare(a.toLong, b.toLong)
        else if (an) -1
        else if (bn) 1
        else a.compareTo(b)
      if (c != 0) return c
      i += 1
    }
    Integer.compare(ps.length, qs.length)
  }

  private val semverOrdering: Ordering[String] = new Ordering[String] {
    def compare(x: String, y: String): Int = {
      val (xa, xb, xc, xp) = semverKey(x); val (ya, yb, yc, yp) = semverKey(y)
      var c = java.lang.Long.compare(xa, ya)
      if (c == 0) c = java.lang.Long.compare(xb, yb)
      if (c == 0) c = java.lang.Long.compare(xc, yc)
      if (c != 0) c
      else (xp, yp) match {
        case (None, None) => 0
        case (None, Some(_)) => 1 // release outranks its prereleases
        case (Some(_), None) => -1
        case (Some(p), Some(q)) => cmpPrerelease(p, q)
      }
    }
  }

  private[graft] def semverMatches(v: String, spec: String): Boolean = {
    val m = raw"(>=|<=|>|<|=)?\s*(\S+)".r
    val (op, target) = spec.trim match {
      case m(o, t) => (Option(o).getOrElse("="), t)
      case other => throw new IllegalArgumentException(s"bad version spec: $other")
    }
    val c = semverOrdering.compare(v, target)
    op match {
      case "=" => c == 0
      case ">=" => c >= 0
      case "<=" => c <= 0
      case ">" => c > 0
      case "<" => c < 0
    }
  }

  /** `git:` package resolution (GitPackage packages.rs:76-86): clone the
    * repo, check out the pinned `revision:` (tag / branch / commit sha),
    * return the project root — `subdirectory:` deep when given. Clones
    * cache per (url, revision, subdirectory) for the JVM's lifetime, the
    * same dedup dbt's package-lock install gives a single invocation.
    * Unpinned deps float to the clone's default HEAD and warn, matching
    * dbt's warn-unpinned behavior. */
  private val gitPkgCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), (Path, String)]()
  /** Returns (package project root, the resolved commit sha — the value a
    * lock file pins). */
  private[graft] def resolveGitPackage(url: String, revision: Option[String],
      subdirectory: Option[String], warnUnpinned: Boolean = true): (Path, String) =
    gitPkgCache.computeIfAbsent(
      (url, revision.getOrElse(""), subdirectory.getOrElse("")), _ => {
        if (revision.isEmpty && warnUnpinned)
          System.err.println(s"[warn] git package $url is not pinned to a " +
            "revision — add `revision:` (or `warn-unpinned: false`)")
        val dest = Files.createTempDirectory("graft_git_pkg")
        def git(args: String*): String = {
          val pb = new ProcessBuilder(("git" +: args): _*)
          pb.redirectErrorStream(true)
          val proc = pb.start()
          val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
          if (proc.waitFor() != 0) throw new IllegalArgumentException(
            s"git ${args.mkString(" ")} failed:\n$out")
          out.trim
        }
        git("clone", "--quiet", url, dest.toString)
        revision.foreach(r =>
          git("-C", dest.toString, "checkout", "--quiet", r))
        val sha = git("-C", dest.toString, "rev-parse", "HEAD")
        val rootDir = subdirectory.map(dest.resolve).getOrElse(dest)
        if (!Files.exists(rootDir.resolve("dbt_project.yml")))
          throw new IllegalArgumentException(
            s"git package $url has no dbt_project.yml at " +
              subdirectory.getOrElse("the repo root"))
        (rootDir, sha)
      })

  /** Extract a .tar.gz package (ustar layout, the hub archive format) and
    * return the project root inside it: the extraction root if it holds
    * dbt_project.yml directly, else the single archive top-level dir that
    * does (the `<name>-<version>/` layout hub tarballs use). */
  private[graft] def extractTarball(tarGz: Path): Path = {
    if (!Files.exists(tarGz))
      throw new IllegalArgumentException(s"tarball package not found: $tarGz")
    val dest = Files.createTempDirectory("graft_tarball_pkg")
    val gz = new java.util.zip.GZIPInputStream(
      new java.io.BufferedInputStream(Files.newInputStream(tarGz)))
    try {
      val header = new Array[Byte](512)
      val buf = new Array[Byte](8192)
      def readFully(b: Array[Byte], len: Int): Boolean = {
        var off = 0
        while (off < len) {
          val r = gz.read(b, off, len - off)
          if (r < 0) return false
          off += r
        }
        true
      }
      def skipBytes(n: Long): Unit = {
        var remaining = n
        while (remaining > 0) {
          val r = gz.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
          if (r < 0) throw new IllegalStateException(s"truncated tarball $tarGz")
          remaining -= r
        }
      }
      def str(off: Int, len: Int) =
        new String(header, off, len, "UTF-8").takeWhile(_ != 0)
      var done = false
      while (!done) {
        if (!readFully(header, 512) || header.forall(_ == 0)) done = true
        else {
          // ustar: name 0..100, size (octal) 124..136, typeflag 156,
          // name prefix 345..500
          val prefix = str(345, 155)
          val name = if (prefix.nonEmpty) s"$prefix/${str(0, 100)}" else str(0, 100)
          val sizeStr = str(124, 12).trim
          val size = if (sizeStr.isEmpty) 0L else java.lang.Long.parseLong(sizeStr, 8)
          val typeFlag = header(156)
          val target = dest.resolve(name).normalize()
          if (!target.startsWith(dest))
            throw new IllegalArgumentException(s"tarball entry escapes dest: $name")
          if (typeFlag == '5'.toByte) Files.createDirectories(target)
          else if (typeFlag == '0'.toByte || typeFlag == 0.toByte) {
            Files.createDirectories(target.getParent)
            val out = Files.newOutputStream(target)
            try {
              var remaining = size
              while (remaining > 0) {
                val r = gz.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
                if (r < 0) throw new IllegalStateException(s"truncated tarball $tarGz")
                out.write(buf, 0, r)
                remaining -= r
              }
            } finally out.close()
          } else skipBytes(size) // links/pax headers: data skipped
          skipBytes((512 - (size % 512)) % 512)
        }
      }
    } finally gz.close()
    if (Files.exists(dest.resolve("dbt_project.yml"))) dest
    else {
      val stream = Files.list(dest)
      try stream.iterator().asScala
        .filter(Files.isDirectory(_))
        .find(d => Files.exists(d.resolve("dbt_project.yml")))
        .getOrElse(throw new IllegalArgumentException(
          s"tarball $tarGz contains no dbt_project.yml"))
      finally stream.close()
    }
  }

  private def loadInner(rootDir: String, seen: Set[String]): Project = {
    val root = Paths.get(rootDir)
    val projYml = root.resolve("dbt_project.yml")
    val cfg =
      if (Files.exists(projYml)) Yaml.parseMap(Files.readString(projYml))
      else Map.empty[String, Any]

    val name = Yaml.dig(cfg, "name").map(Yaml.str).getOrElse("project")
    val modelPaths = Yaml.dig(cfg, "model-paths").map(Yaml.strSeq)
      .getOrElse(Seq("models"))
    val seedPaths = Yaml.dig(cfg, "seed-paths").map(Yaml.strSeq)
      .getOrElse(Seq("seeds"))
    val snapshotPaths = Yaml.dig(cfg, "snapshot-paths").map(Yaml.strSeq)
      .getOrElse(Seq("snapshots"))
    val testPaths = Yaml.dig(cfg, "test-paths").map(Yaml.strSeq)
      .getOrElse(Seq("tests"))
    val analysisPaths = Yaml.dig(cfg, "analysis-paths").map(Yaml.strSeq)
      .getOrElse(Seq("analyses"))
    val macroPaths = Yaml.dig(cfg, "macro-paths").map(Yaml.strSeq)
      .getOrElse(Seq("macros"))
    // `function-paths:` (reference dbt_project.rs:126-127) — .sql bodies
    // of SQL UDF nodes, default functions/
    val functionPaths = Yaml.dig(cfg, "function-paths").map(Yaml.strSeq)
      .getOrElse(Seq("functions"))
    val vars = Yaml.dig(cfg, "vars").map(_.asInstanceOf[Map[String, Any]])
      .getOrElse(Map.empty)

    def files(paths: Seq[String], ext: String): Seq[Path] =
      paths.map(root.resolve).filter(Files.isDirectory(_)).flatMap { dir =>
        val stream = Files.walk(dir)
        try stream.iterator().asScala
          .filter(p => p.toString.endsWith(ext) && Files.isRegularFile(p))
          .toSeq.sortBy(_.toString)
        finally stream.close()
      }

    def nameOf(p: Path): String = {
      val f = p.getFileName.toString
      f.substring(0, f.lastIndexOf('.'))
    }

    val modelFiles = files(modelPaths, ".sql").map(p => nameOf(p) -> p).toMap
    val models = modelFiles.map { case (n, p) => n -> Files.readString(p) }
    val pythonModels = files(modelPaths, ".py")
      .map(p => nameOf(p) -> p.toString).toMap
    val seeds = files(seedPaths, ".csv").map(p => nameOf(p) -> p.toString).toMap
    val snapshots = files(snapshotPaths, ".sql")
      .map(p => nameOf(p) -> Files.readString(p)).toMap
    val tests = files(testPaths, ".sql")
      .map(p => nameOf(p) -> Files.readString(p)).toMap
    val analyses = files(analysisPaths, ".sql")
      .map(p => nameOf(p) -> Files.readString(p)).toMap
    val functionsSql = files(functionPaths, ".sql")
      .map(p => nameOf(p) -> Files.readString(p)).toMap
    val properties =
      (files(modelPaths, ".yml") ++ files(modelPaths, ".yaml") ++
        files(seedPaths, ".yml") ++ files(snapshotPaths, ".yml") ++
        files(testPaths, ".yml") ++ files(functionPaths, ".yml"))
        .map(p => Yaml.parseMap(Files.readString(p)))
    // dbt's {% test X(...) %} blocks are macros named test_X — rewrite the
    // block syntax up front so the Jinja interpreter needs no new node type
    // and both the resolver and the runner see the same prelude.
    val testBlock = raw"\{%-?\s*test\s+([A-Za-z_][A-Za-z0-9_]*)".r
    // {% materialization name, default %} / {% materialization name,
    // adapter='spark' %} → macro materialization_name_<adapter>() (the
    // reference compiles the block to the same function name:
    // minijinja materialization_macro_name + materialization_resolver.rs)
    // header forms: `name, default` / `name, adapter='spark'` — possibly
    // with trailing kwargs (`, supported_languages=['sql']`), which real
    // dbt-adapters headers carry and we accept-and-ignore
    val matBlock =
      raw"\{%-?\s*materialization\s+([A-Za-z_][A-Za-z0-9_]*)\s*,\s*(?:adapter\s*=\s*)?['\x22]?([A-Za-z_]+)['\x22]?\s*(?:,[^%]*?)?-?%\}".r
    val rawMacros = files(macroPaths, ".sql").map(Files.readString(_))
    val customTests = rawMacros
      .flatMap(src => testBlock.findAllMatchIn(src).map(_.group(1))).toSet
    val customMats = rawMacros
      .flatMap(src => matBlock.findAllMatchIn(src).map(m => (m.group(1), m.group(2))))
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val macroSources = rawMacros.map { src =>
      val t = testBlock.replaceAllIn(src, m => s"{% macro test_${m.group(1)}")
        .replaceAll(raw"\{%-?\s*endtest\s*-?%\}", "{% endmacro %}")
      matBlock.replaceAllIn(t,
          m => s"{% macro materialization_${m.group(1)}_${m.group(2)}() %}")
        .replaceAll(raw"\{%-?\s*endmaterialization\s*-?%\}", "{% endmacro %}")
    }

    // {% docs name %}…{% enddocs %} blocks from .md files under model +
    // macro paths (dbt doc blocks; referenced as {{ doc('name') }})
    val docsBlock =
      raw"(?s)\{%-?\s*docs\s+([A-Za-z_][A-Za-z0-9_]*)\s*-?%\}(.*?)\{%-?\s*enddocs\s*-?%\}".r
    val docsBlocks: Map[String, String] =
      (files(modelPaths, ".md") ++ files(macroPaths, ".md"))
        .map(Files.readString(_))
        .flatMap(src => docsBlock.findAllMatchIn(src)
          .map(m => m.group(1) -> m.group(2).trim))
        .toMap

    // packages.yml deps — `local:` paths, `tarball:` local archives,
    // `git:` repositories with `revision:` pinning + `subdirectory:`, and
    // hub `package:`/`version:` entries resolved from a local mirror
    // (reference: packages.rs:27-33 DbtPackageEntry::{Local,Tarball,Git,
    // Hub}; Private needs a provider-auth registry and stays out of
    // scope). Git URLs resolve through a real `git clone`, so local
    // paths and file:// remotes work offline while https remotes work
    // where egress exists. Loaded recursively, flattened, cycle-safe.
    val canonical = root.toAbsolutePath.normalize.toString
    val pkgYml = root.resolve("packages.yml")
    // package-lock.yml pins float-y entries (hub version ranges, unpinned
    // git revisions) to what a previous `deps` resolved — honored only
    // while its recorded sha1 still matches packages.yml (stale locks are
    // ignored, like dbt's upgrade path). Reference: DbtPackagesLock,
    // steps/load_package_lock.rs.
    val lockFile = root.resolve("package-lock.yml")
    val lockEntries: Seq[Map[String, Any]] =
      if (!Files.exists(lockFile) || !Files.exists(pkgYml)) Nil
      else {
        val doc = Yaml.parseMap(Files.readString(lockFile))
        val fresh = Yaml.dig(doc, "sha1_hash").map(Yaml.str)
          .contains(sha1(Files.readString(pkgYml)))
        if (!fresh) Nil
        else Yaml.dig(doc, "packages").toSeq.flatMap {
          case ps: Seq[_] => ps.collect { case m: Map[_, _] =>
            m.asInstanceOf[Map[String, Any]] }
          case _ => Nil
        }
      }
    val lockedHub: Map[String, String] = lockEntries.flatMap(e =>
      for (p <- e.get("package"); v <- e.get("version"))
        yield Yaml.str(p) -> Yaml.str(v)).toMap
    val lockedGit: Map[String, String] = lockEntries.flatMap(e =>
      for (u <- e.get("git"); r <- e.get("revision"))
        yield Yaml.str(u) -> Yaml.str(r)).toMap
    val lockedPrivate: Map[String, String] = lockEntries.flatMap(e =>
      for (p <- e.get("private"); r <- e.get("revision"))
        yield Yaml.str(p) -> Yaml.str(r)).toMap
    val resolvedPkgs: Seq[(String, Map[String, Any])] =
      if (!Files.exists(pkgYml) || seen.contains(canonical)) Nil
      else Yaml.dig(Yaml.parseMap(Files.readString(pkgYml)), "packages")
        .toSeq.flatMap {
          case ps: Seq[_] => ps.collect { case p: Map[_, _] =>
            val entry = p.asInstanceOf[Map[String, Any]]
            entry.get("local").map(Yaml.str)
              .map(rel => (root.resolve(rel).normalize().toString,
                Map[String, Any]("local" -> rel)))
              .orElse(entry.get("tarball").map(Yaml.str).map { t =>
                (extractTarball(root.resolve(t).normalize()).toString,
                  Map[String, Any]("tarball" -> t))
              })
              .orElse(entry.get("git").map(Yaml.str).map { url =>
                val (dir, sha) = resolveGitPackage(url,
                  entry.get("revision").map(Yaml.str)
                    .orElse(lockedGit.get(url)),
                  entry.get("subdirectory").map(Yaml.str),
                  warnUnpinned = entry.get("warn-unpinned")
                    .forall(v => Yaml.str(v) != "false"))
                (dir.toString, Map[String, Any]("git" -> url,
                  "revision" -> sha) ++
                  entry.get("subdirectory").map(s =>
                    "subdirectory" -> Yaml.str(s)))
              })
              .orElse(entry.get("private").map(Yaml.str).map { spec =>
                // private = git whose URL comes from a provider base the
                // credentials ride on (private_package.rs ProviderDetail
                // resolved_url; dbt reads the provider config from env) —
                // GRAFT_PRIVATE_GIT_BASE is that base, e.g.
                // `https://<token>@github.com` or a local bare-repo root
                val base = sys.env.get("GRAFT_PRIVATE_GIT_BASE")
                  .orElse(sys.props.get("graft.private.git.base"))
                  .getOrElse(throw new IllegalArgumentException(
                    s"private package '$spec' needs GRAFT_PRIVATE_GIT_BASE " +
                      "(or -Dgraft.private.git.base) — the provider base " +
                      "URL its credentials ride on"))
                val url = base.stripSuffix("/") + "/" + spec
                val (dir, sha) = resolveGitPackage(url,
                  entry.get("revision").map(Yaml.str)
                    .orElse(lockedPrivate.get(spec)),
                  entry.get("subdirectory").map(Yaml.str),
                  warnUnpinned = entry.get("warn-unpinned")
                    .forall(v => Yaml.str(v) != "false"))
                (dir.toString, Map[String, Any]("private" -> spec,
                  "revision" -> sha) ++
                  entry.get("subdirectory").map(s =>
                    "subdirectory" -> Yaml.str(s)))
              })
              .orElse(entry.get("package").map(Yaml.str).map { pkg =>
                // a fresh lock wins over a RANGE spec as long as its
                // pinned version still satisfies it (dbt's no-upgrade
                // deps path); a lock that violates the spec is ignored
                val specStrs: Seq[String] = entry.get("version") match {
                  case None => Nil
                  case Some(vs: Seq[_]) => vs.map(Yaml.str)
                  case Some(v) => Seq(Yaml.str(v))
                }
                val locked = lockedHub.get(pkg)
                  .filter(lv => specStrs.forall(semverMatches(lv, _)))
                val (dir, chosen) = resolveHubPackage(pkg,
                  locked.orElse(entry.get("version")),
                  installPrerelease = entry.get("install-prerelease")
                    .exists(v => Yaml.str(v) == "true"))
                (dir.toString, Map[String, Any]("package" -> pkg,
                  "version" -> chosen))
              })
          }.flatten
          case _ => Nil
        }
    val packages: Seq[Project] = resolvedPkgs.map(_._1)
        .flatMap { dir =>
          val sub = loadInner(dir, seen + canonical)
          sub +: sub.packages // flatten transitive deps
        }

    // `-- funcsign:` static macro type-checking (reference:
    // dbt-parser/src/utils.rs funcsign extraction + the minijinja
    // funcsign_parser grammar): annotated macros are checked for
    // signature/parameter arity agreement, and every call site in this
    // project's macros, models, snapshots, tests, and analyses is
    // checked for arity, unknown/duplicate keywords, and literal-type
    // contradictions. `funcsign-severity: error` in dbt_project.yml
    // fails the load; the default records + warns.
    val macroFileNames = files(macroPaths, ".sql").map(_.getFileName.toString)
    // the builtin graft_* macros carry shipped signatures
    // (BuiltinMacros.funcsignSource) — FIRST in the list so a project
    // macro of the same name overrides its signature too (the sigs map
    // is name-keyed, later entries win: Root > Core)
    val funcsignDiags = graft.jinja.FuncSign.analyze(
      ("<builtin graft macros>" -> graft.funcs.BuiltinMacros.funcsignSource)
        +: macroFileNames.zip(macroSources),
      (models.toSeq ++ snapshots.map { case (n, s) => (s"snapshot $n", s) }
        ++ tests.map { case (n, s) => (s"test $n", s) }
        ++ analyses.map { case (n, s) => (s"analysis $n", s) }
        ++ functionsSql.map { case (n, s) => (s"function $n", s) }).toSeq)
    if (funcsignDiags.nonEmpty) {
      if (Yaml.dig(cfg, "funcsign-severity").map(Yaml.str)
          .contains("error"))
        throw new IllegalArgumentException(
          "funcsign type-check failed:\n  " +
            funcsignDiags.mkString("\n  "))
      funcsignDiags.foreach(d =>
        System.err.println(s"[funcsign] warning: $d"))
    }

    Project(
      name = name,
      root = rootDir,
      vars = vars,
      modelPaths = modelPaths,
      seedPaths = seedPaths,
      snapshotPaths = snapshotPaths,
      testPaths = testPaths,
      analysisPaths = analysisPaths,
      macroPaths = macroPaths,
      cleanTargets = Yaml.dig(cfg, "clean-targets").map(Yaml.strSeq)
        .getOrElse(Nil),
      modelConfigs = Yaml.dig(cfg, "models").map(_.asInstanceOf[Map[String, Any]])
        .getOrElse(Map.empty),
      seedConfigs = Yaml.dig(cfg, "seeds").map(_.asInstanceOf[Map[String, Any]])
        .getOrElse(Map.empty),
      models = models,
      modelFiles = modelFiles.map { case (n, p) => n -> p.toString },
      pythonModels = pythonModels,
      seeds = seeds,
      snapshots = snapshots,
      tests = tests,
      analyses = analyses,
      functions = functionsSql,
      properties = properties,
      macroSources = macroSources,
      funcsignDiagnostics = funcsignDiags,
      customTests = customTests,
      customMaterializations = customMats,
      docsBlocks = docsBlocks,
      selectorsDoc = {
        val selYml = root.resolve("selectors.yml")
        if (Files.exists(selYml)) Yaml.parseMap(Files.readString(selYml))
        else Map.empty
      },
      queryComment = Yaml.dig(cfg, "query-comment") match {
        case Some(s: String) => Some(s)
        case Some(m: Map[_, _]) =>
          Yaml.dig(m.asInstanceOf[Map[String, Any]], "comment").map(Yaml.str)
        case _ => None
      },
      queryCommentAppend = Yaml.dig(cfg, "query-comment") match {
        case Some(m: Map[_, _]) =>
          Yaml.dig(m.asInstanceOf[Map[String, Any]], "append")
            .exists(v => Yaml.str(v).toBoolean)
        case _ => false
      },
      onRunStart = Yaml.dig(cfg, "on-run-start").map(Yaml.strSeq).getOrElse(Nil),
      onRunEnd = Yaml.dig(cfg, "on-run-end").map(Yaml.strSeq).getOrElse(Nil),
      packages = packages.distinctBy(_.name),
      packageLock = resolvedPkgs.map(_._2))
  }
}
