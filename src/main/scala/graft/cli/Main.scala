package graft.cli

import graft.core.NodeKind
import graft.project.ProjectLoader
import graft.run.Runner
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** CLI — the engine's `dbt` commands (reference:
  * crates/dbt-sa-cli/src/main.rs → execute_fs dbt_sa_lib.rs:45-72).
  *
  * Usage:
  *   graft.cli.Main <parse|compile|run|test|seed|snapshot|build|list|docs|sample|clean|debug|man>
  *     [--project-dir DIR] [--select SPEC] [--selector NAME]
  *     [--full-refresh] [--threads N] [--schema NAME] [--target-path DIR]
  *     [--state DIR] [--defer] [--sample PLAN.yml] [--sample-suffix SFX]
  */
object Main {

  final case class Args(
      command: String = "run",
      projectDir: String = ".",
      select: Option[String] = None,
      exclude: Option[String] = None,
      selector: Option[String] = None,
      fullRefresh: Boolean = false,
      threads: Int = 4,
      schema: String = "analytics",
      targetPath: String = "target",
      state: Option[String] = None,
      defer: Boolean = false,
      /** run-operation: macro name + --args JSON/YAML dict */
      macroName: Option[String] = None,
      macroArgs: Map[String, Any] = Map.empty,
      /** show: ad-hoc Jinja-SQL via --inline; row cap via --limit */
      inline: Option[String] = None,
      limit: Int = 5,
      /** --vars 'YAML/JSON dict': highest-precedence var() overlay,
        * global across packages (dbt CLI semantics). */
      cliVars: Map[String, Any] = Map.empty,
      /** --empty: compile every ref()/source() to LIMIT 0 (schema-only
        * dry run). */
      empty: Boolean = false,
      /** list --output: "name" (unique ids, default) or "json" (one JSON
        * object per node, dbt ls shape). */
      output: String = "name",
      /** list --resource-type / --exclude-resource-type (reference
        * io_args.rs:287-289 resource_types/exclude_resource_types):
        * kind-name filters over the selection; repeatable and
        * comma-splittable. */
      resourceTypes: Seq[String] = Nil,
      excludeResourceTypes: Seq[String] = Nil,
      /** --fail-fast: stop scheduling after the first failed node. */
      failFast: Boolean = false,
      /** --warn-error (io_args.rs:335): promote warnings to errors —
        * warn-status tests/freshness fail the exit code, funcsign
        * warnings fail the load. */
      warnError: Boolean = false,
      /** --indirect-selection (IndirectSelection node_selector.rs:49-55):
        * eager (default) | buildable | cautious | empty. */
      indirectSelection: String = "eager",
      /** --event-time-start/--event-time-end: explicit microbatch
        * backfill window ("yyyy-MM-dd[ HH:mm:ss]"). */
      eventTimeStart: Option[String] = None,
      eventTimeEnd: Option[String] = None,
      /** init: the new project's name/directory. */
      initName: Option[String] = None,
      /** --sample <plan.yml>: sampler plan — `sample` materializes the
        * plan's entries; `run --sample` remaps source() onto them
        * (reference crates/dbt-sample/src/plan.rs). */
      samplePlan: Option[String] = None,
      /** --sample-suffix: sampled-namespace schema suffix. */
      sampleSuffix: String = "__sample",
      /** clean: extra relative directories to remove on top of the
        * project's clean-targets (reference CleanArgs.files,
        * crates/dbt-sa-cli/src/dbt_sa_clap.rs:172-176). */
      cleanFiles: Seq[String] = Nil,
      /** --record FILE.jsonl: record every warehouse interaction of this
        * run (reference record_and_replay.rs test harness). */
      record: Option[String] = None,
      /** --replay-verify FILE.jsonl: diff this run's interactions
        * against a recording; mismatches print and fail the exit code. */
      replayVerify: Option[String] = None,
      /** --replay-offline FILE.jsonl: re-run the project with NO live
        * data plane — reads served from the recording's query cache
        * (FILE.jsonl.cache/), writes schema-only, interactions verified
        * against the recording (reference record_and_replay.rs replay:
        * recorded results without a warehouse). */
      replayOffline: Option[String] = None)

  /** "yyyy-MM-dd" or "yyyy-MM-dd HH:mm:ss" → Timestamp, interpreted at
    * UTC — MicrobatchRunner truncates and windows batches at
    * ZoneOffset.UTC, so a local-zone parse would shift the backfill by
    * the host's UTC offset. */
  private def parseTs(s: String): java.sql.Timestamp = {
    val text = if (s.contains(":")) s else s + " 00:00:00"
    val ldt = java.time.LocalDateTime.parse(text.replace(' ', 'T'))
    java.sql.Timestamp.from(ldt.toInstant(java.time.ZoneOffset.UTC))
  }

  def parseArgs(argv: Array[String]): Args = {
    var a = Args(command = argv.headOption.getOrElse("run"))
    var i = 1
    // dbt spells it `source freshness` (two tokens)
    if (a.command == "source" && argv.lift(1).contains("freshness")) {
      a = a.copy(command = "source-freshness"); i = 2
    }
    // run-operation <macro> [--args '{k: v}']
    if (a.command == "run-operation" && argv.length > 1 &&
        !argv(1).startsWith("--")) {
      a = a.copy(macroName = Some(argv(1))); i = 2
    }
    // init <project_name>
    if (a.command == "init" && argv.length > 1 && !argv(1).startsWith("--")) {
      a = a.copy(initName = Some(argv(1))); i = 2
    }
    // sample <plan.yml>
    if (a.command == "sample" && argv.length > 1 && !argv(1).startsWith("--")) {
      a = a.copy(samplePlan = Some(argv(1))); i = 2
    }
    // clean [dir ...]
    if (a.command == "clean") {
      while (i < argv.length && !argv(i).startsWith("--")) {
        a = a.copy(cleanFiles = a.cleanFiles :+ argv(i)); i += 1
      }
    }
    while (i < argv.length) {
      argv(i) match {
        case "--project-dir" => a = a.copy(projectDir = argv(i + 1)); i += 2
        case "--select" | "-s" => a = a.copy(select = Some(argv(i + 1))); i += 2
        case "--exclude" => a = a.copy(exclude = Some(argv(i + 1))); i += 2
        case "--selector" => a = a.copy(selector = Some(argv(i + 1))); i += 2
        case "--full-refresh" => a = a.copy(fullRefresh = true); i += 1
        case "--threads" => a = a.copy(threads = argv(i + 1).toInt); i += 2
        case "--schema" => a = a.copy(schema = argv(i + 1)); i += 2
        case "--target-path" => a = a.copy(targetPath = argv(i + 1)); i += 2
        case "--state" => a = a.copy(state = Some(argv(i + 1))); i += 2
        case "--args" =>
          a = a.copy(macroArgs =
            graft.project.Yaml.parseMap(argv(i + 1))); i += 2
        case "--vars" =>
          a = a.copy(cliVars =
            graft.project.Yaml.parseMap(argv(i + 1))); i += 2
        case "--inline" => a = a.copy(inline = Some(argv(i + 1))); i += 2
        case "--limit" => a = a.copy(limit = argv(i + 1).toInt); i += 2
        case "--defer" => a = a.copy(defer = true); i += 1
        case "--empty" => a = a.copy(empty = true); i += 1
        case "--output" => a = a.copy(output = argv(i + 1)); i += 2
        case "--resource-type" | "--resource-types" =>
          a = a.copy(resourceTypes = a.resourceTypes ++
            argv(i + 1).split(",").map(_.trim).filter(_.nonEmpty)); i += 2
        case "--exclude-resource-type" | "--exclude-resource-types" =>
          a = a.copy(excludeResourceTypes = a.excludeResourceTypes ++
            argv(i + 1).split(",").map(_.trim).filter(_.nonEmpty)); i += 2
        case "--fail-fast" => a = a.copy(failFast = true); i += 1
        case "--warn-error" => a = a.copy(warnError = true); i += 1
        case "--indirect-selection" =>
          a = a.copy(indirectSelection = argv(i + 1)); i += 2
        case "--event-time-start" =>
          a = a.copy(eventTimeStart = Some(argv(i + 1))); i += 2
        case "--event-time-end" =>
          a = a.copy(eventTimeEnd = Some(argv(i + 1))); i += 2
        case "--sample" => a = a.copy(samplePlan = Some(argv(i + 1))); i += 2
        case "--sample-suffix" =>
          a = a.copy(sampleSuffix = argv(i + 1)); i += 2
        case "--record" => a = a.copy(record = Some(argv(i + 1))); i += 2
        case "--replay-verify" =>
          a = a.copy(replayVerify = Some(argv(i + 1))); i += 2
        case "--replay-offline" =>
          a = a.copy(replayOffline = Some(argv(i + 1))); i += 2
        case other => throw new IllegalArgumentException(s"unknown flag: $other")
      }
    }
    a
  }

  /** Kind filter per command (dbt run/test/seed/snapshot semantics; build
    * runs everything in DAG order). */
  private def kindFilter(cmd: String): NodeKind => Boolean = cmd match {
    // functions build during `run` like the reference (they are a
    // materialization models depend on)
    case "run" => k => k == NodeKind.Model || k == NodeKind.Function
    case "test" => k => k == NodeKind.Test || k == NodeKind.UnitTest
    case "seed" => _ == NodeKind.Seed
    case "snapshot" => _ == NodeKind.Snapshot
    case _ => _ => true
  }

  def main(argv: Array[String]): Unit = {
    val args = parseArgs(argv)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // propagate the command's status as the process exit code — dbt
    // scripting (CI gating on `dbt build`) relies on nonzero exits
    val rc = try run(spark, args) finally spark.stop()
    if (rc != 0) sys.exit(rc)
  }

  def run(spark: SparkSession, args: Args): Int = {
    require(Seq(args.record, args.replayVerify, args.replayOffline)
      .count(_.isDefined) <= 1,
      "--record, --replay-verify and --replay-offline are mutually exclusive")
    if (spark != null) {
      import graft.adapter.{InteractionLog, QueryCache, SparkAdapter}
      args.record.foreach { p =>
        spark.conf.set(InteractionLog.ModeKey, "record")
        spark.conf.set(InteractionLog.PathKey, p)
        InteractionLog.reset(spark)
        // read-query results land beside the interaction log so a later
        // --replay-offline can serve them without a warehouse
        spark.conf.set(QueryCache.ModeKey, "record")
        spark.conf.set(QueryCache.PathKey, s"$p.cache")
      }
      args.replayVerify.foreach { p =>
        // fail fast on a missing recording — otherwise every live
        // interaction diffs against an empty multiset and the user gets
        // a wall of mismatches instead of "file not found"
        if (!Files.exists(Paths.get(p))) {
          System.err.println(s"--replay-verify: recording not found: $p")
          return 2
        }
        spark.conf.set(InteractionLog.ModeKey, "verify")
        spark.conf.set(InteractionLog.PathKey, p)
        InteractionLog.reset(spark)
        // a PRIOR --record run in this session left the cache in record
        // mode; a verify run must not overwrite the golden results with
        // its own (possibly divergent) live reads
        spark.conf.set(QueryCache.ModeKey, "off")
      }
      args.replayOffline.foreach { p =>
        if (!Files.exists(Paths.get(p))) {
          System.err.println(s"--replay-offline: recording not found: $p")
          return 2
        }
        spark.conf.set(InteractionLog.ModeKey, "verify")
        spark.conf.set(InteractionLog.PathKey, p)
        InteractionLog.reset(spark)
        spark.conf.set(QueryCache.ModeKey, "replay")
        spark.conf.set(QueryCache.PathKey, s"$p.cache")
        spark.conf.set(SparkAdapter.OfflineKey, "true")
      }
    }
    val rc = runCommand(spark, args)
    if (spark != null && (args.replayVerify.isDefined ||
        args.replayOffline.isDefined)) {
      val diff = graft.adapter.InteractionLog.report(spark)
      if (diff.isEmpty) {
        println("replay-verify: all interactions match the recording")
        rc
      } else {
        diff.take(20).foreach { m =>
          System.err.println(s"replay-verify DIFF @${m.seq}")
          System.err.println(s"  recorded: ${m.expected.take(200)}")
          System.err.println(s"  live:     ${m.actual.take(200)}")
        }
        System.err.println(s"replay-verify: ${diff.size} mismatches")
        if (rc == 0) 1 else rc
      }
    } else rc
  }

  private def runCommand(spark: SparkSession, args: Args): Int = {
    // init runs before any project exists — handle it ahead of the load
    if (args.command == "init") return runInit(args)
    // debug performs its own guarded load so a broken project is a
    // reported check failure, not a stack trace
    if (args.command == "debug") return runDebug(spark, args)
    // man needs no project either (reference: FsCommand::Man,
    // crates/dbt-common/src/io_args.rs:59)
    if (args.command == "man") { println(manPage); return 0 }
    // dbt rejects a backfill end without a start and an empty window —
    // both would otherwise silently run zero batches and report success
    if (args.eventTimeEnd.isDefined && args.eventTimeStart.isEmpty) {
      System.err.println("--event-time-end requires --event-time-start")
      return 2
    }
    for (s <- args.eventTimeStart; e <- args.eventTimeEnd
         if !parseTs(s).before(parseTs(e))) {
      System.err.println(
        s"--event-time-start ($s) must be before --event-time-end ($e)")
      return 2
    }
    val project = ProjectLoader.load(args.projectDir).withCliVars(args.cliVars)
    // --warn-error: funcsign warnings (recorded by the load) become a
    // hard failure before anything executes
    if (args.warnError && project.funcsignDiagnostics.nonEmpty) {
      System.err.println("funcsign type-check failed (--warn-error):\n  " +
        project.funcsignDiagnostics.mkString("\n  "))
      return 1
    }
    // deps needs only the load (resolution happened in it) — handle it
    // before the Runner spins up a Spark-backed adapter
    if (args.command == "deps") return runDeps(project, args)
    if (args.command == "clean") return runClean(project, args)
    val plan = args.samplePlan.map(graft.sample.SamplerPlan.parseFile)
    val runner = new Runner(spark, project, args.schema,
      threads = args.threads, stateDir = args.state,
      deferManifest =
        if (args.defer) args.state.map(s => s"$s/manifest.json") else None,
      emptyMode = args.empty,
      eventTimeStart = args.eventTimeStart.map(parseTs),
      eventTimeEnd = args.eventTimeEnd.map(parseTs),
      // `sample` itself reads the ORIGINAL sources; only run/build/etc.
      // remap source() onto the sampled namespace
      samplePlan = if (args.command == "sample") None else plan,
      sampleSuffix = args.sampleSuffix,
      currentSourcesJson = Some(Paths.get(args.projectDir, args.targetPath)
        .resolve("sources.json").toString))
    val targetDir = Paths.get(args.projectDir, args.targetPath)
    Files.createDirectories(targetDir)

    args.command match {
      case "parse" =>
        runner.writeManifest(targetDir.resolve("manifest.json").toString)
        println(s"parsed ${runner.resolved.nodes.size} nodes → $targetDir/manifest.json")
        0

      case "compile" =>
        val compiled = targetDir.resolve("compiled")
        Files.createDirectories(compiled)
        val selectedIds: Set[String] =
          runner.selectIds(args.select, args.selector, args.exclude)
        runner.resolved.nodes.values
          .filter(n => selectedIds(n.uniqueId))
          .filter(n => n.kind == NodeKind.Model || n.kind == NodeKind.Snapshot ||
            n.kind == NodeKind.Analysis)
          .foreach { n =>
            // python models have no SQL to render — copy the source as .py
            // (Jinja-rendering python would trip on f-string braces)
            if (n.config.extra.get("language").contains("python"))
              Files.writeString(compiled.resolve(s"${n.name}.py"), n.rawSql)
            else
              Files.writeString(compiled.resolve(s"${n.name}.sql"),
                runner.compileSql(n))
          }
        runner.writeManifest(targetDir.resolve("manifest.json").toString)
        println(s"compiled → $compiled")
        0

      case "docs" => // `docs generate`: manifest + catalog + static page
        runner.writeManifest(targetDir.resolve("manifest.json").toString)
        runner.writeCatalog(targetDir.resolve("catalog.json").toString)
        runner.writeDocsIndex(targetDir.resolve("index.html").toString)
        println(s"docs → $targetDir/{manifest.json, catalog.json, index.html}")
        0

      // dbt show: preview a model's (or --inline SQL's) first rows without
      // materializing anything (reference FsCommand::Show)
      case "show" =>
        val sql = args.inline match {
          case Some(raw) => runner.compileInline(raw)
          case None =>
            val name = args.select.getOrElse {
              System.err.println("usage: show [--select model | --inline sql] [--limit n]")
              return 2
            }
            val bare = name.stripPrefix("+").stripSuffix("+")
            // versioned models share one logical name — route through the
            // same resolution ref() uses so show previews latest_version
            val byRef = scala.util.Try(runner.resolved.refUniqueId(
              runner.resolved.project.name, None, bare)).toOption
              .flatMap(runner.resolved.nodes.get)
              .filter(_.kind == NodeKind.Model)
            val node = byRef.orElse(runner.resolved.nodes.values
              .find(n => n.name == bare && n.kind == NodeKind.Model))
              .getOrElse {
                System.err.println(s"show: no model named '$name'")
                return 2
              }
            if (node.config.extra.get("language").contains("python")) {
              // no SQL body to preview; show the built relation instead
              System.err.println(
                s"show: '$name' is a python model — previewing its relation")
              node.relation.map(r => s"SELECT * FROM ${r.fqn}").getOrElse {
                System.err.println(s"show: python model '$name' has no relation")
                return 2
              }
            } else runner.compileSql(node)
        }
        val (_, table) = runner.adapter.execute(
          s"SELECT * FROM ($sql) __dbt_show LIMIT ${args.limit}")
        println(table.printTable())
        0

      case "run-operation" =>
        args.macroName match {
          case None =>
            System.err.println("usage: run-operation <macro> [--args '{k: v}']")
            2
          case Some(m) =>
            val out = runner.runOperation(m, args.macroArgs)
            if (out.nonEmpty) println(out)
            0
        }

      case "source-freshness" =>
        // --select narrows to sources (dbt: `source:lake` = every table
        // of the source, `source:lake.orders` = one table; * globs)
        val keep: String => Boolean = args.select match {
          case None => _ => true
          case Some(sel) =>
            val pats = sel.trim.split("\\s+").filter(_.nonEmpty).toSeq.map { a =>
              val v = a.stripPrefix("source:")
              val glob = if (v.contains('.')) s"source.$v" else s"source.$v.*"
              java.util.regex.Pattern.compile(
                glob.split("\\*", -1).map(java.util.regex.Pattern.quote)
                  .mkString(".*"))
            }
            uid => pats.exists(_.matcher(uid).matches())
        }
        val results = runner.sourceFreshness().filter(r => keep(r._1))
        runner.writeSourceFreshness(
          targetDir.resolve("sources.json").toString, results)
        results.foreach { case (uid, r) =>
          val line = r.fold(
            skip => f"skipped $uid%-40s $skip",
            res => f"${res.status}%-8s $uid%-40s max_loaded_at=${res.maxLoadedAt.orNull} age=${res.ageSeconds}%.0fs")
          println(line)
        }
        if (results.exists(_._2.exists(r => r.status == "error" ||
          (args.warnError && r.status == "warn")))) 1 else 0

      case "list" | "ls" =>
        val selected0 = runner.selectIds(args.select, args.selector,
          args.exclude, args.indirectSelection)
        val selected = selected0.filter { id =>
          val kind = runner.resolved.nodes(id).kind.name
          (args.resourceTypes.isEmpty || args.resourceTypes.contains(kind)) &&
            !args.excludeResourceTypes.contains(kind)
        }
        selected.toSeq.sorted.foreach { id =>
          if (args.output == "json") {
            val n = runner.resolved.nodes(id)
            println(graft.jinja.Json.write(Map(
              "unique_id" -> id,
              "name" -> n.name,
              "resource_type" -> n.kind.name,
              "package_name" -> n.packageName,
              "original_file_path" -> n.path,
              "relation_name" -> n.relation.map(_.fqn).orNull,
              "tags" -> n.config.tags)))
          } else println(id)
        }
        0

      // dbt retry: re-run everything that did not succeed last time (plus
      // their skipped downstreams), from the recorded results.json
      case "retry" =>
        if (args.state.isEmpty) {
          System.err.println("retry requires --state <dir> (a previous run's results.json)")
          return 2
        }
        val failedish = runner.prevResults()
          .filter { case (_, s) => s == "error" || s == "fail" || s == "skipped" }
        if (failedish.isEmpty) { println("retry: nothing to retry"); return 0 }
        val results = runner.run(
          select = Some("result:error result:fail result:skipped"),
          enableReuse = false)
        runner.writeRunResults(results,
          targetDir.resolve("run_results.json").toString)
        results.foreach { r =>
          println(f"${r.status}%-8s ${r.uniqueId}%-50s ${r.executionTimeMs}%6d ms  ${r.message}")
        }
        if (results.exists(r => r.status == "error" || r.status == "fail")) 1 else 0

      // dbt clone: materialize selected nodes in THIS schema as pointers
      // to the relations recorded in the --state manifest (reference: the
      // clone command + MA/materializations/models/clone/clone.sql; on
      // parquet with no Delta jars, "zero-copy" degrades to a view over
      // the prod relation — same fallback as the clone materialization)
      case "clone" =>
        if (args.state.isEmpty) {
          System.err.println("clone requires --state <dir> (a previous run's manifest.json)")
          return 2
        }
        val stateRels = runner.stateRelations
        if (stateRels.isEmpty) {
          System.err.println(s"clone: no relations in ${args.state.get}/manifest.json")
          return 2
        }
        val selected = args.select.map(graft.resolve.Selector.parse) match {
          case Some(sp) => graft.resolve.Selector.select(
            sp, runner.resolved.nodes, runner.graph)
          case None => runner.resolved.nodes.keySet
        }
        var cloned = 0
        selected.toSeq.sorted.foreach { id =>
          for {
            n <- runner.resolved.nodes.get(id)
            if n.kind == NodeKind.Model && !n.isEphemeral
            target <- n.relation
            prod <- stateRels.get(id)
            if prod != target.fqn // don't clone a relation onto itself
          } {
            runner.adapter.createView(
              target.withType(graft.core.RelationType.View),
              s"SELECT * FROM $prod")
            println(s"cloned $prod -> ${target.fqn} (view)")
            cloned += 1
          }
        }
        println(s"clone: $cloned relations")
        0

      // graft sample <plan.yml>: materialize the plan's sampled slice
      // into `<schema><suffix>` (reference: the dbt-sample crate's
      // execute path, plan.rs:127-218)
      case "sample" =>
        plan match {
          case None =>
            System.err.println("usage: sample <plan.yml> [--sample-suffix SFX]")
            2
          case Some(p) =>
            val written = runner.runSample(p, args.sampleSuffix)
            written.foreach { case (src, fqn, rows) =>
              println(f"sampled $src%-40s -> $fqn ($rows rows)")
            }
            println(s"sample '${p.name}': ${written.size} relations")
            0
        }

      case cmd @ ("run" | "test" | "seed" | "snapshot" | "build") =>
        // the runner slices the DAG to the kind+selector subset, preserving
        // transitive edges through excluded nodes
        val results = runner.run(args.select, args.fullRefresh,
          enableReuse = args.state.isDefined, kinds = kindFilter(cmd),
          selectorName = args.selector, exclude = args.exclude,
          failFast = args.failFast,
          indirectSelection = args.indirectSelection)
        runner.writeRunResults(results,
          targetDir.resolve("run_results.json").toString)
        runner.writeManifest(targetDir.resolve("manifest.json").toString)
        results.foreach { r =>
          println(f"${r.status}%-8s ${r.uniqueId}%-50s ${r.executionTimeMs}%6d ms  ${r.message}")
        }
        val failed = results.count(r => r.status == "error" ||
          r.status == "fail" || (args.warnError && r.status == "warn"))
        println(s"done: ${results.length} nodes, $failed failed")
        if (failed > 0) 1 else 0

      case other =>
        System.err.println(s"unknown command: $other")
        2
    }
  }

  /** `deps`: resolution already happened during the project load — write
    * package-lock.yml pinning the float-y specs (hub ranges → exact
    * version, git refs → commit sha) keyed to packages.yml's sha1, so
    * later loads reproduce this resolution until packages.yml changes
    * (reference: compute_package_lock.rs). */
  private def runDeps(project: graft.project.Project, args: Args): Int = {
    val entries = project.allProjects.flatMap(_.packageLock).distinct
    if (entries.isEmpty) { println("no packages to resolve"); return 0 }
    val pkgYml = Paths.get(args.projectDir, "packages.yml")
    val sb = new StringBuilder("packages:\n")
    entries.foreach { e =>
      val fields = e.toSeq
      sb ++= s"  - ${fields.head._1}: ${yamlScalar(fields.head._2)}\n"
      fields.tail.foreach { case (k, v) =>
        sb ++= s"    $k: ${yamlScalar(v)}\n" }
    }
    sb ++= s"sha1_hash: ${graft.project.ProjectLoader.sha1(Files.readString(pkgYml))}\n"
    Files.writeString(Paths.get(args.projectDir, "package-lock.yml"), sb.toString)
    entries.foreach(e => println(
      s"resolved: ${e.map { case (k, v) => s"$k=$v" }.mkString(" ")}"))
    println(s"wrote ${entries.size} entries → package-lock.yml")
    0
  }

  /** `clean`: remove the target path, the project's `clean-targets:`
    * dirs, and any extra positional dirs — refusing absolute paths,
    * anything outside the project root, and anything that is (or
    * contains) a protected source dir; one unsafe path aborts the whole
    * run with nothing deleted (reference: execute_clean_command,
    * crates/dbt-loader/src/clean.rs:24-106). */
  private def runClean(project: graft.project.Project, args: Args): Int = {
    import java.nio.file.Path
    val root = Paths.get(args.projectDir).toAbsolutePath.normalize
    val protectedDirs: Seq[Path] =
      (project.modelPaths ++ project.seedPaths ++ project.snapshotPaths ++
        project.testPaths ++ project.analysisPaths ++ project.macroPaths)
        .map(p => root.resolve(p).normalize)
    val requested = project.cleanTargets ++ args.cleanFiles
    val absolutes = requested.filter(p => Paths.get(p).isAbsolute)
    if (absolutes.nonEmpty) {
      absolutes.foreach(p =>
        System.err.println(s"clean: absolute paths are not allowed: $p"))
      return 2
    }
    val targets: Seq[Path] =
      (requested :+ args.targetPath).map(p => root.resolve(p).normalize).distinct
    val unsafe = targets.filter { t =>
      // inside the project root (strictly below it) …
      !(t.startsWith(root) && t != root) ||
        // … and neither equal to nor an ancestor of a protected dir
        protectedDirs.exists(p => p.startsWith(t))
    }
    if (unsafe.nonEmpty) {
      unsafe.foreach(p => System.err.println(
        s"clean: refusing to delete protected or out-of-project path: $p"))
      return 2
    }
    targets.foreach { t =>
      if (Files.exists(t)) {
        val stream = Files.walk(t)
        try stream.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
        finally stream.close()
        println(s"removed $t")
      }
    }
    0
  }

  /** `debug`: run the connection/project sanity checks dbt debug runs
    * (dbt-core parity; the reference declares FsCommand::Debug,
    * crates/dbt-common/src/io_args.rs:55) — each check reports pass/fail
    * individually and any failure exits nonzero. */
  private def runDebug(spark: SparkSession, args: Args): Int = {
    var ok = true
    def check(name: String)(body: => String): Unit = {
      val outcome =
        try { val detail = body; s"[OK]    $name: $detail" }
        catch { case e: Exception =>
          ok = false
          s"[ERROR] $name: ${e.getMessage}"
        }
      println(outcome)
    }
    check("project") {
      val yml = Paths.get(args.projectDir, "dbt_project.yml")
      if (!Files.exists(yml))
        throw new IllegalStateException(s"no dbt_project.yml in ${args.projectDir}")
      val p = ProjectLoader.load(args.projectDir)
      s"${p.name} (${p.models.size} models, ${p.packages.size} packages)"
    }
    check("connection") {
      spark.sql("SELECT 1").collect()
      s"spark ${spark.version} master=${spark.sparkContext.master}"
    }
    check("target schema") {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS ${args.schema}")
      s"${args.schema} writable"
    }
    println(if (ok) "All checks passed!" else "Some checks failed.")
    if (ok) 0 else 2
  }

  /** `man`: command + flag reference (dbt-core parity; FsCommand::Man). */
  private val manPage: String =
    """graft — Spark-native dbt-compatible analytics engine
      |
      |commands:
      |  init [NAME]        scaffold a runnable starter project
      |  deps               resolve packages.yml, write package-lock.yml
      |  parse              load + resolve the project, write manifest.json
      |  compile            render model SQL to target/compiled
      |  run                materialize models (view/table/incremental/...)
      |  test               run data + unit tests
      |  seed               load seeds/*.csv into the warehouse
      |  snapshot           apply SCD-2 snapshots
      |  build              run + test + seed + snapshot in DAG order
      |  list | ls          print selected nodes
      |  show               preview a model or --inline SQL (--limit N)
      |  docs               generate manifest + catalog + static site
      |  clone              clone --state manifest relations into schema
      |  sample <plan.yml>  materialize the plan's sampled source slice
      |  source freshness   check source loaded_at recency, sources.json
      |  run-operation M    invoke macro M with --args '{k: v}'
      |  retry              re-run nodes that failed in the last run
      |  clean              delete clean-targets dirs (inside project only)
      |  debug              project / connection / schema sanity checks
      |  man                this page
      |
      |common flags:
      |  --project-dir DIR --select SPEC --exclude SPEC --selector NAME
      |  --schema NAME --threads N --full-refresh --fail-fast --warn-error --empty
      |  --indirect-selection eager|buildable|cautious|empty
      |  --vars '{k: v}' --state DIR --defer --target-path DIR
      |  --sample PLAN.yml --sample-suffix SFX --limit N --output FMT
      |  --resource-type T[,T...] --exclude-resource-type T[,T...]
      |  --event-time-start T --event-time-end T
      |  --record FILE.jsonl --replay-verify FILE.jsonl
      |  --replay-offline FILE.jsonl""".stripMargin

  /** Quote a YAML scalar only when needed (quoting keeps shas and paths
    * literal). */
  private def yamlScalar(v: Any): String = {
    val s = String.valueOf(v)
    if (s.matches("[A-Za-z0-9._/@-]+")) s else "\"" + s.replace("\"", "\\\"") + "\""
  }

  /** `init <name>`: scaffold a runnable starter project (reference:
    * crates/dbt-init/assets — dbt-core's starter layout, Spark-flavored).
    * Refuses to touch an existing directory. */
  private def runInit(args: Args): Int = {
    val name = args.initName.getOrElse {
      System.err.println("usage: init <project_name>"); return 2
    }
    if (!name.matches("[A-Za-z_][A-Za-z0-9_]*")) {
      System.err.println(
        s"invalid project name '$name' (letters, digits, underscores)")
      return 2
    }
    val root = Paths.get(args.projectDir).resolve(name)
    if (Files.exists(root)) {
      System.err.println(s"directory $root already exists — not overwriting")
      return 1
    }
    def put(rel: String, content: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    put("dbt_project.yml",
      s"""name: $name
         |version: "1.0.0"
         |model-paths: ["models"]
         |seed-paths: ["seeds"]
         |test-paths: ["tests"]
         |macro-paths: ["macros"]
         |snapshot-paths: ["snapshots"]
         |models:
         |  $name:
         |    example:
         |      +materialized: view
         |""".stripMargin)
    put(".gitignore", "target/\nlogs/\n")
    put("README.md",
      s"""# $name
         |
         |Starter project. Try:
         |
         |    graft run   --project-dir $name
         |    graft test  --project-dir $name
         |    graft build --project-dir $name
         |""".stripMargin)
    put("models/example/my_first_model.sql",
      """{{ config(materialized='table') }}
        |
        |with source_data as (
        |    select 1 as id union all select null
        |)
        |select * from source_data
        |""".stripMargin)
    put("models/example/my_second_model.sql",
      "select * from {{ ref('my_first_model') }} where id = 1\n")
    put("models/example/schema.yml",
      """version: 2
        |models:
        |  - name: my_first_model
        |    description: "A starter model"
        |    columns:
        |      - name: id
        |        tests: [unique]
        |  - name: my_second_model
        |    columns:
        |      - name: id
        |        tests: [unique, not_null]
        |""".stripMargin)
    Seq("seeds", "tests", "macros", "snapshots")
      .foreach(d => Files.createDirectories(root.resolve(d)))
    println(s"created starter project at $root")
    0
  }
}
