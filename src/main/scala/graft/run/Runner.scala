package graft.run

import graft.adapter.SparkAdapter
import graft.core._
import graft.jinja.{DbtContext, Jinja, Json}
import graft.mat._
import graft.project.Project
import graft.resolve.{Dag, Resolver, Selector}
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}
import java.util.concurrent.{ConcurrentHashMap, Executors}
import scala.collection.mutable
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

/** Compile + schedule + execute the node DAG (reference: dbt run lifecycle,
  * SURVEY §3.2 — Schedule crates/dbt-dag/src/schedule.rs:22, level
  * parallelism deps_mgmt.rs:553, node statuses crates/dbt-common/src/
  * stats.rs:11-45).
  *
  * Parallelism: topological levels fan out to a bounded thread pool, all
  * submitting to the one SparkSession — each node runs in its own FAIR
  * scheduler pool so one long CTAS doesn't starve the wave. Smart reuse:
  * nodes whose checksum (raw SQL + config) and upstream checksums are
  * unchanged since the recorded state are skipped
  * (NodeStatus::ReusedNoChanges, stats.rs:11-33).
  */
final class Runner(
    spark: SparkSession,
    project: Project,
    targetSchema: String = "analytics",
    warehouseLocation: Option[String] = None,
    threads: Int = 4,
    stateDir: Option[String] = None,
    /** --defer: manifest.json of a previous (prod) run; refs to nodes whose
      * relation is not built here resolve to the recorded prod relations
      * (reference: compile_node_context.rs:135-147 deferred_relation). */
    deferManifest: Option[String] = None,
    /** --empty: schema-only dry run (dbt's empty flag) — every ref()/
      * source() compiles to a LIMIT 0 subquery, so models build with the
      * right schema but zero rows and zero input scan cost. The CI shape
      * for validating SQL + contracts against production structure. */
    emptyMode: Boolean = false,
    /** --event-time-start / --event-time-end (reference:
      * event_time_start/end, resolve_model_context.rs:349): explicit
      * microbatch backfill window — overrides begin/now AND the
      * resume-from-target logic, reprocessing exactly these batches. */
    eventTimeStart: Option[java.sql.Timestamp] = None,
    eventTimeEnd: Option[java.sql.Timestamp] = None,
    /** --sample: a sampler plan (reference crates/dbt-sample/src/plan.rs)
      * — source() calls to non-Pass entries remap to the sampled
      * relations in `<schema><sampleSuffix>`, so the whole DAG runs
      * against the dev slice with zero model changes
      * (plan.rs:494-516 sample_renaming_map). */
    samplePlan: Option[graft.sample.SamplerPlan.Plan] = None,
    sampleSuffix: String = "__sample",
    now: java.sql.Timestamp = new java.sql.Timestamp(System.currentTimeMillis()),
    /** Current `source freshness` artifact (target/sources.json) for the
      * source_status:fresher selector — compared against the --state
      * dir's copy. The CLI passes its target path; None leaves the
      * method with a named "run source freshness first" error. */
    currentSourcesJson: Option[String] = None) {

  val adapter = new SparkAdapter(spark, targetSchema, warehouseLocation)
  /** Context flags shared by every parse/run context this invocation
    * builds: dbt pins run_started_at at invocation start, so all nodes
    * and hooks of one run see the SAME value (reference: load/init.rs
    * run_started_at set once per invocation). */
  private val ctxFlags: Map[String, Any] = Map("run_started_at_ms" -> now.getTime)
  val resolved: Resolver.Resolved =
    Resolver.resolve(project, targetSchema, nowMs = now.getTime)
  /** Source map after --sample remapping (identity without a plan). */
  private val effectiveSources: Map[String, Map[String, Relation]] =
    samplePlan.map(p => graft.sample.Sampler.remapSources(
      resolved.sources, p, sampleSuffix)).getOrElse(resolved.sources)
  val graph: Dag.Graph = Dag.fromNodes(resolved.nodes)
  /** Engine builtins render first, packages next, root project last — so
    * a later definition overwrites an earlier one on name collision,
    * dbt's MacroLocality precedence (Root > Imported > Core,
    * materialization_resolver.rs:27; builtin assets =
    * dbt_macro_assets). */
  private val macroPrelude =
    (graft.funcs.BuiltinMacros.prelude +:
      (project.packages ++ Seq(project)).flatMap(_.macroSources))
      .mkString("\n")
  /** Macro-backed generic tests: project `{% test %}` blocks plus the
    * engine's builtin test assets (benford_plausible, k_anonymous —
    * the audit-op math as failing-rows queries); a project block of
    * the same name overrides at render by macro locality. */
  private val customTests: Set[String] =
    project.allProjects.flatMap(_.customTests).toSet ++
      graft.funcs.BuiltinMacros.testNames
  /** materialization name → adapters with a user {% materialization %}
    * block. Checked BEFORE the builtin table: Root/Imported locality beats
    * Core, so a user block may override a builtin materialization. */
  private val customMats: Map[String, Set[String]] =
    (project.packages ++ Seq(project)).flatMap(_.customMaterializations)
      .groupBy(_._1).map { case (n, xs) => n -> xs.flatMap(_._2).toSet }

  /** The `graph` Jinja variable (reference: build_flat_graph
    * functions/base.rs:1243, registered compile_and_run_context.rs:138):
    * executable nodes under `nodes`, sources/exposures/metrics/groups/
    * semantic_models/saved_queries in their own maps — the introspection
    * surface dbt-utils-style macros walk with graph.nodes.values(). Built
    * once, lazily, like the reference's LazyFlatGraph. */
  lazy val flatGraph: Map[String, Any] = {
    val declaredSections =
      Set("exposure", "metric", "semantic_model", "saved_query")
    def section(kind: String): Map[String, Any] =
      resolved.nodes.collect { case (id, n) if n.kind.name == kind =>
        id -> nodeJson(id, n) }
    Map(
      "nodes" -> resolved.nodes.collect {
        case (id, n) if !declaredSections(n.kind.name) => id -> nodeJson(id, n)
      },
      "sources" -> resolved.sources.flatMap { case (s, ts) =>
        ts.map { case (t, rel) =>
          s"source.$s.$t" -> Map(
            "unique_id" -> s"source.$s.$t",
            "resource_type" -> "source",
            "source_name" -> s, "name" -> t,
            "database" -> rel.database.orNull,
            "schema" -> rel.schema,
            "identifier" -> rel.identifier,
            "relation_name" -> rel.fqn)
        }
      },
      "exposures" -> section("exposure"),
      "metrics" -> section("metric"),
      "groups" -> resolved.groups,
      "semantic_models" -> section("semantic_model"),
      "saved_queries" -> section("saved_query"))
  }

  /** uniqueId → relation FQN recorded in a manifest.json. */
  private def manifestRelations(path: String): Map[String, String] =
    if (!Files.exists(Paths.get(path))) Map.empty
    else Json.parse(Files.readString(Paths.get(path)))
      .asInstanceOf[Map[String, Any]]
      .get("nodes").collect { case nodes: Map[_, _] =>
        nodes.asInstanceOf[Map[String, Any]].collect {
          case (id, n: Map[_, _])
              if n.asInstanceOf[Map[String, Any]].get("relation_name").exists(_ != null) =>
            id -> n.asInstanceOf[Map[String, Any]]("relation_name").toString
        }
      }.getOrElse(Map.empty)

  /** uniqueId → prod relation FQN from the defer manifest. */
  private val deferRelations: Map[String, String] =
    deferManifest.map(manifestRelations).getOrElse(Map.empty)

  /** Relations recorded in the --state dir's manifest (for `dbt clone`). */
  def stateRelations: Map[String, String] =
    stateDir.map(d => manifestRelations(s"$d/manifest.json"))
      .getOrElse(Map.empty)

  final case class NodeResult(uniqueId: String, status: String,
      message: String, executionTimeMs: Long, reused: Boolean = false)

  // ---- compilation -----------------------------------------------------

  /** Render a node's Jinja to executable Spark SQL. Ephemeral refs inline
    * as CTEs (reference: compile_node_context.rs:190-208 ref validation +
    * ephemeral CTE injection). `batchWindow` is the microbatch input filter
    * (reference model_config.rs:209-210): refs to event_time-declaring
    * upstreams compile to a `[start, end)`-filtered subquery so the batch's
    * scans prune at the source instead of re-reading the full input. */
  def compileSql(node: Node, forUnitTest: Map[String, String] = Map.empty,
      batchWindow: Option[(java.sql.Timestamp, java.sql.Timestamp)] = None,
      /** unit-test overrides (reference: UnitTestOverrides nodes.rs):
        * vars overlay project vars, envVars overlay the process env,
        * macroValues bind a macro name to a constant-returning function
        * (e.g. is_incremental: false). */
      overrideVars: Map[String, Any] = Map.empty,
      overrideEnv: Map[String, String] = Map.empty,
      overrideMacros: Map[String, Any] = Map.empty,
      /** --full-refresh forces is_incremental() to render FALSE (the
        * reference's behavior): the model SQL must compile to the
        * full-corpus SELECT, or the refreshed target would silently
        * hold only the current batch's slice. */
      fullRefresh: Boolean = false): String = {
    val ctes = mutable.LinkedHashMap.empty[String, String]
    def windowed(relSql: String, eventTime: Option[String]): String = {
      val base = (batchWindow, eventTime) match {
        case (Some((bs, be)), Some(et)) =>
          s"(SELECT * FROM $relSql WHERE `$et` >= TIMESTAMP '$bs' " +
            s"AND `$et` < TIMESTAMP '$be')"
        case _ => relSql
      }
      if (emptyMode) s"(SELECT * FROM $base LIMIT 0)" else base
    }
    def resolveRef(pkg: Option[String], name: String,
        version: Option[String]): String = {
      val uid = resolved.refUniqueId(node.packageName, pkg, name, version)
      if (!node.dependsOn.contains(uid))
        throw new IllegalStateException(
          s"node ${node.uniqueId} refs undeclared '$name' — not in depends_on")
      forUnitTest.get(name) match {
        case Some(fixture) => fixture
        case None =>
          val target = resolved.nodes(uid)
          if (target.isEphemeral) {
            val cteName = s"__dbt__cte__$name"
            if (!ctes.contains(cteName))
              ctes(cteName) = compileSql(target, Map.empty, batchWindow,
                fullRefresh = fullRefresh) // nested ephemerals recurse
            cteName
          } else {
            val rel = target.relation.get
            // deferral: unbuilt upstream → prod manifest relation
            val base =
              if (deferRelations.contains(uid) && !adapter.relationExists(rel))
                deferRelations(uid)
              else rel.fqn
            windowed(base, target.config.eventTime)
          }
      }
    }
    def resolveSource(src: String, tbl: String): String = {
      forUnitTest.get(s"$src.$tbl").foreach(fixture => return fixture)
      val base = effectiveSources.get(src).flatMap(_.get(tbl)) match {
        case Some(rel) if rel.relType == RelationType.External &&
            rel.identifier.contains("/") =>
          // external location → direct file scan, format by extension
          graft.core.ExternalSource.sqlFor(rel.identifier)
        case Some(rel) => rel.fqn
        case None => throw new IllegalStateException(s"unknown source $src.$tbl")
      }
      windowed(base, resolved.sourceEventTimes.get((src, tbl)))
    }

    def resolveFunction(pkg: Option[String], name: String): String = {
      val uid = s"function.${pkg.getOrElse(node.packageName)}.$name"
      if (!node.dependsOn.contains(uid))
        throw new IllegalStateException(
          s"node ${node.uniqueId} calls function '$name' — not in depends_on")
      resolved.nodes.get(uid).flatMap(_.relation).map(_.fqn).getOrElse(
        throw new IllegalStateException(s"unknown function node $uid"))
    }
    val isIncr = IncrementalMat.isIncremental(adapter, node.relation.get,
      fullRefresh = fullRefresh, node.config.materialized, node.config.extra)
    val bindings = DbtContext.runContext(
      adapter, node.relation.get, resolveRef, resolveSource,
      isIncr, node.config.extra, project.vars ++ overrideVars,
      sys.env ++ overrideEnv, resolveFunction = resolveFunction,
      flags = ctxFlags, graph = () => flatGraph) ++
      overrideMacros.map { case (k, v) =>
        s"__macro_override_$k" -> (Jinja.JFunc((_, _) => v): Any) }
    // macro overrides must SHADOW the prelude's {% macro %} definitions,
    // which rebind their names during render — so re-bind each overridden
    // name AFTER the prelude via {% set %} to a constant-returning
    // function (a root-context binding alone would be overwritten)
    val overrideBlock = overrideMacros.keys.map(k =>
      s"{% set $k = __macro_override_$k %}").mkString
    val body = Jinja.render(macroPrelude + overrideBlock + node.rawSql,
      bindings).trim
    if (ctes.isEmpty) body
    else {
      val cteSql = ctes.map { case (n, sql) => s"$n AS (\n$sql\n)" }.mkString(", ")
      // Merge with an existing WITH clause if the body has one.
      if (body.toLowerCase.startsWith("with "))
        s"WITH $cteSql, ${body.substring(5)}"
      else s"WITH $cteSql\n$body"
    }
  }

  // ---- single-node execution -------------------------------------------

  /** The shared window-execution context (microbatch models AND
    * windowed incremental pipelines — ONE policy): --event-time-start
    * overrides `begin` and marks the run an explicit backfill,
    * --event-time-end caps `now`, and the input recompiles per window
    * so event_time-declaring upstream scans prune to the batch. */
  private def windowedCtx(node: Node, ctx: MatContext,
      fullRefresh: Boolean): MatContext =
    ctx.copy(
      node = ctx.node.copy(config = ctx.node.config.copy(
        begin = eventTimeStart.map(_.toString)
          .orElse(ctx.node.config.begin))),
      now = eventTimeEnd.getOrElse(ctx.now),
      explicitBackfill = eventTimeStart.isDefined,
      compiledBatch = Some((bs, be) =>
        spark.sql(compileSql(node, batchWindow = Some((bs, be)),
          fullRefresh = fullRefresh))))

  def runNode(node: Node, fullRefresh: Boolean = false): NodeResult = {
    val t0 = System.nanoTime()
    def done(status: String, msg: String = "") =
      NodeResult(node.uniqueId, status, msg, (System.nanoTime() - t0) / 1000000)
    // nodes that failed at parse error without executing
    node.parseError.foreach(msg => return done("error", msg))
    Try {
      node.config.preHook.foreach(h => adapter.execute(renderHook(h, node), fetch = false))
      val r = node.kind match {
        // python models route through the submit_python_job bridge (or
        // error structurally when no interpreter is configured); inside
        // the normal flow so pre/post hooks, grants, and persist_docs
        // apply like any model
        case NodeKind.Model
            if node.config.extra.get("language").contains("python") =>
          runPythonModel(node, fullRefresh)
        case NodeKind.Model =>
          val sql = withQueryComment(node,
            compileSql(node, fullRefresh = fullRefresh))
          // the compiled SELECT is the warehouse-bound query in the
          // reference's recording; log it even though execution happens
          // through a DataFrame, so model-SQL regressions diff
          graft.adapter.InteractionLog.log(spark, "compile",
            s"${node.uniqueId}: $sql")
          if (node.config.contractEnforced) Contracts.enforce(spark, node, sql)
          val ctx = MatContext(adapter, node.copy(rawSql = sql),
            node.relation.get, () => spark.sql(sql), fullRefresh, now,
            macroRenderer = Some(incrementalMacroRenderer(node)),
            emptyMode = emptyMode)
          node.config.materialized match {
            case "incremental" if node.config.incrementalStrategy
                .contains(IncrementalStrategy.Microbatch) =>
              // Resume from the target's max event_time instead of `begin`:
              // later runs process only new batches + `lookback` reopened
              // ones (dbt's incremental microbatch run semantics) — without
              // this every run reprocesses all history.
              // an explicit --event-time-start backfill window suppresses
              // the resume (dbt: the named window is reprocessed exactly)
              // NO catch-all here (same rule as PipelineMat.runWindows):
              // a transient metastore/IO failure must fail the node, not
              // be misread as "no resume" and silently reprocess every
              // window since `begin`
              val lastEnd: Option[java.sql.Timestamp] =
                if (eventTimeStart.isDefined) None
                else for {
                  et <- node.config.eventTime
                  rel <- node.relation if adapter.relationExists(rel)
                  ts <- MicrobatchRunner.eventTimeValue(adapter.read(rel)
                    .agg(org.apache.spark.sql.functions.max(
                      org.apache.spark.sql.functions.col(s"`$et`")))
                    .head.get(0))
                } yield ts
              MicrobatchRunner.run(windowedCtx(node, ctx, fullRefresh),
                lastRunEnd = lastEnd)
            // microbatch × incremental pipeline: window-compile the
            // input (upstream event_time scans prune per batch) and let
            // PipelineMat window [begin/resume, now) as sequential
            // persisted-index batches (it resumes from the target's max
            // event_time itself, suppressed under explicitBackfill)
            case "pipeline" if node.config.eventTime.isDefined &&
                node.config.extra.get("incremental")
                  .exists(v => String.valueOf(v).toBoolean) =>
              Materializations.resolve("pipeline")
                .run(windowedCtx(node, ctx, fullRefresh))
            case m if customMats.contains(m) =>
              runCustomMaterialization(node, sql, m, fullRefresh)
            case m => Materializations.resolve(m).run(ctx)
          }
        case NodeKind.Seed =>
          SeedMat.run(MatContext(adapter, node, node.relation.get,
            () => SeedMat.load(spark, node.path, node.config), fullRefresh, now))
        case NodeKind.Snapshot =>
          val sql = compileSql(node)
          graft.adapter.InteractionLog.log(spark, "compile",
            s"${node.uniqueId}: $sql")
          SnapshotMat.run(MatContext(adapter, node.copy(rawSql = sql),
            node.relation.get, () => spark.sql(sql), fullRefresh, now))
        case NodeKind.Test => runTestNode(node)
        case NodeKind.UnitTest => runUnitTestNode(node)
        // SQL UDF node: compile the body (refs/sources/functions resolve
        // to qualified names) and CREATE OR REPLACE FUNCTION in the
        // session catalog — persistent, so later sessions and SHOW USER
        // FUNCTIONS see it (reference MA/materializations/functions/)
        case NodeKind.Function =>
          val body = compileSql(node)
          // an ephemeral ref would prepend a WITH clause — but a scalar
          // SQL UDF body must be a single expression (scalar subqueries
          // over real relations are fine)
          if (body.toLowerCase.startsWith("with "))
            throw new IllegalStateException(
              s"function ${node.name}: the body references an ephemeral " +
                "model, which compiles to a WITH clause — a scalar SQL " +
                "function body must be a single expression; materialize " +
                "the upstream as a table or view instead")
          graft.adapter.InteractionLog.log(spark, "compile",
            s"${node.uniqueId}: $body")
          val args: Seq[(String, String)] =
            node.config.extra.get("arguments").toSeq.flatMap {
              case xs: Seq[_] => xs.collect { case m: Map[_, _] =>
                val am = m.asInstanceOf[Map[String, Any]]
                (String.valueOf(am.getOrElse("name", "arg")),
                  String.valueOf(am.getOrElse("data_type", "string")))
              }
              case _ => Nil
            }
          val returns = graft.project.Yaml
            .dig(node.config.extra, "returns", "data_type")
            .map(String.valueOf).getOrElse("string")
          adapter.createSchema(node.relation.get.schema)
          FunctionMat.createPersistent(spark, node.relation.get, args,
            returns, body)
          MatResult(node.relation.get, "success",
            s"create function (${args.length} args) returns $returns")
        case other => MatResult(node.relation.getOrElse(Relation("", node.name)),
          "skipped", s"${other.name} nodes are not executable")
      }
      if (r.status == "success") { persistDocs(node); applyGrants(node) }
      node.config.postHook.foreach(h => adapter.execute(renderHook(h, node), fetch = false))
      r
    } match {
      case Success(r) => done(r.status, r.message)
      case Failure(e) => done("error", Option(e.getMessage).getOrElse(e.toString))
    }
  }

  /** Query comment (reference crates/dbt-adapter/src/query_comment.rs):
    * a per-node comment attached to the executed SQL — the default is the
    * dbt-style JSON envelope; `query-comment:` in dbt_project.yml supplies
    * a Jinja template over `node`. Also set as the Spark job description so
    * the comment shows in the UI/event log, the Spark-native place a
    * warehouse would surface it. */
  def renderQueryComment(node: Node): String =
    project.queryComment match {
      case Some(tpl) => Jinja.render(tpl, Map(
        "node" -> Map(
          "unique_id" -> node.uniqueId, "name" -> node.name,
          "package_name" -> node.packageName,
          "resource_type" -> node.kind.name))).trim
      case None => Json.write(Map(
        "app" -> "graft", "node_id" -> node.uniqueId))
    }

  private def withQueryComment(node: Node, sql: String): String = {
    val c = renderQueryComment(node)
    spark.sparkContext.setJobDescription(s"${node.uniqueId} $c")
    if (c.isEmpty) sql
    else if (project.queryCommentAppend) s"$sql\n/* $c */"
    else s"/* $c */\n$sql"
  }

  /** source() → executable SQL name: external file-backed sources become
    * direct parquet scans, catalog sources their fqn (shared by every
    * out-of-node render: hooks, run-operation, custom materializations,
    * inline compiles — same rule compileSql applies). */
  private def sourceSql(s: String, t: String): String =
    resolved.sources.get(s).flatMap(_.get(t)) match {
      case Some(r) if r.relType == RelationType.External &&
          r.identifier.contains("/") =>
        graft.core.ExternalSource.sqlFor(r.identifier)
      case Some(r) => r.fqn
      case None => s"$s.$t"
    }

  /** Compile ad-hoc Jinja-SQL outside any node (`dbt show --inline`):
    * refs resolve to target relations, sources to their locations, the
    * macro prelude is in scope. */
  def compileInline(raw: String): String = {
    val rel = Relation(targetSchema, "__inline__")
    val bindings = DbtContext.runContext(adapter, rel,
      (pk, n, v) => resolved.nodes.get(resolved.refUniqueId(project.name, pk, n, v))
        .flatMap(_.relation).map(_.fqn).getOrElse(n),
      sourceSql,
      isIncremental = false, Map.empty, project.vars,
      flags = ctxFlags, graph = () => flatGraph)
    Jinja.render(macroPrelude + raw, bindings).trim
  }

  /** `dbt run-operation <macro>` (reference io_args.rs:88
    * FsCommand::RunOperation): invoke a project macro with the full run
    * context — statement/run_query execute against the adapter, so
    * operational macros (vacuum jobs, grant sweeps, ad-hoc DDL) run
    * outside any node build. Arguments are passed by reference through a
    * context binding, so values of any shape (nested dicts/lists) arrive
    * unquoted and intact. Returns the rendered output. */
  def runOperation(macroName: String, args: Map[String, Any] = Map.empty): String = {
    val rel = Relation(targetSchema, "__run_operation__")
    val bindings = DbtContext.runContext(adapter, rel,
      (pk, n, v) => resolved.nodes.get(resolved.refUniqueId(project.name, pk, n, v))
        .flatMap(_.relation).map(_.fqn).getOrElse(n),
      sourceSql,
      isIncremental = false, Map.empty, project.vars,
      flags = ctxFlags, graph = () => flatGraph) +
      ("__op_args" -> args)
    val kw = args.keys.map(k => s"$k=__op_args['$k']").mkString(", ")
    try Jinja.render(macroPrelude + s"{{ $macroName($kw) }}", bindings).trim
    catch { case Jinja.ReturnValue(v) => Jinja.stringify(v) }
  }

  /** `dbt source freshness` (reference MA/adapters/freshness.sql +
    * metadata/mod.rs:96): for every source table with a freshness config,
    * check max(loaded_at_field) when declared, else fall back to the
    * storage layer's last-altered (max file mtime of an external
    * location). Returns (unique_id, result-or-skip-reason). */
  def sourceFreshness(now: java.sql.Timestamp =
      new java.sql.Timestamp(System.currentTimeMillis())):
      Seq[(String, Either[String, Freshness.FreshnessResult])] =
    resolved.sourceFreshness.toSeq.sortBy(_._1).map { case ((src, tbl), f) =>
      val uid = s"source.$src.$tbl"
      val rel = resolved.sources(src)(tbl)
      def thisSql: String = rel match {
        case r if r.relType == RelationType.External && r.identifier.contains("/") =>
          graft.core.ExternalSource.sqlFor(r.identifier)
        case r => r.fqn
      }
      val result: Either[String, Freshness.FreshnessResult] = f.loadedAtQuery match {
        case Some(q) =>
          Right(Freshness.checkQuery(spark, q, thisSql, now, f.warnAfter,
            f.errorAfter))
        case None => f.loadedAtField match {
        case Some(field) =>
          val df = rel match {
            case r if r.relType == RelationType.External && r.identifier.contains("/") =>
              graft.core.ExternalSource.read(spark, r.identifier)
            case r => adapter.read(r)
          }
          Right(Freshness.check(df, field, now, f.warnAfter, f.errorAfter,
            f.filter))
        case None if rel.relType == RelationType.External &&
            rel.identifier.contains("/") =>
          Right(Freshness.checkMetadata(rel.identifier, now, f.warnAfter,
            f.errorAfter))
        case None =>
          Left("no loaded_at_field and no file-backed location — skipped")
        }
      }
      uid -> result
    }

  /** sources.json artifact (dbt's freshness results, run_results-shaped). */
  def writeSourceFreshness(outPath: String,
      results: Seq[(String, Either[String, Freshness.FreshnessResult])]): Unit =
    Files.writeString(Paths.get(outPath), Json.write(Map(
      "metadata" -> Map(
        "dbt_schema_version" -> "https://schemas.getdbt.com/dbt/sources/v3.json",
        "generated_by" -> "graft"),
      "results" -> results.map { case (uid, r) => Map(
        "unique_id" -> uid,
        "status" -> r.fold(_ => "runtime error", _.status),
        // render at UTC explicitly: Timestamp.toString uses the JVM
        // default zone, and the fresher comparator anchors zone-less
        // stamps at UTC — a non-UTC JVM would shift its own artifact
        "max_loaded_at" -> r.toOption.flatMap(_.maxLoadedAt)
          .map(ts => java.time.LocalDateTime
            .ofInstant(ts.toInstant, java.time.ZoneOffset.UTC)
            .format(java.time.format.DateTimeFormatter
              .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))).orNull,
        "max_loaded_at_time_ago_in_s" -> r.toOption.map(_.ageSeconds)
          .getOrElse(-1.0),
        "message" -> r.left.toOption.orNull)
      })))

  /** Python model execution (reference funcs.rs:107 submit_python_job):
    * with an interpreter configured (`spark.graft.pythonInterpreter` conf
    * or `GRAFT_PYTHON` env) the node runs through [[PythonJob]]; without
    * one it throws the structured "no submit_python_job" error dbt users
    * expect from an adapter that cannot run python. Inputs are keyed both
    * bare (`name`, `source.table`) and package-qualified
    * (`package.name`) so same-named refs from different packages cannot
    * silently collide; only data-bearing deps (relations of
    * models/seeds/snapshots and sources) become inputs — regex-harvested
    * phantom refs and unit-test gating edges are skipped. */
  private def runPythonModel(node: Node, fullRefresh: Boolean): MatResult = {
    // an explicitly-set conf wins over the env var, INCLUDING an explicit
    // empty value — setting spark.graft.pythonInterpreter="" disables the
    // bridge even where GRAFT_PYTHON is exported
    val interpreter = (spark.conf.getOption("spark.graft.pythonInterpreter") match {
      case Some(v) => Some(v.trim).filter(_.nonEmpty)
      case None => sys.env.get("GRAFT_PYTHON").map(_.trim).filter(_.nonEmpty)
    }).getOrElse(throw new IllegalStateException(
      s"Python models are not supported without an interpreter " +
        s"(no submit_python_job): ${node.path} — set " +
        s"spark.graft.pythonInterpreter or GRAFT_PYTHON, or port the model to SQL"))
    // --empty cannot be enforced in fqn mode (the interpreter reads the
    // catalog directly) — refuse rather than silently run a full build
    if (emptyMode &&
        spark.conf.getOption("spark.graft.pythonInputMode").contains("fqn"))
      throw new IllegalStateException(
        s"python model ${node.name}: --empty cannot be honored in fqn input " +
          "mode — the interpreter reads sources directly; use export mode " +
          "for dry runs")
    val dataKinds: Set[NodeKind] =
      Set(NodeKind.Model, NodeKind.Seed, NodeKind.Snapshot)
    val inputs: Map[String, (org.apache.spark.sql.DataFrame, String)] =
      node.dependsOn.flatMap {
        case uid if uid.startsWith("source.") =>
          val Array(_, s, t) = uid.split("\\.", 3)
          val rel = effectiveSources(s)(t)
          val (df, loc) = rel match {
            case r if r.relType == RelationType.External &&
                r.identifier.contains("/") =>
              (graft.core.ExternalSource.read(spark, r.identifier),
                r.identifier)
            case r => (adapter.read(r), r.fqn)
          }
          Seq(s"$s.$t" -> (df, loc))
        case uid => resolved.nodes.get(uid) match {
          case Some(n) if dataKinds(n.kind) && n.relation.isDefined =>
            val rel = n.relation.get
            val in = (adapter.read(rel), rel.fqn)
            Seq(n.name -> in, s"${n.packageName}.${n.name}" -> in)
          case _ => Nil // unit tests, tests, phantom regex refs
        }
      }.toMap
      // --empty: schema-only dry run — python models get zero-row inputs,
      // same contract as SQL refs compiling to LIMIT 0
      .map { case (k, (df, loc)) =>
        k -> (if (emptyMode) df.limit(0) else df, loc) }
    node.config.materialized match {
      case "incremental" =>
        // the bridge produces the frame; the engine owns the strategy
        // (append/merge/delete+insert/custom — same code path as SQL
        // models, including the custom-strategy macro renderer)
        val isIncr = !fullRefresh && adapter.relationExists(node.relation.get)
        val df = PythonJob.produce(spark, node, inputs, node.relation.get,
          interpreter, isIncremental = isIncr)
        Materializations.resolve("incremental").run(MatContext(
          adapter, node, node.relation.get, () => df, fullRefresh, now,
          macroRenderer = Some(incrementalMacroRenderer(node))))
      case _ =>
        val msg = PythonJob.run(spark, adapter, node, inputs,
          node.relation.get, interpreter)
        MatResult(node.relation.get, "success", msg)
    }
  }

  /** Custom incremental strategies render their project macro with the run
    * context + the dbt arg dict (base_adapter.rs:339); shared by the SQL
    * and python incremental paths. */
  private def incrementalMacroRenderer(node: Node)
      : (String, Map[String, Any]) => String =
    (macroName: String, args: Map[String, Any]) =>
      Jinja.render(macroPrelude + s"{{ $macroName(arg_dict) }}",
        DbtContext.runContext(adapter, node.relation.get,
          (pk, n, v) => resolved.nodes.get(resolved.refUniqueId(node.packageName, pk, n, v))
            .flatMap(_.relation).map(_.fqn).getOrElse(n),
          sourceSql,
          isIncremental = true, node.config.extra, project.vars,
          flags = ctxFlags, graph = () => flatGraph) +
          ("arg_dict" -> args))

  /** `graft sample` — materialize a sampler plan's entries into the
    * parallel `<schema><suffix>` namespace (reference:
    * crates/dbt-sample/src/plan.rs:127-218 execute; SamplerRel write_as
    * plan.rs:485-491). Keysets build first (they are the shared sample
    * keys), then every non-Pass entry is keyset-filtered, strategy-sampled
    * and written as a table. A later `run --sample <plan>` remaps
    * source() calls onto these relations. Returns
    * (source.table, written fqn, rows). */
  def runSample(plan: graft.sample.SamplerPlan.Plan,
      suffix: String = "__sample"): Seq[(String, String, Long)] = {
    import graft.sample.{Sampler, SamplerPlan}
    def readRel(rel: Relation): org.apache.spark.sql.DataFrame = rel match {
      case r if r.relType == RelationType.External && r.identifier.contains("/") =>
        graft.core.ExternalSource.read(spark, r.identifier)
      case r => adapter.read(r)
    }
    def readSelect(sel: String): org.apache.spark.sql.DataFrame = {
      val Array(_, src, tbl) = sel.split("\\.", 3)
      val rel = resolved.sources.get(src).flatMap(_.get(tbl)).getOrElse(
        throw new IllegalStateException(s"sample plan references unknown source $sel"))
      readRel(rel)
    }
    def readSeed(name: String): org.apache.spark.sql.DataFrame =
      resolved.nodes.values.find(n => n.kind == NodeKind.Seed && n.name == name) match {
        case Some(n) if n.relation.exists(adapter.relationExists) =>
          adapter.read(n.relation.get)
        case Some(n) => // seed not built yet — load its CSV directly
          SeedMat.load(spark, n.path, n.config)
        case None => throw new IllegalStateException(
          s"sample plan keyset references unknown seed '$name'")
      }
    val keysetDfs: Map[String, org.apache.spark.sql.DataFrame] =
      plan.keysets.map { case (k, ks) =>
        k -> Sampler.keysetDf(ks, readSeed, readSelect)
      }
    plan.entries.filter(_.strategy != SamplerPlan.Strategy.Pass).flatMap { e =>
      Sampler.expandSelect(e.select, resolved.sources).map { case (src, tbl) =>
        val readFrom = resolved.sources(src)(tbl)
        val sampled = Sampler.applyEntry(readRel(readFrom), e, keysetDfs)
        val target = Sampler.writeRel(readFrom, tbl, suffix)
        adapter.createSchema(target.schema)
        adapter.writeTableAtomic(sampled, target)
        (s"$src.$tbl", target.fqn, adapter.read(target).count())
      }
    }
  }

  /** apply_grants shim (reference MA/adapters/apply_grants.sql;
    * spark__get_grant_sql in dbt-spark/macros/apply_grants.sql): the
    * grants config is parsed/standardized and surfaced in the manifest,
    * and the DCL statements are rendered — but NOT executed, as a
    * structured warning: Spark's embedded catalog has no SQL
    * authorization layer, so GRANT would fail. On a real cluster with
    * ACLs this is the single place to flip to adapter.execute. Returns
    * the rendered statements for inspection/specs. */
  private[graft] def applyGrants(node: Node): Seq[String] = {
    val grants = node.config.grants
    if (grants.isEmpty || node.relation.isEmpty) return Nil
    val rel = node.relation.get
    // one grantee per DCL statement, like
    // spark__support_multiple_grantees_per_dcl_statement() → False
    val dcl = grants.toSeq.sortBy(_._1).flatMap { case (priv, grantees) =>
      grantees.map(g => s"GRANT ${priv.toUpperCase} ON TABLE ${rel.fqn} TO ${adapter.quote(g)}")
    }
    System.err.println(
      s"[grants] ${node.uniqueId}: no ACL catalog in local Spark — " +
        s"recorded ${dcl.size} grant(s) as no-op: ${dcl.mkString("; ")}")
    dcl
  }

  /** persist_docs (reference MA/adapters/persist_docs.sql): write the
    * model's YAML description as the table comment and column descriptions
    * as column comments, when `persist_docs: {relation: …, columns: …}`
    * opts in. Views take only the relation comment (ALTER VIEW). */
  private def persistDocs(node: Node): Unit = {
    val pd = node.config.extra.get("persist_docs").collect {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    }.getOrElse(Map.empty[String, Any])
    if (pd.isEmpty || node.relation.isEmpty) return
    def on(k: String) = pd.get(k).exists(v =>
      graft.project.Yaml.str(v).toBoolean)
    val rel = node.relation.get
    def esc(s: String) = s.replace("'", "''")
    val isView = node.config.materialized == "view"
    if (on("relation") && node.description.nonEmpty) {
      val kw = if (isView) "VIEW" else "TABLE"
      adapter.execute(
        s"ALTER $kw ${rel.fqn} SET TBLPROPERTIES ('comment' = '${esc(node.description)}')",
        fetch = false)
    }
    if (on("columns") && !isView) {
      val present = adapter.getColumnsInRelation(rel).fieldNames.toSet
      node.columns.filter(c => present(c._1)).foreach { case (c, d) =>
        adapter.execute(
          s"ALTER TABLE ${rel.fqn} ALTER COLUMN `$c` COMMENT '${esc(d)}'",
          fetch = false)
      }
    }
  }

  /** Self-contained static docs page (`docs generate` index.html): the
    * manifest-shaped node inventory inlined as JSON and rendered with
    * ~40 lines of vanilla JS — no assets, works offline from file://.
    * (dbt ships a bundled SPA; the equivalent here is a minimal, honest
    * browser over the same artifact data.) All user-authored strings are
    * HTML-escaped client-side, and the inlined JSON escapes `<` so a
    * literal `</script>` in a description cannot terminate the script. */
  def writeDocsIndex(outPath: String): Unit = {
    // function and saved-query nodes carry their OWN shape: the docs
    // browser renders a function's (arguments) -> returns signature and
    // a saved query's query_params (metrics/group_by/where) inline —
    // they are first-class DAG nodes, not bare names
    def signature(n: Node): String = n.kind match {
      case NodeKind.Function =>
        val args = n.config.extra.get("arguments").toSeq.flatMap {
          case xs: Seq[_] => xs.collect { case m: Map[_, _] =>
            val am = m.asInstanceOf[Map[String, Any]]
            s"${am.getOrElse("name", "arg")}: " +
              s"${am.getOrElse("data_type", "string")}"
          }
          case _ => Nil
        }
        val ret = graft.project.Yaml
          .dig(n.config.extra, "returns", "data_type")
          .map(String.valueOf).getOrElse("string")
        s"(${args.mkString(", ")}) -> $ret"
      case NodeKind.SavedQuery =>
        val qp = n.config.extra.get("query_params")
          .collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
          .getOrElse(Map.empty)
        def part(k: String): Option[String] = qp.get(k).flatMap {
          case xs: Seq[_] if xs.nonEmpty =>
            Some(s"$k: ${xs.map(String.valueOf).mkString(", ")}")
          case s: String if s.nonEmpty => Some(s"$k: $s")
          case _ => None
        }
        Seq("metrics", "group_by", "where").flatMap(part).mkString(" | ")
      case _ => ""
    }
    val nodes = resolved.nodes.toSeq.sortBy(_._1).map { case (id, n) =>
      Map(
        "unique_id" -> id,
        "resource_type" -> n.kind.name,
        "name" -> n.name,
        "package" -> n.packageName,
        "relation" -> n.relation.map(_.fqn).orNull,
        "materialized" -> n.config.materialized,
        "tags" -> n.config.tags,
        "description" -> n.description,
        "signature" -> signature(n),
        "columns" -> n.columns.toSeq.sortBy(_._1)
          .map { case (c, d) => Map("name" -> c, "description" -> d) },
        "depends_on" -> n.dependsOn)
    }
    // `<` → < inside the JSON: a description containing "</script>"
    // must not terminate the inline script block
    val data = Json.write(Map("project" -> project.name, "nodes" -> nodes))
      .replace("<", "\\u003c")
    val html =
      s"""<!doctype html><html><head><meta charset="utf-8">
         |<title>${project.name} — graft docs</title>
         |<style>
         |body{font:14px/1.5 system-ui,sans-serif;margin:2rem auto;max-width:60rem;padding:0 1rem}
         |input{width:100%;padding:.5rem;font-size:1rem;margin-bottom:1rem}
         |.node{border:1px solid #ddd;border-radius:6px;padding:.8rem 1rem;margin:.6rem 0}
         |.kind{display:inline-block;background:#eef;border-radius:4px;padding:0 .4rem;margin-right:.5rem;font-size:.85em}
         |.rel{color:#666;font-size:.9em}.desc{margin:.4rem 0}
         |table{border-collapse:collapse;font-size:.9em}td,th{border:1px solid #eee;padding:.15rem .5rem;text-align:left}
         |.deps{color:#888;font-size:.85em}
         |</style></head><body>
         |<h1 id="t"></h1>
         |<input id="q" placeholder="filter by name, tag, type…">
         |<div id="list"></div>
         |<script>
         |const D=$data;
         |const esc=s=>String(s).replace(/&/g,'&amp;').replace(/</g,'&lt;')
         |  .replace(/>/g,'&gt;').replace(/"/g,'&quot;');
         |document.getElementById('t').textContent=D.project+' — '+D.nodes.length+' nodes';
         |function render(f){
         |  const el=document.getElementById('list');el.innerHTML='';
         |  D.nodes.filter(n=>!f||JSON.stringify([n.name,n.unique_id,n.tags,n.resource_type]).toLowerCase().includes(f))
         |   .forEach(n=>{
         |    const d=document.createElement('div');d.className='node';
         |    let h='<span class="kind">'+esc(n.resource_type)+'</span><b>'+esc(n.name)+'</b>';
         |    if(n.relation)h+=' <span class="rel">'+esc(n.relation)+' ('+esc(n.materialized)+')</span>';
         |    if(n.signature)h+=' <span class="rel">'+esc(n.signature)+'</span>';
         |    if(n.description)h+='<div class="desc">'+esc(n.description)+'</div>';
         |    if(n.columns.length){h+='<table><tr><th>column</th><th>description</th></tr>'+
         |      n.columns.map(c=>'<tr><td>'+esc(c.name)+'</td><td>'+esc(c.description||'')+'</td></tr>').join('')+'</table>';}
         |    if(n.depends_on.length)h+='<div class="deps">depends on: '+n.depends_on.map(esc).join(', ')+'</div>';
         |    d.innerHTML=h;el.appendChild(d);});
         |}
         |document.getElementById('q').addEventListener('input',e=>render(e.target.value.toLowerCase()));
         |render('');
         |</script></body></html>
         |""".stripMargin
    Files.writeString(Paths.get(outPath), html)
  }

  def writeCatalog(outPath: String): Unit = {
    def entry(id: String, rel: graft.core.Relation,
        description: String): (String, Map[String, Any]) = {
      val schema = adapter.getColumnsInRelation(rel)
      id -> Map(
        "metadata" -> Map(
          "schema" -> rel.schema,
          "name" -> rel.identifier,
          "comment" -> adapter.tableComment(rel).getOrElse(description)),
        "columns" -> schema.fields.zipWithIndex.map { case (f, i) =>
          f.name -> Map(
            "type" -> f.dataType.sql,
            "index" -> i,
            "comment" -> f.getComment().getOrElse(""))
        }.toMap)
    }
    val nodesCat = resolved.nodes.values.toSeq.flatMap { n =>
      n.relation.filter(adapter.relationExists)
        .map(rel => entry(n.uniqueId, rel, n.description))
    }.toMap
    val json = Map(
      "metadata" -> Map(
        "dbt_schema_version" -> "https://schemas.getdbt.com/dbt/catalog/v1.json",
        "generated_by" -> "graft"),
      "nodes" -> nodesCat)
    Files.writeString(Paths.get(outPath), Json.write(json))
  }

  /** Run a user `{% materialization %}` block as the node's
    * materialization program (reference: materialization_resolver.rs
    * best_candidate — most-specific adapter wins, so `spark` beats
    * `default`; user blocks beat builtins on locality). The body runs with
    * the full run context plus the materialization surface: `sql` /
    * `compiled_code`, statement call blocks (execute via the adapter),
    * make_temp_relation, should_full_refresh, existing/old relation, and
    * `{{ return(...) }}`. The block owns the DDL — success means the
    * program rendered without raising. */
  private def runCustomMaterialization(node: Node, compiledSql: String,
      mat: String, fullRefresh: Boolean): MatResult = {
    val rel = node.relation.get
    val adapterName =
      if (customMats(mat).contains("spark")) "spark"
      else if (customMats(mat).contains("default")) "default"
      else throw new IllegalArgumentException(
        s"materialization '$mat' defined for adapters ${customMats(mat)}, " +
          "none of which match 'spark' or 'default'")
    val existing = adapter.getRelation(rel.schema, rel.identifier)
    val bindings = DbtContext.runContext(adapter, rel,
      (pk, n, v) => resolved.nodes.get(resolved.refUniqueId(node.packageName, pk, n, v))
        .flatMap(_.relation).map(_.fqn).getOrElse(n),
      sourceSql,
      isIncremental = false, node.config.extra, project.vars,
      flags = ctxFlags, graph = () => flatGraph) ++ Map(
      "sql" -> compiledSql,
      "compiled_code" -> compiledSql,
      "model" -> Map(
        "unique_id" -> node.uniqueId, "name" -> node.name,
        "alias" -> rel.identifier, "schema" -> rel.schema,
        "compiled_code" -> compiledSql),
      "existing_relation" -> existing.map(_.fqn).orNull,
      "old_relation" -> existing.map(_.fqn).orNull,
      "should_full_refresh" -> Jinja.JFunc((_, _) => fullRefresh),
      "make_temp_relation" -> Jinja.JFunc { (a, _) =>
        val base = a.headOption.map(_.toString).getOrElse(rel.fqn)
        base + "__dbt_tmp"
      },
      "pre_hooks" -> Vector.empty[Any],
      "post_hooks" -> Vector.empty[Any],
      "run_hooks" -> Jinja.JFunc((_, _) => ""))
    try {
      Jinja.render(
        macroPrelude + s"{{ materialization_${mat}_$adapterName() }}", bindings)
      MatResult(rel, "success", s"custom materialization $mat ($adapterName)")
    } catch {
      // a top-level return() (outside any macro) ends the program cleanly
      case Jinja.ReturnValue(_) =>
        MatResult(rel, "success", s"custom materialization $mat ($adapterName)")
    }
  }

  private def renderHook(hook: String, node: Node): String =
    Jinja.render(hook, DbtContext.runContext(adapter, node.relation.get,
      (pk, n, v) => resolved.nodes.get(resolved.refUniqueId(node.packageName, pk, n, v))
        .flatMap(_.relation).map(_.fqn).getOrElse(n),
      sourceSql,
      isIncremental = false, node.config.extra, project.vars,
      flags = ctxFlags, graph = () => flatGraph))

  /** YAML `unit_tests:` execution (reference: unit materialization
    * MA/materializations/tests/unit.sql + get_fixture_sql): each `given`
    * fixture becomes a temp view substituted for its ref()/source() in the
    * model's compiled SQL (typed against the real input's schema when that
    * relation exists), overrides rebind vars/env_vars/macros for this one
    * compile, and the result is diffed both ways against `expect`. */
  private def runUnitTestNode(node: Node): MatResult = {
    val model = node.config.extra.get("model").map(_.toString).getOrElse(
      throw new IllegalStateException(s"unit test ${node.name}: no model"))
    val modelNode = resolved.nodes(
      resolved.refUniqueId(node.packageName, None, model))
    val fixtures: Map[String, String] = node.givenFixtures.map {
      case (inputKey, rows) =>
        val template: Option[org.apache.spark.sql.DataFrame] =
          if (inputKey.contains(".")) {
            val Array(src, tbl) = inputKey.split("\\.", 2)
            resolved.sources.get(src).flatMap(_.get(tbl)).flatMap {
              case r if r.relType == RelationType.External &&
                  r.identifier.contains("/") =>
                Some(graft.core.ExternalSource.read(spark, r.identifier))
              case r if adapter.relationExists(r) => Some(adapter.read(r))
              case _ => None
            }
          } else resolved.nodes
            .get(resolved.refUniqueId(node.packageName, None, inputKey))
            .flatMap(_.relation).filter(adapter.relationExists)
            .map(adapter.read)
        val view = s"__unit_${node.name}_${inputKey.replace('.', '_')}"
        UnitTestMat.fixtureDf(spark, rows, template)
          .createOrReplaceTempView(view)
        inputKey -> view
    }
    val ov = node.config.extra.get("overrides")
      .collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
      .getOrElse(Map.empty)
    def ovMap(key: String): Map[String, Any] = ov.get(key)
      .collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
      .getOrElse(Map.empty)
    val sql = compileSql(modelNode, forUnitTest = fixtures,
      overrideVars = ovMap("vars"),
      overrideEnv = ovMap("env_vars").map { case (k, v) => k -> v.toString },
      overrideMacros = ovMap("macros"))
    // function deps are LOGIC, not data: unit tests mock data inputs
    // (given:) but run macros for real — `{{ function() }}` deps get the
    // same treatment, CREATED on demand (CREATE OR REPLACE FUNCTION is
    // idempotent and does not scan data) so the fixture SQL can call
    // them without the user having built the DAG first. Transitive:
    // a function body may call other functions; dependencies first.
    locally {
      val built = mutable.Set.empty[String]
      def buildFn(uid: String): Unit =
        if (!built(uid)) {
          built += uid
          resolved.nodes.get(uid).foreach { fn =>
            fn.dependsOn.filter(_.startsWith("function.")).foreach(buildFn)
            val r = runNode(fn)
            if (r.status != "success") throw new IllegalStateException(
              s"unit test ${node.name}: function dependency $uid failed " +
                s"to build: ${r.message}")
          }
        }
      modelNode.dependsOn.filter(_.startsWith("function.")).foreach(buildFn)
    }
    val actual = spark.sql(sql)
    val expected = UnitTestMat.fixtureDf(spark, node.expectRows, Some(actual))
    val res = UnitTestMat.run(actual, expected)
    MatResult(node.relation.getOrElse(Relation(targetSchema, node.name)),
      if (res.status == "pass") "success" else "fail",
      s"unit test ${node.name}: ${res.status}")
  }

  private def runTestNode(node: Node): MatResult = {
    // singular test: the file body IS the failing-rows query
    // (reference: MA/materializations/tests/test.sql:1-66)
    if (node.columns.get("test_kind").contains("singular")) {
      val sql = compileSql(node)
      val failing = spark.sql(sql)
      val res = TestMat.run(spark, failing, node.config, Some(adapter),
        Some(Relation(targetSchema + "_failures", node.name)), Some(sql))
      return MatResult(node.relation.get, res.status, s"failures=${res.failures}")
    }
    val modelName = node.columns("model")
    val column = node.columns("column_name")
    // the tested subject: a model by default; source/seed/snapshot tests
    // record their uid (Resolver.buildTestNode subject_uid)
    val subjectUid = node.columns.getOrElse("subject_uid",
      s"model.${node.packageName}.$modelName")
    val (df0, subjectFrom, modelRel): (org.apache.spark.sql.DataFrame, String, Relation) =
      if (subjectUid.startsWith("source.")) {
        val Array(_, s, t) = subjectUid.split("\\.", 3)
        val rel = resolved.sources(s)(t)
        if (rel.relType == RelationType.External && rel.identifier.contains("/"))
          (graft.core.ExternalSource.read(spark, rel.identifier),
            graft.core.ExternalSource.sqlFor(rel.identifier), rel)
        else (adapter.read(rel), rel.fqn, rel)
      } else {
        val rel = resolved.nodes(subjectUid).relation.get
        (adapter.read(rel), rel.fqn, rel)
      }
    val df = node.config.where.map(df0.filter).getOrElse(df0)
    // SQL twin of each builtin generic test (MA/generic_test_sql/*.sql) —
    // store_failures_as: view persists THIS text so the stored relation
    // re-evaluates live exactly like dbt's; evaluation then also runs
    // from it so view and result can never drift.
    def q(id: String) = "`" + id.replace("`", "``") + "`"
    val baseSql = node.config.where
      .map(w => s"SELECT * FROM $subjectFrom WHERE ($w)")
      .getOrElse(s"SELECT * FROM $subjectFrom")
    def sqlLit(v: Any): String = v match {
      case s: String => "'" + s.replace("'", "''") + "'"
      case other => String.valueOf(other)
    }
    val (failing, testSql): (org.apache.spark.sql.DataFrame, Option[String]) =
      node.rawSql match {
      case "unique" =>
        (GenericTests.unique(df, column), Some(
          s"SELECT ${q(column)} AS unique_field, count(*) AS n_records " +
            s"FROM ($baseSql) m WHERE ${q(column)} IS NOT NULL " +
            s"GROUP BY ${q(column)} HAVING count(*) > 1"))
      case "not_null" =>
        (GenericTests.notNull(df, column), Some(
          s"SELECT * FROM ($baseSql) m WHERE ${q(column)} IS NULL"))
      case "accepted_values" =>
        val values = node.config.extra.get("values").map {
          case s: Seq[_] => s.asInstanceOf[Seq[Any]]
          case one => Seq(one)
        }.getOrElse(Nil)
        // empty accepted list → every non-null group fails (the DF
        // builder's isin() semantics); NOT IN () would not parse
        val havingSql =
          if (values.isEmpty) s"${q(column)} IS NOT NULL"
          else s"${q(column)} NOT IN (${values.map(sqlLit).mkString(", ")})"
        (GenericTests.acceptedValues(df, column, values), Some(
          s"SELECT ${q(column)} AS value_field, count(*) AS n_records " +
            s"FROM ($baseSql) m GROUP BY ${q(column)} HAVING $havingSql"))
      case "relationships" =>
        val toUid = node.dependsOn.find(_ != subjectUid)
          .getOrElse(throw new IllegalStateException("relationships needs `to`"))
        val parentRel = resolved.nodes(toUid).relation.get
        val field = node.config.extra.get("field").map(_.toString).getOrElse("id")
        (GenericTests.relationships(df, column, adapter.read(parentRel), field),
          Some(s"SELECT m.${q(column)} AS from_field FROM ($baseSql) m " +
            s"LEFT ANTI JOIN (SELECT DISTINCT ${q(field)} AS __parent_key " +
            s"FROM ${parentRel.fqn}) p ON m.${q(column)} = p.__parent_key " +
            s"WHERE m.${q(column)} IS NOT NULL"))
      case custom if customTests.contains(custom) =>
        // {% test custom(model, column_name, ...) %} — loaded as macro
        // test_custom; call it with the model fqn, the column, and every
        // non-config param as kwargs, then run the rendered SELECT.
        val reserved = Set("config", "severity", "where", "limit",
          "store_failures", "store_failures_as", "warn_if", "error_if",
          "fail_calc")
        val kwargs = node.config.extra.collect {
          case (k, v) if !reserved(k) => s", $k=${jinjaLit(v)}"
        }.mkString
        val call = s"{{ test_$custom(model=${jinjaLit(subjectFrom)}, " +
          s"column_name=${jinjaLit(column)}$kwargs) }}"
        val sql = compileSql(node.copy(rawSql = call))
        (spark.sql(sql), Some(sql))
      case other =>
        throw new IllegalArgumentException(s"unknown generic test: $other")
    }
    // view storage evaluates FROM the SQL twin, so the persisted view's
    // definition and the reported failure count share one query
    val evalRows =
      if (node.config.effectiveStoreFailures.contains("view"))
        spark.sql(testSql.get)
      else failing
    val res = TestMat.run(spark, evalRows, node.config,
      Some(adapter),
      Some(Relation(targetSchema + "_failures", node.name)), testSql)
    MatResult(modelRel, res.status, s"failures=${res.failures}")
  }

  /** Scala value → Jinja literal (for synthesized test-macro calls). */
  private def jinjaLit(v: Any): String = v match {
    case s: String => "'" + s.replace("'", "\\'") + "'"
    case seq: Seq[_] => seq.map(jinjaLit).mkString("[", ", ", "]")
    case b: Boolean => if (b) "true" else "false"
    case n @ (_: Int | _: Long | _: Double | _: Float | _: BigDecimal) => n.toString
    case other => "'" + String.valueOf(other).replace("'", "\\'") + "'"
  }

  // ---- scheduling -------------------------------------------------------

  /** Execute selected nodes in topological waves with bounded parallelism.
    * Nodes whose upstream failed are skipped; unchanged nodes (per recorded
    * state) are reused. */
  def run(select: Option[String] = None, fullRefresh: Boolean = false,
      enableReuse: Boolean = false,
      kinds: graft.core.NodeKind => Boolean = _ => true,
      selectorName: Option[String] = None,
      /** --exclude: subtracted from the selection (dbt CLI semantics —
        * Difference over the whole select set, graph operators included). */
      exclude: Option[String] = None,
      /** --fail-fast: stop scheduling new levels after the first error;
        * in-flight nodes of the current level finish, the rest report
        * skipped (dbt fail-fast semantics). */
      failFast: Boolean = false,
      indirectSelection: String = "eager"): Seq[NodeResult] = {
    val selected: Set[String] =
      selectIds(select, selectorName, exclude, indirectSelection)
    // exposures/metrics/semantic models/analyses are declaration-only —
    // they select and document, but never execute
    val declarationOnly: Set[graft.core.NodeKind] = Set(
      graft.core.NodeKind.Exposure, graft.core.NodeKind.Metric,
      graft.core.NodeKind.SemanticModel, graft.core.NodeKind.Analysis,
      graft.core.NodeKind.SavedQuery)
    val runnable = resolved.nodes.view.filterKeys(selected).toMap
      .filter { case (_, n) => n.config.enabled && !n.isEphemeral &&
        kinds(n.kind) && !declarationOnly(n.kind) }
    val sliced = graph.slice(runnable.keySet)
    val prev = if (enableReuse) prevState() else Map.empty[String, String]

    val pool = Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results = new ConcurrentHashMap[String, NodeResult]()
    val failed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

    runProjectHooks(project.onRunStart, "on-run-start", Nil)
    try {
      sliced.topologicalLevels().foreach { level =>
        if (failFast && !failed.isEmpty) {
          // stop scheduling: everything not yet run reports skipped
          level.foreach(id => results.put(id,
            NodeResult(id, "skipped", "fail-fast: earlier node failed", 0)))
        } else {
        val futures = level.map { id =>
          Future {
            val node = runnable(id)
            val upstreamFailed = sliced.deps.getOrElse(id, Nil).exists(failed.contains)
            val result =
              if (upstreamFailed)
                NodeResult(id, "skipped", "upstream failure", 0)
              else if (enableReuse && prev.get(id).contains(stateHash(node, prev)) &&
                  node.relation.exists(adapter.relationExists))
                NodeResult(id, "success", "reused: no changes", 0, reused = true)
              else {
                // Per-node FAIR pool so concurrent nodes share the cluster.
                spark.sparkContext.setLocalProperty("spark.scheduler.pool", id)
                try runNode(node, fullRefresh)
                finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
              }
            if (result.status == "error" || result.status == "fail")
              failed.add(id)
            results.put(id, result)
          }
        }
        Await.result(Future.sequence(futures), Duration.Inf)
        }
      }
    } finally pool.shutdown()

    val out = results.values().asScala.toSeq.sortBy(_.uniqueId)
    runProjectHooks(project.onRunEnd, "on-run-end", out)
    stateDir.foreach(saveState(out, _))
    out
  }

  /** Project-level `on-run-start` / `on-run-end` hooks (reference:
    * MA/materializations/hooks.sql + the OnRunStartEnd node kind in
    * crates/dbt-schemas/src/schemas/nodes.rs): each entry is Jinja-rendered
    * with the run context — macros from the prelude ARE available — and
    * executed as SQL; blank renders (macro-only hooks like
    * `{{ log(...) }}`) are skipped. on-run-end additionally binds
    * `results` (list of {node, status, execution_time, message}) and
    * `schemas` (distinct schemas the run wrote to), matching dbt's
    * on-run-end context. */
  private def runProjectHooks(hooks: Seq[String], phase: String,
      results: Seq[NodeResult]): Unit = {
    if (hooks.isEmpty) return
    val rel = Relation(targetSchema, s"__${phase.replace('-', '_')}__")
    val schemas = results.flatMap(r => resolved.nodes.get(r.uniqueId))
      .flatMap(_.relation).map(_.schema).distinct.sorted
    val resultObjs: Vector[Any] = results.map { r =>
      Map(
        "node" -> resolved.nodes.get(r.uniqueId).map(n => Map(
          "unique_id" -> n.uniqueId, "name" -> n.name,
          "relation_name" -> n.relation.map(_.fqn).orNull)).getOrElse(Map.empty),
        "status" -> r.status,
        "message" -> r.message,
        "execution_time" -> r.executionTimeMs / 1000.0): Any
    }.toVector
    val bindings = DbtContext.runContext(adapter, rel,
      (pk, n, v) => resolved.nodes.get(resolved.refUniqueId(project.name, pk, n, v))
        .flatMap(_.relation).map(_.fqn).getOrElse(n),
      sourceSql,
      isIncremental = false, Map.empty, project.vars,
      flags = ctxFlags, graph = () => flatGraph) ++ Map(
      "results" -> resultObjs,
      "schemas" -> schemas.toVector,
      "database_schemas" -> schemas.toVector)
    hooks.zipWithIndex.foreach { case (hook, i) =>
      val sql =
        try Jinja.render(macroPrelude + hook, bindings).trim
        catch { case Jinja.ReturnValue(v) => Jinja.stringify(v).trim }
      if (sql.nonEmpty) adapter.execute(sql, fetch = false)
      else System.err.println(
        s"[$phase] hook ${i + 1} rendered empty — skipped execute")
    }
  }

  // ---- smart reuse state (reference: Changeset changeset.rs:10-18,
  // DbtChecksum common.rs:672) --------------------------------------------

  /** Hash covering the node AND its upstream state. */
  private def stateHash(node: Node, prev: Map[String, String]): String =
    Json.md5(node.checksum +
      node.dependsOn.sorted.map(d => prev.getOrElse(d, "")).mkString("|"))

  /** Full selection resolution — select/selector/exclude with the state
    * and result context loaded, shared by run/compile/list so state: and
    * result: methods behave identically everywhere. */
  def selectIds(select: Option[String], selectorName: Option[String] = None,
      exclude: Option[String] = None,
      /** --indirect-selection (IndirectSelection node_selector.rs:49-55):
        * how tests attach to an explicit selection. */
      indirectSelection: String = "eager"): Set[String] =
    selectionSpec(select, selectorName, exclude) match {
      case Some(sp) =>
        // expansion happens PER CRITERION inside select (dbt's order), so
        // an --exclude also drops its attached tests
        Selector.select(sp, resolved.nodes, graph, prevState(),
          prevResults(), fresherSources(), indirectSelection)
      case None => resolved.nodes.keySet
    }

  /** source_status:fresher inputs: source uids whose CURRENT freshness
    * artifact records a strictly newer max_loaded_at than the --state
    * copy (or that the previous run never saw). None when either
    * artifact is missing — the selector method errors naming what to
    * run. A source with no max_loaded_at in the current artifact (error
    * or metadata-skip) is never "fresher". */
  def fresherSources(): Option[Set[String]] = {
    // Artifacts written by dbt itself use ISO-8601 ('T' separator,
    // optional zone suffix); ours use 'yyyy-MM-dd HH:mm:ss'. Accept
    // both, and anchor EVERY zone-less form at UTC — the engine's
    // session timezone convention. Timestamp.valueOf would interpret
    // the space form in the JVM-default zone, so the same logical
    // stamp from two tools would compare unequal on non-UTC JVMs and
    // source_status:fresher would mis-select.
    def parseLoadedAt(s: String, path: java.nio.file.Path): java.sql.Timestamp =
      try {
        val t = s.trim.replace(' ', 'T')
        val instant =
          try java.time.OffsetDateTime.parse(t).toInstant
          catch { case _: java.time.format.DateTimeParseException =>
            java.time.LocalDateTime.parse(t)
              .toInstant(java.time.ZoneOffset.UTC) }
        java.sql.Timestamp.from(instant)
      } catch { case e: java.time.format.DateTimeParseException =>
        throw new IllegalStateException(
          s"source_status:fresher: cannot parse max_loaded_at '$s' in " +
            s"$path — expected 'yyyy-MM-dd HH:mm:ss[.f]' or ISO-8601", e)
      }
    def loadedAt(path: java.nio.file.Path): Option[Map[String, java.sql.Timestamp]] =
      if (!Files.exists(path)) None
      else Some(Json.parse(Files.readString(path))
        .asInstanceOf[Map[String, Any]]
        .get("results").collect { case rs: Seq[_] =>
          rs.collect { case r: Map[_, _] =>
            val rm = r.asInstanceOf[Map[String, Any]]
            Option(rm.getOrElse("max_loaded_at", null)).map { v =>
              rm("unique_id").toString -> parseLoadedAt(v.toString, path)
            }
          }.flatten.toMap
        }.getOrElse(Map.empty))
    for {
      state <- stateDir
      prev <- loadedAt(Paths.get(state, "sources.json"))
      cur <- currentSourcesJson.flatMap(p => loadedAt(Paths.get(p)))
    } yield cur.collect {
      case (uid, ts) if prev.get(uid).forall(ts.after) => uid
    }.toSet
  }

  /** selectors.yml named definitions; `--select` wins, then `--selector`,
    * then the file's `default: true` entry (parser.rs:60-99). */
  lazy val (namedSelectors, defaultSelector) =
    Selector.parseSelectorsYaml(project.selectorsDoc)

  private def selectionSpec(select: Option[String],
      selectorName: Option[String],
      exclude: Option[String] = None): Option[Selector.Spec] = {
    val base = select.map(Selector.parse)
      .orElse(selectorName.map(n => namedSelectors.getOrElse(n,
        throw new IllegalArgumentException(
          s"unknown selector '$n' (selectors.yml defines: ${namedSelectors.keys.mkString(", ")})"))))
      .orElse(defaultSelector.flatMap(namedSelectors.get))
    exclude.map(Selector.parse) match {
      case None => base
      case Some(ex) =>
        // --exclude with no --select subtracts from everything
        Some(Selector.Difference(
          base.getOrElse(Selector.parse("fqn:*")), ex))
    }
  }

  /** Last run's node statuses, for the result:<status> selector method
    * (node_selector.rs:80 — powers retry workflows). */
  def prevResults(): Map[String, String] = stateDir match {
    case Some(dir) =>
      val p = Paths.get(dir, "results.json")
      if (Files.exists(p))
        Json.parse(Files.readString(p)).asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> v.toString }
      else Map.empty
    case None => Map.empty
  }

  private def prevState(): Map[String, String] = stateDir match {
    case Some(dir) =>
      val p = Paths.get(dir, "state.json")
      if (Files.exists(p))
        Json.parse(Files.readString(p)).asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> v.toString }
      else Map.empty
    case None => Map.empty
  }

  private def saveState(results: Seq[NodeResult], dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    val prev = prevState()
    val state = resolved.nodes.toSeq.collect {
      case (id, n) if results.exists(r => r.uniqueId == id && r.status == "success") =>
        // `id` keys the combined (node + upstream) hash for smart reuse;
        // the `#body`/`#config` suffixed keys record the split checksums
        // that power state:modified.body / state:modified.configs
        Seq(id -> stateHash(n, prev),
          s"$id#body" -> n.checksumBody,
          s"$id#config" -> n.checksumConfig,
          s"$id#contract" -> n.checksumContract,
          s"$id#relation" -> n.checksumRelation,
          s"$id#macros" -> n.checksumMacros)
    }.flatten.toMap
    // MERGE with the recorded state: a subset run (--select, retry) must
    // not destroy the hashes/statuses of nodes it didn't touch — doing so
    // made the next smart-reuse/state:modified/result: run rebuild the
    // world. Entries for nodes this run DID touch are replaced.
    val mergedState = prev ++ state
    val mergedResults = prevResults() ++
      results.map(r => r.uniqueId -> r.status).toMap
    Files.writeString(Paths.get(dir, "state.json"), Json.write(mergedState))
    Files.writeString(Paths.get(dir, "results.json"), Json.write(mergedResults))
  }

  // ---- artifacts (reference: RunResultsArtifact run_results.rs:169,
  // manifest v12 schemas/manifest/manifest.rs) ----------------------------

  def writeRunResults(results: Seq[NodeResult], outPath: String): Unit = {
    val json = Map(
      "metadata" -> Map(
        "dbt_schema_version" -> "https://schemas.getdbt.com/dbt/run-results/v6.json",
        "generated_by" -> "graft"),
      "elapsed_time" -> results.map(_.executionTimeMs).sum / 1000.0,
      "results" -> results.map(r => Map(
        "unique_id" -> r.uniqueId,
        "status" -> r.status,
        "message" -> r.message,
        "execution_time" -> r.executionTimeMs / 1000.0,
        "reused" -> r.reused)))
    Files.writeString(Paths.get(outPath), Json.write(json))
  }

  /** manifest.json in the reference's v12 shape (DbtManifestV12,
    * crates/dbt-schemas/src/schemas/manifest/v12.rs:23-42): every v12
    * top-level key is present; executable nodes carry the CommonAttributes
    * + NodeBaseAttributes fields this engine tracks (nodes.rs:2781-2866).
    * ManifestV12Spec enumerates the intentionally-omitted fields. */
  /** function nodes EXECUTE, but v12 emits them in their own `functions`
    * section, not `nodes` (manifest.rs:183 "Functions are now handled
    * separately in the functions field"). */
  private val declaredKinds: Set[String] =
    Set("exposure", "metric", "semantic_model", "unit_test",
      "saved_query", "function")

  /** One node as the manifest/flat-graph dict (CommonAttributes +
    * NodeBaseAttributes, nodes.rs:2781-2866). */
  private def nodeJson(id: String, n: Node): Map[String, Any] = Map(
      // CommonAttributes (nodes.rs:2781)
      "unique_id" -> id,
      "name" -> n.name,
      "package_name" -> n.packageName,
      "fqn" -> Seq(n.packageName, n.name),
      "path" -> n.path,
      "original_file_path" -> n.path,
      "raw_code" -> n.rawSql,
      "checksum" -> Map("name" -> "sha256", "checksum" -> n.checksum),
      "language" -> (if (n.kind == NodeKind.Seed) null else "sql"),
      "description" -> n.description,
      "tags" -> n.config.tags,
      "meta" -> Map.empty[String, Any],
      // NodeBaseAttributes (nodes.rs:2821)
      "database" -> n.relation.flatMap(_.database).orNull,
      "schema" -> n.relation.map(_.schema).orNull,
      "alias" -> n.relation.map(_.identifier).orNull,
      "relation_name" -> n.relation.map(_.fqn).orNull,
      "resource_type" -> n.kind.name,
      "columns" -> n.columns.map { case (c, d) =>
        c -> Map("name" -> c, "description" -> d) },
      "depends_on" -> Map("nodes" -> n.dependsOn,
        "macros" -> Seq.empty[String]),
      "config" -> Map(
        "enabled" -> n.config.enabled,
        "materialized" -> n.config.materialized,
        "tags" -> n.config.tags,
        "grants" -> n.config.grants,
        "pre_hook" -> n.config.preHook,
        "post_hook" -> n.config.postHook,
        "persist_docs" -> n.config.extra.getOrElse("persist_docs",
          Map.empty[String, Any])))

  def writeManifest(outPath: String): Unit = {
    val (declared, executable) =
      resolved.nodes.partition { case (_, n) => declaredKinds(n.kind.name) }
    def declaredOf(kind: String): Map[String, Any] =
      declared.collect { case (id, n) if n.kind.name == kind =>
        id -> nodeJson(id, n) }
    // resolved dependency edges → parent/child maps (manifest child_map)
    val parentMap = resolved.nodes.map { case (id, n) => id -> n.dependsOn }
    val childMap = resolved.nodes.map { case (id, _) =>
      id -> resolved.nodes.collect {
        case (cid, c) if c.dependsOn.contains(id) => cid }.toSeq.sorted
    }
    val macroDef = raw"\{%-?\s*macro\s+([A-Za-z_][A-Za-z0-9_]*)".r
    val macros = project.allProjects.flatMap { p =>
      p.macroSources.flatMap(src => macroDef.findAllMatchIn(src).map(_.group(1)))
        .map(m => s"macro.${p.name}.$m" -> Map(
          "unique_id" -> s"macro.${p.name}.$m",
          "name" -> m, "package_name" -> p.name,
          "resource_type" -> "macro"))
    }.toMap
    val json = Map(
      "metadata" -> Map(
        "dbt_schema_version" -> "https://schemas.getdbt.com/dbt/manifest/v12.json",
        "dbt_version" -> "2.0.0-graft",
        "project_name" -> project.name,
        "adapter_type" -> "spark"),
      "nodes" -> executable.map { case (id, n) => id -> nodeJson(id, n) },
      "sources" -> resolved.sources.map { case (s, ts) =>
        s -> ts.map { case (t, rel) => t -> rel.key }
      },
      "macros" -> macros,
      "unit_tests" -> declaredOf("unit_test"),
      // {% docs %} blocks as DbtDocsMacro entries (macros.rs:44-51) —
      // the last v12 map that was hardcoded empty
      "docs" -> project.allProjects.flatMap { p =>
        p.docsBlocks.map { case (n, contents) =>
          s"doc.${p.name}.$n" -> Map(
            "unique_id" -> s"doc.${p.name}.$n",
            "name" -> n, "package_name" -> p.name,
            "block_contents" -> contents)
        }
      }.toMap,
      "semantic_models" -> declaredOf("semantic_model"),
      "saved_queries" -> declaredOf("saved_query"),
      "exposures" -> declaredOf("exposure"),
      "metrics" -> declaredOf("metric"),
      "functions" -> declaredOf("function"),
      "child_map" -> childMap,
      "parent_map" -> parentMap,
      "group_map" -> resolved.nodes.toSeq
        .flatMap { case (id, n) =>
          n.config.extra.get("group").map(g => String.valueOf(g) -> id) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sorted },
      // enabled:false nodes, Vec-valued like the reference's
      // BTreeMap<String, Vec<..>> (manifest.rs:255 build_disabled_map)
      "disabled" -> resolved.disabledNodes.map { case (id, n) =>
        id -> Seq(nodeJson(id, n)) },
      "selectors" -> project.selectorsDoc,
      "groups" -> resolved.groups)
    Files.writeString(Paths.get(outPath), Json.write(json))
  }
}
