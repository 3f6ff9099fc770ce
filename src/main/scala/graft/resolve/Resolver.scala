package graft.resolve

import graft.core._
import graft.jinja.{DbtContext, Jinja}
import graft.project.{Project, Yaml}

/** Resolve phase: render every model with execute=false to harvest refs /
  * sources / inline configs, merge config layers, and build the typed node
  * graph (reference: crates/dbt-parser/src/resolver.rs:82 `resolve`,
  * resolve_inner :431; harvesting via SqlResource
  * crates/dbt-jinja-utils/src/phases/parse/sql_resource.rs:12-36).
  *
  * Config precedence: project tree < properties yml < inline config()
  * (mirrors the reference's merged configs in resolve_models.rs).
  */
object Resolver {

  /** Parsed source `freshness:` block + loaded_at_field (reference:
    * FreshnessRules common.rs:26-180; table-level wins over source-level).
    * Windows are (count, period). */
  final case class SourceFreshness(
      loadedAtField: Option[String],
      filter: Option[String],
      warnAfter: Option[(Long, String)],
      errorAfter: Option[(Long, String)],
      /** custom freshness SQL (reference: loaded_at_query nodes.rs /
        * manifest_nodes.rs) — a query returning one timestamp cell;
        * `{{ this }}` resolves to the source relation. Wins over
        * loaded_at_field when both are set. */
      loadedAtQuery: Option[String] = None)

  final case class Resolved(
      project: Project,
      nodes: Map[String, Node],
      /** source name → table name → relation */
      sources: Map[String, Map[String, Relation]],
      /** model name → packages that define it (for unqualified refs) */
      modelOwners: Map[String, Seq[String]] = Map.empty,
      /** (source, table) → event_time column — the microbatch input filter
        * hook for sources (reference model_config.rs:209-210). */
      sourceEventTimes: Map[(String, String), String] = Map.empty,
      /** (source, table) → freshness rules, only for tables that declare
        * (or inherit) a freshness block. */
      sourceFreshness: Map[(String, String), SourceFreshness] = Map.empty,
      /** Versioned models (reference: nodes.rs DbtModel version /
        * latest_version; ref resolution dbt-jinja-utils ref with v=):
        * (package, logical name) → (latest unique_id, version → unique_id). */
      modelVersions: Map[(String, String), (String, Map[String, String])] =
        Map.empty,
      /** `groups:` declarations (reference: DbtGroup dbt-schemas; dbt Mesh
        * ownership): group name → {name, owner{...}}. */
      groups: Map[String, Map[String, Any]] = Map.empty,
      /** Nodes removed from the DAG by `enabled: false` (plus tests /
        * unit tests auto-disabled with their subject). Emitted in the
        * manifest `disabled` map (reference: resolver.rs resolve_*
        * enabled/disabled partitions; manifest.rs:255 build_disabled_map). */
      disabledNodes: Map[String, Node] = Map.empty) {

    /** `ref('x')` / `ref('pkg', 'x')` [/ `v=N`] → unique id, with dbt's
      * resolution order: explicit package wins; else the referencing
      * node's own package; else a unique global match (reference:
      * compile_node_context.rs ref resolution). A versioned name resolves
      * to its latest version unless `v=`/`version=` pins one. */
    def refUniqueId(currentPkg: String, pkg: Option[String],
        name: String, version: Option[String] = None): String = {
      val owner = pkg match {
        case Some(p) => p
        case None =>
          val owners = modelOwners.getOrElse(name, Nil)
          if (owners.contains(currentPkg)) currentPkg
          else owners match {
            case Seq(only) => only
            case Nil => currentPkg // let downstream error
            case many => throw new IllegalStateException(
              s"ref('$name') is ambiguous across packages: ${many.mkString(", ")}")
          }
      }
      modelVersions.get((owner, name)) match {
        case Some((latestUid, byVersion)) => version match {
          case None => latestUid
          case Some(v) => byVersion.getOrElse(v, throw new IllegalStateException(
            s"ref('$name', v=$v): unknown version (has: ${byVersion.keys.toSeq.sorted.mkString(", ")})"))
        }
        case None =>
          version.foreach(v => throw new IllegalStateException(
            s"ref('$name', v=$v): model is not versioned"))
          s"model.$owner.$name"
      }
    }
  }

  def resolve(project: Project, targetSchema: String = "analytics",
      env: Map[String, String] = sys.env,
      // run_started_at must be invocation-constant (dbt fixes it at
      // invocation start) — the caller's clock, threaded into every
      // parse context so parse and run phases agree
      nowMs: Long = System.currentTimeMillis()): Resolved = {
    val parseFlags: Map[String, Any] = Map("run_started_at_ms" -> nowMs)
    val projects = project.allProjects
    // packages first, root last: a root macro overwrites a package's on
    // name collision (dbt MacroLocality Root > Imported, same order the
    // Runner uses for its prelude)
    val macroPrelude =
      (graft.funcs.BuiltinMacros.prelude +:
        (project.packages ++ Seq(project)).flatMap(_.macroSources))
        .mkString("\n")
    // --- versioned models (reference: dbt model versions; nodes.rs
    // version/latest_version, ref(..., v=N) resolution) ------------------
    // (pkg, logical name) → (latest version, [(v, backing file, v-config)])
    val versionDecls: Map[(String, String), (String, Seq[(String, String, Map[String, Any])])] =
      projects.flatMap { proj =>
        proj.properties.flatMap { props =>
          Yaml.dig(props, "models").toSeq.flatMap {
            case ms: Seq[_] => ms.flatMap {
              case m: Map[_, _] =>
                val mm = m.asInstanceOf[Map[String, Any]]
                val name = Yaml.str(mm("name"))
                Yaml.dig(mm, "versions") match {
                  case Some(vs: Seq[_]) if vs.nonEmpty =>
                    val versions = vs.collect { case vm: Map[_, _] =>
                      val vmm = vm.asInstanceOf[Map[String, Any]]
                      val v = Yaml.str(vmm("v"))
                      // backing file: defined_in > <name>_v<N> > <name>
                      val file = Yaml.dig(vmm, "defined_in").map(Yaml.str)
                        .getOrElse {
                          val cand = s"${name}_v$v"
                          if (proj.models.contains(cand)) cand else name
                        }
                      val vcfg = Yaml.dig(vmm, "config")
                        .map(_.asInstanceOf[Map[String, Any]])
                        .getOrElse(Map.empty)
                      (v, file, vcfg)
                    }
                    val latest = Yaml.dig(mm, "latest_version").map(Yaml.str)
                      .getOrElse(versions.map(_._1).maxBy(v =>
                        try v.toDouble catch { case _: NumberFormatException => 0.0 }))
                    Seq((proj.name, name) -> ((latest, versions)))
                  case _ => Nil
                }
              case _ => Nil
            }
            case _ => Nil
          }
        }
      }.toMap
    val modelVersions: Map[(String, String), (String, Map[String, String])] =
      versionDecls.map { case ((pkg, name), (latest, versions)) =>
        val byV = versions.map { case (v, _, _) =>
          v -> s"model.$pkg.$name.v$v" }.toMap
        val latestUid = byV.getOrElse(latest,
          throw new IllegalArgumentException(
            s"model $name: latest_version '$latest' matches no declared " +
              s"version (has: ${byV.keys.toSeq.sorted.mkString(", ")})"))
        (pkg, name) -> ((latestUid, byV))
      }
    // files consumed by a version declaration don't also become plain nodes
    val versionBackingFiles: Map[String, Set[String]] =
      versionDecls.toSeq.groupBy(_._1._1).view
        .mapValues(_.flatMap(_._2._2.map(_._2)).toSet).toMap

    val modelOwners: Map[String, Seq[String]] =
      (projects.flatMap(p => p.models.keys
        .filterNot(versionBackingFiles.getOrElse(p.name, Set.empty))
        .map(_ -> p.name)) ++
        // python models are models too: unqualified refs must resolve to
        // their owning package, and cross-package ambiguity must be caught
        projects.flatMap(p => p.pythonModels.keys.map(_ -> p.name)) ++
        versionDecls.keys.map { case (pkg, name) => name -> pkg })
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val protoResolved = Resolved(project, Map.empty, Map.empty, modelOwners,
      modelVersions = modelVersions)

    // --- sources from properties files (all packages) ------------------
    def freshnessWindow(m: Map[String, Any], key: String): Option[(Long, String)] =
      Yaml.dig(m, "freshness", key).collect { case w: Map[_, _] =>
        val wm = w.asInstanceOf[Map[String, Any]]
        (Yaml.str(wm.getOrElse("count", "0")).toLong,
          Yaml.str(wm.getOrElse("period", "hour")))
      }.filter(_._1 > 0)
    val sourceTables: Seq[(String, String, Relation, Option[String], Option[SourceFreshness])] =
      projects.flatMap(_.properties).flatMap { props =>
        Yaml.dig(props, "sources").toSeq.flatMap {
          case srcs: Seq[_] => srcs.collect { case s: Map[_, _] =>
            val sm = s.asInstanceOf[Map[String, Any]]
            val srcName = Yaml.str(sm("name"))
            val schema = Yaml.dig(sm, "schema").map(Yaml.str).getOrElse(srcName)
            Yaml.dig(sm, "tables").toSeq.flatMap {
              case ts: Seq[_] => ts.collect { case t: Map[_, _] =>
                val tm = t.asInstanceOf[Map[String, Any]]
                val tname = Yaml.str(tm("name"))
                val ident = Yaml.dig(tm, "identifier").map(Yaml.str).getOrElse(tname)
                // `external.location` points a source at a parquet path.
                val loc = Yaml.dig(tm, "external", "location").map(Yaml.str)
                val eventTime = Yaml.dig(tm, "config", "event_time")
                  .orElse(Yaml.dig(tm, "event_time")).map(Yaml.str)
                // freshness: table-level wins, source-level is the default
                // (FreshnessRules common.rs:26-180)
                val fresh: Option[SourceFreshness] = {
                  // `freshness: null` at table level opts out of the
                  // inherited source-level block (dbt semantics)
                  val optsOut = tm.contains("freshness") &&
                    (tm("freshness") == null || tm("freshness") == "null")
                  val warn = freshnessWindow(tm, "warn_after")
                    .orElse(freshnessWindow(sm, "warn_after"))
                  val err = freshnessWindow(tm, "error_after")
                    .orElse(freshnessWindow(sm, "error_after"))
                  if (optsOut || (warn.isEmpty && err.isEmpty)) None
                  else Some(SourceFreshness(
                    // empty/null table-level value opts OUT of an inherited
                    // source-level field (→ metadata fallback)
                    Yaml.dig(tm, "loaded_at_field").map(Yaml.str)
                      .orElse(Yaml.dig(sm, "loaded_at_field").map(Yaml.str))
                      .filter(s => s.nonEmpty && s != "null"),
                    Yaml.dig(tm, "freshness", "filter").map(Yaml.str),
                    warn, err,
                    Yaml.dig(tm, "loaded_at_query").map(Yaml.str)
                      .orElse(Yaml.dig(sm, "loaded_at_query").map(Yaml.str))
                      .filter(s => s.nonEmpty && s != "null")))
                }
                (srcName, tname, Relation(None, schema, loc.getOrElse(ident),
                  RelationType.External), eventTime, fresh)
              }
              case _ => Nil
            }
          }.flatten
          case _ => Nil
        }
      }
    val sources: Map[String, Map[String, Relation]] =
      sourceTables.groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(v => v._2 -> v._3).toMap }
    val sourceEventTimes: Map[(String, String), String] =
      sourceTables.collect { case (s, t, _, Some(et), _) => (s, t) -> et }.toMap
    val sourceFreshness: Map[(String, String), SourceFreshness] =
      sourceTables.collect { case (s, t, _, _, Some(f)) => (s, t) -> f }.toMap

    // --- property-file configs per model (all packages; names assumed
    // unique enough across packages — dbt's own global model namespace) ---
    val propConfigs: Map[String, Map[String, Any]] =
      projects.flatMap(_.properties).flatMap { props =>
        Yaml.dig(props, "models").toSeq.flatMap {
          case ms: Seq[_] => ms.collect { case m: Map[_, _] =>
            val mm = m.asInstanceOf[Map[String, Any]]
            // `access:` and `group:` are top-level model properties in dbt
            // (nodes.rs get_access / Access enum) — fold them into the
            // config map so they land in config.extra for enforcement and
            // the group:/access selector methods
            val topLevel = Seq("access", "group")
              .flatMap(k => Yaml.dig(mm, k).map(v => k -> (Yaml.str(v): Any)))
            Yaml.str(mm("name")) -> (
              Yaml.dig(mm, "config").map(_.asInstanceOf[Map[String, Any]])
                .getOrElse(Map.empty) ++ topLevel)
          }
          case _ => Nil
        }
      }.toMap

    // --- declared columns with data types (for contracts) ---------------
    val propColumns: Map[String, Seq[(String, String)]] =
      projects.flatMap(_.properties).flatMap { props =>
        Yaml.dig(props, "models").toSeq.flatMap {
          case ms: Seq[_] => ms.collect { case m: Map[_, _] =>
            val mm = m.asInstanceOf[Map[String, Any]]
            val cols = Yaml.dig(mm, "columns").toSeq.flatMap {
              case cs: Seq[_] => cs.collect { case c: Map[_, _] =>
                val cm = c.asInstanceOf[Map[String, Any]]
                Yaml.dig(cm, "data_type").map(dt =>
                  Yaml.str(cm("name")) -> Yaml.str(dt))
              }.flatten
              case _ => Nil
            }
            Yaml.str(mm("name")) -> cols
          }
          case _ => Nil
        }
      }.toMap

    // --- descriptions for docs/persist_docs (model + column level) ------
    // {{ doc('name') }} in a description resolves to the project's
    // {% docs %} block body (reference: dbt doc blocks; DbtDocsMacro)
    val docsBlocks: Map[String, String] =
      projects.flatMap(_.docsBlocks).toMap
    def renderDesc(d: String): String =
      if (!d.contains("{{")) d
      else try Jinja.render(d, Map("doc" -> graft.jinja.Jinja.JFunc { (a, _) =>
        val key = a.headOption.map(_.toString).getOrElse("")
        docsBlocks.getOrElse(key,
          throw new IllegalStateException(s"doc('$key') not found"))
      }))
      catch {
        // a missing doc() block is a real authoring error; any OTHER
        // Jinja in a description (literal moustaches, var()/ref()
        // examples in prose) passes through verbatim — docs must never
        // abort project resolution
        case e: IllegalStateException => throw e
        case _: graft.jinja.Jinja.JinjaError => d
      }
    val propDescriptions: Map[String, (String, Map[String, String])] =
      projects.flatMap(_.properties).flatMap { props =>
        Yaml.dig(props, "models").toSeq.flatMap {
          case ms: Seq[_] => ms.collect { case m: Map[_, _] =>
            val mm = m.asInstanceOf[Map[String, Any]]
            val desc = Yaml.dig(mm, "description").map(Yaml.str)
              .map(renderDesc).getOrElse("")
            val cols = Yaml.dig(mm, "columns").toSeq.flatMap {
              case cs: Seq[_] => cs.collect { case c: Map[_, _] =>
                val cm = c.asInstanceOf[Map[String, Any]]
                Yaml.dig(cm, "description")
                  .map(d => Yaml.str(cm("name")) -> renderDesc(Yaml.str(d)))
              }.flatten
              case _ => Nil
            }.toMap
            Yaml.str(mm("name")) -> ((desc, cols))
          }
          case _ => Nil
        }
      }.toMap

    // --- models (per package) -----------------------------------------
    // One builder serves both plain and versioned nodes: a version is a
    // plain model with its own unique_id suffix, `_v<N>` default alias,
    // and version/latest_version surfaced in config.extra (where the
    // `version:` selector method reads them).
    def buildModelNode(proj: Project, name: String, fileKey: String,
        raw: String, version: Option[String], latest: Option[String],
        versionCfg: Map[String, Any]): Node = {
      val (bindings, harvest) = DbtContext.parseContext(proj.vars, env, parseFlags)
      try Jinja.render(macroPrelude + raw, bindings)
      catch {
        case e: Jinja.JinjaError =>
          throw new IllegalArgumentException(s"model $name: ${e.msg}", e)
      }
      val h = harvest()
      val projCfg = projectTreeConfig(proj.modelConfigs,
        pathSegments(proj, fileKey))
      val versionExtras: Map[String, Any] = version match {
        case Some(v) => Map("version" -> v, "latest_version" -> latest.getOrElse(v))
        case None => Map.empty
      }
      val merged = projCfg ++ propConfigs.getOrElse(name, Map.empty) ++
        versionCfg ++ h.configs ++ versionExtras
      val cfg = toNodeConfig(merged)
        .copy(contractColumns = propColumns.getOrElse(name, Nil))
      val schema = cfg.schema.getOrElse(targetSchema)
      val ident = cfg.alias.getOrElse(version.fold(name)(v => s"${name}_v$v"))
      Node(
        uniqueId = version.fold(s"model.${proj.name}.$name")(v =>
          s"model.${proj.name}.$name.v$v"),
        name = name,
        packageName = proj.name,
        kind = NodeKind.Model,
        rawSql = raw,
        path = proj.modelFiles.getOrElse(fileKey, ""),
        config = cfg,
        dependsOn =
          h.refs.map { case (pk, n, v) =>
            protoResolved.refUniqueId(proj.name, pk, n, v) } ++
            h.sources.map { case (s, t) => s"source.$s.$t" } ++
            h.functions.map { case (pk, n) =>
              s"function.${pk.getOrElse(proj.name)}.$n" },
        relation = Some(Relation(schema, ident)),
        description = propDescriptions.get(name).map(_._1).getOrElse(""),
        columns = propDescriptions.get(name).map(_._2).getOrElse(Map.empty),
        checksum = graft.jinja.Json.md5(raw + Yaml.str(merged) +
          version.getOrElse("")))
    }
    val modelNodes = projects.flatMap { proj =>
      val backing = versionBackingFiles.getOrElse(proj.name, Set.empty)
      val plain = proj.models.view.filterKeys(!backing(_)).map {
        case (name, raw) =>
          buildModelNode(proj, name, name, raw, None, None, Map.empty)
      }
      val versioned = versionDecls.collect {
        case ((pkg, name), (latest, versions)) if pkg == proj.name =>
          versions.map { case (v, file, vcfg) =>
            val raw = proj.models.getOrElse(file,
              throw new IllegalArgumentException(
                s"versioned model $name v$v: no model file '$file'"))
            buildModelNode(proj, name, file, raw, Some(v), Some(latest), vcfg)
          }
      }.flatten
      plain ++ versioned
    }

    // --- seeds --------------------------------------------------------
    val seedNodes = projects.flatMap { proj =>
      proj.seeds.map { case (name, csvPath) =>
        val cfg = toNodeConfig(
          projectTreeConfig(proj.seedConfigs, Seq(proj.name)) ++
            propConfigs.getOrElse(name, Map.empty))
        Node(
          uniqueId = s"seed.${proj.name}.$name",
          name = name,
          packageName = proj.name,
          kind = NodeKind.Seed,
          path = csvPath,
          config = cfg.copy(materialized = "seed"),
          relation = Some(Relation(cfg.schema.getOrElse(targetSchema),
            cfg.alias.getOrElse(name))))
      }
    }

    // --- snapshots (config block inside the body) ---------------------
    val snapshotNodes = projects.flatMap { proj =>
      proj.snapshots.map { case (name, raw) =>
        val (bindings, harvest) = DbtContext.parseContext(proj.vars, env, parseFlags)
        Jinja.render(macroPrelude + raw, bindings)
        val h = harvest()
        val merged = propConfigs.getOrElse(name, Map.empty) ++ h.configs
        val cfg0 = toNodeConfig(merged)
        val snapCfg = SnapshotConfig(
          strategy = Yaml.dig(merged, "strategy").map(Yaml.str).getOrElse("timestamp"),
          uniqueKey = Yaml.dig(merged, "unique_key").map(Yaml.strSeq).getOrElse(Nil),
          updatedAt = Yaml.dig(merged, "updated_at").map(Yaml.str),
          checkCols = Yaml.dig(merged, "check_cols").map {
            case "all" => None
            case v => Some(Yaml.strSeq(v))
          }.getOrElse(Some(Nil)).filter(_.nonEmpty),
          hardDeletes = Yaml.dig(merged, "hard_deletes").map(v => HardDeletes.parse(Yaml.str(v)))
            .getOrElse(HardDeletes.IgnoreDeletes),
          dbtValidToCurrent = Yaml.dig(merged, "dbt_valid_to_current").map(Yaml.str),
          metaColumnNames = Yaml.dig(merged, "snapshot_meta_column_names")
            .map(_.asInstanceOf[Map[String, Any]]
              .map { case (k, v) => k -> Yaml.str(v) }).getOrElse(Map.empty))
        Node(
          uniqueId = s"snapshot.${proj.name}.$name",
          name = name,
          packageName = proj.name,
          kind = NodeKind.Snapshot,
          rawSql = raw,
          config = cfg0.copy(materialized = "snapshot", snapshot = Some(snapCfg)),
          dependsOn =
            h.refs.map { case (pk, n, v) =>
              protoResolved.refUniqueId(proj.name, pk, n, v) } ++
              h.sources.map { case (s, t) => s"source.$s.$t" } ++
              h.functions.map { case (pk, n) =>
                s"function.${pk.getOrElse(proj.name)}.$n" },
          relation = Some(Relation(cfg0.schema.getOrElse(targetSchema),
            cfg0.alias.getOrElse(name))))
      }
    }

    // --- generic tests from properties --------------------------------
    // models, seeds, and snapshots share the entry shape; each section's
    // tests bind to their own uid kind. Source-table tests nest one level
    // deeper (sources → tables → columns) and bind to source.<s>.<t>.
    def columnTests(proj: Project, entry: Map[String, Any], label: String,
        subjectUid: Option[String]): Seq[Node] =
      Yaml.dig(entry, "columns").toSeq.flatMap {
        case cols: Seq[_] => cols.collect { case c: Map[_, _] =>
          val cm = c.asInstanceOf[Map[String, Any]]
          val colName = Yaml.str(cm("name"))
          (Yaml.dig(cm, "tests").orElse(Yaml.dig(cm, "data_tests")).toSeq).flatMap {
            case ts: Seq[_] => ts.map { t =>
              buildTestNode(proj.name, label, colName, t, targetSchema,
                subjectUid)
            }
            case _ => Nil
          }
        }.flatten
        case _ => Nil
      }
    def sectionTests(key: String, uidPrefix: Option[String]): Seq[Node] =
      projects.flatMap { proj =>
        proj.properties.flatMap { props =>
          Yaml.dig(props, key).toSeq.flatMap {
            case ms: Seq[_] => ms.collect { case m: Map[_, _] =>
              val mm = m.asInstanceOf[Map[String, Any]]
              val name = Yaml.str(mm("name"))
              columnTests(proj, mm, name,
                uidPrefix.map(p => s"$p.${proj.name}.$name"))
            }.flatten
            case _ => Nil
          }
        }
      }
    val sourceTestNodes: Seq[Node] = projects.flatMap { proj =>
      proj.properties.flatMap { props =>
        Yaml.dig(props, "sources").toSeq.flatMap {
          case ss: Seq[_] => ss.collect { case s0: Map[_, _] =>
            val sm = s0.asInstanceOf[Map[String, Any]]
            val srcName = Yaml.str(sm("name"))
            Yaml.dig(sm, "tables").toSeq.flatMap {
              case tbls: Seq[_] => tbls.collect { case tb: Map[_, _] =>
                val tm = tb.asInstanceOf[Map[String, Any]]
                val tblName = Yaml.str(tm("name"))
                columnTests(proj, tm, s"${srcName}_$tblName",
                  Some(s"source.$srcName.$tblName"))
              }.flatten
              case _ => Nil
            }
          }.flatten
          case _ => Nil
        }
      }
    }
    val testNodes = sectionTests("models", None) ++
      sectionTests("seeds", Some("seed")) ++
      sectionTests("snapshots", Some("snapshot")) ++ sourceTestNodes

    // --- singular tests: .sql files under test-paths select failing rows
    val singularTestNodes = projects.flatMap { proj =>
      proj.tests.map { case (name, raw) =>
        val (bindings, harvest) = DbtContext.parseContext(proj.vars, env, parseFlags)
        try Jinja.render(macroPrelude + raw, bindings)
        catch {
          case e: Jinja.JinjaError =>
            throw new IllegalArgumentException(s"test $name: ${e.msg}", e)
        }
        val h = harvest()
        val cfg = toNodeConfig(h.configs).copy(materialized = "test",
          severity = Yaml.dig(h.configs, "severity").map(v => Severity.parse(Yaml.str(v)))
            .getOrElse(Severity.Error))
        Node(
          uniqueId = s"test.${proj.name}.$name",
          name = name,
          packageName = proj.name,
          kind = NodeKind.Test,
          rawSql = raw,
          config = cfg,
          dependsOn =
            h.refs.map { case (pk, n, v) =>
              protoResolved.refUniqueId(proj.name, pk, n, v) } ++
              h.sources.map { case (s, t) => s"source.$s.$t" } ++
              h.functions.map { case (pk, n) =>
                s"function.${pk.getOrElse(proj.name)}.$n" },
          relation = Some(Relation(targetSchema + "_failures", name)),
          columns = Map("test_kind" -> "singular"))
      }
    }

    // --- YAML unit tests (reference: DbtUnitTest nodes.rs; unit_tests:
    // properties block — model under test, given fixtures keyed by the
    // ref()/source() they replace, expected rows, optional overrides) ----
    val unitTestNodes = projects.flatMap { proj =>
      proj.properties.flatMap { props =>
        Yaml.dig(props, "unit_tests").toSeq.flatMap {
          case uts: Seq[_] => uts.collect { case u: Map[_, _] =>
            val um = u.asInstanceOf[Map[String, Any]]
            val name = Yaml.str(um("name"))
            val model = Yaml.str(um("model"))
            val modelUid = protoResolved.refUniqueId(proj.name, None, model)
            // fixture rows: dict rows directly, csv text → string-row maps
            // (typed against the input's real schema at run time)
            def rowsOf(m: Map[String, Any]): Seq[Map[String, Any]] =
              (Yaml.str(m.getOrElse("format", "dict")), m.get("rows")) match {
                case ("csv", Some(text: String)) =>
                  val lines = text.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
                  val header = graft.mat.UnitTestMat.splitCsvLine(lines.head)
                  lines.tail.map(l => header.zip(graft.mat.UnitTestMat.splitCsvLine(l))
                    .collect { case (k, v) if v.nonEmpty => k -> (v: Any) }.toMap)
                case (_, Some(rows: Seq[_])) =>
                  rows.collect { case r: Map[_, _] => r.asInstanceOf[Map[String, Any]] }
                case _ => Nil
              }
            val given: Seq[(String, Seq[Map[String, Any]])] =
              Yaml.dig(um, "given").toSeq.flatMap {
                case gs: Seq[_] => gs.collect { case g: Map[_, _] =>
                  val gm = g.asInstanceOf[Map[String, Any]]
                  val input = Yaml.str(gm("input"))
                  // "ref('x')" → x ; "source('s','t')" → s.t
                  val key = refStrRe.findFirstMatchIn(input)
                    .map(m => Option(m.group(2)).getOrElse(m.group(1)))
                    .orElse(srcStrRe.findFirstMatchIn(input)
                      .map(m => s"${m.group(1)}.${m.group(2)}"))
                    .getOrElse(input)
                  key -> rowsOf(gm)
                }
                case _ => Nil
              }
            val expect = Yaml.dig(um, "expect")
              .collect { case m: Map[_, _] => rowsOf(m.asInstanceOf[Map[String, Any]]) }
              .getOrElse(Nil)
            val overrides = Yaml.dig(um, "overrides")
              .collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
              .getOrElse(Map.empty)
            val inputUids = given.map(_._1).map { k =>
              if (k.contains(".")) s"source.$k"
              else protoResolved.refUniqueId(proj.name, None, k)
            }
            // dbt build ordering: the unit test depends on the model's
            // PARENTS (edges added in the gating post-pass below — mocked
            // or not, un-mocked refs and fixture typing read the real
            // upstream relations), and the model gains an edge on the
            // unit test, so a failing unit test gates the model build
            // (dbt's unit-tests-before-model rule).
            Node(
              uniqueId = s"unit_test.${proj.name}.$name",
              name = name,
              packageName = proj.name,
              kind = NodeKind.UnitTest,
              config = NodeConfig(materialized = "unit",
                extra = Map("model" -> model, "model_uid" -> modelUid,
                  "overrides" -> overrides)),
              dependsOn = inputUids.distinct.filterNot(_ == modelUid),
              givenFixtures = given.toMap,
              expectRows = expect,
              columns = Map("test_kind" -> "unit"))
          }
          case _ => Nil
        }
      }
    }

    // --- analyses: compiled, never executed (nodes.rs:2100 DbtAnalysis) --
    val analysisNodes = projects.flatMap { proj =>
      proj.analyses.map { case (name, raw) =>
        val (bindings, harvest) = DbtContext.parseContext(proj.vars, env, parseFlags)
        Jinja.render(macroPrelude + raw, bindings)
        val h = harvest()
        Node(
          uniqueId = s"analysis.${proj.name}.$name",
          name = name,
          packageName = proj.name,
          kind = NodeKind.Analysis,
          rawSql = raw,
          dependsOn =
            h.refs.map { case (pk, n, v) =>
              protoResolved.refUniqueId(proj.name, pk, n, v) } ++
              h.sources.map { case (s, t) => s"source.$s.$t" },
          relation = Some(Relation(targetSchema, name)))
      }
    }

    // --- SQL UDF function nodes (reference: DbtFunction nodes.rs:3875,
    // resolve_functions.rs): a .sql body under function-paths + a
    // `functions:` properties entry declaring arguments/returns. The
    // node EXECUTES (CREATE OR REPLACE FUNCTION, FunctionMat); models
    // call it via {{ function('name') }}, which resolves to the created
    // function's qualified name and put the edge in depends_on. Only
    // scalar SQL functions are supported — aggregate/table kinds load
    // as parse-error nodes (structured run_results failure, reference
    // FunctionKind function_properties.rs:10-18). ---
    val functionNodes = projects.flatMap { proj =>
      val props: Map[String, Map[String, Any]] = proj.properties.flatMap {
        p => Yaml.dig(p, "functions").toSeq.flatMap {
          case fs: Seq[_] => fs.collect { case m: Map[_, _] =>
            val fm = m.asInstanceOf[Map[String, Any]]
            Yaml.str(fm("name")) -> fm
          }
          case _ => Nil
        }
      }.toMap
      proj.functions.map { case (name, raw) =>
        val (bindings, harvest) = DbtContext.parseContext(proj.vars, env, parseFlags)
        Jinja.render(macroPrelude + raw, bindings)
        val h = harvest()
        val fm = props.getOrElse(name, Map.empty)
        val fnKind = fm.get("type").map(Yaml.str).getOrElse("scalar")
        val returns = Yaml.dig(fm, "returns", "data_type").map(Yaml.str)
        val err =
          if (fnKind != "scalar") Some(
            s"function `$name` declares type `$fnKind` — only scalar " +
              "SQL functions are supported (aggregate/table UDFs need " +
              "adapter-native registration)")
          else if (returns.isEmpty) Some(
            s"function `$name` needs `returns: {data_type: ...}` in its " +
              "functions: properties entry")
          else None
        Node(
          uniqueId = s"function.${proj.name}.$name",
          name = name,
          packageName = proj.name,
          kind = NodeKind.Function,
          rawSql = raw,
          config = NodeConfig(materialized = "function", extra = fm),
          dependsOn =
            h.refs.map { case (pk, n, v) =>
              protoResolved.refUniqueId(proj.name, pk, n, v) } ++
              h.sources.map { case (s, t) => s"source.$s.$t" } ++
              h.functions.map { case (pk, n) =>
                s"function.${pk.getOrElse(proj.name)}.$n" },
          relation = Some(Relation(targetSchema, name)),
          description = fm.get("description").map(Yaml.str).getOrElse(""),
          checksum = graft.jinja.Json.md5(raw + Yaml.str(fm)),
          parseError = err)
      }
    }

    // --- exposures / metrics / semantic models: YAML-declared DAG leaves
    // (nodes.rs:2100; selector methods node_selector.rs:59-88). They never
    // execute; they give downstream-impact selection (+exposure:dash) and
    // documentation surface. refs/sources are harvested from any string
    // field ("ref('x')" in depends_on / model / expression entries). ---
    def declaredNodes(key: String, kind: NodeKind): Seq[Node] =
      projects.flatMap { proj =>
        proj.properties.flatMap { props =>
          Yaml.dig(props, key).toSeq.flatMap {
            case es: Seq[_] => es.collect { case e: Map[_, _] =>
              val em = e.asInstanceOf[Map[String, Any]]
              val name = Yaml.str(em("name"))
              // `config: {enabled: false}` (dbt's spelling for declared
              // nodes) or a bare `enabled:` key disables the node
              val enabled = Yaml.dig(em, "config", "enabled")
                .orElse(em.get("enabled"))
                .forall(v => Yaml.str(v).toBoolean)
              Node(
                uniqueId = s"${kind.name}.${proj.name}.$name",
                name = name,
                packageName = proj.name,
                kind = kind,
                dependsOn = harvestRefStrings(em, proj.name, protoResolved),
                config = NodeConfig(enabled = enabled, extra = em))
            }
            case _ => Nil
          }
        }
      }
    val exposureNodes = declaredNodes("exposures", NodeKind.Exposure)
    val metricNodes = declaredNodes("metrics", NodeKind.Metric)
    val semanticModelNodes = declaredNodes("semantic_models", NodeKind.SemanticModel)
    // saved queries (saved_query.rs:18-48) — same declaration-only shape;
    // refs harvested from metrics/exports string fields land them in the
    // DAG for +saved_query:<name> upstream-impact selection
    val savedQueryNodes = {
      val metricIds = metricNodes.map(n => n.name -> n.uniqueId).toMap
      declaredNodes("saved_queries", NodeKind.SavedQuery).map { n =>
        // query_params.metrics name the metric nodes this query reads
        // (saved_query.rs:41 SavedQueryParams) — resolve to DAG edges so
        // `+saved_query:x` walks through metrics to the backing models
        val metricDeps = Yaml.dig(n.config.extra, "query_params", "metrics")
          .toSeq.flatMap {
            case xs: Seq[_] => xs.map(Yaml.str).flatMap(metricIds.get)
            case _ => Nil
          }
        n.copy(dependsOn = (n.dependsOn ++ metricDeps).distinct)
      }
    }

    // Python models (reference funcs.rs:107 submit_python_job +
    // python_ast ref/source extraction): dbt.ref()/dbt.source() call
    // sites are harvested statically so the node takes its place in the
    // DAG like any SQL model. Execution goes through the PythonJob
    // bridge when an interpreter is configured
    // (spark.graft.pythonInterpreter / GRAFT_PYTHON); otherwise the node
    // reports a structured per-node error in run_results at run time.
    // one- and two-arg forms: dbt.ref('model') / dbt.ref('package', 'model')
    val pyRefRe = raw"""dbt\s*\.\s*ref\(\s*['"]([^'"]+)['"](?:\s*,\s*['"]([^'"]+)['"])?\s*\)""".r
    val pySrcRe =
      raw"""dbt\s*\.\s*source\(\s*['"]([^'"]+)['"]\s*,\s*['"]([^'"]+)['"]\s*\)""".r
    val pythonModelNodes = projects.flatMap { proj =>
      proj.pythonModels.map { case (name, path) =>
        val src =
          try java.nio.file.Files.readString(java.nio.file.Paths.get(path))
          catch { case _: Exception => "" }
        val refs = pyRefRe.findAllMatchIn(src)
          .map(m => (Option(m.group(2)) match {
            case Some(model) => Some(m.group(1)) -> model // ('pkg', 'model')
            case None => None -> m.group(1)               // ('model')
          })).toSeq.distinct
        val srcs = pySrcRe.findAllMatchIn(src)
          .map(m => (m.group(1), m.group(2))).toSeq.distinct
        // python models take dbt_project.yml tree configs and schema.yml
        // configs like any SQL model (tags, schema, alias, hooks, grants,
        // partition_by, docs); subdir segments come from the .py path
        val segments = {
          val rel = proj.modelPaths
            .map(mp => java.nio.file.Paths.get(proj.root, mp))
            .collectFirst {
              case mp if path.startsWith(mp.toString) =>
                mp.relativize(java.nio.file.Paths.get(path))
            }
          proj.name +: rel.toSeq.flatMap(p =>
            (0 until math.max(0, p.getNameCount - 1)).map(i => p.getName(i).toString))
        }
        val merged = projectTreeConfig(proj.modelConfigs, segments) ++
          propConfigs.getOrElse(name, Map.empty) ++
          Map("language" -> ("python": Any))
        // python models materialize as table or incremental (dbt's python
        // contract; view is impossible — there's no SQL body)
        val mat = merged.get("materialized").map(Yaml.str).getOrElse("table")
        if (mat != "table" && mat != "incremental")
          throw new IllegalArgumentException(
            s"python model $name: materialized '$mat' is not supported by " +
              "this adapter (table or incremental only)")
        if (mat == "incremental" && merged.get("incremental_strategy")
            .map(Yaml.str).contains("microbatch"))
          throw new IllegalArgumentException(
            s"python model $name: the microbatch strategy needs per-batch " +
              "SQL compilation and is not supported for python models")
        val cfg = toNodeConfig(merged + ("materialized" -> (mat: Any)))
        Node(
          uniqueId = s"model.${proj.name}.$name",
          name = name,
          packageName = proj.name,
          kind = NodeKind.Model,
          rawSql = src,
          path = path,
          config = cfg,
          dependsOn =
            (refs.map { case (pkg, n) =>
              protoResolved.refUniqueId(proj.name, pkg, n, None) } ++
              srcs.map { case (s, t) => s"source.$s.$t" }).distinct,
          relation = Some(Relation(cfg.schema.getOrElse(targetSchema),
            cfg.alias.getOrElse(name))),
          description = propDescriptions.get(name).map(_._1).getOrElse(""),
          columns = propDescriptions.get(name).map(_._2).getOrElse(Map.empty),
          checksum = graft.jinja.Json.md5(src + Yaml.str(merged)))
      }
    }
    // dbt errors on duplicate model names: a project holding both foo.sql
    // and foo.py would otherwise collide on uniqueId and the later map
    // entry would silently replace the SQL model
    locally {
      val sqlIds = modelNodes.map(_.uniqueId).toSet
      val dups = pythonModelNodes.map(_.uniqueId).filter(sqlIds)
      if (dups.nonEmpty) throw new IllegalArgumentException(
        s"duplicate model name(s) — both a .sql and a .py file exist for: " +
          dups.sorted.mkString(", "))
    }

    val all0 = (modelNodes ++ pythonModelNodes ++ seedNodes ++ snapshotNodes ++
      testNodes ++ singularTestNodes ++ unitTestNodes ++ analysisNodes ++
      functionNodes ++
      exposureNodes ++ metricNodes ++ semanticModelNodes ++ savedQueryNodes)
      .map(n => n.uniqueId -> n).toMap
    // unit-test gating (dbt build rule): ut inherits the target model's
    // parent edges; the model depends on its unit tests — a failing unit
    // test skips the model build. `dbt run` filters UnitTest nodes out and
    // the DAG slice drops the edges, so plain runs are unaffected.
    val utByModel: Map[String, Seq[String]] = all0.values.toSeq
      .filter(_.kind == NodeKind.UnitTest)
      .flatMap(ut => ut.config.extra.get("model_uid")
        .map(m => m.toString -> ut.uniqueId))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // --- per-node macro dependency checksums (state:modified.macros) ----
    // dbt records depends_on.macros per node; here the call graph comes
    // from static analysis: each macro body and each node's raw SQL are
    // scanned for `name(` call sites of known macros, and the node's
    // checksum hashes the SOURCES of its transitive macro closure — so
    // editing a macro re-selects exactly the nodes it can recompile.
    val macroDefPat =
      raw"(?s)\{%-?\s*macro\s+([A-Za-z_][A-Za-z0-9_]*)\s*\(.*?\{%-?\s*endmacro\s*-?%\}".r
    val macroBodies: Map[String, String] = projects.flatMap(_.macroSources)
      .flatMap(src => macroDefPat.findAllMatchIn(src)
        .map(m => m.group(1) -> m.matched)).toMap
    val macroCallPats = macroBodies.keys.map(n => n ->
      java.util.regex.Pattern.compile(
        "\\b" + java.util.regex.Pattern.quote(n) + "\\s*\\(")).toMap
    def macroCallsIn(text: String): Set[String] =
      macroCallPats.collect { case (n, p) if p.matcher(text).find() => n }.toSet
    val macroEdges: Map[String, Set[String]] =
      macroBodies.map { case (n, body) => n -> (macroCallsIn(body) - n) }
    def macroChecksum(rawSql: String): String = {
      var used = macroCallsIn(rawSql)
      var frontier = used
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(macroEdges.getOrElse(_, Set.empty)) -- used
        used ++= next
        frontier = next
      }
      graft.jinja.Json.md5(used.toSeq.sorted.map(macroBodies).mkString("\n"))
    }

    val all = all0.map { case (id, n) =>
      val gated = n.kind match {
        case NodeKind.UnitTest =>
          val parents = n.config.extra.get("model_uid")
            .flatMap(m => all0.get(m.toString)).map(_.dependsOn).getOrElse(Nil)
          n.copy(dependsOn = (n.dependsOn ++ parents).distinct)
        case NodeKind.Model if utByModel.contains(id) =>
          n.copy(dependsOn = (n.dependsOn ++ utByModel(id)).distinct)
        case _ => n
      }
      id -> gated.copy(
        checksumBody = graft.jinja.Json.md5(gated.rawSql),
        checksumConfig = graft.jinja.Json.md5(gated.config.toString),
        checksumContract = graft.jinja.Json.md5(
          gated.config.contractEnforced.toString +
            gated.config.contractColumns.mkString("|")),
        checksumRelation = graft.jinja.Json.md5(
          gated.relation.map(_.fqn).getOrElse("")),
        checksumMacros = macroChecksum(gated.rawSql))
    }
    // --- disabled nodes (reference: resolver.rs:162-212 partitions every
    // resolve_* into enabled/disabled; manifest.rs:255 build_disabled_map):
    // `enabled: false` removes the node from the DAG entirely. Tests and
    // unit tests whose subject is disabled are auto-disabled with it (dbt
    // semantics); any OTHER enabled node depending on a disabled one is a
    // named parse error instead of a downstream "not found".
    val disabledSeed = all.filter { case (_, n) => !n.config.enabled }
    val disabled: Map[String, Node] =
      if (disabledSeed.isEmpty) disabledSeed
      else {
        var dis = disabledSeed
        var grew = true
        while (grew) {
          val more = all.filter { case (id, n) =>
            !dis.contains(id) &&
              (n.kind == NodeKind.Test || n.kind == NodeKind.UnitTest) &&
              (n.dependsOn.exists(dis.contains) ||
                // a unit test's subject lives in extra("model_uid"), not
                // dependsOn (its inputs are mocked away)
                n.config.extra.get("model_uid")
                  .exists(m => dis.contains(m.toString)))
          }
          grew = more.nonEmpty
          dis ++= more
        }
        dis
      }
    val enabledAll =
      if (disabled.isEmpty) all
      else (all -- disabled.keys).map { case (id, n) =>
        // model→test edges are engine scheduling gates — drop them when
        // the test was auto-disabled; a surviving edge onto any other
        // disabled node is the user's error
        val (gone, kept) = n.dependsOn.partition(disabled.contains)
        gone.map(disabled).find(d =>
            d.kind != NodeKind.Test && d.kind != NodeKind.UnitTest)
          .foreach { d =>
            throw new IllegalStateException(
              s"$id depends on ${d.uniqueId}, which is disabled " +
                "(enabled: false)")
          }
        id -> (if (gone.isEmpty) n else n.copy(dependsOn = kept))
      }
    checkRelationUniqueness(enabledAll)
    checkAccess(enabledAll)

    // --- groups (reference: DbtGroup; dbt Mesh ownership) ---------------
    val groups: Map[String, Map[String, Any]] =
      projects.flatMap(_.properties).flatMap { props =>
        Yaml.dig(props, "groups").toSeq.flatMap {
          case gs: Seq[_] => gs.collect { case g: Map[_, _] =>
            val gm = g.asInstanceOf[Map[String, Any]]
            Yaml.str(gm("name")) -> Map(
              "name" -> Yaml.str(gm("name")),
              "owner" -> Yaml.dig(gm, "owner").getOrElse(Map.empty))
          }
          case _ => Nil
        }
      }.toMap
    // validate group references WHEN the project declares groups (dbt
    // errors on unknown groups; projects that never declare any keep the
    // config as a free-form selector tag)
    if (groups.nonEmpty) enabledAll.values.foreach { n =>
      n.config.extra.get("group").map(String.valueOf).filter(_.nonEmpty)
        .foreach { g =>
          if (!groups.contains(g)) throw new IllegalStateException(
            s"${n.uniqueId}: unknown group '$g' (declared: ${groups.keys.toSeq.sorted.mkString(", ")})")
        }
    }

    Resolved(project, enabledAll, sources, modelOwners, sourceEventTimes,
      sourceFreshness, modelVersions, groups, disabled)
  }

  /** Model `access:` enforcement (reference: Access enum nodes.rs;
    * dbt Mesh semantics): a `private` model may only be referenced from
    * nodes in the SAME group; a `protected` model only from the same
    * package. Undeclared access (dbt's default) is not enforced — that
    * keeps ordinary cross-package refs working, exactly like dbt before
    * an access level is opted into. */
  private def checkAccess(all: Map[String, Node]): Unit = {
    def extraStr(n: Node, k: String): Option[String] =
      n.config.extra.get(k).map(String.valueOf).filter(_.nonEmpty)
    all.values.foreach { consumer =>
      consumer.dependsOn.flatMap(all.get).foreach { target =>
        extraStr(target, "access") match {
          case Some("private") =>
            val tg = extraStr(target, "group")
            if (extraStr(consumer, "group") != tg)
              throw new IllegalStateException(
                s"${consumer.uniqueId} cannot ref private model " +
                  s"${target.uniqueId} (group ${tg.getOrElse("<none>")})")
          case Some("protected") =>
            if (consumer.packageName != target.packageName)
              throw new IllegalStateException(
                s"${consumer.uniqueId} (package ${consumer.packageName}) " +
                  s"cannot ref protected model ${target.uniqueId} " +
                  s"(package ${target.packageName})")
          case _ => // public or undeclared
        }
      }
    }
  }

  private val refStrRe =
    raw"ref\(\s*'([^']+)'(?:\s*,\s*'([^']+)')?\s*\)".r
  private val srcStrRe =
    raw"source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)".r

  /** Harvest `ref('x')` / `ref('pkg','x')` / `source('s','t')` occurrences
    * from every string value in a YAML entry (depends_on lists, `model:`
    * fields, metric expressions). */
  private def harvestRefStrings(entry: Map[String, Any], pkg: String,
      resolved: Resolved): Seq[String] = {
    def strings(v: Any): Seq[String] = v match {
      case s: String => Seq(s)
      case xs: Seq[_] => xs.flatMap(strings)
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].values.toSeq.flatMap(strings)
      case _ => Nil
    }
    val texts = strings(entry)
    val refs = texts.flatMap(t => refStrRe.findAllMatchIn(t).map { m =>
      val (p, n) = if (m.group(2) != null) (Some(m.group(1)), m.group(2))
        else (None, m.group(1))
      resolved.refUniqueId(pkg, p, n)
    })
    val srcs = texts.flatMap(t => srcStrRe.findAllMatchIn(t).map(m =>
      s"source.${m.group(1)}.${m.group(2)}"))
    (refs ++ srcs).distinct
  }

  /** `unique`/`not_null`/`accepted_values`/`relationships` entries on a
    * column → test node (reference resolve_tests dir). */
  private def buildTestNode(pkg: String, model: String, column: String,
      spec: Any, targetSchema: String = "analytics",
      /** the tested node when it is NOT a model (source.<s>.<t>,
        * seed.<pkg>.<n>, snapshot.<pkg>.<n>) — `model` then carries the
        * NAME LABEL used in the test's own id. */
      subjectUid: Option[String] = None): Node = {
    val (testName, params) = spec match {
      case s: String => (s, Map.empty[String, Any])
      case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[String, Any]]
        val k = mm.keys.head
        (k, mm(k) match {
          case p: Map[_, _] => p.asInstanceOf[Map[String, Any]]
          case _ => Map.empty[String, Any]
        })
      case other => throw new IllegalArgumentException(s"bad test spec: $other")
    }
    val cfg0 = params.get("config").map(_.asInstanceOf[Map[String, Any]])
      .getOrElse(Map.empty)
    val cfg = toNodeConfig(cfg0).copy(
      materialized = "test",
      severity = (params.get("severity").orElse(cfg0.get("severity")))
        .map(v => Severity.parse(Yaml.str(v))).getOrElse(Severity.Error),
      where = (params.get("where").orElse(cfg0.get("where"))).map(Yaml.str),
      extra = params)
    Node(
      uniqueId = s"test.$pkg.${testName}_${model}_$column",
      name = s"${testName}_${model}_$column",
      packageName = pkg,
      kind = NodeKind.Test,
      rawSql = testName, // generic test id; params in config.extra
      config = cfg,
      dependsOn = Seq(subjectUid.getOrElse(s"model.$pkg.$model")) ++
        params.get("to").map(v => refToUniqueId(pkg, Yaml.str(v))).toSeq,
      relation = Some(Relation(targetSchema + "_failures",
        s"${testName}_${model}_$column")),
      columns = Map("column_name" -> column, "model" -> model,
        "subject_uid" -> subjectUid.getOrElse(s"model.$pkg.$model")))
  }

  private def refToUniqueId(pkg: String, refText: String): String = {
    // "ref('nation')" inside relationships `to:`
    val m = raw"ref\('([^']+)'\)".r
    refText match {
      case m(name) => s"model.$pkg.$name"
      case other => s"model.$pkg.$other"
    }
  }

  /** The config-tree path of a model: project name + subdirectories of its
    * file under the model path (dbt scopes dbt_project.yml configs by
    * directory). */
  private def pathSegments(project: Project, modelName: String): Seq[String] = {
    val file = project.modelFiles.getOrElse(modelName, "")
    val rel = project.modelPaths
      .map(mp => java.nio.file.Paths.get(project.root, mp))
      .collectFirst {
        case mp if file.startsWith(mp.toString) =>
          mp.relativize(java.nio.file.Paths.get(file))
      }
    val dirs = rel.toSeq.flatMap { p =>
      (0 until math.max(0, p.getNameCount - 1)).map(i => p.getName(i).toString)
    }
    project.name +: dirs
  }

  /** Walk the dbt_project.yml models: tree along the model's directory
    * path, collecting +key configs — outer scopes first so deeper (more
    * specific) settings win. */
  private[graft] def projectTreeConfig(tree: Map[String, Any],
      segments: Seq[String]): Map[String, Any] = {
    def plusKeys(t: Map[String, Any]): Map[String, Any] =
      t.collect { case (k, v) if k.startsWith("+") => k.drop(1) -> v }
    var acc = plusKeys(tree)
    var cur: Map[String, Any] = tree
    segments.foreach { seg =>
      cur.get(seg) match {
        case Some(sub: Map[_, _]) =>
          cur = sub.asInstanceOf[Map[String, Any]]
          acc = acc ++ plusKeys(cur)
        case _ =>
          cur = Map.empty
      }
    }
    acc
  }

  /** `grants:` config → privilege → grantee list, dbt's standardized
    * shape (reference: funcs.rs:406 standardize_grants_dict — lowercase
    * privileges, scalar grantees coerced to single-element lists). */
  def standardizeGrants(v: Any): Map[String, Seq[String]] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].map {
      case (priv, gs) => priv.toLowerCase -> (gs match {
        case xs: Seq[_] => xs.map(Yaml.str)
        case one => Seq(Yaml.str(one))
      })
    }.filter(_._2.nonEmpty)
    case other =>
      throw new IllegalArgumentException(s"grants must be a mapping, got: $other")
  }

  /** Dynamic config map → typed NodeConfig. */
  def toNodeConfig(m: Map[String, Any]): NodeConfig = {
    def s(k: String): Option[String] = m.get(k).map(Yaml.str)
    NodeConfig(
      materialized = s("materialized").getOrElse("view"),
      enabled = m.get("enabled").forall(v => Yaml.str(v).toBoolean),
      schema = s("schema"),
      alias = s("alias"),
      tags = m.get("tags").map(Yaml.strSeq).getOrElse(Nil),
      preHook = m.get("pre_hook").orElse(m.get("pre-hook")).map(Yaml.strSeq).getOrElse(Nil),
      postHook = m.get("post_hook").orElse(m.get("post-hook")).map(Yaml.strSeq).getOrElse(Nil),
      incrementalStrategy = s("incremental_strategy").map(IncrementalStrategy.parse),
      uniqueKey = m.get("unique_key").map(Yaml.strSeq).getOrElse(Nil),
      mergeUpdateColumns = m.get("merge_update_columns").map(Yaml.strSeq).getOrElse(Nil),
      mergeExcludeColumns = m.get("merge_exclude_columns").map(Yaml.strSeq).getOrElse(Nil),
      incrementalPredicates = m.get("incremental_predicates").map(Yaml.strSeq).getOrElse(Nil),
      onSchemaChange = s("on_schema_change").map(OnSchemaChange.parse)
        .getOrElse(OnSchemaChange.Ignore),
      fullRefresh = m.get("full_refresh").map(v => Yaml.str(v).toBoolean),
      eventTime = s("event_time"),
      batchSize = s("batch_size").map(BatchSize.parse),
      lookback = m.get("lookback").map(Yaml.str(_).toInt).getOrElse(1),
      concurrentBatches = m.get("concurrent_batches")
        .exists(v => Yaml.str(v).toBoolean),
      begin = s("begin"),
      partitionBy = m.get("partition_by").map(Yaml.strSeq).getOrElse(Nil),
      sortBy = m.get("sort_by").map(Yaml.strSeq).getOrElse(Nil),
      zorderBy = m.get("zorder_by").map(Yaml.strSeq).getOrElse(Nil),
      layoutCurve = s("layout_curve").getOrElse("morton"),
      fileFormat = s("file_format").getOrElse("parquet"),
      tblProperties = m.get("tblproperties")
        .map(_.asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> Yaml.str(v) }).getOrElse(Map.empty),
      clusteredBy = m.get("clustered_by").map(Yaml.strSeq).getOrElse(Nil),
      buckets = m.get("buckets").map(Yaml.str(_).toInt).getOrElse(0),
      grants = m.get("grants").map(standardizeGrants).getOrElse(Map.empty),
      columnTypes = m.get("column_types").map(_.asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> Yaml.str(v) }).getOrElse(Map.empty),
      quoteColumns = m.get("quote_columns").exists(v => Yaml.str(v).toBoolean),
      delimiter = s("delimiter"),
      contractEnforced = Yaml.dig(m, "contract", "enforced")
        .exists(v => Yaml.str(v).toBoolean),
      severity = s("severity").map(Severity.parse).getOrElse(Severity.Error),
      warnIf = s("warn_if").getOrElse("!= 0"),
      errorIf = s("error_if").getOrElse("!= 0"),
      failCalc = s("fail_calc").getOrElse("count(*)"),
      limit = m.get("limit").map(Yaml.str(_).toInt),
      where = s("where"),
      storeFailures = m.get("store_failures").exists(v => Yaml.str(v).toBoolean),
      storeFailuresAs = s("store_failures_as").map { v =>
        val k = v.toLowerCase
        if (!Set("ephemeral", "table", "view")(k))
          throw new IllegalArgumentException(
            s"store_failures_as must be ephemeral|table|view, got '$v' " +
              "(StoreFailuresAs common.rs:1007)")
        k
      },
      extra = m)
  }

  /** Two enabled nodes must not materialize into the same relation
    * (reference resolver.rs:788 check_relation_uniqueness). */
  private def checkRelationUniqueness(nodes: Map[String, Node]): Unit = {
    val clashes = nodes.values
      .filter(n => n.config.enabled && n.relation.isDefined &&
        n.kind != NodeKind.Test)
      .groupBy(_.relation.get.key)
      .filter(_._2.size > 1)
    if (clashes.nonEmpty)
      throw new IllegalStateException("relation uniqueness violated: " +
        clashes.map { case (k, ns) =>
          s"$k ← ${ns.map(_.uniqueId).mkString(", ")}"
        }.mkString("; "))
  }

}
