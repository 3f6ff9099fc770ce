package graft.jinja

import graft.adapter.{AgateTable, SparkAdapter}
import graft.core._
import Jinja._

import scala.collection.mutable

/** What parse-phase rendering harvested from a model body — the engine's
  * `SqlResource` equivalents (reference:
  * crates/dbt-jinja-utils/src/phases/parse/sql_resource.rs:12-36). */
final case class ParseHarvest(
    /** (package, name, version) — version from the `v=`/`version=` kwarg
      * of ref() (reference: versioned models, dbt-schemas nodes.rs
      * DbtModel version/latest_version). */
    refs: Seq[(Option[String], String, Option[String])],
    sources: Seq[(String, String)],
    configs: Map[String, Any],
    /** (package, name) from `{{ function('f') }}` call sites — SQL UDF
      * node references (reference: FunctionFunction,
      * crates/dbt-jinja-utils/src/phases/compile_and_run_context.rs:528). */
    functions: Seq[(Option[String], String)] = Nil)

/** dbt context functions for the two Jinja phases.
  *
  * Parse phase (execute=false — reference
  * crates/dbt-jinja-utils/src/phases/parse/): `ref`/`source` record
  * dependency edges and return placeholder names; `config()` collects the
  * inline config; `is_incremental()` is false.
  *
  * Run phase (reference run_node_context.rs:65-313): `ref`/`source` render
  * target relation FQNs (validated against depends_on like
  * compile_node_context.rs:190-205), `this`, `is_incremental`,
  * `statement`/`run_query` execute against the adapter, `store_result`/
  * `load_result` stash AgateTables, plus `exceptions`, `log`, `tojson`…
  */
object DbtContext {

  final class Exceptions extends JObject {
    def attr(name: String): Option[Any] = name match {
      case "raise_compiler_error" => Some(JFunc { (a, _) =>
        throw JinjaError(s"Compilation Error: ${a.headOption.getOrElse("")}")
      })
      case "raise_not_implemented" => Some(JFunc { (a, _) =>
        throw JinjaError(s"Not Implemented: ${a.headOption.getOrElse("")}")
      })
      case "warn" => Some(JFunc { (a, _) =>
        System.err.println(s"[warn] ${a.headOption.getOrElse("")}"); ""
      })
      case _ => None
    }
  }

  final class AgateObj(t: AgateTable) extends JObject {
    def attr(name: String): Option[Any] = name match {
      case "column_names" => Some(t.columnNames)
      case "column_types" => Some(t.columnTypes)
      case "rows" => Some(t.rows.map(_.toVector: Vector[Any]))
      case "dict_rows" => Some(t.dictRows)
      case "num_rows" => Some(t.numRows.toLong)
      case "columns" => Some(t.columnNames.map { n =>
        val i = t.columnNames.indexOf(n)
        Map("name" -> n, "values" -> JFunc((_, _) => t.rows.map(_(i))))
      })
      case "select" => Some(JFunc((a, _) =>
        new AgateObj(t.select(a.map(_.toString)))))
      case "rename" => Some(JFunc { (a, _) =>
        new AgateObj(t.rename(a.headOption.map(_.asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> v.toString }).getOrElse(Map.empty)))
      })
      case "print_table" => Some(JFunc((_, _) => t.printTable()))
      case _ => None
    }
  }

  /** Shared base bindings for both phases. */
  private def common(vars: Map[String, Any], env: Map[String, String],
      flags: Map[String, Any]): Map[String, Any] = Map(
    "var" -> JFunc { (a, _) =>
      val key = a.head.toString
      vars.getOrElse(key,
        if (a.length > 1) a(1)
        else throw JinjaError(s"Required var '$key' not found in config"))
    },
    "env_var" -> JFunc { (a, _) =>
      val key = a.head.toString
      env.getOrElse(key,
        if (a.length > 1) a(1)
        else throw JinjaError(s"Env var required but not provided: '$key'"))
    },
    "exceptions" -> new Exceptions,
    "log" -> JFunc { (a, kw) =>
      if (Jinja.truthy(kw.getOrElse("info", false)))
        System.err.println(s"[log] ${a.headOption.getOrElse("")}")
      ""
    },
    "print" -> JFunc { (a, _) => System.err.println(a.headOption.getOrElse("")); "" },
    // dbt's {{ return(v) }} — unwound at the nearest macro boundary
    "return" -> JFunc((a, _) => throw Jinja.ReturnValue(a.headOption.orNull)),
    "tojson" -> JFunc((a, _) => Json.write(a.head)),
    "fromjson" -> JFunc((a, _) => Json.parse(a.head.toString)),
    // JSON is valid YAML flow style, so toyaml reuses the JSON writer;
    // fromyaml parses dbt-config-shaped documents (base.rs toyaml/fromyaml)
    "toyaml" -> JFunc((a, _) => Json.write(a.head)),
    "fromyaml" -> JFunc((a, _) =>
      graft.project.Yaml.parseMap(a.head.toString)),
    "local_md5" -> JFunc((a, _) => Json.md5(a.head.toString)),
    "zip" -> JFunc { (a, _) =>
      val seqs = a.map(_.asInstanceOf[Seq[Any]])
      seqs.head.indices.takeWhile(i => seqs.forall(_.length > i))
        .map(i => seqs.map(_(i)).toVector).toVector
    },
    "zip_strict" -> JFunc { (a, _) =>
      val seqs = a.map(_.asInstanceOf[Seq[Any]])
      if (seqs.map(_.length).distinct.length > 1)
        throw JinjaError("zip_strict: unequal lengths")
      seqs.head.indices.map(i => seqs.map(_(i)).toVector).toVector
    },
    "set" -> JFunc((a, _) => a.head.asInstanceOf[Seq[Any]].distinct.toVector),
    "set_strict" -> JFunc((a, _) => a.head match {
      case s: Seq[_] => s.distinct.toVector
      case other => throw JinjaError(s"set_strict: not iterable: $other")
    }),
    // base.rs:535 diff_of_two_dicts: dicts of lists; per key (compared
    // case-insensitively), keep dict_a's elements absent from dict_b's
    // list (element compare also case-insensitive); drop emptied keys
    "diff_of_two_dicts" -> JFunc { (a, kw) =>
      def dict(v: Any): Map[String, Seq[String]] =
        v.asInstanceOf[Map[String, Any]].map { case (k, xs) =>
          k -> (xs match {
            case s: Seq[_] => s.map(x => String.valueOf(x))
            case one => Seq(String.valueOf(one))
          })
        }
      val d1 = dict(kw.getOrElse("dict_a", a(0)))
      val d2 = dict(kw.getOrElse("dict_b", a(1)))
      val d2Lower = d2.map { case (k, xs) =>
        k.toLowerCase -> xs.map(_.toLowerCase) }
      d1.flatMap { case (k, xs) =>
        d2Lower.get(k.toLowerCase) match {
          case None => Some(k -> xs.toVector)
          case Some(bVals) =>
            val diff = xs.filterNot(x => bVals.contains(x.toLowerCase))
            if (diff.isEmpty) None else Some(k -> diff.toVector)
        }
      }
    },
    "dbt_version" -> "2.0.0-graft",
    // a real datetime value (load/init.rs:37-51) — macros call
    // run_started_at.strftime(...); a flags entry (epoch ms) pins it,
    // else the context's construction time stands in
    "run_started_at" -> PyModules.PyDateTime(
      flags.get("run_started_at_ms").map(v => String.valueOf(v).toLong)
        .getOrElse(System.currentTimeMillis())),
    "invocation_id" -> flags.getOrElse("invocation_id", "00000000-0000-0000-0000-000000000000"),
    "flags" -> flags,
    "target" -> Map(
      "name" -> flags.getOrElse("target_name", "dev"),
      "type" -> "spark",
      "schema" -> flags.getOrElse("schema", "analytics"),
      "threads" -> flags.getOrElse("threads", 4L)),
    // python-stdlib-shaped modules.datetime / modules.pytz / modules.re
    // (minijinja-contrib/src/modules — the dbt surface macros lean on)
    "modules" -> PyModules.modules
  )

  /** Parse-phase context: renders with side-effect collectors. */
  def parseContext(vars: Map[String, Any] = Map.empty,
      env: Map[String, String] = sys.env,
      flags: Map[String, Any] = Map.empty):
      (Map[String, Any], () => ParseHarvest) = {
    val refs = mutable.ArrayBuffer.empty[(Option[String], String, Option[String])]
    val sources = mutable.ArrayBuffer.empty[(String, String)]
    val functions = mutable.ArrayBuffer.empty[(Option[String], String)]
    val configs = mutable.LinkedHashMap.empty[String, Any]
    val bindings = common(vars, env, flags) ++ Map(
      // {{ function('f') }} / {{ function('pkg', 'f') }} — SQL UDF node
      // reference (compile_and_run_context.rs FunctionFunction): parse
      // phase harvests the dependency; the placeholder keeps the body
      // renderable (the run phase substitutes the real qualified name)
      "function" -> JFunc { (a, _) =>
        val (pkg, name) = a.map(_.toString) match {
          case Seq(n) => (None, n)
          case Seq(p, n) => (Some(p), n)
          case _ => throw JinjaError("function() takes 1 or 2 args")
        }
        functions += ((pkg, name))
        s"__function__${name}__"
      },
      "ref" -> JFunc { (a, kw) =>
        val (pkg, name) = a.map(_.toString) match {
          case Seq(n) => (None, n)
          case Seq(p, n) => (Some(p), n)
          case _ => throw JinjaError("ref() takes 1 or 2 args")
        }
        refs += ((pkg, name, refVersion(kw)))
        s"__ref__${name}__"
      },
      "source" -> JFunc { (a, _) =>
        val Seq(src, tbl) = a.map(_.toString)
        sources += ((src, tbl))
        s"__source__${src}__${tbl}__"
      },
      "this" -> "__this__",
      "is_incremental" -> JFunc((_, _) => false),
      "execute" -> false,
      // parse sees an EMPTY flat graph (the reference binds UNDEFINED,
      // resolve_model_context.rs:290) — graph-driven codegen loops render
      // to nothing at parse; `-- depends_on: {{ ref(...) }}` hints carry
      // the DAG edges, exactly dbt's documented contract
      "graph" -> Map(
        "nodes" -> Map.empty[String, Any],
        "sources" -> Map.empty[String, Any],
        "exposures" -> Map.empty[String, Any],
        "metrics" -> Map.empty[String, Any],
        "groups" -> Map.empty[String, Any],
        "semantic_models" -> Map.empty[String, Any],
        "saved_queries" -> Map.empty[String, Any]),
      "run_query" -> JFunc((_, _) => new AgateObj(AgateTable.empty)),
      "statement" -> JFunc((_, _) => ""),
      // parse-phase adapter: no warehouse, but dispatch must still resolve
      // (models render at parse time to harvest refs/configs, and their
      // macros may route through adapter.dispatch)
      "adapter" -> new JObject {
        def attr(n: String): Option[Any] = n match {
          case "dispatch" => Some(JFunc { (a, _) =>
            val name = a.headOption.map(_.toString).getOrElse("")
            JCtxFunc { (ctx, args, kwargs) =>
              Seq(s"spark__$name", s"default__$name").iterator.map(ctx.get)
                .collectFirst { case Some(f: JFunc) => f }
                .map(_(args, kwargs)).getOrElse("")
            }
          })
          case "quote" => Some(JFunc((a, _) => s"`${a.head}`"))
          case "type" => Some(JFunc((_, _) => "spark"))
          case _ => None
        }
      }
    )
    // config(...) is also callable directly: {{ config(materialized='table') }}
    val configHybrid = new ConfigHybrid(
      JFunc { (_, kw) => kw.foreach { case (k, v) => configs(k) = v }; "" }, configs)
    (bindings + ("config" -> configHybrid),
      () => ParseHarvest(refs.toSeq, sources.toSeq, configs.toMap,
        functions.toSeq))
  }

  /** config is both callable ({{ config(k=v) }}) and an object
    * (config.get('k')) — model Jinja uses both forms. */
  final class ConfigHybrid(call: JFunc, store: mutable.Map[String, Any])
      extends JObject with JCallable {
    def invoke(args: Seq[Any], kwargs: Map[String, Any]): Any = call(args, kwargs)
    def attr(name: String): Option[Any] = name match {
      case "get" => Some(JFunc { (a, kw) =>
        store.get(a.head.toString).orElse(a.lift(1)).orElse(kw.get("default")).orNull
      })
      case "require" => Some(JFunc { (a, _) =>
        store.getOrElse(a.head.toString,
          throw JinjaError(s"config '${a.head}' required"))
      })
      case _ => None
    }
  }

  /** `v=` / `version=` kwarg of ref(), normalized: dbt accepts int or
    * string versions; "2" and 2 name the same version. */
  private def refVersion(kw: Map[String, Any]): Option[String] =
    kw.get("v").orElse(kw.get("version")).map(String.valueOf)

  /** Run-phase context. `resolveRef` maps a (package, name, version) to
    * the rendered relation text (FQN or CTE name); throws on undeclared
    * edges. */
  def runContext(
      adapter: SparkAdapter,
      thisRel: Relation,
      resolveRef: (Option[String], String, Option[String]) => String,
      resolveSource: (String, String) => String,
      isIncremental: Boolean,
      configValues: Map[String, Any],
      vars: Map[String, Any] = Map.empty,
      env: Map[String, String] = sys.env,
      flags: Map[String, Any] = Map.empty,
      /** `{{ function('f') }}` → the created SQL UDF's qualified name
        * (Runner wires dependency validation in; the default suffices
        * for contexts with no function nodes: hooks, run-operation). */
      resolveFunction: (Option[String], String) => String =
        (_, n) => n,
      /** The flat `graph` introspection variable (build_flat_graph
        * functions/base.rs:1243) — passed lazily so contexts that never
        * touch it pay nothing (the reference's LazyFlatGraph). */
      graph: () => Map[String, Any] = () => Map.empty): Map[String, Any] = {
    val results = mutable.Map.empty[String, AgateObj]
    val store = mutable.LinkedHashMap.empty[String, Any] ++ configValues
    val lazyGraph = new JObject {
      private lazy val g = graph()
      def attr(n: String): Option[Any] = g.get(n)
      override def toString: String = "<graph>"
    }
    common(vars, env, flags) ++ Map(
      "graph" -> lazyGraph,
      "ref" -> JFunc { (a, kw) =>
        a.map(_.toString) match {
          case Seq(n) => resolveRef(None, n, refVersion(kw))
          case Seq(p, n) => resolveRef(Some(p), n, refVersion(kw))
          case _ => throw JinjaError("ref() takes 1 or 2 args")
        }
      },
      "source" -> JFunc { (a, _) =>
        val Seq(src, tbl) = a.map(_.toString)
        resolveSource(src, tbl)
      },
      "function" -> JFunc { (a, _) =>
        a.map(_.toString) match {
          case Seq(n) => resolveFunction(None, n)
          case Seq(p, n) => resolveFunction(Some(p), n)
          case _ => throw JinjaError("function() takes 1 or 2 args")
        }
      },
      "config" -> new ConfigHybrid(JFunc((_, kw) => {
        kw.foreach { case (k, v) => store(k) = v }; ""
      }), store),
      "this" -> new JObject {
        override def toString: String = thisRel.fqn
        def attr(n: String): Option[Any] = n match {
          case "schema" => Some(thisRel.schema)
          case "identifier" | "name" | "table" => Some(thisRel.identifier)
          case "database" => Some(thisRel.database.orNull)
          case "is_table" => Some(thisRel.isTable)
          case "is_view" => Some(thisRel.isView)
          case _ => None
        }
      },
      "is_incremental" -> JFunc((_, _) => isIncremental),
      "execute" -> true,
      "run_query" -> JFunc { (a, _) =>
        val (_, table) = adapter.execute(a.head.toString)
        new AgateObj(table)
      },
      "statement" -> JFunc { (a, kw) =>
        val name = a.headOption.map(_.toString).getOrElse("main")
        // SQL text comes either inline (statement('main', sql)) or from a
        // {% call statement('main') %}…{% endcall %} block's caller()
        val sql = a.lift(1).map(_.toString)
          .orElse(kw.get("caller").collect {
            case c: JFunc => c(Nil, Map.empty).toString
          })
          .getOrElse(throw JinjaError(
            "statement(name, sql) needs sql text or a call block"))
        val (_, table) = adapter.execute(sql)
        results(name) = new AgateObj(table)
        ""
      },
      "store_result" -> JFunc { (a, kw) =>
        results(a.head.toString) = new AgateObj(AgateTable.empty); ""
      },
      "load_result" -> JFunc { (a, _) =>
        results.get(a.head.toString).map(t => Map(
          "table" -> t, "data" -> t.attr("rows").orNull,
          "response" -> "OK")).orNull
      },
      "adapter" -> new AdapterObj(adapter)
    )
  }

  /** `adapter.*` surface exposed to Jinja (reference funcs.rs match table —
    * the operations materializations and user macros actually call). */
  final class AdapterObj(adapter: SparkAdapter) extends JObject {
    def attr(name: String): Option[Any] = name match {
      case "get_relation" => Some(JFunc { (a, kw) =>
        val schema = kw.get("schema").map(_.toString)
          .orElse(a.lift(1).map(_.toString)).getOrElse("")
        val ident = kw.get("identifier").map(_.toString)
          .orElse(a.lift(2).map(_.toString)).getOrElse("")
        adapter.getRelation(schema, ident).map(_.fqn).orNull
      })
      case "get_columns_in_relation" => Some(JFunc { (a, _) =>
        // takes an FQN string here
        adapter.spark.table(a.head.toString).schema.fields.toVector.map(f =>
          Map("name" -> f.name, "dtype" -> f.dataType.sql, "data_type" -> f.dataType.sql))
      })
      case "quote" => Some(JFunc((a, _) => adapter.quote(a.head.toString)))
      case "execute" => Some(JFunc { (a, _) =>
        val (status, t) = adapter.execute(a.head.toString)
        Vector(status, new AgateObj(t))
      })
      case "create_schema" => Some(JFunc { (a, _) =>
        adapter.createSchema(a.head.toString); ""
      })
      case "drop_schema" => Some(JFunc { (a, _) =>
        adapter.dropSchema(a.head.toString); ""
      })
      case "list_schemas" => Some(JFunc((_, _) => adapter.listSchemas().toVector))
      case "check_schema_exists" => Some(JFunc((a, _) =>
        adapter.checkSchemaExists(a.head.toString)))
      case "valid_incremental_strategies" => Some(JFunc((_, _) =>
        adapter.validIncrementalStrategies.toVector))
      case "standardize_grants_dict" => Some(JFunc { (a, _) =>
        // reference funcs.rs:406 — AgateTable (or a raw dict) to the
        // canonical privilege → [grantees] shape apply_grants macros use
        a.headOption match {
          case Some(t: AgateObj) =>
            val rows = t.attr("dict_rows").map(_.asInstanceOf[Seq[Map[String, Any]]])
              .getOrElse(Nil)
            rows.groupBy(r => r.getOrElse("privilege", "").toString.toLowerCase)
              .filter(_._1.nonEmpty)
              .map { case (p, rs) =>
                p -> rs.map(_.getOrElse("grantee", "").toString).filter(_.nonEmpty).toVector
              }
          case Some(m: Map[_, _]) =>
            graft.resolve.Resolver.standardizeGrants(m)
          case _ => Map.empty[String, Any]
        }
      })
      case "dispatch" => Some(JFunc { (a, kw) =>
        // reference: dispatch_object.rs:320-334 + get_adapter_prefixes —
        // resolve `<adapter>__name` → `default__name`. Our macro namespace
        // is flat (prelude renders packages-then-root so Root locality wins
        // on collision, matching MacroLocality precedence); the
        // macro_namespace argument therefore only documents intent.
        val name = a.headOption.map(_.toString).getOrElse(
          throw JinjaError("dispatch(macro_name[, macro_namespace])"))
        JCtxFunc { (ctx, args, kwargs) =>
          val candidates = Seq(s"spark__$name", s"default__$name")
          candidates.iterator.map(ctx.get).collectFirst {
            case Some(f: JFunc) => f
          }.getOrElse(throw JinjaError(
            s"dispatch: no macro for '$name' (tried ${candidates.mkString(", ")})"))
            .apply(args, kwargs)
        }
      })
      case "compact" => Some(JFunc { (a, kw) =>
        // table compaction as a run-operation maintenance op (Delta
        // OPTIMIZE / Iceberg rewrite_data_files on plain parquet):
        // adapter.compact(schema, identifier, partition_by=[...],
        // target_files=N) → [files_before, files_after]. Incremental
        // appends and streaming sinks accrete small files; at 100 TB
        // unbounded file counts dominate scan/listing cost.
        def usage = JinjaError(
          "compact(schema, identifier[, partition_by=[...], " +
            "target_files=N, sort_by=[...], zorder_by=[...], " +
            "layout_curve='morton'|'hilbert'])")
        val schema = kw.get("schema").map(_.toString)
          .orElse(a.lift(0).map(_.toString)).getOrElse(throw usage)
        val ident = kw.get("identifier").map(_.toString)
          .orElse(a.lift(1).map(_.toString)).getOrElse(throw usage)
        val parts = kw.get("partition_by").orElse(a.lift(2)) match {
          case Some(s: Seq[_]) => s.map(_.toString)
          case Some(other) => Seq(other.toString)
          case None => Nil
        }
        val tf = kw.get("target_files").orElse(a.lift(3))
          .map(_.toString.toInt).getOrElse(1)
        // write-time-only clustering layout the catalog cannot recover
        // (partition/bucket specs it CAN — those come from the catalog
        // inside compact): a sorted or zordered model compacted without
        // naming its layout would be silently rewritten unclustered,
        // breaking min/max skipping with no error. Callers pass the
        // model's own sort_by/zorder_by through.
        def strList(key: String): Seq[String] = kw.get(key) match {
          case Some(s: Seq[_]) => s.map(_.toString)
          case Some(other) => Seq(other.toString)
          case None => Nil
        }
        val (before, after) = adapter.compact(
          graft.core.Relation(schema, ident), parts, tf,
          sortBy = strList("sort_by"), zorderBy = strList("zorder_by"),
          layoutCurve = kw.get("layout_curve").map(_.toString)
            .getOrElse("morton"))
        Vector(before, after)
      })
      case "type" => Some(JFunc((_, _) => "spark"))
      case _ => None
    }
  }
}
