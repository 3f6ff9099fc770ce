package graft.resolve

import graft.core.{Node, NodeKind}
import graft.project.Yaml

/** Node-selection DSL (reference: parse_single_selector,
  * crates/dbt-common/src/node_selector.rs:350-478; methods `MethodName`
  * :59-88; YAML selectors crates/dbt-selector-parser/src/parser.rs).
  *
  * Grammar (same as dbt):
  *   spec      := union
  *   union     := intersection (' ' intersection)*          — space = OR
  *   intersect := atom (',' atom)*                          — comma = AND
  *   atom      := [N]['+'] method-or-name ['+' [N]] | '@'name
  *   method    := fqn: | tag: | path: | package: | config.materialized: |
  *                resource_type: | source: | test_type: | test_name: |
  *                unit_test: | access: | function: | saved_query: |
  *                group: | version: | result: | state:modified | state:new |
  *                source_status:fresher
  *   (column: is recognized but rejected with a named reason —
  *   internal-only in the reference)
  *
  * selectors.yml definitions (parser.rs:100-862) compose the same atoms as
  * nested `union:` / `intersection:` lists with `exclude:` entries and
  * `method:`/`value:` dicts; [[fromYamlDefinition]] maps them onto this
  * Spec algebra (exclude → [[Difference]]).
  */
object Selector {

  sealed trait Spec
  final case class Atom(
      raw: String,
      parentsDepth: Option[Int], // Some(MaxValue) for bare '+'
      childrenDepth: Option[Int],
      atOperator: Boolean,
      /** per-criterion `indirect_selection:` override from selectors.yml
        * (parser.rs:151-205) — wins over the invocation default. */
      indirect: Option[String] = None) extends Spec
  final case class Union(specs: Seq[Spec]) extends Spec
  final case class Intersection(specs: Seq[Spec]) extends Spec
  /** `exclude:` inside a YAML definition (parser.rs:240): select `base`,
    * subtract `exclude`. */
  final case class Difference(base: Spec, exclude: Spec) extends Spec

  def parse(s: String): Spec = {
    val unions = s.trim.split("\\s+").filter(_.nonEmpty).toSeq.map { part =>
      val inters = part.split(",").toSeq.map(parseAtom)
      if (inters.length == 1) inters.head else Intersection(inters)
    }
    if (unions.length == 1) unions.head else Union(unions)
  }

  private val atomRe = raw"^(?:(\d*)(\+))?(@)?(.+?)(?:(\+)(\d*))?$$".r

  private[resolve] def parseAtom(s: String): Atom = s match {
    case atomRe(pn, pplus, at, core, cplus, cn) =>
      Atom(
        raw = core,
        parentsDepth = Option(pplus).map(_ =>
          if (pn != null && pn.nonEmpty) pn.toInt else Int.MaxValue),
        childrenDepth = Option(cplus).map(_ =>
          if (cn != null && cn.nonEmpty) cn.toInt else Int.MaxValue),
        atOperator = at != null)
    case other => Atom(other, None, None, atOperator = false)
  }

  // ---- selectors.yml ------------------------------------------------------

  /** Parse the `selectors:` document → name → Spec, plus the default
    * selector name if one is flagged (parser.rs:60-99). */
  def parseSelectorsYaml(doc: Map[String, Any]): (Map[String, Spec], Option[String]) = {
    val entries = Yaml.dig(doc, "selectors").toSeq.flatMap {
      case ss: Seq[_] => ss.collect { case m: Map[_, _] =>
        val sm = m.asInstanceOf[Map[String, Any]]
        val name = Yaml.str(sm("name"))
        val isDefault = sm.get("default").exists(v => Yaml.str(v).toBoolean)
        (name, fromYamlDefinition(sm("definition")), isDefault)
      }
      case _ => Nil
    }
    (entries.map(e => e._1 -> e._2).toMap,
      entries.collectFirst { case (n, _, true) => n })
  }

  /** One YAML definition → Spec. Accepts a bare selector string, a
    * method/value dict (with parents/children/…_depth modifiers), or
    * `union:` / `intersection:` lists whose entries may be `exclude:`
    * blocks (parser.rs:100-320). */
  def fromYamlDefinition(defn: Any): Spec = defn match {
    case s: String => parse(s)
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      (mm.get("union"), mm.get("intersection"), mm.get("method")) match {
        case (Some(items: Seq[_]), _, _) => composite(items, Union(_))
        case (_, Some(items: Seq[_]), _) => composite(items, Intersection(_))
        case (_, _, Some(method)) =>
          val value = mm.get("value").map(Yaml.str).getOrElse("")
          val core = Yaml.str(method) match {
            case "fqn" => value
            case m0 => s"$m0:$value"
          }
          def depth(flagKey: String, depthKey: String): Option[Int] =
            if (mm.get(flagKey).exists(v => Yaml.str(v).toBoolean))
              Some(mm.get(depthKey).map(Yaml.str(_).toInt).getOrElse(Int.MaxValue))
            else mm.get(depthKey).map(Yaml.str(_).toInt)
          Atom(core,
            parentsDepth = depth("parents", "parents_depth"),
            childrenDepth = depth("children", "children_depth"),
            atOperator = mm.get("childrens_parents").exists(v => Yaml.str(v).toBoolean),
            indirect = mm.get("indirect_selection").map(Yaml.str))
        case _ => throw new IllegalArgumentException(
          s"selector definition needs union/intersection/method: $mm")
      }
    case other => throw new IllegalArgumentException(
      s"unsupported selector definition: $other")
  }

  /** union/intersection items; `exclude:` entries subtract from the rest. */
  private def composite(items: Seq[_], build: Seq[Spec] => Spec): Spec = {
    val (excludes, includes) = items.partition {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].contains("exclude")
      case _ => false
    }
    val base = build(includes.map(fromYamlDefinition))
    val excluded = excludes.flatMap { case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]]("exclude") match {
        case xs: Seq[_] => xs.map(fromYamlDefinition)
        case x => Seq(fromYamlDefinition(x))
      }
    }
    if (excluded.isEmpty) base
    else Difference(base,
      if (excluded.length == 1) excluded.head else Union(excluded.toSeq))
  }

  /** dbt indirect selection (IndirectSelection node_selector.rs:49-55;
    * --indirect-selection): after an explicit selection, tests ATTACH to
    * it — `eager` (default) adds any data/unit test with at least one
    * selected parent, `cautious` only tests whose every parent is
    * selected, `buildable` tests whose every parent is selected OR an
    * ancestor of a selected node, `empty` adds none. A data test's
    * parents are its non-test depends_on nodes; a unit test's parent is
    * its subject model (extra model_uid — its inputs are mocked away). */
  def expandIndirect(selected: Set[String], nodes: Map[String, Node],
      graph: Dag.Graph, mode: String): Set[String] = {
    val isTest = (k: NodeKind) => k == NodeKind.Test || k == NodeKind.UnitTest
    mode match {
      case "empty" => selected
      case "eager" | "cautious" | "buildable" =>
        lazy val ancestry: Set[String] =
          selected ++ selected.flatMap(graph.upstream(_))
        def parents(n: Node): Seq[String] = n.kind match {
          case NodeKind.UnitTest =>
            n.config.extra.get("model_uid").map(_.toString).toSeq
          case _ => n.dependsOn.filter(d =>
            nodes.get(d).exists(p => !isTest(p.kind)))
        }
        selected ++ nodes.collect {
          case (id, n) if !selected(id) && isTest(n.kind) && {
            val ps = parents(n)
            ps.nonEmpty && (mode match {
              case "eager" => ps.exists(selected)
              case "cautious" => ps.forall(selected)
              case "buildable" => ps.forall(ancestry)
            })
          } => id
        }
      case other => throw new IllegalArgumentException(
        s"--indirect-selection must be eager|buildable|cautious|empty, " +
          s"got '$other' (IndirectSelection node_selector.rs:49-55)")
    }
  }

  // ---- evaluation ---------------------------------------------------------

  /** Evaluate a selector against the node set; returns selected ids.
    * `prevChecksums` drives state:modified (reference
    * schemas/prev_state/mod.rs); `prevResults` (unique id → last run
    * status) drives result:<status> (node_selector.rs:80). */
  def select(spec: Spec, nodes: Map[String, Node], graph: Dag.Graph,
      prevChecksums: Map[String, String] = Map.empty,
      prevResults: Map[String, String] = Map.empty,
      /** source_status:fresher — source uids whose current freshness
        * artifact shows a strictly newer max_loaded_at than the --state
        * copy; None when either artifact is missing (the method errors
        * naming what to run). */
      fresherSources: Option[Set[String]] = None,
      /** default indirect-selection mode, applied PER CRITERION before
        * set operations (dbt's evaluation order — so an exclude drops
        * its attached tests too); an Atom's own `indirect` wins. The
        * library default `empty` keeps direct calls pure — the Runner
        * passes dbt's `eager`. */
      indirect: String = "empty"): Set[String] = spec match {
    case Union(specs) =>
      specs.flatMap(select(_, nodes, graph, prevChecksums, prevResults,
        fresherSources, indirect)).toSet
    case Intersection(specs) =>
      specs.map(select(_, nodes, graph, prevChecksums, prevResults,
        fresherSources, indirect)).reduce(_ intersect _)
    case Difference(base, exclude) =>
      select(base, nodes, graph, prevChecksums, prevResults, fresherSources,
        indirect) --
        select(exclude, nodes, graph, prevChecksums, prevResults,
          fresherSources, indirect)
    case a: Atom =>
      val base = matchAtom(a.raw, nodes, prevChecksums, prevResults,
        fresherSources)
      val expanded =
        if (a.atOperator) base.flatMap(graph.atClosure)
        else {
          val up = a.parentsDepth
            .map(d => base.flatMap(graph.upstream(_, d))).getOrElse(Set.empty)
          val down = a.childrenDepth
            .map(d => base.flatMap(graph.downstream(_, d))).getOrElse(Set.empty)
          base ++ up ++ down
        }
      // graph closures may pull in source.* vertices — selection is nodes only
      expandIndirect(expanded.filter(nodes.contains), nodes, graph,
        a.indirect.getOrElse(indirect))
  }

  private def matchAtom(raw: String, nodes: Map[String, Node],
      prevChecksums: Map[String, String],
      prevResults: Map[String, String],
      fresherSources: Option[Set[String]] = None): Set[String] = {
    val (method, value) = raw.split(":", 2) match {
      case Array(m, v) => (m, v)
      case Array(v) => ("", v)
    }
    def glob(pattern: String, s: String): Boolean =
      java.util.regex.Pattern
        .compile(pattern.split("\\*", -1).map(java.util.regex.Pattern.quote)
          .mkString(".*"))
        .matcher(s).matches()
    def extraStr(n: Node, key: String): Option[String] =
      n.config.extra.get(key).map(Yaml.str)

    method match {
      case "" | "fqn" =>
        nodes.collect {
          case (id, n) if glob(value, n.name) || id == value => id
        }.toSet
      case "tag" =>
        nodes.collect { case (id, n) if n.config.tags.contains(value) => id }.toSet
      case "path" | "file" =>
        nodes.collect { case (id, n) if glob("*" + value + "*", n.path) => id }.toSet
      case "package" =>
        nodes.collect { case (id, n) if n.packageName == value => id }.toSet
      case "resource_type" =>
        nodes.collect { case (id, n) if n.kind.name == value => id }.toSet
      case "exposure" | "metric" | "semantic_model" | "saved_query" =>
        // match declaration nodes by name glob (node_selector.rs:66,68,72);
        // used as `+exposure:dash` for upstream-impact selection
        nodes.collect {
          case (id, n) if n.kind.name == method && glob(value, n.name) => id
        }.toSet
      case "unit_test" =>
        // unit-test nodes by name glob or exact unique id
        // (node_selector.rs:78 MethodName::UnitTest)
        nodes.collect {
          case (id, n) if n.kind == NodeKind.UnitTest &&
            (glob(value, n.name) || id == value) => id
        }.toSet
      case "function" =>
        // SQL-UDF function nodes by name glob (node_selector.rs:63)
        nodes.collect {
          case (id, n) if n.kind == NodeKind.Function &&
            (glob(value, n.name) || id == value) => id
        }.toSet
      case "test_name" =>
        // generic tests by the test macro that generated them —
        // `test_name:unique` selects every `unique` test in the project
        // (node_selector.rs:76 MethodName::TestName). The macro name is
        // recorded as the test node's rawSql (buildTestNode); singular
        // tests have no generating macro and never match.
        nodes.collect {
          case (id, n) if n.kind == NodeKind.Test &&
            !n.columns.get("test_kind").contains("singular") &&
            glob(value, n.rawSql) => id
        }.toSet
      case "access" =>
        // model `access:` property (node_selector.rs:60 MethodName::Access;
        // Access enum nodes.rs). `access:public` also matches here against
        // the config.extra the engine already enforces (Resolver access
        // gate). Undeclared access is dbt's `protected` default.
        nodes.collect {
          case (id, n) if n.kind == NodeKind.Model &&
            extraStr(n, "access").getOrElse("protected") == value => id
        }.toSet
      case "config.materialized" | "config" =>
        val v = value.stripPrefix("materialized:")
        nodes.collect { case (id, n) if n.config.materialized == v => id }.toSet
      case "source" =>
        nodes.collect {
          case (id, n) if n.dependsOn.exists(_.startsWith(s"source.$value")) => id
        }.toSet
      case "test_type" =>
        // singular tests are loaded with columns.test_kind=singular
        // (Resolver); everything else under Test is schema/generic
        nodes.collect {
          case (id, n) if n.kind == NodeKind.Test && (value match {
            case "singular" | "data" => n.columns.get("test_kind").contains("singular")
            case "generic" | "schema" => !n.columns.get("test_kind").contains("singular")
            case _ => false
          }) => id
        }.toSet
      case "group" =>
        // model `group` config (node_selector.rs:67 MethodName::Group)
        nodes.collect {
          case (id, n) if extraStr(n, "group").contains(value) => id
        }.toSet
      case "version" =>
        // versioned models carry version/latest_version configs
        // (node_selector.rs:70 MethodName::Version)
        nodes.collect {
          case (id, n) if {
            val v = extraStr(n, "version")
            val latest = extraStr(n, "latest_version")
            v.isDefined && (value match {
              case "latest" => v == latest
              case "old" => (v, latest) match {
                case (Some(a), Some(b)) => a.toDouble < b.toDouble
                case _ => false
              }
              case "prerelease" => (v, latest) match {
                case (Some(a), Some(b)) => a.toDouble > b.toDouble
                case _ => false
              }
              case exact => v.contains(exact)
            })
          } => id
        }.toSet
      case "result" =>
        // status of the node in the previous run's results
        // (node_selector.rs:80 MethodName::Result — powers `dbt retry`)
        nodes.keySet.filter(id => prevResults.get(id).contains(value))
      case "state" if value == "modified" =>
        nodes.collect {
          case (id, n) if prevChecksums.get(id).forall(_ != n.checksum) => id
        }.toSet
      // sub-methods (dbt state:modified.body / .configs): compare ONLY the
      // raw-SQL or resolved-config checksum, recorded in the state file
      // under `<id>#body` / `<id>#config` (Runner.saveState)
      case "state" if value == "modified.body" =>
        nodes.collect {
          case (id, n) if prevChecksums.get(s"$id#body")
            .forall(_ != n.checksumBody) => id
        }.toSet
      case "state" if value == "modified.configs" =>
        nodes.collect {
          case (id, n) if prevChecksums.get(s"$id#config")
            .forall(_ != n.checksumConfig) => id
        }.toSet
      // modified.contract: enforcement flag or declared contract columns
      // changed; modified.relation: the node materializes somewhere else
      // (schema/alias) even with identical SQL (node_selector.rs:59-88)
      case "state" if value == "modified.contract" =>
        nodes.collect {
          case (id, n) if prevChecksums.get(s"$id#contract")
            .forall(_ != n.checksumContract) => id
        }.toSet
      case "state" if value == "modified.relation" =>
        nodes.collect {
          case (id, n) if prevChecksums.get(s"$id#relation")
            .forall(_ != n.checksumRelation) => id
        }.toSet
      // modified.macros: a macro in the node's transitive call closure
      // changed (dbt's depends_on.macros state comparison)
      case "state" if value == "modified.macros" =>
        nodes.collect {
          case (id, n) if prevChecksums.get(s"$id#macros")
            .forall(_ != n.checksumMacros) => id
        }.toSet
      case "state" if value == "new" =>
        nodes.collect {
          case (id, _) if !prevChecksums.contains(id) => id
        }.toSet
      case "source_status" =>
        // dbt's source_status:fresher (node_selector.rs:75; the reference
        // enumerates the method but never evaluates it — this engine
        // does, from its own LOCAL freshness artifacts): sources whose
        // current `source freshness` max_loaded_at advanced strictly past
        // the --state run's sources.json. Matches nodes DIRECTLY reading
        // a fresher source — the same dependent-selection convention as
        // `source:` above; `+` expands downstream as usual.
        if (value != "fresher")
          throw new IllegalArgumentException(
            s"source_status:$value is not supported — 'fresher' is the " +
              "only defined source_status selection")
        fresherSources match {
          case None => throw new IllegalArgumentException(
            "source_status:fresher needs BOTH freshness artifacts: run " +
              "`source freshness` first (writes target/sources.json) and " +
              "pass --state pointing at a previous run's sources.json")
          case Some(fresh) =>
            nodes.collect {
              case (id, n) if n.dependsOn.exists(fresh.contains) => id
            }.toSet
        }
      case "column" =>
        // marked internal-only in the reference (node_selector.rs:81-86
        // "internal only to select column in a table")
        throw new IllegalArgumentException(
          "selector method column: is internal-only in dbt and not " +
            "supported; select the owning node with fqn:/path: instead")
      case other =>
        throw new IllegalArgumentException(s"unknown selector method: $other")
    }
  }
}
