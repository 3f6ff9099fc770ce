package graft.resolve

import graft.core.{Node, NodeKind}

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
  *                resource_type: | source: | test_type: | state:modified
  */
object Selector {

  sealed trait Spec
  final case class Atom(
      raw: String,
      parentsDepth: Option[Int], // Some(MaxValue) for bare '+'
      childrenDepth: Option[Int],
      atOperator: Boolean) extends Spec
  final case class Union(specs: Seq[Spec]) extends Spec
  final case class Intersection(specs: Seq[Spec]) extends Spec

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

  /** Evaluate a selector against the node set; returns selected ids.
    * `prevChecksums` drives state:modified (reference
    * schemas/prev_state/mod.rs). */
  def select(spec: Spec, nodes: Map[String, Node], graph: Dag.Graph,
      prevChecksums: Map[String, String] = Map.empty): Set[String] = spec match {
    case Union(specs) =>
      specs.flatMap(select(_, nodes, graph, prevChecksums)).toSet
    case Intersection(specs) =>
      specs.map(select(_, nodes, graph, prevChecksums)).reduce(_ intersect _)
    case a: Atom =>
      val base = matchAtom(a.raw, nodes, prevChecksums)
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
      expanded.filter(nodes.contains)
  }

  private def matchAtom(raw: String, nodes: Map[String, Node],
      prevChecksums: Map[String, String]): Set[String] = {
    val (method, value) = raw.split(":", 2) match {
      case Array(m, v) => (m, v)
      case Array(v) => ("", v)
    }
    def glob(pattern: String, s: String): Boolean =
      java.util.regex.Pattern
        .compile(pattern.split("\\*", -1).map(java.util.regex.Pattern.quote)
          .mkString(".*"))
        .matcher(s).matches()

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
      case "config.materialized" | "config" =>
        val v = value.stripPrefix("materialized:")
        nodes.collect { case (id, n) if n.config.materialized == v => id }.toSet
      case "source" =>
        nodes.collect {
          case (id, n) if n.dependsOn.exists(_.startsWith(s"source.$value")) => id
        }.toSet
      case "test_type" =>
        nodes.collect {
          case (id, n) if n.kind == NodeKind.Test &&
            (value == "generic" || value == "singular") => id
        }.toSet
      case "state" if value == "modified" =>
        nodes.collect {
          case (id, n) if prevChecksums.get(id).forall(_ != n.checksum) => id
        }.toSet
      case "state" if value == "new" =>
        nodes.collect {
          case (id, _) if !prevChecksums.contains(id) => id
        }.toSet
      case other =>
        throw new IllegalArgumentException(s"unknown selector method: $other")
    }
  }
}
