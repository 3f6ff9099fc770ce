package graft.resolve

import scala.collection.mutable

/** DAG utilities over node ids (reference: crates/dbt-dag/src/
  * deps_mgmt.rs — topological_sort :511, topological_levels :553,
  * get_all_upstream_deps :136, collect_edges_through_nodes :636). */
object Dag {

  /** edges: node → its upstream dependencies. */
  final case class Graph(deps: Map[String, Seq[String]]) {
    lazy val reverse: Map[String, Seq[String]] = {
      val m = mutable.Map.empty[String, mutable.ArrayBuffer[String]]
      deps.foreach { case (n, ds) =>
        ds.foreach(d => m.getOrElseUpdate(d, mutable.ArrayBuffer.empty) += n)
      }
      m.map { case (k, v) => k -> v.toSeq }.toMap
    }
    def nodes: Set[String] = deps.keySet ++ deps.values.flatten

    /** Kahn's algorithm; throws on cycles naming the remainder. */
    def topologicalSort(): Seq[String] = {
      val inDeg = mutable.Map.empty[String, Int] ++
        nodes.map(n => n -> deps.getOrElse(n, Nil).count(nodes)).toMap
      val ready = mutable.PriorityQueue.empty[String](Ordering[String].reverse)
      inDeg.foreach { case (n, d) => if (d == 0) ready += n }
      val out = mutable.ArrayBuffer.empty[String]
      while (ready.nonEmpty) {
        val n = ready.dequeue()
        out += n
        reverse.getOrElse(n, Nil).foreach { m =>
          inDeg(m) -= 1
          if (inDeg(m) == 0) ready += m
        }
      }
      if (out.length != nodes.size)
        throw new IllegalStateException(
          s"cycle detected among: ${(nodes -- out).mkString(", ")}")
      out.toSeq
    }

    /** Nodes grouped into parallel-executable waves: level i depends only
      * on levels < i (deps_mgmt.rs:553). */
    def topologicalLevels(): Seq[Seq[String]] = {
      val level = mutable.Map.empty[String, Int]
      topologicalSort().foreach { n =>
        val l = deps.getOrElse(n, Nil).filter(nodes)
          .map(d => level(d) + 1).maxOption.getOrElse(0)
        level(n) = l
      }
      level.groupBy(_._2).toSeq.sortBy(_._1)
        .map(_._2.keys.toSeq.sorted)
    }

    def upstream(id: String, depth: Int = Int.MaxValue): Set[String] = {
      val seen = mutable.Set.empty[String]
      def go(n: String, d: Int): Unit =
        if (d > 0) deps.getOrElse(n, Nil).foreach { p =>
          if (seen.add(p)) go(p, d - 1)
        }
      go(id, depth)
      seen.toSet
    }

    def downstream(id: String, depth: Int = Int.MaxValue): Set[String] = {
      val seen = mutable.Set.empty[String]
      def go(n: String, d: Int): Unit =
        if (d > 0) reverse.getOrElse(n, Nil).foreach { c =>
          if (seen.add(c)) go(c, d - 1)
        }
      go(id, depth)
      seen.toSet
    }

    /** `@model`: the selected node, all descendants, and all ancestors of
      * those descendants (dbt's at-operator). */
    def atClosure(id: String): Set[String] = {
      val down = downstream(id) + id
      down ++ down.flatMap(upstream(_))
    }

    /** Restrict the graph to `keep`, preserving transitive edges through
      * removed nodes (deps_mgmt.rs:636 collect_edges_through_nodes). */
    def slice(keep: Set[String]): Graph = {
      def reachableKept(n: String): Seq[String] =
        deps.getOrElse(n, Nil).flatMap { d =>
          if (keep(d)) Seq(d) else reachableKept(d)
        }.distinct
      Graph(keep.map(n => n -> reachableKept(n)).toMap)
    }
  }

  def fromNodes(nodes: Map[String, graft.core.Node]): Graph =
    Graph(nodes.map { case (id, n) =>
      id -> n.dependsOn.filter(d => nodes.contains(d) || d.startsWith("source."))
    })
}
