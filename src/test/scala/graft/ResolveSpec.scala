package graft

import graft.core.{Node, NodeConfig, NodeKind}
import graft.resolve.{Dag, Selector}
import org.scalatest.funsuite.AnyFunSuite

class ResolveSpec extends AnyFunSuite {

  // a -> b -> d ; a -> c -> d ; e isolated
  private val deps = Map(
    "a" -> Seq.empty[String],
    "b" -> Seq("a"),
    "c" -> Seq("a"),
    "d" -> Seq("b", "c"),
    "e" -> Seq.empty[String])
  private val g = Dag.Graph(deps)

  test("topological sort respects edges") {
    val order = g.topologicalSort()
    assert(order.indexOf("a") < order.indexOf("b"))
    assert(order.indexOf("b") < order.indexOf("d"))
    assert(order.indexOf("c") < order.indexOf("d"))
    assert(order.toSet == Set("a", "b", "c", "d", "e"))
  }

  test("topological levels group independent nodes") {
    val levels = g.topologicalLevels()
    assert(levels(0).toSet == Set("a", "e"))
    assert(levels(1).toSet == Set("b", "c"))
    assert(levels(2) == Seq("d"))
  }

  test("cycle detection") {
    val cyclic = Dag.Graph(Map("x" -> Seq("y"), "y" -> Seq("x")))
    assertThrows[IllegalStateException](cyclic.topologicalSort())
  }

  test("upstream / downstream closures with depth") {
    assert(g.upstream("d") == Set("a", "b", "c"))
    assert(g.upstream("d", 1) == Set("b", "c"))
    assert(g.downstream("a") == Set("b", "c", "d"))
    assert(g.downstream("a", 1) == Set("b", "c"))
    assert(g.atClosure("b") == Set("a", "b", "c", "d")) // d's other parent c + its parent a
  }

  test("slice preserves transitive edges through removed nodes") {
    val sliced = g.slice(Set("a", "d"))
    assert(sliced.deps("d").toSet == Set("a"))
  }

  private def mkNodes: Map[String, Node] = Map(
    "model.p.stg" -> Node("model.p.stg", "stg", "p", NodeKind.Model,
      path = "models/staging/stg.sql",
      config = NodeConfig(tags = Seq("daily")),
      dependsOn = Seq("source.tpch.orders")),
    "model.p.mart" -> Node("model.p.mart", "mart", "p", NodeKind.Model,
      path = "models/marts/mart.sql",
      config = NodeConfig(materialized = "table"),
      dependsOn = Seq("model.p.stg")),
    "test.p.unique_mart_id" -> Node("test.p.unique_mart_id", "unique_mart_id",
      "p", NodeKind.Test, dependsOn = Seq("model.p.mart")))

  private val nodes = mkNodes
  private val ng = Dag.fromNodes(nodes)

  test("selector: bare name, graph operators") {
    def sel(s: String) = Selector.select(Selector.parse(s), nodes, ng)
    assert(sel("mart") == Set("model.p.mart"))
    assert(sel("+mart") == Set("model.p.mart", "model.p.stg"))
    assert(sel("mart+") == Set("model.p.mart", "test.p.unique_mart_id"))
    assert(sel("+mart+") == Set("model.p.mart", "model.p.stg", "test.p.unique_mart_id"))
    assert(sel("1+mart") == Set("model.p.mart", "model.p.stg"))
    assert(sel("stg+1") == Set("model.p.stg", "model.p.mart"))
  }

  test("selector: methods, unions, intersections") {
    def sel(s: String) = Selector.select(Selector.parse(s), nodes, ng)
    assert(sel("tag:daily") == Set("model.p.stg"))
    assert(sel("config.materialized:table") == Set("model.p.mart"))
    assert(sel("resource_type:test") == Set("test.p.unique_mart_id"))
    assert(sel("path:staging") == Set("model.p.stg"))
    assert(sel("source:tpch+") contains "model.p.stg")
    assert(sel("stg mart") == Set("model.p.stg", "model.p.mart"))
    assert(sel("tag:daily,stg") == Set("model.p.stg")) // intersection
    assert(sel("st*") == Set("model.p.stg")) // glob
  }

  test("selector: state:modified against previous checksums") {
    val withSums = nodes.map { case (id, n) => id -> n.copy(checksum = s"sum_$id") }
    val prev = Map("model.p.stg" -> "sum_model.p.stg", // unchanged
      "model.p.mart" -> "OLD") // changed
    val sel = Selector.select(Selector.parse("state:modified"), withSums,
      Dag.fromNodes(withSums), prev)
    assert(sel.contains("model.p.mart"))
    assert(!sel.contains("model.p.stg"))
    assert(sel.contains("test.p.unique_mart_id")) // absent from prev = modified
  }

  test("@ operator") {
    def sel(s: String) = Selector.select(Selector.parse(s), nodes, ng)
    assert(sel("@stg") == Set("model.p.stg", "model.p.mart", "test.p.unique_mart_id"))
  }
}
