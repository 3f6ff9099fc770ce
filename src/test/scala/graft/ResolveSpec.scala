package graft

import graft.core.{Node, NodeConfig, NodeKind}
import graft.resolve.{Dag, Resolver, Selector}
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

  test("selector: state:modified.body / .configs compare split checksums") {
    val withSums = nodes.map { case (id, n) =>
      id -> n.copy(checksumBody = s"b_$id", checksumConfig = s"c_$id") }
    val prev = Map(
      "model.p.stg#body" -> "b_model.p.stg",     // body unchanged
      "model.p.stg#config" -> "OLD",             // config changed
      "model.p.mart#body" -> "OLD",              // body changed
      "model.p.mart#config" -> "c_model.p.mart") // config unchanged
    def sel(s: String) = Selector.select(Selector.parse(s), withSums,
      Dag.fromNodes(withSums), prev)
    assert(sel("state:modified.body").contains("model.p.mart"))
    assert(!sel("state:modified.body").contains("model.p.stg"))
    assert(sel("state:modified.configs").contains("model.p.stg"))
    assert(!sel("state:modified.configs").contains("model.p.mart"))
    // absent from prev state = modified under every sub-method
    assert(sel("state:modified.body").contains("test.p.unique_mart_id"))
  }

  test("selector: state:modified.contract / .relation compare split checksums") {
    val withSums = nodes.map { case (id, n) =>
      id -> n.copy(checksumContract = s"k_$id", checksumRelation = s"r_$id") }
    val prev = Map(
      "model.p.stg#contract" -> "k_model.p.stg",   // contract unchanged
      "model.p.stg#relation" -> "OLD",             // relation moved
      "model.p.mart#contract" -> "OLD",            // contract changed
      "model.p.mart#relation" -> "r_model.p.mart") // relation unchanged
    def sel(s: String) = Selector.select(Selector.parse(s), withSums,
      Dag.fromNodes(withSums), prev)
    assert(sel("state:modified.contract").contains("model.p.mart"))
    assert(!sel("state:modified.contract").contains("model.p.stg"))
    assert(sel("state:modified.relation").contains("model.p.stg"))
    assert(!sel("state:modified.relation").contains("model.p.mart"))
    assert(sel("state:modified.relation").contains("test.p.unique_mart_id"))
  }

  test("resolver fills contract/relation checksums; alias move changes relation only") {
    import graft.project.ProjectLoader
    import java.nio.file.Files
    def mkProj(alias: Option[String], enforced: Boolean): Resolver.Resolved = {
      val proj = Files.createTempDirectory("graft_cksum")
      val aliasCfg = alias.map(a => s"config(alias='$a')").getOrElse("config()")
      Files.writeString(proj.resolve("dbt_project.yml"),
        "name: ck\nmodel-paths: [\"models\"]\n")
      Files.createDirectories(proj.resolve("models"))
      Files.writeString(proj.resolve("models/m.sql"),
        s"{{ $aliasCfg }}\nselect 1 as id")
      if (enforced) Files.writeString(proj.resolve("models/schema.yml"),
        """version: 2
          |models:
          |  - name: m
          |    config: {contract: {enforced: true}}
          |    columns: [{name: id, data_type: int}]
          |""".stripMargin)
      Resolver.resolve(ProjectLoader.load(proj.toString), "tgt")
    }
    val base = mkProj(None, enforced = false).nodes("model.ck.m")
    val moved = mkProj(Some("m2"), enforced = false).nodes("model.ck.m")
    val contracted = mkProj(None, enforced = true).nodes("model.ck.m")
    assert(base.checksumRelation != moved.checksumRelation)
    assert(base.checksumContract == moved.checksumContract)
    assert(base.checksumContract != contracted.checksumContract)
    assert(base.checksumRelation == contracted.checksumRelation)
  }

  test("modified.macros hashes the node's transitive macro closure") {
    import graft.project.ProjectLoader
    import java.nio.file.Files
    def resolveWith(helperBody: String, unrelatedBody: String) = {
      val proj = Files.createTempDirectory("graft_mck")
      Files.writeString(proj.resolve("dbt_project.yml"),
        "name: mk\nmodel-paths: [\"models\"]\n")
      Files.createDirectories(proj.resolve("models"))
      Files.createDirectories(proj.resolve("macros"))
      // wrapper calls helper: the model only calls wrapper, so helper is
      // reachable TRANSITIVELY; unrelated is never reachable
      Files.writeString(proj.resolve("macros/m.sql"),
        s"""{% macro wrapper(c) %}{{ helper(c) }}{% endmacro %}
           |{% macro helper(c) %}$helperBody{% endmacro %}
           |{% macro unrelated() %}$unrelatedBody{% endmacro %}
           |""".stripMargin)
      Files.writeString(proj.resolve("models/m.sql"),
        "select {{ wrapper('x') }} as v")
      Files.writeString(proj.resolve("models/plain.sql"), "select 1 as id")
      Resolver.resolve(ProjectLoader.load(proj.toString), "tgt").nodes
    }
    val base = resolveWith("upper({{ c }})", "1")
    val helperChanged = resolveWith("lower({{ c }})", "1")
    val unrelatedChanged = resolveWith("upper({{ c }})", "2")
    // transitive dependency change flips the checksum...
    assert(base("model.mk.m").checksumMacros
      != helperChanged("model.mk.m").checksumMacros)
    // ...an unreachable macro change does not
    assert(base("model.mk.m").checksumMacros
      == unrelatedChanged("model.mk.m").checksumMacros)
    // a macro-free model has a stable empty-closure checksum
    assert(base("model.mk.plain").checksumMacros
      == helperChanged("model.mk.plain").checksumMacros)
    // selector wiring: only the macro-calling model re-selects
    val withPrev = helperChanged
    val prev = base.map { case (id, n) => s"$id#macros" -> n.checksumMacros }
    val sel = Selector.select(Selector.parse("state:modified.macros"),
      withPrev, Dag.fromNodes(withPrev), prev)
    assert(sel.contains("model.mk.m"))
    assert(!sel.contains("model.mk.plain"))
  }

  test("@ operator") {
    def sel(s: String) = Selector.select(Selector.parse(s), nodes, ng)
    assert(sel("@stg") == Set("model.p.stg", "model.p.mart", "test.p.unique_mart_id"))
  }

  test("selector: group / version / result methods") {
    val withMeta = nodes ++ Map(
      "model.p.stg" -> nodes("model.p.stg").copy(config =
        NodeConfig(tags = Seq("daily"),
          extra = Map("group" -> "finance", "version" -> "1", "latest_version" -> "2"))),
      "model.p.mart" -> nodes("model.p.mart").copy(config =
        NodeConfig(materialized = "table",
          extra = Map("group" -> "finance", "version" -> "2", "latest_version" -> "2"))))
    val ng2 = Dag.fromNodes(withMeta)
    def sel(s: String, results: Map[String, String] = Map.empty) =
      Selector.select(Selector.parse(s), withMeta, ng2, prevResults = results)
    assert(sel("group:finance") == Set("model.p.stg", "model.p.mart"))
    assert(sel("group:ops") == Set.empty)
    assert(sel("version:latest") == Set("model.p.mart"))
    assert(sel("version:old") == Set("model.p.stg"))
    assert(sel("version:1") == Set("model.p.stg"))
    val res = Map("model.p.stg" -> "error", "model.p.mart" -> "success")
    assert(sel("result:error", res) == Set("model.p.stg"))
    assert(sel("result:error+", res) == Set("model.p.stg", "model.p.mart",
      "test.p.unique_mart_id")) // retry: failed node + children
  }

  test("selector: test_type distinguishes singular from generic") {
    val withSingular = nodes +
      ("test.p.assert_x" -> Node("test.p.assert_x", "assert_x", "p",
        NodeKind.Test, dependsOn = Seq("model.p.mart"),
        columns = Map("test_kind" -> "singular")))
    val ng2 = Dag.fromNodes(withSingular)
    def sel(s: String) = Selector.select(Selector.parse(s), withSingular, ng2)
    assert(sel("test_type:singular") == Set("test.p.assert_x"))
    assert(sel("test_type:generic") == Set("test.p.unique_mart_id"))
  }

  test("selector: test_name matches the generating test macro") {
    // generic tests record the macro name as rawSql (buildTestNode);
    // singular tests have none and never match test_name:
    val withTests = nodes +
      ("test.p.unique_mart_id" -> nodes("test.p.unique_mart_id")
        .copy(rawSql = "unique")) +
      ("test.p.not_null_mart_id" -> Node("test.p.not_null_mart_id",
        "not_null_mart_id", "p", NodeKind.Test, rawSql = "not_null",
        dependsOn = Seq("model.p.mart"))) +
      ("test.p.assert_x" -> Node("test.p.assert_x", "assert_x", "p",
        NodeKind.Test, rawSql = "select 1 where false",
        dependsOn = Seq("model.p.mart"),
        columns = Map("test_kind" -> "singular")))
    val ng2 = Dag.fromNodes(withTests)
    def sel(s: String) = Selector.select(Selector.parse(s), withTests, ng2)
    assert(sel("test_name:unique") == Set("test.p.unique_mart_id"))
    assert(sel("test_name:not_null") == Set("test.p.not_null_mart_id"))
    assert(sel("test_name:not_*") == Set("test.p.not_null_mart_id"))
    assert(sel("test_name:select 1 where false") == Set.empty) // singular excluded
  }

  test("selector: unit_test / function / saved_query by kind + name glob") {
    val withDecls = nodes +
      ("unit_test.p.ut_mart" -> Node("unit_test.p.ut_mart", "ut_mart", "p",
        NodeKind.UnitTest, dependsOn = Seq("model.p.stg"))) +
      ("function.p.order_bucket" -> Node("function.p.order_bucket",
        "order_bucket", "p", NodeKind.Function)) +
      ("saved_query.p.weekly_rev" -> Node("saved_query.p.weekly_rev",
        "weekly_rev", "p", NodeKind.SavedQuery,
        dependsOn = Seq("model.p.mart")))
    val ng2 = Dag.fromNodes(withDecls)
    def sel(s: String) = Selector.select(Selector.parse(s), withDecls, ng2)
    assert(sel("unit_test:ut_mart") == Set("unit_test.p.ut_mart"))
    assert(sel("unit_test:ut_*") == Set("unit_test.p.ut_mart"))
    assert(sel("unit_test:nope") == Set.empty)
    assert(sel("function:order_bucket") == Set("function.p.order_bucket"))
    assert(sel("function:*") == Set("function.p.order_bucket"))
    assert(sel("saved_query:weekly_rev") == Set("saved_query.p.weekly_rev"))
    // upstream-impact selection walks into the backing model
    assert(sel("+saved_query:weekly_rev") ==
      Set("saved_query.p.weekly_rev", "model.p.mart", "model.p.stg"))
  }

  test("selector: access matches declared and protected-default models") {
    val withAccess = nodes +
      ("model.p.stg" -> nodes("model.p.stg").copy(config =
        nodes("model.p.stg").config.copy(extra = Map("access" -> "public")))) +
      ("model.p.internal" -> Node("model.p.internal", "internal", "p",
        NodeKind.Model,
        config = NodeConfig(extra = Map("access" -> "private"))))
    val ng2 = Dag.fromNodes(withAccess)
    def sel(s: String) = Selector.select(Selector.parse(s), withAccess, ng2)
    assert(sel("access:public") == Set("model.p.stg"))
    assert(sel("access:private") == Set("model.p.internal"))
    // undeclared access is dbt's protected default; tests don't match
    assert(sel("access:protected") == Set("model.p.mart"))
  }

  test("selector: source_status:fresher selects dependents of fresher sources") {
    // without both freshness artifacts the method errors naming what to run
    val e1 = intercept[IllegalArgumentException](
      Selector.select(Selector.parse("source_status:fresher"), nodes, ng))
    assert(e1.getMessage.contains("freshness artifacts"))
    // with artifacts: stg reads source.tpch.orders, which got fresher
    assert(Selector.select(Selector.parse("source_status:fresher"), nodes, ng,
      fresherSources = Some(Set("source.tpch.orders"))) == Set("model.p.stg"))
    // nothing fresher → empty selection, no error
    assert(Selector.select(Selector.parse("source_status:fresher"), nodes, ng,
      fresherSources = Some(Set.empty)) == Set.empty)
    // fresher is the only defined source_status value
    val e3 = intercept[IllegalArgumentException](
      Selector.select(Selector.parse("source_status:stale"), nodes, ng,
        fresherSources = Some(Set.empty)))
    assert(e3.getMessage.contains("fresher"))
  }

  test("indirect selection attaches tests per mode (node_selector.rs:49-55)") {
    // rel test has TWO parents (the relationships shape); unit test's
    // subject lives in extra model_uid
    val withRel = nodes ++ Map(
      "test.p.rel_mart_stg" -> Node("test.p.rel_mart_stg", "rel_mart_stg",
        "p", NodeKind.Test,
        dependsOn = Seq("model.p.mart", "model.p.stg")),
      "unit_test.p.ut_mart" -> Node("unit_test.p.ut_mart", "ut_mart", "p",
        NodeKind.UnitTest,
        config = NodeConfig(extra = Map("model_uid" -> "model.p.mart"))))
    val g2 = Dag.fromNodes(withRel)
    def expand(sel: Set[String], mode: String): Set[String] =
      Selector.expandIndirect(sel, withRel, g2, mode)
    val mart = Set("model.p.mart")
    // eager: one selected parent suffices
    assert(expand(mart, "eager") == mart +
      ("test.p.unique_mart_id", "test.p.rel_mart_stg", "unit_test.p.ut_mart"))
    // cautious: the two-parent test needs BOTH parents selected
    assert(expand(mart, "cautious") == mart +
      ("test.p.unique_mart_id", "unit_test.p.ut_mart"))
    assert(expand(Set("model.p.mart", "model.p.stg"), "cautious")
      .contains("test.p.rel_mart_stg"))
    // buildable: an unselected parent in the ANCESTRY of a selected
    // node still counts (stg is mart's ancestor)
    assert(expand(mart, "buildable").contains("test.p.rel_mart_stg"))
    // empty: nothing attaches
    assert(expand(mart, "empty") == mart)
    // unknown mode: named error
    val e = intercept[IllegalArgumentException](expand(mart, "zealous"))
    assert(e.getMessage.contains("eager|buildable|cautious|empty"))
    // per-criterion override from selectors.yml (parser.rs:151-205) wins
    // over the invocation default, per atom, BEFORE set operations
    val spec = Selector.fromYamlDefinition(Map("union" -> Seq(
      Map("method" -> "fqn", "value" -> "mart",
        "indirect_selection" -> "empty"),
      Map("method" -> "fqn", "value" -> "stg"))))
    assert(Selector.select(spec, withRel, g2, indirect = "eager") ==
      Set("model.p.mart", "model.p.stg", "test.p.rel_mart_stg"))
    // an eager-expanded exclude drops its attached tests too — even the
    // two-parent test whose OTHER parent survives (dbt's documented
    // eager-exclusion behavior)
    assert(Selector.select(
      Selector.Difference(Selector.parse("fqn:*"), Selector.parse("mart")),
      withRel, g2, indirect = "eager") == Set("model.p.stg"))
  }

  test("selector: column rejected with a named reason") {
    val e2 = intercept[IllegalArgumentException](
      Selector.select(Selector.parse("column:model.p.mart.id"), nodes, ng))
    assert(e2.getMessage.contains("internal-only"))
  }

  test("selectors.yml: definitions compose union/intersection/exclude") {
    val doc = Map("selectors" -> Seq(
      Map("name" -> "daily_no_mart", "default" -> "true",
        "definition" -> Map("union" -> Seq(
          Map("method" -> "tag", "value" -> "daily"),
          Map("method" -> "fqn", "value" -> "mart"),
          Map("exclude" -> Seq(
            Map("method" -> "config.materialized", "value" -> "table")))))),
      Map("name" -> "plain_string", "definition" -> "tag:daily")))
    val (specs, default) = Selector.parseSelectorsYaml(doc)
    assert(default.contains("daily_no_mart"))
    assert(Selector.select(specs("daily_no_mart"), nodes, ng) == Set("model.p.stg"))
    assert(Selector.select(specs("plain_string"), nodes, ng) == Set("model.p.stg"))
  }

  test("selectors.yml: method dict with graph modifiers") {
    val spec = Selector.fromYamlDefinition(Map(
      "method" -> "fqn", "value" -> "stg", "children" -> "true"))
    assert(Selector.select(spec, nodes, ng) ==
      Set("model.p.stg", "model.p.mart", "test.p.unique_mart_id"))
    val depthSpec = Selector.fromYamlDefinition(Map(
      "method" -> "fqn", "value" -> "stg",
      "children" -> "true", "children_depth" -> "1"))
    assert(Selector.select(depthSpec, nodes, ng) ==
      Set("model.p.stg", "model.p.mart"))
  }
}
