package graft

import graft.core.{Relation, RelationType}
import graft.sample.{Sampler, SamplerPlan}
import graft.sample.SamplerPlan._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sampler-plan semantics (reference crates/dbt-sample/src/plan.rs):
  * YAML parsing + validation, deterministic strategies, keyset
  * propagation across entries (referential consistency), and the
  * source-renaming map that `run --sample` applies. */
class SamplerSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val planYaml =
    """version: 1
      |name: dev_slice
      |keysets:
      |  cust:
      |    cols: [c_custkey]
      |    from:
      |      root: src.tpch.customer
      |      strategy: {type: hash, args: {by: c_custkey, mod: 10, keep: 3, seed: 7}}
      |entries:
      |  - select: src.tpch.customer
      |    strategy: {type: hash, args: {by: c_custkey, mod: 10, keep: 3, seed: 7}}
      |  - select: src.tpch.orders
      |    strategy: {type: clone}
      |    filters:
      |      - use: cust
      |        on: o_custkey -> c_custkey
      |  - select: src.tpch.nation
      |    strategy: {type: pass}
      |""".stripMargin

  test("plan parses: keysets, strategies, filters, mappings") {
    val p = SamplerPlan.parse(planYaml)
    assert(p.name == "dev_slice")
    assert(p.keysets("cust").cols == Seq("c_custkey"))
    p.keysets("cust").from match {
      case KeyFrom.FromRoot(root, Strategy.Hash("c_custkey", 10, 3, 7)) =>
        assert(root == "src.tpch.customer")
      case other => fail(s"unexpected keyset source $other")
    }
    assert(p.entries.map(_.strategy) ==
      Seq(Strategy.Hash("c_custkey", 10, 3, 7), Strategy.Clone, Strategy.Pass))
    assert(p.entries(1).filters == Seq(Filter("cust",
      Seq("o_custkey" -> "c_custkey"))))
  }

  test("plan validation rejects bad shapes") {
    def bad(yaml: String, msgPart: String): Unit = {
      val e = intercept[IllegalArgumentException](SamplerPlan.parse(yaml))
      assert(e.getMessage.contains(msgPart), e.getMessage)
    }
    bad("entries:\n  - select: nonsense\n", "src.<source>.<table>")
    bad("entries:\n  - select: src.a.b\n    strategy: {type: bogus}\n",
      "unknown type")
    bad("entries:\n  - select: src.a.b\n    strategy: {type: hash, args: {by: k, mod: 4, keep: 9}}\n",
      "keep <= mod")
    bad("""entries:
          |  - select: src.a.b
          |    filters: [{use: nope, on: k}]
          |""".stripMargin, "unknown key")
    bad("""keysets:
          |  k: {cols: [], from: {seed: s}}
          |""".stripMargin, "at least one column")
  }

  test("strategies are deterministic and respect their bounds") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, s"name_$i", i % 5)).toDF("id", "name", "grp")

    val hash1 = Sampler(df, Strategy.Hash("id", 10, 3, 7)).select("id").as[Long].collect().sorted
    val hash2 = Sampler(df, Strategy.Hash("id", 10, 3, 7)).select("id").as[Long].collect().sorted
    assert(hash1.sameElements(hash2), "hash strategy must be deterministic")
    assert(hash1.length > 150 && hash1.length < 450, s"~30% expected, got ${hash1.length}")

    val lim = Sampler(df, Strategy.Limit(50))
    assert(lim.count() == 50)
    // limit picks the smallest row-hashes, not an arrival prefix
    val lim2 = Sampler(df.repartition(7), Strategy.Limit(50))
      .select("id").as[Long].collect().sorted
    assert(lim.select("id").as[Long].collect().sorted.sameElements(lim2),
      "limit must be partition-order independent")

    val grp = Sampler(df, Strategy.Group("grp", 4))
    assert(grp.count() == 20) // 5 groups × 4
    assert(grp.groupBy("grp").count().select("count").as[Long]
      .collect().forall(_ == 4))

    val strat = Sampler(df, Strategy.Stratified("grp",
      Map("0" -> 1.0, "1" -> 0.5), 3))
    val byGrp = strat.groupBy("grp").count().as[(Long, Long)].collect().toMap
    assert(byGrp(0L) == 200, "frac 1.0 keeps the whole stratum")
    assert(byGrp.getOrElse(2L, 0L) == 0L, "absent strata are dropped")
    assert(byGrp(1L) > 50 && byGrp(1L) < 150, s"~50% of 200, got ${byGrp.get(1L)}")

    val br = Sampler(df, Strategy.Branch(
      Seq("grp = 0", "grp = 1"), 30, Seq(2.0, 1.0)))
    val byBranch = br.groupBy("grp").count().as[(Long, Long)].collect().toMap
    assert(byBranch(0L) == 20 && byBranch(1L) == 10,
      s"weights 2:1 over total 30, got $byBranch")
  }

  test("keyset filters keep entries referentially consistent across refs") {
    import spark.implicits._
    val customer = (1L to 200L).map(i => (i, s"cust_$i")).toDF("c_custkey", "c_name")
    val orders = (1L to 2000L).map(i => (i, (i % 200) + 1, i * 10.0))
      .toDF("o_orderkey", "o_custkey", "o_total")

    val p = SamplerPlan.parse(planYaml)
    val keysets = Map("cust" -> Sampler.keysetDf(p.keysets("cust"),
      _ => fail("no seed in this plan"), _ => customer))
    val sampledCust = Sampler.applyEntry(customer, p.entries.head, keysets)
    val sampledOrders = Sampler.applyEntry(orders, p.entries(1), keysets)

    val custKeys = sampledCust.select("c_custkey").as[Long].collect().toSet
    val orderCust = sampledOrders.select("o_custkey").as[Long].collect().toSet
    assert(custKeys.nonEmpty && orderCust.nonEmpty)
    assert(orderCust.subsetOf(custKeys),
      "every sampled order must belong to a sampled customer")
    // clone + keyset filter keeps EXACTLY the sample's rows: 10 orders per
    // surviving customer in this synthetic layout
    assert(sampledOrders.count() == custKeys.size * 10L)
    // and the keyset semi-join must be broadcast (no shuffle of the fact side)
    val plan = sampledOrders.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast left-semi join, got:\n$plan")
  }

  test("remapSources rewires non-Pass entries only") {
    val rel = (t: String) => Relation(None, "raw", t, RelationType.External)
    val sources = Map("tpch" -> Map(
      "customer" -> rel("customer"), "orders" -> rel("orders"),
      "nation" -> rel("nation"), "untouched" -> rel("untouched")))
    val p = SamplerPlan.parse(planYaml)
    val remapped = Sampler.remapSources(sources, p, "__sample")
    assert(remapped("tpch")("customer").schema == "raw__sample")
    assert(remapped("tpch")("customer").identifier == "customer")
    assert(remapped("tpch")("orders").schema == "raw__sample")
    // pass entries + tables outside the plan keep their original relation
    assert(remapped("tpch")("nation") == rel("nation"))
    assert(remapped("tpch")("untouched") == rel("untouched"))
  }

  test("leakageSafeSplit keeps near-dup clusters on one side, others unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1L to 200L).map(i => Tuple1(i)).toDF("doc_id")
    // two dup clusters: {3,7,11} (chained pairs) and {20,21}
    val pairs = Seq((3L, 7L), (7L, 11L), (20L, 21L)).toDF("id_a", "id_b")
    val fractions = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val out = graft.ops.Sampling.leakageSafeSplit(
      docs, pairs, "doc_id", fractions)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 200)
    // entire cluster shares the CANONICAL member's split
    assert(Set(out(3L), out(7L), out(11L)).size == 1, "cluster {3,7,11}")
    assert(out(20L) == out(21L), "cluster {20,21}")
    // unpaired documents get exactly deterministicSplit's assignment
    val plain = graft.ops.Sampling.deterministicSplit(
      docs, "doc_id", fractions)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val clustered = Set(3L, 7L, 11L, 20L, 21L)
    docs.collect().map(_.getLong(0)).filterNot(clustered).foreach { id =>
      assert(out(id) == plain(id), s"doc $id drifted from the plain split")
    }
    // cluster members inherit the canonical (min) id's plain assignment
    assert(out(11L) == plain(3L) && out(21L) == plain(20L))
  }

  test("bootstrapMean: constant data collapses the CI, se bounds hold") {
    import spark.implicits._
    // constant values: every replica mean is exactly the constant →
    // se = 0 and the CI degenerates to the point estimate
    val const = (1L to 200L).map(i => (i, 7L)).toDF("id", "x")
    val c = graft.ops.Sampling.bootstrapMean(const, "id", "x",
      replicas = 8).head()
    assert(c.getLong(0) == 200L)
    assert(c.getDouble(1) == 7.0)
    assert(c.getLong(2) == 8L)
    assert(c.getDouble(3) == 0.0)
    assert(c.getDouble(4) == 7.0 && c.getDouble(5) == 7.0)
    // spread data: exact point estimate, positive se, CI brackets the
    // mean, and the draw is deterministic across runs
    val spreadDf = (1L to 500L).map(i => (i, i % 100)).toDF("id", "x")
    val r1 = graft.ops.Sampling.bootstrapMean(spreadDf, "id", "x",
      replicas = 16).head()
    val r2 = graft.ops.Sampling.bootstrapMean(spreadDf, "id", "x",
      replicas = 16).head()
    assert(r1 == r2, "md5-seeded draws must be reproducible")
    assert(r1.getDouble(1) == math.rint(
      (1L to 500L).map(_ % 100).sum.toDouble / 500.0 * 1e6) / 1e6)
    assert(r1.getDouble(3) > 0.0)
    assert(r1.getDouble(4) < r1.getDouble(1) &&
      r1.getDouble(1) < r1.getDouble(5))
  }

  test("curriculumOrder: band rotation, score ties, NULL drop") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10.0)), (2L, Some(10.0)), (3L, Some(20.0)),
      (4L, Some(30.0)), (5L, Some(40.0)), (6L, Some(50.0)),
      (7L, Some(60.0)), (8L, Some(70.0)), (9L, Option.empty[Double])
    ).toDF("doc_id", "score")
    val out = graft.ops.Sampling.curriculumOrder(df, "doc_id", "score",
      bands = 4).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
    // hist cumprev/2 bands: {10,10}→0, {20,30}→1, {40,50}→2, {60,70}→3
    assert(out == Map(
      1L -> ((0, 1L, 0L)), 2L -> ((0, 2L, 4L)),
      3L -> ((1, 1L, 1L)), 4L -> ((1, 2L, 5L)),
      5L -> ((2, 1L, 2L)), 6L -> ((2, 2L, 6L)),
      7L -> ((3, 1L, 3L)), 8L -> ((3, 2L, 7L))))
    // ascending interleave_key serves one item per band in rotation
    val order = out.toSeq.sortBy(_._2._3).map(_._2._1)
    assert(order == Seq(0, 1, 2, 3, 0, 1, 2, 3))
  }
}
