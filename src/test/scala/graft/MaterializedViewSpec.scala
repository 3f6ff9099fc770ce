package graft

import graft.core._
import graft.mat.{MatContext, MaterializedViewMat}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** materialized_view scenario ladder (reference MA/materializations/
  * models/materialized_view.sql:56-123): create → refresh when the
  * recorded configuration matches → on_configuration_change
  * apply/continue/fail when it drifts. */
class MaterializedViewSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def ctx(a: graft.adapter.SparkAdapter, rel: Relation,
      partitionBy: Seq[String], extra: Map[String, Any] = Map.empty,
      fullRefresh: Boolean = false): MatContext = {
    import spark.implicits._
    val cfg = NodeConfig(materialized = "materialized_view",
      partitionBy = partitionBy, extra = extra)
    val n = Node(uniqueId = s"model.t.${rel.identifier}", name = rel.identifier,
      packageName = "t", kind = NodeKind.Model, rawSql = "", path = "",
      config = cfg, relation = Some(rel))
    MatContext(a, n, rel,
      () => Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "grp"),
      fullRefresh, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
  }

  private def partitionCols(rel: Relation): Seq[String] = {
    val rows = spark.sql(s"DESCRIBE TABLE ${rel.fqn}").collect().map(_.getString(0))
    val i = rows.indexOf("# Partition Information")
    if (i < 0) Nil else rows.drop(i + 2).takeWhile(_.nonEmpty).toSeq
  }

  test("create, refresh, and the three on_configuration_change modes") {
    val schema = "g_mv_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    val a = new graft.adapter.SparkAdapter(spark, schema,
      Some(java.nio.file.Files.createTempDirectory("graft_mv_wh").toString))
    val rel = Relation(schema, "mv_demo")

    // 1. create
    val r1 = MaterializedViewMat.run(ctx(a, rel, Nil))
    assert(r1.status == "success" && r1.message.contains("created"))
    assert(a.read(rel).count() == 3)

    // 2. same config → refresh
    val r2 = MaterializedViewMat.run(ctx(a, rel, Nil))
    assert(r2.status == "success" && r2.message.contains("refreshed"))

    // 3. config drift + fail → error, table untouched (no partitioning)
    val r3 = MaterializedViewMat.run(ctx(a, rel, Seq("grp"),
      Map("on_configuration_change" -> "fail")))
    assert(r3.status == "error" && r3.message.contains("fail"))
    assert(partitionCols(rel).isEmpty)

    // 4. drift + continue → success, changes NOT applied
    val r4 = MaterializedViewMat.run(ctx(a, rel, Seq("grp"),
      Map("on_configuration_change" -> "continue")))
    assert(r4.status == "success" && r4.message.contains("skipped"))
    assert(partitionCols(rel).isEmpty)

    // 5. drift + apply (the default) → rebuilt with the new layout
    val r5 = MaterializedViewMat.run(ctx(a, rel, Seq("grp")))
    assert(r5.status == "success" && r5.message.contains("applied"))
    assert(partitionCols(rel) == Seq("grp"))

    // 6. and the new config is now the recorded one → refresh
    val r6 = MaterializedViewMat.run(ctx(a, rel, Seq("grp")))
    assert(r6.status == "success" && r6.message.contains("refreshed"))

    // 7. --full-refresh always replaces
    val r7 = MaterializedViewMat.run(ctx(a, rel, Nil, fullRefresh = true))
    assert(r7.status == "success" && r7.message.contains("full-refresh"))
    assert(partitionCols(rel).isEmpty)
  }
}
