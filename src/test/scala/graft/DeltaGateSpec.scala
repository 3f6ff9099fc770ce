package graft

import graft.adapter.{DeltaSupport, SparkAdapter}
import graft.core.{Relation, RelationType}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Delta fast-path gating: this build environment has NO Delta jars, so
  * every DeltaSupport entry point must detect that and return false —
  * callers (CloneMat, IncrementalMat.merge) then take the parquet
  * fallbacks. The assertions here are the contract that a Delta-equipped
  * cluster flips transparently: detection is per-call, not baked in. */
class DeltaGateSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_delta_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("delta jars are absent in this image") {
    assert(!DeltaSupport.deltaOnClasspath)
  }

  test("provider probe: parquet table → parquet, missing table → None") {
    import spark.implicits._
    val adapter = new SparkAdapter(spark, "g_delta_gate")
    adapter.createSchema("g_delta_gate")
    val rel = Relation("g_delta_gate", "probe_t")
    adapter.writeTableAtomic(Seq((1, "a"), (2, "b")).toDF("id", "v"), rel)
    assert(DeltaSupport.provider(spark, rel).contains("parquet"))
    assert(!DeltaSupport.isDeltaTable(spark, rel))
    assert(DeltaSupport.provider(spark,
      Relation("g_delta_gate", "nope")).isEmpty)
  }

  // ---- golden pins: the exact SQL the gated paths execute on a
  // Delta-equipped cluster, asserted here because this image cannot run
  // it. Contract source: spark__create_or_replace_clone
  // (MS/materializations/clone.sql:5-7) and spark__get_merge_sql
  // (MS/macros/materializations/incremental/strategies.sql:28-68).

  test("golden: SHALLOW CLONE emits the reference's create-or-replace form") {
    val src = Relation("analytics", "orders_prod")
    val tgt = Relation("analytics", "orders_dev")
    assert(DeltaSupport.shallowCloneSql(src, tgt) ==
      "CREATE OR REPLACE TABLE analytics.orders_dev " +
        "SHALLOW CLONE analytics.orders_prod")
    // non-identifier characters pick up Spark backtick quoting
    val odd = Relation("analytics", "orders-v2")
    assert(DeltaSupport.shallowCloneSql(odd, tgt) ==
      "CREATE OR REPLACE TABLE analytics.orders_dev " +
        "SHALLOW CLONE analytics.`orders-v2`")
  }

  test("golden: MERGE INTO emits the reference's DEST/SOURCE shape") {
    val sql = DeltaSupport.mergeSql("analytics.orders", "src_view",
      sourceCols = Seq("id", "ts", "v"), uniqueKey = Seq("id"),
      updateCols = Seq("ts", "v"))
    assert(sql ==
      """MERGE INTO analytics.orders AS DBT_INTERNAL_DEST
        |USING src_view AS DBT_INTERNAL_SOURCE
        |ON DBT_INTERNAL_DEST.`id` <=> DBT_INTERNAL_SOURCE.`id`
        |WHEN MATCHED THEN UPDATE SET DBT_INTERNAL_DEST.`ts` = DBT_INTERNAL_SOURCE.`ts`, DBT_INTERNAL_DEST.`v` = DBT_INTERNAL_SOURCE.`v`
        |WHEN NOT MATCHED THEN INSERT (`id`, `ts`, `v`) VALUES (DBT_INTERNAL_SOURCE.`id`, DBT_INTERNAL_SOURCE.`ts`, DBT_INTERNAL_SOURCE.`v`)
        |""".stripMargin, sql)
  }

  test("golden: merge composes multi-key ON, predicates, and insert-only") {
    // compound key + incremental_predicates AND into the ON clause
    // (strategies.sql builds predicates the same way)
    val multi = DeltaSupport.mergeSql("t", "s", Seq("a", "b", "v"),
      uniqueKey = Seq("a", "b"), updateCols = Seq("v"),
      predicates = Seq("DBT_INTERNAL_DEST.ts > '2024-01-01'"))
    assert(multi.contains(
      "ON DBT_INTERNAL_DEST.`a` <=> DBT_INTERNAL_SOURCE.`a` AND " +
        "DBT_INTERNAL_DEST.`b` <=> DBT_INTERNAL_SOURCE.`b` AND " +
        "DBT_INTERNAL_DEST.ts > '2024-01-01'"), multi)
    // merge_update_columns=[] → insert-only merge: no WHEN MATCHED at all
    val insertOnly = DeltaSupport.mergeSql("t", "s", Seq("a", "v"),
      uniqueKey = Seq("a"), updateCols = Nil)
    assert(!insertOnly.contains("WHEN MATCHED"), insertOnly)
    assert(insertOnly.contains(
      "WHEN NOT MATCHED THEN INSERT (`a`, `v`) " +
        "VALUES (DBT_INTERNAL_SOURCE.`a`, DBT_INTERNAL_SOURCE.`v`)"),
      insertOnly)
  }

  test("shallowClone and nativeMerge signal fallback without side effects") {
    import spark.implicits._
    val adapter = new SparkAdapter(spark, "g_delta_gate")
    adapter.createSchema("g_delta_gate")
    val tgt = Relation("g_delta_gate", "merge_t")
    adapter.writeTableAtomic(Seq((1, "a"), (2, "b")).toDF("id", "v"), tgt)

    assert(!DeltaSupport.shallowClone(spark, tgt,
      Relation("g_delta_gate", "merge_t_clone")))
    assert(adapter.getRelation("g_delta_gate", "merge_t_clone").isEmpty,
      "failed gate must not create the clone target")

    val src = Seq((2, "B"), (3, "c")).toDF("id", "v")
    assert(!DeltaSupport.nativeMerge(spark, tgt, src,
      uniqueKey = Seq("id"), updateCols = Seq("v")))
    assert(adapter.read(tgt).count() == 2,
      "failed gate must leave the target untouched")
  }
}
