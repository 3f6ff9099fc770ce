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
