package graft

import graft.adapter.SparkAdapter
import graft.core._
import graft.mat.{IncrementalMat, MatContext}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** expand_target_column_types parity (reference base_adapter.rs:504,
  * called from MA/.../incremental.sql:37): target columns widen to fit the
  * incoming batch — same family only, never narrowing. */
class ExpandTypesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private lazy val adapter: SparkAdapter = {
    val loc = Files.createTempDirectory("graft_expand").toString
    spark.sql("DROP DATABASE IF EXISTS g_expand CASCADE")
    new SparkAdapter(spark, "g_expand", Some(loc))
  }

  test("widerType lattice") {
    val a = adapter
    assert(a.widerType(IntegerType, LongType).contains(LongType))
    assert(a.widerType(LongType, IntegerType).isEmpty) // never narrow
    assert(a.widerType(FloatType, DoubleType).contains(DoubleType))
    assert(a.widerType(DoubleType, FloatType).isEmpty)
    assert(a.widerType(DecimalType(10, 2), DecimalType(12, 2))
      .contains(DecimalType(12, 2)))
    assert(a.widerType(DecimalType(10, 2), DecimalType(10, 4))
      .contains(DecimalType(12, 4))) // keep 8 int digits + wider scale
    assert(a.widerType(DecimalType(12, 2), DecimalType(10, 2)).isEmpty)
    assert(a.widerType(StringType, IntegerType).isEmpty) // cross-family: no
    assert(a.widerType(IntegerType, StringType).isEmpty)
  }

  test("incremental append widens int target to incoming bigint") {
    import spark.implicits._
    val rel = Relation(adapter.defaultSchema, "t_widen")
    val cfg = NodeConfig(materialized = "incremental",
      incrementalStrategy = Some(IncrementalStrategy.Append))
    val node = Node(uniqueId = "model.spec.t_widen", name = "t_widen",
      packageName = "spec", kind = NodeKind.Model, config = cfg)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

    val first = Seq((1, "a")).toDF("n", "v") // n: int
    IncrementalMat.run(MatContext(adapter, node, rel, () => first,
      fullRefresh = false, t0))
    assert(adapter.getColumnsInRelation(rel)("n").dataType == IntegerType)

    val second = Seq((5000000000L, "b")).toDF("n", "v") // n: bigint
    IncrementalMat.run(MatContext(adapter, node, rel, () => second,
      fullRefresh = false, t0))
    assert(adapter.getColumnsInRelation(rel)("n").dataType == LongType)
    val got = adapter.read(rel).orderBy("n").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (5000000000L, "b")))
  }
}
