package graft

import graft.adapter.{QueryCache, SparkAdapter}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Record/replay query cache (reference: query_cache.rs:310-384,
  * record_and_replay.rs): record mode persists read-query results keyed by
  * normalized SQL; replay mode serves them without executing — including
  * against tables that no longer exist, the record-and-replay test-infra
  * property. DDL/DML never caches. */
class QueryCacheSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("SQL normalization strips comments, volatile names, and whitespace") {
    assert(QueryCache.normalize("SELECT  1 -- trailing\n  FROM t") ==
      QueryCache.normalize("select 1 from t"))
    assert(QueryCache.normalize("/* header */ select * from a__dbt_tmp123a") ==
      QueryCache.normalize("select * from A__dbt_tmp"))
    assert(QueryCache.normalize(
      "select * from dbt_tmp_800c2fb4_a0ba_4708_a0b1_813316032bfb") ==
      QueryCache.normalize("select * from dbt_tmp_"))
    assert(QueryCache.normalize("select * from schema___1712000000___.t") ==
      QueryCache.normalize("select * from schema.t"))
  }

  test("string literals keep their identity and case under normalization") {
    // comment-like sequences INSIDE literals must not be stripped — the
    // two queries differ only in literal content and must not collide
    assert(QueryCache.key("SELECT 'a--x' AS v") !=
      QueryCache.key("SELECT 'a--y' AS v"))
    assert(QueryCache.key("SELECT '/*not a comment*/' AS v") !=
      QueryCache.key("SELECT '' AS v"))
    // literal case is significant; keyword case is not
    assert(QueryCache.key("SELECT 'ABC'") != QueryCache.key("SELECT 'abc'"))
    assert(QueryCache.key("SELECT 'ABC'") == QueryCache.key("select   'ABC'"))
    // volatile-name patterns inside literals survive
    assert(QueryCache.key("SELECT '___123___'") !=
      QueryCache.key("SELECT ''"))
  }

  test("only read statements are cacheable") {
    assert(QueryCache.cacheable("SELECT 1"))
    assert(QueryCache.cacheable("  with x as (select 1) select * from x"))
    assert(QueryCache.cacheable("SHOW TABLES"))
    assert(!QueryCache.cacheable("CREATE TABLE t AS SELECT 1"))
    assert(!QueryCache.cacheable("INSERT INTO t VALUES (1)"))
    assert(!QueryCache.cacheable("DROP TABLE t"))
  }

  test("record then replay round-trips results without executing") {
    val dir = Files.createTempDirectory("graft_qcache")
    val a = new SparkAdapter(spark, "g_qcache")
    spark.conf.set(QueryCache.ModeKey, "record")
    spark.conf.set(QueryCache.PathKey, dir.toString)
    try {
      val sql = "SELECT id, id * 2 AS twice, " +
        "TIMESTAMP '2024-01-01 00:00:00' AS ts FROM range(3)"
      val (st1, t1) = a.execute(sql)
      assert(st1 == "OK" && t1.numRows == 3)

      // replay serves the recorded result — even via a differently
      // commented/spaced variant of the same statement
      spark.conf.set(QueryCache.ModeKey, "replay")
      assert(QueryCache.key(sql) == QueryCache.key(
        "/* run 2 */ select   id, id * 2 as twice, " +
          "timestamp '2024-01-01 00:00:00' as ts\n from range(3)"))
      assert(Files.list(dir).count() == 1, "expected one recorded entry")
      val (st2, t2) = a.execute(
        "/* run 2 */ select   id, id * 2 as twice, " +
          "timestamp '2024-01-01 00:00:00' as ts\n from range(3)")
      assert(st2 == "OK (replayed)")
      assert(t2.columnNames == t1.columnNames)
      assert(t2.rows == t1.rows)
      assert(t2.rows.head(2) == java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))

      // a miss executes live and still answers
      val (st3, t3) = a.execute("SELECT 42 AS other")
      assert(st3 == "OK" && t3.rows.head.head == 42L)
    } finally {
      spark.conf.set(QueryCache.ModeKey, "off")
      spark.conf.unset(QueryCache.PathKey)
    }
  }
}
