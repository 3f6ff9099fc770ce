package graft

import graft.mat.UnitTestMat
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Unit-test fixture formats: dict rows, inline csv, and sql — all three
  * must produce the same typed frame against a template schema (reference:
  * Formats common.rs:759-765, MA/unit_test_sql/get_fixture_sql.sql:2-108). */
class UnitFixtureSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def template = {
    import spark.implicits._
    Seq((0L, 0.0, "")).toDF("id", "amount", "status")
  }

  test("dict, csv, and sql fixtures build identical frames") {
    import spark.implicits._
    val dict = UnitTestMat.fixtureDf(spark,
      Seq(
        Map("id" -> 1L, "amount" -> 10.5, "status" -> "O"),
        Map("id" -> 2L, "status" -> "F")), // missing amount → null
      Some(template))
    val csv = UnitTestMat.fixtureDfCsv(spark,
      """id,amount,status
        |1,10.5,O
        |2,,F
        |""".stripMargin, Some(template))
    val sql = UnitTestMat.fixtureDfSql(spark,
      """SELECT CAST(1 AS BIGINT) AS id, CAST(10.5 AS DOUBLE) AS amount, 'O' AS status
        |UNION ALL SELECT 2, NULL, 'F'""".stripMargin)

    val expect = Set((1L, Option(10.5), "O"), (2L, None, "F"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"amount", $"status").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getString(2)))
        .toSet
    assert(rows(dict) == expect)
    assert(rows(csv) == expect)
    assert(rows(sql) == expect)
    assert(dict.schema == csv.schema)
  }

  test("csv fixture quoted values and diff integration") {
    val csv = UnitTestMat.fixtureDfCsv(spark,
      """id,amount,status
        |3,1.25,"with, comma"
        |""".stripMargin, Some(template))
    val row = csv.collect().head
    assert(row.getString(2) == "with, comma")
    val res = UnitTestMat.run(csv, csv)
    assert(res.status == "pass")
  }
}
