package graft

import graft.expressions.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The one Spark-session spec: custom expressions registered through
  * SparkSessionExtensions and exercised from SQL text. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // Suites share one forked JVM sequentially and getOrCreate returns any
    // live session — but withExtensions only applies at session CREATION,
    // so drop a session an earlier suite built without the extensions
    // (suite order is not alphabetical and shifts as suites are added).
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.builder()
      .master("local[2]")
      .appName("extensions-spec")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("pipeline expressions are callable from SQL") {
    spark.sparkContext.setLogLevel("ERROR")
    val row = spark.sql(
      """SELECT
        |  jaccard_sets(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  size(shingle_hashes('a b c d', 2)) AS n_shingles,
        |  size(minhash_sig(shingle_hashes('a b c d', 2), 16)) AS sig_len,
        |  simhash_chunks('hello world') AS chunks,
        |  dot_exact(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |            array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot,
        |  norm_exact(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS nrm,
        |  lang_id('the cat sat on the mat') AS lang
        |""".stripMargin).collect()(0)
    assert(math.abs(row.getAs[Double]("j") - 0.5) < 1e-12)
    assert(row.getAs[Int]("n_shingles") == 3)
    assert(row.getAs[Int]("sig_len") == 16)
    assert(row.getAs[scala.collection.Seq[Int]]("chunks").length == 4)
    assert(math.abs(row.getAs[Double]("dot") - 11.0) < 1e-12)
    assert(math.abs(row.getAs[Double]("nrm") - 5.0) < 1e-12)
    assert(row.getAs[String]("lang") == "en")
  }

  test("signatures are deterministic across invocations") {
    val q = "SELECT minhash_sig(shingle_hashes('x y z w v', 3), 8) AS s"
    val a = spark.sql(q).collect()(0).getAs[scala.collection.Seq[Long]]("s").toList
    val b = spark.sql(q).collect()(0).getAs[scala.collection.Seq[Long]]("s").toList
    assert(a == b)
    assert(a.length == 8)
  }
}
