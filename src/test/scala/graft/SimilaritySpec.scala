package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native HyperplaneSig/HyperplaneBandSigs expressions must produce
  * bit-identical buckets to the SQL formulation they replaced (which
  * survives as the DuckDB oracle mirror, PipelinePack.sigSql), and the
  * interpreted HOF mega-expression must be gone from the plans. */
class SimilaritySpec extends AnyFunSuite {

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

  private def vec(seed: Int, dim: Int = 64): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)((r.nextDouble() - 0.5).toFloat)
  }

  /** The pre-native SQL formulation, verbatim — the reference semantics
    * mirrored by the DuckDB oracle. */
  private def sigSqlExpr(vecCol: String, bits: Int, dim: Int = 64): String = {
    val qv = s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"
    (0 until bits).map { i =>
      val ws = (0 until dim).map(d => Similarity.hyperplaneWeight(i, d))
        .mkString("array(", "L, ", "L)")
      s"(CASE WHEN aggregate(zip_with($qv, $ws, (x, h) -> x * h), 0L, (a, b) -> a + b) > 0 THEN ${1L << i}L ELSE 0L END)"
    }.mkString(" + ")
  }

  test("native hyperplane signature matches SQL formulation bit-for-bit") {
    import spark.implicits._
    val df = (0 until 200).map(i => (i.toLong, vec(i))).toDF("id", "v")
    val both = df.select(
      Similarity.hyperplaneSignature("v", 12).as("native"),
      expr(sigSqlExpr("v", 12)).as("sql"))
    assert(both.filter(col("native") =!= col("sql")).count() == 0)
    // 30-bit variant used by ivfAssign
    val both30 = df.select(
      Similarity.hyperplaneSignature("v", 30).as("native"),
      expr(sigSqlExpr("v", 30)).as("sql"))
    assert(both30.filter(col("native") =!= col("sql")).count() == 0)
  }

  test("native band signatures match per-band SQL bits") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, vec(i + 5000))).toDF("id", "v")
    val bands = 4
    val r = 6
    // band b bit j = global hyperplane b*r+j with weight 1<<j — rebuild
    // from the flat SQL signature of bands*r bits by slicing bit ranges
    val flat = df.select(col("id"), expr(sigSqlExpr("v", bands * r)).as("flat"),
      Similarity.bandSignatures("v", bands, r).as("native"))
    val bandCols = Seq(col("id"), col("native")) ++ (0 until bands).map(b =>
      shiftright(col("flat"), b * r).bitwiseAND(lit((1L << r) - 1))
        .as(s"b$b"))
    val mismatches = flat.select(bandCols: _*)
      .filter((0 until bands).map(b =>
        col("native").getItem(b) =!= col(s"b$b")).reduce(_ || _))
    assert(mismatches.count() == 0)
  }

  test("lshTopK plan has no interpreted HOF signature math") {
    import spark.implicits._
    // go through parquet: ConvertToLocalRelation would eagerly evaluate
    // projections over a LocalRelation and hide the expression from the plan
    val dir = java.nio.file.Files.createTempDirectory("simspec").toString
    (0 until 60).map(i => (i.toLong, vec(i))).toDF("id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/corpus")
    (0 until 5).map(i => (1000L + i, vec(i + 31))).toDF("id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/queries")
    val corpus = spark.read.parquet(s"$dir/corpus")
    val queries = spark.read.parquet(s"$dir/queries")
    val plan = Similarity.lshTopK(queries, corpus, "id", "embedding", k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("aggregate(zip_with"), plan.take(2000))
    assert(plan.contains("hyperplanesig") || plan.contains("HyperplaneSig"),
      plan.take(2000))
  }
}
