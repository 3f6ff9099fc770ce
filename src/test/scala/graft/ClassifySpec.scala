package graft

import graft.ops.{Classify, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Logistic gate distillation: hand-computed first GD step, fast
  * sigmoid identities, learning direction on separable data, and the
  * feature/label frame contract. */
class ClassifySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val X = Seq("x1", "x2", "x3", "x4")

  test("zero iterations returns zero weights; first step is hand-checkable") {
    import spark.implicits._
    val feat = Seq(
      (0.2, 0.5, 0.25, 0.0, 1.0),
      (0.1, 0.3, 0.0, 0.5, 0.0)).toDF("x1", "x2", "x3", "x4", "y")
    assert(Classify.train(feat, X, "y", iters = 0, lr = 0.1).toSeq ===
      Seq(0.0, 0.0, 0.0, 0.0, 0.0))
    // zero weights -> z = 0 -> sigma = 0.5 -> resid = 0.5 - y, so
    // s_j = sum((0.5 - y) * x_j), w_j = -0.1 * s_j / 2:
    //   s = (0, -0.05, -0.10, -0.125, 0.25)
    val w = Classify.train(feat, X, "y", iters = 1, lr = 0.1)
    val expect = Seq(0.0, 0.0025, 0.005, 0.00625, -0.0125)
    w.toSeq.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"got ${w.toSeq}, want $expect")
    }
  }

  test("fast sigmoid: exact midpoint, range, monotonicity") {
    import spark.implicits._
    val df = Seq(-1000.0, -1.0, -0.25, 0.0, 0.25, 1.0, 1000.0).toDF("z")
    val got = df.select(Classify.fastSigmoid(col("z")))
      .collect().map(_.getDouble(0))
    assert(got(3) === 0.5) // sigma(0) is exactly 0.5 (no libm fuzz)
    assert(got.forall(v => v > 0.0 && v < 1.0))
    assert(got.sorted.toSeq === got.toSeq, "monotone in z")
  }

  test("separable data: weights learn the separating direction") {
    import spark.implicits._
    // y = 1 iff x1 is large; other features are constant noise
    val rows = (1 to 50).map(i =>
      (if (i % 2 == 0) 0.9 else 0.1, 0.3, 0.3, 0.3,
        if (i % 2 == 0) 1.0 else 0.0))
    val feat = rows.toDF("x1", "x2", "x3", "x4", "y")
    val w = Classify.train(feat, X, "y", iters = 8, lr = 0.5)
    assert(w(1) > 0.0, s"x1 weight should be positive: ${w.toSeq}")
    val acc = feat.withColumn("z", Classify.z(w.toSeq, X))
      .filter((col("z") >= 0) === (col("y") === 1.0)).count()
    assert(acc === 50L, "separable data is fit exactly on the sign")
  }

  test("gateFeatures: schema, null-text drop, label matches the gate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "the a of and to in is table scan row merge fast"),
      (2L, "s1", "tiny"),
      (3L, "s2", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val feat = Classify.gateFeatures(docs, "doc_id", "text")
    assert(feat.columns.toSeq ===
      Seq("doc_id", "source", "x1", "x2", "x3", "x4", "y"))
    val byId = feat.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("y")).toMap
    assert(!byId.contains(3L), "NULL text has no defined label")
    val keep = TextAnalysis.gopherFilter(
      docs.filter(col("text").isNotNull).select("doc_id", "text"), "text")
      .collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(byId === keep.map { case (k, v) => k -> (if (v) 1.0 else 0.0) })
  }
}
