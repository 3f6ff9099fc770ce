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
    // balanced labels -> fastLogit(0.5) = 0, so the default bias init
    // is exactly zero here too
    assert(Classify.train(feat, X, "y", iters = 0, lr = 0.1).toSeq ===
      Seq(0.0, 0.0, 0.0, 0.0, 0.0))
    // plain-GD hand check (init/standardization opted out):
    // zero weights -> z = 0 -> sigma = 0.5 -> resid = 0.5 - y, so
    // s_j = sum((0.5 - y) * x_j), w_j = -0.1 * s_j / 2:
    //   s = (0, -0.05, -0.10, -0.125, 0.25)
    val w = Classify.train(feat, X, "y", iters = 1, lr = 0.1,
      biasInit = false, standardize = false)
    val expect = Seq(0.0, 0.0025, 0.005, 0.00625, -0.0125)
    w.toSeq.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"got ${w.toSeq}, want $expect")
    }
  }

  test("bias init: untrained model scores every row at the base rate") {
    import spark.implicits._
    // 3/4 positive -> fastLogit(0.75) = 0.5/0.5 = 1 -> sigma(1) = 0.75
    val feat = Seq(
      (0.2, 0.1, 0.0, 0.0, 1.0), (0.4, 0.2, 0.0, 0.0, 1.0),
      (0.6, 0.3, 0.0, 0.0, 1.0), (0.8, 0.4, 0.0, 0.0, 0.0))
      .toDF("x1", "x2", "x3", "x4", "y")
    val w = Classify.train(feat, X, "y", iters = 0, lr = 0.1)
    assert(w(0) === 1.0, s"fastLogit(0.75) should be exactly 1: ${w.toSeq}")
    assert(w.drop(1).forall(_ == 0.0))
    val s = feat.select(Classify.fastSigmoid(Classify.z(w.toSeq, X)))
      .head().getDouble(0)
    assert(s === 0.75)
  }

  test("default recipe separates the bench labels: scores straddle 0.5") {
    // the round-9 verdict's quality defect: zero-init unstandardized GD
    // on the imbalanced Gopher labels left every score on one side of
    // 0.5, so the conventional decision boundary never fired. The
    // default recipe (base-rate bias init + standardized GD) must put
    // scores on BOTH sides at the default step parameters.
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "text")
    val feat = Classify.gateFeatures(docs, "doc_id", "text")
    val w = Classify.train(feat, X, "y", iters = 8, lr = 0.5)
    val sc = feat.select(
      Classify.fastSigmoid(Classify.z(w.toSeq, X)).as("s"),
      col("y"))
    val r = sc.agg(
      sum(when(col("s") >= 0.5, 1L).otherwise(0L)).as("ge"),
      sum(when(col("s") < 0.5, 1L).otherwise(0L)).as("lt"),
      sum(when((col("s") >= 0.5) === (col("y") === 1.0), 1L)
        .otherwise(0L)).as("agree"),
      count(lit(1)).as("n"),
      sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("pos")).head()
    assert(r.getLong(0) > 0, "at least one score >= 0.5")
    assert(r.getLong(1) > 0, "at least one score < 0.5")
    // the trained gate must beat majority-class accuracy — otherwise
    // the scorer is still decorative
    val majority = math.max(r.getLong(4), r.getLong(3) - r.getLong(4))
    assert(r.getLong(2) > majority,
      s"accuracy ${r.getLong(2)}/${r.getLong(3)} should beat " +
        s"majority $majority")
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

  test("calibration: fixed-width bins, score 1.0 clamps into the top bin") {
    import spark.implicits._
    val scored = Seq(
      (0.05, 0.0), (0.08, 1.0),   // bin 0
      (0.55, 1.0),                // bin 5
      (1.0, 1.0)                  // would be bin 10 — clamps to 9
    ).toDF("score", "y")
    val out = Classify.calibration(scored, "score", "y", bins = 10)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(0) == ((2L, 1L, 0.5, math.rint((0.05 + 0.08) / 2 * 1e6) / 1e6)))
    assert(out(5) == ((1L, 1L, 1.0, 0.55)))
    assert(out(9) == ((1L, 1L, 1.0, 1.0)))
    assert(out.size == 3)
  }

  test("prCurve: monotone keep-count, hand cells, zero-keep NULLs") {
    import spark.implicits._
    val scored = Seq(
      (0.9, 1.0), (0.8, 1.0), (0.7, 0.0), (0.2, 1.0)).toDF("s", "y")
    val out = Classify.prCurve(scored, "s", "y", Seq(0.5, 0.75, 0.95))
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5))))).toMap
    // t=0.5 keeps 3 (tp 2): p=2/3, r=2/3, f1=2·2/(4+1+1)
    val twoThirds = math.rint(2.0 / 3.0 * 1e6) / 1e6
    assert(out(0.5) == ((3L, 2L, Some(twoThirds), Some(twoThirds),
      Some(twoThirds))))
    // t=0.75 keeps 2 (tp 2): p=1, r=2/3, f1=4/5
    assert(out(0.75) == ((2L, 2L, Some(1.0), Some(twoThirds), Some(0.8))))
    // t=0.95 keeps none: precision undefined, recall 0, f1 0
    assert(out(0.95) == ((0L, 0L, None, Some(0.0), Some(0.0))))
  }

  test("kappa: textbook 2x2 matrix and degenerate single-cell NULL") {
    import spark.implicits._
    // classic example: po=0.7, pe=0.5, kappa=0.4
    val conf = Seq(
      ("yes", "yes", 20L), ("yes", "no", 5L),
      ("no", "yes", 10L), ("no", "no", 15L)).toDF("l", "p", "n")
    val r = Classify.kappaFromConfusion(conf, "l", "p", "n").head()
    assert(r.getLong(0) == 50L)
    assert(r.getDouble(1) == 0.7)
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 0.4)
    // every item in one agreeing cell: pe = 1 → kappa undefined
    val degen = Seq(("a", "a", 7L)).toDF("l", "p", "n")
    val d = Classify.kappaFromConfusion(degen, "l", "p", "n").head()
    assert(d.getDouble(2) == 1.0 && d.isNullAt(3))
  }

  test("classMetrics: per-class tp/fp/fn and single-division F1") {
    import spark.implicits._
    // labels a,b; 'c' appears ONLY as a prediction
    val conf = Seq(
      ("a", "a", 8L), ("a", "b", 2L),
      ("b", "a", 1L), ("b", "b", 4L), ("b", "c", 1L)).toDF("l", "p", "n")
    val out = Classify.classMetrics(conf, "l", "p", "n")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))).toMap
    // a: tp=8, fp=1, fn=2 → p=8/9, r=0.8, f1=16/19
    assert(out("a") == ((8L, 1L, 2L,
      Some(math.rint(8.0 / 9.0 * 1e6) / 1e6), Some(0.8),
      Some(math.rint(16.0 / 19.0 * 1e6) / 1e6))))
    // b: tp=4, fp=2, fn=2 → p=r=f1=2/3
    val twoThirds = math.rint(2.0 / 3.0 * 1e6) / 1e6
    assert(out("b") == ((4L, 2L, 2L,
      Some(twoThirds), Some(twoThirds), Some(twoThirds))))
    // c: never a true label → tp=0, fp=1, fn=0; recall undefined
    assert(out("c") == ((0L, 1L, 0L, Some(0.0), None, Some(0.0))))
  }

  test("agreement: join-then-count matches the confusion-table path") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "y")).toDF("id", "la")
    val b = Seq((1L, "x"), (2L, "y"), (3L, "y"), (5L, "x")).toDF("id", "lb")
    // joined items 1,2,3: agree on 1 and 3 → po = 2/3;
    // marginals a: x=2,y=1; b: x=1,y=2 → pe = (2·1 + 1·2)/9 = 4/9
    val r = Classify.agreement(a, b, "id", "la", "lb").head()
    assert(r.getLong(0) == 3L)
    val po = 2.0 / 3.0
    val pe = 4.0 / 9.0
    assert(r.getDouble(3) ==
      math.rint((po - pe) / (1.0 - pe) * 1e6) / 1e6)
  }
}
