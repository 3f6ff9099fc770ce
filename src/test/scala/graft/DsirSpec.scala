package graft

import graft.ops.Dsir
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling: hashed-ngram likelihood ratios. */
class DsirSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("target-vocabulary docs outscore off-vocabulary docs") {
    import spark.implicits._
    val raw = Seq(
      (1L, "cat sat mat cat sat"),
      (2L, "dog ran far dog ran"),
      (3L, "the cat and the mat"),
      (4L, "xyz qqq zzz www vvv")).toDF("id", "text")
    val target = Seq((10L, "cat sat on the mat"),
      (11L, "the cat and the mat")).toDF("id", "text")
    val w = Dsir.importanceWeights(raw, target, "id", "text", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // docs 1 and 3 share the target's unigrams AND bigrams ("cat sat",
    // "the cat", "and the", ...); 2 and 4 share neither — the ratio
    // rewards target-likelihood net of raw-corpus frequency, so only
    // genuinely target-phrased docs rise
    assert(w(1L) > w(2L) && w(3L) > w(2L))
    assert(w(1L) > w(4L) && w(3L) > w(4L))
  }

  test("target == raw gives exactly zero log ratio everywhere") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a"), (2L, "b c d"), (3L, "e"))
      .toDF("id", "text")
    val w = Dsir.importanceWeights(docs, docs, "id", "text", buckets = 32)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // tc = rc and tt = rt per bucket, so every term is ln(x) - ln(x)
    assert(w.values.forall(_ == 0.0), s"expected all-zero, got $w")
    assert(w.size == 3)
  }

  test("feature counts: unigrams plus bigrams, 1-token docs safe") {
    import spark.implicits._
    val docs = Seq((1L, "one"), (2L, "two words"), (3L, "a b c"))
      .toDF("id", "text")
    val n = Dsir.importanceWeights(docs, docs, "id", "text", buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // n tokens -> n unigrams + (n-1) bigrams
    assert(n == Map(1L -> 1L, 2L -> 3L, 3L -> 5L))
  }

  test("selectTopK returns k rows ordered by (logw desc, id asc)") {
    import spark.implicits._
    val raw = (1L to 20L)
      .map(i => (i, if (i % 3 == 0) "cat mat cat" else "dog log fog"))
      .toDF("id", "text")
    val target = Seq((100L, "cat on mat")).toDF("id", "text")
    val top = Dsir.selectTopK(raw, target, "id", "text", k = 6,
      buckets = 64).collect()
    assert(top.length == 6)
    // the six multiples of 3 are the cat-docs; ids ascend within the tie
    assert(top.map(_.getLong(0)).toSeq == Seq(3L, 6L, 9L, 12L, 15L, 18L))
    val ws = top.map(_.getDouble(2))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
  }
}
