package graft

import graft.expressions.PipelineExpressions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests pinning the native expressions to the SQL formulations
  * they replaced: for random inputs, both computations must agree
  * bit-for-bit (the same contract the DuckDB oracles check on the fixed
  * test tables, here over adversarial generated data). Evaluation is
  * batched — one DataFrame pass per property with both formulations as
  * columns — so hundreds of cases cost one Spark job. */
class ExpressionPropertySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
  /** Texts with irregular spacing: runs of spaces, leading/trailing. */
  private val textGen: Gen[String] = for {
    words <- Gen.listOfN(30, wordGen).map(_.take(30))
    n <- Gen.chooseNum(0, 30)
    seps <- Gen.listOfN(n + 1, Gen.chooseNum(1, 3).map(" " * _))
  } yield seps.zipAll(words.take(n), "", "").flatMap(p => Seq(p._1, p._2)).mkString

  test("MediaChecksum matches StubCodec.decode over random payloads") {
    import graft.ops.Multimodal.StubCodec
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val payloads: Seq[Array[Byte]] = (0 until 200).map { i =>
      i % 5 match {
        case 0 => StubCodec.encode(rnd.nextInt(640) + 1,
          rnd.nextInt(480) + 1, 3,
          Array.fill(rnd.nextInt(200))(rnd.nextInt().toByte))
        case 1 => Array.fill(rnd.nextInt(10))(rnd.nextInt().toByte)
        case 2 => Array.fill(20 + rnd.nextInt(50))(rnd.nextInt().toByte)
        case 3 => StubCodec.encode(1, 1, 1, Array.emptyByteArray)
        case _ => StubCodec.encode(9, 9, 3,
          Array.fill(1000)(rnd.nextInt().toByte))
      }
    }
    val expected = payloads.map(p => StubCodec.decode(p).checksum)
    val got = payloads.toDF("p")
      .select(PipelineExpressions.media_checksum(col("p")).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected)
  }

  test("SubwordCount matches the aggregate/split HOF formulation") {
    import spark.implicits._
    val texts = Gen.listOfN(300, textGen).sample.get
    val df = texts.toDF("t")
      .withColumn("native", PipelineExpressions.subword_count(col("t")))
      .withColumn("hof", expr(
        """aggregate(split(trim(t), ' +'), 0L,
          |  (acc, w) -> acc + CASE WHEN length(w) = 0 THEN 0
          |    ELSE cast(ceil(length(w) / 4.0) AS BIGINT) END)""".stripMargin))
    val bad = df.filter(col("native") =!= col("hof")).collect()
    assert(bad.isEmpty, bad.take(3).mkString(" | "))
  }

  test("RepetitionStats invariants and HOF cross-check") {
    import spark.implicits._
    val texts = Gen.listOfN(300, textGen).sample.get
    val df = texts.toDF("t")
      .withColumn("r", PipelineExpressions.repetition_stats(col("t")))
      .withColumn("n_hof", expr(
        "CASE WHEN length(trim(t)) = 0 THEN 0L ELSE cast(size(split(trim(t), ' +')) AS BIGINT) END"))
      .withColumn("nd_hof", expr(
        "CASE WHEN length(trim(t)) = 0 THEN 0L ELSE cast(size(array_distinct(split(trim(t), ' +'))) AS BIGINT) END"))
    val bad = df.filter(
      col("r.n_words") =!= col("n_hof") ||
        col("r.n_distinct_words") =!= col("nd_hof") ||
        col("r.n_distinct_words") > col("r.n_words") ||
        (col("r.n_words") > 1 &&
          col("r.top_bigram_count") > col("r.n_words") - 1) ||
        (col("r.n_words") > 1 && col("r.top_bigram_count") < 1))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString(" | "))
  }

  test("HyperplaneSig agrees with the interpreted SQL mega-expression") {
    import spark.implicits._
    val dim = 16
    val bits = 12
    val weights = Array.tabulate(bits, dim)((b, d) =>
      graft.ops.Similarity.hyperplaneWeight(b, d))
    val vecGen = Gen.listOfN(dim,
      Gen.chooseNum(-1000, 1000).map(_ / 317.0f)).map(_.toArray)
    val vecs = Gen.listOfN(150, vecGen).sample.get
    val df = vecs.map(v => Tuple1(v)).toDF("v")
      .withColumn("native", PipelineExpressions.hyperplane_sig(col("v"), weights))
    // the SQL formulation HyperplaneSig replaced (integer quantization ×
    // integer weights, bit set when dot > 0)
    val sqlBits = (0 until bits).map { b =>
      val dot = (0 until dim).map { d =>
        s"cast(round(cast(v[$d] AS DOUBLE) * 1000000) AS BIGINT) * ${weights(b)(d)}L"
      }.mkString(" + ")
      s"CASE WHEN ($dot) > 0 THEN ${1L << b}L ELSE 0L END"
    }.mkString(" + ")
    val out = df.withColumn("sql", expr(sqlBits))
    val bad = out.filter(col("native") =!= col("sql")).collect()
    assert(bad.isEmpty, bad.take(3).mkString(" | "))
  }

  test("NearestCentroids matches a reference decimal argmin, ties to lower index") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val dim = 16
    val centroids: Array[Array[Double]] =
      Array.fill(5)(Array.fill(dim)(rnd.nextDouble() - 0.5))
    def refNearest(v: Array[Float], nprobe: Int): Seq[Int] = {
      // the documented contract, written independently: per-dim
      // (double-exact diff)² → DECIMAL(38,18) HALF_UP → exact sum;
      // ascending by (distance, index)
      val dists = centroids.map { c =>
        v.zip(c).map { case (x, cd) =>
          val diff = x.toDouble - cd
          new java.math.BigDecimal(diff * diff)
            .setScale(18, java.math.RoundingMode.HALF_UP)
        }.foldLeft(java.math.BigDecimal.ZERO)(_ add _)
      }
      dists.zipWithIndex.sortBy { case (d, i) => (d, i) }(
        Ordering.Tuple2(Ordering.ordered[java.math.BigDecimal](identity),
          Ordering.Int)).map(_._2).take(nprobe).toSeq
    }
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.fill(dim)((rnd.nextDouble() - 0.5).toFloat)))
    // include exact-tie vectors: a point equidistant from duplicated
    // centroids must pick the LOWER index
    val tied = centroids(2).map(_.toFloat)
    val all = vecs :+ (999L, tied)
    val dupCentroids = centroids :+ centroids(2) // index 5 duplicates 2
    val got = all.toDF("id", "v")
      .withColumn("near",
        PipelineExpressions.nearest_centroids(col("v"), dupCentroids, 3))
      .select("id", "near").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    all.foreach { case (id, v) =>
      val expect = {
        val dists = dupCentroids.map { c =>
          v.zip(c).map { case (x, cd) =>
            val diff = x.toDouble - cd
            new java.math.BigDecimal(diff * diff)
              .setScale(18, java.math.RoundingMode.HALF_UP)
          }.foldLeft(java.math.BigDecimal.ZERO)(_ add _)
        }
        dists.zipWithIndex.sortBy { case (d, i) => (d, i) }(
          Ordering.Tuple2(Ordering.ordered[java.math.BigDecimal](identity),
            Ordering.Int)).map(_._2).take(3).toSeq
      }
      assert(got(id) == expect, s"vec $id: got ${got(id)} expect $expect")
    }
    // the tied vector prefers centroid 2 over its duplicate at index 5
    assert(got(999L).head == 2)
  }

  test("MinHashSig estimates Jaccard within tolerance of exact") {
    import spark.implicits._
    // near-dup pairs: element sets sharing ~80% of their members. The
    // elements are SPREAD over 64 bits first (Fibonacci hashing) — the
    // affine permutation family is monotonic on small raw integers (no
    // mod-wraparound), so MinHashSig's contract is uniformly-distributed
    // input hashes, which xxhash64 shingle hashes are in production.
    def spread(x: Long): Long = x * 0x9E3779B97F4A7C15L
    val base = (0L until 200L).map(spread).toSet
    val variants = (0 until 20).map { i =>
      (i.toLong, base -- (i * 7 until i * 7 + 40).map(x => spread(x.toLong)))
    }
    val df = variants.map { case (id, s) => (id, s.toSeq.sorted) }
      .toDF("id", "els")
      .withColumn("sig", PipelineExpressions.minhash_sig(col("els"), 128))
    val sigs = df.select("id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (a <- variants; b <- variants if a._1 < b._1) {
      val exact = (a._2 & b._2).size.toDouble / (a._2 | b._2).size
      val est = sigs(a._1).zip(sigs(b._1)).count(p => p._1 == p._2) / 128.0
      assert(math.abs(exact - est) < 0.2,
        s"pair (${a._1},${b._1}): exact=$exact est=$est")
    }
  }

  test("Dec18Acc ≡ BigDecimal setScale(18, HALF_UP) sum, bit for bit") {
    def reference(ts: Seq[Double]): java.math.BigDecimal =
      ts.foldLeft(java.math.BigDecimal.ZERO)((acc, t) =>
        acc.add(new java.math.BigDecimal(t)
          .setScale(18, java.math.RoundingMode.HALF_UP)))
    def fast(ts: Seq[Double]): java.math.BigDecimal = {
      val a = new PipelineExpressions.Dec18Acc
      ts.foreach(a.add)
      a.toBigDecimal
    }
    def check(ts: Seq[Double], label: String): Unit = {
      val r = reference(ts)
      val f = fast(ts)
      assert(r.compareTo(f) == 0 && r.scale >= 18,
        s"$label: reference=$r fast=$f inputs=${ts.take(8)}")
      // doubleValue must match bit-for-bit too (the DotExact output)
      assert(java.lang.Double.doubleToLongBits(r.doubleValue()) ==
        java.lang.Double.doubleToLongBits(f.doubleValue()), label)
    }
    val rnd = new scala.util.Random(20260819L)
    // magnitudes from subnormal to slow-path (|t| ≥ 2^53), both signs
    (0 until 200).foreach { i =>
      val ts = (0 until 64).map { _ =>
        val m = rnd.nextLong() & ((1L << 52) - 1) | (1L << 52)
        val e = rnd.nextInt(160) - 130 // 2^-130 .. 2^29 around the mantissa
        val mag = m.toDouble * math.pow(2.0, e - 52)
        if (rnd.nextBoolean()) mag else -mag
      }
      check(ts, s"random-$i")
    }
    // exact .5 ties at scale 18: odd m · 2^-19 makes t·10^18 end in .5
    val ties = (0 until 64).map { _ =>
      val m = (rnd.nextLong() & ((1L << 52) - 1)) | (1L << 52) | 1L
      val v = m.toDouble / (1L << 19).toDouble
      if (rnd.nextBoolean()) v else -v
    }
    check(ties, "half-up ties")
    // subnormals round to zero at scale 18
    check(Seq(java.lang.Double.MIN_VALUE, -java.lang.Double.MIN_VALUE,
      2.5e-19, -2.5e-19, 4.9999e-19, 5.0001e-19), "tiny")
    // slow-path terms (≥ 2^53) mixed with fast ones
    check(Seq(1.23456789e18, -9.87e15, 3.14159, -2.71828e17, 1e-18),
      "mixed slow/fast")
    // spill: many large-magnitude terms exceed the 2^62 hi threshold
    check((0 until 20000).map(j =>
      (if (j % 2 == 0) 1 else -1) * 4.4e15 + j), "spill")
    // float products — the DotExact input shape
    check((0 until 64).map(_ =>
      rnd.nextFloat().toDouble * rnd.nextFloat().toDouble), "float products")
    // non-finite terms throw exactly like the reference
    intercept[NumberFormatException] {
      val a = new PipelineExpressions.Dec18Acc
      a.add(Double.NaN)
    }
    intercept[NumberFormatException] {
      val a = new PipelineExpressions.Dec18Acc
      a.add(Double.PositiveInfinity)
    }
  }

  test("count-min double hashing: estimates never undercount random data") {
    import graft.ops.Sketch
    import spark.implicits._
    // adversarial key mix: random strings plus near-identical siblings
    // (stress the Kirsch-Mitzenmacher family's independence across rows)
    val keys = Gen.listOfN(120, wordGen).sample.get
      .flatMap(w => Seq(w, w + "0", w + "1"))
    val rnd = new scala.util.Random(42)
    val rows = keys.flatMap(k => Seq.fill(1 + rnd.nextInt(5))(k))
    val truth = rows.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    val df = rows.toDF("k")
    for ((w, d) <- Seq((8, 2), (64, 3), (1024, 4))) {
      val est = Sketch.estimate(
        Sketch.countMin(df, "k", w, d),
        truth.keys.toSeq.toDF("k"), "k", w, d)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      truth.foreach { case (k, n) =>
        assert(est(k) >= n, s"w=$w d=$d undercounts '$k': ${est(k)} < $n") }
    }
  }
}
