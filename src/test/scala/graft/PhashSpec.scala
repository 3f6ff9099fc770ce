package graft

import graft.ops.{Multimodal, Phash}
import graft.ops.Multimodal.StubCodec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DCT perceptual hash: re-encode invariance (integer upscale,
  * brightness shift — the transforms a real "saved at a different
  * resolution/exposure" duplicate has undergone), sensitivity (unrelated
  * images sit at the ~32-bit background distance), and the Spark-side
  * near-dup operator + pipeline step built on it. */
class PhashSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** A structured gray fixture (gradient + seeded blobs) — closer to a
    * real photo's spectrum than pure noise, so the low-frequency block
    * carries genuine signal. */
  private def fixture(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val blobs = Seq.fill(6)((rnd.nextInt(w), rnd.nextInt(h),
      20 + rnd.nextInt(60), 1 + rnd.nextInt(1 + math.min(w, h) / 3)))
    val body = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      var v = 40.0 + 120.0 * x / math.max(1, w - 1) +
        40.0 * y / math.max(1, h - 1)
      blobs.foreach { case (bx, by, amp, r) =>
        val d2 = (x - bx).toDouble * (x - bx) + (y - by).toDouble * (y - by)
        if (d2 <= r.toLong * r) v += amp
      }
      body(y * w + x) = math.max(0.0, math.min(230.0, v)).toByte
    }
    StubCodec.encode(w, h, 1, body)
  }

  test("integer upscale + brightness re-encodes stay within a few bits") {
    val dims = Seq((40, 30), (31, 17), (64, 64), (7, 5), (129, 43))
    for (((w, h), i) <- dims.zipWithIndex) {
      val p = fixture(w, h, seed = 7000 + i)
      val base = Phash.phash64(p)
      for ((scale, bright) <- Seq((2, 0), (3, 0), (1, 9), (1, -7), (2, 9))) {
        val d = Phash.hamming(base,
          Phash.phash64(Phash.reencodeGray(p, scale, bright)))
        assert(d <= 2,
          s"${w}x$h scale=$scale bright=$bright drifted $d bits")
      }
    }
  }

  test("wrapped text-body payloads (syntheticMedia shape) re-encode stable") {
    // c=3 sources: gray is a channel average, so the variant's byte
    // quantization adds up to 0.5/pixel of noise on top of the float
    // rounding — the pigeonhole threshold (3) must still hold
    // (text, bound): weak-signal bodies (a few repeated byte values →
    // tiny AC coefficients) are pHash's documented unstable case — the
    // median threshold decides on quantization noise — so they get a
    // loose bound; realistic bodies must stay inside the pigeonhole 3
    val texts = Seq(
      ("the quick brown fox jumps over the lazy dog again and again", 3),
      ("alpha beta gamma delta epsilon zeta eta theta iota kappa", 3),
      ("short", 8))
    for (((t, bound), i) <- texts.zipWithIndex) {
      val id = 17L + 13 * i
      val p = StubCodec.encode((id % 640).toInt + 1, (id % 480).toInt + 1,
        3, t.getBytes("UTF-8"))
      val d = Phash.hamming(Phash.phash64(p),
        Phash.phash64(Phash.reencodeGray(p, 2, 5)))
      assert(d <= bound, s"text fixture $i drifted $d bits")
    }
    // PERFECTLY flat gray images (period-3 byte cycle under c=3 makes
    // every channel-average identical; same for a single repeated byte)
    // have no perceptual signal: the no-signal sentinel keeps them out
    // of banding entirely instead of hashing float noise
    for (t <- Seq("a b", String.valueOf(Array.fill(400)('q')))) {
      val p = StubCodec.encode(57, 57, 3, t.getBytes("UTF-8"))
      assert(Phash.phash64(p) == 0L, s"flat image '$t' got a signal hash")
    }
  }

  test("unrelated images sit far above the merge threshold") {
    val hashes = (0 until 30).map(i =>
      Phash.phash64(fixture(20 + 7 * i % 60, 15 + 5 * i % 45, seed = 9000 + i)))
    val dists = for (i <- hashes.indices; j <- (i + 1) until hashes.length)
      yield Phash.hamming(hashes(i), hashes(j))
    assert(dists.min > 3,
      s"two unrelated fixtures within pigeonhole range (min=${dists.min})")
    // and the population mean is near the binomial(64, 1/2) center
    val mean = dists.sum.toDouble / dists.size
    assert(mean > 20 && mean < 44, s"suspicious background mean $mean")
  }

  test("undecodable payloads: zero sentinel, re-encode identity") {
    assert(Phash.phash64(null) == 0L)
    assert(Phash.phash64(Array[Byte](1, 2, 3)) == 0L)
    assert(Phash.phash64("GRFTxxxxxxxxxxxx".getBytes("ASCII")) == 0L) // empty body
    val junk = "not a grft payload".getBytes("ASCII")
    assert(Phash.reencodeGray(junk, 2, 5) eq junk)
    // near-balanced bits on a real hash (median thresholding)
    val bits = java.lang.Long.bitCount(Phash.phash64(fixture(50, 40, 1)))
    assert(bits >= 25 && bits <= 35, s"unbalanced hash: $bits bits set")
  }

  test("mediaNearDupsPhash merges re-encoded variants, step keeps originals") {
    import spark.implicits._
    val originals = (0 until 8).map { i =>
      (100L + i, fixture(30 + 11 * i, 24 + 7 * i, seed = 300 + i))
    }
    val variants = originals.take(5).flatMap { case (id, p) => Seq(
      (id + 1000, Phash.reencodeGray(p, 2, 6)),
      (id + 2000, Phash.reencodeGray(p, 3, 0))) }
    val corrupt = Seq((9001L, "broken bytes".getBytes("ASCII")),
      (9002L, "broken bytes".getBytes("ASCII")))
    val media = (originals ++ variants ++ corrupt)
      .toDF("doc_id", "payload")
      .withColumn("media_type", lit("image"))

    val pairs = Multimodal.mediaNearDupsPhash(media, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every variant pairs with its original (directly — hamming <= 3)
    originals.take(5).foreach { case (id, _) =>
      assert(pairs.contains((id + 1000, id)) || pairs.contains((id, id + 1000)),
        s"variant ${id + 1000} did not merge with $id")
      assert(pairs.contains((id + 2000, id)) || pairs.contains((id, id + 2000)),
        s"variant ${id + 2000} did not merge with $id")
    }
    // no cross-image merges, corrupt rows never pair
    pairs.foreach { case (a, b) =>
      assert(a % 1000 == b % 1000, s"unrelated merge: $a <-> $b")
      assert(a < 9000 && b < 9000, s"corrupt payload paired: $a <-> $b")
    }

    val step = graft.mat.PipelineSteps.parse(Some(Seq(Map(
      "op" -> "media_dedup", "method" -> "phash")))).head
    val kept = step.apply(media).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // every variant merged into its original; corrupt rows always kept
    val expected = originals.map(_._1).toSet ++ Set(9001L, 9002L)
    assert(kept == expected,
      s"extra=${kept diff expected} missing=${expected diff kept}")
  }
}
