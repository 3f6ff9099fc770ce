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

  // ---- real image containers via the JDK's ImageIO ----

  /** The [[fixture]] gray content rendered into a real AWT image. */
  private def awtFixture(w: Int, h: Int, seed: Int)
      : java.awt.image.BufferedImage = {
    val grft = fixture(w, h, seed)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      raster.setSample(x, y, 0, grft(16 + y * w + x) & 0xff)
    img
  }

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Integer pixel-replication upscale + brightness — the same
    * re-encode transform [[Phash.reencodeGray]] applies to GRFT, on a
    * real raster. */
  private def rescale(img: java.awt.image.BufferedImage, scale: Int,
      brightness: Int): java.awt.image.BufferedImage = {
    val w = img.getWidth * scale
    val h = img.getHeight * scale
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val in = img.getRaster
    val o = out.getRaster
    for (y <- 0 until h; x <- 0 until w) {
      val v = in.getSample(x / scale, y / scale, 0) + brightness
      o.setSample(x, y, 0, math.max(0, math.min(255, v)))
    }
    out
  }

  test("real PNG containers decode via ImageIO: a PNG re-encode pair " +
      "hashes within the pigeonhole threshold, PNG and GRFT renderings " +
      "of the same pixels hash identically") {
    val img = awtFixture(48, 36, seed = 4100)
    val png = encodePng(img)
    assert(Multimodal.StubCodec.decode(png).valid == false,
      "a PNG must not parse as GRFT")
    val base = Phash.phash64(png)
    assert(base != 0L, "PNG decode produced the no-signal sentinel")
    // identical pixels through either container → identical hash (both
    // decode paths feed the same downsample/DCT core)
    assert(base == Phash.phash64(fixture(48, 36, seed = 4100)),
      "PNG and GRFT decodes of the same gray pixels disagree")
    // upscale + brightness re-encode (saved-at-a-different-resolution)
    val variant = encodePng(rescale(img, 2, 6))
    val d = Phash.hamming(base, Phash.phash64(variant))
    assert(d <= 2, s"PNG re-encode drifted $d bits")
    // a lossy JPEG re-encode of the same image stays within threshold
    val dJpeg = Phash.hamming(base, Phash.phash64(encodeJpeg(img)))
    assert(dJpeg <= 3, s"JPEG re-encode drifted $dJpeg bits")
    // unrelated PNGs sit at background distance
    val other = Phash.phash64(encodePng(awtFixture(40, 50, seed = 4777)))
    assert(Phash.hamming(base, other) > 3, "unrelated PNGs within threshold")
  }

  test("method: phash accepts a mixed GRFT + PNG/JPEG corpus — " +
      "cross-container variants of one image merge") {
    import spark.implicits._
    val img = awtFixture(44, 33, seed = 4200)
    val rows = Seq(
      (1L, fixture(44, 33, seed = 4200)),          // GRFT original
      (2L, encodePng(img)),                        // PNG of the same pixels
      (3L, encodeJpeg(rescale(img, 2, 4))),        // lossy rescaled JPEG
      (4L, encodePng(awtFixture(30, 41, seed = 4300))), // unrelated PNG
      (5L, "mp3-ish arbitrary binary".getBytes("ASCII"))) // non-image
    val media = rows.toDF("doc_id", "payload")
      .withColumn("media_type", lit("image"))
    val step = graft.mat.PipelineSteps.parse(Some(Seq(Map(
      "op" -> "media_dedup", "method" -> "phash")))).head
    val kept = step.apply(media).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L),
      s"cross-container variants must merge into doc 1; non-image and " +
        s"unrelated rows stay (got $kept)")
  }
}
