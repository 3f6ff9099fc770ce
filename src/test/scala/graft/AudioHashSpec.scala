package graft

import graft.ops.{AudioHash, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The envelope-spectrum audio fingerprint: re-encode invariance (gain,
  * resampling, 8-bit quantization — the transforms a real "same
  * recording, different master" duplicate has undergone), sensitivity
  * (unrelated recordings at the ~32-bit background distance), the
  * no-signal sentinels, and the Spark-side near-dup operator + pipeline
  * step built on it. */
class AudioHashSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Seeded 32-step amplitude staircase on a sign-alternating carrier
    * (the syntheticAudioWav shape) — 0.4 s of 8 kHz 16-bit mono WAV. */
  private def fixture(seed: Int, rate: Float = 8000f,
      n: Int = 3200): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val amps = Array.fill(32)(0.12 + rnd.nextInt(801) / 1000.0)
    val pcm = new Array[Byte](n * 2)
    for (f <- 0 until n) {
      val amp = amps(f * 32 / n)
      val v = math.rint((if (f % 2 == 0) 1 else -1) * amp * 30000.0).toInt
      pcm(f * 2) = (v & 0xff).toByte
      pcm(f * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    AudioHash.pcm16ToWav(pcm, rate)
  }

  test("gain, resampling, and 8-bit re-encodes stay within a few bits") {
    for (seed <- Seq(11, 47, 300, 901)) {
      val p = fixture(seed)
      val base = AudioHash.audioHash64(p)
      assert(base != 0L, s"seed $seed hit the no-signal sentinel")
      // gain (clip-free: max amp 0.92 × 1.08 < full scale — clipping
      // is genuine signal distortion, not a re-encode) and resampling
      // are EXACT invariances: every coefficient scales uniformly /
      // the duration-fraction envelope is identical
      for ((label, variant) <- Seq(
        ("gain x0.6", AudioHash.reencode(p, 0.6)),
        ("gain x1.08", AudioHash.reencode(p, 1.08)),
        ("decimate 2", AudioHash.reencode(p, 1.0, decimate = 2)),
        ("decimate 5", AudioHash.reencode(p, 1.0, decimate = 5)))) {
        val d = AudioHash.hamming(base, AudioHash.audioHash64(variant))
        assert(d <= 3, s"seed $seed $label drifted $d bits")
      }
      // 8-bit quantization is APPROXIMATE: ±2^-8 sample noise can flip
      // DCT coefficients sitting within a fraction of a percent of the
      // AC median — near-threshold, not near-guaranteed (the banding
      // core merges ≤ 3; an 8-bit master merges when its noise lands
      // kindly, measured 0-4 bits on these fixtures)
      for ((label, variant) <- Seq(
        ("8-bit", AudioHash.reencode(p, 1.0, quantize8 = true)),
        ("gain+dec+8bit",
          AudioHash.reencode(p, 0.8, decimate = 2, quantize8 = true)))) {
        val d = AudioHash.hamming(base, AudioHash.audioHash64(variant))
        assert(d <= 6, s"seed $seed $label drifted $d bits")
      }
      // the same staircase generated at a DIFFERENT sample rate is the
      // same recording: the duration-fraction envelope must agree
      val d2 = AudioHash.hamming(base,
        AudioHash.audioHash64(fixture(seed, rate = 16000f, n = 6400)))
      assert(d2 <= 3, s"seed $seed re-rated version drifted $d2 bits")
    }
  }

  test("silence, constant hum, junk, and image bytes all hit the 0L sentinel") {
    // silence: zero envelope, flat guard
    assert(AudioHash.audioHash64(
      AudioHash.pcm16ToWav(new Array[Byte](6400), 8000f)) == 0L)
    // constant |amplitude| hum: flat envelope, no AC signal
    val hum = new Array[Byte](6400)
    for (f <- 0 until 3200) {
      val v = if (f % 2 == 0) 15000 else -15000
      hum(f * 2) = (v & 0xff).toByte
      hum(f * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    assert(AudioHash.audioHash64(AudioHash.pcm16ToWav(hum, 8000f)) == 0L)
    assert(AudioHash.audioHash64(null) == 0L)
    assert(AudioHash.audioHash64("RIFFxxxxWAVEgarbage".getBytes("ASCII")) == 0L)
    assert(AudioHash.audioHash64(Array[Byte](1, 2, 3)) == 0L)
    // a PNG is not audio (and an audio payload is not an image —
    // phash64's decode sniff rejects it to the same sentinel)
    assert(!AudioHash.looksLikeAudio(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 0, 0, 0, 0, 0, 0, 0)))
    assert(graft.ops.Phash.phash64(fixture(1)) == 0L)
    // reencode leaves non-audio untouched
    val junk = "not audio".getBytes("ASCII")
    assert(AudioHash.reencode(junk, 2.0) eq junk)
  }

  test("unrelated recordings sit far above the merge threshold") {
    val hashes = (0 until 30).map(i => AudioHash.audioHash64(fixture(5000 + i)))
    assert(hashes.forall(_ != 0L))
    val dists = for (i <- hashes.indices; j <- (i + 1) until hashes.length)
      yield AudioHash.hamming(hashes(i), hashes(j))
    assert(dists.min > 3,
      s"two unrelated fixtures within pigeonhole range (min=${dists.min})")
    val mean = dists.sum.toDouble / dists.size
    assert(mean > 20 && mean < 44, s"suspicious background mean $mean")
  }

  test("method: audio merges re-encoded variants through the step; " +
      "originals and corrupt rows survive") {
    import spark.implicits._
    val originals = (0 until 8).map(i => (100L + i, fixture(700 + i)))
    val variants = originals.take(5).flatMap { case (id, p) => Seq(
      (id + 1000, AudioHash.reencode(p, 0.7)),
      (id + 2000, AudioHash.reencode(p, 1.0, decimate = 2))) }
    val corrupt = Seq((9001L, "broken bytes".getBytes("ASCII")))
    val media = (originals ++ variants ++ corrupt)
      .toDF("doc_id", "payload")
      .withColumn("media_type", lit("audio"))

    val pairs = Multimodal.mediaNearDupsAudio(media, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    originals.take(5).foreach { case (id, _) =>
      assert(pairs.contains((id + 1000, id)) || pairs.contains((id, id + 1000)),
        s"gain variant ${id + 1000} did not merge with $id")
      assert(pairs.contains((id + 2000, id)) || pairs.contains((id, id + 2000)),
        s"resampled variant ${id + 2000} did not merge with $id")
    }
    pairs.foreach { case (a, b) =>
      assert(a % 1000 == b % 1000, s"unrelated merge: $a <-> $b")
      assert(a < 9000 && b < 9000, s"corrupt payload paired: $a <-> $b")
    }

    val step = graft.mat.PipelineSteps.parse(Some(Seq(Map(
      "op" -> "media_dedup", "method" -> "audio")))).head
    val kept = step.apply(media).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == originals.map(_._1).toSet + 9001L,
      s"unexpected keep set $kept")
  }
}
