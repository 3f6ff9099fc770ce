package graft.ops

import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

/** 64-bit perceptual AUDIO fingerprint over real audio containers —
  * the envelope-spectrum twin of [[Phash]], decoded with the JDK's own
  * `javax.sound.sampled` (WAV/AIFF/AU ship in every JRE — the same
  * zero-added-dependency move as the image path's ImageIO):
  *
  *   1. decode the container to PCM, channel-averaged to mono,
  *   2. box-filter the |amplitude| stream onto a 256-cell envelope
  *      spanning the WHOLE duration (cells are fractions of total
  *      frames, so a resampled copy lands on the same envelope),
  *   3. 1-D DCT-II of the envelope, keep the 64 lowest frequencies,
  *   4. threshold against the AC median → 64 bits
  *      ([[Phash.thresholdBits]], shared verbatim with the image hash —
  *      so the 4×16-bit chunk banding, the pigeonhole hamming verify,
  *      and the persisted incremental signature indexes apply to audio
  *      unchanged).
  *
  * Invariances that make it a NEAR-dup key: GAIN (amplitude × c scales
  * every DCT coefficient and their median by the same positive factor —
  * the sign pattern is untouched, so a normalized re-master hashes
  * identically), RESAMPLING (the envelope is duration-normalized;
  * decimated or upsampled copies of one recording cover the same
  * cells), and BIT DEPTH (8-bit re-encodes move each sample < 1/128 —
  * envelope noise orders below the signal coefficients). Unrelated
  * recordings sit at the binomial(64, ½) ≈ 32-bit background distance.
  * Silence and near-constant hum have no envelope signal and emit the
  * 0L no-signal sentinel (always kept, never banded) — the same
  * contract as flat images.
  *
  * Per-row compute: one pass over the PCM with O(256) accumulator
  * state; the decoded buffer is payload-sized (as with ImageIO's
  * raster), freed per row. Map-side at any corpus scale.
  *
  * Reference spec: dbt-fusion has no media operators — this family
  * comes from the large-scale training-data-pipeline mandate
  * (re-encoded copies of one recording must merge). Algorithm is the
  * public pHash.org spectral-sign scheme applied to the public
  * "envelope over fixed time-fractions" audio-fingerprint shape.
  */
object AudioHash {

  /** envelope cells */
  private final val M = 256
  /** DCT coefficients kept (lowest frequencies) */
  private final val K = 64

  /** DCT-II basis over the envelope: cosT(k)(n) = cos(π·(n+½)·k/M). */
  private lazy val cosT: Array[Array[Double]] =
    Array.tabulate(K, M)((k, n) => math.cos(math.Pi * (n + 0.5) * k / M))

  /** WAV ("RIFF…WAVE"), AIFF/AIFC ("FORM…AIF?"), AU (".snd") magic
    * sniff — the containers the JDK's built-in readers decode. Cheap
    * pre-gate so arbitrary binary never pays a reader probe. */
  def looksLikeAudio(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 && {
      def at(i: Int) = p(i) & 0xff
      (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
        at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') ||
      (at(0) == 'F' && at(1) == 'O' && at(2) == 'R' && at(3) == 'M' &&
        at(8) == 'A' && at(9) == 'I' && at(10) == 'F') ||
      (at(0) == '.' && at(1) == 's' && at(2) == 'n' && at(3) == 'd')
    }

  /** Decode any supported container to (signed-16 LE PCM bytes,
    * channels, sample rate) — any encoding (U-law, 8-bit unsigned,
    * big-endian …) normalized at the SOURCE rate (the JDK converts
    * between these without resampling); None for undecodable payloads.
    * The decoded buffer is payload-sized, freed per row — the same
    * contract as the image path's ImageIO raster. */
  /** Raw decode — THROWS on a sniff-passing but undecodable payload
    * (the hashing path catches and sentinels; [[reencode]] must fail
    * loudly instead, or fixture breakage would silently hand the input
    * back and invariance tests would compare a hash against itself). */
  private def decodePcmRaw(p: Array[Byte]): (Array[Byte], Int, Float) = {
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(p))
    try {
      val src = ais.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels,
        src.getChannels * 2, src.getSampleRate, false)
      val pcm =
        if (src.matches(target)) ais
        else AudioSystem.getAudioInputStream(target, ais)
      (pcm.readAllBytes(), target.getChannels, target.getSampleRate)
    } finally ais.close()
  }

  private def decodePcm(p: Array[Byte])
      : Option[(Array[Byte], Int, Float)] = {
    if (!looksLikeAudio(p)) return None
    try {
      val (bytes, ch, rate) = decodePcmRaw(p)
      if (bytes.length < ch * 2) None else Some((bytes, ch, rate))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Channel-averaged signed-16 LE sample of frame `f`. */
  private def frameAvg(bytes: Array[Byte], ch: Int, f: Int): Double = {
    var s = 0.0
    var c = 0
    while (c < ch) {
      val o = f * ch * 2 + c * 2
      s += ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
      c += 1
    }
    s / ch
  }

  /** Decode to mono |amplitude| box-filtered onto the M-cell envelope;
    * None for undecodable payloads. */
  private def envelope(p: Array[Byte]): Option[Array[Double]] =
    decodePcm(p).map { case (bytes, ch, _) =>
      val n = bytes.length / (ch * 2)
      val acc = new Array[Double](M)
      var f = 0
      while (f < n) {
        val amp = math.abs(frameAvg(bytes, ch, f)) / 32768.0
        // exact fractional coverage of the cells frame f spans — the
        // 1-D twin of Phash.downsample, and what buys duration
        // normalization (a resampled copy covers the same cells)
        val x0 = f.toDouble * M / n
        val x1 = (f + 1).toDouble * M / n
        var cell = x0.toInt
        val last = math.min(M - 1, math.ceil(x1).toInt - 1)
        while (cell <= last) {
          val w = math.min(x1, cell + 1.0) - math.max(x0, cell.toDouble)
          acc(cell) += w * amp
          cell += 1
        }
        f += 1
      }
      // normalize each cell's total coverage (n/M frames) to a mean
      val scale = M.toDouble / n
      var i = 0
      while (i < M) { acc(i) *= scale; i += 1 }
      acc
    }

  /** First K coefficients of the envelope's DCT-II (unnormalized — a
    * fixed positive per-coefficient scale cannot move a median
    * comparison). */
  private def dctLow(env: Array[Double]): Array[Double] = {
    val out = new Array[Double](K)
    var k = 0
    while (k < K) {
      val ck = cosT(k)
      var s = 0.0
      var n = 0
      while (n < M) { s += ck(n) * env(n); n += 1 }
      out(k) = s
      k += 1
    }
    out
  }

  /** 64-bit audio fingerprint; 0L for undecodable or signal-less
    * payloads (silence, constant hum) — the always-kept sentinel. */
  def audioHash64(p: Array[Byte]): Long =
    envelope(p) match {
      case None => 0L
      case Some(env) => Phash.thresholdBits(dctLow(env))
    }

  /** Hamming distance (test/debug helper — same bits as the image
    * hash, same distance). */
  def hamming(a: Long, b: Long): Int = Phash.hamming(a, b)

  // ---- fixture/re-encode helpers (the transforms a real duplicate
  // has undergone; also used by the oracle fixtures) ----

  /** Wrap raw mono 16-bit LE PCM as a WAV container. */
  def pcm16ToWav(pcm: Array[Byte], sampleRate: Float): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate, 16, 1, 2, sampleRate, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt,
        pcm.length / 2),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Re-encode an audio payload the way a real pipeline meets
    * duplicates: gain × `gain`, keep-1-in-`decimate` resampling (the
    * header rate drops with it, so duration is preserved), optional
    * 8-bit quantization (still emitted as 16-bit PCM — the value grid
    * is what an 8-bit master loses). Undecodable payloads return
    * unchanged. */
  def reencode(p: Array[Byte], gain: Double, decimate: Int = 1,
      quantize8: Boolean = false): Array[Byte] = {
    require(decimate >= 1, s"reencode: decimate must be >= 1, got $decimate")
    if (!looksLikeAudio(p)) return p // non-audio passes through unchanged
    // sniff-passing but undecodable THROWS (decodePcmRaw) — a silent
    // identity here would mask fixture breakage
    val (bytes, ch, rate) = decodePcmRaw(p)
    val n = bytes.length / (ch * 2)
    val kept = (n + decimate - 1) / decimate
    val out = new Array[Byte](kept * 2)
    var i = 0
    var f = 0
    while (f < n) {
      if (f % decimate == 0) {
        var v = frameAvg(bytes, ch, f) * gain
        if (quantize8) v = math.rint(v / 256.0) * 256.0
        val q = math.max(-32768.0,
          math.min(32767.0, math.rint(v))).toInt
        out(i) = (q & 0xff).toByte
        out(i + 1) = ((q >> 8) & 0xff).toByte
        i += 2
      }
      f += 1
    }
    pcm16ToWav(out, rate / decimate)
  }
}
