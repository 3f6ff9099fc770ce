package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns traveling next to typed
  * metadata — the layout used by large-scale multimodal training pipelines
  * (and by Spark's own `binaryFile` source). The Spark-side machinery here
  * is real and tested: schema, partition-friendly batch processing via
  * mapPartitions over an iterator (the Scala analogue of the mapInPandas
  * batch shape), and deterministic metadata extraction. The GRFT raw-gray
  * format is handled END-TO-END for real: pixel decode (channel-averaged
  * gray), resize/re-encode ([[graft.ops.Phash.reencodeGray]]), and a
  * genuine DCT perceptual hash ([[graft.ops.Phash.phash64]]) feeding the
  * near-dup core. Standard STILL-IMAGE containers (PNG/JPEG/GIF/BMP/
  * TIFF) also decode for real on the pHash path, via the JDK's own
  * `javax.imageio`, and AUDIO containers (WAV/AIFF/AU) decode for real
  * on the [[AudioHash]] fingerprint path via `javax.sound.sampled` —
  * both zero added dependencies. The only remaining STUB is VIDEO (and
  * compressed-audio, e.g. MP3) container decode — no such codec ships
  * in the JDK — behind [[StubCodec]], which parses the deterministic
  * GRFT header instead of invoking ffmpeg. Swap `StubCodec.decode` for
  * a real JNI/lib call and nothing else changes.
  */
object Multimodal {

  /** media row: payload + declared type; metadata struct filled by decode. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("payload", BinaryType)))

  /** Deterministic fake codec. Header layout (all big-endian):
    * bytes 0-3 magic "GRFT", 4-7 width, 8-11 height, 12-15 channels;
    * the remainder is "pixel" data. A real implementation would call an
    * image library here — the `???`-equivalent boundary is this object. */
  object StubCodec {
    final case class Meta(width: Int, height: Int, channels: Int,
        nBytes: Long, checksum: Long, valid: Boolean)

    def encode(width: Int, height: Int, channels: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + body.length)
      bb.put("GRFT".getBytes("ASCII")).putInt(width).putInt(height)
        .putInt(channels).put(body)
      bb.array()
    }

    /** STUB decode: validates the fake header and derives metadata. */
    def decode(payload: Array[Byte]): Meta = {
      if (payload == null || payload.length < 16 ||
          new String(payload.take(4), "ASCII") != "GRFT")
        return Meta(0, 0, 0, if (payload == null) 0 else payload.length, 0L, valid = false)
      val bb = java.nio.ByteBuffer.wrap(payload)
      bb.position(4)
      val (w, h, c) = (bb.getInt, bb.getInt, bb.getInt)
      // cheap deterministic checksum standing in for perceptual hashing
      var sum = 1469598103934665603L
      var i = 16
      while (i < payload.length) { sum = (sum ^ payload(i)) * 1099511628211L; i += 1 }
      Meta(w, h, c, payload.length.toLong, sum, valid = true)
    }

    /** STUB resize: a real implementation re-encodes pixels; the stub
      * rewrites the header and truncates/pads the body proportionally so
      * the plumbing (size changes, schema stays) is exercised. */
    def resize(payload: Array[Byte], newW: Int, newH: Int): Array[Byte] = {
      val m = decode(payload)
      if (!m.valid) return payload
      val scale = (newW.toLong * newH) / math.max(1L, m.width.toLong * m.height)
      val body = payload.drop(16)
      val newBody = Array.tabulate(
        math.max(1, (body.length * math.max(1L, scale)).toInt min body.length))(
        i => body(i % math.max(1, body.length)))
      encode(newW, newH, m.channels, newBody)
    }
  }

  /** Build a deterministic media table from the documents table: the text
    * bytes become the "pixels". Stands in for `spark.read.format
    * ("binaryFile")` against a real media lake. */
  def syntheticMedia(docs: DataFrame, channels: Int = 3): DataFrame = {
    val enc = udf { (docId: Long, text: String) =>
      val body = text.getBytes("UTF-8")
      StubCodec.encode((docId % 640).toInt + 1, (docId % 480).toInt + 1,
        channels, body)
    }
    docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("media_type"),
      enc(col("doc_id"), col("text")).as("payload"))
  }

  /** A 2-D synthetic image corpus for the PERCEPTUAL paths: the text is
    * split into 64 segments, each FNV-hashed to one gray level in
    * [30, 220], and the resulting 8×8 mosaic is rendered at the doc's
    * w×h. Design constraints, all load-bearing for a pHash fixture:
    * the mosaic's bandwidth is exactly the DCT low-frequency block (so
    * every image carries genuine 2-D signal — [[syntheticMedia]]'s
    * row-major wrap can collapse to a 1-D strip that correctly lands in
    * [[Phash.phash64]]'s no-signal sentinel, useless as a merge
    * fixture); segment hashing gives avalanche, so texts differing by
    * even one byte render decorrelated images (a plain byte-stretch
    * leaves near-collisions between unrelated texts — measured hamming
    * 2 — because a shared mod-wrap sawtooth dominates every doc), while
    * EQUAL texts render identical images; the [30, 220] range keeps
    * moderate brightness shifts clip-free; and a single channel means
    * [[Phash.reencodeGray]] variants decode to exactly the original
    * gray values plus the shift. */
  def syntheticMedia2D(docs: DataFrame): DataFrame = {
    val enc = udf { (docId: Long, text: String) =>
      val t = text.getBytes("UTF-8")
      val cells = new Array[Byte](64)
      var ci = 0
      while (ci < 64) {
        val from = ci * t.length / 64
        val to = math.max(from + 1, (ci + 1) * t.length / 64)
        var fnv = 1469598103934665603L
        var i = from
        while (i < math.min(to, t.length)) {
          fnv = (fnv ^ t(i)) * 1099511628211L; i += 1
        }
        cells(ci) = (30 + java.lang.Long.remainderUnsigned(fnv, 191L).toInt)
          .toByte
        ci += 1
      }
      val w = (docId % 640).toInt + 1
      val h = (docId % 480).toInt + 1
      val body = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        val by = y * 8 / h
        var x = 0
        while (x < w) {
          body(y * w + x) = cells(by * 8 + x * 8 / w)
          x += 1
        }
        y += 1
      }
      StubCodec.encode(w, h, 1, body)
    }
    docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("media_type"),
      enc(col("doc_id"), col("text")).as("payload"))
  }

  private val metaSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_bytes", LongType),
    StructField("checksum", LongType),
    StructField("valid", BooleanType)))

  /** Batch decode via mapPartitions — one codec context per partition, rows
    * streamed through it (the Scala shape of a pandas-batch UDF: amortized
    * setup, iterator in / iterator out, no per-row driver work). */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "media_type", "payload").rdd
      .mapPartitions { rows =>
        // a real codec would init native handles here, once per partition
        rows.map { r =>
          val m = StubCodec.decode(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), r.getString(1), m.width, m.height, m.channels,
            m.nBytes, m.checksum, m.valid)
        }
      }
    spark.createDataFrame(rdd, metaSchema)
  }

  // ---- media dedup: signature columns feeding the text dedup cores ----

  /** Valid-GRFT-header check as a pure column expression (magic bytes +
    * minimum header length) — gates dedup participation so a corrupt
    * payload is KEPT, never merged into the checksum-0 garbage group.
    * NULL-safe: a NULL payload is invalid (false), never NULL — a
    * three-valued result here would let a NULL-payload row fall through
    * BOTH the valid and the NOT-valid branch of the exact keep rule and
    * silently vanish. */
  def isGrft(payloadCol: String): Column =
    coalesce(
      expr(s"length(`$payloadCol`) >= 16 AND " +
        s"CAST(substring(`$payloadCol`, 1, 4) AS STRING) = 'GRFT'"),
      lit(false))

  /** pHash participation gate: GRFT raw-gray OR a standard still-image
    * container the JDK's ImageIO decodes (PNG/JPEG/GIF/BMP/TIFF —
    * magic-byte sniff, the column twin of [[Phash.looksLikeImage]]).
    * A payload passing the sniff but failing actual decode still hashes
    * to the 0L sentinel and is kept; payloads failing the sniff
    * (audio/video/arbitrary binary) never pay a decode attempt.
    * NULL-safe like [[isGrft]]. */
  def isPhashable(payloadCol: String): Column =
    isGrft(payloadCol) || coalesce(
      expr(s"length(`$payloadCol`) >= 8 AND (" +
        s"substring(`$payloadCol`, 1, 4) = X'89504E47' OR " +   // PNG
        s"substring(`$payloadCol`, 1, 3) = X'FFD8FF' OR " +     // JPEG
        s"substring(`$payloadCol`, 1, 4) = X'47494638' OR " +   // GIF8
        s"substring(`$payloadCol`, 1, 2) = X'424D' OR " +       // BMP
        s"substring(`$payloadCol`, 1, 4) = X'49492A00' OR " +   // TIFF LE
        s"substring(`$payloadCol`, 1, 4) = X'4D4D002A')"),      // TIFF BE
      lit(false))

  /** The payload BODY (bytes past the 16-byte header) decoded as a
    * string. The stub codec's "pixels" ARE text bytes (syntheticMedia),
    * which is what makes the DuckDB oracle able to recompute media
    * signatures from the source text; a real codec would emit decoded
    * pixels here instead — the same documented [[StubCodec]] boundary. */
  def bodyText(payloadCol: String): Column =
    expr(s"CAST(substring(`$payloadCol`, 17, " +
      s"length(`$payloadCol`) - 16) AS STRING)")

  /** Exact media dedup key: (n_bytes, body checksum) of a valid GRFT
    * payload — the key a real pipeline gets from its content-hash
    * stage. Checksum comes from [[StubCodec.decode]] (the documented
    * codec boundary); the length component makes an accidental FNV
    * collision require equal sizes too. */
  def withChecksum(media: DataFrame, payloadCol: String = "payload")
      : DataFrame =
    media
      .withColumn("__media_valid", isGrft(payloadCol))
      // native expression, not a ScalaUDF — the key computes inside the
      // same evaluation pass as the rest of the projection
      .withColumn("__checksum", graft.expressions.PipelineExpressions
        .media_checksum(col(s"`$payloadCol`")))
      .withColumn("__n_bytes", length(col(s"`$payloadCol`")).cast("long"))

  /** Stub perceptual near-dup pairs: a 64-bit simhash bit-signature
    * over the payload body's tokens, fed through the SAME banding core
    * — 4×16-bit chunk bucketing, one bucket-pair shuffle, pigeonhole-
    * EXACT hamming ≤ 3 verify — as text simhash_dedup
    * (Dedup.simhashNearDupsFromSigs). A real pipeline computes
    * pHash/aHash from decoded pixels and bands it identically; only
    * the signature function is the stub. Invalid payloads never
    * participate. Output: (id_a, id_b, hamming). */
  def mediaNearDups(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload", maxHamming: Int = 3): DataFrame = {
    val sigs = Dedup.simhashSignatures(
      media.filter(isGrft(payloadCol))
        .withColumn("__body", bodyText(payloadCol)),
      idCol, "__body")
    Dedup.simhashNearDupsFromSigs(sigs, maxHamming,
      Dedup.maxBandBucket(media))
  }

  /** Perceptual-hash signature table (id, c0..c3): [[Phash.phash64]] —
    * the real DCT pHash over the decoded gray image, NOT the token
    * simhash — split into the same 4×16-bit chunk layout the text
    * simhash core bands, so persisted indexes, banding, and the hamming
    * verify are shared verbatim. Map-side only; payloads failing the
    * container sniff ([[isPhashable]] — GRFT or a JDK-decodable
    * still-image format) are filtered before hashing, and the 0L
    * no-signal sentinel (undecodable OR perceptually flat — see
    * [[Phash.phash64]]) never enters banding, so signal-less rows are
    * always kept, like corrupt ones. */
  def phashSignatures(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame =
    media.filter(isPhashable(payloadCol))
      .select(col(s"`$idCol`").as("id"),
        graft.expressions.PipelineExpressions
          .media_phash(col(s"`$payloadCol`")).as("__ph"))
      .filter(col("__ph") =!= 0L)
      .select(col("id"),
        expr("cast((__ph >> 48) & 65535 AS INT)").as("c0"),
        expr("cast((__ph >> 32) & 65535 AS INT)").as("c1"),
        expr("cast((__ph >> 16) & 65535 AS INT)").as("c2"),
        expr("cast(__ph & 65535 AS INT)").as("c3"))

  /** Perceptual near-dup pairs via the DCT pHash: signatures from
    * [[phashSignatures]], banded and verified by the SAME 4-chunk
    * pigeonhole core as text simhash (one bucket-pair shuffle, exact
    * hamming ≤ maxHamming ≤ 3 verify, perfect recall by pigeonhole).
    * Two re-encoded variants of one image (resize, brightness) land
    * within a few bits and merge; unrelated images sit at the ~32-bit
    * background distance. Output: (id_a, id_b, hamming). */
  def mediaNearDupsPhash(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload", maxHamming: Int = 3): DataFrame =
    Dedup.simhashNearDupsFromSigs(phashSignatures(media, idCol, payloadCol),
      maxHamming, Dedup.maxBandBucket(media))

  /** Audio-container sniff as a pure column expression — WAV
    * (`RIFF…WAVE`), AIFF/AIFC (`FORM…AIF`), AU (`.snd`): the formats
    * the JDK's own `javax.sound.sampled` decodes ([[AudioHash]]'s
    * column twin). NULL-safe like [[isGrft]]; payloads passing the
    * sniff but failing actual decode hash to the 0L sentinel and are
    * always kept. */
  def isAudioContainer(payloadCol: String): Column =
    coalesce(
      expr(s"length(`$payloadCol`) >= 12 AND (" +
        s"(substring(`$payloadCol`, 1, 4) = X'52494646' AND " +       // RIFF
        s" substring(`$payloadCol`, 9, 4) = X'57415645') OR " +       // WAVE
        s"(substring(`$payloadCol`, 1, 4) = X'464F524D' AND " +       // FORM
        s" substring(`$payloadCol`, 9, 3) = X'414946') OR " +         // AIF
        s"substring(`$payloadCol`, 1, 4) = X'2E736E64')"),            // .snd
      lit(false))

  /** Audio fingerprint signature table (id, c0..c3):
    * [[AudioHash.audioHash64]] — the envelope-spectrum hash over the
    * DECODED PCM — split into the same 4×16-bit chunk layout as text
    * simhash and image pHash, so persisted indexes, banding, and the
    * hamming verify are shared verbatim. Map-side only; payloads
    * failing the container sniff are filtered before hashing and the
    * 0L no-signal sentinel (undecodable OR silent/flat) never enters
    * banding, so signal-less rows are always kept. */
  def audioSignatures(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame =
    media.filter(isAudioContainer(payloadCol))
      .select(col(s"`$idCol`").as("id"),
        graft.expressions.PipelineExpressions
          .media_audio_hash(col(s"`$payloadCol`")).as("__ph"))
      .filter(col("__ph") =!= 0L)
      .select(col("id"),
        expr("cast((__ph >> 48) & 65535 AS INT)").as("c0"),
        expr("cast((__ph >> 32) & 65535 AS INT)").as("c1"),
        expr("cast((__ph >> 16) & 65535 AS INT)").as("c2"),
        expr("cast(__ph & 65535 AS INT)").as("c3"))

  /** Audio near-dup pairs via the envelope fingerprint: gain-scaled,
    * resampled, or re-quantized copies of one recording land within a
    * few bits and merge; unrelated recordings sit at the ~32-bit
    * background distance. Output: (id_a, id_b, hamming). */
  def mediaNearDupsAudio(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload", maxHamming: Int = 3): DataFrame =
    Dedup.simhashNearDupsFromSigs(audioSignatures(media, idCol, payloadCol),
      maxHamming, Dedup.maxBandBucket(media))

  /** A WAV fixture corpus for the audio fingerprint path: the text is
    * split into 32 segments, each FNV-hashed to one amplitude level in
    * [0.12, 0.92], rendered as a sign-alternating square carrier
    * (|sample| ≡ the segment amplitude, zero DC) playing that 32-step
    * gain staircase over ~0.4 s of 8 kHz 16-bit mono PCM. Same design
    * constraints as [[syntheticMedia2D]]: the staircase's bandwidth
    * sits inside the DCT's kept 64 coefficients (every clip carries
    * genuine envelope signal), segment hashing gives avalanche (texts
    * differing by one byte render decorrelated envelopes) while EQUAL
    * texts render identical audio, the amplitude range keeps moderate
    * gain scaling clip-free, and the constant-|amplitude| carrier
    * makes the envelope EXACT under any keep-1-in-k decimation (a
    * sine carrier would alias — its per-cell mean |amplitude| depends
    * on which phases the decimation keeps). */
  def syntheticAudioWav(docs: DataFrame): DataFrame = {
    val enc = udf { (text: String) =>
      val t = text.getBytes("UTF-8")
      val amps = new Array[Double](32)
      var ci = 0
      while (ci < 32) {
        val from = ci * t.length / 32
        val to = math.max(from + 1, (ci + 1) * t.length / 32)
        var fnv = 1469598103934665603L
        var i = from
        while (i < math.min(to, t.length)) {
          fnv = (fnv ^ t(i)) * 1099511628211L; i += 1
        }
        amps(ci) = 0.12 +
          java.lang.Long.remainderUnsigned(fnv, 801L) / 1000.0
        ci += 1
      }
      val rate = 8000f
      val n = 3200 // 0.4 s
      val pcm = new Array[Byte](n * 2)
      var f = 0
      while (f < n) {
        val amp = amps(f * 32 / n)
        val sign = if (f % 2 == 0) 1 else -1
        val v = math.rint(sign * amp * 30000.0).toInt
        pcm(f * 2) = (v & 0xff).toByte
        pcm(f * 2 + 1) = ((v >> 8) & 0xff).toByte
        f += 1
      }
      AudioHash.pcm16ToWav(pcm, rate)
    }
    docs.select(col("doc_id"), lit("audio").as("media_type"),
      enc(col("text")).as("payload"))
  }

  /** Frame-signature SETS (id, shh: array of distinct frame digests) —
    * the video-level near-dup primitive: a payload's body sliced into
    * `frameLen`-byte windows every `stride` bytes, each digested with
    * md5. Two clips cut from the same source share the frames of their
    * overlap byte-for-byte (windows align because cuts at stride
    * multiples preserve the frame grid), so frame-set CONTAINMENT
    * |A∩B|/min(|A|,|B|) is the "clip of / re-muxed copy of" relation —
    * and the whole n-gram dedup machinery (postings, bucket-pair
    * banding with the hot-gram guard, exact containment/jaccard
    * verify, the persisted incremental index) applies verbatim with
    * frames in place of word shingles. Digests are full md5 hex so an
    * external engine reproduces them from the same bytes; a deployment
    * wanting narrower postings can hash them to longs downstream.
    * Bodies shorter than `frameLen` contribute their whole body as one
    * frame; empty bodies (and non-GRFT payloads) emit nothing and are
    * always kept by the step. */
  def frameSets(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload", frameLen: Int = 64,
      stride: Int = 32): DataFrame = {
    require(frameLen >= 1 && stride >= 1,
      s"frameSets: frame_len/stride must be >= 1, got $frameLen/$stride")
    media.filter(isGrft(payloadCol))
      .select(col(s"`$idCol`").as("id"), col(s"`$payloadCol`").as("__p"))
      .filter(expr("length(__p) > 16"))
      .select(col("id"), expr(
        s"""array_distinct(transform(
           |  sequence(0, greatest(CAST(floor(
           |    (length(__p) - 16 - $frameLen) / $stride) AS INT), 0)),
           |  f -> md5(substring(__p, 17 + f * $stride, $frameLen))))"""
          .stripMargin).as("shh"))
  }

  /** Frame-sample stub: pick every `stride`-th byte offset as a "frame"
    * marker — exercises the explode-to-frames shape (one media row → N
    * frame rows) used by video pipelines. */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("frame_no", explode(expr(
        s"sequence(0, greatest(cast((n_bytes - 16) / $stride AS INT) - 1, 0))")))
      .select(col("doc_id"), col("media_type"), col("frame_no"),
        (col("frame_no") * stride + 16).as("byte_offset"))
}
