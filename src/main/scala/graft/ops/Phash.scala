package graft.ops

/** DCT-based 64-bit perceptual hash (pHash) over GRFT raw-gray payloads —
  * the public-knowledge algorithm (Zauner, "Implementation and Benchmarking
  * of Perceptual Image Hash Functions", 2010; the pHash.org scheme):
  *
  *   1. decode to grayscale (channel-averaged bytes),
  *   2. box-filter downsample to a 32×32 grid,
  *   3. 2-D DCT-II, keep the top-left 8×8 low-frequency block,
  *   4. threshold each coefficient against the median of the 63 AC
  *      coefficients → 64 bits.
  *
  * Invariances that make it a NEAR-dup key rather than a checksum: the
  * box filter makes integer pixel-replication upscales land on the SAME
  * 32×32 grid (IEEE division of exact integers rounds (x·32)/w and
  * (2x·32)/(2w) identically), and a global brightness shift only moves
  * the DC coefficient, which the AC-median threshold ignores — so a
  * resized + brightness-shifted re-encode hashes within a couple of
  * float-rounding bits of its original, while unrelated images sit at
  * the binomial(64, ½) ≈ 32-bit background distance.
  *
  * Everything here is per-row compute with O(32×32) state — the source
  * image is never materialized, pixels stream through the accumulator —
  * so the expression runs map-side at any corpus scale. Two container
  * formats decode for real: the raw-gray GRFT fixture format (closing
  * the codec boundary documented in [[Multimodal.StubCodec]]), and the
  * standard still-image containers the JDK's own `javax.imageio`
  * decodes with zero added dependencies (PNG/JPEG/GIF/BMP/TIFF,
  * luminance-converted via a TYPE_BYTE_GRAY raster). Anything else —
  * audio/video containers — stays behind the StubCodec boundary and
  * hashes to the 0L no-signal sentinel (always kept, never banded).
  *
  * Reference spec: dbt-fusion has no media operators — this family comes
  * from the large-scale training-data-pipeline mandate (near-dup images
  * surviving re-encode/resize must merge).
  */
object Phash {

  /** downsampled grid edge */
  private final val N = 32
  /** low-frequency block edge kept from the DCT */
  private final val K = 8

  /** DCT-II basis, cosT(k)(n) = cos(π·(n+½)·k/N). Only the first K rows
    * are ever read, but the full square costs 8 KB once per JVM. */
  private lazy val cosT: Array[Array[Double]] =
    Array.tabulate(N, N)((k, n) => math.cos(math.Pi * (n + 0.5) * k / N))

  /** GRFT header check shared with [[Multimodal.StubCodec]]. A payload
    * must have the magic, positive dims/channels, and a non-empty body. */
  private def header(p: Array[Byte]): (Int, Int, Int) = {
    if (p == null || p.length <= 16 ||
        p(0) != 'G' || p(1) != 'R' || p(2) != 'F' || p(3) != 'T')
      return (0, 0, 0)
    val bb = java.nio.ByteBuffer.wrap(p)
    bb.position(4)
    val w = bb.getInt; val h = bb.getInt; val c = bb.getInt
    if (w <= 0 || h <= 0 || c <= 0) (0, 0, 0) else (w, h, c)
  }

  /** Gray value (0..255) of pixel (x, y): channel-average of the body
    * bytes at row-major offset, wrapping short bodies (StubCodec stores
    * however many "pixel" bytes the source had; the wrap is part of the
    * deterministic decode contract, not an approximation). */
  private def gray(p: Array[Byte], w: Int, c: Int, len: Int,
      x: Int, y: Int): Double = {
    val base = (y.toLong * w + x) * c
    var s = 0
    var ch = 0
    while (ch < c) {
      s += p(16 + ((base + ch) % len).toInt) & 0xff
      ch += 1
    }
    s.toDouble / c
  }

  /** Decoded gray accessor: (width, height, gray(x, y) in 0..255). */
  private type GrayView = (Int, Int, (Int, Int) => Double)

  /** GRFT raw-gray decode (header + channel-average accessor), or the
    * JDK ImageIO decode for standard containers, or None. */
  private def decodeAny(p: Array[Byte]): Option[GrayView] = {
    val (w, h, c) = header(p)
    if (w > 0) {
      val len = p.length - 16
      Some((w, h, (x, y) => gray(p, w, c, len, x, y)))
    } else imageIoGray(p)
  }

  /** PNG / JPEG / GIF / BMP / TIFF magic-byte sniff — the formats the
    * JDK's built-in ImageIO readers decode. Cheap pre-gate so arbitrary
    * binary (audio, video, text) never pays a reader probe. */
  private[ops] def looksLikeImage(p: Array[Byte]): Boolean =
    p != null && p.length >= 8 && {
      def at(i: Int) = p(i) & 0xff
      (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') ||
      (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) ||
      (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') ||
      (at(0) == 'B' && at(1) == 'M') ||
      (at(0) == 'I' && at(1) == 'I' && at(2) == 0x2a && at(3) == 0) ||
      (at(0) == 'M' && at(1) == 'M' && at(2) == 0 && at(3) == 0x2a)
    }

  /** Real still-image decode via `javax.imageio` (in the JDK — zero new
    * dependencies): any container ImageIO can read becomes a
    * TYPE_BYTE_GRAY raster (the standard luminance conversion), served
    * through the same accessor shape as GRFT. Undecodable or corrupt
    * payloads return None → the 0L sentinel. The ImageIO disk cache is
    * disabled once per JVM: executor threads must not contend on temp
    * files for in-memory byte arrays. */
  private def imageIoGray(p: Array[Byte]): Option[GrayView] = {
    if (!looksLikeImage(p)) return None
    imageIoInit
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val grayImg = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = grayImg.createGraphics()
        try g.drawImage(img, 0, 0, null) finally g.dispose()
        val data = grayImg.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        Some((w, h, (x, y) => (data(y * w + x) & 0xff).toDouble))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private lazy val imageIoInit: Unit = {
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** Box-filter the w×h gray image onto the N×N grid, streaming one
    * source pixel at a time into the (up to 4, or a span when w < N)
    * destination cells it overlaps. Exact fractional coverage — this is
    * what buys pixel-replication invariance. Returns row-major N×N. */
  private def downsample(get: (Int, Int) => Double, w: Int, h: Int)
      : Array[Double] = {
    val acc = new Array[Double](N * N)
    var y = 0
    while (y < h) {
      val ys0 = y.toDouble * N / h
      val ys1 = (y + 1).toDouble * N / h
      val cy0 = ys0.toInt
      val cy1 = math.min(N - 1, math.ceil(ys1).toInt - 1)
      var x = 0
      while (x < w) {
        val xs0 = x.toDouble * N / w
        val xs1 = (x + 1).toDouble * N / w
        val cx0 = xs0.toInt
        val cx1 = math.min(N - 1, math.ceil(xs1).toInt - 1)
        val g = get(x, y)
        var cy = cy0
        while (cy <= cy1) {
          val wy = math.min(ys1, cy + 1.0) - math.max(ys0, cy.toDouble)
          var cx = cx0
          while (cx <= cx1) {
            val wx = math.min(xs1, cx + 1.0) - math.max(xs0, cx.toDouble)
            acc(cy * N + cx) += wx * wy * g
            cx += 1
          }
          cy += 1
        }
        x += 1
      }
      y += 1
    }
    // each cell's total coverage is (w/N)·(h/N); normalize to a mean gray
    val scale = N.toDouble * N / (w.toDouble * h)
    var i = 0
    while (i < acc.length) { acc(i) *= scale; i += 1 }
    acc
  }

  /** Top-left K×K block of the 2-D DCT-II (unnormalized — a fixed
    * positive per-coefficient scale cannot move a median comparison),
    * via the separable row-then-column form: O(K·N²) instead of O(N⁴). */
  private def dctLowFreq(img: Array[Double]): Array[Double] = {
    // t(u)(x) = Σ_y cos[u][y] · img(y, x)
    val t = Array.ofDim[Double](K, N)
    var u = 0
    while (u < K) {
      val cu = cosT(u)
      var x = 0
      while (x < N) {
        var s = 0.0
        var y = 0
        while (y < N) { s += cu(y) * img(y * N + x); y += 1 }
        t(u)(x) = s
        x += 1
      }
      u += 1
    }
    val out = new Array[Double](K * K)
    u = 0
    while (u < K) {
      val tu = t(u)
      var v = 0
      while (v < K) {
        val cv = cosT(v)
        var s = 0.0
        var x = 0
        while (x < N) { s += cv(x) * tu(x); x += 1 }
        out(u * K + v) = s
        v += 1
      }
      u += 1
    }
    out
  }

  /** 64-bit pHash of a GRFT or standard still-image payload; 0L for
    * undecodable payloads (the callers filter the zero sentinel out of
    * banding so it never clusters — same contract as the body
    * checksum). Bit (u·8+v) is set iff DCT coefficient (u, v) exceeds
    * the median of the 63 AC coefficients; the DC coefficient competes
    * against the same median (deterministic; brightness moves only DC
    * and real images keep DC ≫ median either way). */
  def phash64(p: Array[Byte]): Long = {
    val view = decodeAny(p)
    if (view.isEmpty) return 0L
    val (w, h, get) = view.get
    thresholdBits(dctLowFreq(downsample(get, w, h)))
  }

  /** 64 DCT coefficients → 64 bits against the AC median, with the flat
    * and weak-signal sentinels. Shared by the image hash and the audio
    * envelope hash ([[AudioHash]]) — the same spectral-sign scheme, so
    * the 4×16-bit chunk banding and hamming verify apply verbatim.
    *
    * Flat guard: a (near-)constant input has every AC coefficient at
    * float-noise scale — the median threshold would emit pure noise
    * bits (the documented unstable case of pHash). No perceptual signal
    * means no near-dup claim: emit the same 0L no-signal sentinel as an
    * undecodable payload, and the callers keep the row out of banding.
    * Sub-float-noise coefficients snap to EXACT zero (an input constant
    * along one axis has most coefficients at 0 in exact arithmetic but
    * ±1e-14·maxAc in floats — those noise signs would destroy re-encode
    * invariance; 1e-9 relative is orders above float noise and orders
    * below any real signal coefficient), and fewer than 16 live AC
    * coefficients is the weak-signal sentinel — too few meaningful bits
    * to band at hamming ≤ 3. */
  private[ops] def thresholdBits(coef: Array[Double]): Long = {
    require(coef.length == 64, s"thresholdBits expects 64 coefficients")
    var maxAc = 0.0
    var j = 1
    while (j < coef.length) {
      val a = math.abs(coef(j)); if (a > maxAc) maxAc = a; j += 1
    }
    if (maxAc < 1e-6 * math.max(1.0, math.abs(coef(0)))) return 0L
    val snap = 1e-9 * maxAc
    var nSignal = 0
    j = 1
    while (j < coef.length) {
      if (math.abs(coef(j)) < snap) coef(j) = 0.0 else nSignal += 1
      j += 1
    }
    if (nSignal < 16) return 0L
    val ac = java.util.Arrays.copyOfRange(coef, 1, coef.length)
    java.util.Arrays.sort(ac)
    val med = ac(ac.length / 2) // 63 values → true median at index 31
    var bits = 0L
    var i = 0
    while (i < coef.length) {
      if (coef(i) > med) bits |= 1L << (63 - i)
      i += 1
    }
    bits
  }

  /** Hamming distance between two 64-bit hashes (test/debug helper). */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Re-encode a GRFT payload as a single-channel gray image: decode
    * (channel-average + wrap, the same decode [[phash64]] sees), scale
    * dims by integer pixel replication, shift brightness (clamped to
    * 0..255), and emit a fresh GRFT container with channels = 1. This is
    * the "save the image at a different resolution/exposure" transform a
    * real pipeline meets — the pHash of the result lands within a few
    * bits of the original's. Undecodable payloads return unchanged. */
  def reencodeGray(p: Array[Byte], scale: Int, brightness: Int)
      : Array[Byte] = {
    val (w, h, c) = header(p)
    if (w == 0) return p
    require(scale >= 1, s"reencodeGray: scale must be >= 1, got $scale")
    val len = p.length - 16
    val nw = w * scale
    val nh = h * scale
    val body = new Array[Byte](nw * nh)
    var y = 0
    while (y < nh) {
      var x = 0
      while (x < nw) {
        val g = gray(p, w, c, len, x / scale, y / scale) + brightness
        body(y * nw + x) = math.max(0.0, math.min(255.0, math.rint(g))).toByte
        x += 1
      }
      y += 1
    }
    Multimodal.StubCodec.encode(nw, nh, 1, body)
  }
}
