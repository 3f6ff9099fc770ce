package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the pipeline operators' hot loops.
  *
  * Spark's higher-order functions (transform/aggregate/filter) are never
  * whole-stage-codegen'd — each lambda element evaluation goes through the
  * interpreter, which costs ~µs/element and minutes of JIT warmup at scale.
  * These expressions compute the same results in single tight JVM loops:
  * one virtual call per row instead of per array element. Semantics are
  * kept bit-identical to the SQL formulations used by the DuckDB oracles
  * (see graft.ops.Dedup scaladoc).
  */
object PipelineExpressions {

  /** Exact DECIMAL(38,18)-sum accumulator in 128-bit fixed point — the
    * hot-loop replacement for `new BigDecimal(t).setScale(18, HALF_UP)`
    * summed with `BigDecimal.add`, which costs an exact-binary-expansion
    * allocation plus a BigInteger division PER TERM (the expansion of a
    * small double runs to hundreds of digits). The contract is identical:
    * each term contributes round-half-up(t · 10^18) as an exact integer,
    * the integer sum is exact, and one conversion happens at the end —
    * decimal addition is associative and exact, so regrouping terms
    * between the fast 128-bit path and the rare BigDecimal fallback
    * cannot change the result. Parity with the reference formulation is
    * pinned by ExpressionPropertySpec across magnitudes, signs,
    * subnormals and exact-tie cases.
    *
    * Fast path: t = ±m·2^e (IEEE bits); scaled = m·10^18 (< 2^113, two
    * longs via multiplyHigh) shifted by e with half-up rounding on the
    * dropped bits, accumulated into a signed 128-bit (hi, lo) pair.
    * Terms with |t| ≥ 2^53 (e > 0) and non-finite values take the
    * BigDecimal path (the latter throws NumberFormatException exactly
    * like the reference). The accumulator spills to BigDecimal long
    * before 128-bit overflow (|hi| > 2^62 with per-term growth < 2^50). */
  private[graft] final class Dec18Acc {
    private var hi = 0L // signed high 64 bits of Σ round(t·10^18)
    private var lo = 0L // low 64 bits (unsigned)
    private var slow: java.math.BigDecimal = null
    private final val Ten18 = 1000000000000000000L

    def add(t: Double): Unit = {
      if (t == 0.0) return
      val bits = java.lang.Double.doubleToRawLongBits(t)
      val rawExp = ((bits >>> 52) & 0x7FF).toInt
      if (rawExp == 0x7FF) { addSlow(t); return } // NaN/Inf: reference throws
      val frac = bits & 0x000FFFFFFFFFFFFFL
      var m = 0L
      var e = 0
      if (rawExp == 0) { m = frac; e = -1074 }
      else { m = frac | (1L << 52); e = rawExp - 1075 }
      if (e > 0) { addSlow(t); return } // |t| ≥ 2^53 — outside the fast range
      // t128 = m · 10^18  (m < 2^53, 10^18 < 2^60 ⇒ t128 < 2^113)
      var thi = java.lang.Math.multiplyHigh(m, Ten18)
      var tlo = m * Ten18
      val s = -e
      if (s > 113) { thi = 0L; tlo = 0L } // half = 2^(s-1) ≥ 2^113 > t128 ⇒ 0
      else if (s > 0) {
        // round-half-up on the magnitude: increment iff bit (s-1) is set
        val roundUp =
          if (s <= 64) (tlo >>> (s - 1)) & 1L
          else (thi >>> (s - 65)) & 1L
        if (s < 64) {
          tlo = (tlo >>> s) | (thi << (64 - s))
          thi = thi >>> s
        } else {
          tlo = thi >>> (s - 64) // s ≥ 64: low word comes from the high word
          thi = 0L
        }
        if (roundUp == 1L) {
          tlo += 1L
          if (tlo == 0L) thi += 1L
        }
      }
      if (bits < 0) { // negate (two's complement) — HALF_UP is sign-symmetric
        thi = ~thi
        tlo = ~tlo + 1L
        if (tlo == 0L) thi += 1L
      }
      val nlo = lo + tlo
      // unsigned-add carry detection
      val carry = if (java.lang.Long.compareUnsigned(nlo, lo) < 0) 1L else 0L
      lo = nlo
      hi = hi + thi + carry
      if (hi > (1L << 62) || hi < -(1L << 62)) spill()
    }

    private def addSlow(t: Double): Unit = {
      val term = new java.math.BigDecimal(t)
        .setScale(18, java.math.RoundingMode.HALF_UP)
      slow = if (slow == null) term else slow.add(term)
    }

    private def spill(): Unit = {
      val cur = fastValue
      slow = if (slow == null) cur else slow.add(cur)
      hi = 0L
      lo = 0L
    }

    private def fastValue: java.math.BigDecimal = {
      val unsignedLo =
        if (lo >= 0L) java.math.BigInteger.valueOf(lo)
        else java.math.BigInteger.valueOf(lo & Long.MaxValue).setBit(63)
      val total = java.math.BigInteger.valueOf(hi).shiftLeft(64)
        .add(unsignedLo)
      new java.math.BigDecimal(total, 18)
    }

    def toBigDecimal: java.math.BigDecimal = {
      val f = fastValue
      if (slow == null) f else f.add(slow)
    }

    def toDouble: Double = toBigDecimal.doubleValue()

    /** Numeric comparison; the long-pair compare is exact when neither
      * side spilled (signed 128-bit order IS numeric order). */
    def compareTo(o: Dec18Acc): Int =
      if (slow == null && o.slow == null) {
        val c = java.lang.Long.compare(hi, o.hi)
        if (c != 0) c else java.lang.Long.compareUnsigned(lo, o.lo)
      } else toBigDecimal.compareTo(o.toBigDecimal)
  }

  /** Distinct word-k-shingle hashes of a text column: split on single
    * spaces, join k consecutive words with ' ', xxhash64(seed 42 — same as
    * Spark's SQL xxhash64) over the UTF-8 bytes. */
  case class ShingleHashes(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val words = input.asInstanceOf[UTF8String].toString.split(' ')
      if (words.length < k) return new GenericArrayData(Array.empty[Long])
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= words.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        seen.add(org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            bytes.length, 42L))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var n = 0
      while (it.hasNext) { out(n) = it.next(); n += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** MinHash signature from shingle hashes: perm p is
    * h ↦ ((2p+3)·(h & (2^31−1)) + 12582917·p) mod (2^31−1); signature entry
    * p = min over shingles. Matches graft.ops.Dedup.minhashSignature.
    * CONTRACT: inputs must be uniformly-distributed hashes (xxhash64
    * shingles) — the affine family is monotonic on small raw integers
    * (no mod wraparound), which would collapse every permutation's min to
    * the set's smallest element (ExpressionPropertySpec pins this). */
  case class MinHashSig(child: Expression, perms: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private final val Mask = 2147483647L
    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData].toLongArray()
      val sig = new Array[Long](perms)
      var p = 0
      while (p < perms) {
        val a = 2L * p + 3L
        val b = 12582917L * p
        var min = Long.MaxValue
        var i = 0
        while (i < hs.length) {
          val v = (a * (hs(i) & Mask) + b) % Mask
          if (v < min) min = v
          i += 1
        }
        sig(p) = if (hs.isEmpty) 0L else min
        p += 1
      }
      new GenericArrayData(sig)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Jaccard similarity of two long-array sets (assumed distinct). */
  case class JaccardSets(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData].toLongArray()
      val b = r.asInstanceOf[ArrayData].toLongArray()
      if (a.isEmpty && b.isEmpty) return 0.0
      val set = new java.util.HashSet[java.lang.Long](a.length * 2)
      var i = 0
      while (i < a.length) { set.add(a(i)); i += 1 }
      var inter = 0
      i = 0
      while (i < b.length) { if (set.contains(b(i))) inter += 1; i += 1 }
      inter.toDouble / (a.length + b.length - inter)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** 64-bit SimHash over md5-hex token bits, packed into 4×16-bit chunks.
    * Exactly the scheme of graft.ops.Dedup.withSimhashChunks (and its
    * DuckDB oracle): bit j of token t = bit (3 − j%4) of hex digit j/4 of
    * md5(t); weight_j = Σ(±1); chunk c bit b = weight(16c+b) > 0. */
  case class SimHashChunks(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    @transient private lazy val md5 = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
    override def nullSafeEval(input: Any): Any = {
      val tokens = input.asInstanceOf[UTF8String].toString.split(' ')
      val weights = new Array[Int](64)
      var t = 0
      while (t < tokens.length) {
        val digest = md5.get()
        digest.reset()
        val d = digest.digest(
          tokens(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // byte i holds hex digits 2i (high nibble) and 2i+1 (low nibble);
        // bit j lives in digit j/4 at position 3 - j%4 from the digit's MSB
        // → bit j of the 128-bit value = bit (7 - j%8) of byte j/8.
        var j = 0
        while (j < 64) {
          val bit = (d(j >> 3) >> (7 - (j & 7))) & 1
          weights(j) += (if (bit == 1) 1 else -1)
          j += 1
        }
        t += 1
      }
      val chunks = new Array[Int](4)
      var c = 0
      while (c < 4) {
        var v = 0
        var b = 0
        while (b < 16) {
          if (weights(c * 16 + b) > 0) v |= (1 << b)
          b += 1
        }
        chunks(c) = v
        c += 1
      }
      new GenericArrayData(chunks)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Integer quantization used by the hyperplane-LSH family:
    * q(x) = round(x·10^6) as long, via the same decimal path as Spark's SQL
    * `round(double)` (shortest-repr BigDecimal, HALF_UP — ties away from
    * zero) so native and SQL formulations bucket bit-for-bit. */
  private def quantizeVec(v: Array[Float]): Array[Long] = {
    val q = new Array[Long](v.length)
    var i = 0
    while (i < v.length) {
      q(i) = java.math.BigDecimal.valueOf(v(i).toDouble * 1000000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      i += 1
    }
    q
  }

  /** Extract a float vector from ArrayData, or null if the input is null
    * or any element is null — mirroring the SQL formulation where a null
    * element nulls the zip_with product and hence every bit's dot. */
  private def floatVecOrNull(value: Any): Array[Float] = {
    if (value == null) return null
    val arr = value.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      out(i) = arr.getFloat(i)
      i += 1
    }
    out
  }

  /** Random-hyperplane LSH signature: bit i = sign(dot(q(v), w_i)) > 0,
    * over integer math. Bit-identical to the SQL mega-expression it
    * replaces (bits × aggregate(zip_with(...)) — interpreted per array
    * element and re-quantizing the vector per bit) but one tight loop per
    * row that quantizes once. `weights` is (bits × dim) from
    * graft.ops.Similarity.hyperplaneWeight, precomputed driver-side; held
    * as IndexedSeq so two structurally identical instances are `==` (the
    * case-class equality Catalyst canonicalization/subexpression
    * elimination rely on), converted once to primitive arrays for eval.
    * Null contract (same as the SQL CASE): a null vector, a vector with a
    * null element (zip_with nulls the whole dot), or a length != dim all
    * yield every-bit-0 → signature 0, never NULL — so null-embedding rows
    * land in bucket 0 instead of dropping out of bucket equi-joins. */
  case class HyperplaneSig(child: Expression, weights: IndexedSeq[IndexedSeq[Long]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    @transient private lazy val w: Array[Array[Long]] =
      weights.map(_.toArray).toArray
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = floatVecOrNull(child.eval(input))
      if (v == null) return 0L
      val q = quantizeVec(v)
      var sig = 0L
      var i = 0
      while (i < w.length) {
        val wi = w(i)
        var dot = 0L
        var d = 0
        // dot over min(dim, weights): a shorter vector is the zero-padded
        // embedding in weight space; longer dims beyond the weight table
        // are ignored. NEVER collapse to an all-zero signature on length
        // mismatch — a constant signature puts EVERY vector in the same
        // band bucket and the banded self-join goes quadratic in the
        // corpus (found by the write-path growth rehearsal: dim-32
        // vectors against the default dim-64 weights hung a 120k-row
        // build that should take seconds).
        val len = math.min(q.length, wi.length)
        while (d < len) { dot += q(d) * wi(d); d += 1 }
        if (dot > 0) sig |= (1L << i)
        i += 1
      }
      sig
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Per-band r-bit hyperplane signatures (array of longs), band b bit j
    * from weight row b·r+j — the banded-LSH OR-construction companion of
    * [[HyperplaneSig]], same integer math and null contract (null /
    * null-element vector → all-zero band array, never NULL; a
    * length-MISMATCHED vector signs against the zero-padded/truncated
    * weight subspace — never a constant signature, which would collapse
    * every vector into one band bucket). */
  case class HyperplaneBandSigs(child: Expression,
      weights: IndexedSeq[IndexedSeq[Long]], r: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    @transient private lazy val w: Array[Array[Long]] =
      weights.map(_.toArray).toArray
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val bands = weights.length / r
      val out = new Array[Long](bands)
      val v = floatVecOrNull(child.eval(input))
      if (v == null) return new GenericArrayData(out)
      val q = quantizeVec(v)
      var b = 0
      while (b < bands) {
        var sig = 0L
        var j = 0
        while (j < r) {
          val wj = w(b * r + j)
          var dot = 0L
          var d = 0
          // min-length dot — see HyperplaneSig: a length mismatch must
          // degrade to the zero-padded subspace signature, never to a
          // constant all-zero signature (quadratic bucket collapse)
          val len = math.min(q.length, wj.length)
          while (d < len) { dot += q(d) * wj(d); d += 1 }
          if (dot > 0) sig |= (1L << j)
          j += 1
        }
        out(b) = sig
        b += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Exact-decimal cosine pieces: dot product of two float vectors with
    * each double product rounded to 18 decimal places and summed exactly —
    * bit-identical to the DECIMAL(38,18) SQL accumulation the oracles use
    * (float×float in double is exact; scaling by 10^18 with BigDecimal
    * reproduces the decimal cast; the sum is exact). */
  case class DotExact(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData].toFloatArray()
      val b = r.asInstanceOf[ArrayData].toFloatArray()
      val sum = new Dec18Acc
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        sum.add(a(i).toDouble * b(i).toDouble)
        i += 1
      }
      sum.toDouble
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Exact-decimal vector norm (same accumulation as DotExact). */
  case class NormExact(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData].toFloatArray()
      val sum = new Dec18Acc
      var i = 0
      while (i < a.length) {
        sum.add(a(i).toDouble * a(i).toDouble)
        i += 1
      }
      math.sqrt(sum.toDouble)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Marker-lexicon language ID (same contract as
    * graft.ops.TextAnalysis.languageId and its oracle: argmax hit count,
    * ties → lexicographically smallest code, zero hits → 'und'). */
  case class LangId(child: Expression, markers: Seq[(String, Seq[String])])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    @transient private lazy val sets: Array[(String, java.util.HashSet[String])] =
      markers.sortBy(_._1).map { case (l, ws) =>
        val s = new java.util.HashSet[String]()
        ws.foreach(s.add)
        (l, s)
      }.toArray
    override def nullSafeEval(input: Any): Any = {
      val tokens = input.asInstanceOf[UTF8String].toString
        .toLowerCase.split(' ')
      var bestLang = "und"
      var bestHits = 0
      var i = 0
      while (i < sets.length) {
        val (lang, set) = sets(i)
        var hits = 0
        var t = 0
        while (t < tokens.length) {
          if (set.contains(tokens(t))) hits += 1
          t += 1
        }
        // sets are lang-sorted: strict > keeps the smallest code on ties
        if (hits > bestHits) { bestHits = hits; bestLang = lang }
        i += 1
      }
      UTF8String.fromString(bestLang)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** BPE-ish subword count: per space-delimited word, ceil(len/4)
    * pieces. Bit-identical to the HOF formulation it replaces
    * (`aggregate(split(trim(t), ' +'), ...)` — an interpreted lambda per
    * word) and to the DuckDB oracle mirror, but one tight char pass per
    * row. Boundaries are 0x20 runs only, matching split(' +'). */
  case class SubwordCount(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      var total = 0L
      var wordLen = 0
      var i = 0
      // word length in CODE POINTS: SQL length()/DuckDB length() count
      // characters, not UTF-16 units — counting chars would over-split
      // words containing supplementary-plane text (emoji, rare CJK)
      while (i < s.length) {
        val cp = s.codePointAt(i)
        if (cp == ' ') {
          if (wordLen > 0) { total += (wordLen + 3) / 4; wordLen = 0 }
        } else wordLen += 1
        i += Character.charCount(cp)
      }
      if (wordLen > 0) total += (wordLen + 3) / 4
      total
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Repetition statistics for Gopher/C4-style quality filtering: one
    * pass over the space-delimited tokens computing (n_words,
    * n_distinct_words, top_bigram_count). Fractions (dup-word,
    * top-bigram) are derived in SQL on both engines so the double math is
    * identical. Tokenization matches split(trim(t), ' +'): 0x20 runs
    * delimit, blank text → all zeros. */
  case class RepetitionStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("n_words", LongType, nullable = false),
      StructField("n_distinct_words", LongType, nullable = false),
      StructField("top_bigram_count", LongType, nullable = false)))
    override def nullSafeEval(input: Any): Any = {
      // space-only trim: SQL trim() strips 0x20 only, Java String.trim
      // strips all control chars ≤ 0x20 — the difference would fork the
      // tokenization from the oracle on texts with trailing newlines
      val raw = input.asInstanceOf[UTF8String].toString
      var from = 0
      var to = raw.length
      while (from < to && raw.charAt(from) == ' ') from += 1
      while (to > from && raw.charAt(to - 1) == ' ') to -= 1
      val s = raw.substring(from, to)
      if (s.isEmpty)
        return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](0L, 0L, 0L))
      val words = s.split(" +")
      val distinct = new java.util.HashSet[String]()
      val bigrams = new java.util.HashMap[String, Long]()
      var top = 0L
      var i = 0
      while (i < words.length) {
        distinct.add(words(i))
        if (i > 0) {
          val bg = words(i - 1) + " " + words(i)
          val c = bigrams.merge(bg, 1L, (a, b) => a + b)
          if (c > top) top = c
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](words.length.toLong, distinct.size.toLong, top))
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** StubCodec.decode's body checksum — 64-bit FNV-1a over the payload
    * bytes past the 16-byte GRFT header — as a native expression, so
    * the media-dedup key computes without a per-row ScalaUDF in the
    * hot path. Semantics mirror graft.ops.Multimodal.StubCodec.decode
    * exactly (byte values sign-extend into the xor identically):
    * payloads failing the header check yield 0, which the step's
    * validity gate keeps out of the keyed branch. */
  case class MediaChecksum(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val p = input.asInstanceOf[Array[Byte]]
      if (p.length < 16 || p(0) != 'G' || p(1) != 'R' ||
          p(2) != 'F' || p(3) != 'T') 0L
      else {
        var sum = 1469598103934665603L
        var i = 16
        while (i < p.length) { sum = (sum ^ p(i)) * 1099511628211L; i += 1 }
        sum
      }
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** [[graft.ops.Phash.phash64]] — the DCT perceptual hash — as a native
    * expression: the media near-dup signature computes inside the same
    * projection pass as the validity gate, no per-row ScalaUDF plumbing.
    * Undecodable payloads yield 0L, which the step's [[graft.ops
    * .Multimodal.isGrft]] gate keeps out of the banded branch (same
    * sentinel contract as [[MediaChecksum]]). */
  case class MediaPhash(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      graft.ops.Phash.phash64(input.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** [[graft.ops.AudioHash.audioHash64]] — the envelope-spectrum audio
    * fingerprint — as a native expression (same shape and sentinel
    * contract as [[MediaPhash]]: undecodable or signal-less payloads
    * yield 0L and stay out of banding). */
  case class MediaAudioHash(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      graft.ops.AudioHash.audioHash64(input.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Count of lowercase space-split tokens that appear in `words` — the
    * stopword-hit primitive (same contract as
    * `size(filter(split(lower(text),' '), t -> t IN (...)))`). */
  case class TokenHitCount(child: Expression, words: Seq[String])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    @transient private lazy val set: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      s
    }
    override def nullSafeEval(input: Any): Any = {
      val tokens = input.asInstanceOf[UTF8String].toString.toLowerCase.split(' ')
      var hits = 0
      var i = 0
      while (i < tokens.length) {
        if (set.contains(tokens(i))) hits += 1
        i += 1
      }
      hits
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** One-pass document fingerprint over pre-normalized text: polynomial
    * rolling hash (base 131 mod 1e9+7 — Rabin-Karp) of the whole string
    * plus all k-gram window hashes, emitting a struct of
    * (content_hash, min_gram_hash, n_distinct_grams). Bit-identical to the
    * SQL formulation in TextAnalysis.polyHash / its DuckDB oracle, but
    * O(len) per row (each window hash derived from the previous in O(1))
    * instead of O(len·k) interpreted lambda evaluations. */
  case class FingerprintParts(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    private final val Mod = 1000000007L
    private final val Base = 131L
    // Base^(k-1) mod Mod, for sliding the leading character out
    private val basePow: Long = {
      var p = 1L
      var i = 0
      while (i < k - 1) { p = p * Base % Mod; i += 1 }
      p
    }
    override def dataType: DataType = StructType(Seq(
      StructField("content_hash", LongType, nullable = false),
      StructField("min_gram_hash", LongType, nullable = false),
      StructField("n_distinct_grams", IntegerType, nullable = false)))
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val n = s.length
      var content = 0L
      var i = 0
      while (i < n) { content = (content * Base + s.charAt(i).toInt) % Mod; i += 1 }
      var minGram = Long.MaxValue
      val seen = new java.util.HashSet[java.lang.Long]()
      if (n < k) {
        // degenerate case: the whole string is the single gram
        minGram = content
        seen.add(content)
      } else {
        var h = 0L
        i = 0
        while (i < k) { h = (h * Base + s.charAt(i).toInt) % Mod; i += 1 }
        seen.add(h)
        if (h < minGram) minGram = h
        while (i < n) {
          // slide: drop s[i-k], append s[i]
          h = (h - s.charAt(i - k).toInt * basePow % Mod + Mod) % Mod
          h = (h * Base + s.charAt(i).toInt) % Mod
          seen.add(h)
          if (h < minGram) minGram = h
          i += 1
        }
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](content, minGram, seen.size))
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Winnowed rolling-hash fingerprints (Schleimer et al. 2003, the MOSS
    * scheme): the k-char gram hashes of [[FingerprintParts]] (same
    * Base/Mod math, one O(len) slide), then each window of `w` consecutive
    * gram hashes contributes its MINIMUM — the winnowing guarantee is that
    * any shared substring of length ≥ k + w − 1 yields at least one
    * IDENTICAL selected fingerprint in both documents regardless of
    * alignment, which is what makes cross-document span detection robust
    * to offset shifts (a tiled/stride scheme misses misaligned copies).
    * Output: the selected values, distinct and ascending (expected
    * density 2/(w+1) of the gram count, so ~2·len/(w+1) longs per doc).
    * Strings shorter than k (or with fewer than w grams) degenerate to a
    * single fingerprint, so every row emits a non-empty array. */
  case class WinnowedFingerprints(child: Expression, k: Int, w: Int)
      extends UnaryExpression with CodegenFallback {
    private final val Mod = 1000000007L
    private final val Base = 131L
    private val basePow: Long = {
      var p = 1L
      var i = 0
      while (i < k - 1) { p = p * Base % Mod; i += 1 }
      p
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val n = s.length
      val grams =
        if (n < k) {
          var h = 0L
          var i = 0
          while (i < n) { h = (h * Base + s.charAt(i).toInt) % Mod; i += 1 }
          Array(h)
        } else {
          val g = new Array[Long](n - k + 1)
          var h = 0L
          var i = 0
          while (i < k) { h = (h * Base + s.charAt(i).toInt) % Mod; i += 1 }
          g(0) = h
          while (i < n) {
            h = (h - s.charAt(i - k).toInt * basePow % Mod + Mod) % Mod
            h = (h * Base + s.charAt(i).toInt) % Mod
            g(i - k + 1) = h
            i += 1
          }
          g
        }
      val m = grams.length
      val selected = new java.util.TreeSet[java.lang.Long]()
      if (m <= w) {
        var mn = Long.MaxValue
        var j = 0
        while (j < m) { if (grams(j) < mn) mn = grams(j); j += 1 }
        selected.add(mn)
      } else {
        // monotonic deque of indices: amortized O(1) per slide
        val dq = new java.util.ArrayDeque[Integer]()
        var j = 0
        while (j < m) {
          while (!dq.isEmpty && grams(dq.peekLast) >= grams(j)) dq.pollLast()
          dq.addLast(j)
          if (dq.peekFirst <= j - w) dq.pollFirst()
          if (j >= w - 1) selected.add(grams(dq.peekFirst))
          j += 1
        }
      }
      val out = new Array[Long](selected.size)
      val it = selected.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Indices of the `nprobe` nearest centroids by EXACT-decimal squared L2
    * distance, ascending (ties → lower centroid index). One map-side pass
    * per row against a driver-precomputed k×dim centroid matrix — the IVF
    * coarse-quantizer shape: at scale this broadcasts k·dim doubles inside
    * the expression and never shuffles the corpus.
    *
    * Numeric contract (same as DotExact, mirrored by the DuckDB oracle):
    * per-dimension (CAST(x AS DOUBLE) − c)² is IEEE-exact up to one
    * deterministic rounding, then CAST(… AS DECIMAL(38,18)) (HALF_UP) and
    * exact decimal summation — no float-sum order sensitivity, so argmin
    * is bit-identical across engines. `centroids` is IndexedSeq for the
    * structural case-class equality Catalyst canonicalization needs. */
  case class NearestCentroids(child: Expression,
      centroids: IndexedSeq[IndexedSeq[Double]], nprobe: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    @transient private lazy val cs: Array[Array[Double]] =
      centroids.map(_.toArray).toArray
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData].toFloatArray()
      val dists = new Array[Dec18Acc](cs.length)
      var c = 0
      while (c < cs.length) {
        val cd = cs(c)
        val sum = new Dec18Acc
        val n = math.min(v.length, cd.length)
        var d = 0
        while (d < n) {
          val diff = v(d).toDouble - cd(d)
          sum.add(diff * diff)
          d += 1
        }
        dists(c) = sum
        c += 1
      }
      val order = (0 until cs.length).sortBy(identity)(Ordering.fromLessThan {
        (i, j) =>
          val cmp = dists(i).compareTo(dists(j))
          cmp < 0 || (cmp == 0 && i < j)
      })
      new GenericArrayData(order.take(nprobe).toArray)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Exact-decimal squared-L2 distances from a vector to EVERY centroid —
    * the ADC (asymmetric distance computation) table of product
    * quantization: a query evaluates this once per subspace, and each
    * compressed corpus code then costs one array lookup. Same numeric
    * contract as [[NearestCentroids]] (per-dim IEEE (x−c)² →
    * DECIMAL(38,18) HALF_UP → exact decimal sum), so the table — and
    * every ADC ranking built from it — is bit-identical across engines. */
  case class CentroidDistances(child: Expression,
      centroids: IndexedSeq[IndexedSeq[Double]])
      extends UnaryExpression with CodegenFallback {
    private val decType = DecimalType(38, 18)
    override def dataType: DataType = ArrayType(decType, containsNull = false)
    @transient private lazy val cs: Array[Array[Double]] =
      centroids.map(_.toArray).toArray
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData].toFloatArray()
      val out = new Array[Any](cs.length)
      var c = 0
      while (c < cs.length) {
        val cd = cs(c)
        val sum = new Dec18Acc
        val n = math.min(v.length, cd.length)
        var d = 0
        while (d < n) {
          val diff = v(d).toDouble - cd(d)
          sum.add(diff * diff)
          d += 1
        }
        out(c) = org.apache.spark.sql.types.Decimal(sum.toBigDecimal, 38, 18)
        c += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // ---- Column wrappers --------------------------------------------------

  private def wrap(e: Expression): Column =
    org.apache.spark.sql.GraftSqlBridge.column(e)

  def shingle_hashes(c: Column, k: Int): Column =
    wrap(ShingleHashes(expression(c), k))
  def minhash_sig(c: Column, perms: Int): Column =
    wrap(MinHashSig(expression(c), perms))
  def jaccard_sets(a: Column, b: Column): Column =
    wrap(JaccardSets(expression(a), expression(b)))
  def simhash_chunks(c: Column): Column =
    wrap(SimHashChunks(expression(c)))
  def lang_id(c: Column, markers: Seq[(String, Seq[String])]): Column =
    wrap(LangId(expression(c), markers))
  def token_hit_count(c: Column, words: Seq[String]): Column =
    wrap(TokenHitCount(expression(c), words))
  def media_checksum(c: Column): Column =
    wrap(MediaChecksum(expression(c)))
  def media_phash(c: Column): Column =
    wrap(MediaPhash(expression(c)))
  def media_audio_hash(c: Column): Column =
    wrap(MediaAudioHash(expression(c)))
  def subword_count(c: Column): Column =
    wrap(SubwordCount(expression(c)))
  def repetition_stats(c: Column): Column =
    wrap(RepetitionStats(expression(c)))
  def dot_exact(a: Column, b: Column): Column =
    wrap(DotExact(expression(a), expression(b)))
  def fingerprint_parts(c: Column, k: Int): Column =
    wrap(FingerprintParts(expression(c), k))
  def winnowed_fingerprints(c: Column, k: Int, w: Int): Column =
    wrap(WinnowedFingerprints(expression(c), k, w))
  def norm_exact(c: Column): Column =
    wrap(NormExact(expression(c)))
  def hyperplane_sig(c: Column, weights: Array[Array[Long]]): Column =
    wrap(HyperplaneSig(expression(c), weights.map(_.toIndexedSeq).toIndexedSeq))
  def hyperplane_band_sigs(c: Column, weights: Array[Array[Long]], r: Int): Column =
    wrap(HyperplaneBandSigs(expression(c), weights.map(_.toIndexedSeq).toIndexedSeq, r))
  def nearest_centroids(c: Column, centroids: Array[Array[Double]],
      nprobe: Int): Column =
    wrap(NearestCentroids(expression(c),
      centroids.map(_.toIndexedSeq).toIndexedSeq, nprobe))
  def centroid_distances(c: Column, centroids: Array[Array[Double]]): Column =
    wrap(CentroidDistances(expression(c),
      centroids.map(_.toIndexedSeq).toIndexedSeq))

  private def expression(c: Column): Expression =
    org.apache.spark.sql.GraftSqlBridge.expression(c)
}
