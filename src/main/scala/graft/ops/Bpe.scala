package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained byte-pair encoding (Sennrich et al. 2016) — the
  * tokenizer-true token budget for training pipelines. Every
  * token-budgeted operator family here (`mixByTokenWeights`, chunking,
  * the Gopher gate) otherwise counts whitespace tokens; real pipelines
  * budget in tokenizer tokens, and BPE is the tokenizer family actually
  * used. No external vocabulary file is needed: [[train]] learns the
  * merge table from the corpus itself, deterministically.
  *
  * Merge-application convention (pinned, engine-portable): a word's
  * segmentation is its symbols joined by single spaces and padded with
  * one leading and one trailing space (`" h e l l o "`); applying merge
  * (a, b) is the LITERAL string replace of `" a b "` with `" ab "` —
  * leftmost-first, non-overlapping, the scan resuming in the SOURCE
  * after each match. Java `String.replace`, Spark's codegen'd `replace`
  * (UTF8String), and DuckDB's `replace` all implement exactly this, so
  * the driver-side trainer, the map-side counting expression, and the
  * SQL oracle agree bit-for-bit — including on runs (`"aaaa"` under
  * merge (a,a) becomes [aa, a, a], not [aa, aa], because the first
  * match consumes the separator the second would need).
  *
  * Scale shape: training's only distributed work is ONE word-count
  * aggregation over the corpus (explode → partial-agg'd count), capped
  * to the `maxWords` most frequent words (freq desc, word asc — a
  * distributed TakeOrdered, no global sort); the merge loop then runs
  * driver-side over that bounded word-frequency table — the sufficient
  * statistic for BPE (this is how production tokenizer trainers work:
  * the corpus streams once into word counts, merges never touch it).
  * Driver state is O(maxWords · word length), the k-means-centroids
  * bound. Counting ([[tokenCount]]) is a pure map-side codegen'd
  * expression chain — no join, no shuffle, and out-of-vocabulary words
  * segment correctly because merges are applied, not looked up.
  *
  * Determinism: pair counts are exact integers; the argmax tie-break is
  * (count desc, left symbol asc, right symbol asc) with symbols
  * compared as UNSIGNED UTF-8 BYTES — the binary collation both
  * Spark's sort and DuckDB's ORDER BY use — so the learned merge list
  * is identical in any engine at any parallelism.
  */
object Bpe {

  /** One word's initial segmentation: codepoint-split, space-joined,
    * space-padded (`"ab"` → `" a b "`). Codepoints, not chars — regex
    * `.` in Spark/DuckDB matches a full codepoint, and splitting a
    * surrogate pair would diverge from both. */
  private[graft] def spaceout(w: String): String = {
    val sb = new java.lang.StringBuilder(" ")
    w.codePoints().forEach { cp =>
      sb.appendCodePoint(cp); sb.append(' '); ()
    }
    sb.toString
  }

  /** Unsigned-UTF-8-byte string order — Spark UTF8String / DuckDB
    * binary-collation comparison, which Java's UTF-16 `compareTo`
    * disagrees with above the BMP. */
  private[graft] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Learn `numMerges` merges from the corpus's word-frequency table.
    * Whitespace tokenization (single-space split, empty and NULL
    * dropped) — the same convention as the other text operators. Stops
    * early if no adjacent pair remains. `maxWords` caps the collected
    * word-frequency table (and therefore driver memory) to the top-N
    * most frequent words — the 100 TB contract, where the full
    * open-vocabulary table is unbounded. The DEFAULT is a 1M-word cap
    * (≈ tens of MB of driver state at realistic word lengths, and far
    * beyond where BPE merge statistics stop changing — the tail it
    * drops is hapax noise); pass `None` to explicitly opt out for a
    * corpus whose vocabulary is known-bounded and must be counted
    * exhaustively. */
  val DefaultMaxWords = 1000000

  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Option[Int] = Some(DefaultMaxWords)): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    maxWords.foreach(v => require(v > 0, s"maxWords must be positive: $v"))
    val wc0 = docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy("__w").agg(count(lit(1)).as("__cnt"))
    val wc = maxWords.fold(wc0)(v =>
      wc0.orderBy(col("__cnt").desc, col("__w")).limit(v))
    val rows = wc.collect()
    val syms = rows.map(r => spaceout(r.getString(0)))
    val cnts = rows.map(r => r.getLong(1))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    var m = 0
    while (m < numMerges && !exhausted) {
      val pairCnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < syms.length) {
        val parts = syms(i).trim.split(' ')
        var j = 0
        while (j < parts.length - 1) {
          val key = (parts(j), parts(j + 1))
          pairCnt.update(key, pairCnt.getOrElse(key, 0L) + cnts(i))
          j += 1
        }
        i += 1
      }
      if (pairCnt.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        pairCnt.foreach { kv =>
          if (best == null || kv._2 > best._2 ||
            (kv._2 == best._2 && (utf8Less(kv._1._1, best._1._1) ||
              (kv._1._1 == best._1._1 && utf8Less(kv._1._2, best._1._2)))))
            best = kv
        }
        val (p1, p2) = best._1
        merges += ((p1, p2))
        val pat = s" $p1 $p2 "
        val rep = s" $p1$p2 "
        i = 0
        while (i < syms.length) { syms(i) = syms(i).replace(pat, rep); i += 1 }
      }
      m += 1
    }
    merges.toSeq
  }

  /** Non-empty whitespace tokens of `textCol` (NULL text → NULL). */
  private def wordsOf(textCol: String): Column =
    filter(split(col(textCol), " "), w => length(w) > 0)

  /** BPE token count under a trained merge list: per word, codepoints
    * are space-joined (`regexp_replace` on `(.)` — codegen'd), the
    * merges applied as a chain of literal `replace` calls (the pinned
    * convention above), and the surviving symbols counted; the per-doc
    * total sums over words. Entirely map-side inside one codegen'd
    * expression — no explode, no join, no shuffle; expression depth is
    * linear in the merge count, so for large merge tables prefer
    * broadcasting a precomputed word → symbol-count lexicon and keeping
    * this chain for out-of-vocabulary words only. Empty/blank text → 0;
    * NULL text → NULL (filter upstream, as [[TextAnalysis.bm25]] does). */
  def tokenCount(textCol: String, merges: Seq[(String, String)]): Column = {
    val counted = transform(wordsOf(textCol),
      w => size(split(pieces(w, merges), " ")))
    aggregate(counted, lit(0), (acc, x) => acc + x)
  }

  /** Whitespace word count under the same tokenization [[tokenCount]]
    * budgets over (empty → 0, NULL → NULL) — the denominator for
    * fertility (BPE tokens per word), the standard tokenizer-quality
    * diagnostic. */
  def wordCount(textCol: String): Column = size(wordsOf(textCol))

  /** A single word's trained segmentation as a space-joined piece
    * string (`"hello"` → e.g. `"hel lo"`): the same codepoint space-out
    * + literal-replace replay as [[tokenCount]], exposed so the learned
    * lexicon itself is inspectable (and oracle-checkable) — counts can
    * collide, piece strings cannot. */
  def pieces(wordCol: Column, merges: Seq[(String, String)]): Column = {
    val padded = concat(lit(" "), regexp_replace(wordCol, "(.)", "$1 "))
    val merged = merges.foldLeft(padded) { case (s, (a, b)) =>
      replace(s, lit(s" $a $b "), lit(s" $a$b "))
    }
    trim(merged)
  }
}
