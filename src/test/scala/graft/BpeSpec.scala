package graft

import graft.ops.Bpe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-trained BPE: hand-computed merges pin the count-desc /
  * pair-asc argmax AND the literal-replace application convention
  * (leftmost, non-overlapping, resume-in-source — runs merge as
  * [aa, a, a], not [aa, aa]); counting is checked on in-vocabulary,
  * out-of-vocabulary, empty, and capped-training inputs. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def corpus(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("hand-computed merge sequence, tie-break, and early stop") {
    // words: "aaaa" x3, "ab" x2
    //   step 1: pairs (a,a)=9 > (a,b)=2            -> merge (a,a)
    //           " a a a a " -> " aa a a "  (resume-in-source: NOT " aa aa ")
    //   step 2: (aa,a)=3, (a,a)=3, (a,b)=2 — tie; (a,a) < (aa,a) asc
    //           " aa a a " -> " aa aa "
    //   step 3: (aa,aa)=3 > (a,b)=2                -> merge (aa,aa)
    //   step 4: only (a,b)=2 left                  -> merge (a,b)
    //   step 5: no pairs remain                    -> early stop
    val docs = corpus("aaaa ab aaaa", "aaaa ab")
    val merges = Bpe.train(docs, "text", numMerges = 10)
    assert(merges === Seq(("a", "a"), ("a", "a"), ("aa", "aa"), ("a", "b")))
  }

  test("token counts: in-vocab words collapse, OOV words segment by replay") {
    val docs = corpus("aaaa ab aaaa", "aaaa ab")
    val merges = Bpe.train(docs, "text", numMerges = 10)
    val got = corpus("aaaa ab", "aaa", "", "aaaa aaa b")
      .select(col("id"), Bpe.wordCount("text").as("w"),
        Bpe.tokenCount("text", merges).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    // "aaaa"->1 symbol, "ab"->1
    assert(got(0L) === ((2, 2)))
    // OOV "aaa": " a a a " -(a,a)-> " aa a " — second (a,a) pass finds no
    // " a a " (separator consumed), (aa,aa)/(a,b) no match -> [aa, a] = 2
    assert(got(1L) === ((1, 2)))
    assert(got(2L) === ((0, 0)))
    assert(got(3L) === ((3, 1 + 2 + 1)))
  }

  test("Spark replace convention matches the driver trainer on runs") {
    // the whole-pipeline agreement check: counts computed by Spark's
    // codegen'd replace chain equal counts from the driver-side trained
    // lexicon for every corpus word (including multi-run words)
    val docs = corpus("aaaa aaaa aab", "ab aab aaaa")
    val merges = Bpe.train(docs, "text", numMerges = 3)
    val lex = Seq("aaaa", "aab", "ab").map { w =>
      var s = Bpe.spaceout(w)
      merges.foreach { case (a, b) => s = s.replace(s" $a $b ", s" $a$b ") }
      w -> s.trim.split(' ').length
    }.toMap
    val got = corpus("aaaa aab ab")
      .select(Bpe.tokenCount("text", merges)).head().getInt(0)
    assert(got === lex("aaaa") + lex("aab") + lex("ab"))
  }

  test("maxWords caps the training vocabulary deterministically") {
    val docs = corpus("zz zz zz zz zz yy", "zz xy")
    // cap=1 keeps only "zz" (freq 6): single merge (z,z), then stop
    assert(Bpe.train(docs, "text", numMerges = 5, maxWords = Some(1)) ===
      Seq(("z", "z")))
    // uncapped continues into the rarer words
    val full = Bpe.train(docs, "text", numMerges = 5)
    assert(full.head === (("z", "z")) && full.length > 1)
  }

  test("degenerate inputs: null text, single-char words, zero merges") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    // single-char words still pair ACROSS nothing — no intra-word pairs
    assert(Bpe.train(docs, "text", numMerges = 3) === Seq.empty)
    assert(Bpe.train(docs, "text", numMerges = 0) === Seq.empty)
    val n = docs.select(col("id"),
      Bpe.tokenCount("text", Seq.empty).as("n")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(n(1L) === 4) // no merges: token count = char count per word
    assert(n(2L) === -1) // NULL text stays NULL (callers filter, as bm25)
  }

  test("maxWords defaults to the bounded 1M cap; None is the opt-out") {
    import spark.implicits._
    assert(graft.ops.Bpe.DefaultMaxWords == 1000000)
    val docs = Seq("aa ab aa b", "aa ab").toDF("text")
    // under the cap the capped and unbounded tables are identical
    assert(graft.ops.Bpe.train(docs, "text", numMerges = 3) ===
      graft.ops.Bpe.train(docs, "text", numMerges = 3, maxWords = None))
  }
}
