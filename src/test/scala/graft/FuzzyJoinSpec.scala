package graft

import graft.ops.FuzzyJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ed-Join edit-distance join: equality with the brute-force quadratic
  * join (blocking completeness), the small-gram-set sentinel cases the
  * prefix lemma cannot cover, NULL semantics, self-join ordering. */
class FuzzyJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def bruteForce(left: Seq[(Long, String)], right: Seq[(Long, String)],
      k: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (li, ls) <- left; (ri, rs) <- right
      d = lev(ls, rs) if d <= k
    } yield (li, ri, d)).toSet
  }

  private def run(left: Seq[(Long, String)], right: Seq[(Long, String)],
      k: Int, q: Int = 2): Set[(Long, Long, Int)] = {
    import spark.implicits._
    FuzzyJoin.editDistanceJoin(
        left.toDF("id", "s"), "id", "s",
        right.toDF("rid", "rs"), "rid", "rs", maxDist = k, q = q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("matches brute force on a mixed corpus (k=1 and k=2)") {
    val master = Seq(
      1L -> "small ring", 2L -> "small ding", 3L -> "smallring",
      4L -> "red widget", 5L -> "red widgets", 6L -> "blue bolt",
      7L -> "bolt blue", 8L -> "hot gear", 9L -> "hot bear",
      10L -> "hod gear x", 11L -> "completely different phrase here")
    val dirty = Seq(
      101L -> "small ring", 102L -> "red widgett", 103L -> "hot gea",
      104L -> "blue boltz", 105L -> "no match at all whatsoever")
    for (k <- Seq(1, 2)) {
      assert(run(dirty, master, k) === bruteForce(dirty, master, k),
        s"k=$k")
    }
  }

  test("small-gram-set sentinel: short strings with disjoint grams match") {
    // "ab" vs "cd" share zero 2-grams even padded, but ed = 2
    val got = run(Seq(1L -> "ab"), Seq(10L -> "cd", 11L -> "abcdef"), k = 2)
    assert(got === Set((1L, 10L, 2)))
  }

  test("low-complexity repeats: tiny distinct-gram sets still match") {
    // distinct padded 2-grams of "aaaaaaaaaa" = 3 <= q*k for k=2 —
    // the sentinel, not the prefix lemma, must carry these pairs
    val a = "a" * 40
    val b = "a" * 20 + "b" + "a" * 19 // one substitution
    val c = "a" * 38 // two deletions
    val got = run(Seq(1L -> a), Seq(10L -> b, 11L -> c), k = 2)
    assert(got === Set((1L, 10L, 1), (1L, 11L, 2)))
  }

  test("empty and NULL strings") {
    import spark.implicits._
    val left = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val right = Seq((10L, "a"), (11L, ""), (12L, null.asInstanceOf[String]))
      .toDF("rid", "rs")
    val got = FuzzyJoin.editDistanceJoin(left, "id", "s",
        right, "rid", "rs", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // NULLs never match; "" matches "" (d=0) and "a" (d=1)
    assert(got === Set((1L, 10L, 1), (1L, 11L, 0)))
  }

  test("self-join emits each unordered pair once, id_a < id_b") {
    import spark.implicits._
    val names = Seq("red bolt", "red bolts", "red colt", "green gear")
      .toDF("p_name")
    val got = FuzzyJoin.editDistanceSelfJoin(
        names, "p_name", "p_name", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(got === Set(
      ("red bolt", "red bolts", 1), ("red bolt", "red colt", 1)))
  }

  test("duplicate right strings each match independently") {
    val got = run(Seq(1L -> "abcd"), Seq(10L -> "abcd", 11L -> "abcd"), 1)
    assert(got === Set((1L, 10L, 0), (1L, 11L, 0)))
  }

  test("plan is all equi-joins: no cartesian product, no nested loop") {
    import spark.implicits._
    val left = (0L until 50L).map(i => (i, s"left string value $i"))
      .toDF("id", "s")
    val right = (0L until 80L).map(i => (i + 1000L, s"right string value $i"))
      .toDF("rid", "rs")
    val df = FuzzyJoin.editDistanceJoin(left, "id", "s",
      right, "rid", "rs", maxDist = 2)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
  }

  test("incremental fuzzy ≡ full-corpus pairs minus old×old under the " +
      "frozen prefix order; postings twin scanned narrow") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Customer#000000001"), (2L, "Customer#000000002"),
      (3L, "wholly different"), (4L, "Customer#000001002"),
      (5L, "wholy different"), (6L, "Customer#000000011"),
      (7L, "x"), (8L, "y"), (9L, "unrelated text entirely"))
      .toDF("id", "s")
    val oldDf = docs.filter(col("id") % 2 === 0)
    val newDf = docs.filter(col("id") % 2 === 1)
    val full = FuzzyJoin.editDistanceSelfJoin(docs, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter { case (a, b) => a % 2 == 1 || b % 2 == 1 }
    assert(full.nonEmpty && expected.size < full.size, full.toString)

    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzyidx")
      .toString
    oldDf.select(col("id"), col("s").as("str")).write.parquet(s"$dir/strs")
    val index = spark.read.parquet(s"$dir/strs")
    // the FROZEN order: frequencies over the BASE corpus only
    FuzzyJoin.gramFrequencies(oldDf, "s", q = 2).write.parquet(s"$dir/freq")
    val freq = spark.read.parquet(s"$dir/freq")
    FuzzyJoin.prefixGramsFrozen(index, "id", "str", freq, maxDist = 2)
      .write.parquet(s"$dir/grams")
    val postings = spark.read.parquet(s"$dir/grams")
    val pairs = FuzzyJoin.editDistanceIncremental(
      newDf, "id", "s", index, postings, freq, maxDist = 2)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === expected,
      "frozen-order incremental path matches the full-corpus subset")

    val plan = pairs.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchemas = plan.linesIterator
      .filter(_.trim.startsWith("ReadSchema")).toSeq
    assert(readSchemas.exists(l => l.contains("gram:") && !l.contains("str:")),
      s"postings twin scanned narrow:\n${readSchemas.mkString("\n")}")
    assert(plan.contains("LeftSemi"),
      "index postings pre-pruned by a left-semi on the batch's grams")
    assert(!plan.contains("CartesianProduct"), "no all-pairs fallback")
  }

  test("fuzzyDedup merges typo chains transitively, keeps the min id") {
    import spark.implicits._
    // A~B (1 edit), B~C (1 edit), but ed(A,C)=2 > maxDist=1 — the chain
    // must still collapse to one component; D is unpaired
    val df = Seq(
      (1L, "red bolt"), (2L, "red bolts"), (3L, "red boltsz"),
      (9L, "totally different thing")).toDF("id", "s")
    val out = FuzzyJoin.fuzzyDedup(df, "id", "s", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(out === Set((1L, "red bolt", 3L),
      (9L, "totally different thing", 1L)))
  }
}
