package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity join (entity resolution / record linkage).
  *
  * Matches every left row to every right row whose string is within
  * `maxDist` Levenshtein edits — the "match a dirty batch against the
  * master list" shape (projects use it for entity resolution; training-data
  * pipelines for near-identical title/URL collapsing).
  *
  * Scale design (Ed-Join, Xiao et al. VLDB 2008 — the standard
  * distributed similarity-join recipe):
  *   - NEVER all-pairs. Each string contributes only its PREFIX q-grams —
  *     the `q·maxDist + 1` grams that are globally rarest (frequency asc,
  *     gram asc under exact integer counts). One edit operation changes at
  *     most `q` padded q-grams, so two strings within `maxDist` edits share
  *     at least one gram of each other's (q·maxDist+1)-prefixes (the
  *     prefix-filter lemma at overlap ≥ max(|A|,|B|) − q·maxDist);
  *     candidates are the equi-join of the exploded prefixes — rare grams
  *     keep every join bucket's fan-out small, the same skew argument the
  *     MinHash band join makes.
  *   - Verification is EXACT: `levenshtein(l, r, maxDist)` (the early-exit
  *     threshold form) over candidates only, so precision is 1 and the
  *     result is INDEPENDENT of the blocking — which is what lets a
  *     blocking-free quadratic oracle check the whole operator.
  *   - A length-band filter (|len(a) − len(b)| ≤ maxDist) prunes candidate
  *     pairs before the distance compute; it is provably safe (each edit
  *     changes the length by at most 1), so the oracle carries it too.
  *   - Shuffles: the gram-frequency aggregate (output bounded by the gram
  *     vocabulary), one ranking window per side keyed by row id (prefix
  *     selection), the candidate equi-join on gram, and two verify joins on
  *     row ids — all narrow keys; strings never fan out beyond their
  *     prefix grams.
  *
  * Small-gram-set completeness: the prefix lemma needs a positive required
  * overlap α = max(|A|,|B|) − q·maxDist (set semantics; both within-k
  * bounds |A∩B| ≥ |A| − q·k and ≥ |B| − q·k hold, so α is valid whenever
  * positive). It goes vacuous only when BOTH sides have ≤ q·maxDist
  * distinct grams — very short strings ("ab"→"cd" at q=2, maxDist=2) and
  * degenerate low-complexity repeats ("aaaa…", whose distinct-gram count
  * stays 3 at any length). Every string with ≤ q·maxDist distinct grams
  * therefore ALSO carries a sentinel bucket gram; a qualifying×large pair
  * has max(|A|,|B|) > q·maxDist, so the lemma already covers it. The
  * sentinel bucket is quadratic in the small-gram-set row count — a sliver
  * for name/title fields; a corpus that is mostly tiny strings should drop
  * to a smaller q.
  *
  * Padding: grams are taken over the string padded with q−1 sentinel
  * () chars on each end — the standard positional-gram padding that
  * keeps the per-edit gram-damage bound ≤ q at the string's edges too.
  *
  * Reference behavior anchor: fuzzy matching sits outside the reference's
  * SQL surface (crates/dbt-agate exposes exact relational ops only); this
  * is part of the beyond-reference pipeline library, kept oracle-checkable
  * end to end.
  */
object FuzzyJoin {

  private val Pad = ""

  /** Sentinel is q+1 chars, longer than any real q-gram — can't collide. */
  private def shortSentinel(q: Int): String = Pad * (q + 1)

  /** Distinct padded q-grams as an array column — codegen'd sequence +
    * transform + substr, no explode until prefix selection. */
  private[ops] def gramsArray(s: Column, q: Int): Column = {
    val padded = concat(lit(Pad * (q - 1)), s, lit(Pad * (q - 1)))
    array_distinct(transform(
      sequence(lit(1), greatest(length(padded) - lit(q - 1), lit(1))),
      i => padded.substr(i, lit(q))))
  }

  /** Prefix grams per row: the q·k+1 globally rarest grams (frequency asc,
    * gram asc — exact integer counts over BOTH sides' bags, so the global
    * order is deterministic), plus the small-gram-set sentinel where the
    * prefix lemma needs it. Input: the exploded (id, gram) table — built
    * ONCE per side and shared with the frequency aggregate; gramsArray is
    * distinct per id, so the per-id row count IS the gram-set size. */
  private def prefixGrams(exploded: DataFrame, freq: DataFrame,
      q: Int, k: Int, carry: Seq[String] = Nil): DataFrame = {
    // `carry`: per-id payload columns (constant within an id, e.g. the
    // string length) threaded through so candidate pairs can be
    // length-banded BEFORE the pair distinct — they ride the window
    // and the small-set aggregate unchanged (grouping on a per-id
    // constant splits nothing).
    val ranked = exploded.join(freq, "gram")
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("f").asc, col("gram").asc)))
      .filter(col("rn") <= q * k + 1)
      .select("id", ("gram" +: carry): _*)
    val smallRows = exploded
      .groupBy("id", carry: _*).agg(count(lit(1)).as("__ng"))
      .filter(col("__ng") <= q * k)
      .select(col("id") +: lit(shortSentinel(q)).as("gram") +:
        carry.map(col): _*)
    ranked.unionByName(smallRows)
  }

  /** Levenshtein join of `left` strings to `right` strings.
    *
    * Output: (<leftId>, <rightId>, dist) for every cross pair with
    * levenshtein ≤ maxDist; NULL strings never match (SQL-null semantics,
    * matching the oracle's NULL-propagating levenshtein).
    */
  def editDistanceJoin(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(q >= 2, "q must be >= 2")
    val l = left.select(col(leftId).as("id"), col(leftStr).as("str"))
      .filter(col("str").isNotNull)
    val r = right.select(col(rightId).as("id"), col(rightStr).as("str"))
      .filter(col("str").isNotNull)

    // each side's exploded gram table is built once and reused three
    // ways (frequency bag, prefix ranking, gram-set size); maybeCache
    // keeps the reuse from recomputing the explode in local runs while
    // leaving cluster runs streaming (Dedup's signature-cache policy).
    // The string length rides along (one int per exploded row): the
    // Ed-Join length band |len(a)−len(b)| ≤ maxDist is a NECESSARY
    // condition for ed ≤ maxDist, so applying it at candidate
    // generation prunes pairs BEFORE the distinct's shuffle and the
    // two string joins instead of after them.
    val lexp = Dedup.maybeCache(
      l.select(col("id"), explode(gramsArray(col("str"), q)).as("gram"),
        length(col("str")).as("__len")))
    val rexp = Dedup.maybeCache(
      r.select(col("id"), explode(gramsArray(col("str"), q)).as("gram"),
        length(col("str")).as("__len")))

    // one global gram-frequency table spanning both sides
    val freq = lexp.select("gram").unionByName(rexp.select("gram"))
      .groupBy("gram").agg(count(lit(1)).as("f"))

    val lp = prefixGrams(lexp, freq, q, maxDist, carry = Seq("__len"))
      .withColumnRenamed("id", "__lid")
      .withColumnRenamed("__len", "__llen")
    val rp = prefixGrams(rexp, freq, q, maxDist, carry = Seq("__len"))
      .withColumnRenamed("id", "__rid")
      .withColumnRenamed("__len", "__rlen")
    // No pair-level distinct before verification: a candidate pair forms
    // once per SHARED prefix gram — multiplicity is bounded by the prefix
    // size (q·maxDist+1) and is ~1 for the non-matching majority — so
    // deduplicating the full candidate set cost an exchange of EVERY
    // candidate just to save a few threshold-limited levenshtein calls.
    // The dedup now runs after the verify filter, where only the
    // surviving pairs (orders of magnitude fewer at any real selectivity)
    // shuffle; `dist` is a function of the pair, so dropDuplicates on the
    // pair ids alone leaves the output set unchanged.
    val candidates = lp.join(rp, "gram")
      .filter(abs(col("__llen") - col("__rlen")) <= maxDist)
      .select("__lid", "__rid")

    candidates
      .join(l.select(col("id").as("__lid"), col("str").as("__ls")), "__lid")
      .join(r.select(col("id").as("__rid"), col("str").as("__rs")), "__rid")
      .withColumn("dist", levenshtein(col("__ls"), col("__rs"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("__lid").as(leftId), col("__rid").as(rightId), col("dist"))
      .dropDuplicates(leftId, rightId)
  }

  /** Self-join variant: unordered within-set pairs (id_a < id_b).
    *
    * Dedicated path, not a delegation to [[editDistanceJoin]] with the
    * same table on both sides: that shape paid everything twice — two
    * cached copies of the identical exploded-gram table, two identical
    * prefix-ranking windows, a doubled gram-frequency bag (2f preserves
    * the (f asc, gram asc) order, so prefix selection is unchanged), and
    * exact-levenshtein verification of BOTH orientations of every pair
    * before the id_a < id_b cut. Here the explode, the frequency
    * aggregate, and the ranking window run once, and the orientation cut
    * happens BEFORE the distinct + string joins + levenshtein, halving
    * the verify stage. Output is identical by the blocking-independence
    * contract (exact verification; the prefix lemma covers unordered
    * pairs, and every candidate pair still forms in at least one
    * orientation of the single prefix table's self-join). */
  def editDistanceSelfJoin(
      df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(q >= 2, "q must be >= 2")
    val s = df.select(col(s"`$idCol`").as("id"), col(s"`$strCol`").as("str"))
      .filter(col("str").isNotNull)
    val exp = Dedup.maybeCache(
      s.select(col("id"), explode(gramsArray(col("str"), q)).as("gram"),
        length(col("str")).as("__len")))
    val freq = exp.select("gram").groupBy("gram").agg(count(lit(1)).as("f"))
    val p = prefixGrams(exp, freq, q, maxDist, carry = Seq("__len"))
    // same Ed-Join length band as the two-sided path: necessary for
    // ed ≤ maxDist, so pruning here (before the pair distinct and the
    // string joins) never loses a pair
    // dedup AFTER the verify filter, like the two-sided path: only the
    // surviving pairs shuffle, and duplicate candidates (≤ one per shared
    // prefix gram) just repeat a threshold-limited levenshtein
    val candidates = p.withColumnRenamed("id", "__lid")
      .withColumnRenamed("__len", "__llen")
      .join(p.withColumnRenamed("id", "__rid")
        .withColumnRenamed("__len", "__rlen"), "gram")
      .filter(col("__lid") < col("__rid") &&
        abs(col("__llen") - col("__rlen")) <= maxDist)
      .select("__lid", "__rid")
    candidates
      .join(s.select(col("id").as("__lid"), col("str").as("__ls")), "__lid")
      .join(s.select(col("id").as("__rid"), col("str").as("__rs")), "__rid")
      .withColumn("dist", levenshtein(col("__ls"), col("__rs"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("__lid").as("id_a"), col("__rid").as("id_b"), col("dist"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Edit-distance near-dup collapse: the title/surface-form dedup pass —
    * within-maxDist pairs become components (typo chains A~B~C merge even
    * when ed(A,C) > maxDist, the transitive-closure semantics every
    * fuzzy-dedup wants), and each component keeps its minimum id, with
    * unpaired rows surviving untouched. Pure composition:
    * [[editDistanceSelfJoin]] pairs into [[Dedup.connectedComponents]] +
    * canonical keep — the same component machinery the MinHash corpus
    * dedup rides, so the scale shape is already established (pair graph
    * is bucketed; the loser anti-join broadcasts; the corpus itself never
    * shuffles). Output: the surviving rows + `n_dups` (component size; 1
    * for unpaired). */
  def fuzzyDedup(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2): DataFrame =
    Dedup.canonicalCorpus(df,
      editDistanceSelfJoin(df, idCol, strCol, maxDist, q), idCol)

  // ---- incremental form: frozen-frequency prefix index -----------------

  /** Single-counted gram-frequency table over a corpus — the FROZEN
    * ordering artifact of incremental fuzzy dedup (vocabulary-bounded,
    * never corpus-sized). Any total order on grams preserves the
    * q·k+1 prefix lemma's recall guarantee; what matters is that every
    * run uses the SAME order, which freezing this table provides. */
  def gramFrequencies(df: DataFrame, strCol: String, q: Int): DataFrame =
    df.select(explode(gramsArray(col(s"`$strCol`"), q)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("f"))

  /** Prefix-gram postings (id, gram) of a corpus under an EXPLICIT
    * frozen frequency table — the persistable narrow index half.
    * Grams absent from `freq` rank rarest (f = 0, then gram asc), a
    * rule every batch applies identically, so prefixes chosen in
    * different runs are mutually consistent and batch-vs-index recall
    * stays EXACT (the lemma needs only a common total order; exact
    * levenshtein verification then makes the pair set order-free). */
  def prefixGramsFrozen(df: DataFrame, idCol: String, strCol: String,
      freq: DataFrame, maxDist: Int, q: Int = 2): DataFrame = {
    val s = df.select(col(s"`$idCol`").as("id"), col(s"`$strCol`").as("str"))
      .filter(col("str").isNotNull)
    val exp = Dedup.maybeCache(
      s.select(col("id"), explode(gramsArray(col("str"), q)).as("gram")))
    val f0 = exp.select("gram").distinct()
      .join(freq.select(col("gram"), col("f")), Seq("gram"), "left")
      .select(col("gram"), coalesce(col("f"), lit(0L)).as("f"))
    prefixGrams(exp, f0, q, maxDist)
  }

  /** Edit-distance near-dup pairs of a NEW batch against itself AND a
    * persisted string index — the continuous-ingest twin of
    * [[editDistanceSelfJoin]]. `indexPrefix` is the narrow (id, gram)
    * prefix-posting twin of the (id, str) index, left-semi pruned to
    * the batch's own prefix grams BEFORE pairing; strings join back
    * only for length-banded candidates, and old×old pairs never form
    * (one side of every candidate is a batch prefix row). All prefixes
    * — index rows at their build time, the batch now — are selected
    * under the same frozen frequency order, so recall matches the
    * full-corpus operator exactly; verification is exact levenshtein
    * either way. Output: (id_a, id_b, dist), unordered pairs. */
  def editDistanceIncremental(newDf: DataFrame, idCol: String,
      strCol: String, index: DataFrame, indexPrefix: DataFrame,
      frozenFreq: DataFrame, maxDist: Int, q: Int = 2): DataFrame = {
    val n = newDf.select(col(s"`$idCol`").as("id"),
        col(s"`$strCol`").as("str"))
      .filter(col("str").isNotNull)
    val np = Dedup.maybeCache(
      prefixGramsFrozen(n, "id", "str", frozenFreq, maxDist, q))
    val ip = indexPrefix.select(col("id"), col("gram"))
      .join(np.select("gram").distinct(), Seq("gram"), "left_semi")
    // same post-verify dedup as the batch operators (batch×batch pairs
    // can additionally form in both orientations before the
    // least/greatest normalization, so multiplicity is ≤ 2·(q·k+1) here)
    val cand = np.withColumnRenamed("id", "__lid")
      .join(np.unionByName(ip).withColumnRenamed("id", "__rid"), "gram")
      .filter(col("__lid") =!= col("__rid"))
      .select(least(col("__lid"), col("__rid")).as("id_a"),
        greatest(col("__lid"), col("__rid")).as("id_b"))
    val allStr = n.unionByName(index.select(col("id"), col("str")))
    cand
      .join(allStr.select(col("id").as("id_a"), col("str").as("__sa")),
        "id_a")
      .join(allStr.select(col("id").as("id_b"), col("str").as("__sb")),
        "id_b")
      .filter(abs(length(col("__sa")) - length(col("__sb"))) <= maxDist)
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
      .dropDuplicates("id_a", "id_b")
  }
}
