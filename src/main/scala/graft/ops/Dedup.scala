package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design notes (the point of each algorithm at 100 TB):
  *   - exact: one shuffle on a 128-bit content hash — never on the content
  *     itself (hash first, shuffle 16 bytes/row, not documents).
  *   - MinHash+LSH: signatures are computed MAP-SIDE with higher-order
  *     array expressions (no explode, no shuffle); only (band, bandhash)
  *     pairs shuffle — 32 ints/doc. Candidate pairs are verified with exact
  *     Jaccard so precision is 1; banding (b=32, r=4) gives recall
  *     1-(1-s^4)^32 ≈ 1-4e-8 at s=0.8.
  *   - SimHash: 64-bit signature map-side; pigeonhole banding into 4
  *     16-bit chunks means a pair with hamming ≤ 3 must share a chunk —
  *     candidates come from 4 equi-joins, verified with bit_count(xor).
  *   - n-gram Jaccard: the exact quadratic baseline — kept for correctness
  *     oracles and small slices; the LSH paths are the scale story.
  */
object Dedup {

  /** Word k-shingles, distinct, guarded for short docs. Shingle text is
    * space-joined so a DuckDB oracle can reproduce it byte-for-byte. */
  def shingleExpr(textCol: String, k: Int): Column = expr(
    s"""CASE WHEN size(split($textCol, ' ')) >= $k THEN
       |  array_distinct(transform(
       |    sequence(0, size(split($textCol, ' ')) - $k),
       |    i -> concat_ws(' ', slice(split($textCol, ' '), i + 1, $k))))
       |ELSE array() END""".stripMargin)

  /** Exact dedup: keep the lowest id per identical content. The shuffle
    * key is md5(content) — constant width regardless of document size. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.withColumn("__h", md5(col(contentCol)))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("__h")

  /** MinHash signature: for each of `perms` hash permutations, the min over
    * shingles of xxhash64(shingle, permutation tag). Pure map-side array
    * math — at cluster scale this is embarrassingly parallel. */
  def minhashSignature(shinglesCol: String, perms: Int): Column = expr(
    s"""transform(sequence(0, ${perms - 1}),
       |  p -> array_min(transform($shinglesCol,
       |         s -> xxhash64(concat(s, '#', cast(p AS STRING))))))""".stripMargin)

  /** LSH candidate pairs from banded minhash signatures, verified with
    * exact Jaccard ≥ `threshold` over the shingle sets. Output: (id_a,
    * id_b, jaccard) with id_a < id_b. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, perms: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    val r = perms / bands
    val sigs = df
      .select(col(idCol).as("id"), shingleExpr(textCol, k).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature("sh", perms))
    val banded = sigs.select(col("id"), col("sh"),
      posexplode(expr(
        s"""transform(sequence(0, ${bands - 1}), b -> xxhash64(concat_ws(',',
           |  transform(slice(sig, b * $r + 1, $r), v -> cast(v AS STRING)))))""".stripMargin))
        .as(Seq("band", "bandhash")))
    val a = banded.select(col("band"), col("bandhash"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bandhash"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = a.join(b,
      a("band") === b("band") && a("bandhash") === b("bandhash") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
    verifyJaccard(candidates, threshold)
  }

  /** Exact all-pairs n-gram Jaccard ≥ threshold (quadratic baseline). */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingleExpr(textCol, k).as("sh"))
      .filter(size(col("sh")) > 0)
    // prune the quadratic join: pairs must share at least one shingle
    val ex = sh.select(col("id"), explode(col("sh")).as("s"))
    val pairIds = ex.as("x").join(ex.as("y"),
      col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val candidates = pairIds
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
    verifyJaccard(candidates, threshold)
  }

  private def verifyJaccard(candidates: DataFrame, threshold: Double): DataFrame =
    candidates
      .withColumn("jaccard",
        expr("size(array_intersect(sh_a, sh_b))").cast("double") /
          expr("size(array_union(sh_a, sh_b))"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))

  /** 64-bit SimHash packed into 4×16-bit int chunks (columns c0..c3).
    * Bit j's weight = Σ over tokens of (bit_j(md5(token)) ? +1 : -1); the
    * bit is set iff the weight is positive. Bits derive from md5 hex
    * digits, so any engine with md5 computes the identical signature —
    * that is what makes the DuckDB oracle possible. Map-side only. */
  def withSimhashChunks(df: DataFrame, textCol: String): DataFrame = {
    val weights =
      s"""transform(sequence(0, 63), j ->
         |  aggregate(split($textCol, ' '), 0L, (acc, t) ->
         |    acc + CASE WHEN
         |      (shiftright(cast(conv(substring(md5(t), cast(j / 4 AS INT) + 1, 1), 16, 10) AS INT),
         |                  3 - cast(j % 4 AS INT)) & 1) = 1
         |    THEN 1 ELSE -1 END))""".stripMargin
    def chunk(c: Int) = expr(
      s"""aggregate(sequence(0, 15), 0,
         |  (acc, b) -> acc + CASE WHEN element_at(__w64, $c * 16 + b + 1) > 0
         |                        THEN shiftleft(1, b) ELSE 0 END)""".stripMargin)
    df.withColumn("__w64", expr(weights))
      .withColumn("c0", chunk(0)).withColumn("c1", chunk(1))
      .withColumn("c2", chunk(2)).withColumn("c3", chunk(3))
      .drop("__w64")
  }

  /** SimHash near-dups: pairs with hamming distance ≤ maxHamming. With 4
    * chunks and maxHamming ≤ 3, every qualifying pair shares ≥1 chunk
    * (pigeonhole), so candidates come from 4 narrow equi-joins instead of a
    * cross join. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding guarantees recall only for hamming <= 3")
    val sigs = withSimhashChunks(
      df.select(col(idCol).as("id"), col(textCol)), textCol)
      .select(col("id"), col("c0"), col("c1"), col("c2"), col("c3"))
      .cache()
    val right = sigs.select(col("id").as("id_b"), col("c0").as("d0"),
      col("c1").as("d1"), col("c2").as("d2"), col("c3").as("d3"))
    val candidates = (0 to 3).map { c =>
      sigs.join(right,
        col(s"c$c") === col(s"d$c") && col("id") < col("id_b"))
    }.reduce(_ unionByName _).dropDuplicates("id", "id_b")
    candidates
      .withColumn("hamming",
        expr("bit_count(c0 ^ d0) + bit_count(c1 ^ d1) + bit_count(c2 ^ d2) + bit_count(c3 ^ d3)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id").as("id_a"), col("id_b"), col("hamming"))
  }

  /** Embedding-cosine near-dup pairs ≥ threshold. Exact-arithmetic cosine
    * (decimal dot/norms) so results are reproducible bit-for-bit across
    * engines; see Similarity.cosineExact for the scale discussion. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.normExact(vecCol).as("norm"))
    val a = v.select(col("id").as("id_a"), col("v").as("va"), col("norm").as("na"))
    val b = v.select(col("id").as("id_b"), col("v").as("vb"), col("norm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosineFromParts("va", "vb", "na", "nb"))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
