package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Numeric determinism: float sums are order-dependent, and a hash-compare
  * oracle cannot tolerate last-ulp drift. Dot products and norms are
  * therefore accumulated in DECIMAL (exact, order-independent): each
  * float×float product is exact in double, the double→decimal(38,18) cast
  * is deterministic, and decimal addition is exact. The final
  * decimal→double division is one deterministic rounding. Any engine
  * repeating these steps produces the identical bits.
  *
  * Scale: brute-force is a broadcast of the (small) query set against the
  * corpus — one map-side pass, top-k via per-query window. The LSH variant
  * buckets by random-hyperplane signature so each query only scans its
  * bucket: the 100 TB path, traded against recall.
  */
object Similarity {

  import graft.expressions.PipelineExpressions

  /** Exact decimal dot product of two float vectors (custom expression —
    * a tight loop instead of interpreted HOF lambdas; see
    * PipelineExpressions.DotExact for the numeric contract). */
  def dotExact(a: String, b: String): Column =
    PipelineExpressions.dot_exact(col(a), col(b))

  /** Exact decimal squared-norm → double sqrt. */
  def normExact(v: String): Column = PipelineExpressions.norm_exact(col(v))

  /** cosine = dot / (norm_a * norm_b), from precomputed norms. */
  def cosineFromParts(va: String, vb: String, na: String, nb: String): Column =
    dotExact(va, vb) / (col(na) * col(nb))

  /** Brute-force exact top-k cosine neighbors for each query vector.
    * Queries are broadcast (small side); ties broken by neighbor id so the
    * ranking is total. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      normExact(vecCol).as("qn"))
    val c = Dedup.spread(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        normExact(vecCol).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineFromParts("qv", "cv", "qn", "cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Random-hyperplane LSH signature: bit i = sign(dot(v, h_i)) where the
    * hyperplane components are derived deterministically from
    * xxhash64(i, dim) — no stored model, reproducible across runs. */
  def hyperplaneSignature(vecCol: String, bits: Int): Column = expr(
    s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, i) ->
       |  acc + CASE WHEN
       |    aggregate(zip_with($vecCol,
       |        transform(sequence(0, size($vecCol) - 1),
       |          d -> CAST(xxhash64(concat('hp', i, '_', d)) % 1000001 AS DOUBLE) / 1000001.0 - 0.5),
       |      (x, h) -> CAST(x AS DOUBLE) * h),
       |      CAST(0 AS DOUBLE), (a2, v2) -> a2 + v2) > 0
       |  THEN shiftleft(1L, i) ELSE 0L END)""".stripMargin)

  /** Bucketed approximate top-k: queries only scan their signature bucket.
    * Approximate by construction — no SQL oracle; checked rows-only. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int = 12): DataFrame = {
    val sig = (df: DataFrame) =>
      df.withColumn("bucket", hyperplaneSignature(vecCol, bits))
    val q = sig(queries).select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), normExact(vecCol).as("qn"), col("bucket"))
    val c = sig(corpus).select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), normExact(vecCol).as("cn"), col("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineFromParts("qv", "cv", "qn", "cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** IVF-style coarse quantizer: assign each vector to the nearest of
    * `nlist` deterministic pseudo-centroids (hyperplane-hash cells work as
    * well in practice for the shuffle-shape; this models the partition-by-
    * centroid layout used at scale). Returns (id, centroid). */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int): DataFrame =
    df.select(col(idCol).as("id"),
      (hyperplaneSignature(vecCol, 30) % nlist).as("centroid"))
}
