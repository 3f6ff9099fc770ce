package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate the corpus into one
  * global token stream (each document followed by `sepTokens` separator
  * tokens, e.g. an EOS) and cut it into fixed-length training sequences of
  * `seqLen` tokens — the standard "concat and chunk" batch-assembly step
  * (GPT-style pretraining; reference pipelines budget and shard training
  * batches the same way, cf. the token-budgeted mixing in
  * `ops/Sampling.scala`). The operator assigns every document its global
  * token offset and the range of sequence ids it lands in; downstream
  * sharding/loader code needs exactly these offsets.
  *
  * The core is a distributed prefix sum over a total order — the one
  * primitive here that naively degenerates at scale: a bare
  * `Window.orderBy` without `partitionBy` collapses the whole corpus into
  * a single partition. Instead the sum is decomposed by ORDER-KEY RANGE:
  *
  *   1. one cheap agg for the global [min, max] of the (unique, integral)
  *      order key;
  *   2. each row maps to bucket `(key − min) div width` — a pure map-side
  *      derivation, independent of physical partitioning (so the result
  *      never depends on file splits, AQE coalescing, or sampling-based
  *      range boundaries, and nothing needs caching between passes);
  *   3. per-bucket length sums (one partial-agg'd shuffle of ≤ `buckets`
  *      rows) come back to the driver, which computes the exclusive
  *      cumulative offsets — driver state is O(buckets), the same bound as
  *      the k-means centroid reads;
  *   4. the offsets broadcast-join back on bucket id and a window
  *      partitioned BY BUCKET adds the within-bucket running sum.
  *
  * Every per-bucket window sees ~1/buckets of the corpus, so partitions
  * stay bounded at 100 TB by raising `buckets` (dense ids ⇒ balanced
  * buckets; pathologically clustered ids skew bucket sizes, in which case
  * pre-densify with a dense rank or raise `buckets`). All arithmetic is
  * integer (LONG adds and `div`), so offsets and sequence ids are exact
  * and engine-portable; the oracle is a plain global window cumsum.
  *
  * Output columns appended: `tok_start` (global offset of the document's
  * first token), `seq_first`/`seq_last` (ids of the sequences containing
  * its first/last own token — separator tokens pad the stream but belong
  * to no document; an empty document spans the sequence holding its
  * offset). `seq_first != seq_last` flags documents split across a
  * sequence boundary — the packing-quality metric curation reports track.
  */
object Packing {

  /** Global token offsets + sequence-id spans for concat-and-chunk
    * packing. `orderCol` must be a unique integral key (the deterministic
    * concatenation order); `tokensCol` the per-document token count.
    */
  def packSequences(df: DataFrame, orderCol: String, tokensCol: String,
      seqLen: Int, sepTokens: Int = 1, buckets: Int = 256): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    require(sepTokens >= 0, s"sepTokens must be >= 0: $sepTokens")
    val contrib = col(tokensCol).cast("long") + lit(sepTokens.toLong)
    withSpanCols(
      exclusiveRunningSum(df, orderCol, contrib, "tok_start", buckets),
      tokensCol, seqLen)
  }

  /** Exclusive running sum of `contrib` over the total order of the
    * unique integral `orderCol`, as `outCol` (LONG) — the bucketed
    * distributed prefix sum described above, shared by sequence packing
    * and token-budget shard packing. */
  private[ops] def exclusiveRunningSum(df: DataFrame, orderCol: String,
      contrib: org.apache.spark.sql.Column, outCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val orderType = df.schema(orderCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(orderType),
      s"order column $orderCol must be integral, got ${orderType.simpleString}")

    val bounds = df.agg(min(col(orderCol)).cast("long"),
      max(col(orderCol)).cast("long")).head()
    if (bounds.isNullAt(0)) return df.withColumn(outCol, lit(0L))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (hi - lo) / buckets + 1L)

    val bucketed = df.withColumn("__bkt",
      expr(s"(cast($orderCol as bigint) - ${lo}L) div ${width}L"))

    // exclusive per-bucket offsets; driver state O(buckets)
    val sums = bucketed.groupBy("__bkt").agg(sum(contrib).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val exclusive = sums.scanLeft(0L) { case (acc, (_, s)) => acc + s }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = sums.map(_._1).zip(exclusive).toSeq.toDF("__bkt", "__off")

    val w = Window.partitionBy("__bkt").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offDf), "__bkt")
      .withColumn(outCol,
        coalesce(sum(contrib).over(w), lit(0L)) + col("__off"))
      .drop("__bkt", "__off")
  }

  /** Materialize the packed training sequences themselves: concatenate
    * every document's whitespace tokens (each followed by ONE `sepToken`,
    * the EOS) in `orderCol` order and emit each fixed-length sequence of
    * `seqLen` tokens as a row — the step that actually builds pretraining
    * batches, downstream of [[packSequences]]'s offset assignment.
    *
    * Shape: offsets come from the same bucketed prefix sum; each document
    * then EXPLODES into one piece per sequence it spans (pieces ≈
    * n_docs + total_tokens/seqLen rows — each piece is the document's
    * token sub-slice landing in that sequence, an O(1)-per-token map-side
    * slice), and ONE shuffle keyed by sequence id groups the pieces.
    * Within a sequence, pieces from different documents occupy disjoint
    * contiguous position ranges, so sorting the collected (position,
    * piece) structs and flattening reconstructs the stream exactly; a
    * sequence holds ≤ seqLen tokens, so per-group state is bounded. This
    * is the unavoidable cost of batch assembly — the corpus text must
    * move once to its sequence — and it is exactly one shuffle.
    *
    * Output: `seq_id`, `n_tokens` (= seqLen except the tail), `seq_text`.
    * Deterministic text math end to end, so sequence bodies are
    * engine-exact (pin md5(seq_text) in oracles). */
  def assembleSequences(df: DataFrame, orderCol: String, textCol: String,
      seqLen: Int, sepToken: String = "</s>",
      buckets: Int = 256): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    require(sepToken.nonEmpty && !sepToken.contains(" "),
      s"sepToken must be a single non-empty token: '$sepToken'")
    val toks = df.select(col(orderCol), col(textCol))
      .withColumn("__toks",
        when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
          .otherwise(split(trim(col(textCol)), " +")))
      .withColumn("__n", size(col("__toks")).cast("long"))
    val packed = exclusiveRunningSum(toks, orderCol,
      col("__n") + lit(1L), "__start", buckets)
    val L = seqLen.toLong
    val pieces = packed
      // sequences spanned, separator included (it sits at __start + __n)
      .select(col("__start"), col("__toks"), col("__n"),
        explode(sequence(expr(s"__start div ${L}L"),
          expr(s"(__start + __n) div ${L}L"))).as("seq_id"))
      .withColumn("__lo",
        greatest(lit(0L), col("seq_id") * L - col("__start")))
      .withColumn("__hi",
        least(col("__n"), (col("seq_id") + 1) * L - col("__start")))
      .withColumn("__piece", expr(
        "slice(__toks, cast(__lo + 1 as int), cast(__hi - __lo as int))"))
      .withColumn("__piece",
        when(col("seq_id") === expr(s"(__start + __n) div ${L}L"),
          concat(col("__piece"), array(lit(sepToken))))
          .otherwise(col("__piece")))
      .select(col("seq_id"),
        (col("__start") + col("__lo")).as("__pos"), col("__piece"))
    pieces.groupBy("seq_id")
      .agg(array_sort(collect_list(struct(col("__pos"), col("__piece"))))
        .as("__ps"))
      .select(col("seq_id"),
        flatten(col("__ps.__piece")).as("__all"))
      .select(col("seq_id"), size(col("__all")).cast("long").as("n_tokens"),
        array_join(col("__all"), " ").as("seq_text"))
  }

  /** seq_first/seq_last from tok_start + the doc's own token count (all
    * values non-negative, so `div` == floor division in Spark and `//` in
    * DuckDB). */
  private def withSpanCols(df: DataFrame, tokensCol: String,
      seqLen: Int): DataFrame =
    df.withColumn("seq_first", expr(s"tok_start div ${seqLen}L"))
      .withColumn("seq_last", expr(
        s"(tok_start + greatest(cast($tokensCol as bigint) - 1L, 0L)) div ${seqLen}L"))
}
