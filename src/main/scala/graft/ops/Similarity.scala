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
    val c = Dedup.spread(corpus.select(col(idCol), col(vecCol)))
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

  /** Hyperplane weight w(i, d) = (int64 of the first 15 hex chars of
    * md5("hp{i}_{d}")) % 2001 - 1000 — standard MD5, so any engine can
    * re-derive the model with no stored state. */
  private[graft] def hyperplaneWeight(i: Int, d: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"hp${i}_$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
  }

  /** Weight matrix rows i₀ … i₀+n−1 of the deterministic hyperplane model,
    * precomputed driver-side once per query (n·dim MD5s — negligible). */
  private def weightRows(from: Int, n: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(n, dim)((i, d) => hyperplaneWeight(from + i, d))

  /** Random-hyperplane LSH signature: bit i = sign(dot(q(v), w_i)) over
    * INTEGER math — component quantized once (q(d) = round(v[d]·10^6) as
    * long, a single deterministic double rounding, ties away from zero in
    * both Spark and DuckDB) and integer hyperplane weights from
    * [[hyperplaneWeight]]. No float-sum order or last-ulp sensitivity, so
    * a SQL oracle reproduces buckets bit-for-bit (PipelinePack.sigSql is
    * the DuckDB mirror). Evaluated by the native
    * PipelineExpressions.HyperplaneSig tight loop (one quantization per
    * row) — the SQL formulation survives only as the DuckDB oracle text. */
  def hyperplaneSignature(vecCol: String, bits: Int, dim: Int = 64): Column =
    PipelineExpressions.hyperplane_sig(col(vecCol), weightRows(0, bits, dim))

  /** Per-band r-bit hyperplane signatures (array of `bands` longs), bit j
    * of band b derived from global hyperplane index b·r+j — the same
    * integer-exact math as [[hyperplaneSignature]], grouped for banded-LSH
    * OR-construction (match in ANY band → candidate). */
  def bandSignatures(vecCol: String, bands: Int, r: Int,
      dim: Int = 64): Column =
    PipelineExpressions.hyperplane_band_sigs(col(vecCol),
      weightRows(0, bands * r, dim), r)

  /** Bucketed approximate top-k: queries only scan their signature bucket.
    * Approximate in recall, but fully deterministic: the integer signature
    * math is mirrored in DuckDB SQL, so the result is oracle-checkable. */
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

  /** Deterministic Lloyd's k-means over an embedding column — the real
    * IVF coarse quantizer (FAISS IVF training, expressed Spark-first).
    *
    * Determinism (what makes the DuckDB oracle possible): init = the
    * vectors of the k SMALLEST ids; assignment = exact-decimal squared-L2
    * argmin (NearestCentroids numeric contract, ties → lower index);
    * update = per-(cluster, dim) decimal-exact sum (order-independent)
    * cast to double, divided by the cluster count (one IEEE division).
    * Every step is bit-reproducible regardless of partitioning.
    *
    * Scale shape: assignment is one map-side pass against broadcast
    * centroids (k·dim doubles ride inside the expression); the update
    * shuffles only k rows × dim decimal-sum columns of partial-agg state
    * per partition (one wide hash agg keyed by cid), never vectors; the
    * driver holds k×dim doubles per round. Empty clusters keep their
    * previous centroid. */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Array[Array[Double]] =
    // the decimal-exact distance loop is CPU-heavy (k×dim BigDecimal ops
    // per row) — spread a single-split input across the cluster first
    kmeansOnSpread(Dedup.spread(corpus.select(col(idCol), col(vecCol))),
      idCol, vecCol, k, iters)

  private def kmeansOnSpread(c: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = c
      .select(col(idCol), col(vecCol)).orderBy(col(idCol)).limit(k)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    if (centroids.isEmpty) return centroids
    val dim = centroids(0).length
    for (_ <- 0 until iters) {
      // ONE wide aggregate per iteration: group by the assignment and sum
      // each dimension as its own DECIMAL(38,18) column (dim is the
      // centroid width — a model constant, never corpus-sized). Decimal
      // addition is exact and order-independent, so per-(cid, d) sums are
      // bit-identical to the former posexplode + groupBy(cid, d) pass;
      // an earlier shape needed a cache() boundary because CollapseProject
      // pulled the k×dim assignment loop above the Generate and re-ran it
      // once per exploded element — with no Generate the assignment is
      // the grouping key, evaluated once per row, and the iteration does
      // ONE pass with no corpus-sized cache churn (guide §1.2: remove
      // passes before tuning them).
      val assigned = c.select(
        PipelineExpressions
          .nearest_centroids(col(vecCol), centroids, 1)(0).as("cid"),
        col(vecCol).as("__v"))
      // per-dimension divisor semantics (the former posexplode +
      // groupBy(cid, d) pass): dimension d divides by the number of rows
      // that HAVE element d — a short row must not dilute dimensions it
      // never contributed to. Computing dim count columns inline doubles
      // the aggregate past whole-stage codegen's field limit (measured:
      // q_ann_ivf 2.7→4.3 s on the interpreted fallback), so the hot
      // aggregate stays at dim sums + n + the size range, and only
      // clusters that are ACTUALLY ragged (min size ≠ max size) pay a
      // second per-dim count pass. Uniform-length clusters have
      // c_d = n exactly for every dimension their rows reach (a null sum
      // marks the rest), so the division operands — and results — are
      // bit-identical. try_element_at keeps ragged corpora off ANSI's
      // array-index error.
      val aggs = count(lit(1)).as("n") +:
        min(size(col("__v"))).as("mn") +: max(size(col("__v"))).as("mx") +:
        (0 until dim).map(d =>
          sum(expr(s"CAST(CAST(try_element_at(__v, ${d + 1}) AS DOUBLE) " +
            "AS DECIMAL(38,18))")).as(s"s$d"))
      val rows = assigned.groupBy("cid").agg(aggs.head, aggs.tail: _*)
        .collect()
      val raggedCids = rows.filter(r => r.getInt(2) != r.getInt(3))
        .map(_.getInt(0)).toSet
      val raggedCounts: Map[Int, Array[Long]] =
        if (raggedCids.isEmpty) Map.empty
        else assigned.filter(col("cid").isin(raggedCids.toSeq: _*))
          .groupBy("cid")
          .agg(count(when(size(col("__v")) > 0, lit(1))).as("c0"),
            (1 until dim).map(d =>
              count(when(size(col("__v")) > d, lit(1))).as(s"c$d")): _*)
          .collect()
          .map(r => r.getInt(0) -> Array.tabulate(dim)(d => r.getLong(1 + d)))
          .toMap
      val next = centroids.map(_.clone())
      rows.foreach { r =>
        val cid = r.getInt(0)
        val n = r.getLong(1)
        var d = 0
        while (d < dim) {
          // a null sum (no row in the cluster reaches dimension d) keeps
          // the previous coordinate, matching the empty-contribution
          // behavior of the old per-(cid, d) grouping
          if (!r.isNullAt(4 + d))
            next(cid)(d) = r.getDecimal(4 + d).doubleValue() /
              raggedCounts.get(cid).map(_(d)).getOrElse(n)
          d += 1
        }
      }
      centroids = next
    }
    centroids
  }

  /** Product-quantization top-k (Jégou et al. 2011, re-expressed
    * Spark-first): the memory-scale ANN path — each corpus vector
    * compresses to `m` one-byte-ish codes (nearest codeword per
    * subspace), and queries rank candidates by ADC (asymmetric distance
    * computation): per-query, per-subspace distance TABLES to the
    * codeword sets, so scoring a compressed corpus row costs m array
    * lookups + m exact decimal adds — no vector math on the scan side.
    *
    * Determinism (what makes a DuckDB oracle possible for a quantizer):
    * per-subspace codebooks train with the same decimal-exact k-means as
    * [[kmeansCentroids]] (init = sub-vectors of the k smallest ids,
    * exact-decimal argmin, order-independent decimal mean); codes and
    * ADC tables use the [[graft.expressions.PipelineExpressions]]
    * decimal contract, and the ADC sum is a sum of m DECIMAL(38,18)
    * values — bit-identical in any engine, ties → lower neighbor id.
    *
    * Scale shape: training shuffles only codebook-sized partial sums;
    * encoding is map-side (m codebooks of k×subDim doubles ride inside
    * expressions); the query scan broadcast-joins the queries (with
    * their ADC tables) onto the corpus codes — the corpus itself never
    * shuffles, only the top-k window moves (query, neighbor, distance)
    * rows. At 100 TB the codes table is ~dim/subDim/4 the corpus bytes,
    * which is the operator's entire point. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 4, codebookSize: Int = 16,
      iters: Int = 1): DataFrame = {
    val spread = Dedup.spread(corpus.select(col(idCol), col(vecCol)))
    val subDim = pqSubDim(spread, vecCol, m)
    val sub = subSlice(vecCol, subDim)
    val codebooks = trainPqCodebooks(spread, idCol, vecCol, m, subDim,
      codebookSize, iters)
    val codeCols = (0 until m).map(s =>
      PipelineExpressions.nearest_centroids(sub(s), codebooks(s), 1)(0)
        .as(s"__code$s"))
    val codes = spread.select(col(idCol).as("neighbor_id") +: codeCols: _*)
    val tableCols = (0 until m).map(s =>
      PipelineExpressions.centroid_distances(sub(s), codebooks(s))
        .as(s"__qd$s"))
    val q = queries.select(col(idCol).as("query_id") +: tableCols: _*)
    val scored = codes.join(broadcast(q),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("__adc", adcSum(m))
    pqRank(scored, k)
  }

  /** dim must split evenly into `m` subspaces of subDim each. */
  private def pqSubDim(spread: DataFrame, vecCol: String, m: Int): Int = {
    val dim = spread.select(size(col(vecCol))).head.getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    dim / m
  }

  /** Subspace s of a vector column: dims [s·subDim+1, (s+1)·subDim]. */
  private def subSlice(vecCol: String, subDim: Int): Int => Column =
    (s: Int) => slice(col(vecCol), s * subDim + 1, subDim)

  /** Per-subspace codebooks: the same deterministic decimal k-means,
    * trained on the sliced corpus (init = k smallest ids' sub-vectors).
    * The m trainings are independent job chains — run them concurrently
    * so their stages interleave on the cluster instead of serializing
    * m× the per-iteration driver latency (results are deterministic
    * regardless: each chain's math is partition-order independent). */
  private def trainPqCodebooksF(spread: DataFrame, idCol: String,
      vecCol: String, m: Int, subDim: Int, codebookSize: Int, iters: Int)(
      implicit ec: scala.concurrent.ExecutionContext)
      : scala.concurrent.Future[IndexedSeq[Array[Array[Double]]]] = {
    val sub = subSlice(vecCol, subDim)
    scala.concurrent.Future.sequence((0 until m).map(s =>
      scala.concurrent.Future {
        kmeansOnSpread(spread.select(col(idCol), sub(s).as(vecCol)),
          idCol, vecCol, codebookSize, iters)
      }))
  }

  private def trainPqCodebooks(spread: DataFrame, idCol: String,
      vecCol: String, m: Int, subDim: Int, codebookSize: Int,
      iters: Int): IndexedSeq[Array[Array[Double]]] = {
    import scala.concurrent.ExecutionContext.Implicits.global
    scala.concurrent.Await.result(
      trainPqCodebooksF(spread, idCol, vecCol, m, subDim, codebookSize, iters),
      scala.concurrent.duration.Duration.Inf)
  }

  /** ADC distance of a coded row: m table lookups + m exact decimal adds
    * (columns __qd0..__qd{m−1} hold the query's per-subspace tables,
    * __code0..__code{m−1} the row's codes). */
  private def adcSum(m: Int): Column =
    (0 until m).map(s =>
      element_at(col(s"__qd$s"), col(s"__code$s") + 1)).reduce(_ + _)

  /** Per-query top-k over ADC-scored candidates, ties → lower id. */
  private def pqRank(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__adc").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("__adc"), 6).cast("double").as("adc_d2"), col("rank"))
  }

  /** IVF+PQ top-k (Jégou et al. 2011 §IV, the FAISS `IVFPQ` composition
    * with by_residual=false, re-expressed Spark-first): the coarse
    * k-means quantizer of [[ivfTopK]] partitions the corpus codes into
    * `nlist` cells, each query probes only its `nprobe` nearest cells,
    * and candidates inside the probed cells rank by the same ADC table
    * lookups as [[pqTopK]]. This removes the ANN family's one remaining
    * linear scan: plain PQ scores EVERY corpus code per query (a
    * BroadcastNestedLoopJoin by design); here the probe is a broadcast
    * HASH join on the cell id, so each query touches ~nprobe/nlist of
    * the codes while keeping PQ's ~dim·4/m-fold compression.
    *
    * Determinism: coarse centroids and per-subspace codebooks both train
    * with the decimal-exact k-means ([[kmeansCentroids]] contract); cell
    * assignment, probe selection (nprobe smallest exact-decimal d2, ties
    * → lower cell), codes, and ADC sums are all bit-reproducible, so the
    * whole pipeline — both trainings included — is oracle-checkable.
    *
    * Scale shape: the corpus never shuffles (training moves only
    * codebook-sized partial sums; encoding + cell assignment are
    * map-side with the centroids riding inside the expressions); the
    * probe is one broadcast hash join of (query × nprobe) rows onto the
    * coded corpus; only (query, neighbor, distance) candidate rows reach
    * the top-k window. Recall trades at the cell boundary exactly as in
    * IVF — a true neighbor whose cell no probe touches is missed.
    *
    * Measured crossover vs plain PQ (BenchAnn, 1M × dim 64, nlist=64,
    * nprobe=8, NOTES_r09): per-query marginal cost is ~4× lower (the
    * pruning), but the coarse assignment adds a FIXED cost of
    * nlist × dim exact-decimal MACs per corpus row — the price of the
    * decimal k-means contract that makes the whole pipeline
    * oracle-checkable — so pruning wins beyond ~1k queries per
    * encoding. A production deployment amortizes that by encoding
    * once and probing many batches (or assigns cells in plain
    * doubles; determinism only matters for oracle parity). PQ's
    * all-pairs candidate sort is also a MEMORY hazard the probe
    * avoids: the ivfpq candidate set stays nprobe/nlist as large at
    * any query count. */
  def ivfpqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 8, nprobe: Int = 2,
      coarseIters: Int = 1, m: Int = 4, codebookSize: Int = 16,
      iters: Int = 1, trainSampleMod: Int = 4): DataFrame = {
    require(trainSampleMod >= 1, s"trainSampleMod must be >= 1: $trainSampleMod")
    val spread = Dedup.spread(corpus.select(col(idCol), col(vecCol)))
    val subDim = pqSubDim(spread, vecCol, m)
    val sub = subSlice(vecCol, subDim)
    // Coarse training runs on a deterministic 1/trainSampleMod corpus
    // sample (id % mod = 0) — standard IVF practice (FAISS trains the
    // coarse quantizer on a sample): cell shapes need only the corpus
    // DISTRIBUTION, and the full-dim decimal distance loop is the single
    // most expensive chain here (8×64 cells/row vs 16×16 per codebook).
    // Encoding still assigns EVERY corpus row against the trained
    // centroids, so no row escapes its cell. The sample is id-arithmetic
    // (not random), so the DuckDB oracle reproduces it exactly.
    val coarseTrain =
      if (trainSampleMod == 1) spread
      else spread.filter(col(idCol) % trainSampleMod === 0)
    // the coarse quantizer and the m subspace codebooks are m+1
    // independent training chains over the same cached spread — run them
    // ALL concurrently (the PQ pattern, extended), or the coarse pass
    // serializes a full extra k-means in front of the codebooks and the
    // pruning's scan savings get eaten by training wall-clock
    val (coarse, codebooks) = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      val coarseF = Future {
        kmeansOnSpread(coarseTrain, idCol, vecCol, nlist, coarseIters) }
      val cbF = trainPqCodebooksF(spread, idCol, vecCol, m, subDim,
        codebookSize, iters)
      Await.result(coarseF.zip(cbF), scala.concurrent.duration.Duration.Inf)
    }
    val codeCols = (0 until m).map(s =>
      PipelineExpressions.nearest_centroids(sub(s), codebooks(s), 1)(0)
        .as(s"__code$s"))
    val codes = spread.select(
      Seq(col(idCol).as("neighbor_id"),
        PipelineExpressions.nearest_centroids(col(vecCol), coarse, 1)(0)
          .as("cid")) ++ codeCols: _*)
    val tableCols = (0 until m).map(s =>
      PipelineExpressions.centroid_distances(sub(s), codebooks(s))
        .as(s"__qd$s"))
    val q = queries.select(
      Seq(col(idCol).as("query_id"),
        explode(PipelineExpressions.nearest_centroids(col(vecCol), coarse,
          nprobe)).as("cid")) ++ tableCols: _*)
    val scored = codes.join(broadcast(q), "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__adc", adcSum(m))
    pqRank(scored, k)
  }

  /** IVF top-k search: train `nlist` centroids on the corpus, assign each
    * corpus vector to its nearest list map-side, probe the `nprobe`
    * nearest lists per query, exact-cosine rerank within the probed lists.
    * Approximate in recall (a true neighbor in an unprobed list is
    * missed) but fully deterministic, so the whole pipeline — training
    * included — is oracle-checkable. At 100 TB: no corpus shuffle beyond
    * the k×dim-per-partition training sums; candidates flow through one
    * broadcast hash join on the list id. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nlist: Int = 8,
      nprobe: Int = 2, iters: Int = 2): DataFrame = {
    // spread once; training iterations and the final assignment all reuse
    // the cached, well-partitioned corpus
    val spreadCorpus = Dedup.spread(corpus.select(col(idCol), col(vecCol)))
    val centroids = kmeansOnSpread(spreadCorpus, idCol, vecCol, nlist, iters)
    val c = spreadCorpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), normExact(vecCol).as("cn"),
      PipelineExpressions.nearest_centroids(col(vecCol), centroids, 1)(0)
        .as("cid"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      normExact(vecCol).as("qn"),
      explode(PipelineExpressions.nearest_centroids(col(vecCol), centroids,
        nprobe)).as("cid"))
    val scored = c.join(broadcast(q), "cid")
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

  /** Rebuild a centroid matrix from its persisted (cid, i, val) rows —
    * the read-back half of a frozen `cluster_assign` artifact (k×dim
    * doubles, driver-bounded by the model size, never the corpus). */
  def centroidsFromRows(art: DataFrame): Array[Array[Double]] = {
    val rows = art.select(col("cid").cast("int"), col("i").cast("int"),
      col("val").cast("double")).collect()
    require(rows.nonEmpty, "empty centroid artifact")
    val k = rows.map(_.getInt(0)).max + 1
    val dim = rows.map(_.getInt(1)).max + 1
    val cents = Array.ofDim[Double](k, dim)
    rows.foreach(r => cents(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    cents
  }

  /** IVF top-k over a PERSISTED routed corpus — the search half of
    * [[ivfTopK]] decoupled from training. The corpus already carries
    * its coarse cell (`cidCol`, e.g. a pipeline `cluster_assign`
    * output) and the centroids come from the frozen artifact
    * ([[centroidsFromRows]]), so a query run trains NOTHING and touches
    * only the probed cells: queries broadcast with their nprobe cell
    * ids, the corpus joins on the cell key — laid out partitioned/
    * clustered by cell, the join's runtime filter prunes corpus FILES
    * before any vector math, and per-query work is ~nprobe/nlist of the
    * corpus. Same exact-decimal scoring and (cosine desc, id) tie rule
    * as [[ivfTopK]]; with identical centroids the results are
    * bit-identical. */
  def ivfTopKIndexed(queries: DataFrame, indexed: DataFrame,
      centroids: Array[Array[Double]], idCol: String, vecCol: String,
      cidCol: String, k: Int, nprobe: Int = 2): DataFrame = {
    val c = indexed.select(col(s"`$idCol`").as("neighbor_id"),
      col(s"`$vecCol`").as("cv"), normExact(vecCol).as("cn"),
      col(s"`$cidCol`").cast("int").as("cid"))
    val q = queries.select(col(s"`$idCol`").as("query_id"),
      col(s"`$vecCol`").as("qv"), normExact(vecCol).as("qn"),
      explode(PipelineExpressions.nearest_centroids(col(s"`$vecCol`"),
        centroids, nprobe)).as("cid"))
    val scored = c.join(broadcast(q), "cid")
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

  /** k-NN majority-vote label prediction over the exact top-k — the
    * other standard embedding-space label audit next to
    * [[centroidClassify]] (k-NN sees local structure the single
    * prototype flattens). Votes are counted per (query, neighbor
    * label); ties break (votes desc, label asc) so the prediction is
    * total. Returns (query_id, label, predicted). Built on
    * [[bruteForceTopK]] — the exact baseline; at corpus scale swap the
    * candidate generator for ivfpqTopK/lshTopK, which share the
    * (query_id, neighbor_id) shape the vote consumes. */
  def knnClassify(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val top = bruteForceTopK(queries, corpus, idCol, vecCol, k)
    val nLabels = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("__nl"))
    val votes = top.join(nLabels, "neighbor_id")
      .groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("__v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__v").desc, col("__nl"))
    val pred = votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("__nl").as("predicted"))
    pred.join(
        queries.select(col(idCol).as("query_id"), col(labelCol)),
        "query_id")
      .select(col("query_id"), col(labelCol), col("predicted"))
  }

  /** Hard-negative mining for contrastive/embedding training: for each
    * anchor vector, the top-k most-similar corpus vectors carrying a
    * DIFFERENT label — the near-miss negatives that make a triplet or
    * InfoNCE batch informative (same-label neighbors are excluded
    * because they are potential positives, not negatives). Exact
    * cosine via the decimal dot/norm expressions; ties break on
    * neighbor id so the cut is total. Returns
    * (query_id, neighbor_id, cosine, rank).
    *
    * Shape at 100 TB: identical to [[bruteForceTopK]] — anchors
    * broadcast, corpus streamed, per-anchor top-k via ranking window;
    * the label predicate is a map-side filter on the scored stream, so
    * mining negatives costs exactly what the plain k-NN scan costs. At
    * corpus scale swap the candidate generator for ivfpqTopK/lshTopK
    * (same output shape) and keep this label filter + rerank. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("__ql"), col(vecCol).as("qv"),
      normExact(vecCol).as("qn"))
    val c = Dedup.spread(corpus.select(col(idCol), col(vecCol),
        col(labelCol)))
      .select(col(idCol).as("neighbor_id"), col(labelCol).as("__cl"),
        col(vecCol).as("cv"), normExact(vecCol).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("__ql") =!= col("__cl"))
      .withColumn("cosine", cosineFromParts("qv", "cv", "qn", "cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Recall@k of an approximate neighbor list against the exact one —
    * THE standard ANN quality audit (how much recall did the
    * IVF/LSH/PQ pruning trade for its speed). Both inputs are
    * (query, neighbor) top-k tables; per query: the exact-list size,
    * the overlap, and recall = overlap / exact size (ONE exact-integer
    * double division + round(6)). Queries absent from the approx table
    * score their hits as 0 rather than dropping out.
    *
    * Shape at 100 TB: one equi-join keyed by (query, neighbor) on two
    * already-k-bounded tables — queries×k rows each, never
    * corpus-sized. */
  def recallAtK(approx: DataFrame, exact: DataFrame, queryCol: String,
      neighborCol: String): DataFrame = {
    val a = approx.select(col(queryCol).as("query_id"),
      col(neighborCol).as("__nb"), lit(1L).as("__hit"))
    val e = exact.select(col(queryCol).as("query_id"),
      col(neighborCol).as("__nb"))
    e.join(a, Seq("query_id", "__nb"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("k_exact"), col("hits"),
        round(col("hits").cast("double") / col("k_exact").cast("double"), 6)
          .as("recall"))
  }

  /** Reciprocal-rank fusion of two ranked candidate lists (Cormack et
    * al. 2009): rrf = Σ 1/(kc + rank) over the lists an item appears
    * in — the standard way to merge heterogeneous candidate
    * generators (lexical + vector, or two ANN indexes) without score
    * calibration. Items missing from one list contribute 0 for it;
    * the fused per-query top-`topK` re-ranks on the UNROUNDED fused
    * score with an item-id tie-break. Each reciprocal is one
    * exact-portable IEEE division, so fusion is engine-deterministic.
    *
    * Shape at 100 TB: one (query, item) full-outer join of two
    * already-k-bounded lists + a per-query ranking window over ≤2k
    * candidates — never corpus-sized. */
  def rrfFuse(a: DataFrame, b: DataFrame, queryCol: String,
      itemCol: String, rankCol: String, kc: Int = 60,
      topK: Int = 10): DataFrame = {
    require(kc > 0, s"kc must be positive: $kc")
    require(topK > 0, s"topK must be positive: $topK")
    val aa = a.select(col(queryCol).as("query_id"),
      col(itemCol).as("__i"), col(rankCol).cast("int").as("__ra"))
    val bb = b.select(col(queryCol).as("query_id"),
      col(itemCol).as("__i"), col(rankCol).cast("int").as("__rb"))
    val fused = aa.join(bb, Seq("query_id", "__i"), "full_outer")
      .withColumn("__rrf",
        coalesce(lit(1.0) / (lit(kc.toDouble) + col("__ra").cast("double")),
          lit(0.0)) +
        coalesce(lit(1.0) / (lit(kc.toDouble) + col("__rb").cast("double")),
          lit(0.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__rrf").desc, col("__i"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("__i").as("neighbor_id"),
        round(col("__rrf"), 6).as("rrf"), col("rank"))
  }

  /** Nearest-class-centroid classifier evaluation — assign every vector
    * to its closest [[classCentroids]] prototype and emit the confusion
    * matrix (label, predicted, n): the quality probe behind
    * prototype-based label audits ("how separable are my classes in
    * embedding space?") and the centroid side of SemDeDup-style
    * analyses. Labels must be integers.
    *
    * Shape: the centroid table (labels × dim, the k-means-centroids
    * driver bound) collects to the driver and rides into a map-side
    * [[graft.expressions.PipelineExpressions.nearest_centroids]]
    * expression — exact DECIMAL(38,18) distance sums, (d2, index)
    * tie-break — so classification adds NO join or shuffle beyond the
    * confusion count's own groups×groups aggregate. */
  def centroidClassify(df: DataFrame, labelCol: String,
      vecCol: String): DataFrame =
    centroidPredictions(df, labelCol, vecCol)
      .groupBy(col(labelCol), col("predicted"))
      .agg(count(lit(1)).as("n"))

  /** Per-row nearest-centroid predictions — [[centroidClassify]] without
    * the confusion rollup, for joins against other labelings (e.g.
    * [[knnClassify]] in an inter-classifier agreement audit). Keeps the
    * input columns plus `predicted`. */
  def centroidPredictions(df: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    import graft.expressions.PipelineExpressions
    val cent = classCentroids(df, labelCol, vecCol)
      .select(col(labelCol).cast("int"), col("dim"), col("mean"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    require(cent.nonEmpty, "no non-null vectors to train centroids on")
    val labels = cent.map(_._1).distinct.sorted
    val dims = cent.map(_._2).max + 1
    val byLabel = cent.groupBy(_._1).map { case (l, rows) =>
      val arr = new Array[Double](dims)
      rows.foreach { case (_, d, m) => arr(d) = m }
      l -> arr
    }
    val centroids: Array[Array[Double]] = labels.map(byLabel)
    val labelArr = array(labels.map(lit): _*)
    val pred = element_at(labelArr,
      element_at(PipelineExpressions.nearest_centroids(
        col(vecCol), centroids, nprobe = 1), 1) + 1)
    df.filter(col(vecCol).isNotNull)
      .withColumn("predicted", pred)
  }

  /** Class-separation matrix — pairwise L2 distance between the
    * [[classCentroids]] prototypes: which classes are CONFUSABLE in
    * embedding space (small separation predicts exactly the confusion
    * cells [[centroidClassify]] lights up, before running any
    * classifier). Centroid means are the round(6) exact-portable
    * doubles of classCentroids, each squared difference accumulates in
    * order-independent DECIMAL(38,18) over the labels²×dim grid, one
    * final sqrt + round(6). Everything is labels²×dim-bounded — the
    * corpus is touched only by the centroid aggregate itself. Returns
    * (label_a, label_b, l2) for a < b. */
  def classSeparation(df: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    val d18 = org.apache.spark.sql.types.DecimalType(38, 18)
    val cent = Dedup.maybeCache(classCentroids(df, labelCol, vecCol)
      .select(col(labelCol).as("__l"), col("dim"), col("mean")))
    val joined = cent.select(col("__l").as("label_a"), col("dim"),
        col("mean").as("__ma"))
      .join(cent.select(col("__l").as("label_b"), col("dim"),
        col("mean").as("__mb")), "dim")
      .filter(col("label_a") < col("label_b"))
    joined
      .withColumn("__d2", ((col("__ma") - col("__mb")) *
        (col("__ma") - col("__mb"))).cast(d18))
      .groupBy("label_a", "label_b")
      .agg(sum(col("__d2")).as("__s"))
      .select(col("label_a"), col("label_b"),
        round(sqrt(col("__s").cast("double")), 6).as("l2"))
  }

  /** Per-group mean-pooled embedding (class centroids / prototype
    * vectors — the mean-pool step behind centroid classifiers,
    * prototypical networks, and chunk→document embedding pooling),
    * emitted FLAT as (group, dim, n, mean) so downstream joins and the
    * oracle compare need no array equality.
    *
    * Exactness: each float is quantized once to integer micro-units
    * (round(x·10⁶), ties away from zero in both engines — the
    * hyperplane-signature convention), the per-(group, dim) SUM is an
    * exact order-independent DECIMAL(38,0), and the mean is ONE double
    * division + round(6). Scale shape: one map-side posexplode (rows ×
    * dim) feeding one partial-agg'd shuffle bounded by groups × dim —
    * never corpus-sized state. */
  def classCentroids(df: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    df.filter(col(vecCol).isNotNull)
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .select(col(groupCol), col("dim"),
        round(col("__x").cast("double") * 1000000).cast(d38).as("__mx"))
      .groupBy(col(groupCol), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("__mx")).as("__sx"))
      .select(col(groupCol), col("dim"), col("n"),
        round(col("__sx").cast("double") /
          (col("n").cast("double") * lit(1000000.0)), 6).as("mean"))
  }
}
