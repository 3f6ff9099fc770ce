package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch: sub-linear frequency estimation for heavy-hitter
  * queries over corpora too large to groupBy exactly. The sketch is a
  * d×w counter matrix; item x increments row i at column
  * hash_i(x) mod w, and the estimate for x is the MIN across rows —
  * always an overestimate, within εN with probability 1−δ for
  * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * The row hashes are md5-derived (same 48-bit idiom as
  * [[Sampling.hashBucket]]) so the whole sketch is a pure deterministic
  * function of the data — any engine reproduces it bit-for-bit, which is
  * what makes an approximate structure oracle-checkable. All d row
  * hashes derive from ONE md5 via Kirsch-Mitzenmacher double hashing
  * (bucket_i = h1 + i·h2 mod w, h2 forced odd): the classic result that
  * two hash functions preserve Bloom/count-min guarantees, and on the
  * engine side it cuts the per-row cost from d md5 evaluations (each
  * over a freshly concatenated string) to one md5 plus integer math.
  *
  * Scale shape: building the sketch is a d× map-side expand followed by
  * ONE partial-aggregated count shuffle of (row, bucket) pairs — d·w
  * cells total regardless of input size (the point of a sketch). Probing
  * broadcast-joins the d·w cell table to the query keys. */
object Sketch {

  /** 48-bit slice of the key's md5 starting at hex digit `off`. */
  private def h48(c: Column, off: Int): Column =
    conv(substring(md5(c.cast("string")), off, 12), 16, 10).cast("long")

  /** Kirsch-Mitzenmacher bucket i: (h1 + i·h2) mod width, h2 odd. Both
    * 48-bit halves come from the SAME md5 (Catalyst's common-subexpression
    * elimination evaluates it once per row); i·h2 ≤ 2^51 for any sane
    * depth/k, so the sum never overflows a long. */
  private def bucket(row: Int, c: Column, width: Int): Column =
    pmod(h48(c, 1) + lit(row.toLong) * h48(c, 13).bitwiseOR(lit(1L)),
      lit(width.toLong))

  /** The d×w counter matrix as rows (row, bucket, cnt). Cells never
    * touched stay absent (zero). */
  def countMin(df: DataFrame, itemCol: String, width: Int,
      depth: Int): DataFrame = {
    require(width > 0 && depth > 0, s"width/depth must be positive")
    val rows = explode(array((0 until depth).map(i =>
      struct(lit(i).as("row"),
        bucket(i, col(itemCol), width).as("bucket"))): _*)).as("cell")
    df.select(rows)
      .groupBy(col("cell.row").as("row"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `keys` (a small DataFrame with `keyCol`):
    * min over rows of the matching cell, 0 when a row's cell is empty.
    * `sketch` is the [[countMin]] output — d·w rows, broadcast side. */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      width: Int, depth: Int): DataFrame = {
    val probes = keys
      .withColumn("row", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("bucket", bucket0(col("row"), col(keyCol), width))
    probes.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** [[bucket]] with the row index as a Column (probe side explodes
    * rows at runtime). */
  private def bucket0(row: Column, c: Column, width: Int): Column =
    pmod(h48(c, 1) + row.cast("long") * h48(c, 13).bitwiseOR(lit(1L)),
      lit(width.toLong))

  /** Exact heavy hitters with a sketch-pruned shuffle: keys occurring at
    * least `minCount` times, with their exact counts. Count-min never
    * undercounts, so pruning on the estimate keeps every true heavy
    * hitter (no false negatives); the exact recount of the survivors
    * removes the false positives — the output equals a plain
    * groupBy-HAVING, but only candidate rows reach the exchange.
    *
    * Scale shape: the d·w cell matrix (driver state comparable to
    * [[Similarity]]'s k×dim centroids) is inlined as a literal map, so
    * the probe phase is d codegen'd map lookups per row — no join, no
    * shuffle, the corpus streams by. The one aggregation shuffle moves
    * only rows whose estimate clears `minCount`.
    *
    * Size guard: the literal map is ideal at typical sketch sizes
    * (256×4) but caller-chosen — width 10⁷ would inline a 10⁷-entry
    * literal into the plan (driver memory + codegen constant-pool
    * blowup). Past `spark.graft.sketchMaxLiteralCells` cells (default
    * 2²⁰) the probe auto-falls back to d broadcast hash joins against
    * the distributed cell table — still zero shuffles of the corpus
    * (one w-row broadcast per sketch row, columnwise `least`), the
    * sketch never touches the driver. */
  def heavyHitters(df: DataFrame, itemCol: String, width: Int, depth: Int,
      minCount: Long): DataFrame = {
    require(minCount > 0, "minCount must be positive")
    val maxCells = df.sparkSession.conf
      .get("spark.graft.sketchMaxLiteralCells", (1L << 20).toString).toLong
    if (width.toLong * depth <= maxCells) {
      // DENSE array literal, not a map literal: element_at on a map
      // Literal is a linear scan of all d·w entries per probe (GetMapValue
      // has no hash index), which made each row pay d·(d·w) comparisons —
      // an array Literal indexes in O(1). Empty cells are real zeros, so
      // the map path's coalesce disappears too.
      val cells = new Array[Long](depth * width)
      countMin(df, itemCol, width, depth).collect().foreach(r =>
        cells(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2))
      val m = typedLit(cells.toSeq)
      val probes = (0 until depth).map(i =>
        element_at(m,
          (lit(i * width.toLong) + bucket(i, col(itemCol), width) + lit(1L))
            .cast("int")))
      val est = if (depth == 1) probes.head else least(probes: _*)
      df.filter(est >= minCount)
        .groupBy(col(itemCol))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= minCount)
    } else {
      // broadcast-join probe: each sketch row is a w-row broadcast side
      // keyed by bucket; (row, bucket) is unique so each left join
      // matches at most once and row multiplicity is preserved. The d
      // per-row branches share the sketch's aggregation exchange
      // (ReuseExchange dedupes the identical subtree).
      val sketch = countMin(df, itemCol, width, depth)
      var probed = df
      val estCols = (0 until depth).map { i =>
        val s = sketch.filter(col("row") === i)
          .select(col("bucket").as(s"__hh_b$i"), col("cnt").as(s"__hh_c$i"))
        probed = probed.join(broadcast(s),
          bucket(i, col(itemCol), width) === col(s"__hh_b$i"), "left")
          .drop(s"__hh_b$i")
        coalesce(col(s"__hh_c$i"), lit(0L))
      }
      val est = if (depth == 1) estCols.head else least(estCols: _*)
      probed.filter(est >= minCount)
        .drop((0 until depth).map(i => s"__hh_c$i"): _*)
        .groupBy(col(itemCol))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= minCount)
    }
  }

  /** Bloom-filter bitmap over the distinct keys of `keys`: k md5-derived
    * bit positions per key, OR'd into a bits-wide bitmap. Determinism
    * comes from the same md5 idiom as every sketch here. The distinct
    * bit positions are collected to the driver (bounded by `bits`, the
    * same legitimacy class as the d·w count-min cells) and packed into
    * longs for literal broadcast. */
  def bloomFilter(keys: DataFrame, keyCol: String, bits: Int,
      k: Int): Array[Long] = {
    require(bits > 0 && bits % 64 == 0, "bits must be a positive multiple of 64")
    require(k >= 1, "k must be >= 1")
    val words = new Array[Long](bits / 64)
    keys.select(explode(array((0 until k).map(i =>
        bucket(i, col(keyCol), bits)): _*)).as("pos"))
      .distinct().collect()
      .foreach { r =>
        val p = r.getLong(0)
        words((p / 64).toInt) |= 1L << (p % 64)
      }
    words
  }

  /** Exact semi-join with a Bloom-pruned shuffle: rows of `fact` whose
    * key appears in `dim`. The broadcast bitmap filters the fact side
    * map-side (k codegen'd bit tests per row, no join), so only rows
    * that MIGHT match reach the exchange; the exact left-semi join then
    * removes the Bloom false positives — output is identical to a plain
    * semi-join, but at a typical 1% selectivity ~99% of the fact rows
    * never shuffle. The dim side never leaves its shape: the same bitmap
    * build is its only extra pass. */
  def bloomSemiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, bits: Int = 1 << 17, k: Int = 3): DataFrame = {
    val words = bloomFilter(dim.select(col(dimKey)), dimKey, bits, k)
    var f = fact.withColumn("__bloom_words", typedLit(words.toSeq))
    val conds = (0 until k).map { i =>
      val p = s"__bloom_p$i"
      f = f.withColumn(p, bucket(i, col(factKey), bits))
      s"((shiftright(element_at(__bloom_words, CAST($p DIV 64 AS INT) + 1), " +
        s"CAST($p % 64 AS INT)) & 1) = 1)"
    }
    // the dim key is aliased to a reserved name so the semi-join
    // condition is unambiguous even when factKey == dimKey
    f.filter(expr(conds.mkString(" AND ")))
      .drop("__bloom_words" +: (0 until k).map(i => s"__bloom_p$i"): _*)
      .join(dim.select(col(dimKey).as("__dim_key")).distinct(),
        col(factKey) === col("__dim_key"), "left_semi")
  }

  /** The (bucket, rank) column pair every HLL variant derives from an
    * item — ONE definition so the batch, grouped, and streaming register
    * builders can never drift apart on the hash/rank contract.
    * rank = leading zeros of the q suffix bits, +1 = (q+1) − bitlength;
    * bin() gives the minimal-width binary string in Spark and DuckDB
    * alike, which makes bitlength oracle-expressible. */
  def hllBucketAndRank(itemCol: Column, p: Int): (Column, Column) = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val q = 48 - p
    val h = conv(substring(md5(itemCol.cast("string")), 1, 12), 16, 10)
      .cast("long")
    val w = shiftright(h, p) // the q suffix bits
    val rank = when(w === 0, lit(q + 1))
      .otherwise(lit(q + 1) - length(bin(w)))
    (pmod(h, lit(1L << p)), rank)
  }

  /** HyperLogLog registers: sub-linear distinct counting (Flajolet et al.
    * 2007), the cardinality counterpart to [[countMin]]'s frequencies.
    * Item x hashes to 48 bits (same md5 idiom, so the sketch is a pure
    * deterministic function of the data); the low `p` bits pick one of
    * m = 2^p registers and the register keeps the maximum
    * leading-zero rank of the remaining q = 48−p bits.
    *
    * Scale shape: ONE partial-aggregated max shuffle emitting at most m
    * rows regardless of input size — the map side collapses each
    * partition to ≤ m (bucket, rank) partials before the exchange.
    * Untouched registers stay absent (zero). */
  def hllRegisters(df: DataFrame, itemCol: String, p: Int): DataFrame = {
    val (bucket, rank) = hllBucketAndRank(col(itemCol), p)
    df.select(bucket.as("bucket"), rank.as("rank"))
      .groupBy("bucket").agg(max("rank").as("register"))
  }

  /** Per-group HLL distinct counts — `hllRegisters` + `hllEstimate`
    * generalized to one estimate row PER group (distinct users per
    * domain, distinct documents per source, …) without a per-group
    * `countDistinct` shuffle of the raw keys.
    *
    * Scale shape: ONE partial-aggregated shuffle of at most
    * groups × 2^p register rows (the map side collapses each partition
    * to register partials first), then a groups-sized final aggregate.
    * The estimate math is the same exact-integer power sum as
    * [[hllEstimate]] — bit-reproducible, so even the approximate
    * estimates hash-match an oracle. */
  def hllDistinctByGroup(df: DataFrame, groupCols: Seq[String],
      itemCol: String, p: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val (bucket, rank) = hllBucketAndRank(col(itemCol), p)
    val regs = df
      .select(groupCols.map(col) :+ bucket.as("bucket") :+
        rank.as("rank"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max("rank").as("register"))
    hllEstimateByGroup(regs, groupCols, p)
  }

  /** Per-group estimates from a (groupCols…, bucket, register) register
    * table — the estimate half of [[hllDistinctByGroup]], exposed so
    * register tables built elsewhere (e.g. a Structured Streaming
    * windowed register sink) estimate with the identical exact-integer
    * math. */
  def hllEstimateByGroup(registers: DataFrame, groupCols: Seq[String],
      p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    require(groupCols.nonEmpty, "need at least one group column")
    val m = 1L << p
    val qp1 = 49 - p
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val numer = (alpha * (m * m).toDouble) * math.pow(2.0, qp1)
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), $qp1 - register)")) +
          (lit(m) - count(lit(1))) * lit(1L << qp1)).as("s"),
        (lit(m) - count(lit(1))).as("zeros"))
      .select(groupCols.map(col) :+
        when(lit(numer) / col("s").cast("double") <= lit(2.5 * m) &&
            col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double")))
          .otherwise(lit(numer) / col("s").cast("double")).as("e"): _*)
      .select(groupCols.map(col) :+
        floor(col("e")).cast("long").as("est"): _*)
  }

  /** Power-of-two histogram quantiles: the sort-free scale path for
    * per-group quantiles over non-negative integer measures (doc
    * lengths, token counts, latencies). [[Stats.quantilesByGroup]] is
    * exact but pays a full ranking-window sort shuffle of the corpus;
    * this sketch pays ONE partial-aggregated count shuffle of
    * (group, bucket) cells — ≤ 64 buckets per group regardless of input
    * size — and every later step runs on that bounded cell table.
    *
    * Bucket id = bit length of the value (`length(bin(v))`, a function
    * Spark and DuckDB share with identical minimal-width semantics), so
    * bucket b holds [2^(b−1), 2^b) (b=1 holds {0,1}). The reported
    * estimate for quantile num/den is the UPPER bound 2^b − 1 of the
    * first bucket whose cumulative count reaches the type-1 target rank
    * ceil(n·num/den) — a deterministic ≤ 2× overestimate, the classic
    * HDR-histogram telemetry contract, and all-integer arithmetic end to
    * end (no interpolation, no floats), so the approximate answer still
    * hash-matches any engine. Cumulative/total counts come from windows
    * PARTITIONED BY GROUP over the cell table: ≤ 64 rows per partition,
    * never a corpus-sized window. NULL and negative values are the
    * caller's to filter — bit length is only monotone from 0 up. */
  def logHistogramQuantiles(df: DataFrame, groupCol: String,
      valueCol: String, quantiles: Seq[(String, Int, Int)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile spec")
    quantiles.foreach { case (l, num, den) =>
      require(num > 0 && den > 0 && num <= den,
        s"quantile $l must satisfy 0 < num <= den: $num/$den") }
    val cells = df
      .withColumn("__bkt", length(bin(col(valueCol).cast("long"))))
      .groupBy(col(groupCol), col("__bkt"))
      .agg(count(lit(1)).as("__c"))
    histogramQuantilesFromCells(cells, groupCol, "__bkt", "__c", quantiles)
  }

  /** Quantile extraction from an already-aggregated (group, bucket,
    * count) cell table — the [[logHistogramQuantiles]] finisher, split
    * out because bucket counts MERGE BY SUM: a streaming job can
    * maintain the cells with nothing but Spark's built-in watermarked
    * window aggregation and finish with this exact batch arithmetic
    * (see StreamingOps.dailyValueHistogramCells). Windows here partition
    * by group over ≤ 64 cell rows — never a corpus-sized window. */
  def histogramQuantilesFromCells(cells: DataFrame, groupCol: String,
      bucketCol: String, countCol: String,
      quantiles: Seq[(String, Int, Int)]): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(bucketCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    val cum = cells
      .withColumn("__cum", sum(col(countCol)).over(wCum))
      .withColumn("__n", sum(col(countCol)).over(wAll))
    val specs = quantiles.toDF("label", "__num", "__den")
    cum.crossJoin(broadcast(specs))
      // type-1 target rank k = ceil(n*num/den); first bucket with cum >= k
      .filter(col("__cum") >=
        expr("(__n * __num + __den - 1) div __den"))
      .groupBy(col(groupCol), col("label"))
      .agg(min(col(bucketCol)).as("__b"))
      .withColumn("est", expr("shiftleft(1L, __b) - 1L"))
      .select(col(groupCol), col("label"), col("est"))
  }

  /** Pairwise HLL set operations across a column's group slices:
    * distinct-count UNION via register-wise max (the defining closure
    * property of HLL — the union sketch of two sets IS the max of their
    * registers, with zero extra error) and INTERSECTION via
    * inclusion–exclusion est_a + est_b − est_union, clamped at 0 (the
    * standard estimator; its error grows as the true intersection
    * shrinks relative to the union — audience-overlap numbers, not exact
    * joins). All arithmetic on the estimate side is the shared
    * exact-integer power-sum path, so even these approximate overlaps
    * hash-match an oracle re-derivation.
    *
    * Scale shape: the register build is [[hllDistinctByGroup]]'s ONE
    * partial-agg'd shuffle (≤ groups × 2^p rows); the pair expansion
    * joins the bounded register table onto the k² group pairs — the
    * operator's contract is slice analytics (domains, event types,
    * sources: k in the tens), mirroring tokenKlDrift's bounded-groups
    * contract, NOT an unbounded key space. The corpus itself is read
    * once; everything after the register aggregate is sketch-sized.
    *
    * Output: (group_a, group_b, est_a, est_b, est_union, est_intersect)
    * for every unordered pair group_a < group_b. */
  def hllSetOpsByGroup(df: DataFrame, groupCol: String, itemCol: String,
      p: Int): DataFrame = {
    val (bucket, rank) = hllBucketAndRank(col(itemCol), p)
    // bounded: ≤ distinct-groups × 2^p rows — caching it is scale-safe
    // and spares the pair fan-out a second corpus scan
    val regs = df
      .select(col(groupCol).as("g"), bucket.as("bucket"), rank.as("rank"))
      .groupBy("g", "bucket").agg(max("rank").as("register"))
      .cache()
    val groups = regs.select("g").distinct()
    val pairs = groups.select(col("g").as("ga"))
      .crossJoin(groups.select(col("g").as("gb")))
      .filter(col("ga") < col("gb"))
    val ra = pairs.join(regs, col("g") === col("ga"))
      .select("ga", "gb", "bucket", "register")
    val rb = pairs.join(regs, col("g") === col("gb"))
      .select("ga", "gb", "bucket", "register")
    val uregs = ra.unionByName(rb).groupBy("ga", "gb", "bucket")
      .agg(max("register").as("register"))
    val estU = hllEstimateByGroup(uregs, Seq("ga", "gb"), p)
      .withColumnRenamed("est", "est_union")
    val estG = hllEstimateByGroup(regs.select("g", "bucket", "register"),
      Seq("g"), p)
    estU
      .join(estG.select(col("g").as("ga"), col("est").as("est_a")), "ga")
      .join(estG.select(col("g").as("gb"), col("est").as("est_b")), "gb")
      .select(col("ga").as("group_a"), col("gb").as("group_b"),
        col("est_a"), col("est_b"), col("est_union"),
        greatest(col("est_a") + col("est_b") - col("est_union"),
          lit(0L)).as("est_intersect"))
  }

  /** One-row (est) estimate from [[hllRegisters]] output. The harmonic
    * mean is accumulated as an EXACT integer power sum (each register
    * contributes 2^(q+1−register), absent registers 2^(q+1)), so the
    * only floating-point steps are a constant product and one division —
    * bit-reproducible in any IEEE engine, which is what lets an
    * approximate estimate hash-match an oracle. Applies the standard
    * small-range linear-counting correction when registers are empty. */
  def hllEstimate(registers: DataFrame, p: Int): DataFrame =
    // the single-sketch case is the grouped estimator over one constant
    // group — one implementation of the exact-integer power-sum math
    hllEstimateByGroup(registers.withColumn("__g", lit(1)), Seq("__g"), p)
      .select("est")
}
