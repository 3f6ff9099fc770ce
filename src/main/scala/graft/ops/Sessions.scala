package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: group each key's events into sessions separated
  * by inactivity gaps (the batch twin of
  * streaming/StreamingOps.sessionize — same semantics, but over bounded
  * history where no watermark/state machinery is needed).
  *
  * Shape at 100 TB: one shuffle by key + one sort feeds BOTH windows
  * (lag and running sum reuse the same partitioning/ordering, Spark
  * plans a single Window exchange), everything after is map-side. The
  * gap test runs in integer microseconds — no float time math. */
object Sessions {

  /** Add a per-key session index (1-based): a new session starts at the
    * first event and whenever the gap from the key's previous event
    * exceeds `gapSeconds`. `tieCols` break ordering ties for keys with
    * equal timestamps (pass an id column when timestamps can collide —
    * determinism of the session split depends on a total order). */
  def assign(df: DataFrame, keyCol: String, tsCol: String, gapSeconds: Long,
      sessionCol: String = "session_idx",
      tieCols: Seq[String] = Nil): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive: $gapSeconds")
    val order: Seq[Column] = col(tsCol) +: tieCols.map(col)
    val byKey = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val prevUs = lag(unix_micros(col(tsCol)), 1).over(byKey)
    val newSession = when(
      prevUs.isNull ||
        unix_micros(col(tsCol)) - prevUs > gapSeconds * 1000000L,
      1L).otherwise(0L)
    df.withColumn(sessionCol,
      sum(newSession).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** First-order Markov transition matrix over per-key event sequences —
    * the behavioral model behind next-action prediction, funnel-path
    * audits, and bot detection (a scripted client's transition rows are
    * near-deterministic; a human's are diffuse). Each key's events are
    * ordered by (ts, tieCols) and every ADJACENT pair contributes one
    * (from_state, to_state) observation; output is the transition count
    * `n` plus the row-normalized probability `p` (exact integer counts,
    * ONE double division, round(6) — the engine-portable division
    * discipline). NULL states are dropped up front so the matrix is
    * total. Pass an id tie column when timestamps can collide —
    * determinism of adjacency depends on a total order per key.
    *
    * Shape at 100 TB: one key-hash shuffle feeds the lead window (same
    * single-exchange shape as [[assign]]), then everything is bounded by
    * states² — the count groupBy partial-aggregates map-side and the
    * normalizing window runs over the tiny count table, never the
    * input. */
  def transitions(df: DataFrame, keyCol: String, tsCol: String,
      stateCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = col(tsCol) +: tieCols.map(col)
    val byKey = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val pairs = df.filter(col(stateCol).isNotNull)
      .withColumn("__to", lead(col(stateCol), 1).over(byKey))
      .filter(col("__to").isNotNull)
      .select(col(stateCol).as("from_state"), col("__to").as("to_state"))
    transitionsFromPairs(pairs, "from_state", "to_state")
  }

  /** Machine-regularity score per key — the timing side of bot
    * detection: a scripted client fires on a clock, so its inter-event
    * gaps have a tiny coefficient of variation, while human gaps are
    * heavy-tailed. Per key (with ≥ `minEvents` events): the gap count,
    * mean gap, and CV = std/mean of the microsecond gaps — in
    * micro-units, because n cancels: cv = √(n·Σg² − (Σg)²) / Σg, an
    * exact-integer DECIMAL(38,0) radicand and ONE sqrt + division +
    * round (half-up on both engines). Returns the `k` LOWEST-CV keys
    * (most machine-like; ties on key) as
    * (key, n_gaps, mean_gap_us, cv_micro, rank). All-zero-gap keys
    * (Σg = 0 — same-instant bursts) have no defined CV and drop.
    *
    * Shape at 100 TB: one key-hash shuffle + sort for the lag, a
    * three-number-per-key partial-agg'd aggregate, a distributed
    * TakeOrdered cut. */
  def gapRegularity(df: DataFrame, keyCol: String, tsCol: String,
      tieCols: Seq[String], minEvents: Int, k: Int): DataFrame = {
    require(minEvents >= 3, s"minEvents must be >= 3: $minEvents")
    require(k > 0, s"k must be positive: $k")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val order: Seq[Column] = col(tsCol) +: tieCols.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val us = unix_micros(col(tsCol))
    val gaps = df
      .withColumn("__g", us - lag(us, 1).over(w))
      .filter(col("__g").isNotNull)
    val st = gaps.groupBy(col(keyCol)).agg(
        count(lit(1)).as("n_gaps"),
        sum(col("__g").cast(d38)).as("__s1"),
        sum(col("__g").cast(d38) * col("__g").cast(d38)).as("__s2"))
      .filter(col("n_gaps") >= minEvents - 1 && col("__s1") > 0)
    val b = col("n_gaps").cast(d38) * col("__s2") -
      col("__s1") * col("__s1")
    val cv = round(sqrt(b.cast("double")) / col("__s1").cast("double") *
      lit(1000000)).cast("long")
    // integer floor mean: at 1e10-µs magnitudes a round(·,6) double
    // exceeds the engines' shared 6-decimal resolution — floor of the
    // exact (<2^53) division is engine-identical at any magnitude
    val scored = st.select(col(keyCol), col("n_gaps"),
      floor(col("__s1").cast("double") / col("n_gaps").cast("double"))
        .cast("long").as("mean_gap_us"),
      cv.as("cv_micro"))
    // rank over the ALREADY-limit(k)'d rows — k rows on one partition
    // is the point (WindowExec's single-partition warning for these
    // audited post-limit sites is demoted in the measurement mains;
    // Spark folds a constant partitionBy away, so no plan-side spelling
    // can silence it)
    val wr = Window.orderBy(col("cv_micro").asc, col(keyCol))
    scored.orderBy(col("cv_micro").asc, col(keyCol)).limit(k)
      .withColumn("rank", row_number().over(wr))
  }

  /** Per-key state co-occurrence lift — the market-basket association
    * audit over event streams: for every unordered state pair,
    * lift = P(a ∧ b) / (P(a)·P(b)) across keys (> 1 ⇒ the states
    * travel together, < 1 ⇒ they repel), plus the raw support
    * P(a ∧ b). The transition matrix sees ORDER; this sees
    * AFFINITY — together they're the behavioral fingerprint.
    * NULL states dropped. Output:
    * (state_a, state_b, n_both, support, lift).
    *
    * Exactness: all counts exact integers; the lift numerator/
    * denominator multiply in DECIMAL(38,0) (count products overflow a
    * long at ~10¹² keys), ONE double division each + round(6). Shape
    * at 100 TB: the (key, state) distinct collapses map-side and is
    * keys×states-bounded; the self-join fans each key to its own
    * states² (states are an enum, not an open set); everything after
    * is states²-bounded with a 1-row key-count broadcast. */
  def cooccurrenceLift(df: DataFrame, keyCol: String,
      stateCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // the narrow distinct is read by the key count, the state counts,
    // and both join sides — ride the signature cache (the vocabOverlap
    // convention) instead of re-scanning the input four times
    val ks = graft.ops.Dedup.maybeCache(df.filter(col(stateCol).isNotNull)
      .select(col(keyCol).as("__k"), col(stateCol).as("__s"))
      .distinct())
    val n = ks.agg(countDistinct(col("__k")).as("__nn"))
    val sc = ks.groupBy(col("__s")).agg(count(lit(1)).as("__c"))
    val pairs = ks.select(col("__k"), col("__s").as("state_a"))
      .join(ks.select(col("__k"), col("__s").as("state_b")), "__k")
      .filter(col("state_a") < col("state_b"))
      .groupBy("state_a", "state_b").agg(count(lit(1)).as("n_both"))
    pairs
      .join(sc.select(col("__s").as("state_a"), col("__c").as("__ca")),
        "state_a")
      .join(sc.select(col("__s").as("state_b"), col("__c").as("__cb")),
        "state_b")
      .crossJoin(broadcast(n))
      .select(col("state_a"), col("state_b"), col("n_both"),
        round(col("n_both").cast("double") / col("__nn").cast("double"), 6)
          .as("support"),
        round((col("n_both").cast(d38) * col("__nn").cast(d38))
          .cast("double") /
          (col("__ca").cast(d38) * col("__cb").cast(d38)).cast("double"), 6)
          .as("lift"))
  }

  /** The transition-matrix finisher over a PRE-BUILT (from, to) pair
    * table — [[transitions]]'s count + row-normalization factored out
    * (the klFromTokenCounts precedent) so pair streams from other
    * producers — e.g. the stateful streaming transition op — land on
    * the same states²-bounded, engine-exact math. */
  def transitionsFromPairs(pairs: DataFrame, fromCol: String,
      toCol: String): DataFrame = {
    val counts = pairs
      .select(col(fromCol).as("from_state"), col(toCol).as("to_state"))
      .groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_state"))
    counts.withColumn("p",
      round(col("n").cast("double") /
        sum(col("n")).over(byFrom).cast("double"), 6))
  }
}
