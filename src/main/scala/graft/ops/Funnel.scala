package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: how far along a fixed step sequence
  * (e.g. signup → click → purchase) each key progressed, where step i
  * must occur AT OR AFTER the completion of step i−1 (strict event-order
  * funnel, first-completion semantics).
  *
  * Shape at 100 TB: ONE shuffle — per-key sorted timestamp arrays per
  * step (collect_list partial-aggregates map-side; per-key event counts
  * bound the arrays), then the completion cascade
  * t_i = first(s_i ≥ t_{i−1}) runs in codegen'd higher-order array
  * expressions. No per-step join cascade, no driver loop, no UDF. */
object Funnel {

  /** Returns one row per key: `keyCol`, `funnel_depth` (0 = never did
    * step 1, steps.size = completed the whole funnel), and the
    * per-step completion timestamps `__t0..` in epoch microseconds.
    *
    * Memory guard — ON BY DEFAULT: the per-key step arrays are bounded
    * by that key's event counts — fine for humans, not for a bot key
    * with 10⁸ events, whose `collect_list` buffer would balloon on one
    * executor. The bound is a ranked pre-pass keeping only each
    * (key, step)'s N earliest events before the aggregate, so no buffer
    * exceeds N. The cascade then sees a key's first N events per step —
    * depths only beyond that horizon are missed (for a funnel,
    * first-completion almost always lands in the earliest events; a bot
    * spamming one step past N is exactly the key to bound). N defaults
    * from `spark.graft.funnelMaxPerStep` (10000; 0 = unbounded) so the
    * safe behavior is automatic; pass `maxPerStep` to override per call.
    *
    * Cost: one extra window pass over the SAME key-hash exchange — the
    * input is repartitioned by key once, the (key, step) ranking window
    * is satisfied by that clustering (same key ⇒ same partition), and
    * the final aggregate reuses it too, so bounded and unbounded plans
    * both run a single shuffle.
    *
    * `withinMicros`: optional CONVERSION WINDOW — every later step must
    * complete within this many microseconds of the step-1 completion
    * (the "converted within 7 days" contract of product funnels).
    * Applied inside the cascade (step i's candidates are filtered to
    * ≤ t0 + window BEFORE first-pick), so an out-of-window occurrence
    * neither completes a step nor blocks an in-window one — but since
    * candidates are also ≥ t_{i−1} and the cascade is monotone, the
    * first in-order candidate is always the one picked anyway; the
    * filter just caps it. First-completion semantics are otherwise
    * unchanged, and the bound composes with `maxPerStep`. */
  def depth(df: DataFrame, keyCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], maxPerStep: Option[Int] = None,
      withinMicros: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps: $steps")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    maxPerStep.foreach(n => require(n > 0, s"maxPerStep must be positive: $n"))
    withinMicros.foreach(t =>
      require(t > 0, s"withinMicros must be positive: $t"))
    val cap = maxPerStep.getOrElse(
      df.sparkSession.conf.get("spark.graft.funnelMaxPerStep", "10000").toInt)
    val bounded =
      if (cap <= 0) df
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol), col(typeCol))
          .orderBy(col(tsCol).asc)
        df.repartition(col(keyCol))
          .withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= cap).drop("__rk")
      }
    val stepTs = steps.zipWithIndex.map { case (st, i) =>
      sort_array(collect_list(
        when(col(typeCol) === st, unix_micros(col(tsCol))))).as(s"__s$i")
    }
    val grouped = bounded.groupBy(col(keyCol)).agg(stepTs.head, stepTs.tail: _*)
    val withCompletions = steps.indices.foldLeft(grouped) { (d, i) =>
      // try_element_at: an empty step array (key never did the step) is
      // null, not an ANSI index error
      val t =
        if (i == 0) try_element_at(col("__s0"), lit(1))
        else {
          val inOrder = (x: Column) => x >= col(s"__t${i - 1}")
          val cand = withinMicros match {
            case Some(win) =>
              filter(col(s"__s$i"),
                x => inOrder(x) && x <= col("__t0") + lit(win))
            case None => filter(col(s"__s$i"), inOrder)
          }
          try_element_at(cand, lit(1))
        }
      d.withColumn(s"__t$i", t)
    }
    // deepest completed step wins; t_i non-null implies t_{i-1} non-null
    val depthCol = steps.indices.foldLeft(lit(0): Column) { (acc, i) =>
      when(col(s"__t$i").isNotNull, lit(i + 1)).otherwise(acc)
    }
    withCompletions
      .withColumn("funnel_depth", depthCol)
      .select(col(keyCol) +: col("funnel_depth") +:
        steps.indices.map(i => col(s"__t$i")): _*)
  }
}
