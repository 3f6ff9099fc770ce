package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relation-diff auditing — the `audit_helper` package surface
  * (`compare_relations` / `compare_queries`) a dbt user runs to validate
  * a migrated model against its source of truth. The reference serves
  * that package through its hub loader (`crates/dbt-loader`); here the
  * comparison is a native operator instead of a generated SQL macro.
  *
  * Spark-first shape: ONE null-safe full-outer join on the key columns,
  * with per-column null-safe equality (`<=>`) deciding changed vs
  * identical — no EXCEPT/INTERSECT pair (two shuffles + a distinct), no
  * row hashing (hash collisions would misreport `identical`). At scale
  * the join shuffles both sides once on the key; the status column is a
  * map-side expression after it.
  */
object Audit {

  /** Row-level diff: one row per key present in either relation, labeled
    * `only_in_a` / `only_in_b` / `changed` / `identical`. Compared
    * columns ride along as `a_<col>` / `b_<col>` for inspection.
    *
    * Keys are joined null-safely (`<=>`), so a NULL key matches a NULL
    * key — same contract as audit_helper's surrogate-key compare. */
  def compareRelations(a: DataFrame, b: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "compareRelations needs at least one key column")
    val al = a.select(
      keys.map(k => col(k).as(s"__ka_$k")) ++
        compareCols.map(c => col(c).as(s"a_$c")) :+ lit(1).as("__in_a"): _*)
    val bl = b.select(
      keys.map(k => col(k).as(s"__kb_$k")) ++
        compareCols.map(c => col(c).as(s"b_$c")) :+ lit(1).as("__in_b"): _*)
    val on = keys.map(k => col(s"__ka_$k") <=> col(s"__kb_$k"))
      .reduce(_ && _)
    val same = compareCols.map(c => col(s"a_$c") <=> col(s"b_$c"))
      .foldLeft(lit(true))(_ && _)
    al.join(bl, on, "full_outer")
      .withColumn("status",
        when(col("__in_a").isNull, lit("only_in_b"))
          .when(col("__in_b").isNull, lit("only_in_a"))
          .when(same, lit("identical"))
          .otherwise(lit("changed")))
      .select(
        keys.map(k => coalesce(col(s"__ka_$k"), col(s"__kb_$k")).as(k)) ++
          (col("status") +: compareCols.flatMap(c =>
            Seq(col(s"a_$c"), col(s"b_$c")))): _*)
  }

  /** Aggregate diff summary: (status, n) — audit_helper's
    * `compare_relations` headline table, exact counts. One extra
    * partial-agg'd shuffle over the row-level diff's 4-value status. */
  def compareSummary(a: DataFrame, b: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame =
    compareRelations(a, b, keys, compareCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** Relation profile — the `dbt-profiler` package shape: one row per
    * profiled column with row count, null count, exact distinct count,
    * and min/max (as strings, so heterogeneous columns share a schema).
    * The what-am-I-looking-at pass before choosing keys, tests, or
    * filter thresholds.
    *
    * Spark-first: ONE aggregate over one scan — per-column metrics are
    * sibling aggregate expressions, and the per-column rows come from a
    * map-side `stack` of the single result row (dbt-profiler emits a
    * query per column: N scans). Distinct counts are EXACT (Catalyst
    * expands multi-distinct into one grouped pass per distinct column);
    * at terabyte scale swap in the HLL sketch family when ±2% is
    * acceptable — exactness here is what makes the oracle check the
    * operator. Caller contract: profile integer/string/date columns;
    * float mins/maxes stringify differently across engines. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(count(when(col(c).isNull, lit(1))).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val pairs = cols.map(c =>
      s"'$c', __n, `__nulls_$c`, `__dist_$c`, `__min_$c`, `__max_$c`")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $pairs) AS " +
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)")
  }

  /** Join-key skew profile: the k heaviest values of a key column with
    * absolute counts and corpus share — the pre-join diagnosis that
    * decides salting / AQE skew-join settings before a 100 TB shuffle
    * (one hot key = one straggler task). ONE partial-agg'd count
    * shuffle bounded by the distinct-key count, a 1-row total
    * broadcast, and a distributed TakeOrdered cut on
    * (count desc, key asc). Keys stringify (heterogeneous types share
    * the schema) and NULL — itself a classic skew source — profiles as
    * the literal '<NULL>'. `share` = one exact-integer double division,
    * round(6). */
  def keySkew(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // ONE input scan, NO cache: the grand total is the sum of the
    // per-key counts, so the total branch re-reads the identical
    // groupBy subplan and Catalyst's exchange reuse (on by default)
    // serves it from the counts shuffle — the full input is scanned
    // once and nothing distinct-key-sized lingers in the block manager
    // across audits (a cache here leaked until eviction pressure).
    val counts = df
      .select(coalesce(col(keyCol).cast("string"), lit("<NULL>")).as("key"))
      .groupBy("key").agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share",
        round(col("n_rows").cast("double") /
          col("__total").cast("double"), 6))
      .orderBy(col("n_rows").desc, col("key"))
      .limit(k)
      .select("key", "n_rows", "share")
  }

  /** Per-group exact-duplicate rate — the "did the dedup pass actually
    * work" report a curation pipeline ships with its output: the share
    * of each group's rows whose text occurs 2+ times ANYWHERE in the
    * relation (so cross-group copies count for both sides). NULL texts
    * are excluded — they carry no content to duplicate.
    *
    * Shape at 100 TB: texts reduce to md5 on the map side, one window
    * partitioned by the 16-byte hash (constant-width shuffle, never
    * text), then a group-cardinality-bounded rollup. One exact-integer
    * double division, round(6). */
  def dupRate(df: DataFrame, groupCol: String, textCol: String)
      : DataFrame = {
    val d = df.filter(col(textCol).isNotNull)
      .select(col(groupCol).as("grp"), md5(col(textCol)).as("__h"))
    val c = d.withColumn("__cnt",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("__h"))))
    c.groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__cnt") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
      .select(col("grp").as(groupCol), col("n_docs"), col("n_dup_docs"),
        round(col("n_dup_docs").cast("double") /
          col("n_docs").cast("double"), 6).as("dup_rate"))
  }

  /** k-anonymity audit over a quasi-identifier tuple — the re-
    * identification screen a dataset gets before release or training:
    * any combination of the quasi columns shared by fewer than `k`
    * rows singles its members out. One summary row: total rows, number
    * of distinct combinations, combinations below k, rows in them, and
    * their corpus share (ONE exact-integer double division + round(6)).
    * NULL quasi values group as values — a NULL tuple is as linkable
    * as any other.
    *
    * Shape at 100 TB: one partial-agg'd groupBy bounded by the
    * distinct-combination count, then a 1-row rollup of that table —
    * the input is never held. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs at least one column")
    require(k > 0, s"k must be positive: $k")
    val groups = df
      .groupBy(quasiCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("__n"))
    groups.agg(
        sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("__n") < k, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("__n") < k, col("__n")).otherwise(0L))
          .as("n_rows_at_risk"))
      .select(col("n_rows"), col("n_groups"), col("n_violating"),
        col("n_rows_at_risk"),
        round(col("n_rows_at_risk").cast("double") /
          col("n_rows").cast("double"), 6).as("risk_share"))
  }

  /** Benford first-digit audit — the classic fabricated-/synthetic-data
    * screen for organically-grown numeric columns (amounts, populations,
    * counts): the observed share of each leading significant digit next
    * to Benford's expected log₁₀(1 + 1/d). Values are taken in exact
    * integer cents (round(x·100), ties away from zero on both engines)
    * so the leading digit comes from INTEGER-to-string conversion —
    * identical across engines — never from double formatting;
    * non-positive and NULL values are out of scope and dropped.
    *
    * Shape at 100 TB: one map-side digit projection into a ≤9-row
    * partial-agg'd count, then everything is 9-row-table arithmetic
    * (the normalizing window runs over the count table, not the
    * input). `share`/`expected` = exact-integer double division and one
    * log10, round(6) absorbing the ≤1-ulp libm spread. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val cents = round(col(valueCol).cast("double") * 100).cast("long")
    val digits = df
      .filter(col(valueCol).isNotNull)
      .select(cents.as("__c"))
      .filter(col("__c") > 0)
      .select(substring(col("__c").cast("string"), 1, 1).cast("int")
        .as("digit"))
    val counts = digits.groupBy("digit").agg(count(lit(1)).as("n"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    counts
      .withColumn("share",
        round(col("n").cast("double") /
          sum(col("n")).over(all).cast("double"), 6))
      .withColumn("expected",
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6))
  }
}
