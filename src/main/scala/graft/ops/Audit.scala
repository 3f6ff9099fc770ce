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
}
