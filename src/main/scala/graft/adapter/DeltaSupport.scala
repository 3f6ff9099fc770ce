package graft.adapter

import graft.core.Relation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier

/** Delta Lake fast paths, gated by a classpath probe.
  *
  * The reference's Spark adapter uses zero-copy `SHALLOW CLONE` for the
  * clone command and native `MERGE INTO` for the merge incremental
  * strategy when the warehouse format supports them
  * (MS/materializations/clone.sql; spark__get_merge_sql
  * MS/macros/materializations/incremental/strategies.sql:28-68). Plain
  * parquet supports neither, so graft's defaults are the view-of-target
  * clone and the relational merge rewrite. When Delta IS on the classpath
  * (io.delta jars + a delta-provider table), these paths activate
  * transparently: same configs, same results, but clone becomes O(metadata)
  * and merge stops rewriting untouched files.
  *
  * Everything is reflection/SQL-string based — no compile-time dependency
  * on Delta (the jars are absent in this build environment), and every
  * entry point returns false to signal "fall back" rather than throwing.
  */
object DeltaSupport {

  /** True when the Delta Lake jars are loadable in this JVM. */
  lazy val deltaOnClasspath: Boolean =
    try { Class.forName("io.delta.tables.DeltaTable"); true }
    catch { case _: Throwable => false }

  /** The catalog provider of a relation, lower-cased ("parquet", "delta",
    * …) — None for temp views / nonexistent tables. */
  def provider(spark: SparkSession, rel: Relation): Option[String] =
    try {
      val meta = spark.sessionState.catalog.getTableMetadata(
        TableIdentifier(rel.identifier, Some(rel.schema)))
      meta.provider.map(_.toLowerCase)
    } catch { case _: Throwable => None }

  /** A relation takes the Delta fast paths only when BOTH the jars and a
    * delta-provider catalog entry are present. */
  def isDeltaTable(spark: SparkSession, rel: Relation): Boolean =
    deltaOnClasspath && provider(spark, rel).contains("delta")

  /** The exact SQL the clone fast path executes — the Spark adapter's
    * `spark__create_or_replace_clone` emits
    * `create or replace table {this} shallow clone {defer}`
    * (MS/materializations/clone.sql:5-7); golden-pinned by
    * DeltaGateSpec so the env-bounded execution path stays on the
    * reference contract. */
  def shallowCloneSql(source: Relation, target: Relation): String =
    s"CREATE OR REPLACE TABLE ${target.fqn} SHALLOW CLONE ${source.fqn}"

  /** Zero-copy clone: `CREATE OR REPLACE TABLE … SHALLOW CLONE …`
    * (Delta's metadata-only copy). Returns false when the source is not a
    * Delta table — caller falls back to the view-of-target clone. */
  def shallowClone(spark: SparkSession, source: Relation,
      target: Relation): Boolean =
    isDeltaTable(spark, source) && {
      spark.sql(shallowCloneSql(source, target))
      true
    }

  /** The exact SQL the merge fast path executes — the shape of
    * `spark__get_merge_sql` (MS/macros/materializations/incremental/
    * strategies.sql:28-68): `merge into {target} as DBT_INTERNAL_DEST
    * using {source} as DBT_INTERNAL_SOURCE on {key matches and
    * incremental_predicates} when matched then update set … when not
    * matched then insert …`. Two deliberate deltas from the macro text,
    * both documented here and pinned by DeltaGateSpec: key matches use
    * `<=>` (null-safe) so the fast path returns the same rows as graft's
    * relational merge rewrite on null keys, and the insert lists columns
    * explicitly instead of `insert *` so a source carrying extra columns
    * fails analysis rather than corrupting the target. */
  def mergeSql(targetFqn: String, sourceName: String, sourceCols: Seq[String],
      uniqueKey: Seq[String], updateCols: Seq[String],
      predicates: Seq[String] = Nil): String = {
    val on = (uniqueKey.map(k =>
      s"DBT_INTERNAL_DEST.`$k` <=> DBT_INTERNAL_SOURCE.`$k`") ++ predicates)
      .mkString(" AND ")
    val setClause = updateCols.map(c =>
      s"DBT_INTERNAL_DEST.`$c` = DBT_INTERNAL_SOURCE.`$c`").mkString(", ")
    val insertCols = sourceCols.map(c => s"`$c`").mkString(", ")
    val insertVals = sourceCols.map(c =>
      s"DBT_INTERNAL_SOURCE.`$c`").mkString(", ")
    val matched =
      if (updateCols.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $setClause\n"
      else ""
    s"""MERGE INTO $targetFqn AS DBT_INTERNAL_DEST
       |USING $sourceName AS DBT_INTERNAL_SOURCE
       |ON $on
       |${matched}WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)
       |""".stripMargin
  }

  /** Native `MERGE INTO` (spark__get_merge_sql strategies.sql:28-68):
    * matched rows update `updateCols` from source, unmatched source rows
    * insert, extra `predicates` AND into the ON clause. Returns false when
    * the target is not a Delta table — caller falls back to the
    * anti-join+union merge rewrite. Only file-level touched data is
    * rewritten by Delta, which is the point at 100 TB. */
  def nativeMerge(spark: SparkSession, target: Relation, source: DataFrame,
      uniqueKey: Seq[String], updateCols: Seq[String],
      predicates: Seq[String] = Nil): Boolean =
    isDeltaTable(spark, target) && uniqueKey.nonEmpty && {
      val viewName = s"graft_merge_src_${System.nanoTime()}"
      source.createOrReplaceTempView(viewName)
      try {
        spark.sql(mergeSql(target.fqn, viewName, source.columns.toSeq,
          uniqueKey, updateCols, predicates))
        true
      } finally spark.catalog.dropTempView(viewName)
    }
}
