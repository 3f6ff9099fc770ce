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

  /** Zero-copy clone: `CREATE OR REPLACE TABLE … SHALLOW CLONE …`
    * (Delta's metadata-only copy). Returns false when the source is not a
    * Delta table — caller falls back to the view-of-target clone. */
  def shallowClone(spark: SparkSession, source: Relation,
      target: Relation): Boolean =
    isDeltaTable(spark, source) && {
      spark.sql(
        s"CREATE OR REPLACE TABLE ${target.fqn} SHALLOW CLONE ${source.fqn}")
      true
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
        val on = (uniqueKey.map(k =>
          s"DBT_INTERNAL_DEST.`$k` <=> DBT_INTERNAL_SOURCE.`$k`") ++ predicates)
          .mkString(" AND ")
        val setClause = updateCols.map(c =>
          s"DBT_INTERNAL_DEST.`$c` = DBT_INTERNAL_SOURCE.`$c`").mkString(", ")
        val insertCols = source.columns.map(c => s"`$c`").mkString(", ")
        val insertVals = source.columns.map(c =>
          s"DBT_INTERNAL_SOURCE.`$c`").mkString(", ")
        val matched =
          if (updateCols.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $setClause\n"
          else ""
        spark.sql(
          s"""MERGE INTO ${target.fqn} AS DBT_INTERNAL_DEST
             |USING $viewName AS DBT_INTERNAL_SOURCE
             |ON $on
             |${matched}WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)
             |""".stripMargin)
        true
      } finally spark.catalog.dropTempView(viewName)
    }
}
