package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4's Column wraps a ColumnNode (Spark
  * Connect refactor) and the classic converters are private[sql]; placing
  * this shim in the sql package is the standard extension-library pattern
  * for exposing custom Catalyst expressions as Columns. */
object GraftSqlBridge {
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Rebuild a DataFrame over another frame's ALREADY-MATERIALIZED rows
    * in a different SparkSession — the session handoff for foreachBatch:
    * the stream hands frames bound to its CLONED session, and mixing
    * their plans with the adapter session's catalog reads silently
    * loses rows. The InternalRow RDD itself is session-agnostic, so a
    * LogicalRDD leaf over it in the TARGET session is a clean handoff
    * with no disk round-trip. Call with the rows pinned (eager
    * localCheckpoint) so each downstream action re-reads block-manager
    * blocks instead of re-running the source plan.
    * `internalCreateDataFrame` is private[sql], hence this bridge. */
  def dataFrameFromRdd(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** The block-manager-pinned RDD behind a `localCheckpoint`ed frame.
    * `Dataset.unpersist` only consults the CacheManager, and a local
    * checkpoint pins its rows via `RDD.persist` WITHOUT registering a
    * cache entry — so releasing a checkpointed micro-batch's blocks
    * needs the LogicalRDD leaf's rdd unpersisted directly (otherwise
    * every batch of a long drain leaks its blocks until the
    * ContextCleaner happens to GC the RDD). LogicalRDD is
    * private[sql], hence this bridge. */
  def checkpointedRdd(df: Dataset[_]): Option[
      org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]] =
    df.queryExecution.analyzed match {
      case l: execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Drop every cache entry whose plan depends on this table — WITHOUT
    * recomputing it. `catalog.refreshTable` eagerly re-materializes
    * dependent entries from their captured physical plans, whose file
    * listings predate a staged-swap rewrite (FileNotFound); plain
    * cascade-uncache lets the next identical query re-resolve fresh.
    * CacheManager is private[sql], hence this bridge. */
  def uncacheDependents(spark: SparkSession, schema: String,
      table: String): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    // name-based matching: the stale entry's plan holds the PRE-swap
    // file index, so plan-equality matching against a fresh resolution
    // would miss it
    cs.sharedState.cacheManager.uncacheTableOrView(cs,
      Seq(cs.catalog.currentCatalog(), schema, table), cascade = true)
  }
}
