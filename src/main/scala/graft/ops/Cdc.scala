package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture changelog processing: turn an ordered stream of
  * row-level changes (upserts + deletes) into either the latest table
  * state (SCD-1 compaction — the read side of every log-structured
  * ingest: Debezium topics, Delta/Hudi CDF, Kafka compacted topics) or
  * the full validity-interval history (SCD-2 reconstruction — what
  * [[graft.mat.Snapshot]] builds from periodic table states, built here
  * from the exact change stream instead, so no intermediate state is
  * ever missed).
  *
  * Scale shape: both operators are ONE hash shuffle on the key columns
  * feeding streaming window functions (`row_number` / `lead`) — no
  * per-group buffers, so a key with a billion changes costs no more
  * memory than a key with one. Compaction output is bounded by the live
  * key count; history output is bounded by the changelog itself. The
  * (tsCol, tieCols) order must be a TOTAL order within a key — the
  * changelog's own sequence numbers — or "latest" is not well defined.
  */
object Cdc {

  private def requireCols(log: DataFrame, cols: Seq[String]): Unit = {
    val missing = cols.filterNot(log.columns.contains)
    require(missing.isEmpty, s"changelog is missing columns: $missing")
  }

  /** SCD-1 compaction: the latest surviving row per key. The newest
    * change (by tsCol, then tieCols) wins; keys whose newest change is
    * `deleteOp` disappear entirely. All payload columns pass through
    * untouched. */
  def compact(log: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCols: Seq[String], opCol: String,
      deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty, "compact needs at least one key column")
    requireCols(log, keyCols ++ (tsCol +: tieCols) :+ opCol)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(c => col(c).desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= lit(deleteOp))
      .drop("__rn")
  }

  /** SCD-2 reconstruction: one validity interval per non-delete change.
    * `valid_from` = the change's own timestamp; `valid_to` = the NEXT
    * change's timestamp for the key (computed over ALL changes, so a
    * delete closes its predecessor's interval even though the delete
    * row itself emits nothing); `is_current` marks open intervals. The
    * single window sort serves both `lead`s. */
  def history(log: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCols: Seq[String], opCol: String,
      deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty, "history needs at least one key column")
    requireCols(log, keyCols ++ (tsCol +: tieCols) :+ opCol)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    log.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .filter(col(opCol) =!= lit(deleteOp))
  }
}
