package graft.mat

import graft.adapter.SparkAdapter
import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type-2 snapshots (reference: MA/materializations/snapshots/
  * snapshot.sql:1-111, strategies.sql, helpers.sql:49-231, Spark override
  * MS/materializations/snapshot.sql:89-204).
  *
  * Meta columns (helpers.sql:211-231 build_snapshot_table):
  *   dbt_scd_id     = md5(concat_ws('|', unique_key..., updated_at))
  *   dbt_valid_from = updated_at (timestamp strategy) / run now (check)
  *   dbt_valid_to   = NULL while current
  *   dbt_updated_at = updated_at / run now
  *
  * Strategies (strategies.sql:56-88 timestamp, :145-187 check):
  *   timestamp — changed iff snapshotted.dbt_valid_from < source.updated_at
  *   check     — changed iff any check_cols differ (NULL-safe), `all` =
  *               every non-meta column
  *
  * The staging pipeline (helpers.sql:49-208) computes insertions / updates /
  * deletes and applies them with a MERGE on dbt_scd_id
  * (snapshot_merge.sql:1-34). On parquet we fold the same row sets into one
  * rewrite: closed-history rows pass through untouched; current rows are
  * closed or kept; new versions are appended — then one atomic swap. The
  * target is scanned once, joined once on the key: the same shuffle profile
  * a warehouse MERGE would have.
  */
object SnapshotMat extends Materialization {
  val name = "snapshot"

  val ScdId = "dbt_scd_id"
  val ValidFrom = "dbt_valid_from"
  val ValidTo = "dbt_valid_to"
  val UpdatedAt = "dbt_updated_at"
  val IsDeleted = "dbt_is_deleted"

  /** Resolved meta-column names: defaults overridable per snapshot via
    * `snapshot_meta_column_names` (reference: helpers.sql:44
    * get_snapshot_table_column_names). */
  private[mat] final case class Meta(scdId: String, validFrom: String,
      validTo: String, updatedAt: String, isDeleted: String)

  private[mat] def metaOf(cfg: SnapshotConfig): Meta = {
    def n(k: String, d: String) = cfg.metaColumnNames.getOrElse(k, d)
    Meta(n(ScdId, ScdId), n(ValidFrom, ValidFrom), n(ValidTo, ValidTo),
      n(UpdatedAt, UpdatedAt), n(IsDeleted, IsDeleted))
  }

  /** Open rows' valid_to: NULL unless `dbt_valid_to_current` supplies a
    * far-future literal (helpers.sql:272-276). */
  private def openValidTo(cfg: SnapshotConfig): Column =
    cfg.dbtValidToCurrent.map(expr).getOrElse(lit(null)).cast("timestamp")

  /** A row is current when valid_to is NULL — or equals the configured
    * current-marker (both forms coexist after a config change,
    * helpers.sql:120-128). */
  private def isCurrent(cfg: SnapshotConfig, validTo: Column): Column =
    cfg.dbtValidToCurrent match {
      case Some(cur) => validTo.isNull || validTo <=> expr(cur).cast("timestamp")
      case None => validTo.isNull
    }

  def run(ctx: MatContext): MatResult = {
    val cfg = ctx.config.snapshot.getOrElse(
      throw new IllegalArgumentException("snapshot config required"))
    val adapter = ctx.adapter
    val target = ctx.target
    val source = ctx.compiled()
    if (!adapter.relationExists(target)) {
      adapter.writeTableAtomic(buildFirst(source, cfg, ctx.now), target)
      MatResult(target, "success", "snapshot: initial build")
    } else {
      val snap = adapter.read(target)
      val merged = applyChanges(snap, source, cfg, ctx.now)
      adapter.writeTableAtomic(merged, target)
      MatResult(target, "success", s"snapshot: ${cfg.strategy} strategy applied")
    }
  }

  /** md5 over '|'-joined key parts — snapshot_hash_arguments
    * (strategies.sql:40-50; Spark md5 MS/materializations/snapshot.sql:1-6).
    * Everything is cast to string first so the hash matches a SQL oracle. */
  private def scdHash(cols: Seq[Column]): Column =
    md5(concat_ws("|", cols.map(_.cast("string")): _*))

  private def updatedAtCol(cfg: SnapshotConfig, now: java.sql.Timestamp): DataFrame => Column =
    df => cfg.strategy match {
      case "timestamp" => df(cfg.updatedAt.getOrElse(
        throw new IllegalArgumentException("timestamp strategy requires updated_at")))
      case _ => lit(now)
    }

  private[mat] def buildFirst(source: DataFrame, cfg: SnapshotConfig,
      now: java.sql.Timestamp): DataFrame = {
    val m = metaOf(cfg)
    val upd = updatedAtCol(cfg, now)(source)
    val withMeta = source
      .withColumn(m.scdId, scdHash(cfg.uniqueKey.map(source(_)) :+ upd))
      .withColumn(m.updatedAt, upd.cast("timestamp"))
      .withColumn(m.validFrom, upd.cast("timestamp"))
      .withColumn(m.validTo, openValidTo(cfg))
    if (cfg.hardDeletes == HardDeletes.NewRecord)
      withMeta.withColumn(m.isDeleted, lit("False"))
    else withMeta
  }

  /** NULL-safe "row changed" predicate between current row (c) and source
    * row (s) for the configured strategy. */
  private def changedCond(cur: DataFrame, src: DataFrame, cfg: SnapshotConfig,
      dataCols: Seq[String]): Column = cfg.strategy match {
    case "timestamp" =>
      val u = cfg.updatedAt.get
      cur(metaOf(cfg).validFrom) < src(u)
    case "check" =>
      val cols = cfg.checkCols.getOrElse(dataCols) // None ⇒ check all
      cols.map(c => !(cur(c) <=> src(c))).reduce(_ || _)
    case other =>
      throw new IllegalArgumentException(s"unknown snapshot strategy: $other")
  }

  private[mat] def applyChanges(snap: DataFrame, source: DataFrame,
      cfg: SnapshotConfig, now: java.sql.Timestamp): DataFrame = {
    val m = metaOf(cfg)
    val metaCols = Seq(m.scdId, m.validFrom, m.validTo, m.updatedAt, m.isDeleted)
    val dataCols = snap.columns.filterNot(metaCols.contains).toSeq
    val hasDeletedCol = snap.columns.contains(m.isDeleted)

    val closed = snap.filter(!isCurrent(cfg, col(m.validTo)))
    val current = snap.filter(isCurrent(cfg, col(m.validTo))).alias("c")
    val src = source.alias("s")

    val kCond = cfg.uniqueKey.map(k => current(k) <=> src(k)).reduce(_ && _)
    val changed = changedCond(current, src, cfg, dataCols)
    val srcUpd = updatedAtCol(cfg, now)(src)

    // updates: close the current row at the source's update time
    // (helpers.sql:117-137), and insert the new version.
    val joined = current.join(src, kCond, "inner")
    val closedUpdates = joined.filter(changed)
      .select(snap.columns.map {
        case c if c == m.validTo => srcUpd.cast("timestamp").as(m.validTo)
        case c => current(c).as(c)
      }.toIndexedSeq: _*)
    val keptCurrent = joined.filter(!changed)
      .select(snap.columns.map(c => current(c).as(c)).toIndexedSeq: _*)

    val newVersions = {
      val j = src.join(current, kCond, "inner")
      val changedNew = j.filter(changedCond(current, src, cfg, dataCols))
      withMeta(changedNew, src, cfg, now, hasDeletedCol, snap.columns.toSeq)
    }

    // insertions: new keys (helpers.sql:95-115).
    val inserts = withMeta(src.join(current, kCond, "left_anti"), src, cfg, now,
      hasDeletedCol, snap.columns.toSeq)

    // deletes: current rows whose key vanished from source
    // (helpers.sql:139-186, HardDeletes common.rs:613-620).
    val vanished = current.join(src, kCond, "left_anti")
    val deletes: DataFrame = cfg.hardDeletes match {
      case HardDeletes.IgnoreDeletes =>
        vanished.select(snap.columns.map(c => col(c)).toIndexedSeq: _*)
      case HardDeletes.Invalidate =>
        vanished.select(snap.columns.map {
          case c if c == m.validTo => lit(now).cast("timestamp").as(m.validTo)
          case c => col(c)
        }.toIndexedSeq: _*)
      case HardDeletes.NewRecord =>
        val closedRows = vanished.select(snap.columns.map {
          case c if c == m.validTo => lit(now).cast("timestamp").as(m.validTo)
          case c => col(c)
        }.toIndexedSeq: _*)
        // deletion record: same data, open row flagged deleted
        // (helpers.sql:166-186 deletion_records).
        val delRecords = vanished.select(snap.columns.map {
          case c if c == m.scdId =>
            scdHash(cfg.uniqueKey.map(col) :+ lit(now)).as(m.scdId)
          case c if c == m.validFrom => lit(now).cast("timestamp").as(m.validFrom)
          case c if c == m.validTo => openValidTo(cfg).as(m.validTo)
          case c if c == m.updatedAt => lit(now).cast("timestamp").as(m.updatedAt)
          case c if c == m.isDeleted => lit("True").as(m.isDeleted)
          case c => col(c)
        }.toIndexedSeq: _*)
        closedRows.unionByName(delRecords)
    }

    closed.unionByName(closedUpdates).unionByName(keptCurrent)
      .unionByName(newVersions).unionByName(inserts).unionByName(deletes)
  }

  /** Attach snapshot meta columns to source rows becoming new versions. */
  private def withMeta(srcRows: DataFrame, src: DataFrame, cfg: SnapshotConfig,
      now: java.sql.Timestamp, hasDeletedCol: Boolean,
      outCols: Seq[String]): DataFrame = {
    val m = metaOf(cfg)
    val upd = updatedAtCol(cfg, now)(src)
    srcRows.select(outCols.map {
      case c if c == m.scdId =>
        scdHash(cfg.uniqueKey.map(src(_)) :+ upd).as(m.scdId)
      case c if c == m.validFrom => upd.cast("timestamp").as(m.validFrom)
      case c if c == m.validTo => openValidTo(cfg).as(m.validTo)
      case c if c == m.updatedAt => upd.cast("timestamp").as(m.updatedAt)
      case c if c == m.isDeleted && hasDeletedCol => lit("False").as(m.isDeleted)
      case c => src(c).as(c)
    }.toIndexedSeq: _*)
  }
}
