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
    val upd = updatedAtCol(cfg, now)(source)
    val withMeta = source
      .withColumn(ScdId, scdHash(cfg.uniqueKey.map(source(_)) :+ upd))
      .withColumn(UpdatedAt, upd.cast("timestamp"))
      .withColumn(ValidFrom, upd.cast("timestamp"))
      .withColumn(ValidTo, lit(null).cast("timestamp"))
    if (cfg.hardDeletes == HardDeletes.NewRecord)
      withMeta.withColumn(IsDeleted, lit("False"))
    else withMeta
  }

  /** NULL-safe "row changed" predicate between current row (c) and source
    * row (s) for the configured strategy. */
  private def changedCond(cur: DataFrame, src: DataFrame, cfg: SnapshotConfig,
      dataCols: Seq[String]): Column = cfg.strategy match {
    case "timestamp" =>
      val u = cfg.updatedAt.get
      cur(ValidFrom) < src(u)
    case "check" =>
      val cols = cfg.checkCols.getOrElse(dataCols) // None ⇒ check all
      cols.map(c => !(cur(c) <=> src(c))).reduce(_ || _)
    case other =>
      throw new IllegalArgumentException(s"unknown snapshot strategy: $other")
  }

  private[mat] def applyChanges(snap: DataFrame, source: DataFrame,
      cfg: SnapshotConfig, now: java.sql.Timestamp): DataFrame = {
    val metaCols = Seq(ScdId, ValidFrom, ValidTo, UpdatedAt, IsDeleted)
    val dataCols = snap.columns.filterNot(metaCols.contains).toSeq
    val hasDeletedCol = snap.columns.contains(IsDeleted)

    val closed = snap.filter(col(ValidTo).isNotNull)
    val current = snap.filter(col(ValidTo).isNull).alias("c")
    val src = source.alias("s")

    val kCond = cfg.uniqueKey.map(k => current(k) <=> src(k)).reduce(_ && _)
    val changed = changedCond(current, src, cfg, dataCols)
    val srcUpd = updatedAtCol(cfg, now)(src)

    // updates: close the current row at the source's update time
    // (helpers.sql:117-137), and insert the new version.
    val joined = current.join(src, kCond, "inner")
    val closedUpdates = joined.filter(changed)
      .select(snap.columns.map {
        case ValidTo => srcUpd.cast("timestamp").as(ValidTo)
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
          case ValidTo => lit(now).cast("timestamp").as(ValidTo)
          case c => col(c)
        }.toIndexedSeq: _*)
      case HardDeletes.NewRecord =>
        val closedRows = vanished.select(snap.columns.map {
          case ValidTo => lit(now).cast("timestamp").as(ValidTo)
          case c => col(c)
        }.toIndexedSeq: _*)
        // deletion record: same data, open row flagged deleted
        // (helpers.sql:166-186 deletion_records).
        val delRecords = vanished.select(snap.columns.map {
          case ScdId => scdHash(cfg.uniqueKey.map(col) :+ lit(now)).as(ScdId)
          case ValidFrom => lit(now).cast("timestamp").as(ValidFrom)
          case ValidTo => lit(null).cast("timestamp").as(ValidTo)
          case UpdatedAt => lit(now).cast("timestamp").as(UpdatedAt)
          case IsDeleted => lit("True").as(IsDeleted)
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
    val upd = updatedAtCol(cfg, now)(src)
    srcRows.select(outCols.map {
      case ScdId => scdHash(cfg.uniqueKey.map(src(_)) :+ upd).as(ScdId)
      case ValidFrom => upd.cast("timestamp").as(ValidFrom)
      case ValidTo => lit(null).cast("timestamp").as(ValidTo)
      case UpdatedAt => upd.cast("timestamp").as(UpdatedAt)
      case IsDeleted if hasDeletedCol => lit("False").as(IsDeleted)
      case c => src(c).as(c)
    }.toIndexedSeq: _*)
  }
}
