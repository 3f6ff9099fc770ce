package graft.mat

import graft.adapter.SparkAdapter
import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

/** Incremental materialization: first run = CTAS; later runs apply one of
  * the strategy DMLs after schema-change handling
  * (reference: MA/materializations/models/incremental/incremental.sql:2-99,
  * Spark override MS/materializations/incremental/incremental.sql:1-85,
  * strategies MA/.../strategies.sql + MS/.../strategies.sql).
  *
  * Spark-first translation notes (scale):
  *   - `merge`/`delete+insert` on plain parquet are rewritten as
  *     anti-join + union + atomic swap — the target is scanned once,
  *     joined on the unique key (null-safe `<=>`, dbt's `equals` macro),
  *     and rewritten. `incremental_predicates` restrict the rewritten slice
  *     so the untouched remainder is a pruned scan, mirroring the intent of
  *     predicate-limited MERGE at warehouse scale.
  *   - `insert_overwrite` / `microbatch` with `partition_by` use Spark's
  *     dynamic partition overwrite — only affected partitions are written,
  *     which is the 100 TB-safe path.
  *   - `append` is a plain positional INSERT INTO.
  */
object IncrementalMat extends Materialization {
  val name = "incremental"

  /** Derived partition column for `hash_buckets` layouts. */
  private[graft] val BucketCol = "_graft_bucket"

  def run(ctx: MatContext): MatResult = {
    val cfg0 = ctx.config
    val target = ctx.target
    val adapter = ctx.adapter
    val exists = adapter.relationExists(target)
    val strategy = cfg0.incrementalStrategy.getOrElse(IncrementalStrategy.Append)

    // hash_buckets: N — a Spark-native answer to "unpartitioned keyed
    // merge rewrites the whole table" (the plain-parquet ceiling Delta
    // solves with file-level MERGE pruning). The materialization maintains
    // a derived partition column pmod(xxhash64(unique key), N); merge /
    // delete+insert then ride the existing touched-partition pruning, so
    // a batch touching k keys rewrites ~min(k, N)/N of the table instead
    // of all of it. Readers see one extra `_graft_bucket` column.
    // ONLY the keyed rewrite strategies understand the bucket column.
    // insert_overwrite in particular would treat buckets as user
    // partitions and dynamically overwrite every bucket a batch row hashes
    // into — silently deleting the other keys in those buckets.
    val bucketableStrategy = strategy match {
      case IncrementalStrategy.Merge | IncrementalStrategy.DeleteInsert => true
      case _ => false
    }
    val buckets: Option[Int] = cfg0.extra.get("hash_buckets")
      .map(v => graft.project.Yaml.str(v).toInt).filter(_ > 0)
      .filter(_ => cfg0.uniqueKey.nonEmpty && bucketableStrategy)
    def bucketize(df: DataFrame): DataFrame = buckets match {
      case Some(n) =>
        val keyExpr = cfg0.uniqueKey.map(k => s"`$k`").mkString(", ")
        df.withColumn(BucketCol, expr(s"pmod(xxhash64($keyExpr), $n)"))
      case None => df
    }
    val cfg = buckets.fold(cfg0)(_ =>
      cfg0.copy(partitionBy = cfg0.partitionBy :+ BucketCol))

    if (!exists || ctx.fullRefresh) {
      // First run / full refresh: plain CTAS (incremental.sql:17-25).
      adapter.writeTableAtomic(bucketize(ctx.compiled()), target,
        cfg.partitionBy, cfg.sortBy)
      return MatResult(target, "success",
        if (exists) "full refresh" else "first run: create table as select")
    }
    // hash_buckets added to an already-built unbucketed table: the target
    // has neither the derived column nor the partitioning — fail with the
    // migration step instead of an AnalysisException naming an internal
    // column the user never wrote
    if (buckets.isDefined &&
        !adapter.getColumnsInRelation(target).fieldNames.contains(BucketCol))
      throw new IllegalStateException(
        s"${target.fqn}: hash_buckets was configured but the existing " +
          "table is not bucketized — run once with --full-refresh to " +
          "migrate the layout")

    val source0 = bucketize(ctx.compiled())
    // widen target column types so incoming values fit (incremental.sql:37)
    adapter.expandTargetColumnTypes(source0.schema, target, cfg.partitionBy)
    val source = processSchemaChanges(adapter, target, source0, cfg.onSchemaChange)

    strategy match {
      case IncrementalStrategy.Append =>
        adapter.appendToTable(source, target)
      case IncrementalStrategy.Merge =>
        merge(adapter, target, source, cfg)
      case IncrementalStrategy.DeleteInsert =>
        deleteInsert(adapter, target, source, cfg)
      case IncrementalStrategy.InsertOverwrite =>
        if (cfg.partitionBy.nonEmpty) adapter.insertOverwritePartitions(source, target)
        else adapter.writeTableAtomic(source, target, Nil)
      case IncrementalStrategy.ReplaceWhere =>
        replaceWhere(adapter, target, source, cfg)
      case IncrementalStrategy.MergeAggregate =>
        mergeAggregate(adapter, target, source, cfg)
      case IncrementalStrategy.Microbatch =>
        throw new IllegalStateException(
          "microbatch runs through MicrobatchRunner, not a single-shot strategy")
      case IncrementalStrategy.Custom(name) =>
        customStrategy(ctx, name, source, cfg)
    }
    MatResult(target, "success", s"incremental ${strategy.name}")
  }

  /** Custom strategy: materialize the batch as the temp relation, render
    * the project's `get_incremental_<name>_sql(arg_dict)` macro with dbt's
    * arg dict, execute the SQL it returns, drop the temp (reference:
    * base_adapter.rs:339 get_incremental_strategy_macro;
    * MA/.../strategies.sql:79-92 custom dispatch). */
  private def customStrategy(ctx: MatContext, name: String,
      source: DataFrame, cfg: NodeConfig): Unit = {
    val render = ctx.macroRenderer.getOrElse(
      throw new IllegalArgumentException(
        s"incremental strategy '$name' needs macro get_incremental_${name}_sql " +
          "but no macro context is available"))
    val adapter = ctx.adapter
    val target = ctx.target
    val tmp = target.intermediate
    adapter.writeTableAtomic(source, tmp, cfg.partitionBy)
    try {
      val sql = render(s"get_incremental_${name}_sql", Map(
        "target_relation" -> target.fqn,
        "temp_relation" -> tmp.fqn,
        "unique_key" -> cfg.uniqueKey,
        "dest_columns" -> adapter.getColumnsInRelation(target).fieldNames.toSeq,
        "incremental_predicates" -> cfg.incrementalPredicates)).trim
      if (sql.isEmpty) throw new IllegalArgumentException(
        s"macro get_incremental_${name}_sql returned no SQL")
      adapter.execute(sql, fetch = false)
    } finally adapter.dropRelation(tmp)
  }

  /** Null-safe equality on the unique key, dbt `equals` macro → `<=>`
    * (MA/utils/equals.sql). */
  private def keyCond(t: DataFrame, s: DataFrame, keys: Seq[String]): Column =
    keys.map(k => t(k) <=> s(k)).reduce(_ && _)

  /** Above this many touched partitions the pruning filter (a DNF over
    * partition tuples) stops being worth it — fall back to the full
    * rewrite, which is then touching most of the table anyway. */
  private[mat] val MaxTouchedPartitions = 1000

  /** Partitions the merge/delete+insert must rewrite: partitions receiving
    * source rows ∪ partitions holding target rows whose key matches an
    * incoming key (an updated/deleted row's OLD partition must be rewritten
    * even when the source row lands elsewhere). The second set comes from a
    * narrow scan — key + partition columns only, so parquet reads two
    * columns, not the row. Returns None (→ full-rewrite fallback) when the
    * target is unpartitioned or the touched set exceeds
    * [[MaxTouchedPartitions]]. */
  private def touchedPartitionTuples(adapter: SparkAdapter, target: Relation,
      source: DataFrame, cfg: NodeConfig): Option[Seq[Seq[Any]]] = {
    val parts = cfg.partitionBy
    if (parts.isEmpty) return None
    val srcParts = source.select(parts.map(c => col(s"`$c`")): _*)
      .distinct().limit(MaxTouchedPartitions + 1).collect()
    if (srcParts.length > MaxTouchedPartitions) return None
    val keys = cfg.uniqueKey
    val scanCols = (keys ++ parts).distinct
    val t = adapter.read(target)
      .select(scanCols.map(c => col(s"`$c`")): _*).alias("T")
    val sk = source.select(keys.map(c => col(s"`$c`")): _*).distinct().alias("S")
    val cond = keys.map(k => col(s"T.`$k`") <=> col(s"S.`$k`")).reduce(_ && _)
    val matched = t.join(sk, cond, "left_semi")
      .select(parts.map(c => col(s"`$c`")): _*)
      .distinct().limit(MaxTouchedPartitions + 1).collect()
    if (matched.length > MaxTouchedPartitions) return None
    val all = (srcParts ++ matched).map(_.toSeq).distinct
    if (all.size > MaxTouchedPartitions) None else Some(all)
  }

  /** Partition-pruning predicate over the touched tuples; Catalyst turns
    * the equality DNF into catalog partition pruning on the target scan. */
  private def partitionFilter(parts: Seq[String], tuples: Seq[Seq[Any]]): Column =
    if (tuples.isEmpty) lit(false)
    else tuples.map { tup =>
      parts.zip(tup).map { case (c, v) =>
        if (v == null) col(s"`$c`").isNull else col(s"`$c`") === lit(v)
      }.reduce(_ && _)
    }.reduce(_ || _)

  /** Write a merge/delete+insert result back: pruned targets rewrite ONLY
    * their touched partitions (dynamic partition overwrite), dropping any
    * touched partition whose rows all vanished; unpartitioned (or
    * over-cap) targets keep the atomic full swap. */
  private def writeKeyedResult(adapter: SparkAdapter, target: Relation,
      result: DataFrame, cfg: NodeConfig, touched: Option[Seq[Seq[Any]]]): Unit =
    touched match {
      case Some(tuples) =>
        val parts = cfg.partitionBy
        val cached = result.persist() // touched slice only, reused twice
        try {
          val present = cached.select(parts.map(c => col(s"`$c`")): _*)
            .distinct().collect().map(_.toSeq).toSet
          adapter.insertOverwritePartitions(cached, target)
          tuples.filterNot(present).foreach(tup =>
            adapter.dropPartition(target, parts.zip(tup)))
        } finally { cached.unpersist(); () }
      case None =>
        adapter.writeTableAtomic(result, target, cfg.partitionBy, cfg.sortBy)
    }

  /** MERGE semantics on parquet (default__get_merge_sql,
    * MA/.../merge.sql:9-56; spark__get_merge_sql MS/.../strategies.sql:28-68):
    * matched rows get `merge_update_columns` (or all minus
    * `merge_exclude_columns`) updated from source; unmatched source rows are
    * inserted; everything else is untouched. No unique_key ⇒ insert-only
    * (`ON FALSE`). */
  private[mat] def merge(adapter: SparkAdapter, target: Relation,
      source: DataFrame, cfg: NodeConfig): Unit = {
    if (cfg.uniqueKey.isEmpty) { adapter.appendToTable(source, target); return }
    val tgtAll = adapter.read(target)
    val cols = tgtAll.columns.toSeq
    val updateCols: Seq[String] =
      if (cfg.mergeUpdateColumns.nonEmpty) cfg.mergeUpdateColumns
      else cols.filterNot(cfg.mergeExcludeColumns.contains).filterNot(cfg.uniqueKey.contains)

    // Delta target ⇒ native MERGE INTO (file-level rewrite only); absent
    // Delta — this image — falls through to the relational rewrite below.
    if (graft.adapter.DeltaSupport.nativeMerge(adapter.spark, target, source,
        cfg.uniqueKey, updateCols, cfg.incrementalPredicates)) return

    // Partitioned target: restrict the whole merge to touched partitions —
    // untouched partitions are never read or rewritten (the 100 TB path).
    val touched = touchedPartitionTuples(adapter, target, source, cfg)
    val scope = touched.fold(tgtAll)(ts =>
      tgtAll.filter(partitionFilter(cfg.partitionBy, ts)))
    val (inScope, outOfScope) = splitByPredicates(scope, cfg.incrementalPredicates)

    val t = inScope.alias("DBT_INTERNAL_DEST")
    val s = source.alias("DBT_INTERNAL_SOURCE")
    val cond = cfg.uniqueKey
      .map(k => col(s"DBT_INTERNAL_DEST.`$k`") <=> col(s"DBT_INTERNAL_SOURCE.`$k`"))
      .reduce(_ && _)

    // WHEN MATCHED THEN UPDATE SET <updateCols from source>
    val updated = t.join(s, cond, "inner").select(cols.map { c =>
      val side = if (updateCols.contains(c)) "DBT_INTERNAL_SOURCE" else "DBT_INTERNAL_DEST"
      col(s"$side.`$c`").as(c)
    }: _*)
    // untouched target rows
    val untouched = t.join(s, cond, "left_anti").select(cols.map(c => col(s"`$c`")): _*)
    // WHEN NOT MATCHED THEN INSERT
    val inserted = s.join(t, cond, "left_anti").select(cols.map { c =>
      if (source.columns.contains(c)) col(s"`$c`") else lit(null).as(c)
    }: _*)

    val result = outOfScope.select(cols.map(c => col(s"`$c`")): _*)
      .unionByName(untouched).unionByName(updated).unionByName(inserted)
    writeKeyedResult(adapter, target, result, cfg, touched)
  }

  /** DELETE FROM target WHERE key IN (SELECT DISTINCT key FROM source);
    * INSERT INTO target SELECT * FROM source
    * (MA/.../merge.sql:58-96). Unlike merge, duplicate-key source rows all
    * land in the target. */
  private[mat] def deleteInsert(adapter: SparkAdapter, target: Relation,
      source: DataFrame, cfg: NodeConfig): Unit = {
    if (cfg.uniqueKey.isEmpty) { adapter.appendToTable(source, target); return }
    val tgtAll = adapter.read(target)
    val cols = tgtAll.columns.toSeq
    val touched = touchedPartitionTuples(adapter, target, source, cfg)
    val scope = touched.fold(tgtAll)(ts =>
      tgtAll.filter(partitionFilter(cfg.partitionBy, ts)))
    val (inScope, outOfScope) = splitByPredicates(scope, cfg.incrementalPredicates)
    val srcKeys = source.select(cfg.uniqueKey.map(k => col(s"`$k`")): _*).distinct()
    val kept = inScope.join(srcKeys, keyCond(inScope, srcKeys, cfg.uniqueKey), "left_anti")
    val inserted = source.select(cols.map { c =>
      if (source.columns.contains(c)) col(s"`$c`") else lit(null).as(c)
    }: _*)
    val result = outOfScope.select(cols.map(c => col(s"`$c`")): _*)
      .unionByName(kept.select(cols.map(c => col(s"`$c`")): _*))
      .unionByName(inserted)
    writeKeyedResult(adapter, target, result, cfg, touched)
  }

  /** replace_where (Databricks `INSERT INTO … REPLACE WHERE`, reference
    * databricks/configs/incremental.rs): target rows matching the
    * predicate(s) are deleted, the incoming batch inserted — one atomic
    * slice swap. On a partitioned target only partitions holding replaced
    * rows or receiving new ones are rewritten (narrow partition-column
    * scan finds them); NULL predicate rows are kept, matching SQL
    * semantics. */
  private[mat] def replaceWhere(adapter: SparkAdapter, target: Relation,
      source: DataFrame, cfg: NodeConfig): Unit = {
    if (cfg.incrementalPredicates.isEmpty)
      throw new IllegalArgumentException(
        "replace_where requires incremental_predicates")
    val cond = cfg.incrementalPredicates.map(p => expr(p)).reduce(_ && _)
    val tgtAll = adapter.read(target)
    val cols = tgtAll.columns.toSeq
    val parts = cfg.partitionBy

    val touched: Option[Seq[Seq[Any]]] =
      if (parts.isEmpty) None
      else {
        val srcParts = source.select(parts.map(c => col(s"`$c`")): _*)
          .distinct().limit(MaxTouchedPartitions + 1).collect()
        val matched = tgtAll.filter(coalesce(cond, lit(false)))
          .select(parts.map(c => col(s"`$c`")): _*)
          .distinct().limit(MaxTouchedPartitions + 1).collect()
        if (srcParts.length > MaxTouchedPartitions ||
            matched.length > MaxTouchedPartitions) None
        else {
          val all = (srcParts ++ matched).map(_.toSeq).distinct
          if (all.size > MaxTouchedPartitions) None else Some(all)
        }
      }
    val scope = touched.fold(tgtAll)(ts => tgtAll.filter(partitionFilter(parts, ts)))
    val kept = scope.filter(!coalesce(cond, lit(false)))
    val inserted = source.select(cols.map { c =>
      if (source.columns.contains(c)) col(s"`$c`") else lit(null).as(c)
    }: _*)
    val result = kept.select(cols.map(c => col(s"`$c`")): _*).unionByName(inserted)
    writeKeyedResult(adapter, target, result, cfg, touched)
  }

  /** merge_aggregate: partial-aggregate maintenance. The model's batch is
    * already a PARTIAL aggregate keyed by `unique_key`; the stored state
    * merges it in with per-column mergeable functions from
    * `aggregate_columns: {col: sum|min|max}` (counts merge as sums — the
    * model emits counts, the strategy adds them). One union + one
    * state-bounded regroup per run: the 100 TB fact table is scanned
    * once ever, not once per refresh. Schema is pinned to
    * keys ∪ aggregate columns, and each merged column casts back to the
    * stored type so repeated decimal SUM widening can't drift the
    * schema run over run. Non-mergeable aggregates (avg, countDistinct)
    * are the caller's job to decompose into mergeable parts. */
  private[mat] def mergeAggregate(adapter: SparkAdapter, target: Relation,
      source: DataFrame, cfg: NodeConfig): Unit = {
    if (cfg.uniqueKey.isEmpty)
      throw new IllegalArgumentException(
        "merge_aggregate requires unique_key (the aggregate's group keys)")
    // hash_buckets exists for keyed ROW rewrites (merge/delete+insert);
    // a partial-aggregate state table regroups fully each run, so there
    // is no touched-bucket pruning to ride — reject the combination by
    // name instead of letting the exact-columns check below fail with a
    // message about aggregate_columns that never mentions the real cause
    if (cfg.extra.contains("hash_buckets"))
      throw new IllegalArgumentException(
        "merge_aggregate does not support hash_buckets: the state table " +
          "is regrouped on unique_key each run, so bucket-partition " +
          "pruning never applies — remove hash_buckets or use merge")
    val fns: Map[String, String] = cfg.extra.get("aggregate_columns") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> graft.project.Yaml.str(v) }
      case _ => throw new IllegalArgumentException(
        "merge_aggregate requires aggregate_columns: {col: sum|min|max}")
    }
    val bad = fns.filterNot(kv => Set("sum", "min", "max")(kv._2))
    if (bad.nonEmpty) throw new IllegalArgumentException(
      s"merge_aggregate supports sum|min|max, got: $bad")
    val expected = (cfg.uniqueKey ++ fns.keys).toSet
    if (source.columns.toSet != expected)
      throw new IllegalArgumentException(
        s"merge_aggregate model must emit exactly keys + aggregate " +
          s"columns ${expected.toSeq.sorted}, got ${source.columns.toSeq.sorted}")
    val old = adapter.read(target)
    val aligned = source.select(old.columns.map(c => col(s"`$c`")).toSeq: _*)
    val aggs = fns.toSeq.sortBy(_._1).map { case (c, f) =>
      val merged = f match {
        case "sum" => sum(col(s"`$c`"))
        case "min" => min(col(s"`$c`"))
        case "max" => max(col(s"`$c`"))
      }
      merged.cast(old.schema(c).dataType).as(c)
    }
    val result = old.unionByName(aligned)
      .groupBy(cfg.uniqueKey.map(c => col(s"`$c`")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(old.columns.map(c => col(s"`$c`")).toSeq: _*)
    adapter.writeTableAtomic(result, target, cfg.partitionBy, cfg.sortBy)
  }

  /** incremental_predicates limit which target rows participate in the
    * merge (MA/.../merge.sql:23-27: extra ON conditions). Rows failing the
    * predicate are carried over untouched; at scale the predicate is a
    * partition-pruning filter on the target scan. Predicates may reference
    * the target as `DBT_INTERNAL_DEST.<col>`. */
  private def splitByPredicates(tgt: DataFrame,
      predicates: Seq[String]): (DataFrame, DataFrame) = {
    if (predicates.isEmpty) (tgt, tgt.limit(0))
    else {
      val t = tgt.alias("DBT_INTERNAL_DEST")
      val cond = predicates.map(p => coalesce(expr(p), lit(false))).reduce(_ && _)
      (t.filter(cond), t.filter(!cond))
    }
  }

  /** on_schema_change handling (check_for_schema_changes /
    * sync_column_schemas, MA/.../on_schema_change.sql:20-145). Returns the
    * source aligned to the (possibly altered) target schema. */
  private[mat] def processSchemaChanges(adapter: SparkAdapter, target: Relation,
      source: DataFrame, mode: OnSchemaChange): DataFrame = {
    val tgtSchema = adapter.getColumnsInRelation(target)
    val srcCols = source.columns.toSet
    val tgtCols = tgtSchema.fieldNames.toSet
    val newInSource: Seq[StructField] =
      source.schema.fields.filterNot(f => tgtCols.contains(f.name)).toSeq
    val missingInSource: Seq[String] =
      tgtSchema.fieldNames.filterNot(srcCols.contains).toSeq

    mode match {
      case OnSchemaChange.Ignore =>
        // Insert by target column list; extra source cols dropped, missing → null.
        source.select(tgtSchema.fieldNames.map { c =>
          if (srcCols.contains(c)) col(s"`$c`") else lit(null).as(c)
        }.toIndexedSeq: _*)
      case OnSchemaChange.Fail =>
        if (newInSource.nonEmpty || missingInSource.nonEmpty)
          throw new IllegalStateException(
            s"on_schema_change=fail: new=${newInSource.map(_.name).mkString(",")} " +
              s"missing=${missingInSource.mkString(",")}")
        source.select(tgtSchema.fieldNames.map(c => col(s"`$c`")).toIndexedSeq: _*)
      case OnSchemaChange.AppendNewColumns =>
        adapter.addColumns(target, org.apache.spark.sql.types.StructType(newInSource))
        val newOrder = adapter.getColumnsInRelation(target).fieldNames
        source.select(newOrder.map { c =>
          if (source.columns.contains(c)) col(s"`$c`") else lit(null).as(c)
        }.toIndexedSeq: _*)
      case OnSchemaChange.SyncAllColumns =>
        // add new AND remove vanished — column removal on parquet forces a
        // rewrite of the target (sync_column_schemas :63-100).
        adapter.addColumns(target, org.apache.spark.sql.types.StructType(newInSource))
        if (missingInSource.nonEmpty) {
          val keep = adapter.getColumnsInRelation(target).fieldNames
            .filter(srcCols.contains)
          val rewritten = adapter.read(target)
            .select(keep.map(c => col(s"`$c`")).toIndexedSeq: _*)
          adapter.writeTableAtomic(rewritten, target)
        }
        val finalOrder = adapter.getColumnsInRelation(target).fieldNames
        source.select(finalOrder.map { c =>
          if (source.columns.contains(c)) col(s"`$c`") else lit(null).as(c)
        }.toIndexedSeq: _*)
    }
  }

  /** is_incremental(): target exists ∧ not full-refresh ∧ incremental
    * (MA/materializations/models/incremental/is_incremental.sql:1-13) —
    * evaluated at compile time and injected into the Jinja context. */
  /** Whether `is_incremental()` renders true for this node: the
    * incremental materialization proper, or a `pipeline` model with
    * `incremental: true` (its model SQL uses the same macro to narrow
    * the input to the new batch — the curation-run shape). */
  def isIncremental(adapter: SparkAdapter, target: Relation,
      fullRefresh: Boolean, materialized: String,
      extra: Map[String, Any] = Map.empty): Boolean = {
    val incrementalish = materialized == "incremental" ||
      (materialized == "pipeline" &&
        extra.get("incremental").exists(v => String.valueOf(v).toBoolean))
    incrementalish && !fullRefresh && adapter.relationExists(target)
  }
}

/** Microbatch: the run is split into [begin, end) windows of `batch_size`,
  * re-processing `lookback` already-complete batches for late data; each
  * batch is filtered on `event_time` and applied with insert_overwrite
  * semantics (reference: model_config.rs:79-82,209-210, DbtBatchSize
  * common.rs:523-529, strategies.sql:79-92).
  *
  * With `partition_by` on the event date the per-batch write is a dynamic
  * partition overwrite — the 100 TB path: each batch touches only its own
  * partitions. Without it we fall back to a full rewrite per run (correct,
  * not scalable — flagged in the result message).
  */
object MicrobatchRunner {
  final case class Batch(start: java.sql.Timestamp, end: java.sql.Timestamp)

  /** A max(event_time) cell as a Timestamp, whatever Spark hands back:
    * TIMESTAMP → java.sql.Timestamp, TIMESTAMP_NTZ → LocalDateTime,
    * DATE → java.sql.Date / LocalDate. getTimestamp(0) CCEs on the NTZ
    * form — which a catch-all Try used to swallow into "no resume",
    * silently reprocessing all history for NTZ event times. Unsupported
    * types fail with the column's actual class named. */
  private[graft] def eventTimeValue(v: Any): Option[java.sql.Timestamp] =
    v match {
      case null => None
      case t: java.sql.Timestamp => Some(t)
      case ldt: java.time.LocalDateTime =>
        Some(java.sql.Timestamp.valueOf(ldt))
      case d: java.sql.Date => Some(new java.sql.Timestamp(d.getTime))
      case ld: java.time.LocalDate =>
        Some(java.sql.Timestamp.valueOf(ld.atStartOfDay))
      case i: java.time.Instant => Some(java.sql.Timestamp.from(i))
      case other => throw new IllegalStateException(
        s"event_time resume: unsupported max(event_time) type " +
          s"${other.getClass.getName} (value $other)")
    }

  /** Window-boundary literal matched to the event-time column's type.
    * A DATE event-time column on a date-partitioned source/target is
    * THE deployment shape for microbatch at scale (window filters and
    * the pipeline's slice guard prune straight to the window's
    * partitions) — but comparing a DATE column against a TIMESTAMP
    * literal makes Spark cast the column, and a cast(dt AS TIMESTAMP)
    * >= lit predicate does NOT partition-prune: the scan reads every
    * partition each window (measured: the windowed growth rehearsal's
    * per-window cost grew ~1.5× under a 10× corpus from exactly
    * this). Day-or-coarser windows are midnight-aligned, so the DATE
    * literal is exact; sub-day boundaries (degenerate over a DATE
    * column anyway) keep the timestamp literal and its cast
    * semantics. The midnight check and the derived calendar date use
    * UTC — the SAME zone [[batches]] aligns every window boundary to —
    * never the JVM default (a box whose JVM zone differs would disagree
    * by up to a day about which literal form is chosen) and not the
    * session zone either (day windows are UTC-midnight instants by
    * construction, so a non-UTC session zone would see NO boundary as
    * midnight and silently lose DATE partition pruning on every
    * window). The literal itself is a `LocalDate` (tz-free Catalyst
    * conversion), never a `java.sql.Date` (whose Catalyst conversion
    * re-reads the JVM zone). Note the microbatch engine's DATE
    * semantics are fully coherent under the engine-pinned
    * `spark.sql.session.timeZone = UTC`: the fallback path's
    * cast(dt AS TIMESTAMP) reads the session zone, and only UTC makes
    * it agree with the UTC-aligned windows. */
  private[mat] def etBound(df: org.apache.spark.sql.DataFrame, et: String,
      t: java.sql.Timestamp): org.apache.spark.sql.Column =
    df.schema.fields.find(_.name == et).map(_.dataType) match {
      case Some(org.apache.spark.sql.types.DateType) =>
        val ldt = t.toInstant.atZone(java.time.ZoneOffset.UTC)
          .toLocalDateTime
        if (ldt.toLocalTime == java.time.LocalTime.MIDNIGHT)
          lit(ldt.toLocalDate)
        else lit(t)
      case _ => lit(t)
    }

  def batches(begin: java.sql.Timestamp, end: java.sql.Timestamp,
      size: BatchSize, lookback: Int,
      lastRunEnd: Option[java.sql.Timestamp]): Seq[Batch] = {
    import java.time._
    val zone = ZoneOffset.UTC
    def truncate(t: Instant): Instant = {
      val z = t.atZone(zone)
      (size match {
        case BatchSize.Hour => z.truncatedTo(temporal.ChronoUnit.HOURS)
        case BatchSize.Day => z.truncatedTo(temporal.ChronoUnit.DAYS)
        case BatchSize.Month => z.truncatedTo(temporal.ChronoUnit.DAYS).withDayOfMonth(1)
        case BatchSize.Year => z.truncatedTo(temporal.ChronoUnit.DAYS).withDayOfYear(1)
      }).toInstant
    }
    def next(t: Instant): Instant = {
      val z = t.atZone(zone)
      (size match {
        case BatchSize.Hour => z.plusHours(1)
        case BatchSize.Day => z.plusDays(1)
        case BatchSize.Month => z.plusMonths(1)
        case BatchSize.Year => z.plusYears(1)
      }).toInstant
    }
    // Start from `begin` on the first run; later runs restart `lookback`
    // batches before the last processed end, catching late arrivals.
    val rawStart = lastRunEnd match {
      case Some(prev) =>
        var s = truncate(prev.toInstant)
        (1 to lookback).foreach(_ => s = truncate(s.minusNanos(1)))
        if (s.isBefore(begin.toInstant)) begin.toInstant else s
      case None => begin.toInstant
    }
    var cur = truncate(rawStart)
    val out = Seq.newBuilder[Batch]
    while (cur.isBefore(end.toInstant)) {
      val nxt = next(cur)
      out += Batch(java.sql.Timestamp.from(cur), java.sql.Timestamp.from(nxt))
      cur = nxt
    }
    out.result()
  }

  def run(ctx: MatContext, lastRunEnd: Option[java.sql.Timestamp] = None): MatResult = {
    val cfg = ctx.config
    val eventTime = cfg.eventTime.getOrElse(
      throw new IllegalArgumentException("microbatch requires event_time"))
    val size = cfg.batchSize.getOrElse(BatchSize.Day)
    val begin = cfg.begin.map(java.sql.Timestamp.valueOf)
      .getOrElse(new java.sql.Timestamp(0L))
    val target = ctx.target
    val adapter = ctx.adapter

    val bs = batches(begin, ctx.now, size, cfg.lookback, lastRunEnd)
    def processBatch(b: Batch): Unit = {
      // Prefer the window-compiled form: upstream scans prune to the batch.
      // The output filter stays on as the semantic guard either way (cheap —
      // it sits above already-pruned scans).
      val compiled = ctx.compiledBatch.fold(ctx.compiled())(f => f(b.start, b.end))
      // type-matched boundary literals: a DATE event-time column keeps
      // partition pruning on date-partitioned sources (see etBound)
      val batchDf = compiled
        .filter(col(eventTime) >= etBound(compiled, eventTime, b.start) &&
          col(eventTime) < etBound(compiled, eventTime, b.end))
      if (!adapter.relationExists(target)) {
        adapter.writeTableAtomic(batchDf, target, cfg.partitionBy)
      } else if (cfg.partitionBy.nonEmpty) {
        adapter.insertOverwritePartitions(batchDf, target)
      } else {
        val tgt = adapter.read(target)
        val kept = tgt.filter(!(col(eventTime) >= etBound(tgt, eventTime, b.start) &&
          col(eventTime) < etBound(tgt, eventTime, b.end)))
        adapter.writeTableAtomic(kept.unionByName(batchDf), target, Nil)
      }
    }
    // concurrent_batches (reference: model_config.rs:99-102): batches are
    // independent when each lands in its own partitions via dynamic
    // partition overwrite, so they may run in parallel. Only honored on a
    // PARTITIONED target (the unpartitioned path is read-modify-write —
    // racing it would lose batches); the first batch always runs alone so
    // exactly one writer creates the table.
    val concurrent = cfg.concurrentBatches && cfg.partitionBy.nonEmpty
    if (!concurrent) bs.foreach(processBatch)
    else {
      val (head, rest) =
        if (!adapter.relationExists(target)) (bs.take(1), bs.drop(1))
        else (Seq.empty[Batch], bs)
      head.foreach(processBatch)
      if (rest.nonEmpty) {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(4, rest.length))
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        try Await.result(
          Future.sequence(rest.map(b => Future(processBatch(b)))), Duration.Inf)
        finally pool.shutdown()
      }
    }
    MatResult(target, "success",
      s"microbatch: ${bs.length} batches of ${size.name}" +
        (if (concurrent) " (concurrent)" else "") +
        (if (cfg.partitionBy.isEmpty && bs.nonEmpty)
          " (unpartitioned fallback: full rewrite per batch — set partition_by for scale)"
        else ""))
  }
}
