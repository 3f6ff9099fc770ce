package graft.adapter

import graft.core.{Relation, RelationType}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import java.nio.file.{Files, Paths}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Warehouse adapter backed by Spark's session catalog.
  *
  * The reference's `BaseAdapter` (crates/dbt-adapter/src/base_adapter.rs,
  * Jinja dispatch crates/dbt-adapter/src/funcs.rs:43-1056) fronts a remote
  * warehouse over ADBC; here Spark IS the warehouse, so every operation
  * collapses to `spark.catalog` / `spark.sql` calls:
  *
  *   - execute/add_query            → spark.sql + collected AgateTable
  *   - get_relation/list_relations  → spark.catalog.tableExists/listTables
  *   - create/drop_schema           → CREATE/DROP DATABASE
  *   - drop/truncate/rename         → DROP TABLE, TRUNCATE, ALTER RENAME
  *   - get_columns_in_relation      → spark.table(fqn).schema
  *   - get_column_schema_from_query → spark.sql(sql).schema (analysis only)
  *
  * Each engine instance owns one database (schema) created at an explicit
  * LOCATION so parallel runs are isolated inside the shared local session.
  * A relation metadata cache mirrors the reference's
  * (crates/dbt-adapter/src/cache.rs:68-213) — invalidated on DDL.
  */
class SparkAdapter(val spark: SparkSession, val defaultSchema: String,
    val location: Option[String] = None) {

  /** relation-key → relation type; avoids repeated catalog round-trips on
    * many-node runs (reference cache.rs:68). */
  private val relationCache = TrieMap.empty[String, RelationType]

  /** Offline replay (reference record_and_replay.rs + the harness in
    * crates/dbt-test-utils/src/task/record_and_replay.rs): the reference
    * re-executes a recorded run with NO warehouse — read queries are
    * served from the recording and writes never happen. Spark-native
    * framing: with `spark.graft.replay.offline=true` the adapter keeps
    * the CONTROL plane live (schemas, views, comments — catalog-only
    * metadata, needed so downstream models still ANALYZE) but never
    * touches the DATA plane: table writes materialize schema-only empty
    * tables, appends/overwrites no-op after logging, and read statements
    * are served from the [[QueryCache]] recording (a miss returns an
    * empty table with a warning instead of executing). Combined with
    * `spark.graft.queryCache.mode=replay` + InteractionLog verify, a
    * recorded project re-runs end-to-end with zero live table scans. */
  private def offlineReplay: Boolean =
    spark.conf.getOption(SparkAdapter.OfflineKey).contains("true")

  /** Statements that would move rows if executed — skipped in offline
    * replay (judged on the normalized text, same as cacheability).
    * CREATE VIEW (even `... AS SELECT`) is catalog-only and stays live;
    * a raw-SQL CTAS is data-plane and is skipped WITHOUT a schema-only
    * stand-in (unlike the writer() path, execute() has no analyzed
    * DataFrame to take a schema from) — a recorded hook that CTAS-es a
    * table and then references it later is outside the offline
    * contract; the engine's own materializations never issue raw CTAS.
    *
    * The CTAS test is deliberately BROAD: any non-view CREATE carrying
    * an `AS` clause counts — `AS SELECT`, `AS WITH ...`, `AS TABLE`,
    * `AS VALUES`, with or without a space before `(` — because the
    * failure modes are asymmetric: skipping a catalog-only CREATE that
    * merely LOOKS like CTAS (e.g. a generated-column definition) loses
    * nothing offline (reads are cache-served anyway), while executing
    * an unrecognized CTAS live scans and writes the data plane,
    * silently breaking the zero-live-scans contract. */
  private def dataPlaneStmt(stmt: String): Boolean = {
    val norm = QueryCache.normalize(stmt)
    val head = norm.takeWhile(!_.isWhitespace)
    Set("insert", "update", "delete", "merge", "truncate", "load", "copy")(head) ||
      (head == "create" && !norm.contains(" view ") &&
        (norm.contains(" as ") || norm.contains(" as(")))
  }

  createSchema(defaultSchema)

  // ---- schema (database) ops -------------------------------------------

  def createSchema(schema: String): Unit = {
    InteractionLog.log(spark, "create_schema", schema)
    val loc = location.map(l => s" LOCATION '$l/$schema'").getOrElse("")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$schema`$loc")
    recoverTables(schema)
  }

  /** Cross-session recovery: the in-memory catalog forgets tables between
    * JVMs while their parquet directories persist under the database
    * location. Re-register any table directory the catalog doesn't know
    * (as an external parquet table) so incremental runs and --defer work
    * across engine invocations. Views are re-created by their own nodes on
    * the next run (metadata-only, cheap). */
  def recoverTables(schema: String): Unit = {
    import scala.util.Try
    val locUri = Try(spark.catalog.getDatabase(schema).locationUri).getOrElse(return)
    val dir = Try(java.nio.file.Paths.get(new java.net.URI(locUri)))
      .orElse(Try(java.nio.file.Paths.get(locUri))).getOrElse(return)
    if (!Files.isDirectory(dir)) return
    Files.list(dir).iterator().asScala
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString)
      .filterNot(n => n.startsWith(".") || n.startsWith("_") ||
        n.endsWith("__dbt_tmp") || n.endsWith("__dbt_backup"))
      .foreach { name =>
        val fqn = s"`$schema`.`$name`"
        if (!spark.catalog.tableExists(s"$schema.$name")) {
          Try {
            spark.sql(s"CREATE TABLE $fqn USING parquet LOCATION '${dir.resolve(name)}'")
            // restore partition metadata when the layout is partitioned
            Try(spark.sql(s"MSCK REPAIR TABLE $fqn"))
          }
        }
      }
  }

  def dropSchema(schema: String): Unit = {
    InteractionLog.log(spark, "drop_schema", schema)
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    relationCache.filterInPlace((k, _) => !k.startsWith(schema + "."))
  }

  def listSchemas(): Seq[String] =
    spark.catalog.listDatabases().collect().map(_.name).toSeq

  def checkSchemaExists(schema: String): Boolean =
    spark.catalog.databaseExists(schema)

  // ---- relation ops -----------------------------------------------------

  def getRelation(schema: String, identifier: String): Option[Relation] = {
    val key = s"$schema.$identifier"
    relationCache.get(key) match {
      case Some(t) => Some(Relation(schema, identifier).withType(t))
      case None =>
        if (!spark.catalog.tableExists(key)) None
        else {
          val t = spark.catalog.getTable(key).tableType match {
            case "VIEW" => RelationType.View
            case _ => RelationType.Table
          }
          relationCache.put(key, t)
          Some(Relation(schema, identifier).withType(t))
        }
    }
  }

  def relationExists(rel: Relation): Boolean =
    getRelation(rel.schema, rel.identifier).isDefined

  def listRelationsWithoutCaching(schema: String): Seq[Relation] =
    if (!checkSchemaExists(schema)) Nil
    else spark.catalog.listTables(schema).collect().toSeq.map { t =>
      Relation(schema, t.name).withType(
        if (t.tableType == "VIEW") RelationType.View else RelationType.Table)
    }

  /** get_relations_by_pattern (reference funcs.rs:474). */
  def getRelationsByPattern(schema: String, pattern: String): Seq[Relation] = {
    val re = pattern.replace("%", ".*").r
    listRelationsWithoutCaching(schema).filter(r => re.matches(r.identifier))
  }

  def dropRelation(rel: Relation): Unit = {
    InteractionLog.log(spark, "drop_relation", rel.fqn)
    spark.sql(s"DROP TABLE IF EXISTS ${rel.fqn}")
    spark.sql(s"DROP VIEW IF EXISTS ${rel.fqn}")
    relationCache.remove(rel.key)
  }

  def truncateRelation(rel: Relation): Unit = {
    InteractionLog.log(spark, "truncate", rel.fqn)
    spark.sql(s"TRUNCATE TABLE ${rel.fqn}")
  }

  def renameRelation(from: Relation, to: Relation): Unit = {
    InteractionLog.log(spark, "rename", s"${from.fqn} -> ${to.fqn}")
    spark.sql(s"ALTER TABLE ${from.fqn} RENAME TO ${to.fqn}")
    // Renaming a managed PARTITIONED table moves the root directory but
    // leaves per-partition catalog locations pointing at the old root.
    // Left stale, a scan reads 0 rows — and worse, dropping this table
    // later purges those stale locations, which by then may hold ANOTHER
    // table's data (the staged-swap protocol renames tmp into the old
    // root: dropping the backup then deleted the just-swapped-in data).
    // SYNC drops entries whose directory vanished and discovers the
    // moved ones under the new root.
    if (tableMeta(to).toOption.exists(_.partitionColumnNames.nonEmpty))
      spark.sql(s"MSCK REPAIR TABLE ${to.fqn} SYNC PARTITIONS")
    relationCache.remove(from.key)
    relationCache.remove(to.key)
  }

  // ---- column ops -------------------------------------------------------

  def getColumnsInRelation(rel: Relation): StructType =
    spark.table(rel.fqn).schema

  /** Schema of a query WITHOUT executing it — analyzed plan only
    * (reference funcs.rs:802 get_column_schema_from_query). */
  def getColumnSchemaFromQuery(sql: String): StructType =
    spark.sql(sql).schema

  /** Columns present in `source` but missing from `target`
    * (reference base_adapter.rs:693 get_missing_columns). */
  def getMissingColumns(source: Relation, target: Relation): Seq[String] = {
    val tgt = getColumnsInRelation(target).fieldNames.toSet
    getColumnsInRelation(source).fieldNames.filterNot(tgt).toSeq
  }

  /** ALTER TABLE ADD COLUMNS for schema drift. */
  def addColumns(rel: Relation, cols: StructType): Unit =
    if (cols.nonEmpty) {
      val ddl = cols.fields
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      InteractionLog.log(spark, "add_columns", s"${rel.fqn} ($ddl)")
      spark.sql(s"ALTER TABLE ${rel.fqn} ADD COLUMNS ($ddl)")
    }

  /** The type the target column must widen to so incoming values fit, or
    * None when it already fits. Same-family widening only — integral chain,
    * float→double, decimal precision/scale growth — never narrowing or
    * cross-family (reference base_adapter.rs:504 expand_target_column_types;
    * warehouses widen varchar sizes, Spark strings are unbounded). */
  private[graft] def widerType(target: org.apache.spark.sql.types.DataType,
      incoming: org.apache.spark.sql.types.DataType): Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    val integral: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType)
    (target, incoming) match {
      case (a, b) if a == b => None
      case (a: DecimalType, b: DecimalType) =>
        val intDigits = math.max(a.precision - a.scale, b.precision - b.scale)
        val s = math.max(a.scale, b.scale)
        val w = DecimalType(math.min(38, intDigits + s), s)
        if (w == a) None else Some(w)
      case (FloatType, DoubleType) => Some(DoubleType)
      case (a, b) if integral.contains(a) && integral.contains(b) =>
        if (integral.indexOf(b) > integral.indexOf(a)) Some(b) else None
      case _ => None
    }
  }

  /** Widen target column types so the incoming frame's values fit —
    * dbt's expand_target_column_types, called before every incremental DML
    * (MA/materializations/models/incremental/incremental.sql:37).
    * Spark can't ALTER a parquet column's type in place, so a widen is a
    * cast-rewrite of the target — acceptable because type expansion is a
    * rare one-off schema migration, not a per-run cost. */
  def expandTargetColumnTypes(incoming: StructType, rel: Relation,
      partitionBy: Seq[String] = Nil): Unit = {
    val tgt = getColumnsInRelation(rel)
    val widened = tgt.fields.map { f =>
      incoming.fields.find(_.name == f.name)
        .flatMap(s => widerType(f.dataType, s.dataType))
        .map(w => f.copy(dataType = w)).getOrElse(f)
    }
    if (!widened.sameElements(tgt.fields)) {
      val casted = read(rel).select(widened.map(f =>
        org.apache.spark.sql.functions.col(s"`${f.name}`")
          .cast(f.dataType).as(f.name)).toIndexedSeq: _*)
      writeTableAtomic(casted, rel, partitionBy)
    }
  }

  // ---- execution --------------------------------------------------------

  /** Split a multi-statement script on top-level semicolons (reference
    * crates/dbt-adapter/src/stmt_splitter.rs). */
  def splitStatements(sql: String): Seq[String] = SqlSplitter.split(sql)

  /** Run SQL (possibly multi-statement); returns the last statement's
    * status + a small collected result table (reference funcs.rs:52
    * `execute` → base_adapter.rs:367). */
  def execute(sql: String, fetch: Boolean = true): (String, AgateTable) = {
    val stmts = splitStatements(sql)
    val cacheMode = QueryCache.mode(spark)
    var last: (String, AgateTable) = ("OK", AgateTable.empty)
    stmts.foreach { stmt =>
      // replay: serve recorded read-query results without executing
      // (record_and_replay test infra, query_cache.rs:310-384); DDL/DML
      // always runs live. A replay miss executes live with a warning.
      val offline = offlineReplay
      val replayed =
        if ((cacheMode == "replay" || offline) && fetch)
          QueryCache.lookup(spark, stmt)
        else None
      last = replayed match {
        case Some(t) => ("OK (replayed)", t)
        case None if offline && dataPlaneStmt(stmt) =>
          // offline: DML would move rows — the recording already proved
          // the statement; log it (below) and skip the side effect
          ("OK (offline skip)", AgateTable.empty)
        case None if offline && fetch && QueryCache.cacheable(stmt) =>
          // offline: a read the recording doesn't contain must NOT fall
          // through to a live scan — that's the whole contract
          System.err.println(s"[query-cache] OFFLINE miss, returning empty: " +
            stmt.linesIterator.next().take(120))
          ("OK (offline miss)", AgateTable.empty)
        case None =>
          if (cacheMode == "replay" && fetch && QueryCache.cacheable(stmt))
            System.err.println(s"[query-cache] replay MISS, executing live: " +
              stmt.linesIterator.next().take(120))
          val df = spark.sql(stmt)
          if (fetch && df.schema.nonEmpty) {
            val t = AgateTable.fromDataFrame(df)
            if (cacheMode == "record") QueryCache.record(spark, stmt, t)
            ("OK", t)
          } else ("OK", AgateTable.empty)
      }
      InteractionLog.log(spark, "execute", stmt,
        if (fetch && last._2.numColumns > 0)
          Some(InteractionLog.tableHash(last._2))
        else None)
    }
    last
  }

  /** Retry transient failures with backoff (reference
    * adapter_engine.rs:689 execute_query_with_retry). */
  def executeWithRetry[T](retries: Int = 2, backoffMs: Long = 200)(f: => T): T = {
    var attempt = 0
    var delay = backoffMs
    while (true) {
      try return f
      catch {
        case NonFatal(e) if attempt < retries =>
          attempt += 1
          Thread.sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Cancellation: run `f` under a job group that `cancel(tag)` kills
    * (reference crates/dbt-cancel/). */
  def withJobGroup[T](tag: String)(f: => T): T = {
    spark.sparkContext.setJobGroup(tag, tag, interruptOnCancel = true)
    try f finally spark.sparkContext.clearJobGroup()
  }

  def cancel(tag: String): Unit = spark.sparkContext.cancelJobGroup(tag)

  /** Table compaction — the small-files maintenance op (Delta OPTIMIZE /
    * Iceberg rewrite_data_files on plain parquet): rewrite each partition
    * into ~targetFiles files via the atomic swap. Incremental appends and
    * streaming sinks accrete small files; at 100 TB unbounded file counts
    * dominate scan/listing cost, so compaction is a first-class
    * maintenance op (exposed to projects via run-operation and wired into
    * the durable-curate drain). LAYOUT IS PRESERVED, not an argument the
    * caller may get wrong: the partition spec and bucket spec come from
    * the CATALOG (the authoritative record of how the table is laid out —
    * a forgotten partition_by must not silently rewrite a partitioned
    * table flat); a caller-supplied `partitionBy` is a cross-check,
    * refused by name on mismatch. sort_by/zorder_by are write-time-only
    * layout the catalog cannot recover — callers that know them (the
    * curate drain knows its model config) pass them through. File counts
    * are metadata-only (`inputFiles` listing), never a scan. Returns
    * (filesBefore, filesAfter). */
  def compact(rel: Relation, partitionBy: Seq[String] = Nil,
      targetFiles: Int = 1, sortBy: Seq[String] = Nil,
      zorderBy: Seq[String] = Nil, layoutCurve: String = "morton")
      : (Long, Long) = {
    require(Set("morton", "hilbert")(layoutCurve),
      s"layout_curve must be morton or hilbert: $layoutCurve")
    val meta = tableMeta(rel).getOrElse(throw new IllegalArgumentException(
      s"compact: ${rel.fqn} is not a catalog table"))
    val catalogParts = meta.partitionColumnNames
    // case-insensitive cross-check, like every column resolution on the
    // analysis path — a case variant Spark itself would resolve must
    // not read as a layout mismatch
    if (partitionBy.nonEmpty &&
        partitionBy.map(_.toLowerCase) != catalogParts.map(_.toLowerCase))
      throw new IllegalArgumentException(
        s"compact: ${rel.fqn} is partitioned by " +
          s"[${catalogParts.mkString(", ")}] but the call named " +
          s"[${partitionBy.mkString(", ")}] — compaction preserves " +
          "layout, it never changes it; drop the argument (the catalog " +
          "is authoritative) or fix it")
    val parts = catalogParts
    val bucketSpec = meta.bucketSpec
    // the STORAGE FORMAT is layout too: the rewrite must write the
    // catalog's own provider, never the parquet default — an ORC model
    // compacted via run-operation silently converting to parquet would
    // break every reader that names the format. Providers outside the
    // engine's write set (hive, delta, text, ...) refuse by name.
    val storageFmt = meta.provider.map(_.toLowerCase).getOrElse("parquet")
    if (!SparkAdapter.WritableFormats(storageFmt))
      throw new IllegalArgumentException(
        s"compact: ${rel.fqn} uses table provider '$storageFmt' — only " +
          s"${SparkAdapter.WritableFormats.toSeq.sorted.mkString("/")} " +
          "tables can be compacted (the rewrite preserves the storage " +
          "format, and this one is outside the engine's write set)")
    // format OPTIONS are layout too (csv header/sep, a pinned
    // compression codec): the rewrite must carry them or external
    // readers that name them misparse every rewritten file. `path` is
    // stripped CASE-INSENSITIVELY (the catalog stores option keys
    // verbatim but the writer resolves them case-insensitively, so a
    // surviving `PATH` would redirect the staged write onto the live
    // location — which the external-swap branch then deletes).
    val storageOpts = meta.storage.properties
      .filterNot(_._1.equalsIgnoreCase("path"))
    def fileCount: Long = read(rel).inputFiles.length.toLong
    val before = fileCount
    val df = read(rel)
    import org.apache.spark.sql.functions.{col, rand}
    def cols(names: Seq[String]) = names.map(c => col(s"`$c`"))
    // The partitioning of `compacted` IS the file-count contract:
    // writeTableAtomic must receive it pre-shaped and add no shuffle of
    // its own (sort/zorder are therefore applied HERE with an explicit
    // task count, never forwarded — its sortBy branch re-shuffles at
    // spark.sql.shuffle.partitions, which would un-compact the write).
    val totalFiles = (math.max(1, targetFiles).toLong *
      (if (parts.isEmpty) 1L else math.max(1L, partitionCount(rel))))
      .min(Int.MaxValue.toLong).toInt
    val compacted =
      if (bucketSpec.isDefined) {
        // bucketed layout: one task per bucket → bucketBy writes exactly
        // one file per bucket (per partition value); targetFiles is
        // moot — the bucket count IS the file-count contract. A plain
        // repartition(n) here would write ~n files PER BUCKET. The read
        // goes through the RAW data files, not the catalog relation: a
        // catalog read of a bucketed table lets the planner judge the
        // bucket-aligning repartition redundant and ELIDE it (measured:
        // the write then fans out per scan-task per bucket — 7 files
        // from a 4-bucket table), while the raw read carries no
        // partitioning claim, so the exchange survives. basePath keeps
        // partition-directory columns for partitioned+bucketed tables
        // (the key-index seal's own technique).
        val bs = bucketSpec.get
        val rawReader = spark.read.schema(df.schema).format(storageFmt)
          .options(storageOpts)
        val raw = scala.util.Try(meta.location.toString).toOption
          .foldLeft(rawReader)((r, bp) => r.option("basePath", bp))
          .load(df.inputFiles.toIndexedSeq: _*)
        raw.repartition(bs.numBuckets, cols(bs.bucketColumnNames): _*)
      } else if (zorderBy.nonEmpty) {
        // curve layout at the compacted task count, PREFIXED by the
        // partition columns (like the sortBy branch below): the curve
        // key alone would scatter each partition value across every
        // task, and the partitioned write would then fan out to
        // tasks × values files — the compaction would GROW the file
        // count and trip the post-compaction threshold check after
        // paying the full rewrite. Range-partitioning on
        // (partition cols, curve key) clusters each value's rows into
        // ~targetFiles contiguous curve spans instead.
        val (withKey, keyCol) =
          graft.ops.Zorder.withCurveKey(df, zorderBy, layoutCurve)
        val keys = cols(parts) :+ col(keyCol)
        withKey.repartitionByRange(totalFiles, keys: _*)
          .sortWithinPartitions(keys: _*)
          .drop(keyCol)
      } else if (sortBy.nonEmpty) {
        // clustering layout at the compacted task count: range-partition
        // on (partition cols, sort keys) so each partition value's rows
        // cluster into ~targetFiles contiguous sorted ranges
        val keys = cols(parts ++ sortBy)
        df.repartitionByRange(totalFiles, keys: _*)
          .sortWithinPartitions(keys: _*)
      } else if (parts.nonEmpty) {
        // repartition by (partition cols, salt): each partition-value's
        // rows spread over ~targetFiles tasks → ~targetFiles files per
        // partition, and the rewrite parallelizes across partitions
        // (repartition(n, partCols) alone would funnel each whole
        // partition-value through a single task)
        val salted = df.withColumn("__graft_compact_salt",
          (rand(42) * targetFiles).cast("int"))
        salted.repartition((cols(parts) :+
          col("__graft_compact_salt")): _*)
          .drop("__graft_compact_salt")
      } else df.repartition(targetFiles)
    writeTableAtomic(compacted, rel, parts,
      clusteredBy = bucketSpec.map(_.bucketColumnNames).getOrElse(Nil),
      buckets = bucketSpec.map(_.numBuckets).getOrElse(0),
      fileFormat = storageFmt,
      bucketSortBy = bucketSpec.map(_.sortColumnNames).getOrElse(Nil),
      formatOptions = storageOpts)
    (before, fileCount)
  }

  // ---- writes (staged-swap protocol) ------------------------------------

  /** CTAS with the reference's intermediate/backup/rename swap
    * (dbt-adapters/macros/materializations/models/table.sql:1-64): write to
    * `__dbt_tmp`, move current to `__dbt_backup`, rename tmp into place,
    * drop backup. Readers of the current table see either old or new. */
  def writeTableAtomic(df: DataFrame, rel: Relation,
      partitionBy: Seq[String] = Nil, sortBy: Seq[String] = Nil,
      clusteredBy: Seq[String] = Nil, buckets: Int = 0,
      zorderBy: Seq[String] = Nil, layoutCurve: String = "morton",
      fileFormat: String = "parquet",
      bucketSortBy: Seq[String] = Nil,
      formatOptions: Map[String, String] = Map.empty): Unit = {
    require(Set("morton", "hilbert")(layoutCurve),
      s"layout_curve must be morton or hilbert: $layoutCurve")
    require(SparkAdapter.WritableFormats(fileFormat),
      s"file_format must be ${SparkAdapter.WritableFormats.toSeq.sorted
        .mkString("/")}: $fileFormat")
    InteractionLog.log(spark, "write_table",
      s"${rel.fqn} schema=${df.schema.simpleString}" +
        (if (partitionBy.nonEmpty) s" partitionBy=${partitionBy.mkString(",")}" else "") +
        (if (sortBy.nonEmpty) s" sortBy=${sortBy.mkString(",")}" else "") +
        (if (clusteredBy.nonEmpty) s" clusteredBy=${clusteredBy.mkString(",")} buckets=$buckets" else "") +
        (if (zorderBy.nonEmpty) s" zorderBy=${zorderBy.mkString(",")} curve=$layoutCurve" else ""))
    val offline = offlineReplay
    // zorder_by: Morton-curve layout (multi-dimensional skipping) wins
    // over sort_by; sort_by clustering: range-repartition on the sort
    // keys, then sort within each task — every output file covers a
    // DISJOINT key range and is internally ordered, so parquet row-group
    // min/max stats prune selective scans to a handful of files (the
    // warehouse clustering-key layout). One range shuffle per build.
    val sorted =
      if (zorderBy.nonEmpty && layoutCurve == "hilbert")
        graft.ops.Zorder.layoutHilbert(df, zorderBy)
      else if (zorderBy.nonEmpty) graft.ops.Zorder.layout(df, zorderBy)
      else if (sortBy.isEmpty) df
      else {
        val keys = sortBy.map(c =>
          org.apache.spark.sql.functions.col(s"`$c`"))
        df.repartitionByRange(keys: _*).sortWithinPartitions(keys: _*)
      }
    def writer(target: Relation): Unit = {
      if (offline) {
        // offline replay: materialize SCHEMA-ONLY (downstream models
        // must still analyze their refs) but move no rows — `sorted`
        // stays a lazy plan, no job ever runs; df.schema is
        // analysis-time metadata. Everything AROUND the write (the
        // intermediate/backup/rename swap protocol and its interaction
        // log entries) runs unchanged, so verify mode still diffs the
        // full protocol against the recording.
        val partDdl =
          if (partitionBy.isEmpty) ""
          else s" PARTITIONED BY (${partitionBy.map(c => s"`$c`").mkString(", ")})"
        // formatOptions must reach the replayed catalog entry too, or a
        // replayed compact of an optioned table (csv header/sep, codec)
        // diverges from the recorded run's metadata
        def q1(s: String) = "'" + s.replace("'", "''") + "'"
        val optDdl =
          if (formatOptions.isEmpty) ""
          else formatOptions.toSeq.sortBy(_._1)
            .map { case (k, v) => s"${q1(k)} ${q1(v)}" }
            .mkString(" OPTIONS (", ", ", ")")
        spark.sql(
          s"CREATE TABLE ${target.fqn} (${df.schema.toDDL}) " +
            s"USING $fileFormat$optDdl$partDdl")
        relationCache.put(target.key, RelationType.Table)
        return
      }
      val w0 = sorted.write.format(fileFormat).options(formatOptions)
      val w1 = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
      // clustered_by + buckets → Spark bucketed table: same-key same-count
      // bucketed sides join without exchanges (bucket spec survives the
      // staged-swap rename — it lives in the catalog entry being renamed)
      val w2 =
        if (clusteredBy.nonEmpty && buckets > 0)
          w1.bucketBy(buckets, clusteredBy.head, clusteredBy.tail: _*)
        else w1
      // SORTED BY on a bucketed table (per-bucket-file ordering — the
      // writer sorts inside each bucket): graft never declares it, but
      // compact meets it on recovered external tables and must carry
      // it through — layout preservation is the contract
      val w3 =
        if (bucketSortBy.nonEmpty && clusteredBy.nonEmpty && buckets > 0)
          w2.sortBy(bucketSortBy.head, bucketSortBy.tail: _*)
        else w2
      w3.saveAsTable(target.fqn)
    }
    if (!relationExists(rel)) {
      // First build: nothing to protect, create in place (same as the
      // reference's CTAS fast path when no existing relation).
      dropRelation(rel.intermediate)
      writer(rel)
    } else if (isExternal(rel)) {
      // Recovered (external) tables: RENAME moves only metadata, so the
      // full swap protocol would collide with the old files. Replace by
      // delete — but stage the WRITE first: the incoming plan may scan
      // the target itself (compact rewrites a table from its own rows),
      // and a drop-then-write order would execute that scan against a
      // table already gone. Write to the managed intermediate while the
      // source is still alive, then drop metadata + old directory and
      // rename the staged table into place (metadata + managed-dir
      // move, no second data write).
      val tmp = rel.intermediate
      dropRelation(tmp)
      writer(tmp)
      val loc = tableLocation(rel)
      dropRelation(rel)
      loc.foreach(deleteRecursively)
      renameRelation(tmp, rel)
    } else {
      val tmp = rel.intermediate
      val bak = rel.backup
      dropRelation(tmp)
      writer(tmp)
      dropRelation(bak)
      renameRelation(rel, bak)   // partition sync happens inside the rename
      renameRelation(tmp, rel)
      dropRelation(bak)
    }
    relationCache.put(rel.key, RelationType.Table)
    // The staged swap replaces the table's BYTES behind its unchanged
    // name, and ALTER TABLE RENAME only uncaches when the TABLE ITSELF
    // is cached — a cached DERIVED plan (e.g. a .cache()'d projection
    // over the old scan) survives the swap and silently serves the
    // PRE-swap rows to any later identical plan. Cascade-UNCACHE by
    // name (refreshTable would eagerly recompute the stale entries
    // from their pre-swap file listings → FileNotFound); the next
    // identical query re-resolves fresh. (Found by the
    // --empty-then---full-refresh fuzzy sequence: the empty run cached
    // an empty gram explode over the state table, and the refreshed
    // rebuild read zero grams through it.)
    if (!offlineReplay)
      org.apache.spark.sql.GraftSqlBridge.uncacheDependents(spark,
        rel.schema, rel.identifier)
  }

  /** Append rows (incremental `append` / merge tail). */
  def appendToTable(df: DataFrame, rel: Relation): Unit = {
    InteractionLog.log(spark, "append",
      s"${rel.fqn} schema=${df.schema.simpleString}")
    if (offlineReplay) return
    // insertInto is positional: align to target column order first.
    val cols = getColumnsInRelation(rel).fieldNames
    df.selectExpr(cols.map(c => s"`$c`").toIndexedSeq: _*)
      .write.mode("append").insertInto(rel.fqn)
  }

  /** Dynamic-partition overwrite — Spark's native insert_overwrite
    * (dbt-spark strategies.sql:1-15 maps to exactly this). */
  def insertOverwritePartitions(df: DataFrame, rel: Relation): Unit = {
    InteractionLog.log(spark, "insert_overwrite",
      s"${rel.fqn} schema=${df.schema.simpleString}")
    if (offlineReplay) return
    // Dynamic mode must come from the SESSION conf (insertInto's
    // self-read/static-overwrite analysis ignores writer options), but a
    // naive set/restore races under concurrent writers (microbatch
    // concurrent_batches): one thread's restore could flip another's
    // in-flight write back to STATIC overwrite — deleting every partition
    // the incoming frame doesn't carry. The guard reference-counts
    // writers: the first entering sets dynamic, only the last leaving
    // restores the previous value.
    SparkAdapter.DynamicOverwriteGuard.enter(spark)
    try {
      val cols = getColumnsInRelation(rel).fieldNames
      df.selectExpr(cols.map(c => s"`$c`").toIndexedSeq: _*)
        .write.mode("overwrite").insertInto(rel.fqn)
    } finally SparkAdapter.DynamicOverwriteGuard.exit(spark)
  }

  /** ALTER TABLE … DROP PARTITION — used by the partition-pruned merge path
    * to clear a touched partition whose rows all vanished (dynamic overwrite
    * only rewrites partitions present in the incoming frame, so an emptied
    * partition would otherwise keep its stale rows). */
  def dropPartition(rel: Relation, spec: Seq[(String, Any)]): Unit = {
    val specSql = spec.map { case (c, v) =>
      val litSql = v match {
        case null => "'__HIVE_DEFAULT_PARTITION__'"
        case n: java.lang.Number => n.toString
        case b: java.lang.Boolean => b.toString
        case other => s"'${other.toString.replace("'", "''")}'"
      }
      s"`$c`=$litSql"
    }.mkString(", ")
    InteractionLog.log(spark, "drop_partition", s"${rel.fqn} ($specSql)")
    spark.sql(s"ALTER TABLE ${rel.fqn} DROP IF EXISTS PARTITION ($specSql)")
  }

  /** Partition-value count from the catalog (metadata only, no file
    * listing); 0 for unpartitioned or non-catalog relations. */
  def partitionCount(rel: Relation): Long =
    scala.util.Try(spark.sessionState.catalog.listPartitionNames(
      org.apache.spark.sql.catalyst.TableIdentifier(
        rel.identifier, Some(rel.schema))).size.toLong).getOrElse(0L)

  private def tableMeta(rel: Relation) =
    scala.util.Try(spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(rel.identifier, Some(rel.schema))))

  private def isExternal(rel: Relation): Boolean =
    tableMeta(rel).toOption.exists(_.tableType ==
      org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL)

  private def tableLocation(rel: Relation): Option[java.nio.file.Path] =
    tableMeta(rel).toOption.flatMap(m =>
      scala.util.Try(java.nio.file.Paths.get(m.location)).toOption)

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    graft.core.FsUtil.deleteRecursively(p)

  /** The relation's storage root URI from the catalog — the `basePath`
    * a raw-file read needs to recover partition-directory columns
    * (durable curate's key-index seal reads target data files
    * directly). */
  def relationLocationUri(rel: Relation): Option[String] =
    tableMeta(rel).toOption.map(_.location.toString)

  /** Table-level comment from the catalog (persist_docs / catalog.json). */
  def tableComment(rel: Relation): Option[String] =
    tableMeta(rel).toOption.flatMap(m =>
      m.comment.orElse(m.properties.get("comment"))).filter(_.nonEmpty)

  def createView(rel: Relation, sql: String): Unit = {
    InteractionLog.log(spark, "create_view", s"${rel.fqn} AS $sql")
    spark.sql(s"CREATE OR REPLACE VIEW ${rel.fqn} AS $sql")
    relationCache.put(rel.key, RelationType.View)
  }

  def read(rel: Relation): DataFrame = spark.table(rel.fqn)

  // ---- misc parity ops --------------------------------------------------

  def quote(identifier: String): String = s"`$identifier`"

  /** agate/Arrow type string → Spark SQL type (reference funcs.rs:429). */
  def convertType(agateType: String): String = agateType.toLowerCase match {
    case "text" | "string" | "utf8" => "STRING"
    case "integer" | "int64" | "bigint" => "BIGINT"
    case "int32" | "int" => "INT"
    case "float" | "float64" | "double" | "number" => "DOUBLE"
    case "boolean" | "bool" => "BOOLEAN"
    case "date" | "date32" => "DATE"
    case "datetime" | "timestamp" => "TIMESTAMP"
    case t if t.startsWith("decimal") => t.toUpperCase
    case other => other.toUpperCase
  }

  def validIncrementalStrategies: Seq[String] =
    Seq("append", "merge", "delete+insert", "insert_overwrite", "microbatch",
      "replace_where")

  /** Local-filesystem fallback used by tests and freshness metadata. */
  def pathExists(p: String): Boolean = Files.exists(Paths.get(p))
}

object SparkAdapter {
  /** The storage formats the engine can WRITE — one definition shared
    * by writeTableAtomic's validation and compact's preserve-format
    * guard, so the two sets cannot drift. */
  final val WritableFormats: Set[String] =
    Set("parquet", "orc", "json", "csv")

  /** `true` ⇒ offline replay: control plane live, data plane never
    * touched (see [[SparkAdapter.offlineReplay]]). */
  final val OfflineKey = "spark.graft.replay.offline"

  /** Reference-counted session-conf guard for dynamic partition
    * overwrite: every concurrent writer wants the same value, so the
    * first in sets it and the last out restores what preceded the whole
    * burst. State is PER SparkSession (spark.newSession() clones have
    * separate SQLConfs — a global count would skip conf.set on the
    * second session and leave its writes in static mode). */
  private[adapter] object DynamicOverwriteGuard {
    private val Key = "spark.sql.sources.partitionOverwriteMode"
    private final class State { var count = 0; var saved: Option[String] = None }
    private val states =
      new java.util.WeakHashMap[SparkSession, State]()
    private def stateOf(spark: SparkSession): State = {
      val s = states.get(spark)
      if (s != null) s
      else { val n = new State; states.put(spark, n); n }
    }
    def enter(spark: SparkSession): Unit = synchronized {
      val st = stateOf(spark)
      if (st.count == 0) {
        st.saved = spark.conf.getOption(Key)
        spark.conf.set(Key, "dynamic")
      }
      st.count += 1
    }
    def exit(spark: SparkSession): Unit = synchronized {
      val st = stateOf(spark)
      st.count -= 1
      if (st.count == 0) st.saved match {
        case Some(v) => spark.conf.set(Key, v)
        case None => spark.conf.unset(Key)
      }
    }
  }
}
