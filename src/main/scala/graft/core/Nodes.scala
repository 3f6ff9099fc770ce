package graft.core

/** Node graph data model — the Spark-native equivalent of the reference's
  * typed node maps (crates/dbt-schemas/src/schemas/nodes.rs:2100).
  *
  * One sealed trait instead of nine structs: every node kind the engine
  * schedules is a [[Node]]; `dependsOn` edges come from parse-phase
  * ref/source harvesting (SURVEY §3.3).
  */
sealed trait NodeKind { def name: String }
object NodeKind {
  case object Model extends NodeKind { val name = "model" }
  case object Seed extends NodeKind { val name = "seed" }
  case object Snapshot extends NodeKind { val name = "snapshot" }
  case object Test extends NodeKind { val name = "test" }
  case object UnitTest extends NodeKind { val name = "unit_test" }
  case object Source extends NodeKind { val name = "source" }
  case object Function extends NodeKind { val name = "function" }
  case object Exposure extends NodeKind { val name = "exposure" }
  case object Analysis extends NodeKind { val name = "analysis" }
  case object Metric extends NodeKind { val name = "metric" }
  case object SemanticModel extends NodeKind { val name = "semantic_model" }
  /** Semantic-layer saved query (reference DbtSavedQuery,
    * crates/dbt-schemas/src/schemas/manifest/saved_query.rs:18-48):
    * a named metrics/group_by/where/order_by/limit bundle with export
    * targets. Declaration-only like exposures/metrics — never executes;
    * parsed for manifest v12 `saved_queries` and the `saved_query:`
    * selector method (node_selector.rs:72 MethodName::SavedQuery). */
  case object SavedQuery extends NodeKind { val name = "saved_query" }
}

/** Incremental strategy enum (reference: `DbtIncrementalStrategy`,
  * crates/dbt-schemas/src/schemas/common.rs:558-572). */
sealed trait IncrementalStrategy { def name: String }
object IncrementalStrategy {
  case object Append extends IncrementalStrategy { val name = "append" }
  case object Merge extends IncrementalStrategy { val name = "merge" }
  case object DeleteInsert extends IncrementalStrategy { val name = "delete+insert" }
  case object InsertOverwrite extends IncrementalStrategy { val name = "insert_overwrite" }
  case object Microbatch extends IncrementalStrategy { val name = "microbatch" }
  /** Databricks replace_where (reference: crates/dbt-adapter/src/relation/
    * databricks/configs/incremental.rs): atomically replace the
    * predicate-matching slice with the incoming batch. */
  case object ReplaceWhere extends IncrementalStrategy { val name = "replace_where" }
  /** Spark-native partial-aggregate maintenance: the model emits a
    * PARTIAL aggregate of just the new batch and the strategy merges it
    * into the stored aggregate by key with per-column mergeable
    * functions (`aggregate_columns: {col: sum|min|max}`) — so a 100 TB
    * fact table is aggregated once, and each incremental run costs only
    * the new slice plus a state-sized regroup, never a rebuild. */
  case object MergeAggregate extends IncrementalStrategy {
    val name = "merge_aggregate"
  }
  /** User-defined strategy — dispatched to the project's
    * `get_incremental_<name>_sql` macro at run time (reference:
    * DbtIncrementalStrategy::Custom common.rs:572, dispatch
    * base_adapter.rs:339). Unknown names parse here, dbt-style; a missing
    * macro errors when the strategy executes. */
  final case class Custom(customName: String) extends IncrementalStrategy {
    val name = customName
  }

  def parse(s: String): IncrementalStrategy = s match {
    case "append" => Append
    case "merge" => Merge
    case "delete+insert" => DeleteInsert
    case "insert_overwrite" => InsertOverwrite
    case "microbatch" => Microbatch
    case "replace_where" => ReplaceWhere
    case "merge_aggregate" => MergeAggregate
    case other => Custom(other)
  }
}

/** on_schema_change behavior (reference: common.rs:583-591). */
sealed trait OnSchemaChange { def name: String }
object OnSchemaChange {
  case object Ignore extends OnSchemaChange { val name = "ignore" }
  case object AppendNewColumns extends OnSchemaChange { val name = "append_new_columns" }
  case object Fail extends OnSchemaChange { val name = "fail" }
  case object SyncAllColumns extends OnSchemaChange { val name = "sync_all_columns" }

  def parse(s: String): OnSchemaChange = s match {
    case "ignore" => Ignore
    case "append_new_columns" => AppendNewColumns
    case "fail" => Fail
    case "sync_all_columns" => SyncAllColumns
    case other => throw new IllegalArgumentException(s"unknown on_schema_change: $other")
  }
}

/** hard_deletes behavior for snapshots (reference: common.rs:613-620). */
sealed trait HardDeletes { def name: String }
object HardDeletes {
  case object IgnoreDeletes extends HardDeletes { val name = "ignore" }
  case object Invalidate extends HardDeletes { val name = "invalidate" }
  case object NewRecord extends HardDeletes { val name = "new_record" }

  def parse(s: String): HardDeletes = s match {
    case "ignore" => IgnoreDeletes
    case "invalidate" => Invalidate
    case "new_record" => NewRecord
    case other => throw new IllegalArgumentException(s"unknown hard_deletes: $other")
  }
}

/** Microbatch batch granularity (reference: `DbtBatchSize`, common.rs:523-529). */
sealed trait BatchSize { def name: String }
object BatchSize {
  case object Hour extends BatchSize { val name = "hour" }
  case object Day extends BatchSize { val name = "day" }
  case object Month extends BatchSize { val name = "month" }
  case object Year extends BatchSize { val name = "year" }

  def parse(s: String): BatchSize = s match {
    case "hour" => Hour
    case "day" => Day
    case "month" => Month
    case "year" => Year
    case other => throw new IllegalArgumentException(s"unknown batch_size: $other")
  }
}

/** Test severity (reference: `Severity`, common.rs:1016). */
sealed trait Severity { def name: String }
object Severity {
  case object Warn extends Severity { val name = "warn" }
  case object Error extends Severity { val name = "error" }
  def parse(s: String): Severity =
    if (s.equalsIgnoreCase("warn")) Warn else Error
}

/** Snapshot strategy config (reference: snapshots/strategies.sql). */
final case class SnapshotConfig(
    strategy: String = "timestamp", // timestamp | check
    uniqueKey: Seq[String] = Nil,
    updatedAt: Option[String] = None,
    checkCols: Option[Seq[String]] = None, // None + strategy=check ⇒ "all"
    hardDeletes: HardDeletes = HardDeletes.IgnoreDeletes,
    /** SQL literal for open rows' valid_to instead of NULL, e.g.
      * "date('9999-12-31')" (reference: helpers.sql:272-276). */
    dbtValidToCurrent: Option[String] = None,
    /** dbt_scd_id/dbt_valid_from/… → custom column names (reference:
      * snapshot_meta_column_names, helpers.sql:44). */
    metaColumnNames: Map[String, String] = Map.empty)

/** Per-node configuration — the union of the model/seed/snapshot/test config
  * surfaces we support (reference: DbtModelAttr nodes.rs:3851,
  * model_config.rs:79-210). Unknown keys are preserved in `extra`. */
final case class NodeConfig(
    materialized: String = "view",
    enabled: Boolean = true,
    schema: Option[String] = None,
    alias: Option[String] = None,
    tags: Seq[String] = Nil,
    preHook: Seq[String] = Nil,
    postHook: Seq[String] = Nil,
    // incremental
    incrementalStrategy: Option[IncrementalStrategy] = None,
    uniqueKey: Seq[String] = Nil,
    mergeUpdateColumns: Seq[String] = Nil,
    mergeExcludeColumns: Seq[String] = Nil,
    incrementalPredicates: Seq[String] = Nil,
    onSchemaChange: OnSchemaChange = OnSchemaChange.Ignore,
    fullRefresh: Option[Boolean] = None,
    // microbatch
    eventTime: Option[String] = None,
    batchSize: Option[BatchSize] = None,
    lookback: Int = 1,
    begin: Option[String] = None,
    /** microbatch `concurrent_batches:` (reference model_config.rs:99) —
      * run independent batches in parallel; honored only on partitioned
      * targets where each batch overwrites its own partitions. */
    concurrentBatches: Boolean = false,
    // storage layout
    partitionBy: Seq[String] = Nil,
    /** `sort_by:` — order rows within each written file so parquet
      * row-group min/max stats are narrow and selective scans skip data
      * (the Spark-side analogue of warehouse clustering keys; at 100 TB
      * this is what makes `WHERE sort_key = x` read a fraction of the
      * files). Applied via sortWithinPartitions before every table /
      * incremental write — a per-partition sort, no extra shuffle. */
    sortBy: Seq[String] = Nil,
    /** `zorder_by:` — Morton-curve layout over 2-4 numeric columns
      * (Delta OPTIMIZE ZORDER semantics on plain parquet): files become
      * tight hyper-rectangles so selective predicates on ANY z-ordered
      * column prune via min/max stats, where sort_by only serves its
      * first key. Mutually exclusive with sort_by (zorder wins). */
    zorderBy: Seq[String] = Nil,
    /** `layout_curve:` — which space-filling curve orders a `zorder_by:`
      * layout: `morton` (default; 2-4 columns) or `hilbert` (exactly 2
      * columns; consecutive keys are always grid-adjacent, so files are
      * tighter rectangles for the same one-range-shuffle cost). */
    layoutCurve: String = "morton",
    /** dbt-spark `file_format:` — the table's storage format (parquet
      * default; orc / json / csv also ship with Spark). Applies to the
      * table-building write paths (table / pipeline / seed-style CTAS);
      * incremental strategies assume the parquet default. */
    fileFormat: String = "parquet",
    /** dbt-spark `tblproperties:` — arbitrary key/value table
      * properties applied after the swap (ALTER TABLE SET
      * TBLPROPERTIES), surfaced by SHOW TBLPROPERTIES / catalogs. */
    tblProperties: Map[String, String] = Map.empty,
    /** dbt-spark `clustered_by:` + `buckets:` (reference:
      * MS adapter table config; SparkAdapter file_format/clustered_by) —
      * hash-bucketed table layout. Two tables bucketed on the same key
      * with the same bucket count join with NO exchange on either side:
      * the co-located join layout for repeated big-big joins at 100 TB. */
    clusteredBy: Seq[String] = Nil,
    buckets: Int = 0,
    /** grants: privilege → grantees (reference: funcs.rs:406
      * standardize_grants_dict; MA/adapters/apply_grants.sql). Parsed and
      * surfaced in the manifest; application is a structured-warning no-op
      * locally — Spark's embedded catalog has no SQL authorization layer. */
    grants: Map[String, Seq[String]] = Map.empty,
    // contracts (reference: DbtContract common.rs:531; enforcement
    // MA/relations/column/columns_spec_ddl.sql)
    contractEnforced: Boolean = false,
    /** declared (column name, data_type) pairs from the model's yml */
    contractColumns: Seq[(String, String)] = Nil,
    // snapshot
    snapshot: Option[SnapshotConfig] = None,
    // seed
    columnTypes: Map[String, String] = Map.empty,
    quoteColumns: Boolean = false,
    /** seed csv field delimiter (dbt seed `delimiter:` config). */
    delimiter: Option[String] = None,
    // tests
    severity: Severity = Severity.Error,
    warnIf: String = "!= 0",
    errorIf: String = "!= 0",
    failCalc: String = "count(*)",
    limit: Option[Int] = None,
    where: Option[String] = None,
    storeFailures: Boolean = false,
    /** store_failures_as (StoreFailuresAs common.rs:1007-1012):
      * ephemeral|table|view. Takes precedence over store_failures —
      * `ephemeral` disables persistence even with store_failures: true;
      * `table`/`view` enable it even without. */
    storeFailuresAs: Option[String] = None,
    extra: Map[String, Any] = Map.empty) {

  /** The effective failure-persistence kind: Some("table"|"view") when
    * failing rows persist, None when they stay ephemeral. */
  def effectiveStoreFailures: Option[String] = storeFailuresAs match {
    case Some("ephemeral") => None
    case Some(kind) => Some(kind)
    case None => if (storeFailures) Some("table") else None
  }
}

/** A node in the project graph. `rawSql` is the Jinja-templated body for
  * models/snapshots/tests; seeds carry a csv path; sources a table path. */
final case class Node(
    uniqueId: String,
    name: String,
    packageName: String,
    kind: NodeKind,
    rawSql: String = "",
    path: String = "",
    config: NodeConfig = NodeConfig(),
    dependsOn: Seq[String] = Nil,
    relation: Option[Relation] = None,
    description: String = "",
    columns: Map[String, String] = Map.empty,
    // unit tests: fixture rows per ref name + expected rows
    givenFixtures: Map[String, Seq[Map[String, Any]]] = Map.empty,
    expectRows: Seq[Map[String, Any]] = Nil,
    // source freshness
    loadedAtField: Option[String] = None,
    checksum: String = "",
    /** Split checksums for the state:modified.body / .configs selector
      * sub-methods (reference: dbt state method modified.body/configs —
      * node_selector.rs state handling): body covers only the raw SQL,
      * config only the resolved config. `checksum` remains the combined
      * hash smart reuse keys on. Filled centrally in Resolver.resolve. */
    checksumBody: String = "",
    checksumConfig: String = "",
    /** Further split checksums for state:modified sub-methods
      * (node_selector.rs:59-88): contract covers enforcement + declared
      * contract columns; relation covers where the node materializes
      * (schema/alias — a move with identical SQL still modifies). */
    checksumContract: String = "",
    checksumRelation: String = "",
    /** Hash of the SOURCES of every macro this node (transitively) calls —
      * state:modified.macros: editing a macro re-selects exactly the nodes
      * whose compiled SQL could change (dbt's depends_on.macros closure). */
    checksumMacros: String = "",
    /** Parse-time failure carried into the manifest instead of aborting
      * the load (reference surfaces these as node-level errors in
      * run_results, e.g. Python models hitting an adapter without
      * `submit_python_job`, funcs.rs:107). The runner reports the node
      * as `error` without executing it. */
    parseError: Option[String] = None) {
  def isEphemeral: Boolean = config.materialized == "ephemeral"
}
