package graft.packs

import graft.Tables
import graft.adapter.SparkAdapter
import graft.core._
import graft.mat._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Incremental strategies (SURVEY §2.B) and SCD-2 snapshots (§2.C) driven
  * through the real engine: every entry simulates two+ runs against its own
  * schema and returns the final table state; the oracle recomputes that
  * state relationally in DuckDB. */
object IncrementalPack extends QueryPack {

  private def freshAdapter(s: SparkSession, name: String): SparkAdapter = {
    val loc = Files.createTempDirectory(s"graft_$name").toString
    val schema = s"g_$name"
    s.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    new SparkAdapter(s, schema, Some(loc))
  }

  private def node(name: String, cfg: NodeConfig): Node =
    Node(uniqueId = s"model.pack.$name", name = name, packageName = "pack",
      kind = NodeKind.Model, config = cfg)

  private val T0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private val Cut = "1999-01-01"

  /** Orders before the cutoff — the "already materialized" target state. */
  private def ordersBase(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .filter(col("o_orderdate") < lit(Cut).cast("timestamp"))

  /** The "new/changed" source batch: every 10th customer's orders with
    * doubled price and bumped priority (keys overlap the base AND include
    * post-cutoff inserts). */
  private def ordersDelta(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .filter(col("o_custkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("o_orderpriority", lit("0-UPDATED"))

  private def runIncremental(a: SparkAdapter, name: String, cfg: NodeConfig,
      first: DataFrame, second: DataFrame): Relation = {
    val rel = Relation(a.defaultSchema, name)
    val n = node(name, cfg)
    IncrementalMat.run(MatContext(a, n, rel, () => first, fullRefresh = false, T0))
    IncrementalMat.run(MatContext(a, n, rel, () => second, fullRefresh = false, T0))
    rel
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- append ---------------------------------------------------------
    "q_incr_append" -> ((s, dir) => {
      val a = freshAdapter(s, "incr_append")
      val cfg = NodeConfig(materialized = "incremental",
        incrementalStrategy = Some(IncrementalStrategy.Append))
      val rel = runIncremental(a, "orders_append", cfg,
        ordersBase(s, dir),
        Tables(s, dir, "orders")
          .filter(col("o_orderdate") >= lit(Cut).cast("timestamp")))
      a.read(rel).orderBy("o_orderkey")
    }),

    // ---- merge_aggregate (partial-aggregate maintenance) -----------------
    // each batch emits a PARTIAL per-customer aggregate of its own slice;
    // the strategy merges counts by sum and totals by decimal sum, so the
    // final state equals one aggregate over the whole table
    "q_incr_aggregate" -> ((s, dir) => {
      val a = freshAdapter(s, "incr_agg")
      def aggBatch(df: DataFrame): DataFrame = df
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice")))
            .cast(org.apache.spark.sql.types.DecimalType(18, 4)).as("total"))
      val cfg = NodeConfig(materialized = "incremental",
        incrementalStrategy = Some(IncrementalStrategy.MergeAggregate),
        uniqueKey = Seq("o_custkey"),
        extra = Map("aggregate_columns" ->
          Map("n_orders" -> "sum", "total" -> "sum")))
      val rel = runIncremental(a, "orders_agg", cfg,
        aggBatch(ordersBase(s, dir)),
        aggBatch(Tables(s, dir, "orders")
          .filter(col("o_orderdate") >= lit(Cut).cast("timestamp"))))
      a.read(rel)
        .select(col("o_custkey"), col("n_orders"),
          moneyOut(col("total")).as("total"))
        .orderBy("o_custkey")
    }),

    // ---- column type expansion on append (expand_target_column_types) ---
    // (reference base_adapter.rs:504 via MA/.../incremental.sql:37): the
    // int target column widens to bigint when the incoming batch carries
    // values past Int range; the widened type is emitted as a column so
    // the oracle checks the CATALOG effect, not just the data.
    "q_incr_expand_types" -> ((s, dir) => {
      val a = freshAdapter(s, "incr_expand")
      val cfg = NodeConfig(materialized = "incremental",
        incrementalStrategy = Some(IncrementalStrategy.Append))
      val first = Tables(s, dir, "nation")
        .select(col("n_nationkey").cast("int").as("k"), col("n_name").as("v"))
      val second = Tables(s, dir, "nation")
        .select((col("n_nationkey").cast("bigint") + 3000000000L).as("k"),
          col("n_name").as("v"))
      val rel = runIncremental(a, "nation_widen", cfg, first, second)
      val kType = a.getColumnsInRelation(rel).apply("k").dataType.sql.toLowerCase
      a.read(rel).withColumn("k_type", lit(kType)).orderBy("k")
    }),

    // ---- merge (update all columns) ------------------------------------
    "q_incr_merge" -> ((s, dir) => {
      val a = freshAdapter(s, "incr_merge")
      val cfg = NodeConfig(materialized = "incremental",
        incrementalStrategy = Some(IncrementalStrategy.Merge),
        uniqueKey = Seq("o_orderkey"))
      val rel = runIncremental(a, "orders_merge", cfg,
        ordersBase(s, dir), ordersDelta(s, dir))
      a.read(rel).orderBy("o_orderkey")
    }),

    // ---- merge with hash_buckets (bounded rewrite on unpartitioned) -----
    "q_incr_merge_bucketed" -> ((s, dir) => {
      val a = freshAdapter(s, "incr_mergeb")
      val cfg = NodeConfig(materialized = "incremental",
        incrementalStrategy = Some(IncrementalStrategy.Merge),
        uniqueKey = Seq("o_orderkey"),
        extra = Map("hash_buckets" -> 16L))
      val rel = runIncremental(a, "orders_mergeb", cfg,
        ordersBase(s, dir), ordersDelta(s, dir))
      // project away the derived _graft_bucket layout column
      a.read(rel).select("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
        .orderBy("o_orderkey")
    }),

    // ---- merge with merge_update_columns --------------------------------
    "q_incr_merge_update_cols" -> ((s, dir) => {
      val a = freshAdapter(s, "incr_mergeuc")
      val cfg = NodeConfig(materialized = "incremental",
        incrementalStrategy = Some(IncrementalStrategy.Merge),
        uniqueKey = Seq("o_orderkey"),
        mergeUpdateColumns = Seq("o_totalprice")) // priority change must NOT land
      val rel = runIncremental(a, "orders_mergeuc", cfg,
        ordersBase(s, dir), ordersDelta(s, dir))
      a.read(rel).orderBy("o_orderkey")
    }),

    // ---- merge on a partitioned target (partition-pruned rewrite) --------
    "q_incr_merge_partitioned" -> ((s, dir) => {
      val a = freshAdapter(s, "incr_mergep")
      def withYear(df: DataFrame) =
        df.withColumn("o_year", year(col("o_orderdate")).cast("bigint"))
      val cfg = NodeConfig(materialized = "incremental",
        incrementalStrategy = Some(IncrementalStrategy.Merge),
        uniqueKey = Seq("o_orderkey"), partitionBy = Seq("o_year"))
      // second run must rewrite only partitions holding delta keys — the
      // pruned path (touched partitions → dynamic overwrite), not a full swap
      val rel = runIncremental(a, "orders_mergep", cfg,
        withYear(ordersBase(s, dir)), withYear(ordersDelta(s, dir)))
      a.read(rel).orderBy("o_orderkey")
    }),

    // ---- delete+insert --------------------------------------------------
    "q_incr_delete_insert" -> ((s, dir) => {
      val a = freshAdapter(s, "incr_delins")
      val cfg = NodeConfig(materialized = "incremental",
        incrementalStrategy = Some(IncrementalStrategy.DeleteInsert),
        uniqueKey = Seq("o_orderkey"))
      val rel = runIncremental(a, "orders_delins", cfg,
        ordersBase(s, dir), ordersDelta(s, dir))
      a.read(rel).orderBy("o_orderkey")
    }),

    // ---- insert_overwrite with partition_by -----------------------------
    "q_incr_insert_overwrite" -> ((s, dir) => {
      val a = freshAdapter(s, "incr_overwrite")
      def withYear(df: DataFrame) =
        df.withColumn("o_year", year(col("o_orderdate")).cast("bigint"))
      val cfg = NodeConfig(materialized = "incremental",
        incrementalStrategy = Some(IncrementalStrategy.InsertOverwrite),
        partitionBy = Seq("o_year"))
      // second run recomputes ONLY 1997 — other years must stay untouched.
      val rel = runIncremental(a, "orders_overwrite", cfg,
        withYear(Tables(s, dir, "orders")),
        withYear(Tables(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1997 && col("o_orderstatus") === "O")
          .withColumn("o_totalprice", col("o_totalprice") + 1)))
      a.read(rel)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_year")
        .orderBy("o_orderkey")
    }),

    // ---- replace_where (predicate-scoped slice swap) --------------------
    "q_incr_replace_where" -> ((s, dir) => {
      val a = freshAdapter(s, "incr_replw")
      def withYear(df: DataFrame) =
        df.withColumn("o_year", year(col("o_orderdate")).cast("bigint"))
      val cfg = NodeConfig(materialized = "incremental",
        incrementalStrategy = Some(IncrementalStrategy.ReplaceWhere),
        partitionBy = Seq("o_year"),
        // narrower than the partition: 1996 'O' rows are replaced, 1996
        // non-'O' rows must survive the partition rewrite
        incrementalPredicates = Seq("o_year = 1996 AND o_orderstatus = 'O'"))
      val rel = runIncremental(a, "orders_replw", cfg,
        withYear(Tables(s, dir, "orders")),
        withYear(Tables(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1996 && col("o_orderstatus") === "O")
          .withColumn("o_totalprice", col("o_totalprice") + 1)))
      a.read(rel)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_year")
        .orderBy("o_orderkey")
    }),

    // ---- microbatch (event_time windows + lookback) ---------------------
    "q_incr_microbatch" -> ((s, dir) => {
      val a = freshAdapter(s, "incr_microbatch")
      val rel = Relation(a.defaultSchema, "events_mb")
      val cfg = NodeConfig(materialized = "incremental",
        incrementalStrategy = Some(IncrementalStrategy.Microbatch),
        eventTime = Some("ts"), batchSize = Some(BatchSize.Day),
        lookback = 1, begin = Some("2024-01-01 00:00:00"))
      val n = node("events_mb", cfg)
      val src = Tables(s, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      // run 1 processes [begin, Jan 6); run 2 re-opens Jan 5 (lookback=1)
      // and continues through Jan 9.
      MicrobatchRunner.run(MatContext(a, n, rel, () => src, fullRefresh = false,
        java.sql.Timestamp.valueOf("2024-01-06 00:00:00")))
      MicrobatchRunner.run(MatContext(a, n, rel, () => src, fullRefresh = false,
        java.sql.Timestamp.valueOf("2024-01-09 00:00:00")),
        lastRunEnd = Some(java.sql.Timestamp.valueOf("2024-01-06 00:00:00")))
      a.read(rel).orderBy("event_id")
    }),

    // ---- on_schema_change: append_new_columns ---------------------------
    "q_incr_schema_change" -> ((s, dir) => {
      val a = freshAdapter(s, "incr_schema")
      val cfg = NodeConfig(materialized = "incremental",
        incrementalStrategy = Some(IncrementalStrategy.Merge),
        uniqueKey = Seq("o_orderkey"),
        onSchemaChange = OnSchemaChange.AppendNewColumns)
      val rel = runIncremental(a, "orders_schema", cfg,
        ordersBase(s, dir).select("o_orderkey", "o_orderstatus", "o_totalprice"),
        ordersDelta(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            col("o_orderpriority")))  // new column appears in run 2
      a.read(rel).orderBy("o_orderkey")
    }),

    // ---- on_schema_change: sync_all_columns (add AND drop) --------------
    "q_incr_sync_columns" -> ((s, dir) => {
      val a = freshAdapter(s, "incr_sync")
      val cfg = NodeConfig(materialized = "incremental",
        incrementalStrategy = Some(IncrementalStrategy.Merge),
        uniqueKey = Seq("o_orderkey"),
        onSchemaChange = OnSchemaChange.SyncAllColumns)
      // run 1 has o_orderstatus; run 2 drops it and adds o_orderpriority —
      // sync_all_columns must remove the old column and add the new one.
      val rel = runIncremental(a, "orders_sync", cfg,
        ordersBase(s, dir).select("o_orderkey", "o_orderstatus", "o_totalprice"),
        ordersDelta(s, dir).select("o_orderkey", "o_totalprice", "o_orderpriority"))
      a.read(rel).orderBy("o_orderkey")
    }),

    // ---- incremental_predicates restrict the rewritten slice ------------
    "q_incr_predicates" -> ((s, dir) => {
      val a = freshAdapter(s, "incr_pred")
      val cfg = NodeConfig(materialized = "incremental",
        incrementalStrategy = Some(IncrementalStrategy.Merge),
        uniqueKey = Seq("o_orderkey"),
        // only 1998+ target rows participate in the merge; older matched
        // rows stay untouched (partition-pruning shape at scale)
        incrementalPredicates = Seq(
          "DBT_INTERNAL_DEST.o_orderdate >= timestamp'1998-01-01 00:00:00'"))
      val rel = runIncremental(a, "orders_pred", cfg,
        ordersBase(s, dir), ordersDelta(s, dir))
      a.read(rel).orderBy("o_orderkey")
    }),

    // ---- snapshot, timestamp strategy -----------------------------------
    "q_snapshot_timestamp" -> ((s, dir) => {
      val a = freshAdapter(s, "snap_ts")
      val rel = Relation(a.defaultSchema, "orders_snap")
      val snapCfg = SnapshotConfig(strategy = "timestamp",
        uniqueKey = Seq("o_orderkey"), updatedAt = Some("o_updated_at"))
      val cfg = NodeConfig(materialized = "snapshot", snapshot = Some(snapCfg))
      val n = node("orders_snap", cfg)
      val v1 = ordersBase(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
          col("o_orderdate").as("o_updated_at"))
      // v2: every 5th customer's rows re-touched one year later with new price
      val v2 = v1.withColumn("bump", col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice",
          when(col("bump"), col("o_totalprice") * 2).otherwise(col("o_totalprice")))
        .withColumn("o_updated_at",
          when(col("bump"), col("o_updated_at") + expr("INTERVAL 365 DAYS"))
            .otherwise(col("o_updated_at")))
        .drop("bump")
      SnapshotMat.run(MatContext(a, n, rel, () => v1, fullRefresh = false, T0))
      SnapshotMat.run(MatContext(a, n, rel, () => v2, fullRefresh = false, T0))
      a.read(rel).orderBy(col("o_orderkey"), col("dbt_valid_from"))
    }),

    // ---- snapshot, check strategy + hard_deletes=invalidate -------------
    "q_snapshot_check" -> ((s, dir) => {
      val a = freshAdapter(s, "snap_check")
      val rel = Relation(a.defaultSchema, "part_snap")
      val snapCfg = SnapshotConfig(strategy = "check",
        uniqueKey = Seq("p_partkey"), checkCols = Some(Seq("p_retailprice", "p_brand")),
        hardDeletes = HardDeletes.Invalidate)
      val cfg = NodeConfig(materialized = "snapshot", snapshot = Some(snapCfg))
      val n = node("part_snap", cfg)
      val v1 = Tables(s, dir, "part")
        .select("p_partkey", "p_brand", "p_retailprice", "p_size")
      // v2: price changed for partkey%7==0, every 11th part deleted
      val v2 = v1.filter(col("p_partkey") % 11 =!= 0)
        .withColumn("p_retailprice",
          when(col("p_partkey") % 7 === 0, col("p_retailprice") + 10)
            .otherwise(col("p_retailprice")))
      val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val t2 = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")
      SnapshotMat.run(MatContext(a, n, rel, () => v1, fullRefresh = false, t1))
      SnapshotMat.run(MatContext(a, n, rel, () => v2, fullRefresh = false, t2))
      a.read(rel).orderBy(col("p_partkey"), col("dbt_valid_from"))
    }),

    // ---- snapshot, custom meta-column names + dbt_valid_to_current ------
    "q_snapshot_meta_cols" -> ((s, dir) => {
      val a = freshAdapter(s, "snap_meta")
      val rel = Relation(a.defaultSchema, "cust_snap")
      val snapCfg = SnapshotConfig(strategy = "check",
        uniqueKey = Seq("c_custkey"), checkCols = Some(Seq("c_acctbal")),
        // In-ns-range open-row marker: 9999-12-31 overflows parquet's int64
        // nanosecond epoch (max 2262-04-11) and silently wraps on write.
        dbtValidToCurrent = Some("timestamp'2250-01-01 00:00:00'"),
        metaColumnNames = Map(
          "dbt_scd_id" -> "scd_id", "dbt_valid_from" -> "valid_from",
          "dbt_valid_to" -> "valid_to", "dbt_updated_at" -> "updated_ts"))
      val cfg = NodeConfig(materialized = "snapshot", snapshot = Some(snapCfg))
      val n = node("cust_snap", cfg)
      val v1 = Tables(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal")
      // v2: every 3rd customer's balance bumped → close old + open new version
      val v2 = v1.withColumn("c_acctbal",
        when(col("c_custkey") % 3 === 0, col("c_acctbal") + 5)
          .otherwise(col("c_acctbal")))
      val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val t2 = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")
      SnapshotMat.run(MatContext(a, n, rel, () => v1, fullRefresh = false, t1))
      SnapshotMat.run(MatContext(a, n, rel, () => v2, fullRefresh = false, t2))
      a.read(rel).orderBy(col("c_custkey"), col("valid_from"))
    }),

    // ---- snapshot, default far-future open-row marker --------------------
    // Regression pin for the r2 int64-ns parquet overflow: 9999-12-31 only
    // survives the write because the session pins TIMESTAMP_MICROS (micros
    // max ~ year 294246). If that pin ever regresses, this query hash-reds.
    "q_snapshot_far_future" -> ((s, dir) => {
      val a = freshAdapter(s, "snap_farfuture")
      val rel = Relation(a.defaultSchema, "cust_snap_ff")
      val snapCfg = SnapshotConfig(strategy = "check",
        uniqueKey = Seq("c_custkey"), checkCols = Some(Seq("c_acctbal")),
        dbtValidToCurrent = Some("timestamp'9999-12-31 00:00:00'"))
      val cfg = NodeConfig(materialized = "snapshot", snapshot = Some(snapCfg))
      val n = node("cust_snap_ff", cfg)
      val v1 = Tables(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal")
      // v2: every 5th customer's balance bumped → close old + open new version
      val v2 = v1.withColumn("c_acctbal",
        when(col("c_custkey") % 5 === 0, col("c_acctbal") + 7)
          .otherwise(col("c_acctbal")))
      val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val t2 = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")
      SnapshotMat.run(MatContext(a, n, rel, () => v1, fullRefresh = false, t1))
      SnapshotMat.run(MatContext(a, n, rel, () => v2, fullRefresh = false, t2))
      a.read(rel).orderBy(col("c_custkey"), col("dbt_valid_from"))
    }),

    // ---- snapshot, hard_deletes=new_record ------------------------------
    "q_snapshot_new_record" -> ((s, dir) => {
      val a = freshAdapter(s, "snap_newrec")
      val rel = Relation(a.defaultSchema, "supp_snap")
      val snapCfg = SnapshotConfig(strategy = "check",
        uniqueKey = Seq("s_suppkey"), checkCols = Some(Seq("s_acctbal")),
        hardDeletes = HardDeletes.NewRecord)
      val cfg = NodeConfig(materialized = "snapshot", snapshot = Some(snapCfg))
      val n = node("supp_snap", cfg)
      val v1 = Tables(s, dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
      // v2: every 9th supplier vanishes → close + 'True' deletion record
      val v2 = v1.filter(col("s_suppkey") % 9 =!= 0)
      val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val t2 = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")
      SnapshotMat.run(MatContext(a, n, rel, () => v1, fullRefresh = false, t1))
      SnapshotMat.run(MatContext(a, n, rel, () => v2, fullRefresh = false, t2))
      a.read(rel).orderBy(col("s_suppkey"), col("dbt_valid_from"))
    })
  )

  // DuckDB re-computations of the same final states.
  private val deltaSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
      |       o_orderdate, '0-UPDATED' AS o_orderpriority
      |FROM orders WHERE o_custkey % 10 = 0""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_incr_append" ->
      """SELECT * FROM orders ORDER BY o_orderkey""".stripMargin,

    // two partial batches partition the table, so the merged state must
    // equal ONE aggregate over all of orders
    "q_incr_aggregate" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
        |    AS DECIMAL(38,4)) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_incr_expand_types" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS v,
        |  'bigint' AS k_type FROM nation
        |UNION ALL
        |SELECT CAST(n_nationkey AS BIGINT) + 3000000000, n_name, 'bigint'
        |FROM nation
        |ORDER BY k""".stripMargin,

    "q_incr_merge" ->
      s"""WITH base AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '$Cut'),
         |delta AS ($deltaSql)
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM delta
         |UNION ALL
         |SELECT b.* FROM base b WHERE NOT EXISTS
         |  (SELECT 1 FROM delta d WHERE d.o_orderkey = b.o_orderkey)
         |ORDER BY o_orderkey""".stripMargin,

    "q_incr_merge_bucketed" ->
      s"""WITH base AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '$Cut'),
         |delta AS ($deltaSql)
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM delta
         |UNION ALL
         |SELECT b.* FROM base b WHERE NOT EXISTS
         |  (SELECT 1 FROM delta d WHERE d.o_orderkey = b.o_orderkey)
         |ORDER BY o_orderkey""".stripMargin,

    "q_incr_merge_update_cols" ->
      s"""WITH base AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '$Cut'),
         |delta AS ($deltaSql)
         |SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus,
         |       d.o_totalprice AS o_totalprice,  -- only price updates
         |       b.o_orderdate, b.o_orderpriority
         |FROM base b JOIN delta d ON b.o_orderkey = d.o_orderkey
         |UNION ALL
         |SELECT b.* FROM base b WHERE NOT EXISTS
         |  (SELECT 1 FROM delta d WHERE d.o_orderkey = b.o_orderkey)
         |UNION ALL
         |SELECT d.o_orderkey, d.o_custkey, d.o_orderstatus, d.o_totalprice,
         |       d.o_orderdate, d.o_orderpriority
         |FROM delta d WHERE NOT EXISTS
         |  (SELECT 1 FROM base b WHERE b.o_orderkey = d.o_orderkey)
         |ORDER BY o_orderkey""".stripMargin,

    "q_incr_merge_partitioned" ->
      s"""WITH base AS (
         |  SELECT *, CAST(year(o_orderdate) AS BIGINT) AS o_year FROM orders
         |  WHERE o_orderdate < TIMESTAMP '$Cut'),
         |delta AS (
         |  SELECT *, CAST(year(o_orderdate) AS BIGINT) AS o_year FROM ($deltaSql))
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         |       o_orderpriority, o_year
         |FROM delta
         |UNION ALL
         |SELECT b.* FROM base b WHERE NOT EXISTS
         |  (SELECT 1 FROM delta d WHERE d.o_orderkey = b.o_orderkey)
         |ORDER BY o_orderkey""".stripMargin,

    "q_incr_delete_insert" ->
      s"""WITH base AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '$Cut'),
         |delta AS ($deltaSql)
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM delta
         |UNION ALL
         |SELECT b.* FROM base b WHERE NOT EXISTS
         |  (SELECT 1 FROM delta d WHERE d.o_orderkey = b.o_orderkey)
         |ORDER BY o_orderkey""".stripMargin,

    "q_incr_insert_overwrite" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice + 1 AS o_totalprice,
        |       CAST(1997 AS BIGINT) AS o_year
        |FROM orders WHERE year(o_orderdate) = 1997 AND o_orderstatus = 'O'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice,
        |       CAST(year(o_orderdate) AS BIGINT) AS o_year
        |FROM orders WHERE year(o_orderdate) <> 1997
        |ORDER BY o_orderkey""".stripMargin,

    "q_incr_replace_where" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice + 1 AS o_totalprice,
        |       CAST(1996 AS BIGINT) AS o_year
        |FROM orders WHERE year(o_orderdate) = 1996 AND o_orderstatus = 'O'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice,
        |       CAST(year(o_orderdate) AS BIGINT) AS o_year
        |FROM orders WHERE NOT (year(o_orderdate) = 1996 AND o_orderstatus = 'O')
        |ORDER BY o_orderkey""".stripMargin,

    "q_incr_microbatch" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-09'
        |ORDER BY event_id""".stripMargin,

    "q_incr_schema_change" ->
      s"""WITH base AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         |  WHERE o_orderdate < TIMESTAMP '$Cut'),
         |delta AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
         |         '0-UPDATED' AS o_orderpriority
         |  FROM orders WHERE o_custkey % 10 = 0)
         |SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM delta
         |UNION ALL
         |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice, NULL
         |FROM base b WHERE NOT EXISTS
         |  (SELECT 1 FROM delta d WHERE d.o_orderkey = b.o_orderkey)
         |ORDER BY o_orderkey""".stripMargin,

    "q_snapshot_timestamp" ->
      s"""WITH v1 AS (
         |  SELECT o_orderkey, o_totalprice, o_orderstatus,
         |         o_orderdate AS o_updated_at
         |  FROM orders WHERE o_orderdate < TIMESTAMP '$Cut'),
         |v2 AS (
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
         |    o_orderstatus,
         |    CASE WHEN o_orderkey % 5 = 0 THEN o_updated_at + INTERVAL 365 DAY ELSE o_updated_at END AS o_updated_at
         |  FROM v1),
         |-- closed first-version rows for changed keys
         |closed AS (
         |  SELECT c.o_orderkey, c.o_totalprice, c.o_orderstatus, c.o_updated_at,
         |    md5(concat_ws('|', CAST(c.o_orderkey AS VARCHAR), CAST(c.o_updated_at AS VARCHAR))) AS dbt_scd_id,
         |    c.o_updated_at AS dbt_updated_at,
         |    c.o_updated_at AS dbt_valid_from,
         |    s.o_updated_at AS dbt_valid_to
         |  FROM v1 c JOIN v2 s ON c.o_orderkey = s.o_orderkey
         |  WHERE c.o_updated_at < s.o_updated_at),
         |-- still-current rows (unchanged) + new versions
         |current_rows AS (
         |  SELECT c.o_orderkey, c.o_totalprice, c.o_orderstatus, c.o_updated_at,
         |    md5(concat_ws('|', CAST(c.o_orderkey AS VARCHAR), CAST(c.o_updated_at AS VARCHAR))) AS dbt_scd_id,
         |    c.o_updated_at, c.o_updated_at, CAST(NULL AS TIMESTAMP)
         |  FROM v1 c JOIN v2 s ON c.o_orderkey = s.o_orderkey
         |  WHERE NOT (c.o_updated_at < s.o_updated_at)
         |  UNION ALL
         |  SELECT s.o_orderkey, s.o_totalprice, s.o_orderstatus, s.o_updated_at,
         |    md5(concat_ws('|', CAST(s.o_orderkey AS VARCHAR), CAST(s.o_updated_at AS VARCHAR))),
         |    s.o_updated_at, s.o_updated_at, CAST(NULL AS TIMESTAMP)
         |  FROM v2 s JOIN v1 c ON c.o_orderkey = s.o_orderkey
         |  WHERE c.o_updated_at < s.o_updated_at)
         |SELECT * FROM closed
         |UNION ALL SELECT * FROM current_rows
         |ORDER BY o_orderkey, dbt_valid_from""".stripMargin,

    "q_incr_sync_columns" ->
      s"""WITH base AS (
         |  SELECT o_orderkey, o_totalprice FROM orders
         |  WHERE o_orderdate < TIMESTAMP '$Cut'),
         |delta AS (
         |  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
         |         '0-UPDATED' AS o_orderpriority
         |  FROM orders WHERE o_custkey % 10 = 0)
         |SELECT o_orderkey, o_totalprice, o_orderpriority FROM delta
         |UNION ALL
         |SELECT b.o_orderkey, b.o_totalprice, NULL FROM base b
         |WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.o_orderkey = b.o_orderkey)
         |ORDER BY o_orderkey""".stripMargin,

    "q_incr_predicates" ->
      s"""WITH base AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '$Cut'),
         |delta AS ($deltaSql),
         |inscope AS (SELECT * FROM base WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
         |outscope AS (SELECT * FROM base WHERE o_orderdate < TIMESTAMP '1998-01-01')
         |-- out-of-scope target rows ride through even when their key is in
         |-- the delta (the dbt incremental_predicates duplicate gotcha);
         |-- every delta row lands exactly once (update or insert)
         |SELECT * FROM outscope
         |UNION ALL
         |SELECT i.* FROM inscope i
         |WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.o_orderkey = i.o_orderkey)
         |UNION ALL
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM delta
         |ORDER BY o_orderkey""".stripMargin,

    "q_snapshot_meta_cols" ->
      """WITH v1 AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |t1 AS (SELECT TIMESTAMP '2026-01-01 00:00:00' AS ts),
        |t2 AS (SELECT TIMESTAMP '2026-02-01 00:00:00' AS ts),
        |cur AS (SELECT TIMESTAMP '2250-01-01 00:00:00' AS ts),
        |changed AS (SELECT c_custkey FROM v1 WHERE c_custkey % 3 = 0)
        |-- v1 rows: closed at t2 when the balance changed, else open (cur)
        |SELECT c.c_custkey, c.c_name, c.c_acctbal,
        |  md5(concat_ws('|', CAST(c.c_custkey AS VARCHAR), CAST((SELECT ts FROM t1) AS VARCHAR))) AS scd_id,
        |  (SELECT ts FROM t1) AS updated_ts,
        |  (SELECT ts FROM t1) AS valid_from,
        |  CASE WHEN c.c_custkey IN (SELECT c_custkey FROM changed)
        |       THEN (SELECT ts FROM t2) ELSE (SELECT ts FROM cur) END AS valid_to
        |FROM v1 c
        |UNION ALL
        |-- new open versions for changed keys (valid_from = t2, valid_to = cur)
        |SELECT c.c_custkey, c.c_name, c.c_acctbal + 5,
        |  md5(concat_ws('|', CAST(c.c_custkey AS VARCHAR), CAST((SELECT ts FROM t2) AS VARCHAR))),
        |  (SELECT ts FROM t2), (SELECT ts FROM t2), (SELECT ts FROM cur)
        |FROM v1 c WHERE c.c_custkey IN (SELECT c_custkey FROM changed)
        |ORDER BY c_custkey, valid_from""".stripMargin,

    "q_snapshot_far_future" ->
      """WITH v1 AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |t1 AS (SELECT TIMESTAMP '2026-01-01 00:00:00' AS ts),
        |t2 AS (SELECT TIMESTAMP '2026-02-01 00:00:00' AS ts),
        |cur AS (SELECT TIMESTAMP '9999-12-31 00:00:00' AS ts),
        |changed AS (SELECT c_custkey FROM v1 WHERE c_custkey % 5 = 0)
        |-- v1 rows: closed at t2 when the balance changed, else open (cur)
        |SELECT c.c_custkey, c.c_name, c.c_acctbal,
        |  md5(concat_ws('|', CAST(c.c_custkey AS VARCHAR), CAST((SELECT ts FROM t1) AS VARCHAR))) AS dbt_scd_id,
        |  (SELECT ts FROM t1) AS dbt_updated_at,
        |  (SELECT ts FROM t1) AS dbt_valid_from,
        |  CASE WHEN c.c_custkey IN (SELECT c_custkey FROM changed)
        |       THEN (SELECT ts FROM t2) ELSE (SELECT ts FROM cur) END AS dbt_valid_to
        |FROM v1 c
        |UNION ALL
        |-- new open versions for changed keys (valid_from = t2, valid_to = cur)
        |SELECT c.c_custkey, c.c_name, c.c_acctbal + 7,
        |  md5(concat_ws('|', CAST(c.c_custkey AS VARCHAR), CAST((SELECT ts FROM t2) AS VARCHAR))),
        |  (SELECT ts FROM t2), (SELECT ts FROM t2), (SELECT ts FROM cur)
        |FROM v1 c WHERE c.c_custkey % 5 = 0
        |ORDER BY c_custkey, dbt_valid_from""".stripMargin,

    "q_snapshot_new_record" ->
      """WITH v1 AS (SELECT s_suppkey, s_name, s_acctbal FROM supplier),
        |deleted AS (SELECT s_suppkey FROM v1 WHERE s_suppkey % 9 = 0),
        |t1 AS (SELECT TIMESTAMP '2026-01-01 00:00:00' AS ts),
        |t2 AS (SELECT TIMESTAMP '2026-02-01 00:00:00' AS ts)
        |-- original rows: closed at t2 when deleted, else still open
        |SELECT v.s_suppkey, v.s_name, v.s_acctbal,
        |  md5(concat_ws('|', CAST(v.s_suppkey AS VARCHAR), CAST((SELECT ts FROM t1) AS VARCHAR))) AS dbt_scd_id,
        |  (SELECT ts FROM t1) AS dbt_updated_at,
        |  (SELECT ts FROM t1) AS dbt_valid_from,
        |  CASE WHEN v.s_suppkey IN (SELECT s_suppkey FROM deleted)
        |       THEN (SELECT ts FROM t2) ELSE NULL END AS dbt_valid_to,
        |  'False' AS dbt_is_deleted
        |FROM v1 v
        |UNION ALL
        |-- deletion records: same data, open row flagged deleted at t2
        |SELECT v.s_suppkey, v.s_name, v.s_acctbal,
        |  md5(concat_ws('|', CAST(v.s_suppkey AS VARCHAR), CAST((SELECT ts FROM t2) AS VARCHAR))),
        |  (SELECT ts FROM t2), (SELECT ts FROM t2), NULL, 'True'
        |FROM v1 v WHERE v.s_suppkey IN (SELECT s_suppkey FROM deleted)
        |ORDER BY s_suppkey, dbt_valid_from""".stripMargin,

    "q_snapshot_check" ->
      """WITH v1 AS (
        |  SELECT p_partkey, p_brand, p_retailprice, p_size FROM part),
        |v2 AS (
        |  SELECT p_partkey, p_brand,
        |    CASE WHEN p_partkey % 7 = 0 THEN p_retailprice + 10 ELSE p_retailprice END AS p_retailprice,
        |    p_size
        |  FROM part WHERE p_partkey % 11 <> 0),
        |t1 AS (SELECT TIMESTAMP '2026-01-01 00:00:00' AS ts),
        |t2 AS (SELECT TIMESTAMP '2026-02-01 00:00:00' AS ts),
        |changed AS (
        |  SELECT c.p_partkey FROM v1 c JOIN v2 s ON c.p_partkey = s.p_partkey
        |  WHERE c.p_retailprice IS DISTINCT FROM s.p_retailprice
        |     OR c.p_brand IS DISTINCT FROM s.p_brand),
        |deleted AS (
        |  SELECT c.p_partkey FROM v1 c WHERE NOT EXISTS
        |    (SELECT 1 FROM v2 s WHERE s.p_partkey = c.p_partkey))
        |-- v1 rows: closed if changed (at t2) or deleted (at t2), else open
        |SELECT c.p_partkey, c.p_brand, c.p_retailprice, c.p_size,
        |  md5(concat_ws('|', CAST(c.p_partkey AS VARCHAR), CAST((SELECT ts FROM t1) AS VARCHAR))) AS dbt_scd_id,
        |  (SELECT ts FROM t1) AS dbt_updated_at,
        |  (SELECT ts FROM t1) AS dbt_valid_from,
        |  CASE WHEN c.p_partkey IN (SELECT p_partkey FROM changed)
        |         OR c.p_partkey IN (SELECT p_partkey FROM deleted)
        |       THEN (SELECT ts FROM t2) ELSE NULL END AS dbt_valid_to
        |FROM v1 c
        |UNION ALL
        |-- new open versions for changed keys (valid_from = t2)
        |SELECT s.p_partkey, s.p_brand, s.p_retailprice, s.p_size,
        |  md5(concat_ws('|', CAST(s.p_partkey AS VARCHAR), CAST((SELECT ts FROM t2) AS VARCHAR))),
        |  (SELECT ts FROM t2), (SELECT ts FROM t2), NULL
        |FROM v2 s WHERE s.p_partkey IN (SELECT p_partkey FROM changed)
        |ORDER BY p_partkey, dbt_valid_from""".stripMargin
  )
}
