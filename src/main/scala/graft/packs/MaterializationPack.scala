package graft.packs

import graft.Tables
import graft.adapter.SparkAdapter
import graft.core._
import graft.mat._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Materialization operators (SURVEY §2.A, §2.D) driven end-to-end through
  * the real engine machinery — each entry builds its own schema in the
  * shared session, runs the materialization(s), and returns the final table
  * state for the DuckDB hash-compare. */
object MaterializationPack extends QueryPack {

  /** Fresh isolated schema per query run (idempotent across reruns). */
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- view: CREATE OR REPLACE VIEW over a source scan ----------------
    "q_mat_view" -> ((s, dir) => {
      val a = freshAdapter(s, "mat_view")
      val rel = Relation(a.defaultSchema, "stg_orders")
      a.createView(rel,
        s"""SELECT o_orderkey AS order_id, o_custkey AS customer_id,
           |       lower(o_orderstatus) AS status, o_totalprice AS amount
           |FROM parquet.`$dir/orders.parquet`""".stripMargin)
      a.read(rel).orderBy("order_id")
    }),

    // ---- table: CTAS through the intermediate/backup swap ---------------
    "q_mat_table" -> ((s, dir) => {
      val a = freshAdapter(s, "mat_table")
      val rel = Relation(a.defaultSchema, "order_mart")
      val df = Tables(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(moneyOut(sum(dec(col("o_totalprice")))).as("total"),
          count(lit(1)).as("n"))
      // run twice: second run exercises the backup/rename swap path
      TableMat.run(MatContext(a, node("order_mart", NodeConfig(materialized = "table")),
        rel, () => df, fullRefresh = false, T0))
      TableMat.run(MatContext(a, node("order_mart", NodeConfig(materialized = "table")),
        rel, () => df, fullRefresh = false, T0))
      a.read(rel).orderBy("o_orderstatus")
    }),

    // ---- seed: CSV → typed table ---------------------------------------
    "q_mat_seed" -> ((s, dir) => {
      val a = freshAdapter(s, "mat_seed")
      val csv = Files.createTempFile("seed", ".csv")
      Files.writeString(csv,
        """ID,Customer Name,Tax Rate,Opened At,is_active
          |1,Alpha Corp,0.07,2024-01-01 08:30:00,true
          |2,Beta LLC,0.085,2024-02-15 12:00:00,false
          |3,Gamma Inc,,2024-03-01 00:00:00,true
          |""".stripMargin)
      val cfg = NodeConfig(materialized = "seed",
        columnTypes = Map("tax_rate" -> "double", "id" -> "bigint"))
      val rel = Relation(a.defaultSchema, "raw_stores")
      SeedMat.run(MatContext(a,
        node("raw_stores", cfg).copy(kind = NodeKind.Seed, path = csv.toString),
        rel, () => null, fullRefresh = false, T0))
      a.read(rel)
        .select(col("id"), col("customer_name"), col("tax_rate"),
          col("opened_at").cast("timestamp").as("opened_at"), col("is_active"))
        .orderBy("id")
    }),

    // ---- generic data tests: each returns the FAILING rows --------------
    "q_test_unique" -> ((s, dir) => {
      // l_orderkey alone is NOT unique in lineitem → real failures
      GenericTests.unique(Tables(s, dir, "lineitem"), "l_orderkey")
        .orderBy("l_orderkey")
    }),
    "q_test_not_null" -> ((s, dir) => {
      GenericTests.notNull(Tables(s, dir, "orders"), "o_orderkey")
        .select(col("o_orderkey"))
    }),
    "q_test_accepted_values" -> ((s, dir) => {
      GenericTests.acceptedValues(Tables(s, dir, "orders"), "o_orderstatus",
        Seq("O", "F")).orderBy("value_field")
    }),
    "q_test_relationships" -> ((s, dir) => {
      GenericTests.relationships(
        Tables(s, dir, "orders"), "o_orderkey",
        Tables(s, dir, "lineitem"), "l_orderkey")
        .groupBy(col("from_field")).agg(count(lit(1)).as("n"))
        .orderBy("from_field")
    }),

    // ---- test severity/threshold machinery ------------------------------
    "q_test_severity" -> ((s, dir) => {
      import s.implicits._
      val failing = GenericTests.acceptedValues(
        Tables(s, dir, "orders"), "o_orderstatus", Seq("O", "F"))
      val r1 = TestMat.run(s, failing,
        NodeConfig(severity = Severity.Error, errorIf = "> 10000", warnIf = "> 0"))
      val r2 = TestMat.run(s, failing,
        NodeConfig(severity = Severity.Error, errorIf = "!= 0"))
      val r3 = TestMat.run(s, failing.limit(0), NodeConfig())
      Seq(
        ("warn_only", r1.status, r1.failures),
        ("hard_fail", r2.status, r2.failures),
        ("clean_pass", r3.status, r3.failures)
      ).toDF("case_name", "status", "failures").orderBy("case_name")
    }),

    // ---- unit test: fixture CTEs + exceptAll diff -----------------------
    "q_unit_test" -> ((s, dir) => {
      import s.implicits._
      val fixture = UnitTestMat.fixtureDf(s,
        Seq(
          Map("o_orderkey" -> 1L, "o_totalprice" -> 100.0, "o_orderstatus" -> "O"),
          Map("o_orderkey" -> 2L, "o_totalprice" -> 200.0, "o_orderstatus" -> "F"),
          Map("o_orderkey" -> 3L, "o_totalprice" -> 300.0, "o_orderstatus" -> "O")),
        Some(Tables(s, dir, "orders")
          .select("o_orderkey", "o_totalprice", "o_orderstatus")))
      fixture.createOrReplaceTempView("unit_fixture_orders")
      val actual = s.sql(
        """SELECT o_orderstatus, sum(o_totalprice) AS total
          |FROM unit_fixture_orders GROUP BY o_orderstatus""".stripMargin)
      val expected = Seq(("O", 400.0), ("F", 200.0)).toDF("o_orderstatus", "total")
      val res = UnitTestMat.run(actual, expected)
      val diffN = res.diff.count()
      Seq((res.status, diffN)).toDF("status", "diff_rows")
    }),

    // ---- SQL UDF function materialization -------------------------------
    "q_mat_function" -> ((s, dir) => {
      FunctionMat.create(s, "order_bucket",
        Seq("price" -> "DOUBLE"), "STRING",
        "CASE WHEN price < 1000 THEN 'small' WHEN price < 10000 THEN 'mid' ELSE 'large' END")
      Tables(s, dir, "orders").createOrReplaceTempView("q_fn_orders")
      s.sql(
        """SELECT order_bucket(o_totalprice) AS bucket, count(*) AS n
          |FROM q_fn_orders GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // ---- source freshness ----------------------------------------------
    "q_freshness" -> ((s, dir) => {
      import s.implicits._
      val now = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
      val r = Freshness.check(Tables(s, dir, "events"), "ts", now,
        warnAfter = Some((12L, "hour")), errorAfter = Some((7L, "day")))
      Seq((r.maxLoadedAt.orNull, math.round(r.ageSeconds), r.status))
        .toDF("max_loaded_at", "age_seconds", "status")
    }),

    // ---- metadata-based source freshness --------------------------------
    // No loaded_at_field: freshness = age of the newest file under the
    // source location (reference metadata/mod.rs:96). Deterministic
    // against the oracle by anchoring each probe's `now` to the observed
    // mtime itself, so only the status thresholds are under test.
    "q_freshness_metadata" -> ((s, dir) => {
      import s.implicits._
      val loc = s"$dir/events.parquet"
      val mtime = Freshness.checkMetadata(loc,
        new java.sql.Timestamp(0), None, None).maxLoadedAt.get
      def at(plusSeconds: Long) = Freshness.checkMetadata(loc,
        new java.sql.Timestamp(mtime.getTime + plusSeconds * 1000L),
        warnAfter = Some((12L, "hour")), errorAfter = Some((7L, "day")))
      Seq(
        ("age_1h", at(3600L).status),
        ("age_13h", at(13L * 3600).status),
        ("age_8d", at(8L * 86400).status))
        .toDF("case_name", "status").orderBy("case_name")
    }),

    // ---- materialized_view scenario ladder ------------------------------
    // The reference's materialized_view_get_build_sql ladder
    // (MA/materializations/models/materialized_view.sql:56-123): create →
    // refresh when the recorded configuration matches → the three
    // on_configuration_change modes when it drifts → full-refresh replace.
    // Each rung's observable outcome (status, message kind, row count,
    // physical partitioning) becomes one output row.
    "q_mat_mview" -> ((s, dir) => {
      import s.implicits._
      val a = freshAdapter(s, "mat_mview")
      val rel = Relation(a.defaultSchema, "mv_region_counts")
      def mk(partitionBy: Seq[String], extra: Map[String, Any] = Map.empty,
          fullRefresh: Boolean = false): MatContext = {
        val cfg = NodeConfig(materialized = "materialized_view",
          partitionBy = partitionBy, extra = extra)
        MatContext(a, node("mv_region_counts", cfg), rel,
          () => Tables(s, dir, "nation")
            .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n_nations")),
          fullRefresh, T0)
      }
      def partitionCols: String = {
        val rows = s.sql(s"DESCRIBE TABLE ${rel.fqn}").collect().map(_.getString(0))
        val i = rows.indexOf("# Partition Information")
        if (i < 0) "" else rows.drop(i + 2).takeWhile(_.nonEmpty).mkString(",")
      }
      def tag(m: String): String =
        Seq("created", "full-refresh", "refreshed", "applied", "skipped", "fail")
          .find(m.contains).getOrElse("other")
      val steps = Seq(
        "1_create" -> mk(Nil),
        "2_refresh" -> mk(Nil),
        "3_drift_fail" -> mk(Seq("n_regionkey"), Map("on_configuration_change" -> "fail")),
        "4_drift_continue" -> mk(Seq("n_regionkey"), Map("on_configuration_change" -> "continue")),
        "5_drift_apply" -> mk(Seq("n_regionkey")),
        "6_refresh_new_config" -> mk(Seq("n_regionkey")),
        "7_full_refresh" -> mk(Nil, fullRefresh = true))
      steps.map { case (step, ctx) =>
        val r = MaterializedViewMat.run(ctx)
        (step, r.status, tag(r.message), a.read(rel).count(), partitionCols)
      }.toDF("step", "status", "outcome", "n_rows", "partition_cols")
        .orderBy("step")
    }),

    // ---- store_failures: the failing rows PERSIST as a table ------------
    // (StoreFailuresAs common.rs:1007) — the query output is the stored
    // table read back through the adapter, not the in-flight test result,
    // so the persistence path itself is what the oracle checks.
    "q_test_store_failures" -> ((s, dir) => {
      val a = freshAdapter(s, "store_failures")
      val failing = GenericTests.acceptedValues(
        Tables(s, dir, "orders"), "o_orderstatus", Seq("O", "F"))
      val rel = Relation(a.defaultSchema, "accepted_values_orders_status")
      val res = TestMat.run(s, failing,
        NodeConfig(severity = Severity.Error, errorIf = "!= 0",
          storeFailures = true),
        Some(a), Some(rel))
      val stored = res.failuresRelation.getOrElse(
        throw new IllegalStateException("store_failures did not persist"))
      a.read(stored).orderBy("value_field")
    }),

    // ---- agate table algebra over a run_query result --------------------
    // The driver-side result-table ops (§2.G, adapter/AgateTable.scala;
    // reference dbt's agate bridge): execute → select/rename/
    // column_distinct/column_sorted/without_nulls/group_by/cell, each
    // producing one observable stat the oracle recomputes relationally.
    "q_agate_ops" -> ((s, dir) => {
      import s.implicits._
      val a = freshAdapter(s, "agate_ops")
      Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("agate_nation")
      val (_, t) = a.execute(
        "SELECT n_nationkey, n_name, n_regionkey FROM agate_nation ORDER BY n_nationkey")
      val projected = t.select(Seq("n_regionkey", "n_name"))
        .rename(Map("n_name" -> "nation_name"))
      val groupSizes = projected.groupBy("n_regionkey")
        .map { case (_, g) => g.numRows }
      Seq(
        ("cell_0_name", String.valueOf(t.cell(0, "n_name"))),
        ("distinct_regions", projected.columnDistinct("n_regionkey").length.toString),
        ("first_sorted_name", String.valueOf(projected.columnSorted("nation_name").head)),
        ("max_group_size", groupSizes.max.toString),
        ("rows_without_nulls", projected.withoutNulls("nation_name").numRows.toString))
        .toDF("stat", "value").orderBy("stat")
    }),

    // ---- clone (view-of-target fallback) --------------------------------
    "q_mat_clone" -> ((s, dir) => {
      val a = freshAdapter(s, "mat_clone")
      val src = Relation(a.defaultSchema, "base_tbl")
      a.writeTableAtomic(
        Tables(s, dir, "nation").select("n_nationkey", "n_name"), src)
      val cloneRel = Relation(a.defaultSchema, "base_clone")
      CloneMat.run(MatContext(a,
        node("base_clone", NodeConfig(materialized = "clone"))
          .copy(relation = Some(src)),
        cloneRel, () => null, fullRefresh = false, T0))
      a.read(cloneRel).orderBy("n_nationkey")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_mat_view" ->
      """SELECT o_orderkey AS order_id, o_custkey AS customer_id,
        |  lower(o_orderstatus) AS status, o_totalprice AS amount
        |FROM orders ORDER BY order_id""".stripMargin,

    "q_mat_table" ->
      """SELECT o_orderstatus,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_mat_seed" ->
      """SELECT CAST(id AS BIGINT) AS id, customer_name,
        |  CAST(tax_rate AS DOUBLE) AS tax_rate, opened_at, is_active
        |FROM (VALUES
        |  (1, 'Alpha Corp', 0.07, TIMESTAMP '2024-01-01 08:30:00', true),
        |  (2, 'Beta LLC', 0.085, TIMESTAMP '2024-02-15 12:00:00', false),
        |  (3, 'Gamma Inc', NULL, TIMESTAMP '2024-03-01 00:00:00', true))
        |  AS t(id, customer_name, tax_rate, opened_at, is_active)
        |ORDER BY id""".stripMargin,

    "q_test_unique" ->
      """SELECT l_orderkey, COUNT(*) AS n_records FROM lineitem
        |WHERE l_orderkey IS NOT NULL
        |GROUP BY l_orderkey HAVING COUNT(*) > 1 ORDER BY l_orderkey""".stripMargin,

    "q_test_not_null" ->
      "SELECT o_orderkey FROM orders WHERE o_orderkey IS NULL",

    "q_test_accepted_values" ->
      """SELECT o_orderstatus AS value_field, COUNT(*) AS n_records
        |FROM orders GROUP BY o_orderstatus
        |HAVING o_orderstatus NOT IN ('O','F') ORDER BY value_field""".stripMargin,

    "q_test_relationships" ->
      """SELECT o_orderkey AS from_field, COUNT(*) AS n FROM orders
        |WHERE o_orderkey IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderkey ORDER BY from_field""".stripMargin,

    "q_test_severity" ->
      """WITH bad AS (
        |  SELECT COUNT(*) AS n FROM (
        |    SELECT o_orderstatus FROM orders GROUP BY o_orderstatus
        |    HAVING o_orderstatus NOT IN ('O','F')) x)
        |SELECT 'clean_pass' AS case_name, 'pass' AS status, CAST(0 AS BIGINT) AS failures
        |UNION ALL SELECT 'hard_fail', 'fail', n FROM bad
        |UNION ALL SELECT 'warn_only', 'warn', n FROM bad
        |ORDER BY case_name""".stripMargin,

    "q_unit_test" -> "SELECT 'pass' AS status, CAST(0 AS BIGINT) AS diff_rows",

    "q_mat_function" ->
      """SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
        |            WHEN o_totalprice < 10000 THEN 'mid'
        |            ELSE 'large' END AS bucket, COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_freshness" ->
      """SELECT max(ts) AS max_loaded_at,
        |  CAST(round(date_diff('millisecond', max(ts), TIMESTAMP '2024-02-01 00:00:00') / 1000.0) AS BIGINT) AS age_seconds,
        |  CASE WHEN date_diff('millisecond', max(ts), TIMESTAMP '2024-02-01 00:00:00') / 1000.0 > 7*86400 THEN 'error'
        |       WHEN date_diff('millisecond', max(ts), TIMESTAMP '2024-02-01 00:00:00') / 1000.0 > 12*3600 THEN 'warn'
        |       ELSE 'pass' END AS status
        |FROM events""".stripMargin,

    "q_freshness_metadata" ->
      """SELECT 'age_13h' AS case_name, 'warn' AS status
        |UNION ALL SELECT 'age_1h', 'pass'
        |UNION ALL SELECT 'age_8d', 'error'
        |ORDER BY case_name""".stripMargin,

    "q_mat_clone" ->
      "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey",

    "q_mat_mview" ->
      """SELECT step, status, outcome,
        |  (SELECT COUNT(DISTINCT n_regionkey) FROM nation) AS n_rows,
        |  partition_cols
        |FROM (VALUES
        |  ('1_create', 'success', 'created', ''),
        |  ('2_refresh', 'success', 'refreshed', ''),
        |  ('3_drift_fail', 'error', 'fail', ''),
        |  ('4_drift_continue', 'success', 'skipped', ''),
        |  ('5_drift_apply', 'success', 'applied', 'n_regionkey'),
        |  ('6_refresh_new_config', 'success', 'refreshed', 'n_regionkey'),
        |  ('7_full_refresh', 'success', 'full-refresh', ''))
        |  AS t(step, status, outcome, partition_cols)
        |ORDER BY step""".stripMargin,

    "q_test_store_failures" ->
      """SELECT o_orderstatus AS value_field, COUNT(*) AS n_records
        |FROM orders GROUP BY o_orderstatus
        |HAVING o_orderstatus NOT IN ('O','F') ORDER BY value_field""".stripMargin,

    "q_agate_ops" ->
      """SELECT 'cell_0_name' AS stat,
        |  (SELECT n_name FROM nation WHERE n_nationkey = 0) AS value
        |UNION ALL SELECT 'distinct_regions',
        |  CAST((SELECT COUNT(DISTINCT n_regionkey) FROM nation) AS VARCHAR)
        |UNION ALL SELECT 'first_sorted_name',
        |  (SELECT min(n_name) FROM nation)
        |UNION ALL SELECT 'max_group_size',
        |  CAST((SELECT max(n) FROM (SELECT COUNT(*) AS n FROM nation
        |        GROUP BY n_regionkey) g) AS VARCHAR)
        |UNION ALL SELECT 'rows_without_nulls',
        |  CAST((SELECT COUNT(*) FROM nation WHERE n_name IS NOT NULL) AS VARCHAR)
        |ORDER BY stat""".stripMargin
  )
}
