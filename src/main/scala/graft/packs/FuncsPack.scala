package graft.packs

import graft.Tables
import graft.funcs.CrossDb
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-db function macros (SURVEY §2.E) — every `MA/utils/` macro
  * exercised through [[graft.funcs.CrossDb]] with a DuckDB oracle. */
object FuncsPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // dateadd over year/month/day/hour units.
    "q_fn_dateadd" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").filter(col("o_orderkey") % 97 === 0)
      o.select(
        col("o_orderkey"),
        CrossDb.dateadd("year", lit(1), col("o_orderdate")).as("plus_year"),
        CrossDb.dateadd("month", lit(3), col("o_orderdate")).as("plus_months"),
        CrossDb.dateadd("day", lit(45), col("o_orderdate")).as("plus_days"),
        CrossDb.dateadd("hour", lit(36), col("o_orderdate")).as("plus_hours"))
        .orderBy("o_orderkey")
    }),

    // datediff boundary-count semantics.
    "q_fn_datediff" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").filter(col("o_orderkey") % 97 === 0)
      val anchor = lit("1998-06-15 12:00:00").cast("timestamp")
      o.select(
        col("o_orderkey"),
        CrossDb.datediff("year", col("o_orderdate"), anchor).cast("bigint").as("dy"),
        CrossDb.datediff("month", col("o_orderdate"), anchor).cast("bigint").as("dm"),
        CrossDb.datediff("day", col("o_orderdate"), anchor).cast("bigint").as("dd"),
        CrossDb.datediff("hour", col("o_orderdate"), anchor).cast("bigint").as("dh"))
        .orderBy("o_orderkey")
    }),

    // date_trunc + last_day (month/quarter/year variants).
    "q_fn_date_trunc_last_day" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").filter(col("o_orderkey") % 97 === 0)
      o.select(
        col("o_orderkey"),
        CrossDb.dateTrunc("month", col("o_orderdate")).as("trunc_month"),
        CrossDb.dateTrunc("quarter", col("o_orderdate")).as("trunc_quarter"),
        CrossDb.lastDay(col("o_orderdate")).cast("date").as("month_end"),
        CrossDb.lastDay(col("o_orderdate"), "year").cast("date").as("year_end"))
        .orderBy("o_orderkey")
    }),

    // date_spine: sequence+explode replaces the reference's CTE ladder.
    "q_fn_date_spine" -> ((s, _) => {
      CrossDb.dateSpine(s, "day", "1998-01-01", "1998-03-01")
        .select(col("date_day").cast("date").as("date_day"))
        .orderBy("date_day")
    }),

    // generate_series.
    "q_fn_generate_series" -> ((s, _) => {
      CrossDb.generateSeries(s, 1000).orderBy("generated_number")
    }),

    // listagg: ordered, delimited, with limit.
    "q_fn_listagg" -> ((s, dir) => {
      val n = Tables(s, dir, "nation")
      n.groupBy(col("n_regionkey"))
        .agg(
          CrossDb.listagg(col("n_name"), "|").as("all_names"),
          CrossDb.listagg(col("n_name"), ",", Some(2)).as("first_two"))
        .orderBy("n_regionkey")
    }),

    // hash + generate_surrogate_key.
    "q_fn_hash" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").filter(col("o_orderkey") % 397 === 0)
      o.select(
        col("o_orderkey"),
        CrossDb.hash(col("o_orderstatus")).as("status_hash"),
        CrossDb.surrogateKey(Seq(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"))).as("sk"))
        .orderBy("o_orderkey")
    }),

    // string macros: concat/length/position/replace/right/split_part.
    "q_fn_strings" -> ((s, dir) => {
      val p = Tables(s, dir, "part").filter(col("p_partkey") % 131 === 0)
      p.select(
        col("p_partkey"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("branded"),
        length(col("p_name")).as("name_len"),
        CrossDb.position("#", col("p_brand")).as("hash_pos"),
        regexp_replace(col("p_type"), lit(" "), lit("_")).as("type_snake"),
        CrossDb.right(col("p_name"), 5).as("name_tail"),
        CrossDb.splitPart(col("p_type"), " ", 1).as("type_first"),
        CrossDb.splitPart(col("p_type"), " ", -1).as("type_last"))
        .orderBy("p_partkey")
    }),

    // safe_cast + cast + cast_bool_to_text + null-safe equals.
    "q_fn_casts" -> ((s, dir) => {
      val p = Tables(s, dir, "part").filter(col("p_partkey") % 131 === 0)
      p.select(
        col("p_partkey"),
        CrossDb.safeCast(col("p_brand"), "int").as("brand_as_int"), // nulls
        CrossDb.safeCast(CrossDb.splitPart(col("p_brand"), "#", 2), "int")
          .as("brand_num"),
        CrossDb.castBoolToText(col("p_size") > 25).as("is_big"),
        CrossDb.equalsNullSafe(
          CrossDb.safeCast(col("p_brand"), "int"),
          CrossDb.safeCast(col("p_type"), "int")).as("both_null_eq"))
        .orderBy("p_partkey")
    }),

    // any_value + bool_or aggregates.
    "q_fn_aggs" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.groupBy(col("o_custkey"))
        .agg(
          CrossDb.anyValue(col("o_custkey") % 100).as("mod_val"),
          CrossDb.boolOr(col("o_totalprice") > 100000).as("has_big"),
          count(lit(1)).as("n"))
        .filter(col("o_custkey") % 29 === 0)
        .orderBy("o_custkey")
    }),

    // array_construct / append / concat (stringified for stable compare).
    "q_fn_arrays" -> ((s, dir) => {
      val n = Tables(s, dir, "nation").filter(col("n_nationkey") < 5)
      val base = CrossDb.arrayConstruct(col("n_name"), lit("x"))
      n.select(
        col("n_nationkey"),
        concat_ws(",", base).as("constructed"),
        concat_ws(",", CrossDb.arrayAppend(base, lit("y"))).as("appended"),
        concat_ws(",", CrossDb.arrayConcat(base,
          CrossDb.arrayConstruct(lit("a"), lit("b")))).as("concatenated"),
        size(CrossDb.arrayAppend(base, lit("z"))).as("appended_len"))
        .orderBy("n_nationkey")
    }),

    // dbt_utils.pivot: one conditional aggregate per pinned value — the
    // value list is pinned, never discovered (no driver collect at scale).
    "q_fn_pivot" -> ((s, dir) => {
      val cols = CrossDb.pivotColumns(col("event_type"),
        Seq("click", "view", "purchase", "signup", "error"), agg = "sum")
      Tables(s, dir, "events")
        .filter(col("user_id") % 29 === 0)
        .select("user_id", "event_type")
        .groupBy(col("user_id"))
        .agg(cols.head, cols.tail: _*)
        .orderBy("user_id")
    }),

    // dbt_utils.unpivot: ONE stack() generator (map-side row expansion)
    // instead of dbt_utils' UNION ALL per column (N scans of the fact).
    "q_fn_unpivot" -> ((s, dir) => {
      CrossDb.unpivot(
        Tables(s, dir, "part").filter(col("p_partkey") % 97 === 0),
        idCols = Seq("p_partkey"), valueCols = Seq("p_size", "p_retailprice"))
        .orderBy("p_partkey", "field_name")
    }),

    // except / intersect set operators (native in Spark SQL).
    "q_fn_setops" -> ((s, dir) => {
      val early = Tables(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_custkey").distinct()
      val late = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .select("o_custkey").distinct()
      val onlyEarly = early.except(late).withColumn("bucket", lit("only_early"))
      val both = early.intersect(late).withColumn("bucket", lit("both"))
      onlyEarly.unionByName(both)
        .groupBy("bucket").agg(count(lit(1)).as("n")).orderBy("bucket")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_fn_dateadd" ->
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 1 YEAR AS plus_year,
        |  o_orderdate + INTERVAL 3 MONTH AS plus_months,
        |  o_orderdate + INTERVAL 45 DAY AS plus_days,
        |  o_orderdate + INTERVAL 36 HOUR AS plus_hours
        |FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""".stripMargin,

    "q_fn_datediff" ->
      """SELECT o_orderkey,
        |  date_diff('year', o_orderdate, TIMESTAMP '1998-06-15 12:00:00') AS dy,
        |  date_diff('month', o_orderdate, TIMESTAMP '1998-06-15 12:00:00') AS dm,
        |  date_diff('day', o_orderdate, TIMESTAMP '1998-06-15 12:00:00') AS dd,
        |  date_diff('hour', o_orderdate, TIMESTAMP '1998-06-15 12:00:00') AS dh
        |FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""".stripMargin,

    "q_fn_date_trunc_last_day" ->
      """SELECT o_orderkey,
        |  date_trunc('month', o_orderdate) AS trunc_month,
        |  date_trunc('quarter', o_orderdate) AS trunc_quarter,
        |  CAST(last_day(o_orderdate) AS DATE) AS month_end,
        |  CAST(date_trunc('year', o_orderdate) + INTERVAL 1 YEAR - INTERVAL 1 DAY AS DATE) AS year_end
        |FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""".stripMargin,

    "q_fn_date_spine" ->
      """SELECT CAST(d AS DATE) AS date_day
        |FROM generate_series(DATE '1998-01-01', DATE '1998-02-28', INTERVAL 1 DAY) t(d)
        |ORDER BY date_day""".stripMargin,

    "q_fn_generate_series" ->
      """SELECT g AS generated_number
        |FROM generate_series(1, 1000) t(g) ORDER BY generated_number""".stripMargin,

    "q_fn_listagg" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, '|' ORDER BY n_name) AS all_names,
        |  string_agg(n_name, ',' ORDER BY n_name) FILTER (WHERE rk <= 2) AS first_two
        |FROM (SELECT n_regionkey, n_name,
        |        ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_name) AS rk
        |      FROM nation) t
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "q_fn_hash" ->
      """SELECT o_orderkey,
        |  md5(CAST(o_orderstatus AS VARCHAR)) AS status_hash,
        |  md5(concat_ws('-',
        |    coalesce(CAST(o_orderkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
        |    coalesce(CAST(o_custkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
        |    coalesce(CAST(o_orderstatus AS VARCHAR), '_dbt_utils_surrogate_key_null_'))) AS sk
        |FROM orders WHERE o_orderkey % 397 = 0 ORDER BY o_orderkey""".stripMargin,

    "q_fn_strings" ->
      """SELECT p_partkey,
        |  concat(p_brand, ':', p_type) AS branded,
        |  length(p_name) AS name_len,
        |  strpos(p_brand, '#') AS hash_pos,
        |  replace(p_type, ' ', '_') AS type_snake,
        |  CASE WHEN length(p_name) < 5 THEN p_name
        |       ELSE substr(p_name, length(p_name) - 4, 5) END AS name_tail,
        |  split_part(p_type, ' ', 1) AS type_first,
        |  list_extract(str_split(p_type, ' '), -1) AS type_last
        |FROM part WHERE p_partkey % 131 = 0 ORDER BY p_partkey""".stripMargin,

    "q_fn_casts" ->
      """SELECT p_partkey,
        |  TRY_CAST(p_brand AS INT) AS brand_as_int,
        |  TRY_CAST(split_part(p_brand, '#', 2) AS INT) AS brand_num,
        |  CASE WHEN (p_size > 25) IS NULL THEN NULL
        |       WHEN p_size > 25 THEN 'true' ELSE 'false' END AS is_big,
        |  TRY_CAST(p_brand AS INT) IS NOT DISTINCT FROM TRY_CAST(p_type AS INT) AS both_null_eq
        |FROM part WHERE p_partkey % 131 = 0 ORDER BY p_partkey""".stripMargin,

    "q_fn_aggs" ->
      """SELECT o_custkey,
        |  any_value(o_custkey % 100) AS mod_val,
        |  bool_or(o_totalprice > 100000) AS has_big,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_custkey
        |HAVING o_custkey % 29 = 0 ORDER BY o_custkey""".stripMargin,

    "q_fn_arrays" ->
      """SELECT n_nationkey,
        |  concat_ws(',', n_name, 'x') AS constructed,
        |  concat_ws(',', n_name, 'x', 'y') AS appended,
        |  concat_ws(',', n_name, 'x', 'a', 'b') AS concatenated,
        |  CAST(3 AS INT) AS appended_len
        |FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey""".stripMargin,

    "q_fn_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM events WHERE user_id % 29 = 0
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_fn_unpivot" ->
      """SELECT p_partkey, 'p_size' AS field_name, CAST(p_size AS DOUBLE) AS value
        |FROM part WHERE p_partkey % 97 = 0
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE)
        |FROM part WHERE p_partkey % 97 = 0
        |ORDER BY p_partkey, field_name""".stripMargin,

    "q_fn_setops" ->
      """WITH early AS (SELECT DISTINCT o_custkey FROM orders
        |               WHERE o_orderdate < TIMESTAMP '1997-01-01'),
        |late AS (SELECT DISTINCT o_custkey FROM orders
        |         WHERE o_orderdate >= TIMESTAMP '1997-01-01')
        |SELECT 'both' AS bucket, COUNT(*) AS n
        |FROM (SELECT * FROM early INTERSECT SELECT * FROM late) b
        |UNION ALL
        |SELECT 'only_early', COUNT(*)
        |FROM (SELECT * FROM early EXCEPT SELECT * FROM late) o
        |ORDER BY bucket""".stripMargin
  )
}
