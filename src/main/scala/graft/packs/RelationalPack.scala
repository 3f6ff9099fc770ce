package graft.packs

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Headline relational queries (scan/filter/agg/join/window/set ops).
  *
  * These are the "warehouse side" of the engine — what Fusion delegates to
  * the target database (SURVEY.md §0) Catalyst executes natively here. They
  * double as the benchmark suite: filters and projections must reach the
  * parquet scan, small dimensions are broadcast, aggregates are partial
  * (map-side) before the shuffle.
  */
object RelationalPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: single scan, partial agg, 6-group out.
    "q1_agg" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          moneyOut(sum(dec(col("l_quantity")))).as("sum_qty"),
          moneyOut(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          moneyOut(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q3-style: shipping-priority revenue; two joins + top-k.
    "q3_topk" -> ((s, dir) => {
      val cust = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(moneyOut(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))))
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast("date").as("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    }),

    // TPC-H Q5-style star join: region→nation→customer→orders→lineitem.
    // region/nation are tiny → broadcast; the fact-side join shuffles once.
    "q5_star_join" -> ((s, dir) => {
      val region = Tables(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = Tables(s, dir, "nation")
      val cust = Tables(s, dir, "customer").select("c_custkey", "c_nationkey")
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust.join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
          .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
          .select(col("c_custkey"), col("n_name"))),
          ord("o_custkey") === col("c_custkey"))
        .groupBy(col("n_name"))
        .agg(moneyOut(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Broadcast dimension join + agg by brand.
    "q_brand_agg" -> ((s, dir) => {
      val part = Tables(s, dir, "part").select("p_partkey", "p_brand")
      val li = Tables(s, dir, "lineitem").select("l_partkey", "l_quantity")
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(moneyOut(sum(dec(col("l_quantity")))).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    }),

    // Window: top-3 orders per customer by totalprice (ties → orderkey).
    "q_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .orderBy(col("o_custkey"), col("rk"))
    }),

    // Running window aggregate over events per user.
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          dec(col("value")).as("v"))
        .withColumn("running_value", sum(col("v")).over(w).cast("double"))
        .select(col("user_id"), col("event_id"), col("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Rolling 7-day RANGE-frame aggregate: daily totals per user, then a
    // value-based window frame (6 preceding days .. current day) — the
    // time-series shape ROWS frames get wrong when days are missing.
    // Scale shape: the daily pre-aggregate shuffles on (user, day) with
    // map-side partials; the window re-shuffles only the collapsed
    // user×day rows (≪ raw events), and the frame is bounded (≤7 days of
    // peer state per partition cursor).
    "q_window_rolling" -> ((s, dir) => {
      val daily = Tables(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"),
          dec(col("value")).as("v"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("v")).as("dtot"))
        .withColumn("dayn", datediff(col("day"), lit("1970-01-01").cast("date")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("dayn"))
        .rangeBetween(-6, Window.currentRow)
      daily
        .withColumn("rolling_7d", sum(col("dtot")).over(w))
        .select(col("user_id"), col("day"),
          moneyOut(col("dtot")).as("day_total"),
          moneyOut(col("rolling_7d")).as("rolling_7d"))
        .orderBy(col("user_id"), col("day"))
    }),

    // Anti join: orders with no lineitems (NOT EXISTS).
    "q_anti_join" -> ((s, dir) => {
      val ord = Tables(s, dir, "orders").select("o_orderkey", "o_orderstatus")
      val li = Tables(s, dir, "lineitem").select("l_orderkey")
      ord.join(li, ord("o_orderkey") === li("l_orderkey"), "left_anti")
        .orderBy(col("o_orderkey"))
    }),

    // Semi join: parts that appear in lineitem (EXISTS).
    "q_semi_join" -> ((s, dir) => {
      val part = Tables(s, dir, "part").select("p_partkey", "p_brand")
      val li = Tables(s, dir, "lineitem").select("l_partkey")
      part.join(li, part("p_partkey") === li("l_partkey"), "left_semi")
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n_parts"))
        .orderBy(col("p_brand"))
    }),

    // Distinct aggregation.
    "q_distinct" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus"))
    }),

    // Grouping-sets style rollup on orders.
    "q_rollup" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(moneyOut(sum(dec(col("o_totalprice")))).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // CUBE + grouping_id: all four aggregation grids in one pass —
    // Catalyst's Expand feeds ONE partial-agg'd exchange, not four scans.
    "q_cube" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(moneyOut(sum(dec(col("l_extendedprice")))).as("sum_price"),
          count(lit(1)).as("n"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Correlated-style scalar subquery: orders above their customer average.
    "q_above_avg" -> ((s, dir) => {
      val ord = Tables(s, dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
      val avgs = ord.groupBy(col("o_custkey"))
        .agg((sum(dec(col("o_totalprice"))).cast("double") / count(lit(1)))
          .as("avg_price"))
      ord.join(avgs, "o_custkey")
        .filter(col("o_totalprice") > col("avg_price") * 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_topk" ->
      """SELECT l_orderkey,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
        |  CAST(o_orderdate AS DATE) AS o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_star_join" ->
      """SELECT n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |  JOIN customer ON c_nationkey = n_nationkey
        |  JOIN orders ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_brand_agg" ->
      """SELECT p_brand,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q_window_running" ->
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4)))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q_window_rolling" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dayn,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS dtot
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT user_id, day,
        |  CAST(CAST(dtot AS DECIMAL(38,4)) AS DOUBLE) AS day_total,
        |  CAST(CAST(SUM(dtot) OVER (PARTITION BY user_id ORDER BY dayn
        |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DECIMAL(38,4))
        |    AS DOUBLE) AS rolling_7d
        |FROM daily ORDER BY user_id, day""".stripMargin,

    "q_anti_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_semi_join" ->
      """SELECT p_brand, COUNT(*) AS n_parts FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin,

    "q_above_avg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM orders JOIN (
        |  SELECT o_custkey AS k,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price
        |  FROM orders GROUP BY o_custkey) a ON o_custkey = a.k
        |WHERE o_totalprice > avg_price * 2
        |ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
