package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables
import graft.functions.{durationMmSs, sortedSetString}

/** Core relational query surface (SURVEY.md §2.D aggregations, §2.C joins,
  * §2.E window, §2.F top-k, §2.G union, §2.H scalar functions).
  *
  * Design notes for scale (tested local[32], designed for 1000 executors):
  *  - every aggregation is a plain hash aggregate → Catalyst does partial
  *    (map-side) + final aggregation automatically; no driver collects.
  *  - small dimensions (region 5 rows, nation 25 rows) are explicitly
  *    `broadcast()` so the fact-side join is a BroadcastHashJoin with no
  *    shuffle of the large table.
  *  - all floating aggregates are `round`ed in BOTH engines so summation
  *    order (which differs across partitionings) cannot flip the hash.
  *  - timestamps are rendered as strings / epoch seconds at the edge: the
  *    testdata writes ns-precision parquet, Spark truncates to micros while
  *    other engines keep ns — raw timestamp columns would never hash-match.
  */
object Relational {

  // ---------------------------------------------------------------- q1
  /** TPC-H Q1-shaped pricing summary: the canonical multi-aggregate scan.
    * Mirrors the reference's per-group count/avg/min/max reporting shape
    * (reference staff_reports.json:9-15) on the lineitem fact table.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  private val pricingSummarySql =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q2
  /** Top-k by value with deterministic tiebreak → TakeOrderedAndProject
    * physical op (no global sort materialization). SURVEY.md §2.F O2.
    */
  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  private val topkOrdersSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q3
  /** Revenue per nation: 4-way join (fact × fact × dim × dim) with a
    * selective date predicate that Catalyst pushes into the orders scan.
    * nation (25 rows) is broadcast → no shuffle of lineitem for that join.
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    Tables.lineitem(spark, dir)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  private val revenueByNationSql =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name""".stripMargin

  // ---------------------------------------------------------------- q4
  /** Per-region order stats with conditional aggregation (sum(CASE WHEN)). */
  def regionOrderShare(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice"))
          .otherwise(lit(0.0))), 2).as("urgent_revenue"),
        round(sum("o_totalprice"), 2).as("total_revenue"))

  private val regionOrderShareSql =
    """SELECT r_name, count(*) AS n_orders,
      |  round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END), 2) AS urgent_revenue,
      |  round(sum(o_totalprice), 2) AS total_revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  // ---------------------------------------------------------------- q5
  /** Per-(customer, day) order counts — the shared grain of q05 and q12. */
  private def dailyCounts(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("cnt"))

  /** Two-level aggregation: per-day counts, then per-customer avg/min/max of
    * those counts — the reference's per-staff tickets/day stats shape
    * (SURVEY.md §2.D A2; reference staff_reports.json:10-12), including
    * integer-rounded averages.
    */
  def dailyOrderStats(spark: SparkSession, dir: String): DataFrame =
    dailyCounts(Tables.orders(spark, dir))
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("days_active"),
        round(avg("cnt")).cast("long").as("avg_daily_orders"),
        min("cnt").as("min_daily_orders"),
        max("cnt").as("max_daily_orders"),
        sum("cnt").cast("long").as("total_orders"))

  private val dailyOrderStatsSql =
    """SELECT o_custkey, count(*) AS days_active,
      |  CAST(round(avg(cnt), 0) AS BIGINT) AS avg_daily_orders,
      |  min(cnt) AS min_daily_orders,
      |  max(cnt) AS max_daily_orders,
      |  CAST(sum(cnt) AS BIGINT) AS total_orders
      |FROM (SELECT o_custkey, CAST(o_orderdate AS DATE) AS day, count(*) AS cnt
      |      FROM orders GROUP BY 1, 2) daily
      |GROUP BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q6
  /** Last-write-wins per key via row_number window — the exact dedupe
    * expression our warehouse merge uses for PostgreSQL-style
    * `ON CONFLICT DO UPDATE` semantics (SURVEY.md §2.A SNK2, §2.E).
    */
  def latestEventPerUser(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        round(col("value"), 2).as("last_value"))
  }

  private val latestEventPerUserSql =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
      |  round(value, 2) AS last_value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) t
      |WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- q7
  /** Multi-source union with a source tag — the reference's multi-source
    * accumulation pattern (`_source` column, SURVEY.md §2.G): two filtered
    * reads unioned by name, then aggregated.
    */
  def unionPriorityBuckets(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val high = orders
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .withColumn("bucket", lit("high"))
    val low = orders
      .filter(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .withColumn("bucket", lit("low"))
    high.unionByName(low)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
  }

  private val unionPriorityBucketsSql =
    """SELECT bucket, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
      |FROM (
      |  SELECT 'high' AS bucket, o_totalprice FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
      |  UNION ALL
      |  SELECT 'low' AS bucket, o_totalprice FROM orders WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |) t GROUP BY bucket""".stripMargin

  // ---------------------------------------------------------------- q8
  /** Semi-structured extraction: JSON path into the events `props` payload
    * then aggregate — the reference's nested-JSON handling surface
    * (SURVEY.md §2.H F1) pointed at analytics instead of the sink.
    */
  def jsonExtractAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum("k").cast("long").as("sum_k"),
        round(avg("k"), 4).as("avg_k"))

  private val jsonExtractAggSql =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  round(avg(CAST(props->>'$.k' AS BIGINT)), 4) AS avg_k
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- q9
  /** Per-user activity span with the reference's `"<M>m <S>s"` duration
    * formatting, minutes uncapped (SURVEY.md §2.D A3/A4).
    */
  def userSessionSpan(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max("ts")) - unix_timestamp(min("ts"))).as("span_secs"))
      .withColumn("span_fmt", durationMmSs(col("span_secs")))

  private val userSessionSpanSql =
    """SELECT user_id, n_events, span_secs,
      |  CAST(CAST(floor(span_secs / 60.0) AS BIGINT) AS VARCHAR) || 'm ' || CAST(span_secs % 60 AS VARCHAR) || 's' AS span_fmt
      |FROM (SELECT user_id, count(*) AS n_events,
      |        CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS span_secs
      |      FROM events GROUP BY user_id) t""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Event-time tumbling window aggregate (batch shape of the Structured
    * Streaming windowed agg, SURVEY.md §2.I S4). Window start is rendered
    * as a string so ns-vs-µs precision cannot affect the hash.
    */
  def hourlyEventWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  private val hourlyEventWindowsSql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start,
      |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Last-write-wins collapse of lineitem to one row per order — the
    * warehouse merge dedupe (SNK2) expressed as a standalone query.
    */
  def latestLineitemPerOrder(spark: SparkSession, dir: String): DataFrame = {
    // (l_shipdate, l_linenumber) is not unique in the synthetic data — add
    // enough tiebreaks that the chosen row is fully deterministic.
    val w = Window.partitionBy("l_orderkey").orderBy(
      desc("l_shipdate"), desc("l_linenumber"), desc("l_extendedprice"),
      desc("l_partkey"), desc("l_suppkey"))
    Tables.lineitem(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("l_orderkey"),
        col("l_linenumber").as("last_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("last_ship_day"),
        col("l_extendedprice").as("last_price"))
  }

  private val latestLineitemPerOrderSql =
    """SELECT l_orderkey, l_linenumber AS last_linenumber,
      |  strftime(l_shipdate, '%Y-%m-%d') AS last_ship_day,
      |  l_extendedprice AS last_price
      |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate DESC, l_linenumber DESC, l_extendedprice DESC, l_partkey DESC, l_suppkey DESC) AS rn
      |      FROM lineitem) t
      |WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Flagship: the reference's per-staff report (SURVEY.md §2.D A1-A7;
    * reference staff_reports.json:2-16) re-targeted at the star schema —
    * per customer: totals, sorted distinct set, per-day stats with
    * integer-rounded avg, and an uncapped `"<M>m <S>s"` duration.
    */
  def customerReport(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val orderAgg = orders.groupBy("o_custkey").agg(
      count(lit(1)).as("total_orders"),
      sortedSetString(col("o_orderpriority")).as("priorities"))
    val daily = dailyCounts(orders)
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("days_active"),
        round(avg("cnt")).cast("long").as("avg_daily_orders"),
        min("cnt").as("min_daily_orders"),
        max("cnt").as("max_daily_orders"))
    val fulfil = Tables.lineitem(spark, dir)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(floor(avg(unix_timestamp(col("l_shipdate")) - unix_timestamp(col("o_orderdate"))))
        .cast("long").as("fulfil_secs"))
    Tables.customer(spark, dir)
      .join(orderAgg, col("c_custkey") === orderAgg("o_custkey")).drop("o_custkey")
      .join(daily, col("c_custkey") === daily("o_custkey")).drop("o_custkey")
      .join(fulfil, col("c_custkey") === fulfil("o_custkey"), "left").drop("o_custkey")
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("c_name").as("customer_name"),
        col("n_name").as("nation_name"),
        col("total_orders"), col("priorities"), col("days_active"),
        col("avg_daily_orders"), col("min_daily_orders"), col("max_daily_orders"),
        durationMmSs(col("fulfil_secs")).as("avg_fulfil"))
  }

  private val customerReportSql =
    """WITH order_agg AS (
      |  SELECT o_custkey, count(*) AS total_orders,
      |    array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities
      |  FROM orders GROUP BY o_custkey
      |), daily AS (
      |  SELECT o_custkey, count(*) AS days_active,
      |    CAST(round(avg(cnt), 0) AS BIGINT) AS avg_daily_orders,
      |    min(cnt) AS min_daily_orders, max(cnt) AS max_daily_orders
      |  FROM (SELECT o_custkey, CAST(o_orderdate AS DATE) AS day, count(*) AS cnt
      |        FROM orders GROUP BY 1, 2) d
      |  GROUP BY o_custkey
      |), fulfil AS (
      |  SELECT o_custkey,
      |    CAST(floor(avg(CAST(floor(epoch(l_shipdate)) AS BIGINT) - CAST(floor(epoch(o_orderdate)) AS BIGINT))) AS BIGINT) AS fulfil_secs
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY o_custkey
      |)
      |SELECT c_name AS customer_name, n_name AS nation_name,
      |  total_orders, priorities, days_active,
      |  avg_daily_orders, min_daily_orders, max_daily_orders,
      |  CAST(CAST(floor(fulfil_secs / 60.0) AS BIGINT) AS VARCHAR) || 'm ' || CAST(fulfil_secs % 60 AS VARCHAR) || 's' AS avg_fulfil
      |FROM customer
      |JOIN order_agg ON c_custkey = order_agg.o_custkey
      |JOIN daily ON c_custkey = daily.o_custkey
      |LEFT JOIN fulfil ON c_custkey = fulfil.o_custkey
      |JOIN nation ON c_nationkey = n_nationkey""".stripMargin

  // --------------------------------------------------------------- q153
  /** Supply concentration per nation — the Herfindahl–Hirschman index
    * over part-brand revenue shares within each supplier nation, in
    * exact integer arithmetic: shares in basis points (cents·10⁴ DIV
    * national total), HHI = Σ share_bp² (10⁸ = monopoly). The
    * antitrust-style concentration metric a procurement/risk report
    * wants: a nation whose revenue is one brand is fragile however large
    * its total.
    *
    * Scale shape: one fact aggregate to (nation, brand), a nation-keyed
    * window over that ≤ nations×brands table, and a 25-row rollup —
    * dims broadcast.
    */
  def revenueConcentration(spark: SparkSession, dir: String): DataFrame = {
    val byBrand = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(sum(expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
        .as("cents"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("n_name")
    byBrand
      .withColumn("total", sum(col("cents")).over(w))
      .withColumn("share_bp", expr("cents * 10000 DIV total"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_brands"),
        min(col("total")).as("total_cents"),
        sum(expr("share_bp * share_bp")).as("hhi"))
  }

  private val revenueConcentrationSql =
    """WITH b AS (
      |  SELECT n.n_name, p.p_brand,
      |    sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
      |      AS cents
      |  FROM lineitem l
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN nation n ON n.n_nationkey = s.s_nationkey
      |  JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1, 2
      |), sh AS (
      |  SELECT n_name, p_brand, cents,
      |    sum(cents) OVER (PARTITION BY n_name) AS total
      |  FROM b
      |)
      |SELECT n_name, CAST(count(*) AS BIGINT) AS n_brands,
      |  CAST(min(total) AS BIGINT) AS total_cents,
      |  CAST(sum((cents * 10000 // total) * (cents * 10000 // total)) AS BIGINT)
      |    AS hhi
      |FROM sh GROUP BY 1""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q153_revenue_concentration", revenueConcentration _,
      Some(revenueConcentrationSql)),
    NamedQuery("q01_pricing_summary", pricingSummary _, Some(pricingSummarySql)),
    NamedQuery("q02_topk_orders", topkOrders _, Some(topkOrdersSql)),
    NamedQuery("q03_revenue_by_nation", revenueByNation _, Some(revenueByNationSql)),
    NamedQuery("q04_region_order_share", regionOrderShare _, Some(regionOrderShareSql)),
    NamedQuery("q05_daily_order_stats", dailyOrderStats _, Some(dailyOrderStatsSql)),
    NamedQuery("q06_latest_event_per_user", latestEventPerUser _, Some(latestEventPerUserSql)),
    NamedQuery("q07_union_priority_buckets", unionPriorityBuckets _, Some(unionPriorityBucketsSql)),
    NamedQuery("q08_json_extract_agg", jsonExtractAgg _, Some(jsonExtractAggSql)),
    NamedQuery("q09_user_session_span", userSessionSpan _, Some(userSessionSpanSql)),
    NamedQuery("q10_hourly_event_windows", hourlyEventWindows _, Some(hourlyEventWindowsSql)),
    NamedQuery("q11_latest_lineitem_per_order", latestLineitemPerOrder _, Some(latestLineitemPerOrderSql)),
    NamedQuery("q12_customer_report", customerReport _, Some(customerReportSql)))
}
