package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** Extended relational surface: as-of join, semi/anti joins, rollup,
  * lag-based time-series deltas, exact percentiles.
  */
object Extended {

  // ---------------------------------------------------------------- q23
  /** As-of join: for each event, the customer's most recent order at the
    * event's timestamp. Right side pre-collapsed to one row per
    * (custkey, orderdate) so both engines resolve ties identically.
    */
  def asofLatestOrder(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(desc("o_orderkey"))
    val orders1 = Tables.orders(spark, dir)
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    val events = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    AsOfJoin.asOfBackward(events, orders1, "user_id", "o_custkey", "ts", "o_orderdate")
      .select(
        col("event_id"), col("user_id"),
        col("asof.o_orderkey").as("asof_orderkey"),
        round(col("asof.o_totalprice"), 2).as("asof_price"))
  }

  private val asofLatestOrderSql =
    """WITH o1 AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
      |    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
      |    FROM orders) t WHERE rn = 1
      |)
      |SELECT e.event_id, e.user_id, o1.o_orderkey AS asof_orderkey,
      |  round(o1.o_totalprice, 2) AS asof_price
      |FROM events e ASOF LEFT JOIN o1
      |  ON e.user_id = o1.o_custkey AND e.ts >= o1.o_orderdate""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Semi/anti joins: per market segment, customers with and without
    * orders (EXISTS / NOT EXISTS).
    */
  def segmentOrderPresence(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val withOrders = customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with_orders"))
    val withoutOrders = customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("seg2")).agg(count(lit(1)).as("n_without_orders"))
    withOrders
      .join(withoutOrders, col("c_mktsegment") === col("seg2"), "full")
      .select(
        coalesce(col("c_mktsegment"), col("seg2")).as("mktsegment"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
  }

  private val segmentOrderPresenceSql =
    """WITH w AS (
      |  SELECT c_mktsegment, count(*) AS n_with_orders FROM customer c
      |  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |  GROUP BY c_mktsegment
      |), wo AS (
      |  SELECT c_mktsegment, count(*) AS n_without_orders FROM customer c
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |  GROUP BY c_mktsegment
      |)
      |SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS mktsegment,
      |  coalesce(n_with_orders, 0) AS n_with_orders,
      |  coalesce(n_without_orders, 0) AS n_without_orders
      |FROM w FULL JOIN wo ON w.c_mktsegment = wo.c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q25
  /** ROLLUP over (nation, priority): subtotals + grand total, the OLAP
    * grouping-sets surface.
    */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))

  private val rollupRevenueSql =
    """SELECT n_name, o_orderpriority, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP (n_name, o_orderpriority)""".stripMargin

  // ---------------------------------------------------------------- q26
  /** Per-user inter-event gaps via lag(): time-series deltas with a full
    * deterministic ordering.
    */
  def eventDeltas(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_secs", unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")))
      .filter(col("gap_secs").isNotNull)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_gaps"),
        round(avg("gap_secs"), 4).as("avg_gap_secs"),
        max("gap_secs").as("max_gap_secs"))
  }

  private val eventDeltasSql =
    """SELECT user_id, count(*) AS n_gaps,
      |  round(avg(gap_secs), 4) AS avg_gap_secs,
      |  max(gap_secs) AS max_gap_secs
      |FROM (
      |  SELECT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) -
      |      CAST(floor(epoch(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap_secs
      |  FROM events) t
      |WHERE gap_secs IS NOT NULL
      |GROUP BY user_id""".stripMargin

  // ---------------------------------------------------------------- q27
  /** Exact percentiles (sort-based, linear interpolation) per group — one
    * `percentile(col, array(...))` call so the value buffer is built and
    * sorted once, not per-percentile (3× cheaper at 600k rows).
    */
  def pricePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(l_extendedprice, array(0.5D, 0.95D, 0.99D))").as("__ps"))
      .select(
        col("l_returnflag"), col("n"),
        round(col("__ps").getItem(0), 4).as("p50"),
        round(col("__ps").getItem(1), 4).as("p95"),
        round(col("__ps").getItem(2), 4).as("p99"))

  private val pricePercentilesSql =
    """SELECT l_returnflag, count(*) AS n,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Sketch variant of [[pricePercentiles]] — `approx_percentile`
    * (bounded-memory quantile summary with tunable `accuracy`). The exact
    * form buffers and sorts every group value; the sketch holds a
    * fixed-size summary per group regardless of row count, which is the
    * only formulation that survives a hot group at 100 TB. Spec-asserted
    * within rank error of the exact result (engine-specific sketch →
    * no external oracle, same treatment as the HLL surface).
    */
  def pricePercentilesApprox(spark: SparkSession, dir: String,
                             accuracy: Int = 10000): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        expr(s"approx_percentile(l_extendedprice, array(0.5D, 0.95D, 0.99D), $accuracy)")
          .as("__ps"))
      .select(
        col("l_returnflag"), col("n"),
        col("__ps").getItem(0).as("p50"),
        col("__ps").getItem(1).as("p95"),
        col("__ps").getItem(2).as("p99"))

  // ---------------------------------------------------------------- q29
  /** Distinct aggregation: per supplier, exact distinct parts/orders plus
    * plain counts — the expand-based distinct-agg plan shape.
    */
  def supplierDistincts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_suppkey")
      .agg(
        count(lit(1)).as("n_items"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        round(sum("l_quantity"), 2).as("sum_qty"))

  private val supplierDistinctsSql =
    """SELECT l_suppkey, count(*) AS n_items,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_orderkey) AS n_orders,
      |  round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem GROUP BY l_suppkey""".stripMargin

  // ---------------------------------------------------------------- q32
  /** Gap-based sessionization (30-min gaps) via the stateful
    * `flatMapGroupsWithState` operator, oracle-checked against the SQL
    * gaps-and-islands formulation. Timestamps compare in microseconds on
    * both sides (ms-truncated math can flip sessions whose gap lands
    * within 1ms of the threshold).
    */
  def eventSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
      .select("event_id", "user_id", "ts", "event_type", "value")
      .as[graft.streaming.Sessionize.Event]
    graft.streaming.Sessionize.sessionsBatch(events, gapSeconds = 1800)
      .toDF()
      .select(
        col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"),
        col("n_events"),
        round(col("total_value"), 2).as("total_value"))
  }

  private val eventSessionsSql =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000 THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), islands AS (
      |  SELECT user_id, ts, value,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked
      |)
      |SELECT user_id,
      |  min(epoch_us(ts)) AS start_us,
      |  max(epoch_us(ts)) AS end_us,
      |  count(*) AS n_events,
      |  round(sum(value), 2) AS total_value
      |FROM islands GROUP BY user_id, sid""".stripMargin

  // ---------------------------------------------------------------- q33
  /** Running per-customer order total — the explicit frame-spec window
    * (`ROWS UNBOUNDED PRECEDING .. CURRENT ROW`). The frame's ordering is
    * total (date then key), so the prefix sums accumulate in the same
    * sequence in any engine and round(2) hash-matches.
    */
  def runningOrderTotals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        round(sum("o_totalprice").over(w), 2).as("running_total"),
        count(lit(1)).over(w).as("running_orders"))
  }

  private val runningOrderTotalsSql =
    """SELECT o_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_day,
      |  round(sum(o_totalprice) OVER w, 2) AS running_total,
      |  count(*) OVER w AS running_orders
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------------------- q31
  /** Distinct-user counts per event type — the gated face of the
    * approximate-distinct surface. The HLL++ sketch itself is
    * deterministic but engine-specific (DuckDB's approx sketch differs),
    * so the ORACLE checks the exact columns and the sketch's error bound
    * is asserted in spec over [[approxDistinctUsersFull]].
    */
  def approxDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    approxDistinctUsersFull(spark, dir).drop("approx_users")

  /** Exact + HLL++ distinct counts side by side (spec surface). */
  def approxDistinctUsersFull(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))

  private val approxDistinctUsersSql =
    """SELECT event_type,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Equi-depth price histogram via quantile boundaries — the optimizer-
    * statistics shape. A global `ntile` would sort the entire column in
    * ONE partition (the classic non-scalable form); instead the 7 inner
    * boundaries come from the same single-pass exact `percentile` q27
    * gates (7 doubles of driver metadata), and every row buckets itself
    * by comparing against those literals — scan + tiny agg + scan, no
    * global sort at any scale. Bucket populations are near-equal rather
    * than exactly equal when ties straddle a boundary; the bucket
    * assignment itself is engine-exact (q27 proves percentile parity,
    * and `>` on identical doubles can't diverge).
    */
  def priceHistogram(spark: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    require(buckets >= 2, s"a histogram needs >= 2 buckets, got $buckets")
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    // percentile over an EMPTY table is null — everything lands in
    // bucket 1 of an aggregation with no input rows, i.e. an empty
    // histogram, which is the right answer rather than an NPE.
    // Parallelism floor (core.Spread) on BOTH passes: the exact
    // percentile's count-map build and the 8-deep bucket chain are the
    // per-row work, and the table is one scan partition at harness scale.
    // Percentile/count/min/max are order-independent, so the spread is
    // result-free.
    val bs = Option(
      graft.core.Spread.ifNarrow(
          Tables.lineitem(spark, dir).select("l_extendedprice"))
        .agg(expr(s"percentile(l_extendedprice, array(${qs.mkString("D,")}D))"))
        .head().getSeq[Double](0)).getOrElse(Seq.empty)
    val bucket = bs.foldLeft(lit(1)) { (acc, b) =>
      acc + when(col("l_extendedprice") > b, 1).otherwise(0)
    }
    graft.core.Spread.ifNarrow(
        Tables.lineitem(spark, dir).select("l_extendedprice"))
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min("l_extendedprice"), 2).as("lo"),
        round(max("l_extendedprice"), 2).as("hi"))
  }

  private val priceHistogramSql = {
    val qs = (1 to 7).map(i => i / 8.0).mkString(", ")
    s"""WITH bs AS (
       |  SELECT unnest(quantile_cont(l_extendedprice, [$qs])) AS b FROM lineitem
       |), bucketed AS (
       |  SELECT l_extendedprice AS p,
       |    CAST(1 + (SELECT count(*) FROM bs WHERE p > b) AS INT) AS bucket
       |  FROM lineitem
       |)
       |SELECT bucket, count(*) AS n,
       |  round(min(p), 2) AS lo, round(max(p), 2) AS hi
       |FROM bucketed GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- q65
  /** Revenue cube over (status, priority): all four grouping sets in one
    * pass, tagged by `grouping_id` (bit semantics agree across engines:
    * leftmost column = MSB, 1 = rolled up). Complements q25's ROLLUP —
    * together they cover Spark's grouping-sets surface.
    */
  def cubeRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"),
        grouping_id().as("gid"))

  private val cubeRevenueSql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS revenue,
      |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  // ---------------------------------------------------------------- q68
  /** INTERSECT / EXCEPT over customer cohorts — the set-operator half of
    * §2.G (q07 covers UNION): customers ordering in both the early and
    * late eras, only early, only late. Spark plans both operators as
    * distinct + semi/anti joins on the full row — the same hash-join
    * shapes q24 audits — so nothing here is driver-side set math.
    */
  def eraCustomerSetOps(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    def era(pred: Column) = orders.filter(pred).select("o_custkey").distinct()
    val early = era(year(col("o_orderdate")) <= 1997)
    val late = era(year(col("o_orderdate")) >= 1998)
    early.intersect(late).agg(count(lit(1)).as("n_both"))
      .crossJoin(early.except(late).agg(count(lit(1)).as("n_early_only")))
      .crossJoin(late.except(early).agg(count(lit(1)).as("n_late_only")))
  }

  private val eraCustomerSetOpsSql =
    """WITH early AS (
      |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) <= 1997
      |), late AS (
      |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) >= 1998
      |)
      |SELECT
      |  (SELECT count(*) FROM (SELECT * FROM early INTERSECT SELECT * FROM late)) AS n_both,
      |  (SELECT count(*) FROM (SELECT * FROM early EXCEPT SELECT * FROM late)) AS n_early_only,
      |  (SELECT count(*) FROM (SELECT * FROM late EXCEPT SELECT * FROM early)) AS n_late_only""".stripMargin

  // ---------------------------------------------------------------- q59
  /** Daily event-type matrix via `pivot` — long-to-wide reshaping with an
    * EXPLICIT pivot value list. The explicit list matters twice over: the
    * output schema is deterministic (no data-dependent columns — the
    * correctness gate hashes by column name), and Spark skips the extra
    * distinct-values collection pass a bare `pivot(col)` runs first. The
    * plan is the same single-shuffle hash aggregate as the long form —
    * pivot columns become conditional aggregates, so at 100 TB this costs
    * exactly one pass regardless of how many types are pivoted out.
    */
  def dailyEventPivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wide = Tables.events(spark, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .groupBy("day")
      .pivot("event_type", types)
      .agg(count(lit(1)))
    wide.select(col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  private val dailyEventPivotSql =
    """SELECT strftime(ts, '%Y-%m-%d') AS day,
      |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
      |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
      |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
      |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
      |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q84
  /** Forward as-of with tolerance: for each event, the customer's NEXT
    * order at-or-after the event, nulled when it is more than 30 days
    * out (pandas `merge_asof(direction='forward', tolerance=...)`).
    * Right side pre-collapsed to the LOWEST orderkey per (custkey, date)
    * so both engines resolve equal-time ties identically; DuckDB's
    * native forward ASOF (`e.ts <= o.date`) is the independent oracle.
    */
  def asofNextOrder(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(asc("o_orderkey"))
    val orders1 = Tables.orders(spark, dir)
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    val events = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    AsOfJoin.asOfForward(events, orders1, "user_id", "o_custkey", "ts", "o_orderdate",
      toleranceSec = Some(30L * 86400L))
      .select(
        col("event_id"), col("user_id"),
        col("asof.o_orderkey").as("next_orderkey"),
        round(col("asof.o_totalprice"), 2).as("next_price"))
  }

  private val asofNextOrderSql =
    """WITH o1 AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
      |    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey ASC) AS rn
      |    FROM orders) t WHERE rn = 1
      |)
      |SELECT e.event_id, e.user_id,
      |  CASE WHEN o1.o_orderdate <= e.ts + INTERVAL 30 DAY
      |       THEN o1.o_orderkey END AS next_orderkey,
      |  CASE WHEN o1.o_orderdate <= e.ts + INTERVAL 30 DAY
      |       THEN round(o1.o_totalprice, 2) END AS next_price
      |FROM events e ASOF LEFT JOIN o1
      |  ON e.user_id = o1.o_custkey AND e.ts <= o1.o_orderdate""".stripMargin

  // ---------------------------------------------------------------- q88
  /** The ranking-window family under REAL tie semantics — rank,
    * dense_rank, percent_rank, cume_dist, ntile per source over a
    * deliberately COARSE score (n_chars div 100) so ties actually occur
    * and the five functions genuinely differ (on a total order they all
    * collapse to row_number, which q06/q11 already gate).
    *
    * Exactness: rank/dense_rank/ntile are integers; percent_rank and
    * cume_dist are each ONE division of exact integers floored to
    * micro-units. ntile gets its own TOTAL order (score, doc_id) —
    * ntile under ties is engine-ambiguous otherwise.
    *
    * Scale shape: one shuffle on the group key; every window reuses the
    * same sort. Groups are source-sized — the standard quantile-
    * normalization shape for per-slice score calibration.
    */
  def qualityRanks(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        expr("n_chars div 100").as("score"))
    val tied = Window.partitionBy("source").orderBy("score")
    val total = Window.partitionBy("source").orderBy("score", "doc_id")
    base
      .withColumn("rnk", rank().over(tied))
      .withColumn("drnk", dense_rank().over(tied))
      .withColumn("pr_u", floor(percent_rank().over(tied) * 1000000).cast("long"))
      .withColumn("cd_u", floor(cume_dist().over(tied) * 1000000).cast("long"))
      .withColumn("decile", ntile(10).over(total))
  }

  private val qualityRanksSql =
    """SELECT doc_id, source, n_chars // 100 AS score,
      |  CAST(rank() OVER tied AS INTEGER) AS rnk,
      |  CAST(dense_rank() OVER tied AS INTEGER) AS drnk,
      |  CAST(floor(percent_rank() OVER tied * 1000000) AS BIGINT) AS pr_u,
      |  CAST(floor(cume_dist() OVER tied * 1000000) AS BIGINT) AS cd_u,
      |  CAST(ntile(10) OVER total AS INTEGER) AS decile
      |FROM documents
      |WINDOW
      |  tied AS (PARTITION BY source ORDER BY n_chars // 100),
      |  total AS (PARTITION BY source ORDER BY n_chars // 100, doc_id)""".stripMargin

  // ---------------------------------------------------------------- q93
  /** Winsorization — the robust-preprocessing counterpart of q82's
    * outlier DETECTION: clamp each group's values at its exact p05/p95
    * order statistics and report what clipping did to the sums (the
    * standard tail-taming step before training a regression or
    * aggregating a heavy-tailed metric).
    *
    * Exactness: values are integer cents; the fences are SINGLE order
    * statistics selected by rank (k = ceil(q·n) via integer ceil-div) —
    * no interpolation, no floats anywhere, so both engines agree bit
    * for bit even at tie-heavy fences.
    *
    * Scale shape: one rank window per group (the same sort a per-group
    * quantile needs anyway), a group-sized fence table broadcast back
    * onto the rows, one final hash aggregate. At 100 TB the fence scan
    * and clamp scan parallelize freely; for approximate fences at scale
    * swap the rank window for the GK sketch (q70) — the clamp plumbing
    * is unchanged.
    */
  def winsorize(rows: DataFrame, grp: String, cents: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(grp).orderBy(col(cents))
    val ranked = rows
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(grp)))
    val fences = ranked
      .withColumn("lo_rank", expr("(5 * n + 99) div 100"))
      .withColumn("hi_rank", expr("(95 * n + 99) div 100"))
      .groupBy(grp)
      .agg(min(when(col("rn") === col("lo_rank"), col(cents))).as("lo_cents"),
        min(when(col("rn") === col("hi_rank"), col(cents))).as("hi_cents"))
    rows.join(broadcast(fences), Seq(grp))
      .withColumn("clamped",
        greatest(least(col(cents), col("hi_cents")), col("lo_cents")))
      .groupBy(grp)
      .agg(count(lit(1)).as("n"),
        min("lo_cents").as("lo_cents"),
        min("hi_cents").as("hi_cents"),
        sum(when(col(cents) < col("lo_cents"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col(cents) > col("hi_cents"), 1L).otherwise(0L)).as("n_clip_hi"),
        sum(col(cents)).as("sum_raw"),
        sum(col("clamped")).as("sum_winsorized"))
  }

  def winsorizedRevenue(spark: SparkSession, dir: String): DataFrame =
    winsorize(
      Tables.orders(spark, dir).select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100).cast("long").as("cents")),
      "o_orderpriority", "cents")

  private val winsorizedRevenueSql =
    """WITH rows_c AS (
      |  SELECT o_orderpriority AS grp,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), ranked AS (
      |  SELECT grp, cents,
      |    row_number() OVER (PARTITION BY grp ORDER BY cents) AS rn,
      |    count(*) OVER (PARTITION BY grp) AS n
      |  FROM rows_c
      |), fences AS (
      |  SELECT grp,
      |    min(CASE WHEN rn = (5 * n + 99) // 100 THEN cents END) AS lo_cents,
      |    min(CASE WHEN rn = (95 * n + 99) // 100 THEN cents END) AS hi_cents
      |  FROM ranked GROUP BY grp
      |)
      |SELECT r.grp AS o_orderpriority, count(*) AS n,
      |  min(f.lo_cents) AS lo_cents, min(f.hi_cents) AS hi_cents,
      |  CAST(sum(CASE WHEN r.cents < f.lo_cents THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clip_lo,
      |  CAST(sum(CASE WHEN r.cents > f.hi_cents THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clip_hi,
      |  CAST(sum(r.cents) AS BIGINT) AS sum_raw,
      |  CAST(sum(greatest(least(r.cents, f.hi_cents), f.lo_cents)) AS BIGINT)
      |    AS sum_winsorized
      |FROM rows_c r JOIN fences f ON f.grp = r.grp
      |GROUP BY r.grp""".stripMargin

  // --------------------------------------------------------------- q132
  /** Grouped top-k via the bounded-heap [[graft.functions.TopK]]
    * Aggregator: the 3 highest-priced lineitems per supplier, ties broken
    * ascending on (orderkey, linenumber).
    *
    * Same answer as the `row_number()` window form, different scale
    * shape: partial aggregation keeps ≤ k entries per (map task, group)
    * so the exchange carries k·groups·partitions rows instead of the
    * whole fact table — the difference between shuffling ~nothing and
    * shuffling 100 TB. TopKSpec pins both the row-for-row equality with
    * the window form and the partial-ObjectHashAggregate plan shape.
    */
  def topkSupplierItems(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    graft.functions.TopK.grouped(li, Seq("l_suppkey"),
        col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber").cast("long"), k)
      .select(col("l_suppkey"), col("rank"), col("score").as("price"),
        col("key").as("order_key"), col("sub").as("line_no"))
  }

  private val topkSupplierItemsSql =
    """SELECT l_suppkey, CAST(rn AS INTEGER) AS rank, l_extendedprice AS price,
      |  l_orderkey AS order_key, CAST(l_linenumber AS BIGINT) AS line_no
      |FROM (
      |  SELECT l_suppkey, l_extendedprice, l_orderkey, l_linenumber,
      |    row_number() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem)
      |WHERE rn <= 3""".stripMargin

  // --------------------------------------------------------------- q133
  /** Per-brand Pareto frontier (2D skyline): parts not dominated on
    * (retail price ↓, size ↑) — the classic "skyline query" (Börzsönyi,
    * Kossmann & Stocker, ICDE'01) that SQL expresses as a quadratic
    * `NOT EXISTS` self-join.
    *
    * The scale-correct form exploits the 2D structure: collapse to price
    * levels (one hash agg), take each level's max size, and sweep prices
    * ascending with a running strictly-before max — a level survives iff
    * its max size beats every cheaper level's. One aggregate + one
    * brand-keyed window pass, O(n log n) per brand, versus the O(n²)
    * NOT EXISTS the oracle runs. Survivor rule proved in two directions:
    * a point below its level max is dominated at equal price; a level max
    * not above the running max is dominated by some cheaper level; and a
    * surviving level max has no dominator (nothing cheaper is as large,
    * nothing equal-priced is larger).
    *
    * Output: distinct frontier points with the count of parts sitting
    * exactly on each (duplicates tie — neither dominates).
    */
  def paretoFrontier(spark: SparkSession, dir: String): DataFrame =
    paretoFrontier(Tables.part(spark, dir))

  def paretoFrontier(parts: DataFrame): DataFrame =
    paretoSweep(parts
      .groupBy(col("p_brand"), col("p_retailprice").as("price"),
        col("p_size").as("sz"))
      .agg(count(lit(1)).as("n")))
      .withColumnRenamed("n", "n_parts")

  /** The skyline survivor sweep over aggregated (p_brand, price, sz, n)
    * points — THE one definition of the q133 rule, shared with the
    * incremental [[graft.warehouse.SkylineState]] so the "3-batch fold ≡
    * one-shot" gate can never drift against a second copy.
    */
  def paretoSweep(pts: DataFrame): DataFrame = {
    val levels = pts
      .groupBy(col("p_brand"), col("price"), col("sz"))
      .agg(sum(col("n")).as("n"))
      .groupBy(col("p_brand"), col("price"))
      .agg(max(struct(col("sz"), col("n"))).as("m"))
      .select(col("p_brand"), col("price"),
        col("m.sz").as("sz"), col("m.n").as("n"))
    val w = Window.partitionBy("p_brand").orderBy("price")
      .rowsBetween(Window.unboundedPreceding, -1)
    levels
      .withColumn("run_max", max(col("sz")).over(w))
      .where(col("run_max").isNull || col("sz") > col("run_max"))
      .select(col("p_brand"), col("price"), col("sz"), col("n"))
  }

  private val paretoFrontierSql =
    """WITH pts AS (
      |  SELECT p_brand, p_retailprice AS price, p_size AS sz FROM part
      |), fr AS (
      |  SELECT DISTINCT a.p_brand, a.price, a.sz
      |  FROM pts a
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM pts b
      |    WHERE b.p_brand = a.p_brand
      |      AND b.price <= a.price AND b.sz >= a.sz
      |      AND (b.price < a.price OR b.sz > a.sz))
      |)
      |SELECT f.p_brand, f.price, f.sz,
      |  CAST(count(*) AS BIGINT) AS n_parts
      |FROM fr f JOIN pts p
      |  ON p.p_brand = f.p_brand AND p.price = f.price AND p.sz = f.sz
      |GROUP BY 1, 2, 3""".stripMargin

  // --------------------------------------------------------------- q145
  /** Exact weighted median per group — the lower weighted median of
    * `l_extendedprice` weighted by quantity, per (returnflag, status):
    * the smallest price whose cumulative weight reaches half the total
    * (2·cum ≥ total in pure integer arithmetic — no float percentile
    * machinery anywhere). The robust-statistics counterpart of q27's
    * unweighted percentiles: a weighted median answers "the price at
    * which half the UNITS trade", which the row median cannot.
    *
    * Scale shape: collapse to (group, price) weight levels in one hash
    * aggregate, then two windows over the LEVEL table (value-space
    * bounded) — never a corpus sort, same discipline as q135/q138.
    */
  def weightedMedianPrice(spark: SparkSession, dir: String): DataFrame = {
    val levels = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_extendedprice").as("price"),
        col("l_quantity").cast("long").as("qty"))
      .groupBy("l_returnflag", "l_linestatus", "price")
      .agg(sum(col("qty")).as("wt"))
    val wcum = Window.partitionBy("l_returnflag", "l_linestatus")
      .orderBy("price").rowsBetween(Window.unboundedPreceding, 0)
    val wall = Window.partitionBy("l_returnflag", "l_linestatus")
    levels
      .withColumn("cum", sum(col("wt")).over(wcum))
      .withColumn("total", sum(col("wt")).over(wall))
      .where(col("cum") * 2 >= col("total"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(min(col("price")).as("w_median_price"),
        min(col("total")).as("total_weight"))
  }

  private val weightedMedianPriceSql =
    """WITH lv AS (
      |  SELECT l_returnflag, l_linestatus, l_extendedprice AS price,
      |    sum(CAST(l_quantity AS BIGINT)) AS wt
      |  FROM lineitem GROUP BY 1, 2, 3
      |), c AS (
      |  SELECT l_returnflag, l_linestatus, price, wt,
      |    sum(wt) OVER (PARTITION BY l_returnflag, l_linestatus
      |      ORDER BY price ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS cum,
      |    sum(wt) OVER (PARTITION BY l_returnflag, l_linestatus) AS total
      |  FROM lv
      |)
      |SELECT l_returnflag, l_linestatus,
      |  min(price) AS w_median_price,
      |  CAST(min(total) AS BIGINT) AS total_weight
      |FROM c WHERE cum * 2 >= total
      |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------------- q147
  /** SQL-surface gate: a multi-feature query — three-table join, custom
    * GROUPING SETS (the general form q25's ROLLUP and q65's CUBE are
    * special cases of), grouping-bit disambiguation — executed through
    * `spark.sql` over the registered temp-view catalog
    * ([[Tables.registerAll]]), not the DataFrame API. The point IS the
    * dialect face: a reference user who writes SQL verbatim gets the
    * same Catalyst plan (broadcast dims, expand+agg) and, per this gate,
    * the same bytes as DuckDB running near-identical text.
    */
  def sqlGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql("""
      SELECT n_name, o_orderpriority,
        count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue,
        CAST(grouping_id(n_name, o_orderpriority) AS BIGINT) AS gid
      FROM orders JOIN customer ON c_custkey = o_custkey
                  JOIN nation ON n_nationkey = c_nationkey
      GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), ())
    """)
  }

  private val sqlGroupingSetsSql =
    """SELECT n_name, o_orderpriority,
      |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue,
      |  CAST(GROUPING(n_name, o_orderpriority) AS BIGINT) AS gid
      |FROM orders JOIN customer ON c_custkey = o_custkey
      |            JOIN nation ON n_nationkey = c_nationkey
      |GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), ())""".stripMargin

  // --------------------------------------------------------------- q149
  /** Period-over-period movers — per part brand, revenue in the first
    * versus second half of the order-date range, the delta in exact
    * integer cents and basis points vs the early period, ranked risers
    * first. The standard "what moved" report between any two periods;
    * the midpoint is derived from the data (min + span DIV 2 in epoch
    * days), so the split is deterministic on any engine.
    *
    * Scale shape: one fact scan bucketed into the two periods by a
    * per-row comparison against broadcast scalars, a conditional
    * aggregate per brand, and a ranking window over the brands-sized
    * table.
    */
  def periodMovers(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), to_date(col("l_shipdate")).as("d"),
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
          .as("cents"))
    val span = li.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val byBrand = li.crossJoin(broadcast(span))
      .withColumn("late",
        datediff(col("d"), col("d0")) * 2 >= datediff(col("d1"), col("d0")) + 1)
      .groupBy("p_brand")
      .agg(
        sum(when(!col("late"), col("cents")).otherwise(0L)).as("early_cents"),
        sum(when(col("late"), col("cents")).otherwise(0L)).as("late_cents"))
      .withColumn("delta_cents", col("late_cents") - col("early_cents"))
      .withColumn("delta_bps",
        expr("CAST(CASE WHEN early_cents > 0 " +
          "THEN (late_cents - early_cents) * 10000 DIV early_cents " +
          "ELSE 0 END AS BIGINT)"))
    val w = Window.orderBy(col("delta_cents").desc, col("p_brand"))
    byBrand.withColumn("mover_rank", row_number().over(w).cast("int"))
  }

  private val periodMoversSql =
    """WITH li AS (
      |  SELECT p.p_brand, l.l_shipdate::DATE AS d,
      |    CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
      |      AS cents
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |), span AS (
      |  SELECT min(d) AS d0, max(d) AS d1 FROM li
      |), b AS (
      |  SELECT p_brand,
      |    CAST(sum(CASE WHEN date_diff('day', s.d0, li.d) * 2
      |                       >= date_diff('day', s.d0, s.d1) + 1
      |             THEN 0 ELSE cents END) AS BIGINT) AS early_cents,
      |    CAST(sum(CASE WHEN date_diff('day', s.d0, li.d) * 2
      |                       >= date_diff('day', s.d0, s.d1) + 1
      |             THEN cents ELSE 0 END) AS BIGINT) AS late_cents
      |  FROM li, span s GROUP BY 1
      |)
      |SELECT p_brand, early_cents, late_cents,
      |  late_cents - early_cents AS delta_cents,
      |  CAST(CASE WHEN early_cents > 0
      |       THEN (late_cents - early_cents) * 10000 // early_cents
      |       ELSE 0 END AS BIGINT) AS delta_bps,
      |  CAST(row_number() OVER (ORDER BY late_cents - early_cents DESC, p_brand)
      |    AS INTEGER) AS mover_rank
      |FROM b""".stripMargin

  // --------------------------------------------------------------- q150
  /** Open-order SLA aging snapshot — as of the corpus max date, every
    * order still inside its 30-day fulfillment interval (the q94 sweep's
    * open set at the horizon) bucketed by age: 0–9, 10–19, 20–29 days,
    * with counts and value at stake per priority. The ops report behind
    * every "what's at risk" dashboard; ages are integer day arithmetic
    * off broadcast scalars, one scan + one aggregate.
    */
  def slaAging(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("d"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val mx = o.agg(max(col("d")).as("mxd"))
    o.crossJoin(broadcast(mx))
      .withColumn("age", datediff(col("mxd"), col("d")))
      .where(col("age") < 30) // still open under the 30-day interval
      .withColumn("age_bucket",
        expr("CAST(age DIV 10 AS INT) * 10"))
      .groupBy("priority", "age_bucket")
      .agg(count(lit(1)).as("n_open"),
        sum(col("cents")).as("cents_at_stake"))
  }

  private val slaAgingSql =
    """WITH o AS (
      |  SELECT o_orderpriority AS priority, o_orderdate::DATE AS d,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), mx AS (
      |  SELECT max(d) AS mxd FROM o
      |)
      |SELECT priority,
      |  CAST((date_diff('day', d, mxd) // 10) * 10 AS INTEGER) AS age_bucket,
      |  CAST(count(*) AS BIGINT) AS n_open,
      |  CAST(sum(cents) AS BIGINT) AS cents_at_stake
      |FROM o, mx
      |WHERE date_diff('day', d, mxd) < 30
      |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------------- q151
  /** RFM segmentation — every customer scored 1..5 on Recency (days
    * since last order, fresher = higher), Frequency (order count) and
    * Monetary (lifetime cents), quintiles by EXPLICIT integer rank
    * arithmetic (q = (rank−1)·5 DIV n + 1 over a total (metric, key)
    * order — `ntile` semantics differ across engines, this formula
    * cannot). Output: one row per observed RFM code with the customer
    * count and total monetary value — the marketing-warehouse
    * segmentation standard.
    *
    * Scale shape: per-customer rollup (one fact shuffle), three
    * customer-keyed rank windows, and a ≤125-group aggregate.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val mx = o.agg(max(col("d")).as("mxd"))
    val per = o.crossJoin(broadcast(mx))
      .groupBy("o_custkey")
      .agg(min(datediff(col("mxd"), col("d"))).as("recency_days"),
        count(lit(1)).as("freq"), sum(col("cents")).as("monetary"))
    val n = per.count()
    // Three explicit rank passes (windows over the customers-sized
    // rollup); rank 1 = best on each axis, and the 6−quintile flip makes
    // 5 the best score, the RFM convention.
    def scored(c: Column, name: String, bestIsSmall: Boolean) = {
      val w = Window.orderBy(
        (if (bestIsSmall) c.asc else c.desc), col("o_custkey"))
      row_number().over(w).as(name)
    }
    val ranked = per.select(col("o_custkey"), col("monetary"),
      scored(col("recency_days"), "r_rank", bestIsSmall = true),
      scored(col("freq"), "f_rank", bestIsSmall = false),
      scored(col("monetary"), "m_rank", bestIsSmall = false))
    val coded = ranked.select(col("monetary"),
      expr(s"CAST(6 - ((r_rank - 1) * 5 DIV $n + 1) AS INT)").as("r"),
      expr(s"CAST(6 - ((f_rank - 1) * 5 DIV $n + 1) AS INT)").as("f"),
      expr(s"CAST(6 - ((m_rank - 1) * 5 DIV $n + 1) AS INT)").as("m"))
    coded.groupBy("r", "f", "m")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary")).as("monetary_cents"))
  }

  private lazy val rfmSegmentsSql =
    """WITH o AS (
      |  SELECT o_custkey, o_orderdate::DATE AS d,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), mx AS (
      |  SELECT max(d) AS mxd FROM o
      |), per AS (
      |  SELECT o_custkey, min(date_diff('day', d, mxd)) AS recency_days,
      |    count(*) AS freq, sum(cents) AS monetary
      |  FROM o, mx GROUP BY 1
      |), n AS (
      |  SELECT count(*) AS n FROM per
      |), ranked AS (
      |  SELECT monetary,
      |    row_number() OVER (ORDER BY recency_days ASC, o_custkey) AS r_rank,
      |    row_number() OVER (ORDER BY freq DESC, o_custkey) AS f_rank,
      |    row_number() OVER (ORDER BY monetary DESC, o_custkey) AS m_rank
      |  FROM per
      |)
      |SELECT CAST(6 - ((r_rank - 1) * 5 // n.n + 1) AS INT) AS r,
      |  CAST(6 - ((f_rank - 1) * 5 // n.n + 1) AS INT) AS f,
      |  CAST(6 - ((m_rank - 1) * 5 // n.n + 1) AS INT) AS m,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(monetary) AS BIGINT) AS monetary_cents
      |FROM ranked, n
      |GROUP BY 1, 2, 3""".stripMargin

  // --------------------------------------------------------------- q152
  /** Point-in-time feature panel — the feature-store discipline: for a
    * grid of snapshot dates, each customer's features computed from data
    * AS OF that snapshot only (orders-to-date, lifetime cents-to-date,
    * days since last order). Training a churn model on this panel can
    * never leak the future, which a naive "features from the whole
    * table" join silently does. Snapshots are the span's quartile dates
    * (data-derived, deterministic); the panel is built with one
    * snapshot×order comparison bounded by the 4-row broadcast grid —
    * never a range self-join.
    */
  def pitFeaturePanel(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val span = o.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val snaps = span.select(explode(sequence(lit(1), lit(4))).as("k"),
        col("d0"), col("d1"))
      .select(col("k").cast("long").as("k"),
        expr("date_add(d0, CAST(datediff(d1, d0) * k DIV 4 AS INT))")
          .as("snap_d"))
    o.join(broadcast(snaps), col("d") <= col("snap_d"))
      .groupBy(col("o_custkey"), col("k"), col("snap_d"))
      .agg(count(lit(1)).as("orders_to_date"),
        sum(col("cents")).as("cents_to_date"),
        min(datediff(col("snap_d"), col("d"))).as("days_since_last"))
  }

  private lazy val pitFeaturePanelSql =
    """WITH o AS (
      |  SELECT o_custkey, o_orderdate::DATE AS d,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), span AS (
      |  SELECT min(d) AS d0, max(d) AS d1 FROM o
      |), snaps AS (
      |  SELECT k, d0 + CAST(date_diff('day', d0, d1) * k // 4 AS INT) AS snap_d
      |  FROM span, (SELECT unnest(range(1, 5)) AS k)
      |)
      |SELECT o.o_custkey, CAST(s.k AS BIGINT) AS k, s.snap_d::DATE AS snap_d,
      |  CAST(count(*) AS BIGINT) AS orders_to_date,
      |  CAST(sum(o.cents) AS BIGINT) AS cents_to_date,
      |  CAST(min(date_diff('day', o.d, s.snap_d::DATE)) AS INTEGER)
      |    AS days_since_last
      |FROM o JOIN snaps s ON o.d <= s.snap_d::DATE
      |GROUP BY 1, 2, 3""".stripMargin

  // --------------------------------------------------------------- q156
  /** Small-quantity revenue audit — the TPC-H Q17 shape: per brand, the
    * revenue sitting in line items whose quantity is under 20% of that
    * PART's average quantity. The reference semantics is a correlated
    * scalar subquery (`WHERE l_quantity < (SELECT 0.2·avg(l_quantity)
    * FROM lineitem WHERE l_partkey = outer.l_partkey)`); the Spark-first
    * plan decorrelates it into one per-part aggregate joined back to the
    * fact — one extra keys-sized shuffle instead of a per-row subquery
    * re-scan, the decorrelation every engine at scale performs.
    *
    * Exactness: quantities are whole integers in this corpus, so
    * `qty < 0.2·avg` becomes the integer cross-multiplication
    * `5·qty·n_part < Σqty_part` — no float division crosses engines —
    * and revenue folds in exact integer cents.
    */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val perPart = li.groupBy("l_partkey")
      .agg(count(lit(1)).as("n_part"), sum("qty").as("sum_qty"))
    li.join(perPart, "l_partkey")
      .filter(col("qty") * 5L * col("n_part") < col("sum_qty"))
      .join(broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n_small_lines"),
        sum("cents").as("revenue_cents"))
  }

  private val smallQuantityRevenueSql =
    """SELECT p.p_brand AS brand, count(*) AS n_small_lines,
      |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE CAST(l.l_quantity AS BIGINT) * 5 *
      |    (SELECT count(*) FROM lineitem i WHERE i.l_partkey = l.l_partkey)
      |  < (SELECT CAST(sum(CAST(i.l_quantity AS BIGINT)) AS BIGINT)
      |     FROM lineitem i WHERE i.l_partkey = l.l_partkey)
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- q157
  /** Lone-late-supplier audit — the TPC-H Q21 shape: suppliers who were
    * the ONLY late shipper (> 60 days after the order date) on a
    * finished multi-supplier order. The reference semantics is a
    * double-correlated EXISTS / NOT EXISTS pair; the Spark-first plan
    * computes per-order distinct supplier / distinct-late-supplier
    * counts in ONE order-keyed aggregate and joins the late lines back —
    * two key-shuffles total, no correlated re-scan per row.
    *
    * Late is integer day arithmetic (epoch-day difference > 60), exact
    * in both engines; the per-supplier output counts distinct ORDERS so
    * multi-line lateness cannot double-count.
    */
  def loneLateSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (datediff(col("l_shipdate"), col("o_orderdate")) > 60).as("late"))
    val perOrder = li.groupBy("l_orderkey")
      .agg(count_distinct(col("l_suppkey")).as("n_supp"),
        count_distinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
    li.filter(col("late"))
      .join(perOrder, "l_orderkey")
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(count_distinct(col("l_orderkey")).as("n_lone_late_orders"))
  }

  private val loneLateSupplierSql =
    """WITH f AS (
      |  SELECT l.l_orderkey, l.l_suppkey,
      |    datediff('day', CAST(o.o_orderdate AS DATE),
      |      CAST(l.l_shipdate AS DATE)) > 60 AS late
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderstatus = 'F'
      |)
      |SELECT l1.l_suppkey AS suppkey,
      |  count(DISTINCT l1.l_orderkey) AS n_lone_late_orders
      |FROM f l1
      |WHERE l1.late
      |  AND EXISTS (SELECT 1 FROM f l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM f l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- q158
  /** Revenue-inequality profile (Gini over customers) per market
    * segment — the concentration complement of q153's HHI (that one is
    * share-of-squares over brands; this is the full Lorenz-order
    * statistic over customers). Gini from the sorted-rank identity
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) with revenue ascending,
    * (revenue, custkey) total order so ties rank identically in both
    * engines; all terms exact integers (whole dollars, with the
    * quadratic rank-weighted sum widened to DECIMAL(38,0) and a loud
    * guard on the BIGINT output contract), emitted with the ppm
    * quotient AND the raw numerator/denominator so the gate is integer-
    * exact. One fact aggregate to customer grain, one segment-keyed rank
    * window over the customers-sized table, one final aggregate.
    */
  def revenueGini(spark: SparkSession, dir: String): DataFrame = {
    // Whole DOLLARS, not cents — the MomentsState headroom discipline:
    // the rank-weighted sum Σ rk·x is bounded by n·Σx, so cents would
    // overflow BIGINT around an sf1-equivalent segment (measured: long
    // overflow at sf0.1×100); dollars buy 100× headroom, and the ppm
    // quotient splits its scaling (1000 into the numerator, 1000 out of
    // the denominator — identical truncating ops in both engines) so
    // the 1e6 factor never multiplies the full-magnitude numerator.
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("d"))
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
    giniProfile(perCust)
  }

  /** Gini kernel over (o_custkey, c_mktsegment, d) rows — split out so
    * the overflow guard is spec-testable on synthetic over-bound data.
    */
  def giniProfile(perCust: DataFrame): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("d"), col("o_custkey"))
    // Widen-then-check (r9 verdict item 3): the rank-weighted sum Σrk·d
    // is quadratic by construction (bounded only by n·Σd), so it rides
    // DECIMAL(38,0) — exact to 1e38, no silent wrap, no anonymous ANSI
    // throw mid-aggregation — and the BIGINT *output* contract is then
    // enforced with a named raise_error carrying the rescaling hint.
    // The decimal terms touch customer-grain rows only, never the fact
    // scan. The ppm quotient keeps the exact branch structure of the
    // original long form (identical truncating ops in both engines).
    val maxL = Long.MaxValue
    val boom = "CAST(raise_error('q158 revenueGini: BIGINT output headroom " +
      "exceeded (|gini_numer| or gini_denom > 2^63-1); feed coarser units " +
      "than whole dollars') AS BIGINT)"
    perCust
      .withColumn("rk", row_number().over(w))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum("d").as("total_dollars"),
        sum(col("rk").cast("decimal(38,0)") * col("d")).as("srkd"))
      .withColumn("numer_d", expr(
        "2 * srkd - (n_customers + 1) * CAST(total_dollars AS DECIMAL(38,0))"))
      .withColumn("denom_d", expr(
        "CAST(n_customers AS DECIMAL(38,0)) * total_dollars"))
      .withColumn("gini_numer", expr(
        s"CASE WHEN abs(numer_d) > ${maxL}L OR denom_d > ${maxL}L" +
          s" THEN $boom ELSE CAST(numer_d AS BIGINT) END"))
      .withColumn("gini_denom", expr(
        s"CASE WHEN abs(numer_d) > ${maxL}L OR denom_d > ${maxL}L" +
          s" THEN $boom ELSE CAST(denom_d AS BIGINT) END"))
      .withColumn("gini_ppm", expr(
        "CASE WHEN denom_d >= 1000000 THEN" +
          " (1000 * numer_d) div (denom_d div 1000)" +
          " ELSE (1000000 * numer_d) div denom_d END"))
      .drop("srkd", "numer_d", "denom_d")
  }

  private val revenueGiniSql =
    """WITH pc AS (
      |  SELECT o.o_custkey, c.c_mktsegment,
      |    CAST(sum(CAST(floor(o.o_totalprice) AS BIGINT)) AS BIGINT) AS d
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2
      |), rk AS (
      |  SELECT c_mktsegment, d,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY d, o_custkey) AS rk
      |  FROM pc
      |), agg AS (
      |  SELECT c_mktsegment AS segment, count(*) AS n_customers,
      |    CAST(sum(d) AS BIGINT) AS total_dollars,
      |    CAST(2 * sum(rk * d) - (count(*) + 1) * sum(d) AS BIGINT)
      |      AS gini_numer,
      |    CAST(count(*) * sum(d) AS BIGINT) AS gini_denom
      |  FROM rk GROUP BY 1
      |)
      |SELECT segment, n_customers, total_dollars, gini_numer, gini_denom,
      |  CAST(CASE WHEN gini_denom >= 1000000
      |    THEN (1000 * gini_numer) // (gini_denom // 1000)
      |    ELSE (1000000 * gini_numer) // gini_denom END AS BIGINT) AS gini_ppm
      |FROM agg""".stripMargin

  // --------------------------------------------------------------- q166
  /** Dormant high-value customers — the TPC-H Q22 shape adapted to a
    * corpus where every customer has SOME order (verbatim "no orders
    * ever" is vacuous here): per nation, customers whose account balance
    * beats the global positive-balance average but who placed no order
    * in the trailing 180 days of the data. The "global-scalar correlated
    * subquery + NOT EXISTS" pattern, decorrelated Spark-first: two tiny
    * global aggregates broadcast as scalars (positive-balance stats, max
    * order date), the balance test as an integer CROSS-MULTIPLICATION
    * (cents·n_pos > total_pos_cents — no float division crosses
    * engines), and the NOT EXISTS as a left-anti hash join against the
    * recent-window order keys — never a per-row subquery.
    */
  def dormantRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val posAvg = cust.filter(col("bal_cents") > 0)
      .agg(count(lit(1)).as("n_pos"), sum("bal_cents").as("sum_pos"))
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
    val maxDate = orders.agg(max("od").as("max_od"))
    val recent = orders.crossJoin(broadcast(maxDate))
      .filter(col("od") >= date_sub(col("max_od"), 180))
      .select("o_custkey")
    cust
      .crossJoin(broadcast(posAvg))
      .filter(col("bal_cents") * col("n_pos") > col("sum_pos"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_dormant"),
        sum("bal_cents").as("balance_cents"))
  }

  private val dormantRichCustomersSql =
    """SELECT n.n_name AS nation, count(*) AS n_dormant,
      |  CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |    AS balance_cents
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) *
      |    (SELECT count(*) FROM customer
      |     WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0)
      |  > (SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |     FROM customer WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND CAST(o.o_orderdate AS DATE) >=
      |        (SELECT max(CAST(o_orderdate AS DATE)) FROM orders)
      |        - INTERVAL 180 DAY)
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- q168
  /** Regional market share by year — the TPC-H Q8 shape: the deepest
    * multi-way join in the battery (lineitem ⋈ orders ⋈ customer ⋈
    * supplier ⋈ nation×2 ⋈ region — six tables, two roles for nation),
    * the classic join-ORDER stress: Catalyst must broadcast the four
    * dimension tables and chain the two fact joins, never materialize an
    * intermediate cross product. Share = revenue from suppliers local to
    * the customer's region over all revenue into that region, by year —
    * integer cents and a ppm quotient.
    */
  def regionalMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"),
      col("l_suppkey"),
      round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long").as("cents"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"),
      col("o_custkey"), year(col("o_orderdate")).as("yr"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_regionkey"))
    val reg = graft.core.Tables.region(spark, dir).select(col("r_regionkey"), col("r_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat.select(col("n_nationkey").as("cn_key"),
        col("n_regionkey").as("c_region"))), col("c_nationkey") === col("cn_key"))
      .join(broadcast(nat.select(col("n_nationkey").as("sn_key"),
        col("n_regionkey").as("s_region"))), col("s_nationkey") === col("sn_key"))
      .join(broadcast(reg), col("c_region") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("yr"))
      .agg(sum("cents").as("total_cents"),
        sum(when(col("s_region") === col("c_region"), col("cents"))
          .otherwise(0L)).as("local_cents"))
      .withColumn("local_share_ppm",
        expr("(1000000 * local_cents) div total_cents"))
  }

  private val regionalMarketShareSql =
    """SELECT r.r_name AS region, CAST(year(o.o_orderdate) AS BIGINT) AS yr,
      |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100)
      |    AS BIGINT)) AS BIGINT) AS total_cents,
      |  CAST(sum(CASE WHEN sn.n_regionkey = cn.n_regionkey
      |    THEN CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100)
      |      AS BIGINT) ELSE 0 END) AS BIGINT) AS local_cents,
      |  CAST((1000000 * sum(CASE WHEN sn.n_regionkey = cn.n_regionkey
      |    THEN CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100)
      |      AS BIGINT) ELSE 0 END))
      |    // sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100)
      |      AS BIGINT)) AS BIGINT) AS local_share_ppm
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |JOIN region r ON cn.n_regionkey = r.r_regionkey
      |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------------- q169
  /** INTERSECT ALL / EXCEPT ALL — the BAG-semantics set operations q68's
    * distinct forms don't cover (a customer ordering 5 times early and 3
    * times late contributes multiplicity min(5,3) = 3 to the
    * intersection and 5−3 = 2 to the difference — duplicate-sensitive
    * audit arithmetic the distinct forms erase). Planned Spark-first as
    * per-side multiplicity aggregates + one full-outer equi-join (the
    * decorrelated form of Spark's own INTERSECT ALL planning, without
    * the generate/replicate tail since only counts are reported).
    */
  def customerOrderBagOps(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .crossJoin(broadcast(Tables.orders(spark, dir)
        .agg(max(to_date(col("o_orderdate"))).as("max_od"))))
      .select(col("o_custkey"),
        (to_date(col("o_orderdate")) >= date_sub(col("max_od"), 365)).as("late"))
    val early = ord.filter(!col("late")).groupBy("o_custkey")
      .agg(count(lit(1)).as("n_early"))
    val late = ord.filter(col("late")).groupBy("o_custkey")
      .agg(count(lit(1)).as("n_late"))
    early.join(late, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("n_early"), lit(0L)).as("n_early"),
        coalesce(col("n_late"), lit(0L)).as("n_late"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(least(col("n_early"), col("n_late"))).as("intersect_all_rows"),
        sum(greatest(col("n_early") - col("n_late"), lit(0L)))
          .as("except_all_rows"),
        sum(when(col("n_early") > 0 && col("n_late") > 0, 1L).otherwise(0L))
          .as("intersect_distinct"),
        sum(when(col("n_early") > 0 && col("n_late") === 0, 1L).otherwise(0L))
          .as("except_distinct"))
  }

  private val customerOrderBagOpsSql =
    """WITH o AS (
      |  SELECT o_custkey,
      |    CAST(o_orderdate AS DATE) >=
      |      (SELECT max(CAST(o_orderdate AS DATE)) FROM orders)
      |      - INTERVAL 365 DAY AS late
      |  FROM orders
      |), m AS (
      |  SELECT o_custkey,
      |    CAST(sum(CASE WHEN NOT late THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
      |    CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late
      |  FROM o GROUP BY 1
      |)
      |SELECT count(*) AS n_customers,
      |  CAST(sum(least(n_early, n_late)) AS BIGINT) AS intersect_all_rows,
      |  CAST(sum(greatest(n_early - n_late, 0)) AS BIGINT) AS except_all_rows,
      |  CAST(sum(CASE WHEN n_early > 0 AND n_late > 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS intersect_distinct,
      |  CAST(sum(CASE WHEN n_early > 0 AND n_late = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS except_distinct
      |FROM m""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q168_market_share", regionalMarketShare _,
      Some(regionalMarketShareSql)),
    NamedQuery("q169_bag_setops", customerOrderBagOps _,
      Some(customerOrderBagOpsSql)),
    NamedQuery("q166_dormant_customers", dormantRichCustomers _,
      Some(dormantRichCustomersSql)),
    NamedQuery("q156_small_quantity_revenue", smallQuantityRevenue _,
      Some(smallQuantityRevenueSql)),
    NamedQuery("q157_lone_late_supplier", loneLateSupplier _,
      Some(loneLateSupplierSql)),
    NamedQuery("q158_revenue_gini", revenueGini _, Some(revenueGiniSql)),
    NamedQuery("q151_rfm_segments", rfmSegments _, Some(rfmSegmentsSql)),
    NamedQuery("q152_pit_features", pitFeaturePanel _, Some(pitFeaturePanelSql)),
    NamedQuery("q149_period_movers", periodMovers _, Some(periodMoversSql)),
    NamedQuery("q150_sla_aging", slaAging _, Some(slaAgingSql)),
    NamedQuery("q147_sql_grouping_sets", sqlGroupingSets _,
      Some(sqlGroupingSetsSql)),
    NamedQuery("q145_weighted_median", weightedMedianPrice _,
      Some(weightedMedianPriceSql)),
    NamedQuery("q133_pareto_frontier", paretoFrontier _, Some(paretoFrontierSql)),
    NamedQuery("q132_topk_supplier_items", (s, d) => topkSupplierItems(s, d),
      Some(topkSupplierItemsSql)),
    NamedQuery("q23_asof_latest_order", asofLatestOrder _, Some(asofLatestOrderSql)),
    NamedQuery("q93_winsorized_revenue", winsorizedRevenue _,
      Some(winsorizedRevenueSql)),
    NamedQuery("q88_quality_ranks", qualityRanks _, Some(qualityRanksSql)),
    NamedQuery("q84_asof_next_order", asofNextOrder _, Some(asofNextOrderSql)),
    NamedQuery("q24_segment_order_presence", segmentOrderPresence _, Some(segmentOrderPresenceSql)),
    NamedQuery("q25_rollup_revenue", rollupRevenue _, Some(rollupRevenueSql)),
    NamedQuery("q26_event_deltas", eventDeltas _, Some(eventDeltasSql)),
    NamedQuery("q27_price_percentiles", pricePercentiles _, Some(pricePercentilesSql)),
    NamedQuery("q29_supplier_distincts", supplierDistincts _, Some(supplierDistinctsSql)),
    NamedQuery("q31_approx_distinct_users", approxDistinctUsers _, Some(approxDistinctUsersSql)),
    NamedQuery("q32_event_sessions", eventSessions _, Some(eventSessionsSql)),
    NamedQuery("q33_running_order_totals", runningOrderTotals _, Some(runningOrderTotalsSql)),
    NamedQuery("q59_daily_event_pivot", dailyEventPivot _, Some(dailyEventPivotSql)),
    NamedQuery("q64_price_histogram", (s, d) => priceHistogram(s, d), Some(priceHistogramSql)),
    NamedQuery("q65_cube_revenue", cubeRevenue _, Some(cubeRevenueSql)),
    NamedQuery("q68_era_customer_setops", eraCustomerSetOps _, Some(eraCustomerSetOpsSql)))
}
