package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** Time-series regularization: densify an irregular per-key series onto
  * a fixed calendar grid and carry the last observation forward — the
  * resample/ffill step every downstream window, lag, or feature
  * computation assumes has already happened. (The reference's reporting
  * queries group by day and silently skip empty days; this operator is
  * the explicit, correct version of that gap.)
  *
  * Scale shape: the dense grid is generated PER KEY — one `sequence()`
  * row per key, exploded — so grid size is rows-out, never a cross
  * join against a global calendar. The observed series, the grid, and
  * the forward-fill window all hash-partition on the key, so the whole
  * operator is one key-shuffle reused by join + window; no global sort,
  * no driver-side calendar. Grids are bounded by each key's own
  * [min, max] span, not the corpus's.
  */
object TimeSeries {

  /** Densify `observed` (one row per (key, period) — `periodCol` must
    * already be truncated to the grid step) onto every `stepDays`-spaced
    * period between each key's first and last observation, then
    * forward-fill `fillCols`. Adds `observed` (was this period present)
    * and `gap_age` (periods since the last real observation, 0 when
    * observed).
    */
  def gapFillForward(observed: DataFrame, keyCol: String, periodCol: String,
                     stepDays: Int, fillCols: Seq[String]): DataFrame = {
    val grid = observed.groupBy(col(keyCol))
      .agg(min(col(periodCol)).as("__lo"), max(col(periodCol)).as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"),
        expr(s"interval $stepDays days"))).as(periodCol))
    val w = Window.partitionBy(keyCol).orderBy(periodCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // An explicit join marker, not `fillCols.head.isNotNull`: a present
    // row whose first metric is legitimately NULL must still count as
    // observed (and the flag must not change with fillCols ordering).
    val marked = grid
      .join(observed.withColumn("__present", lit(true)), Seq(keyCol, periodCol), "left")
      .withColumn("observed", coalesce(col("__present"), lit(false)))
      .drop("__present")
      .withColumn("__obs_p", when(col("observed"), col(periodCol)))
    val filled = fillCols.foldLeft(marked) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .withColumn("gap_age", (datediff(col(periodCol),
        last(col("__obs_p"), ignoreNulls = true).over(w)) / stepDays).cast("int"))
      .drop("__obs_p")
  }

  // ---------------------------------------------------------------- q76
  /** Gated face: weekly order revenue per sampled customer, densified
    * over each customer's active span with forward-filled totals.
    * Exactness: revenue is summed in integer CENTS (o_totalprice carries
    * exactly 2 decimals, so `round(x*100)` is drift-free), making the
    * groupBy order-independent; the grid weeks are Monday-truncated on
    * both engines and stride-7 aligned, so the calendars are identical.
    */
  def weeklyGapfill(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.orders(spark, dir)
      .filter(col("o_custkey") % 20 === 0)
      .groupBy(col("o_custkey").as("custkey"),
        date_trunc("week", col("o_orderdate")).cast("date").as("week"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("week_cents"),
        count(lit(1)).as("week_orders"))
    gapFillForward(weekly, "custkey", "week", 7,
      Seq("week_cents", "week_orders"))
      .select(col("custkey"),
        date_format(col("week"), "yyyy-MM-dd").as("week_start"),
        col("observed"), col("week_cents"), col("week_orders"), col("gap_age"))
  }

  private val weeklyGapfillSql =
    """WITH weekly AS (
      |  SELECT o_custkey AS custkey,
      |    date_trunc('week', o_orderdate)::DATE AS week,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS week_cents,
      |    count(*) AS week_orders
      |  FROM orders WHERE o_custkey % 20 = 0 GROUP BY 1, 2
      |),
      |grid AS (
      |  SELECT custkey, unnest(generate_series(min(week), max(week),
      |    INTERVAL 7 DAY))::DATE AS week
      |  FROM weekly GROUP BY custkey
      |),
      |marked AS (
      |  SELECT g.custkey, g.week,
      |    w.week_cents IS NOT NULL AS observed,
      |    w.week_cents, w.week_orders,
      |    CASE WHEN w.week_cents IS NOT NULL THEN g.week END AS obs_p
      |  FROM grid g LEFT JOIN weekly w USING (custkey, week)
      |)
      |SELECT custkey, strftime(week, '%Y-%m-%d') AS week_start, observed,
      |  last_value(week_cents IGNORE NULLS) OVER win AS week_cents,
      |  last_value(week_orders IGNORE NULLS) OVER win AS week_orders,
      |  CAST(date_diff('day', last_value(obs_p IGNORE NULLS) OVER win, week) / 7 AS INTEGER) AS gap_age
      |FROM marked
      |WINDOW win AS (PARTITION BY custkey ORDER BY week
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------------------- q78
  /** Time-based moving-window statistics — RANGE frames over the actual
    * calendar, not row counts: a 28-day moving sum/average that stays
    * correct when days are missing (a ROWS frame silently widens its
    * horizon on sparse series; q33's running totals are the ROWS form).
    *
    * Exactness: revenue in integer cents; the moving average is the
    * INTEGER division moving_cents div n_days, so every output column is
    * BIGINT and order-independent.
    *
    * Scale shape: one shuffle to (priority) partitions, then both RANGE
    * frames and the running peak reuse that single sort — days-per-key
    * rows, never corpus rows, flow through the window.
    */
  def movingRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("priority"),
        col("o_orderdate").cast("date").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("day_cents"))
      .withColumn("day_i", datediff(col("day"), lit("1970-01-01").cast("date")))
    val moving = Window.partitionBy("priority").orderBy("day_i")
      .rangeBetween(-27, Window.currentRow)
    val peak = Window.partitionBy("priority").orderBy("day_i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("mov_cents", sum("day_cents").over(moving))
      .withColumn("mov_days", count(lit(1)).over(moving))
      .withColumn("mov_avg_cents", expr("mov_cents div mov_days"))
      .withColumn("peak_cents", max("day_cents").over(peak))
      .select(col("priority"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("day_cents"), col("mov_cents"), col("mov_days"),
        col("mov_avg_cents"), col("peak_cents"))
  }

  private val movingRevenueSql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS priority, o_orderdate::DATE AS day,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents,
      |    date_diff('day', DATE '1970-01-01', o_orderdate::DATE) AS day_i
      |  FROM orders GROUP BY 1, 2, 4
      |)
      |SELECT priority, strftime(day, '%Y-%m-%d') AS day, day_cents,
      |  CAST(sum(day_cents) OVER mov AS BIGINT) AS mov_cents,
      |  count(*) OVER mov AS mov_days,
      |  CAST(sum(day_cents) OVER mov // count(*) OVER mov AS BIGINT) AS mov_avg_cents,
      |  max(day_cents) OVER peak AS peak_cents
      |FROM daily
      |WINDOW
      |  mov AS (PARTITION BY priority ORDER BY day_i
      |          RANGE BETWEEN 27 PRECEDING AND CURRENT ROW),
      |  peak AS (PARTITION BY priority ORDER BY day_i
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------------------- q82
  /** Robust per-group outlier detection — median/MAD instead of
    * mean/stddev (q60's z-score battery): the estimator that does not
    * let the outliers it is hunting drag its own baseline (50% breakdown
    * point vs 0% for the mean; Leys et al. 2013 is the standard
    * reference for |x − med| > 3·MAD).
    *
    * Exactness: medians of BIGINTs are kept integer by the DOUBLED-
    * median trick — med2 = the sum of the two middle order statistics
    * (twice the median, exact for odd and even counts); deviations
    * dev2 = |2x − med2| = 2|x − med|; mad4 = the middle-sum of dev2 =
    * 4·MAD. The gate |x − med| > 3·MAD becomes the integer comparison
    * 2·dev2 > 3·mad4. No division, no floats, no interpolation —
    * bit-identical on any engine.
    *
    * Scale shape: two (key)-partitioned window passes + a broadcast-
    * sized per-key stats join. Only days-per-key rows ever sort — the
    * per-key series is calendar-bounded, never corpus-sized.
    */
  def robustOutliers(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("priority"),
        col("o_orderdate").cast("date").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("day_cents"))
    def middleSum(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = Window.partitionBy("priority").orderBy(col(valueCol), col("day"))
      df.withColumn("__r", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy("priority")))
        .filter(col("__r") === expr("(__n + 1) div 2") ||
          col("__r") === expr("(__n + 2) div 2"))
        .groupBy("priority")
        // Odd n: the same middle row twice; even n: the two middles.
        .agg((sum(col(valueCol)) * lit(2) / count(lit(1))).cast("long").as(out))
    }
    val med = middleSum(daily, "day_cents", "med2")
    val devs = daily.join(broadcast(med), Seq("priority"))
      .withColumn("dev2", abs(col("day_cents") * 2 - col("med2")))
    val mad = middleSum(devs, "dev2", "mad4")
    devs.join(broadcast(mad), Seq("priority"))
      .filter(col("dev2") * 2 > col("mad4") * 3)
      .select(col("priority"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("day_cents"), col("med2"), col("mad4"))
  }

  private val robustOutliersSql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS priority, o_orderdate::DATE AS day,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents
      |  FROM orders GROUP BY 1, 2
      |),
      |med AS (
      |  SELECT priority,
      |    CAST(sum(day_cents) * 2 / count(*) AS BIGINT) AS med2
      |  FROM (
      |    SELECT priority, day_cents,
      |      row_number() OVER (PARTITION BY priority ORDER BY day_cents, day) AS r,
      |      count(*) OVER (PARTITION BY priority) AS n
      |    FROM daily) t
      |  WHERE r = (n + 1) // 2 OR r = (n + 2) // 2
      |  GROUP BY priority
      |),
      |devs AS (
      |  SELECT d.priority, d.day, d.day_cents, m.med2,
      |    abs(d.day_cents * 2 - m.med2) AS dev2
      |  FROM daily d JOIN med m USING (priority)
      |),
      |mad AS (
      |  SELECT priority,
      |    CAST(sum(dev2) * 2 / count(*) AS BIGINT) AS mad4
      |  FROM (
      |    SELECT priority, dev2,
      |      row_number() OVER (PARTITION BY priority ORDER BY dev2, day) AS r,
      |      count(*) OVER (PARTITION BY priority) AS n
      |    FROM devs) t
      |  WHERE r = (n + 1) // 2 OR r = (n + 2) // 2
      |  GROUP BY priority
      |)
      |SELECT d.priority, strftime(d.day, '%Y-%m-%d') AS day,
      |  d.day_cents, d.med2, a.mad4
      |FROM devs d JOIN mad a USING (priority)
      |WHERE d.dev2 * 2 > a.mad4 * 3""".stripMargin

  // ---------------------------------------------------------------- q95
  /** Activity streaks — the classic gaps-and-islands decomposition: each
    * user's distinct active days split into maximal runs of consecutive
    * days via the `day − row_number` island key (consecutive days share
    * it, any gap shifts it — no self-join, no recursion). Everything is
    * integer epoch-day arithmetic on ONE user-keyed sort: dedupe, rank,
    * island-aggregate, and user-aggregate all reuse the same partitioning,
    * so at 100 TB the whole decomposition is a single exchange.
    */
  def activityStreaks(events: DataFrame, userCol: String = "user_id",
                      dayCol: String = "day_num"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(dayCol)
    events
      .select(col(userCol), col(dayCol)).distinct()
      .withColumn("island", col(dayCol) - row_number().over(w))
      .groupBy(col(userCol), col("island"))
      .agg(count(lit(1)).as("streak_days"))
      .groupBy(userCol)
      .agg(sum("streak_days").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max("streak_days").as("max_streak_days"))
  }

  def userStreaks(spark: SparkSession, dir: String): DataFrame =
    activityStreaks(Tables.events(spark, dir)
      .select(col("user_id"), datediff(to_date(col("ts")),
        lit("1970-01-01").cast("date")).cast("long").as("day_num")))

  private val userStreaksSql =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
      |  FROM events
      |), islands AS (
      |  SELECT user_id,
      |    day_num - row_number() OVER (PARTITION BY user_id ORDER BY day_num)
      |      AS island
      |  FROM days
      |), streaks AS (
      |  SELECT user_id, island, count(*) AS streak_days
      |  FROM islands GROUP BY 1, 2
      |)
      |SELECT user_id, CAST(sum(streak_days) AS BIGINT) AS n_active_days,
      |  count(*) AS n_streaks,
      |  CAST(max(streak_days) AS BIGINT) AS max_streak_days
      |FROM streaks GROUP BY user_id""".stripMargin

  // ---------------------------------------------------------------- q99
  /** Group-wise ordinary-least-squares trend — "is this segment's revenue
    * growing, and how fast?" as closed-form regression over per-group
    * sums: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²). Everything is ONE
    * hash aggregation per group (every term is a plain sum — fully
    * partial-aggregable, no sort, no iteration), so the trend of a
    * 100 TB fact table costs one scan + one groups-sized shuffle.
    *
    * Exactness: x is the day offset from the group's own first day
    * (keeps magnitudes small), y integer cents; numerator/denominator
    * are exact BIGINT, and the slope is emitted in integer MICRO-cents
    * per day via the two-step long division q·1e6 + (1e6·r) div den —
    * every output column engine-exact, negative slopes truncate
    * identically under Spark `div` ≡ DuckDB `//`. Headroom: each
    * determinant term must stay under 2^62 — for daily-grain groups
    * (n ≤ ~2.5k, x ≤ ~2.5k) that allows ~7e11 cents/day of group
    * revenue, orders of magnitude past the sf levels bench uses — and
    * the bound is now ENFORCED by a named raise_error on the aggregate
    * row (see the guard below), so exceeding the contract fails loudly
    * with a rescaling hint instead of an anonymous overflow.
    */
  def olsTrend(perX: DataFrame, keyCol: String, xCol: String,
               yCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
    // Loud headroom guard (r9 verdict item 3): the determinant terms
    // n·Σxy, n·Σx², Σx·Σy, (Σx)² are exact only while each stays under
    // 2^62 (so the subtraction cannot wrap either). The bound is checked
    // on the groups-sized aggregate row — conservative by at most one
    // integer-division rounding — and raises a NAMED error telling the
    // caller how to rescale, instead of an anonymous ANSI overflow (or,
    // with ANSI off, a silent wrap). q188's repair made this class loud
    // at the gate; this makes the documented contract self-enforcing.
    val B = 4611686018427387904L // 2^62
    val risk =
      s"""abs(sxy) > $B div n_days OR abs(sxx) > $B div n_days
         | OR abs(sy) > $B div greatest(abs(sx), 1) OR abs(sx) > 2147483647
         |""".stripMargin.replace('\n', ' ')
    val boom = "CAST(raise_error('q99 olsTrend: BIGINT headroom exceeded " +
      "(a determinant term passed 2^62); feed coarser y units (e.g. whole " +
      "dollars, the q158 precedent) or shorter x offsets') AS BIGINT)"
    perX
      .withColumn("x", (col(xCol) - min(col(xCol)).over(w)).cast("long"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_days"), sum("x").as("sx"),
        sum(col(yCol)).as("sy"), sum(col("x") * col(yCol)).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("num",
        expr(s"CASE WHEN $risk THEN $boom ELSE n_days * sxy - sx * sy END"))
      .withColumn("den",
        expr(s"CASE WHEN $risk THEN $boom ELSE n_days * sxx - sx * sx END"))
      .withColumn("slope_micro", expr(
        "(num div den) * 1000000 + (1000000 * (num - (num div den) * den)) div den"))
      .drop("sx", "sxy", "sxx")
  }

  /** Gated q99: daily revenue trend per market segment in micro-cents
    * per day.
    */
  def revenueTrend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        col("o_orderdate").cast("date").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .withColumn("day_i", datediff(col("day"), lit("1970-01-01").cast("date")))
    olsTrend(daily, "segment", "day_i", "cents")
      .select(col("segment"), col("n_days"), col("sy").as("total_cents"),
        col("num"), col("den"), col("slope_micro"))
  }

  private val revenueTrendSql =
    """WITH daily AS (
      |  SELECT c.c_mktsegment AS segment, o.o_orderdate::DATE AS day,
      |    sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2
      |),
      |xs AS (
      |  SELECT segment, cents,
      |    date_diff('day', min(day) OVER (PARTITION BY segment), day) AS x
      |  FROM daily
      |),
      |s AS (
      |  SELECT segment, count(*) AS n_days, sum(x) AS sx, sum(cents) AS sy,
      |    sum(x * cents) AS sxy, sum(x * x) AS sxx
      |  FROM xs GROUP BY 1
      |),
      |f AS (
      |  SELECT segment, n_days, sy,
      |    n_days * sxy - sx * sy AS num, n_days * sxx - sx * sx AS den
      |  FROM s
      |)
      |SELECT segment, CAST(n_days AS BIGINT) AS n_days,
      |  CAST(sy AS BIGINT) AS total_cents,
      |  CAST(num AS BIGINT) AS num, CAST(den AS BIGINT) AS den,
      |  CAST((num // den) * 1000000
      |    + (1000000 * (num - (num // den) * den)) // den AS BIGINT) AS slope_micro
      |FROM f""".stripMargin

  // --------------------------------------------------------------- q203
  /** Theil–Sen robust trend — q99's OLS complement for contaminated
    * series: the slope is the MEDIAN of all pairwise slopes
    * (y_j−y_i)/(x_j−x_i), which survives up to ~29% of the points being
    * corrupted (one bad holiday spike drags an OLS slope arbitrarily;
    * it moves the pairwise-slope median by one rank). Engine-exact: each
    * pair's slope is floored to integer MICRO-cents/week via the q99
    * two-step long division (truncation identical under Spark `div` ≡
    * DuckDB `//` for negative deltas), and the median is the exact
    * lower-median element at rank ⌈n/2⌉ of the sorted slopes — the
    * selected VALUE at a rank is deterministic however ties order, so
    * no tiebreaker column is needed.
    *
    * Scale shape: the only corpus-proportional stage is the fact scan
    * feeding the weekly aggregate; the weekly frame is CALENDAR-bounded
    * (≤ ~320 weeks per group at any corpus size), so the pair space is
    * weeks² ≈ 50k/group — fixed, broadcast-joinable, and independent of
    * data volume. 100 TB costs the same pairs as 100 GB.
    */
  def theilSenTrend(perX: DataFrame, keyCol: String, xCol: String,
                    yCol: String): DataFrame = {
    val l = perX.select(col(keyCol).as("k"), col(xCol).cast("long").as("x1"),
      col(yCol).cast("long").as("y1"))
    val r = perX.select(col(keyCol).as("k2"), col(xCol).cast("long").as("x2"),
      col(yCol).cast("long").as("y2"))
    val wk = Window.partitionBy("k")
    l.join(broadcast(r), col("k") === col("k2") && col("x2") > col("x1"))
      .withColumn("dy", col("y2") - col("y1"))
      .withColumn("dx", col("x2") - col("x1"))
      .withColumn("slope_micro", expr(
        "(dy div dx) * 1000000 + (1000000 * (dy - (dy div dx) * dx)) div dx"))
      .withColumn("rn", row_number().over(wk.orderBy(col("slope_micro"))))
      .withColumn("n_pairs", count(lit(1)).over(wk))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("k"), col("n_pairs"),
        col("slope_micro").as("ts_slope_micro"))
  }

  /** Gated q203: robust weekly revenue trend per market segment in
    * micro-cents per week, alongside the week count behind it.
    */
  def robustRevenueTrend(spark: SparkSession, dir: String): DataFrame = {
    // The weekly frame feeds three consumers (pair left, pair right,
    // week counts) — checkpoint the calendar-bounded aggregate so the
    // fact scan runs exactly once (the chiSquare discipline).
    val weekly = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        (datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")) / 7).cast("long").as("week_i"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .localCheckpoint()
    val weeks = weekly.groupBy(col("segment").as("seg2"))
      .agg(count(lit(1)).as("n_weeks"))
    theilSenTrend(weekly, "segment", "week_i", "cents")
      .join(broadcast(weeks), col("k") === col("seg2"))
      .select(col("k").as("segment"), col("n_weeks"), col("n_pairs"),
        col("ts_slope_micro"))
  }

  private val robustRevenueTrendSql =
    """WITH weekly AS (
      |  SELECT c.c_mktsegment AS segment,
      |    date_diff('day', DATE '1970-01-01', o.o_orderdate::DATE) // 7
      |      AS week_i,
      |    sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2
      |),
      |sl AS (
      |  SELECT a.segment,
      |    ((b.cents - a.cents) // (b.week_i - a.week_i)) * 1000000
      |      + (1000000 * ((b.cents - a.cents)
      |          - ((b.cents - a.cents) // (b.week_i - a.week_i))
      |            * (b.week_i - a.week_i)))
      |        // (b.week_i - a.week_i) AS slope_micro
      |  FROM weekly a JOIN weekly b
      |    ON a.segment = b.segment AND b.week_i > a.week_i
      |),
      |rk AS (
      |  SELECT segment, slope_micro,
      |    row_number() OVER (PARTITION BY segment ORDER BY slope_micro)
      |      AS rn,
      |    count(*) OVER (PARTITION BY segment) AS n_pairs
      |  FROM sl
      |),
      |wc AS (SELECT segment, count(*) AS n_weeks FROM weekly GROUP BY 1)
      |SELECT r.segment, CAST(w.n_weeks AS BIGINT) AS n_weeks,
      |  CAST(r.n_pairs AS BIGINT) AS n_pairs,
      |  CAST(r.slope_micro AS BIGINT) AS ts_slope_micro
      |FROM rk r JOIN wc w ON r.segment = w.segment
      |WHERE r.rn = (r.n_pairs + 1) // 2""".stripMargin

  // --------------------------------------------------------------- q114
  /** Lead-lag cross-correlation of two daily series — "does X lead Y by
    * k days?", the standard question before attributing one metric's
    * movement to another (marketing → orders, views → purchases). For
    * each lag 0..maxLag, align x_t with y_{t+lag} on the calendar (an
    * equi-join on day+lag over DAYS-sized frames) and report the exact
    * integer sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy² — the q99
    * closed-form shape) plus Pearson r from ONE fixed double sequence,
    * rounded to 4 (the q60 z-score discipline). Squared sums ride
    * DECIMAL so daily volumes past ~3e9 cannot wrap silently.
    *
    * Scale shape: the corpus collapses to per-day counts in one hash
    * aggregation; every later step lives on days × lags rows. The lag
    * table is generated, broadcast, and joined — no driver loops.
    */
  def crossCorrelation(x: DataFrame, y: DataFrame, maxLag: Int): DataFrame = {
    val lags = x.sparkSession.range(0, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    val xd = col("x").cast("decimal(19,0)")
    val yd = col("y").cast("decimal(19,0)")
    val sums = broadcast(lags)
      .crossJoin(x.select(col("day_i"), col("x")))
      .withColumn("day_y", col("day_i") + col("lag"))
      .join(y.select(col("day_i").as("day_y"), col("y")), Seq("day_y"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"),
        sum(xd * yd).as("sum_xy"), sum(xd * xd).as("sum_xx"),
        sum(yd * yd).as("sum_yy"))
    val n = col("n_days").cast("double")
    val num = n * col("sum_xy").cast("double") -
      col("sum_x").cast("double") * col("sum_y").cast("double")
    val denx = n * col("sum_xx").cast("double") -
      col("sum_x").cast("double") * col("sum_x").cast("double")
    val deny = n * col("sum_yy").cast("double") -
      col("sum_y").cast("double") * col("sum_y").cast("double")
    sums.withColumn("r",
      when(denx > 0 && deny > 0, round(num / sqrt(denx * deny), 4)))
      // Gate-facing face: the sufficient statistics are emitted as BIGINT
      // (exact here; DECIMAL only guards the in-flight accumulation) so the
      // cross-engine value hash never sees a decimal/int128 representation.
      .withColumn("sum_xy", col("sum_xy").cast("long"))
      .withColumn("sum_xx", col("sum_xx").cast("long"))
      .withColumn("sum_yy", col("sum_yy").cast("long"))
  }

  /** Gated face: do daily views lead daily purchases (lags 0..7)? */
  def viewPurchaseLeadLag(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        .as("day_i"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    crossCorrelation(
      daily.filter(col("event_type") === "view").select(col("day_i"), col("n").as("x")),
      daily.filter(col("event_type") === "purchase").select(col("day_i"), col("n").as("y")),
      maxLag = 7)
  }

  private val viewPurchaseLeadLagSql =
    """WITH daily AS (
      |  SELECT date_diff('day', DATE '1970-01-01', ts::DATE) AS day_i,
      |    event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2
      |),
      |x AS (SELECT day_i, n AS x FROM daily WHERE event_type = 'view'),
      |y AS (SELECT day_i, n AS y FROM daily WHERE event_type = 'purchase'),
      |sums AS (
      |  SELECT l.lag, count(*) AS n_days,
      |    sum(x.x) AS sum_x, sum(y.y) AS sum_y,
      |    sum(x.x::DECIMAL(19,0) * y.y::DECIMAL(19,0)) AS sum_xy,
      |    sum(x.x::DECIMAL(19,0) * x.x::DECIMAL(19,0)) AS sum_xx,
      |    sum(y.y::DECIMAL(19,0) * y.y::DECIMAL(19,0)) AS sum_yy
      |  FROM (SELECT unnest(range(0, 8)) AS lag) l
      |  CROSS JOIN x
      |  JOIN y ON y.day_i = x.day_i + l.lag
      |  GROUP BY 1
      |)
      |SELECT CAST(lag AS INT) AS lag, n_days,
      |  CAST(sum_x AS BIGINT) AS sum_x, CAST(sum_y AS BIGINT) AS sum_y,
      |  CAST(sum_xy AS BIGINT) AS sum_xy, CAST(sum_xx AS BIGINT) AS sum_xx,
      |  CAST(sum_yy AS BIGINT) AS sum_yy,
      |  CASE WHEN n_days::DOUBLE * sum_xx::DOUBLE - sum_x::DOUBLE * sum_x::DOUBLE > 0
      |        AND n_days::DOUBLE * sum_yy::DOUBLE - sum_y::DOUBLE * sum_y::DOUBLE > 0
      |    THEN round(
      |      (n_days::DOUBLE * sum_xy::DOUBLE - sum_x::DOUBLE * sum_y::DOUBLE) /
      |      sqrt((n_days::DOUBLE * sum_xx::DOUBLE - sum_x::DOUBLE * sum_x::DOUBLE) *
      |           (n_days::DOUBLE * sum_yy::DOUBLE - sum_y::DOUBLE * sum_y::DOUBLE)), 4)
      |  END AS r
      |FROM sums""".stripMargin

  // ---------------------------------------------------------------- q127
  /** Weekday seasonality profile — the per-ISO-weekday decomposition of
    * order volume and revenue, with each day's deviation from a flat
    * week as an integer ×1000 seasonality index (1000 = no effect).
    * The calendar-shape complement to q60's outlier days and q78's
    * moving windows: q60 asks "is this day abnormal vs all days"; this
    * asks "what does a NORMAL Monday look like", which is the baseline
    * every anomaly/forecast consumer actually wants to subtract.
    *
    * Scale shape: one scan, one 7-group hash aggregate; the week-total
    * denominators ride a partition-less window over the 7-row result
    * (the q60 days-sized-window discipline — a second corpus pass for a
    * stats subquery would be the wrong shape).
    *
    * Exactness: revenue in integer cents, shares and indices as integer
    * divisions; weekday is Spark `weekday()+1` ≡ DuckDB `isodow`
    * (Monday = 1) — both pure calendar integer functions.
    */
  def weekdaySeasonality(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .groupBy((weekday(col("o_orderdate")) + 1).as("isodow"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("revenue_cents"))
      .select(col("isodow").cast("int").as("isodow"), col("n_orders"),
        col("revenue_cents"),
        expr("CAST(revenue_cents * 1000000 DIV " +
          "sum(revenue_cents) OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND " +
          "UNBOUNDED FOLLOWING) AS BIGINT)").as("revenue_share_ppm"),
        expr("CAST(revenue_cents * 7000 DIV " +
          "sum(revenue_cents) OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND " +
          "UNBOUNDED FOLLOWING) AS BIGINT)").as("seasonality_x1000"),
        expr("CAST(n_orders * 7000 DIV " +
          "sum(n_orders) OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND " +
          "UNBOUNDED FOLLOWING) AS BIGINT)").as("orders_seasonality_x1000"))
  }

  private val weekdaySeasonalitySql =
    """WITH d AS (
      |  SELECT isodow(o_orderdate) AS isodow, count(*) AS n_orders,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |  FROM orders GROUP BY 1
      |)
      |SELECT CAST(isodow AS INTEGER) AS isodow, n_orders, revenue_cents,
      |  CAST(revenue_cents * 1000000 // sum(revenue_cents) OVER () AS BIGINT)
      |    AS revenue_share_ppm,
      |  CAST(revenue_cents * 7000 // sum(revenue_cents) OVER () AS BIGINT)
      |    AS seasonality_x1000,
      |  CAST(n_orders * 7000 // sum(n_orders) OVER () AS BIGINT)
      |    AS orders_seasonality_x1000
      |FROM d""".stripMargin

  // --------------------------------------------------------------- q136
  /** Half-life-decayed revenue per nation — recency-weighted aggregates
    * with EXACT integer arithmetic: each order's cents are divided by
    * 2^(days_back DIV halfLife), i.e. the exponential-decay weight
    * quantized to half-life steps. The quantization is what makes the
    * number portable: `0.5^(days/30.0)` diverges in the last float ulp
    * across engines/libms, `cents DIV (1 << k)` never does — and at the
    * aggregate level the step decay is within 2× of the smooth curve,
    * which is inside the noise of any recency-weighting decision.
    *
    * The shift clamps at 62 (beyond that a BIGINT shift overflows and the
    * weight is 0 anyway — orders older than ~5 years at the default
    * half-life contribute nothing, by design).
    *
    * Scale shape: the same plan as plain revenue-by-nation (q03) — fact
    * scan, customer equi-join, broadcast nation dim, one aggregate; the
    * max-date scalar broadcasts. Decay adds zero shuffles.
    */
  def decayedRevenue(spark: SparkSession, dir: String,
                     halfLifeDays: Int = 30): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val mx = o.agg(max(col("d")).as("mxd"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    o.crossJoin(broadcast(mx))
      .withColumn("k",
        expr(s"least(datediff(mxd, d) DIV $halfLifeDays, 62)").cast("int"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("cents")).as("revenue_cents"),
        sum(expr("cents DIV shiftleft(CAST(1 AS BIGINT), k)"))
          .as("decayed_cents"))
  }

  private val decayedRevenueSql =
    """WITH o AS (
      |  SELECT o_custkey, o_orderdate::DATE AS d,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), mx AS (
      |  SELECT max(d) AS mxd FROM o
      |)
      |SELECT n.n_name,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(o.cents) AS BIGINT) AS revenue_cents,
      |  CAST(sum(o.cents // (1::BIGINT <<
      |    least(date_diff('day', o.d, mx.mxd) // 30, 62))) AS BIGINT)
      |    AS decayed_cents
      |FROM o, mx
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- q175
  /** Kaplan–Meier survival estimator — the churn/retention curve done
    * right: right-censored observations (customers still active at the
    * observation cutoff) reduce the at-risk set without counting as
    * churn, which the naive "fraction still active at t" chart gets
    * wrong. Per group and event time t: d (events), c (censored),
    * n_risk = Σ_{u≥t}(d+c) (a reverse cumulative sum — one window, no
    * self-join), and Ŝ(t) = Π_{u≤t}(1 − d_u/n_u) carried as
    * exp(Σ ln(1−d/n)) over the time-ordered prefix.
    *
    * Exactness: d/n is an IEEE-exact division of two small integers on
    * both engines, ln/exp agree to ~1 ulp (the BM25/TF-IDF precedent),
    * and the prefix sum order is pinned by the per-group time sort, so
    * emitting survival floored to PPM (+½) leaves ~9 orders of magnitude
    * of margin. The d = n_risk boundary (everyone at risk exits — ln(0))
    * is handled structurally: a prefix flag pins survival to exactly 0
    * from that time on, so neither engine ever evaluates ln(0).
    *
    * Scale shape (the q107 discipline): the corpus-sized work is the
    * per-subject first/last aggregation; the KM table itself is one row
    * per (group, distinct time) — bounded by the calendar, not the data —
    * and both windows run inside each group partition in parallel.
    */
  def kaplanMeier(obs: DataFrame, groupCol: String, timeCol: String,
                  eventCol: String): DataFrame = {
    val wPost = Window.partitionBy(groupCol).orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wPre = Window.partitionBy(groupCol).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    obs
      .groupBy(col(groupCol), col(timeCol).cast("long").as("t"))
      .agg(sum(when(col(eventCol), 1L).otherwise(0L)).as("d"),
        sum(when(!col(eventCol), 1L).otherwise(0L)).as("c"))
      .withColumn("n_risk", sum(col("d") + col("c")).over(wPost))
      .withColumn("hit_zero",
        max(when(col("d") === col("n_risk"), 1).otherwise(0)).over(wPre))
      .withColumn("lnf",
        when(col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("surv_ppm",
        when(col("hit_zero") === 1, 0L)
          .otherwise(floor(exp(sum(col("lnf")).over(wPre)) * 1e6 + 0.5)
            .cast("long")))
      .drop("lnf")
  }

  /** Gated q175: customer-lifetime survival per market segment. A
    * customer's lifetime runs first→last order day; they churn if the
    * last order predates the global cutoff (max order date) by more than
    * 90 days, else they are censored at the cutoff.
    */
  def customerSurvival(spark: SparkSession, dir: String): DataFrame = {
    val life = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("first_d"),
        max(to_date(col("o_orderdate"))).as("last_d"))
    val cutoff = life.agg(max(col("last_d")).as("cut"))
    val seg = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    val obs = life.crossJoin(broadcast(cutoff))
      .withColumn("event", datediff(col("cut"), col("last_d")) > 90)
      .withColumn("t",
        when(col("event"), datediff(col("last_d"), col("first_d")))
          .otherwise(datediff(col("cut"), col("first_d"))))
      .join(seg, col("o_custkey") === col("c_custkey"))
    kaplanMeier(obs, "segment", "t", "event")
      .select(col("segment"), col("t"), col("d"), col("c"), col("n_risk"),
        col("hit_zero"), col("surv_ppm"))
  }

  private val customerSurvivalSql =
    """WITH life AS (
      |  SELECT o_custkey, min(o_orderdate::DATE) AS first_d,
      |    max(o_orderdate::DATE) AS last_d
      |  FROM orders GROUP BY 1
      |),
      |cut AS (SELECT max(last_d) AS cut FROM life),
      |obs AS (
      |  SELECT c.c_mktsegment AS segment,
      |    date_diff('day', cut.cut, l.last_d) < -90 AS event,
      |    CASE WHEN date_diff('day', cut.cut, l.last_d) < -90
      |      THEN date_diff('day', l.first_d, l.last_d)
      |      ELSE date_diff('day', l.first_d, cut.cut) END AS t
      |  FROM life l CROSS JOIN cut JOIN customer c ON c.c_custkey = l.o_custkey
      |),
      |byt AS (
      |  SELECT segment, CAST(t AS BIGINT) AS t,
      |    sum(CASE WHEN event THEN 1 ELSE 0 END) AS d,
      |    sum(CASE WHEN event THEN 0 ELSE 1 END) AS c
      |  FROM obs GROUP BY 1, 2
      |),
      |risk AS (
      |  SELECT *, sum(d + c) OVER (PARTITION BY segment ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
      |  FROM byt
      |),
      |flags AS (
      |  SELECT *,
      |    max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY segment ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hit_zero,
      |    CASE WHEN d < n_risk
      |      THEN ln(1.0::DOUBLE - d::DOUBLE / n_risk::DOUBLE)
      |      ELSE 0.0::DOUBLE END AS lnf
      |  FROM risk
      |)
      |SELECT segment, t, CAST(d AS BIGINT) AS d, CAST(c AS BIGINT) AS c,
      |  CAST(n_risk AS BIGINT) AS n_risk, CAST(hit_zero AS INTEGER) AS hit_zero,
      |  CASE WHEN hit_zero = 1 THEN 0 ELSE CAST(floor(
      |    exp(sum(lnf) OVER (PARTITION BY segment ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) END AS surv_ppm
      |FROM flags""".stripMargin

  // --------------------------------------------------------------- q206
  /** Two-cohort log-rank test — [[kaplanMeier]]'s inferential partner:
    * "are these two survival curves DIFFERENT, beyond censoring noise?"
    * At each pooled event time t with d_t ≥ 1 events: cohort 1's
    * expected share under H₀ is E1_t = d_t·N1_t/N_t and the
    * hypergeometric variance is V_t = d_t·N1·N2·(N_t−d_t)/(N_t²(N_t−1));
    * the statistic (ΣO1 − ΣE1)²/ΣV is χ²(1). Censored exits reduce the
    * at-risk sets without contributing terms — the property the naive
    * two-proportion z-test on "churn rate" lacks.
    *
    * Exactness: the time table carries exact BIGINT d/c counts split by
    * cohort in ONE group-by (no outer join needed); at-risk counts are
    * reverse-inclusive integer window sums (the q175 shape); each
    * time's E1/V terms are fixed double sequences over those integers
    * floored to NANO units, so the three Σs are order-independent
    * integer sums and the final statistic is one more fixed double
    * sequence. The N_t = 1 tail (variance term undefined) contributes
    * exactly 0 by guard in both engines.
    *
    * Scale shape: corpus-sized work is the per-subject lifetime
    * aggregate; the merged time table is calendar-bounded (distinct
    * lifetime days), so the global-order windows run on a bounded
    * frame — the q178 single-partition exception.
    */
  def logRank(obs: DataFrame, cohort1Col: String, timeCol: String,
              eventCol: String): DataFrame = {
    val wPost = Window.partitionBy().orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val g1 = col(cohort1Col)
    obs
      .groupBy(col(timeCol).cast("long").as("t"))
      .agg(sum(when(g1 && col(eventCol), 1L).otherwise(0L)).as("d1"),
        sum(when(g1 && !col(eventCol), 1L).otherwise(0L)).as("c1"),
        sum(when(!g1 && col(eventCol), 1L).otherwise(0L)).as("d2"),
        sum(when(!g1 && !col(eventCol), 1L).otherwise(0L)).as("c2"))
      .withColumn("n1", sum(col("d1") + col("c1")).over(wPost))
      .withColumn("n2", sum(col("d2") + col("c2")).over(wPost))
      .filter(col("d1") + col("d2") >= 1)
      .withColumn("nt", col("n1") + col("n2"))
      .withColumn("dt", col("d1") + col("d2"))
      .withColumn("e1_nano", floor(col("dt").cast("double")
        * col("n1").cast("double") / col("nt").cast("double")
        * lit(1e9) + lit(0.5)).cast("long"))
      .withColumn("v_nano", when(col("nt") > 1, floor(
        col("dt").cast("double") * col("n1").cast("double")
          * col("n2").cast("double") * (col("nt") - col("dt")).cast("double")
          / (col("nt").cast("double") * col("nt").cast("double")
            * (col("nt") - 1).cast("double"))
          * lit(1e9) + lit(0.5)).cast("long")).otherwise(lit(0L)))
      .agg(count(lit(1)).as("n_times"), sum("d1").as("o1"),
        sum("e1_nano").as("e1_nano"), sum("v_nano").as("v_nano"))
      .withColumn("z2_micro", floor(
        (col("o1").cast("double") - col("e1_nano").cast("double") / lit(1e9))
          * (col("o1").cast("double")
            - col("e1_nano").cast("double") / lit(1e9))
          / (col("v_nano").cast("double") / lit(1e9))
          * lit(1000000.0) + lit(0.5)).cast("long"))
  }

  /** Gated q206: do funded customers (non-negative account balance)
    * survive longer than overdrawn ones? Lifetime/churn defined exactly
    * as q175.
    */
  def balanceChurnLogRank(spark: SparkSession, dir: String): DataFrame = {
    val life = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("first_d"),
        max(to_date(col("o_orderdate"))).as("last_d"))
    val cutoff = life.agg(max(col("last_d")).as("cut"))
    val bal = Tables.customer(spark, dir)
      .select(col("c_custkey"), (col("c_acctbal") >= 0).as("funded"))
    val obs = life.crossJoin(broadcast(cutoff))
      .withColumn("event", datediff(col("cut"), col("last_d")) > 90)
      .withColumn("t",
        when(col("event"), datediff(col("last_d"), col("first_d")))
          .otherwise(datediff(col("cut"), col("first_d"))))
      .join(bal, col("o_custkey") === col("c_custkey"))
    logRank(obs, "funded", "t", "event")
      .select(col("n_times"), col("o1"), col("e1_nano"), col("v_nano"),
        col("z2_micro"))
  }

  private val balanceChurnLogRankSql =
    """WITH life AS (
      |  SELECT o_custkey, min(o_orderdate::DATE) AS first_d,
      |    max(o_orderdate::DATE) AS last_d
      |  FROM orders GROUP BY 1
      |),
      |cut AS (SELECT max(last_d) AS cut FROM life),
      |obs AS (
      |  SELECT c.c_acctbal >= 0 AS g1,
      |    date_diff('day', cut.cut, l.last_d) < -90 AS event,
      |    CASE WHEN date_diff('day', cut.cut, l.last_d) < -90
      |      THEN date_diff('day', l.first_d, l.last_d)
      |      ELSE date_diff('day', l.first_d, cut.cut) END AS t
      |  FROM life l CROSS JOIN cut JOIN customer c ON c.c_custkey = l.o_custkey
      |),
      |byt AS (
      |  SELECT CAST(t AS BIGINT) AS t,
      |    sum(CASE WHEN g1 AND event THEN 1 ELSE 0 END) AS d1,
      |    sum(CASE WHEN g1 AND NOT event THEN 1 ELSE 0 END) AS c1,
      |    sum(CASE WHEN NOT g1 AND event THEN 1 ELSE 0 END) AS d2,
      |    sum(CASE WHEN NOT g1 AND NOT event THEN 1 ELSE 0 END) AS c2
      |  FROM obs GROUP BY 1
      |),
      |risk AS (
      |  SELECT *,
      |    sum(d1 + c1) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n1,
      |    sum(d2 + c2) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n2
      |  FROM byt
      |),
      |terms AS (
      |  SELECT d1, d1 + d2 AS dt, n1, n2, n1 + n2 AS nt
      |  FROM risk WHERE d1 + d2 >= 1
      |),
      |nano AS (
      |  SELECT d1,
      |    CAST(floor(dt::DOUBLE * n1::DOUBLE / nt::DOUBLE
      |      * 1000000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS e1_nano,
      |    CASE WHEN nt > 1 THEN CAST(floor(
      |      dt::DOUBLE * n1::DOUBLE * n2::DOUBLE * (nt - dt)::DOUBLE
      |      / (nt::DOUBLE * nt::DOUBLE * (nt - 1)::DOUBLE)
      |      * 1000000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT)
      |      ELSE 0 END AS v_nano
      |  FROM terms
      |),
      |agg AS (
      |  SELECT count(*) AS n_times, sum(d1) AS o1,
      |    sum(e1_nano) AS e1_nano, sum(v_nano) AS v_nano
      |  FROM nano
      |)
      |SELECT CAST(n_times AS BIGINT) AS n_times, CAST(o1 AS BIGINT) AS o1,
      |  CAST(e1_nano AS BIGINT) AS e1_nano, CAST(v_nano AS BIGINT) AS v_nano,
      |  CAST(floor(
      |    (o1::DOUBLE - e1_nano::DOUBLE / 1000000000.0::DOUBLE)
      |    * (o1::DOUBLE - e1_nano::DOUBLE / 1000000000.0::DOUBLE)
      |    / (v_nano::DOUBLE / 1000000000.0::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS z2_micro
      |FROM agg""".stripMargin

  // --------------------------------------------------------------- q176
  /** Truncated-EWMA one-step-ahead forecast — the cheap online baseline
    * every metric-monitoring pipeline runs before reaching for real
    * models: ŷ_t = Σ_{j=1..8} w_j·y_{t−j} with exponential weights
    * α(1−α)^{j−1}, α = 0.3, truncated at 8 lags and renormalized. The
    * whole forecast is EXACT integer arithmetic: with α = 3/10 the
    * weights over a common denominator 10⁸ are the integers
    * 3·7^{j−1}·10^{8−j}, whose sum is 10⁸ − 7⁸ = 94 235 199, so
    * ŷ = (Σ cents_{t−j}·w_j) div 94 235 199 — no float ever appears.
    * Headroom: the weighted numerator rides DECIMAL(38,0) because the
    * BIGINT bound (Σ terms ≤ 8·3e7·max_cents < 2⁶³ ⇒ ≤ ~$380M/week per
    * group) is crossed within plausible bench decades — sf100 weekly
    * per-nation revenue is ~2.3·10¹¹ cents — and under ANSI that fails
    * hard instead of degrading. Decimal keeps the identical truncating
    * division to 1e38 (the oracle reaches the same values via HUGEINT),
    * and it touches only the (key, week)-grain rows, never the fact
    * scan.
    *
    * Scale shape: one fact aggregation to (nation, week), then eight
    * `lag`s inside ONE per-nation window sort over a calendar-bounded
    * series. Rows without a full 8-lag history are reported with null
    * forecast (warm-up), not silently dropped.
    */
  def ewmaForecast(perT: DataFrame, keyCol: String, tCol: String,
                   yCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tCol))
    val weights = Seq.tabulate(8)(j =>
      3L * math.pow(7, j).toLong * math.pow(10, 7 - j).toLong)
    val den = 100000000L - 5764801L
    val num = weights.zipWithIndex.map { case (wt, j) =>
      lag(col(yCol), j + 1).over(w).cast("decimal(38,0)") * lit(wt)
    }.reduce(_ + _)
    perT
      .withColumn("fnum", num)
      .withColumn("forecast", expr(s"fnum div $den"))
      .drop("fnum")
      .withColumn("abs_err",
        when(col("forecast").isNotNull, abs(col(yCol) - col("forecast"))))
  }

  /** Gated q176: weekly revenue EWMA forecast + error per nation. */
  def weeklyEwmaForecast(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("nation"),
        date_trunc("week", col("o_orderdate")).cast("date").as("week"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    ewmaForecast(weekly, "nation", "week", "cents")
      .select(col("nation"),
        date_format(col("week"), "yyyy-MM-dd").as("week_start"),
        col("cents"), col("forecast"), col("abs_err"))
  }

  private val weeklyEwmaForecastSql =
    """WITH weekly AS (
      |  SELECT n.n_name AS nation,
      |    date_trunc('week', o.o_orderdate)::DATE AS week,
      |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders o
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n ON n.n_nationkey = c.c_nationkey
      |  GROUP BY 1, 2
      |),
      |lagged AS (
      |  SELECT nation, week, cents,
      |    lag(cents, 1) OVER w AS l1, lag(cents, 2) OVER w AS l2,
      |    lag(cents, 3) OVER w AS l3, lag(cents, 4) OVER w AS l4,
      |    lag(cents, 5) OVER w AS l5, lag(cents, 6) OVER w AS l6,
      |    lag(cents, 7) OVER w AS l7, lag(cents, 8) OVER w AS l8
      |  FROM weekly
      |  WINDOW w AS (PARTITION BY nation ORDER BY week)
      |),
      |f AS (
      |  SELECT nation, week, cents,
      |    (CAST(l1 AS HUGEINT) * 30000000 + CAST(l2 AS HUGEINT) * 21000000
      |     + CAST(l3 AS HUGEINT) * 14700000 + CAST(l4 AS HUGEINT) * 10290000
      |     + CAST(l5 AS HUGEINT) * 7203000 + CAST(l6 AS HUGEINT) * 5042100
      |     + CAST(l7 AS HUGEINT) * 3529470 + CAST(l8 AS HUGEINT) * 2470629)
      |      // 94235199 AS forecast
      |  FROM lagged
      |)
      |SELECT nation, strftime(week, '%Y-%m-%d') AS week_start, cents,
      |  CAST(forecast AS BIGINT) AS forecast,
      |  CASE WHEN forecast IS NOT NULL
      |    THEN CAST(abs(cents - forecast) AS BIGINT) END AS abs_err
      |FROM f""".stripMargin

  // --------------------------------------------------------------- q177
  /** CUSUM drift detection — the sequential change-point monitor: the
    * one-sided cumulative sum S_t = max(0, S_{t−1} + (y_t − ref))
    * accumulates only sustained upward deviation from a reference level
    * and fires when it clears a threshold, catching slow drifts a
    * per-point z-score (q60) misses. The recursion is not directly
    * window-expressible, but the q141 prefix-min identity is:
    * S_t = cum_t − min(0, min_{u≤t} cum_u) where cum is the plain prefix
    * sum of deviations — two windows, zero iteration, exact BIGINT cents
    * end to end (ref is the group's integer-mean via truncating
    * division; the threshold is 2·ref — a deterministic default).
    *
    * Scale shape: one fact aggregation to (group, day), then two windows
    * inside the same per-group sort; series length is calendar-bounded.
    */
  def cusumDrift(perT: DataFrame, keyCol: String, tCol: String,
                 yCol: String): DataFrame = {
    val wAll = Window.partitionBy(keyCol)
    val wPre = Window.partitionBy(keyCol).orderBy(col(tCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perT
      .withColumn("tot", sum(col(yCol)).over(wAll))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .withColumn("ref", expr("tot div cnt"))
      .drop("tot", "cnt")
      .withColumn("cum", sum(col(yCol) - col("ref")).over(wPre))
      .withColumn("s",
        col("cum") - least(lit(0L), min(col("cum")).over(wPre)))
      .withColumn("flagged", col("s") > col("ref") * 2L)
      .drop("cum")
  }

  /** Gated q177: daily revenue CUSUM per market segment. */
  def revenueCusum(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    cusumDrift(daily, "segment", "day", "cents")
      .select(col("segment"),
        date_format(col("day"), "yyyy-MM-dd").as("day_s"),
        col("cents"), col("ref"), col("s"), col("flagged"))
  }

  private val revenueCusumSql =
    """WITH daily AS (
      |  SELECT c.c_mktsegment AS segment, o.o_orderdate::DATE AS day,
      |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2
      |),
      |r AS (
      |  SELECT *, sum(cents) OVER (PARTITION BY segment)
      |    // count(*) OVER (PARTITION BY segment) AS ref
      |  FROM daily
      |),
      |cu AS (
      |  SELECT *, sum(cents - ref) OVER (PARTITION BY segment ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM r
      |),
      |s AS (
      |  SELECT *, cum - least(0, min(cum) OVER (PARTITION BY segment
      |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
      |  FROM cu
      |)
      |SELECT segment, strftime(day, '%Y-%m-%d') AS day_s, cents,
      |  CAST(ref AS BIGINT) AS ref, CAST(s AS BIGINT) AS s,
      |  s > ref * 2 AS flagged
      |FROM s""".stripMargin

  // --------------------------------------------------------------- q220
  /** Wald–Wolfowitz runs test — "is this series RANDOM around its
    * level, or does it trend/oscillate?": dichotomize each day as
    * above/below the series mean, count the runs of consecutive
    * same-side days, and compare against the exact randomness null
    * μ = 1 + 2n₁n₂/n, σ² = 2n₁n₂(2n₁n₂−n)/(n²(n−1)). Too FEW runs ⇒
    * sticky drift (the regime q177's CUSUM then locates); too MANY ⇒
    * oscillation/over-correction. The monitoring battery reads this
    * first: it needs no reference period and no threshold.
    *
    * Exactness: the above/below cut is the division-free comparison
    * cents·n > Σcents (ties land on the below side, deterministically);
    * runs and side counts are exact BIGINT via one lag window; z is ONE
    * fixed double sequence over those exact integers, floored to micro.
    * Degenerate series (either side empty, n < 2, or 2n₁n₂ ≤ n where
    * σ = 0) report null z.
    *
    * Scale shape: the q177 shape exactly — fact scan → (group, day)
    * aggregate, one lag inside the per-group calendar-bounded window,
    * one group rollup.
    */
  def runsTest(perT: DataFrame, keyCol: String, tCol: String,
               yCol: String): DataFrame = {
    val wAll = Window.partitionBy(keyCol)
    val wSeq = Window.partitionBy(keyCol).orderBy(col(tCol))
    perT
      .withColumn("above",
        col(yCol) * count(lit(1)).over(wAll) > sum(col(yCol)).over(wAll))
      .withColumn("brk",
        when(lag(col("above"), 1).over(wSeq).isNull
          || lag(col("above"), 1).over(wSeq) =!= col("above"), 1L)
          .otherwise(0L))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("above"), 1L).otherwise(0L)).as("n_above"),
        sum(when(!col("above"), 1L).otherwise(0L)).as("n_below"),
        sum("brk").as("runs"))
      .withColumn("z_micro",
        when(col("n_above") > 0 && col("n_below") > 0 && col("n_days") > 1
          && lit(2L) * col("n_above") * col("n_below") > col("n_days"),
          floor(
            (col("runs").cast("double")
              - (lit(1.0) + lit(2.0) * col("n_above").cast("double")
                * col("n_below").cast("double") / col("n_days").cast("double")))
              / sqrt(lit(2.0) * col("n_above").cast("double")
                * col("n_below").cast("double")
                * (lit(2.0) * col("n_above").cast("double")
                  * col("n_below").cast("double") - col("n_days").cast("double"))
                / (col("n_days").cast("double") * col("n_days").cast("double")
                  * (col("n_days").cast("double") - lit(1.0))))
              * lit(1000000.0) + lit(0.5)).cast("long")))
  }

  /** Gated q220: is daily segment revenue random around its mean? */
  def revenueRunsTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    runsTest(daily, "segment", "day", "cents")
  }

  private val revenueRunsSql =
    """WITH daily AS (
      |  SELECT c.c_mktsegment AS segment, o.o_orderdate::DATE AS day,
      |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2
      |),
      |ab AS (
      |  SELECT segment, day,
      |    cents * count(*) OVER (PARTITION BY segment)
      |      > sum(cents) OVER (PARTITION BY segment) AS above
      |  FROM daily
      |),
      |brk AS (
      |  SELECT segment, above,
      |    CASE WHEN lag(above, 1) OVER (PARTITION BY segment ORDER BY day)
      |      IS DISTINCT FROM above THEN 1 ELSE 0 END AS brk
      |  FROM ab
      |),
      |s AS (
      |  SELECT segment, count(*) AS n_days,
      |    sum(CASE WHEN above THEN 1 ELSE 0 END) AS n_above,
      |    sum(CASE WHEN NOT above THEN 1 ELSE 0 END) AS n_below,
      |    sum(brk) AS runs
      |  FROM brk GROUP BY 1
      |)
      |SELECT segment, CAST(n_days AS BIGINT) AS n_days,
      |  CAST(n_above AS BIGINT) AS n_above,
      |  CAST(n_below AS BIGINT) AS n_below, CAST(runs AS BIGINT) AS runs,
      |  CASE WHEN n_above > 0 AND n_below > 0 AND n_days > 1
      |      AND 2 * n_above * n_below > n_days THEN
      |    CAST(floor(
      |      (runs::DOUBLE - (1.0::DOUBLE + 2.0::DOUBLE * n_above::DOUBLE
      |        * n_below::DOUBLE / n_days::DOUBLE))
      |      / sqrt(2.0::DOUBLE * n_above::DOUBLE * n_below::DOUBLE
      |        * (2.0::DOUBLE * n_above::DOUBLE * n_below::DOUBLE
      |           - n_days::DOUBLE)
      |        / (n_days::DOUBLE * n_days::DOUBLE
      |           * (n_days::DOUBLE - 1.0::DOUBLE)))
      |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) END AS z_micro
      |FROM s""".stripMargin

  // --------------------------------------------------------------- q231
  /** Mann–Kendall trend test — the SIGNIFICANCE companion to q203's
    * Theil–Sen slope: Theil–Sen answers "how steep?", this answers "is
    * there a monotone trend at all?" without assuming linearity or any
    * distribution: S = Σ_{i<j} sign(y_j − y_i) over time pairs, with the
    * tie-corrected null variance
    * Var = [n(n−1)(2n+5) − Σ_v t_v(t_v−1)(2t_v+5)]/18 and the
    * continuity-corrected z = (S ∓ 1)/√Var. The standard pairing in
    * hydrology/monitoring — a pipeline flags a metric when |z| clears
    * the gate and then reads q203's slope for the magnitude.
    *
    * Exactness: S, n, and the tie cubes are exact BIGINT (tie groups
    * come from the same per-(key, value) aggregate discipline as q214);
    * z is one fixed double sequence floored to micro. S = 0 or Var ≤ 0
    * reports z = 0 / null respectively.
    *
    * Scale shape: the q203 shape exactly — the calendar-bounded weekly
    * frame is localCheckpointed by the caller, pairs are per-key within
    * that frame (≤ weeks²/2 per key at ANY corpus scale), plus one
    * (key, value) tie aggregate.
    */
  def mannKendall(perX: DataFrame, keyCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val l = perX.select(col(keyCol).as("k"), col(xCol).cast("long").as("x1"),
      col(yCol).cast("long").as("y1"))
    val r = perX.select(col(keyCol).as("k2"), col(xCol).cast("long").as("x2"),
      col(yCol).cast("long").as("y2"))
    val s = l.join(broadcast(r), col("k") === col("k2") && col("x2") > col("x1"))
      .groupBy(col("k"))
      .agg(sum(signum(col("y2") - col("y1")).cast("long")).as("s_stat"))
    val ties = perX
      .groupBy(col(keyCol).as("k3"), col(yCol).as("yv"))
      .agg(count(lit(1)).as("t_v"))
      .groupBy(col("k3"))
      .agg(count(lit(1)).as("n_distinct"), sum("t_v").as("n_obs"),
        sum(col("t_v") * (col("t_v") - 1L) * (col("t_v") * 2L + 5L))
          .as("tie_term"))
    val (sD, nD, tD) = (col("s_stat").cast("double"),
      col("n_obs").cast("double"), col("tie_term").cast("double"))
    val varD = (nD * (nD - lit(1.0)) * (nD * 2.0 + lit(5.0)) - tD) / lit(18.0)
    s.join(broadcast(ties), col("k") === col("k3"))
      .withColumn("z_micro",
        when(col("s_stat") === 0L, 0L)
          .when(varD > 0, floor(
            (sD - signum(sD)) / sqrt(varD) * lit(1000000.0) + lit(0.5))
            .cast("long")))
      .select(col("k"), col("n_obs"), col("n_distinct"), col("s_stat"),
        col("tie_term"), col("z_micro"))
  }

  /** Gated q231: is weekly segment revenue monotonically trending? Reads
    * next to q203's Theil–Sen slope over the identical weekly frame.
    */
  def revenueMannKendall(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        (datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")) / 7).cast("long").as("week_i"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .localCheckpoint()
    mannKendall(weekly, "segment", "week_i", "cents")
      .select(col("k").as("segment"), col("n_obs"), col("n_distinct"),
        col("s_stat"), col("tie_term"), col("z_micro"))
  }

  private val mannKendallSql =
    """WITH weekly AS (
      |  SELECT c.c_mktsegment AS segment,
      |    CAST(datediff('day', DATE '1970-01-01', o.o_orderdate::DATE) // 7
      |      AS BIGINT) AS week_i,
      |    sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2
      |),
      |s AS (
      |  SELECT a.segment AS k,
      |    sum(CASE WHEN b.cents > a.cents THEN 1
      |             WHEN b.cents < a.cents THEN -1 ELSE 0 END) AS s_stat
      |  FROM weekly a JOIN weekly b
      |    ON b.segment = a.segment AND b.week_i > a.week_i
      |  GROUP BY 1
      |),
      |ties AS (
      |  SELECT segment AS k3, count(*) AS n_distinct, sum(t_v) AS n_obs,
      |    sum(t_v * (t_v - 1) * (t_v * 2 + 5)) AS tie_term
      |  FROM (SELECT segment, cents, count(*) AS t_v
      |        FROM weekly GROUP BY 1, 2)
      |  GROUP BY 1
      |)
      |SELECT s.k AS segment, CAST(t.n_obs AS BIGINT) AS n_obs,
      |  CAST(t.n_distinct AS BIGINT) AS n_distinct,
      |  CAST(s.s_stat AS BIGINT) AS s_stat,
      |  CAST(t.tie_term AS BIGINT) AS tie_term,
      |  CASE WHEN s.s_stat = 0 THEN 0
      |    WHEN (t.n_obs::DOUBLE * (t.n_obs::DOUBLE - 1.0::DOUBLE)
      |          * (t.n_obs::DOUBLE * 2.0::DOUBLE + 5.0::DOUBLE)
      |          - t.tie_term::DOUBLE) / 18.0::DOUBLE > 0
      |    THEN CAST(floor(
      |      (s.s_stat::DOUBLE - CASE WHEN s.s_stat > 0 THEN 1.0::DOUBLE
      |        WHEN s.s_stat < 0 THEN -1.0::DOUBLE ELSE 0.0::DOUBLE END)
      |      / sqrt((t.n_obs::DOUBLE * (t.n_obs::DOUBLE - 1.0::DOUBLE)
      |              * (t.n_obs::DOUBLE * 2.0::DOUBLE + 5.0::DOUBLE)
      |              - t.tie_term::DOUBLE) / 18.0::DOUBLE)
      |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) END AS z_micro
      |FROM s JOIN ties t ON t.k3 = s.k""".stripMargin

  // --------------------------------------------------------------- q184
  /** Forecast backtest — the "is the model better than doing nothing?"
    * harness: replay the truncated-EWMA forecaster (the q176 kernel) and
    * the naive last-value forecast over the same held-out rows and score
    * both by MAE, plus the MASE-style skill ratio
    * skill_ppm = 1e6·ΣAE_ewma / ΣAE_naive (<1e6 ⇒ the model beats
    * naive — the Hyndman guard against deploying a forecaster worse
    * than persistence). Errors are integer cents; MAEs and the ratio ride
    * the micro-unit two-step division, so the whole scoreboard is
    * engine-exact. Only rows where BOTH forecasts exist (full 8-lag
    * warm-up) are scored — same eval set for both models by construction.
    *
    * Scale shape: the q176 plan plus one more lag inside the SAME
    * per-key window sort, then a key-sized aggregate. Zero extra
    * shuffles over the forecast itself.
    */
  def forecastBacktest(perT: DataFrame, keyCol: String, tCol: String,
                       yCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tCol))
    ewmaForecast(perT, keyCol, tCol, yCol)
      .withColumn("naive", lag(col(yCol), 1).over(w))
      .filter(col("forecast").isNotNull && col("naive").isNotNull)
      .withColumn("ae_naive", abs(col(yCol) - col("naive")))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_eval"),
        sum("abs_err").as("sae_ewma"),
        sum("ae_naive").as("sae_naive"))
      .withColumn("mae_ewma_micro", expr(
        """(sae_ewma div n_eval) * 1000000
          | + (1000000 * (sae_ewma - (sae_ewma div n_eval) * n_eval)) div n_eval"""
          .stripMargin))
      .withColumn("mae_naive_micro", expr(
        """(sae_naive div n_eval) * 1000000
          | + (1000000 * (sae_naive - (sae_naive div n_eval) * n_eval)) div n_eval"""
          .stripMargin))
      .withColumn("skill_ppm",
        when(col("sae_naive") > 0, expr(
          """(sae_ewma div sae_naive) * 1000000
            | + (1000000 * (sae_ewma - (sae_ewma div sae_naive) * sae_naive))
            |   div sae_naive""".stripMargin)))
  }

  /** Gated q184: weekly-revenue backtest per nation (EWMA vs naive). */
  def weeklyForecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("nation"),
        date_trunc("week", col("o_orderdate")).cast("date").as("week"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    forecastBacktest(weekly, "nation", "week", "cents")
      .select(col("nation"), col("n_eval"), col("sae_ewma"),
        col("sae_naive"), col("mae_ewma_micro"), col("mae_naive_micro"),
        col("skill_ppm"))
  }

  private val weeklyForecastBacktestSql =
    """WITH weekly AS (
      |  SELECT n.n_name AS nation,
      |    date_trunc('week', o.o_orderdate)::DATE AS week,
      |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders o
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n ON n.n_nationkey = c.c_nationkey
      |  GROUP BY 1, 2
      |),
      |lagged AS (
      |  SELECT nation, week, cents,
      |    lag(cents, 1) OVER w AS l1, lag(cents, 2) OVER w AS l2,
      |    lag(cents, 3) OVER w AS l3, lag(cents, 4) OVER w AS l4,
      |    lag(cents, 5) OVER w AS l5, lag(cents, 6) OVER w AS l6,
      |    lag(cents, 7) OVER w AS l7, lag(cents, 8) OVER w AS l8
      |  FROM weekly
      |  WINDOW w AS (PARTITION BY nation ORDER BY week)
      |),
      |f AS (
      |  SELECT nation, cents, l1 AS naive,
      |    (CAST(l1 AS HUGEINT) * 30000000 + CAST(l2 AS HUGEINT) * 21000000
      |     + CAST(l3 AS HUGEINT) * 14700000 + CAST(l4 AS HUGEINT) * 10290000
      |     + CAST(l5 AS HUGEINT) * 7203000 + CAST(l6 AS HUGEINT) * 5042100
      |     + CAST(l7 AS HUGEINT) * 3529470 + CAST(l8 AS HUGEINT) * 2470629)
      |      // 94235199 AS forecast
      |  FROM lagged
      |),
      |s AS (
      |  SELECT nation, count(*) AS n_eval,
      |    sum(abs(cents - forecast)) AS sae_ewma,
      |    sum(abs(cents - naive)) AS sae_naive
      |  FROM f WHERE forecast IS NOT NULL AND naive IS NOT NULL
      |  GROUP BY 1
      |)
      |SELECT nation, CAST(n_eval AS BIGINT) AS n_eval,
      |  CAST(sae_ewma AS BIGINT) AS sae_ewma,
      |  CAST(sae_naive AS BIGINT) AS sae_naive,
      |  CAST((sae_ewma // n_eval) * 1000000
      |    + (1000000 * (sae_ewma - (sae_ewma // n_eval) * n_eval)) // n_eval
      |    AS BIGINT) AS mae_ewma_micro,
      |  CAST((sae_naive // n_eval) * 1000000
      |    + (1000000 * (sae_naive - (sae_naive // n_eval) * n_eval)) // n_eval
      |    AS BIGINT) AS mae_naive_micro,
      |  CASE WHEN sae_naive > 0 THEN CAST((sae_ewma // sae_naive) * 1000000
      |    + (1000000 * (sae_ewma - (sae_ewma // sae_naive) * sae_naive))
      |      // sae_naive AS BIGINT) END AS skill_ppm
      |FROM s""".stripMargin

  // --------------------------------------------------------------- q194
  /** Weekday-adjusted (de-seasonalized) daily revenue — divide each
    * day's revenue by its weekday's seasonality index (the q127 ratio:
    * weekday share × 7), so Monday dips and Friday peaks stop
    * masquerading as trend. The index is exact integer per-mille
    * (idx_x1000 = 7000·dow_cents div total_cents) and the adjustment is
    * one more integer division (adj = cents·1000 div idx) — the whole
    * correction is float-free and self-normalizing (mean idx ≈ 1000 by
    * construction).
    *
    * Scale shape: one fact scan → daily aggregate; the weekday index is
    * a 7-row broadcast derived from the same aggregate — no second
    * corpus pass, no extra shuffle beyond the daily rollup.
    */
  def weekdayAdjusted(daily: DataFrame, dayCol: String,
                      centsCol: String): DataFrame = {
    val idx = daily
      .groupBy(dayofweek(col(dayCol)).as("dw"))
      .agg(sum(col(centsCol)).as("dow_cents"))
      .withColumn("tot", sum(col("dow_cents")).over(Window.partitionBy()))
      .withColumn("idx_x1000", expr("(7000 * dow_cents) div tot"))
      .select("dw", "idx_x1000")
    daily
      .withColumn("dw", dayofweek(col(dayCol)))
      .join(broadcast(idx), Seq("dw"))
      .withColumn("adj_cents", expr(s"($centsCol * 1000) div idx_x1000"))
  }

  /** Gated q194: weekday-adjusted daily order revenue. */
  def adjustedDailyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    weekdayAdjusted(daily, "day", "cents")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day_s"),
        col("dw"), col("cents"), col("idx_x1000"), col("adj_cents"))
  }

  private val adjustedDailyRevenueSql =
    """WITH daily AS (
      |  SELECT o_orderdate::DATE AS day,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1
      |),
      |idx AS (
      |  SELECT dayofweek(day) + 1 AS dw, sum(cents) AS dow_cents,
      |    sum(sum(cents)) OVER () AS tot
      |  FROM daily GROUP BY 1
      |)
      |SELECT strftime(d.day, '%Y-%m-%d') AS day_s,
      |  CAST(dayofweek(d.day) + 1 AS INTEGER) AS dw, d.cents,
      |  CAST((7000 * i.dow_cents) // i.tot AS BIGINT) AS idx_x1000,
      |  CAST((d.cents * 1000) // ((7000 * i.dow_cents) // i.tot) AS BIGINT)
      |    AS adj_cents
      |FROM daily d JOIN idx i ON dayofweek(d.day) + 1 = i.dw""".stripMargin

  // --------------------------------------------------------------- q195
  /** Log-log price elasticity of demand — the economist's regression
    * "1% price increase moves quantity by β%": per brand, the OLS slope
    * of ln(quantity) on ln(unit price), run through the EXACT integer
    * q99 sufficient statistics after flooring both logs to MILLI-nats
    * (the q159 floor-at-the-edge discipline). The SUMS are exact BIGINT
    * (x·y ≤ ~2·10⁷ per row — exact through ~4·10¹¹ rows per brand); the
    * slope finisher is the q167 CUPED fixed-double-sequence + floor(+½),
    * NOT the q99 long two-step, because the determinant n·Σxx − (Σx)²
    * grows ∝ n² with corpus-sized n and the two-step overflows
    * (ScaleCheck measured exactly that at 10×).
    *
    * Scale shape: fact scan + broadcast part dim → per-brand q99
    * aggregate; one shuffle on brand.
    */
  def priceElasticity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand").as("brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("brand"),
        floor(log(col("l_extendedprice") / col("l_quantity")) * 1000)
          .cast("long").as("x"),
        floor(log(col("l_quantity")) * 1000).cast("long").as("y"))
    val w = Window.partitionBy("brand")
    li
      .withColumn("xo", col("x") - min(col("x")).over(w))
      .groupBy("brand")
      .agg(count(lit(1)).as("n_lines"), sum("xo").as("sx"),
        sum("y").as("sum_lnq_milli"), sum(col("xo") * col("y")).as("sxy"),
        sum(col("xo") * col("xo")).as("sxx"))
      // The slope finisher is the q167 CUPED discipline, NOT the q99 long
      // two-step: with corpus-sized n the determinant n·Σxx − (Σx)² grows
      // ∝ n² and the two-step's 1e6·remainder multiply overflows BIGINT
      // (ScaleCheck caught exactly this at 10×). The sums stay EXACT
      // BIGINTs; num/den are one fixed double sequence from those exact
      // integers, so both engines floor the identical value.
      .withColumn("elasticity_micro",
        floor((col("n_lines").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sum_lnq_milli").cast("double"))
          / (col("n_lines").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
          * lit(1e6) + lit(0.5)).cast("long"))
      .select(col("brand"), col("n_lines"), col("sx"), col("sum_lnq_milli"),
        col("sxy"), col("sxx"), col("elasticity_micro"))
  }

  private val priceElasticitySql =
    """WITH li AS (
      |  SELECT p.p_brand AS brand,
      |    CAST(floor(ln(l.l_extendedprice / l.l_quantity) * 1000) AS BIGINT)
      |      AS x,
      |    CAST(floor(ln(l.l_quantity) * 1000) AS BIGINT) AS y
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |),
      |xs AS (
      |  SELECT brand, y, x - min(x) OVER (PARTITION BY brand) AS xo
      |  FROM li
      |),
      |s AS (
      |  SELECT brand, count(*) AS n, sum(xo) AS sx, sum(y) AS sy,
      |    sum(xo * y) AS sxy, sum(xo * xo) AS sxx
      |  FROM xs GROUP BY 1
      |)
      |SELECT brand, CAST(n AS BIGINT) AS n_lines, CAST(sx AS BIGINT) AS sx,
      |  CAST(sy AS BIGINT) AS sum_lnq_milli, CAST(sxy AS BIGINT) AS sxy,
      |  CAST(sxx AS BIGINT) AS sxx,
      |  CAST(floor((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
      |    / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS elasticity_micro
      |FROM s""".stripMargin

  // --------------------------------------------------------------- q196
  /** TWAP / VWAP — the two canonical price averages, computed exactly:
    * VWAP weights each trade by its quantity (Σ extended-cents div
    * Σ quantity — exact because extendedprice IS qty × unit price), and
    * TWAP weights each observed DAILY price by how long it remained the
    * last observation (lead(day) − day; the final observation carries
    * one day). Irregular observation gaps are exactly what makes naive
    * averaging wrong and TWAP right — the same gap-awareness as q76's
    * forward fill, without materializing the dense grid.
    *
    * All integer: daily VWAP cents = ext_cents div qty; the TWAP
    * numerator Σ(daily_cents·gap_days) stays under 2⁶³ for any
    * realistic price × calendar span.
    *
    * Scale shape: fact scan + broadcast dim → (brand, day) aggregate →
    * one per-brand window (lead) → brand-sized aggregate.
    */
  def twapVwap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("brand").orderBy(col("day"))
    val daily = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand").as("brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("brand"), to_date(col("l_shipdate")).as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("ext_cents"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .withColumn("day_cents", expr("ext_cents div qty"))
      .withColumn("gap_days",
        coalesce(datediff(lead(col("day"), 1).over(w), col("day")), lit(1))
          .cast("long"))
    daily.groupBy("brand")
      .agg(count(lit(1)).as("n_days"),
        sum("gap_days").as("span_days"),
        sum("ext_cents").as("tot_ext_cents"),
        sum("qty").as("tot_qty"),
        sum(col("day_cents") * col("gap_days")).as("twap_num"))
      .withColumn("vwap_cents", expr("tot_ext_cents div tot_qty"))
      .withColumn("twap_cents", expr("twap_num div span_days"))
  }

  private val twapVwapSql =
    """WITH daily AS (
      |  SELECT p.p_brand AS brand, l.l_shipdate::DATE AS day,
      |    sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS ext_cents,
      |    sum(CAST(l.l_quantity AS BIGINT)) AS qty
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1, 2
      |),
      |gaps AS (
      |  SELECT brand, ext_cents, qty, ext_cents // qty AS day_cents,
      |    CAST(coalesce(date_diff('day', day,
      |      lead(day, 1) OVER (PARTITION BY brand ORDER BY day)), 1)
      |      AS BIGINT) AS gap_days
      |  FROM daily
      |)
      |SELECT brand, count(*) AS n_days,
      |  CAST(sum(gap_days) AS BIGINT) AS span_days,
      |  CAST(sum(ext_cents) AS BIGINT) AS tot_ext_cents,
      |  CAST(sum(qty) AS BIGINT) AS tot_qty,
      |  CAST(sum(day_cents * gap_days) AS BIGINT) AS twap_num,
      |  CAST(sum(ext_cents) // sum(qty) AS BIGINT) AS vwap_cents,
      |  CAST(sum(day_cents * gap_days) // sum(gap_days) AS BIGINT)
      |    AS twap_cents
      |FROM gaps GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- q198
  /** Monthly p95 latency trend — the SLA chart: per month, the EXACT
    * 95th-percentile order→ship latency as an order statistic
    * (rank ⌈0.95·n⌉ = (19n+19) div 20 — the positive-operand ceil
    * identity; positives keep the arithmetic trivially engine-exact
    * (both engines truncate integer division toward zero, verified, so
    * negatives would also agree — positives just need no proof) — under
    * a deterministic (latency, orderkey, line) tiebreak, the q162
    * discipline; no float), plus
    * the p50 for contrast and the attainment rate against a fixed
    * 30-day SLA in exact ppm.
    *
    * Scale shape: fact-fact equi-join on the order key, one month-
    * partitioned rank window (months sort in parallel), month-sized
    * output.
    */
  def slaLatencyTrend(spark: SparkSession, dir: String,
                      slaDays: Int = 30): DataFrame = {
    val lat = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("lat_days"),
        col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy("month")
      .orderBy(col("lat_days"), col("l_orderkey"), col("l_linenumber"))
    lat
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("month")))
      .groupBy(col("month"))
      .agg(max(col("n")).as("n"),
        max(when(col("rk") === expr("(19 * n + 19) div 20"), col("lat_days")))
          .as("p95_days"),
        max(when(col("rk") === expr("(n + 1) div 2"), col("lat_days")))
          .as("p50_days"),
        sum(when(col("lat_days") <= slaDays, 1L).otherwise(0L))
          .as("n_within"))
      .withColumn("attain_ppm", expr("(1000000 * n_within) div n"))
  }

  private val slaLatencyTrendSql =
    """WITH lat AS (
      |  SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
      |    CAST(date_diff('day', o.o_orderdate::DATE, l.l_shipdate::DATE)
      |      AS BIGINT) AS lat_days,
      |    l.l_orderkey, l.l_linenumber
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |),
      |rk AS (
      |  SELECT month, lat_days,
      |    CAST(row_number() OVER (PARTITION BY month
      |      ORDER BY lat_days, l_orderkey, l_linenumber) AS BIGINT) AS rk,
      |    CAST(count(*) OVER (PARTITION BY month) AS BIGINT) AS n
      |  FROM lat
      |)
      |SELECT month, max(n) AS n,
      |  CAST(max(CASE WHEN rk = (19 * n + 19) // 20 THEN lat_days END)
      |    AS BIGINT) AS p95_days,
      |  CAST(max(CASE WHEN rk = (n + 1) // 2 THEN lat_days END) AS BIGINT)
      |    AS p50_days,
      |  CAST(sum(CASE WHEN lat_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_within,
      |  CAST((1000000 * sum(CASE WHEN lat_days <= 30 THEN 1 ELSE 0 END))
      |    // max(n) AS BIGINT) AS attain_ppm
      |FROM rk GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- q242
  /** Autocorrelation function + Ljung–Box portmanteau — the standard
    * "is this series white noise?" diagnostic (Box & Jenkins; Ljung &
    * Box 1978) the forecasting family (q176 EWMA, q184 backtest, q194
    * seasonal) implicitly assumes was checked: for lags k = 1..K over
    * the daily revenue series, r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²
    * and the cumulative Q_k = n(n+2)·Σ_{j≤k} r_j²/(n−j).
    *
    * Exactness: the series collapses to exact BIGINT daily totals; all
    * lag cross-products Σx_t·x_{t+k}, head/tail sums and Σx² ride
    * DECIMAL(38,0), so r_k is ONE fixed double sequence over exact
    * integers (numerator expanded as cross − x̄(A_k+B_k) + (n−k)x̄²),
    * floored to micro. Q_k accumulates r_j²/(n−j) in ascending-lag
    * frame order — the same ordered summation on both engines — then
    * scales by n(n+2).
    *
    * Scale shape: one corpus scan → per-day hash aggregate; every
    * window and the lag stack run on the days-domain frame (calendar-
    * bounded at any corpus scale — the q190 single-partition rationale);
    * the lag expansion is K lead columns over one ordered pass, not a
    * self-join.
    */
  def acfLjungBox(daily: DataFrame, maxLag: Int = 10): DataFrame = {
    val cells = daily.select(col("d"), col("x").cast("long").as("x"))
      .localCheckpoint()
    val tot = cells.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("s"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("s2"))
    val wIdx = Window.orderBy("d")
    val leads = (1 to maxLag).map(k => lead(col("x"), k).over(wIdx).as(s"l$k"))
    val pairs = cells.select((col("x") +: leads): _*)
      .select(col("x"), explode(array((1 to maxLag).map(k =>
        struct(lit(k).as("lag"), col(s"l$k").as("y"))): _*)).as("p"))
      .select(col("x"), col("p.lag").as("lag"), col("p.y").as("y"))
      .filter(col("y").isNotNull)
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("cross"),
        sum(col("x").cast("decimal(38,0)")).as("a_k"),
        sum(col("y").cast("decimal(38,0)")).as("b_k"))
    val r = pairs.crossJoin(broadcast(tot))
      .withColumn("mbar", col("s").cast("double") / col("n").cast("double"))
      .withColumn("r_k",
        (col("cross").cast("double") - col("mbar")
          * (col("a_k") + col("b_k")).cast("double")
          + (col("n") - col("lag")).cast("double") * col("mbar") * col("mbar"))
          / (col("s2").cast("double") - col("mbar") * col("s").cast("double")))
    r.withColumn("q_k",
        sum(col("r_k") * col("r_k")
          / (col("n") - col("lag")).cast("double"))
          .over(Window.orderBy("lag")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          * col("n").cast("double") * (col("n").cast("double") + lit(2.0)))
      .select(col("lag").cast("long").as("lag"), col("n_pairs"),
        floor(col("r_k") * lit(1000000.0) + lit(0.5)).cast("long")
          .as("r_micro"),
        floor(col("q_k") * lit(1000000.0) + lit(0.5)).cast("long")
          .as("q_micro"))
  }

  /** Gated q242: ACF lags 1..10 + Ljung–Box Q over the daily total
    * order revenue series (whole dollars).
    */
  def revenueAcf(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("d"))
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("x"))
    acfLjungBox(daily)
  }

  private val revenueAcfSql =
    """WITH daily AS (
      |  SELECT date_trunc('day', o_orderdate) AS d,
      |    sum(CAST(floor(o_totalprice) AS BIGINT)) AS x
      |  FROM orders GROUP BY 1
      |),
      |idx AS (
      |  SELECT row_number() OVER (ORDER BY d) AS i, x FROM daily
      |),
      |tot AS (
      |  SELECT count(*) AS n, sum(x::HUGEINT) AS s, sum(x::HUGEINT * x) AS s2
      |  FROM idx
      |),
      |pairs AS (
      |  SELECT b.i - a.i AS lag, count(*) AS n_pairs,
      |    sum(a.x::HUGEINT * b.x) AS cross_k,
      |    sum(a.x::HUGEINT) AS a_k, sum(b.x::HUGEINT) AS b_k
      |  FROM idx a JOIN idx b ON b.i - a.i BETWEEN 1 AND 10
      |  GROUP BY 1
      |),
      |r AS (
      |  SELECT lag, n_pairs, n,
      |    (cross_k::DOUBLE - (s::DOUBLE / n::DOUBLE)
      |        * (a_k + b_k)::DOUBLE
      |      + (n - lag)::DOUBLE * (s::DOUBLE / n::DOUBLE)
      |        * (s::DOUBLE / n::DOUBLE))
      |      / (s2::DOUBLE - (s::DOUBLE / n::DOUBLE) * s::DOUBLE) AS r_k
      |  FROM pairs, tot
      |)
      |SELECT CAST(lag AS BIGINT) AS lag, CAST(n_pairs AS BIGINT) AS n_pairs,
      |  CAST(floor(r_k * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT)
      |    AS r_micro,
      |  CAST(floor(sum(r_k * r_k / (n - lag)::DOUBLE) OVER (ORDER BY lag
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    * n::DOUBLE * (n::DOUBLE + 2.0::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS q_micro
      |FROM r""".stripMargin

  // --------------------------------------------------------------- q246
  /** Single-changepoint detection by binary segmentation — the first
    * step of the standard changepoint recursion (Scott & Knott 1974;
    * the CUSUM drift gate q177 flags THAT a shift happened, this finds
    * WHERE): per key, the split t of the ordered series maximizing the
    * between-segment variance reduction
    * gain(t) = t(n−t)/n · (x̄_{≤t} − x̄_{>t})² = (n·P_t − t·S)² / (n·t·(n−t)).
    *
    * Exactness: daily totals and prefix sums P_t are exact BIGINT; the
    * gain numerator (n·P_t − t·S)² rides DECIMAL(38,0), so gain is one
    * double division of exact integers — identical on both engines —
    * and the argmax tie-break (gain desc, t asc) is total. Means are
    * micro-floored doubles over exact integers.
    *
    * Scale shape: one corpus scan → (key, day) hash aggregate; prefix
    * sums and the argmax run per key over calendar-bounded partitions.
    * Recursing (segment → sub-segments) re-runs this operator on the
    * emitted split labels — each level is one window pass, no corpus
    * re-scan.
    */
  def binarySegmentSplit(perDay: DataFrame, keyCol: String): DataFrame = {
    val wk = Window.partitionBy(keyCol)
    val wOrd = Window.partitionBy(keyCol).orderBy("d")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = perDay
      .withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("p_t", sum(col("x").cast("decimal(38,0)")).over(wCum))
      .withColumn("n", count(lit(1)).over(wk).cast("long"))
      .withColumn("s", sum(col("x").cast("decimal(38,0)")).over(wk))
      .filter(col("t") < col("n"))
      .withColumn("dev", col("p_t") * col("n") - col("s") * col("t"))
      .withColumn("gain",
        col("dev").cast("double") * col("dev").cast("double")
          / (col("n") * col("t") * (col("n") - col("t"))).cast("double"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(keyCol).orderBy(desc("gain"), col("t"))))
      .filter(col("rn") === 1)
      .select(col(keyCol), col("n").as("n_days"), col("t").as("split_idx"),
        col("d").as("split_at"),
        floor(col("gain") + lit(0.5)).cast("long").as("gain_int"),
        floor(col("p_t").cast("double") / col("t").cast("double")
          * lit(1000.0) + lit(0.5)).cast("long").as("mean_before_milli"),
        floor((col("s") - col("p_t")).cast("double")
          / (col("n") - col("t")).cast("double")
          * lit(1000.0) + lit(0.5)).cast("long").as("mean_after_milli"))
  }

  /** Gated q246: per nation, where does the daily order-revenue series
    * (whole dollars) most plausibly shift level? One row per nation:
    * the argmax split, its variance-reduction gain, and the segment
    * means (milli-dollars).
    */
  def nationRevenueChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        date_trunc("day", col("o_orderdate")).as("d"))
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("x"))
    binarySegmentSplit(daily, "nation")
      .withColumn("split_date", col("split_at").cast("date"))
      .drop("split_at")
  }

  private val nationRevenueChangepointSql =
    """WITH daily AS (
      |  SELECT n.n_name AS nation, date_trunc('day', o.o_orderdate) AS d,
      |    sum(CAST(floor(o.o_totalprice) AS BIGINT)) AS x
      |  FROM orders o
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n ON n.n_nationkey = c.c_nationkey
      |  GROUP BY 1, 2
      |),
      |scored AS (
      |  SELECT nation, d,
      |    row_number() OVER (PARTITION BY nation ORDER BY d) AS t,
      |    sum(x::HUGEINT) OVER (PARTITION BY nation ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_t,
      |    count(*) OVER (PARTITION BY nation) AS n,
      |    sum(x::HUGEINT) OVER (PARTITION BY nation) AS s
      |  FROM daily
      |),
      |gains AS (
      |  SELECT nation, d, t, p_t, n, s,
      |    (p_t * n - s * t)::DOUBLE * (p_t * n - s * t)::DOUBLE
      |      / (n::HUGEINT * t * (n - t))::DOUBLE AS gain
      |  FROM scored WHERE t < n
      |),
      |best AS (
      |  SELECT *, row_number() OVER (PARTITION BY nation
      |    ORDER BY gain DESC, t) AS rn
      |  FROM gains
      |)
      |SELECT nation, CAST(n AS BIGINT) AS n_days,
      |  CAST(t AS BIGINT) AS split_idx, CAST(d AS DATE) AS split_date,
      |  CAST(floor(gain + 0.5::DOUBLE) AS BIGINT) AS gain_int,
      |  CAST(floor(p_t::DOUBLE / t::DOUBLE * 1000.0::DOUBLE + 0.5::DOUBLE)
      |    AS BIGINT) AS mean_before_milli,
      |  CAST(floor((s - p_t)::DOUBLE / (n - t)::DOUBLE * 1000.0::DOUBLE
      |    + 0.5::DOUBLE) AS BIGINT) AS mean_after_milli
      |FROM best WHERE rn = 1""".stripMargin

  // --------------------------------------------------------------- q254
  /** Von Neumann ratio (von Neumann 1941; Durbin–Watson's series-level
    * form) — the one-number independence screen the ACF battery (q242)
    * expands on: per key, VN = Σ(x_t − x_{t−1})² / Σ(x_t − x̄)² over the
    * ordered series. VN ≈ 2 for white noise, → 0 under positive serial
    * correlation (trends/level shifts), → 4 under alternation; the
    * mean-adjusted z uses E[VN] = 2n/(n−1).
    *
    * Exactness: successive-difference squares Σ(Δx)² and the moment
    * sums ride DECIMAL(38,0) over exact BIGINT daily totals; the
    * denominator n·Σx² − (Σx)² keeps the mean exact (the q229
    * identity), so VN = n·num/den and z are single fixed double
    * sequences floored to micro.
    *
    * Scale shape: corpus scan → (key, day) hash aggregate; the lag and
    * the fold run per key over calendar-bounded partitions.
    */
  def vonNeumannRatio(perDay: DataFrame, keyCol: String): DataFrame = {
    val wOrd = Window.partitionBy(keyCol).orderBy("d")
    perDay
      .withColumn("prev", lag(col("x"), 1).over(wOrd))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("s"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("s2"),
        sum(((col("x") - col("prev")).cast("decimal(38,0)")
          * (col("x") - col("prev")))).as("num"))
      // n >= 2 and a non-constant series (den = n·Σx² − (Σx)² > 0);
      // a flat series has no dispersion to normalize by.
      .filter(col("n") >= 2L &&
        col("n") * col("s2") =!= col("s") * col("s"))
      .withColumn("vn_micro", floor(
        col("n").cast("double") * col("num").cast("double")
          / (col("n").cast("double") * col("s2").cast("double")
            - col("s").cast("double") * col("s").cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("z_micro", floor(
        (col("n").cast("double") * col("num").cast("double")
          / (col("n").cast("double") * col("s2").cast("double")
            - col("s").cast("double") * col("s").cast("double"))
          - lit(2.0) * col("n").cast("double")
            / (col("n").cast("double") - lit(1.0)))
          / sqrt(lit(4.0) * (col("n").cast("double") - lit(2.0))
            / ((col("n").cast("double") - lit(1.0))
              * (col("n").cast("double") + lit(1.0))))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .select(col(keyCol), col("n").as("n_days"), col("vn_micro"),
        col("z_micro"))
  }

  /** Gated q254: per market segment, is the daily order-revenue series
    * serially independent? VN and its z per segment (micro-units).
    */
  def segmentRevenueVonNeumann(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        date_trunc("day", col("o_orderdate")).as("d"))
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("x"))
    vonNeumannRatio(daily, "segment")
  }

  private val segmentRevenueVonNeumannSql =
    """WITH daily AS (
      |  SELECT c.c_mktsegment AS segment,
      |    date_trunc('day', o.o_orderdate) AS d,
      |    sum(CAST(floor(o.o_totalprice) AS BIGINT)) AS x
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2
      |),
      |lagged AS (
      |  SELECT segment, x,
      |    lag(x) OVER (PARTITION BY segment ORDER BY d) AS prev
      |  FROM daily
      |),
      |folded AS (
      |  SELECT segment, count(*) AS n, sum(x::HUGEINT) AS s,
      |    sum(x::HUGEINT * x) AS s2,
      |    sum((x - prev)::HUGEINT * (x - prev)) AS num
      |  FROM lagged GROUP BY 1
      |  HAVING count(*) >= 2
      |    AND count(*) * sum(x::HUGEINT * x) <> sum(x::HUGEINT) * sum(x::HUGEINT)
      |)
      |SELECT segment, CAST(n AS BIGINT) AS n_days,
      |  CAST(floor(n::DOUBLE * num::DOUBLE
      |    / (n::DOUBLE * s2::DOUBLE - s::DOUBLE * s::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS vn_micro,
      |  CAST(floor(
      |    (n::DOUBLE * num::DOUBLE
      |      / (n::DOUBLE * s2::DOUBLE - s::DOUBLE * s::DOUBLE)
      |      - 2.0::DOUBLE * n::DOUBLE / (n::DOUBLE - 1.0::DOUBLE))
      |    / sqrt(4.0::DOUBLE * (n::DOUBLE - 2.0::DOUBLE)
      |      / ((n::DOUBLE - 1.0::DOUBLE) * (n::DOUBLE + 1.0::DOUBLE)))
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS z_micro
      |FROM folded""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q254_von_neumann", segmentRevenueVonNeumann _,
      Some(segmentRevenueVonNeumannSql)),
    NamedQuery("q242_revenue_acf", revenueAcf _, Some(revenueAcfSql)),
    NamedQuery("q246_revenue_changepoint", nationRevenueChangepoint _,
      Some(nationRevenueChangepointSql)),
    NamedQuery("q206_logrank_test", balanceChurnLogRank _,
      Some(balanceChurnLogRankSql)),
    NamedQuery("q203_theilsen_trend", robustRevenueTrend _,
      Some(robustRevenueTrendSql)),
    NamedQuery("q196_twap_vwap", twapVwap _, Some(twapVwapSql)),
    NamedQuery("q198_sla_p95_trend", (s, d) => slaLatencyTrend(s, d),
      Some(slaLatencyTrendSql)),
    NamedQuery("q194_seasonal_adjust", adjustedDailyRevenue _,
      Some(adjustedDailyRevenueSql)),
    NamedQuery("q195_price_elasticity", priceElasticity _,
      Some(priceElasticitySql)),
    NamedQuery("q184_forecast_backtest", weeklyForecastBacktest _,
      Some(weeklyForecastBacktestSql)),
    NamedQuery("q175_survival_curve", customerSurvival _,
      Some(customerSurvivalSql)),
    NamedQuery("q176_ewma_forecast", weeklyEwmaForecast _,
      Some(weeklyEwmaForecastSql)),
    NamedQuery("q177_cusum_drift", revenueCusum _, Some(revenueCusumSql)),
    NamedQuery("q220_runs_test", revenueRunsTest _, Some(revenueRunsSql)),
    NamedQuery("q231_mann_kendall", revenueMannKendall _,
      Some(mannKendallSql)),
    NamedQuery("q136_decayed_revenue", (s, d) => decayedRevenue(s, d),
      Some(decayedRevenueSql)),
    NamedQuery("q114_lead_lag_corr", viewPurchaseLeadLag _,
      Some(viewPurchaseLeadLagSql)),
    NamedQuery("q127_weekday_seasonality", weekdaySeasonality _,
      Some(weekdaySeasonalitySql)),
    NamedQuery("q99_revenue_trend", revenueTrend _, Some(revenueTrendSql)),
    NamedQuery("q76_weekly_gapfill", weeklyGapfill _, Some(weeklyGapfillSql)),
    NamedQuery("q95_user_streaks", userStreaks _, Some(userStreaksSql)),
    NamedQuery("q78_moving_revenue", movingRevenue _, Some(movingRevenueSql)),
    NamedQuery("q82_robust_outliers", robustOutliers _, Some(robustOutliersSql)))
}
