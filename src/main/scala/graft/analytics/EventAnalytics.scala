package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** The classic event-stream warehouse battery: outlier days, conversion
  * funnels, and retention cohorts (reference analogue: report.py's
  * date-window aggregation reports, generalized to the standard product-
  * analytics shapes). All three are one-or-two-shuffle aggregate plans
  * with no corpus-sized joins — at 100 TB each is a hash aggregate
  * partitioned by its natural key (day / user / cohort) plus a broadcast
  * of group-count-sized side data.
  *
  * Float discipline: every statistic is derived from integer sums
  * (Σn, Σn², counts) through a fixed sequence of IEEE double ops, never
  * from an order-dependent float aggregation — so DuckDB reproduces each
  * value bit-for-bit and the oracle hashes match (the q46/q49 contract).
  */
object EventAnalytics {

  // ---------------------------------------------------------------- q60
  /** Daily event volumes with population z-scores and an |z| ≥ 1.5
    * anomaly flag. Mean and variance come from exact integer sums
    * (`Σn`, `Σn²`) rather than a float `stddev` aggregate: summation
    * order can't perturb the result, so the flag is engine-stable even
    * for days sitting near the threshold.
    */
  def dailyAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"))
    // Global stats ride a partition-less window over `daily`, which is
    // DAYS-sized (≤ a few thousand rows at any corpus scale) — one tiny
    // single-partition exchange instead of re-aggregating the events
    // scan a second time for a stats subquery.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    // Σn² in DECIMAL on both engines: a LongType square wraps silently
    // past ~3e9 events/day (DuckDB would promote/error — divergence
    // exactly where this query promises engine stability). The decimal
    // sum is still an exact integer, so the double conversion below
    // remains order-independent.
    val nDec = col("n_events").cast("decimal(19,0)")
    daily
      .withColumn("s1", sum("n_events").over(w))
      .withColumn("s2", sum(nDec * nDec).over(w))
      .withColumn("nd", count(lit(1)).over(w))
      .withColumn("mean", col("s1").cast("double") / col("nd"))
      // Clamp at 0: fl(s2/nd) can land one ulp below fl(mean²) on
      // near-constant counts, and sqrt(negative) is NaN here but an
      // ERROR in DuckDB — clamping identically on both sides keeps the
      // engines bit-aligned (z is then null via the 0-divide, which both
      // engines also agree on).
      .withColumn("variance",
        greatest(col("s2").cast("double") / col("nd") - col("mean") * col("mean"),
          lit(0.0)))
      .withColumn("z", (col("n_events") - col("mean")) / sqrt(col("variance")))
      .select(col("day"), col("n_events"),
        round(col("z"), 4).as("z"),
        (abs(col("z")) >= 1.5).cast("int").as("is_anomaly"))
  }

  private val dailyAnomaliesSql =
    """WITH daily AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events
      |  FROM events GROUP BY 1
      |), stats AS (
      |  SELECT sum(n_events) AS s1,
      |    sum(n_events::DECIMAL(19,0) * n_events::DECIMAL(19,0)) AS s2,
      |    count(*) AS nd
      |  FROM daily
      |), scored AS (
      |  SELECT day, n_events,
      |    (n_events - s1::DOUBLE / nd) /
      |      sqrt(greatest(s2::DOUBLE / nd - (s1::DOUBLE / nd) * (s1::DOUBLE / nd), 0))
      |      AS z
      |  FROM daily CROSS JOIN stats
      |)
      |SELECT day, CAST(n_events AS BIGINT) AS n_events, round(z, 4) AS z,
      |  CAST(abs(z) >= 1.5 AS INT) AS is_anomaly
      |FROM scored""".stripMargin

  // ---------------------------------------------------------------- q61
  /** First-touch conversion funnel view → click → purchase: a user
    * reaches a stage only if their first such event follows the previous
    * stage's first event strictly in time. One shuffle (by user), then a
    * single-row rollup — the standard funnel shape. Timestamps are
    * floored to epoch seconds on BOTH sides before comparison (the
    * ns-vs-µs parquet note in [[graft.core.Tables.events]]).
    */
  /** Operator form over any `(user, type, ord)` frame — the spec drives
    * its stage gates on hand-built fixtures; [[conversionFunnel]] gates
    * it on the events table. `stages` is ordered; a user reaches stage i
    * only if every prior stage's first occurrence precedes it strictly.
    */
  def funnel(events: DataFrame, stages: Seq[String], userCol: String = "user_id",
             typeCol: String = "event_type", ordCol: String = "sec"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    def firstOf(t: String) = min(when(col(typeCol) === t, col(ordCol)))
    val per = events.groupBy(userCol)
      .agg(firstOf(stages.head).as("f0"),
        stages.tail.zipWithIndex.map { case (s, i) => firstOf(s).as(s"f${i + 1}") }: _*)
    val reached = stages.indices.map { i =>
      // f0 < f1 < … < fi — strict first-touch ordering.
      (1 to i).map(j => col(s"f${j - 1}") < col(s"f$j"))
        .foldLeft(col("f0").isNotNull)(_ && _)
    }
    per.agg(
      count(when(reached.head, 1)).as(s"n_${stages.head}"),
      stages.tail.zipWithIndex.map { case (s, i) =>
        count(when(reached(i + 1), 1)).as(s"n_$s")
      }: _*)
  }

  def conversionFunnel(spark: SparkSession, dir: String): DataFrame =
    funnel(
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts").cast("long").as("sec")),
      Seq("view", "click", "purchase"))

  // ---------------------------------------------------------------- q85
  /** Per-occurrence event-sequence matching with time bounds — the
    * CEP/MATCH_RECOGNIZE-shaped question the first-touch funnel (q61)
    * cannot answer: EVERY click anchored by a view ≤1 h before it and a
    * purchase ≤24 h after it, not just each user's first. The anchor
    * semantics (nearest-preceding / nearest-following per anchor) make
    * each click match ≤1 chain, so the result is well-defined and the
    * work is bounded — no combinatorial all-chains blowup.
    *
    * Composition: one as-of BACKWARD join (click→view, tolerance 1 h)
    * and one as-of FORWARD join (click→purchase, tolerance 24 h) — two
    * key-shuffle log-merges, O(events) total, no range nested loop.
    * Exactness: everything runs on integer epoch seconds (both engines
    * floor identically); sides pre-collapse to one row per (user, sec)
    * by MIN event id so equal-second ties resolve identically.
    */
  def clickChains(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts").cast("long").as("sec"))
    def side(t: String) = ev.filter(col("event_type") === t)
      .groupBy(col("user_id"), col("sec"))
      .agg(min("event_id").as(s"${t}_id"))
      .select(col("user_id"), col("sec").as(s"${t}_sec"), col(s"${t}_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("sec"))
    val withView = AsOfJoin.asOfBackward(
      clicks, side("view"), "user_id", "user_id", "sec", "view_sec",
      asofCol = "v", toleranceSec = Some(3600L))
    val withBoth = AsOfJoin.asOfForward(
      withView, side("purchase"), "user_id", "user_id", "sec", "purchase_sec",
      asofCol = "p", toleranceSec = Some(86400L))
    withBoth
      .withColumn("chain",
        col("v").isNotNull && col("p").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_clicks"),
        sum(when(col("chain"), 1L).otherwise(0L)).as("n_chains"),
        min(when(col("chain"), col("p.purchase_sec") - col("v.view_sec")))
          .as("min_chain_secs"),
        max(when(col("chain"), col("p.purchase_sec") - col("v.view_sec")))
          .as("max_chain_secs"))
  }

  private val clickChainsSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events
      |),
      |v AS (SELECT user_id, sec AS view_sec, min(event_id) AS view_id
      |      FROM ev WHERE event_type = 'view' GROUP BY 1, 2),
      |p AS (SELECT user_id, sec AS purchase_sec, min(event_id) AS purchase_id
      |      FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2),
      |c AS (SELECT user_id, event_id AS click_id, sec
      |      FROM ev WHERE event_type = 'click'),
      |cv AS (
      |  SELECT c.user_id, c.click_id, c.sec,
      |    CASE WHEN v.view_sec >= c.sec - 3600 THEN v.view_sec END AS view_sec
      |  FROM c ASOF LEFT JOIN v
      |    ON c.user_id = v.user_id AND c.sec >= v.view_sec
      |),
      |cvp AS (
      |  SELECT cv.user_id, cv.click_id, cv.sec, cv.view_sec,
      |    CASE WHEN p.purchase_sec <= cv.sec + 86400 THEN p.purchase_sec END AS purchase_sec
      |  FROM cv ASOF LEFT JOIN p
      |    ON cv.user_id = p.user_id AND cv.sec <= p.purchase_sec
      |)
      |SELECT user_id, count(*) AS n_clicks,
      |  CAST(sum(CASE WHEN view_sec IS NOT NULL AND purchase_sec IS NOT NULL
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_chains,
      |  min(CASE WHEN view_sec IS NOT NULL AND purchase_sec IS NOT NULL
      |      THEN purchase_sec - view_sec END) AS min_chain_secs,
      |  max(CASE WHEN view_sec IS NOT NULL AND purchase_sec IS NOT NULL
      |      THEN purchase_sec - view_sec END) AS max_chain_secs
      |FROM cvp GROUP BY user_id""".stripMargin

  private val conversionFunnelSql =
    """WITH per AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN floor(epoch(ts))::BIGINT END) AS fv,
      |    min(CASE WHEN event_type = 'click' THEN floor(epoch(ts))::BIGINT END) AS fc,
      |    min(CASE WHEN event_type = 'purchase' THEN floor(epoch(ts))::BIGINT END) AS fp
      |  FROM events GROUP BY 1
      |)
      |SELECT CAST(count(fv) AS BIGINT) AS n_view,
      |  CAST(count(CASE WHEN fv < fc THEN 1 END) AS BIGINT) AS n_click,
      |  CAST(count(CASE WHEN fv < fc AND fc < fp THEN 1 END) AS BIGINT) AS n_purchase
      |FROM per""".stripMargin

  // ---------------------------------------------------------------- q89
  /** First-order Markov transition matrix over each user's event
    * sequence — the "what happens next" model behind next-action
    * prediction, anomalous-flow detection, and synthetic-session
    * generation. One window pass (lead over the user's time-ordered
    * stream) then a hash aggregate on (from, to): a single user-keyed
    * shuffle plus a types²-sized result — at 100 TB the state stays
    * bounded by the event-type vocabulary, never by the corpus.
    *
    * Exactness: ordering ties at equal epoch seconds resolve by
    * event_id (a total order both engines share); row probabilities
    * are integer micro-units via truncating division and gap averages
    * are integer-second `div`s — every output column is BIGINT-exact.
    */
  /** Operator form over any `(user_id, event_type, event_id, sec)` frame —
    * the spec drives it on hand-built sequences; [[markovTransitions]]
    * gates it on the events table.
    */
  def markov(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    val wFrom = org.apache.spark.sql.expressions.Window.partitionBy("from_type")
    events
      .withColumn("to_type", lead("event_type", 1).over(w))
      .withColumn("next_sec", lead("sec", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"),
        sum(col("next_sec") - col("sec")).as("sum_gap_secs"))
      .withColumn("n_from", sum("n_trans").over(wFrom))
      .withColumn("p_micro", expr("(1000000 * n_trans) div n_from"))
      .withColumn("avg_gap_secs", expr("sum_gap_secs div n_trans"))
      .select("from_type", "to_type", "n_trans", "n_from", "p_micro",
        "avg_gap_secs")
  }

  def markovTransitions(spark: SparkSession, dir: String): DataFrame =
    markov(Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts").cast("long").as("sec")))

  private val markovTransitionsSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events
      |), seq AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER w AS to_type,
      |    lead(sec) OVER w - sec AS gap
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
      |), trans AS (
      |  SELECT from_type, to_type, count(*) AS n_trans,
      |    sum(gap) AS sum_gap_secs
      |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT from_type, to_type, CAST(n_trans AS BIGINT) AS n_trans,
      |  CAST(sum(n_trans) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
      |  CAST((1000000 * n_trans) // sum(n_trans) OVER (PARTITION BY from_type)
      |    AS BIGINT) AS p_micro,
      |  CAST(sum_gap_secs // n_trans AS BIGINT) AS avg_gap_secs
      |FROM trans""".stripMargin

  // ---------------------------------------------------------------- q62
  /** Retention cohorts: users grouped by first-activity day, counted as
    * active per day offset. Two aggregates (first-day per user, then
    * cohort × offset distinct users) and one join keyed on user_id —
    * both exchanges partition by user-sized keys; the cohort table that
    * comes out is dashboard-sized.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val cohorts = ev.groupBy("user_id").agg(min("d").as("cohort_day"))
    ev.join(cohorts, Seq("user_id"))
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"),
        datediff(col("d"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct("user_id").as("n_active"))
  }

  private val retentionCohortsSql =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d FROM events
      |), cohorts AS (
      |  SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY 1
      |)
      |SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort,
      |  CAST(date_diff('day', c.cohort_day, e.d) AS INT) AS day_offset,
      |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
      |FROM ev e JOIN cohorts c ON e.user_id = c.user_id
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q94
  /** Interval concurrency by sweep-line — "how many orders were OPEN on
    * each day", the resource-utilization / max-concurrency question that
    * per-row aggregation can't answer (each interval covers many days)
    * and a per-day interval-stabbing join answers at days × orders cost.
    * The sweep line is the scalable form: each interval contributes a
    * +1 at its start day and a -1 past its end day, a delta-days-sized
    * table whose running sum IS the concurrency. Work: two hash
    * aggregates over the facts + one cumulative window over the
    * days-sized delta frame (single tiny partition, the q60 shape) —
    * at 100 TB the fact scans parallelize and only ~10³ day rows ever
    * sort. Orders are given a fixed 30-day open window here; any
    * (start, end) interval source drops in unchanged.
    *
    * Day keys are ISO strings (lexicographic = chronological) and all
    * counts are integers, so the running sums agree bit-for-bit.
    */
  def openOrderConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(to_date(col("o_orderdate")).as("d"))
    val starts = o.groupBy("d").agg(count(lit(1)).as("n_starts"))
    val ends = o.select(date_add(col("d"), 30).as("d"))
      .groupBy("d").agg(count(lit(1)).as("n_ends"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(Long.MinValue, 0)
    starts.join(ends, Seq("d"), "full_outer")
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_starts"), lit(0L)).as("n_starts"),
        coalesce(col("n_ends"), lit(0L)).as("n_ends"))
      .withColumn("n_open", sum(col("n_starts") - col("n_ends")).over(w))
  }

  private val openOrderConcurrencySql =
    """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders),
      |s AS (SELECT d, count(*) AS n_starts FROM o GROUP BY 1),
      |e AS (SELECT d + 30 AS d, count(*) AS n_ends FROM o GROUP BY 1),
      |merged AS (
      |  SELECT strftime(coalesce(s.d, e.d), '%Y-%m-%d') AS day,
      |    coalesce(n_starts, 0) AS n_starts,
      |    coalesce(n_ends, 0) AS n_ends
      |  FROM s FULL OUTER JOIN e ON s.d = e.d
      |)
      |SELECT day, CAST(n_starts AS BIGINT) AS n_starts,
      |  CAST(n_ends AS BIGINT) AS n_ends,
      |  CAST(sum(n_starts - n_ends) OVER (
      |    ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_open
      |FROM merged""".stripMargin

  // ---------------------------------------------------------------- q120
  /** Sliding-window active users: for every day with activity, the
    * distinct users over the trailing 7 days (WAU), that day's distinct
    * users (DAU), and the DAU/WAU stickiness ratio — the canonical
    * engagement battery, and the canonical "COUNT(DISTINCT) over a
    * sliding window" problem: distinct counts do NOT decompose over
    * window frames, so a naive per-day `RANGE` window re-scans 7 days of
    * raw events per output day.
    *
    * Scale shape — the TWO-LEVEL exact form (r14 verdict's q120 watch
    * item): events first collapse to distinct (user, day) pairs (one
    * hash aggregate, the only pass over the corpus). Each user-day then
    * explodes into the ≤ 7 window-END days it contributes to — a
    * constant ×7 on the already-collapsed pairs, not on raw events.
    * Level 1 then groups by (w_day, USER): the distinct-membership
    * state distributes across tasks by PAIR hash, so no task ever holds
    * a per-window user set (the prior `countDistinct`-per-window form
    * concentrated each window's set in its group — task peak ∝ window
    * population, measured 23→101 MB for 10× users). Level 2 groups by
    * w_day over the collapsed pairs with plain count/sum — decomposable
    * aggregates, so the map-side partial is days-sized and the final
    * shuffle moves one row per (day, partition). DAU rides level 1 as a
    * max(own-day flag) and level 2 as its sum; days with no own
    * activity drop out via dau > 0, so no calendar join. At 100 TB the
    * same plan holds (user-days ≪ events; per-task state ∝
    * pairs/shuffle-partitions — horizontal, not per-window); the
    * documented approx path swaps the explode for per-day HLL sketches
    * merged over a 7-row days-sized window (q31's machinery), trading
    * exactness for a ×1 pass.
    *
    * Exactness: every output is an integer count or an integer-division
    * ppm ratio — no floats anywhere. SlidingWauFormSpec pins the
    * two-level form equal to the direct countDistinct form.
    */
  def slidingActiveUsers(spark: SparkSession, dir: String): DataFrame = {
    // ONE linear cascade — a single corpus scan: collapse to user-days,
    // explode each into its ≤7 window-end days tagged with whether it IS
    // that day; level 1 collapses to one row per (window, user), level 2
    // counts those rows per window. WAU = count of (w_day, user) groups;
    // DAU = how many of them saw their own day.
    Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .select(col("user_id"), col("day"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("w_day"))
      .groupBy("w_day", "user_id")
      .agg(max(when(col("day") === col("w_day"), 1L).otherwise(0L)).as("own"))
      .groupBy("w_day")
      .agg(sum(col("own")).as("dau"), count(lit(1)).as("wau"))
      .filter(col("dau") > 0)
      .select(date_format(col("w_day"), "yyyy-MM-dd").as("day"), col("dau"), col("wau"))
      .withColumn("stickiness_ppm", expr("CAST(dau * 1000000 DIV wau AS BIGINT)"))
  }

  private val slidingActiveUsersSql =
    """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |days AS (SELECT DISTINCT day FROM ud),
      |wau AS (
      |  SELECT d.day, count(DISTINCT u.user_id) AS wau
      |  FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
      |  GROUP BY 1),
      |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1)
      |SELECT strftime(d.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
      |  CAST(dau.dau * 1000000 // wau.wau AS BIGINT) AS stickiness_ppm
      |FROM days d JOIN dau ON dau.day = d.day JOIN wau ON wau.day = d.day""".stripMargin

  // ---------------------------------------------------------------- q121
  /** Inter-arrival-time profile per user with a machine-traffic flag —
    * the standard bot screen for a training-data pipeline ingesting web
    * events: humans produce heavy-tailed gap distributions; schedulers
    * and scrapers repeat the SAME gap (a dominant modal gap) over many
    * events. Emits the exact sufficient statistics (Σgap, Σgap² as
    * BIGINTs — the q60 float-discipline contract) so downstream scoring
    * can derive variance/CV without touching the corpus again.
    *
    * Ordering: gaps are lags over the TOTAL per-user order
    * (ts, event_id) — the id tiebreak makes same-timestamp events
    * deterministic in both engines. Gap unit is whole epoch seconds
    * (floor-of-epoch difference, identical in Spark `unix_timestamp`
    * subtraction and DuckDB `date_diff('second', …)`), which also keeps
    * Σgap² within BIGINT at any realistic horizon (µs gaps would
    * overflow at a ~3-hour gap).
    *
    * Scale shape: one shuffle to user partitions; the lag window, the
    * per-(user, gap) modal count, and the per-user rollup all reuse that
    * partitioning. State per user is O(distinct gap values) in the modal
    * aggregate, never O(events); no global sort, no driver loops.
    */
  def interArrivalProfile(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = Tables.events(spark, dir)
      .withColumn("gap_s",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
      .filter(col("gap_s").isNotNull)
      .select("user_id", "gap_s")
    val base = gaps.groupBy("user_id").agg(
      count(lit(1)).as("n_gaps"),
      min(col("gap_s")).as("min_gap_s"),
      max(col("gap_s")).as("max_gap_s"),
      sum(col("gap_s")).as("sum_gap_s"),
      sum(col("gap_s") * col("gap_s")).as("sum_gap_sq"))
    val modal = gaps.groupBy("user_id", "gap_s").agg(count(lit(1)).as("c"))
      .groupBy("user_id").agg(max(col("c")).as("modal_gap_n"),
        count(lit(1)).as("distinct_gaps"))
    base.join(modal, Seq("user_id"))
      .withColumn("modal_ppm", expr("CAST(modal_gap_n * 1000000 DIV n_gaps AS BIGINT)"))
      .withColumn("bot_flag", col("modal_ppm") >= 300000 && col("n_gaps") >= 20)
      .select("user_id", "n_gaps", "min_gap_s", "max_gap_s", "sum_gap_s",
        "sum_gap_sq", "distinct_gaps", "modal_gap_n", "modal_ppm", "bot_flag")
  }

  private val interArrivalProfileSql =
    """WITH g AS (
      |  SELECT user_id,
      |    date_diff('second',
      |      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_s
      |  FROM events
      |), gg AS (SELECT user_id, gap_s FROM g WHERE gap_s IS NOT NULL),
      |base AS (
      |  SELECT user_id, count(*) AS n_gaps,
      |    min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s,
      |    CAST(sum(gap_s) AS BIGINT) AS sum_gap_s,
      |    CAST(sum(gap_s * gap_s) AS BIGINT) AS sum_gap_sq
      |  FROM gg GROUP BY 1),
      |modal AS (
      |  SELECT user_id, max(c) AS modal_gap_n, count(*) AS distinct_gaps
      |  FROM (SELECT user_id, gap_s, count(*) AS c FROM gg GROUP BY 1, 2)
      |  GROUP BY 1)
      |SELECT b.user_id, n_gaps, min_gap_s, max_gap_s, sum_gap_s, sum_gap_sq,
      |  distinct_gaps, modal_gap_n,
      |  CAST(modal_gap_n * 1000000 // n_gaps AS BIGINT) AS modal_ppm,
      |  (modal_gap_n * 1000000 // n_gaps >= 300000 AND n_gaps >= 20) AS bot_flag
      |FROM base b JOIN modal m ON m.user_id = b.user_id""".stripMargin

  // ---------------------------------------------------------------- q126
  /** Touch attribution — for every purchase, whether (and how recently) a
    * click/view preceded it within the 7-day attribution window, rolled
    * up per purchase day: last-touch click attribution plus view-assist
    * coverage, with attributed revenue in integer cents. The missing
    * member of the event battery next to the funnel (q61: did the
    * ordered stages ever happen), retention (q62) and chains (q85):
    * attribution asks WHICH prior touch gets credit for each conversion
    * under a bounded lookback.
    *
    * Scale shape: the q23/q84 log-merge discipline — one shuffle to user
    * partitions, then running `max(CASE type)` windows over the merged
    * event log compute each purchase's most recent prior click and view
    * in the same sort; the day rollup is a days-sized aggregate. No
    * self-join of events against events, no range join, nothing
    * quadratic — the window IS the as-of join.
    *
    * Exactness: timestamps compare in whole microseconds, the window
    * test is integer epoch arithmetic, revenue is integer cents, and the
    * per-user order is total via the (ts, event_id) tiebreak.
    */
  def touchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val horizonUs = 7L * 24 * 3600 * 1000000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"))
      .withColumn("us", unix_micros(col("ts")))
    ev.withColumn("last_click_us",
        max(when(col("event_type") === "click", col("us"))).over(w))
      .withColumn("last_view_us",
        max(when(col("event_type") === "view", col("us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        (col("last_click_us") >= col("us") - horizonUs).as("click_attr"),
        (col("last_view_us") >= col("us") - horizonUs).as("view_assist"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("click_attr"), 1L).otherwise(0L)).as("n_click_attributed"),
        sum(when(col("view_assist"), 1L).otherwise(0L)).as("n_view_assisted"),
        sum(when(col("click_attr"), col("cents")).otherwise(0L))
          .as("attributed_cents"),
        sum(col("cents")).as("total_cents"))
  }

  private val touchAttributionSql =
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    epoch_us(ts) AS us,
      |    max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) OVER w AS last_click_us,
      |    max(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) OVER w AS last_view_us
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |), p AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS day,
      |    coalesce(last_click_us >= us - 604800000000, false) AS click_attr,
      |    coalesce(last_view_us >= us - 604800000000, false) AS view_assist,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM ev WHERE event_type = 'purchase'
      |)
      |SELECT day, count(*) AS n_purchases,
      |  CAST(sum(CASE WHEN click_attr THEN 1 ELSE 0 END) AS BIGINT) AS n_click_attributed,
      |  CAST(sum(CASE WHEN view_assist THEN 1 ELSE 0 END) AS BIGINT) AS n_view_assisted,
      |  CAST(sum(CASE WHEN click_attr THEN cents ELSE 0 END) AS BIGINT) AS attributed_cents,
      |  CAST(sum(cents) AS BIGINT) AS total_cents
      |FROM p GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- q139
  /** Session MRR — mean reciprocal rank of the first `purchase` within
    * each 30-minute session, cohorted by the session's FIRST event type
    * (the "entry point"). The search-relevance metric applied to
    * conversion: how early in a session does the goal event land, per
    * acquisition path. All arithmetic is exact integers — reciprocal
    * ranks in micro units (1e6 DIV position), their sum, and the mean
    * over converting sessions.
    *
    * Session identity is the q32 gaps-and-islands id (same 1800-second
    * gap, same (ts, event_id) total order), so the session boundary
    * semantics are already oracle-pinned; this query adds the
    * within-session position layer on the SAME user-keyed window pass —
    * no extra shuffle beyond the final cohort aggregate.
    */
  /** The q32 gaps-and-islands session id — ONE definition (1800-second
    * gap, (ts, event_id) total order) shared by every session-keyed
    * query here, so the session-boundary contract cannot drift between
    * q32/q139/q140.
    */
  private def withSessionIds(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val wu = w.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("brk",
        when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wu))
          > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(wu))
  }

  def sessionMrr(spark: SparkSession, dir: String): DataFrame =
    sessionMrr(Tables.events(spark, dir))

  def sessionMrr(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val marked = withSessionIds(events)
    val ws = w.partitionBy("user_id", "sid").orderBy(col("ts"), col("event_id"))
    val inSession = marked
      .withColumn("pos", row_number().over(ws))
      .groupBy("user_id", "sid")
      .agg(
        min(when(col("event_type") === "purchase", col("pos"))).as("first_buy"),
        min(struct(col("pos"), col("event_type"))).as("first_ev"))
    inSession
      .groupBy(col("first_ev.event_type").as("entry_type"))
      .agg(
        count(lit(1)).as("n_sessions"),
        count(col("first_buy")).as("n_converting"),
        sum(when(col("first_buy").isNotNull,
          expr("CAST(1000000 DIV first_buy AS BIGINT)")).otherwise(0L))
          .as("sum_rr_micro"))
      .withColumn("conv_ppm",
        expr("CAST(n_converting * 1000000 DIV n_sessions AS BIGINT)"))
      .withColumn("mrr_micro",
        expr("CAST(CASE WHEN n_converting > 0 " +
          "THEN sum_rr_micro DIV n_converting ELSE 0 END AS BIGINT)"))
  }

  private val sessionMrrSql =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), islands AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked
      |), pos AS (
      |  SELECT user_id, sid, event_type,
      |    row_number() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id)
      |      AS pos
      |  FROM islands
      |), per_session AS (
      |  SELECT user_id, sid,
      |    min(CASE WHEN event_type = 'purchase' THEN pos END) AS first_buy,
      |    min_by(event_type, pos) AS entry_type
      |  FROM pos GROUP BY 1, 2
      |)
      |SELECT entry_type,
      |  CAST(count(*) AS BIGINT) AS n_sessions,
      |  CAST(count(first_buy) AS BIGINT) AS n_converting,
      |  CAST(sum(CASE WHEN first_buy IS NOT NULL
      |           THEN 1000000 // first_buy ELSE 0 END) AS BIGINT)
      |    AS sum_rr_micro,
      |  CAST(count(first_buy) * 1000000 // count(*) AS BIGINT) AS conv_ppm,
      |  CAST(CASE WHEN count(first_buy) > 0
      |       THEN sum(CASE WHEN first_buy IS NOT NULL
      |                THEN 1000000 // first_buy ELSE 0 END)
      |            // count(first_buy)
      |       ELSE 0 END AS BIGINT) AS mrr_micro
      |FROM per_session GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- q207
  /** Session nDCG@10 — the graded-relevance ranking metric the eval
    * family was missing (AUC/PR judge binary labels, MRR only the first
    * hit): how front-loaded is each session's value, per entry cohort?
    * Gains are 2^rel − 1 over the graded event ladder purchase=3,
    * click=2, view=1 (else 0); DCG discounts 1/log₂(pos+1) for
    * positions 1..10.
    *
    * Exactness (the q201 SPRT-constant discipline): the TEN discount
    * constants are computed ONCE in Scala, floored to integer
    * NANO-units, and interpolated as literals into BOTH engines — so
    * per-position contributions are exact integer products, DCG/IDCG
    * are exact integer sums, and nDCG is one exact integer division in
    * PPM. No float exists anywhere in either engine. The ideal ordering
    * ranks by (rel DESC, pos ASC) — a total order, so IDCG is
    * deterministic under gain ties.
    *
    * Scale shape: rides the SAME user-keyed session window pass as
    * q32/q139/q140 (one shuffle on user_id, windows within partitions),
    * then a cohort-sized aggregate. Sessions with IDCG = 0 (no graded
    * event) are excluded from the mean in both engines.
    */
  private val ndcgDiscNano: IndexedSeq[Long] = (1 to 10).map { p =>
    math.floor(1e9 / (math.log(p + 1.0) / math.log(2.0)) + 0.5).toLong
  }

  def sessionNdcg(spark: SparkSession, dir: String): DataFrame =
    sessionNdcg(Tables.events(spark, dir))

  def sessionNdcg(events: DataFrame): DataFrame = {
    val marked = withSessionIds(events)
    val ws = Window.partitionBy("user_id", "sid")
      .orderBy(col("ts"), col("event_id"))
    val discOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      pos => (1 to 10).foldLeft(lit(0L): org.apache.spark.sql.Column) {
        (acc, p) => when(pos === p, lit(ndcgDiscNano(p - 1))).otherwise(acc)
      }
    val graded = marked
      .withColumn("pos", row_number().over(ws))
      .withColumn("gain",
        when(col("event_type") === "purchase", 7L)
          .when(col("event_type") === "click", 3L)
          .when(col("event_type") === "view", 1L).otherwise(0L))
      .withColumn("ipos", row_number().over(
        Window.partitionBy("user_id", "sid")
          .orderBy(col("gain").desc, col("pos"))))
    graded
      .groupBy("user_id", "sid")
      .agg(
        sum(when(col("pos") <= 10, col("gain") * discOf(col("pos")))
          .otherwise(0L)).as("dcg_nano"),
        sum(when(col("ipos") <= 10, col("gain") * discOf(col("ipos")))
          .otherwise(0L)).as("idcg_nano"),
        min(struct(col("pos"), col("event_type"))).as("first_ev"))
      .filter(col("idcg_nano") > 0)
      .withColumn("ndcg_ppm",
        expr("CAST(1000000 * dcg_nano DIV idcg_nano AS BIGINT)"))
      .groupBy(col("first_ev.event_type").as("entry_type"))
      .agg(count(lit(1)).as("n_scored"),
        sum("ndcg_ppm").as("sum_ndcg_ppm"))
      .withColumn("mean_ndcg_ppm",
        expr("CAST(sum_ndcg_ppm DIV n_scored AS BIGINT)"))
  }

  private def sessionNdcgSql: String = {
    def discCase(posCol: String): String =
      (1 to 10).map(p => s"WHEN $posCol = $p THEN ${ndcgDiscNano(p - 1)}")
        .mkString("CASE ", " ", " ELSE 0 END")
    s"""WITH marked AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), islands AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked
      |), graded AS (
      |  SELECT user_id, sid, event_type,
      |    row_number() OVER (PARTITION BY user_id, sid
      |                       ORDER BY ts, event_id) AS pos,
      |    CASE event_type WHEN 'purchase' THEN 7 WHEN 'click' THEN 3
      |      WHEN 'view' THEN 1 ELSE 0 END AS gain
      |  FROM islands
      |), ideal AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, sid
      |      ORDER BY gain DESC, pos) AS ipos
      |  FROM graded
      |), per_session AS (
      |  SELECT user_id, sid,
      |    sum(CASE WHEN pos <= 10
      |        THEN CAST(gain AS BIGINT) * (${discCase("pos")})
      |        ELSE 0 END) AS dcg_nano,
      |    sum(CASE WHEN ipos <= 10
      |        THEN CAST(gain AS BIGINT) * (${discCase("ipos")})
      |        ELSE 0 END) AS idcg_nano,
      |    min_by(event_type, pos) AS entry_type
      |  FROM ideal GROUP BY 1, 2
      |)
      |SELECT entry_type, CAST(count(*) AS BIGINT) AS n_scored,
      |  CAST(sum(1000000 * dcg_nano // idcg_nano) AS BIGINT)
      |    AS sum_ndcg_ppm,
      |  CAST(sum(1000000 * dcg_nano // idcg_nano) // count(*) AS BIGINT)
      |    AS mean_ndcg_ppm
      |FROM per_session WHERE idcg_nano > 0
      |GROUP BY 1""".stripMargin
  }

  // --------------------------------------------------------------- q140
  /** Association rules over sessions (Apriori level 2, Agrawal &
    * Srikant '94, on the session×event-type basket matrix): for every
    * ordered pair of event types (antecedent → consequent), the
    * co-occurrence count, support, confidence, and lift — all in exact
    * integer ppm/milli units. The "users who error also churn"-class
    * analysis, run entirely on DISTINCT per-session types so a burst of
    * repeated clicks cannot inflate a rule.
    *
    * Scale shape: sessions collapse to their distinct type sets (one
    * aggregate on the session key), the pair space is |types|² — a
    * BOUNDED self-join on the session id over rows-per-session ≤
    * |types|, and the rule table is |types|²-sized however large the
    * corpus. Lift in milli units = (n_both · N · 1000) DIV (n_a · n_b).
    *
    * Task-peak bound (closing the r15 10×-decade watch item, where the
    * per-task peak grew 3.1× for 10× events): the pair aggregate's
    * hash state is one (antecedent, consequent) entry per DISTINCT
    * pair seen by the task, so peak/task ≤ |types|² / partitions — a
    * corpus-INDEPENDENT ceiling once the type vocabulary saturates.
    * The 10× growth was the vocabulary still filling its pair space
    * (planted type cardinality reached at different corpus sizes), not
    * data-proportional state: at 100× the peak grew only 1.8× total
    * (46 → 84 MB, BASELINE.md round-15 decade table) and is bounded
    * above by the saturated |types|²/partitions for ANY further
    * corpus growth. The per-session self-join stream is separately
    * bounded by rows-per-session ≤ |types| on the DISTINCT sets.
    */
  def sessionAssocRules(spark: SparkSession, dir: String): DataFrame =
    sessionAssocRules(Tables.events(spark, dir))

  def sessionAssocRules(events: DataFrame): DataFrame = {
    val types = withSessionIds(events)
      .select(col("user_id"), col("sid"), col("event_type")).distinct()
    // Session count as a one-row broadcast inside the SAME lazy plan —
    // an eager count() would re-run the corpus-wide sessionization as a
    // separate job before the query proper evaluates it again.
    val nSessionsDf = types.select("user_id", "sid").distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val perType = types.groupBy(col("event_type").as("t"))
      .agg(count(lit(1)).as("n_t"))
    val pairs = types.alias("a")
      .join(types.select(col("user_id"), col("sid"),
        col("event_type").as("consequent")).alias("b"),
        Seq("user_id", "sid"))
      .where(col("event_type") =!= col("consequent"))
      .groupBy(col("event_type").as("antecedent"), col("consequent"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(perType.select(col("t").as("antecedent"),
        col("n_t").as("n_a"))), Seq("antecedent"))
      .join(broadcast(perType.select(col("t").as("consequent"),
        col("n_t").as("n_c"))), Seq("consequent"))
      .crossJoin(broadcast(nSessionsDf))
      .select(col("antecedent"), col("consequent"), col("n_both"),
        col("n_a"), col("n_c"),
        expr("CAST(n_both * 1000000 DIV n_sessions AS BIGINT)")
          .as("support_ppm"),
        expr("CAST(n_both * 1000000 DIV n_a AS BIGINT)").as("confidence_ppm"),
        expr("CAST(n_both * n_sessions * 1000 DIV (n_a * n_c) AS BIGINT)")
          .as("lift_milli"))
  }

  private val sessionAssocRulesSql =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), islands AS (
      |  SELECT user_id, event_type,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked
      |), types AS (
      |  SELECT DISTINCT user_id, sid, event_type FROM islands
      |), n AS (
      |  SELECT count(*) AS n_sessions
      |  FROM (SELECT DISTINCT user_id, sid FROM types)
      |), per_type AS (
      |  SELECT event_type AS t, count(*) AS n_t FROM types GROUP BY 1
      |), pairs AS (
      |  SELECT a.event_type AS antecedent, b.event_type AS consequent,
      |    count(*) AS n_both
      |  FROM types a JOIN types b
      |    ON a.user_id = b.user_id AND a.sid = b.sid
      |   AND a.event_type <> b.event_type
      |  GROUP BY 1, 2
      |)
      |SELECT p.antecedent, p.consequent,
      |  CAST(p.n_both AS BIGINT) AS n_both,
      |  CAST(pa.n_t AS BIGINT) AS n_a,
      |  CAST(pc.n_t AS BIGINT) AS n_c,
      |  CAST(p.n_both * 1000000 // n.n_sessions AS BIGINT) AS support_ppm,
      |  CAST(p.n_both * 1000000 // pa.n_t AS BIGINT) AS confidence_ppm,
      |  CAST(p.n_both * n.n_sessions * 1000 // (pa.n_t * pc.n_t) AS BIGINT)
      |    AS lift_milli
      |FROM pairs p
      |JOIN per_type pa ON pa.t = p.antecedent
      |JOIN per_type pc ON pc.t = p.consequent
      |CROSS JOIN n""".stripMargin

  // --------------------------------------------------------------- q141
  /** Capped-at-zero running balance per user (credits add, debits
    * subtract, the balance can never go negative — inventory levels,
    * prepaid accounts, rate-limit token buckets). The naive reading is an
    * imperative per-row fold (`bal = max(0, bal + δ)`), which SQL cannot
    * window — but the fold has a closed form over prefix sums:
    *
    *   capped_i = p_i − min(0, min_{k ≤ i} p_k)
    *
    * (the floor "absorbs" exactly the most negative prefix reached so
    * far), and a floor hit occurs at i iff p_i < min(0, min_{k<i} p_k).
    * So the whole computation is ONE user-keyed window pass — no
    * mapGroups collect, no per-key memory, no sequential bottleneck; the
    * identity is spec-proven against a literal driver-side fold.
    *
    * Deltas are integer cents (purchase/signup credit, everything else
    * debits), so the fold is exact and engine-portable.
    */
  def cappedBalance(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val wu = w.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = wu.rowsBetween(Long.MinValue, 0)
    val before = wu.rowsBetween(Long.MinValue, -1)
    events
      .withColumn("delta",
        when(col("event_type").isin("purchase", "signup"),
          expr("CAST(round(value * 100) AS BIGINT)"))
          .otherwise(expr("-CAST(round(value * 100) AS BIGINT)")))
      .withColumn("p", sum(col("delta")).over(run))
      .withColumn("m_prev",
        least(lit(0L), coalesce(min(col("p")).over(before), lit(0L))))
      .withColumn("hit", (col("p") < col("m_prev")).cast("long"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        // final balance = p_n − min(0, min_k p_k): both terms aggregate.
        (sum(col("delta")) - least(lit(0L), min(col("p")))).as("final_cents"),
        sum(col("hit")).as("n_floor_hits"))
  }

  def cappedBalanceEvents(spark: SparkSession, dir: String): DataFrame =
    cappedBalance(Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value")))

  private val cappedBalanceSql =
    """WITH d AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN event_type IN ('purchase', 'signup')
      |         THEN CAST(round(value * 100) AS BIGINT)
      |         ELSE -CAST(round(value * 100) AS BIGINT) END AS delta
      |  FROM events
      |), p1 AS (
      |  SELECT user_id, event_id, ts, delta,
      |    sum(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS p
      |  FROM d
      |), p2 AS (
      |  SELECT user_id, delta, p,
      |    least(0, coalesce(min(p) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) AS m_prev
      |  FROM p1
      |)
      |SELECT user_id,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(delta) - least(0, min(p)) AS BIGINT) AS final_cents,
      |  CAST(sum(CASE WHEN p < m_prev THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_floor_hits
      |FROM p2 GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- q143
  /** Cohort LTV curves — cumulative per-user revenue by (acquisition
    * cohort week, weeks since acquisition): the lifetime-value layer on
    * top of q62's retention counts. Cohort = epoch-week of the user's
    * FIRST event; revenue = purchase values in integer cents; the
    * cumulative axis rides a cohort-keyed window over the (cohort × age)
    * table — weeks-sized, never events-sized. cum_cents_per_user divides
    * by the FIXED cohort size (not the week's active users), the
    * standard LTV denominator, in exact integer division.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        expr("datediff(to_date(ts), DATE '1970-01-01') DIV 7").as("wk"))
    val firstWk = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    val sized = firstWk.groupBy("cohort_wk").agg(count(lit(1)).as("cohort_users"))
    val perAge = ev.join(firstWk, "user_id")
      .withColumn("age", col("wk") - col("cohort_wk"))
      .groupBy("cohort_wk", "age")
      .agg(
        countDistinct(col("user_id")).as("n_active"),
        sum(when(col("event_type") === "purchase", col("cents"))
          .otherwise(0L)).as("revenue_cents"))
    val wc = w.partitionBy("cohort_wk").orderBy("age")
      .rowsBetween(Long.MinValue, 0)
    perAge.join(broadcast(sized), "cohort_wk")
      .withColumn("cum_revenue_cents", sum(col("revenue_cents")).over(wc))
      .select(col("cohort_wk"), col("age"), col("cohort_users"),
        col("n_active"), col("revenue_cents"), col("cum_revenue_cents"),
        expr("CAST(cum_revenue_cents DIV cohort_users AS BIGINT)")
          .as("cum_cents_per_user"))
  }

  private val cohortLtvSql =
    """WITH ev AS (
      |  SELECT user_id, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    (ts::DATE - DATE '1970-01-01') // 7 AS wk
      |  FROM events
      |), fy AS (
      |  SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1
      |), sized AS (
      |  SELECT cohort_wk, count(*) AS cohort_users FROM fy GROUP BY 1
      |), per_age AS (
      |  SELECT f.cohort_wk, e.wk - f.cohort_wk AS age,
      |    count(DISTINCT e.user_id) AS n_active,
      |    sum(CASE WHEN e.event_type = 'purchase' THEN e.cents ELSE 0 END)
      |      AS revenue_cents
      |  FROM ev e JOIN fy f ON f.user_id = e.user_id
      |  GROUP BY 1, 2
      |)
      |SELECT p.cohort_wk, p.age,
      |  CAST(s.cohort_users AS BIGINT) AS cohort_users,
      |  CAST(p.n_active AS BIGINT) AS n_active,
      |  CAST(p.revenue_cents AS BIGINT) AS revenue_cents,
      |  CAST(sum(p.revenue_cents) OVER (PARTITION BY p.cohort_wk ORDER BY p.age
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_revenue_cents,
      |  CAST((sum(p.revenue_cents) OVER (PARTITION BY p.cohort_wk ORDER BY p.age
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |    // s.cohort_users AS BIGINT) AS cum_cents_per_user
      |FROM per_age p JOIN sized s ON s.cohort_wk = p.cohort_wk""".stripMargin

  // --------------------------------------------------------------- q146
  /** Position-based (U-shaped) multi-touch attribution — the complement
    * of q126's last-touch rule: every click in the 7-day lookback before
    * a purchase gets credit, weighted 40/20/40 (first / middles split /
    * last), so acquisition AND closing touches both show up in the
    * report. Credit is integer milli-units per touch with the division
    * remainder assigned to the FIRST touch (Σ credit = 1000 exactly per
    * touched purchase, engine-portable); attributed revenue is
    * cents·credit DIV 1000. Purchases with no touch in the window land
    * in the `none` class with zero credit — the rollup conserves the
    * purchase count.
    *
    * Scale shape: the touch enumeration is a USER-keyed equi-join with
    * the window bound as residual (per-user work ∝ clicks·purchases of
    * that user — bounded by per-user activity, the multi-touch
    * alternative to q126's window-only plan which can't enumerate
    * many-to-many credit); position windows ride the purchase key.
    */
  def positionAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts").cast("long").as("sec"),
        col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("sec").as("p_sec"), col("cents"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("sec").as("c_sec"))
    val touches = purchases.join(clicks, Seq("user_id"))
      .where(col("c_sec") <= col("p_sec") &&
        col("c_sec") > col("p_sec") - 7L * 86400L)
    val wp = w.partitionBy("p_id").orderBy(col("c_sec"), col("c_id"))
    val scored = touches
      .withColumn("pos", row_number().over(wp))
      .withColumn("n", count(lit(1)).over(w.partitionBy("p_id")))
      .withColumn("credit_milli",
        when(col("n") === 1, 1000L)
          .when(col("n") === 2, 500L)
          .when(col("pos") === 1,
            expr("400 + (200 - (200 DIV (n - 2)) * (n - 2))"))
          .when(col("pos") === col("n"), 400L)
          .otherwise(expr("200 DIV (n - 2)")))
      .withColumn("cls",
        when(col("n") === 1, "solo")
          .when(col("pos") === 1, "first")
          .when(col("pos") === col("n"), "last")
          .otherwise("middle"))
    val credited = scored.groupBy("cls").agg(
      count(lit(1)).as("n_touches"),
      sum(expr("cents * credit_milli DIV 1000")).as("attributed_cents"))
    val untouched = purchases
      .join(touches.select("p_id").distinct(), Seq("p_id"), "left_anti")
      .agg(count(lit(1)).as("n_touches"))
      .select(lit("none").as("cls"), col("n_touches"),
        lit(0L).as("attributed_cents"))
    credited.unionByName(untouched)
  }

  private val positionAttributionSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, CAST(epoch_us(ts) // 1000000 AS BIGINT) AS sec,
      |    event_type, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), p AS (
      |  SELECT user_id, event_id AS p_id, sec AS p_sec, cents FROM ev
      |  WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT user_id, event_id AS c_id, sec AS c_sec FROM ev
      |  WHERE event_type = 'click'
      |), t AS (
      |  SELECT p.p_id, p.cents, c.c_id, c.c_sec
      |  FROM p JOIN c ON c.user_id = p.user_id
      |   AND c.c_sec <= p.p_sec AND c.c_sec > p.p_sec - 7 * 86400
      |), scored AS (
      |  SELECT p_id, cents,
      |    row_number() OVER (PARTITION BY p_id ORDER BY c_sec, c_id) AS pos,
      |    count(*) OVER (PARTITION BY p_id) AS n
      |  FROM t
      |), cr AS (
      |  SELECT p_id, cents, pos, n,
      |    CASE WHEN n = 1 THEN 1000
      |         WHEN n = 2 THEN 500
      |         WHEN pos = 1 THEN 400 + (200 - (200 // (n - 2)) * (n - 2))
      |         WHEN pos = n THEN 400
      |         ELSE 200 // (n - 2) END AS credit_milli,
      |    CASE WHEN n = 1 THEN 'solo'
      |         WHEN pos = 1 THEN 'first'
      |         WHEN pos = n THEN 'last'
      |         ELSE 'middle' END AS cls
      |  FROM scored
      |)
      |SELECT cls, CAST(count(*) AS BIGINT) AS n_touches,
      |  CAST(sum(cents * credit_milli // 1000) AS BIGINT) AS attributed_cents
      |FROM cr GROUP BY 1
      |UNION ALL
      |SELECT 'none', CAST(count(*) AS BIGINT), 0
      |FROM p WHERE p_id NOT IN (SELECT DISTINCT p_id FROM t)""".stripMargin

  // --------------------------------------------------------------- q172
  /** Next-event model evaluation — train/test the q89 Markov model IN
    * the warehouse (the eval loop a personalization team runs before
    * shipping a "predicted next action"): transitions from the FIRST
    * half of the time range (the q167 epoch-midpoint split) train the
    * model, whose prediction per state is the argmax-count next type
    * (count desc, type asc — a deterministic total order); transitions
    * from the SECOND half score it. Per state: test transitions, hit@1
    * count, hit rate in exact ppm — all integers, so the gate is exact.
    *
    * Scale shape: one user-keyed lead-window pass over the event log
    * (the q89 shape), two vocabulary-sized aggregates, a broadcast-able
    * model join; no corpus self-join, no driver-side model.
    */
  def markovHoldoutEval(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"), col("event_id"))
    val bounds = ev.agg(min("es").as("lo"), max("es").as("hi"))
    val w = Window.partitionBy("user_id").orderBy(col("es"), col("event_id"))
    // Transitions carry the SOURCE event's split (a train→test boundary
    // transition counts as training data ending, evaluated nowhere —
    // the simple convention, applied identically in both engines).
    val trans = ev
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .crossJoin(broadcast(bounds))
      .select(col("event_type").as("from_type"), col("next_type"),
        (col("es") * 2 < col("lo") + col("hi")).as("is_train"))
    val model = trans.filter(col("is_train"))
      .groupBy("from_type", "next_type").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("from_type").orderBy(desc("c"), asc("next_type"))))
      .filter(col("rn") === 1)
      .select(col("from_type"), col("next_type").as("predicted"))
    trans.filter(!col("is_train"))
      .join(broadcast(model), Seq("from_type"))
      .groupBy("from_type", "predicted")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("next_type") === col("predicted"), 1L).otherwise(0L))
          .as("n_hits"))
      .withColumn("hit_ppm", expr("(1000000 * n_hits) div n_test"))
  }

  private val markovHoldoutEvalSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es,
      |    event_id
      |  FROM events
      |), b AS (SELECT min(es) AS lo, max(es) AS hi FROM ev),
      |tr AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY es, event_id) AS next_type,
      |    es * 2 < (SELECT lo + hi FROM b) AS is_train
      |  FROM ev
      |), t AS (SELECT * FROM tr WHERE next_type IS NOT NULL),
      |model AS (
      |  SELECT from_type, next_type AS predicted FROM (
      |    SELECT from_type, next_type,
      |      row_number() OVER (PARTITION BY from_type
      |        ORDER BY count(*) DESC, next_type) AS rn
      |    FROM t WHERE is_train GROUP BY 1, 2)
      |  WHERE rn = 1
      |)
      |SELECT t.from_type, m.predicted, count(*) AS n_test,
      |  CAST(sum(CASE WHEN t.next_type = m.predicted THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_hits,
      |  CAST((1000000 * sum(CASE WHEN t.next_type = m.predicted THEN 1 ELSE 0 END))
      |    // count(*) AS BIGINT) AS hit_ppm
      |FROM t JOIN model m USING (from_type)
      |WHERE NOT t.is_train
      |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------------- q260
  /** Frequent event paths — the k-step generalization of q89's pairwise
    * Markov transitions (the sequential-pattern face of the behavioral
    * battery: q89 models one step, q85 extracts per-user chains, this
    * ranks the corpus's recurring k-step PATHS): consecutive event-type
    * k-grams per user under the deterministic (ts, event_id) order,
    * counted corpus-wide, with per-path user support. The top paths ARE
    * the "common journeys" a funnel analyst reads, free of any
    * hypothesized step order (q61 checks ONE funnel; this discovers
    * them).
    *
    * Exactness: counts and distinct-user support are integers; the
    * top-K tie-break (n_paths desc, path asc) is total.
    *
    * Scale shape: one scan → per-user lead windows (parallel across
    * users, the q89 shape) → path hash aggregate (paths ≤ |types|^k,
    * domain-bounded) → top-K on the path frame.
    */
  def frequentEventPaths(spark: SparkSession, dir: String,
                         steps: Int = 3, topK: Int = 25): DataFrame =
    frequentEventPathsOf(Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts").cast("long").as("sec")), steps, topK)

  /** Operator form over any (user_id, event_type, event_id, sec) frame —
    * spec-tested on planted journeys.
    */
  def frequentEventPathsOf(ev: DataFrame, steps: Int, topK: Int): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    val steps2 = (1 until steps).map(i =>
      lead(col("event_type"), i).over(w).as(s"t$i"))
    val paths = ev.select(
      (col("user_id") +: col("event_type").as("t0") +: steps2): _*)
      .filter((1 until steps).map(i => col(s"t$i").isNotNull)
        .reduce(_ && _))
      .withColumn("path", concat_ws(" > ",
        (0 until steps).map(i => col(s"t$i")): _*))
    paths.groupBy("path")
      .agg(count(lit(1)).as("n_paths"),
        countDistinct("user_id").as("n_users"))
      .orderBy(desc("n_paths"), asc("path"))
      .limit(topK)
  }

  private val frequentEventPathsSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events
      |), seq AS (
      |  SELECT user_id, event_type AS t0,
      |    lead(event_type, 1) OVER w AS t1,
      |    lead(event_type, 2) OVER w AS t2
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
      |)
      |SELECT t0 || ' > ' || t1 || ' > ' || t2 AS path,
      |  CAST(count(*) AS BIGINT) AS n_paths,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL
      |GROUP BY 1
      |ORDER BY n_paths DESC, path ASC
      |LIMIT 25""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q260_frequent_paths", (s, d) => frequentEventPaths(s, d),
      Some(frequentEventPathsSql)),
    NamedQuery("q207_session_ndcg",
      (s: SparkSession, d: String) => sessionNdcg(s, d),
      Some(sessionNdcgSql)),
    NamedQuery("q172_markov_holdout", markovHoldoutEval _,
      Some(markovHoldoutEvalSql)),
    NamedQuery("q146_position_attribution", positionAttribution _,
      Some(positionAttributionSql)),
    NamedQuery("q143_cohort_ltv", cohortLtv _, Some(cohortLtvSql)),
    NamedQuery("q141_capped_balance", cappedBalanceEvents _,
      Some(cappedBalanceSql)),
    NamedQuery("q139_session_mrr", sessionMrr _, Some(sessionMrrSql)),
    NamedQuery("q140_session_assoc_rules", sessionAssocRules _,
      Some(sessionAssocRulesSql)),
    NamedQuery("q60_daily_anomalies", dailyAnomalies _, Some(dailyAnomaliesSql)),
    NamedQuery("q126_touch_attribution", touchAttribution _,
      Some(touchAttributionSql)),
    NamedQuery("q120_sliding_wau", slidingActiveUsers _, Some(slidingActiveUsersSql)),
    NamedQuery("q121_interarrival_bots", interArrivalProfile _,
      Some(interArrivalProfileSql)),
    NamedQuery("q61_conversion_funnel", conversionFunnel _, Some(conversionFunnelSql)),
    NamedQuery("q62_retention_cohorts", retentionCohorts _, Some(retentionCohortsSql)),
    NamedQuery("q85_click_chains", clickChains _, Some(clickChainsSql)),
    NamedQuery("q89_markov_transitions", markovTransitions _,
      Some(markovTransitionsSql)),
    NamedQuery("q94_open_order_concurrency", openOrderConcurrency _,
      Some(openOrderConcurrencySql)))
}
