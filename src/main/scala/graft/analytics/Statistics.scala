package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** Statistical association measures over aggregated metric tables —
  * the "are these two things related?" battery a warehouse analyst runs
  * before trusting a dashboard correlation.
  *
  * Exactness design (the q81/q99 discipline): every gated column is
  * integer arithmetic end to end. Spearman's rho is 1 − 6Σd²/(n(n²−1))
  * over integer ranks, emitted in micro-units via Spark `div` ≡ DuckDB
  * `//`; ranks use an explicit deterministic tiebreak (metric, then
  * day) so both engines assign identical rank vectors — documented as
  * tie-broken Spearman, the variant that is cross-engine exact. (The
  * averaged-rank tie variant needs fractional ranks; with the tiebreak
  * the statistic differs only when ties are massive, which the gate
  * would surface.)
  *
  * Scale shape: the corpus-sized work is ONE hash aggregation down to a
  * (group, day) metric table; ranking then runs per group over
  * days-sized partitions — a window sort over metadata-scale data, never
  * the fact table. At 100 TB the aggregate is the only full scan.
  */
object Statistics {

  /** Tie-broken Spearman rank correlation between two metric columns of
    * a per-(group, x) table. Returns (group, n, sum_d2, rho_micro).
    *
    * Rank tiebreak: (metric, xCol) ascending — deterministic on any
    * engine. rho_micro = 1e6 − (6e6·Σd²) div (n(n²−1)); n must be ≥ 2
    * per group (degenerate groups are filtered, not divided by zero).
    */
  def spearman(perX: DataFrame, groupCol: String, xCol: String,
               aCol: String, bCol: String): DataFrame = {
    val wa = Window.partitionBy(groupCol).orderBy(col(aCol), col(xCol))
    val wb = Window.partitionBy(groupCol).orderBy(col(bCol), col(xCol))
    perX
      .withColumn("ra", row_number().over(wa).cast("long"))
      .withColumn("rb", row_number().over(wb).cast("long"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum((col("ra") - col("rb")) * (col("ra") - col("rb"))).as("sum_d2"))
      .filter(col("n") >= 2)
      .withColumn("rho_micro",
        expr("1000000 - (6000000 * sum_d2) div (n * (n * n - 1))"))
  }

  // --------------------------------------------------------------- q105
  /** Gated face: per-segment Spearman correlation between daily revenue
    * (cents) and daily order count — "do busy days also pay more?". The
    * daily table is the one corpus-sized aggregation; the rank windows
    * run over ~hundreds of days per segment.
    */
  def revenueVolumeSpearman(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        col("o_orderdate").cast("date").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
        count(lit(1)).as("n_orders"))
    spearman(daily, "segment", "day", "cents", "n_orders")
      .select(col("segment"), col("n"), col("sum_d2"), col("rho_micro"))
  }

  private val revenueVolumeSpearmanSql =
    """WITH daily AS (
      |  SELECT c.c_mktsegment AS segment, o.o_orderdate::DATE AS day,
      |    sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents,
      |    count(*) AS n_orders
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2
      |),
      |ranked AS (
      |  SELECT segment,
      |    CAST(row_number() OVER (PARTITION BY segment ORDER BY cents, day)
      |      AS BIGINT) AS ra,
      |    CAST(row_number() OVER (PARTITION BY segment ORDER BY n_orders, day)
      |      AS BIGINT) AS rb
      |  FROM daily
      |),
      |s AS (
      |  SELECT segment, count(*) AS n, sum((ra - rb) * (ra - rb)) AS sum_d2
      |  FROM ranked GROUP BY 1 HAVING count(*) >= 2
      |)
      |SELECT segment, CAST(n AS BIGINT) AS n, CAST(sum_d2 AS BIGINT) AS sum_d2,
      |  CAST(1000000 - (6000000 * sum_d2) // (n * (n * n - 1)) AS BIGINT)
      |    AS rho_micro
      |FROM s""".stripMargin

  // --------------------------------------------------------------- q107
  /** Tie-broken Mann–Whitney U — the rank-sum two-sample test: "do these
    * two cohorts draw from the same distribution?", the non-parametric
    * alternative to a t-test an analyst reaches for on skewed warehouse
    * metrics. Samples carry a boolean side flag; per group we rank the
    * COMBINED sample (deterministic tiebreak: value, then id — the
    * cross-engine-exact variant, same discipline as [[spearman]]),
    * sum side-A ranks, and derive U_a = R_a − n_a(n_a+1)/2,
    * U_b = n_a·n_b − U_a, plus the rank-biserial effect size
    * r = 2·U_a/(n_a·n_b) − 1 in integer micro-units via truncating
    * division (Spark `div` ≡ DuckDB `//`).
    *
    * Scale shape: rank statistics need a total order per group — ONE
    * key-partitioned window sort (groups sort in parallel), then a hash
    * aggregate; nothing global, nothing driver-sized. Groups where
    * either side is empty are reported with null effect (U undefined),
    * not dropped silently.
    */
  def mannWhitney(samples: DataFrame, groupCol: String, isACol: String,
                  valueCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol), col(idCol))
    samples
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy(groupCol)
      .agg(
        sum(when(col(isACol), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col(isACol), 1L).otherwise(0L)).as("n_b"),
        sum(when(col(isACol), col("rk")).otherwise(0L)).as("r_a"))
      .withColumn("u_a", expr("r_a - (n_a * (n_a + 1)) div 2"))
      .withColumn("u_b", col("n_a") * col("n_b") - col("u_a"))
      .withColumn("rb_micro",
        when(col("n_a") > 0 && col("n_b") > 0,
          expr("(2000000 * u_a) div (n_a * n_b) - 1000000")))
  }

  /** Gated face: BUILDING vs MACHINERY order spend per order priority —
    * same-shaped cohorts whose U statistic a reviewer can sanity-read
    * (rb_micro near 0 ⇒ the segments spend alike at every priority).
    */
  def segmentSpendMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val samples = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("o_orderpriority").as("priority"),
        (col("c_mktsegment") === "BUILDING").as("is_a"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"))
    mannWhitney(samples, "priority", "is_a", "cents", "o_orderkey")
      .select(col("priority"), col("n_a"), col("n_b"), col("u_a"),
        col("u_b"), col("rb_micro"))
  }

  private val segmentSpendMannWhitneySql =
    """WITH samples AS (
      |  SELECT o.o_orderpriority AS priority,
      |    c.c_mktsegment = 'BUILDING' AS is_a,
      |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
      |    o.o_orderkey
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
      |),
      |ranked AS (
      |  SELECT priority, is_a,
      |    CAST(row_number() OVER (PARTITION BY priority
      |      ORDER BY cents, o_orderkey) AS BIGINT) AS rk
      |  FROM samples
      |),
      |s AS (
      |  SELECT priority,
      |    sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS n_a,
      |    sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS n_b,
      |    sum(CASE WHEN is_a THEN rk ELSE 0 END) AS r_a
      |  FROM ranked GROUP BY 1
      |)
      |SELECT priority, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(r_a - (n_a * (n_a + 1)) // 2 AS BIGINT) AS u_a,
      |  CAST(n_a * n_b - (r_a - (n_a * (n_a + 1)) // 2) AS BIGINT) AS u_b,
      |  CASE WHEN n_a > 0 AND n_b > 0 THEN
      |    CAST((2000000 * (r_a - (n_a * (n_a + 1)) // 2)) // (n_a * n_b)
      |      - 1000000 AS BIGINT) END AS rb_micro
      |FROM s""".stripMargin

  // --------------------------------------------------------------- q111
  /** Pearson chi-square test of independence between two categorical
    * columns — the contingency-table member of the battery ([[spearman]]
    * ranks × ranks, [[mannWhitney]] cohort × metric, this one category ×
    * category): "does order priority depend on market segment?".
    *
    * Exactness (the q77 G² discipline): each cell's term
    * (O − E)²/E = (O·N − R·C)² / (N·R·C) is ONE fixed double-op
    * sequence over cast exact-integer counts, floored to integer
    * nano-units per cell; the statistic is then a sum of integers —
    * order-independent, engine-identical. Degrees of freedom ride along
    * as exact integers.
    *
    * Scale shape: the corpus collapses to its R×C contingency table in
    * one hash aggregation; marginals and N are cell-table aggregates
    * joined broadcast. The fact table is scanned once, and everything
    * after is category-cardinality-sized.
    */
  def chiSquare(obs: DataFrame, rowCol: String, colCol: String): DataFrame = {
    // The contingency table feeds four derivations (marginals, N, grid) —
    // checkpoint it so the observation scan runs exactly once.
    val cells = obs.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint()
    val rowTot = cells.groupBy("r").agg(sum("o").as("rt"))
    val colTot = cells.groupBy("c").agg(sum("o").as("ct"))
    val n = cells.agg(sum("o").as("n"))
    // Dense grid: absent (r, c) combinations still carry E = R·C/N.
    val grid = rowTot.crossJoin(broadcast(colTot))
      .join(cells, Seq("r", "c"), "left")
      .crossJoin(broadcast(n))
      .select(col("r"), col("c"), coalesce(col("o"), lit(0L)).as("o"),
        col("rt"), col("ct"), col("n"))
    val d = (col("o").cast("double") * col("n").cast("double")) -
      (col("rt").cast("double") * col("ct").cast("double"))
    val term = (d * d) / (col("n").cast("double") *
      col("rt").cast("double") * col("ct").cast("double"))
    grid
      .withColumn("cell_nn", floor(term * lit(1000000000.0) + lit(0.5)).cast("long"))
      .agg(count(lit(1)).as("n_cells"),
        countDistinct(col("r")).as("n_rows_cat"),
        countDistinct(col("c")).as("n_cols_cat"),
        first(col("n")).as("n"),
        sum("cell_nn").as("chi2_nanounits"))
      .select(col("n"), col("n_rows_cat"), col("n_cols_cat"),
        ((col("n_rows_cat") - 1) * (col("n_cols_cat") - 1)).as("dof"),
        col("chi2_nanounits"))
  }

  /** Gated face: market segment × order priority over all orders. */
  def segmentPriorityChiSquare(spark: SparkSession, dir: String): DataFrame = {
    val obs = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
    chiSquare(obs, "c_mktsegment", "o_orderpriority")
  }

  private val segmentPriorityChiSquareSql =
    """WITH obs AS (
      |  SELECT c.c_mktsegment AS r, o.o_orderpriority AS c
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |),
      |cells AS (SELECT r, c, count(*) AS o FROM obs GROUP BY 1, 2),
      |rt AS (SELECT r, sum(o) AS rt FROM cells GROUP BY 1),
      |ct AS (SELECT c, sum(o) AS ct FROM cells GROUP BY 1),
      |n AS (SELECT sum(o) AS n FROM cells),
      |grid AS (
      |  SELECT rt.r, ct.c, coalesce(cells.o, 0) AS o, rt.rt, ct.ct, n.n
      |  FROM rt CROSS JOIN ct CROSS JOIN n
      |  LEFT JOIN cells ON cells.r = rt.r AND cells.c = ct.c
      |),
      |terms AS (
      |  SELECT r, c,
      |    CAST(floor(
      |      ((o::DOUBLE * n::DOUBLE) - (rt::DOUBLE * ct::DOUBLE)) *
      |      ((o::DOUBLE * n::DOUBLE) - (rt::DOUBLE * ct::DOUBLE)) /
      |      (n::DOUBLE * rt::DOUBLE * ct::DOUBLE)
      |      * 1000000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS cell_nn,
      |    n
      |  FROM grid
      |)
      |SELECT CAST(max(n) AS BIGINT) AS n,
      |  CAST(count(DISTINCT r) AS BIGINT) AS n_rows_cat,
      |  CAST(count(DISTINCT c) AS BIGINT) AS n_cols_cat,
      |  CAST((count(DISTINCT r) - 1) * (count(DISTINCT c) - 1) AS BIGINT) AS dof,
      |  CAST(sum(cell_nn) AS BIGINT) AS chi2_nanounits
      |FROM terms""".stripMargin

  // --------------------------------------------------------------- q116
  /** Two-sample Kolmogorov–Smirnov statistic, each group against the
    * pooled rest — the drift test for CONTINUOUS distributions, closing
    * the family next to Mann-Whitney (q107: location shift) and
    * chi-square (q111: categorical): KS is sensitive to any shape
    * difference (spread, tails, bimodality), not just a median shift.
    *
    * Exactness: D = sup_x |F1(x) − F2(x)| is attained at a jump point,
    * i.e. at one of the pooled sample's distinct values, so
    * D = max_x |n2·c1(x) − n1·c2(x)| / (n1·n2) with c1/c2 the cumulative
    * counts — an integer maximum over integer products. d_micro is the
    * integer division (1e6·d_num) div (n1·n2). No floats anywhere.
    * (n1·n2 bounds the honest range: past ~3e9 rows per side the product
    * wraps int64 — at that scale you test on a sketch, not row counts.)
    *
    * Scale shape: ONE corpus-sized hash aggregation down to per-(group,
    * value) counts; the ECDF windows then sort only the distinct-value
    * grid per group. The grid is values × groups — metadata-scale next
    * to the fact table, and each group's window is independent (no
    * global sort).
    *
    * Returns one row per group: (group, n1, n2, d_num, d_micro) with
    * d_micro = (1e6·d_num) div (n1·n2); single-value-side groups (n1 or
    * n2 zero elsewhere) are kept — D is still well-defined as long as
    * both sides are non-empty, and groups that ARE the whole pool
    * (n2 = 0) are filtered rather than divided by zero.
    */
  def ksAgainstRest(perRow: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    // Six downstream consumers (grid, both ECDFs, totals, pool size) —
    // materialize the corpus-collapsing aggregate once (the chiSquare
    // discipline) or every consumer re-scans the fact table.
    val counts = perRow.groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // Dense (group × pooled distinct value) grid: a group's ECDF must
    // step at OTHER groups' values too, or c1 at a pooled jump point
    // where this group has no observation is missed.
    val values = counts.select(col("v")).distinct()
    val groups = counts.select(col("g")).distinct()
    val grid = values.crossJoin(broadcast(groups))
      .join(counts, Seq("g", "v"), "left")
      .select(col("g"), col("v"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val cum = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stepped = grid.withColumn("c1", sum("cnt").over(cum))
    // Pooled ECDF: one global window over the distinct-value axis only
    // (single partition by construction — it sorts values, not rows).
    val pooled = counts.groupBy("v").agg(sum("cnt").as("tot"))
      .withColumn("call", sum("tot").over(
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = counts.groupBy("g").agg(sum("cnt").as("n1"))
    val nAll = counts.agg(sum("cnt").as("n_all"))
    stepped
      .join(pooled.select(col("v"), col("call")), Seq("v"))
      .join(broadcast(totals), Seq("g"))
      .crossJoin(broadcast(nAll))
      .withColumn("n2", col("n_all") - col("n1"))
      // D numerator at this value: |n2·c1 − n1·c2| with c2 = call − c1.
      .withColumn("d_at_v",
        abs(col("n2") * col("c1") - col("n1") * (col("call") - col("c1"))))
      .groupBy(col("g"))
      .agg(first("n1").as("n1"), first("n2").as("n2"),
        max("d_at_v").as("d_num"))
      .filter(col("n2") > 0)
      .withColumn("d_micro", expr("(1000000 * d_num) div (n1 * n2)"))
  }

  /** Gated face (q116): order-price cents per market segment vs rest. */
  def segmentPriceKs(spark: SparkSession, dir: String): DataFrame = {
    val obs = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    ksAgainstRest(obs, "segment", "cents")
      .withColumnRenamed("g", "segment")
  }

  private val segmentPriceKsSql =
    """WITH obs AS (
      |  SELECT c.c_mktsegment AS g,
      |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |),
      |counts AS (
      |  SELECT g, v, CAST(count(*) AS BIGINT) AS cnt FROM obs GROUP BY 1, 2
      |),
      |grid AS (
      |  SELECT gs.g, vs.v, coalesce(c.cnt, 0) AS cnt
      |  FROM (SELECT DISTINCT v FROM counts) vs
      |  CROSS JOIN (SELECT DISTINCT g FROM counts) gs
      |  LEFT JOIN counts c ON c.g = gs.g AND c.v = vs.v
      |),
      |stepped AS (
      |  SELECT g, v, CAST(sum(cnt) OVER
      |    (PARTITION BY g ORDER BY v
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1
      |  FROM grid
      |),
      |pooled AS (
      |  SELECT v, CAST(sum(tot) OVER
      |    (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS call
      |  FROM (SELECT v, sum(cnt) AS tot FROM counts GROUP BY 1)
      |),
      |totals AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n1 FROM counts GROUP BY 1),
      |nall AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM counts)
      |SELECT g AS segment,
      |  CAST(any_value(n1) AS BIGINT) AS n1,
      |  CAST(any_value(n_all - n1) AS BIGINT) AS n2,
      |  CAST(max(abs((n_all - n1) * c1 - n1 * (call - c1))) AS BIGINT) AS d_num,
      |  CAST((1000000 * max(abs((n_all - n1) * c1 - n1 * (call - c1))))
      |    // (any_value(n1) * any_value(n_all - n1)) AS BIGINT) AS d_micro
      |FROM stepped
      |JOIN pooled USING (v)
      |JOIN totals USING (g)
      |CROSS JOIN nall
      |GROUP BY g""".stripMargin

  // --------------------------------------------------------------- q135
  /** Precision/recall threshold sweep — the full operating-characteristic
    * table of a binary decision rule "predict positive when score ≥ t",
    * one row per distinct score level: predicted count, true positives,
    * precision and recall in exact integer ppm. The model-eval
    * counterpart of q107's rank-sum AUC: AUC summarizes the sweep, this
    * IS the sweep (pick a threshold off it, plot the PR curve, set a
    * quality gate).
    *
    * Scale shape: the corpus collapses to its distinct-score level table
    * in one hash aggregate (with map-side combine); the cumulative sums
    * ride one window over that LEVEL table. Levels are bounded by the
    * score's value space — for a continuous score, quantile-bucket it
    * first (q64's boundary method) so the level table stays thousands of
    * rows at any corpus size; the windows never see the corpus.
    *
    * The gated face scores documents by `n_chars` against the label
    * `lang = 'en'` — the mechanics (cumulative confusion matrix, exact
    * ppm ratios, total-order levels) are what is under test.
    */
  def prCurve(df: DataFrame, score: Column, label: Column): DataFrame = {
    val levels = df
      .select(score.as("threshold"), label.cast("int").as("y"))
      .groupBy("threshold")
      .agg(count(lit(1)).as("n"), sum("y").as("pos"))
    val wDesc = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    levels
      .withColumn("n_pred", sum("n").over(wDesc))
      .withColumn("n_tp", sum("pos").over(wDesc))
      .withColumn("total_pos", sum("pos").over(wAll))
      .select(col("threshold"), col("n_pred"), col("n_tp"),
        expr("CAST(n_tp * 1000000 DIV n_pred AS BIGINT)").as("precision_ppm"),
        expr("CAST(n_tp * 1000000 DIV total_pos AS BIGINT)").as("recall_ppm"))
  }

  def docLengthPrCurve(spark: SparkSession, dir: String): DataFrame =
    prCurve(Tables.documents(spark, dir), col("n_chars"), col("lang") === "en")

  private val docLengthPrCurveSql =
    """WITH base AS (
      |  SELECT n_chars AS threshold,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents
      |), lv AS (
      |  SELECT threshold, count(*) AS n, sum(y) AS pos FROM base GROUP BY 1
      |)
      |SELECT threshold,
      |  CAST(sum(n) OVER w AS BIGINT) AS n_pred,
      |  CAST(sum(pos) OVER w AS BIGINT) AS n_tp,
      |  CAST((sum(pos) OVER w) * 1000000 // (sum(n) OVER w) AS BIGINT)
      |    AS precision_ppm,
      |  CAST((sum(pos) OVER w) * 1000000 // (SELECT sum(y) FROM base) AS BIGINT)
      |    AS recall_ppm
      |FROM lv
      |WINDOW w AS (ORDER BY threshold DESC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // --------------------------------------------------------------- q138
  /** Quantile normalization across groups — map every row's value onto
    * the POOLED distribution at the same within-group quantile (the
    * batch-effect correction standard from expression-array statistics,
    * Bolstad et al. 2003, applied to per-source score drift): after
    * normalization every source has the same marginal distribution, so
    * downstream thresholds mean the same thing for every source.
    *
    * Deterministic integer formulation: within-group rank r (total order
    * via the id tiebreak), target pooled rank ⌈r·N/n_g⌉ in integer
    * arithmetic, and the normalized value is the pooled value whose
    * cumulative-count interval contains that target rank.
    *
    * Scale shape: ranks are group-keyed windows; the pooled distribution
    * collapses to its VALUE-LEVEL table (one hash aggregate + one
    * level-sized cumulative window), and the rank→value lookup is a
    * broadcast interval join against that level table — value-space
    * bounded, like q135's sweep. A corpus-sized global sort never
    * exists; for unbounded-cardinality scores, quantile-bucket first.
    */
  def quantileNormalize(df: DataFrame, group: Column, value: Column,
                        id: Column): DataFrame = {
    val base = df.select(id.as("id"), group.as("g"), value.as("v"))
    val n = base.agg(count(lit(1)).as("n_total"))
    val wsrc = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val wg = Window.partitionBy("g")
    val ranked = base
      .withColumn("r", row_number().over(wsrc))
      .withColumn("n_g", count(lit(1)).over(wg))
      .crossJoin(broadcast(n))
      .withColumn("tr", expr("(r * n_total + n_g - 1) DIV n_g"))
    val wlev = Window.orderBy("lvv").rowsBetween(Window.unboundedPreceding, 0)
    val lev = base.groupBy(col("v").as("lvv")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(wlev))
      .withColumn("cum_prev", col("cum") - col("cnt"))
    ranked.join(broadcast(lev),
        col("tr") > col("cum_prev") && col("tr") <= col("cum"))
      .select(col("id"), col("g"), col("v"), col("lvv"),
        col("r").cast("long").as("rank_in_group"))
  }

  def docLengthQuantileNorm(spark: SparkSession, dir: String): DataFrame =
    quantileNormalize(Tables.documents(spark, dir), col("source"),
      col("n_chars"), col("doc_id"))
      .select(col("id").as("doc_id"), col("g").as("source"),
        col("v").as("n_chars"), col("lvv").as("norm_chars"),
        col("rank_in_group"))

  private val docLengthQuantileNormSql =
    """WITH base AS (
      |  SELECT doc_id, source, n_chars AS v FROM documents
      |), n AS (
      |  SELECT count(*) AS n_total FROM base
      |), rk AS (
      |  SELECT doc_id, source, v,
      |    row_number() OVER (PARTITION BY source ORDER BY v, doc_id) AS r,
      |    count(*) OVER (PARTITION BY source) AS n_g
      |  FROM base
      |), tr AS (
      |  SELECT rk.*, (r * n.n_total + n_g - 1) // n_g AS tr FROM rk, n
      |), lv AS (
      |  SELECT v AS lvv, count(*) AS cnt FROM base GROUP BY 1
      |), cl AS (
      |  SELECT lvv, cnt, sum(cnt) OVER (ORDER BY lvv
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM lv
      |)
      |SELECT t.doc_id, t.source, t.v AS n_chars,
      |  CAST(c.lvv AS BIGINT) AS norm_chars,
      |  CAST(t.r AS BIGINT) AS rank_in_group
      |FROM tr t JOIN cl c ON t.tr > c.cum - c.cnt AND t.tr <= c.cum""".stripMargin

  // --------------------------------------------------------------- q163
  /** Two-proportion z-test — the A/B-test significance read (the
    * drift-family member for BINARY rates, next to location (q107 MW),
    * categorical (q111 χ²), and shape (q116 KS)): did cohort A convert
    * at a different rate than cohort B? z = (p̂₁−p̂₂)/√(p̂(1−p̂)(1/n₁+1/n₂))
    * with the pooled p̂ — the standard large-sample test.
    *
    * Cohorts are the deterministic even/odd user-id split; "converted" =
    * the user has ≥10 purchase events (every fixture user purchases at
    * least once, so the ≥1 rate is degenerately 1.0 — the ≥10 gate has
    * genuine variance at every harness SF). Degenerate pooled rates
    * (all or none converted) emit z = 0 instead of dividing by zero —
    * the same guard in both engines. Sufficient statistics (n, successes
    * per cohort) are exact integers from one user-grain aggregate; z
    * runs them through ONE fixed double sequence floored to micro-units,
    * so both engines emit the identical BIGINT. One corpus scan, one
    * user-keyed aggregate, a 2-row rollup.
    */
  def conversionZTest(spark: SparkSession, dir: String): DataFrame = {
    val users = graft.core.Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 10L)
        .cast("long").as("converted"))
      .select(pmod(col("user_id"), lit(2)).as("cohort"), col("converted"))
    val g = users.groupBy("cohort")
      .agg(count(lit(1)).as("n"), sum("converted").as("k"))
    val a = g.filter(col("cohort") === 0)
      .select(col("n").as("n1"), col("k").as("k1"))
    val b = g.filter(col("cohort") === 1)
      .select(col("n").as("n2"), col("k").as("k2"))
    // One fixed double sequence over the four exact integers.
    val p1 = col("k1").cast("double") / col("n1").cast("double")
    val p2 = col("k2").cast("double") / col("n2").cast("double")
    val pp = (col("k1") + col("k2")).cast("double") /
      (col("n1") + col("n2")).cast("double")
    val zRaw = (p1 - p2) /
      sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n1").cast("double") + lit(1.0) / col("n2").cast("double")))
    val degenerate = (col("k1") + col("k2") === 0L) ||
      (col("k1") + col("k2") === col("n1") + col("n2"))
    val z = when(degenerate, lit(0.0)).otherwise(zRaw)
    a.crossJoin(b).select(
      col("n1"), col("k1"), col("n2"), col("k2"),
      floor(z * lit(1000000.0) + lit(0.5)).cast("long").as("z_micro"),
      (abs(z) >= lit(1.959964)).as("significant_05"))
  }

  private val conversionZTestSql =
    """WITH u AS (
      |  SELECT user_id % 2 AS cohort,
      |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 10
      |         THEN 1 ELSE 0 END AS converted
      |  FROM events GROUP BY user_id
      |), g AS (
      |  SELECT cohort, count(*) AS n, CAST(sum(converted) AS BIGINT) AS k
      |  FROM u GROUP BY 1
      |), ab AS (
      |  SELECT
      |    (SELECT n FROM g WHERE cohort = 0) AS n1,
      |    (SELECT k FROM g WHERE cohort = 0) AS k1,
      |    (SELECT n FROM g WHERE cohort = 1) AS n2,
      |    (SELECT k FROM g WHERE cohort = 1) AS k2
      |)
      |, zc AS (
      |  SELECT n1, k1, n2, k2,
      |    CASE WHEN k1 + k2 = 0 OR k1 + k2 = n1 + n2 THEN 0.0::DOUBLE
      |      ELSE ((k1::DOUBLE / n1::DOUBLE) - (k2::DOUBLE / n2::DOUBLE))
      |        / sqrt(((k1 + k2)::DOUBLE / (n1 + n2)::DOUBLE)
      |            * (1.0::DOUBLE - (k1 + k2)::DOUBLE / (n1 + n2)::DOUBLE)
      |            * (1.0::DOUBLE / n1::DOUBLE + 1.0::DOUBLE / n2::DOUBLE))
      |    END AS z
      |  FROM ab
      |)
      |SELECT n1, k1, n2, k2,
      |  CAST(floor(z * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS z_micro,
      |  abs(z) >= 1.959964::DOUBLE AS significant_05
      |FROM zc""".stripMargin

  // --------------------------------------------------------------- q167
  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013) —
    * the experimentation-platform companion of q163: adjust each user's
    * post-period metric by their PRE-period metric,
    * Y' = Y − θ·(X − X̄) with θ = cov(X,Y)/var(X), which shrinks metric
    * variance by exactly ρ² and makes A/B tests correspondingly more
    * sensitive. The pre/post boundary is the data-derived epoch-second
    * midpoint (deterministic integer), per-user metrics are integer
    * event counts, and the sufficient statistics (n, Σx, Σy, Σx², Σy²,
    * Σxy — the q99 shape) are exact BIGINTs from ONE user-grain
    * aggregate; θ and the variance-reduction ratio run through one
    * fixed double sequence floored to micro-units. One corpus scan, one
    * user-keyed aggregate, a one-row rollup.
    */
  def cupedVarianceReduction(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"))
    val bounds = ev.agg(min("es").as("lo"), max("es").as("hi"))
    val perUser = ev.crossJoin(broadcast(bounds))
      .select(col("user_id"),
        when(col("es") * 2 < col("lo") + col("hi"), 1L).otherwise(0L).as("pre"),
        when(col("es") * 2 >= col("lo") + col("hi"), 1L).otherwise(0L).as("post"))
      .groupBy("user_id")
      .agg(sum("pre").as("x"), sum("post").as("y"))
    val s = perUser.agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    // θ = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²tot); var reduction = ρ².
    val covNum = col("n").cast("double") * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val varXNum = col("n").cast("double") * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val varYNum = col("n").cast("double") * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    val theta = covNum / varXNum
    val rho2 = (covNum * covNum) / (varXNum * varYNum)
    s.select(col("n"), col("sx"), col("sy"), col("sxx"), col("syy"), col("sxy"),
      floor(theta * lit(1000000.0) + lit(0.5)).cast("long").as("theta_micro"),
      floor(rho2 * lit(1000000.0) + lit(0.5)).cast("long").as("var_reduction_ppm"))
  }

  private val cupedSql =
    """WITH ev AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
      |), b AS (SELECT min(es) AS lo, max(es) AS hi FROM ev),
      |pu AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN es * 2 < (SELECT lo + hi FROM b) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN es * 2 >= (SELECT lo + hi FROM b) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM ev GROUP BY 1
      |), s AS (
      |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy, CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM pu
      |)
      |SELECT n, sx, sy, sxx, syy, sxy,
      |  CAST(floor((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
      |    / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS theta_micro,
      |  CAST(floor(((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
      |      * (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE))
      |    / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
      |      * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS var_reduction_ppm
      |FROM s""".stripMargin

  // --------------------------------------------------------------- q179
  /** Kendall tau-b rank concordance — the pair-counting complement of
    * Spearman (q105): over all C(n,2) pairs of a per-(group, x) metric
    * table, count concordant, discordant, and tied pairs, and emit the
    * tie-corrected tau-b = (nc − nd) / √((n0 − n1)(n0 − n2)). Unlike
    * rank-based Spearman, every pair count is a pure integer and the
    * only float is the final √ — which IEEE requires to be correctly
    * rounded, so floor(τ·1e6 + ½) is cross-engine exact (the CUPED
    * floor discipline; negative τ rounds identically since both engines
    * run the same formula on the same doubles).
    *
    * Scale shape: the corpus-sized work is ONE hash aggregation to the
    * (group, week) metric table; the pair self-join runs on that
    * CALENDAR-BOUNDED series (n = weeks, not rows — it does not grow
    * with data volume), partitioned by group, so the quadratic term is
    * a constant ~n²/2 per group forever. Fact data is never pair-joined.
    */
  def kendallTauB(perX: DataFrame, groupCol: String, xCol: String,
                  aCol: String, bCol: String): DataFrame = {
    val l = perX.select(col(groupCol), col(xCol).as("x1"),
      col(aCol).as("a1"), col(bCol).as("b1"))
    val r = perX.select(col(groupCol), col(xCol).as("x2"),
      col(aCol).as("a2"), col(bCol).as("b2"))
    val pairs = l.join(r, Seq(groupCol)).filter(col("x1") < col("x2"))
    val da = col("a2") - col("a1")
    val db = col("b2") - col("b1")
    pairs
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n0"),
        sum(when(da * db > 0, 1L).otherwise(0L)).as("nc"),
        sum(when(da * db < 0, 1L).otherwise(0L)).as("nd"),
        sum(when(da === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(db === 0, 1L).otherwise(0L)).as("n2"))
      .withColumn("tau_b_micro",
        when((col("n0") > col("n1")) && (col("n0") > col("n2")),
          floor((col("nc") - col("nd")).cast("double")
            / sqrt((col("n0") - col("n1")).cast("double")
              * (col("n0") - col("n2")).cast("double"))
            * lit(1000000.0) + lit(0.5)).cast("long")))
  }

  /** Gated q179: weekly revenue-vs-order-count concordance per nation. */
  def revenueVolumeKendall(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("nation"),
        date_trunc("week", col("o_orderdate")).cast("date").as("week"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
        count(lit(1)).as("n_orders"))
    kendallTauB(weekly, "nation", "week", "cents", "n_orders")
      .select(col("nation"), col("n0"), col("nc"), col("nd"), col("n1"),
        col("n2"), col("tau_b_micro"))
  }

  private val revenueVolumeKendallSql =
    """WITH weekly AS (
      |  SELECT n.n_name AS nation,
      |    date_trunc('week', o.o_orderdate)::DATE AS week,
      |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents,
      |    count(*) AS n_orders
      |  FROM orders o
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n ON n.n_nationkey = c.c_nationkey
      |  GROUP BY 1, 2
      |),
      |pairs AS (
      |  SELECT l.nation,
      |    (r.cents - l.cents) AS da, (r.n_orders - l.n_orders) AS db
      |  FROM weekly l JOIN weekly r
      |    ON l.nation = r.nation AND l.week < r.week
      |),
      |s AS (
      |  SELECT nation, count(*) AS n0,
      |    sum(CASE WHEN da * db > 0 THEN 1 ELSE 0 END) AS nc,
      |    sum(CASE WHEN da * db < 0 THEN 1 ELSE 0 END) AS nd,
      |    sum(CASE WHEN da = 0 THEN 1 ELSE 0 END) AS n1,
      |    sum(CASE WHEN db = 0 THEN 1 ELSE 0 END) AS n2
      |  FROM pairs GROUP BY 1
      |)
      |SELECT nation, CAST(n0 AS BIGINT) AS n0, CAST(nc AS BIGINT) AS nc,
      |  CAST(nd AS BIGINT) AS nd, CAST(n1 AS BIGINT) AS n1,
      |  CAST(n2 AS BIGINT) AS n2,
      |  CASE WHEN n0 > n1 AND n0 > n2 THEN CAST(floor(
      |    (nc - nd)::DOUBLE
      |    / sqrt((n0 - n1)::DOUBLE * (n0 - n2)::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) END AS tau_b_micro
      |FROM s""".stripMargin

  // --------------------------------------------------------------- q183
  /** Population Stability Index — the industry-standard drift score a
    * model-monitoring pipeline computes between a reference window and
    * the current one: PSI = Σ_bins (pᵢ − qᵢ)·ln(pᵢ/qᵢ). Completes the
    * drift family (q107 location, q111 categorical, q116 shape, q163
    * rates, q108 JSD) with the score ops teams actually threshold
    * (<0.1 stable, >0.25 investigate).
    *
    * Determinism: bins are FIXED-WIDTH on integer cents (quantile bins
    * would need cross-engine edge agreement; fixed bins are standard
    * practice and engine-exact), shares are add-one smoothed — (nᵢ+1)/
    * (N+B) — so ln never sees 0, and each bin's term is floored to ppm
    * INDIVIDUALLY: per-bin terms are integers, so the segment total is
    * an order-independent integer sum, never a float reduction (every
    * (p−q)·ln(p/q) term is ≥ 0, so ppm flooring is monotone too).
    *
    * Scale shape: one fact scan → (segment, window, bin) hash aggregate
    * (fully partial); the PSI arithmetic runs on the B·segments-sized
    * result. Nothing corpus-sized crosses a window.
    */
  def psi(binned: DataFrame, groupCol: String, isRefCol: String,
          binCol: String, nBins: Int): DataFrame =
    psiFromCounts(binned
      .groupBy(col(groupCol), col(binCol).as("bin"))
      .agg(sum(when(col(isRefCol), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col(isRefCol), 1L).otherwise(0L)).as("n_cur")),
      groupCol, nBins)

  /** The PSI arithmetic over an already-aggregated (group, bin, n_ref,
    * n_cur) counts table — LITERALLY SHARED between the one-shot q183
    * gate and [[graft.warehouse.DriftState]]'s snapshot (the
    * RetrievalIndex shared-tail discipline: two paths, one kernel, zero
    * drift).
    */
  def psiFromCounts(counts: DataFrame, groupCol: String,
                    nBins: Int): DataFrame = {
    val w = Window.partitionBy(groupCol)
    counts
      .withColumn("tot_ref", sum(col("n_ref")).over(w))
      .withColumn("tot_cur", sum(col("n_cur")).over(w))
      .withColumn("p", (col("n_ref") + 1).cast("double")
        / (col("tot_ref") + nBins).cast("double"))
      .withColumn("q", (col("n_cur") + 1).cast("double")
        / (col("tot_cur") + nBins).cast("double"))
      .withColumn("term_ppm",
        floor((col("p") - col("q")) * log(col("p") / col("q")) * lit(1e6)
          + lit(0.5)).cast("long"))
      .drop("p", "q")
  }

  /** Gated q183: order-price PSI per market segment, reference = orders
    * before 1998, current = 1998 onward; ten fixed 50k-dollar bins.
    */
  def priceDriftPsi(spark: SparkSession, dir: String): DataFrame = {
    val binned = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        (year(col("o_orderdate")) < 1998).as("is_ref"),
        expr("least(CAST(round(o_totalprice * 100) AS BIGINT) div 5000000, 9)")
          .as("bin"))
    psi(binned, "segment", "is_ref", "bin", 10)
      .select(col("segment"), col("bin"), col("n_ref"), col("n_cur"),
        col("tot_ref"), col("tot_cur"), col("term_ppm"))
  }

  private val priceDriftPsiSql =
    """WITH binned AS (
      |  SELECT c.c_mktsegment AS segment,
      |    year(o.o_orderdate) < 1998 AS is_ref,
      |    least(CAST(round(o.o_totalprice * 100) AS BIGINT) // 5000000, 9)
      |      AS bin
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |),
      |counts AS (
      |  SELECT segment, bin,
      |    sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
      |    sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
      |  FROM binned GROUP BY 1, 2
      |),
      |tot AS (
      |  SELECT *, sum(n_ref) OVER (PARTITION BY segment) AS tot_ref,
      |    sum(n_cur) OVER (PARTITION BY segment) AS tot_cur
      |  FROM counts
      |)
      |SELECT segment, CAST(bin AS BIGINT) AS bin,
      |  CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
      |  CAST(tot_ref AS BIGINT) AS tot_ref, CAST(tot_cur AS BIGINT) AS tot_cur,
      |  CAST(floor(
      |    ((n_ref + 1)::DOUBLE / (tot_ref + 10)::DOUBLE
      |     - (n_cur + 1)::DOUBLE / (tot_cur + 10)::DOUBLE)
      |    * ln(((n_ref + 1)::DOUBLE / (tot_ref + 10)::DOUBLE)
      |         / ((n_cur + 1)::DOUBLE / (tot_cur + 10)::DOUBLE))
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS term_ppm
      |FROM tot""".stripMargin

  // --------------------------------------------------------------- q188
  /** Neyman-optimal sample allocation — when a fixed measurement budget
    * must be split across strata, sampling n_h ∝ N_h·S_h (stratum size ×
    * stratum spread) minimizes the estimator variance; proportional
    * allocation over-samples quiet strata and starves volatile ones.
    * The SUMS Σx / Σx² are exact BIGINT (per-row x² in whole dollars is
    * ≤ ~4·10¹¹, exact through millions of rows per stratum); the
    * determinant n·Σx² − (Σx)² grows ∝ n² with stratum-sized n, so —
    * the q195 discipline, which ScaleCheck's decade first caught there
    * and the sf0.1 bench caught here — it is NOT materialized as a
    * BIGINT but folded into the ONE fixed double sequence that produces
    * the per-stratum weight w = N·S. BIGINT→double casts, ·, −, / and √
    * are IEEE-correctly-rounded, so both engines produce the identical
    * integer after the +½ floor, and the final shares divide INTEGER
    * weights (order-independent sums; the q183 no-float-reduction
    * discipline). The `greatest(·, 0)` guard pins the cancellation edge
    * (a flat stratum's determinant is exactly 0 in both engines, but the
    * guard keeps √ total by construction under ANSI).
    *
    * Scale shape: one fact scan → strata-sized aggregate; everything
    * after runs on one row per stratum.
    */
  def neymanAllocation(perRow: DataFrame, stratumCol: String,
                       valueCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy()
    perRow
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("s"),
        sum(col(valueCol) * col(valueCol)).as("ss"))
      .filter(col("n") > 1)
      // w = N·S = sqrt(N²·var/(n(n−1))) = sqrt(n·(n·Σx²−(Σx)²)/(n−1)),
      // with the n²-growing determinant computed in double, never BIGINT.
      .withColumn("w_int",
        floor(sqrt(col("n").cast("double")
          * greatest(col("n").cast("double") * col("ss").cast("double")
            - col("s").cast("double") * col("s").cast("double"), lit(0.0))
          / (col("n") - 1).cast("double"))
          + lit(0.5)).cast("long"))
      .withColumn("w_sum", sum(col("w_int")).over(w))
      .withColumn("alloc", expr(s"($budget * w_int) div w_sum"))
      .drop("w_sum")
  }

  /** Gated q188: allocate 1,000 audit samples across market segments by
    * order-price spread (whole dollars).
    */
  def auditSampleAllocation(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        floor(col("o_totalprice")).cast("long").as("dollars"))
    neymanAllocation(rows, "segment", "dollars", 1000L)
      .select(col("segment"), col("n"), col("s"), col("ss"), col("w_int"),
        col("alloc"))
  }

  private val auditSampleAllocationSql =
    """WITH rows_ AS (
      |  SELECT c.c_mktsegment AS segment,
      |    CAST(floor(o.o_totalprice) AS BIGINT) AS v
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |),
      |s AS (
      |  SELECT segment, count(*) AS n, sum(v) AS s, sum(v * v) AS ss
      |  FROM rows_ GROUP BY 1 HAVING count(*) > 1
      |),
      |wgt AS (
      |  SELECT segment, n, s, ss,
      |    CAST(floor(sqrt(n::DOUBLE
      |      * greatest(n::DOUBLE * ss::DOUBLE - s::DOUBLE * s::DOUBLE,
      |                 0.0::DOUBLE)
      |      / (n - 1)::DOUBLE) + 0.5::DOUBLE) AS BIGINT) AS w_int
      |  FROM s
      |)
      |SELECT segment, CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS s,
      |  CAST(ss AS BIGINT) AS ss, w_int,
      |  CAST((1000 * w_int) // sum(w_int) OVER () AS BIGINT) AS alloc
      |FROM wgt""".stripMargin

  // --------------------------------------------------------------- q205
  /** One-way ANOVA F — the parametric member of the battery next to
    * [[mannWhitney]] (two-cohort, rank-based) and [[chiSquare]]
    * (category × category): "does the MEAN differ across k groups?",
    * partitioning total variance into between-group and within-group
    * sums of squares, F = (SSB/(k−1)) / (SSW/(N−k)).
    *
    * Exactness: per-group sufficient sums n/Σx/Σx² are exact BIGINT
    * (whole dollars — the q188 headroom discipline); each group's
    * ratio term Σx²ᵍ/nᵍ — the n²-growing piece — is ONE fixed double
    * sequence floored to an integer PER GROUP before summing (the q183
    * no-float-reduction discipline: integer sums are order-independent
    * where a double Σ of group terms would be reduction-order-
    * sensitive). SSB/SSW are then integer differences, and F/η² are
    * single fixed double sequences over those integers.
    *
    * Scale shape: one fact scan → k-group aggregate (fully partial) →
    * one k-row fold. Everything after the scan is group-cardinality-
    * sized.
    */
  def anovaF(perRow: DataFrame, groupCol: String, valueCol: String): DataFrame =
    perRow
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("s"),
        sum(col(valueCol) * col(valueCol)).as("ss"))
      .withColumn("tg", floor(col("s").cast("double") * col("s").cast("double")
        / col("n").cast("double") + lit(0.5)).cast("long"))
      .agg(count(lit(1)).as("k_groups"), sum("n").as("n_total"),
        sum("s").as("s_total"), sum("ss").as("ss_total"),
        sum("tg").as("tg_total"))
      .withColumn("ssb", col("tg_total")
        - floor(col("s_total").cast("double") * col("s_total").cast("double")
          / col("n_total").cast("double") + lit(0.5)).cast("long"))
      .withColumn("ssw", col("ss_total") - col("tg_total"))
      .withColumn("f_micro", floor(
        (col("ssb").cast("double") / (col("k_groups") - 1).cast("double"))
          / (col("ssw").cast("double")
            / (col("n_total") - col("k_groups")).cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("eta2_ppm", floor(col("ssb").cast("double")
        / (col("ssb") + col("ssw")).cast("double")
        * lit(1000000.0) + lit(0.5)).cast("long"))
      .select(col("k_groups"), col("n_total"), col("ssb"), col("ssw"),
        col("f_micro"), col("eta2_ppm"))

  /** Gated q205: does mean order spend (whole dollars) differ across
    * market segments? One row: F statistic in micro-units + η² in ppm.
    */
  def segmentSpendAnova(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        floor(col("o_totalprice")).cast("long").as("dollars"))
    anovaF(rows, "segment", "dollars")
  }

  private val segmentSpendAnovaSql =
    """WITH rows_ AS (
      |  SELECT c.c_mktsegment AS g,
      |    CAST(floor(o.o_totalprice) AS BIGINT) AS v
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |),
      |grp AS (
      |  SELECT g, count(*) AS n, sum(v) AS s, sum(v * v) AS ss
      |  FROM rows_ GROUP BY 1
      |),
      |tg AS (
      |  SELECT g, n, s, ss,
      |    CAST(floor(s::DOUBLE * s::DOUBLE / n::DOUBLE + 0.5::DOUBLE)
      |      AS BIGINT) AS tg
      |  FROM grp
      |),
      |tot AS (
      |  SELECT count(*) AS k_groups, sum(n) AS n_total, sum(s) AS s_total,
      |    sum(ss) AS ss_total, sum(tg) AS tg_total
      |  FROM tg
      |),
      |sq AS (
      |  SELECT k_groups, n_total,
      |    CAST(tg_total - CAST(floor(s_total::DOUBLE * s_total::DOUBLE
      |        / n_total::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS BIGINT) AS ssb,
      |    CAST(ss_total - tg_total AS BIGINT) AS ssw
      |  FROM tot
      |)
      |SELECT CAST(k_groups AS BIGINT) AS k_groups,
      |  CAST(n_total AS BIGINT) AS n_total, ssb, ssw,
      |  CAST(floor((ssb::DOUBLE / (k_groups - 1)::DOUBLE)
      |    / (ssw::DOUBLE / (n_total - k_groups)::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS f_micro,
      |  CAST(floor(ssb::DOUBLE / (ssb + ssw)::DOUBLE
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS eta2_ppm
      |FROM sq""".stripMargin

  // --------------------------------------------------------------- q204
  /** Mutual information between two categorical columns — the
    * information-theoretic complement of [[chiSquare]] (q111): where
    * chi-square answers "are these dependent at all?", MI answers "how
    * many nats does knowing one buy about the other?" — the standard
    * feature-selection and corpus-mixture diagnostic (a source column
    * that carries high MI with language means per-source sampling skews
    * the language mix). I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) over
    * OBSERVED cells (absent cells contribute exactly 0, so both engines
    * sum the same support).
    *
    * Exactness (the q183 PSI discipline): marginals and N are exact
    * BIGINT window sums over the cells frame; each cell's term is ONE
    * fixed double sequence over casts of those exact integers, floored
    * to integer PPM-nats; the statistic is then a sum of integers —
    * order-independent, engine-identical.
    *
    * Scale shape: the corpus collapses to its R×C contingency table in
    * one hash aggregation (fully partial); the window sums run on the
    * cells-sized frame. One scan, one cells-sized shuffle.
    */
  def mutualInformation(obs: DataFrame, xCol: String, yCol: String): DataFrame = {
    val wAll = Window.partitionBy()
    obs.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("n_xy"))
      .withColumn("n_x", sum("n_xy").over(Window.partitionBy("x")))
      .withColumn("n_y", sum("n_xy").over(Window.partitionBy("y")))
      .withColumn("n_tot", sum("n_xy").over(wAll))
      .withColumn("term_ppm", floor(
        col("n_xy").cast("double") / col("n_tot").cast("double")
          * log(col("n_xy").cast("double") * col("n_tot").cast("double")
            / (col("n_x").cast("double") * col("n_y").cast("double")))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("mi_ppm", sum("term_ppm").over(wAll))
  }

  /** Gated q204: how much does a document's source tell you about its
    * language? Per observed (source, lang) cell plus the corpus MI.
    */
  def sourceLangMi(spark: SparkSession, dir: String): DataFrame =
    mutualInformation(Tables.documents(spark, dir), "source", "lang")
      .select(col("x").as("source"), col("y").as("lang"), col("n_xy"),
        col("n_x"), col("n_y"), col("n_tot"), col("term_ppm"),
        col("mi_ppm"))

  private val sourceLangMiSql =
    """WITH cells AS (
      |  SELECT source AS x, lang AS y, count(*) AS n_xy
      |  FROM documents GROUP BY 1, 2
      |),
      |m AS (
      |  SELECT x, y, n_xy,
      |    sum(n_xy) OVER (PARTITION BY x) AS n_x,
      |    sum(n_xy) OVER (PARTITION BY y) AS n_y,
      |    sum(n_xy) OVER () AS n_tot
      |  FROM cells
      |),
      |t AS (
      |  SELECT x AS source, y AS lang, CAST(n_xy AS BIGINT) AS n_xy,
      |    CAST(n_x AS BIGINT) AS n_x, CAST(n_y AS BIGINT) AS n_y,
      |    CAST(n_tot AS BIGINT) AS n_tot,
      |    CAST(floor(n_xy::DOUBLE / n_tot::DOUBLE
      |      * ln(n_xy::DOUBLE * n_tot::DOUBLE
      |           / (n_x::DOUBLE * n_y::DOUBLE))
      |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS term_ppm
      |  FROM m
      |)
      |SELECT source, lang, n_xy, n_x, n_y, n_tot, term_ppm,
      |  CAST(sum(term_ppm) OVER () AS BIGINT) AS mi_ppm
      |FROM t""".stripMargin

  // --------------------------------------------------------------- q189
  /** Difference-in-differences — the workhorse quasi-experimental
    * estimator: when a change hits one cohort at a known time, the
    * treatment effect is (post_T − pre_T) − (post_C − pre_C), with the
    * control cohort's trend differencing out the seasonality both
    * cohorts share. Completes the experimentation family (q163 z-test,
    * q167 CUPED) with its observational member. All four cell means are
    * exact micro-unit integers (two-step division), so the DiD is an
    * exact integer difference — no float anywhere; the intervention
    * boundary is the deterministic epoch-midpoint date (the q167
    * discipline).
    *
    * Scale shape: one fact scan → 4-cell aggregate (fully partial);
    * the estimator reads four rows.
    */
  def diffInDiff(rows: DataFrame, treatedCol: String, postCol: String,
                 valueCol: String): DataFrame = {
    val w = Window.partitionBy()
    rows
      .groupBy(col(treatedCol).as("treated"), col(postCol).as("post"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .withColumn("mean_micro", expr(
        """(total div n) * 1000000
          | + (1000000 * (total - (total div n) * n)) div n""".stripMargin))
      .withColumn("did_micro",
        sum(when(col("treated") && col("post"), col("mean_micro"))
          .when(col("treated") && !col("post"), -col("mean_micro"))
          .when(!col("treated") && col("post"), -col("mean_micro"))
          .otherwise(col("mean_micro"))).over(w))
  }

  /** Gated q189: BUILDING-segment order spend vs all other segments,
    * pre/post the midpoint of the order-date span.
    */
  def segmentSpendDiD(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), to_date(col("o_orderdate")).as("d"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val bounds = o.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
    o.crossJoin(broadcast(bounds))
      .withColumn("cut", expr("date_add(lo, CAST(datediff(hi, lo) div 2 AS INT))"))
      .withColumn("treated", col("c_mktsegment") === "BUILDING")
      .withColumn("post", col("d") > col("cut"))
      .transform(df => diffInDiff(df, "treated", "post", "cents"))
      .select(col("treated"), col("post"), col("n"), col("total"),
        col("mean_micro"), col("did_micro"))
  }

  private val segmentSpendDiDSql =
    """WITH o AS (
      |  SELECT c.c_mktsegment, o.o_orderdate::DATE AS d,
      |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |),
      |b AS (SELECT min(d) AS lo, max(d) AS hi FROM o),
      |cells AS (
      |  SELECT o.c_mktsegment = 'BUILDING' AS treated,
      |    o.d > b.lo + CAST(date_diff('day', b.lo, b.hi) // 2 AS INTEGER)
      |      AS post,
      |    count(*) AS n, sum(cents) AS total
      |  FROM o CROSS JOIN b
      |  GROUP BY 1, 2
      |),
      |m AS (
      |  SELECT treated, post, n, total,
      |    (total // n) * 1000000
      |      + (1000000 * (total - (total // n) * n)) // n AS mean_micro
      |  FROM cells
      |)
      |SELECT treated, post, CAST(n AS BIGINT) AS n,
      |  CAST(total AS BIGINT) AS total,
      |  CAST(mean_micro AS BIGINT) AS mean_micro,
      |  CAST(sum(CASE WHEN treated = post THEN mean_micro
      |                ELSE -mean_micro END) OVER () AS BIGINT) AS did_micro
      |FROM m""".stripMargin

  // --------------------------------------------------------------- q192
  /** Hash-Poisson bootstrap confidence interval — the distributed form
    * of the bootstrap (Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams", Google 2012): instead of resampling rows
    * (which needs global coordination), each row draws a DETERMINISTIC
    * Poisson(1)-distributed weight per replicate from an md5 channel —
    * one scan computes all B replicate sums as a (replicate → weighted
    * sum) aggregate, and the CI is an order statistic over the B
    * replicate means. Everything is integer: the truncated-Poisson
    * inverse CDF maps h∈[0,1000) through fixed thresholds
    * (368/736/920/981 → weights 0,1,2,3,4), replicate means ride the
    * micro two-step division, and the 2.5%/97.5% bounds are the 3rd and
    * 98th smallest of B=100 integers (rank windows over a B-row frame).
    *
    * Scale shape: ONE corpus scan exploded ×B into a B-group aggregate
    * (fully partial, B bounded) — the replicate table is B rows forever;
    * the CI windows run on that metadata-sized frame.
    */
  def bootstrapMeanCi(rows: DataFrame, valueCol: String, idCol: String,
                      b: Int = 100): DataFrame = {
    val wAll = Window.partitionBy()
    val reps = rows
      .select(col(idCol).cast("string").as("id"), col(valueCol).as("v"),
        explode(sequence(lit(0), lit(b - 1))).as("rep"))
      .withColumn("h",
        conv(substring(md5(concat(lit("boot:"), col("id"), lit(":"),
          col("rep").cast("string")).cast("binary")), 1, 8), 16, 10)
          .cast("long") % 1000L)
      .withColumn("w",
        when(col("h") < 368, 0L).when(col("h") < 736, 1L)
          .when(col("h") < 920, 2L).when(col("h") < 981, 3L).otherwise(4L))
      .groupBy("rep")
      .agg(sum(col("w")).as("n_eff"), sum(col("w") * col("v")).as("wsum"))
      .filter(col("n_eff") > 0)
      .withColumn("mean_micro", expr(
        """(wsum div n_eff) * 1000000
          | + (1000000 * (wsum - (wsum div n_eff) * n_eff)) div n_eff"""
          .stripMargin))
    reps
      .withColumn("rk", rank().over(Window.orderBy(col("mean_micro"), col("rep"))))
      .withColumn("n_reps", count(lit(1)).over(wAll))
      .withColumn("ci_lo_micro",
        max(when(col("rk") === 3, col("mean_micro"))).over(wAll))
      .withColumn("ci_hi_micro",
        max(when(col("rk") === col("n_reps") - 2, col("mean_micro"))).over(wAll))
      .drop("rk")
  }

  /** Gated q192: bootstrap CI for mean document length (chars). */
  def docLengthBootstrap(spark: SparkSession, dir: String): DataFrame =
    bootstrapMeanCi(Tables.documents(spark, dir), "n_chars", "doc_id")
      .select(col("rep"), col("n_eff"), col("wsum"), col("mean_micro"),
        col("n_reps"), col("ci_lo_micro"), col("ci_hi_micro"))

  private val docLengthBootstrapSql =
    """WITH reps AS (
      |  SELECT d.doc_id, d.n_chars, r.rep,
      |    ('0x' || substr(md5('boot:' || CAST(d.doc_id AS VARCHAR) || ':' ||
      |      CAST(r.rep AS VARCHAR)), 1, 8))::BIGINT % 1000 AS h
      |  FROM documents d, (SELECT unnest(range(0, 100)) AS rep) r
      |),
      |ws AS (
      |  SELECT rep,
      |    CASE WHEN h < 368 THEN 0 WHEN h < 736 THEN 1 WHEN h < 920 THEN 2
      |         WHEN h < 981 THEN 3 ELSE 4 END AS w,
      |    n_chars AS v
      |  FROM reps
      |),
      |agg AS (
      |  SELECT rep, sum(w) AS n_eff, sum(w * v) AS wsum
      |  FROM ws GROUP BY 1 HAVING sum(w) > 0
      |),
      |m AS (
      |  SELECT rep, n_eff, wsum,
      |    (wsum // n_eff) * 1000000
      |      + (1000000 * (wsum - (wsum // n_eff) * n_eff)) // n_eff
      |      AS mean_micro
      |  FROM agg
      |),
      |rk AS (
      |  SELECT *, rank() OVER (ORDER BY mean_micro, rep) AS rk,
      |    count(*) OVER () AS n_reps
      |  FROM m
      |)
      |SELECT CAST(rep AS BIGINT) AS rep, CAST(n_eff AS BIGINT) AS n_eff,
      |  CAST(wsum AS BIGINT) AS wsum, CAST(mean_micro AS BIGINT) AS mean_micro,
      |  CAST(n_reps AS BIGINT) AS n_reps,
      |  CAST(max(CASE WHEN rk = 3 THEN mean_micro END) OVER () AS BIGINT)
      |    AS ci_lo_micro,
      |  CAST(max(CASE WHEN rk = n_reps - 2 THEN mean_micro END) OVER ()
      |    AS BIGINT) AS ci_hi_micro
      |FROM rk""".stripMargin

  // --------------------------------------------------------------- q193
  /** Empirical-Bayes rate shrinkage — the fix for "this user converted
    * 1-for-1, ship them as a 100% segment": blend each entity's raw rate
    * toward the GLOBAL rate with K pseudo-observations (beta-binomial
    * posterior mean), so thin entities shrink hard and thick ones barely
    * move. EXACT integer form via cross-multiplication:
    * shrunk_ppm = 1e6·(nₚ·totᵥ + K·totₚ) div (totᵥ·(nᵥ + K)) — the
    * global prior enters as the totₚ/totᵥ fraction without ever being
    * computed as a float. Headroom: the numerator rides DECIMAL(38,0)
    * because 1e6·nₚ·totᵥ crosses 2⁶³ once nₚ·totᵥ > ~9.2·10¹² (e.g.
    * ~9 200 per-user positives against 10⁹ total events — well inside
    * plausible corpora; an earlier doc here overstated the BIGINT bound
    * by ~1000×). Decimal keeps the identical truncating-division result
    * to 1e38 while DuckDB reaches the same values via HUGEINT
    * promotion; the decimal terms touch only the entity-grain rows, not
    * the corpus scan.
    *
    * Scale shape: one events scan → user-grain aggregate + two global
    * scalars (broadcast one-row frame); output is user-sized.
    */
  def ebShrunkRates(perEntity: DataFrame, nCol: String, posCol: String,
                    k: Int): DataFrame = {
    val tot = perEntity.agg(sum(col(nCol)).as("tot_n"),
      sum(col(posCol)).as("tot_pos"))
    perEntity.crossJoin(broadcast(tot))
      .withColumn("raw_ppm", expr(s"(1000000 * $posCol) div $nCol"))
      .withColumn("shrunk_ppm", expr(
        s"(1000000 * (CAST($posCol AS DECIMAL(38,0)) * tot_n + $k * tot_pos))" +
          s" div (CAST(tot_n AS DECIMAL(38,0)) * ($nCol + $k))"))
  }

  /** Gated q193: per-user view→purchase rate, shrunk with K=20. */
  def userConversionShrinkage(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
        .as("n_view"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchase"))
      .filter(col("n_view") > 0)
    ebShrunkRates(perUser, "n_view", "n_purchase", 20)
      .select(col("user_id"), col("n_view"), col("n_purchase"),
        col("raw_ppm"), col("shrunk_ppm"))
  }

  private val userConversionShrinkageSql =
    """WITH perUser AS (
      |  SELECT user_id,
      |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS n_purchase
      |  FROM events WHERE event_type IN ('view', 'purchase')
      |  GROUP BY 1 HAVING sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) > 0
      |),
      |tot AS (
      |  SELECT sum(n_view) AS tot_n, sum(n_purchase) AS tot_pos FROM perUser
      |)
      |SELECT user_id, CAST(n_view AS BIGINT) AS n_view,
      |  CAST(n_purchase AS BIGINT) AS n_purchase,
      |  CAST((1000000 * n_purchase) // n_view AS BIGINT) AS raw_ppm,
      |  CAST((1000000 * (n_purchase * tot_n + 20 * tot_pos))
      |    // (tot_n * (n_view + 20)) AS BIGINT) AS shrunk_ppm
      |FROM perUser CROSS JOIN tot""".stripMargin

  // --------------------------------------------------------------- q197
  /** Direct standardization — the epidemiologist's fix for confounded
    * group comparisons: segment A's average order looks bigger than B's,
    * but A skews toward URGENT orders, which run bigger everywhere. Re-
    * weight each group's per-stratum means by a COMMON standard
    * population (the global stratum mix) and the composition effect
    * cancels, leaving the real group difference. The integer form:
    * per-stratum means in micro (two-step division), then
    * std_micro = Σ_h w_h·mean_{g,h} div Σ_h w_h with the GLOBAL stratum
    * counts as weights — per-term products exact, the sum an
    * order-independent integer reduction (truncate-before-weight is the
    * documented convention; the ±1 micro it can move is far under any
    * decision threshold). Groups missing a stratum standardize over
    * their observed strata (their weight sum shrinks accordingly).
    *
    * Scale shape: one fact scan → (group, stratum) aggregate; weights
    * derive from the same aggregate (stratum-partitioned window); the
    * final rollup is groups-sized.
    */
  def standardizedMeans(rows: DataFrame, groupCol: String, stratumCol: String,
                        valueCol: String): DataFrame = {
    val wStratum = Window.partitionBy(stratumCol)
    rows
      .groupBy(col(groupCol), col(stratumCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .withColumn("w", sum(col("n")).over(wStratum))
      .withColumn("mean_micro", expr(
        """(total div n) * 1000000
          | + (1000000 * (total - (total div n) * n)) div n""".stripMargin))
      .groupBy(col(groupCol))
      // wm_sum rides DECIMAL(38,0): per-term w·mean_micro is ~5e18 at
      // TPC-H sf1 (stratum count ~3e5 × mean_micro ~1.5e13) and the sum
      // crosses 2^63 one decade above the bench floor — BIGINT would
      // ANSI-throw there while DuckDB promotes sum(BIGINT) to HUGEINT.
      // Decimal keeps the same exact integer semantics to 1e38, and the
      // input to THIS aggregate is (group,stratum)-sized, so the decimal
      // arithmetic never touches a corpus-sized row stream.
      .agg(sum("n").as("n"), sum("total").as("total"),
        sum(col("w")).as("w_sum"),
        sum(col("w").cast("decimal(38,0)") * col("mean_micro"))
          .as("wm_sum"))
      .withColumn("crude_micro", expr(
        """(total div n) * 1000000
          | + (1000000 * (total - (total div n) * n)) div n""".stripMargin))
      .withColumn("std_micro", expr("wm_sum div w_sum"))
      .drop("wm_sum")
  }

  /** Gated q197: priority-standardized mean order price per segment. */
  def segmentStandardizedSpend(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("priority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    standardizedMeans(rows, "segment", "priority", "cents")
      .select(col("segment"), col("n"), col("total"), col("w_sum"),
        col("crude_micro"), col("std_micro"))
  }

  private val segmentStandardizedSpendSql =
    """WITH rows_ AS (
      |  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
      |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |),
      |gh AS (
      |  SELECT segment, priority, count(*) AS n, sum(cents) AS total
      |  FROM rows_ GROUP BY 1, 2
      |),
      |ww AS (
      |  SELECT *, sum(n) OVER (PARTITION BY priority) AS w,
      |    (total // n) * 1000000
      |      + (1000000 * (total - (total // n) * n)) // n AS mean_micro
      |  FROM gh
      |)
      |SELECT segment, CAST(sum(n) AS BIGINT) AS n,
      |  CAST(sum(total) AS BIGINT) AS total,
      |  CAST(sum(w) AS BIGINT) AS w_sum,
      |  CAST((sum(total) // sum(n)) * 1000000
      |    + (1000000 * (sum(total) - (sum(total) // sum(n)) * sum(n)))
      |      // sum(n) AS BIGINT) AS crude_micro,
      |  CAST(sum(w * mean_micro) // sum(w) AS BIGINT) AS std_micro
      |FROM ww GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- q201
  /** Sequential probability ratio test (SPRT) trace — Wald's
    * early-stopping monitor, the thing a fixed-horizon z-test (q163)
    * cannot do: watch the cumulative log-likelihood ratio day by day and
    * stop the moment the evidence crosses a boundary, with error rates
    * still controlled. For Bernoulli H₀: p=p₀ vs H₁: p=p₁ the day's
    * increment is n_pos·ln(p₁/p₀) + n_neg·ln((1−p₁)/(1−p₀)) — and both
    * ln CONSTANTS are computed ONCE in Scala, floored to micro, and
    * interpolated as integer literals into BOTH the Spark plan and the
    * oracle SQL, so the whole trace is integer arithmetic with zero
    * cross-engine ln calls. Boundaries ±ln((1−β)/α) at α=β=0.05.
    *
    * Scale shape: one events scan → day-grain aggregate → one
    * time-ordered prefix window over the calendar-bounded trace.
    */
  def sprtTrace(daily: DataFrame, dayCol: String, nCol: String,
                posCol: String, p0: Double, p1: Double,
                alpha: Double): DataFrame = {
    val l1 = math.floor(math.log(p1 / p0) * 1e6 + 0.5).toLong
    val l0 = math.floor(math.log((1 - p1) / (1 - p0)) * 1e6 + 0.5).toLong
    val bound = math.floor(math.log((1 - alpha) / alpha) * 1e6 + 0.5).toLong
    val wPre = Window.orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("llr_day_micro",
        col(posCol) * lit(l1) + (col(nCol) - col(posCol)) * lit(l0))
      .withColumn("cum_llr_micro", sum(col("llr_day_micro")).over(wPre))
      .withColumn("decision",
        when(col("cum_llr_micro") >= bound, "accept_h1")
          .when(col("cum_llr_micro") <= -bound, "accept_h0")
          .otherwise("continue"))
  }

  /** Gated q201: daily purchase-share SPRT (p₀=0.18 vs p₁=0.22). */
  def conversionSprt(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_obs"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_pos"))
    sprtTrace(daily, "day", "n_obs", "n_pos", p0 = 0.18, p1 = 0.22,
      alpha = 0.05)
      .select(col("day"), col("n_obs"), col("n_pos"), col("llr_day_micro"),
        col("cum_llr_micro"), col("decision"))
  }

  private val conversionSprtSql = {
    val l1 = math.floor(math.log(0.22 / 0.18) * 1e6 + 0.5).toLong
    val l0 = math.floor(math.log(0.78 / 0.82) * 1e6 + 0.5).toLong
    val bound = math.floor(math.log(0.95 / 0.05) * 1e6 + 0.5).toLong
    s"""WITH daily AS (
       |  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_obs,
       |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_pos
       |  FROM events WHERE event_type IN ('view', 'purchase')
       |  GROUP BY 1
       |),
       |t AS (
       |  SELECT day, n_obs, n_pos,
       |    n_pos * ($l1) + (n_obs - n_pos) * ($l0) AS llr_day_micro
       |  FROM daily
       |),
       |c AS (
       |  SELECT *, sum(llr_day_micro) OVER (ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_llr_micro
       |  FROM t
       |)
       |SELECT day, CAST(n_obs AS BIGINT) AS n_obs,
       |  CAST(n_pos AS BIGINT) AS n_pos,
       |  CAST(llr_day_micro AS BIGINT) AS llr_day_micro,
       |  CAST(cum_llr_micro AS BIGINT) AS cum_llr_micro,
       |  CASE WHEN cum_llr_micro >= $bound THEN 'accept_h1'
       |       WHEN cum_llr_micro <= -$bound THEN 'accept_h0'
       |       ELSE 'continue' END AS decision
       |FROM c""".stripMargin
  }

  // --------------------------------------------------------------- q214
  /** Kruskal–Wallis H — the k-sample rank test completing the battery:
    * [[mannWhitney]] compares TWO cohorts by ranks, [[anovaF]] compares
    * k group MEANS parametrically; this is "do the k distributions
    * differ at all?" on ranks, robust to the skew that warehouse money
    * columns always carry. H = 12/(N(N+1))·Σ_g R_g²/n_g − 3(N+1) with
    * AVERAGE ranks over ties and the standard tie correction
    * C = 1 − Σ_v(t_v³−t_v)/(N³−N), reported as H and H/C.
    *
    * Rank exactness rides the q173 doubled-rank trick lifted to the
    * VALUE DOMAIN: per distinct value v, rank2(v) = 2·(rows below) +
    * t_v + 1 (= 2·avg-rank, always an integer), so the per-group rank
    * sum R2_g = Σ_v n_{g,v}·rank2(v) is exact BIGINT (≤ 2N², under 2⁶³
    * through N ≈ 2·10⁹ rows). The n²-growing ratio R2_g²/n_g follows the
    * [[anovaF]] discipline — ONE fixed double sequence per group floored
    * to DECIMAL(38,0) (DuckDB reaches the identical integer via the same
    * double), summed order-independently; tie cubes ride DECIMAL(38,0)
    * end to end. H itself is then a single fixed double sequence over
    * those exact integers, floored to micro.
    *
    * Scale shape — the reason this is not "ntile(N)": rank statistics
    * over ONE global order would need a corpus sort, the q190 anti-
    * pattern. Instead the corpus collapses to (group, value) cells in
    * one fully-partial hash aggregate; every window after that runs on
    * the VALUE-DOMAIN frame (whole dollars — bounded by the price
    * domain, ~6·10⁵ rows at ANY corpus scale), so the only
    * single-partition exchange carries a domain-bounded input, exactly
    * the q190 rationale. One corpus scan total.
    */
  def kruskalWallis(perRow: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    // cells is domain-bounded (k × value domain); localCheckpoint severs
    // the lineage so the corpus is scanned ONCE even though cells feeds
    // both the value-domain frame and the join probe (the q210 marker
    // discipline — without it Spark replays the corpus aggregate per use).
    val cells = perRow
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("n_gv"))
      .localCheckpoint()
    val wBelow = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // tie_sum rides the SAME domain frame as the rank window (a second
    // whole-frame window, not a second aggregation lineage) so the
    // corpus is scanned once, not re-derived for the tie term.
    val vt = cells.groupBy(col("v")).agg(sum("n_gv").as("t_v"))
      .withColumn("rank2",
        coalesce(sum("t_v").over(wBelow), lit(0L)) * 2L + col("t_v") + 1L)
      .withColumn("tie_sum", sum(col("t_v").cast("decimal(38,0)")
        * col("t_v") * col("t_v") - col("t_v"))
        .over(Window.partitionBy()))
    cells.join(vt, Seq("v"))
      .groupBy(col("g"))
      .agg(sum("n_gv").as("n_g"),
        sum(col("n_gv") * col("rank2")).as("r2_g"),
        max("tie_sum").as("tie_sum"))
      .withColumn("term_g", floor(col("r2_g").cast("double")
        * col("r2_g").cast("double") / col("n_g").cast("double")
        + lit(0.5)).cast("decimal(38,0)"))
      .agg(count(lit(1)).as("k_groups"), sum("n_g").as("n_total"),
        sum("term_g").as("s2"), max("tie_sum").as("tie_sum"))
      .withColumn("h_micro", floor(
        (lit(3.0) * col("s2").cast("double")
          / (col("n_total").cast("double") * (col("n_total").cast("double") + lit(1.0)))
          - lit(3.0) * (col("n_total").cast("double") + lit(1.0)))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("hc_micro", floor(
        (lit(3.0) * col("s2").cast("double")
          / (col("n_total").cast("double") * (col("n_total").cast("double") + lit(1.0)))
          - lit(3.0) * (col("n_total").cast("double") + lit(1.0)))
          / (lit(1.0) - col("tie_sum").cast("double")
            / (col("n_total").cast("double") * col("n_total").cast("double")
              * col("n_total").cast("double") - col("n_total").cast("double")))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .select(col("k_groups"), col("n_total"), col("h_micro"),
        col("hc_micro"))
  }

  /** Gated q214: do the k market segments draw order spend (whole
    * dollars — the domain-bounding unit) from the same distribution?
    * One row: H and tie-corrected H/C in micro-units. Same fixture as
    * q205's ANOVA, so a reviewer can read the parametric and rank
    * answers side by side.
    */
  def segmentSpendKruskal(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        floor(col("o_totalprice")).cast("long").as("dollars"))
    kruskalWallis(rows, "segment", "dollars")
  }

  private val segmentSpendKruskalSql =
    """WITH rows_ AS (
      |  SELECT c.c_mktsegment AS g,
      |    CAST(floor(o.o_totalprice) AS BIGINT) AS v
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |),
      |cells AS (
      |  SELECT g, v, count(*) AS n_gv FROM rows_ GROUP BY 1, 2
      |),
      |vt AS (
      |  SELECT v, sum(n_gv) AS t_v FROM cells GROUP BY 1
      |),
      |vr AS (
      |  SELECT v, t_v,
      |    coalesce(sum(t_v) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
      |      + t_v + 1 AS rank2,
      |    sum(t_v::HUGEINT * t_v * t_v - t_v) OVER () AS tie_sum
      |  FROM vt
      |),
      |grp AS (
      |  SELECT c.g, sum(c.n_gv) AS n_g, sum(c.n_gv * vr.rank2) AS r2_g,
      |    max(vr.tie_sum) AS tie_sum
      |  FROM cells c JOIN vr ON vr.v = c.v
      |  GROUP BY 1
      |),
      |tg AS (
      |  SELECT g, n_g, r2_g, tie_sum,
      |    CAST(floor(r2_g::DOUBLE * r2_g::DOUBLE / n_g::DOUBLE
      |      + 0.5::DOUBLE) AS HUGEINT) AS term_g
      |  FROM grp
      |),
      |tot AS (
      |  SELECT count(*) AS k_groups, sum(n_g) AS n_total, sum(term_g) AS s2,
      |    max(tie_sum) AS tie_sum
      |  FROM tg
      |)
      |SELECT CAST(k_groups AS BIGINT) AS k_groups,
      |  CAST(n_total AS BIGINT) AS n_total,
      |  CAST(floor(
      |    (3.0::DOUBLE * s2::DOUBLE
      |      / (n_total::DOUBLE * (n_total::DOUBLE + 1.0::DOUBLE))
      |      - 3.0::DOUBLE * (n_total::DOUBLE + 1.0::DOUBLE))
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS h_micro,
      |  CAST(floor(
      |    (3.0::DOUBLE * s2::DOUBLE
      |      / (n_total::DOUBLE * (n_total::DOUBLE + 1.0::DOUBLE))
      |      - 3.0::DOUBLE * (n_total::DOUBLE + 1.0::DOUBLE))
      |    / (1.0::DOUBLE - tie_sum::DOUBLE
      |      / (n_total::DOUBLE * n_total::DOUBLE * n_total::DOUBLE
      |         - n_total::DOUBLE))
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS hc_micro
      |FROM tot""".stripMargin

  // --------------------------------------------------------------- q217
  /** Lorenz concentration deciles — the inequality table next to q158's
    * Gini scalar: rank customers by total spend descending, cut into
    * ten equal-population tiles, and report each tile's spend share and
    * the cumulative capture — "the top 10% of customers carry X% of
    * revenue" as a readable table rather than one coefficient.
    *
    * Ranking rides [[ModelEval.distributedNtile]] (the q190 machinery):
    * the tile key is WHOLE DOLLARS of customer spend (a scale-free
    * domain — TPC-H per-customer totals live in a fixed dollar range at
    * any SF) with custkey tie-break, so the only single-partition
    * exchange carries the dollar domain, never the customer table.
    * Spend itself stays exact cents; shares are exact truncating ppm.
    *
    * Scale shape: orders scan → customer-grain hash aggregate →
    * distributed ntile over the dollar domain → 10-group aggregate →
    * 10-row frame windows.
    */
  def lorenzDeciles(perEntity: DataFrame, valueCol: String,
                    idCol: String): DataFrame = {
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ModelEval.distributedNtile(
        perEntity.withColumn("tile_key", expr(s"$valueCol div 100")),
        "tile_key", idCol, 10)
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("cents"))
      .withColumn("tot_cents", sum("cents").over(wAll))
      .withColumn("cum_cents", sum("cents").over(wCum))
      // 1e6·cents crosses 2⁶³ once corpus revenue passes ~$9·10¹⁰, so
      // the share numerators ride DECIMAL(38,0) (DuckDB's sum() is
      // already HUGEINT there) — exact integer semantics to 1e38, on a
      // 10-row frame.
      .withColumn("share_ppm", expr(
        "CAST((CAST(cents AS DECIMAL(38,0)) * 1000000) div tot_cents AS BIGINT)"))
      .withColumn("cum_share_ppm", expr(
        "CAST((CAST(cum_cents AS DECIMAL(38,0)) * 1000000) div tot_cents AS BIGINT)"))
      .select(col("decile"), col("n"), col("cents"), col("cum_cents"),
        col("share_ppm"), col("cum_share_ppm"))
  }

  /** Gated q217: revenue concentration across customers. */
  def customerSpendLorenz(spark: SparkSession, dir: String): DataFrame =
    lorenzDeciles(
      Tables.orders(spark, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents")),
      "cents", "o_custkey")

  private val customerSpendLorenzSql =
    """WITH per AS (
      |  SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |    AS cents
      |  FROM orders GROUP BY 1
      |),
      |d AS (
      |  SELECT cents,
      |    ntile(10) OVER (ORDER BY cents // 100 DESC, o_custkey) AS decile
      |  FROM per
      |),
      |g AS (
      |  SELECT decile, count(*) AS n, sum(cents) AS cents
      |  FROM d GROUP BY 1
      |),
      |c AS (
      |  SELECT *, sum(cents) OVER () AS tot_cents,
      |    sum(cents) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
      |  FROM g
      |)
      |SELECT CAST(decile AS INTEGER) AS decile, CAST(n AS BIGINT) AS n,
      |  CAST(cents AS BIGINT) AS cents, CAST(cum_cents AS BIGINT) AS cum_cents,
      |  CAST((1000000 * cents) // tot_cents AS BIGINT) AS share_ppm,
      |  CAST((1000000 * cum_cents) // tot_cents AS BIGINT) AS cum_share_ppm
      |FROM c""".stripMargin

  // --------------------------------------------------------------- q221
  /** Cochran–Armitage trend test — the ORDERED-category member of the
    * dependence battery: chi-square (q111) asks "are category and
    * outcome associated at all?" and burns power on non-monotone
    * patterns; when the categories carry an ordering (priority bands,
    * quality deciles, dose tiers) the one-df trend statistic
    * T = Σ sᵢ(rᵢ − nᵢR/N), Var = R(N−R)/N²·(Σsᵢ²nᵢ − (Σsᵢnᵢ)²/N)
    * is the right question: "does the POSITIVE RATE move with the
    * order?".
    *
    * Exactness: per-category nᵢ/rᵢ and the score-weighted sums
    * Σsr/Σsn/Σs²n are exact BIGINT (s ≤ k keeps every term linear in
    * N); z is ONE fixed double sequence over those integers, floored to
    * micro and attached to every category row (the q204 convention), so
    * the table reads rates AND the verdict together. Degenerate inputs
    * (all-positive, all-negative, or a single category) report null z.
    *
    * Scale shape: one fact scan → k-category hash aggregate →
    * k-row frame windows. Nothing corpus-sized past the scan.
    */
  def cochranArmitage(rows: DataFrame, scoreCol: String,
                      positiveCol: String): DataFrame = {
    val wAll = Window.partitionBy()
    val z = {
      val (nD, rD) = (col("n_tot").cast("double"), col("r_tot").cast("double"))
      val (srD, snD, ssnD) = (col("sr").cast("double"),
        col("sn").cast("double"), col("ssn").cast("double"))
      val t = srD - rD * snD / nD
      val v = rD * (nD - rD) / (nD * nD) * (ssnD - snD * snD / nD)
      floor(t / sqrt(v) * lit(1000000.0) + lit(0.5)).cast("long")
    }
    rows
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n_i"),
        sum(when(col(positiveCol), 1L).otherwise(0L)).as("r_i"))
      .withColumn("rate_ppm", expr("(1000000 * r_i) div n_i"))
      .withColumn("n_tot", sum("n_i").over(wAll))
      .withColumn("r_tot", sum("r_i").over(wAll))
      .withColumn("sr", sum(col("s") * col("r_i")).over(wAll))
      .withColumn("sn", sum(col("s") * col("n_i")).over(wAll))
      .withColumn("ssn", sum(col("s") * col("s") * col("n_i")).over(wAll))
      .withColumn("k_cats", count(lit(1)).over(wAll))
      .withColumn("trend_z_micro",
        when(col("r_tot") > 0 && col("r_tot") < col("n_tot")
          && col("k_cats") > 1, z))
      .select(col("s"), col("n_i"), col("r_i"), col("rate_ppm"),
        col("trend_z_micro"))
  }

  /** Gated q221: does the big-order rate (≥ $150k) trend across the five
    * ordered priority bands?
    */
  def priorityBigOrderTrend(spark: SparkSession, dir: String): DataFrame =
    cochranArmitage(
      Tables.orders(spark, dir).select(
        substring(col("o_orderpriority"), 1, 1).cast("long").as("prio"),
        (col("o_totalprice") >= 150000.0).as("big")),
      "prio", "big")

  private val priorityTrendSql =
    """WITH rows_ AS (
      |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS s,
      |    o_totalprice >= 150000 AS big
      |  FROM orders
      |),
      |g AS (
      |  SELECT s, count(*) AS n_i,
      |    sum(CASE WHEN big THEN 1 ELSE 0 END) AS r_i
      |  FROM rows_ GROUP BY 1
      |),
      |w AS (
      |  SELECT *, sum(n_i) OVER () AS n_tot, sum(r_i) OVER () AS r_tot,
      |    sum(s * r_i) OVER () AS sr, sum(s * n_i) OVER () AS sn,
      |    sum(s * s * n_i) OVER () AS ssn, count(*) OVER () AS k_cats
      |  FROM g
      |)
      |SELECT s, CAST(n_i AS BIGINT) AS n_i, CAST(r_i AS BIGINT) AS r_i,
      |  CAST((1000000 * r_i) // n_i AS BIGINT) AS rate_ppm,
      |  CASE WHEN r_tot > 0 AND r_tot < n_tot AND k_cats > 1 THEN
      |    CAST(floor(
      |      (sr::DOUBLE - r_tot::DOUBLE * sn::DOUBLE / n_tot::DOUBLE)
      |      / sqrt(r_tot::DOUBLE * (n_tot::DOUBLE - r_tot::DOUBLE)
      |        / (n_tot::DOUBLE * n_tot::DOUBLE)
      |        * (ssn::DOUBLE - sn::DOUBLE * sn::DOUBLE / n_tot::DOUBLE))
      |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT)
      |    END AS trend_z_micro
      |FROM w""".stripMargin

  // --------------------------------------------------------------- q226
  /** Cochran–Mantel–Haenszel test + Mantel–Haenszel pooled odds ratio —
    * the stratified member of the causal battery: q189's DiD removes a
    * TIME confounder, q197's standardization removes a COMPOSITION
    * confounder from means; CMH asks "does treatment associate with a
    * binary outcome at all, POOLING evidence within strata?" — immune
    * to the Simpson's-paradox reversal a collapsed 2×2 invites. Per
    * stratum i: a_i observed treated-positives, E[a_i] = n1_i·m1_i/N_i,
    * Var_i = n1_i·n0_i·m1_i·m0_i/(N_i²(N_i−1));
    * CMH = (Σa − ΣE)²/ΣVar (χ²₁), OR_MH = Σ(a_i·d_i/N_i)/Σ(b_i·c_i/N_i).
    *
    * Exactness: the 2×2 cells are exact BIGINT from one per-stratum
    * aggregate; each stratum's E/Var/OR terms are ONE fixed double
    * sequence floored to integer micro PER STRATUM (the q197
    * truncate-before-weight convention — documented ±1-micro-per-stratum
    * truncation), so every cross-stratum reduction is an integer sum,
    * order-independent in both engines; no integer product of two
    * corpus-sized counts is ever formed (the per-stratum terms go
    * through doubles, immune to the n1·m1 BIGINT overflow at ~3·10⁹
    * rows/stratum). The OR ratio rides DECIMAL(38,0) (the q217 widen).
    * Degenerate strata (N < 2) contribute zero, structurally.
    *
    * Scale shape: one corpus scan → strata-sized hash aggregate →
    * strata-frame windows. The gated face is the q218 uplift fixture
    * stratified by source, so CMH and Qini read the same experiment.
    */
  def cmhTest(rows: DataFrame, stratumCol: String, treatedCol: String,
              outcomeCol: String): DataFrame = {
    val wAll = Window.partitionBy()
    val (aD, bD, cD, dD) = (col("a").cast("double"), col("b").cast("double"),
      col("c").cast("double"), col("d").cast("double"))
    val nD = aD + bD + cD + dD
    rows
      .groupBy(col(stratumCol).as("stratum"))
      .agg(
        sum(when(col(treatedCol) && col(outcomeCol), 1L).otherwise(0L))
          .as("a"),
        sum(when(col(treatedCol) && !col(outcomeCol), 1L).otherwise(0L))
          .as("b"),
        sum(when(!col(treatedCol) && col(outcomeCol), 1L).otherwise(0L))
          .as("c"),
        sum(when(!col(treatedCol) && !col(outcomeCol), 1L).otherwise(0L))
          .as("d"))
      .withColumn("e_micro", when(nD > 1,
        floor((aD + bD) * (aD + cD) / nD * lit(1000000.0) + lit(0.5))
          .cast("long")).otherwise(0L))
      .withColumn("var_micro", when(nD > 1,
        floor((aD + bD) * (cD + dD) * (aD + cD) * (bD + dD)
          / (nD * nD * (nD - lit(1.0))) * lit(1000000.0) + lit(0.5))
          .cast("long")).otherwise(0L))
      .withColumn("ad_micro", when(nD > 0,
        floor(aD * dD / nD * lit(1000000.0) + lit(0.5)).cast("long"))
        .otherwise(0L))
      .withColumn("bc_micro", when(nD > 0,
        floor(bD * cD / nD * lit(1000000.0) + lit(0.5)).cast("long"))
        .otherwise(0L))
      .withColumn("sum_a", sum("a").over(wAll))
      .withColumn("sum_e_micro", sum("e_micro").over(wAll))
      .withColumn("sum_var_micro", sum("var_micro").over(wAll))
      .withColumn("sum_ad_micro", sum("ad_micro").over(wAll))
      .withColumn("sum_bc_micro", sum("bc_micro").over(wAll))
      .withColumn("cmh_micro", when(col("sum_var_micro") > 0, floor(
        (col("sum_a").cast("double") * lit(1000000.0)
          - col("sum_e_micro").cast("double"))
          * (col("sum_a").cast("double") * lit(1000000.0)
            - col("sum_e_micro").cast("double"))
          / (col("sum_var_micro").cast("double") * lit(1000000.0))
          * lit(1000000.0) + lit(0.5)).cast("long")))
      .withColumn("or_mh_micro", when(col("sum_bc_micro") > 0, expr(
        """CAST((CAST(sum_ad_micro AS DECIMAL(38,0)) * 1000000)
          | div sum_bc_micro AS BIGINT)""".stripMargin)))
      .select(col("stratum"), col("a"), col("b"), col("c"), col("d"),
        col("e_micro"), col("var_micro"), col("cmh_micro"),
        col("or_mh_micro"))
  }

  /** Gated q226: the q218 synthetic uplift experiment (independent
    * treatment channel, +10% boost for treated), stratified by source.
    */
  def sourceStratifiedCmh(spark: SparkSession, dir: String): DataFrame = {
    def h(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long") % 1000000L
    val rows = Tables.documents(spark, dir).select(
        col("source"),
        h(col("doc_id").cast("string")).as("score_micro"),
        h(concat(lit("lbl:"), col("doc_id").cast("string"))).as("u"),
        (h(concat(lit("trt:"), col("doc_id").cast("string"))) < 500000L)
          .as("treated"))
      .withColumn("outcome", col("u") < when(col("treated"),
        least(col("score_micro") + 100000L, lit(1000000L)))
        .otherwise(col("score_micro")))
    cmhTest(rows, "source", "treated", "outcome")
  }

  private val cmhSql =
    """WITH rows_ AS (
      |  SELECT source,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS score_micro,
      |    ('0x' || substr(md5('lbl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS u,
      |    ('0x' || substr(md5('trt:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 < 500000 AS treated
      |  FROM documents
      |),
      |o AS (
      |  SELECT source, treated,
      |    u < CASE WHEN treated
      |      THEN least(score_micro + 100000, 1000000)
      |      ELSE score_micro END AS outcome
      |  FROM rows_
      |),
      |t AS (
      |  SELECT source AS stratum,
      |    sum(CASE WHEN treated AND outcome THEN 1 ELSE 0 END) AS a,
      |    sum(CASE WHEN treated AND NOT outcome THEN 1 ELSE 0 END) AS b,
      |    sum(CASE WHEN NOT treated AND outcome THEN 1 ELSE 0 END) AS c,
      |    sum(CASE WHEN NOT treated AND NOT outcome THEN 1 ELSE 0 END) AS d
      |  FROM o GROUP BY 1
      |),
      |m AS (
      |  SELECT stratum, a, b, c, d,
      |    CASE WHEN a + b + c + d > 1 THEN CAST(floor(
      |      (a + b)::DOUBLE * (a + c)::DOUBLE / (a + b + c + d)::DOUBLE
      |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) ELSE 0 END
      |      AS e_micro,
      |    CASE WHEN a + b + c + d > 1 THEN CAST(floor(
      |      (a + b)::DOUBLE * (c + d)::DOUBLE * (a + c)::DOUBLE
      |      * (b + d)::DOUBLE
      |      / ((a + b + c + d)::DOUBLE * (a + b + c + d)::DOUBLE
      |         * ((a + b + c + d)::DOUBLE - 1.0::DOUBLE))
      |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) ELSE 0 END
      |      AS var_micro,
      |    CASE WHEN a + b + c + d > 0 THEN CAST(floor(
      |      a::DOUBLE * d::DOUBLE / (a + b + c + d)::DOUBLE
      |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) ELSE 0 END
      |      AS ad_micro,
      |    CASE WHEN a + b + c + d > 0 THEN CAST(floor(
      |      b::DOUBLE * c::DOUBLE / (a + b + c + d)::DOUBLE
      |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) ELSE 0 END
      |      AS bc_micro
      |  FROM t
      |),
      |w AS (
      |  SELECT *, sum(a) OVER () AS sum_a,
      |    sum(e_micro) OVER () AS sum_e_micro,
      |    sum(var_micro) OVER () AS sum_var_micro,
      |    sum(ad_micro) OVER () AS sum_ad_micro,
      |    sum(bc_micro) OVER () AS sum_bc_micro
      |  FROM m
      |)
      |SELECT stratum, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
      |  CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
      |  e_micro, var_micro,
      |  CASE WHEN sum_var_micro > 0 THEN CAST(floor(
      |    (sum_a::DOUBLE * 1000000.0::DOUBLE - sum_e_micro::DOUBLE)
      |    * (sum_a::DOUBLE * 1000000.0::DOUBLE - sum_e_micro::DOUBLE)
      |    / (sum_var_micro::DOUBLE * 1000000.0::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) END AS cmh_micro,
      |  CASE WHEN sum_bc_micro > 0 THEN CAST(
      |    (sum_ad_micro::HUGEINT * 1000000) // sum_bc_micro AS BIGINT)
      |    END AS or_mh_micro
      |FROM w""".stripMargin

  // --------------------------------------------------------------- q227
  /** Hill tail-index estimator — "how heavy is the tail?" as a number:
    * for the k largest values x₍₁₎ ≥ … ≥ x₍ₖ₎ above the threshold
    * x₍ₖ₊₁₎, Ĥ = (1/k)·Σ ln(x₍ᵢ₎/x₍ₖ₊₁₎) and the tail exponent
    * α̂ = 1/Ĥ (Hill 1975). α ≤ 2 means infinite variance — means and
    * z-tests on that column are lies; α large means a thin tail a
    * truncation cap won't distort. The number a pipeline reads before
    * trusting q192's bootstrap or capping document lengths.
    *
    * Exactness: each of the k+1 order statistics takes ONE
    * floored-micro-nat log (the q195 discipline), after which
    * Ĥ_micro = (Σlᵢ − k·l₍ₖ₊₁₎) div k and α_micro = 10¹² div Ĥ_micro
    * are pure integer arithmetic — identical in both engines.
    *
    * Scale shape — the reason this uses [[graft.functions.TopK]]: order
    * statistics via a rank window would shuffle and sort the corpus per
    * group; the bounded-heap Aggregator is partial-aggregable, so the
    * exchange carries ≤ (k+1)·groups·partitions rows — top-101 over any
    * corpus size shuffles effectively nothing. Groups with fewer than
    * k+1 qualifying rows report null (underpowered, not zero).
    */
  def hillTailIndex(spark: SparkSession, perRow: DataFrame, groupCol: String,
                    valueCol: String, idCol: String, k: Int = 100): DataFrame = {
    import spark.implicits._
    val top = graft.functions.TopK.grouped(
      perRow.filter(col(valueCol) >= 1L), Seq(groupCol),
      col(valueCol).cast("double"), col(idCol), lit(0L), k + 1)
      .withColumn("l_micro",
        floor(log(col("score")) * lit(1000000.0) + lit(0.5)).cast("long"))
    top
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_top"),
        sum(when(col("rank") <= k, col("l_micro"))).as("sum_l"),
        max(when(col("rank") === k + 1, col("l_micro"))).as("l_k1"),
        max(when(col("rank") === k + 1, col("score"))).cast("long")
          .as("x_k1"))
      .withColumn("h_micro", when(col("n_top") === k + 1,
        expr(s"(sum_l - $k * l_k1) div $k")))
      .withColumn("alpha_micro", when(col("h_micro") > 0,
        expr("1000000000000 div h_micro")))
      .select(col(groupCol), col("n_top"), col("x_k1"), col("h_micro"),
        col("alpha_micro"))
  }

  /** Gated q227: tail exponent of order spend (cents) per market
    * segment — k = 100 top orders per segment.
    */
  def spendTailIndex(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"))
    hillTailIndex(spark, rows, "segment", "cents", "o_orderkey")
  }

  private val spendTailSql =
    """WITH rows_ AS (
      |  SELECT c.c_mktsegment AS segment,
      |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
      |    o.o_orderkey
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  WHERE round(o.o_totalprice * 100) >= 1
      |),
      |r AS (
      |  SELECT segment, cents,
      |    CAST(row_number() OVER (PARTITION BY segment
      |      ORDER BY cents DESC, o_orderkey) AS BIGINT) AS rank,
      |    CAST(floor(ln(cents::DOUBLE) * 1000000.0::DOUBLE + 0.5::DOUBLE)
      |      AS BIGINT) AS l_micro
      |  FROM rows_
      |  QUALIFY rank <= 101
      |),
      |s AS (
      |  SELECT segment, count(*) AS n_top,
      |    sum(CASE WHEN rank <= 100 THEN l_micro END) AS sum_l,
      |    max(CASE WHEN rank = 101 THEN l_micro END) AS l_k1,
      |    max(CASE WHEN rank = 101 THEN cents END) AS x_k1
      |  FROM r GROUP BY 1
      |)
      |SELECT segment, CAST(n_top AS BIGINT) AS n_top,
      |  CAST(x_k1 AS BIGINT) AS x_k1,
      |  CASE WHEN n_top = 101
      |    THEN CAST((sum_l - 100 * l_k1) // 100 AS BIGINT) END AS h_micro,
      |  CASE WHEN n_top = 101 AND (sum_l - 100 * l_k1) // 100 > 0
      |    THEN CAST(1000000000000 // ((sum_l - 100 * l_k1) // 100) AS BIGINT)
      |    END AS alpha_micro
      |FROM s""".stripMargin

  // --------------------------------------------------------------- q228
  /** Friedman rank test — the repeated-measures member of the rank
    * battery: q214's Kruskal–Wallis pools INDEPENDENT samples, but when
    * the same k treatments are observed in every block (the same
    * segments every week), between-block level shifts swamp KW; Friedman
    * ranks WITHIN each block first, so only the consistent ordering
    * survives: χ²_F = 12/(bk(k+1))·ΣR_j² − 3b(k+1), plus Kendall's
    * W = χ²/(b(k−1)) as the 0–1 concordance effect size.
    *
    * Ranks are plain row_number under the deterministic total order
    * (value, treatment) — the documented convention for the
    * integer-exact variant (same choice as q105's tie-broken Spearman);
    * R_j and ΣR_j² are exact BIGINT (blocks are calendar-bounded, so
    * ΣR_j² ≤ k·(bk)² never approaches 2⁶³); χ²/W are one fixed double
    * sequence each over those integers. Only COMPLETE blocks (all k
    * treatments present) enter, by construction of the block filter.
    *
    * Scale shape: fact scan → (block, treatment) aggregate → rank
    * window inside each block (parallel across blocks, k rows each) →
    * treatment-frame rollup.
    */
  def friedmanTest(cells: DataFrame, blockCol: String, treatCol: String,
                   valueCol: String): DataFrame = {
    val wBlock = Window.partitionBy(blockCol)
    val wRank = Window.partitionBy(blockCol)
      .orderBy(col(valueCol), col(treatCol))
    val wAll = Window.partitionBy()
    val complete = cells
      // A block enters only when it is EXACTLY one row per treatment:
      // distinct-treatment count == k_all AND total row count == k_all.
      // The distinct check alone (pre-r13) admitted duplicate
      // (block, treatment) rows, which row_number then ranked beyond k
      // and b_blocks counted twice — silently corrupting chi2/W on the
      // public API (the gated q228 fixture pre-aggregates, so the
      // oracle never saw it). Both predicates ride the same wBlock
      // window frame, so the guard adds no extra shuffle.
      .withColumn("k_chk",
        size(collect_set(col(treatCol)).over(wBlock)).cast("long"))
      .withColumn("n_chk", count(lit(1)).over(wBlock).cast("long"))
      .withColumn("k_all",
        size(collect_set(col(treatCol)).over(wAll)).cast("long"))
      .filter(col("k_chk") === col("k_all") &&
        col("n_chk") === col("k_all"))
    complete
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .groupBy(col(treatCol).as("treatment"))
      .agg(count(lit(1)).as("b_blocks"), sum("rk").as("r_sum"))
      .withColumn("k_treat", count(lit(1)).over(wAll).cast("long"))
      .withColumn("sum_r2",
        sum(col("r_sum") * col("r_sum")).over(wAll))
      .withColumn("mean_rank_micro", expr(
        """(r_sum div b_blocks) * 1000000
          | + (1000000 * (r_sum - (r_sum div b_blocks) * b_blocks))
          |   div b_blocks""".stripMargin))
      .withColumn("chi2_micro", floor(
        lit(12.0) * col("sum_r2").cast("double")
          / (col("b_blocks").cast("double") * col("k_treat").cast("double")
            * (col("k_treat").cast("double") + lit(1.0)))
          * lit(1000000.0)
          - lit(3000000.0) * col("b_blocks").cast("double")
          * (col("k_treat").cast("double") + lit(1.0)) + lit(0.5))
        .cast("long"))
      .withColumn("w_ppm", floor(
        (lit(12.0) * col("sum_r2").cast("double")
          / (col("b_blocks").cast("double") * col("k_treat").cast("double")
            * (col("k_treat").cast("double") + lit(1.0)))
          - lit(3.0) * col("b_blocks").cast("double")
          * (col("k_treat").cast("double") + lit(1.0)))
          / (col("b_blocks").cast("double")
            * (col("k_treat").cast("double") - lit(1.0)))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .select(col("treatment"), col("b_blocks"), col("r_sum"),
        col("mean_rank_micro"), col("chi2_micro"), col("w_ppm"))
  }

  /** Gated q228: do the market segments keep a consistent weekly revenue
    * ordering? Blocks = ISO weeks with all segments present.
    */
  def segmentWeeklyFriedman(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        date_trunc("week", col("o_orderdate")).cast("date").as("week"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    friedmanTest(cells, "week", "segment", "cents")
  }

  private val friedmanSql =
    """WITH cells AS (
      |  SELECT c.c_mktsegment AS segment,
      |    date_trunc('week', o.o_orderdate)::DATE AS week,
      |    sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2
      |),
      |complete AS (
      |  SELECT * FROM (
      |    SELECT *, count(*) OVER (PARTITION BY week) AS k_chk,
      |      CAST((SELECT count(DISTINCT segment) FROM cells) AS BIGINT)
      |        AS k_all
      |    FROM cells)
      |  WHERE k_chk = k_all
      |),
      |ranked AS (
      |  SELECT segment,
      |    CAST(row_number() OVER (PARTITION BY week ORDER BY cents, segment)
      |      AS BIGINT) AS rk
      |  FROM complete
      |),
      |s AS (
      |  SELECT segment AS treatment, count(*) AS b_blocks, sum(rk) AS r_sum
      |  FROM ranked GROUP BY 1
      |),
      |w AS (
      |  SELECT *, CAST(count(*) OVER () AS BIGINT) AS k_treat,
      |    sum(r_sum * r_sum) OVER () AS sum_r2
      |  FROM s
      |)
      |SELECT treatment, CAST(b_blocks AS BIGINT) AS b_blocks,
      |  CAST(r_sum AS BIGINT) AS r_sum,
      |  CAST((r_sum // b_blocks) * 1000000
      |    + (1000000 * (r_sum - (r_sum // b_blocks) * b_blocks))
      |      // b_blocks AS BIGINT) AS mean_rank_micro,
      |  CAST(floor(
      |    12.0::DOUBLE * sum_r2::DOUBLE
      |    / (b_blocks::DOUBLE * k_treat::DOUBLE
      |       * (k_treat::DOUBLE + 1.0::DOUBLE))
      |    * 1000000.0::DOUBLE
      |    - 3000000.0::DOUBLE * b_blocks::DOUBLE
      |      * (k_treat::DOUBLE + 1.0::DOUBLE) + 0.5::DOUBLE) AS BIGINT)
      |    AS chi2_micro,
      |  CAST(floor(
      |    (12.0::DOUBLE * sum_r2::DOUBLE
      |     / (b_blocks::DOUBLE * k_treat::DOUBLE
      |        * (k_treat::DOUBLE + 1.0::DOUBLE))
      |     - 3.0::DOUBLE * b_blocks::DOUBLE
      |       * (k_treat::DOUBLE + 1.0::DOUBLE))
      |    / (b_blocks::DOUBLE * (k_treat::DOUBLE - 1.0::DOUBLE))
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS w_ppm
      |FROM w""".stripMargin

  // --------------------------------------------------------------- q229
  /** Overdispersion (variance-to-mean) check — the Poisson-sanity gate a
    * count monitor runs before alerting off "±3σ of a Poisson": event
    * counts with hidden clustering carry variance ≫ mean, and a
    * Poisson-calibrated alarm on them pages every night. D = s²/x̄ per
    * group over the daily-count series, with the Poisson-null
    * z = (D−1)·√((n−1)/2) — D ≈ 1 means Poisson alarms are honest,
    * D ≫ 1 means switch to a negative-binomial (or q60's empirical-σ)
    * threshold.
    *
    * Exactness: n/Σc/Σc² are exact BIGINT sufficient sums (counts are
    * day-grain, so Σc² is calendar-bounded × daily-rate² — documented
    * headroom c ≤ ~3·10⁹/day); s² uses the n·Σc² − (Σc)² identity and
    * D/z are fixed double sequences floored to micro. Series with n < 2
    * or x̄ = 0 report null.
    *
    * Scale shape: fact scan → (group, day) count → group rollup. The
    * q177/q220 monitoring family shape.
    */
  def overdispersion(perT: DataFrame, groupCol: String,
                     countCol: String): DataFrame = {
    val (nD, sD, ssD) = (col("n_days").cast("double"),
      col("sum_c").cast("double"), col("sum_c2").cast("double"))
    val varD = (nD * ssD - sD * sD) / (nD * (nD - lit(1.0)))
    val meanD = sD / nD
    perT
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_days"), sum(col(countCol)).as("sum_c"),
        sum(col(countCol) * col(countCol)).as("sum_c2"))
      .withColumn("mean_micro", expr(
        """(sum_c div n_days) * 1000000
          | + (1000000 * (sum_c - (sum_c div n_days) * n_days))
          |   div n_days""".stripMargin))
      .withColumn("dispersion_micro",
        when(col("n_days") > 1 && col("sum_c") > 0,
          floor(varD / meanD * lit(1000000.0) + lit(0.5)).cast("long")))
      .withColumn("z_micro",
        when(col("n_days") > 1 && col("sum_c") > 0,
          floor((varD / meanD - lit(1.0))
            * sqrt((nD - lit(1.0)) / lit(2.0))
            * lit(1000000.0) + lit(0.5)).cast("long")))
  }

  /** Gated q229: are daily order counts per segment Poisson-dispersed? */
  def segmentOrderDispersion(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("c"))
    overdispersion(daily, "segment", "c")
  }

  private val dispersionSql =
    """WITH daily AS (
      |  SELECT c.c_mktsegment AS segment, o.o_orderdate::DATE AS day,
      |    count(*) AS c
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2
      |),
      |s AS (
      |  SELECT segment, count(*) AS n_days, sum(c) AS sum_c,
      |    sum(c * c) AS sum_c2
      |  FROM daily GROUP BY 1
      |)
      |SELECT segment, CAST(n_days AS BIGINT) AS n_days,
      |  CAST(sum_c AS BIGINT) AS sum_c, CAST(sum_c2 AS BIGINT) AS sum_c2,
      |  CAST((sum_c // n_days) * 1000000
      |    + (1000000 * (sum_c - (sum_c // n_days) * n_days))
      |      // n_days AS BIGINT) AS mean_micro,
      |  CASE WHEN n_days > 1 AND sum_c > 0 THEN CAST(floor(
      |    (n_days::DOUBLE * sum_c2::DOUBLE - sum_c::DOUBLE * sum_c::DOUBLE)
      |    / (n_days::DOUBLE * (n_days::DOUBLE - 1.0::DOUBLE))
      |    / (sum_c::DOUBLE / n_days::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) END
      |    AS dispersion_micro,
      |  CASE WHEN n_days > 1 AND sum_c > 0 THEN CAST(floor(
      |    ((n_days::DOUBLE * sum_c2::DOUBLE - sum_c::DOUBLE * sum_c::DOUBLE)
      |     / (n_days::DOUBLE * (n_days::DOUBLE - 1.0::DOUBLE))
      |     / (sum_c::DOUBLE / n_days::DOUBLE) - 1.0::DOUBLE)
      |    * sqrt((n_days::DOUBLE - 1.0::DOUBLE) / 2.0::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) END AS z_micro
      |FROM s""".stripMargin

  // --------------------------------------------------------------- q230
  /** Mood's median test — the robust k-group location test for when even
    * ranks are too much structure: count each group's rows above vs
    * at-or-below the GRAND median and chi-square the k×2 table. Blunter
    * than Kruskal–Wallis but immune to extreme tails and trivially
    * interpretable ("which groups sit above the corpus median?") — the
    * pair of numbers an SLA review reads.
    *
    * The grand median is EXACT and sort-free via the q214 value-domain
    * trick: per distinct value, a prefix sum over the (price-bounded)
    * domain frame; the median is the first value whose cumulative count
    * reaches ⌈N/2⌉ — division-free as 2·cum ≥ N. Group counts
    * above/at-or-below are exact BIGINT; the χ² statistic over the k×2
    * table uses the q205 per-group fixed-double-floor discipline
    * (expected counts are one double sequence per cell, floored to
    * micro, integer-summed).
    *
    * Scale shape: one corpus scan → (group, value) cells (the q214
    * localCheckpoint) → domain-frame median window → k-row rollup.
    */
  def moodsMedianTest(perRow: DataFrame, groupCol: String,
                      valueCol: String): DataFrame = {
    val cells = perRow
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("n_gv"))
      .localCheckpoint()
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val median = cells.groupBy("v").agg(sum("n_gv").as("t_v"))
      .withColumn("cum", sum("t_v").over(wCum))
      .withColumn("n_tot", sum("t_v").over(Window.partitionBy()))
      .filter(col("cum") * 2L >= col("n_tot"))
      .agg(min("v").as("median_v"))
    val wAll = Window.partitionBy()
    val chi2 = {
      // Expected above-count per group: n_g·tot_above/N; the cell terms
      // (obs−exp)²/exp for both cells, each ONE fixed double sequence
      // floored to micro, then integer-summed across groups.
      val (nG, aG) = (col("n_g").cast("double"), col("above_g").cast("double"))
      val (nT, aT) = (col("n_tot").cast("double"),
        col("tot_above").cast("double"))
      val eA = nG * aT / nT
      val eB = nG * (nT - aT) / nT
      val termA = (aG - eA) * (aG - eA) / eA
      val termB = ((nG - aG) - eB) * ((nG - aG) - eB) / eB
      floor((termA + termB) * lit(1000000.0) + lit(0.5)).cast("long")
    }
    cells
      .crossJoin(broadcast(median))
      .groupBy(col("g"))
      .agg(sum("n_gv").as("n_g"),
        sum(when(col("v") > col("median_v"), col("n_gv")).otherwise(0L))
          .as("above_g"),
        max("median_v").as("median_v"))
      .withColumn("n_tot", sum("n_g").over(wAll))
      .withColumn("tot_above", sum("above_g").over(wAll))
      .withColumn("above_ppm", expr("(1000000 * above_g) div n_g"))
      .withColumn("term_micro",
        when(col("tot_above") > 0 && col("tot_above") < col("n_tot"), chi2))
      .withColumn("chi2_micro", sum("term_micro").over(wAll))
      .select(col("g"), col("n_g"), col("above_g"), col("median_v"),
        col("above_ppm"), col("term_micro"), col("chi2_micro"))
  }

  /** Gated q230: do the market segments split evenly around the grand
    * median order value (whole dollars — the domain-bounding unit)?
    */
  def segmentMedianTest(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        floor(col("o_totalprice")).cast("long").as("dollars"))
    moodsMedianTest(rows, "segment", "dollars")
  }

  private val moodsMedianSql =
    """WITH rows_ AS (
      |  SELECT c.c_mktsegment AS g,
      |    CAST(floor(o.o_totalprice) AS BIGINT) AS v
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |),
      |cells AS (
      |  SELECT g, v, count(*) AS n_gv FROM rows_ GROUP BY 1, 2
      |),
      |vt AS (
      |  SELECT v, sum(n_gv) AS t_v FROM cells GROUP BY 1
      |),
      |med AS (
      |  SELECT min(v) AS median_v FROM (
      |    SELECT v,
      |      sum(t_v) OVER (ORDER BY v
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |      sum(t_v) OVER () AS n_tot
      |    FROM vt)
      |  WHERE cum * 2 >= n_tot
      |),
      |grp AS (
      |  SELECT g, sum(n_gv) AS n_g,
      |    sum(CASE WHEN v > (SELECT median_v FROM med)
      |      THEN n_gv ELSE 0 END) AS above_g,
      |    (SELECT median_v FROM med) AS median_v
      |  FROM cells GROUP BY 1
      |),
      |w AS (
      |  SELECT *, sum(n_g) OVER () AS n_tot,
      |    sum(above_g) OVER () AS tot_above
      |  FROM grp
      |),
      |t AS (
      |  SELECT *,
      |    CASE WHEN tot_above > 0 AND tot_above < n_tot THEN CAST(floor(
      |      ((above_g::DOUBLE - n_g::DOUBLE * tot_above::DOUBLE / n_tot::DOUBLE)
      |       * (above_g::DOUBLE - n_g::DOUBLE * tot_above::DOUBLE / n_tot::DOUBLE)
      |       / (n_g::DOUBLE * tot_above::DOUBLE / n_tot::DOUBLE)
      |       + ((n_g - above_g)::DOUBLE
      |          - n_g::DOUBLE * (n_tot - tot_above)::DOUBLE / n_tot::DOUBLE)
      |         * ((n_g - above_g)::DOUBLE
      |            - n_g::DOUBLE * (n_tot - tot_above)::DOUBLE / n_tot::DOUBLE)
      |         / (n_g::DOUBLE * (n_tot - tot_above)::DOUBLE / n_tot::DOUBLE))
      |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) END AS term_micro
      |  FROM w
      |)
      |SELECT g, CAST(n_g AS BIGINT) AS n_g,
      |  CAST(above_g AS BIGINT) AS above_g,
      |  CAST(median_v AS BIGINT) AS median_v,
      |  CAST((1000000 * above_g) // n_g AS BIGINT) AS above_ppm,
      |  term_micro,
      |  CAST(sum(term_micro) OVER () AS BIGINT) AS chi2_micro
      |FROM t""".stripMargin

  // --------------------------------------------------------------- q232
  /** Jonckheere–Terpstra ordered-alternative test — the missing middle
    * of the trend battery: q221 (Cochran–Armitage) trends a BINARY rate
    * across ordered categories, q214 (Kruskal–Wallis) detects ANY
    * k-group difference; JT asks the sharper ordered question for a
    * CONTINUOUS outcome — "does the distribution shift upward as the
    * category order rises?" — by summing the pairwise Mann–Whitney
    * counts J = Σ_{i<j} U_ij over ordered group pairs, and it beats KW
    * exactly when the alternative really is monotone.
    *
    * Integer form: J rides DOUBLED units (J2 = 2·#less + #ties, always
    * an integer) computed WITHOUT pair enumeration on the value-domain
    * grid: a (group × value) dense frame (domain-bounded at any corpus
    * scale) carries each group's below-v prefix in one per-group window,
    * then a per-value window over the GROUP ORDER accumulates the
    * lower-ordered groups' counts, so J2 = Σ n·(2·S_less + S_tie) is an
    * exact DECIMAL(38,0) sum. The tie-corrected null variance
    * (Hollander–Wolfe) uses exact BIGINT/DECIMAL group and tie cubes
    * with z as ONE fixed double sequence over them; E[J2] =
    * (N² − Σn_g²)/2 exact via decimal.
    *
    * Scale shape: one corpus scan → (group, value) cells
    * (localCheckpointed, the q214 discipline) → domain×k grid windows →
    * one rollup. No pair join anywhere.
    */
  def jonckheereTerpstra(perRow: DataFrame, scoreCol: String,
                         valueCol: String): DataFrame = {
    val cells = perRow
      .groupBy(col(scoreCol).as("s"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("n_gv"))
      .localCheckpoint()
    val groups = cells.select("s").distinct()
    val values = cells.select("v").distinct()
    val wBelow = Window.partitionBy("s").orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wPrev = Window.partitionBy("v").orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val grid = values.crossJoin(groups)
      .join(cells, Seq("s", "v"), "left")
      .withColumn("n", coalesce(col("n_gv"), lit(0L)))
      .withColumn("cum_below", coalesce(sum("n").over(wBelow), lit(0L)))
      .withColumn("s_less", coalesce(sum("cum_below").over(wPrev), lit(0L)))
      .withColumn("s_tie", coalesce(sum("n").over(wPrev), lit(0L)))
    val j2 = grid.agg(sum(col("n").cast("decimal(38,0)")
      * (col("s_less") * 2L + col("s_tie"))).as("j2"))
    val gsums = cells.groupBy("s").agg(sum("n_gv").as("n_g"))
      .agg(sum("n_g").as("n_tot"),
        sum(col("n_g").cast("decimal(38,0)") * col("n_g")).as("sum_n2"),
        sum(col("n_g").cast("decimal(38,0)") * (col("n_g") - 1L)
          * (col("n_g") * 2L + 5L)).as("g_a"),
        sum(col("n_g").cast("decimal(38,0)") * (col("n_g") - 1L)
          * (col("n_g") - 2L)).as("g_b"),
        sum(col("n_g").cast("decimal(38,0)") * (col("n_g") - 1L)).as("g_c"),
        count(lit(1)).as("k_groups"))
    val tsums = cells.groupBy("v").agg(sum("n_gv").as("t_v"))
      .agg(
        sum(col("t_v").cast("decimal(38,0)") * (col("t_v") - 1L)
          * (col("t_v") * 2L + 5L)).as("t_a"),
        sum(col("t_v").cast("decimal(38,0)") * (col("t_v") - 1L)
          * (col("t_v") - 2L)).as("t_b"),
        sum(col("t_v").cast("decimal(38,0)") * (col("t_v") - 1L)).as("t_c"))
    val nD = col("n_tot").cast("double")
    val varD = (nD * (nD - lit(1.0)) * (nD * 2.0 + lit(5.0))
      - col("g_a").cast("double") - col("t_a").cast("double")) / lit(72.0) +
      col("g_b").cast("double") * col("t_b").cast("double") /
        (lit(36.0) * nD * (nD - lit(1.0)) * (nD - lit(2.0))) +
      col("g_c").cast("double") * col("t_c").cast("double") /
        (lit(8.0) * nD * (nD - lit(1.0)))
    j2.crossJoin(broadcast(gsums)).crossJoin(broadcast(tsums))
      // N² − Σn² is even by symmetry, so the integral div is exact; the
      // LONG result bounds the gate at N ≲ 4·10⁹ rows (same contract as
      // the BIGINT j2 output column).
      .withColumn("e2", expr(
        "(CAST(n_tot AS DECIMAL(38,0)) * n_tot - sum_n2) div 2"))
      .withColumn("z_micro",
        when(col("k_groups") > 1 && varD > 0, floor(
          (col("j2").cast("double") - col("e2").cast("double"))
            / (lit(2.0) * sqrt(varD)) * lit(1000000.0) + lit(0.5))
          .cast("long")))
      .select(col("k_groups"), col("n_tot"),
        col("j2").cast("long").as("j2"), col("e2").cast("long").as("e2"),
        col("z_micro"))
  }

  /** Gated q232: does order spend (whole dollars) shift upward as the
    * priority band rises? Same ordered bands as q221, continuous
    * outcome.
    */
  def prioritySpendJt(spark: SparkSession, dir: String): DataFrame =
    jonckheereTerpstra(
      Tables.orders(spark, dir).select(
        substring(col("o_orderpriority"), 1, 1).cast("long").as("prio"),
        floor(col("o_totalprice")).cast("long").as("dollars")),
      "prio", "dollars")

  private val jtSql =
    """WITH rows_ AS (
      |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS s,
      |    CAST(floor(o_totalprice) AS BIGINT) AS v
      |  FROM orders
      |),
      |cells AS (
      |  SELECT s, v, count(*) AS n_gv FROM rows_ GROUP BY 1, 2
      |),
      |grid AS (
      |  SELECT g.s, vv.v, coalesce(c.n_gv, 0) AS n
      |  FROM (SELECT DISTINCT v FROM cells) vv
      |  CROSS JOIN (SELECT DISTINCT s FROM cells) g
      |  LEFT JOIN cells c ON c.s = g.s AND c.v = vv.v
      |),
      |w1 AS (
      |  SELECT *, coalesce(sum(n) OVER (PARTITION BY s ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_below
      |  FROM grid
      |),
      |w2 AS (
      |  SELECT *,
      |    coalesce(sum(cum_below) OVER (PARTITION BY v ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_less,
      |    coalesce(sum(n) OVER (PARTITION BY v ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_tie
      |  FROM w1
      |),
      |j AS (
      |  SELECT sum(n::HUGEINT * (s_less * 2 + s_tie)) AS j2 FROM w2
      |),
      |gs AS (
      |  SELECT sum(n_g) AS n_tot,
      |    sum(n_g::HUGEINT * n_g) AS sum_n2,
      |    sum(n_g::HUGEINT * (n_g - 1) * (n_g * 2 + 5)) AS g_a,
      |    sum(n_g::HUGEINT * (n_g - 1) * (n_g - 2)) AS g_b,
      |    sum(n_g::HUGEINT * (n_g - 1)) AS g_c,
      |    count(*) AS k_groups
      |  FROM (SELECT s, sum(n_gv) AS n_g FROM cells GROUP BY 1)
      |),
      |ts AS (
      |  SELECT
      |    sum(t_v::HUGEINT * (t_v - 1) * (t_v * 2 + 5)) AS t_a,
      |    sum(t_v::HUGEINT * (t_v - 1) * (t_v - 2)) AS t_b,
      |    sum(t_v::HUGEINT * (t_v - 1)) AS t_c
      |  FROM (SELECT v, sum(n_gv) AS t_v FROM cells GROUP BY 1)
      |)
      |SELECT CAST(gs.k_groups AS BIGINT) AS k_groups,
      |  CAST(gs.n_tot AS BIGINT) AS n_tot,
      |  CAST(j.j2 AS BIGINT) AS j2,
      |  CAST((gs.n_tot::HUGEINT * gs.n_tot - gs.sum_n2) // 2 AS BIGINT) AS e2,
      |  CASE WHEN gs.k_groups > 1 AND
      |    (gs.n_tot::DOUBLE * (gs.n_tot::DOUBLE - 1.0::DOUBLE)
      |       * (gs.n_tot::DOUBLE * 2.0::DOUBLE + 5.0::DOUBLE)
      |     - gs.g_a::DOUBLE - ts.t_a::DOUBLE) / 72.0::DOUBLE
      |    + gs.g_b::DOUBLE * ts.t_b::DOUBLE
      |      / (36.0::DOUBLE * gs.n_tot::DOUBLE * (gs.n_tot::DOUBLE - 1.0::DOUBLE)
      |         * (gs.n_tot::DOUBLE - 2.0::DOUBLE))
      |    + gs.g_c::DOUBLE * ts.t_c::DOUBLE
      |      / (8.0::DOUBLE * gs.n_tot::DOUBLE * (gs.n_tot::DOUBLE - 1.0::DOUBLE))
      |    > 0
      |  THEN CAST(floor(
      |    (j.j2::DOUBLE - ((gs.n_tot::HUGEINT * gs.n_tot - gs.sum_n2) // 2)::DOUBLE)
      |    / (2.0::DOUBLE * sqrt(
      |      (gs.n_tot::DOUBLE * (gs.n_tot::DOUBLE - 1.0::DOUBLE)
      |         * (gs.n_tot::DOUBLE * 2.0::DOUBLE + 5.0::DOUBLE)
      |       - gs.g_a::DOUBLE - ts.t_a::DOUBLE) / 72.0::DOUBLE
      |      + gs.g_b::DOUBLE * ts.t_b::DOUBLE
      |        / (36.0::DOUBLE * gs.n_tot::DOUBLE * (gs.n_tot::DOUBLE - 1.0::DOUBLE)
      |           * (gs.n_tot::DOUBLE - 2.0::DOUBLE))
      |      + gs.g_c::DOUBLE * ts.t_c::DOUBLE
      |        / (8.0::DOUBLE * gs.n_tot::DOUBLE
      |           * (gs.n_tot::DOUBLE - 1.0::DOUBLE))))
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) END AS z_micro
      |FROM j, gs, ts""".stripMargin

  // --------------------------------------------------------------- q243
  /** Brown–Forsythe (median-centered Levene) test — "do the k groups
    * differ in DISPERSION?", the variance-homogeneity companion the
    * mean/location battery ([[anovaF]] q205, [[kruskalWallis]] q214)
    * assumes away: one-way ANOVA on z = |x − median_g|, with the median
    * (Brown & Forsythe 1974) rather than the mean for robustness.
    *
    * Exactness: medians ride the value domain — per group, the two
    * middle positions p1 = ⌊(n+1)/2⌋, p2 = ⌊(n+2)/2⌋ are located on the
    * (group, value) cell frame's running count, and med2 = v(p1)+v(p2)
    * (= 2·median) is an exact BIGINT, so z2 = |2x − med2| = 2z is exact
    * per cell. The ANOVA fold on z2 then follows the [[anovaF]]
    * discipline verbatim (per-group Σz2²/n floored once; W from integer
    * SSB/SSW). W is invariant under the ×2 scaling, so w_micro is the
    * published statistic.
    *
    * Scale shape: one corpus scan → (group, value) hash aggregate;
    * medians and the fold run on the domain-bounded cell frame (the
    * q214 rationale) — the per-group running count is a window over
    * value-domain partitions, never the fact table.
    */
  def brownForsythe(perRow: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val cells = perRow
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("n_gv"))
      .localCheckpoint()
    val wCum = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wG = Window.partitionBy("g")
    val med = cells
      .withColumn("cum", sum("n_gv").over(wCum))
      .withColumn("n_g", sum("n_gv").over(wG))
      .groupBy("g")
      .agg(
        min(when(col("cum") >= expr("(n_g + 1) div 2"), col("v"))).as("v1"),
        min(when(col("cum") >= expr("(n_g + 2) div 2"), col("v"))).as("v2"))
      .select(col("g"), (col("v1") + col("v2")).as("med2"))
    cells.join(med, Seq("g"))
      .withColumn("z2", abs(col("v") * 2L - col("med2")))
      .groupBy("g")
      .agg(sum("n_gv").as("n"), sum(col("n_gv") * col("z2")).as("s"),
        sum(col("n_gv") * col("z2") * col("z2")).as("ss"))
      .withColumn("tg", floor(col("s").cast("double") * col("s").cast("double")
        / col("n").cast("double") + lit(0.5)).cast("long"))
      .agg(count(lit(1)).as("k_groups"), sum("n").as("n_total"),
        sum("s").as("s_total"), sum("ss").as("ss_total"),
        sum("tg").as("tg_total"))
      .withColumn("ssb", col("tg_total")
        - floor(col("s_total").cast("double") * col("s_total").cast("double")
          / col("n_total").cast("double") + lit(0.5)).cast("long"))
      .withColumn("ssw", col("ss_total") - col("tg_total"))
      .withColumn("w_micro", floor(
        (col("ssb").cast("double") / (col("k_groups") - 1).cast("double"))
          / (col("ssw").cast("double")
            / (col("n_total") - col("k_groups")).cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .select(col("k_groups"), col("n_total"), col("ssb"), col("ssw"),
        col("w_micro"))
  }

  /** Gated q243: does order-spend DISPERSION (whole dollars) differ
    * across order priorities? One row: Brown–Forsythe W in micro-units
    * with its integer SSB/SSW provenance.
    */
  def prioritySpendLevene(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"),
        floor(col("o_totalprice")).cast("long").as("dollars"))
    brownForsythe(rows, "priority", "dollars")
  }

  private val prioritySpendLeveneSql =
    """WITH rows_ AS (
      |  SELECT o_orderpriority AS g,
      |    CAST(floor(o_totalprice) AS BIGINT) AS v
      |  FROM orders
      |),
      |cells AS (
      |  SELECT g, v, count(*) AS n_gv FROM rows_ GROUP BY 1, 2
      |),
      |cum AS (
      |  SELECT g, v, n_gv,
      |    sum(n_gv) OVER (PARTITION BY g ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(n_gv) OVER (PARTITION BY g) AS n_g
      |  FROM cells
      |),
      |med AS (
      |  SELECT g,
      |    min(CASE WHEN cum >= (n_g + 1) // 2 THEN v END)
      |      + min(CASE WHEN cum >= (n_g + 2) // 2 THEN v END) AS med2
      |  FROM cum GROUP BY 1
      |),
      |grp AS (
      |  SELECT c.g, sum(c.n_gv) AS n,
      |    sum(c.n_gv * abs(c.v * 2 - m.med2)) AS s,
      |    sum(c.n_gv * abs(c.v * 2 - m.med2) * abs(c.v * 2 - m.med2)) AS ss
      |  FROM cells c JOIN med m ON m.g = c.g
      |  GROUP BY 1
      |),
      |tg AS (
      |  SELECT g, n, s, ss,
      |    CAST(floor(s::DOUBLE * s::DOUBLE / n::DOUBLE + 0.5::DOUBLE)
      |      AS BIGINT) AS tg
      |  FROM grp
      |),
      |tot AS (
      |  SELECT count(*) AS k_groups, sum(n) AS n_total, sum(s) AS s_total,
      |    sum(ss) AS ss_total, sum(tg) AS tg_total
      |  FROM tg
      |),
      |sq AS (
      |  SELECT k_groups, n_total,
      |    tg_total - CAST(floor(s_total::DOUBLE * s_total::DOUBLE
      |      / n_total::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS ssb,
      |    ss_total - tg_total AS ssw
      |  FROM tot
      |)
      |SELECT CAST(k_groups AS BIGINT) AS k_groups,
      |  CAST(n_total AS BIGINT) AS n_total,
      |  CAST(ssb AS BIGINT) AS ssb, CAST(ssw AS BIGINT) AS ssw,
      |  CAST(floor(
      |    (ssb::DOUBLE / (k_groups - 1)::DOUBLE)
      |      / (ssw::DOUBLE / (n_total - k_groups)::DOUBLE)
      |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS w_micro
      |FROM sq""".stripMargin

  // --------------------------------------------------------------- q244
  /** Dunn's post-hoc test — the pairwise follow-up [[kruskalWallis]]
    * (q214) demands: which PAIRS of groups differ? For each unordered
    * pair, z = (R̄_i − R̄_j) / √(S²(1/n_i + 1/n_j)) with S² the
    * tie-corrected rank variance N(N+1)/12 − Σ(t³−t)/(12(N−1))
    * (Dunn 1964). Readers apply Bonferroni/BH to the emitted z values;
    * the statistic itself is the engine's job (no Φ⁻¹ in either SQL
    * dialect — same contract as q214/q232, which emit H and z, not p).
    *
    * Exactness: rides the q214 value-domain machinery — doubled ranks
    * rank2 = 2·avg-rank are exact BIGINT, per-group rank sums r2_g are
    * exact, tie cubes ride DECIMAL(38,0); z is ONE fixed double
    * sequence per pair over those integers (the /2 rank2 scaling folds
    * into the √4 of the variance), floored to micro.
    *
    * Scale shape: identical to q214 — one corpus scan to (group, value)
    * cells; ranks on the value-domain frame; the pair join runs on the
    * k-row group frame (k² pairs of a handful of groups, metadata-
    * sized).
    */
  def dunnPostHoc(perRow: DataFrame, groupCol: String,
                  valueCol: String): DataFrame = {
    val cells = perRow
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("n_gv"))
      .localCheckpoint()
    val wBelow = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val vt = cells.groupBy(col("v")).agg(sum("n_gv").as("t_v"))
      .withColumn("rank2",
        coalesce(sum("t_v").over(wBelow), lit(0L)) * 2L + col("t_v") + 1L)
      .withColumn("tie_sum", sum(col("t_v").cast("decimal(38,0)")
        * col("t_v") * col("t_v") - col("t_v"))
        .over(Window.partitionBy()))
    val grp = cells.join(vt, Seq("v"))
      .groupBy(col("g"))
      .agg(sum("n_gv").as("n_g"),
        sum(col("n_gv") * col("rank2")).as("r2_g"),
        max("tie_sum").as("tie_sum"))
      .withColumn("n_total", sum("n_g").over(Window.partitionBy()))
    val a = grp.select(col("g").as("g1"), col("n_g").as("n1"),
      col("r2_g").as("r2_1"), col("tie_sum"), col("n_total"))
    val b = grp.select(col("g").as("g2"), col("n_g").as("n2"),
      col("r2_g").as("r2_2"))
    a.join(b, col("g1") < col("g2"))
      .withColumn("z_micro", floor(
        (col("r2_1").cast("double") / col("n1").cast("double")
          - col("r2_2").cast("double") / col("n2").cast("double"))
          / sqrt((col("n_total").cast("double")
            * (col("n_total").cast("double") + lit(1.0)) / lit(3.0)
            - col("tie_sum").cast("double")
              / (lit(3.0) * (col("n_total").cast("double") - lit(1.0))))
            * (lit(1.0) / col("n1").cast("double")
              + lit(1.0) / col("n2").cast("double")))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .select(col("g1"), col("g2"), col("n1"), col("n2"), col("z_micro"))
  }

  /** Gated q244: which market-segment pairs differ in order spend?
    * k(k−1)/2 rows of Dunn z statistics (micro-units), the post-hoc
    * reading of q214's single H verdict on the same fixture.
    */
  def segmentSpendDunn(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        floor(col("o_totalprice")).cast("long").as("dollars"))
    dunnPostHoc(rows, "segment", "dollars")
  }

  private val segmentSpendDunnSql =
    """WITH rows_ AS (
      |  SELECT c.c_mktsegment AS g,
      |    CAST(floor(o.o_totalprice) AS BIGINT) AS v
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |),
      |cells AS (
      |  SELECT g, v, count(*) AS n_gv FROM rows_ GROUP BY 1, 2
      |),
      |vt AS (
      |  SELECT v, sum(n_gv) AS t_v FROM cells GROUP BY 1
      |),
      |vr AS (
      |  SELECT v, t_v,
      |    coalesce(sum(t_v) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
      |      + t_v + 1 AS rank2,
      |    sum(t_v::HUGEINT * t_v * t_v - t_v) OVER () AS tie_sum
      |  FROM vt
      |),
      |grp AS (
      |  SELECT c.g, sum(c.n_gv) AS n_g, sum(c.n_gv * vr.rank2) AS r2_g,
      |    max(vr.tie_sum) AS tie_sum
      |  FROM cells c JOIN vr ON vr.v = c.v
      |  GROUP BY 1
      |),
      |tot AS (
      |  SELECT g, n_g, r2_g, tie_sum, sum(n_g) OVER () AS n_total FROM grp
      |)
      |SELECT a.g AS g1, b.g AS g2,
      |  CAST(a.n_g AS BIGINT) AS n1, CAST(b.n_g AS BIGINT) AS n2,
      |  CAST(floor(
      |    (a.r2_g::DOUBLE / a.n_g::DOUBLE - b.r2_g::DOUBLE / b.n_g::DOUBLE)
      |      / sqrt((a.n_total::DOUBLE * (a.n_total::DOUBLE + 1.0::DOUBLE)
      |          / 3.0::DOUBLE
      |        - a.tie_sum::DOUBLE
      |          / (3.0::DOUBLE * (a.n_total::DOUBLE - 1.0::DOUBLE)))
      |        * (1.0::DOUBLE / a.n_g::DOUBLE + 1.0::DOUBLE / b.n_g::DOUBLE))
      |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS z_micro
      |FROM tot a JOIN tot b ON a.g < b.g""".stripMargin

  // --------------------------------------------------------------- q248
  /** Page's L trend test (Page 1963) — the ORDERED-alternative member of
    * the block battery: [[friedmanTest]] (q228) asks "do the k
    * treatments differ at all across blocks?"; Page's L asks "do they
    * follow THIS hypothesized order?" — L = Σ_j j·R_j over within-block
    * ranks, with j the treatment's position in the prior ordering
    * (here: the treatment column's ascending sort order, the same
    * convention as q221/q232's ordered-trend fixtures).
    *
    * Exactness: within-block ranks are row_number under the
    * deterministic (value, treatment) total order (the q228 tie-broken
    * convention); L is an exact BIGINT; E[L] = bk(k+1)²/4 is emitted as
    * exact milli (×250 — always integer); z = (L − E)/√(bk²(k+1)(k²−1)/144)
    * is one fixed double sequence over exact integers, floored to
    * micro. Only complete blocks enter — the q228 both-predicates
    * guard on the same window frame (distinct AND row count == k_all).
    *
    * Scale shape: fact scan → (block, treatment) aggregate → per-block
    * rank windows (k rows each, parallel across blocks) → one
    * grid-frame fold. The treatment-index window is a single-partition
    * pass over the (b·k)-row grid — domain-bounded at any corpus size.
    */
  def pageTrendTest(cells: DataFrame, blockCol: String, treatCol: String,
                    valueCol: String): DataFrame = {
    val wBlock = Window.partitionBy(blockCol)
    val wRank = Window.partitionBy(blockCol)
      .orderBy(col(valueCol), col(treatCol))
    val wAll = Window.partitionBy()
    val complete = cells
      .withColumn("k_chk",
        size(collect_set(col(treatCol)).over(wBlock)).cast("long"))
      .withColumn("n_chk", count(lit(1)).over(wBlock).cast("long"))
      .withColumn("k_all",
        size(collect_set(col(treatCol)).over(wAll)).cast("long"))
      .filter(col("k_chk") === col("k_all") &&
        col("n_chk") === col("k_all"))
    complete
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .withColumn("j", dense_rank().over(Window.orderBy(col(treatCol)))
        .cast("long"))
      .agg(sum(col("j") * col("rk")).as("l_stat"),
        (count(lit(1)) / max("k_all")).cast("long").as("b_blocks"),
        max("k_all").as("k_treat"))
      .withColumn("e4", col("b_blocks") * col("k_treat")
        * (col("k_treat") + 1L) * (col("k_treat") + 1L))
      .withColumn("var144", col("b_blocks") * col("k_treat") * col("k_treat")
        * (col("k_treat") + 1L)
        * (col("k_treat") * col("k_treat") - 1L))
      .select(col("b_blocks"), col("k_treat"), col("l_stat"),
        (col("e4") * 250L).as("e_l_milli"),
        floor((col("l_stat").cast("double") - col("e4").cast("double") / lit(4.0))
          / sqrt(col("var144").cast("double") / lit(144.0))
          * lit(1000000.0) + lit(0.5)).cast("long").as("z_micro"))
  }

  /** Gated q248: across nations (blocks), does order spend follow the
    * priority order 1-URGENT < … < 5-LOW? One row: L, E[L] (milli) and
    * the normal z in micro-units.
    */
  def nationPrioritySpendPage(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("block"),
        col("o_orderpriority").as("treatment"))
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("dollars"))
    pageTrendTest(cells, "block", "treatment", "dollars")
  }

  private val nationPrioritySpendPageSql =
    """WITH cells AS (
      |  SELECT c.c_nationkey AS block, o.o_orderpriority AS treatment,
      |    sum(CAST(floor(o.o_totalprice) AS BIGINT)) AS dollars
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2
      |),
      |guarded AS (
      |  SELECT *,
      |    count(DISTINCT treatment) OVER (PARTITION BY block) AS k_chk,
      |    count(*) OVER (PARTITION BY block) AS n_chk,
      |    count(DISTINCT treatment) OVER () AS k_all
      |  FROM cells
      |),
      |complete AS (
      |  SELECT * FROM guarded WHERE k_chk = k_all AND n_chk = k_all
      |),
      |ranked AS (
      |  SELECT k_all,
      |    row_number() OVER (PARTITION BY block
      |      ORDER BY dollars, treatment) AS rk,
      |    dense_rank() OVER (ORDER BY treatment) AS j
      |  FROM complete
      |),
      |folded AS (
      |  SELECT sum(j * rk) AS l_stat,
      |    CAST(count(*) // max(k_all) AS BIGINT) AS b_blocks,
      |    max(k_all) AS k_treat
      |  FROM ranked
      |),
      |ext AS (
      |  SELECT b_blocks, k_treat, l_stat,
      |    b_blocks * k_treat * (k_treat + 1) * (k_treat + 1) AS e4,
      |    b_blocks * k_treat * k_treat * (k_treat + 1)
      |      * (k_treat * k_treat - 1) AS var144
      |  FROM folded
      |)
      |SELECT b_blocks, CAST(k_treat AS BIGINT) AS k_treat,
      |  CAST(l_stat AS BIGINT) AS l_stat,
      |  CAST(e4 * 250 AS BIGINT) AS e_l_milli,
      |  CAST(floor((l_stat::DOUBLE - e4::DOUBLE / 4.0::DOUBLE)
      |    / sqrt(var144::DOUBLE / 144.0::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS z_micro
      |FROM ext""".stripMargin

  // --------------------------------------------------------------- q249
  /** Bartlett's test of equal variances (Bartlett 1937) — the parametric
    * dispersion companion: [[brownForsythe]] (q243) is the robust
    * median-centered answer; Bartlett is the classical likelihood-ratio
    * form the textbooks pair with ANOVA,
    * X² = [(N−k)·ln s_p² − Σ(n_i−1)·ln s_i²] / C with
    * C = 1 + (Σ1/(n_i−1) − 1/(N−k)) / (3(k−1)).
    *
    * Exactness: per-group sufficient sums ride exact BIGINT; each
    * group's (n_i−1)·ln s_i² term — the reduction-order-sensitive
    * piece — is ONE fixed double sequence floored to an exact micro
    * integer PER GROUP before summing (the q205/q183 no-float-reduction
    * discipline lifted to log space; ln parity across engines is the
    * q108/q159 precedent), as is each 1/(n_i−1) term in ppb. The final
    * statistic is one fixed double sequence over those integers.
    *
    * Scale shape: identical to q205 — one fact scan → k-group
    * aggregate → one k-row fold.
    */
  def bartlett(perRow: DataFrame, groupCol: String,
               valueCol: String): DataFrame =
    perRow
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("s"),
        sum(col(valueCol) * col(valueCol)).as("ss"))
      .filter(col("n") >= 2L)
      // s2_i = (ss - s^2/n)/(n-1), one fixed sequence; the per-group
      // ln term and the reciprocal are floored to integers pre-sum.
      .withColumn("lnterm_micro", floor(
        (col("n") - 1L).cast("double")
          * log((col("ss").cast("double")
            - col("s").cast("double") * col("s").cast("double")
              / col("n").cast("double"))
            / (col("n") - 1L).cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("inv_ppb", floor(lit(1.0e9)
        / (col("n") - 1L).cast("double") + lit(0.5)).cast("long"))
      // Pooled variance is the WITHIN-group SS (q205's ssw): per-group
      // s^2/n floored once, never the grand-mean total SS.
      .withColumn("tg", floor(col("s").cast("double") * col("s").cast("double")
        / col("n").cast("double") + lit(0.5)).cast("long"))
      .agg(count(lit(1)).as("k_groups"), sum("n").as("n_total"),
        sum("ss").as("ss_total"), sum("tg").as("tg_total"),
        sum("lnterm_micro").as("ln_sum_micro"), sum("inv_ppb").as("inv_ppb"))
      .withColumn("sp2",
        (col("ss_total") - col("tg_total")).cast("double")
          / (col("n_total") - col("k_groups")).cast("double"))
      .withColumn("chi2_micro", floor(
        ((col("n_total") - col("k_groups")).cast("double") * log(col("sp2"))
          - col("ln_sum_micro").cast("double") / lit(1000000.0))
          / (lit(1.0)
            + (col("inv_ppb").cast("double") / lit(1.0e9)
              - lit(1.0) / (col("n_total") - col("k_groups")).cast("double"))
              / (lit(3.0) * (col("k_groups") - 1L).cast("double")))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .select(col("k_groups"), col("n_total"), col("chi2_micro"))

  /** Gated q249: Bartlett's equal-variance verdict on order spend
    * (whole dollars) across order priorities — the parametric reading
    * next to q243's robust W on the same fixture.
    */
  def prioritySpendBartlett(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"),
        floor(col("o_totalprice")).cast("long").as("dollars"))
    bartlett(rows, "priority", "dollars")
  }

  private val prioritySpendBartlettSql =
    """WITH rows_ AS (
      |  SELECT o_orderpriority AS g,
      |    CAST(floor(o_totalprice) AS BIGINT) AS v
      |  FROM orders
      |),
      |grp AS (
      |  SELECT g, count(*) AS n, sum(v) AS s, sum(v * v) AS ss
      |  FROM rows_ GROUP BY 1 HAVING count(*) >= 2
      |),
      |terms AS (
      |  SELECT g, n, s, ss,
      |    CAST(floor((n - 1)::DOUBLE
      |      * ln((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
      |        / (n - 1)::DOUBLE)
      |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS lnterm_micro,
      |    CAST(floor(1.0e9::DOUBLE / (n - 1)::DOUBLE + 0.5::DOUBLE)
      |      AS BIGINT) AS inv_ppb,
      |    CAST(floor(s::DOUBLE * s::DOUBLE / n::DOUBLE + 0.5::DOUBLE)
      |      AS BIGINT) AS tg
      |  FROM grp
      |),
      |tot AS (
      |  SELECT count(*) AS k_groups, sum(n) AS n_total,
      |    sum(ss) AS ss_total, sum(tg) AS tg_total,
      |    sum(lnterm_micro) AS ln_sum_micro, sum(inv_ppb) AS inv_ppb
      |  FROM terms
      |),
      |sp AS (
      |  SELECT *,
      |    (ss_total - tg_total)::DOUBLE
      |      / (n_total - k_groups)::DOUBLE AS sp2
      |  FROM tot
      |)
      |SELECT CAST(k_groups AS BIGINT) AS k_groups,
      |  CAST(n_total AS BIGINT) AS n_total,
      |  CAST(floor(
      |    ((n_total - k_groups)::DOUBLE * ln(sp2)
      |      - ln_sum_micro::DOUBLE / 1000000.0::DOUBLE)
      |    / (1.0::DOUBLE
      |      + (inv_ppb::DOUBLE / 1.0e9::DOUBLE
      |        - 1.0::DOUBLE / (n_total - k_groups)::DOUBLE)
      |        / (3.0::DOUBLE * (k_groups - 1)::DOUBLE))
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS chi2_micro
      |FROM sp""".stripMargin

  // --------------------------------------------------------------- q250
  /** Grubbs' maximum-deviation outlier statistic (Grubbs 1950) per
    * group — G = max|x − x̄| / s, the single-outlier screen the robust
    * battery (q82's MAD fences) reads next to: which value deviates
    * most, and by how many sample standard deviations?
    *
    * Exactness: the deviation argmax rides the INTEGER domain —
    * |n·x − S| is an exact BIGINT per row (n·max|x − x̄| scaled), so the
    * winning row and the (dev, value-desc) tie-break are engine-exact;
    * G is one fixed double sequence over (maxdev, n, ss, s), floored
    * to micro.
    *
    * Scale shape: one fact scan → per-group aggregate of sufficient
    * sums + integer argmax (all fully partial, no window, no second
    * scan — the deviation needs the group mean, so the argmax runs on
    * max(struct(|n·x−S|, x)) over a self-contained re-aggregation of
    * the same (group, value) cells).
    */
  def grubbsMax(perRow: DataFrame, groupCol: String,
                valueCol: String): DataFrame = {
    val cells = perRow
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("n_gv"))
      .localCheckpoint()
    val grp = cells.groupBy("g")
      .agg(sum("n_gv").as("n"),
        sum(col("n_gv") * col("v")).as("s"),
        sum(col("n_gv") * col("v") * col("v")).as("ss"))
    cells.join(grp, Seq("g"))
      .withColumn("dev", abs(col("v") * col("n") - col("s")))
      .groupBy("g")
      .agg(max("n").as("n"), max("s").as("s"), max("ss").as("ss"),
        max(struct(col("dev"), col("v"))).as("top"))
      .filter(col("n") >= 3L)
      .select(col("g"), col("n"), col("top.v").as("outlier_v"),
        floor((col("top.dev").cast("double") / col("n").cast("double"))
          / sqrt((col("ss").cast("double")
            - col("s").cast("double") * col("s").cast("double")
              / col("n").cast("double"))
            / (col("n") - 1L).cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("g_micro"))
  }

  /** Gated q250: per market segment, the most deviant order spend
    * (whole dollars) and its Grubbs G in micro-units.
    */
  def segmentSpendGrubbs(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        floor(col("o_totalprice")).cast("long").as("dollars"))
    grubbsMax(rows, "segment", "dollars")
      .withColumnRenamed("g", "segment")
  }

  private val segmentSpendGrubbsSql =
    """WITH rows_ AS (
      |  SELECT c.c_mktsegment AS g,
      |    CAST(floor(o.o_totalprice) AS BIGINT) AS v
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |),
      |cells AS (
      |  SELECT g, v, count(*) AS n_gv FROM rows_ GROUP BY 1, 2
      |),
      |grp AS (
      |  SELECT g, sum(n_gv) AS n, sum(n_gv * v) AS s,
      |    sum(n_gv * v * v) AS ss
      |  FROM cells GROUP BY 1
      |),
      |dev AS (
      |  SELECT c.g, grp.n, grp.s, grp.ss,
      |    max(ROW(abs(c.v * grp.n - grp.s), c.v)) AS top
      |  FROM cells c JOIN grp ON grp.g = c.g
      |  GROUP BY 1, 2, 3, 4
      |)
      |SELECT g AS segment, CAST(n AS BIGINT) AS n,
      |  CAST(top[2] AS BIGINT) AS outlier_v,
      |  CAST(floor((top[1]::DOUBLE / n::DOUBLE)
      |    / sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
      |      / (n - 1)::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS g_micro
      |FROM dev WHERE n >= 3""".stripMargin

  // --------------------------------------------------------------- q252
  /** Two-sample Cramér–von Mises criterion (Anderson 1962) — the
    * INTEGRAL-norm two-sample test next to [[ksAgainstRest]]'s sup-norm
    * (q116): T = n1·n2/(n1+n2)² · Σ over all pooled observations of
    * (F1(x) − F2(x))², sensitive to distributed small differences where
    * KS sees only the single largest gap.
    *
    * Exactness: on the pooled value domain, F1−F2 at value v is the
    * rational (cum1·n2 − cum2·n1)/(n1·n2); the weighted square sum
    * U = Σ_v t_v·(cum1·n2 − cum2·n1)² rides DECIMAL(38,0) end to end
    * (cum·n ≤ N² per term), so T is ONE fixed double sequence over
    * exact integers, floored to micro.
    *
    * Scale shape: the q214 value-domain discipline — one corpus scan to
    * (cohort, value) cells; cumulative counts are two windows over the
    * price-bounded pooled frame; no corpus sort, no pair join.
    */
  def cramerVonMises(perRow: DataFrame, isACol: String,
                     valueCol: String): DataFrame = {
    val cells = perRow
      .groupBy(col(valueCol).as("v"))
      .agg(sum(when(col(isACol), 1L).otherwise(0L)).as("c1"),
        sum(when(col(isACol), 0L).otherwise(1L)).as("c2"))
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    cells
      .withColumn("cum1", sum("c1").over(wCum))
      .withColumn("cum2", sum("c2").over(wCum))
      .withColumn("na", sum("c1").over(wAll))
      .withColumn("nb", sum("c2").over(wAll))
      .withColumn("diff",
        (col("cum1") * col("nb") - col("cum2") * col("na"))
          .cast("decimal(38,0)"))
      .agg(max("na").as("n1"), max("nb").as("n2"),
        sum(col("diff") * col("diff") * (col("c1") + col("c2"))).as("u"))
      .withColumn("t_micro", floor(
        col("u").cast("double")
          / (col("n1").cast("double") * col("n2").cast("double")
            * (col("n1") + col("n2")).cast("double")
            * (col("n1") + col("n2")).cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .select(col("n1"), col("n2"), col("t_micro"))
  }

  /** Gated q252: BUILDING vs MACHINERY order spend (cents — the q116
    * unit) under the integral norm. One row: n1, n2, T in micro-units —
    * read next to q116's per-segment KS sup-norm.
    */
  def segmentPriceCvm(spark: SparkSession, dir: String): DataFrame = {
    val obs = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select((col("c_mktsegment") === "BUILDING").as("is_a"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    cramerVonMises(obs, "is_a", "cents")
  }

  private val segmentPriceCvmSql =
    """WITH obs AS (
      |  SELECT c.c_mktsegment = 'BUILDING' AS is_a,
      |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
      |),
      |cells AS (
      |  SELECT v, sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS c1,
      |    sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS c2
      |  FROM obs GROUP BY 1
      |),
      |cum AS (
      |  SELECT c1, c2,
      |    sum(c1) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
      |    sum(c2) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
      |    sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
      |  FROM cells
      |),
      |folded AS (
      |  SELECT max(n1) AS n1, max(n2) AS n2,
      |    sum((cum1 * n2 - cum2 * n1)::HUGEINT
      |      * (cum1 * n2 - cum2 * n1) * (c1 + c2)) AS u
      |  FROM cum
      |)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST(floor(u::DOUBLE
      |    / (n1::DOUBLE * n2::DOUBLE * (n1 + n2)::DOUBLE * (n1 + n2)::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS t_micro
      |FROM folded""".stripMargin

  // --------------------------------------------------------------- q253
  /** Wilcoxon signed-rank test (Wilcoxon 1945) — the PAIRED member of
    * the rank battery ([[mannWhitney]] compares two independent
    * cohorts; this compares each subject to ITSELF): over per-subject
    * differences d, rank |d| (zeros dropped), W+ = Σ ranks of positive
    * d, z = (W+ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(t³−t)/48).
    *
    * Exactness: the q214 doubled-rank trick on the |d| value domain —
    * rank2 = 2·avg-rank exact BIGINT, so W2+ = Σ_{d>0} rank2(|d|) is
    * exact (= 2W+) and the z numerator 2W+ − n(n+1)/2 is an exact
    * integer over doubled units; tie cubes ride DECIMAL(38,0); z is one
    * fixed double sequence floored to micro.
    *
    * Scale shape: one scan to per-subject sums, one |d|-domain cell
    * aggregate, rank windows on the bounded value frame — no corpus
    * sort (subjects-sized at worst, value-domain after the cells).
    */
  def wilcoxonSignedRank(diffs: DataFrame, dCol: String): DataFrame = {
    val cells = diffs.select(col(dCol).cast("long").as("d"))
      .filter(col("d") =!= 0L)
      .select(abs(col("d")).as("ad"), (col("d") > 0L).as("pos"))
      .groupBy("ad")
      .agg(count(lit(1)).as("t_v"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
    val wBelow = Window.orderBy(col("ad"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cells
      .withColumn("rank2",
        coalesce(sum("t_v").over(wBelow), lit(0L)) * 2L + col("t_v") + 1L)
      .agg(sum("t_v").as("n_pairs"),
        sum(col("n_pos") * col("rank2")).as("w2_plus"),
        sum(col("t_v").cast("decimal(38,0)") * col("t_v") * col("t_v")
          - col("t_v")).as("tie_sum"))
      .withColumn("z_micro", floor(
        (col("w2_plus").cast("double")
          - col("n_pairs").cast("double")
            * (col("n_pairs").cast("double") + lit(1.0)) / lit(2.0))
          / sqrt(col("n_pairs").cast("double")
            * (col("n_pairs").cast("double") + lit(1.0))
            * (lit(2.0) * col("n_pairs").cast("double") + lit(1.0)) / lit(6.0)
            - col("tie_sum").cast("double") / lit(12.0))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .select(col("n_pairs"), col("w2_plus"), col("z_micro"))
  }

  /** Gated q253: per customer, did spend SHIFT between the first and
    * second half of the order history (split at 1999-01-01)? d =
    * whole-dollar spend(≥1999) − spend(<1999) per customer, zeros
    * dropped. One row: n pairs, doubled W+, z in micro-units.
    */
  def customerSpendShiftWilcoxon(spark: SparkSession,
                                 dir: String): DataFrame = {
    val d = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg((sum(when(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"),
        floor(col("o_totalprice")).cast("long")).otherwise(0L))
        - sum(when(col("o_orderdate") < lit("1999-01-01").cast("timestamp"),
          floor(col("o_totalprice")).cast("long")).otherwise(0L))).as("d"))
    wilcoxonSignedRank(d, "d")
  }

  private val customerSpendShiftWilcoxonSql =
    """WITH d AS (
      |  SELECT o_custkey,
      |    sum(CASE WHEN o_orderdate >= TIMESTAMP '1999-01-01'
      |      THEN CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END)
      |    - sum(CASE WHEN o_orderdate < TIMESTAMP '1999-01-01'
      |      THEN CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END) AS d
      |  FROM orders GROUP BY 1
      |),
      |cells AS (
      |  SELECT abs(d) AS ad, count(*) AS t_v,
      |    sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS n_pos
      |  FROM d WHERE d <> 0 GROUP BY 1
      |),
      |ranked AS (
      |  SELECT t_v, n_pos,
      |    coalesce(sum(t_v) OVER (ORDER BY ad
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
      |      + t_v + 1 AS rank2
      |  FROM cells
      |),
      |folded AS (
      |  SELECT sum(t_v) AS n_pairs, sum(n_pos * rank2) AS w2_plus,
      |    sum(t_v::HUGEINT * t_v * t_v - t_v) AS tie_sum
      |  FROM ranked
      |)
      |SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
      |  CAST(w2_plus AS BIGINT) AS w2_plus,
      |  CAST(floor(
      |    (w2_plus::DOUBLE - n_pairs::DOUBLE * (n_pairs::DOUBLE + 1.0::DOUBLE)
      |      / 2.0::DOUBLE)
      |    / sqrt(n_pairs::DOUBLE * (n_pairs::DOUBLE + 1.0::DOUBLE)
      |      * (2.0::DOUBLE * n_pairs::DOUBLE + 1.0::DOUBLE) / 6.0::DOUBLE
      |      - tie_sum::DOUBLE / 12.0::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS z_micro
      |FROM folded""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q252_cvm_two_sample", segmentPriceCvm _,
      Some(segmentPriceCvmSql)),
    NamedQuery("q253_wilcoxon_signed_rank", customerSpendShiftWilcoxon _,
      Some(customerSpendShiftWilcoxonSql)),
    NamedQuery("q249_bartlett_variance", prioritySpendBartlett _,
      Some(prioritySpendBartlettSql)),
    NamedQuery("q250_grubbs_outlier", segmentSpendGrubbs _,
      Some(segmentSpendGrubbsSql)),
    NamedQuery("q248_page_trend", nationPrioritySpendPage _,
      Some(nationPrioritySpendPageSql)),
    NamedQuery("q243_levene_dispersion", prioritySpendLevene _,
      Some(prioritySpendLeveneSql)),
    NamedQuery("q244_dunn_posthoc", segmentSpendDunn _,
      Some(segmentSpendDunnSql)),
    NamedQuery("q232_jonckheere", prioritySpendJt _, Some(jtSql)),
    NamedQuery("q230_moods_median", segmentMedianTest _,
      Some(moodsMedianSql)),
    NamedQuery("q229_overdispersion", segmentOrderDispersion _,
      Some(dispersionSql)),
    NamedQuery("q228_friedman_test", segmentWeeklyFriedman _,
      Some(friedmanSql)),
    NamedQuery("q227_hill_tail", spendTailIndex _, Some(spendTailSql)),
    NamedQuery("q226_cmh_stratified", sourceStratifiedCmh _, Some(cmhSql)),
    NamedQuery("q221_cochran_armitage", priorityBigOrderTrend _,
      Some(priorityTrendSql)),
    NamedQuery("q217_lorenz_deciles", customerSpendLorenz _,
      Some(customerSpendLorenzSql)),
    NamedQuery("q214_kruskal_wallis", segmentSpendKruskal _,
      Some(segmentSpendKruskalSql)),
    NamedQuery("q205_spend_anova", segmentSpendAnova _,
      Some(segmentSpendAnovaSql)),
    NamedQuery("q204_source_lang_mi", sourceLangMi _, Some(sourceLangMiSql)),
    NamedQuery("q201_sprt_trace", conversionSprt _, Some(conversionSprtSql)),
    NamedQuery("q197_standardized_rates", segmentStandardizedSpend _,
      Some(segmentStandardizedSpendSql)),
    NamedQuery("q192_bootstrap_ci", docLengthBootstrap _,
      Some(docLengthBootstrapSql)),
    NamedQuery("q193_eb_shrinkage", userConversionShrinkage _,
      Some(userConversionShrinkageSql)),
    NamedQuery("q188_neyman_allocation", auditSampleAllocation _,
      Some(auditSampleAllocationSql)),
    NamedQuery("q189_diff_in_diff", segmentSpendDiD _,
      Some(segmentSpendDiDSql)),
    NamedQuery("q183_psi_drift", priceDriftPsi _, Some(priceDriftPsiSql)),
    NamedQuery("q179_kendall_tau", revenueVolumeKendall _,
      Some(revenueVolumeKendallSql)),
    NamedQuery("q167_cuped_reduction", cupedVarianceReduction _,
      Some(cupedSql)),
    NamedQuery("q163_conversion_ztest", conversionZTest _,
      Some(conversionZTestSql)),
    NamedQuery("q138_quantile_norm", docLengthQuantileNorm _,
      Some(docLengthQuantileNormSql)),
    NamedQuery("q135_pr_curve", docLengthPrCurve _, Some(docLengthPrCurveSql)),
    NamedQuery("q116_ks_drift", segmentPriceKs _, Some(segmentPriceKsSql)),
    NamedQuery("q105_spearman_rank_corr", revenueVolumeSpearman _,
      Some(revenueVolumeSpearmanSql)),
    NamedQuery("q107_mann_whitney", segmentSpendMannWhitney _,
      Some(segmentSpendMannWhitneySql)),
    NamedQuery("q111_chi_square", segmentPriorityChiSquare _,
      Some(segmentPriorityChiSquareSql)))
}
