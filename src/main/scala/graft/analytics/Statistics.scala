package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q105_spearman_rank_corr", revenueVolumeSpearman _,
      Some(revenueVolumeSpearmanSql)))
}
