package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** Bin-bucketed range (interval) joins.
  *
  * A point-in-interval join has no equi-key, so Spark's only built-in
  * physical choice is a broadcast-nested-loop / cartesian plan — O(|P|·|I|)
  * comparisons, the classic 100 TB scale-killer (reference analogue: the
  * date-window report filters of report.py:21-38, which pandas evaluates
  * as full-column boolean masks per window).
  *
  * The standard distributed fix, implemented here: quantize the domain
  * into fixed-width bins. Each point belongs to exactly one bin; each
  * interval is exploded to every bin it overlaps (≤ ⌈len/binWidth⌉ + 1
  * rows). The join becomes an EQUI-join on the bin id with the exact
  * range predicate as a residual filter, so Catalyst picks shuffle-hash /
  * sort-merge (or broadcast when one side is small), partitions by bin,
  * and scales linearly in points + interval-bin pairs. Each qualifying
  * (point, interval) pair matches in exactly one bin — the point's — so
  * no post-join dedup is needed.
  *
  * Bin width is the one tuning knob: ~the typical interval length keeps
  * the interval blow-up ≤ 2× while keeping bins selective. Skewed bins
  * (a hot time window) are AQE's skew-join case, not a correctness issue.
  */
object RangeJoin {

  /** Join `points` to every interval of `intervals` containing them:
    * result rows are the matched (point, interval) column concatenation.
    * `ptCol`/`loCol`/`hiCol` are numeric (cast timestamps to epoch
    * seconds first); `hiCol` is EXCLUSIVE. Empty intervals (hi ≤ lo)
    * drop out. Column names must be disjoint across the two frames.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bin(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / binWidth).cast("long")
    val p = points.withColumn("__bin", bin(col(ptCol)))
    val iv = intervals
      .filter(col(loCol) < col(hiCol))
      .withColumn("__bin", explode(sequence(bin(col(loCol)), bin(col(hiCol) - 1))))
    p.join(iv, Seq("__bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bin")
  }

  // ---------------------------------------------------------------- q55
  /** Shipments falling in each sampled order's 30-day activity window —
    * a pure range join (no equi-key relates the sides): every ~101st
    * order opens [o_orderdate, +30 days) and the count is over ALL
    * lineitem ship dates in that window, zero-count windows kept. The
    * bin width equals the window length, so each interval explodes to at
    * most 2 bins and the plan is equi-join-shaped end to end — the
    * RangeJoinSpec plan audit asserts no nested-loop join survives.
    */
  def intervalShipmentCounts(spark: SparkSession, dir: String): DataFrame = {
    val win = 30L * 86400
    // NTZ → epoch via a UTC-session timestamp cast: linear (UTC has no
    // DST), so epoch-domain binning matches the oracle's naive-timestamp
    // comparisons exactly.
    def epoch(c: org.apache.spark.sql.Column) = c.cast("timestamp").cast("long")
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 101 === 0)
      .select(col("o_orderkey"),
        epoch(col("o_orderdate")).as("lo"),
        (epoch(col("o_orderdate")) + win).as("hi"))
    val points = Tables.lineitem(spark, dir)
      .select(epoch(col("l_shipdate")).as("pt"))
    val counts = pointInInterval(points, "pt", orders, "lo", "hi", binWidth = win)
      .groupBy("o_orderkey").agg(count(lit(1)).as("n_shipments"))
    orders.select("o_orderkey")
      .join(counts, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"), coalesce(col("n_shipments"), lit(0L)).as("n_shipments"))
  }

  private val intervalShipmentCountsSql =
    """WITH win AS (
      |  SELECT o_orderkey, o_orderdate AS lo, o_orderdate + INTERVAL 30 DAY AS hi
      |  FROM orders WHERE o_orderkey % 101 = 0
      |)
      |SELECT w.o_orderkey,
      |  CAST(count(l.l_shipdate) AS BIGINT) AS n_shipments
      |FROM win w LEFT JOIN lineitem l
      |  ON l.l_shipdate >= w.lo AND l.l_shipdate < w.hi
      |GROUP BY w.o_orderkey""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q55_interval_shipments", intervalShipmentCounts _, Some(intervalShipmentCountsSql)))
}
