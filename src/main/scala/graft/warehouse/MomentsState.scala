package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery

/** Incremental numeric-moments maintenance — the exact-arithmetic member
  * of the state-table family (HLL distincts: [[SketchState]]; GK
  * quantiles: [[QuantileState]]): per group, persist
  * (n, sum, sumsq, min, max) and fold each batch in by plain integer
  * addition / min / max. Those five are a complete mergeable summary for
  * count/sum/mean/variance/extrema, so "tonight's per-group mean and
  * spread" never re-scans history: state is groups-sized, updates cost
  * one batch scan, and every field is an exact BIGINT — replayed batches
  * equal the one-shot aggregate bit-for-bit on ANY partitioning (integer
  * sums are order-independent; this sketch has no error term at all).
  *
  * Same persistence discipline as its siblings: [[StateFiles]] staged
  * swap + crash recovery, in-JVM path lock, opt-in cross-driver
  * [[LeaseLock]].
  *
  * Headroom: sumsq is the binding term — values v with Σv² < 2^63 are
  * exact; for money columns fold DOLLARS (floor), not micro-units
  * (6e5-dollar order totals give Σv² room for ~2.5e7 rows/group; cents
  * would cost 10^4 of that headroom).
  */
object MomentsState {

  /** Fold one batch of `valueCol` (a LongType column) into the moments
    * state at `statePath`; returns the post-merge per-group stats,
    * eagerly materialized so the snapshot survives the next swap.
    */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
             groupCols: Seq[String], valueCol: String,
             lease: Boolean = false): DataFrame =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statePath)
        val gs = groupCols.map(col)
        val v = col(valueCol).cast("long")
        val batchMoments = batch.groupBy(gs: _*).agg(
          count(lit(1)).as("n"), sum(v).as("sum"),
          sum(v * v).as("sumsq"), min(v).as("min"), max(v).as("max"))
        val merged =
          if (!StateFiles.exists(spark, statePath)) batchMoments
          else spark.read.parquet(statePath)
            .unionByName(batchMoments)
            .groupBy(gs: _*)
            .agg(sum("n").as("n"), sum("sum").as("sum"),
              sum("sumsq").as("sumsq"), min("min").as("min"),
              max("max").as("max"))
        StateFiles.install(spark, statePath, merged)
        stats(spark, statePath, groupCols).localCheckpoint(eager = true)
      }
    }

  /** Current per-group stats — a state-table read, no history scan.
    * mean_micro is the exact integer division (1e6·sum) div n.
    */
  def stats(spark: SparkSession, statePath: String,
            groupCols: Seq[String]): DataFrame =
    spark.read.parquet(statePath)
      .select(groupCols.map(col) ++ Seq(col("n"), col("sum"), col("sumsq"),
        col("min"), col("max"),
        expr("(1000000 * sum) div n").as("mean_micro")): _*)

  // --------------------------------------------------------------- q103
  /** End-to-end incremental-moments gate: fold orders (whole DOLLARS)
    * into the state in 3 batches split by order key, then emit each
    * priority class's exact stats. The DuckDB oracle aggregates the full
    * corpus in one shot — so the hash gate proves 3-batch fold ≡
    * one-shot exactly (no error bound to hide behind), which is the
    * whole point of an exact mergeable summary.
    */
  def momentsStateCheck(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.core.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority").as("priority"),
        floor(col("o_totalprice")).cast("long").as("dollars"))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-mstate")
    val statePath = stateRoot.toString + "/state"
    var out: DataFrame = null
    (0 until 3).foreach { i =>
      out = update(spark, statePath, orders.filter(col("o_orderkey") % 3 === i),
        Seq("priority"), "dollars")
    }
    // The final snapshot is checkpointed; reclaim the scratch state now
    // (the q70 lesson — bench reps would otherwise accumulate /tmp dirs).
    graft.core.Fs.deleteRecursively(stateRoot)
    out.select(col("priority"), col("n"), col("sum").as("sum_dollars"),
      col("sumsq"), col("min").as("min_dollars"), col("max").as("max_dollars"),
      col("mean_micro"))
  }

  private val momentsStateSql =
    """SELECT o_orderpriority AS priority, count(*) AS n,
      |  CAST(sum(v) AS BIGINT) AS sum_dollars, CAST(sum(v * v) AS BIGINT) AS sumsq,
      |  min(v) AS min_dollars, max(v) AS max_dollars,
      |  CAST((1000000 * sum(v)) // count(*) AS BIGINT) AS mean_micro
      |FROM (SELECT o_orderpriority, CAST(floor(o_totalprice) AS BIGINT) AS v
      |      FROM orders)
      |GROUP BY 1""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q103_moments_state", momentsStateCheck _, Some(momentsStateSql)))
}
