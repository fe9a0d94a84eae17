package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.QuantileSketch

/** Incremental percentile maintenance via mergeable Greenwald–Khanna
  * sketches — the quantile sibling of [[SketchState]]'s HLL distinct
  * counts: each batch collapses to one bytes-sized sketch per group
  * ([[QuantileSketch.BuildAgg]]), the persisted state union-merges
  * in-place ([[QuantileSketch.MergeAgg]] — associative, any batch
  * split), and "p50/p95/p99 so far" is readable at any time from the
  * state table alone. At 100 TB this replaces "re-aggregate all history
  * for tonight's latency percentiles": state is groups × sketch bytes
  * (KBs at ε=0.01) regardless of how many rows ever streamed through,
  * and each update's work is ∝ the batch, never the history.
  *
  * Accuracy: rank error ≤ ~2·ε·n for balanced merge trees (B·ε·n
  * adversarially, the GK merge bound) — so a replayed fold agrees with
  * the one-shot sketch within sketch error, not bit-for-bit (HLL's
  * register-max idempotence has no quantile analogue; re-merging the
  * SAME batch twice double-counts its rows' ranks. Exactly-once batch
  * delivery is the caller's contract, same as [[Checkpoints]] provides).
  *
  * Persistence is the [[StateFiles]] staged swap; `lease = true` adds
  * the cross-driver [[LeaseLock]] (the MergeWriter contract) for state
  * shared between drivers.
  */
object QuantileState {

  private val SketchCol = "__q_sketch"

  /** Fold one batch into the quantile state at `statePath`: per-group
    * sketches of `valueCol` (nulls dropped) merge with the stored
    * sketches. Returns the post-merge estimates for `percentiles`,
    * eagerly materialized (localCheckpoint) so the snapshot survives the
    * next update's file swap.
    */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
             groupCols: Seq[String], valueCol: String,
             percentiles: Seq[Double] = Seq(0.5, 0.95, 0.99),
             relativeError: Double = 0.01,
             lease: Boolean = false): DataFrame =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statePath)
        val gs = groupCols.map(col)
        val values = batch.na.drop(Seq(valueCol))
        val batchSketches = values.groupBy(gs: _*)
          .agg(QuantileSketch.sketchAgg(
            values, col(valueCol).cast("double"), relativeError).as(SketchCol))
        val merged =
          if (!StateFiles.exists(spark, statePath)) {
            batchSketches
          } else {
            val unioned = spark.read.parquet(statePath).unionByName(batchSketches)
            unioned.groupBy(gs: _*)
              .agg(QuantileSketch.mergeAgg(
                unioned, col(SketchCol), relativeError).as(SketchCol))
          }
        StateFiles.install(spark, statePath, merged)
        estimates(spark, statePath, groupCols, percentiles).localCheckpoint(eager = true)
      }
    }

  /** Current per-group percentile estimates — a state-table read, no raw
    * history scan. One `p<percentile>` column per requested percentile.
    */
  def estimates(spark: SparkSession, statePath: String, groupCols: Seq[String],
                percentiles: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    val vals = QuantileSketch.queryValues(col(SketchCol), percentiles)
    val pCols = percentiles.zipWithIndex.map { case (p, i) =>
      element_at(vals, i + 1).as(pName(p))
    }
    spark.read.parquet(statePath)
      .select(groupCols.map(col) ++ pCols: _*)
  }

  /** 0.95 → "p95", 0.999 → "p99_9", 0.9995 → "p99_95" (column-name-safe;
    * the FULL fractional part survives, so nearby percentiles like 0.951
    * vs 0.9505 get distinct names instead of colliding).
    */
  private def pName(p: Double): String = {
    val pct = (BigDecimal(p) * 100).bigDecimal.stripTrailingZeros.toPlainString
    "p" + (pct.split('.') match {
      case Array(whole)       => whole
      case Array(whole, frac) => s"${whole}_$frac"
    })
  }

  // ---------------------------------------------------------------- q70
  /** End-to-end incremental-quantile gate: fold orders into the state
    * table in 3 batches (split by order key), then verify each group's
    * p50/p95 estimate against the EXACT rank it holds in the full
    * corpus — the rank must land within the GK merge error. Like q69
    * the oracle gates an invariant (all-TRUE booleans hash-compared),
    * because a sketch's exact output is legitimately
    * partitioning-dependent; a broken merge, a lost batch, or a stale
    * state read flips a flag and fails the hash.
    */
  def quantileStateCheck(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.core.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast("double").as("price"))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-qstate")
    val statePath = stateRoot.toString + "/state"
    val ps = Seq(0.5, 0.95)
    (0 until 3).foreach { i =>
      update(spark, statePath, orders.filter(col("o_orderkey") % 3 === i),
        Seq("o_orderpriority"), "price", ps)
    }
    // ε=0.01 sketches, 3-batch fold → rank error ≲ 4ε; 5% headroom.
    // Eager checkpoint so the scratch state dir can be reclaimed NOW
    // (bench reps + correctness runs would otherwise accumulate in /tmp).
    val est = estimates(spark, statePath, Seq("o_orderpriority"), ps)
      .localCheckpoint(eager = true)
      .withColumnRenamed("o_orderpriority", "__g")
    graft.core.Fs.deleteRecursively(stateRoot)
    orders.join(broadcast(est), col("o_orderpriority") === col("__g"))
      .groupBy("o_orderpriority")
      .agg(
        (abs(avg((col("price") < col("p50")).cast("int")) - 0.5) < 0.05).as("p50_ok"),
        (abs(avg((col("price") < col("p95")).cast("int")) - 0.95) < 0.05).as("p95_ok"))
  }

  private val quantileStateCheckSql =
    """SELECT o_orderpriority, TRUE AS p50_ok, TRUE AS p95_ok
      |FROM orders GROUP BY 1""".stripMargin

  val queries: Seq[graft.NamedQuery] = Seq(
    graft.NamedQuery("q70_quantile_state", quantileStateCheck _,
      Some(quantileStateCheckSql)))
}
