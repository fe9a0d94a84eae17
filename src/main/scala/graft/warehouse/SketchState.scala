package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental distinct-count maintenance via mergeable HLL sketches —
  * the pattern that replaces "recount distinct users from all history
  * every night" at 100 TB: each batch collapses to one
  * DataSketches-HLL sketch per group (`hll_sketch_agg`, bytes-sized),
  * the persisted state unions in-place (`hll_union_agg` — register-max,
  * so merging is associative, commutative, AND idempotent-insensitive
  * to partitioning), and an estimate is readable at any time without
  * touching raw history. State size is groups × sketch bytes (~KB at
  * lgK=12, ~1.6% relative error) regardless of how many items ever
  * streamed through.
  *
  * Determinism: HLL registers are maxes of per-item hashes — the merged
  * sketch, and therefore the estimate, is EXACTLY the same whatever the
  * batch split or partitioning (SketchStateSpec pins replayed batches ==
  * one-shot, bit-for-bit on the estimate).
  *
  * Persistence uses the Checkpoints-style staged swap ([[MergeWriter]]
  * discipline); single-writer per state path (same contract as merge —
  * in-JVM via the path lock, cross-driver opt-in via `lease = true`).
  */
object SketchState {

  private val SketchCol = "__hll_sketch"

  /** Fold one batch into the distinct-count state at `statePath`:
    * per-group sketches of `itemCol` from the batch union-merge with the
    * stored sketches. Returns the post-merge per-group estimates,
    * eagerly materialized (localCheckpoint) — the snapshot stays valid
    * even after a LATER update's two-rename swap deletes the files this
    * read was planned against.
    */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
             groupCols: Seq[String], itemCol: String,
             lease: Boolean = false): DataFrame =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
      // Crash recovery + staged swap: the StateFiles discipline (shared
      // with QuantileState) — state is never observable half-written.
      StateFiles.recover(spark, statePath)
      val gs = groupCols.map(col)
      val batchSketches = batch.groupBy(gs: _*)
        .agg(expr(s"hll_sketch_agg($itemCol)").as(SketchCol))
      val merged =
        if (!StateFiles.exists(spark, statePath)) {
          batchSketches
        } else {
          spark.read.parquet(statePath)
            .unionByName(batchSketches)
            .groupBy(gs: _*)
            .agg(expr(s"hll_union_agg($SketchCol)").as(SketchCol))
        }
      StateFiles.install(spark, statePath, merged)
      // Estimates are groups-sized (KB/group sketches collapsed to one
      // double each) — cheap to pin; lazy file-listing lineage is not.
      estimates(spark, statePath, groupCols).localCheckpoint(eager = true)
      }
    }

  /** Current per-group distinct estimates — a state-table read, no raw
    * history scan.
    */
  def estimates(spark: SparkSession, statePath: String,
                groupCols: Seq[String]): DataFrame =
    spark.read.parquet(statePath)
      .select(groupCols.map(col) :+
        expr(s"hll_sketch_estimate($SketchCol)").as("n_distinct_est"): _*)
}
