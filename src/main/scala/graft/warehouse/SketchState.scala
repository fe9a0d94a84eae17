package graft.warehouse

import org.apache.hadoop.fs.Path
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
  * discipline); single-writer per state path (same contract as merge).
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
             groupCols: Seq[String], itemCol: String): DataFrame =
    graft.core.PathLocks.forPath(statePath).synchronized {
      val p0 = new Path(statePath)
      val hfs0 = p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // Crash recovery (the Checkpoints discipline): a kill between the
      // two swap renames leaves the live path missing and the only copy
      // in .bak — restore it, or the next update would silently rebuild
      // state from one batch and delete all accumulated history.
      val bak0 = new Path(p0.getParent, s".bak_${p0.getName}")
      if (!hfs0.exists(p0) && hfs0.exists(bak0)) {
        if (!hfs0.rename(bak0, p0)) sys.error(s"state recovery failed for $p0")
      }
      val gs = groupCols.map(col)
      val batchSketches = batch.groupBy(gs: _*)
        .agg(expr(s"hll_sketch_agg($itemCol)").as(SketchCol))
      val merged =
        if (!hfs0.exists(p0)) {
          batchSketches
        } else {
          spark.read.parquet(statePath)
            .unionByName(batchSketches)
            .groupBy(gs: _*)
            .agg(expr(s"hll_union_agg($SketchCol)").as(SketchCol))
        }
      // Two-rename staged swap: the state must never be half-written.
      val p = new Path(statePath)
      val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new Path(p.getParent, s".tmp_${p.getName}")
      val bak = new Path(p.getParent, s".bak_${p.getName}")
      merged.write.mode("overwrite").parquet(tmp.toString)
      if (hfs.exists(bak)) hfs.delete(bak, true)
      if (hfs.exists(p) && !hfs.rename(p, bak)) sys.error(s"state backup failed for $p")
      if (!hfs.rename(tmp, p)) {
        hfs.rename(bak, p)
        sys.error(s"state install failed for $p")
      }
      hfs.delete(bak, true)
      // Estimates are groups-sized (KB/group sketches collapsed to one
      // double each) — cheap to pin; lazy file-listing lineage is not.
      estimates(spark, statePath, groupCols).localCheckpoint(eager = true)
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
