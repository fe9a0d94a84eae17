package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exactly-once streaming sink for exact substring decontamination —
  * q233's streaming face (r13 verdict item 7), completing the symmetry
  * that every curation-critical operator has one.
  *
  * Why this one is an APPEND table rather than a fold: given the fixed
  * eval gram set, each training doc's contamination row is independent
  * of every other doc, so the streaming form needs no merge step — each
  * micro-batch's scored rows land in a deterministic `deltas/batch=N`
  * dir committed by the `stats.last_batch` marker ([[StateFiles]] staged
  * swap), and [[snapshot]] is the union of committed dirs. The
  * foreachBatch epoch is the batch id: a crash-replayed epoch either
  * overwrites identical bytes (uncommitted) or short-circuits
  * (committed) — the index-family protocol verbatim.
  *
  * 100 TB shape inherits [[graft.analytics.TrainingData.substringOverlap]]'s:
  * the eval side is a benchmark suite (tiny by construction), so its
  * distinct gram set broadcasts and each micro-batch costs one scan +
  * posexplode + broadcast probe + matched-rows-only islands window —
  * the training stream is never shuffled for the probe.
  */
object DecontamState {

  private def deltasPath(root: String) = s"$root/deltas"
  private def statsPath(root: String) = s"$root/stats"

  private def readLast(spark: SparkSession, root: String): Option[Long] =
    StateFiles.readMarker(spark, statsPath(root))
      .map(_("last_batch").asInstanceOf[Long])

  /** Score one training micro-batch against `evalDocs` and commit the
    * per-doc contamination rows; returns the committed batch id.
    * `batchId` defaults to last_batch + 1; pass the foreachBatch epoch
    * for replay idempotence.
    */
  def update(spark: SparkSession, statePath: String, evalDocs: DataFrame,
             batch: DataFrame, k: Int = 3, minRun: Int = 8,
             idCol: String = "doc_id", textCol: String = "text",
             batchId: Option[Long] = None, lease: Boolean = false): Long =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statsPath(statePath))
        val last = readLast(spark, statePath).getOrElse(-1L)
        val id = batchId.getOrElse(last + 1)
        if (id > last) { // else: committed replay, every effect installed
          graft.analytics.TrainingData
            .substringOverlap(batch, evalDocs, k, minRun, idCol, textCol)
            .coalesce(1) // one micro-batch of per-doc rows: one file
            .write.mode("overwrite")
            .parquet(s"${deltasPath(statePath)}/batch=$id")
          StateFiles.installMarker(spark, statsPath(statePath),
            Seq("last_batch" -> id))
        }
        math.max(id, last)
      }
    }

  /** Every committed contamination row (batches ≤ last_batch — orphan
    * dirs from a crashed update are excluded until their replay
    * commits them).
    */
  def snapshot(spark: SparkSession, statePath: String): DataFrame = {
    val last = readLast(spark, statePath)
      .getOrElse(sys.error(s"DecontamState.snapshot: no state at $statePath"))
    spark.read.parquet(deltasPath(statePath))
      .filter(col("batch") <= last)
      .drop("batch")
  }
}
