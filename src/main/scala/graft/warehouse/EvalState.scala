package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery

/** Incremental model-eval monitoring state — the evaluation member of
  * the exact state-table family ([[DriftState]] watches the FEATURE
  * distribution; this watches the SCORED-PREDICTION stream): per
  * (group, score-bin), persist the exact counts (n, pos) — the
  * sufficient statistics behind q174's reliability bins AND q213's
  * threshold sweep — and fold each scored batch in by plain BIGINT
  * addition. Integer sums are order-independent, so stream-built state
  * ≡ the one-shot aggregate bit-for-bit, and "tonight's operating-point
  * table over every prediction ever logged" reads ≤ groups×10 rows of
  * state instead of re-scanning the prediction log.
  *
  * Persistence is the family's delta-dir + marker protocol
  * ([[CovarianceState]]): each batch's bin counts land in
  * `deltas/batch=N/`, `stats` carries `last_batch` as the COMMIT MARKER
  * ([[StateFiles]] staged swap), reads aggregate committed deltas only,
  * and a committed replay short-circuits — so [[update]] is a safe
  * `foreachBatch` sink ([[graft.streaming.StreamingIndex.evalAvailableNow]])
  * and [[IndexCompaction]] folds delta dirs on a maintenance cadence.
  *
  * Headroom: counts, exact to 2⁶³ rows per (group, bin) — effectively
  * unbounded.
  */
object EvalState {

  private def deltasPath(root: String) = s"$root/deltas"
  private def statsPath(root: String) = s"$root/stats"

  private def readLast(spark: SparkSession, root: String): Option[Long] =
    StateFiles.readMarker(spark, statsPath(root))
      .map(_("last_batch").asInstanceOf[Long])

  /** Bin sufficient statistics of one scored batch: exact (n, pos) per
    * (group, decile-bin of the micro score).
    */
  private def binStats(batch: DataFrame, groupCol: String, scoreCol: String,
                       labelCol: String): DataFrame =
    batch
      .groupBy(col(groupCol).as("g"),
        (col(scoreCol) / 100000L).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"))

  /** Fold one scored batch into the state at `statePath`; returns the
    * post-merge (g, bin, n, pos) snapshot, eagerly materialized so it
    * survives the next swap. `batchId` defaults to last_batch + 1; pass
    * the foreachBatch epoch for replay idempotence (a committed replay
    * ingests nothing and returns the snapshot).
    */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
             groupCol: String = "source", scoreCol: String = "score_micro",
             labelCol: String = "label", batchId: Option[Long] = None,
             lease: Boolean = false): DataFrame =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statsPath(statePath))
        IndexCompaction.recover(spark, deltasPath(statePath))
        val last = readLast(spark, statePath).getOrElse(-1L)
        val id = batchId.getOrElse(last + 1)
        if (id > last) { // else: committed replay, every effect installed
          // coalesce(1): a delta is groups×10 bin rows (KBs), not corpus
          // data — one file per batch keeps snapshot's file-open count
          // equal to the batch count (the q155 lesson).
          binStats(batch, groupCol, scoreCol, labelCol)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(s"${deltasPath(statePath)}/batch=$id")
          StateFiles.installMarker(spark, statsPath(statePath),
            Seq("last_batch" -> id))
        }
        snapshot(spark, statePath).localCheckpoint(eager = true)
      }
    }

  /** The folded (g, bin, n, pos) counts over COMMITTED deltas (orphan
    * dirs from a crash are pruned at the scan by the partition filter).
    */
  def snapshot(spark: SparkSession, statePath: String): DataFrame = {
    val last = readLast(spark, statePath)
      .getOrElse(sys.error(s"EvalState.snapshot: no state at $statePath"))
    spark.read.parquet(deltasPath(statePath))
      .filter(col("batch") <= last)
      .groupBy("g", "bin")
      .agg(sum("n").as("n"), sum("pos").as("pos"))
  }

  /** Fold committed delta dirs into one consolidated partition
    * ([[IndexCompaction]]) — the same maintenance verb as the indices.
    */
  def compact(spark: SparkSession, statePath: String,
              lease: Boolean = false): Seq[IndexCompaction.FoldReport] =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statsPath(statePath))
        readLast(spark, statePath) match {
          case None => Nil
          case Some(last) =>
            Seq(IndexCompaction.foldBatches(spark, deltasPath(statePath), last))
        }
      }
    }

  /** The q213 operating-point table recomputed FROM STATE — the corpus
    * is never re-scanned; the sweep arithmetic is the gated q213
    * finisher ([[graft.analytics.ModelEval.sweepFromBins]]) over the
    * state's global bin frame.
    */
  def sweepSnapshot(spark: SparkSession, statePath: String): DataFrame =
    graft.analytics.ModelEval.sweepFromBins(
      snapshot(spark, statePath)
        .groupBy("bin").agg(sum("n").as("nb"), sum("pos").as("pb")))

  // --------------------------------------------------------------- q223
  /** End-to-end incremental-eval gate: fold the calibrated scored corpus
    * into the state in 3 batches split by doc_id, then emit the folded
    * (source, bin) counts. The DuckDB oracle is the ONE-SHOT aggregate —
    * the hash gate proves 3-batch fold ≡ one-shot bit-for-bit (the
    * mergeable-summary claim, no error bound to hide behind).
    */
  def evalStateCheck(spark: SparkSession, dir: String): DataFrame = {
    val scored = graft.analytics.ModelEval.scoredDocs(
      graft.core.Tables.documents(spark, dir))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-estate")
    val statePath = stateRoot.toString + "/state"
    // The returned frame MUST remain eagerly materialized: update()'s
    // eager localCheckpoint is what makes deleting the scratch state
    // below safe — a refactor that drops the checkpoint would hand the
    // caller a plan over deleted files. The delete sits in `finally`
    // (r11 advice) so a failure mid-fold doesn't leak the temp dir
    // (the q70 lesson — bench reps would otherwise accumulate /tmp dirs).
    try {
      var out: DataFrame = null
      (0 until 3).foreach { i =>
        out = update(spark, statePath, scored.filter(col("doc_id") % 3 === i))
      }
      out.select(col("g").as("source"), col("bin"), col("n"), col("pos"))
    } finally graft.core.Fs.deleteRecursively(stateRoot)
  }

  private val evalStateSql =
    """WITH scored AS (
      |  SELECT source,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS score_micro,
      |    ('0x' || substr(md5('lbl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000
      |      < ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS label
      |  FROM documents
      |)
      |SELECT source, score_micro // 100000 AS bin,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos
      |FROM scored GROUP BY 1, 2""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q223_eval_state", evalStateCheck _, Some(evalStateSql)))
}
