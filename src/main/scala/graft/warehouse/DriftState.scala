package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery

/** Incremental drift-monitor state — the monitoring member of the exact
  * state-table family (moments: [[MomentsState]]; covariance:
  * [[CovarianceState]]; indices: [[RetrievalIndex]], [[DedupIndex]]):
  * persist per (group, bin) REFERENCE and CURRENT histogram counts and
  * fold each production batch in, so "is today's traffic drifting off
  * the training distribution?" never re-scans history. The reference
  * histogram is frozen once (the training-window snapshot a model ships
  * with); current counts accumulate per batch; the PSI read is
  * [[graft.analytics.Statistics.psiFromCounts]] — LITERALLY the q183
  * kernel, so the monitored score and the one-shot score cannot drift
  * an ulp apart.
  *
  * Layout under one root (the [[RetrievalIndex]] protocol):
  *  - `ref/batch=N/`, `cur/batch=N/` (group…, bin, n_ref, n_cur) — one
  *    partition dir per folded batch, per-dir overwrite
  *    (byte-idempotent rewrite); the two SIDES have independent id
  *    spaces so foreachBatch epochs (which start at 0) never collide
  *    with the pre-frozen reference;
  *  - `stats` (last_ref, last_batch) — the COMMIT MARKERS under the
  *    [[StateFiles]] staged swap, installed LAST.
  *
  * EXACTLY-ONCE: a crash before the marker leaves an orphan delta dir
  * that reads EXCLUDE (`batch <= marker` prunes at the scan) and the
  * replay overwrites with identical bytes; a replay after the marker
  * short-circuits on `batchId <= marker` — which makes the state a
  * safe `foreachBatch` sink ([[graft.streaming.StreamingIndex
  * .driftAvailableNow]]). Integer sums are order-independent, so any
  * committed batch partitioning equals the one-shot aggregate
  * bit-for-bit — no error term at all.
  */
object DriftState {

  private def refPath(root: String)   = s"$root/ref"
  private def curPath(root: String)   = s"$root/cur"
  private def statsPath(root: String) = s"$root/stats"

  /** (last_ref, last_batch) of the installed state, or None. Reference
    * and current batches have INDEPENDENT id spaces, so a foreachBatch
    * stream whose epochs start at 0 never collides with the frozen
    * reference (which the caller installs before the stream starts).
    */
  def markers(spark: SparkSession, root: String): Option[(Long, Long)] =
    StateFiles.readMarker(spark, statsPath(root)).map(m =>
      (m("last_ref").asInstanceOf[Long], m("last_batch").asInstanceOf[Long]))

  private def binCounts(batch: DataFrame, groupCols: Seq[String],
                        binCol: String, side: String): DataFrame =
    batch.groupBy(groupCols.map(col) :+ col(binCol).as("bin"): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("n_ref", if (side == "ref") col("n") else lit(0L))
      .withColumn("n_cur", if (side == "cur") col("n") else lit(0L))
      .drop("n")

  private def fold(spark: SparkSession, root: String, delta: DataFrame,
                   side: String, batchId: Option[Long],
                   lease: Boolean): Long =
    graft.core.PathLocks.forPath(root).synchronized {
      LeaseLock.withLease(spark, root, lease) {
        StateFiles.recover(spark, statsPath(root))
        val (lastRef, lastCur) = markers(spark, root).getOrElse((-1L, -1L))
        val last = if (side == "ref") lastRef else lastCur
        val id = batchId.getOrElse(last + 1)
        if (id > last) { // else: committed replay — every effect installed
          val dir = if (side == "ref") refPath(root) else curPath(root)
          // coalesce(1): a delta is (groups × bins) count rows (KBs),
          // not corpus data — one file per batch (the q155 lesson).
          delta.coalesce(1).write.mode("overwrite").parquet(s"$dir/batch=$id")
          val m =
            if (side == "ref") (id, lastCur) else (lastRef, id)
          StateFiles.installMarker(spark, statsPath(root),
            Seq("last_ref" -> m._1, "last_batch" -> m._2))
        }
        math.max(id, last)
      }
    }

  /** Freeze (or extend) the reference histogram from a training-window
    * batch. `binCol` must already hold the integer bin id.
    */
  def initReference(spark: SparkSession, root: String, ref: DataFrame,
                    groupCols: Seq[String], binCol: String,
                    batchId: Option[Long] = None, lease: Boolean = false): Long =
    fold(spark, root, binCounts(ref, groupCols, binCol, "ref"), "ref",
      batchId, lease)

  /** Fold one production batch into the CURRENT side of the state.
    * `batchId` defaults to last_batch + 1; passing the foreachBatch
    * epoch makes the call replay-idempotent.
    */
  def update(spark: SparkSession, root: String, batch: DataFrame,
             groupCols: Seq[String], binCol: String,
             batchId: Option[Long] = None, lease: Boolean = false): Long =
    fold(spark, root, binCounts(batch, groupCols, binCol, "cur"), "cur",
      batchId, lease)

  /** Committed per-(group, bin) counts — orphan (uncommitted) delta dirs
    * are pruned AT THE SCAN by the partition-column filter; a state with
    * no committed current batch reads as all-zero n_cur.
    */
  def counts(spark: SparkSession, root: String,
             groupCols: Seq[String]): DataFrame = {
    val (lastRef, lastCur) = markers(spark, root)
      .getOrElse(sys.error(s"DriftState.counts: no state at $root"))
    val keys = groupCols :+ "bin"
    def side(dir: String, last: Long): Option[DataFrame] =
      if (last < 0) None
      else Some(spark.read.parquet(dir).filter(col("batch") <= last)
        .select((keys :+ "n_ref" :+ "n_cur").map(col): _*))
    val parts = side(refPath(root), lastRef).toSeq ++
      side(curPath(root), lastCur).toSeq
    require(parts.nonEmpty, s"DriftState.counts: empty state at $root")
    parts.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum("n_ref").as("n_ref"), sum("n_cur").as("n_cur"))
  }

  /** Current PSI table — a state read through the q183 kernel; no
    * history re-scan. One row per (group, bin) with the ppm term.
    */
  def psiSnapshot(spark: SparkSession, root: String, groupCol: String,
                  nBins: Int): DataFrame =
    graft.analytics.Statistics.psiFromCounts(
      counts(spark, root, Seq(groupCol)), groupCol, nBins)

  // --------------------------------------------------------------- q185
  /** End-to-end incremental-drift gate: freeze the pre-1998 order-price
    * histogram as the reference, fold the 1998+ orders in as THREE
    * production batches split by order key, and emit the PSI snapshot.
    * The DuckDB oracle computes the one-shot PSI over the full corpus —
    * so the hash gate proves frozen-ref + 3-batch fold ≡ one-shot
    * exactly, PSI arithmetic included (same output schema as q183).
    */
  def driftStateCheck(spark: SparkSession, dir: String): DataFrame = {
    val binned = graft.core.Tables.orders(spark, dir)
      .join(broadcast(graft.core.Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"),
        col("c_mktsegment").as("segment"),
        (year(col("o_orderdate")) < 1998).as("is_ref"),
        expr("least(CAST(round(o_totalprice * 100) AS BIGINT) div 5000000, 9)")
          .as("bin"))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-dstate")
    val root = stateRoot.toString + "/state"
    initReference(spark, root, binned.filter(col("is_ref")),
      Seq("segment"), "bin")
    (0 until 3).foreach { i =>
      update(spark, root,
        binned.filter(!col("is_ref") && col("o_orderkey") % 3 === i),
        Seq("segment"), "bin")
    }
    val out = psiSnapshot(spark, root, "segment", 10)
      .select(col("segment"), col("bin"), col("n_ref"), col("n_cur"),
        col("tot_ref"), col("tot_cur"), col("term_ppm"))
      .localCheckpoint(eager = true)
    // Snapshot is checkpointed; reclaim scratch state (the q70 lesson).
    graft.core.Fs.deleteRecursively(stateRoot)
    out
  }

  // One-shot PSI over the same corpus — identical to the q183 oracle by
  // construction (the state fold must reproduce it exactly).
  private val driftStateSql =
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

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q185_drift_state", driftStateCheck _, Some(driftStateSql)))
}
