package graft.meta

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only run-audit log — `sync_history(id, source, collection, status,
  * started_at, completed_at, records_synced, message)`, the Spark
  * restatement of the reference's audit relation (reference
  * src/core/db.py:54-69, src/services/etl.py:153-179).
  *
  * The reference INSERTs a STARTED row then UPDATEs it in place; an
  * append-only parquet log can't update, so we append start and end events
  * and fold to the latest event per id at read time (SURVEY.md §2.A SNK5).
  *
  * Appends to ONE path are serialized under the striped path lock:
  * concurrent Spark write jobs into the same directory share the
  * `_temporary` staging dir (FileOutputCommitter), so one job's
  * commit/cleanup can delete another's in-flight task output — losing
  * audit rows. The lock is JVM-wide (SyncService fans one Future per
  * source through the same History), and each append is a tiny one-row
  * job, so serialization costs microseconds of contention, not
  * throughput. Unbounded small-file growth is handled by [[compact]].
  */
final class History(spark: SparkSession, metaDir: String) {
  import spark.implicits._

  private val path = s"$metaDir/sync_history"
  private val lock = graft.core.PathLocks.forPath(path)

  private def hfs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Crash recovery for [[compact]]'s two-rename swap: if the process
    * died between rename(live → bak) and rename(staging → live), the log
    * is intact in the backup — restore it instead of silently starting a
    * fresh log and stranding the audit history. Called under the lock by
    * every read/write entry point; no-op in the steady state.
    */
  private def recover(): Unit = {
    val live = new Path(path)
    val bak = new Path(s"$metaDir/.bak_sync_history")
    if (!hfs.exists(live) && hfs.exists(bak)) hfs.rename(bak, live)
  }

  private def exists: Boolean = {
    recover()
    hfs.exists(new Path(path))
  }

  private def append(id: String, source: String, collection: String, status: String,
                     startedAt: Timestamp, completedAt: Option[Timestamp],
                     records: Long, message: String, seq: Int): Unit = lock.synchronized {
    recover()
    Seq((id, source, collection, status, startedAt, completedAt.orNull, records, message, seq))
      .toDF("id", "source", "collection", "status", "started_at", "completed_at",
        "records_synced", "message", "event_seq")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Record a STARTED event; returns the run id. */
  def logStart(id: String, source: String, collection: String, startedAt: Timestamp): String = {
    append(id, source, collection, "STARTED", startedAt, None, 0L, "", seq = 0)
    id
  }

  /** Record the terminal SUCCESS/FAILED event for a run. */
  def logEnd(id: String, source: String, collection: String, status: String,
             startedAt: Timestamp, completedAt: Timestamp, records: Long,
             message: String): Unit =
    append(id, source, collection, status, startedAt, Some(completedAt), records, message, seq = 1)

  /** Latest event per run id. A fresh warehouse yields a TYPED empty
    * DataFrame (a schemaless one would make recentRuns' orderBy throw
    * UNRESOLVED_COLUMN on first use).
    *
    * Reads take the append/compact lock and materialize (localCheckpoint)
    * under it: [[compact]] swaps the live directory, and an unsynchronized
    * lazy read planned before the swap would scan files the swap deletes
    * (same discipline as Checkpoints.all). The log is audit-sized, so
    * eager materialization is cheap.
    */
  def runs(): DataFrame = lock.synchronized {
    if (!exists)
      Seq.empty[(String, String, String, String, Timestamp, Timestamp, Long, String, Int)]
        .toDF("id", "source", "collection", "status", "started_at", "completed_at",
          "records_synced", "message", "event_seq")
    else
      graft.warehouse.MergeWriter.latestByKey(
        spark.read.parquet(path), "id", Seq(desc("event_seq")))
        .localCheckpoint(true)
  }

  /** Recent-N audit query — `ORDER BY started_at DESC LIMIT n` (reference
    * src/api/routes.py:114-129) → TakeOrderedAndProject, no global sort.
    */
  def recentRuns(n: Int = 50): DataFrame =
    runs().orderBy(desc("started_at"), desc("id")).limit(n)

  /** Fold the event log down to its latest-event-per-run view and rewrite
    * it as one parquet file — the periodic compaction that bounds the
    * one-file-per-append growth of a busy warehouse. Readers see the same
    * [[runs]] results before and after (the fold IS the read semantics);
    * STARTED events of finished runs are dropped by it, which is exactly
    * the reference's UPDATE-in-place end state. Runs under the append lock
    * with an atomic directory swap, so concurrent appends either land
    * before the fold (compacted) or after (picked up next time).
    * Returns the number of surviving rows.
    */
  def compact(lease: Boolean = false): Long = lock.synchronized {
    graft.warehouse.LeaseLock.withLease(spark, path, lease) { compactImpl() }
  }

  private def compactImpl(): Long = {
    if (!exists) return 0L
    val tmp = new Path(s"$metaDir/.staging_sync_history")
    val bak = new Path(s"$metaDir/.bak_sync_history")
    // The fold runs distributed and lands in a staging dir; the write job
    // finishes (and with it every read of the live dir) before the swap.
    runs().coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (hfs.exists(bak)) hfs.delete(bak, true)
    if (!hfs.rename(new Path(path), bak)) sys.error("history compaction: backup rename failed")
    if (!hfs.rename(tmp, new Path(path))) {
      hfs.rename(bak, new Path(path)) // roll back; original log intact
      sys.error("history compaction: swap rename failed")
    }
    hfs.delete(bak, true)
    spark.read.parquet(path).count()
  }
}
