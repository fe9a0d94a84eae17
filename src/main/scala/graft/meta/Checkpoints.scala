package graft.meta

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** High-water-mark checkpoint table — `sync_metadata(source_uri,
  * collection_name, last_synced_at)` keyed on (source, collection), the
  * Spark restatement of the reference's PostgreSQL checkpoint relation
  * (reference src/core/db.py:41-52, src/services/etl.py:89-123).
  *
  * The table is tiny (one row per source×collection), so upsert is a
  * driver-side read-modify-write with an atomic directory swap. The
  * composite key is deliberate: watermarks are never compared across
  * sources (clock-skew hazard, SURVEY.md §7.4 item 6).
  */
final class Checkpoints(spark: SparkSession, metaDir: String) {
  import spark.implicits._

  private val path = s"$metaDir/sync_metadata"
  // advance() is a read-modify-write of one shared table through a fixed
  // staging dir — concurrent per-source syncs (SyncService fan-out) must
  // serialize or the slower writer erases the faster one's watermark.
  private val lock = Checkpoints.lockFor(path)

  private def hfs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // Crash recovery for atomicWrite's two-rename swap: a kill between
  // rename(live → bak) and rename(tmp → live) must not read as "no
  // checkpoints" — that would silently trigger full re-scans of every
  // source. Restore the backup; called under the lock by both entry
  // points, no-op in the steady state.
  private def recover(): Unit = {
    val live = new Path(path)
    val bak = new Path(s"$metaDir/.bak_sync_metadata")
    if (!hfs.exists(live) && hfs.exists(bak)) hfs.rename(bak, live)
  }

  private def exists: Boolean = {
    recover()
    hfs.exists(new Path(path))
  }

  // Readers take the same lock as advance(): the swap renames the live
  // dir, and an unsynchronized read mid-swap sees a missing directory.
  def all(): DataFrame = lock.synchronized {
    if (exists) spark.read.parquet(path).localCheckpoint(true)
    else Seq.empty[(String, String, Timestamp)]
      .toDF("source_uri", "collection_name", "last_synced_at")
  }

  /** `None` on first run — "no checkpoint found" full scan (reference
    * etl.py:206-212).
    */
  def lastSynced(source: String, collection: String): Option[Timestamp] =
    all()
      .filter(col("source_uri") === source && col("collection_name") === collection)
      .select("last_synced_at")
      .collect()
      .headOption
      .map(_.getTimestamp(0))

  /** Upsert the watermark for (source, collection) — `INSERT ... ON CONFLICT
    * DO UPDATE` parity (reference etl.py:108-123). The JVM lock serializes
    * writers within THIS driver; `lease = true` extends the exclusion
    * across drivers via [[graft.warehouse.LeaseLock]] — two drivers
    * advancing the same metadata table would otherwise interleave the
    * read-modify-write and the slower one would erase the faster one's
    * watermark (re-sync, not corruption — but a 100 TB re-scan).
    */
  def advance(source: String, collection: String, hwm: Timestamp,
              lease: Boolean = false): Unit = lock.synchronized {
    graft.warehouse.LeaseLock.withLease(spark, path, lease) {
      val others = all()
        .filter(!(col("source_uri") === source && col("collection_name") === collection))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2)))
        .toSeq
      val updated = (others :+ ((source, collection, hwm)))
        .toDF("source_uri", "collection_name", "last_synced_at")
      atomicWrite(updated)
    }
  }

  private def atomicWrite(df: DataFrame): Unit = {
    val tmp = s"$metaDir/.staging_sync_metadata"
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val live = new Path(path)
    val bak = new Path(s"$metaDir/.bak_sync_metadata")
    if (hfs.exists(bak)) hfs.delete(bak, true)
    if (hfs.exists(live)) hfs.rename(live, bak)
    hfs.rename(new Path(tmp), live)
    hfs.delete(bak, true)
  }
}

object Checkpoints {
  // Striped on the NORMALIZED path (graft.core.PathLocks): two Checkpoints
  // instances naming the same metaDir with different spellings must
  // serialize against each other.
  private[meta] def lockFor(path: String): Object = graft.core.PathLocks.forPath(path)
}
