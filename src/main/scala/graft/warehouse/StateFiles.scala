package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared persistence discipline of the incremental state tables
  * ([[SketchState]], [[QuantileState]]): crash recovery from the backup
  * copy, then a two-rename staged swap so the state is never observable
  * half-written. Callers hold the table's [[graft.core.PathLocks]] lock
  * (and optionally the cross-driver [[LeaseLock]]) around both calls.
  */
private[graft] object StateFiles {

  private def bakPath(p: Path) = new Path(p.getParent, s".bak_${p.getName}")
  private def tmpPath(p: Path) = new Path(p.getParent, s".tmp_${p.getName}")

  /** Heal a crash between the two swap renames: live path missing with
    * the only copy in .bak → restore it, or the next update would
    * silently rebuild state from one batch and delete all accumulated
    * history.
    */
  def recover(spark: SparkSession, statePath: String): Unit = {
    val p = new Path(statePath)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bak = bakPath(p)
    if (!hfs.exists(p) && hfs.exists(bak)) {
      if (!hfs.rename(bak, p)) sys.error(s"state recovery failed for $p")
    }
  }

  /** Write `merged` beside the live state, then swap it in with two
    * renames (live → .bak, .tmp → live); a failed install rolls back.
    */
  def install(spark: SparkSession, statePath: String, merged: DataFrame): Unit = {
    val p = new Path(statePath)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = tmpPath(p)
    val bak = bakPath(p)
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (hfs.exists(bak)) hfs.delete(bak, true)
    if (hfs.exists(p) && !hfs.rename(p, bak)) sys.error(s"state backup failed for $p")
    if (!hfs.rename(tmp, p)) {
      hfs.rename(bak, p)
      sys.error(s"state install failed for $p")
    }
    hfs.delete(bak, true)
  }

  def exists(spark: SparkSession, statePath: String): Boolean = {
    val p = new Path(statePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
