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

  /** The ANN states' shared tail crossJoin with a SIZED broadcast side —
    * broadcast is a command, not a suggestion, so a hint goes only on a
    * side that is MEASURED small (r15 ADVICE: the unconditional
    * `broadcast(tail)` arm could ship a near-recluster-threshold tail of
    * raw dim-double vectors past the driver's broadcast limits — failing
    * exactly the large-|Q| job the query-side gate protects):
    *
    *  - query batch known small (`querySideSmall` from the bundle
    *    probe's sizing, or a bounded probe here) → broadcast it;
    *  - else tail measured small (one bounded job against the same
    *    [[graft.analytics.IvfIndex.queryBroadcastMaxRows]] ceiling) →
    *    broadcast the tail;
    *  - else NO hint: a plain crossJoin (CartesianProduct) is the
    *    scale-correct plan when both sides are genuinely large, and AQE
    *    still re-promotes a runtime-small side on its own.
    */
  def tailCross(qb: DataFrame, tail: DataFrame,
                querySideSmall: Option[Boolean]): DataFrame = {
    import graft.analytics.IvfIndex.{boundedCount, queryBroadcastMaxRows}
    import org.apache.spark.sql.functions.broadcast
    val qSmall = querySideSmall.getOrElse(
      boundedCount(qb, queryBroadcastMaxRows).isDefined)
    if (qSmall) tail.crossJoin(broadcast(qb))
    else if (boundedCount(tail, queryBroadcastMaxRows).isDefined)
      broadcast(tail).crossJoin(qb)
    else tail.crossJoin(qb)
  }
}
