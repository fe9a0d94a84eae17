package graft.warehouse

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-isolated time travel over [[MergeWriter]] tables — Delta-style
  * `VERSION AS OF` reads without a table format: every versioned merge
  * archives the buckets it REPLACES (a rename, not a copy) under
  * `.versions/n<N>/`, so any retained version is reconstructable per
  * bucket and the storage cost of history is exactly the churn, never a
  * second copy of the table.
  *
  * Reconstruction rule (per bucket `b`, reading version `V`): the archive
  * dir `n<N>` holds `b`'s content for every version in
  * `(previous-replacement-of-b, N]` — so the SMALLEST archived `N ≥ V`
  * containing `b` is `b` at version `V`; if none exists, `b` has not been
  * replaced since `V` and the live dir is current. A bucket born after
  * `V` carries an absent-marker in its birth archive and contributes
  * nothing. The whole resolution is a directory listing (O(versions ×
  * affected buckets) names, no data reads), and the resulting read is a
  * plain pruned parquet scan over the chosen bucket dirs.
  *
  * Version bookkeeping: a `.versions/.current` counter, bumped BEFORE the
  * merge inside the same table-lock/lease critical section — a crash
  * between bump and merge leaves an empty version (readable, identical to
  * its predecessor), never a corrupt one; replay after a mid-merge crash
  * converges exactly like [[MergeWriter.merge]] replay does. [[vacuum]]
  * drops archives older than a retention horizon and records the horizon,
  * so a vacuumed version read fails loudly instead of silently resolving
  * to newer data.
  *
  * At 100 TB: merges already touch only affected buckets; versioning adds
  * one rename per replaced bucket and zero data movement. `readAsOf` scans
  * the same bucket set a live read of that version would have.
  */
object TimeTravel {

  private val VersionsDir = ".versions"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionsPath(tablePath: String) = new Path(tablePath, VersionsDir)
  private def counterPath(tablePath: String) = new Path(versionsPath(tablePath), ".current")
  private def horizonPath(tablePath: String) = new Path(versionsPath(tablePath), ".horizon")
  private def archivePath(tablePath: String, n: Long) =
    new Path(versionsPath(tablePath), s"n$n")

  private def readLong(hfs: FileSystem, p: Path, default: Long): Long =
    if (!hfs.exists(p)) default
    else {
      val in = hfs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }

  private def writeLong(hfs: FileSystem, p: Path, v: Long): Unit = {
    val out = hfs.create(p, true)
    try out.write(v.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Current table version: 0 if the table does not exist; a table
    * created outside the versioned API reads as version 1 (its live
    * state), so versioning can be adopted on an existing table.
    */
  def currentVersion(spark: SparkSession, tablePath: String): Long =
    if (!MergeWriter.tableExists(spark, tablePath)) 0L
    else readLong(fs(spark, tablePath), counterPath(tablePath), 1L)

  /** Oldest version still reconstructable (exclusive horizon: versions
    * ≤ the stored horizon have been vacuumed).
    */
  def oldestReadable(spark: SparkSession, tablePath: String): Long =
    readLong(fs(spark, tablePath), horizonPath(tablePath), 0L) + 1L

  /** Whole-table rewrites ([[MergeWriter.rebucket]]) on a table that has
    * versioning metadata must capture a version, or old reads would mix
    * stale archives with rewritten live buckets. Callers hold the table
    * lock. Returns the archive target for the rewrite, or None when the
    * table has never been versioned.
    */
  private[warehouse] def archiveForRewrite(spark: SparkSession,
                                           tablePath: String): Option[Path] = {
    val hfs = fs(spark, tablePath)
    if (!hfs.exists(counterPath(tablePath))) None
    else {
      val cur = readLong(hfs, counterPath(tablePath), 1L)
      writeLong(hfs, counterPath(tablePath), cur + 1)
      Some(archivePath(tablePath, cur))
    }
  }

  /** [[MergeWriter.merge]] with version capture. Returns
    * (rows upserted, new table version).
    */
  def mergeVersioned(spark: SparkSession, tablePath: String, batch: DataFrame,
                     key: String = "_id", numBuckets: Int = MergeWriter.DefaultNumBuckets,
                     lease: Boolean = false): (Long, Long) =
    MergeWriter.withTableLock(spark, tablePath, lease) {
      val hfs = fs(spark, tablePath)
      if (!MergeWriter.tableExists(spark, tablePath)) {
        val n = MergeWriter.mergeArchiving(spark, tablePath, batch, key, numBuckets, None)
        // Zero-row first batch creates nothing — stay at version 0.
        if (MergeWriter.tableExists(spark, tablePath)) writeLong(hfs, counterPath(tablePath), 1L)
        (n, currentVersion(spark, tablePath))
      } else {
        val cur = readLong(hfs, counterPath(tablePath), 1L)
        writeLong(hfs, counterPath(tablePath), cur + 1)
        val n = MergeWriter.mergeArchiving(spark, tablePath, batch, key, numBuckets,
          Some(archivePath(tablePath, cur)))
        (n, cur + 1)
      }
    }

  /** The table as of `version` — same shape as [[MergeWriter.read]]
    * (bucket column hidden). Fails on vacuumed or future versions.
    */
  def readAsOf(spark: SparkSession, tablePath: String, version: Long): DataFrame = {
    val hfs = fs(spark, tablePath)
    val cur = currentVersion(spark, tablePath)
    require(version >= 1 && version <= cur,
      s"version $version out of range [1, $cur] for $tablePath")
    require(version >= oldestReadable(spark, tablePath),
      s"version $version has been vacuumed (oldest readable: " +
        s"${oldestReadable(spark, tablePath)})")

    val bucketPrefix = s"${MergeWriter.BucketCol}="
    val absentPrefix = s".absent_$bucketPrefix"

    // (archive version, bucket name present, absent marker) triples from
    // one listing pass; archives are name-only metadata.
    val vdir = versionsPath(tablePath)
    val archives: Seq[(Long, Map[String, Boolean])] =
      if (!hfs.exists(vdir)) Nil
      else hfs.listStatus(vdir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("n"))
        .flatMap { s =>
          s.getPath.getName.drop(1).toLongOption.map { n =>
            val entries = hfs.listStatus(s.getPath).toSeq.map(_.getPath.getName)
            val present = entries.filter(_.startsWith(bucketPrefix))
              .map(_ -> false)
            val absent = entries.filter(_.startsWith(absentPrefix))
              .map(e => e.stripPrefix(".absent_") -> true)
            n -> (present ++ absent).toMap
          }
        }.sortBy(_._1)

    val liveBuckets: Seq[String] = hfs.listStatus(new Path(tablePath)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(bucketPrefix))
      .map(_.getPath.getName)

    val universe: Seq[String] =
      (liveBuckets ++ archives.flatMap(_._2.keys)).distinct

    val paths: Seq[String] = universe.flatMap { b =>
      archives.find { case (n, m) => n >= version && m.contains(b) } match {
        case Some((_, m)) if m(b) => None // born after `version`
        case Some((n, _)) => Some(new Path(archivePath(tablePath, n), b).toString)
        case None if liveBuckets.contains(b) =>
          Some(new Path(tablePath, b).toString)
        case None => None
      }
    }

    if (paths.isEmpty) MergeWriter.read(spark, tablePath).limit(0)
    else spark.read.option("mergeSchema", "true").parquet(paths: _*)
  }

  /** Drop archives serving only versions older than the `keepLast` most
    * recent, and advance the read horizon. Returns archive dirs removed.
    */
  def vacuum(spark: SparkSession, tablePath: String, keepLast: Int,
             lease: Boolean = false): Int =
    MergeWriter.withTableLock(spark, tablePath, lease) {
      val hfs = fs(spark, tablePath)
      val cur = currentVersion(spark, tablePath)
      val horizon = math.max(readLong(hfs, horizonPath(tablePath), 0L), cur - keepLast)
      val vdir = versionsPath(tablePath)
      val victims =
        if (!hfs.exists(vdir)) Nil
        else hfs.listStatus(vdir).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("n"))
          .filter(_.getPath.getName.drop(1).toLongOption.exists(_ <= horizon))
      victims.foreach(s => hfs.delete(s.getPath, true))
      writeLong(hfs, horizonPath(tablePath), horizon)
      victims.size
    }
}
