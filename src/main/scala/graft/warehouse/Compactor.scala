package graft.warehouse

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.core.ParquetMeta

/** Small-file compaction — the operational answer to the classic
  * accumulation problem: every incremental merge, streaming micro-batch,
  * and shard export writes its own files, and a year of small batches
  * turns a table into millions of KB-sized parquet files whose open/footer
  * overhead dominates every scan at 100 TB.
  *
  * [[compact]] walks the table's LEAF directories (so Hive-style
  * partition/bucket layout — and therefore partition pruning — is
  * preserved exactly) and bin-packs each leaf's data files toward
  * `targetBytes` outputs. Before installing, the rewritten files' footer
  * row count must equal the old — a compaction that would lose rows
  * aborts that leaf instead of installing it.
  *
  * Crash safety is a per-leaf two-phase FILE swap entirely inside the
  * leaf (no writes outside the table, works when the table root is
  * itself the leaf):
  *
  *  1. rewrite into `<leaf>/.compact_tmp` (hidden — readers ignore it)
  *  2. move the old data files into `<leaf>/.compact_bak`
  *  3. create the `<leaf>/.compact_commit` marker — the decision point
  *  4. move the tmp files up into the leaf; remove marker, bak, tmp
  *
  * [[recover]] (run automatically per leaf) rolls BACK any leaf that
  * crashed before step 3 (restore bak, drop tmp) and rolls FORWARD any
  * leaf that crashed after it (finish step 4) — every leaf lands fully
  * old or fully new, never mixed, under the marker's direction.
  *
  * Concurrency: takes the table's [[graft.core.PathLocks]] JVM lock and,
  * with `lease = true`, the cross-driver [[LeaseLock]] — the same
  * serialization contract as [[MergeWriter]]; compacting a table while
  * another UNSERIALIZED writer commits into it would sweep that writer's
  * files into the backup. READERS need serializing too: between step 2
  * (old files → bak) and step 4 (tmp files → leaf) a concurrent listing
  * of the leaf sees zero or partial data files, so an unserialized
  * reader can observe transiently-missing rows (never wrong or
  * duplicated rows — the bak/tmp dirs are hidden). Run compaction in
  * the same maintenance window as readers' lease, or accept the
  * transient under-count. The `compact` CLI passes `lease = true` for
  * this reason.
  *
  * Schema evolution: a leaf whose files carry different footer schemas
  * is SKIPPED (left untouched), because a plain rewrite samples one
  * footer and would silently drop the other files' extra columns while
  * still passing the row-count check.
  */
object Compactor {

  private val TmpName = ".compact_tmp"
  private val BakName = ".compact_bak"
  private val CommitName = ".compact_commit"

  final case class CompactReport(leavesSeen: Int, leavesCompacted: Int,
                                 filesBefore: Long, filesAfter: Long,
                                 rowsCompacted: Long) {
    def summary: String =
      s"$leavesCompacted/$leavesSeen leaves compacted, " +
        s"$filesBefore -> $filesAfter files, $rowsCompacted rows rewritten"
  }

  /** Compact every leaf directory under `tablePath`. Returns what was
    * seen/done; a table already in good shape pays only the file listing
    * (row counts are read only for leaves actually rewritten).
    */
  def compact(spark: SparkSession, tablePath: String,
              targetBytes: Long = 128L << 20, minFiles: Int = 4,
              lease: Boolean = false): CompactReport =
    graft.core.PathLocks.forPath(tablePath).synchronized {
      LeaseLock.withLease(spark, tablePath, lease) {
        compactImpl(spark, tablePath, targetBytes, minFiles)
      }
    }

  private def compactImpl(spark: SparkSession, tablePath: String,
                          targetBytes: Long, minFiles: Int): CompactReport = {
    require(targetBytes > 0 && minFiles >= 2,
      s"need targetBytes > 0 and minFiles >= 2, got $targetBytes/$minFiles")
    val root = new Path(tablePath)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaves = leafDirs(hfs, root)
    var compacted = 0
    var before = 0L
    var after = 0L
    var rows = 0L
    leaves.foreach { leaf =>
      recover(hfs, leaf)
      val files = dataFiles(hfs, leaf)
      before += files.size
      val totalBytes = files.map(_.getLen).sum
      val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
      if (files.size >= minFiles && nOut < files.size) {
        // Read and count EXACTLY the direct files being swapped — a leaf
        // that also has visible subdirectories (mixed layouts) must not
        // absorb nested rows into the rewrite (duplication the recursive
        // row-count comparison could never catch, since both sides would
        // include them).
        val filePaths = files.map(_.getPath.toString)
        // Schema-evolution guard: spark.read.parquet samples ONE footer
        // for the schema, so a leaf whose files disagree (columns added
        // across batches) would be rewritten with the sampled subset —
        // columns silently dropped while the row-count equality check
        // still passes. Heterogeneous leaves are left untouched; resolve
        // the evolution (backfill or mergeSchema rewrite) explicitly.
        val schemaHomogeneous =
          filePaths.map(ParquetMeta.fileSchema(spark, _)).distinct.size == 1
        if (!schemaHomogeneous) {
          after += files.size
        } else {
          val oldRows = filePaths.map(ParquetMeta.rowCount(spark, _)).sum
          val tmp = new Path(leaf, TmpName)
          if (hfs.exists(tmp)) hfs.delete(tmp, true)
          // repartition, not coalesce: the small-file read often packs the
          // whole leaf into fewer input partitions than nOut, and coalesce
          // can only shrink — the byte target would silently overshoot.
          spark.read.parquet(filePaths: _*)
            .repartition(nOut)
            .write.mode("overwrite").parquet(tmp.toString)
          val newRows = ParquetMeta.rowCount(spark, tmp.toString)
          if (newRows != oldRows) {
            // Never install a lossy rewrite; leave the leaf untouched.
            hfs.delete(tmp, true)
            after += files.size
          } else {
            val bak = new Path(leaf, BakName)
            if (hfs.exists(bak)) hfs.delete(bak, true)
            hfs.mkdirs(bak)
            files.foreach { f =>
              if (!hfs.rename(f.getPath, new Path(bak, f.getPath.getName)))
                sys.error(s"backup move failed for ${f.getPath}")
            }
            hfs.create(new Path(leaf, CommitName), true).close() // decision point
            installTmp(hfs, leaf)
            compacted += 1
            after += dataFiles(hfs, leaf).size
            rows += newRows
          }
        }
      } else {
        after += files.size
      }
    }
    CompactReport(leaves.size, compacted, before, after, rows)
  }

  /** Finish step 4: move tmp files up, clear marker/bak/tmp. */
  private def installTmp(hfs: FileSystem, leaf: Path): Unit = {
    val tmp = new Path(leaf, TmpName)
    if (hfs.exists(tmp)) {
      dataFiles(hfs, tmp).foreach { f =>
        val dst = new Path(leaf, f.getPath.getName)
        if (hfs.exists(dst)) hfs.delete(dst, false) // idempotent re-run
        if (!hfs.rename(f.getPath, dst)) sys.error(s"install move failed for ${f.getPath}")
      }
      hfs.delete(tmp, true)
    }
    hfs.delete(new Path(leaf, BakName), true)
    hfs.delete(new Path(leaf, CommitName), false)
  }

  /** Heal a leaf a previous run crashed in: marker present → roll
    * forward (the rewrite was complete and verified); absent → roll
    * back (restore the original files, drop any partial rewrite).
    */
  private[warehouse] def recover(hfs: FileSystem, leaf: Path): Unit = {
    val bak = new Path(leaf, BakName)
    val marker = new Path(leaf, CommitName)
    if (hfs.exists(marker)) installTmp(hfs, leaf)
    else if (hfs.exists(bak)) {
      dataFiles(hfs, bak).foreach { f =>
        val dst = new Path(leaf, f.getPath.getName)
        if (!hfs.exists(dst) && !hfs.rename(f.getPath, dst))
          sys.error(s"rollback move failed for ${f.getPath}")
      }
      hfs.delete(bak, true)
      hfs.delete(new Path(leaf, TmpName), true)
    } else hfs.delete(new Path(leaf, TmpName), true)
  }

  /** Directories that directly contain ≥1 visible data file. */
  private def leafDirs(hfs: FileSystem, root: Path): Seq[Path] = {
    def visible(p: Path): Boolean =
      !p.getName.startsWith("_") && !p.getName.startsWith(".")
    def walk(dir: Path): Seq[Path] = {
      val entries = hfs.listStatus(dir).filter(s => visible(s.getPath))
      val subdirs = entries.filter(_.isDirectory).map(_.getPath)
      val hasData = entries.exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      val self = if (hasData || hfs.exists(new Path(dir, BakName)) ||
        hfs.exists(new Path(dir, CommitName))) Seq(dir) else Nil
      self ++ subdirs.flatMap(walk)
    }
    if (hfs.exists(root)) walk(root) else Nil
  }

  private def dataFiles(hfs: FileSystem, dir: Path) =
    hfs.listStatus(dir).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith(".")).toSeq
}
