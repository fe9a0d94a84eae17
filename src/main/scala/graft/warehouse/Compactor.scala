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
  * preserved exactly), bin-packs each leaf's data files toward
  * `targetBytes` outputs, and swaps the rewritten files in with the same
  * backup-rename discipline as [[MergeWriter]]'s bucket swap. Before any
  * swap the new files' footer row count must equal the old — a compaction
  * that would lose rows aborts that leaf instead of installing it.
  *
  * Planning is metadata-only (file sizes from the listing, row counts
  * from parquet footers); only leaves that actually need work (≥
  * `minFiles` files AND more files than the byte-target requires) pay a
  * read+write, and each leaf is rewritten independently so a crash
  * mid-compaction leaves every leaf either old or new, never mixed.
  */
object Compactor {

  final case class CompactReport(leavesSeen: Int, leavesCompacted: Int,
                                 filesBefore: Long, filesAfter: Long, rows: Long) {
    def summary: String =
      s"$leavesCompacted/$leavesSeen leaves compacted, " +
        s"$filesBefore -> $filesAfter files, $rows rows"
  }

  /** Compact every leaf directory under `tablePath`. Returns what was
    * seen/done; a table already in good shape is a metadata-only no-op.
    */
  def compact(spark: SparkSession, tablePath: String,
              targetBytes: Long = 128L << 20, minFiles: Int = 4): CompactReport = {
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
      val files = dataFiles(hfs, leaf)
      before += files.size
      val totalBytes = files.map(_.getLen).sum
      val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
      if (files.size >= minFiles && nOut < files.size) {
        val oldRows = ParquetMeta.rowCount(spark, leaf.toString)
        val tmp = new Path(leaf.getParent, s".compact_${leaf.getName}")
        if (hfs.exists(tmp)) hfs.delete(tmp, true)
        spark.read.parquet(leaf.toString)
          .coalesce(nOut)
          .write.mode("overwrite").parquet(tmp.toString)
        val newRows = ParquetMeta.rowCount(spark, tmp.toString)
        if (newRows != oldRows) {
          // Never install a lossy rewrite; leave the leaf untouched.
          hfs.delete(tmp, true)
          after += files.size
          rows += oldRows
        } else {
          val bak = new Path(leaf.getParent, s".bak_${leaf.getName}")
          if (hfs.exists(bak)) hfs.delete(bak, true)
          if (!hfs.rename(leaf, bak)) sys.error(s"backup rename failed for $leaf")
          if (!hfs.rename(tmp, leaf)) {
            // Roll back: restore the original leaf.
            hfs.rename(bak, leaf)
            sys.error(s"install rename failed for $leaf")
          }
          hfs.delete(bak, true)
          compacted += 1
          after += dataFiles(hfs, leaf).size
          rows += newRows
        }
      } else {
        after += files.size
        rows += ParquetMeta.rowCount(spark, leaf.toString)
      }
    }
    CompactReport(leaves.size, compacted, before, after, rows)
  }

  /** Directories that directly contain ≥1 visible data file. */
  private def leafDirs(hfs: FileSystem, root: Path): Seq[Path] = {
    def visible(p: Path): Boolean =
      !p.getName.startsWith("_") && !p.getName.startsWith(".")
    def walk(dir: Path): Seq[Path] = {
      val entries = hfs.listStatus(dir).filter(s => visible(s.getPath))
      val subdirs = entries.filter(_.isDirectory).map(_.getPath)
      val hasData = entries.exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      (if (hasData) Seq(dir) else Nil) ++ subdirs.flatMap(walk)
    }
    if (hfs.exists(root)) walk(root) else Nil
  }

  private def dataFiles(hfs: FileSystem, dir: Path) =
    hfs.listStatus(dir).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith(".")).toSeq
}
