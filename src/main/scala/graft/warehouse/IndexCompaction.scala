package graft.warehouse

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Batch-partition folding for the incremental indices — the missing
  * operational half of [[Compactor]]: that one bin-packs files WITHIN a
  * leaf, but [[DedupIndex]]/[[RetrievalIndex]] grow one `batch=N`
  * partition DIR per ingested micro-batch, and at thousands of batches
  * the directory listing itself (one footer + one dir entry per batch)
  * dominates every index read. [[foldBatches]] rewrites all committed
  * partitions `batch ≤ upTo` into ONE consolidated `batch=upTo`
  * partition, so reads (`filter(batch <= last)`) and future ingests see
  * exactly the same rows through ~batches/fold-cadence fewer dirs.
  *
  * Correctness constraints this preserves:
  *  - the `batch` partition-column semantics: every folded row lands in
  *    `batch=upTo ≤ last_batch`, so committed-only filters still admit
  *    it and orphan (uncommitted) dirs are never touched (they stay
  *    > upTo and get overwritten by their replay);
  *  - the stats/commit-marker protocol: fold never writes `stats`, so
  *    `last_batch` and the replay short-circuit are untouched;
  *  - per-batch REPLAY artifacts (DedupIndex's `matches/batch=N`, read
  *    back by id on a committed replay) must NOT be folded — callers
  *    fold only the tables whose reads are always `batch <= last`.
  *
  * Crash safety is the [[Compactor]] marker discipline, spanning dirs:
  *
  *  1. rewrite the committed partitions into `<table>/.fold_tmp`
  *     (dot-hidden — partition discovery ignores it), verify row count;
  *  2. write `<table>/.fold_commit` containing `upTo;` (';'-terminated —
  *     see [[recover]]'s truncation discussion) — the decision point;
  *  3. delete the old `batch ≤ upTo` dirs, rename tmp → `batch=upTo`,
  *     remove the marker.
  *
  * [[recover]] rolls a crashed fold BACK before step 2 (drop tmp; the
  * old dirs were never touched) and FORWARD after it (tmp still present
  * → redo the deletes + rename, both idempotent; tmp gone → the rename
  * finished, only the marker needs clearing). Recovery runs at the top
  * of every locked index verb, so writers always see a fully-old or
  * fully-new table; unlocked readers share [[Compactor]]'s documented
  * transient-under-count window during an active fold and should run in
  * the same lease window when that matters.
  *
  * Folding is a MAJOR compaction: each fold rewrites everything ≤ upTo,
  * so total write amplification over N batches at fold cadence C is
  * ~N²/(2C) rows — amortized away by folding every ~√N-ish batches (the
  * spec drives cadence 10 over 30 batches; a production loop would fold
  * from its scheduler tick exactly like [[History]] compaction).
  */
object IndexCompaction {

  private val TmpName = ".fold_tmp"
  private val MarkerName = ".fold_commit"

  final case class FoldReport(dirsBefore: Int, dirsAfter: Int,
                              filesBefore: Long, filesAfter: Long,
                              rows: Long) {
    def summary: String =
      s"$dirsBefore -> $dirsAfter batch dirs, $filesBefore -> $filesAfter " +
        s"files, $rows rows"
  }

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def batchDirs(hfs: FileSystem, table: Path): Seq[(Long, Path)] =
    if (!hfs.exists(table)) Nil
    else hfs.listStatus(table).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .flatMap(s => s.getPath.getName.stripPrefix("batch=").toLongOption
        .map(_ -> s.getPath))

  private def countFiles(hfs: FileSystem, dir: Path): Long =
    hfs.listStatus(dir).count(s => s.isFile &&
      s.getPath.getName.endsWith(".parquet") &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))

  /** Fold every committed `batch ≤ upTo` partition of `table` into one
    * consolidated `batch=upTo` partition. No-op (and zero reads) when
    * ≤ 1 such dir exists. Callers hold the index lock/lease.
    */
  def foldBatches(spark: SparkSession, table: String, upTo: Long,
                  targetBytes: Long = 128L << 20): FoldReport = {
    val root = new Path(table)
    val hfs = fs(spark, root)
    recover(spark, table)
    val dirs = batchDirs(hfs, root).filter(_._1 <= upTo)
    val filesBefore = dirs.map(d => countFiles(hfs, d._2)).sum
    if (dirs.size <= 1)
      return FoldReport(dirs.size, dirs.size, filesBefore, filesBefore, 0L)
    val srcs = dirs.map(_._2.toString)
    // Per-dir reads (no partition discovery): rows carry no `batch`
    // column, exactly like the per-batch writes that created them, so
    // the renamed consolidated dir re-derives batch=upTo for every row.
    val data = spark.read.parquet(srcs: _*)
    val totalBytes = dirs.map(d => hfs.getContentSummary(d._2).getLength).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new Path(root, TmpName)
    if (hfs.exists(tmp)) hfs.delete(tmp, true)
    data.repartition(nOut).write.mode("overwrite").parquet(tmp.toString)
    val oldRows = data.count()
    val newRows = spark.read.parquet(tmp.toString).count()
    if (newRows != oldRows) { // never install a lossy rewrite
      hfs.delete(tmp, true)
      sys.error(s"IndexCompaction.foldBatches: rewrite row count $newRows " +
        s"!= $oldRows under $table — fold aborted, table untouched")
    }
    val marker = new Path(root, MarkerName)
    val out = hfs.create(marker, true)
    // Terminator-required format: a crash mid-write can leave a numeric
    // PREFIX of upTo ("1" surviving from "12"), which would parse as a
    // valid smaller batch id and make recover() roll FORWARD to the
    // wrong partition (tmp folded-through-12 installed as batch=1 while
    // dirs 2..12 survive → double count). The parser only accepts a
    // marker that carries the trailing ';', which no truncation of a
    // longer marker can exhibit.
    out.write(s"$upTo;".getBytes("UTF-8"))
    out.close() // decision point
    rollForward(hfs, root, upTo)
    val after = new Path(root, s"batch=$upTo")
    FoldReport(dirs.size, 1, filesBefore, countFiles(hfs, after), newRows)
  }

  /** Finish step 3; idempotent under re-entry at any crash point. */
  private def rollForward(hfs: FileSystem, root: Path, upTo: Long): Unit = {
    val tmp = new Path(root, TmpName)
    if (hfs.exists(tmp)) {
      // tmp still present ⇒ the consolidated data lives ONLY in tmp, so
      // deleting the old dirs (including any previous batch=upTo) is
      // safe however many times it re-runs.
      batchDirs(hfs, root).filter(_._1 <= upTo)
        .foreach { case (_, p) => hfs.delete(p, true) }
      if (!hfs.rename(tmp, new Path(root, s"batch=$upTo")))
        sys.error(s"IndexCompaction: install rename failed under $root")
    }
    hfs.delete(new Path(root, MarkerName), false)
  }

  /** Heal a table a previous fold crashed in: marker present → roll
    * forward (the rewrite was complete and verified); absent → roll
    * back (drop any partial tmp; the original dirs were never touched
    * before the marker existed).
    */
  def recover(spark: SparkSession, table: String): Unit = {
    val root = new Path(table)
    val hfs = fs(spark, root)
    if (!hfs.exists(root)) return
    val marker = new Path(root, MarkerName)
    if (hfs.exists(marker)) {
      // Read the WHOLE marker (a single read() may underfill on some
      // FileSystems) and parse defensively: a crash between marker
      // create and content write leaves an empty/truncated file —
      // including a truncation to a numeric PREFIX of upTo, which would
      // otherwise parse as a valid smaller batch id. The writer appends
      // a ';' terminator as the last byte; the parser accepts ONLY a
      // terminated marker, so any truncation is unparsable and
      // therefore PRE-decision — old-dir deletes only ever run after a
      // fully-written marker exists — and we roll BACK (drop tmp and
      // the marker; originals are intact) instead of installing tmp
      // under the wrong partition or wedging on NumberFormatException.
      val len = hfs.getFileStatus(marker).getLen.toInt
      val bytes = new Array[Byte](len)
      val in = hfs.open(marker)
      try in.readFully(0, bytes) finally in.close()
      val txt = new String(bytes, "UTF-8")
      val parsed =
        if (txt.endsWith(";")) txt.dropRight(1).trim.toLongOption else None
      parsed match {
        case Some(upTo) => rollForward(hfs, root, upTo)
        case None if txt.nonEmpty && txt.forall(_.isDigit) =>
          // AMBIGUOUS (r13 ADVICE): a fully-numeric unterminated marker
          // is either (a) a truncation of this binary's "N;" — PRE-
          // decision, originals intact, rollback safe — or (b) a
          // COMPLETE marker from the pre-r13 format that wrote bare
          // digits — POST-decision, some old dirs may already be gone
          // and tmp holds the only copy, so rollback destroys rows.
          // Auto-accepting (b) isn't safe either: under (a), "1"
          // surviving from "12;" would install fold-through-12 data as
          // batch=1 beside the still-live dirs 2..12 — double count.
          // Neither direction is provably safe, so refuse and hand the
          // operator the discriminating check instead of guessing.
          sys.error(s"IndexCompaction.recover: ambiguous unterminated " +
            s"fold marker '$txt' under $table (pre-upgrade complete " +
            "marker vs truncated current-format marker). If every " +
            s"batch<=$txt dir is still present the fold never committed: " +
            s"delete $MarkerName and $TmpName. If some are missing the " +
            "old fold DID commit and .fold_tmp holds the only copy: " +
            s"rewrite the marker as '$txt;' and re-run. In-flight folds " +
            "should be drained (recovered) on the old binary before " +
            "upgrading across the marker-format change.")
        case None =>
          hfs.delete(new Path(root, TmpName), true)
          hfs.delete(marker, false)
      }
    } else hfs.delete(new Path(root, TmpName), true)
  }
}
