package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery

/** Incremental covariance / PCA maintenance — the d×d member of the
  * exact state-table family ([[MomentsState]] holds per-group scalars;
  * this holds the embedding corpus's upper-triangle sufficient
  * statistics): per dimension pair (i ≤ j), persist
  * (n, s_x_nano, s_y_nano, s_xy_nano) — the q118 integer statistics —
  * and fold each batch in by plain BIGINT addition. Integer sums are
  * order-independent, so a replayed fold equals the one-shot aggregate
  * bit-for-bit with no error term, and "tonight's PCA basis over
  * everything ingested so far" reads d(d+1)/2 rows of state instead of
  * re-scanning every batch ever loaded — the incremental form of the
  * SemDeDup-style reduce-then-cluster pipeline ([[graft.analytics.Pca]]).
  *
  * Persistence is the family's delta-dir + marker protocol (r10: it was
  * a single folded table before, which could DOUBLE-fold a replayed
  * batch — the one state member without a streaming face for exactly
  * that reason): each batch's pair statistics land in
  * `deltas/batch=N/`, the `stats` table ([[StateFiles]] staged swap)
  * carries `last_batch` as the COMMIT MARKER, reads aggregate committed
  * deltas only (integer sums — order-independent, so delta-sharded ≡
  * one-shot bit-for-bit), and a committed replay short-circuits. That
  * makes `update` a safe `foreachBatch` sink
  * ([[graft.streaming.StreamingIndex.covarianceAvailableNow]]), and
  * [[IndexCompaction]] folds the delta dirs on a maintenance cadence.
  *
  * Headroom: each product is nano-rounded once (|x| ≲ 1 ⇒ terms ≲ 2e9),
  * so s_xy_nano stays exact to ~4e9 accumulated rows per pair — far past
  * any single state table's life; re-base (subtract a checkpointed mean)
  * long before that.
  */
object CovarianceState {

  private def deltasPath(root: String) = s"$root/deltas"
  private def statsPath(root: String) = s"$root/stats"

  /** r11 (advice): the r10 layout change (single folded table at the
    * root → stats/ + deltas/) must never silently orphan a pre-r10
    * state — a root holding parquet data files but no stats/ commit
    * table IS the legacy layout, and treating it as empty would discard
    * every accumulated statistic on the next update. Fail loudly; the
    * migration is a one-shot read-the-old-table → `update(batchId=0)`.
    */
  /** The root entries holding LEGACY data: parquet data anywhere under
    * the root that is NOT part of the new layout. Root-level files
    * catch the unpartitioned old table; the subdirectory probe (r13,
    * advice) catches a PARTITIONED legacy table whose data lives only
    * under partition dirs — previously treated as empty and silently
    * orphaned, the precise loss the guard exists to prevent. `deltas/`
    * is skipped: a first-batch crash between the delta write and the
    * stats install legitimately leaves deltas/ without stats/, and
    * recovery (not the guard) owns that state.
    */
  private def legacyEntries(hfs: org.apache.hadoop.fs.FileSystem,
                            p: org.apache.hadoop.fs.Path)
      : Seq[org.apache.hadoop.fs.Path] = {
    def hasParquetUnder(dir: org.apache.hadoop.fs.Path): Boolean = {
      val it = hfs.listFiles(dir, true)
      var found = false
      while (!found && it.hasNext) {
        val name = it.next().getPath.getName
        found = name.endsWith(".parquet") &&
          !name.startsWith("_") && !name.startsWith(".")
      }
      found
    }
    if (!hfs.exists(p)) Nil
    else hfs.listStatus(p).toSeq.filter { st =>
      val name = st.getPath.getName
      if (st.isFile) name.endsWith(".parquet")
      else name != "deltas" && name != "stats" &&
        !name.startsWith(".") && !name.startsWith("_") &&
        hasParquetUnder(st.getPath)
    }.map(_.getPath)
  }

  private def guardLegacyLayout(spark: SparkSession, root: String): Unit =
    if (!StateFiles.exists(spark, statsPath(root))) {
      val p = new org.apache.hadoop.fs.Path(root)
      val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (legacyEntries(hfs, p).nonEmpty)
        sys.error(s"CovarianceState: legacy single-table layout at $root " +
          "(parquet data under the state root, no stats/ commit table). " +
          "Refusing to start fresh over accumulated statistics — run the " +
          "`migrate-state covariance <root>` CLI verb (or read the old " +
          "table and re-ingest it as batch 0).")
    }

  /** One-shot migration of a pre-r10 legacy state (a folded pair-stats
    * table at the root — partitioned or not) into the delta-dir layout:
    * the legacy statistics are re-grouped to one row per (i, j) pair
    * (a partitioned legacy table may shard a pair across partitions;
    * BIGINT sums make the re-fold exact) and installed as `batch 0`,
    * then the legacy files are removed. Crash-safe in the family's
    * idempotent style:
    *   - crash after the delta write, before the stats install → the
    *     guard still sees legacy-without-stats; re-running migrate
    *     overwrites the delta and proceeds;
    *   - crash after the stats install, before the legacy delete → the
    *     state is already live; re-running migrate skips ingestion and
    *     finishes the cleanup.
    * Refuses a root with NO legacy data and no state (nothing to
    * migrate — likely a typo'd path).
    */
  def migrateLegacy(spark: SparkSession, statePath: String,
                    lease: Boolean = false): Unit =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        val p = new org.apache.hadoop.fs.Path(statePath)
        val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val legacy = legacyEntries(hfs, p)
        if (StateFiles.exists(spark, statsPath(statePath))) {
          // Already migrated (or was never legacy): only the cleanup
          // half can be outstanding. The delete is gated on the SAME
          // six-column shape check as ingestion: every delta-dir state
          // family keeps a stats/ table, so `migrate-state covariance`
          // pointed at a RetrievalIndex/IvfState/PqState root would
          // otherwise take this branch and silently destroy its
          // postings/bundle data (r13 ADVICE). Unreadable-as-one-table
          // entries refuse too — refusal is the safe outcome.
          if (legacy.nonEmpty) readLegacyChecked(spark, statePath, legacy) match {
            case Left(why) =>
              sys.error(s"CovarianceState.migrateLegacy: refusing to clean " +
                s"up $statePath — the residual entries do not look like a " +
                s"legacy covariance table ($why); is this another state " +
                "family's root?")
            case Right(_) => legacy.foreach(hfs.delete(_, true))
          }
        } else {
          if (legacy.isEmpty)
            sys.error(s"CovarianceState.migrateLegacy: no legacy parquet " +
              s"data under $statePath and no committed state — nothing to " +
              "migrate")
          val df = readLegacyChecked(spark, statePath, legacy) match {
            case Left(why) =>
              sys.error(s"CovarianceState.migrateLegacy: $statePath does " +
                s"not look like a legacy covariance state ($why)")
            case Right(d) => d
          }
          df.select(legacyCols.map(col): _*)
            .groupBy("i", "j")
            .agg(sum("n").as("n"), sum("s_x_nano").as("s_x_nano"),
              sum("s_y_nano").as("s_y_nano"), sum("s_xy_nano").as("s_xy_nano"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(s"${deltasPath(statePath)}/batch=0")
          StateFiles.installMarker(spark, statsPath(statePath),
            Seq("last_batch" -> 0L))
          legacy.foreach(hfs.delete(_, true))
        }
      }
    }

  private val legacyCols = Seq("i", "j", "n", "s_x_nano", "s_y_nano", "s_xy_nano")

  /** Read the legacy entries as ONE table, or say why they aren't one.
    * `basePath` = the state root, so a legacy table PARTITIONED BY one of
    * the six stats columns (whose leaf dirs are what [[legacyEntries]]
    * lists) gets its partition column back instead of failing the shape
    * check with a misleading missing-column message (r13 ADVICE).
    */
  private def readLegacyChecked(spark: SparkSession, root: String,
      legacy: Seq[org.apache.hadoop.fs.Path]): Either[String, DataFrame] =
    scala.util.Try(
      spark.read.option("basePath", root).parquet(legacy.map(_.toString): _*)
    ) match {
      case scala.util.Failure(e) =>
        Left(s"unreadable as one parquet table: ${e.getMessage}")
      case scala.util.Success(df) =>
        val missing = legacyCols.filterNot(df.columns.contains)
        if (missing.nonEmpty) Left(s"missing columns: ${missing.mkString(", ")}")
        else Right(df)
    }

  private def readLast(spark: SparkSession, root: String): Option[Long] =
    StateFiles.readMarker(spark, statsPath(root))
      .map(_("last_batch").asInstanceOf[Long])

  /** Fold one batch of vectors into the covariance state at `statePath`;
    * returns the post-merge pair statistics, eagerly materialized so the
    * snapshot survives the next swap. `batchId` defaults to
    * last_batch + 1; pass the foreachBatch epoch for replay idempotence
    * (a committed replay ingests nothing and returns the snapshot).
    */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
             vecCol: String = "embedding", batchId: Option[Long] = None,
             lease: Boolean = false): DataFrame =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        guardLegacyLayout(spark, statePath)
        StateFiles.recover(spark, statsPath(statePath))
        IndexCompaction.recover(spark, deltasPath(statePath))
        val last = readLast(spark, statePath).getOrElse(-1L)
        val id = batchId.getOrElse(last + 1)
        if (id > last) { // else: committed replay, every effect installed
          // coalesce(1): a delta is a DOMAIN-bounded sufficient-statistics
          // frame (d(d+1)/2 pair rows — KBs), not corpus data; letting it
          // inherit the 32 shuffle partitions wrote 32 tiny files per
          // batch, and every snapshot re-opened all of them (the r10
          // q155 2.0→2.6 s write-amplification watch).
          graft.analytics.Pca.covarianceStats(batch, vecCol)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(s"${deltasPath(statePath)}/batch=$id")
          StateFiles.installMarker(spark, statsPath(statePath),
            Seq("last_batch" -> id))
        }
        snapshot(spark, statePath).localCheckpoint(eager = true)
      }
    }

  /** The folded pair statistics over COMMITTED deltas (orphan dirs from
    * a crash are pruned at the scan by the partition-column filter).
    */
  def snapshot(spark: SparkSession, statePath: String): DataFrame = {
    guardLegacyLayout(spark, statePath)
    val last = readLast(spark, statePath)
      .getOrElse(sys.error(s"CovarianceState.snapshot: no state at $statePath"))
    spark.read.parquet(deltasPath(statePath))
      .filter(col("batch") <= last)
      .groupBy("i", "j")
      .agg(sum("n").as("n"), sum("s_x_nano").as("s_x_nano"),
        sum("s_y_nano").as("s_y_nano"), sum("s_xy_nano").as("s_xy_nano"))
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

  /** Assemble the dense covariance from the state (nano units undone
    * AFTER the exact fold — the q118 discipline) — a state-table read,
    * never a history scan.
    */
  def covariance(spark: SparkSession, statePath: String): Array[Array[Double]] = {
    val rows = snapshot(spark, statePath).collect()
    val d = rows.map(_.getInt(1)).max + 1
    val m = Array.fill(d, d)(0.0)
    rows.foreach { r =>
      val (i, j, n) = (r.getInt(0), r.getInt(1), r.getLong(2).toDouble)
      val sx = r.getLong(3) / 1e9; val sy = r.getLong(4) / 1e9
      val sxy = r.getLong(5) / 1e9
      val c = sxy / n - (sx / n) * (sy / n)
      m(i)(j) = c; m(j)(i) = c
    }
    m
  }

  /** Top-r PCA basis of everything folded so far — driver-side deflated
    * power iteration ([[graft.analytics.Pca.principalComponents]]) on the
    * KB-sized assembled matrix; no corpus pass at all.
    */
  def principalComponents(spark: SparkSession, statePath: String,
                          r: Int): Seq[(Double, Array[Double])] =
    graft.analytics.Pca.principalComponents(covariance(spark, statePath), r)

  // --------------------------------------------------------------- q155
  /** End-to-end incremental-covariance gate: fold the embeddings corpus
    * into the state in 3 batches split by vec_id, then emit the full
    * pair-statistics state. The DuckDB oracle is q118's ONE-SHOT
    * aggregate — so the hash gate proves 3-batch fold ≡ one-shot
    * bit-for-bit across all 2,080 BIGINT rows (the mergeable-summary
    * claim itself, with no error bound to hide behind).
    */
  def covarianceStateCheck(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.core.Tables.embeddings(spark, dir)
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-cstate")
    val statePath = stateRoot.toString + "/state"
    var out: DataFrame = null
    try {
      (0 until 3).foreach { i =>
        out = update(spark, statePath, emb.filter(col("vec_id") % 3 === i))
      }
    } finally {
      // Snapshot is checkpointed; reclaim scratch state even when a fold
      // throws mid-way (the q70 lesson, and r11's EvalState fix — bench
      // reps and failed runs would otherwise accumulate /tmp dirs).
      graft.core.Fs.deleteRecursively(stateRoot)
    }
    out.select("i", "j", "n", "s_x_nano", "s_y_nano", "s_xy_nano")
  }

  private val covarianceStateSql =
    """WITH v AS (
      |  SELECT embedding::DOUBLE[] AS v FROM embeddings
      |), px AS (
      |  SELECT v, i.i AS i, v[i.i + 1] AS x
      |  FROM v, (SELECT unnest(range(0, 64)) AS i) i
      |  WHERE i.i < len(v)
      |)
      |SELECT CAST(px.i AS INTEGER) AS i, CAST(j.j AS INTEGER) AS j,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(px.x * 1e9) AS BIGINT)) AS BIGINT) AS s_x_nano,
      |  CAST(sum(CAST(round(px.v[j.j + 1] * 1e9) AS BIGINT)) AS BIGINT) AS s_y_nano,
      |  CAST(sum(CAST(round(px.x * px.v[j.j + 1] * 1e9) AS BIGINT)) AS BIGINT) AS s_xy_nano
      |FROM px, (SELECT unnest(range(0, 64)) AS j) j
      |WHERE j.j >= px.i AND j.j < len(px.v)
      |GROUP BY 1, 2""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q155_covariance_state", covarianceStateCheck _, Some(covarianceStateSql)))
}
