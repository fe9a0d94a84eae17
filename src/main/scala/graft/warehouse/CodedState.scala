package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.{IvfIndex, Similarity}

/** Shared core of the ENCODE-ONCE incremental ANN states — the members
  * whose codes are per-vector (no trained codebook in the code path:
  * SQ8's scale+int8 in [[SqState]], the packed sign bits in
  * [[BitState]], the raw-vector SQ8 of the MIPS face in [[MipsState]]),
  * so encoding happens exactly once at ingest and every recluster moves
  * rows between cells carrying committed code columns verbatim.
  * [[PqState]]/[[IvfPqState]] deliberately do NOT ride this core: their
  * codes are codebook-relative, so their maintenance verb MUST
  * re-encode — the structural difference this family's scaladoc claims,
  * and the one thing a shared implementation would blur.
  *
  * Protocol, layout, and crash discipline are [[IvfState]]'s (delta
  * dirs + `last_batch` commit marker via [[StateFiles]], staged bundle
  * swap with `.bak` recovery, lease-guarded verbs, reader-side
  * non-mutating resolution). Concrete members supply the encode step
  * and the approximate-scan column; search is the family shape: probed
  * cells ∩ bundle through [[Similarity.rerankShortlist]], exact scan
  * over the unfolded tail, one rank window.
  *
  * Round-18 surface, closing the serving asymmetries the r17 verdict
  * named (a live index a 100-TB pipeline serves from must answer
  * metadata-constrained queries and survive curation deletes without a
  * rebuild):
  *
  *   - PINNED STATE METADATA. The stats marker carries, beside
  *     `last_batch`, the attribute columns stored with every vector
  *     (`attr_cols`, fixed at state creation) and the face's code
  *     dimension (`code_dim`, fixed at the first non-empty ingest).
  *     [[BitState]]'s hyperplane matrix is seeded per (tables, bits,
  *     dim): re-probing dim per micro-batch meant batches whose max
  *     dims differ encoded under DIFFERENT plane matrices yet produced
  *     same-length code arrays — valid-looking Hamming values, silently
  *     wrong shortlists once a recluster merged them (r17 ADVICE). The
  *     pinned dim makes every [[encodeBatch]] and [[queryFrame]] use
  *     ONE matrix and fail loudly on a ragged row instead of dropping
  *     or re-probing.
  *   - FILTERED SEARCH — the q272 rule composed into the state: the
  *     equality filter is an ADDITIONAL JOIN KEY beside the probed cell
  *     in the bundle scan and an equi-join key on the tail, so the
  *     stratum restriction applies BEFORE the shortlist window (k exact
  *     per stratum by construction; a query's work is stratum ∩ probed
  *     cells, never the corpus).
  *   - DELETES — [[delete]] writes TOMBSTONE epochs under the same
  *     exactly-once `last_batch` protocol as ingest (replayed epochs
  *     short-circuit on the marker). Search anti-joins live tombstones
  *     (id-only against the bundle — every live tombstone postdates
  *     every folded row; batch-ordered against the tail — a re-ingest
  *     AFTER the delete epoch survives it), applied BEFORE the
  *     shortlist window so a dead row never consumes a slot; recluster
  *     applies them to the fold and purges the epochs it covered. A
  *     curation pass (q144/q240/q200) thus shrinks the index in one
  *     metadata-sized verb instead of forcing the full rebuild the
  *     incremental states exist to avoid.
  */
private[graft] abstract class CodedIvfStateCore {

  /** Diagnostics prefix ("SqState", "BitState", "MipsState"). */
  protected def stateName: String

  /** Attach the code columns to a normalized (vec_id, embedding, attrs…)
    * batch — called ONLY from [[update]]: the single encode site of the
    * state. `codeDim` is the pinned code dimension from the state
    * metadata (−1 until the first non-empty ingest — a face that needs
    * it, [[BitState]], only sees −1 for empty batches).
    */
  protected def encodeBatch(batch: DataFrame, codeDim: Long): DataFrame

  /** Probe the code dimension to pin at the first non-empty ingest
    * (−1 = this face has no cross-batch code coupling — SQ8's scale is
    * per-vector; or the batch is empty and pinning waits).
    */
  protected def probeCodeDim(batch: DataFrame): Long = -1L

  /** The code columns [[encodeBatch]] adds (carried verbatim by every
    * recluster; tampering them is how the specs PROVE no re-encode).
    */
  protected def codeCols: Seq[String]

  /** Approximate score over (query frame, code columns) for the bundle
    * scan. */
  protected def approxScore: Column

  /** true when [[approxScore]] is distance-like (ascending shortlist). */
  protected def approxAsc: Boolean

  /** Guard for the exact re-rank (the zero-vector NaN rule); guarded
    * rows score −2.0 on BOTH the bundle re-rank and the tail scan. */
  protected def exactGuard: Column

  /** Exact score over (`q_vec`, `embedding`) for the bundle re-rank AND
    * the tail scan — cosine unless the face ranks by another measure
    * ([[MipsState]] re-ranks by the raw inner product).
    */
  protected def exactScore: Column =
    graft.functions.cosineSimilarity(col("q_vec"), col("embedding"))

  /** Column [[IvfIndex.withNearestCells]] probes on the bundle query
    * frame — `q_vec` unless the face probes in a transformed space
    * ([[MipsState]]'s norm-augmented coordinates in `q_probe`).
    */
  protected def probeCol: String = "q_vec"

  /** Frame for coarse training and cell assignment at [[recluster]],
    * plus the vector column to train on — identity unless the face
    * clusters in a transformed space ([[MipsState]] augments
    * transiently; the transient column is dropped before the bundle
    * write, so the bundle stores exactly `vec_id`/`embedding`/codes/
    * attrs at every face).
    */
  protected def trainFrame(all: DataFrame): (DataFrame, String) =
    (all, "embedding")

  /** The bundle-probe query frame over the normalized (vec_id,
    * embedding, attrs…) batch: must rename to `query_id`/`q_vec`, KEEP
    * every other column (the filter column rides it into the join), and
    * add whatever [[approxScore]]/[[probeCol]] read (e.g. [[BitState]]
    * re-encodes the queries under the corpus's pinned plane matrix).
    */
  protected def queryFrame(qn: DataFrame, codeDim: Long): DataFrame =
    qn.withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("embedding", "q_vec")

  private def deltasPath(root: String) = s"$root/deltas"
  private def deletesPath(root: String) = s"$root/deletes"
  private def statsPath(root: String) = s"$root/stats"
  private def bundlePath(root: String) = s"$root/bundle"
  private def stagingPath(root: String) = s"$root/.staging_bundle"

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Pinned state metadata beside the commit marker: attribute columns
    * (fixed at creation) and code dimension (fixed at first non-empty
    * ingest). Read tolerantly so a pre-r18 marker (bare `last_batch`)
    * still resolves.
    */
  private case class StateMeta(last: Long, attrCols: Seq[String], codeDim: Long)

  // Marker I/O is the direct (job-free) path — StateFiles.readMarker /
  // installMarker — because a lifecycle touches these 5–12 times and each
  // Spark-job read/write was measured as pure orchestration overhead.
  private def readMeta(spark: SparkSession, root: String): Option[StateMeta] =
    StateFiles.readMarker(spark, statsPath(root)).map { m =>
      val attrs = m.get("attr_cols") match {
        case Some(s: Seq[_]) => s.map(_.toString)
        case _ => Nil
      }
      val dim = m.get("code_dim") match {
        case Some(d: Long) => d
        case _ => -1L
      }
      StateMeta(m("last_batch").asInstanceOf[Long], attrs, dim)
    }

  private def installStats(spark: SparkSession, root: String, last: Long,
                           attrCols: Seq[String], codeDim: Long): Unit =
    StateFiles.installMarker(spark, statsPath(root),
      Seq("last_batch" -> last, "attr_cols" -> attrCols, "code_dim" -> codeDim))

  private def bakPath(p: Path) = new Path(p.getParent, s".bak_${p.getName}")

  /** Locked-verb-only bundle recovery — the [[IvfState]] r13 rule:
    * readers resolve via [[liveBundle]] instead.
    */
  private def recoverBundle(spark: SparkSession, root: String): Unit = {
    val p = new Path(bundlePath(root))
    val hfs = fs(spark, root)
    val bak = bakPath(p)
    if (!hfs.exists(p) && hfs.exists(bak)) hfs.rename(bak, p)
  }

  private def liveBundle(spark: SparkSession, root: String): Option[Path] = {
    val p = new Path(bundlePath(root))
    val hfs = fs(spark, root)
    if (hfs.exists(p)) Some(p)
    else { val b = bakPath(p); if (hfs.exists(b)) Some(b) else None }
  }

  private def foldedThrough(spark: SparkSession, bundle: Option[Path]): Long =
    bundle.flatMap { b =>
      StateFiles.readMarker(spark, s"$b/meta")
        .map(_("folded_through").asInstanceOf[Long])
    }.getOrElse(-1L)

  private def dataCols: Seq[String] = Seq("vec_id", "embedding") ++ codeCols

  /** Committed-but-unfolded ENCODED rows: batches in `(from, last]`,
    * carrying their ingest `batch` (the tombstone order key) and the
    * pinned attribute columns — or None when no such batch dir exists
    * (a delete epoch can advance `last_batch` past `folded_through`
    * with the deltas dir empty after a purge, where a blind parquet
    * read would fail schema inference). The dir listing is
    * metadata-sized (epoch count).
    */
  private def readTail(spark: SparkSession, root: String, from: Long,
                       last: Long, attrCols: Seq[String]): Option[DataFrame] = {
    val p = new Path(deltasPath(root))
    val hfs = fs(spark, root)
    if (!hfs.exists(p)) None
    else {
      val any = hfs.listStatus(p).exists { st =>
        st.isDirectory && st.getPath.getName.stripPrefix("batch=").toLongOption
          .exists(b => b > from && b <= last)
      }
      if (!any) None
      else Some(spark.read.parquet(deltasPath(root))
        .filter(col("batch") > from && col("batch") <= last)
        .select((dataCols ++ attrCols :+ "batch").map(col): _*))
    }
  }

  /** Live tombstones — delete epochs in `(from, last]` as
    * (`__del_id`, `__del_batch`) — or None when none exist (the common
    * case pays no read and no join). The driver-side dir listing is
    * metadata-sized (epoch count).
    */
  private def readTombstones(spark: SparkSession, root: String,
                             from: Long, last: Long): Option[DataFrame] = {
    val p = new Path(deletesPath(root))
    val hfs = fs(spark, root)
    if (!hfs.exists(p)) None
    else {
      val any = hfs.listStatus(p).exists { st =>
        st.isDirectory && st.getPath.getName.stripPrefix("batch=").toLongOption
          .exists(b => b > from && b <= last)
      }
      if (!any) None
      else Some(spark.read.parquet(deletesPath(root))
        .filter(col("batch") > from && col("batch") <= last)
        .select(col("vec_id").as("__del_id"), col("batch").as("__del_batch")))
    }
  }

  /** Fold one batch of vectors into the state; returns the committed
    * batch id. THE ONLY ENCODE CALL IN THE STATE — every row's code
    * columns are computed here, exactly once, and carried verbatim by
    * every later recluster (the no-re-encode invariant the specs pin by
    * tampering). `batchId` defaults to last_batch + 1; pass the
    * foreachBatch epoch for replay idempotence. `attrCols` declares
    * metadata columns stored beside every vector (the filterable
    * surface of [[search]]): pinned at state creation — later updates
    * may omit them (the pinned set is used) but must not contradict
    * them.
    */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding",
             batchId: Option[Long] = None, lease: Boolean = false,
             attrCols: Seq[String] = Nil): Long =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statsPath(statePath))
        val meta = readMeta(spark, statePath)
        val pinnedAttrs = meta match {
          case Some(m) =>
            if (attrCols.nonEmpty && attrCols != m.attrCols)
              sys.error(s"$stateName.update: attr columns " +
                s"${attrCols.mkString("[", ",", "]")} do not match the " +
                s"state's pinned ${m.attrCols.mkString("[", ",", "]")} under " +
                s"$statePath — attribute columns are fixed at state creation")
            m.attrCols
          case None => attrCols
        }
        val last = meta.map(_.last).getOrElse(-1L)
        var codeDim = meta.map(_.codeDim).getOrElse(-1L)
        val id = batchId.getOrElse(last + 1)
        if (id > last) { // else: committed replay, every effect installed
          val normalized = batch.select(
            (Seq(col(idCol).cast("long").as("vec_id"),
              col(vecCol).cast("array<double>").as("embedding")) ++
              pinnedAttrs.map(col)): _*)
          if (codeDim < 0) codeDim = probeCodeDim(normalized)
          encodeBatch(normalized, codeDim)
            .coalesce(1) // one file per micro-batch (the q155 lesson)
            .write.mode("overwrite")
            .parquet(s"${deltasPath(statePath)}/batch=$id")
          installStats(spark, statePath, id, pinnedAttrs, codeDim)
        }
        math.max(id, last)
      }
    }

  /** Remove vectors from the state: a TOMBSTONE epoch under the same
    * exactly-once `last_batch` protocol as [[update]] — the epoch
    * commits a distinct id set to `deletes/batch=N` and advances the
    * shared marker, so replayed delete epochs short-circuit exactly
    * like replayed ingests, and batch order TOTALLY ORDERS deletes
    * against ingests: a tombstone kills precisely the rows whose ingest
    * epoch PRECEDES it (a later re-ingest of the same id resurfaces
    * it). Cost is metadata-sized (the id list); no index row is touched
    * until the next [[recluster]] folds the tombstones in and purges
    * them — the one verb curation pipelines were missing (deleting used
    * to mean a full rebuild).
    */
  def delete(spark: SparkSession, statePath: String, ids: DataFrame,
             idCol: String = "vec_id", batchId: Option[Long] = None,
             lease: Boolean = false): Long =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statsPath(statePath))
        val meta = readMeta(spark, statePath)
          .getOrElse(sys.error(s"$stateName.delete: no state at $statePath"))
        val id = batchId.getOrElse(meta.last + 1)
        if (id > meta.last) {
          ids.select(col(idCol).cast("long").as("vec_id")).distinct()
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(s"${deletesPath(statePath)}/batch=$id")
          installStats(spark, statePath, id, meta.attrCols, meta.codeDim)
        }
        math.max(id, meta.last)
      }
    }

  /** Retrain the COARSE quantizer over everything committed AND LIVE,
    * and swap in a fresh cell-partitioned bundle covering batches ≤
    * last_batch. The committed code columns ride through the
    * reassignment untouched — no encode call exists on this path, so a
    * recluster costs one coarse train + one shuffle-by-cell regardless
    * of code width. Live tombstones are applied to the fold (dead rows
    * never enter the new bundle) and the delete epochs the fold covered
    * are purged with the folded deltas. Training routes through the
    * table face past [[IvfIndex.tableModelMinK]], the [[IvfState]]
    * discipline.
    */
  def recluster(spark: SparkSession, statePath: String,
                k: Option[Int] = None, targetCellSize: Long = 512L,
                iters: Int = 2, lease: Boolean = false): Unit =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statsPath(statePath))
        recoverBundle(spark, statePath)
        readMeta(spark, statePath) match {
          case None => // empty state: nothing to cluster
          case Some(meta) =>
            val last = meta.last
            val f = foldedThrough(spark, liveBundle(spark, statePath))
            if (last > f) {
              val hfs = fs(spark, statePath)
              val cols = dataCols ++ meta.attrCols
              val ts = readTombstones(spark, statePath, f, last)
              val bundled =
                if (f >= 0) {
                  val b = spark.read.parquet(s"${bundlePath(statePath)}/index")
                    .select(cols.map(col): _*)
                  // Every live tombstone postdates every folded row
                  // (epochs ≤ f were purged at the previous fold), so
                  // the bundle side kills on id alone.
                  ts match {
                    case Some(t) =>
                      val tid = t.select("__del_id")
                      Some(b.join(tid, b("vec_id") === tid("__del_id"), "left_anti"))
                    case None => Some(b)
                  }
                } else None
              val tail =
                readTail(spark, statePath, f, last, meta.attrCols).map { tl =>
                  val live = ts match {
                    case Some(t) =>
                      tl.join(t, tl("vec_id") === t("__del_id") &&
                        t("__del_batch") > tl("batch"), "left_anti")
                    case None => tl
                  }
                  live.select(cols.map(col): _*)
                }
              val parts = bundled.toSeq ++ tail.toSeq
              // Empty committed epochs (idle foreachBatch ticks) fold to
              // nothing — the IvfState rule. An all-deleted fold also
              // skips: the old bundle stays, correctness held by the
              // still-live tombstones.
              // One count over the union (the IvfState shape) instead of
              // one job per part — and when NO live tombstones exist
              // (the common fold), no job at all: every part is parquet
              // this state wrote, so the exact count is footer metadata
              // (StateFiles.dirRowCount rationale). Tombstoned folds
              // keep the count job (the anti-joins change the count).
              val all0 = parts.reduceOption(_ unionByName _)
              val nAll =
                if (ts.isEmpty)
                  (if (f >= 0) StateFiles.dirRowCount(spark,
                    s"${bundlePath(statePath)}/index") else 0L) +
                  StateFiles.tailRowCount(spark, deltasPath(statePath), f, last)
                else all0.map(_.count()).getOrElse(0L)
              if (nAll > 0) {
                val all = all0.get
                val staging = stagingPath(statePath)
                hfs.delete(new Path(staging), true)
                val kc = k.getOrElse(math.max(1L,
                  (nAll + targetCellSize - 1) / targetCellSize).toInt)
                val (tf, tvCol) = trainFrame(all)
                val model =
                  if (kc > IvfIndex.tableModelMinK)
                    IvfIndex.trainTable(tf, kc, s"$staging/model", iters,
                      vecCol = tvCol, knownCount = Some(nAll))
                  else {
                    val m = k match {
                      case Some(cells) =>
                        IvfIndex.train(tf, cells, iters, vecCol = tvCol,
                          knownCount = Some(nAll))
                      case None =>
                        IvfIndex.trainCellLaw(tf, targetCellSize, iters,
                          vecCol = tvCol, knownCount = Some(nAll))
                    }
                    IvfIndex.save(spark, m, s"$staging/model")
                    m
                  }
                // writePartitionedIndex assigns cells and KEEPS the input
                // columns — code + attr columns land in the new layout
                // verbatim; a transient training column is dropped.
                IvfIndex.writePartitionedIndex(tf, model, s"$staging/index",
                  tvCol, dropCols = if (tvCol == "embedding") Nil else Seq(tvCol))
                StateFiles.writeMarkerDir(spark, s"$staging/meta",
                  Seq("folded_through" -> last))
                // Footer verify of the staged write (no Spark job) — the
                // IvfState rationale.
                val nIdx = StateFiles.dirRowCount(spark, s"$staging/index")
                if (nIdx != nAll) { // never install a lossy rewrite
                  hfs.delete(new Path(staging), true)
                  sys.error(s"$stateName.recluster: staged index rows $nIdx != " +
                    s"$nAll under $statePath — recluster aborted, state untouched")
                }
                val bundleP = new Path(bundlePath(statePath))
                val bak = bakPath(bundleP)
                if (hfs.exists(bak)) hfs.delete(bak, true)
                if (hfs.exists(bundleP) && !hfs.rename(bundleP, bak))
                  sys.error(s"$stateName.recluster: backup rename failed under $statePath")
                if (!hfs.rename(new Path(staging), bundleP))
                  sys.error(s"$stateName.recluster: install rename failed under $statePath")
                hfs.delete(bak, true)
                def purge(dir: String): Unit = {
                  val p = new Path(dir)
                  if (hfs.exists(p)) {
                    hfs.listStatus(p).toSeq
                      .filter(st => st.isDirectory &&
                        st.getPath.getName.stripPrefix("batch=").toLongOption
                          .exists(_ <= last))
                      .foreach(st => hfs.delete(st.getPath, true))
                  }
                }
                purge(deltasPath(statePath))
                // Applied tombstones are spent: every row they could kill
                // is out of the fold, and rows that out-ordered them are
                // folded. A replay of a purged epoch still short-circuits
                // on last_batch. Remove the dir when empty so readers
                // skip the scan entirely.
                purge(deletesPath(statePath))
                val dels = new Path(deletesPath(statePath))
                if (hfs.exists(dels) && hfs.listStatus(dels).isEmpty)
                  hfs.delete(dels, true)
              }
            }
        }
      }
    }

  /** ANN top-k over everything committed and live: probed-cells-only
    * code scan + shortlist exact re-rank over the bundle, exact scan
    * over the unfolded tail, one rank window. Non-mutating read-path
    * recovery; one bounded |Q| sizing pass serves the probe-side hint
    * AND the tail's broadcast decision (the family's one-probe rule);
    * one more sizes the tombstone side only when delete epochs are
    * live. `filterCol` (must be a pinned attr column) restricts each
    * query to ITS OWN stratum — the q272 join-key rule, exact k per
    * stratum by construction. Tombstones are anti-joined BEFORE the
    * shortlist window, so a deleted row never consumes a slot.
    */
  def search(spark: SparkSession, statePath: String, queries: DataFrame,
             k: Int, nprobe: Int = 2, shortlist: Int = 50,
             idCol: String = "vec_id", vecCol: String = "embedding",
             excludeSelf: Boolean = true,
             filterCol: Option[String] = None): DataFrame = {
    val meta = readMeta(spark, statePath)
      .getOrElse(sys.error(s"$stateName.search: no state at $statePath"))
    val last = meta.last
    filterCol.foreach { fc =>
      if (!meta.attrCols.contains(fc))
        sys.error(s"$stateName.search: filter column '$fc' is not among the " +
          s"state's pinned attribute columns " +
          s"${meta.attrCols.mkString("[", ",", "]")} — declare it via " +
          "update(..., attrCols) at state creation")
    }
    val live = liveBundle(spark, statePath)
    val f = foldedThrough(spark, live)
    val qn = queries.select(
      (Seq(col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<double>").as("embedding")) ++
        filterCol.map(col)): _*)
    // Tombstone epochs ≤ f were purged at the fold, so live ones exist
    // only in (f, last] — no read, no join, no probe when none do.
    val ts = if (last > f) readTombstones(spark, statePath, f, last) else None
    val tsSmall = ts.exists(t =>
      IvfIndex.boundedCount(t, IvfIndex.queryBroadcastMaxRows).isDefined)
    // The broadcast gate reads the MATERIALIZED probe frame when a bundle
    // exists (its checkpoint is already paid; counting local blocks is
    // job-cheap) instead of running a second bounded pass over the query
    // pipeline; the probe frame has |Q|·min(nprobe, k) rows, which is
    // exactly the relation the hint would broadcast. Tail-only states
    // (no bundle, so no probe frame) keep the bounded pass.
    var qSmall = false
    val bundlePart =
      if (f >= 0) {
        val b = live.get
        val model = IvfIndex.load(spark, s"$b/model")
        // One probe, two consumers (the scoredCandidatesPruned shape):
        // the frame's distinct cells become the static partition filter
        // (ceilinged — the prunedIndexScan fallback rule) and the frame
        // itself is the candidate join side. Driver arm (the lutFrame
        // dispatch): a broadcast-small probe frame bounded-collects ONCE
        // and serves the sizing gate, the former checkpoint, and the
        // static filter as driver-local data — one job where the r18
        // shape paid three (checkpoint + count + distinct collect).
        val q0 = IvfIndex.withNearestCells(
            queryFrame(qn, meta.codeDim), probeCol, model, nprobe, "__cells")
          .withColumn("cell", explode(col("__cells").getField("cell")))
          .drop("__cells")
        val (q, cellsOpt) =
          IvfIndex.boundedCollect(q0, IvfIndex.queryBroadcastMaxRows) match {
            case Some(rows) =>
              qSmall = true
              val local = spark.createDataFrame(
                java.util.Arrays.asList(rows: _*), q0.schema)
              val cells = rows.map(_.getAs[Int]("cell")).distinct
              (local, if (cells.length <= IvfIndex.staticPruneMaxCells)
                Some(cells.toSeq) else None)
            case None =>
              val ckpt = q0.localCheckpoint(eager = true)
              (ckpt, IvfIndex.boundedCollect(ckpt.select("cell").distinct(),
                IvfIndex.staticPruneMaxCells).map(_.map(_.getInt(0)).toSeq))
          }
        val scan0 = cellsOpt match {
          case Some(cells) => spark.read.parquet(s"$b/index")
            .filter(col("cell").isin(cells: _*))
          case None => spark.read.parquet(s"$b/index")
        }
        // Bundle rows all predate any live tombstone: kill on id alone.
        val scan = ts match {
          case Some(t) =>
            val tid = (if (tsSmall) broadcast(t) else t).select("__del_id")
            scan0.join(tid, scan0("vec_id") === tid("__del_id"), "left_anti")
          case None => scan0
        }
        Some(Similarity.rerankShortlist(
          scan.join(if (qSmall) broadcast(q) else q, "cell" +: filterCol.toSeq),
          approx = approxScore, approxAsc = approxAsc,
          exactGuard = exactGuard, shortlist = shortlist,
          idCol = "vec_id", vecCol = "embedding",
          excludeSelf = excludeSelf, exact = Some(exactScore)))
      } else None
    val tailPart =
      (if (last > f) readTail(spark, statePath, f, last, meta.attrCols)
       else None).map { tl =>
        val qb = qn.withColumnRenamed("vec_id", "query_id")
          .withColumnRenamed("embedding", "q_vec")
        // Bundle present → reuse its gate; tail-only → one bounded pass.
        val qbSmall =
          if (f >= 0) qSmall
          else IvfIndex.boundedCount(qn, IvfIndex.queryBroadcastMaxRows).isDefined
        // Tail rows carry their ingest batch: a tombstone kills exactly
        // the rows that precede it (a later re-ingest survives). Code
        // columns stay aboard for [[exactGuard]]; other attrs and the
        // batch key drop before the cross.
        val liveTail = (ts match {
          case Some(t0) =>
            val t = if (tsSmall) broadcast(t0) else t0
            tl.join(t, tl("vec_id") === t("__del_id") &&
              t("__del_batch") > tl("batch"), "left_anti")
          case None => tl
        }).select((dataCols ++ filterCol.toSeq).map(col): _*)
        val crossed = filterCol match {
          case Some(fc) =>
            // The equality filter is a JOIN KEY (the q272 rule): each
            // query meets only its own stratum's tail rows — a hash
            // join, never a cross.
            liveTail.join(if (qbSmall) broadcast(qb) else qb, Seq(fc))
          case None =>
            StateFiles.tailCross(qb, liveTail, Some(qbSmall))
        }
        crossed
          .filter(if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
          // Same guard discipline as the bundle re-rank: guarded rows
          // (zero vectors) score −2.0 instead of a NaN that would sort
          // first in the descending top-k window.
          .withColumn("score",
            when(exactGuard, exactScore).otherwise(lit(-2.0)))
          .select("query_id", "vec_id", "score")
      }
    val parts = bundlePart.toSeq ++ tailPart.toSeq
    require(parts.nonEmpty, s"$stateName.search: empty state at $statePath")
    Similarity.topK(parts.reduce(_ unionByName _), k, "vec_id")
  }
}
