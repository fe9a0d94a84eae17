package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.analytics.{IvfPq, Similarity}

/** Incremental IVF-PQ ANN state — the exactly-once state face of the
  * [[IvfPq]] composite (q238), completing the triangle: IvfState
  * maintains coarse cells, PqState maintains flat codes, and this
  * maintains the production IVFADC layout (cells × residual codes)
  * under the SAME protocol, so every member of the ANN family now has
  * an incremental form.
  *
  * Layout and verbs are [[IvfState]]'s verbatim:
  *   - `deltas/batch=N/` raw (vec_id, embedding) per committed batch,
  *     `stats.last_batch` the commit marker (epoch-replay idempotent —
  *     a safe foreachBatch sink);
  *   - `bundle/` = `model/` (coarse centroids + PQ books — the
  *     [[IvfPq.saveModel]] pair), `index/` (vec_id, embedding, cell,
  *     codes — cell-PARTITIONED so probes prune at file listing),
  *     `meta.folded_through`; swapped atomically as ONE dir with .bak
  *     crash recovery (codes are only meaningful against the codebooks
  *     AND the cell geometry that produced them — three torn-window
  *     hazards, one swap);
  *   - [[recluster]] retrains BOTH quantizers on bundle ∪ tail,
  *     re-encodes everything, verifies the staged row count, swaps,
  *     then reclaims folded delta dirs;
  *   - [[search]] = probed-cell pruned ADC shortlist over the bundle
  *     (static partition filter from the driver-side probe) ∪ exact
  *     brute-force over the unfolded raw tail, ranked TOGETHER in one
  *     top-k window;
  *   - read-path bundle recovery is NON-mutating ([[liveBundle]]): the
  *     bak→bundle rename belongs to the locked verbs only (the r13
  *     ADVICE race).
  *
  * 100 TB shape: ingest writes one bounded delta per batch; search
  * touches `nprobe/k` of the CODE table (8-byte rows) plus a
  * cadence-bounded raw tail; recluster is the only corpus pass and is
  * scheduled maintenance (`compact-index ivfpq`).
  */
object IvfPqState {

  private def deltasPath(root: String) = s"$root/deltas"
  private def statsPath(root: String) = s"$root/stats"
  private def bundlePath(root: String) = s"$root/bundle"
  private def stagingPath(root: String) = s"$root/.staging_bundle"

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readLast(spark: SparkSession, root: String): Option[Long] =
    StateFiles.readMarker(spark, statsPath(root))
      .map(_("last_batch").asInstanceOf[Long])

  private def bakPath(p: Path) = new Path(p.getParent, s".bak_${p.getName}")

  /** Locked-verb-only crash recovery; readers use [[liveBundle]] — see
    * [[IvfState.recoverBundle]] for the reader-rename data-loss race.
    */
  private def recoverBundle(spark: SparkSession, root: String): Unit = {
    val p = new Path(bundlePath(root))
    val hfs = fs(spark, root)
    val bak = bakPath(p)
    if (!hfs.exists(p) && hfs.exists(bak)) hfs.rename(bak, p)
  }

  /** Non-mutating reader-side bundle resolution ([[IvfState.liveBundle]]
    * semantics).
    */
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

  private def readTail(spark: SparkSession, root: String,
                       from: Long, last: Long): DataFrame =
    spark.read.parquet(deltasPath(root))
      .filter(col("batch") > from && col("batch") <= last)
      .select("vec_id", "embedding")

  /** Fold one batch of vectors into the state; returns the committed
    * batch id ([[IvfState.update]] semantics — epoch-replay idempotent,
    * vectors stored as array<double>).
    */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding",
             batchId: Option[Long] = None, lease: Boolean = false): Long =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statsPath(statePath))
        val last = readLast(spark, statePath).getOrElse(-1L)
        val id = batchId.getOrElse(last + 1)
        if (id > last) { // else: committed replay, every effect installed
          batch
            .select(col(idCol).cast("long").as("vec_id"),
              col(vecCol).cast("array<double>").as("embedding"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(s"${deltasPath(statePath)}/batch=$id")
          StateFiles.installMarker(spark, statsPath(statePath),
            Seq("last_batch" -> id))
        }
        math.max(id, last)
      }
    }

  /** Retrain coarse + PQ quantizers over everything committed,
    * re-encode, and swap in a fresh cell-partitioned bundle covering
    * batches ≤ last_batch; folded delta dirs are reclaimed afterwards.
    * `kCells` pins the coarse cell count (the gated-query shape);
    * otherwise the cell law derives it from the corpus.
    */
  def recluster(spark: SparkSession, statePath: String,
                kCells: Option[Int] = None, targetCellSize: Long = 512L,
                m: Int = 8, ksub: Int = 16, iters: Int = 2,
                lease: Boolean = false): Unit =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statsPath(statePath))
        recoverBundle(spark, statePath)
        readLast(spark, statePath) match {
          case None => // empty state
          case Some(last) =>
            val f = foldedThrough(spark, liveBundle(spark, statePath))
            if (last > f) {
              val hfs = fs(spark, statePath)
              val bundled =
                if (f >= 0)
                  spark.read.parquet(s"${bundlePath(statePath)}/index")
                    .select("vec_id", "embedding")
                else spark.emptyDataFrame
              val tail = readTail(spark, statePath, f, last)
              val all = if (f >= 0) bundled.unionByName(tail) else tail
              // Idle streaming epochs commit EMPTY deltas; an all-empty
              // corpus has no row for the trainers' dimension probes, so
              // an empty fold is a no-op (the IvfState.recluster rule).
              // Sizing from FOOTERS (StateFiles.dirRowCount rationale):
              // bundle/index and the delta dirs are this state's own
              // parquet, so the exact count costs no Spark job.
              val nAll =
                (if (f >= 0) StateFiles.dirRowCount(spark,
                  s"${bundlePath(statePath)}/index") else 0L) +
                StateFiles.tailRowCount(spark, deltasPath(statePath), f, last)
              if (nAll > 0) {
                val staging = stagingPath(statePath)
                hfs.delete(new Path(staging), true)
                // Table-route the coarse training past the face threshold
                // (the IvfState.recluster rationale): the codebook lands
                // in the staging dir directly, never on the driver.
                val kc = kCells.getOrElse(math.max(1L,
                  (nAll + targetCellSize - 1) / targetCellSize).toInt)
                val model =
                  if (kc > graft.analytics.IvfIndex.tableModelMinK)
                    IvfPq.trainTable(all, kc, m, s"$staging/model", ksub, iters,
                      knownCount = Some(nAll))
                  else {
                    val mdl = kCells match {
                      case Some(k) => IvfPq.train(all, k, m, ksub, iters,
                        knownCount = Some(nAll))
                      case None => IvfPq.trainCellLaw(all, targetCellSize, m,
                        ksub, iters, knownCount = Some(nAll))
                    }
                    IvfPq.saveModel(spark, mdl, s"$staging/model")
                    mdl
                  }
                // Repartition BY CELL pinned to the cell count before the
                // partitioned write — the writePartitionedIndex rationale
                // (one writer's output per cell dir, AQE can't coalesce
                // a pinned count).
                IvfPq.index(all, model)
                  .repartition(model.coarse.k, col("cell"))
                  .write.mode("overwrite").partitionBy("cell")
                  .parquet(s"$staging/index")
                StateFiles.writeMarkerDir(spark, s"$staging/meta",
                  Seq("folded_through" -> last))
                // Footer verify of the staged write (no Spark job) — the
                // IvfState rationale.
                val nIdx = StateFiles.dirRowCount(spark, s"$staging/index")
                if (nIdx != nAll) { // never install a lossy rewrite
                  hfs.delete(new Path(staging), true)
                  sys.error(s"IvfPqState.recluster: staged index rows $nIdx " +
                    s"!= $nAll under $statePath — recluster aborted, state untouched")
                }
                val bundleP = new Path(bundlePath(statePath))
                val bak = bakPath(bundleP)
                if (hfs.exists(bak)) hfs.delete(bak, true)
                if (hfs.exists(bundleP) && !hfs.rename(bundleP, bak))
                  sys.error(s"IvfPqState.recluster: backup rename failed under $statePath")
                if (!hfs.rename(new Path(staging), bundleP))
                  sys.error(s"IvfPqState.recluster: install rename failed under $statePath")
                hfs.delete(bak, true)
                val deltas = new Path(deltasPath(statePath))
                if (hfs.exists(deltas))
                  hfs.listStatus(deltas).toSeq
                    .filter(st => st.isDirectory &&
                      st.getPath.getName.stripPrefix("batch=").toLongOption
                        .exists(_ <= last))
                    .foreach(st => hfs.delete(st.getPath, true))
              }
            }
        }
      }
    }

  /** ANN top-k over everything committed: probed-cell-pruned ADC
    * shortlist over the bundle ∪ exact scan of the unfolded raw tail,
    * one rank window. Non-mutating read-path recovery.
    */
  def search(spark: SparkSession, statePath: String, queries: DataFrame,
             k: Int, nprobe: Int = 2, shortlist: Int = 50,
             idCol: String = "vec_id", vecCol: String = "embedding",
             excludeSelf: Boolean = true): DataFrame = {
    val last = readLast(spark, statePath)
      .getOrElse(sys.error(s"IvfPqState.search: no state at $statePath"))
    val live = liveBundle(spark, statePath)
    val f = foldedThrough(spark, live)
    val qn = queries.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("embedding"))
    // |Q| sizing learned ONCE: the bundle probe's dispatch already pays a
    // bounded sizing pass, and its answer serves the tail's broadcast
    // decision too (the r15 shape counted the query frame twice per
    // search — r15 ADVICE).
    var qSmall: Option[Boolean] = None
    val bundlePart =
      if (f >= 0) {
        val b = live.get
        val model = IvfPq.loadModel(spark, s"$b/model")
        // ONE probe pays for both uses: the probed-cell union becomes a
        // STATIC partition filter so unprobed cell dirs are never listed
        // (the IvfIndex.prunedIndexScan rationale), and the same LUT
        // frame feeds the ADC join — scoredShortlistWith skips the
        // second probe the old two-call shape paid. The probe itself is
        // |Q|-dispatched (driver arm for small batches, engine arm past
        // IvfPq.driverProbeMaxWork), so this search face inherits the
        // flat-driver-memory scale path.
        val (lutRows, cells, qIfSmall) = IvfPq.lutFrameSized(spark, model, qn,
          nprobe, "vec_id", "embedding")
        // The driver-arm cap and the broadcast gate are independent
        // knobs, so re-check the learned |Q| against the gate before
        // letting the tail broadcast the query side. Engine-arm dispatch
        // (qIfSmall=None) means |Q| exceeded the DRIVER cap — which at
        // large kCells sits well below the broadcast gate — so it is
        // "unknown", not "large": leave qSmall=None and let tailCross
        // run its own bounded probe against the gate (r16 ADVICE).
        qSmall = qIfSmall.map(_ <=
          graft.analytics.IvfIndex.queryBroadcastMaxRows)
        // Static partition filter only while the probed union is
        // metadata-sized; past the ceiling the ADC cell equi-join prunes
        // at runtime over the full listing (the prunedIndexScan rule).
        val scan = cells match {
          case Some(cs) => spark.read.parquet(s"$b/index")
            .filter(col("cell").isin(cs: _*))
          case None => spark.read.parquet(s"$b/index")
        }
        Some(IvfPq.scoredShortlistWith(scan, lutRows, shortlist,
          "vec_id", "embedding", excludeSelf))
      } else None
    val tailPart =
      if (last > f) {
        val qb = qn.select(col("vec_id").as("query_id"),
          col("embedding").as("q_vec"))
        val tail = readTail(spark, statePath, f, last)
        Some(StateFiles.tailCross(qb, tail, qSmall)
          .filter(if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
          .withColumn("score",
            graft.functions.cosineSimilarity(col("q_vec"), col("embedding")))
          .select("query_id", "vec_id", "score"))
      } else None
    val parts = bundlePart.toSeq ++ tailPart.toSeq
    require(parts.nonEmpty, s"IvfPqState.search: empty state at $statePath")
    Similarity.topK(parts.reduce(_ unionByName _), k, "vec_id")
  }

  // --------------------------------------------------------------- q239
  /** End-to-end incremental-IVFADC gate: the q234/q236 protocol on the
    * q238 shape — ingest the planted corpus in 3 batches, RECLUSTER
    * after the second (search spans a cell-partitioned encoded bundle
    * AND a raw tail), then search (16 cells, nprobe 4, m=8 × 16 codes,
    * shortlist 50, top-5). The planted margin makes the composite
    * answer the exact answer — hash-checked against the shared
    * exact-kNN oracle.
    */
  def ivfPqStateKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(
      graft.core.Tables.embeddings(spark, dir))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-ivfpqstate")
    val statePath = stateRoot.toString + "/state"
    try {
      (0 until 3).foreach { i =>
        update(spark, statePath, corpus.filter(col("vec_id") % 3 === i))
        if (i == 1) recluster(spark, statePath, kCells = Some(16))
      }
      search(spark, statePath, corpus.filter(col("vec_id") < 10),
        k = 5, nprobe = 4, shortlist = 50)
        .localCheckpoint(eager = true)
    } finally graft.core.Fs.deleteRecursively(stateRoot)
  }

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q239_ivfpq_state", ivfPqStateKnn _, Some(Similarity.plantedKnnSql)))
}
