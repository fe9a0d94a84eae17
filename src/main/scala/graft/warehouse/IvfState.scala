package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.analytics.{IvfIndex, Similarity}

/** Incremental IVF ANN state — the vector-index member of the
  * exactly-once state family, closing the one gap the index battery had
  * (DedupIndex and RetrievalIndex stream; the IVF/PQ bundles were
  * batch-rebuild-only): ingest embedding micro-batches exactly once,
  * serve ANN searches at any point, and RE-CLUSTER on a maintenance
  * cadence so the coarse quantizer tracks the corpus it indexes.
  *
  * Layout — the memtable + main-index split every streaming ANN system
  * converges on (new vectors are searchable immediately; clustering is
  * amortized):
  *
  *   - `deltas/batch=N/` — (vec_id, embedding) rows per ingested batch;
  *     `stats` carries `last_batch` as the COMMIT MARKER ([[StateFiles]]
  *     staged swap), so a committed replay short-circuits and [[update]]
  *     is a safe `foreachBatch` sink.
  *   - `bundle/` — an [[IvfIndex]] model + cell-PARTITIONED index over
  *     every batch ≤ `meta.folded_through`, swapped ATOMICALLY as one
  *     directory (model, index, and the folded-through watermark can
  *     never be observed torn — the [[IvfIndex.buildBundle]] rationale,
  *     plus meta).
  *
  * [[search]] = probe-pruned scan of the bundle (scans `nprobe` of `k`
  * cell directories) UNION exact brute-force over the unfolded tail
  * (batches in `(folded_through, last_batch]` — bounded by the
  * re-cluster cadence), ranked TOGETHER in one top-k window.
  *
  * [[recluster]] retrains the quantizer on bundle + tail (the
  * re-cluster-on-compaction contract: cell geometry follows the corpus,
  * so drift in the embedding distribution cannot silently degrade probe
  * recall), verifies the staged index row count, swaps the bundle, and
  * only then deletes the folded delta dirs. Crash windows:
  *   - mid-staging → junk `.staging_bundle`, deleted by the next run;
  *     readers never look at it;
  *   - after the swap, before the delta delete → the new
  *     `folded_through` already excludes those dirs from every read
  *     (`batch > folded_through` filter), so they are dead bytes the
  *     next recluster removes;
  *   - between the bundle's two swap renames → `.bak` recovery, the
  *     [[IvfIndex.save]] pattern.
  *
  * 100 TB shape: ingest writes one bounded delta per batch and touches
  * nothing else; search work is `nprobe/k` of the bundle plus the tail
  * (operator-bounded by cadence); re-cluster is the only corpus-pass
  * verb and is explicitly scheduled maintenance, exactly like index
  * compaction.
  */
object IvfState {

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

  /** Restore a bundle whose swap crashed between the two renames. ONLY
    * the PathLocks-serialized verbs may call this: the bak→bundle rename
    * racing a live [[recluster]] between ITS two swap renames can land
    * the staged bundle inside (or against) the restored dir — stale
    * bundle live, folded deltas deleted, i.e. data loss. Readers resolve
    * the crash window non-mutatingly via [[liveBundle]] instead
    * (r13 ADVICE).
    */
  private def recoverBundle(spark: SparkSession, root: String): Unit = {
    val p = new Path(bundlePath(root))
    val hfs = fs(spark, root)
    val bak = bakPath(p)
    if (!hfs.exists(p) && hfs.exists(bak)) hfs.rename(bak, p)
  }

  /** The bundle dir READERS should use, resolved WITHOUT mutation: the
    * installed `bundle/`, else the `.bak_bundle` a crashed swap left
    * (its folded_through predates the crash, and the matching delta dirs
    * are still present — the swap deletes them only after the install
    * rename succeeds — so .bak + tail is complete), else None.
    */
  private def liveBundle(spark: SparkSession, root: String): Option[Path] = {
    val p = new Path(bundlePath(root))
    val hfs = fs(spark, root)
    if (hfs.exists(p)) Some(p)
    else { val b = bakPath(p); if (hfs.exists(b)) Some(b) else None }
  }

  /** Highest batch id folded into the resolved bundle; -1 when no bundle
    * exists (every committed delta is tail).
    */
  private def foldedThrough(spark: SparkSession, bundle: Option[Path]): Long =
    bundle.flatMap { b =>
      StateFiles.readMarker(spark, s"$b/meta")
        .map(_("folded_through").asInstanceOf[Long])
    }.getOrElse(-1L)

  /** Committed-but-unfolded vectors: batches in `(from, last]`. */
  private def readTail(spark: SparkSession, root: String,
                       from: Long, last: Long): DataFrame =
    spark.read.parquet(deltasPath(root))
      .filter(col("batch") > from && col("batch") <= last)
      .select("vec_id", "embedding")

  /** Fold one batch of vectors into the state; returns the committed
    * batch id. `batchId` defaults to last_batch + 1; pass the
    * foreachBatch epoch for replay idempotence (a committed replay
    * ingests nothing). Vectors are stored as array<double> — the model
    * arithmetic's type, so float and double corpora fold identically.
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
          // coalesce(1): a delta is one micro-batch of vectors — one
          // file per batch keeps the tail's file-open count equal to
          // the batch count (the q155 lesson).
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

  /** Retrain the quantizer over everything committed and swap in a
    * fresh cell-partitioned bundle covering batches ≤ last_batch; the
    * folded delta dirs are removed afterwards. `k` pins the cell count
    * (the gated-query shape); otherwise the cell law
    * k = ⌈n/targetCellSize⌉ derives it from the corpus itself — no
    * manual tuning drift as the state grows.
    */
  def recluster(spark: SparkSession, statePath: String,
                k: Option[Int] = None, targetCellSize: Long = 512L,
                iters: Int = 2, lease: Boolean = false): Unit =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statsPath(statePath))
        recoverBundle(spark, statePath)
        readLast(spark, statePath) match {
          case None => // empty state: nothing to cluster
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
              val all =
                if (f >= 0) bundled.unionByName(tail) else tail
              // A streaming face can legitimately commit EMPTY epochs
              // (idle foreachBatch ticks); training's dimension probe
              // has no row to read on an all-empty corpus, so an empty
              // fold is a no-op — the empty delta dirs stay committed
              // and every read of them is already empty.
              // Sizing from FOOTERS, not a job: bundle/index and every
              // delta dir are parquet this module wrote, so the exact
              // corpus count is driver-side metadata (StateFiles
              // .dirRowCount rationale).
              val nAll =
                (if (f >= 0) StateFiles.dirRowCount(spark,
                  s"${bundlePath(statePath)}/index") else 0L) +
                StateFiles.tailRowCount(spark, deltasPath(statePath), f, last)
              if (nAll > 0) {
                val staging = stagingPath(statePath)
                hfs.delete(new Path(staging), true)
                // Route the training on the cell count the run will use:
                // past the table-face threshold the codebook trains
                // STRAIGHT INTO the staging dir through the table route
                // (never on the driver); below it the seq route + save
                // keep the gated shapes byte-identical to r15.
                val kc = k.getOrElse(math.max(1L,
                  (nAll + targetCellSize - 1) / targetCellSize).toInt)
                val model =
                  if (kc > IvfIndex.tableModelMinK)
                    IvfIndex.trainTable(all, kc, s"$staging/model", iters,
                      knownCount = Some(nAll))
                  else {
                    val m = k match {
                      case Some(cells) => IvfIndex.train(all, cells, iters,
                        knownCount = Some(nAll))
                      case None => IvfIndex.trainCellLaw(all, targetCellSize,
                        iters, knownCount = Some(nAll))
                    }
                    IvfIndex.save(spark, m, s"$staging/model")
                    m
                  }
                IvfIndex.writePartitionedIndex(all, model, s"$staging/index")
                StateFiles.writeMarkerDir(spark, s"$staging/meta",
                  Seq("folded_through" -> last))
                // Staged-write verify from the staged files' own footers
                // (no Spark job): record counts are written by the writer,
                // so a lossy rewrite still mismatches nAll.
                val nIdx = StateFiles.dirRowCount(spark, s"$staging/index")
                if (nIdx != nAll) { // never install a lossy rewrite
                  hfs.delete(new Path(staging), true)
                  sys.error(s"IvfState.recluster: staged index rows $nIdx != " +
                    s"$nAll under $statePath — recluster aborted, state untouched")
                }
                val bundleP = new Path(bundlePath(statePath))
                val bak = bakPath(bundleP)
                if (hfs.exists(bak)) hfs.delete(bak, true)
                if (hfs.exists(bundleP) && !hfs.rename(bundleP, bak))
                  sys.error(s"IvfState.recluster: backup rename failed under $statePath")
                if (!hfs.rename(new Path(staging), bundleP))
                  sys.error(s"IvfState.recluster: install rename failed under $statePath")
                hfs.delete(bak, true)
                // Folded deltas are now dead to every read (the new
                // folded_through excludes them); reclaim the dirs.
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

  /** ANN top-k over everything committed: probe-pruned bundle scan +
    * exact tail scan, ranked together. `excludeSelf` as in
    * [[IvfIndex.search]] (true when queries ARE corpus rows).
    */
  def search(spark: SparkSession, statePath: String, queries: DataFrame,
             k: Int, nprobe: Int = 2, idCol: String = "vec_id",
             vecCol: String = "embedding",
             excludeSelf: Boolean = true): DataFrame = {
    val last = readLast(spark, statePath)
      .getOrElse(sys.error(s"IvfState.search: no state at $statePath"))
    // Read path: resolve the live bundle WITHOUT the bak→bundle rename —
    // search takes no lock, and a mutating recovery racing a recluster
    // mid-swap can install the stale bundle over the fresh one while the
    // folded deltas get deleted (r13 ADVICE). A .bak left by a real
    // crash is served as-is; the next locked verb performs the rename.
    val live = liveBundle(spark, statePath)
    val f = foldedThrough(spark, live)
    val qn = queries.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("embedding"))
    // ONE bounded sizing pass serves both query-side decisions (the
    // probe-frame hint in scoredCandidates AND the tail's broadcast
    // side) — the r15 shape paid a count in each (r15 ADVICE / the
    // verdict's sizing-tax floor drift).
    val qSmall = IvfIndex.boundedCount(qn,
      IvfIndex.queryBroadcastMaxRows / math.max(nprobe, 1)).isDefined
    val bundlePart =
      if (f >= 0) {
        val b = live.get
        val model = IvfIndex.load(spark, s"$b/model")
        // ONE probe serves the static partition filter AND the candidate
        // join (the IvfPqState one-probe rule, extended to the flat face
        // in r16 — the r15 shape assigned the query frame twice).
        Some(IvfIndex.scoredCandidatesPruned(spark, s"$b/index", qn, model,
          nprobe, "vec_id", "embedding", excludeSelf,
          querySideSmall = Some(qSmall)))
      } else None
    val tailPart =
      if (last > f) {
        val qb = qn.select(col("vec_id").as("query_id"),
          col("embedding").as("q_vec"))
        val tail = readTail(spark, statePath, f, last)
        val t = StateFiles.tailCross(qb, tail, Some(qSmall))
        val cand =
          if (excludeSelf) t.filter(col("vec_id") =!= col("query_id")) else t
        Some(cand.withColumn("score",
          graft.functions.cosineSimilarity(col("q_vec"), col("embedding"))))
      } else None
    val parts = (bundlePart.toSeq ++ tailPart.toSeq)
      .map(_.select("query_id", "vec_id", "score"))
    require(parts.nonEmpty, s"IvfState.search: empty state at $statePath")
    Similarity.topK(parts.reduce(_ unionByName _), k, "vec_id")
  }

  // --------------------------------------------------------------- q234
  /** End-to-end incremental-ANN gate: ingest the planted-margin kNN
    * corpus ([[Similarity.plantedKnnCorpus]]) in 3 batches, RE-CLUSTER
    * after the second (so the search spans a real bundle AND an
    * unfolded tail batch — both faces of the state), then run the q28
    * search shape (k=16 cells, nprobe=4, queries vec_id < 10, top-5).
    * The planted ~0.5 cosine margin makes the ANN answer the EXACT
    * answer, so the DuckDB oracle is the shared exact-kNN SQL
    * ([[Similarity.plantedKnnSql]]) — the hash gate proves
    * ingest→recluster→tail-union search ≡ one-shot exact kNN.
    */
  def ivfStateKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(
      graft.core.Tables.embeddings(spark, dir))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-ivfstate")
    val statePath = stateRoot.toString + "/state"
    try {
      (0 until 3).foreach { i =>
        update(spark, statePath, corpus.filter(col("vec_id") % 3 === i))
        if (i == 1) recluster(spark, statePath, k = Some(16))
      }
      search(spark, statePath, corpus.filter(col("vec_id") < 10),
        k = 5, nprobe = 4)
        .localCheckpoint(eager = true)
    } finally graft.core.Fs.deleteRecursively(stateRoot)
  }

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q234_ivf_state", ivfStateKnn _, Some(Similarity.plantedKnnSql)))
}
