package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.analytics.{IvfIndex, Similarity, SqIndex}

/** Incremental IVF-SQ8 ANN state — the member that completes the
  * state-paired ANN family (IVF → [[IvfState]], PQ → [[PqState]],
  * IVF-PQ → [[IvfPqState]]; SQ8/IVF-SQ8 were batch-only, the one
  * asymmetry the r16 verdict left). Protocol, layout, and crash
  * discipline are [[IvfState]]'s ([[StateFiles]] staged swaps,
  * `last_batch` commit marker, `.bak` reader-side resolution); what is
  * NEW is where encoding happens:
  *
  * **Codes are written once, at ingest, and never again.** SQ8 codes
  * are per-vector (scale = max|x|/127, codes = round(x/scale) — no
  * trained codebook in the code path, [[SqIndex.encode]]), so a delta
  * batch is encoded as it commits and every later verb treats
  * (scale, codes) as opaque payload. [[recluster]] retrains only the
  * COARSE quantizer and moves rows between cells carrying their
  * committed code arrays verbatim — the structural claim in
  * [[SqIndex.indexIvf]]'s scaladoc ("a recluster moves rows between
  * cells without touching their codes, unlike PQ residuals"), which
  * only a state face can demonstrate: [[PqState]]'s retrain MUST
  * re-encode (PQ codes are codebook-relative), this one provably does
  * not (SqStateSpec tampers a committed code and watches it survive a
  * recluster byte-for-byte).
  *
  * Layout:
  *   - `deltas/batch=N/` — (vec_id, embedding, scale, codes) rows per
  *     ingested batch, ENCODED; `stats.last_batch` is the commit marker.
  *   - `bundle/` — coarse model + cell-PARTITIONED encoded index over
  *     batches ≤ `meta.folded_through`, swapped atomically.
  *
  * [[search]] = probed-cells-only code scan of the bundle (approx
  * cosine on int8 codes, shortlist, exact re-rank — the shared
  * [[Similarity.rerankShortlist]] kernel) UNION exact cosine over the
  * unfolded tail, ranked together in one top-k window.
  *
  * 100 TB shape: ingest writes one bounded encoded delta and touches
  * nothing else; search reads 1-byte code elements inside nprobe/k of
  * the bundle plus the cadence-bounded tail; recluster is the only
  * corpus-pass verb — and it is a coarse-train + shuffle-by-cell, with
  * ZERO re-encode FLOPs (the PQ family re-pays m·ksub·dim per vector
  * there).
  */
object SqState {

  private def deltasPath(root: String) = s"$root/deltas"
  private def statsPath(root: String) = s"$root/stats"
  private def bundlePath(root: String) = s"$root/bundle"
  private def stagingPath(root: String) = s"$root/.staging_bundle"

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readLast(spark: SparkSession, root: String): Option[Long] =
    if (!StateFiles.exists(spark, statsPath(root))) None
    else Some(spark.read.parquet(statsPath(root)).head().getAs[Long]("last_batch"))

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
    bundle.map { b =>
      val meta = s"$b/meta"
      if (!StateFiles.exists(spark, meta)) -1L
      else spark.read.parquet(meta).head().getAs[Long]("folded_through")
    }.getOrElse(-1L)

  /** Committed-but-unfolded ENCODED rows: batches in `(from, last]`. */
  private def readTail(spark: SparkSession, root: String,
                       from: Long, last: Long): DataFrame =
    spark.read.parquet(deltasPath(root))
      .filter(col("batch") > from && col("batch") <= last)
      .select("vec_id", "embedding", "scale", "codes")

  /** Fold one batch of vectors into the state; returns the committed
    * batch id. THE ONLY [[SqIndex.encode]] CALL IN THE STATE — every
    * row's (scale, codes) is computed here, exactly once, and carried
    * verbatim by every later recluster (the no-re-encode invariant
    * SqStateSpec pins by tampering). `batchId` defaults to
    * last_batch + 1; pass the foreachBatch epoch for replay idempotence.
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
          SqIndex.encode(
              batch.select(col(idCol).cast("long").as("vec_id"),
                col(vecCol).cast("array<double>").as("embedding")),
              "embedding")
            .coalesce(1) // one file per micro-batch (the q155 lesson)
            .write.mode("overwrite")
            .parquet(s"${deltasPath(statePath)}/batch=$id")
          import spark.implicits._
          StateFiles.install(spark, statsPath(statePath),
            Seq(id).toDF("last_batch"))
        }
        math.max(id, last)
      }
    }

  /** Retrain the COARSE quantizer over everything committed and swap in
    * a fresh cell-partitioned bundle covering batches ≤ last_batch. The
    * committed (scale, codes) columns ride through the reassignment
    * untouched — no [[SqIndex.encode]] call exists on this path, so a
    * recluster costs one coarse train + one shuffle-by-cell regardless
    * of code width (PqState's equivalent re-pays the full re-encode).
    * Training routes through the table face past
    * [[IvfIndex.tableModelMinK]], the [[IvfState]] discipline.
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
                    .select("vec_id", "embedding", "scale", "codes")
                else spark.emptyDataFrame
              val tail = readTail(spark, statePath, f, last)
              val all =
                if (f >= 0) bundled.unionByName(tail) else tail
              // Empty committed epochs (idle foreachBatch ticks) fold to
              // nothing — the IvfState rule.
              val nAll = all.count()
              if (nAll > 0) {
                val staging = stagingPath(statePath)
                hfs.delete(new Path(staging), true)
                val kc = k.getOrElse(math.max(1L,
                  (nAll + targetCellSize - 1) / targetCellSize).toInt)
                val model =
                  if (kc > IvfIndex.tableModelMinK)
                    IvfIndex.trainTable(all, kc, s"$staging/model", iters)
                  else {
                    val m = k match {
                      case Some(cells) => IvfIndex.train(all, cells, iters)
                      case None => IvfIndex.trainCellLaw(all, targetCellSize, iters)
                    }
                    IvfIndex.save(spark, m, s"$staging/model")
                    m
                  }
                // writePartitionedIndex assigns cells and KEEPS the input
                // columns — (scale, codes) land in the new layout verbatim.
                IvfIndex.writePartitionedIndex(all, model, s"$staging/index")
                import spark.implicits._
                Seq(last).toDF("folded_through")
                  .coalesce(1).write.parquet(s"$staging/meta")
                val nIdx = spark.read.parquet(s"$staging/index").count()
                if (nIdx != nAll) { // never install a lossy rewrite
                  hfs.delete(new Path(staging), true)
                  sys.error(s"SqState.recluster: staged index rows $nIdx != " +
                    s"$nAll under $statePath — recluster aborted, state untouched")
                }
                val bundleP = new Path(bundlePath(statePath))
                val bak = bakPath(bundleP)
                if (hfs.exists(bak)) hfs.delete(bak, true)
                if (hfs.exists(bundleP) && !hfs.rename(bundleP, bak))
                  sys.error(s"SqState.recluster: backup rename failed under $statePath")
                if (!hfs.rename(new Path(staging), bundleP))
                  sys.error(s"SqState.recluster: install rename failed under $statePath")
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

  /** ANN top-k over everything committed: probed-cells-only int8 code
    * scan + shortlist exact re-rank over the bundle, exact cosine over
    * the unfolded tail, one rank window. Non-mutating read-path
    * recovery; one bounded |Q| sizing pass serves the probe-side hint
    * AND the tail's broadcast decision (the family's one-probe rule).
    */
  def search(spark: SparkSession, statePath: String, queries: DataFrame,
             k: Int, nprobe: Int = 2, shortlist: Int = 50,
             idCol: String = "vec_id", vecCol: String = "embedding",
             excludeSelf: Boolean = true): DataFrame = {
    val last = readLast(spark, statePath)
      .getOrElse(sys.error(s"SqState.search: no state at $statePath"))
    val live = liveBundle(spark, statePath)
    val f = foldedThrough(spark, live)
    val qn = queries.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("embedding"))
    val qSmall = IvfIndex.boundedCount(qn,
      IvfIndex.queryBroadcastMaxRows / math.max(nprobe, 1)).isDefined
    val bundlePart =
      if (f >= 0) {
        val b = live.get
        val model = IvfIndex.load(spark, s"$b/model")
        // One probe, two consumers (the scoredCandidatesPruned shape):
        // the frame's distinct cells become the static partition filter
        // (ceilinged — the prunedIndexScan fallback rule) and the frame
        // itself is the candidate join side.
        val q = IvfIndex.withNearestCells(
            qn.select(col("vec_id").as("query_id"),
              col("embedding").as("q_vec")),
            "q_vec", model, nprobe, "__cells")
          .withColumn("cell", explode(col("__cells").getField("cell")))
          .drop("__cells")
          .localCheckpoint(eager = true)
        val scan = IvfIndex.boundedCollect(q.select("cell").distinct(),
            IvfIndex.staticPruneMaxCells) match {
          case Some(cells) => spark.read.parquet(s"$b/index")
            .filter(col("cell").isin(cells.map(_.getInt(0)).toSeq: _*))
          case None => spark.read.parquet(s"$b/index")
        }
        Some(Similarity.rerankShortlist(
          scan.join(if (qSmall) broadcast(q) else q, Seq("cell")),
          approx = SqIndex.codeCosine, approxAsc = false,
          exactGuard = col("scale") > 0, shortlist = shortlist,
          idCol = "vec_id", vecCol = "embedding",
          excludeSelf = excludeSelf))
      } else None
    val tailPart =
      if (last > f) {
        val qb = qn.select(col("vec_id").as("query_id"),
          col("embedding").as("q_vec"))
        val tail = readTail(spark, statePath, f, last)
          .select("vec_id", "embedding")
        Some(StateFiles.tailCross(qb, tail, Some(qSmall))
          .filter(if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
          .withColumn("score",
            graft.functions.cosineSimilarity(col("q_vec"), col("embedding")))
          .select("query_id", "vec_id", "score"))
      } else None
    val parts = bundlePart.toSeq ++ tailPart.toSeq
    require(parts.nonEmpty, s"SqState.search: empty state at $statePath")
    Similarity.topK(parts.reduce(_ unionByName _), k, "vec_id")
  }

  // --------------------------------------------------------------- q267
  /** End-to-end incremental IVF-SQ8 gate: the q234/q236/q239 protocol on
    * the q266 shape — ingest the planted corpus in 3 batches (encoded at
    * ingest), RECLUSTER after the second (search spans a
    * cell-partitioned int8 bundle AND an encoded raw tail), then search
    * (16 cells, nprobe 4, shortlist 50, top-5). The planted margin
    * dwarfs the probe risk and the ~1e-4 SQ8 cosine distortion, so the
    * composite answer IS the exact top-5 — hash-checked against the
    * shared exact-kNN oracle ([[Similarity.plantedKnnSql]]).
    */
  def sqStateKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(
      graft.core.Tables.embeddings(spark, dir))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-sqstate")
    val statePath = stateRoot.toString + "/state"
    try {
      (0 until 3).foreach { i =>
        update(spark, statePath, corpus.filter(col("vec_id") % 3 === i))
        if (i == 1) recluster(spark, statePath, k = Some(16))
      }
      search(spark, statePath, corpus.filter(col("vec_id") < 10),
        k = 5, nprobe = 4, shortlist = 50)
        .localCheckpoint(eager = true)
    } finally graft.core.Fs.deleteRecursively(stateRoot)
  }

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q267_sq_state", sqStateKnn _, Some(Similarity.plantedKnnSql)))
}
