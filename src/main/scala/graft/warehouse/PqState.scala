package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.analytics.{PqIndex, Similarity}

/** Incremental product-quantization ANN state — [[IvfState]]'s sibling,
  * completing the "IVF/PQ" incremental pair: exactly-once embedding
  * ingest, ADC search at any point, and codebook RETRAINING on the
  * compaction cadence (codes are only meaningful against the codebooks
  * that produced them, so the code table and its codebooks live in ONE
  * atomically-swapped bundle — the same torn-window argument as
  * [[IvfState]]'s model/index/meta, with re-ENCODE replacing
  * re-cluster).
  *
  * Layout (the [[IvfState]] protocol verbatim):
  *   - `deltas/batch=N/` — raw (vec_id, embedding) per batch; `stats`
  *     carries `last_batch` ([[StateFiles]] staged swap) so a committed
  *     replay short-circuits and [[update]] is a safe foreachBatch sink;
  *   - `bundle/` — `model` (codebooks), `index` (vec_id, embedding,
  *     codes — the ADC scan table), `meta.folded_through`, swapped as
  *     one directory with `.bak` crash recovery.
  *
  * [[search]] = ADC shortlist + exact re-rank over the bundle UNION
  * exact brute-force over the unfolded tail, ranked together — so a
  * vector is searchable the moment its batch commits, at exact-scan
  * cost until the next [[retrain]] folds it into codes.
  *
  * 100 TB shape: the bundle's ADC phase scans 8-byte codes (the 32×
  * scan-size cut that is PQ's whole point); the tail is bounded by the
  * retrain cadence; retraining is the only corpus pass and is explicit
  * maintenance. Crash windows are [[IvfState]]'s: staging junk is
  * discarded, a post-swap pre-delete crash leaves dead delta dirs the
  * reads already exclude (`batch > folded_through`).
  */
object PqState {

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
    * [[IvfState.recoverBundle]] for the data-loss race a reader-side
    * rename opens (r13 ADVICE).
    */
  private def recoverBundle(spark: SparkSession, root: String): Unit = {
    val p = new Path(bundlePath(root))
    val hfs = fs(spark, root)
    val bak = bakPath(p)
    if (!hfs.exists(p) && hfs.exists(bak)) hfs.rename(bak, p)
  }

  /** Non-mutating reader-side bundle resolution ([[IvfState.liveBundle]]
    * semantics: installed dir, else the crashed swap's .bak — complete
    * because folded deltas outlive any crash between the swap renames).
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
        if (id > last) {
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

  /** Retrain the codebooks over everything committed, re-ENCODE the
    * whole corpus, and swap in a fresh bundle covering batches ≤
    * last_batch; folded delta dirs are reclaimed afterwards.
    */
  def retrain(spark: SparkSession, statePath: String, m: Int = 8,
              ksub: Int = 16, iters: Int = 2, lease: Boolean = false): Unit =
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
              // corpus has no row for the trainer's dimension probe, so
              // an empty fold is a no-op (the IvfState.recluster rule).
              // Sizing from FOOTERS (StateFiles.dirRowCount rationale):
              // both inputs are this state's own parquet, so the exact
              // count costs no Spark job.
              val nAll =
                (if (f >= 0) StateFiles.dirRowCount(spark,
                  s"${bundlePath(statePath)}/index") else 0L) +
                StateFiles.tailRowCount(spark, deltasPath(statePath), f, last)
              if (nAll > 0) {
                val model = PqIndex.train(all, m, ksub, iters)
                val staging = stagingPath(statePath)
                hfs.delete(new Path(staging), true)
                PqIndex.saveModel(spark, model, s"$staging/model")
                PqIndex.encode(all, model)
                  .select("vec_id", "embedding", "codes")
                  .write.mode("overwrite").parquet(s"$staging/index")
                StateFiles.writeMarkerDir(spark, s"$staging/meta",
                  Seq("folded_through" -> last))
                // Footer verify of the staged write (no Spark job) — the
                // IvfState rationale.
                val nIdx = StateFiles.dirRowCount(spark, s"$staging/index")
                if (nIdx != nAll) { // never install a lossy rewrite
                  hfs.delete(new Path(staging), true)
                  sys.error(s"PqState.retrain: staged index rows $nIdx != " +
                    s"$nAll under $statePath — retrain aborted, state untouched")
                }
                val bundleP = new Path(bundlePath(statePath))
                val bak = bakPath(bundleP)
                if (hfs.exists(bak)) hfs.delete(bak, true)
                if (hfs.exists(bundleP) && !hfs.rename(bundleP, bak))
                  sys.error(s"PqState.retrain: backup rename failed under $statePath")
                if (!hfs.rename(new Path(staging), bundleP))
                  sys.error(s"PqState.retrain: install rename failed under $statePath")
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

  /** ANN top-k over everything committed: ADC shortlist + exact re-rank
    * over the bundle codes ∪ exact scan of the unfolded tail, one rank
    * window.
    */
  def search(spark: SparkSession, statePath: String, queries: DataFrame,
             k: Int, shortlist: Int = 50, idCol: String = "vec_id",
             vecCol: String = "embedding",
             excludeSelf: Boolean = true): DataFrame = {
    val last = readLast(spark, statePath)
      .getOrElse(sys.error(s"PqState.search: no state at $statePath"))
    // Non-mutating read-path recovery — the IvfState.search rationale.
    val live = liveBundle(spark, statePath)
    val f = foldedThrough(spark, live)
    val qn = queries.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("embedding"))
    // ONE bounded sizing pass serves the LUT-arm dispatch and the tail's
    // broadcast side (the IvfState.search rationale).
    val qSmall = graft.analytics.IvfIndex.boundedCount(qn,
      graft.analytics.IvfIndex.queryBroadcastMaxRows).isDefined
    val bundlePart =
      if (f >= 0) {
        val b = live.get
        val model = PqIndex.loadModel(spark, s"$b/model")
        val encoded = spark.read.parquet(s"$b/index")
        Some(PqIndex.scoredShortlist(encoded, qn, model, shortlist,
          "vec_id", "embedding", excludeSelf, querySideSmall = Some(qSmall)))
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
          graft.functions.cosineSimilarity(col("q_vec"), col("embedding")))
          .select("query_id", "vec_id", "score"))
      } else None
    val parts = bundlePart.toSeq ++ tailPart.toSeq
    require(parts.nonEmpty, s"PqState.search: empty state at $statePath")
    Similarity.topK(parts.reduce(_ unionByName _), k, "vec_id")
  }

  // --------------------------------------------------------------- q236
  /** End-to-end incremental-PQ gate, the q234 shape with codes instead
    * of cells: ingest the planted-margin corpus in 3 batches, RETRAIN
    * after the second (search spans an encoded bundle AND a raw tail),
    * then run the q117 search shape (m=8 × ksub=16, shortlist 50,
    * top-5, queries vec_id < 10). The planted ~0.5 margin dwarfs the
    * quantization residual, so the ADC answer IS the exact answer —
    * hash-checked against the shared exact-kNN oracle.
    */
  def pqStateKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(
      graft.core.Tables.embeddings(spark, dir))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-pqstate")
    val statePath = stateRoot.toString + "/state"
    try {
      (0 until 3).foreach { i =>
        update(spark, statePath, corpus.filter(col("vec_id") % 3 === i))
        if (i == 1) retrain(spark, statePath)
      }
      search(spark, statePath, corpus.filter(col("vec_id") < 10),
        k = 5, shortlist = 50)
        .localCheckpoint(eager = true)
    } finally graft.core.Fs.deleteRecursively(stateRoot)
  }

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q236_pq_state", pqStateKnn _, Some(Similarity.plantedKnnSql)))
}
