package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.{IvfIndex, Similarity}

/** Shared core of the ENCODE-ONCE incremental ANN states — the members
  * whose codes are per-vector (no trained codebook in the code path:
  * SQ8's scale+int8 in [[SqState]], the packed sign bits in
  * [[BitState]]), so encoding happens exactly once at ingest and every
  * recluster moves rows between cells carrying committed code columns
  * verbatim. [[PqState]]/[[IvfPqState]] deliberately do NOT ride this
  * core: their codes are codebook-relative, so their maintenance verb
  * MUST re-encode — the structural difference this family's scaladoc
  * claims, and the one thing a shared implementation would blur.
  *
  * Protocol, layout, and crash discipline are [[IvfState]]'s (delta
  * dirs + `last_batch` commit marker via [[StateFiles]], staged bundle
  * swap with `.bak` recovery, lease-guarded verbs, reader-side
  * non-mutating resolution). Concrete members supply the encode step
  * and the approximate-scan column; search is the family shape: probed
  * cells ∩ bundle through [[Similarity.rerankShortlist]], exact cosine
  * over the unfolded tail, one rank window.
  */
private[graft] abstract class CodedIvfStateCore {

  /** Diagnostics prefix ("SqState", "BitState"). */
  protected def stateName: String

  /** Attach the code columns to a (vec_id, embedding) batch — called
    * ONLY from [[update]]: the single encode site of the state.
    */
  protected def encodeBatch(batch: DataFrame): DataFrame

  /** The code columns [[encodeBatch]] adds (carried verbatim by every
    * recluster; tampering them is how the specs PROVE no re-encode).
    */
  protected def codeCols: Seq[String]

  /** Approximate score over (q_vec, code columns) for the bundle scan. */
  protected def approxScore: Column

  /** true when [[approxScore]] is distance-like (ascending shortlist). */
  protected def approxAsc: Boolean

  /** Guard for the exact re-rank (the zero-vector NaN rule). */
  protected def exactGuard: Column

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

  private def dataCols: Seq[String] = Seq("vec_id", "embedding") ++ codeCols

  /** Committed-but-unfolded ENCODED rows: batches in `(from, last]`. */
  private def readTail(spark: SparkSession, root: String,
                       from: Long, last: Long): DataFrame =
    spark.read.parquet(deltasPath(root))
      .filter(col("batch") > from && col("batch") <= last)
      .select(dataCols.map(col): _*)

  /** Fold one batch of vectors into the state; returns the committed
    * batch id. THE ONLY ENCODE CALL IN THE STATE — every row's code
    * columns are computed here, exactly once, and carried verbatim by
    * every later recluster (the no-re-encode invariant the specs pin by
    * tampering). `batchId` defaults to last_batch + 1; pass the
    * foreachBatch epoch for replay idempotence.
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
          encodeBatch(
              batch.select(col(idCol).cast("long").as("vec_id"),
                col(vecCol).cast("array<double>").as("embedding")))
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
    * committed code columns ride through the reassignment untouched —
    * no encode call exists on this path, so a recluster costs one
    * coarse train + one shuffle-by-cell regardless of code width.
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
                    .select(dataCols.map(col): _*)
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
                // columns — the code columns land in the new layout verbatim.
                IvfIndex.writePartitionedIndex(all, model, s"$staging/index")
                import spark.implicits._
                Seq(last).toDF("folded_through")
                  .coalesce(1).write.parquet(s"$staging/meta")
                val nIdx = spark.read.parquet(s"$staging/index").count()
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

  /** ANN top-k over everything committed: probed-cells-only code scan +
    * shortlist exact re-rank over the bundle, exact cosine over the
    * unfolded tail, one rank window. Non-mutating read-path recovery;
    * one bounded |Q| sizing pass serves the probe-side hint AND the
    * tail's broadcast decision (the family's one-probe rule). The
    * QUERY side must carry `q_vec` + whatever [[approxScore]] reads —
    * concrete members build it via [[queryFrame]].
    */
  def search(spark: SparkSession, statePath: String, queries: DataFrame,
             k: Int, nprobe: Int = 2, shortlist: Int = 50,
             idCol: String = "vec_id", vecCol: String = "embedding",
             excludeSelf: Boolean = true): DataFrame = {
    val last = readLast(spark, statePath)
      .getOrElse(sys.error(s"$stateName.search: no state at $statePath"))
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
            queryFrame(qn), "q_vec", model, nprobe, "__cells")
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
          approx = approxScore, approxAsc = approxAsc,
          exactGuard = exactGuard, shortlist = shortlist,
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
    require(parts.nonEmpty, s"$stateName.search: empty state at $statePath")
    Similarity.topK(parts.reduce(_ unionByName _), k, "vec_id")
  }

  /** The bundle-probe query frame over the normalized (vec_id,
    * embedding) batch: must emit `query_id`, `q_vec`, and whatever
    * [[approxScore]] reads (e.g. BitState re-encodes the queries under
    * the corpus's plane matrix). Default: bare rename.
    */
  protected def queryFrame(qn: DataFrame): DataFrame =
    qn.select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
}
