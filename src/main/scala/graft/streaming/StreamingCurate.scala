package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.analytics.{Dedup, TextAnalysis, TrainingData}
import graft.warehouse.ShardWriter

/** Streaming shard export — the [[graft.analytics.Curate]] pipeline as a
  * `foreachBatch` sink: each micro-batch is deduped (within itself AND
  * incrementally against everything already kept), hash-split, packed
  * into sequences that CONTINUE the per-(split, source) token offsets of
  * all prior batches, and published as bounded shard files — so a
  * doc_id-ordered stream produces exactly the rows the one-shot batch
  * run produces on the same corpus.
  *
  * Exactly-once file commit, without relying on the sink being a Spark
  * table: batch N's shards are written to a hidden staging directory and
  * atomically renamed to `batches/batch_N/` (a shard directory either
  * doesn't exist or is complete — no partial shard is ever visible), and
  * the curation state (pack offsets + kept corpus) advances via the
  * [[graft.warehouse.StateFiles]] staged swap, carrying `last_batch`.
  * Effect order is shards → kept-append → state-install; a crash
  * anywhere before the install leaves `last_batch` at N−1, and the
  * foreachBatch replay recomputes batch N from the SAME pre-N state
  * (every stage is deterministic), overwriting the partial effects with
  * identical bytes. A replay after the install short-circuits on
  * `batchId <= last_batch`.
  *
  * Equivalence contract (the SCD2-fold shape): batches must arrive in
  * doc_id order — Spark's file stream with one source file per trigger
  * and doc_id-ordered files provides this. Cross-batch TRANSITIVE
  * near-dup chains (A∼B, B∼C, A≁C with B dropped in an earlier batch)
  * can keep a doc the global batch run would drop; within a batch the
  * clustering is identical. Real curation corpora dedup at thresholds
  * where such chains are rare; the batch run remains the ground truth.
  *
  * Scale notes: the kept corpus is an append-only parquet directory (one
  * subdir per batch — no rewrite amplification); incremental dedup work
  * is ∝ |batch| × collision rate ([[Dedup.incrementalNearDups]] — a
  * production deployment would persist the band-signature projection of
  * the kept corpus instead of re-deriving it from text each batch, the
  * documented q56 shape). Pack state is rows = |splits|×|sources|, KBs.
  */
object StreamingCurate {

  private val MetaSplit = "__meta" // sentinel row carrying last_batch

  /** Process one micro-batch of documents (doc_id, text, lang, source,
    * …) into `outDir`. Idempotent per `batchId`; see the object doc for
    * the commit protocol.
    */
  def processBatch(batch: DataFrame, batchId: Long, outDir: String,
                   threshold: Double = 0.7,
                   budget: Int = TrainingData.PackBudget,
                   maxRecordsPerFile: Long = 10000): Unit =
    graft.core.PathLocks.forPath(outDir).synchronized {
      val spark = batch.sparkSession
      val packPath = s"$outDir/_state/pack"
      graft.warehouse.StateFiles.recover(spark, packPath)
      val state = readPackState(spark, packPath)
      if (batchId <= state.lastBatch) return // fully-committed replay

      // Dedup: within the batch (the batch pipeline's own clustering),
      // then against every doc kept by prior batches.
      val inBatch = Dedup.dedupedCorpus(batch, threshold)
      val fresh = readKept(spark, outDir, batchId) match {
        case None => inBatch
        case Some(base) =>
          val dupIds = Dedup.incrementalNearDups(inBatch, base, threshold)
            .select(col("batch_id").as("doc_id")).distinct()
          inBatch.join(dupIds, Seq("doc_id"), "left_anti")
      }

      // Split + token counts + pack, CONTINUING each (split, source)
      // group's running token offset from the state table.
      val withSplit = fresh
        .withColumn("split", TrainingData.hashSplit(col("doc_id")))
        .withColumn("n_toks", size(TextAnalysis.tokens(col("text"))).cast("long"))
      val w = Window.partitionBy("split", "source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val packed = withSplit
        .join(broadcast(state.offsets), Seq("split", "source"), "left")
        .withColumn("__before", coalesce(col("toks_before"), lit(0L)))
        .withColumn("seq_id",
          floor((col("__before") + sum("n_toks").over(w) - col("n_toks")) / budget.toDouble))
        .drop("toks_before")
        .localCheckpoint(eager = true) // one compute, three consumers

      // 1/3: publish the shard directory atomically.
      publishShards(spark, packed.drop("__before"), outDir, batchId, maxRecordsPerFile)
      // 2/3: append this batch's kept docs to the dedup base — read back
      // from the checkpoint (projecting fresh's columns), NOT from
      // `fresh` itself, whose lineage would re-run the whole minhash +
      // band-join dedup a second time per batch.
      packed.select(fresh.columns.map(col): _*)
        .write.mode("overwrite").parquet(keptDir(outDir, batchId))
      // 3/3: advance pack offsets + last_batch (the commit point).
      val sums = packed.groupBy("split", "source").agg(sum("n_toks").as("__t"))
      val newOffsets = state.offsets.join(sums, Seq("split", "source"), "full")
        .select(col("split"), col("source"),
          (coalesce(col("toks_before"), lit(0L)) + coalesce(col("__t"), lit(0L)))
            .as("toks_before"))
      installPackState(spark, packPath, newOffsets, batchId)
    }

  /** Drain-and-stop streaming curation of a documents directory (one
    * doc_id-ordered NDJSON file per micro-batch). Spark's streaming
    * checkpoint dedupes source files; [[processBatch]] dedupes replays.
    */
  def availableNow(spark: SparkSession, sourceDir: String, schema: StructType,
                   outDir: String, checkpointDir: String,
                   threshold: Double = 0.7,
                   budget: Int = TrainingData.PackBudget,
                   maxRecordsPerFile: Long = 10000): StreamingQuery =
    spark.readStream.schema(schema).option("mode", "DROPMALFORMED")
      .option("maxFilesPerTrigger", 1).json(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatch(batch, batchId, outDir, threshold, budget, maxRecordsPerFile)
      }
      .start()

  /** All shard rows published so far — the stream-side read surface. */
  def publishedShards(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val base = new Path(s"$outDir/batches")
    val hfs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(base)) None
    else {
      val dirs = hfs.listStatus(base).map(_.getPath.toString)
        .filter(_.contains("/batch_"))
      if (dirs.isEmpty) None
      // One read per batch dir (its own basePath roots the split=…
      // partition discovery), then union — batch_N isn't a key=value
      // layer, so a single multi-dir read refuses the layout.
      else Some(dirs.toIndexedSeq
        .map(d => spark.read.option("basePath", d).parquet(d))
        .reduce(_.unionByName(_)))
    }
  }

  // ------------------------------------------------------------ internals

  private def keptDir(outDir: String, batchId: Long) =
    s"$outDir/_state/kept/batch_$batchId"

  /** Kept docs of every COMMITTED prior batch. A crashed attempt may have
    * left `kept/batch_N` behind; filtering to ids < batchId keeps the
    * replay's dedup base identical to the first attempt's.
    */
  private def readKept(spark: SparkSession, outDir: String, batchId: Long): Option[DataFrame] = {
    val base = new Path(s"$outDir/_state/kept")
    val hfs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(base)) None
    else {
      val dirs = hfs.listStatus(base).flatMap { st =>
        val name = st.getPath.getName
        if (!name.startsWith("batch_")) None
        else name.stripPrefix("batch_").toLongOption
          .filter(_ < batchId).map(_ => st.getPath.toString)
      }
      if (dirs.isEmpty) None else Some(spark.read.parquet(dirs.toIndexedSeq: _*))
    }
  }

  /** Stage + atomic rename: `batches/batch_N` either absent or complete.
    * A leftover staging dir (crash mid-write) and a leftover destination
    * (crash after rename, before state install) are both clobbered — the
    * replay's recomputed content is byte-identical by determinism.
    */
  private def publishShards(spark: SparkSession, packed: DataFrame, outDir: String,
                            batchId: Long, maxRecordsPerFile: Long): Unit = {
    val staging = s"$outDir/.staging_batch_$batchId"
    val dest = new Path(s"$outDir/batches/batch_$batchId")
    val hfs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ShardWriter.writeShards(packed, staging, Seq("split"), maxRecordsPerFile)
    if (hfs.exists(dest)) hfs.delete(dest, true)
    hfs.mkdirs(dest.getParent)
    if (!hfs.rename(new Path(staging), dest))
      sys.error(s"shard publish failed for batch $batchId at $dest")
  }

  private final case class PackState(lastBatch: Long, offsets: DataFrame)

  private def readPackState(spark: SparkSession, packPath: String): PackState =
    if (!graft.warehouse.StateFiles.exists(spark, packPath)) {
      import spark.implicits._
      PackState(-1L, Seq.empty[(String, String, Long)]
        .toDF("split", "source", "toks_before"))
    } else {
      val df = spark.read.parquet(packPath)
      val last = df.agg(max("last_batch")).head().getLong(0)
      PackState(last,
        df.filter(col("split") =!= MetaSplit).select("split", "source", "toks_before"))
    }

  private def installPackState(spark: SparkSession, packPath: String,
                               offsets: DataFrame, batchId: Long): Unit = {
    // The sentinel row keeps the table non-empty (and last_batch readable)
    // even when the corpus so far packed zero groups.
    import spark.implicits._
    val meta = Seq((MetaSplit, MetaSplit, 0L)).toDF("split", "source", "toks_before")
    val merged = offsets.unionByName(meta).withColumn("last_batch", lit(batchId))
    // localCheckpoint: the offsets plan reads the CURRENT state parquet,
    // which install is about to swap out from under a lazy reader.
    graft.warehouse.StateFiles.install(spark, packPath,
      merged.localCheckpoint(eager = true))
  }
}
