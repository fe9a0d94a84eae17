package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import org.apache.spark.sql.Column

import graft.warehouse.{CovarianceState, DedupIndex, DriftState, RetrievalIndex}

/** Streaming ingestion faces for the incremental indices: a document
  * file stream drains into the BM25 retrieval index and/or the near-dup
  * index via `foreachBatch`, exactly once.
  *
  * The exactly-once story is the indices' own commit protocol
  * ([[graft.warehouse.RetrievalIndex]]): each micro-batch's effects are
  * deterministic per-batch partition dirs committed by a `last_batch`
  * marker, and the foreachBatch EPOCH is passed as the batch id — so a
  * crash-replayed epoch either overwrites identical bytes (uncommitted)
  * or short-circuits (committed). Spark's streaming checkpoint owns the
  * source offsets; the index state is the sink's own idempotence, the
  * [[StreamingCurate]] division of labor.
  *
  * `Trigger.AvailableNow` drains everything present then stops — the
  * reference's scheduled-drain semantics (SURVEY §2.I S1); a resident
  * deployment swaps in a processing-time trigger unchanged.
  */
object StreamingIndex {

  /** Drain `sourceDir` (json files of `schema`) into the retrieval
    * index at `indexRoot`; blocks until the drain completes.
    */
  def retrievalAvailableNow(spark: SparkSession, sourceDir: String,
                            schema: StructType, indexRoot: String,
                            checkpoint: String): Unit = {
    val q: StreamingQuery = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one source file per micro-batch
      .json(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        RetrievalIndex.update(spark, indexRoot, batch, batchId = Some(epoch))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drain `sourceDir` (json files of `schema`) into the drift-monitor
    * state at `stateRoot`: each micro-batch's binned histogram folds
    * into the CURRENT side under [[DriftState]]'s delta-dir + marker
    * protocol (the reference side is frozen beforehand via
    * `DriftState.initReference`). `binExpr` maps a raw row to its
    * integer bin id. Same exactly-once story as the index faces: the
    * epoch is the batch id, replays short-circuit, orphan dirs are
    * excluded from reads.
    */
  def driftAvailableNow(spark: SparkSession, sourceDir: String,
                        schema: StructType, stateRoot: String,
                        checkpoint: String, groupCols: Seq[String],
                        binExpr: Column): Unit = {
    val q: StreamingQuery = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one source file per micro-batch
      .json(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        DriftState.update(spark, stateRoot,
          batch.withColumn("__bin", binExpr), groupCols, "__bin",
          batchId = Some(epoch))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drain `sourceDir` (json files of `schema`, embedding as a numeric
    * array under `vecCol`) into the incremental-covariance state — the
    * streaming face of [[CovarianceState]] (r9 verdict item 6: DriftState
    * had one, the covariance member didn't). Exactly-once rides the
    * state's delta-dir + `last_batch` marker protocol with the epoch as
    * the batch id, so crash replays short-circuit and stream-built state
    * ≡ one-shot sufficient statistics bit-for-bit (integer sums).
    */
  def covarianceAvailableNow(spark: SparkSession, sourceDir: String,
                             schema: StructType, stateRoot: String,
                             checkpoint: String,
                             vecCol: String = "embedding"): Unit = {
    val q: StreamingQuery = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one source file per micro-batch
      .json(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        CovarianceState.update(spark, stateRoot, batch, vecCol,
          batchId = Some(epoch))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drain `sourceDir` (json files of scored predictions) into the
    * incremental eval-monitoring state — the streaming face of
    * [[graft.warehouse.EvalState]], completing streaming parity for the
    * model-monitoring state family (DriftState and CovarianceState have
    * theirs). Exactly-once rides the state's delta-dir + `last_batch`
    * marker protocol with the epoch as the batch id, so crash replays
    * short-circuit and stream-built bin counts ≡ one-shot bit-for-bit
    * (integer sums).
    */
  def evalAvailableNow(spark: SparkSession, sourceDir: String,
                       schema: StructType, stateRoot: String,
                       checkpoint: String, groupCol: String = "source",
                       scoreCol: String = "score_micro",
                       labelCol: String = "label"): Unit = {
    val q: StreamingQuery = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one source file per micro-batch
      .json(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        graft.warehouse.EvalState.update(spark, stateRoot, batch, groupCol,
          scoreCol, labelCol, batchId = Some(epoch))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drain `sourceDir` (json files with an id and a numeric-array
    * embedding) into the incremental IVF ANN state — the streaming face
    * of [[graft.warehouse.IvfState]], completing streaming parity for
    * the index family (r12 verdict: IVF/PQ was the one family without
    * an incremental exactly-once variant). Each drained batch lands as
    * a searchable tail delta; [[graft.warehouse.IvfState.recluster]]
    * remains a scheduled maintenance verb, exactly like index
    * compaction. Exactly-once rides the state's delta-dir +
    * `last_batch` marker protocol with the epoch as the batch id.
    */
  def ivfAvailableNow(spark: SparkSession, sourceDir: String,
                      schema: StructType, stateRoot: String,
                      checkpoint: String, idCol: String = "vec_id",
                      vecCol: String = "embedding"): Unit = {
    val q: StreamingQuery = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one source file per micro-batch
      .json(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        graft.warehouse.IvfState.update(spark, stateRoot, batch, idCol,
          vecCol, batchId = Some(epoch))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drain `sourceDir` into the incremental PQ ANN state — the
    * [[ivfAvailableNow]] sibling ([[graft.warehouse.PqState]]): drained
    * batches land as an exact raw tail; codebook retraining stays a
    * scheduled maintenance verb.
    */
  def pqAvailableNow(spark: SparkSession, sourceDir: String,
                     schema: StructType, stateRoot: String,
                     checkpoint: String, idCol: String = "vec_id",
                     vecCol: String = "embedding"): Unit = {
    val q: StreamingQuery = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one source file per micro-batch
      .json(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        graft.warehouse.PqState.update(spark, stateRoot, batch, idCol,
          vecCol, batchId = Some(epoch))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drain `sourceDir` into the incremental IVF-PQ ANN state — the
    * composite sibling of [[ivfAvailableNow]]/[[pqAvailableNow]]
    * ([[graft.warehouse.IvfPqState]]): drained batches land as an exact
    * raw tail; the coarse+PQ recluster stays a scheduled maintenance
    * verb (`compact-index ivfpq`).
    */
  def ivfPqAvailableNow(spark: SparkSession, sourceDir: String,
                        schema: StructType, stateRoot: String,
                        checkpoint: String, idCol: String = "vec_id",
                        vecCol: String = "embedding"): Unit = {
    val q: StreamingQuery = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one source file per micro-batch
      .json(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        graft.warehouse.IvfPqState.update(spark, stateRoot, batch, idCol,
          vecCol, batchId = Some(epoch))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drain `sourceDir` into the incremental IVF-SQ8 ANN state — the
    * [[ivfPqAvailableNow]] sibling ([[graft.warehouse.SqState]]),
    * completing streaming parity for the full ANN family. Unlike the
    * other members, drained batches land ALREADY ENCODED (SQ8 codes are
    * per-vector — [[graft.warehouse.SqState.update]] is the family's
    * only encode site), so the coarse recluster maintenance verb moves
    * rows between cells without any re-encode work.
    */
  def sqAvailableNow(spark: SparkSession, sourceDir: String,
                     schema: StructType, stateRoot: String,
                     checkpoint: String, idCol: String = "vec_id",
                     vecCol: String = "embedding"): Unit = {
    val q: StreamingQuery = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one source file per micro-batch
      .json(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        graft.warehouse.SqState.update(spark, stateRoot, batch, idCol,
          vecCol, batchId = Some(epoch))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drain `sourceDir` into the incremental IVF-binary ANN state — the
    * [[sqAvailableNow]] sibling ([[graft.warehouse.BitState]]): packed
    * sign codes are computed at ingest from the deterministic seeded
    * plane matrix, so the recluster verb is re-encode-free like SQ8's.
    */
  def bitAvailableNow(spark: SparkSession, sourceDir: String,
                      schema: StructType, stateRoot: String,
                      checkpoint: String, idCol: String = "vec_id",
                      vecCol: String = "embedding"): Unit = {
    val q: StreamingQuery = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one source file per micro-batch
      .json(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        graft.warehouse.BitState.update(spark, stateRoot, batch, idCol,
          vecCol, batchId = Some(epoch))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drain `sourceDir` into the incremental MIPS ANN state — the
    * [[sqAvailableNow]] sibling ([[graft.warehouse.MipsState]]): raw
    * SQ8 codes land at ingest (M-free, the store-raw/augment-at-
    * recluster design), so a stream of batches that RAISES the max
    * corpus norm invalidates nothing — the next recluster re-augments
    * from raw at the new M.
    */
  def mipsAvailableNow(spark: SparkSession, sourceDir: String,
                       schema: StructType, stateRoot: String,
                       checkpoint: String, idCol: String = "vec_id",
                       vecCol: String = "embedding"): Unit = {
    val q: StreamingQuery = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one source file per micro-batch
      .json(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        graft.warehouse.MipsState.update(spark, stateRoot, batch, idCol,
          vecCol, batchId = Some(epoch))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drain `sourceDir` (json training docs) through exact substring
    * decontamination against a FIXED eval set — q233's streaming face
    * (r13 verdict item 7): each micro-batch is scored by
    * [[graft.analytics.TrainingData.substringOverlap]] (eval gram set
    * broadcast, islands run merge) and committed to the append-only
    * [[graft.warehouse.DecontamState]] table exactly once (epoch = batch
    * id, replays short-circuit). Per-doc rows are independent given the
    * eval set, so the multi-batch snapshot ≡ the one-shot batch result
    * row-for-row (StreamingIndexSpec pins it).
    */
  def decontamAvailableNow(spark: SparkSession, sourceDir: String,
                           schema: StructType, evalDocs: org.apache.spark.sql.DataFrame,
                           stateRoot: String, checkpoint: String,
                           k: Int = 3, minRun: Int = 8): Unit = {
    val q: StreamingQuery = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one source file per micro-batch
      .json(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        graft.warehouse.DecontamState.update(spark, stateRoot, evalDocs,
          batch, k, minRun, batchId = Some(epoch))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drain `sourceDir` into the near-dup index at `indexRoot`; each
    * micro-batch's matches against the prior corpus persist under the
    * index's `matches/batch=N/` dirs (query them any time).
    */
  def dedupAvailableNow(spark: SparkSession, sourceDir: String,
                        schema: StructType, indexRoot: String,
                        checkpoint: String, threshold: Double = 0.7): Unit = {
    val q: StreamingQuery = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one source file per micro-batch
      .json(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        DedupIndex.matchAndIngest(spark, indexRoot, batch, threshold,
          batchId = Some(epoch))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drain `sourceDir` edge files into the incremental connected-
    * components state ([[graft.warehouse.ComponentsState]]): each
    * micro-batch contracts to its label-level graph and merges —
    * replayed edges are structural no-ops, so the face needs no batch
    * bookkeeping beyond Spark's own checkpoint.
    */
  def componentsAvailableNow(spark: SparkSession, sourceDir: String,
                             schema: StructType, statePath: String,
                             checkpoint: String, aCol: String = "a_id",
                             bCol: String = "b_id"): Unit = {
    val q: StreamingQuery = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one source file per micro-batch
      .json(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        graft.warehouse.ComponentsState.update(spark, statePath, batch,
          aCol, bCol)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
