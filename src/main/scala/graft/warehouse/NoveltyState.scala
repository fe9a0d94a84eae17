package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental n-gram novelty — the batch-vs-corpus-so-far form of
  * q124's novelty scoring, for the ingest loop a training-data pipeline
  * actually runs: each arriving batch is scored against EVERYTHING
  * ingested before it (how much genuinely new text does this crawl
  * slice add?), without ever recomputing over history.
  *
  * State is the distinct 64-bit shingle-hash set of the corpus so far
  * ([[graft.analytics.Dedup.shingleHashSet]]'s space — novelty over
  * hashes equals novelty over grams modulo ~1e-11 collisions), stored
  * as a single-column parquet table. An update is: explode the batch's
  * shingles (batch-sized), LEFT ANTI hash-join against the state (the
  * state never re-aggregates — the join streams it), count surviving
  * (first-in-batch) shingles per doc, then install state ∪ batch-new
  * with the [[StateFiles]] staged swap. Work per update is
  * O(batch + state-join); state grows by exactly the novel shingles.
  *
  * Determinism: within a batch, first occurrence is by doc-id order
  * (min(doc_id) per shingle — same rule as q124), so folding batches in
  * doc-id order reproduces the one-shot corpus scoring EXACTLY
  * (NoveltyStateSpec pins 3-batch replay == q124's whole-corpus
  * output). Same single-writer contract as the other state tables
  * (path lock; cross-driver lease opt-in).
  *
  * At 100 TB the state is the corpus's distinct-shingle set — large but
  * ×8-byte-hash compact; the anti-join shuffles batch + state on the
  * hash key. When even that is too hot, the documented degradation is a
  * Bloom prefilter over the state ([[graft.functions.BloomFilters]]):
  * no false negatives means no novelty OVER-count from the filter, and
  * survivors confirm against the exact state.
  */
object NoveltyState {

  /** Score `batch` (idCol + textCol) against the state at `statePath`
    * and fold its shingles in. Returns per-doc
    * (doc_id, n_shingles, n_novel, novelty_ppm) for the batch — novel
    * means "never seen in any earlier batch NOR earlier (by id) in this
    * one", q124's rule — eagerly materialized so the snapshot survives
    * the next update's swap.
    */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             lease: Boolean = false): DataFrame =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statePath)
        val sh = batch
          .select(col(idCol).as("doc_id"),
            explode(graft.analytics.Dedup.shingleHashSet(col(textCol))).as("h"))
        val firstInBatch = sh.groupBy("h").agg(min("doc_id").as("doc_id"))
        val newToCorpus =
          if (!StateFiles.exists(spark, statePath)) firstInBatch
          else firstInBatch.join(spark.read.parquet(statePath), Seq("h"), "left_anti")
        // The per-doc rollups and the state install both consume
        // `newToCorpus`; pin it once (it is batch-novel-sized).
        val pinned = newToCorpus.localCheckpoint(true)

        val novelPerDoc = pinned.groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
        val totals = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
        val scored = totals.join(novelPerDoc, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_shingles"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"))
          .withColumn("novelty_ppm",
            expr("CAST(n_novel * 1000000 DIV n_shingles AS BIGINT)"))
          .localCheckpoint(true)

        val newState =
          if (!StateFiles.exists(spark, statePath)) pinned.select("h")
          else spark.read.parquet(statePath).select("h")
            .unionByName(pinned.select("h"))
        StateFiles.install(spark, statePath, newState)
        scored
      }
    }

  /** Distinct shingles accumulated so far (state cardinality). */
  def stateSize(spark: SparkSession, statePath: String): Long =
    if (!StateFiles.exists(spark, statePath)) 0L
    else spark.read.parquet(statePath).count()
}
