package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.warehouse.ShardWriter

/** End-to-end corpus curation — the deliverable shape of the whole
  * training-data surface, driven as ONE pipeline (the engine analogue of
  * the reference's dump.py load-everything flow, reference dump.py:49-75):
  *
  *   near-dup dedup (MinHash-LSH → clusters → canonical doc per cluster)
  *   → deterministic train/val/test assignment (hash split)
  *   → sequence packing (per-source token-offset chunking)
  *   → bounded training shards partitioned by split.
  *
  * Every stage is the already-verified operator (Dedup.dedupedCorpus,
  * TrainingData.hashSplit, the q39 packing form, ShardWriter) — this
  * object only composes them, so the pipeline inherits their oracle/spec
  * coverage and their scale shapes: LSH-banded candidates, per-row hash
  * split, per-(split,source) windows, per-task-writer shard caps. No
  * stage collects the corpus to the driver.
  */
object Curate {

  final case class Report(docsIn: Long, docsKept: Long, totalTokens: Long,
                          shards: ShardWriter.ShardReport) {
    def summary: String =
      s"curate: $docsIn docs in, $docsKept kept after dedup, " +
        s"$totalTokens tokens packed, ${shards.files} shard files (${shards.rows} rows)"
  }

  /** The curated corpus as a lazy plan: deduped docs + `split`, `n_toks`,
    * `seq_id` columns. Packing is per (split, source) so sequences never
    * straddle a split boundary (an eval sequence must not share training
    * tokens) and the running sum stays a partition-local window.
    */
  def curated(docs: DataFrame, threshold: Double = 0.7,
              budget: Int = TrainingData.PackBudget): DataFrame = {
    val deduped = Dedup.dedupedCorpus(docs, threshold)
    val withSplit = deduped.withColumn("split", TrainingData.hashSplit(col("doc_id")))
    val w = Window.partitionBy("split", "source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withSplit
      .withColumn("n_toks", size(TextAnalysis.tokens(col("text"))).cast("long"))
      .withColumn("seq_id",
        floor((sum("n_toks").over(w) - col("n_toks")) / budget.toDouble))
  }

  /** Drive the full pipeline from a documents parquet to a shard
    * directory. Returns the accounting a curation run reports.
    *
    * Accounting is one-pass: kept-doc and token totals ride the shard
    * write via an Observation (previously a `docs.count()` plus a full
    * re-read of the output dir — two extra data passes), and the input
    * count comes from parquet footers ([[graft.core.ParquetMeta]]) —
    * metadata, not a scan.
    */
  def run(spark: SparkSession, docsPath: String, outDir: String,
          threshold: Double = 0.7, budget: Int = TrainingData.PackBudget,
          maxRecordsPerFile: Long = 10000): Report = {
    val docs = spark.read.parquet(docsPath)
    val obs = org.apache.spark.sql.Observation()
    val observed = curated(docs, threshold, budget)
      .observe(obs, coalesce(sum("n_toks"), lit(0L)).as("tokens"))
    val shards = ShardWriter.writeShards(observed, outDir, Seq("split"), maxRecordsPerFile)
    Report(graft.core.ParquetMeta.rowCount(spark, docsPath), shards.rows,
      obs.get("tokens").asInstanceOf[Long], shards)
  }
}
