package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery

/** Incremental BM25 retrieval index — the search-engine member of the
  * state family: ingest document batches as they land, answer ranked
  * queries at any time WITHOUT re-tokenizing the corpus.
  *
  * Layout under one root:
  *  - `postings/`   (doc_id, term, tf)  — append-only parquet; a batch
  *    writes ONLY its own postings (work ∝ batch, never ∝ index);
  *  - `doclen/`     (doc_id, dl)        — append-only, one row per doc;
  *  - `stats`       (n_docs, t_tok)     — the scalar corpus constants,
  *    folded by integer addition under the [[StateFiles]] staged swap.
  *
  * df(term) is derived at query time from the postings restricted to
  * the query's terms (a term-pruned aggregation over the posting lists
  * — work ∝ query-term postings, the q74 discipline), so no vocab-sized
  * state table needs folding and a batch append cannot double-count.
  *
  * EXACTNESS: every scoring input (tf, dl, df, n_docs, t_tok) is an
  * exact integer equal to what a one-shot build over the full corpus
  * produces, and the scoring tail is literally SHARED with
  * [[graft.analytics.Retrieval.bm25Rank]] (same fixed double sequence,
  * same µnat floor, same salted top-k) — so incremental-index ranking ≡
  * one-shot ranking row for row, which is exactly what q161 gates.
  *
  * New-doc contract: batches must carry documents not already indexed
  * (a re-ingested doc would double its postings). `update` enforces it
  * with an anti-join probe against `doclen` — one narrow-table read,
  * failing loudly instead of silently corrupting tf/df.
  */
object RetrievalIndex {

  private def postingsPath(root: String) = s"$root/postings"
  private def doclenPath(root: String) = s"$root/doclen"
  private def statsPath(root: String) = s"$root/stats"

  /** Ingest one batch of (idCol, textCol) documents. Returns the
    * post-update corpus constants.
    */
  def update(spark: SparkSession, root: String, batch: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             lease: Boolean = false): DataFrame =
    graft.core.PathLocks.forPath(root).synchronized {
      LeaseLock.withLease(spark, root, lease) {
        StateFiles.recover(spark, statsPath(root))
        val docs = batch.select(col(idCol).as("doc_id"), col(textCol).as("text"))
        val hasIndex = StateFiles.exists(spark, statsPath(root))
        if (hasIndex) {
          val dup = docs.join(spark.read.parquet(doclenPath(root)),
            Seq("doc_id"), "left_semi").limit(1).count()
          require(dup == 0L,
            s"RetrievalIndex.update: batch re-ingests already-indexed " +
              s"doc ids under $root — postings/df would double-count")
        }
        val toks = docs.select(col("doc_id"),
          explode(graft.functions.shingleStrings(col("text"), 1)).as("term"))
        toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
          .write.mode("append").parquet(postingsPath(root))
        docs.select(col("doc_id"),
          size(graft.functions.shingleStrings(col("text"), 1)).cast("long").as("dl"))
          .write.mode("append").parquet(doclenPath(root))
        val batchStats = docs.agg(count(lit(1)).as("n_docs"),
          sum(size(graft.functions.shingleStrings(col("text"), 1)).cast("long"))
            .as("t_tok"))
        val merged =
          if (!hasIndex) batchStats
          else spark.read.parquet(statsPath(root)).unionByName(batchStats)
            .agg(sum("n_docs").as("n_docs"), sum("t_tok").as("t_tok"))
        StateFiles.install(spark, statsPath(root), merged)
        spark.read.parquet(statsPath(root)).localCheckpoint(eager = true)
      }
    }

  /** Rank the indexed corpus against (query_id, query_text) rows — the
    * q74 plan shape fed from the index: postings term-pruned BEFORE any
    * shuffle, df derived from the pruned postings, the shared scoring
    * tail. No tokenization of any document happens here.
    */
  def rank(spark: SparkSession, root: String, queries: DataFrame,
           k: Int): DataFrame = {
    val qterms = queries
      .select(col("query_id"), explode(split(col("query_text"), " ")).as("term"))
      .distinct()
    val tfs = spark.read.parquet(postingsPath(root))
      .join(broadcast(qterms.select("term").distinct()), Seq("term"))
    val dfs = tfs.groupBy("term").agg(count(lit(1)).as("df"))
    val dls = spark.read.parquet(doclenPath(root))
    val consts = spark.read.parquet(statsPath(root))
    graft.analytics.Retrieval.scoreAndRank(tfs, dls, dfs, consts, qterms, k,
      "doc_id")
  }

  // --------------------------------------------------------------- q161
  /** End-to-end incremental-index gate: ingest the documents corpus in 3
    * batches split by doc_id, then run the five q74 bench queries from
    * the index. The oracle is q74's own one-shot DuckDB SQL — so the
    * hash gate proves 3-batch incremental indexing ≡ one-shot corpus
    * ranking exactly (ranks, terms_hit, and every µnat score).
    */
  def retrievalIndexCheck(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("graft-ridx").toString + "/idx"
    (0 until 3).foreach { i =>
      update(spark, root, docs.filter(col("doc_id") % 3 === i))
    }
    val out = rank(spark, root,
      graft.analytics.Retrieval.BenchQueries.toDF("query_id", "query_text"),
      k = 10).localCheckpoint(true)
    graft.core.Fs.deleteRecursively(
      java.nio.file.Paths.get(root).getParent)
    out
  }

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q161_retrieval_index", retrievalIndexCheck _,
      Some(graft.analytics.Retrieval.bm25OracleSql)))
}
