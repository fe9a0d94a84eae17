package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery

/** Incremental BM25 retrieval index — the search-engine member of the
  * state family: ingest document batches as they land, answer ranked
  * queries at any time WITHOUT re-tokenizing the corpus.
  *
  * Layout under one root:
  *  - `postings/batch=N/` (doc_id, term, tf) — one partition dir per
  *    ingested batch (a batch writes ONLY its own postings, work ∝
  *    batch, never ∝ index; `batch` surfaces as a partition column);
  *  - `doclen/batch=N/`   (doc_id, dl);
  *  - `stats`             (n_docs, t_tok, last_batch) — the scalar
  *    corpus constants plus the COMMIT MARKER, folded by integer
  *    addition under the [[StateFiles]] staged swap.
  *
  * EXACTLY-ONCE ingestion: batch content is deterministic and the
  * partition dirs are written with per-dir overwrite, so re-writing a
  * batch is byte-idempotent; the stats install (which carries
  * `last_batch`) is the commit point and happens LAST. A crash before
  * it leaves `last_batch` at N−1 and the replay overwrites the partial
  * dirs with identical content; a replay after it short-circuits on
  * `batchId <= last_batch` — the [[graft.streaming.StreamingCurate]]
  * protocol, which makes the index a safe `foreachBatch` sink
  * ([[graft.streaming.StreamingIndex]]).
  *
  * df(term) is derived at query time from the postings restricted to
  * the query's terms (work ∝ query-term postings, the q74 discipline),
  * so no vocab-sized state folds and appends cannot double-count.
  *
  * EXACTNESS: every scoring input (tf, dl, df, n_docs, t_tok) is an
  * exact integer equal to what a one-shot build over the full corpus
  * produces, and the scoring tail is literally SHARED with
  * [[graft.analytics.Retrieval.bm25Rank]] — so incremental-index
  * ranking ≡ one-shot ranking row for row, which is what q161 gates.
  *
  * New-doc contract: batches must carry documents not already indexed
  * (a re-ingested doc under a NEW batch id would double its postings).
  * `update` enforces it with an anti-join probe against `doclen` — one
  * narrow-table read, failing loudly instead of silently corrupting
  * tf/df. (A REPLAYED batch id is not a violation: it short-circuits
  * before the probe.)
  */
object RetrievalIndex {

  private def postingsPath(root: String) = s"$root/postings"
  private def doclenPath(root: String) = s"$root/doclen"
  private def statsPath(root: String) = s"$root/stats"

  /** (n_docs, t_tok, last_batch) of the installed state, or None. */
  private def readStats(spark: SparkSession, root: String): Option[(Long, Long, Long)] =
    StateFiles.readMarker(spark, statsPath(root)).map(m =>
      (m("n_docs").asInstanceOf[Long], m("t_tok").asInstanceOf[Long],
        m("last_batch").asInstanceOf[Long]))

  /** Ingest one batch of (idCol, textCol) documents. `batchId` defaults
    * to last_batch + 1; passing an explicit id (the foreachBatch epoch)
    * makes the call replay-idempotent. Returns the post-update corpus
    * constants.
    */
  def update(spark: SparkSession, root: String, batch: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             batchId: Option[Long] = None, lease: Boolean = false): DataFrame =
    graft.core.PathLocks.forPath(root).synchronized {
      LeaseLock.withLease(spark, root, lease) {
        StateFiles.recover(spark, statsPath(root))
        IndexCompaction.recover(spark, postingsPath(root))
        IndexCompaction.recover(spark, doclenPath(root))
        val prior = readStats(spark, root)
        val last = prior.map(_._3).getOrElse(-1L)
        val id = batchId.getOrElse(last + 1)
        if (id > last) { // else: committed replay, every effect installed
          val docs = batch.select(col(idCol).as("doc_id"), col(textCol).as("text"))
          if (prior.isDefined) {
            // Committed partitions only: a crash can leave an orphan
            // batch=N dir with last_batch still N−1; its docs are NOT
            // indexed (the replay will overwrite the dir), so they must
            // not trip the guard.
            val dup = docs.join(
              spark.read.parquet(doclenPath(root))
                .filter(col("batch") <= last).select("doc_id"),
              Seq("doc_id"), "left_semi").limit(1).count()
            require(dup == 0L,
              s"RetrievalIndex.update: batch re-ingests already-indexed " +
                s"doc ids under $root — postings/df would double-count")
          }
          // ONE tokenize pass per batch (§6 single-pass): the r18 shape
          // tokenized the batch THREE times — once for postings, once
          // for doclen, once for the corpus-constant aggregate. The
          // token arrays are cached for the two writes, and the
          // constants ride the doclen WRITE as observed metrics (no
          // third pass, no extra job).
          val toks = docs.select(col("doc_id"),
            graft.functions.shingleStrings(col("text"), 1).as("__toks")).cache()
          try {
            toks.select(col("doc_id"), explode(col("__toks")).as("term"))
              .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
              .write.mode("overwrite").parquet(s"${postingsPath(root)}/batch=$id")
            val obs = new org.apache.spark.sql.Observation(s"ridx_stats_$id")
            toks.select(col("doc_id"), size(col("__toks")).cast("long").as("dl"))
              .observe(obs, count(lit(1)).as("n"),
                coalesce(sum(col("dl")), lit(0L)).as("t"))
              .write.mode("overwrite").parquet(s"${doclenPath(root)}/batch=$id")
            val b = obs.get
            val (pn, pt) = prior.map(p => (p._1, p._2)).getOrElse((0L, 0L))
            StateFiles.installMarker(spark, statsPath(root),
              Seq("n_docs" -> (pn + b("n").asInstanceOf[Long]),
                "t_tok" -> (pt + b("t").asInstanceOf[Long]), "last_batch" -> id))
          } finally { toks.unpersist(); () }
        }
        // Post-update constants as a LOCAL relation built from the marker
        // (no file dependency, so no checkpoint job needed to survive the
        // next swap).
        val (n2, t2, l2) = readStats(spark, root).get
        import spark.implicits._
        Seq((n2, t2, l2)).toDF("n_docs", "t_tok", "last_batch")
      }
    }

  /** Fold the committed per-batch partitions of `postings` and `doclen`
    * into one consolidated partition each ([[IndexCompaction]]) — the
    * maintenance verb that keeps a long-lived streaming-fed index from
    * accumulating one dir per micro-batch. Ranking reads are unchanged:
    * folded rows land in `batch=last_batch`, still admitted by the
    * committed-only filter, and `stats`/`last_batch` (the replay
    * short-circuit) is never touched.
    */
  def compact(spark: SparkSession, root: String,
              lease: Boolean = false): Seq[IndexCompaction.FoldReport] =
    graft.core.PathLocks.forPath(root).synchronized {
      LeaseLock.withLease(spark, root, lease) {
        StateFiles.recover(spark, statsPath(root))
        readStats(spark, root) match {
          case None => Nil
          case Some((_, _, last)) =>
            Seq(postingsPath(root), doclenPath(root))
              .map(IndexCompaction.foldBatches(spark, _, last))
        }
      }
    }

  /** Rank the indexed corpus against (query_id, query_text) rows — the
    * q74 plan shape fed from the index: postings term-pruned BEFORE any
    * shuffle, df derived from the pruned postings, the shared scoring
    * tail. No tokenization of any document happens here.
    */
  def rank(spark: SparkSession, root: String, queries: DataFrame,
           k: Int): DataFrame = {
    // Committed batches only (`batch` is a partition column, so the
    // filter PRUNES orphan dirs at the scan): an uncommitted crash
    // residue must not leak into rankings.
    val last = readStats(spark, root)
      .getOrElse(sys.error(s"RetrievalIndex.rank: no index at $root"))._3
    val qterms = queries
      .select(col("query_id"), explode(split(col("query_text"), " ")).as("term"))
      .distinct()
    val tfs = spark.read.parquet(postingsPath(root))
      .filter(col("batch") <= last)
      .select("doc_id", "term", "tf")
      .join(broadcast(qterms.select("term").distinct()), Seq("term"))
    val dfs = tfs.groupBy("term").agg(count(lit(1)).as("df"))
    val dls = spark.read.parquet(doclenPath(root))
      .filter(col("batch") <= last).select("doc_id", "dl")
    val consts = spark.read.parquet(statsPath(root)).select("n_docs", "t_tok")
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
