package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** BM25 ranked retrieval — the standard lexical relevance function
  * (Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework:
  * BM25 and Beyond") every RAG / retrieval-eval pipeline starts from;
  * complements the dense-vector ANN paths (q19/q20/q28) with the sparse
  * side of hybrid search.
  *
  * score(D,Q) = Σ_{t∈Q} idf(t) · tf(t,D)·(k1+1) /
  *                        (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
  * with the Lucene-style always-positive idf
  * ln(1 + (N − df + 0.5)/(df + 0.5)), k1 = 1.2, b = 0.75.
  *
  * Exactness design (the q49/q73 micro-nat contract): every model input
  * is an exact integer (tf, df, per-doc length dl, corpus doc count N,
  * corpus token count T); each per-term score runs those integers
  * through ONE fixed double-op sequence and floors to integer
  * MICRO-NATS, so a document's score is an order-independent BIGINT sum
  * and ranking (score desc, doc_id) is deterministic across engines,
  * runs, and layouts.
  *
  * Scale shape: the corpus token stream is immediately semi-joined to
  * the BROADCAST query-term set, so only matching postings survive the
  * first shuffle — work is proportional to the postings of the query
  * terms, not the corpus. df/N/T are tiny aggregates broadcast back.
  * The top-k is TWO-PHASE SALTED: per-(query, salt-of-16) partial
  * top-k first, then the true top-k over the ≤16k survivors — no
  * single task ever holds a query's full candidate set, which a plain
  * per-query window would serialize at web scale (one common term ⇒
  * candidate set ∼ corpus).
  */
object Retrieval {

  val K1Num = 6L // k1 = 1.2 = 6/5, b = 0.75 = 3/4 (documentation only;
  val Salts = 16 // the fixed double sequence below encodes them)

  /** Rank `docs` against each (query_id, query_text) row of `queries`;
    * returns the top `k` per query with integer micro-nat scores.
    */
  def bm25Rank(docs: DataFrame, queries: DataFrame, k: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val qterms = queries
      .select(col("query_id"), explode(split(col("query_text"), " ")).as("term"))
      .distinct()
    val toks = docs.select(col(idCol),
      explode(graft.functions.shingleStrings(col(textCol), 1)).as("term"))
    // Postings restricted to query terms before any corpus-keyed shuffle.
    val tfs = toks.join(broadcast(qterms.select("term").distinct()), Seq("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dls = docs.select(col(idCol),
      size(graft.functions.shingleStrings(col(textCol), 1)).cast("long").as("dl"))
    val dfs = tfs.groupBy("term").agg(count(lit(1)).as("df"))
    val consts = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(graft.functions.shingleStrings(col(textCol), 1)).cast("long")).as("t_tok"))
    scoreAndRank(tfs, dls, dfs, consts, qterms, k, idCol)
  }

  /** The shared BM25 scoring + salted top-k tail: exact-integer inputs
    * (tf, dl, df, n_docs, t_tok) through ONE fixed double sequence,
    * floored to µnats — shared by the direct ranker above and the
    * incremental index ([[graft.warehouse.RetrievalIndex]]) so the two
    * paths can never drift by an op-order ulp.
    */
  private[graft] def scoreAndRank(tfs: DataFrame, dls: DataFrame, dfs: DataFrame,
                                  consts: DataFrame, qterms: DataFrame, k: Int,
                                  idCol: String): DataFrame = {
    // One fixed double sequence over exact integers, floored to µnats.
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfn = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * ((col("dl") * col("n_docs")) / col("t_tok"))))
    val scored = tfs
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfs), Seq("term"))
      .join(dls, Seq(idCol))
      .crossJoin(broadcast(consts))
      .select(col("query_id"), col(idCol),
        floor(idf * tfn * lit(1000000.0) + lit(0.5)).as("unats"))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("terms_hit"), sum("unats").as("score_unats"))
    val ord = Seq(col("score_unats").desc, col(idCol))
    val partial = Window.partitionBy(col("query_id"), pmod(col(idCol), lit(Salts)))
      .orderBy(ord: _*)
    val full = Window.partitionBy(col("query_id")).orderBy(ord: _*)
    scored
      .withColumn("r0", row_number().over(partial)).filter(col("r0") <= k)
      .withColumn("rank", row_number().over(full)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol), col("terms_hit"),
        col("score_unats"))
  }

  /** The gated query set: five fixed multi-term queries over the shared
    * synthetic vocabulary, exercising rare/common term mixes.
    */
  val BenchQueries: Seq[(String, String)] = Seq(
    "q1" -> "fast hash join",
    "q2" -> "slow table scan",
    "q3" -> "stream batch window",
    "q4" -> "customer order query",
    "q5" -> "vector group sort merge")

  def bm25TopDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val queries = BenchQueries.toDF("query_id", "query_text")
    bm25Rank(Tables.documents(spark, dir), queries, k = 10)
  }

  private val bm25Values =
    BenchQueries.map { case (i, t) => s"('$i', '$t')" }.mkString(", ")

  /** q74's oracle SQL, shared with the q161 incremental-index gate (the
    * index must reproduce the one-shot ranking exactly). */
  private[graft] def bm25OracleSql: String = bm25TopDocsSql

  private val bm25TopDocsSql =
    s"""WITH q(query_id, query_text) AS (VALUES $bm25Values),
       |qterms AS (
       |  SELECT DISTINCT query_id, unnest(string_split(query_text, ' ')) AS term FROM q
       |),
       |ws AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents
       |),
       |toks AS (SELECT doc_id, unnest(w) AS term FROM ws),
       |tfs AS (
       |  SELECT doc_id, term, count(*) AS tf FROM toks
       |  WHERE term IN (SELECT term FROM qterms) GROUP BY 1, 2
       |),
       |dls AS (SELECT doc_id, len(w)::BIGINT AS dl FROM ws),
       |dfs AS (SELECT term, count(*) AS df FROM tfs GROUP BY 1),
       |consts AS (SELECT count(*)::BIGINT AS n_docs, sum(len(w))::BIGINT AS t_tok FROM ws),
       |scored AS (
       |  SELECT qt.query_id, t.doc_id,
       |    count(*) AS terms_hit,
       |    sum(CAST(floor(
       |      ln((c.n_docs - d.df + 0.5::DOUBLE) / (d.df + 0.5::DOUBLE) + 1.0::DOUBLE)
       |      * ((t.tf * 2.2::DOUBLE) /
       |         (t.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE *
       |            ((l.dl * c.n_docs)::DOUBLE / c.t_tok))))
       |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT)) AS score_unats
       |  FROM tfs t
       |  JOIN qterms qt USING (term)
       |  JOIN dfs d USING (term)
       |  JOIN dls l USING (doc_id)
       |  CROSS JOIN consts c
       |  GROUP BY 1, 2
       |)
       |SELECT query_id,
       |  CAST(row_number() OVER
       |    (PARTITION BY query_id ORDER BY score_unats DESC, doc_id) AS INTEGER) AS rank,
       |  doc_id, terms_hit,
       |  CAST(score_unats AS BIGINT) AS score_unats
       |FROM scored
       |QUALIFY rank <= 10""".stripMargin

  // ---------------------------------------------------------------- q75
  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
    * standard way hybrid search combines a sparse (BM25) and a dense
    * (embedding kNN) ranking without score calibration:
    * rrf(d) = Σ_lists 1/(K + rank_d), K = 60.
    *
    * Exactness: each reciprocal is the INTEGER division
    * 1e9 div (K + rank) — parts-per-billion units — so fused scores are
    * exact integer sums and the final ordering (rrf desc, doc_id) is
    * engine-deterministic, including the genuine cross-rank ties RRF
    * produces (doc A at ranks (1,2) vs doc B at (2,1) sum identically;
    * the id tiebreak makes that reproducible instead of flaky).
    *
    * Scale shape: fusion's inputs are ALREADY top-k lists — k·queries
    * rows, broadcast-sized by construction — so the fuse itself is a
    * tiny outer join + window; all corpus-scale work lives in the
    * upstream rankers (q74's salted BM25, q19/q20/q28's kNN), which is
    * the point of fusing on RANKS rather than scores.
    */
  val RrfK = 60

  /** Fuse two (query_id, doc_id, rank) top-k lists; top `k` per query.
    * Docs present in one list only score that list's reciprocal alone —
    * the other rank stays null in the output for interpretability.
    */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, k: Int): DataFrame = {
    val s = sparse.select(col("query_id"), col("doc_id"), col("rank").as("sparse_rank"))
    val d = dense.select(col("query_id"), col("doc_id"), col("rank").as("dense_rank"))
    // `div` = exact integer division (parts-per-billion reciprocals).
    def w(name: String) =
      coalesce(expr(s"1000000000L div ($RrfK + $name)"), lit(0L))
    s.join(d, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_ppb", w("sparse_rank") + w("dense_rank"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rrf_ppb").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("sparse_rank"), col("dense_rank"), col("rrf_ppb"))
  }

  /** Gated q75: hybrid search over the aligned documents/embeddings
    * tables (doc_id ≡ vec_id). Each fixed text query carries an
    * application-supplied probe vector (vec_id = its position), the two
    * top-20 lists fuse, and the top-10 fused ranking is hash-gated.
    */
  def hybridSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val probes = BenchQueries.zipWithIndex
      .map { case ((qid, _), i) => (qid, i.toLong) }.toDF("qid", "probe_vec")
    val sparse = bm25Rank(Tables.documents(spark, dir),
      BenchQueries.toDF("query_id", "query_text"), k = 20)
      .select("query_id", "doc_id", "rank")
    val dense = Similarity
      .bruteForceKnn(emb, emb.filter(col("vec_id") < BenchQueries.size), k = 20)
      .join(broadcast(probes), col("query_id") === col("probe_vec"))
      .select(col("qid").as("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    rrfFuse(sparse, dense, k = 10)
  }

  private val probeValues =
    BenchQueries.zipWithIndex.map { case ((qid, _), i) => s"('$qid', $i)" }.mkString(", ")

  private val hybridSearchSql =
    s"""WITH q(query_id, query_text) AS (VALUES $bm25Values),
       |probes(query_id, probe_vec) AS (VALUES $probeValues),
       |qterms AS (
       |  SELECT DISTINCT query_id, unnest(string_split(query_text, ' ')) AS term FROM q
       |),
       |ws AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents
       |),
       |toks AS (SELECT doc_id, unnest(w) AS term FROM ws),
       |tfs AS (
       |  SELECT doc_id, term, count(*) AS tf FROM toks
       |  WHERE term IN (SELECT term FROM qterms) GROUP BY 1, 2
       |),
       |dls AS (SELECT doc_id, len(w)::BIGINT AS dl FROM ws),
       |dfs AS (SELECT term, count(*) AS df FROM tfs GROUP BY 1),
       |consts AS (SELECT count(*)::BIGINT AS n_docs, sum(len(w))::BIGINT AS t_tok FROM ws),
       |bm AS (
       |  SELECT qt.query_id, t.doc_id,
       |    sum(CAST(floor(
       |      ln((c.n_docs - d.df + 0.5::DOUBLE) / (d.df + 0.5::DOUBLE) + 1.0::DOUBLE)
       |      * ((t.tf * 2.2::DOUBLE) /
       |         (t.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE *
       |            ((l.dl * c.n_docs)::DOUBLE / c.t_tok))))
       |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT)) AS score_unats
       |  FROM tfs t
       |  JOIN qterms qt USING (term)
       |  JOIN dfs d USING (term)
       |  JOIN dls l USING (doc_id)
       |  CROSS JOIN consts c
       |  GROUP BY 1, 2
       |),
       |sparse AS (
       |  SELECT query_id, doc_id,
       |    CAST(row_number() OVER
       |      (PARTITION BY query_id ORDER BY score_unats DESC, doc_id) AS INTEGER) AS sparse_rank
       |  FROM bm QUALIFY sparse_rank <= 20
       |),
       |dense AS (
       |  SELECT p.query_id, c.vec_id AS doc_id,
       |    CAST(row_number() OVER (PARTITION BY p.query_id
       |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
       |               c.vec_id) AS INTEGER) AS dense_rank
       |  FROM probes p
       |  JOIN embeddings e ON e.vec_id = p.probe_vec
       |  JOIN embeddings c ON c.vec_id <> p.probe_vec
       |  QUALIFY dense_rank <= 20
       |),
       |fused AS (
       |  SELECT coalesce(s.query_id, d.query_id) AS query_id,
       |    coalesce(s.doc_id, d.doc_id) AS doc_id,
       |    s.sparse_rank, d.dense_rank,
       |    CAST(coalesce(1000000000 // (${RrfK} + s.sparse_rank), 0)
       |      + coalesce(1000000000 // (${RrfK} + d.dense_rank), 0) AS BIGINT) AS rrf_ppb
       |  FROM sparse s FULL OUTER JOIN dense d
       |    ON s.query_id = d.query_id AND s.doc_id = d.doc_id
       |)
       |SELECT query_id,
       |  CAST(row_number() OVER
       |    (PARTITION BY query_id ORDER BY rrf_ppb DESC, doc_id) AS INTEGER) AS rank,
       |  doc_id, sparse_rank, dense_rank, rrf_ppb
       |FROM fused
       |QUALIFY rank <= 10""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q74_bm25_topdocs", bm25TopDocs _, Some(bm25TopDocsSql)),
    NamedQuery("q75_hybrid_search", hybridSearch _, Some(hybridSearchSql)))
}
