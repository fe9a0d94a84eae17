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
       |  doc_id, terms_hit, score_unats
       |FROM scored
       |QUALIFY rank <= 10""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q74_bm25_topdocs", bm25TopDocs _, Some(bm25TopDocsSql)))
}
