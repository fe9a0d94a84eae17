package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental BM25 index: batch-built ranking ≡ one-shot ranking
  * exactly (the shared scoring tail makes drift impossible — this spec
  * proves the INPUTS also agree), the duplicate-ingest guard fires, and
  * corpus constants fold exactly.
  */
class RetrievalIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")

  test("3-batch index ranking equals the one-shot ranker row for row") {
    val root = tmpDir("ridx") + "/idx"
    Seq(0, 1, 2).foreach { i =>
      RetrievalIndex.update(spark, root, docs.filter(col("doc_id") % 3 === i))
    }
    val queries = graft.analytics.Retrieval.BenchQueries.toDF("query_id", "query_text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("terms_hit"),
          r.getAs[Long]("score_unats"))).toMap
    val fromIndex = rows(RetrievalIndex.rank(spark, root, queries, k = 10))
    val oneShot = rows(graft.analytics.Retrieval.bm25Rank(docs, queries, k = 10))
    assert(fromIndex.nonEmpty && fromIndex == oneShot,
      "incremental index must reproduce the one-shot ranking exactly")
  }

  test("corpus constants fold exactly; re-ingesting an indexed doc fails loudly") {
    val root = tmpDir("ridx-guard") + "/idx"
    RetrievalIndex.update(spark, root, docs.filter(col("doc_id") % 2 === 0))
    val after = RetrievalIndex.update(spark, root,
      docs.filter(col("doc_id") % 2 === 1)).head()
    val direct = docs.agg(count(lit(1)).as("n"),
      sum(size(graft.functions.shingleStrings(col("text"), 1)).cast("long")).as("t"))
      .head()
    assert(after.getAs[Long]("n_docs") == direct.getAs[Long]("n"))
    assert(after.getAs[Long]("t_tok") == direct.getAs[Long]("t"))
    val e = intercept[IllegalArgumentException] {
      RetrievalIndex.update(spark, root, docs.limit(1))
    }
    assert(e.getMessage.contains("re-ingests"),
      s"duplicate guard must name the hazard: ${e.getMessage}")
  }
}
