package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 semantics on hand-checkable corpora, and the salted two-phase
  * top-k's exact equivalence to a plain per-query window (the former is
  * the 100 TB shape; the spec pins that it loses nothing).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def q(id: String, text: String) = Seq((id, text)).toDF("query_id", "query_text")

  test("tf monotonicity: more query-term occurrences outrank fewer at equal length") {
    val docs = Seq(
      (1L, "spark spark spark pad pad pad"),
      (2L, "spark spark pad pad pad pad"),
      (3L, "spark pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25Rank(docs, q("q", "spark"), k = 3)
      .orderBy("rank").select("doc_id").as[Long].collect()
    assert(r.toSeq == Seq(1L, 2L, 3L), s"tf should order equal-length docs: ${r.toSeq}")
  }

  test("length normalization: same tf in a shorter doc scores higher") {
    val docs = Seq(
      (1L, "spark fast"),
      (2L, "spark fast pad pad pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25Rank(docs, q("q", "spark"), k = 2)
      .orderBy("rank").select("doc_id").as[Long].collect()
    assert(r.toSeq == Seq(1L, 2L), "b=0.75 must penalize the longer doc")
  }

  test("idf weighting: a rarer term contributes more than a common one") {
    // "rare" appears in 1 of 4 docs, "common" in all 4; doc 1 has only
    // the common term, doc 2 only the rare one — same length, same tf.
    val docs = Seq(
      (1L, "common pad"),
      (2L, "rare pad"),
      (3L, "common rare"),
      (4L, "common pad")
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25Rank(docs, q("q", "common rare"), k = 4)
      .filter(col("doc_id").isin(1L, 2L))
      .orderBy("rank").select("doc_id").as[Long].collect()
    assert(r.toSeq == Seq(2L, 1L), "rare-term doc must outrank common-term doc")
  }

  test("docs with no query term never appear; terms_hit counts matched terms") {
    val docs = Seq(
      (1L, "spark join"), (2L, "spark pad"), (3L, "nothing here")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25Rank(docs, q("q", "spark join"), k = 10).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L))
    val hits = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("terms_hit")).toMap
    assert(hits == Map(1L -> 2L, 2L -> 1L), hits.toString)
  }

  test("rrfFuse: both-list docs outrank single-list docs; ranks stay inspectable") {
    val sparse = Seq(("q", 10L, 1), ("q", 20L, 2), ("q", 30L, 3))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq(("q", 20L, 1), ("q", 40L, 2), ("q", 10L, 3))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(sparse, dense, k = 10)
      .orderBy("rank").collect()
    // 10: 1/61+1/63, 20: 1/62+1/61 — 20 wins (1/62 > 1/63); 30/40 single-list.
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(20L, 10L, 40L, 30L))
    val d30 = out.find(_.getAs[Long]("doc_id") == 30L).get
    assert(d30.getAs[Integer]("dense_rank") == null && d30.getAs[Int]("sparse_rank") == 3)
    assert(d30.getAs[Long]("rrf_ppb") == 1000000000L / 63)
  }

  test("rrfFuse: the symmetric cross-rank tie breaks on doc_id, deterministically") {
    // A at (1,2), B at (2,1): identical integer sums by construction.
    val sparse = Seq(("q", 5L, 1), ("q", 3L, 2)).toDF("query_id", "doc_id", "rank")
    val dense = Seq(("q", 3L, 1), ("q", 5L, 2)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(sparse, dense, k = 2).orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("rrf_ppb")).distinct.length == 1, "must tie exactly")
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(3L, 5L), "id tiebreak")
  }

  test("salted two-phase top-k equals the plain per-query window exactly") {
    // 200 docs with word counts spread so scores are dense; every salt
    // bucket is populated (doc_id mod 16), so the partial phase prunes
    // for real and must still lose nothing.
    val docs = (1L to 200L).map { i =>
      val hits = (i % 7 + 1).toInt; val pads = (i % 13).toInt
      (i, (Seq.fill(hits)("spark") ++ Seq.fill(pads)("pad")).mkString(" "))
    }.toDF("doc_id", "text")
    val queries = Seq(("a", "spark"), ("b", "spark pad")).toDF("query_id", "query_text")
    val salted = Retrieval.bm25Rank(docs, queries, k = 10)
      .select("query_id", "rank", "doc_id", "score_unats")

    val qterms = queries.select(col("query_id"),
      explode(split(col("query_text"), " ")).as("term")).distinct()
    val toks = docs.select(col("doc_id"),
      explode(graft.functions.shingleStrings(col("text"), 1)).as("term"))
    val tfs = toks.join(qterms.select("term").distinct(), Seq("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dls = docs.select(col("doc_id"),
      size(graft.functions.shingleStrings(col("text"), 1)).cast("long").as("dl"))
    val dfs = tfs.groupBy("term").agg(count(lit(1)).as("df"))
    val consts = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(graft.functions.shingleStrings(col("text"), 1)).cast("long")).as("t_tok"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfn = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * ((col("dl") * col("n_docs")) / col("t_tok"))))
    val plain = tfs.join(qterms, Seq("term")).join(dfs, Seq("term"))
      .join(dls, Seq("doc_id")).crossJoin(consts)
      .select(col("query_id"), col("doc_id"),
        floor(idf * tfn * lit(1000000.0) + lit(0.5)).as("unats"))
      .groupBy("query_id", "doc_id").agg(sum("unats").as("score_unats"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score_unats").desc, col("doc_id"))))
      .filter(col("rank") <= 10)
      .select("query_id", "rank", "doc_id", "score_unats")

    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty,
      "salted two-phase top-k must equal the single-window top-k")
  }
}
