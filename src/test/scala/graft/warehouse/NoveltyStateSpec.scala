package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NoveltyStateSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("3-batch doc-id-ordered replay equals the one-shot corpus scoring") {
    val docs = graft.core.Tables.documents(spark, dir)
    val statePath = tmpDir("nvs") + "/state"
    val batches = Seq(
      docs.filter(col("doc_id") < 30),
      docs.filter(col("doc_id") >= 30 && col("doc_id") < 70),
      docs.filter(col("doc_id") >= 70))
    val folded = batches.map(b =>
      NoveltyState.update(spark, statePath, b))
      .reduce(_.unionByName(_))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"))).toMap

    // One-shot baseline: q124's whole-corpus scoring (string grams; the
    // TextAnalysisSpec already pins string ≡ hash at this density).
    val oneShot = graft.analytics.TextAnalysis.shingleNovelty(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"))).toMap

    assert(folded.keySet == oneShot.keySet)
    val diffs = folded.collect { case (id, v) if oneShot(id) != v =>
      (id, v, oneShot(id)) }
    assert(diffs.isEmpty, s"incremental != one-shot for: ${diffs.take(5)}")
  }

  test("state grows by exactly the novel shingles; repeat batch adds nothing") {
    val docs = graft.core.Tables.documents(spark, dir).filter(col("doc_id") < 20)
    val statePath = tmpDir("nvs") + "/state"
    val first = NoveltyState.update(spark, statePath, docs)
    val novelTotal = first.agg(sum("n_novel")).collect().head.getLong(0)
    assert(NoveltyState.stateSize(spark, statePath) == novelTotal)

    // The same docs again: every shingle is already in the corpus.
    val again = NoveltyState.update(spark, statePath, docs)
    assert(again.agg(sum("n_novel")).collect().head.getLong(0) == 0L)
    assert(NoveltyState.stateSize(spark, statePath) == novelTotal,
      "replaying a batch must not grow the state")
  }
}
