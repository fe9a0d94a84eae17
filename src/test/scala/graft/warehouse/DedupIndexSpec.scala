package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental dedup index: batch-probed matches equal the direct
  * batch-vs-base operator (persisted signatures ≡ recomputed
  * signatures), the first batch matches nothing, match rows survive the
  * index teardown (checkpoint pin), and the re-ingest guard fires.
  */
class DedupIndexSpec extends SparkSpec {

  private def docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")

  test("index-probed matches equal the direct incremental operator") {
    val root = tmpDir("didx") + "/idx"
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val first = DedupIndex.matchAndIngest(spark, root, base, threshold = 0.7)
    assert(first.count() == 0L, "first batch has no prior index to match")
    val viaIndex = DedupIndex.matchAndIngest(spark, root, batch, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val direct = graft.analytics.Dedup
      .incrementalNearDups(batch, base, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(viaIndex == direct,
      "persisted signatures must reproduce the direct batch-vs-base matches")
  }

  test("re-ingesting indexed docs fails loudly; stats fold") {
    val root = tmpDir("didx-guard") + "/idx"
    DedupIndex.matchAndIngest(spark, root, docs.filter(col("doc_id") < 100),
      threshold = 0.7)
    DedupIndex.matchAndIngest(spark, root,
      docs.filter(col("doc_id") >= 100), threshold = 0.7)
    val n = spark.read.parquet(root + "/stats").head().getAs[Long]("n_docs")
    assert(n == docs.count())
    val e = intercept[IllegalArgumentException] {
      DedupIndex.matchAndIngest(spark, root, docs.limit(1), threshold = 0.7)
    }
    assert(e.getMessage.contains("re-ingests"))
  }
}
