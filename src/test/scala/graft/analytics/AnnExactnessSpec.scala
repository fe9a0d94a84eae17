package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CI recall audit for the gated ANN queries (the q21 pattern extended to
  * q20/q28): on the planted-margin corpus the approximate answers must
  * EQUAL the brute-force exact top-5 at every scale dir the harness uses
  * — that equality is what licenses sharing the exact-kNN DuckDB oracle.
  * sf0.001 and sf0.01 are the correctness-gate dirs; sf0.1 is the bench
  * dir (2000 + 50 vectors — still seconds here).
  */
class AnnExactnessSpec extends SparkSpec {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  private def exact(dir: String) = {
    val corpus = Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))
    Similarity.bruteForceKnn(corpus, corpus.filter(col("vec_id") < 10), k = 5)
  }

  private def assertSame(name: String, dir: String,
                         approx: org.apache.spark.sql.DataFrame): Unit = {
    val want = exact(dir).collect().map(_.toSeq).toSet
    val got = approx.collect().map(_.toSeq).toSet
    val missed = want -- got
    val extra = got -- want
    assert(missed.isEmpty && extra.isEmpty,
      s"$name != exact kNN at $dir: missed=${missed.take(3)} extra=${extra.take(3)}")
  }

  test("q20 multi-table LSH ANN equals exact kNN at every harness SF") {
    dirs.foreach(d => assertSame("q20", d, Similarity.knnAnn(spark, d)))
  }

  test("q28 IVF ANN equals exact kNN at every harness SF") {
    dirs.foreach(d => assertSame("q28", d, IvfIndex.ivfKnn(spark, d)))
  }

  test("q21 gated LSH near-dup recall stays 1.0 at every harness SF") {
    dirs.foreach { d =>
      val corpus = Similarity.plantedTwinCorpus(graft.core.Tables.embeddings(spark, d))
      val exactPairs = Similarity.cosineNearDups(corpus, Similarity.GatedThreshold)
        .select("a_id", "b_id").collect().map(_.toSeq).toSet
      val lshPairs = Similarity.lshCosineNearDups(corpus, Similarity.GatedThreshold,
        Similarity.GatedTables, Similarity.GatedBits)
        .select("a_id", "b_id").collect().map(_.toSeq).toSet
      assert(exactPairs == lshPairs,
        s"q21 recall broke at $d: missed=${(exactPairs -- lshPairs).take(3)} " +
          s"extra=${(lshPairs -- exactPairs).take(3)}")
    }
  }
}
