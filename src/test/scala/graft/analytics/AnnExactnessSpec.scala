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

  test("q117 PQ-ADC ANN equals exact kNN at every harness SF") {
    dirs.foreach(d => assertSame("q117", d, PqIndex.pqKnn(spark, d)))
  }

  test("q234 incremental IVF state search equals exact kNN at every " +
    "harness SF (bundle + tail, gated shape)") {
    dirs.foreach(d =>
      assertSame("q234", d, graft.warehouse.IvfState.ivfStateKnn(spark, d)))
  }

  test("q236 incremental PQ state search equals exact kNN at every " +
    "harness SF (encoded bundle + raw tail, gated shape)") {
    dirs.foreach(d =>
      assertSame("q236", d, graft.warehouse.PqState.pqStateKnn(spark, d)))
  }

  test("q238 IVF-PQ composite ANN equals exact kNN at every harness SF " +
    "(coarse probe x residual codes, gated shape)") {
    dirs.foreach(d => assertSame("q238", d, IvfPq.ivfPqKnn(spark, d)))
  }

  test("q239 incremental IVF-PQ state search equals exact kNN at every " +
    "harness SF (cell-partitioned encoded bundle + raw tail, gated shape)") {
    dirs.foreach(d =>
      assertSame("q239", d, graft.warehouse.IvfPqState.ivfPqStateKnn(spark, d)))
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

  test("q47 semantic dedup's cell-local pairs equal the exact global pair set") {
    // The q47 oracle computes the GLOBAL quadratic pair set; the operator
    // compares within probed cells. Since r14 this equality is a THEOREM
    // (triangle-inequality ball probing with slack 2·√(2(1−t))), not a
    // fixture property — pre-r14 it held by Voronoi luck and broke at
    // sf0.1's derived k=10 with one twin straddling a boundary. If it
    // ever breaks again, this test names the pair before q47's hash does.
    dirs.foreach { d =>
      val corpus = Similarity.plantedTwinCorpus(graft.core.Tables.embeddings(spark, d))
      val exactPairs = Similarity.cosineNearDups(corpus, Similarity.GatedThreshold)
        .select("a_id", "b_id").collect().map(_.toSeq).toSet
      val cellPairs = Similarity.semanticDedupPairs(corpus, k = 8,
        Similarity.GatedThreshold).collect().map(_.toSeq).toSet
      assert(exactPairs == cellPairs,
        s"q47 cell-locality broke at $d: missed=${(exactPairs -- cellPairs).take(3)} " +
          s"extra=${(cellPairs -- exactPairs).take(3)}")
    }
  }

  test("ball probe finds a twin pair planted ON a Voronoi boundary") {
    import spark.implicits._
    // Two tight clusters around ±e1; the twin pair sits at the midpoint,
    // offset ±ε along e2 — k-means (k=2) splits the pair across cells,
    // so a primary-cell-only scan MUST miss it; the probe must not.
    val cluster = (0 until 20).flatMap { i =>
      Seq((100L + i, Seq(1.0, 0.001 * i, 0.0)),
        (200L + i, Seq(-1.0, 0.001 * i, 0.0)))
    }
    val twins = Seq(
      (1L, Seq(0.0005, 1.0, 0.0)), // cos(pair) ≈ 1 − 5e-7: far above .9
      (2L, Seq(-0.0005, 1.0, 0.0)))
    val emb = (cluster ++ twins).toDF("vec_id", "embedding")
    val pairs = Similarity.semanticDedupPairs(emb, k = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      s"boundary twin missed; found only $pairs")
    val exact = Similarity.cosineNearDups(emb, 0.9)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == exact, s"probe set != exact set: " +
      s"missed=${exact -- pairs} extra=${pairs -- exact}")
  }

  test("semantic dedup keeps the smallest id of a duplicate chain") {
    import spark.implicits._
    // a-b and b-c are dups, a-c is not (chain): b and c both drop, a stays;
    // d is isolated and stays. Vectors are 2-d unit-ish directions.
    val emb = Seq(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.999, 0.0447)),  // cos(1,2) ≈ 0.999
      (3L, Seq(0.992, 0.1247)),  // cos(2,3) ≈ 0.9968, cos(1,3) ≈ 0.992
      (4L, Seq(0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(emb, k = 1, threshold = 0.995)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L))
  }
}
