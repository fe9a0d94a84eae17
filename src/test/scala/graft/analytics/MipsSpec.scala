package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MIPS ([[Mips]]): exact inner-product top-k and the norm-augmentation
  * reduction onto the IVF-SQ8 cosine machinery. Pins the case where
  * MIPS and cosine genuinely disagree (a longer vector beats a
  * nearer-angle one), the augmentation invariant (‖û‖ = M for every
  * row), reduction equality with approximations removed, and the gated
  * composite's brute parity on the planted corpus.
  */
class MipsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("MIPS picks the longer vector where cosine picks the nearer angle") {
    val c = Seq(
      (0L, Seq(1.0, 0.0)),   // the query
      (1L, Seq(0.9, 0.0)),   // cosine 1.0, dot 0.9
      (2L, Seq(1.5, 1.5)))   // cosine 0.707, dot 1.5
      .toDF("vec_id", "embedding")
    val q = c.filter(col("vec_id") === 0)
    val cosTop = Similarity.bruteForceKnn(c, q, k = 1)
      .select("neighbor_id").head().getLong(0)
    val mipsTop = Mips.bruteMips(c, q, k = 1)
      .select("neighbor_id").head().getLong(0)
    assert(cosTop == 1L, s"cosine fixture check: $cosTop")
    assert(mipsTop == 2L, s"MIPS must rank by inner product: $mipsTop")
    // And the reduction path agrees with brute MIPS on the same fixture.
    val redTop = Mips.mipsIvfSq(c, q, k = 1, kCells = 1, nprobe = 1,
      shortlist = 3).select("neighbor_id").head().getLong(0)
    assert(redTop == 2L, s"augmented reduction must preserve MIPS order: $redTop")
  }

  test("every augmented corpus vector has norm exactly M (the reduction's invariant)") {
    val emb = graft.core.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val m2 = emb.agg(max(graft.functions.dotProduct(col("v"), col("v"))))
      .head().getDouble(0)
    val m = math.sqrt(m2) * (1.0 + 1e-12)
    val aug = emb.withColumn("u",
      concat(col("v"), array(sqrt(greatest(
        lit(m * m) - graft.functions.dotProduct(col("v"), col("v")), lit(0.0))))))
    val bad = aug
      .withColumn("n", sqrt(graft.functions.dotProduct(col("u"), col("u"))))
      .filter(abs(col("n") - lit(m)) > lit(1e-9)).count()
    assert(bad == 0, s"$bad augmented rows off the M-sphere")
  }

  test("reduction equality with approximations removed: nprobe=all + " +
    "corpus-wide shortlist equals brute MIPS on the raw harness corpus") {
    val emb = graft.core.Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 6)
    val got = rows(Mips.mipsIvfSq(emb, queries, k = 4, kCells = 8,
      nprobe = 8, shortlist = 600).orderBy("query_id", "rank"))
    val want = rows(Mips.bruteMips(emb, queries, k = 4)
      .orderBy("query_id", "rank"))
    assert(got == want, "the reduction diverged from brute MIPS with approximations removed")
  }

  test("gated composite shape equals brute MIPS on the planted corpus") {
    val c = Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))
    val queries = c.filter(col("vec_id") < 10)
    val got = rows(Mips.mipsIvfSq(c, queries, k = 5, kCells = 16,
      nprobe = 4, shortlist = 50).orderBy("query_id", "rank"))
    val want = rows(Mips.bruteMips(c, queries, k = 5)
      .orderBy("query_id", "rank"))
    assert(got == want, "gated MIPS composite diverged from brute MIPS")
  }

  test("MIPS scores are genuinely inner products, not cosines in disguise " +
    "(planted-corpus norms vary, so the q270 oracle hash differs from q28's)") {
    // The RAW harness embeddings are unit-norm (measured spread ~2e-7 —
    // there dot ≡ cosine by construction), but the GATED corpus is the
    // planted one, whose twins carry the perturbation's extra norm
    // (~0.6% spread): that spread is what makes the dot-product oracle
    // a different hash than the cosine oracle.
    val c = Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val norms = c.agg(
      min(sqrt(graft.functions.dotProduct(col("embedding"), col("embedding")))),
      max(sqrt(graft.functions.dotProduct(col("embedding"), col("embedding")))))
      .head()
    assert(norms.getDouble(1) - norms.getDouble(0) > 1e-3,
      s"fixture defect: planted corpus is uniformly normed ($norms)")
    val queries = c.filter(col("vec_id") < 10)
    val mips = rows(Mips.bruteMips(c, queries, k = 5)
      .orderBy("query_id", "rank"))
    val cos = rows(Similarity.bruteForceKnn(c, queries, k = 5)
      .orderBy("query_id", "rank"))
    assert(mips != cos,
      "fixture defect: inner-product and cosine top-5 (ranks AND scores) coincide")
  }
}
