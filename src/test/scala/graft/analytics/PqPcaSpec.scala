package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit gates for the round-8 embedding operators: PQ codes/codebooks
  * (q117's machinery below the planted-oracle gate) and the covariance +
  * power-iteration PCA path (q118's machinery past the gated sufficient
  * statistics).
  */
class PqPcaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.core.Tables.embeddings(spark, dir)

  test("PQ encode emits m codes per vector, all within the codebook") {
    val model = PqIndex.train(emb, m = 8, ksub = 16, iters = 1)
    assert(model.books.length == 8 && model.books.forall(_.length == 16))
    assert(model.books.flatten.forall(_.length == model.dsub))
    val codes = PqIndex.encode(emb, model).select("codes").collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val cs = r.getSeq[Int](0)
      assert(cs.length == 8, s"expected 8 codes, got ${cs.length}")
      assert(cs.forall(c => c >= 0 && c < 16), s"code out of range: $cs")
    }
  }

  test("PQ training strictly reduces quantization error vs the init codebook") {
    // Lloyd iterations can only decrease the summed residual; measuring it
    // through the public encode() path also pins the argmin/codebook pairing.
    def sse(model: PqIndex.Model): Double =
      PqIndex.encode(emb, model).select(col("codes"),
        col("embedding").cast("array<double>").as("v")).collect().map { r =>
        val codes = r.getSeq[Int](0); val v = r.getSeq[Double](1)
        codes.zipWithIndex.map { case (c, s) =>
          val cent = model.books(s)(c)
          v.slice(s * model.dsub, (s + 1) * model.dsub).zip(cent)
            .map { case (a, b) => (a - b) * (a - b) }.sum
        }.sum
      }.sum
    val init = PqIndex.train(emb, m = 8, ksub = 16, iters = 0)
    val trained = PqIndex.train(emb, m = 8, ksub = 16, iters = 2)
    assert(sse(trained) < sse(init),
      s"Lloyd iterations did not reduce SSE: ${sse(trained)} vs ${sse(init)}")
  }

  test("ADC re-rank is exact once the shortlist covers the corpus") {
    // With shortlist ≥ corpus the ADC order can't drop anyone — the
    // result must EQUAL brute force bit-for-bit. This pins the LUT/code
    // plumbing and the exact re-rank independent of quantization quality.
    val model = PqIndex.train(emb, m = 8, ksub = 16, iters = 2)
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 5)
    val got = PqIndex.searchAdc(PqIndex.encode(emb, model), queries, model,
      k = 3, shortlist = n).collect().map(_.toSeq).toSet
    val want = Similarity.bruteForceKnn(emb, queries, k = 3)
      .collect().map(_.toSeq).toSet
    assert(got == want, s"missed=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("ADC pruning keeps high recall on the NATURAL near-tie corpus") {
    // The natural corpus has cosine near-ties (gaps ~0.01, below the m=8
    // ksub=16 quantization noise) — exactly where PQ is allowed to miss.
    // The contract worth pinning is that a 60-of-500 shortlist still
    // recovers the large majority of true top-3 rows; the planted-margin
    // EXACTNESS gate lives in AnnExactnessSpec/q117, where a margin
    // exists for ADC to preserve.
    val model = PqIndex.train(emb, m = 8, ksub = 16, iters = 2)
    val queries = emb.filter(col("vec_id") < 5)
    val got = PqIndex.searchAdc(PqIndex.encode(emb, model), queries, model,
      k = 3, shortlist = 60)
      .select("query_id", "neighbor_id").collect().map(_.toSeq).toSet
    val want = Similarity.bruteForceKnn(emb, queries, k = 3)
      .select("query_id", "neighbor_id").collect().map(_.toSeq).toSet
    val recall = (want & got).size.toDouble / want.size
    assert(recall >= 0.7, s"ADC recall@3 fell to $recall (want ≥ 0.7 of ${want.size})")
  }

  test("covariance matrix is symmetric with nonnegative diagonal") {
    val m = Pca.covarianceMatrix(emb)
    assert(m.length == 64 && m.forall(_.length == 64))
    for (i <- m.indices) {
      assert(m(i)(i) >= -1e-12, s"negative variance at $i: ${m(i)(i)}")
      for (j <- i + 1 until m.length)
        assert(math.abs(m(i)(j) - m(j)(i)) < 1e-12, s"asymmetry at ($i,$j)")
    }
  }

  test("power iteration finds the dominant eigenpair") {
    val cov = Pca.covarianceMatrix(emb)
    val (lambda, v) = Pca.principalComponent(cov)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9, s"eigvec not unit: $norm")
    // Residual ‖Av − λv‖ small ⇒ (λ, v) is an actual eigenpair.
    val av = cov.map(_.zip(v).map { case (a, b) => a * b }.sum)
    val resid = math.sqrt(av.zip(v).map { case (a, b) => (a - lambda * b) * (a - lambda * b) }.sum)
    assert(resid < 1e-6 * math.max(1.0, math.abs(lambda)), s"residual $resid for λ=$lambda")
    // Dominance: λ must be ≥ the variance along every coordinate axis.
    for (i <- cov.indices)
      assert(lambda >= cov(i)(i) - 1e-9, s"λ=$lambda < var[$i]=${cov(i)(i)}")
  }

  test("projection variance onto PC1 equals the eigenvalue") {
    val cov = Pca.covarianceMatrix(emb)
    val (lambda, v) = Pca.principalComponent(cov)
    val scores = Pca.project(emb, v.toSeq).select("pc1").collect().map(_.getDouble(0))
    val n = scores.length.toDouble
    val mean = scores.sum / n
    val varp = scores.map(x => (x - mean) * (x - mean)).sum / n
    // Equality up to the nano-rounding of the gated sufficient statistics.
    assert(math.abs(varp - lambda) < 1e-4 * math.max(1.0, lambda),
      s"projected variance $varp vs λ $lambda")
  }

  test("deflated top-r basis is orthonormal with sorted true eigenpairs") {
    val cov = Pca.covarianceMatrix(emb)
    val comps = Pca.principalComponents(cov, r = 4)
    assert(comps.length == 4)
    // Orthonormality across the whole basis.
    for (i <- comps.indices; j <- i until comps.length) {
      val dot = comps(i)._2.zip(comps(j)._2).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"basis dot($i,$j)=$dot")
    }
    // Each pair solves the eigen equation on the UNDEFLATED matrix and
    // the eigenvalues come out sorted (the embeddings spectrum is nearly
    // flat — λ₂/λ₁ ≈ 0.98 — which is exactly the regime deflation +
    // re-orthogonalization must survive).
    val l1 = math.max(comps.head._1, 1.0)
    comps.zipWithIndex.foreach { case ((l, v), i) =>
      val av = cov.map(_.zip(v).map { case (a, b) => a * b }.sum)
      val resid = math.sqrt(
        av.zip(v).map { case (a, b) => (a - l * b) * (a - l * b) }.sum)
      assert(resid < 1e-6 * l1, s"component ${i + 1} residual $resid")
      if (i > 0) assert(l <= comps(i - 1)._1 + 1e-12, s"unsorted at ${i + 1}")
      assert(l >= -1e-12, s"negative eigenvalue $l")
    }
    // First component agrees with the single-pair path.
    val (lambda1, _) = Pca.principalComponent(cov)
    assert(math.abs(comps.head._1 - lambda1) < 1e-9 * math.max(1.0, lambda1))
  }

  test("projectBasis adds one exact literal-dot column per component") {
    val cov = Pca.covarianceMatrix(emb)
    val comps = Pca.principalComponents(cov, r = 2)
    val out = Pca.projectBasis(emb, comps.map(_._2.toSeq))
    assert(out.columns.contains("pc_1") && out.columns.contains("pc_2"))
    val r = out.select("embedding", "pc_1").head()
    val vec = r.getSeq[Number](0).map(_.doubleValue())
    val manual = vec.zip(comps.head._2).map { case (a, b) => a * b }.sum
    assert(math.abs(r.getDouble(1) - manual) < 1e-12)
  }

  test("label centroids: exact nano sums and means on hand vectors (q164)") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1.0f, -2.0f)), (0, Seq(3.0f, 4.0f)), (1, Seq(0.5f, 0.25f)))
      .toDF("label", "embedding")
    val rows = Similarity.labelCentroids(df).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("i")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("s_nano"), r.getAs[Long]("mean_nano")))
      .toMap
    assert(rows((0, 0)) == ((2L, 4000000000L, 2000000000L)))
    assert(rows((0, 1)) == ((2L, 2000000000L, 1000000000L)))
    assert(rows((1, 0)) == ((1L, 500000000L, 500000000L)))
    assert(rows((1, 1)) == ((1L, 250000000L, 250000000L)))
  }
}
