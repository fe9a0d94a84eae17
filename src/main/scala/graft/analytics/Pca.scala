package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed covariance + PCA over an embedding column — the dimension-
  * reduction / whitening pass a training-data pipeline runs before
  * clustering or ANN indexing (SemDeDup-style pipelines PCA-reduce before
  * k-means; whitening is the standard conditioner for IVF/PQ codebooks).
  *
  * Scale shape: the ONLY corpus-sized work is one scan that explodes each
  * vector into its d(d+1)/2 upper-triangle component products and
  * hash-aggregates integer sufficient statistics — map-side combine
  * collapses every partition to ≤ d(d+1)/2 rows, so the shuffle is
  * partitions × 2080 rows (d=64), independent of corpus size. The d×d
  * matrix itself (KBs) is collected; eigenvectors come from driver-side
  * power iteration on that tiny matrix — never from corpus-sized math.
  *
  * Oracle design (q118): float sums are order-dependent across partitions,
  * so the GATED output is integer sufficient statistics: each product is
  * rounded once to nano units (`round(x_i·x_j·1e9)` — the shared
  * half-away-from-zero round, the q44 discipline) and summed as BIGINT,
  * which is exact and associative in any engine. Σx·Σy stays UNMULTIPLIED
  * (their product would overflow BIGINT into DuckDB's HUGEINT — the r7
  * hash-mismatch class); the double-precision covariance assembly happens
  * in [[covarianceMatrix]], off the hash-gated surface.
  *
  * Reference behavior anchor: no PCA in qms_datawarehouse (pandas
  * pipelines stop at scalar aggregation, app/reports.py) — this is part
  * of the beyond-reference embedding surface (SURVEY §2 addendum).
  */
object Pca {

  /** Upper-triangle integer sufficient statistics per dimension pair:
    * (i, j, n, s_x_nano, s_y_nano, s_xy_nano) with i ≤ j. Everything
    * downstream of one scan is exact integer arithmetic.
    */
  def covarianceStats(emb: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    // One explode to (i, x_i·1e9-rounded, raw x_i), then a self-pair over
    // the SAME row's positions via a second explode of the suffix — the
    // upper triangle only, built from column expressions so the whole
    // thing stays in one WholeStageCodegen span up to the aggregation.
    // Parallelism floor (core.Spread): the ×d(d+1)/2 pair explode makes
    // per-row cost — not bytes — the job; a single-small-file corpus
    // would otherwise run all ~n·2080 products on one task.
    val pairs = graft.core.Spread.ifNarrow(emb.select(v.as("v")), 8L << 10)
      .select(posexplode(col("v")).as(Seq("i", "x")), col("v"))
      .select(col("i"), col("x"),
        posexplode(slice(col("v"), col("i") + 1, size(col("v")))).as(Seq("dj", "y")))
      .select(col("i"), (col("i") + col("dj")).as("j"), col("x"), col("y"))
    pairs
      .groupBy("i", "j")
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("x") * 1e9).cast("long")).as("s_x_nano"),
        sum(round(col("y") * 1e9).cast("long")).as("s_y_nano"),
        sum(round(col("x") * col("y") * 1e9).cast("long")).as("s_xy_nano"))
  }

  /** Dense covariance matrix (double) assembled from the integer stats —
    * cov(i,j) = s_xy/n − (s_x/n)(s_y/n), nano units undone here, AFTER
    * the exact aggregation.
    */
  def covarianceMatrix(emb: DataFrame, vecCol: String = "embedding"): Array[Array[Double]] = {
    val rows = covarianceStats(emb, vecCol).collect()
    val d = rows.map(_.getInt(1)).max + 1
    val m = Array.fill(d, d)(0.0)
    rows.foreach { r =>
      val (i, j, n) = (r.getInt(0), r.getInt(1), r.getLong(2).toDouble)
      val sx = r.getLong(3) / 1e9; val sy = r.getLong(4) / 1e9
      val sxy = r.getLong(5) / 1e9
      val c = sxy / n - (sx / n) * (sy / n)
      m(i)(j) = c; m(j)(i) = c
    }
    m
  }

  // Allocation-free inner products for the driver-side power iteration.
  // Accumulation order is identical to the zip/map/sum originals (left-to-
  // right over index order), so every float result is bit-identical — only
  // the ~50M tuple-boxing allocations per q154 call go away (guide §5:
  // driver work off the measured path).
  private def dotArr(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var k = 0
    while (k < a.length) { s += a(k) * b(k); k += 1 }
    s
  }
  private def matvec(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val d = v.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) { out(i) = dotArr(m(i), v); i += 1 }
    out
  }

  /** Top eigenpair by power iteration on the collected d×d matrix —
    * deterministic (fixed start e_0 + index-order arithmetic), driver-side
    * only, O(d²·iters) on KBs of data.
    */
  def principalComponent(cov: Array[Array[Double]], iters: Int = 200): (Double, Array[Double]) = {
    val d = cov.length
    var v = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    (0 until iters).foreach { _ =>
      val w = matvec(cov, v)
      val norm = math.sqrt(dotArr(w, w))
      v = if (norm > 0) w.map(_ / norm) else v
    }
    val lambda = dotArr(v, matvec(cov, v))
    (lambda, v)
  }

  /** Project vectors onto a fixed (broadcast-literal) direction — the
    * per-row map that materializes the reduced representation.
    */
  def project(emb: DataFrame, direction: Seq[Double],
              vecCol: String = "embedding"): DataFrame =
    emb.withColumn("pc1",
      graft.functions.dotProduct(col(vecCol).cast("array<double>"), typedlit(direction)))

  /** Top-r eigenpairs by DEFLATED power iteration, driver-side on the
    * collected d×d matrix — the projection basis LLM pipelines actually
    * reduce onto (SemDeDup PCA-reduces before clustering; whitening uses
    * the same basis). After each component the matrix is deflated
    * (C ← C − λ·vvᵀ) and every iterate is re-orthogonalized against the
    * found basis (classic Hotelling deflation + Gram–Schmidt guard
    * against float drift), so the basis comes out orthonormal even under
    * near-degenerate eigenvalues. Deterministic: fixed dense start
    * vector, index-order arithmetic, O(r·d²·iters) on KBs — the corpus
    * never participates beyond the one sufficient-stats scan.
    */
  def principalComponents(cov0: Array[Array[Double]], r: Int,
                          iters: Int = 3000): Seq[(Double, Array[Double])] = {
    val d = cov0.length
    val cov = cov0.map(_.clone())
    val found = scala.collection.mutable.ArrayBuffer[(Double, Array[Double])]()
    (0 until math.min(r, d)).foreach { _ =>
      // Dense deterministic start (a basis-aligned start can be exactly
      // orthogonal to the dominant eigenvector; this never is for PSD
      // covariance bases arising from real data).
      var v = Array.tabulate(d)(i => 1.0 / math.sqrt(d.toDouble) + 1e-3 * (i + 1))
      def orthogonalize(w: Array[Double]): Array[Double] = {
        found.foreach { case (_, u) =>
          val dot = dotArr(w, u)
          var i = 0
          while (i < w.length) { w(i) -= dot * u(i); i += 1 }
        }
        w
      }
      def normalize(w: Array[Double]): Array[Double] = {
        val n = math.sqrt(dotArr(w, w))
        if (n > 0) w.map(_ / n) else w
      }
      v = normalize(orthogonalize(v))
      (0 until iters).foreach { _ =>
        v = normalize(orthogonalize(matvec(cov, v)))
      }
      val lambda = dotArr(v, matvec(cov, v))
      found += ((lambda, v))
      // Hotelling deflation on the working copy.
      var di = 0
      while (di < d) {
        val row = cov(di); val lvi = lambda * v(di); var dj = 0
        while (dj < d) { row(dj) -= lvi * v(dj); dj += 1 }
        di += 1
      }
    }
    found.toSeq
  }

  /** Project vectors onto an orthonormal basis: one `pc_<r>` column per
    * direction, each a fused literal dot product — r multiply-adds per
    * row per component, whole-stage-codegen friendly, no shuffle.
    */
  def projectBasis(emb: DataFrame, basis: Seq[Seq[Double]],
                   vecCol: String = "embedding"): DataFrame =
    basis.zipWithIndex.foldLeft(emb) { case (df, (dir, i)) =>
      df.withColumn(s"pc_${i + 1}",
        graft.functions.dotProduct(col(vecCol).cast("array<double>"), typedlit(dir)))
    }

  // ---------------------------------------------------------------- q118
  /** Gated q118: the exact integer covariance sufficient statistics of
    * the embeddings corpus, all 2,080 upper-triangle dimension pairs.
    * DuckDB rebuilds the identical one-scan aggregation, so the gate is
    * bit-exact BIGINT equality — no float sum ever crosses engines.
    */
  def covarianceProfile(spark: SparkSession, dir: String): DataFrame =
    covarianceStats(graft.core.Tables.embeddings(spark, dir))

  private val covarianceSql =
    """WITH v AS (
      |  SELECT embedding::DOUBLE[] AS v FROM embeddings
      |), px AS (
      |  SELECT v, i.i AS i, v[i.i + 1] AS x
      |  FROM v, (SELECT unnest(range(0, 64)) AS i) i
      |  WHERE i.i < len(v)
      |)
      |SELECT CAST(px.i AS INTEGER) AS i, CAST(j.j AS INTEGER) AS j,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(px.x * 1e9) AS BIGINT)) AS BIGINT) AS s_x_nano,
      |  CAST(sum(CAST(round(px.v[j.j + 1] * 1e9) AS BIGINT)) AS BIGINT) AS s_y_nano,
      |  CAST(sum(CAST(round(px.x * px.v[j.j + 1] * 1e9) AS BIGINT)) AS BIGINT) AS s_xy_nano
      |FROM px, (SELECT unnest(range(0, 64)) AS j) j
      |WHERE j.j >= px.i AND j.j < len(px.v)
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q154
  /** Gated q154: top-4 PCA of the embeddings corpus. The q118 gate
    * already proves the covariance input bit-exactly; this gate proves
    * the DECOMPOSITION and the PROJECTION on top of it, the q72/q70
    * boolean-invariant pattern (the oracle cannot run power iteration,
    * so it pins the exact columns it can — component index, corpus n —
    * and all-TRUE booleans that Spark must earn):
    *
    *  - `unit_norm_ok` / `orthogonal_ok`: the basis is orthonormal
    *    (driver-checked against the found components);
    *  - `eigen_residual_ok`: ‖C·v − λ·v‖ ≤ 1e-6·max(λ₁, 1) — the
    *    defining eigenpair property on the exact-integer-assembled C;
    *  - `order_ok` / `nonneg_ok`: eigenvalues sorted and PSD-consistent;
    *  - `variance_match_ok`: the CORPUS-recomputed population variance
    *    of each projection (one distributed agg over the real rows —
    *    this is what ties the basis back to the data, not just to the
    *    collected matrix) agrees with λ within 1e-6·max(λ₁, 1) — the
    *    nano-rounding of the sufficient statistics bounds the gap at
    *    ~3e-8 for unit directions, two orders under the tolerance.
    */
  def pcaTopR(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.core.Tables.embeddings(spark, dir)
    val cov = covarianceMatrix(emb)
    // 3000 iterations: the embeddings spectrum is nearly flat
    // (lambda2/lambda1 ~ 0.98), and power iteration converges as that
    // ratio^t — 300 iters leaves 1e-5-scale residuals and can even
    // mis-order near-ties; 3000 reaches machine precision (measured at
    // every harness SF) for ~50M driver flops.
    val comps = principalComponents(cov, r = 4)
    val d = cov.length
    val lambda1 = math.max(comps.head._1, 1.0)
    val tol = 1e-6 * lambda1
    def residual(lambda: Double, v: Array[Double]): Double = {
      val cv = Array.tabulate(d)(i => cov(i).zip(v).map { case (a, b) => a * b }.sum)
      math.sqrt(cv.zip(v).map { case (c, x) => (c - lambda * x) * (c - lambda * x) }.sum)
    }
    val proj = projectBasis(emb, comps.map(_._2.toSeq))
    val aggs = comps.indices.flatMap(i => Seq(
      avg(col(s"pc_${i + 1}")).as(s"m_${i + 1}"),
      avg(col(s"pc_${i + 1}") * col(s"pc_${i + 1}")).as(s"m2_${i + 1}")))
    val one = proj.agg(count(lit(1)).as("n"), aggs: _*)
    val rows = comps.zipWithIndex.map { case ((lambda, v), i) =>
      val r = i + 1
      val unitOk = math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9
      val orthoOk = comps.take(i).forall { case (_, u) =>
        math.abs(u.zip(v).map { case (a, b) => a * b }.sum) < 1e-6 }
      val orderOk = i == 0 || lambda <= comps(i - 1)._1 * (1 + 1e-9)
      val corpusVar = col(s"m2_$r") - col(s"m_$r") * col(s"m_$r")
      struct(
        lit(r).as("component"),
        col("n").as("n"),
        lit(unitOk).as("unit_norm_ok"),
        lit(orthoOk).as("orthogonal_ok"),
        lit(residual(lambda, v) <= tol).as("eigen_residual_ok"),
        lit(orderOk).as("order_ok"),
        lit(lambda >= -tol).as("nonneg_ok"),
        (abs(corpusVar - lit(lambda)) <= lit(tol)).as("variance_match_ok"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  private val pcaTopRSql =
    """SELECT CAST(r AS INTEGER) AS component,
      |  (SELECT count(*) FROM embeddings) AS n,
      |  TRUE AS unit_norm_ok, TRUE AS orthogonal_ok,
      |  TRUE AS eigen_residual_ok, TRUE AS order_ok,
      |  TRUE AS nonneg_ok, TRUE AS variance_match_ok
      |FROM (SELECT unnest(range(1, 5)) AS r)""".stripMargin

  val queries: Seq[graft.NamedQuery] = Seq(
    graft.NamedQuery("q118_embedding_covariance", covarianceProfile _, Some(covarianceSql)),
    graft.NamedQuery("q154_pca_topr", pcaTopR _, Some(pcaTopRSql)))
}
