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
    val pairs = emb
      .select(v.as("v"))
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

  /** Top eigenpair by power iteration on the collected d×d matrix —
    * deterministic (fixed start e_0 + index-order arithmetic), driver-side
    * only, O(d²·iters) on KBs of data.
    */
  def principalComponent(cov: Array[Array[Double]], iters: Int = 200): (Double, Array[Double]) = {
    val d = cov.length
    var v = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    (0 until iters).foreach { _ =>
      val w = Array.tabulate(d)(i => cov(i).zip(v).map { case (a, b) => a * b }.sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = if (norm > 0) w.map(_ / norm) else v
    }
    val lambda = v.zip(cov.map(_.zip(v).map { case (a, b) => a * b }.sum))
      .map { case (a, b) => a * b }.sum
    (lambda, v)
  }

  /** Project vectors onto a fixed (broadcast-literal) direction — the
    * per-row map that materializes the reduced representation.
    */
  def project(emb: DataFrame, direction: Seq[Double],
              vecCol: String = "embedding"): DataFrame =
    emb.withColumn("pc1",
      graft.functions.dotProduct(col(vecCol).cast("array<double>"), typedlit(direction)))

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

  val queries: Seq[graft.NamedQuery] = Seq(
    graft.NamedQuery("q118_embedding_covariance", covarianceProfile _, Some(covarianceSql)))
}
