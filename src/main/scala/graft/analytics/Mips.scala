package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.functions.dotProduct

/** Maximum inner-product search (MIPS) — the retrieval measure of
  * recommender/two-tower serving, where the score is `u·q` and a
  * LONGER vector legitimately outranks a nearer-angle one (cosine ANN
  * is the wrong operator there by construction). Two faces:
  *
  *   - [[bruteMips]] — the exact flat scan: broadcast-gated crossJoin +
  *     one fused dot per pair (q19's shape with the measure swapped).
  *   - [[mipsIvfSq]] — the scale path via the NORM-AUGMENTATION
  *     reduction (Bachrach et al., RecSys 2014; the order-preserving
  *     transform behind every MIPS-on-cosine-index system): corpus
  *     u → [u ; √(M² − ‖u‖²)] with M = max corpus norm, query
  *     q → [q ; 0]. Every augmented corpus vector has norm exactly M,
  *     so cos(û, q̂) = (u·q)/(M·‖q‖) — per query a POSITIVE MONOTONE
  *     map of the inner product — and any exact-on-margin cosine ANN
  *     over the augmented corpus returns the exact MIPS ranking. Here
  *     the cosine machinery is the IVF-SQ8 composite (coarse cells
  *     over augmented vectors, int8 codes, probed-cells-only scan) and
  *     the family kernel re-ranks the shortlist by the RAW inner
  *     product — so emitted scores are true dots, not reduction
  *     cosines.
  *
  * 100 TB shape: identical to the IVF-SQ8 face it rides — the
  * augmentation adds ONE coordinate (dim+1), the corpus is encoded
  * once, and a query touches nprobe/kCells of the cells reading 1-byte
  * elements; M is one distributed agg at index-build time.
  *
  * THE M-PROBLEM AND THE INCREMENTAL FACE (r18 design decision): in a
  * growing corpus M is not stable — one louder batch raises it and
  * invalidates every stored augmented vector, so "encode the augmented
  * vector once at ingest" is unsound by construction. The state face
  * ([[graft.warehouse.MipsState]]) therefore stores RAW vectors + RAW
  * SQ8 codes (both M-free, encode-once-safe) and moves ALL M-dependent
  * work to the recluster boundary, where M is recomputed and the
  * augmentation is a transient train/assign column — sound because the
  * query's augmented coordinate is 0, which makes both the probe
  * (against stored centroids) and the shortlist rank (scale·(q·codes),
  * the augmented cosine's numerator) independent of any stored M. This
  * batch object keeps the build-time-M form: it constructs index and
  * answer in one call, so staleness cannot arise here.
  *
  * Reference behavior anchor: qms_datawarehouse exposes only exact
  * scans (src/api/routes.py); MIPS is part of the beyond-reference
  * training-data surface (SURVEY §2 addendum).
  */
object Mips {

  /** Exact MIPS top-k: score every (query, candidate) pair by the fused
    * dot kernel. Query-side broadcast under the family gate; a zero
    * vector dots to 0 (no NaN guard needed — the cosine family's edge
    * does not exist here).
    */
  def bruteMips(corpus: DataFrame, queries: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding",
                excludeSelf: Boolean = true): DataFrame = {
    val qb = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val qSmall =
      IvfIndex.boundedCount(qb, IvfIndex.queryBroadcastMaxRows).isDefined
    val scored = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
      .crossJoin(if (qSmall) broadcast(qb) else qb)
      .filter(if (excludeSelf) col(idCol) =!= col("query_id") else lit(true))
      .withColumn("score", dotProduct(col("q_vec"), col(vecCol)))
    Similarity.topK(scored, k, idCol)
  }

  /** The augmentation bound M = max corpus norm — ONE distributed agg
    * (a driver double, never corpus-sized). A tiny relative headroom
    * keeps the √(M²−‖u‖²) argument nonnegative under float noise.
    */
  private def maxNorm(corpus: DataFrame, vecCol: String): Double = {
    val m2 = corpus
      .agg(max(dotProduct(col(vecCol).cast("array<double>"),
        col(vecCol).cast("array<double>"))))
      .head().getDouble(0)
    math.sqrt(m2) * (1.0 + 1e-12)
  }

  /** MIPS top-k through the IVF-SQ8 cosine machinery on the augmented
    * corpus: coarse cells + int8 codes are built over
    * [u ; √(M²−‖u‖²)] (norm exactly M ⇒ augmented cosine ≡ inner-
    * product order), the probed-cells-only scan shortlists by
    * approximate augmented cosine, and the kernel re-ranks by the RAW
    * dot on the original vectors — emitted scores are true inner
    * products, hash-comparable with [[bruteMips]]'s.
    */
  def mipsIvfSq(corpus: DataFrame, queries: DataFrame, k: Int,
                kCells: Int = 16, nprobe: Int = 2, shortlist: Int = 50,
                iters: Int = 2, idCol: String = "vec_id",
                vecCol: String = "embedding",
                excludeSelf: Boolean = true): DataFrame = {
    val base = corpus.select(col(idCol),
      col(vecCol).cast("array<double>").as("__orig"))
    val m = maxNorm(base, "__orig")
    val aug = base.withColumn("embedding",
      concat(col("__orig"), array(sqrt(greatest(
        lit(m * m) - dotProduct(col("__orig"), col("__orig")), lit(0.0))))))
    val coarse = IvfIndex.train(aug, kCells, iters, idCol, "embedding")
    // IvfIndex.index keeps every input column, so __orig rides beside
    // the augmented vector into the encoded scan table.
    val indexed = SqIndex.encode(IvfIndex.index(aug, coarse, "embedding"), "embedding")
    val qb = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("__q_orig"))
      .withColumn("q_vec", concat(col("__q_orig"), array(lit(0.0))))
    val qSmall = IvfIndex.boundedCount(qb,
      IvfIndex.queryBroadcastMaxRows / math.max(nprobe, 1)).isDefined
    val q = IvfIndex.withNearestCells(qb, "q_vec", coarse, nprobe, "__cells")
      .withColumn("cell", explode(col("__cells").getField("cell")))
      .drop("__cells")
    Similarity.topK(
      Similarity.rerankShortlist(
        indexed.join(if (qSmall) broadcast(q) else q, Seq("cell")), // probed cells ONLY
        approx = SqIndex.codeCosine, approxAsc = false,
        exactGuard = lit(true), shortlist = shortlist,
        idCol = idCol, vecCol = "__orig", excludeSelf = excludeSelf,
        exact = Some(dotProduct(col("__q_orig"), col("__orig")))),
      k, idCol)
  }

  /** Exact top-5 MIPS over [[Similarity.plantedKnnCorpus]] in DuckDB —
    * the corpus CTE of [[Similarity.plantedKnnSql]] with the measure
    * swapped to `list_dot_product` (MIPS ranks by raw inner product;
    * with the harness norms ≈ but ≠ 1 this is a genuinely different
    * ranking AND different score values than the cosine oracle).
    */
  private[graft] val plantedMipsSql =
    """WITH base AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
      |), corpus AS (
      |  SELECT * FROM base
      |  UNION ALL
      |  SELECT 100000 + b.vec_id * 10 + t.t AS vec_id,
      |         list_transform(b.embedding,
      |           (x, i) -> x + ((b.vec_id * 31 + t.t * 7 + i - 1) % 97 - 48) / 2000.0) AS embedding
      |  FROM base b, (SELECT unnest(range(0, 5)) AS t) t
      |  WHERE b.vec_id < 10
      |)
      |SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  row_number() OVER (PARTITION BY q.vec_id
      |                     ORDER BY list_dot_product(q.embedding, c.embedding) DESC, c.vec_id) AS rank,
      |  round(list_dot_product(q.embedding, c.embedding), 4) AS score_r
      |FROM corpus q JOIN corpus c ON c.vec_id <> q.vec_id
      |WHERE q.vec_id < 10
      |QUALIFY rank <= 5""".stripMargin

  // --------------------------------------------------------------- q270
  /** Exact MIPS top-5 over the planted corpus — the measure-swapped q19
    * shape, hash-checked against the dot-product DuckDB oracle.
    */
  def mipsExact(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))
    bruteMips(corpus, corpus.filter(col("vec_id") < 10), k = 5)
  }

  // --------------------------------------------------------------- q271
  /** MIPS top-5 through the augmented IVF-SQ8 path (16 cells, nprobe 4,
    * shortlist 50) — the reduction + composite must emit EXACTLY the
    * brute answer: the planted margin survives the monotone map (twins
    * dominate every natural dot at the harness norms) and dwarfs both
    * the probe risk and the ~1e-4 SQ8 distortion of the augmented
    * cosine. Same dot-product oracle as q270.
    */
  def mipsAnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))
    mipsIvfSq(corpus, corpus.filter(col("vec_id") < 10), k = 5,
      kCells = 16, nprobe = 4, shortlist = 50)
  }

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q270_mips_exact", mipsExact _, Some(plantedMipsSql)),
    NamedQuery("q271_mips_ivfsq", mipsAnn _, Some(plantedMipsSql)))
}
