package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.functions.cosineSimilarity

/** Scalar-quantized (SQ8) ANN — the simplest member of the
  * memory-compression family beside [[PqIndex]] (FAISS's
  * ScalarQuantizer QT_8bit shape): every vector stores as one double
  * `scale` = max|x|/127 plus dim 1-byte codes round(x/scale) ∈
  * [−127, 127] — a 4× float32 / 8× float64 scan-byte cut with NO
  * training at all (per-vector scaling; the q44 quantization kernel,
  * promoted from a fidelity report to an index layout).
  *
  * SEARCH (cosine): the per-vector symmetric scale CANCELS in cosine —
  * cos(q, α·c) = cos(q, c) for α > 0 — so candidates are scored
  * directly against their CODE arrays (no dequantize multiply, no scale
  * read on the scan path); the `shortlist` best per query re-rank with
  * EXACT cosine on the raw vectors, so the answer is exact whenever the
  * true top-k survives the shortlist. Quantization distortion is ≤
  * 1/254 relative per element (q44 measures per-vector cosine fidelity
  * ~0.9999 on the harness corpora) — orders of magnitude inside the
  * planted-margin gate, and the brute-force parity spec (SqIndexSpec)
  * audits exact equality.
  *
  * Where it sits in the family: FLAT scan like [[PqIndex]] (reads every
  * code row — the memory-compression face; the corpus-PRUNED face is
  * [[IvfPq]]), but training-free and with per-element error bounded by
  * construction rather than by codebook fit — the right first index
  * when re-encoding cost matters more than the last 4× of compression.
  * Query-side policy is the family's: the query frame broadcasts only
  * under [[IvfIndex.queryBroadcastMaxRows]]; above it the crossJoin is
  * unhinted and AQE picks the strategy.
  *
  * Reference behavior anchor: qms_datawarehouse exposes only exact
  * scans (src/api/routes.py query endpoints); SQ8 is part of the
  * beyond-reference training-data surface (SURVEY §2 addendum).
  */
object SqIndex {

  /** Attach (scale, codes): per-vector symmetric int8 — `codes` is
    * array<tinyint> (the 1-byte element claim is the layout), `scale`
    * the one double that reconstructs magnitudes. An all-zero vector
    * gets scale 0 and all-zero codes (the q44 edge rule); its cosine is
    * undefined everywhere in the family, and [[scoredShortlist]] ranks
    * it last rather than NaN-poisoning a window.
    */
  def encode(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.withColumn("scale", array_max(transform(v, x => abs(x))) / lit(127.0))
      .withColumn("codes",
        when(col("scale") > 0,
          transform(v, x => round(x / col("scale"))).cast("array<tinyint>"))
          .otherwise(transform(v, x => lit(0.0)).cast("array<tinyint>")))
  }

  /** ANN top-k over an [[encode]]d corpus: approximate-cosine shortlist
    * on the code arrays, exact re-rank on the raw vectors.
    */
  def searchSq(encoded: DataFrame, queries: DataFrame, k: Int,
               shortlist: Int = 50, idCol: String = "vec_id",
               vecCol: String = "embedding",
               excludeSelf: Boolean = true): DataFrame =
    Similarity.topK(
      scoredShortlist(encoded, queries, shortlist, idCol, vecCol, excludeSelf),
      k, idCol)

  /** The exactly-re-ranked shortlist of [[searchSq]] BEFORE the final
    * top-k window — the family's shared kernel
    * ([[Similarity.rerankShortlist]]) over a full crossJoin scan (the
    * FLAT face). One bounded sizing probe picks the query-side broadcast
    * ([[IvfIndex.boundedCount]] against the family gate). Approximate
    * score straight on the CODES (the per-vector scale cancels in
    * cosine); scale-0 rows (zero vectors) rank last on BOTH passes
    * instead of emitting a NaN that would sort first.
    */
  private[graft] def scoredShortlist(encoded: DataFrame, queries: DataFrame,
      shortlist: Int, idCol: String, vecCol: String,
      excludeSelf: Boolean): DataFrame = {
    val qb = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val qSmall =
      IvfIndex.boundedCount(qb, IvfIndex.queryBroadcastMaxRows).isDefined
    Similarity.rerankShortlist(
      encoded.crossJoin(if (qSmall) broadcast(qb) else qb),
      approx = codeCosine, approxAsc = false, exactGuard = col("scale") > 0,
      shortlist = shortlist, idCol = idCol, vecCol = vecCol,
      excludeSelf = excludeSelf)
  }

  /** Guarded approximate cosine on the int8 code arrays — shared by the
    * flat and IVF faces (and [[graft.warehouse.SqState]]).
    */
  private[graft] def codeCosine: org.apache.spark.sql.Column =
    when(col("scale") > 0,
      cosineSimilarity(col("q_vec"), col("codes").cast("array<double>")))
      .otherwise(lit(-2.0))

  // ------------------------------------------------------------ IVF-SQ8

  /** Cell-partitioned SQ8 scan table: (idCol, vecCol, cell, scale,
    * codes) — [[IvfIndex]]'s pruning × SQ8's compression, the
    * training-light sibling of [[IvfPq.index]] (coarse Lloyd is the
    * ONLY training; codes are per-vector, so re-encoding never depends
    * on the cell geometry — a recluster moves rows between cells
    * without touching their codes, unlike PQ residuals).
    */
  def indexIvf(corpus: DataFrame, coarse: IvfIndex.Model,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    encode(IvfIndex.index(corpus.select(col(idCol), col(vecCol)), coarse, vecCol), vecCol)

  /** ANN top-k over an [[indexIvf]] table: nprobe coarse probe (the
    * k-dispatched assign on the query frame), cell equi-join against
    * the probed lists, approximate cosine on the CODE arrays,
    * `shortlist` exact re-rank — a query touches nprobe/kCells of the
    * corpus AND reads 1-byte elements inside the probed cells.
    */
  def searchIvf(indexed: DataFrame, queries: DataFrame,
                coarse: IvfIndex.Model, k: Int, nprobe: Int = 2,
                shortlist: Int = 50, idCol: String = "vec_id",
                vecCol: String = "embedding",
                excludeSelf: Boolean = true): DataFrame = {
    val qb = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val qSmall = IvfIndex.boundedCount(qb,
      IvfIndex.queryBroadcastMaxRows / math.max(nprobe, 1)).isDefined
    val q = IvfIndex.withNearestCells(qb, "q_vec", coarse, nprobe, "__cells")
      .withColumn("cell", explode(col("__cells").getField("cell")))
      .drop("__cells")
    Similarity.topK(
      Similarity.rerankShortlist(
        indexed.join(if (qSmall) broadcast(q) else q, Seq("cell")), // probed cells ONLY
        approx = codeCosine, approxAsc = false,
        exactGuard = col("scale") > 0, shortlist = shortlist,
        idCol = idCol, vecCol = vecCol, excludeSelf = excludeSelf),
      k, idCol)
  }

  /** Metadata-FILTERED ANN top-k — q209's retrieval-with-constraints
    * shape ("top-k among documents where tenant/label = X") composed
    * with the IVF-SQ8 scan: the filter column is an ADDITIONAL JOIN KEY
    * beside the probed cell, so the stratum restriction applies BEFORE
    * the shortlist window — k is exact per stratum by construction
    * (post-filtering a global ANN top-k under-fills k; this never
    * does), and a query's work is (stratum ∩ probed cells), never the
    * corpus. At warehouse scale the filter column rides the partition
    * layout beside `cell` and prunes at the scan.
    */
  def searchIvfFiltered(indexed: DataFrame, queries: DataFrame,
                        coarse: IvfIndex.Model, k: Int, filterCol: String,
                        nprobe: Int = 2, shortlist: Int = 50,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        excludeSelf: Boolean = true): DataFrame = {
    val qb = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"), col(filterCol))
    val qSmall = IvfIndex.boundedCount(qb,
      IvfIndex.queryBroadcastMaxRows / math.max(nprobe, 1)).isDefined
    val q = IvfIndex.withNearestCells(qb, "q_vec", coarse, nprobe, "__cells")
      .withColumn("cell", explode(col("__cells").getField("cell")))
      .drop("__cells")
    Similarity.topK(
      Similarity.rerankShortlist(
        indexed.join(if (qSmall) broadcast(q) else q,
          Seq("cell", filterCol)), // probed cells ∩ the query's stratum
        approx = codeCosine, approxAsc = false,
        exactGuard = col("scale") > 0, shortlist = shortlist,
        idCol = idCol, vecCol = vecCol, excludeSelf = excludeSelf),
      k, idCol)
  }

  // --------------------------------------------------------------- q265
  /** SQ8 ANN top-5 over the planted-margin corpus (per-vector int8,
    * shortlist 50, exact re-rank) — the q117 shape with scalar codes
    * instead of product codes. The planted twins sit at cosine ≥ 0.992
    * vs a natural max ≈ 0.48 while SQ8's cosine distortion is ~1e-4, so
    * the true top-5 always survives the shortlist and the exact re-rank
    * emits exactly the brute-force answer — hash-checked against the
    * shared exact-kNN oracle ([[Similarity.plantedKnnSql]]) and
    * brute-parity-audited by SqIndexSpec.
    */
  def sqKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))
    searchSq(encode(corpus), corpus.filter(col("vec_id") < 10),
      k = 5, shortlist = 50)
  }

  // --------------------------------------------------------------- q266
  /** IVF-SQ8 ANN top-5 over the planted-margin corpus — the q28 coarse
    * shape (16 cells, nprobe=4) times the q265 code shape (per-vector
    * int8, shortlist 50). The planted margin dwarfs both the probe risk
    * and the ~1e-4 SQ8 cosine distortion, so the composite answer IS
    * the exact top-5 — hash-checked against the shared exact-kNN
    * oracle.
    */
  def ivfSqKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))
    val coarse = IvfIndex.train(corpus, k = 16, iters = 2)
    searchIvf(indexIvf(corpus, coarse), corpus.filter(col("vec_id") < 10),
      coarse, k = 5, nprobe = 4, shortlist = 50)
  }

  // --------------------------------------------------------------- q272
  /** Filtered IVF-SQ8 top-5 within each query's own label stratum over
    * the planted corpus — labels derive deterministically from the id
    * (base: vec_id % 3; twins inherit their SOURCE's label, so every
    * query's 5 planted twins are in-stratum and still dominate the
    * natural max). The DuckDB oracle rebuilds the same labeled corpus
    * and ranks within the stratum exactly.
    */
  def ivfSqKnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))
      .withColumn("label",
        when(col("vec_id") < 100000L, col("vec_id") % 3)
          .otherwise(((col("vec_id") - 100000L) / 10).cast("long") % 3))
    val coarse = IvfIndex.train(corpus, k = 16, iters = 2)
    val indexed = encode(
      IvfIndex.index(corpus.select(col("vec_id"), col("embedding"), col("label")),
        coarse, "embedding"))
    searchIvfFiltered(indexed, corpus.filter(col("vec_id") < 10), coarse,
      k = 5, filterCol = "label", nprobe = 4, shortlist = 50)
  }

  private[graft] val plantedFilteredKnnSql =
    """WITH base AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
      |), corpus AS (
      |  SELECT vec_id, embedding, vec_id % 3 AS label FROM base
      |  UNION ALL
      |  SELECT 100000 + b.vec_id * 10 + t.t AS vec_id,
      |         list_transform(b.embedding,
      |           (x, i) -> x + ((b.vec_id * 31 + t.t * 7 + i - 1) % 97 - 48) / 2000.0) AS embedding,
      |         b.vec_id % 3 AS label
      |  FROM base b, (SELECT unnest(range(0, 5)) AS t) t
      |  WHERE b.vec_id < 10
      |)
      |SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  row_number() OVER (PARTITION BY q.vec_id
      |                     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank,
      |  round(list_cosine_similarity(q.embedding, c.embedding), 4) AS score_r
      |FROM corpus q JOIN corpus c ON c.label = q.label AND c.vec_id <> q.vec_id
      |WHERE q.vec_id < 10
      |QUALIFY rank <= 5""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q265_knn_sq8", sqKnn _, Some(Similarity.plantedKnnSql)),
    NamedQuery("q266_knn_ivfsq8", ivfSqKnn _, Some(Similarity.plantedKnnSql)),
    NamedQuery("q272_knn_ivfsq_filtered", ivfSqKnnFiltered _,
      Some(plantedFilteredKnnSql)))
}
