package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.functions.{cosineSimilarity, hammingDistance, hyperplaneBuckets}

/** Binary sign-code ANN — the 1-BIT member of the memory-compression
  * family (FAISS's IndexLSH → IndexBinaryFlat shape): every vector
  * stores as `nBits` hyperplane sign bits packed into an array<long>
  * (the default 252 bits = 4 longs = 32 bytes/vector, a 16× cut vs the
  * dim-64 float64 row), encoded by the SAME deterministic seeded plane
  * matrix the LSH family hashes with
  * ([[Similarity.hyperplanesFlat]]) — so the codes ARE SimHash
  * signatures, consumed here as a scan index rather than as bucket
  * keys.
  *
  * SEARCH: Hamming distance on the packed codes — one fused XOR +
  * popcount pass per pair ([[graft.functions.hammingDistance]], native
  * codegen) — shortlists candidates (E[hamming] = nBits · θ/π, the
  * Goemans–Williamson sign-agreement law, so Hamming rank ≈ angle
  * rank), then the family kernel re-ranks the `shortlist` best with
  * EXACT cosine on the raw vectors. On the planted-margin corpus the
  * separation is absolute: twins at cosine ≥ 0.992 expect
  * 252·(7.25°/180°) ≈ 10 ± 3.1 flipped bits; the natural max 0.48
  * puts every non-twin at ≥ 86 ± 7.7 — the populations are ~10σ
  * apart, so the true top-5 always survives any shortlist ≥ 5 and the
  * exact re-rank emits exactly the brute-force answer.
  *
  * Where it sits in the family: coarsest quantization (1 bit/plane) /
  * cheapest scan byte — below [[SqIndex]] (8-bit) and [[PqIndex]]
  * (codebook-relative); training-free like SQ8 (the plane matrix is
  * seeded, not learned), so codes never need re-encoding under any
  * maintenance verb. The corpus-PRUNED composite is [[searchIvf]]
  * (coarse cells × bit codes), mirroring [[SqIndex.searchIvf]].
  *
  * Reference behavior anchor: qms_datawarehouse exposes only exact
  * scans (src/api/routes.py); the binary face is part of the
  * beyond-reference training-data surface (SURVEY §2 addendum).
  */
object BitIndex {

  /** Default code width: 4 × 63-bit words from the shared seeded plane
    * stream — wide enough that the planted margin is ~10σ (scaladoc
    * math above), one long-word narrower than a 256-bit layout for the
    * same exactness.
    */
  private[graft] val DefaultTables = 4
  private[graft] val DefaultBits = 63

  /** Attach the packed sign-code column (`codes`: array<long>, length
    * `tables`) — one fused native pass over the plan-literal plane
    * matrix (tables·bits hyperplanes, row-major, seed-deterministic).
    *
    * The plane matrix is seeded PER DIMENSION, so which `dim` this call
    * uses decides which matrix the codes mean. Two modes:
    *
    *   - `dim = Some(d)` (PINNED — the state-ingest and query-side
    *     contract): every row must have length d; a ragged row FAILS
    *     LOUDLY via `raise_error` instead of silently dropping — under
    *     a pinned matrix a mismatch is a caller bug, and a stateful
    *     ingest must never lose rows quietly (r17 ADVICE: per-batch
    *     re-probes could encode different micro-batches under DIFFERENT
    *     matrices yet emit same-length code arrays — valid-looking
    *     Hamming values, silently wrong shortlists).
    *   - `dim = None` (probe — the one-shot batch faces): dimension is
    *     the corpus max length (the [[Similarity]] probeDim rule);
    *     ragged rows code to null and are dropped.
    */
  def encode(df: DataFrame, vecCol: String = "embedding",
             tables: Int = DefaultTables, bits: Int = DefaultBits,
             seed: Long = 42L, dim: Option[Int] = None): DataFrame =
    dim match {
      case Some(d) =>
        require(d > 0, s"BitIndex.encode: pinned dim $d must be positive")
        val v = col(vecCol).cast("array<double>")
        val flat = Similarity.hyperplanesFlat(tables * bits, d, seed)
        df.withColumn("codes",
          when(size(v) === d, hyperplaneBuckets(v, flat, bits, tables))
            .otherwise(raise_error(concat(
              lit("BitIndex.encode: vector length "), size(v).cast("string"),
              lit(s" != pinned dim $d")))))
      case None =>
        val d = df.agg(max(size(col(vecCol)))).collect().headOption
          .flatMap(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
          .filter(_ > 0)
          .getOrElse(sys.error("BitIndex.encode: empty or all-null corpus"))
        val flat = Similarity.hyperplanesFlat(tables * bits, d, seed)
        df.withColumn("codes",
            hyperplaneBuckets(col(vecCol).cast("array<double>"), flat, bits, tables))
          .filter(col("codes").isNotNull)
    }

  /** ANN top-k over an [[encode]]d corpus: Hamming shortlist on the
    * packed codes, exact cosine re-rank — the family kernel with
    * ASCENDING approx order (Hamming is a distance). Query-side
    * broadcast under the family gate; above it AQE owns the crossJoin.
    */
  def searchBit(encoded: DataFrame, queries: DataFrame, k: Int,
                shortlist: Int = 50, idCol: String = "vec_id",
                vecCol: String = "embedding",
                excludeSelf: Boolean = true): DataFrame =
    Similarity.topK(
      scoredShortlist(encoded, queries, shortlist, idCol, vecCol, excludeSelf),
      k, idCol)

  /** The exactly-re-ranked shortlist of [[searchBit]] BEFORE the final
    * top-k window — exposed for a two-source caller (the state-face
    * convention). The query side rides the SAME encode (same plane
    * matrix — codes from different matrices Hamming to a loud -1).
    * Zero vectors code to all-zero bits; the exact re-rank guards them
    * to −2.0 (the family NaN rule) via the raw-vector norm.
    */
  private[graft] def scoredShortlist(encoded: DataFrame, queries: DataFrame,
      shortlist: Int, idCol: String, vecCol: String,
      excludeSelf: Boolean): DataFrame = {
    val q = encodeQueries(queries, idCol, vecCol, corpusDim(encoded, vecCol))
    val qSmall =
      IvfIndex.boundedCount(q, IvfIndex.queryBroadcastMaxRows).isDefined
    Similarity.rerankShortlist(
      encoded.crossJoin(if (qSmall) broadcast(q) else q),
      approx = hammingDistance(col("q_codes"), col("codes")),
      approxAsc = true,
      exactGuard = graft.functions.dotProduct(
        col(vecCol).cast("array<double>"), col(vecCol).cast("array<double>")) > 0,
      shortlist = shortlist, idCol = idCol, vecCol = vecCol,
      excludeSelf = excludeSelf)
  }

  /** The CORPUS-probed dimension — one scalar agg over the encoded
    * side's retained raw vectors (ragged rows were already dropped at
    * encode, so the max IS the matrix dim). Threading it into the
    * query-side encode pins both sides to ONE plane matrix: a query
    * whose length disagrees now raises loudly instead of re-probing its
    * own dim and Hamming valid-looking garbage (r17 ADVICE — the
    * length-mismatch -1 guard only fired when CODE lengths differed,
    * which same-`tables` encodes never do).
    */
  private def corpusDim(encoded: DataFrame, vecCol: String): Option[Int] =
    encoded.agg(max(size(col(vecCol)))).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
      .filter(_ > 0)

  /** Queries under the corpus's plane matrix — same defaults, same
    * seed, and (when the caller threads it) the CORPUS's pinned dim, so
    * a dim-mismatched query set raises loudly instead of encoding under
    * a different matrix.
    */
  private def encodeQueries(queries: DataFrame, idCol: String,
      vecCol: String, dim: Option[Int] = None): DataFrame =
    encode(queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("q_vec")),
      "q_vec", dim = dim)
      .withColumnRenamed("codes", "q_codes")

  // ------------------------------------------------------------ IVF-binary

  /** Cell-partitioned binary scan table — [[IvfIndex]]'s pruning ×
    * 1-bit codes, the [[SqIndex.indexIvf]] sibling at the coarsest
    * quantization. Training-free codes (seeded planes): a recluster
    * moves rows between cells without touching them, the SQ8 property
    * at 8× less scan weight.
    */
  def indexIvf(corpus: DataFrame, coarse: IvfIndex.Model,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    encode(IvfIndex.index(corpus.select(col(idCol), col(vecCol)), coarse, vecCol), vecCol)

  /** ANN top-k over an [[indexIvf]] table: nprobe coarse probe, cell
    * equi-join against the probed lists, Hamming on the packed codes,
    * `shortlist` exact re-rank — a query reads 32-byte code rows inside
    * nprobe/kCells of the corpus.
    */
  def searchIvf(indexed: DataFrame, queries: DataFrame,
                coarse: IvfIndex.Model, k: Int, nprobe: Int = 2,
                shortlist: Int = 50, idCol: String = "vec_id",
                vecCol: String = "embedding",
                excludeSelf: Boolean = true): DataFrame = {
    val qe = encodeQueries(queries, idCol, vecCol, corpusDim(indexed, vecCol))
    val qSmall = IvfIndex.boundedCount(qe,
      IvfIndex.queryBroadcastMaxRows / math.max(nprobe, 1)).isDefined
    val q = IvfIndex.withNearestCells(qe, "q_vec", coarse, nprobe, "__cells")
      .withColumn("cell", explode(col("__cells").getField("cell")))
      .drop("__cells")
    Similarity.topK(
      Similarity.rerankShortlist(
        indexed.join(if (qSmall) broadcast(q) else q, Seq("cell")), // probed cells ONLY
        approx = hammingDistance(col("q_codes"), col("codes")),
        approxAsc = true,
        exactGuard = graft.functions.dotProduct(
          col(vecCol).cast("array<double>"), col(vecCol).cast("array<double>")) > 0,
        shortlist = shortlist, idCol = idCol, vecCol = vecCol,
        excludeSelf = excludeSelf),
      k, idCol)
  }

  // --------------------------------------------------------------- q268
  /** Binary ANN top-5 over the planted-margin corpus (252-bit packed
    * sign codes, Hamming shortlist 50, exact re-rank) — the q265 shape
    * at 1 bit per plane. The ~10σ Hamming separation (scaladoc math)
    * makes the composite answer the exact top-5 — hash-checked against
    * the shared exact-kNN oracle ([[Similarity.plantedKnnSql]]).
    */
  def bitKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))
    searchBit(encode(corpus), corpus.filter(col("vec_id") < 10),
      k = 5, shortlist = 50)
  }

  // --------------------------------------------------------------- q269
  /** IVF-binary ANN top-5 over the planted-margin corpus — the q28
    * coarse shape (16 cells, nprobe=4) times the q268 code shape.
    */
  def ivfBitKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))
    val coarse = IvfIndex.train(corpus, k = 16, iters = 2)
    searchIvf(indexIvf(corpus, coarse), corpus.filter(col("vec_id") < 10),
      coarse, k = 5, nprobe = 4, shortlist = 50)
  }

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q268_knn_bits", bitKnn _, Some(Similarity.plantedKnnSql)),
    NamedQuery("q269_knn_ivfbits", ivfBitKnn _, Some(Similarity.plantedKnnSql)))
}
