package graft.analytics

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables
import graft.functions.cosineSimilarity

/** Similarity search over an embedding column (ArrayType(Float)):
  *
  *  - brute-force cosine top-k — the exact baseline: broadcast the query
  *    set against the corpus, window top-k per query. Corpus is scanned
  *    once, never shuffled; only (queries × corpus) scores flow into the
  *    per-query top-k.
  *  - random-hyperplane LSH ANN — the scale path: a deterministic seeded
  *    hyperplane set maps each vector to a small bucket id; queries probe
  *    their own bucket plus all hamming-1 neighbors (multi-probe) and
  *    brute-force only within those buckets. Bucket count tunes the
  *    recall/cost trade; candidates ≪ corpus.
  *
  * All arithmetic is double-precision left-to-right folds (see
  * [[graft.functions.cosineSimilarity]]) so external oracles agree.
  */
object Similarity {

  /** Rank scored (query, candidate) rows and keep the top k per query —
    * the shared tail of every kNN variant (brute, LSH, IVF).
    */
  private[graft] def topK(scored: DataFrame, k: Int, idCol: String): DataFrame =
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("score"), asc(idCol))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"),
        round(col("score"), 4).as("score_r"))

  /** The ANN family's shared approx-shortlist → exact-re-rank kernel
    * (r16 verdict item 4: [[PqIndex.scoredShortlist]],
    * [[SqIndex.scoredShortlist]], [[SqIndex.searchIvf]], and
    * [[IvfPq.scoredShortlistWith]] quadruplicated this shape — now one
    * implementation pinned by one zero-vector edge test). Over candidate
    * rows (query_id, q_vec, idCol, vecCol, + whatever `approx` reads):
    * keep the `shortlist` best per query by the APPROXIMATE score
    * (`approxAsc` = true for distance-like scores such as ADC, false for
    * similarity-like), then score those EXACTLY — by cosine on the raw
    * vectors unless `exact` overrides the measure (the MIPS face
    * re-ranks by raw inner product, [[Mips]]). `exactGuard` rows
    * failing it score −2.0 — below any real cosine — instead of the NaN
    * that would sort FIRST in the descending top-k window and crown a
    * zero vector the top neighbor (dot-product rerankers need no guard:
    * a zero vector dots to 0, not NaN — they pass `lit(true)`).
    */
  private[graft] def rerankShortlist(candidates: DataFrame, approx: Column,
      approxAsc: Boolean, exactGuard: Column, shortlist: Int,
      idCol: String, vecCol: String, excludeSelf: Boolean,
      exact: Option[Column] = None): DataFrame = {
    val ord = if (approxAsc) asc("__approx") else desc("__approx")
    candidates
      .filter(if (excludeSelf) col(idCol) =!= col("query_id") else lit(true))
      .withColumn("__approx", approx)
      .withColumn("__arank", row_number().over(
        Window.partitionBy("query_id").orderBy(ord, asc(idCol))))
      .filter(col("__arank") <= shortlist)
      .withColumn("score",
        when(exactGuard, exact.getOrElse(
          cosineSimilarity(col("q_vec"), col(vecCol).cast("array<double>"))))
          .otherwise(lit(-2.0)))
      .select(col("query_id"), col(idCol), col("score"))
  }

  /** Deterministic corpus dimension probe: the MAX vector length (stable
    * on mixed-dimension corpora where an arbitrary-first-row probe would
    * flip which model's vectors go inert between runs — rows of any other
    * length hash to null buckets, see HyperplaneBuckets). None = empty or
    * all-null corpus; callers return their typed empty result instead of
    * crashing the probe. Shared by every LSH variant so dimension
    * semantics can never diverge between them.
    */
  private def probeDim(corpus: DataFrame, vecCol: String): Option[Int] =
    corpus.agg(max(size(col(vecCol)))).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).filter(_ > 0)

  /** (id, tbl, bk) signature-bucket rows: ONE native multi-table signature
    * pass per row, then a posexplode of bucket ids only — vectors never
    * ride the ×nTables explode. The shared candidate-generation kernel of
    * the multi-table LSH paths.
    */
  private def bucketRows(df: DataFrame, idName: String, flat: Array[Double],
                         bitsPerTable: Int, nTables: Int, vecCol: String): DataFrame =
    df.select(col(idName),
      posexplode(graft.functions.hyperplaneBuckets(col(vecCol), flat, bitsPerTable, nTables)))
      .toDF(idName, "tbl", "bk")

  /** Exact top-k neighbors for each query vector (self excluded).
    * `queries` must be small (it is broadcast).
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val scored = corpus.select(col(idCol), col(vecCol))
      .join(broadcast(q), col(idCol) =!= col("query_id"))
      .withColumn("score", cosineSimilarity(col("q_vec"), col(vecCol)))
    topK(scored, k, idCol)
  }

  // --------------------------------------------------------------- q209
  /** Metadata-FILTERED exact top-k similarity search — the
    * retrieval-with-constraints shape every RAG deployment runs ("top-k
    * nearest among documents where tenant/label/language = X"), and the
    * operator where naive engines go quadratic twice: post-filtering a
    * global top-k under-fills k when the filter is selective, while
    * per-query corpus re-scans pay the full distance pass per filter.
    * Spark-first answer: an EQUALITY filter is a JOIN KEY — the corpus
    * hash-partitions by the filter column once, each query scores ONLY
    * its own stratum (work ∝ stratum size × queries, never corpus ×
    * queries), and k is exact by construction because the filter is
    * applied BEFORE ranking. Range/predicate filters ride the same join
    * as residual conditions; a selective literal filter additionally
    * pushes to the parquet scan.
    */
  def filteredKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                  filterCol: String, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      col(filterCol).as("q_filter"))
    val scored = corpus.select(col(idCol), col(vecCol), col(filterCol))
      .join(broadcast(q),
        col(filterCol) === col("q_filter") && col(idCol) =!= col("query_id"))
      .withColumn("score", cosineSimilarity(col("q_vec"), col(vecCol)))
    topK(scored, k, idCol)
  }

  /** Gated q209: exact top-5 within each query's own label stratum. */
  def knnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    filteredKnn(emb, emb.filter(col("vec_id") < 10), k = 5,
      filterCol = "label")
  }

  private val knnFilteredSql =
    """SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  row_number() OVER (PARTITION BY q.vec_id
      |                     ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.vec_id) AS rank,
      |  round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS score_r
      |FROM embeddings q JOIN embeddings c
      |  ON c.label = q.label AND c.vec_id <> q.vec_id
      |WHERE q.vec_id < 10
      |QUALIFY rank <= 5""".stripMargin

  /** Deterministic seeded hyperplanes: `nBits` × `dim` gaussian matrix. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Row-major flattened form of [[hyperplanes]] for the native kernel —
    * same seed stream, so bucket ids agree with the nested form.
    */
  def hyperplanesFlat(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Double] = {
    val rnd = new Random(seed)
    Array.fill(nPlanes * dim)(rnd.nextGaussian())
  }

  /** Sign-bit bucket id for a vector column under the hyperplane set —
    * one native fused pass ([[graft.functions.HyperplaneBuckets]]; the
    * previous `zip_with`+`aggregate` formulation was interpreted and
    * re-evaluated per element).
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    element_at(
      graft.functions.hyperplaneBuckets(
        vec, planes.flatten.toArray, bitsPerTable = planes.size, numTables = 1), 1)

  /** ANN top-k via multi-probe LSH: each query probes its bucket and all
    * hamming-1 buckets, then exact-scores only those candidates.
    */
  def annKnn(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int = 4,
             dim: Int = 0, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // dim <= 0 → infer deterministically from the data ([[probeDim]]).
    // An empty corpus has no neighbors: return the typed empty result
    // rather than crash the dimension probe.
    val dimRow = if (dim > 0) Some(dim) else probeDim(corpus, vecCol)
    if (dimRow.isEmpty)
      return corpus.select(col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(1).as("rank"), lit(0.0).as("score_r")).limit(0)
    val d = dimRow.get
    val planes = hyperplanes(nBits, d)
    val bucketed = corpus.select(col(idCol), col(vecCol))
      .withColumn("bucket", lshBucket(col(vecCol), planes))
    val probes = (0 until nBits).map(i => col("q_bucket").bitwiseXOR(shiftleft(lit(1), i)))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_bucket", lshBucket(col("q_vec"), planes))
      .withColumn("bucket", explode(array(col("q_bucket") +: probes: _*)))
    val scored = bucketed
      .join(broadcast(q), Seq("bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("score", cosineSimilarity(col("q_vec"), col(vecCol)))
    topK(scored, k, idCol)
  }

  /** ANN top-k via multi-table LSH (OR-amplification): a candidate is any
    * corpus vector sharing a bucket code with the query in ANY of
    * `nTables` independent tables of `bitsPerTable` sign bits — the
    * recall knob single-table multi-probe lacks: the miss probability per
    * true neighbor is (1 − p^b)^L (p = per-bit collision, see
    * [[lshCandidatePairs]]), tunable to arbitrary exactness headroom.
    *
    * Plan shape at scale: the corpus is scanned twice (one signature pass
    * → posexplode of (table, bucket) ids only — vectors are NEVER carried
    * through the ×L explode — and one verify pass), shuffled never: the
    * query bucket set and candidate id set are broadcast, and only the
    * (query × candidate) scored rows reach the top-k window.
    */
  def annKnnMultiTable(corpus: DataFrame, queries: DataFrame, k: Int,
                       nTables: Int = 24, bitsPerTable: Int = 12, seed: Long = 42L,
                       dim: Int = 0,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // dim <= 0 → probe (one extra corpus pass); callers that KNOW the
    // embedding dimension pass it (Stress does) and the corpus is scanned
    // exactly twice (signatures + verify). Passing a WRONG dim is the
    // mixed-dimension inertness rule, not an error: every vector of a
    // different length hashes to null buckets, so the query returns no
    // candidates — pass dim only when it is the schema's contract.
    val dimRow = if (dim > 0) Some(dim) else probeDim(corpus, vecCol)
    if (dimRow.isEmpty)
      return corpus.select(col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(1).as("rank"), lit(0.0).as("score_r")).limit(0)
    val flat = hyperplanesFlat(nTables * bitsPerTable, dimRow.get, seed)
    val qsig = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val qBuckets = bucketRows(qsig, "query_id", flat, bitsPerTable, nTables, "q_vec")
    val cBuckets = bucketRows(corpus.select(col(idCol), col(vecCol)), idCol,
      flat, bitsPerTable, nTables, vecCol)
    val cands = cBuckets.join(broadcast(qBuckets), Seq("tbl", "bk"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol)).distinct()
    val scored = corpus.select(col(idCol), col(vecCol))
      .join(broadcast(cands), Seq(idCol))
      .join(broadcast(qsig), Seq("query_id"))
      .withColumn("score", cosineSimilarity(col("q_vec"), col(vecCol)))
    topK(scored, k, idCol)
  }

  /** Exact cosine scoring of explicit (a_id, b_id) pairs. Norms are
    * computed ONCE per vector before the pair join (O(n·d)), so the pair
    * space only pays a fused dot-product loop — no per-pair array
    * allocation. sqrt(na)·sqrt(nb) keeps the expression bit-identical to
    * dot/(√na·√nb) computed pairwise — every near-dup variant (exact and
    * LSH-candidate) scores through THIS code path, so their agreement with
    * an external oracle is shared, not re-derived.
    */
  private def scorePairs(pairs: DataFrame, corpus: DataFrame, threshold: Double,
                         idCol: String, vecCol: String,
                         broadcastVectors: Boolean = false): DataFrame = {
    val withNorm0 = corpus.select(col(idCol), col(vecCol),
      sqrt(graft.functions.dotProduct(col(vecCol), col(vecCol))).as("nrm"))
    val withNorm = if (broadcastVectors) broadcast(withNorm0) else withNorm0
    pairs
      .join(withNorm.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"), col("nrm").as("a_nrm")), "a_id")
      .join(withNorm.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"), col("nrm").as("b_nrm")), "b_id")
      .withColumn("cos",
        graft.functions.dotProduct(col("a_vec"), col("b_vec")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos_r"))
  }

  /** All embedding pairs with cosine ≥ threshold — the exact O(n²)
    * baseline (non-equi self-join). Kept as the spec-side oracle for the
    * LSH-candidate path; not used by any gated query.
    */
  def cosineNearDups(corpus: DataFrame, threshold: Double,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ids = corpus.select(col(idCol))
    val pairs = ids.select(col(idCol).as("a_id"))
      .join(ids.select(col(idCol).as("b_id")), col("a_id") < col("b_id"))
    scorePairs(pairs, corpus, threshold, idCol, vecCol)
  }

  /** Multi-table hyperplane-LSH candidate pairs: vectors sharing a bucket
    * code in ANY of `nTables` independent tables of `bitsPerTable` sign
    * bits each (OR-amplification). The whole signature set is one native
    * per-row kernel; candidate generation is a posexplode + equi-join on
    * (table, bucket) — a shuffle hash join that scales horizontally, never
    * a nested-loop pair scan.
    *
    * Tuning is threshold-regime-dependent, and honestly so: a pair at
    * cosine c collides per bit with p = 1 − acos(c)/π, so tables of b bits
    * hit with p^b and L tables miss with (1−p^b)^L. At real near-dup
    * thresholds (c ≥ 0.8, p ≥ 0.8) a handful of wide tables prunes almost
    * everything. At weak thresholds (c ≈ 0.35 ⇒ p ≈ 0.61, barely above
    * the p = 0.5 of unrelated pairs) NO parameter choice can prune much
    * without losing recall — the defaults here (4-bit × 64 tables, worst-
    * pair miss ≈ 5e-5) are chosen for exactness on the gated corpus, and
    * the win over the exact baseline is plan shape, not work: bounded
    * per-bucket tasks instead of one quadratic broadcast loop.
    *
    * `maxBucketSize` drops degenerate mega-buckets from candidate
    * generation (the bounded-LSH trade, as in [[Dedup.lshCandidates]]);
    * None = exact multi-table behavior.
    */
  def lshCandidatePairs(corpus: DataFrame, nTables: Int = 64, bitsPerTable: Int = 4,
                        seed: Long = 42L, maxBucketSize: Option[Int] = None,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    rawLshPairs(corpus, nTables, bitsPerTable, seed, maxBucketSize, idCol, vecCol).distinct()

  /** Candidate pairs WITHOUT the cross-table dedupe — a pair colliding in
    * k tables appears k times. [[lshCosineNearDups]] consumes this form:
    * streaming duplicate candidates through the (broadcast-joined) exact
    * verify and deduping the thresholded survivors shuffles ~|results|
    * rows instead of the full candidate multiset, which is the dominant
    * cost in the weak-threshold regime.
    */
  private def rawLshPairs(corpus: DataFrame, nTables: Int, bitsPerTable: Int,
                          seed: Long, maxBucketSize: Option[Int],
                          idCol: String, vecCol: String): DataFrame = {
    // An empty (or all-null-embedding) corpus has no pairs — return the
    // typed empty result instead of crashing the probe (see [[probeDim]]
    // for the mixed-dimension determinism rationale).
    val dimRow = probeDim(corpus, vecCol)
    if (dimRow.isEmpty)
      return corpus.select(col(idCol).as("a_id"), col(idCol).as("b_id")).limit(0)
    val flat = hyperplanesFlat(nTables * bitsPerTable, dimRow.get, seed)
    val buckets = bucketRows(corpus.select(col(idCol), col(vecCol)), idCol,
      flat, bitsPerTable, nTables, vecCol)
    CandidateJoin.pairs(buckets, idCol, Seq("tbl", "bk"), maxBucketSize)
  }

  /** Embedding near-dup pairs via LSH candidates + exact cosine
    * verification — the [[Dedup.minHashNearDups]] pattern in embedding
    * space. Output is exact whenever the candidate set covers every true
    * pair (spec-asserted against [[cosineNearDups]] on the gated corpora;
    * see [[lshCandidatePairs]] for the recall math).
    */
  def lshCosineNearDups(corpus: DataFrame, threshold: Double,
                        nTables: Int = 64, bitsPerTable: Int = 4, seed: Long = 42L,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        broadcastVectors: Boolean = true,
                        maxBucketSize: Option[Int] = None): DataFrame =
    // broadcastVectors=true (corpus fits the broadcast limit): duplicate
    // candidates stream through the broadcast verify and only the
    // thresholded survivors are deduped — identical rows (same pair ⇒
    // same exact score) collapse to one. broadcastVectors=false (corpus
    // beyond broadcast range — the cluster-scale setting): dedupe the
    // candidates FIRST, then verify through shuffled equi-joins; in that
    // regime the threshold is high and the candidate set is tiny, so the
    // distinct is cheap and the join shuffles candidates, not the corpus
    // twice per duplicate.
    if (broadcastVectors)
      scorePairs(
        rawLshPairs(corpus, nTables, bitsPerTable, seed, maxBucketSize, idCol, vecCol),
        corpus, threshold, idCol, vecCol, broadcastVectors = true)
        .distinct()
    else
      scorePairs(
        rawLshPairs(corpus, nTables, bitsPerTable, seed, maxBucketSize, idCol, vecCol).distinct(),
        corpus, threshold, idCol, vecCol, broadcastVectors = false)

  // ---------------------------------------------------------------- q19
  /** Brute-force cosine top-5 for query vectors vec_id < 10. */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    bruteForceKnn(emb, emb.filter(col("vec_id") < 10), k = 5)
  }

  private val knnBruteSql =
    """SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  row_number() OVER (PARTITION BY q.vec_id
      |                     ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.vec_id) AS rank,
      |  round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS score_r
      |FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      |WHERE q.vec_id < 10
      |QUALIFY rank <= 5""".stripMargin

  // ---------------------------------------------------------------- q20
  /** The planted-margin kNN corpus: every embedding (cast to double) plus,
    * for each query id (`vec_id < nQueries`), `twinsPerQuery` planted
    * near-twins at 100000 + q·10 + t, element i offset by
    * ((q·31 + t·7 + i) % 97 − 48) / 2000 — integer-derived, exact in IEEE
    * double in any engine. Twin cosine ≈ 0.992–0.996 vs the corpus's
    * natural max ≈ 0.48, so the TRUE top-`twinsPerQuery` of every query
    * is exactly its twin set, with a ~0.5 margin any correct ANN must
    * recover — which is what turns the ANN queries from rows-only into
    * hash-matched oracle rows (DuckDB computes the exact kNN).
    */
  def plantedKnnCorpus(emb: DataFrame, nQueries: Int = 10, twinsPerQuery: Int = 5,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = emb.select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
    // As in plantedTwinCorpus: the source id rides under a non-shadowed
    // name so the transform lambda reads the ORIGINAL id, not the twin's.
    val twins = base.filter(col(idCol) < nQueries)
      .select(col(idCol).as("__src"), col(vecCol))
      .withColumn("__t", explode(sequence(lit(0), lit(twinsPerQuery - 1))))
      .select(
        (lit(100000L) + col("__src") * 10 + col("__t")).as(idCol),
        transform(col(vecCol), (x, i) =>
          x + ((col("__src") * 31 + col("__t") * 7 + i) % 97 - 48) / lit(2000.0)).as(vecCol))
    base.unionByName(twins)
  }

  /** Exact top-5 kNN over [[plantedKnnCorpus]] in DuckDB — the shared
    * oracle for both ANN variants (q20 LSH, q28 IVF): an approximate
    * index that recovers the planted margin produces exactly this.
    */
  private[graft] val plantedKnnSql =
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
      |                     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank,
      |  round(list_cosine_similarity(q.embedding, c.embedding), 4) AS score_r
      |FROM corpus q JOIN corpus c ON c.vec_id <> q.vec_id
      |WHERE q.vec_id < 10
      |QUALIFY rank <= 5""".stripMargin

  /** Multi-table LSH ANN top-5 over the planted-margin corpus, gated
    * config (24 × 12-bit tables): per-twin miss probability
    * (1 − 0.96¹²)²⁴ ≈ 1e-10 (planted cosine ≥ 0.992 ⇒ per-bit p ≥ 0.96),
    * so the ANN answer IS the exact answer — hash-checked against
    * [[plantedKnnSql]], with recall additionally CI-audited at every
    * harness SF by AnnExactnessSpec.
    */
  def knnAnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = plantedKnnCorpus(Tables.embeddings(spark, dir))
    annKnnMultiTable(corpus, corpus.filter(col("vec_id") < 10), k = 5,
      nTables = GatedTables, bitsPerTable = GatedBits)
  }

  // ---------------------------------------------------------------- q21
  /** The gated near-dup corpus: every embedding (cast to double) plus,
    * for `vec_id < nTwins`, a planted near-twin at `vec_id + 100000`
    * whose element i is offset by ((vec_id·31 + i) % 97 − 48) / 2000 — a
    * pure integer-derived perturbation, exact in IEEE double in any
    * engine, so an external oracle rebuilds the identical corpus.
    * Perturbation norm ≈ 0.11 against unit-norm vectors ⇒ planted cosine
    * ≈ 0.992–0.996, far above the corpus's natural max (≈ 0.48 at every
    * SF): at threshold 0.9 the true pairs are exactly the planted twins,
    * and LSH runs in its design regime where wide tables prune almost
    * the whole pair space (see [[lshCandidatePairs]] recall math).
    */
  def plantedTwinCorpus(emb: DataFrame, nTwins: Int = 50,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = emb.select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
    // The source id must ride under a name the output does NOT shadow: a
    // lambda's outer reference resolves against the projection's own
    // aliases, so `idCol` inside transform() would read the +100000 id.
    val twins = base.filter(col(idCol) < nTwins)
      .select(col(idCol).as("__src"), col(vecCol))
      .select(
        (col("__src") + 100000L).as(idCol),
        transform(col(vecCol), (x, i) =>
          x + ((col("__src") * 31 + i) % 97 - 48) / lit(2000.0)).as(vecCol))
    base.unionByName(twins)
  }

  /** Gated q21 LSH parameters: 24 tables × 12 bits. At the planted-twin
    * cosine (≥ 0.99 ⇒ per-bit collision p ≥ 0.955) a table hits with
    * p¹² ≈ 0.58, so the worst-pair miss probability is (1−0.58)²⁴ ≈ 1e-9
    * — exactness headroom at any corpus the harness runs — while
    * unrelated pairs (p ≈ 0.5) collide at ~2⁻¹² per table, keeping the
    * candidate set ≈ 1% of the pair space (spec-asserted < 5%).
    */
  val GatedTables = 24
  val GatedBits = 12
  val GatedThreshold = 0.9

  /** Embedding near-dup pairs over the planted-twin corpus at cosine
    * ≥ 0.9 — the LSH-candidate + exact-verify path in its pruning regime
    * (candidates ≪ pair space), no quadratic join in the plan. The
    * oracle holds because verification is exact and the candidate set
    * covers every true pair (miss ≈ 1e-9 per pair; recall 1.0 audited by
    * [[graft.RecallAudit]] at every harness SF).
    */
  def embNearDups(spark: SparkSession, dir: String): DataFrame =
    lshCosineNearDups(plantedTwinCorpus(Tables.embeddings(spark, dir)),
      threshold = GatedThreshold, nTables = GatedTables, bitsPerTable = GatedBits)

  /** The planted-twin corpus as DuckDB CTEs — ONE copy of the
    * perturbation formula and the twin rule, shared by every oracle that
    * gates on this corpus (q21, q47); [[plantedTwinCorpus]] is the Scala
    * builder it must mirror.
    */
  private val plantedTwinCte =
    """base AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
      |), corpus AS (
      |  SELECT * FROM base
      |  UNION ALL
      |  SELECT vec_id + 100000 AS vec_id,
      |         list_transform(embedding,
      |           (x, i) -> x + ((vec_id * 31 + i - 1) % 97 - 48) / 2000.0) AS embedding
      |  FROM base WHERE vec_id < 50
      |)""".stripMargin

  private val embNearDupsSql =
    s"""WITH $plantedTwinCte
      |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |  round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos_r
      |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9""".stripMargin

  // ---------------------------------------------------------------- q47
  /** SemDeDup-style semantic dedup: coarse k-means cells (the IVF
    * quantizer from [[IvfIndex]]), exact cosine pairs WITHIN each cell,
    * drop the larger id of every duplicate pair. Cluster-then-compare
    * bounds pair work at Σ|cell|² ≈ n²/k instead of n² — the third
    * embedding-dedup scale path next to LSH candidates
    * ([[lshCosineNearDups]]) and the exact baseline ([[cosineNearDups]]);
    * at 100 TB, k grows with the corpus so cells stay machine-sized and
    * the per-cell join shuffles on `cell` only. Near-duplicate members of
    * one semantic cluster sit far inside a Voronoi region relative to
    * their tiny mutual distance, so splitting a dup pair across cells
    * requires the pair to straddle a boundary — AnnExactnessSpec asserts
    * the found pair set equals the exact global pair set on every harness
    * corpus.
    */
  /** SemDeDup's scale law is k ∝ n: within-cell pair work is Σ|cell|² ≈
    * n·(n/k), so a FIXED k turns 10× data into 100× pairs (measured: 94×
    * shuffle at 10× before this contract was enforced). Cells of
    * ~[[SemanticCellTarget]] rows keep total pair work ≈ n·target —
    * corpus-linear — and each cell join machine-sized.
    */
  val SemanticCellTarget = 512L

  /** The k the cell law prescribes for an n-row corpus: ⌈n/target⌉. */
  def derivedCellCount(nRows: Long, targetCellSize: Long = SemanticCellTarget): Int =
    math.max(1L, (nRows + targetCellSize - 1) / targetCellSize).toInt

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Derived-k form — the default entry point: one cheap metadata-cheap
    * `count()` of the id column picks k from the cell law, so callers
    * never hand-tune the knob and pair work stays corpus-linear by
    * construction.
    */
  def semanticDedupPairs(emb: DataFrame, threshold: Double,
                         idCol: String, vecCol: String): DataFrame =
    // trainCellLaw counts on its cached projection (reused by the Lloyd
    // passes), so the derived default costs no extra corpus scan. The
    // quantizer trains on the UNIT SPHERE (SemDeDup's own convention):
    // cosine geometry is what the cells must partition, and the probe
    // bound below is a unit-sphere radius.
    semanticDedupPairs(emb,
      IvfIndex.trainCellLaw(unitized(emb, idCol, vecCol), SemanticCellTarget,
        idCol = idCol, vecCol = "__uv"),
      threshold, idCol, vecCol)

  /** Average probe multiplicity of the exactness ball at this corpus's
    * derived-k geometry — probed (row, cell) assignments per input row.
    * Diagnostic for the ScaleCheck knob: the pair-scan shuffle is
    * ∝ n · multiplicity, and multiplicity is a property of the data's
    * cluster geometry relative to the pair radius √(2(1−t)).
    */
  private[graft] def probeMultiplicity(emb: DataFrame, threshold: Double,
                                       idCol: String = "vec_id",
                                       vecCol: String = "embedding"): Double = {
    val r = math.sqrt(math.max(0.0, 2.0 * (1.0 - threshold)))
    val unit = unitized(emb, idCol, vecCol)
    val model = IvfIndex.trainCellLaw(unit, SemanticCellTarget,
      idCol = idCol, vecCol = "__uv")
    val spark = emb.sparkSession
    import spark.implicits._
    val primary = IvfIndex.withNearestCells(unit, "__uv", model, 1, "__cells")
      .withColumn("d1", col("__cells").getItem(0).getField("d"))
    val cents = model.centroids
      .map { case (cid, c) => (cid, c, c.map(x => x * x).sum) }
      .toDF("p_cell", "p_centroid", "p_cnorm")
    val counts = primary.join(broadcast(cents),
      sqrt(greatest(lit(0.0), col("p_cnorm")
        - lit(2.0) * graft.functions.dotProduct(col("__uv"), col("p_centroid"))
        + lit(1.0)))
        <= sqrt(greatest(lit(0.0), col("d1") + lit(1.0))) + lit(r))
      .agg(count(lit(1)).as("probes"),
        countDistinct(col(idCol)).as("rows"))
      .head()
    counts.getLong(0).toDouble / math.max(1L, counts.getLong(1)).toDouble
  }

  /** (id, vec, nrm, __uv) projection: the L2-normalized vector (double
    * elements), zero-norm rows dropped (cosine is undefined for them and
    * they can never reach a positive threshold).
    */
  private def unitized(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), col(vecCol))
      .withColumn("nrm", sqrt(graft.functions.dotProduct(col(vecCol), col(vecCol))))
      .filter(col("nrm") > 0.0)
      .withColumn("__uv",
        expr(s"transform($vecCol, x -> CAST(x AS DOUBLE) / nrm)"))

  def semanticDedupPairs(emb: DataFrame, threshold: Double): DataFrame =
    semanticDedupPairs(emb, threshold, "vec_id", "embedding")

  def semanticDedupPairs(emb: DataFrame, k: Int, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Enforce the k ∝ n contract loudly: a caller-pinned k an order of
    // magnitude under the cell law means ~(derived/k)× the linear pair
    // work — the quadratic failure mode this operator exists to avoid.
    // The guard rides trainSized's cached-projection count: no extra scan.
    val guarded = (n: Long) => {
      val derived = derivedCellCount(n)
      if (k.toLong * 10L < derived)
        log.warn(s"semanticDedupPairs: k=$k is >10x below the derived cell " +
          s"count $derived for n=$n rows — within-cell pair work will be " +
          s"~${derived / math.max(k, 1)}x the linear budget " +
          s"(cell law: k = ceil(n/$SemanticCellTarget)). Pass no k to use " +
          "the derived default.")
      k
    }
    semanticDedupPairs(emb,
      IvfIndex.trainSized(emb, guarded, iters = 3, idCol = idCol, vecCol = vecCol),
      threshold, idCol, vecCol)
  }

  /** Model-reuse form — the warehouse-scale entry point: train the
    * quantizer ONCE (or [[IvfIndex.load]] a persisted one) and dedup
    * every incoming batch against the same cell geometry; retraining per
    * batch would silently re-draw cell boundaries between runs.
    */
  def semanticDedupPairs(emb: DataFrame, model: IvfIndex.Model, threshold: Double,
                         idCol: String, vecCol: String): DataFrame =
    semanticDedupPairs(emb, model, threshold, idCol, vecCol, exact = true)

  /** `exact = false` is the PUBLISHED SemDeDup semantics — primary-cell
    * pairs only, no ball probe. It misses pairs that straddle a Voronoi
    * boundary (measured: exactly one planted twin at sf0.1) in exchange
    * for pair work independent of the probe multiplicity — the right
    * trade when the corpus is noisy relative to the pair radius and the
    * caller accepts the published approximation. The gated q47 runs
    * `exact = true`: its oracle is the global pair set.
    */
  def semanticDedupPairs(emb: DataFrame, model: IvfIndex.Model, threshold: Double,
                         idCol: String, vecCol: String, exact: Boolean): DataFrame = {
    // EXACTNESS BY BALL PROBING (the r14 fix for the one wrong answer
    // ever observed at sf0.1: a planted twin pair straddling a Voronoi
    // boundary, invisible to the sf0.01 gate). On the unit sphere,
    // cos(u,v) ≥ t ⟺ ‖û−v̂‖ ≤ r with r = √(2(1−t)). Probe every row
    // into every cell within d₁ + r of its unit vector. That SYMMETRIC
    // slack-r probe is sufficient: take the pair's side with the larger
    // primary distance — wlog d₁(û) ≥ d₁(v̂); then
    //   ‖û − c₁(v̂)‖ ≤ ‖û−v̂‖ + ‖v̂−c₁(v̂)‖ = r + d₁(v̂) ≤ r + d₁(û),
    // so û probes into v̂'s primary cell, where v̂ sits by definition —
    // each qualifying pair co-locates in at least one probed cell, for
    // ANY centroid set. Cell-locality becomes a THEOREM, not a fixture
    // property (pre-r14 it held by Voronoi luck and broke at sf0.1's
    // derived k=10). Probe multiplicity is ~1 when cells are farther
    // apart than the pair radius; the exact-cosine verify is unchanged,
    // so extra probes cost candidates, never results.
    //
    // Scale shape: pass 1 is the standard assign (argmin — literal or
    // join path, exchanges carry one row per input); pass 2 re-scores
    // the broadcast codebook per row and keeps qualifying cells map-side
    // (output ∝ probe multiplicity); the pair scan is unchanged except
    // for a final pair-keyed distinct (∝ matches) that collapses pairs
    // probed into two shared cells.
    //
    // Norms once per ROW before the self-join (the scorePairs
    // discipline). dot/(√na·√nb) with this op order is bit-identical to
    // the cosine kernel, so the pair set cannot drift from
    // [[cosineNearDups]].
    val spark = emb.sparkSession
    import spark.implicits._
    val r = math.sqrt(math.max(0.0, 2.0 * (1.0 - threshold)))
    val unit = unitized(emb, idCol, vecCol)
    // Pass 1: primary cell + its score on the unit sphere. The score d
    // is the assign ranking ‖c‖² − 2·û·c (true sq-dist minus ‖û‖² = 1).
    val primary = IvfIndex.withNearestCells(unit, "__uv", model, 1, "__cells")
      .withColumn("cell1", col("__cells").getItem(0).getField("cell"))
      .withColumn("d1", col("__cells").getItem(0).getField("d"))
      .drop("__cells")
      .localCheckpoint(eager = false)
    // Pass 2: every cell whose true unit-sphere distance is within the
    // probe ball radius √(d1+1) + r. The pair scan is PRIMARY × PROBED,
    // not probed² — the guarantee above places the boundary pair in the
    // smaller-d1 side's PRIMARY cell, so one join side never expands and
    // candidate work is Σ_cell |primary|·|probed| (≈ multiplicity×, not
    // multiplicity²×, the primary-only cost). Pair ids are normalized
    // (least, greatest) and distinct'd because the guaranteed direction
    // is d1-ordered, not id-ordered.
    val cents = model.centroids
      .map { case (cid, c) => (cid, c, c.map(x => x * x).sum) }
      .toDF("p_cell", "p_centroid", "p_cnorm")
    val probed =
      if (!exact)
        primary.select(col("cell1").as("cell"), col(idCol), col(vecCol),
          col("nrm"))
      else primary.join(broadcast(cents),
        sqrt(greatest(lit(0.0), col("p_cnorm")
          - lit(2.0) * graft.functions.dotProduct(col("__uv"), col("p_centroid"))
          + lit(1.0)))
          <= sqrt(greatest(lit(0.0), col("d1") + lit(1.0))) + lit(r))
        .select(col("p_cell").as("cell"), col(idCol), col(vecCol), col("nrm"))
    val prim = primary.select(col("cell1").as("cell"), col(idCol).as("a_id"),
      col(vecCol).as("a_v"), col("nrm").as("a_n"))
    prim
      .join(probed.select(col("cell"), col(idCol).as("b_id"), col(vecCol).as("b_v"),
        col("nrm").as("b_n")), Seq("cell"))
      .filter(col("a_id") =!= col("b_id"))
      .filter(graft.functions.dotProduct(col("a_v"), col("b_v")) / (col("a_n") * col("b_n"))
        >= threshold)
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"))
      .distinct()
  }

  /** Rows of `emb` that survive semantic dedup: an id is dropped iff it
    * has a smaller-id duplicate (deterministic canonical-keep; for the
    * rare chain a-b-c without (a,c), b and c both drop — the
    * representative is still the smallest id, SemDeDup's greedy keep).
    */
  def semanticDedup(emb: DataFrame, k: Int, threshold: Double,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    emb.join(
      semanticDedupPairs(emb, k, threshold, idCol, vecCol)
        .select(col("b_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Derived-k form of [[semanticDedup]] (the cell law picks k). */
  def semanticDedup(emb: DataFrame, threshold: Double): DataFrame =
    emb.join(
      semanticDedupPairs(emb, threshold)
        .select(col("b_id").as("vec_id")).distinct(),
      Seq("vec_id"), "left_anti")

  /** Gated q47: semantic dedup over the planted-twin corpus — every twin
    * (the larger id of its pair) must drop, every base vector must stay.
    * The oracle recomputes the pair set EXACTLY (global quadratic cosine
    * in DuckDB) and applies the same drop rule, so the hash gate holds
    * precisely when cell-locality loses no pair.
    */
  def semanticDedupSummary(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val corpus = plantedTwinCorpus(Tables.embeddings(spark, dir))
    // Derived-k path (the cell law picks k from the corpus count) — the
    // gate now ALSO proves no manual tuning is needed for exact recall:
    // the oracle recomputes the pair set globally, so any pair lost to a
    // cell boundary fails the hash.
    val kept = semanticDedup(corpus, GatedThreshold)
    def grp(c: Column) = when(c >= 100000L, "twin").otherwise("base")
    corpus.groupBy(grp(col("vec_id")).as("grp")).agg(count(lit(1)).as("n_before"))
      .join(kept.groupBy(grp(col("vec_id")).as("grp")).agg(count(lit(1)).as("n_after")),
        Seq("grp"), "left")
      .select(col("grp"), col("n_before"), coalesce(col("n_after"), lit(0L)).as("n_after"))
  }

  // --------------------------------------------------------------- q258
  /** Embedding isotropy per label — Ethayarajh (2019)'s anisotropy
    * diagnostic, the embedding-quality screen a retrieval/dedup pipeline
    * reads before trusting cosine thresholds: the expected cosine
    * between two random vectors of a set equals ‖μ‖² of the set's mean
    * UNIT vector (≈ 0 for isotropic directions, → 1 when everything
    * points the same way, where cosine gates stop discriminating).
    *
    * Exactness (the q118 nano-quantization discipline): each normalized
    * component is quantized once to nano units — round(û_d·1e9) is
    * deterministic on both engines because û_d is the same IEEE double
    * (float loads + one ordered sum + one sqrt + one division) — and
    * everything after is integer: per-dimension sums are exact BIGINT,
    * each (s_d/(n·1e9))² term is floored to pico PER DIMENSION, and the
    * label's isotropy is the order-independent integer sum of those
    * pico terms.
    *
    * Scale shape: one scan → posexplode (rows × dim, the fixed-width
    * q118 shape) → (label, dim) hash aggregate → label-frame fold.
    */
  def embeddingIsotropy(emb: DataFrame, labelCol: String = "label",
                        vecCol: String = "embedding"): DataFrame = {
    val unit = emb.select(col(labelCol).as("lbl"), col(vecCol))
      .withColumn("nrm", sqrt(graft.functions.dotProduct(col(vecCol), col(vecCol))))
      .filter(col("nrm") > 0.0)
      .withColumn("uv", expr(s"transform($vecCol, x -> CAST(x AS DOUBLE) / nrm)"))
    unit
      .select(col("lbl"), posexplode(col("uv")))
      .toDF("lbl", "d", "x")
      .withColumn("q", expr("CAST(round(x * 1e9) AS BIGINT)"))
      .groupBy("lbl", "d")
      .agg(count(lit(1)).as("n"), sum("q").as("s_nano"))
      .withColumn("term_pico", floor(
        (col("s_nano").cast("double")
          / (col("n").cast("double") * lit(1.0e9)))
          * (col("s_nano").cast("double")
            / (col("n").cast("double") * lit(1.0e9)))
          * lit(1.0e12) + lit(0.5)).cast("long"))
      .groupBy(col("lbl").as("label"))
      .agg(max("n").as("n_vectors"), sum("term_pico").as("iso_pico"))
  }

  /** Gated q258: per-label isotropy of the embeddings corpus. */
  def labelIsotropy(spark: SparkSession, dir: String): DataFrame =
    embeddingIsotropy(Tables.embeddings(spark, dir))

  private val labelIsotropySql =
    """WITH unit AS (
      |  SELECT label AS lbl, embedding AS v,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings
      |  WHERE sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0
      |),
      |px AS (
      |  SELECT lbl, d.d - 1 AS d,
      |    CAST(round(CAST(v[d.d] AS DOUBLE) / nrm * 1e9) AS BIGINT) AS q
      |  FROM unit, unnest(range(1, len(v) + 1)) AS d(d)
      |),
      |dims AS (
      |  SELECT lbl, d, count(*) AS n, sum(q) AS s_nano
      |  FROM px GROUP BY 1, 2
      |),
      |terms AS (
      |  SELECT lbl, n,
      |    CAST(floor(
      |      (s_nano::DOUBLE / (n::DOUBLE * 1.0e9))
      |        * (s_nano::DOUBLE / (n::DOUBLE * 1.0e9))
      |        * 1.0e12 + 0.5::DOUBLE) AS BIGINT) AS term_pico
      |  FROM dims
      |)
      |SELECT lbl AS label, CAST(max(n) AS BIGINT) AS n_vectors,
      |  CAST(sum(term_pico) AS BIGINT) AS iso_pico
      |FROM terms GROUP BY 1""".stripMargin

  private val semanticDedupSql =
    s"""WITH $plantedTwinCte,
      |prs AS (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
      |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
      |),
      |drops AS (SELECT DISTINCT b_id FROM prs)
      |SELECT CASE WHEN c.vec_id >= 100000 THEN 'twin' ELSE 'base' END AS grp,
      |  CAST(count(*) AS BIGINT) AS n_before,
      |  CAST(sum(CASE WHEN d.b_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_after
      |FROM corpus c LEFT JOIN drops d ON c.vec_id = d.b_id
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q44
  /** Int8 symmetric quantization of an embedding column — the 4× storage
    * cut a 100 TB embedding corpus takes before indexing: per-vector
    * scale = max|x|/127, stored element = round(x/scale) ∈ [-127,127],
    * dequantize = q·scale. The gated query reports per-vector fidelity
    * (cosine between original and dequantized, max absolute element
    * error); every step is IEEE-deterministic double arithmetic plus a
    * shared HALF-AWAY-FROM-ZERO round, so DuckDB reproduces the numbers
    * bit-exactly. Quantization runs once at ingest (not a per-query hot
    * path), so the higher-order-function form is the right altitude; the
    * search-side kernels stay native.
    */
  def quantizationFidelity(spark: SparkSession, dir: String): DataFrame =
    quantizationFidelityFrame(Tables.embeddings(spark, dir))

  /** Operator form over any (vec_id, embedding) frame — spec-tested on
    * edge vectors (all-zero → scale 0 → identity dequantize).
    */
  def quantizationFidelityFrame(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))) / lit(127.0))
      .withColumn("dq",
        when(col("scale") > 0,
          transform(col("v"), x => round(x / col("scale")) * col("scale")))
          .otherwise(col("v")))
      .select(
        col("vec_id"),
        // Zero vector ⇒ identity dequantize ⇒ fidelity is 1 BY DEFINITION;
        // the raw cosine would be 0/0 = NaN, which never hash-matches an
        // external engine (and renders differently besides).
        when(col("scale") > 0, round(cosineSimilarity(col("v"), col("dq")), 6))
          .otherwise(lit(1.0)).as("cos_fid"),
        round(array_max(zip_with(col("v"), col("dq"), (a, b) => abs(a - b))), 9)
          .as("max_err"))

  private val quantizationFidelitySql =
    """WITH v AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |), q AS (
      |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      |  FROM v
      |), d AS (
      |  SELECT vec_id, v, scale,
      |    CASE WHEN scale > 0 THEN list_transform(v, x -> round(x / scale) * scale)
      |         ELSE v END AS dq
      |  FROM q
      |)
      |SELECT vec_id,
      |  CASE WHEN scale > 0 THEN round(list_cosine_similarity(v, dq), 6)
      |       ELSE 1.0 END AS cos_fid,
      |  round(list_max(list_transform(generate_series(1, len(v)),
      |    i -> abs(v[i] - dq[i]))), 9) AS max_err
      |FROM d""".stripMargin

  // --------------------------------------------------------------- q125
  /** Hard-negative mining — for each query vector, the top-k most
    * similar candidates that are NOT near-duplicates (cosine below the
    * dup ceiling, self excluded). The third leg of the embedding-
    * training data loop next to kNN (positives) and near-dup removal
    * (leakage): contrastive objectives need the closest non-duplicate
    * neighbors as negatives, and mining them is exactly "kNN with a
    * similarity ceiling".
    *
    * Scale shape: identical to [[bruteForceKnn]] — broadcast query set,
    * per-partition scoring, partial top-k per query — with the ceiling
    * applied before ranking, so the dup band never enters the window.
    * At 100 TB the candidate generation swaps to the IVF/LSH paths
    * (q20/q28) and this post-filter composes unchanged.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    dupCeiling: Double, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val scored = corpus.select(col(idCol), col(vecCol))
      .join(broadcast(q), col(idCol) =!= col("query_id"))
      .withColumn("score", cosineSimilarity(col("q_vec"), col(vecCol)))
      .filter(col("score") < dupCeiling)
    topK(scored, k, idCol)
  }

  /** Gated face over [[plantedKnnCorpus]]: every query's planted twins
    * sit at cosine ≈ 0.992–0.996 and its true non-dup neighbors at
    * ≤ ≈ 0.48, so the 0.9 ceiling is in the middle of a ~0.5 margin —
    * no boundary row exists for cross-engine float noise to flip, and
    * the output is exactly "q19-shape kNN with the twins excised",
    * which DuckDB recomputes exactly.
    */
  def knnHardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val corpus = plantedKnnCorpus(Tables.embeddings(spark, dir))
    hardNegatives(corpus, corpus.filter(col("vec_id") < 10), k = 5,
      dupCeiling = 0.9)
  }

  private val hardNegativesSql =
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
      |                     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank,
      |  round(list_cosine_similarity(q.embedding, c.embedding), 4) AS score_r
      |FROM corpus q JOIN corpus c
      |  ON c.vec_id <> q.vec_id
      |  AND list_cosine_similarity(q.embedding, c.embedding) < 0.9
      |WHERE q.vec_id < 10
      |QUALIFY rank <= 5""".stripMargin

  // --------------------------------------------------------------- q164
  /** Per-class embedding centroids (class prototypes) — the monitoring /
    * prototype-classification primitive over a labeled embedding table:
    * per (label, dimension), the exact nano-integer coordinate sum and
    * count (the q118 sufficient-stats discipline applied per class), so
    * centroid drift between snapshots, class separability, and
    * prototype-distance classification all read from a labels×d table
    * instead of re-scanning vectors. One scan, one posexplode, one hash
    * aggregate — shuffle capped at partitions × labels × d rows by
    * map-side combine, corpus-size-independent.
    */
  def labelCentroids(emb: DataFrame, labelCol: String = "label",
                     vecCol: String = "embedding"): DataFrame =
    graft.core.Spread.ifNarrow(
      emb.select(col(labelCol).as("label"), col(vecCol).cast("array<double>").as("v")), 16L << 10)
      .select(col("label"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("label", "i")
      .agg(count(lit(1)).as("n"),
        sum(round(col("x") * 1e9).cast("long")).as("s_nano"))
      .withColumn("mean_nano", expr("s_nano div n"))

  def labelCentroidProfile(spark: SparkSession, dir: String): DataFrame =
    labelCentroids(Tables.embeddings(spark, dir))

  private val labelCentroidsSql =
    """WITH v AS (
      |  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
      |)
      |SELECT label, CAST(i.i AS INTEGER) AS i, count(*) AS n,
      |  CAST(sum(CAST(round(v[i.i + 1] * 1e9) AS BIGINT)) AS BIGINT) AS s_nano,
      |  CAST(sum(CAST(round(v[i.i + 1] * 1e9) AS BIGINT)) // count(*) AS BIGINT)
      |    AS mean_nano
      |FROM v, (SELECT unnest(range(0, 64)) AS i) i
      |WHERE i.i < len(v)
      |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------------- q186
  /** Matryoshka-truncation recall — the dimension-efficiency audit MRL
    * embeddings (Kusupati et al. 2022) make routine: re-rank with only
    * the FIRST 16 of 64 dimensions and measure recall@5 against the
    * full-dimension exact top-5. Truncated search costs 4× less compute
    * and memory at serving time; this gate quantifies what that buys on
    * the planted-margin corpus (q20's kernel: true neighbors sit ~0.5
    * cosine above the natural background in the full space, so the
    * FULL ranking is engine-exact; the truncated ranking is computed
    * identically in both engines over the identical double slices, and
    * the OVERLAP COUNT is an integer — no float crosses the gate).
    *
    * Scale shape: two q19-shaped broadcast-kNN passes (queries are the
    * tiny side, corpus streams) + a per-query 5-row join; at corpus
    * scale the truncated pass is the cheap one by construction — that
    * asymmetry is the operator's point.
    */
  def matryoshkaRecall(spark: SparkSession, dir: String): DataFrame = {
    val corpus = plantedKnnCorpus(Tables.embeddings(spark, dir))
    val trunc = corpus.select(col("vec_id"),
      slice(col("embedding"), 1, 16).as("embedding"))
    val full5 = bruteForceKnn(corpus, corpus.filter(col("vec_id") < 10), 5)
    val trunc5 = bruteForceKnn(trunc, trunc.filter(col("vec_id") < 10), 5)
    trunc5.select(col("query_id"), col("neighbor_id"))
      .join(full5.select(col("query_id"), col("neighbor_id"),
        lit(1L).as("hit")), Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      .withColumn("recall_ppm", expr("(1000000 * n_overlap) div k"))
  }

  private val matryoshkaRecallSql =
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
      |),
      |full5 AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
      |               c.vec_id) AS rank
      |  FROM corpus q JOIN corpus c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 10
      |  QUALIFY rank <= 5
      |),
      |trunc5 AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(q.embedding[1:16], c.embedding[1:16]) DESC,
      |               c.vec_id) AS rank
      |  FROM corpus q JOIN corpus c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 10
      |  QUALIFY rank <= 5
      |)
      |SELECT t.query_id, count(*) AS k,
      |  CAST(sum(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_overlap,
      |  CAST((1000000 * sum(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 ELSE 0 END))
      |    // count(*) AS BIGINT) AS recall_ppm
      |FROM trunc5 t LEFT JOIN full5 f
      |  ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
      |GROUP BY 1""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q186_matryoshka_recall", matryoshkaRecall _,
      Some(matryoshkaRecallSql)),
    NamedQuery("q164_label_centroids", labelCentroidProfile _,
      Some(labelCentroidsSql)),
    NamedQuery("q19_knn_brute", knnBrute _, Some(knnBruteSql)),
    NamedQuery("q209_filtered_knn", knnFiltered _, Some(knnFilteredSql)),
    NamedQuery("q125_hard_negatives", knnHardNegatives _, Some(hardNegativesSql)),
    NamedQuery("q20_knn_ann", knnAnn _, Some(plantedKnnSql)),
    NamedQuery("q21_embedding_neardups", embNearDups _, Some(embNearDupsSql)),
    NamedQuery("q44_quantization_fidelity", quantizationFidelity _,
      Some(quantizationFidelitySql)),
    NamedQuery("q47_semantic_dedup", semanticDedupSummary _, Some(semanticDedupSql)),
    NamedQuery("q258_embedding_isotropy", labelIsotropy _,
      Some(labelIsotropySql)))
}
