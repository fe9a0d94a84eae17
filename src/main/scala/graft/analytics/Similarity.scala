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
  private[analytics] def topK(scored: DataFrame, k: Int, idCol: String): DataFrame =
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("score"), asc(idCol))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"),
        round(col("score"), 4).as("score_r"))

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

  /** Deterministic seeded hyperplanes: `nBits` × `dim` gaussian matrix. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket id for a vector column under the hyperplane set. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(vec, typedlit(p), (x, h) => x.cast("double") * h),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, shiftleft(lit(1), i)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN top-k via multi-probe LSH: each query probes its bucket and all
    * hamming-1 buckets, then exact-scores only those candidates.
    */
  def annKnn(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int = 4,
             dim: Int = 0, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // dim <= 0 → infer from the data: hyperplanes of the wrong length
    // zip_with-pad with nulls, nulling every dot product and silently
    // collapsing all vectors into bucket 0 (ANN degrades to brute force).
    val d = if (dim > 0) dim
      else corpus.select(size(col(vecCol))).head().getInt(0)
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

  /** All embedding pairs with cosine ≥ threshold — embedding-space
    * near-dup detection. Exact O(n²) kernel: correct baseline at test
    * scale; the LSH bucketing above is the 100 TB path.
    */
  def cosineNearDups(corpus: DataFrame, threshold: Double,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Norms are computed ONCE per vector before the pair join (O(n·d)), so
    // the O(n²) pair space only pays for a fused dot-product loop — no
    // per-pair array allocation. sqrt(na)·sqrt(nb) keeps the expression
    // bit-identical to dot/(√na·√nb) computed pairwise.
    val norm = (v: Column) => sqrt(graft.functions.dotProduct(v, v))
    val withNorm = corpus.select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"))
    val a = withNorm.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"), col("nrm").as("a_nrm"))
    val b = withNorm.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"), col("nrm").as("b_nrm"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos",
        graft.functions.dotProduct(col("a_vec"), col("b_vec")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos_r"))
  }

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
  /** Multi-probe LSH ANN top-5 for the same query set — rows-only (the
    * bucket assignment uses a seeded hyperplane set not expressible in
    * SQL); recall vs the exact baseline is asserted in SimilaritySpec.
    */
  def knnAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    annKnn(emb, emb.filter(col("vec_id") < 10), k = 5)
  }

  // ---------------------------------------------------------------- q21
  /** Embedding near-dup pairs at cosine ≥ 0.35 (the synthetic corpus has
    * no planted dups; 0.35 surfaces the natural tail so the output is
    * non-trivial and oracle-checkable).
    */
  def embNearDups(spark: SparkSession, dir: String): DataFrame =
    cosineNearDups(Tables.embeddings(spark, dir), threshold = 0.35)

  private val embNearDupsSql =
    """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos_r
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q19_knn_brute", knnBrute _, Some(knnBruteSql)),
    NamedQuery.rowsOnly("q20_knn_ann")(knnAnn _),
    NamedQuery("q21_embedding_neardups", embNearDups _, Some(embNearDupsSql)))
}
