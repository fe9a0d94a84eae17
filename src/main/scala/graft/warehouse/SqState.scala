package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.analytics.{Similarity, SqIndex}

/** Incremental IVF-SQ8 ANN state — the SQ8 face of the encode-once
  * state core ([[CodedIvfStateCore]], which carries the full design
  * rationale): IVF→[[IvfState]], PQ→[[PqState]], IVF-PQ→[[IvfPqState]],
  * SQ8→here, binary→[[BitState]], MIPS→[[MipsState]]. Codes are
  * per-vector (scale = max|x|/127, int8 round(x/scale) —
  * [[SqIndex.encode]]), so [[update]] is the family's only encode site
  * and [[recluster]] moves rows between cells carrying committed
  * (scale, codes) verbatim — PqState's retrain MUST re-encode
  * (codebook-relative codes), this one provably does not (SqStateSpec
  * plants an all-42 sentinel code array in a committed delta and
  * watches it survive two recluster generations byte-for-byte). At
  * 100 TB the difference is recluster cost: coarse train + one
  * shuffle-by-cell, zero re-encode FLOPs vs PQ's m·ksub·dim per
  * vector.
  *
  * As the family's serving face it also carries the r18 state verbs'
  * gated queries: metadata-FILTERED state search (q274 — the q272 rule
  * on the LIVE index) and tombstone deletion (q276 — curation without
  * a rebuild).
  */
object SqState extends CodedIvfStateCore {

  override protected def stateName: String = "SqState"
  override protected def encodeBatch(batch: DataFrame, codeDim: Long): DataFrame =
    SqIndex.encode(batch, "embedding")
  override protected def codeCols: Seq[String] = Seq("scale", "codes")
  override protected def approxScore: Column = SqIndex.codeCosine
  override protected def approxAsc: Boolean = false
  override protected def exactGuard: Column = col("scale") > 0

  // --------------------------------------------------------------- q267
  /** End-to-end incremental IVF-SQ8 gate: the q234/q236/q239 protocol on
    * the q266 shape — ingest the planted corpus in 3 batches (encoded at
    * ingest), RECLUSTER after the second (search spans a
    * cell-partitioned int8 bundle AND an encoded raw tail), then search
    * (16 cells, nprobe 4, shortlist 50, top-5). The planted margin
    * dwarfs the probe risk and the ~1e-4 SQ8 cosine distortion, so the
    * composite answer IS the exact top-5 — hash-checked against the
    * shared exact-kNN oracle ([[Similarity.plantedKnnSql]]).
    */
  def sqStateKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(
      graft.core.Tables.embeddings(spark, dir))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-sqstate")
    val statePath = stateRoot.toString + "/state"
    try {
      (0 until 3).foreach { i =>
        update(spark, statePath, corpus.filter(col("vec_id") % 3 === i))
        if (i == 1) recluster(spark, statePath, k = Some(16))
      }
      search(spark, statePath, corpus.filter(col("vec_id") < 10),
        k = 5, nprobe = 4, shortlist = 50)
        .localCheckpoint(eager = true)
    } finally graft.core.Fs.deleteRecursively(stateRoot)
  }

  // --------------------------------------------------------------- q274
  /** Metadata-FILTERED search on the LIVE state — the q272 stratum
    * oracle over the q267 state protocol: the labeled planted corpus
    * (labels derive from the id; twins inherit their SOURCE's label)
    * ingests in 3 batches with `label` as a pinned attr column,
    * reclusters mid-stream, then answers top-5 WITHIN each query's own
    * stratum from a search spanning the cell-partitioned bundle (label
    * as a join key beside the probed cell) AND the unfolded tail (label
    * as the equi-join key). Exact k per stratum by construction — the
    * planted in-stratum twins still dominate, so the answer is the
    * exact stratum top-5, hash-checked against the same DuckDB oracle
    * as q272.
    */
  def sqStateFilteredKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(
      graft.core.Tables.embeddings(spark, dir))
      .withColumn("label",
        when(col("vec_id") < 100000L, col("vec_id") % 3)
          .otherwise(((col("vec_id") - 100000L) / 10).cast("long") % 3))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-sqstate-f")
    val statePath = stateRoot.toString + "/state"
    try {
      (0 until 3).foreach { i =>
        update(spark, statePath, corpus.filter(col("vec_id") % 3 === i),
          attrCols = Seq("label"))
        if (i == 1) recluster(spark, statePath, k = Some(16))
      }
      search(spark, statePath, corpus.filter(col("vec_id") < 10),
        k = 5, nprobe = 4, shortlist = 50, filterCol = Some("label"))
        .localCheckpoint(eager = true)
    } finally graft.core.Fs.deleteRecursively(stateRoot)
  }

  // --------------------------------------------------------------- q276
  /** Tombstone deletion on the LIVE state: ingest a SIX-twin planted
    * corpus in 3 batches with a mid-stream recluster (as q267), then
    * DELETE every query's t=0 twin (ids ≥ 100000 with vec_id % 10 = 0)
    * in one tombstone epoch and search. The victims straddle the fold —
    * those in batches 0/1 sit in the BUNDLE (killed by the id-only
    * anti-join), the batch-2 ones in the TAIL (killed by the
    * batch-ordered one) — and the search must answer top-5 as if they
    * were never ingested: exactly the five SURVIVING twins per query
    * (six are planted so the post-delete top-5 stays entirely inside
    * the planted margin — with five, rank 5 would fall to a NATURAL
    * neighbor, which no margin protects against probe risk),
    * hash-checked against the oracle over the tombstone-free corpus.
    */
  def sqStateDeleteKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(
      graft.core.Tables.embeddings(spark, dir), twinsPerQuery = 6)
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-sqstate-d")
    val statePath = stateRoot.toString + "/state"
    try {
      (0 until 3).foreach { i =>
        update(spark, statePath, corpus.filter(col("vec_id") % 3 === i))
        if (i == 1) recluster(spark, statePath, k = Some(16))
      }
      delete(spark, statePath,
        corpus.filter(col("vec_id") >= 100000L && col("vec_id") % 10 === 0)
          .select("vec_id"))
      search(spark, statePath, corpus.filter(col("vec_id") < 10),
        k = 5, nprobe = 4, shortlist = 50)
        .localCheckpoint(eager = true)
    } finally graft.core.Fs.deleteRecursively(stateRoot)
  }

  /** q276's oracle: the shared planted-kNN SQL over the SIX-twin corpus
    * MINUS the deleted twin set — neighbors must behave as if the
    * tombstoned ids were never ingested.
    */
  private[graft] val plantedDeletedKnnSql =
    """WITH base AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
      |), corpus AS (
      |  SELECT * FROM base
      |  UNION ALL
      |  SELECT 100000 + b.vec_id * 10 + t.t AS vec_id,
      |         list_transform(b.embedding,
      |           (x, i) -> x + ((b.vec_id * 31 + t.t * 7 + i - 1) % 97 - 48) / 2000.0) AS embedding
      |  FROM base b, (SELECT unnest(range(0, 6)) AS t) t
      |  WHERE b.vec_id < 10
      |), live AS (
      |  SELECT * FROM corpus
      |  WHERE NOT (vec_id >= 100000 AND vec_id % 10 = 0)
      |)
      |SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  row_number() OVER (PARTITION BY q.vec_id
      |                     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank,
      |  round(list_cosine_similarity(q.embedding, c.embedding), 4) AS score_r
      |FROM live q JOIN live c ON c.vec_id <> q.vec_id
      |WHERE q.vec_id < 10
      |QUALIFY rank <= 5""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q267_sq_state", sqStateKnn _, Some(Similarity.plantedKnnSql)),
    NamedQuery("q274_sq_state_filtered", sqStateFilteredKnn _,
      Some(SqIndex.plantedFilteredKnnSql)),
    NamedQuery("q276_sq_state_delete", sqStateDeleteKnn _,
      Some(plantedDeletedKnnSql)))
}
