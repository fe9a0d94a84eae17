package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.analytics.{Similarity, SqIndex}

/** Incremental IVF-SQ8 ANN state — the SQ8 face of the encode-once
  * state core ([[CodedIvfStateCore]], which carries the full design
  * rationale): IVF→[[IvfState]], PQ→[[PqState]], IVF-PQ→[[IvfPqState]],
  * SQ8→here, binary→[[BitState]]. Codes are per-vector
  * (scale = max|x|/127, int8 round(x/scale) — [[SqIndex.encode]]), so
  * [[update]] is the family's only encode site and [[recluster]] moves
  * rows between cells carrying committed (scale, codes) verbatim —
  * PqState's retrain MUST re-encode (codebook-relative codes), this
  * one provably does not (SqStateSpec plants an all-42 sentinel code
  * array in a committed delta and watches it survive two recluster
  * generations byte-for-byte). At 100 TB the difference is recluster
  * cost: coarse train + one shuffle-by-cell, zero re-encode FLOPs vs
  * PQ's m·ksub·dim per vector.
  */
object SqState extends CodedIvfStateCore {

  override protected def stateName: String = "SqState"
  override protected def encodeBatch(batch: DataFrame): DataFrame =
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

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q267_sq_state", sqStateKnn _, Some(Similarity.plantedKnnSql)))
}
