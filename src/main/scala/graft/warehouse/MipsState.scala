package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.analytics.{Mips, Similarity, SqIndex}
import graft.functions.dotProduct

/** Incremental MIPS ANN state — the inner-product face of the
  * encode-once state core, answering the M-problem the r17 verdict
  * posed for [[Mips.mipsIvfSq]]: the norm-augmentation reduction
  * (Bachrach et al., RecSys 2014) needs M = max corpus norm, and a
  * growing corpus can RAISE M — one louder batch would invalidate every
  * stored augmented coordinate, colliding with the encode-once
  * invariant. Design decision (the verdict's option (a)): STORE RAW,
  * AUGMENT AT RECLUSTER — pin the M-dependent artifacts to the
  * recluster boundary and the M-independent ones to ingest:
  *
  *   - CODES — SQ8 of the RAW vector: per-vector and M-free, encoded
  *     exactly once at ingest and carried verbatim through every
  *     recluster (the family invariant, sentinel-pinned by
  *     MipsStateSpec exactly like [[SqState]]'s).
  *   - COARSE QUANTIZER — trained at recluster over TRANSIENTLY
  *     augmented vectors [u ; √(M²−‖u‖²)], M recomputed (one
  *     distributed agg, a driver double) over everything committed and
  *     live, so the bundle's cell geometry is always consistent with
  *     its own fold-time M; the transient column is dropped before the
  *     bundle write — the bundle stores raw vectors + codes only, and
  *     NO stored artifact depends on M.
  *   - QUERY PROBE — q → [q ; 0] has no M in it at all: probing the
  *     stored (augmented-space) centroids is well-defined under any
  *     fold-time M, so search needs no stored M either.
  *
  * Why the shortlist rank is M-free too: with the query's augmented
  * coordinate at 0, the augmented cosine's numerator IS the raw inner
  * product and its denominator M·‖q‖ is constant per query — so the
  * approximate rank can skip augmentation entirely and score
  * scale·(q·codes) on the raw SQ8 codes (dot is linear, so the
  * per-vector scale multiplies back in rather than canceling as it
  * does in cosine). The exact re-rank and the tail scan score the raw
  * dot, so emitted scores are true inner products, hash-comparable
  * with [[Mips.bruteMips]].
  *
  * A late batch that RAISES M therefore changes nothing stored: tail
  * rows are scanned exactly by raw dot, and the next recluster
  * re-augments from raw at the new M — augmentation is one column
  * computed inside the fold the state was paying anyway (MipsStateSpec
  * pins a raising-M lifecycle against brute MIPS).
  */
object MipsState extends CodedIvfStateCore {

  override protected def stateName: String = "MipsState"
  override protected def encodeBatch(batch: DataFrame, codeDim: Long): DataFrame =
    SqIndex.encode(batch, "embedding")
  override protected def codeCols: Seq[String] = Seq("scale", "codes")

  /** scale·(q·c) ≈ q·u — the per-query monotone shortlist rank (see
    * scaladoc; ~1e-4 relative SQ8 distortion, inside the planted
    * margin).
    */
  override protected def approxScore: Column =
    col("scale") * dotProduct(col("q_vec"), col("codes").cast("array<double>"))
  override protected def approxAsc: Boolean = false

  /** Dot has no zero-vector NaN edge (a zero vector dots to 0): no
    * guard — the [[Mips]] family rule.
    */
  override protected def exactGuard: Column = lit(true)
  override protected def exactScore: Column =
    dotProduct(col("q_vec"), col("embedding"))

  override protected def probeCol: String = "q_probe"
  override protected def queryFrame(qn: DataFrame, codeDim: Long): DataFrame =
    qn.withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("embedding", "q_vec")
      .withColumn("q_probe", concat(col("q_vec"), array(lit(0.0))))

  /** Fold-time augmentation: M over everything committed and live (one
    * agg), the √(M²−‖u‖²) column transiently attached for coarse
    * training and cell assignment, dropped before the bundle write.
    * The tiny relative headroom keeps √ nonnegative under float noise
    * (the [[Mips.mipsIvfSq]] rule).
    */
  override protected def trainFrame(all: DataFrame): (DataFrame, String) = {
    val m2 = all.agg(max(dotProduct(col("embedding"), col("embedding"))))
      .head().getDouble(0)
    val mm = m2 * (1.0 + 1e-12)
    (all.withColumn("__probe_vec", concat(col("embedding"),
      array(sqrt(greatest(lit(mm) - dotProduct(col("embedding"), col("embedding")),
        lit(0.0)))))), "__probe_vec")
  }

  // --------------------------------------------------------------- q275
  /** End-to-end incremental MIPS gate: the q267 state protocol with the
    * inner-product measure — ingest the planted corpus in 3 batches
    * (raw SQ8 codes at ingest), recluster after the second (M computed
    * at the fold; the third batch arrives AFTER it, exercising the
    * stale-M bundle + exact tail split), search top-5 by raw dot
    * (16 cells, nprobe 4, shortlist 50). The planted margin survives
    * the monotone map and dwarfs probe risk + SQ8 distortion, so the
    * answer is exactly brute MIPS — hash-checked against the q270/q271
    * dot-product oracle.
    */
  def mipsStateKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(
      graft.core.Tables.embeddings(spark, dir))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-mipsstate")
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
    NamedQuery("q275_mips_state", mipsStateKnn _, Some(Mips.plantedMipsSql)))
}
