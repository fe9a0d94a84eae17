package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.analytics.{BitIndex, Similarity}

/** Incremental IVF-binary ANN state — the 1-bit face of the encode-once
  * state core ([[CodedIvfStateCore]]): packed sign codes are computed
  * from the DETERMINISTIC seeded plane matrix at ingest
  * ([[BitIndex.encode]] — no training at all), so like [[SqState]] the
  * recluster maintenance verb moves rows between cells without
  * touching a single code word, at 8× less scan weight than SQ8
  * (32 bytes/vector at the default 252 bits). The bundle scan is the
  * fused XOR+popcount Hamming shortlist; queries re-encode under the
  * same plane matrix at search time (their codes are never stored).
  *
  * The plane matrix is seeded PER DIMENSION, so the state PINS the
  * code dimension in its metadata at the first non-empty ingest
  * (`code_dim` — the [[CodedIvfStateCore]] r18 rule) and every later
  * encode — ingest batches AND search-time queries — runs under that
  * one matrix, failing loudly on a ragged row. Before the pin, a
  * micro-batch whose max dim differed re-probed its own matrix and
  * emitted same-LENGTH code arrays: Hamming values looked valid and
  * shortlists went silently wrong once a recluster merged the batches
  * (r17 ADVICE, the medium finding this pin closes).
  */
object BitState extends CodedIvfStateCore {

  override protected def stateName: String = "BitState"

  /** Pin the matrix dimension at the first non-empty ingest (−1 defers
    * the pin past idle leading epochs).
    */
  override protected def probeCodeDim(batch: DataFrame): Long =
    batch.agg(max(size(col("embedding")))).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getInt(0).toLong))
      .filter(_ > 0).getOrElse(-1L)

  /** Every ingest encodes under the PINNED matrix and raises on a
    * ragged row. codeDim < 0 only before the pin — i.e. for an empty
    * batch, which has nothing to encode.
    */
  override protected def encodeBatch(batch: DataFrame, codeDim: Long): DataFrame =
    if (codeDim > 0) BitIndex.encode(batch, "embedding", dim = Some(codeDim.toInt))
    else batch.withColumn("codes", lit(null).cast("array<bigint>"))
      .filter(lit(false))

  override protected def codeCols: Seq[String] = Seq("codes")
  override protected def approxScore: Column =
    graft.functions.hammingDistance(col("q_codes"), col("codes"))
  override protected def approxAsc: Boolean = true
  override protected def exactGuard: Column =
    graft.functions.dotProduct(col("embedding"), col("embedding")) > 0

  /** Queries carry their own codes under the corpus's PINNED plane
    * matrix — a dim-mismatched query raises loudly at scan time instead
    * of encoding under a different matrix. Extra columns (the filter
    * column) ride through untouched.
    */
  override protected def queryFrame(qn: DataFrame, codeDim: Long): DataFrame =
    BitIndex.encode(
        qn.withColumnRenamed("vec_id", "query_id")
          .withColumnRenamed("embedding", "q_vec"),
        "q_vec",
        dim = if (codeDim > 0) Some(codeDim.toInt) else None)
      .withColumnRenamed("codes", "q_codes")

  // --------------------------------------------------------------- q273
  /** End-to-end incremental IVF-binary gate: the q267 protocol with the
    * 1-bit codes — ingest the planted corpus in 3 batches, recluster
    * after the second, search (16 cells, nprobe 4, shortlist 50,
    * top-5). The ~10σ Hamming twin/natural separation (BitIndex
    * scaladoc math) makes the composite answer the exact top-5 —
    * hash-checked against the shared exact-kNN oracle.
    */
  def bitStateKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.plantedKnnCorpus(
      graft.core.Tables.embeddings(spark, dir))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-bitstate")
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
    NamedQuery("q273_bit_state", bitStateKnn _, Some(Similarity.plantedKnnSql)))
}
