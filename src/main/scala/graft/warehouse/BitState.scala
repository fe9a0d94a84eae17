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
  */
object BitState extends CodedIvfStateCore {

  override protected def stateName: String = "BitState"
  override protected def encodeBatch(batch: DataFrame): DataFrame =
    BitIndex.encode(batch, "embedding")
  override protected def codeCols: Seq[String] = Seq("codes")
  override protected def approxScore: Column =
    graft.functions.hammingDistance(col("q_codes"), col("codes"))
  override protected def approxAsc: Boolean = true
  override protected def exactGuard: Column =
    graft.functions.dotProduct(col("embedding").cast("array<double>"),
      col("embedding").cast("array<double>")) > 0

  /** Queries carry their own codes under the corpus's plane matrix —
    * the same seeded defaults [[encodeBatch]] used at ingest.
    */
  override protected def queryFrame(qn: DataFrame): DataFrame =
    BitIndex.encode(
        qn.select(col("vec_id").as("query_id"), col("embedding").as("q_vec")),
        "q_vec")
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
