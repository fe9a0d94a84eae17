package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The flat-PQ face of the r15 probe-dispatch symmetry: [[PqIndex
  * .scoredShortlist]] collected the query set and built ADC LUTs
  * driver-side unconditionally — the same |Q| driver-memory ceiling the
  * IVF-PQ probe had. Above [[IvfIndex.queryBroadcastMaxRows]] the LUTs
  * now build engine-side (map-side expressions over plan-literal
  * codebooks) and the crossJoin's broadcast hint drops. This spec pins
  * the two arms bit-equal — LUT doubles, end-to-end searchAdc rows, the
  * PqState bundle∪tail face — per the IvfPqEngineProbeSpec pattern.
  */
class PqEngineLutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus: DataFrame =
    Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def forceEngine[A](body: => A): A =
    IvfIndex.queryBroadcastMaxRowsOverride.withValue(Some(0L))(body)

  test("engine-arm LUT rows ≡ driver-arm, bit-exact") {
    val c = corpus
    val model = PqIndex.train(c, m = 8, ksub = 16, iters = 2)
    val queries = c.filter(col("vec_id") < 10)
    def canon(df: DataFrame): Seq[Seq[Any]] =
      rows(df.select("query_id", "q_vec", "lut").orderBy("query_id"))
    val driver = canon(PqIndex.lutRowsDriver(spark, model, queries,
      "vec_id", "embedding"))
    val engine = canon(PqIndex.lutRowsEngine(model, queries,
      "vec_id", "embedding"))
    assert(engine == driver, "engine-built flat-PQ LUTs diverged from the driver arm")
  }

  test("q117 searchAdc is LUT-arm-invariant (forced engine ≡ default driver)") {
    val c = corpus
    val model = PqIndex.train(c, m = 8, ksub = 16, iters = 2)
    val encoded = PqIndex.encode(c, model)
    val queries = c.filter(col("vec_id") < 10)
    def run(): Seq[Seq[Any]] =
      rows(PqIndex.searchAdc(encoded, queries, model, k = 5, shortlist = 50)
        .orderBy("query_id", "rank"))
    val default = run()
    val engine = forceEngine(run())
    assert(engine == default, "searchAdc rows changed under the engine LUT arm")
  }

  test("PqState.search face is LUT-arm-invariant (bundle ∪ tail)") {
    import graft.warehouse.PqState
    val c = corpus
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-pq-lut")
    val statePath = stateRoot.toString + "/state"
    try {
      (0 until 3).foreach { i =>
        PqState.update(spark, statePath, c.filter(col("vec_id") % 3 === i))
        if (i == 1) PqState.retrain(spark, statePath)
      }
      def run(): Seq[Seq[Any]] =
        rows(PqState.search(spark, statePath, c.filter(col("vec_id") < 10),
          k = 5, shortlist = 50).orderBy("query_id", "rank"))
      val default = run()
      val engine = forceEngine(run())
      assert(engine == default, "PqState search rows changed under the engine LUT arm")
    } finally graft.core.Fs.deleteRecursively(stateRoot)
  }
}
