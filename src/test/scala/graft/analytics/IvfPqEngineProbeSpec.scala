package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The r14-verdict lead item: the IVF-PQ QUERY-side probe was the last
  * driver-bound stage of the ANN family — [[IvfPq.lutFrameDriver]]
  * collects the query set and computes coarse probes + residual LUTs in
  * plain Scala (O(|Q|·kCells·dim) serial FLOPs, |Q|·nprobe LUT rows of
  * driver heap). [[IvfPq.lutFrameEngine]] is the O(codebook)-driver
  * replacement (probe via the k-dispatched assign on the query frame,
  * LUTs as expressions over plan-literal codebooks); this spec pins the
  * two arms EQUAL — probe sets, LUT doubles bit-for-bit, end-to-end
  * search rows, the state-search face — and pins the dispatch itself
  * (the IvfJoinAssignSpec discipline, applied to search).
  */
class IvfPqEngineProbeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus: DataFrame =
    Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def forceDriver[A](body: => A): A =
    IvfPq.driverProbeMaxWorkOverride.withValue(Some(Long.MaxValue))(body)

  private def forceEngine[A](body: => A): A =
    IvfPq.driverProbeMaxWorkOverride.withValue(Some(0L))(body)

  test("engine-path LUT frame ≡ driver-path, bit-exact (probe cells, residual LUT doubles)") {
    val c = corpus
    val model = IvfPq.train(c, kCells = 16, m = 8, ksub = 16, iters = 2)
    val queries = c.filter(col("vec_id") < 10)
    // Compare on a canonical ordering; LUT doubles must match to the bit
    // (same left-fold dots, same (qn − 2·dot) + cnorm association).
    def canon(df: DataFrame): Seq[Seq[Any]] =
      rows(df.select("query_id", "cell", "q_vec", "lut")
        .orderBy("query_id", "cell"))
    val (driverDf, driverCells) = IvfPq.lutFrameDriver(
      spark, model, queries, nprobe = 4, "vec_id", "embedding")
    val engineDf = IvfPq.lutFrameEngine(
      model, queries, nprobe = 4, "vec_id", "embedding")
    assert(canon(engineDf) == canon(driverDf),
      "engine-built LUT rows diverged from the driver arm")
    // The dispatched entry point must agree with both arms on the probed
    // cell union (the static-partition-filter input).
    val engineCells = forceEngine {
      IvfPq.lutFrame(spark, model, queries, 4, "vec_id", "embedding")._2
    }
    assert(engineCells.sorted == driverCells.sorted,
      "probed-cell union diverged between the arms")
  }

  test("q238 search is probe-path-invariant (forced engine ≡ forced driver ≡ default)") {
    val c = corpus
    val model = IvfPq.train(c, kCells = 16, m = 8, ksub = 16, iters = 2)
    val indexed = IvfPq.index(c, model)
    val queries = c.filter(col("vec_id") < 10)
    def run(): Seq[Seq[Any]] =
      rows(IvfPq.search(indexed, queries, model, k = 5, nprobe = 4,
        shortlist = 50).orderBy("query_id", "rank"))
    val viaDriver = forceDriver(run())
    val viaEngine = forceEngine(run())
    assert(viaEngine == viaDriver, "search rows changed under the engine probe")
    assert(run() == viaDriver, "default dispatch diverged")
  }

  test("IvfPqState.search face is probe-path-invariant (bundle ∪ tail)") {
    import graft.warehouse.IvfPqState
    val c = corpus
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-ivfpq-probe")
    val statePath = stateRoot.toString + "/state"
    try {
      (0 until 3).foreach { i =>
        IvfPqState.update(spark, statePath, c.filter(col("vec_id") % 3 === i))
        if (i == 1) IvfPqState.recluster(spark, statePath, kCells = Some(16))
      }
      def run(): Seq[Seq[Any]] =
        rows(IvfPqState.search(spark, statePath, c.filter(col("vec_id") < 10),
          k = 5, nprobe = 4, shortlist = 50).orderBy("query_id", "rank"))
      val viaDriver = forceDriver(run())
      val viaEngine = forceEngine(run())
      assert(viaEngine == viaDriver,
        "state search rows changed under the engine probe")
    } finally graft.core.Fs.deleteRecursively(stateRoot)
  }

  test("dispatch: small |Q|·kCells stays a zero-job LocalRelation; above the ceiling the LUT is engine-planned") {
    val c = corpus
    val model = IvfPq.train(c, kCells = 16, m = 8, ksub = 16, iters = 2)
    val queries = c.filter(col("vec_id") < 10)
    // Driver arm: the LUT frame IS precomputed driver data — the whole
    // optimized plan is one LocalRelation. Engine arm: a computed tree
    // (scan → assign → codebook join → LUT expressions); it may CONTAIN
    // LocalRelations (the codebook literals), so the discriminator is
    // the plan ROOT.
    def localRelation(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]
    // |Q|=10 × kCells=16 = 160 ≤ the default 2^20 ceiling → driver arm:
    // the LUT frame is driver data (a LocalRelation), zero probe jobs.
    val (defaultDf, _) =
      IvfPq.lutFrame(spark, model, queries, 4, "vec_id", "embedding")
    assert(localRelation(defaultDf),
      "small-batch probe must stay the driver arm (LocalRelation LUTs)")
    // Forced past the ceiling: the LUT frame is a computed plan over the
    // query scan — nothing query-proportional on the driver.
    val engineDf = forceEngine {
      IvfPq.lutFrame(spark, model, queries, 4, "vec_id", "embedding")._1
    }
    assert(!localRelation(engineDf),
      "above the ceiling the LUT frame must be engine-planned")
  }
}
