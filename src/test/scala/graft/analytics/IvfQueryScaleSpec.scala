package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** r14-verdict item 4: the query-side frame in ANN search joins was
  * broadcast UNCONDITIONALLY (`broadcast(q)` in [[IvfIndex
  * .scoredCandidates]], `broadcast(lutRows)` in [[IvfPq]]) — a hint is a
  * command, and at inference-batch |Q| it ships GBs to every executor.
  * The hint is now gated on [[IvfIndex.queryBroadcastMaxRows]]; this
  * spec pins (a) result invariance across the gate and (b) the plan
  * shape on each side of it: hinted → a broadcast join on `cell`;
  * gated → a shuffle join on `cell` (with AQE's own re-promotion
  * disabled so the assertion reads the policy, not runtime stats).
  */
class IvfQueryScaleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus: DataFrame =
    Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case q: QueryStageExec => p +: flatten(q.plan)
    case r: ReusedExchangeExec => p +: flatten(r.child)
    case _ => p +: p.children.flatMap(flatten)
  }

  /** Run with auto-broadcast (static AND adaptive) off, so the only
    * broadcast joins in a plan are the ones a HINT put there.
    */
  private def noAutoBroadcast[A](body: => A): A = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      saved.foreach { case (k, _) => conf.set(k, "-1") }
      body
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** Count (broadcast, shuffled) joins keyed on `cell` whose one side
    * carries the QUERY frame (a `query_id` output column) — the
    * codebook join inside the index build is also cell-keyed but joins
    * corpus↔centroids, and must not count against the policy.
    */
  private def cellJoins(df: DataFrame): (Int, Int) = {
    df.write.mode("overwrite").format("noop").save()
    val all = flatten(df.queryExecution.executedPlan)
    def onCellQuerySide(keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                        sides: Seq[SparkPlan]): Boolean =
      keys.exists(_.toString.contains("cell")) &&
        sides.exists(_.output.exists(_.name == "query_id"))
    val bcast = all.count {
      case j: BroadcastHashJoinExec => onCellQuerySide(j.leftKeys, Seq(j.left, j.right))
      case _ => false
    }
    val shuffled = all.count {
      case j: SortMergeJoinExec => onCellQuerySide(j.leftKeys, Seq(j.left, j.right))
      case j: ShuffledHashJoinExec => onCellQuerySide(j.leftKeys, Seq(j.left, j.right))
      case _ => false
    }
    (bcast, shuffled)
  }

  test("flat IVF: above the |Q| gate the query side is NOT broadcast — " +
    "cell join shuffles; results invariant") {
    val c = corpus
    val model = IvfIndex.train(c, k = 16, iters = 2)
    val indexed = IvfIndex.index(c, model)
    val queries = c.filter(col("vec_id") < 10)
    def search(): DataFrame =
      IvfIndex.search(indexed, queries, model, k = 5, nprobe = 4)
        .orderBy("query_id", "rank")
    noAutoBroadcast {
      val (hinted, gated) = (
        IvfIndex.queryBroadcastMaxRowsOverride.withValue(Some(Long.MaxValue)) {
          (cellJoins(search()), rows(search()))
        },
        IvfIndex.queryBroadcastMaxRowsOverride.withValue(Some(0L)) {
          (cellJoins(search()), rows(search()))
        })
      assert(hinted._1._1 >= 1,
        s"small-|Q| path must broadcast the probe frame, got ${hinted._1}")
      assert(gated._1._1 == 0 && gated._1._2 >= 1,
        s"gated path must shuffle-join on cell with no query-side " +
          s"broadcast, got ${gated._1}")
      assert(gated._2 == hinted._2, "results changed across the broadcast gate")
    }
  }

  test("IVF-PQ: the LUT join obeys the same gate; results invariant") {
    val c = corpus
    val model = IvfPq.train(c, kCells = 16, m = 8, ksub = 16, iters = 2)
    val indexed = IvfPq.index(c, model)
    val queries = c.filter(col("vec_id") < 10)
    def search(): DataFrame =
      IvfPq.search(indexed, queries, model, k = 5, nprobe = 4, shortlist = 50)
        .orderBy("query_id", "rank")
    noAutoBroadcast {
      val hinted = IvfIndex.queryBroadcastMaxRowsOverride
        .withValue(Some(Long.MaxValue)) { (cellJoins(search()), rows(search())) }
      val gated = IvfIndex.queryBroadcastMaxRowsOverride
        .withValue(Some(0L)) { (cellJoins(search()), rows(search())) }
      assert(hinted._1._1 >= 1,
        s"small-|Q| path must broadcast the LUT frame, got ${hinted._1}")
      assert(gated._1._1 == 0 && gated._1._2 >= 1,
        s"gated LUT join must shuffle on cell, got ${gated._1}")
      assert(gated._2 == hinted._2, "results changed across the broadcast gate")
    }
  }

  test("state tails pick the bounded broadcast side: results invariant across the gate") {
    import graft.warehouse.IvfState
    val c = corpus
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-ivf-qscale")
    val statePath = stateRoot.toString + "/state"
    try {
      (0 until 3).foreach { i =>
        IvfState.update(spark, statePath, c.filter(col("vec_id") % 3 === i))
        if (i == 1) IvfState.recluster(spark, statePath, k = Some(16))
      }
      def run(): Seq[Seq[Any]] =
        rows(IvfState.search(spark, statePath, c.filter(col("vec_id") < 10),
          k = 5, nprobe = 4).orderBy("query_id", "rank"))
      val small = IvfIndex.queryBroadcastMaxRowsOverride
        .withValue(Some(Long.MaxValue))(run())
      val large = IvfIndex.queryBroadcastMaxRowsOverride
        .withValue(Some(0L))(run())
      assert(large == small,
        "state tail search changed across the broadcast-side choice")
    } finally graft.core.Fs.deleteRecursively(stateRoot)
  }
}
