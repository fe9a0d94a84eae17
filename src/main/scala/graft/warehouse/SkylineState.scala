package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery

/** Incremental Pareto-frontier (2D skyline) maintenance — the
  * order-statistics member of the state-table family (HLL: [[SketchState]];
  * GK: [[QuantileState]]; moments: [[MomentsState]]; novelty:
  * [[NoveltyState]]). The skyline is a MERGEABLE summary:
  * frontier(frontier(A) ∪ B) = frontier(A ∪ B), because dominance is
  * monotone (a dominator never leaves the frontier except to a transitive
  * dominator) — so the state stores only the current non-dominated points
  * with their tie counts, updates cost one batch aggregate + a
  * frontier-sized sweep, and replayed batches equal the one-shot skyline
  * exactly. State size is the frontier (per group, ≤ distinct prices),
  * never the history.
  *
  * Same persistence discipline as its siblings: [[StateFiles]] staged swap
  * + crash recovery, in-JVM path lock, opt-in cross-driver [[LeaseLock]].
  */
object SkylineState {

  /** The q133 survivor sweep — delegated to the ONE shared definition
    * ([[graft.analytics.Extended.paretoSweep]]) so the incremental and
    * one-shot faces can never drift apart.
    */
  private def sweep(pts: DataFrame): DataFrame =
    graft.analytics.Extended.paretoSweep(pts)

  /** Fold one batch of raw parts rows (`p_brand`, `p_retailprice`,
    * `p_size`) into the skyline state; returns the post-merge frontier,
    * eagerly materialized so the snapshot survives the next swap.
    */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
             lease: Boolean = false): DataFrame =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statePath)
        val batchPts = batch
          .groupBy(col("p_brand"), col("p_retailprice").as("price"),
            col("p_size").as("sz"))
          .agg(count(lit(1)).as("n"))
        val merged =
          if (!StateFiles.exists(spark, statePath)) sweep(batchPts)
          else sweep(spark.read.parquet(statePath).unionByName(batchPts))
        StateFiles.install(spark, statePath, merged)
        spark.read.parquet(statePath).localCheckpoint(eager = true)
      }
    }

  // --------------------------------------------------------------- q142
  /** End-to-end incremental-skyline gate: fold the part table into the
    * state in 3 batches split by part key, then emit the frontier. The
    * DuckDB oracle runs the genuine quadratic NOT-EXISTS skyline over the
    * WHOLE table in one shot — the hash gate proves 3-batch fold ≡
    * one-shot (mergeability has no error term to hide behind).
    */
  def skylineStateCheck(spark: SparkSession, dir: String): DataFrame = {
    val parts = graft.core.Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
        col("p_size"))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-skystate")
    val statePath = stateRoot.toString + "/state"
    var out: DataFrame = null
    (0 until 3).foreach { i =>
      out = update(spark, statePath, parts.filter(col("p_partkey") % 3 === i))
    }
    graft.core.Fs.deleteRecursively(stateRoot)
    out.select(col("p_brand"), col("price"), col("sz"),
      col("n").as("n_parts"))
  }

  private val skylineStateSql =
    """WITH pts AS (
      |  SELECT p_brand, p_retailprice AS price, p_size AS sz FROM part
      |), fr AS (
      |  SELECT DISTINCT a.p_brand, a.price, a.sz
      |  FROM pts a
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM pts b
      |    WHERE b.p_brand = a.p_brand
      |      AND b.price <= a.price AND b.sz >= a.sz
      |      AND (b.price < a.price OR b.sz > a.sz))
      |)
      |SELECT f.p_brand, f.price, f.sz,
      |  CAST(count(*) AS BIGINT) AS n_parts
      |FROM fr f JOIN pts p
      |  ON p.p_brand = f.p_brand AND p.price = f.price AND p.sz = f.sz
      |GROUP BY 1, 2, 3""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q142_skyline_state", skylineStateCheck _, Some(skylineStateSql)))
}
