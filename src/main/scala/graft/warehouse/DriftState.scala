package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery

/** Incremental drift-monitor state — the monitoring member of the exact
  * state-table family (moments: [[MomentsState]]; covariance:
  * [[CovarianceState]]): persist per (group, bin) REFERENCE and CURRENT
  * counts and fold each production batch in by plain BIGINT addition, so
  * "is today's traffic drifting off the training distribution?" never
  * re-scans history. The reference histogram is frozen once (the
  * training-window snapshot a model ships with); current counts
  * accumulate per batch; the PSI read is [[graft.analytics.Statistics
  * .psiFromCounts]] — LITERALLY the q183 kernel, so the monitored score
  * and the one-shot score cannot drift an ulp apart.
  *
  * Integer sums are order-independent, so replayed/permuted batches
  * equal the one-shot aggregate bit-for-bit — no error term at all.
  * State is (groups × bins)-sized; updates cost one batch scan.
  *
  * Same persistence discipline as its siblings: [[StateFiles]] staged
  * swap + crash recovery, in-JVM path lock, opt-in [[LeaseLock]].
  */
object DriftState {

  private def binCounts(batch: DataFrame, groupCols: Seq[String],
                        binCol: String, side: String): DataFrame =
    batch.groupBy(groupCols.map(col) :+ col(binCol).as("bin"): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("n_ref", if (side == "ref") col("n") else lit(0L))
      .withColumn("n_cur", if (side == "cur") col("n") else lit(0L))
      .drop("n")

  private def fold(spark: SparkSession, statePath: String, delta: DataFrame,
                   groupCols: Seq[String], lease: Boolean): DataFrame =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statePath)
        val keys = groupCols :+ "bin"
        val merged =
          if (!StateFiles.exists(spark, statePath)) delta
          else spark.read.parquet(statePath)
            .unionByName(delta)
            .groupBy(keys.map(col): _*)
            .agg(sum("n_ref").as("n_ref"), sum("n_cur").as("n_cur"))
        StateFiles.install(spark, statePath, merged)
        spark.read.parquet(statePath).localCheckpoint(eager = true)
      }
    }

  /** Freeze (or extend) the reference histogram from a training-window
    * batch. `binCol` must already hold the integer bin id.
    */
  def initReference(spark: SparkSession, statePath: String, ref: DataFrame,
                    groupCols: Seq[String], binCol: String,
                    lease: Boolean = false): DataFrame =
    fold(spark, statePath, binCounts(ref, groupCols, binCol, "ref"),
      groupCols, lease)

  /** Fold one production batch into the CURRENT side of the state. */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
             groupCols: Seq[String], binCol: String,
             lease: Boolean = false): DataFrame =
    fold(spark, statePath, binCounts(batch, groupCols, binCol, "cur"),
      groupCols, lease)

  /** Current PSI table — a state-table read through the q183 kernel; no
    * history scan. One row per (group, bin) with the ppm term.
    */
  def psiSnapshot(spark: SparkSession, statePath: String, groupCol: String,
                  nBins: Int): DataFrame =
    graft.analytics.Statistics.psiFromCounts(
      spark.read.parquet(statePath), groupCol, nBins)

  // --------------------------------------------------------------- q185
  /** End-to-end incremental-drift gate: freeze the pre-1998 order-price
    * histogram as the reference, fold the 1998+ orders in as THREE
    * production batches split by order key, and emit the PSI snapshot.
    * The DuckDB oracle computes the one-shot PSI over the full corpus —
    * so the hash gate proves frozen-ref + 3-batch fold ≡ one-shot
    * exactly, PSI arithmetic included (same output schema as q183).
    */
  def driftStateCheck(spark: SparkSession, dir: String): DataFrame = {
    val binned = graft.core.Tables.orders(spark, dir)
      .join(broadcast(graft.core.Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"),
        col("c_mktsegment").as("segment"),
        (year(col("o_orderdate")) < 1998).as("is_ref"),
        expr("least(CAST(round(o_totalprice * 100) AS BIGINT) div 5000000, 9)")
          .as("bin"))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-dstate")
    val statePath = stateRoot.toString + "/state"
    initReference(spark, statePath, binned.filter(col("is_ref")),
      Seq("segment"), "bin")
    (0 until 3).foreach { i =>
      update(spark, statePath,
        binned.filter(!col("is_ref") && col("o_orderkey") % 3 === i),
        Seq("segment"), "bin")
    }
    val out = psiSnapshot(spark, statePath, "segment", 10)
      .select(col("segment"), col("bin"), col("n_ref"), col("n_cur"),
        col("tot_ref"), col("tot_cur"), col("term_ppm"))
      .localCheckpoint(eager = true)
    // Snapshot is checkpointed; reclaim scratch state (the q70 lesson).
    graft.core.Fs.deleteRecursively(stateRoot)
    out
  }

  // One-shot PSI over the same corpus — identical to the q183 oracle by
  // construction (the state fold must reproduce it exactly).
  private val driftStateSql =
    """WITH binned AS (
      |  SELECT c.c_mktsegment AS segment,
      |    year(o.o_orderdate) < 1998 AS is_ref,
      |    least(CAST(round(o.o_totalprice * 100) AS BIGINT) // 5000000, 9)
      |      AS bin
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |),
      |counts AS (
      |  SELECT segment, bin,
      |    sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
      |    sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
      |  FROM binned GROUP BY 1, 2
      |),
      |tot AS (
      |  SELECT *, sum(n_ref) OVER (PARTITION BY segment) AS tot_ref,
      |    sum(n_cur) OVER (PARTITION BY segment) AS tot_cur
      |  FROM counts
      |)
      |SELECT segment, CAST(bin AS BIGINT) AS bin,
      |  CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
      |  CAST(tot_ref AS BIGINT) AS tot_ref, CAST(tot_cur AS BIGINT) AS tot_cur,
      |  CAST(floor(
      |    ((n_ref + 1)::DOUBLE / (tot_ref + 10)::DOUBLE
      |     - (n_cur + 1)::DOUBLE / (tot_cur + 10)::DOUBLE)
      |    * ln(((n_ref + 1)::DOUBLE / (tot_ref + 10)::DOUBLE)
      |         / ((n_cur + 1)::DOUBLE / (tot_cur + 10)::DOUBLE))
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS term_ppm
      |FROM tot""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q185_drift_state", driftStateCheck _, Some(driftStateSql)))
}
