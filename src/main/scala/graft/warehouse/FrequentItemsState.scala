package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.functions.FrequentItems

/** Incremental heavy-hitters maintenance — the frequent-items member of
  * the state-table family (HLL distincts: [[SketchState]]; GK quantiles:
  * [[QuantileState]]; exact moments: [[MomentsState]]): per group,
  * persist a Misra–Gries summary (≤ `capacity` counters) plus the item
  * total, and fold each batch in by MG-merge. "What are tonight's top
  * items per group?" then never re-scans history: state is
  * groups × capacity-sized, an update costs one batch scan, and the
  * classic MG bounds hold for the UNION of everything folded so far —
  * every item with true frequency > n/(capacity+1) is present, and each
  * kept counter undercounts by at most n/(capacity+1).
  *
  * When the item domain is smaller than `capacity` the sketch never
  * evicts, so estimates are EXACT counts and the fold is deterministic
  * on any partitioning — the regime the q112 oracle gate runs in (the
  * eviction regime's bounds are spec-tested instead: summary content
  * under eviction legitimately depends on merge order, which is why no
  * cross-engine hash gate can pin it).
  *
  * Same persistence discipline as its siblings: [[StateFiles]] staged
  * swap + crash recovery, in-JVM path lock, opt-in cross-driver
  * [[LeaseLock]]. The state carries its capacity and an update with a
  * different one fails loudly (the QuantileSketch epsilon lesson —
  * silently merging looser sketches voids the stated bound).
  */
object FrequentItemsState {

  /** Fold one batch of `itemCol` (any column; folded as string) into the
    * state at `statePath`; returns the post-merge estimates, eagerly
    * materialized so the snapshot survives the next swap.
    */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
             groupCols: Seq[String], itemCol: String, capacity: Int,
             lease: Boolean = false): DataFrame =
    graft.core.PathLocks.forPath(statePath).synchronized {
      LeaseLock.withLease(spark, statePath, lease) {
        StateFiles.recover(spark, statePath)
        import spark.implicits._
        val gs = groupCols.map(col)
        val mgB = udaf(new FrequentItems.MisraGries(capacity))
        val mgM = udaf(new FrequentItems.MisraGriesMerge(capacity))
        val batchSketch = batch
          .filter(col(itemCol).isNotNull)
          .groupBy(gs: _*)
          .agg(mgB(col(itemCol).cast("string")).as("mg"),
            count(lit(1)).as("n_items"))
          .withColumn("capacity", lit(capacity))
        val merged =
          if (!StateFiles.exists(spark, statePath)) batchSketch
          else {
            val stored = spark.read.parquet(statePath)
            val caps = stored.select("capacity").distinct()
              .collect().map(_.getInt(0))
            require(caps.forall(_ == capacity),
              s"state capacity mismatch: persisted ${caps.mkString(",")}, " +
                s"configured $capacity — rebuild the state with one capacity")
            stored.unionByName(batchSketch)
              .groupBy(gs: _*)
              .agg(mgM(col("mg")).as("mg"), sum("n_items").as("n_items"))
              .withColumn("capacity", lit(capacity))
          }
        StateFiles.install(spark, statePath, merged)
        estimates(spark, statePath, groupCols).localCheckpoint(eager = true)
      }
    }

  /** Current per-group heavy-hitter estimates — a state-table read, no
    * history scan. `max_undercount` = n_items div (capacity+1) is the MG
    * bound: `est ≤ true ≤ est + max_undercount`, and any item whose true
    * count exceeds max_undercount is guaranteed present.
    */
  def estimates(spark: SparkSession, statePath: String,
                groupCols: Seq[String]): DataFrame =
    spark.read.parquet(statePath)
      .select(groupCols.map(col) ++ Seq(explode(col("mg")).as(Seq("item", "est")),
        col("n_items"), col("capacity")): _*)
      .withColumn("max_undercount", expr("n_items div (capacity + 1)"))
      .drop("capacity")

  // --------------------------------------------------------------- q112
  /** End-to-end incremental heavy-hitters gate: fold lineitem quantities
    * (domain 1..50 < capacity 64 ⇒ the exact, deterministic regime) into
    * the state in 3 batches split by order key, then emit every group's
    * item estimates. The DuckDB oracle counts the full corpus in one
    * shot — the hash gate proves 3-batch MG fold ≡ one-shot exact
    * counts, the merge invariant that makes the state table trustworthy.
    */
  def frequentStateCheck(spark: SparkSession, dir: String): DataFrame = {
    val items = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").cast("string").as("qty"))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft-fstate")
    val statePath = stateRoot.toString + "/state"
    var out: DataFrame = null
    (0 until 3).foreach { i =>
      out = update(spark, statePath, items.filter(col("l_orderkey") % 3 === i),
        Seq("flag"), "qty", capacity = 64)
    }
    graft.core.Fs.deleteRecursively(stateRoot)
    out.select(col("flag"), col("item"), col("est"), col("n_items"),
      col("max_undercount"))
  }

  private val frequentStateSql =
    """WITH items AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS item
      |  FROM lineitem
      |),
      |totals AS (SELECT flag, count(*) AS n_items FROM items GROUP BY 1)
      |SELECT i.flag, i.item, count(*) AS est, t.n_items,
      |  CAST(t.n_items // 65 AS BIGINT) AS max_undercount
      |FROM items i JOIN totals t ON t.flag = i.flag
      |GROUP BY i.flag, i.item, t.n_items""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q112_frequent_state", frequentStateCheck _,
      Some(frequentStateSql)))
}
