package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared candidate-generation kernel for every LSH family (MinHash
  * bands, hyperplane tables): self-join hash-bucketed rows on their
  * bucket key and emit unordered candidate pairs `a_id < b_id`.
  *
  *  - `maxBucketSize` is the mega-bucket guard: a bucket of B rows emits
  *    B² pairs, so one degenerate bucket can dominate the whole job;
  *    buckets over the cap are dropped from candidate generation (their
  *    members almost always still collide in another, smaller bucket) —
  *    the standard bounded-LSH trade. None = exact banded behavior.
  *  - The input is spread by the bucket key with a PINNED partition
  *    count before joining: bucket explodes inflate row counts without
  *    changing partitioning, so a byte-small input would otherwise have
  *    ONE task produce the entire per-bucket pair fan-out (and AQE would
  *    coalesce an unpinned repartition straight back).
  *
  * Pairs are emitted WITH duplicates (one per shared bucket); callers
  * either `.distinct()` or defer dedup until after their verify step,
  * whichever side of the trade is smaller.
  */
private[analytics] object CandidateJoin {

  def pairs(buckets: DataFrame, idCol: String, keyCols: Seq[String],
            maxBucketSize: Option[Int]): DataFrame = {
    val shufflePartitions = buckets.sparkSession.sessionState.conf.numShufflePartitions
    val spread = buckets.repartition(shufflePartitions, keyCols.map(col): _*)
    val capped = maxBucketSize match {
      case Some(cap) =>
        // Window reuses the pinned (keyCols) partitioning — no second
        // exchange.
        val w = Window.partitionBy(keyCols.map(col): _*)
        spread.withColumn("_bsz", count(lit(1)).over(w))
          .filter(col("_bsz") <= cap).drop("_bsz")
      case None => spread
    }
    capped.alias("x")
      .join(capped.withColumnRenamed(idCol, "b_id").alias("y"), keyCols)
      .filter(col(idCol) < col("b_id"))
      .select(col(idCol).as("a_id"), col("b_id"))
  }
}
