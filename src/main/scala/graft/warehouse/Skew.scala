package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY-extension; the 100 TB survival kit).
  *
  * AQE's skew-join splitting handles sort-merge joins automatically; these
  * cover the cases it can't: hot-key aggregation fan-in and shuffle joins
  * where one key dominates a partition.
  */
object Skew {

  /** Salted two-phase aggregation for hot grouping keys: partial-aggregate
    * on (key, salt) — spreading one hot key over `nSalts` reducers — then
    * final-aggregate on key. Correct for any algebraic aggregate expressed
    * as (partial, merge) pairs; this helper does counts and sums, the
    * common hot-key shapes.
    */
  def saltedCountSum(df: DataFrame, keyCol: String, sumCol: String,
                     nSalts: Int = 16): DataFrame =
    df
      .withColumn("__salt", pmod(rowSpread(df), lit(nSalts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(col(sumCol)).as("__sum"))
      .groupBy(col(keyCol))
      .agg(sum("__cnt").cast("long").as("n"), sum("__sum").as("total"))

  // Deterministic per-row spreading value: hash of all columns (rand()
  // would break retry/replay determinism — a failed task would re-salt
  // differently and double-count on recompute).
  private def rowSpread(df: DataFrame) =
    hash(df.columns.map(col): _*)

  /** Salted shuffle join for a skewed big side: each big-side row picks a
    * deterministic salt; the (smaller) right side is replicated across all
    * salts so every (key, salt) pair can still match. Turns one hot-key
    * partition into `nSalts` even ones at the cost of replicating the
    * right side `nSalts`×.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 nSalts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(nSalts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
