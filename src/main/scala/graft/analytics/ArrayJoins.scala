package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Array-valued foreign keys (the reference's `user.assignedRooms[] ∋
  * room._id` relation, SURVEY.md §2.C).
  *
  * `array_contains` as a join predicate is a non-equi join → Spark plans a
  * BroadcastNestedLoopJoin (O(L×R) comparisons) — fine only when one side
  * is tiny. The scalable form explodes the array into an equi-join: the
  * shuffle is on the element key, cost O(total array elements), and
  * Catalyst can hash- or sort-merge-join it like any other key.
  */
object ArrayJoins {

  /** Explode-based membership join: one output row per (left row, matched
    * right row). `left[arrayCol] ∋ right[keyCol]`.
    */
  def membershipJoin(left: DataFrame, arrayCol: String,
                     right: DataFrame, keyCol: String): DataFrame =
    left
      .withColumn("__elem", explode_outer(col(arrayCol)))
      .join(right, col("__elem") === col(keyCol), "left")
      .drop("__elem")

  /** Inner variant: rows with empty/no-match arrays drop out. */
  def membershipJoinInner(left: DataFrame, arrayCol: String,
                          right: DataFrame, keyCol: String): DataFrame =
    left
      .withColumn("__elem", explode(col(arrayCol)))
      .join(right, col("__elem") === col(keyCol))
      .drop("__elem")
}
