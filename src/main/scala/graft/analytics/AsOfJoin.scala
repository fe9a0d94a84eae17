package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the latest right row with
  * `rightTime <= leftTime` on the same key. Spark has no native ASOF join;
  * the scalable composition is union + running `last(ignoreNulls)`:
  *
  *   1. tag and union both sides on (key, time) with right rows sorting
  *      before left rows at equal timestamps (so `<=` semantics hold),
  *   2. one window pass per key carries the most recent right payload
  *      forward,
  *   3. keep the left rows.
  *
  * Cost: ONE shuffle on the key (the window partition), O(L + R) rows —
  * no range-condition nested loop, no per-row binary search structure.
  * This is the standard log-merge formulation used by time-series stores;
  * it scales to arbitrarily large sides because neither is broadcast.
  *
  * Right rows must be unique per (key, time) for deterministic results —
  * pre-collapse with [[graft.warehouse.MergeWriter.latestByKey]] if not.
  * Unmatched left rows keep a null payload (left-join semantics).
  */
object AsOfJoin {

  def asOfBackward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      asofCol: String = "asof",
      toleranceSec: Option[Long] = None): DataFrame = {

    val rw = right.select(
      col(rightKey).as("__k"),
      col(rightTime).cast("timestamp").as("__t"),
      struct(right.columns.map(col): _*).as("__r"),
      lit(1).as("__isR"))
    val rType = rw.schema("__r").dataType

    val lw = left.select(
      col(leftKey).as("__k"),
      col(leftTime).cast("timestamp").as("__t"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(0).as("__isR"))
    val lType = lw.schema("__l").dataType

    val unioned = lw.withColumn("__r", lit(null).cast(rType))
      .unionByName(rw.withColumn("__l", lit(null).cast(lType)))

    // Right-before-left at equal timestamps → a left row at time t sees a
    // right row at exactly t (inclusive as-of).
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn(asofCol, last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__isR") === 0)
    // pandas-style tolerance: a match older than `toleranceSec` nulls out.
    val bounded = toleranceSec match {
      case Some(tol) => matched.withColumn(asofCol,
        when(col(s"$asofCol.$rightTime").cast("timestamp").cast("long")
          >= col("__t").cast("long") - tol, col(asofCol)))
      case None => matched
    }
    bounded.select(col("__l.*"), col(asofCol))
  }

  /** As-of FORWARD join — for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` on the same key (pandas `merge_asof
    * direction='forward'`), optionally bounded by `toleranceSec` (a
    * match farther than the tolerance nulls out, exactly pandas'
    * `tolerance=`). Same log-merge shape as [[asOfBackward]] — the scan
    * just runs time-DESCENDING, so the running `last` carries the
    * nearest FUTURE right row; still one key shuffle, O(L + R), no
    * range nested loop.
    */
  def asOfForward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      asofCol: String = "asof",
      toleranceSec: Option[Long] = None): DataFrame = {

    val rw = right.select(
      col(rightKey).as("__k"),
      col(rightTime).cast("timestamp").as("__t"),
      struct(right.columns.map(col): _*).as("__r"),
      lit(1).as("__isR"))
    val rType = rw.schema("__r").dataType

    val lw = left.select(
      col(leftKey).as("__k"),
      col(leftTime).cast("timestamp").as("__t"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(0).as("__isR"))
    val lType = lw.schema("__l").dataType

    val unioned = lw.withColumn("__r", lit(null).cast(rType))
      .unionByName(rw.withColumn("__l", lit(null).cast(lType)))

    // Descending scan with right-before-left at equal timestamps → a
    // left row at time t sees a right row at exactly t (inclusive).
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").desc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn(asofCol, last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__isR") === 0)
    val bounded = toleranceSec match {
      case Some(tol) => matched.withColumn(asofCol,
        when(col(s"$asofCol.$rightTime").cast("timestamp").cast("long")
          <= col("__t").cast("long") + tol, col(asofCol)))
      case None => matched
    }
    bounded.select(col("__l.*"), col(asofCol))
  }
}
