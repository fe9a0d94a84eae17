package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** r14-verdict item 3: q120's sliding-WAU `countDistinct`-per-window
  * form held each window's user set in one aggregation group — task
  * peak ∝ per-window population (23→101 MB for 10× users,
  * BASELINE.md's first honest q120 decade). The shipped two-level form
  * groups by (window, user) first — distinct state distributes by pair
  * hash, never per window. This spec pins the two forms EQUAL on the
  * real events fixture, so the scale fix can never drift the answer.
  */
class SlidingWauFormSpec extends SparkSpec {

  test("two-level sliding WAU ≡ direct countDistinct form (sf0.001 events)") {
    val dir = "/root/testdata/sf0.001"
    val direct = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .select(col("user_id"), col("day"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("w_day"))
      .groupBy("w_day")
      .agg(countDistinct(when(col("day") === col("w_day"), col("user_id"))).as("dau"),
        countDistinct(col("user_id")).as("wau"))
      .filter(col("dau") > 0)
      .select(date_format(col("w_day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"))
      .withColumn("stickiness_ppm",
        expr("CAST(dau * 1000000 DIV wau AS BIGINT)"))
      .orderBy("day")
      .collect().toSeq.map(_.toSeq)
    val twoLevel = EventAnalytics.slidingActiveUsers(spark, dir)
      .orderBy("day")
      .collect().toSeq.map(_.toSeq)
    assert(twoLevel == direct,
      "two-level WAU form diverged from the direct countDistinct form")
    assert(twoLevel.nonEmpty)
  }
}
