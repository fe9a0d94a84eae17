package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("top-k aggregator: hand case with duplicate scores uses the (key, sub) tiebreak") {
    val df = Seq(
      ("g1", 5.0, 10L, 1L),
      ("g1", 5.0, 9L, 2L), // same score → lower key wins the higher rank
      ("g1", 7.0, 20L, 1L),
      ("g1", 1.0, 1L, 1L), // below the k=3 cut
      ("g1", 5.0, 9L, 1L), // same score+key → lower sub first
      ("g2", 2.0, 3L, 1L)
    ).toDF("g", "s", "k", "sub")
    val got = TopK.grouped(df, Seq("g"), col("s"), col("k"), col("sub"), 3)
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Int]("rank"),
        r.getAs[Double]("score"), r.getAs[Long]("key"), r.getAs[Long]("sub")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      ("g1", 1, 7.0, 20L, 1L),
      ("g1", 2, 5.0, 9L, 1L),
      ("g1", 3, 5.0, 9L, 2L),
      ("g2", 1, 2.0, 3L, 1L)))
  }

  test("top-k aggregator equals the row_number window form on lineitem") {
    val li = graft.core.Tables.lineitem(spark, dir)
    val viaAgg = graft.analytics.Extended.topkSupplierItems(spark, dir)
      .collect().map(r => (r.getAs[Long]("l_suppkey"), r.getAs[Int]("rank"),
        r.getAs[Double]("price"), r.getAs[Long]("order_key"),
        r.getAs[Long]("line_no"))).toSet
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val viaWindow = li
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("l_suppkey"), col("rank"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber").cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("top-k aggregator is partition-invariant (merge path exercised)") {
    val base = (1 to 500).map(i => ("g" + (i % 7), i.toDouble % 13, i.toLong, 0L))
    val df1 = base.toDF("g", "s", "k", "sub").repartition(1)
    val df17 = base.toDF("g", "s", "k", "sub").repartition(17)
    def run(df: org.apache.spark.sql.DataFrame) =
      TopK.grouped(df, Seq("g"), col("s"), col("k"), col("sub"), 5)
        .collect().map(r => (r.getAs[String]("g"), r.getAs[Int]("rank"),
          r.getAs[Long]("key"))).toSet
    assert(run(df1) == run(df17))
  }

  test("top-k plan: partial ObjectHashAggregate, no Window, no global sort") {
    val plan = graft.analytics.Extended.topkSupplierItems(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      "typed Aggregator must run as ObjectHashAggregate")
    // The partial mode must be on the TopK aggregate's own line — a
    // partial_count elsewhere in the plan must not satisfy this pin.
    assert(plan.split("\n").exists(l => l.contains("ObjectHashAggregate")
      && l.toLowerCase.contains("partial_topkagg")),
      s"map-side partial top-k aggregation must be present:\n$plan")
    assert(!plan.contains("Window"),
      "the aggregator form must not fall back to a window")
  }
}
