package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private def withoutBroadcast[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("same-bucketed tables join without a shuffle") {
    val orders = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
    val lineitem = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    Bucketed.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketed.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8)

    withoutBroadcast {
      val joined = Bucketed.cogroupJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      joined.collect() // finalize AQE plan
      val plan = joined.queryExecution.executedPlan.toString
      // At tiny scale Spark would rather broadcast (disabled above); the
      // point is the shuffle-exchange-free sort-merge join on bucket scans.
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle; plan:\n${plan.take(2000)}")
      assert(plan.contains("SortMergeJoin"))

      // correctness: same result as the plain parquet join
      val expected = lineitem.join(orders, $"l_orderkey" === $"o_orderkey").count()
      assert(joined.count() == expected)
    }
  }

  test("bucketed aggregation on the bucket key avoids the exchange") {
    val agg = spark.table("b_lineitem").groupBy("o_orderkey")
      .agg(sum("l_quantity").as("q"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"plan:\n${plan.take(2000)}")
  }
}
