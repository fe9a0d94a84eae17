package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Evidence for the 100 TB composition story (VERDICT r01 item 9): the
  * q12 fact-fact join (lineitem ⋈ orders on orderkey) goes SHUFFLE-FREE
  * when both facts are catalog-bucketed on their join key — the exchange
  * that sort-merge pays per query is paid once at write time instead.
  */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("same-bucketed fact tables join with zero Exchange and agree with the plain join") {
    val orders = graft.core.Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = graft.core.Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")

    Bucketed.writeBucketed(lineitem, "li_b", "l_orderkey", 8, Some(tmpDir("bkt-li")))
    Bucketed.writeBucketed(orders, "ord_b", "o_orderkey", 8, Some(tmpDir("bkt-ord")))
    // At test scale Spark would just broadcast these; disable that so the
    // plan is the large-fact × large-fact shape the bucketing exists for.
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val audit = graft.Explain.audit(joined)
      assert(audit.shuffles == 0, s"bucketed fact-fact join must not exchange: $audit")

      // Same rows as the unbucketed join.
      val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)

      // And the downstream per-order aggregation reuses the bucket
      // distribution too: groupBy on the join key adds no exchange.
      val agg = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
      val aggAudit = graft.Explain.audit(agg)
      assert(aggAudit.shuffles == 0, s"bucket-key aggregation must not exchange: $aggAudit")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
