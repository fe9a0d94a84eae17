package graft.analytics

import graft.SparkSpec

class ExtendedSpec extends SparkSpec {

  test("HLL approx distinct stays within the configured error of exact") {
    val out = Extended.approxDistinctUsersFull(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.1,
        s"${r.getAs[String]("event_type")}: approx $approx vs exact $exact")
    }
  }

  test("approx percentile sketch tracks the exact percentiles per group") {
    val dir = "/root/testdata/sf0.001"
    def byFlag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"), r.getAs[Double]("p99"))).toMap
    val exact = byFlag(Extended.pricePercentiles(spark, dir))
    val approx = byFlag(Extended.pricePercentilesApprox(spark, dir))
    assert(approx.keySet == exact.keySet)
    // At accuracy 10000 the rank error is ~1e-4; on this distribution the
    // relative value error stays well inside 2%.
    exact.foreach { case (flag, (e50, e95, e99)) =>
      val (a50, a95, a99) = approx(flag)
      Seq((a50, e50), (a95, e95), (a99, e99)).foreach { case (a, e) =>
        assert(math.abs(a - e) / e <= 0.02, s"$flag: approx $a vs exact $e")
      }
    }
  }
}
