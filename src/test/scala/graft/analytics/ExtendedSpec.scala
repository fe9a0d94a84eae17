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
}
