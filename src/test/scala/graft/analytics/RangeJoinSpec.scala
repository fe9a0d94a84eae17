package graft.analytics

import org.apache.spark.sql.functions._

import graft.{Explain, SparkSpec}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = (0L to 200L by 3).toDF("pt")
  // Mixed shapes: bin-aligned, bin-straddling, empty (hi == lo),
  // single-element, sub-bin, and overlapping intervals.
  private def intervals = Seq(
    (1L, 0L, 50L), (2L, 47L, 113L), (3L, 113L, 113L),
    (4L, 150L, 151L), (5L, 90L, 95L), (6L, 40L, 60L))
    .toDF("iv_id", "lo", "hi")

  private def naivePairs: Set[(Long, Long)] =
    points.crossJoin(intervals)
      .filter(col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("iv_id", "pt").as[(Long, Long)].collect().toSet

  test("binned join equals the naive non-equi join, pairs exactly once") {
    val got = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", binWidth = 10)
      .select("iv_id", "pt")
    val rows = got.as[(Long, Long)].collect().toSeq
    assert(rows.toSet == naivePairs)
    assert(rows.size == rows.toSet.size, "a pair must match in exactly one bin")
    assert(!rows.exists(_._1 == 3L), "empty interval (hi == lo) must drop out")
  }

  test("bin width does not change the result") {
    Seq(1L, 7L, 64L, 1000L).foreach { w =>
      val got = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", w)
        .select("iv_id", "pt").as[(Long, Long)].collect().toSet
      assert(got == naivePairs, s"binWidth=$w diverged")
    }
  }

  test("lo is inclusive, hi is exclusive") {
    val p = Seq(10L, 19L, 20L).toDF("pt")
    val iv = Seq((1L, 10L, 20L)).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, "pt", iv, "lo", "hi", binWidth = 5)
      .select("pt").as[Long].collect().toSet
    assert(got == Set(10L, 19L))
  }

  test("binned plan is equi-join shaped — no nested-loop/cartesian join") {
    val s = Explain.audit(
      RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", binWidth = 10))
    assert(s.nestedLoops == 0, s"range join must stay bin-bucketed: $s")
  }

  test("q55 keeps zero-shipment windows") {
    // Fabricate an interval far outside every point: count must be 0,
    // not a dropped row — q55's left join guards exactly this.
    val iv = Seq((1L, 1000000L, 1001000L), (2L, 0L, 300L)).toDF("iv_id", "lo", "hi")
    val joined = RangeJoin.pointInInterval(points, "pt", iv, "lo", "hi", binWidth = 1000)
      .groupBy("iv_id").agg(count(lit(1)).as("n"))
    val kept = iv.select("iv_id").join(joined, Seq("iv_id"), "left")
      .select(col("iv_id"), coalesce(col("n"), lit(0L)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(kept(1L) == 0L && kept(2L) == points.count())
  }
}
