package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Explain, SparkSpec}

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val BinWidthKey = new RangeJoinRewrite().BinWidthKey

  /** Run `f` with the rewrite installed and a bin width set. */
  private def withRule[T](width: Long)(f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ new RangeJoinRewrite
    spark.conf.set(BinWidthKey, width.toString)
    try f
    finally {
      spark.conf.unset(BinWidthKey)
      spark.experimental.extraOptimizations = prev
    }
  }

  private def points = (0L to 200L by 3).toDF("pt")
  private def intervals = Seq(
    (1L, 0L, 50L), (2L, 47L, 113L), (3L, 113L, 113L), (4L, 150L, 151L), (5L, 90L, 95L))
    .toDF("iv_id", "lo", "hi")

  private def naive: DataFrame =
    points.join(intervals, col("pt") >= col("lo") && col("pt") < col("hi"))

  test("the naive non-equi join gains a binned equi branch carrying the data") {
    val baseline = Explain.audit(naive)
    assert(baseline.nestedLoops > 0 && baseline.smj + baseline.broadcast == 0,
      s"without the rule this must be BNLJ-only: $baseline")
    val expected = naive.select("iv_id", "pt").as[(Long, Long)].collect().toSet
    withRule(width = 10) {
      val s = Explain.audit(naive)
      // The plan splits: narrow intervals take the new equi join; the
      // wide-interval fallback keeps a BNLJ operator that is EMPTY at
      // runtime here (every fixture interval spans < maxBins bins).
      assert(s.smj + s.broadcast >= 1, s"rule must add the binned equi join: $s")
      val got = naive.select("iv_id", "pt").as[(Long, Long)].collect().toSeq
      assert(got.toSet == expected, "rewrite must not change results")
      assert(got.size == expected.size, "each pair must match in exactly one bin")
    }
  }

  test("both join orientations and extra residual predicates rewrite") {
    val expected = naive.filter(col("iv_id") =!= 5L)
      .select("iv_id", "pt").as[(Long, Long)].collect().toSet
    withRule(width = 7) {
      // intervals on the left, plus a residual non-range predicate.
      val flipped = intervals.join(points,
        col("pt") >= col("lo") && col("pt") < col("hi") && col("iv_id") =!= 5L)
      val s = Explain.audit(flipped)
      assert(s.smj + s.broadcast >= 1, s"flipped orientation must also rewrite: $s")
      val got = flipped.select("iv_id", "pt").as[(Long, Long)].collect()
      assert(got.toSet == expected && got.length == expected.size,
        "results must match with no multi-bin duplicates")
    }
  }

  test("guards: equi-keyed joins and disabled config stay untouched") {
    withRule(width = 10) {
      // A cross-side equi conjunct → already hash-joinable; must not fire.
      val keyed = points.withColumn("k", col("pt") % 5)
        .join(intervals.withColumn("k2", col("iv_id") % 5),
          col("k") === col("k2") && col("pt") >= col("lo") && col("pt") < col("hi"))
      assert(keyed.queryExecution.optimizedPlan.toString.contains("__graft_bin") == false,
        "equi-keyed join must not be rewritten")
    }
    // Width unset → rule inert even when installed.
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ new RangeJoinRewrite
    try assert(!naive.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    finally spark.experimental.extraOptimizations = prev
  }

  test("open-ended sentinel intervals take the wide fallback, not a 2^52-bin explode") {
    // hi = Long.MaxValue (the SCD 'current row' sentinel). Without the
    // maxBins split this would build a quadrillion-element sequence and
    // crash a query that worked (slowly) before the rule was enabled.
    val iv = Seq((1L, 0L, Long.MaxValue), (2L, 47L, 113L)).toDF("iv_id", "lo", "hi")
    val q = points.join(iv, col("pt") >= col("lo") && col("pt") < col("hi"))
    val expected = q.select("iv_id", "pt").as[(Long, Long)].collect().toSet
    withRule(width = 10) {
      val got = q.select("iv_id", "pt").as[(Long, Long)].collect().toSeq
      assert(got.toSet == expected && got.size == expected.size)
      // The narrow interval still takes the binned path: the plan keeps
      // a hash/sort-merge join branch alongside the wide fallback.
      val s = Explain.audit(q)
      assert(s.nestedLoops <= 2, s"only the sentinel branch may nested-loop: $s")
      assert(s.smj + s.broadcast >= 1, s"narrow branch must stay equi-joined: $s")
    }
  }

  test("bin-span check cannot wrap: large-negative lo with a MaxValue sentinel goes wide") {
    // bin(hi-1) - bin(lo) ≈ 1.4e19 overflows Long (non-ANSI wraps to
    // NEGATIVE) — a wrapped span would classify this enormous interval
    // as narrow and die generating its Sequence. The span compare runs
    // in double arithmetic, which saturates instead of wrapping.
    val iv = Seq((1L, Long.MinValue / 2, Long.MaxValue), (2L, 47L, 113L))
      .toDF("iv_id", "lo", "hi")
    val q = points.join(iv, col("pt") >= col("lo") && col("pt") < col("hi"))
    val expected = q.select("iv_id", "pt").as[(Long, Long)].collect().toSet
    withRule(width = 1) { // width 1 maximizes the bin span
      val got = q.select("iv_id", "pt").as[(Long, Long)].collect().toSeq
      assert(got.toSet == expected && got.size == expected.size,
        "sentinel interval must keep matching via the wide branch")
    }
  }

  test("an unrelated cross-side threshold predicate does not shadow the range pattern") {
    // points also carry a weight compared against the interval's floor —
    // a second cross-side >= conjunct that precedes the range pattern.
    val p = points.withColumn("weight", col("pt") % 7)
    val iv = intervals.withColumn("min_w", lit(0L))
    val q = p.join(iv,
      col("weight") >= col("min_w") &&
        col("pt") >= col("lo") && col("pt") < col("hi"))
    val expected = q.select("iv_id", "pt").as[(Long, Long)].collect().toSet
    withRule(width = 10) {
      val s = Explain.audit(q)
      assert(s.smj + s.broadcast >= 1, s"the (pt, lo, hi) pattern must still be found: $s")
      assert(q.select("iv_id", "pt").as[(Long, Long)].collect().toSet == expected)
    }
  }

  test("integer-typed columns rewrite too (bin math casts through double)") {
    val p = (0 to 100 by 2).toDF("pt").select(col("pt").cast("int").as("pt"))
    val iv = Seq((1, 0, 37), (2, 30, 71)).toDF("iv_id", "lo", "hi")
      .select(col("iv_id"), col("lo").cast("int").as("lo"), col("hi").cast("int").as("hi"))
    val q = p.join(iv, col("pt") >= col("lo") && col("pt") < col("hi"))
    val expected = q.select("iv_id", "pt").as[(Int, Int)].collect().toSet
    withRule(width = 8) {
      val s = Explain.audit(q)
      assert(s.smj + s.broadcast >= 1, s"int columns must also rewrite: $s")
      val got = q.select("iv_id", "pt").as[(Int, Int)].collect()
      assert(got.toSet == expected && got.length == expected.size,
        "results must match with no multi-bin duplicates")
    }
  }

  test("rewritten plan equals RangeJoin.pointInInterval's hand-built shape") {
    val expected = graft.analytics.RangeJoin
      .pointInInterval(points, "pt", intervals, "lo", "hi", binWidth = 10)
      .select("iv_id", "pt").as[(Long, Long)].collect().toSet
    withRule(width = 10) {
      assert(naive.select("iv_id", "pt").as[(Long, Long)].collect().toSet == expected)
    }
  }
}
