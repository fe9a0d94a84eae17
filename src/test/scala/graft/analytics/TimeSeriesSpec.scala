package graft.analytics

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("gapFillForward: densifies to the per-key span and carries values forward") {
    // Key A observes weeks 0 and 3 of a 4-week span; key B observes once.
    val observed = Seq(
      ("a", d("2024-01-01"), 10L, 1L),
      ("a", d("2024-01-22"), 40L, 2L),
      ("b", d("2024-02-05"), 7L, 1L))
      .toDF("k", "week", "cents", "n")
    val out = TimeSeries.gapFillForward(observed, "k", "week", 7, Seq("cents", "n"))
      .orderBy("k", "week").collect()

    assert(out.length == 5, "a spans 4 weeks, b spans 1")
    val a = out.filter(_.getString(0) == "a")
    assert(a.map(_.getAs[Date]("week").toString).toSeq ==
      Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22"))
    assert(a.map(_.getAs[Long]("cents")).toSeq == Seq(10L, 10L, 10L, 40L))
    assert(a.map(_.getAs[Boolean]("observed")).toSeq ==
      Seq(true, false, false, true))
    assert(a.map(_.getAs[Int]("gap_age")).toSeq == Seq(0, 1, 2, 0))
    val b = out.filter(_.getString(0) == "b")
    assert(b.map(_.getAs[Long]("cents")).toSeq == Seq(7L) &&
      b.head.getAs[Int]("gap_age") == 0)
  }

  test("gapFillForward: fill columns move independently but share the observed flag") {
    val observed = Seq(
      ("k", d("2024-03-04"), 5L, 100L),
      ("k", d("2024-03-18"), 9L, 300L))
      .toDF("k", "week", "x", "y")
    val out = TimeSeries.gapFillForward(observed, "k", "week", 7, Seq("x", "y"))
      .orderBy("week").collect()
    assert(out.map(_.getAs[Long]("x")).toSeq == Seq(5L, 5L, 9L))
    assert(out.map(_.getAs[Long]("y")).toSeq == Seq(100L, 100L, 300L))
    assert(out.map(_.getAs[Boolean]("observed")).toSeq == Seq(true, false, true))
  }

  test("movingRevenue: RANGE frame tracks the calendar, not row positions") {
    val out = TimeSeries.movingRevenue(spark, "/root/testdata/sf0.001")
      .filter(col("priority") === "1-URGENT").orderBy("day").collect()
    assert(out.nonEmpty)
    // Reconstruct each 28-day window from the daily rows themselves: the
    // RANGE frame must include exactly the days within [d-27, d], however
    // sparse the series is (a ROWS frame would widen across gaps).
    val daily = out.map(r => r.getAs[String]("day") -> r.getAs[Long]("day_cents")).toMap
    def dayOf(s: String) = java.time.LocalDate.parse(s)
    out.foreach { r =>
      val d = dayOf(r.getAs[String]("day"))
      val win = daily.filter { case (k, _) =>
        val kd = dayOf(k)
        !kd.isAfter(d) && kd.isAfter(d.minusDays(28))
      }
      assert(r.getAs[Long]("mov_cents") == win.values.sum, s"window sum at $d")
      assert(r.getAs[Long]("mov_days") == win.size, s"window size at $d")
      assert(r.getAs[Long]("mov_avg_cents") == win.values.sum / win.size)
    }
  }

  test("robustOutliers: med2/mad4 match a driver-side exact recomputation") {
    val out = TimeSeries.robustOutliers(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // Recompute the doubled median and 4·MAD for one priority from the
    // raw daily series and check the operator's constants + membership.
    val daily = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("c"))
    def middleSum(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.length
      s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)
    }
    val med2 = middleSum(daily.map(_._2).toSeq)
    val mad4 = middleSum(daily.map { case (_, c) => math.abs(2 * c - med2) }.toSeq)
    val expected = daily.filter { case (_, c) =>
      2 * math.abs(2 * c - med2) > 3 * mad4
    }.map(_._1).toSet
    val got = rows.filter(_.getAs[String]("priority") == "1-URGENT")
    got.foreach { r =>
      assert(r.getAs[Long]("med2") == med2 && r.getAs[Long]("mad4") == mad4)
    }
    assert(got.map(_.getAs[String]("day")).toSet == expected,
      "outlier membership must match the exact integer gate")
  }

  test("weeklyGapfill: grid length per key is exactly span/7 + 1 and keys are the sampled set") {
    val out = TimeSeries.weeklyGapfill(spark, "/root/testdata/sf0.01")
    val perKey = out.groupBy("custkey")
      .agg(count(lit(1)).as("n"),
        min("week_start").as("lo"), max("week_start").as("hi"),
        sum(when(col("observed"), 1L).otherwise(0L)).as("n_obs"))
      .collect()
    assert(perKey.nonEmpty)
    perKey.foreach { r =>
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(r.getAs[String]("lo")),
        java.time.LocalDate.parse(r.getAs[String]("hi")))
      assert(r.getAs[Long]("n") == span / 7 + 1, s"dense grid for ${r.get(0)}")
      assert(r.getAs[Long]("n_obs") >= 1)
      assert(r.getAs[Long]("custkey") % 20 == 0)
    }
  }

  test("activity streaks: islands split exactly at gaps, duplicates collapse") {
    // u1: 1,2,3 | 7 | 10,11 (with day 2 duplicated); u2: one day only.
    val ev = Seq((1L, 1L), (1L, 2L), (1L, 2L), (1L, 3L), (1L, 7L),
      (1L, 10L), (1L, 11L), (2L, 5L)).toDF("user_id", "day_num")
    val out = TimeSeries.activityStreaks(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_active_days"), r.getAs[Long]("n_streaks"),
          r.getAs[Long]("max_streak_days"))).toMap
    assert(out(1L) == ((6L, 3L, 3L)))
    assert(out(2L) == ((1L, 1L, 1L)))
  }

  test("activity streaks: per-user invariants on real data") {
    val rows = TimeSeries.userStreaks(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s, m) = (r.getAs[Long]("n_active_days"),
        r.getAs[Long]("n_streaks"), r.getAs[Long]("max_streak_days"))
      assert(s >= 1 && m >= 1 && m <= n && s <= n,
        s"user ${r.get(0)}: inconsistent $n/$s/$m")
      // n streaks over n_active_days: max streak can't beat the pigeonhole.
      assert(m >= (n + s - 1) / s, s"user ${r.get(0)}: max below mean")
    }
  }

  test("OLS trend: hand-computed slopes, including exact negative division") {
    // g1: y = 100 + 250·x exactly → num/den = 250, slope_micro = 250e6.
    // g2: y falls 7 per 2 days → slope = -3.5 = -3500000 micro exactly.
    // g3: pure noise around a flat line → slope 0 when symmetric.
    val rows = Seq(
      ("g1", 10L, 100L), ("g1", 11L, 350L), ("g1", 12L, 600L), ("g1", 13L, 850L),
      ("g2", 5L, 107L), ("g2", 7L, 100L), ("g2", 9L, 93L),
      ("g3", 1L, 50L), ("g3", 2L, 60L), ("g3", 3L, 50L), ("g3", 4L, 60L), ("g3", 5L, 50L)
    ).toDF("g", "x", "y")
    val out = TimeSeries.olsTrend(rows, "g", "x", "y").collect()
      .map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("num"), r.getAs[Long]("den"),
          r.getAs[Long]("slope_micro"))).toMap
    assert(out("g1") == ((4L, 1250L * 4, 20L, 250000000L)), s"got ${out("g1")}")
    assert(out("g2")._4 == -3500000L, s"got ${out("g2")}")
    // g3: x centered 0..4, Σx=10, Σy=270, Σxy=540, Σxx=30 →
    // num = 5·540 − 10·270 = 0 → slope 0.
    assert(out("g3")._2 == 0L && out("g3")._4 == 0L, s"got ${out("g3")}")
  }

  test("OLS trend: over-bound input fails LOUDLY with the named headroom error") {
    // r9 verdict item 3: the documented 2^62 determinant contract must
    // be self-enforcing. Two rows of ~4.6e18 cents put n·Σxy past the
    // bound → expect the named raise_error, not a wrap or an anonymous
    // ANSI overflow.
    val rows = Seq(("g", 0L, 4_600_000_000_000_000_000L),
      ("g", 1L, 4_600_000_000_000_000_000L)).toDF("g", "x", "y")
    val e = intercept[Exception] {
      TimeSeries.olsTrend(rows, "g", "x", "y").collect()
    }
    assert(e.getMessage.contains("olsTrend: BIGINT headroom exceeded"),
      s"wrong failure mode: ${e.getMessage}")
    // And in-bound inputs of the same shape still compute.
    val ok = Seq(("g", 0L, 100L), ("g", 1L, 200L)).toDF("g", "x", "y")
    assert(TimeSeries.olsTrend(ok, "g", "x", "y").collect().nonEmpty)
  }

  test("OLS trend: truncating two-step division matches BigInt reference") {
    // Deterministic pseudo-random group: verify slope_micro ==
    // (1e6·num)/den truncated, computed in BigInt (no overflow).
    val rows = (0 until 37).map { i =>
      ("g", i.toLong * 3 + 2, ((i * 7919) % 101 - 50).toLong * (i % 5 + 1))
    }.toDF("g", "x", "y")
    val r = TimeSeries.olsTrend(rows, "g", "x", "y").head()
    val (num, den, got) = (BigInt(r.getAs[Long]("num")),
      BigInt(r.getAs[Long]("den")), r.getAs[Long]("slope_micro"))
    val want = (BigInt(1000000) * num) / den // BigInt / truncates toward zero
    assert(BigInt(got) == want, s"two-step division drifted: $got vs $want")
  }

  test("crossCorrelation: a pure 2-day shift peaks at exactly r = 1 at lag 2") {
    // Nonlinear series so only the true shift aligns perfectly.
    val xs = (0 to 9).map(t => (t.toLong, (t * t + 1).toLong))
    val x = xs.toDF("day_i", "x")
    val y = xs.map { case (d, v) => (d + 2, v) }.toDF("day_i", "y")
    val out = TimeSeries.crossCorrelation(x, y, maxLag = 3).collect()
      .map(r => r.getAs[Int]("lag") ->
        ((r.getAs[Long]("n_days"), Option(r.getAs[Any]("r"))
          .map(_.asInstanceOf[Double])))).toMap
    assert(out(2)._1 == 10L && out(2)._2.contains(1.0),
      "aligning at the true shift correlates the series with itself")
    Seq(0, 1, 3).foreach { l =>
      assert(out(l)._2.exists(_ < 1.0), s"lag $l must not reach a perfect fit")
    }
  }

  test("crossCorrelation: sufficient statistics are exact integers") {
    // x = (1,2), y aligned at lag 0 = (3,5): Σx=3 Σy=8 Σxy=13 Σxx=5 Σyy=34.
    val x = Seq((0L, 1L), (1L, 2L)).toDF("day_i", "x")
    val y = Seq((0L, 3L), (1L, 5L)).toDF("day_i", "y")
    val r0 = TimeSeries.crossCorrelation(x, y, maxLag = 0).collect().head
    assert(r0.getAs[Long]("n_days") == 2L)
    assert(r0.getAs[Long]("sum_x") == 3L && r0.getAs[Long]("sum_y") == 8L)
    // The gate face emits the sums as BIGINT (DECIMAL stays internal to
    // the accumulation only) so cross-engine hashes agree.
    assert(r0.getAs[Long]("sum_xy") == 13L)
    assert(r0.getAs[Long]("sum_xx") == 5L)
    assert(r0.getAs[Long]("sum_yy") == 34L)
    // (1,2) vs (3,5) is an exact affine map → r = 1.
    assert(r0.getAs[Double]("r") == 1.0)
  }

  test("crossCorrelation: a constant side yields null r, not a NaN or error") {
    val x = Seq((0L, 4L), (1L, 4L)).toDF("day_i", "x")
    val y = Seq((0L, 3L), (1L, 5L)).toDF("day_i", "y")
    val r0 = TimeSeries.crossCorrelation(x, y, maxLag = 0).collect().head
    assert(r0.isNullAt(r0.fieldIndex("r")))
  }

  test("q127 seasonality: shares tile to ~1e6 ppm and indices average to ~1000") {
    val out = TimeSeries.weekdaySeasonality(spark, "/root/testdata/sf0.001").collect()
    assert(out.map(_.getAs[Int]("isodow")).sorted.toSeq == (1 to 7))
    val shares = out.map(_.getAs[Long]("revenue_share_ppm")).sum
    assert(shares <= 1000000L && shares >= 1000000L - 7,
      s"integer-division shares must tile to 1e6 minus truncation: $shares")
    val idx = out.map(_.getAs[Long]("seasonality_x1000")).sum
    assert(idx <= 7000L && idx >= 7000L - 7)
    // Direct recount of one weekday's order count.
    val monday = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
      .filter(weekday(col("o_orderdate")) === 0).count()
    assert(out.find(_.getAs[Int]("isodow") == 1).get.getAs[Long]("n_orders") == monday)
  }

  test("decayed revenue: matches a driver-side per-order recompute") {
    val sfDir = "/root/testdata/sf0.001"
    // Independent recompute: collect the (nation, date, cents) fact rows
    // and fold the exact same quantized half-life weights in plain Scala.
    val facts = graft.core.Tables.orders(spark, sfDir)
      .join(graft.core.Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .join(graft.core.Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), to_date(col("o_orderdate")).as("d"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getAs[String]("n_name"),
        r.getAs[Date]("d").toLocalDate, r.getAs[Long]("cents")))
    val mxd = facts.map(_._2).maxBy(_.toEpochDay)
    val expect = facts.groupBy(_._1).map { case (n, rs) =>
      val decayed = rs.map { case (_, dt, c) =>
        val k = math.min((mxd.toEpochDay - dt.toEpochDay) / 30, 62L).toInt
        c / (1L << k)
      }.sum
      n -> (rs.length.toLong, rs.map(_._3).sum, decayed)
    }
    val got = TimeSeries.decayedRevenue(spark, sfDir).collect()
      .map(r => r.getAs[String]("n_name") ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("revenue_cents"),
          r.getAs[Long]("decayed_cents"))).toMap
    assert(got == expect)
    got.values.foreach { case (_, rev, dec) =>
      assert(dec <= rev, "decay can only shrink revenue")
      assert(dec >= 0)
    }
  }

  // ------------------------------------------------------------ kaplanMeier

  test("kaplanMeier: hand-computed curve with censoring and the d=n boundary") {
    // Subjects in one group: event@1, censor@2, event@3, censor@3, event@5.
    val obs = Seq(("g", 1L, true), ("g", 2L, false), ("g", 3L, true),
      ("g", 3L, false), ("g", 5L, true)).toDF("g", "t", "event")
    val out = TimeSeries.kaplanMeier(obs, "g", "t", "event")
      .collect().map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("d"), r.getAs[Long]("c"), r.getAs[Long]("n_risk"),
          r.getAs[Int]("hit_zero"), r.getAs[Long]("surv_ppm")))).toMap
    // t=1: n=5, d=1 -> S=0.8; t=2 censor-only keeps S; t=3: n=3, d=1 ->
    // S=0.8*2/3=0.533333...; t=5: d=n=1 -> survival exactly 0.
    assert(out(1L) == ((1L, 0L, 5L, 0, 800000L)))
    assert(out(2L) == ((0L, 1L, 4L, 0, 800000L)))
    assert(out(3L) == ((1L, 1L, 3L, 0, 533333L)))
    assert(out(5L) == ((1L, 0L, 1L, 1, 0L)))
  }

  test("kaplanMeier: censored-only group never drops below 1") {
    val obs = Seq(("g", 1L, false), ("g", 2L, false)).toDF("g", "t", "event")
    val out = TimeSeries.kaplanMeier(obs, "g", "t", "event").collect()
    assert(out.forall(_.getAs[Long]("surv_ppm") == 1000000L))
  }

  // ----------------------------------------------------------- ewmaForecast

  test("ewmaForecast: constant series forecasts the constant exactly; warm-up is null") {
    val perT = (1 to 10).map(i => ("k", i, 100L)).toDF("k", "t", "y")
    val out = TimeSeries.ewmaForecast(perT, "k", "t", "y")
      .orderBy(col("t")).collect()
    out.take(8).foreach(r => assert(r.isNullAt(r.fieldIndex("forecast"))))
    out.drop(8).foreach { r =>
      assert(r.getAs[Long]("forecast") == 100L, "weights renormalize exactly")
      assert(r.getAs[Long]("abs_err") == 0L)
    }
  }

  test("ewmaForecast: recent lags dominate — a level shift pulls the forecast up") {
    // 100s through t=8, 200s from t=9. At t=13 the four recent lags are
    // 200 and the four old ones 100: forecast = (200*75,990,000 +
    // 100*18,245,199) div 94,235,199 = 180 — above the midpoint because
    // geometric weights favor recency.
    val ys = (1 to 8).map(_ => 100L) ++ (9 to 16).map(_ => 200L)
    val perT = ys.zipWithIndex.map { case (y, i) => ("k", i + 1, y) }
      .toDF("k", "t", "y")
    val f = TimeSeries.ewmaForecast(perT, "k", "t", "y")
      .filter(col("t") === 13).collect().head.getAs[Long]("forecast")
    assert(f == 180L, s"expected recency-weighted forecast 180, got $f")
  }

  // ------------------------------------------------------------- cusumDrift

  test("cusumDrift: matches the direct max(0, .) recursion on a hand series") {
    val perT = Seq(("g", 1, 10L), ("g", 2, 10L), ("g", 3, 10L),
      ("g", 4, 60L), ("g", 5, 60L), ("g", 6, 60L)).toDF("g", "t", "y")
    val out = TimeSeries.cusumDrift(perT, "g", "t", "y")
      .orderBy(col("t")).collect()
    // ref = 210 div 6 = 35; dev = -25,-25,-25,+25,+25,+25.
    // Direct recursion S = 0,0,0,25,50,75; threshold 2*ref = 70.
    assert(out.map(_.getAs[Long]("ref")).toSeq == Seq.fill(6)(35L))
    assert(out.map(_.getAs[Long]("s")).toSeq == Seq(0L, 0L, 0L, 25L, 50L, 75L))
    assert(out.map(_.getAs[Boolean]("flagged")).toSeq ==
      Seq(false, false, false, false, false, true))
  }

  test("cusumDrift: downward excursions cap at zero, never negative") {
    val perT = Seq(("g", 1, 100L), ("g", 2, 0L), ("g", 3, 0L), ("g", 4, 60L))
      .toDF("g", "t", "y")
    val out = TimeSeries.cusumDrift(perT, "g", "t", "y").collect()
    assert(out.forall(_.getAs[Long]("s") >= 0L))
  }

  // -------------------------------------------------------- forecastBacktest

  test("forecastBacktest: constant series — both models perfect, skill undefined") {
    val perT = (1 to 12).map(i => ("k", i, 100L)).toDF("k", "t", "y")
    val r = TimeSeries.forecastBacktest(perT, "k", "t", "y").collect().head
    assert(r.getAs[Long]("n_eval") == 4L) // rows 9..12 have full warm-up
    assert(r.getAs[Long]("sae_ewma") == 0L && r.getAs[Long]("sae_naive") == 0L)
    assert(r.isNullAt(r.fieldIndex("skill_ppm")), "0/0 skill must be null")
  }

  test("forecastBacktest: alternating series — naive is maximally wrong, EWMA beats it") {
    // y alternates 0/1000: naive error is 1000 every step; EWMA of the
    // mixed window lands near the mean, so error ~500 per step.
    val perT = (1 to 16).map(i => ("k", i, if (i % 2 == 0) 1000L else 0L))
      .toDF("k", "t", "y")
    val r = TimeSeries.forecastBacktest(perT, "k", "t", "y").collect().head
    assert(r.getAs[Long]("sae_naive") == 1000L * r.getAs[Long]("n_eval"))
    assert(r.getAs[Long]("skill_ppm") < 1000000L,
      s"EWMA must beat naive here: $r")
  }

  // -------------------------------------------------------- weekdayAdjusted

  test("weekdayAdjusted: a flat series with one spiked weekday flattens back") {
    // 14 days; every Wednesday doubles. The index absorbs the doubling:
    // adjusted values come out near-equal across all days.
    val daily = (0 until 14).map { i =>
      val day = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString)
      val wed = java.time.LocalDate.of(2024, 1, 1).plusDays(i).getDayOfWeek ==
        java.time.DayOfWeek.WEDNESDAY
      (day, if (wed) 2000L else 1000L)
    }.toDF("day", "cents")
    val out = TimeSeries.weekdayAdjusted(daily, "day", "cents").collect()
    val adj = out.map(_.getAs[Long]("adj_cents"))
    assert(adj.max - adj.min <= adj.min / 10,
      s"adjustment should flatten the spike: ${adj.toSeq.sorted}")
    // Index integrates to ~7000 per-mille over the 7 weekdays.
    val idx = out.map(r => r.getAs[Int]("dw") -> r.getAs[Long]("idx_x1000")).toMap
    assert(math.abs(idx.values.sum - 7000L) <= 7, s"index sums to ~7000: $idx")
  }

  // -------------------------------------------------------- priceElasticity

  test("priceElasticity: per-brand slopes are defined, finite, and match a driver recompute") {
    val out = TimeSeries.priceElasticity(spark, "/root/testdata/sf0.001").collect()
    assert(out.length > 1)
    out.foreach { r =>
      val (n, sx, sy, sxy, sxx) = (r.getAs[Long]("n_lines"), r.getAs[Long]("sx"),
        r.getAs[Long]("sum_lnq_milli"), r.getAs[Long]("sxy"), r.getAs[Long]("sxx"))
      val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val den = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      assert(den > 0, "price variation exists per brand")
      assert(r.getAs[Long]("elasticity_micro") ==
        math.floor(num / den * 1e6 + 0.5).toLong)
      assert(math.abs(r.getAs[Long]("elasticity_micro")) < 10000000L)
    }
  }

  test("priceElasticity kernel: planted log-log slope recovered exactly") {
    // y_milli = -2000 + (-500/1000)*x? Use olsTrend directly on exact
    // integers: y = 3000 - 2*x over x in 0..4 -> slope_micro = -2e6.
    val rows = Seq(("b", 0L, 3000L), ("b", 1L, 2998L), ("b", 2L, 2996L),
      ("b", 3L, 2994L), ("b", 4L, 2992L))
      .toDF("g", "x", "y")
    val out = TimeSeries.olsTrend(rows, "g", "x", "y").collect().head
    assert(out.getAs[Long]("slope_micro") == -2000000L)
  }

  // ----------------------------------------------------- twapVwap / SLA p95

  test("twapVwap: vwap and twap columns reconcile with a driver recompute") {
    val out = TimeSeries.twapVwap(spark, "/root/testdata/sf0.001").collect()
    assert(out.length > 1)
    out.foreach { r =>
      assert(r.getAs[Long]("vwap_cents") ==
        r.getAs[Long]("tot_ext_cents") / r.getAs[Long]("tot_qty"))
      assert(r.getAs[Long]("twap_cents") ==
        r.getAs[Long]("twap_num") / r.getAs[Long]("span_days"))
      assert(r.getAs[Long]("span_days") >= r.getAs[Long]("n_days"),
        "gaps can only stretch the span")
    }
  }

  test("slaLatencyTrend: p95/p50 are exact order statistics; attainment bounded") {
    val out = TimeSeries.slaLatencyTrend(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    // Driver recompute for one month.
    val m0 = out.head.getAs[String]("month")
    val lats = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .join(graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(date_format(col("o_orderdate"), "yyyy-MM") === m0)
      .select(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
        .cast("long").as("d"))
      .collect().map(_.getLong(0)).sorted
    val n = lats.length
    val row = out.find(_.getAs[String]("month") == m0).get
    assert(row.getAs[Long]("n") == n.toLong)
    assert(row.getAs[Long]("p95_days") == lats((19 * n + 19) / 20 - 1))
    assert(row.getAs[Long]("p50_days") == lats((n + 1) / 2 - 1))
    out.foreach { r =>
      assert(r.getAs[Long]("p50_days") <= r.getAs[Long]("p95_days"))
      val a = r.getAs[Long]("attain_ppm")
      assert(a >= 0 && a <= 1000000L)
    }
  }

  // -------------------------------------------------------------- logRank

  test("logRank: censored exit reduces at-risk without contributing a term") {
    // A: event t=2. B: censored t=1, event t=3. Event times: t=2 has
    // n1=n2=1 -> E1=0.5, V=0.25; t=3 has n1=0 -> E1=0, and nt=1 -> V=0.
    // z2 = (1-0.5)^2/0.25 = 1 exactly.
    val obs = Seq((true, 2L, true), (false, 1L, false), (false, 3L, true))
      .toDF("g1", "t", "event")
    val out = TimeSeries.logRank(obs, "g1", "t", "event").collect().head
    assert(out.getAs[Long]("o1") == 1L)
    assert(out.getAs[Long]("e1_nano") == 500000000L)
    assert(out.getAs[Long]("v_nano") == 250000000L)
    assert(out.getAs[Long]("z2_micro") == 1000000L)
  }

  test("logRank: pooled-time hypergeometric terms match a driver recompute") {
    // A events at t=1,2; B events at t=2,3 — tied deaths at t=2 pool.
    val obs = Seq((true, 1L, true), (true, 2L, true),
      (false, 2L, true), (false, 3L, true)).toDF("g1", "t", "event")
    val out = TimeSeries.logRank(obs, "g1", "t", "event").collect().head
    // t=1: E1=1*2/4 -> 5e8 nano; V=1*2*2*3/(16*3)=0.25 -> 2.5e8.
    // t=2: E1=2*1/3 -> 666666667; V=2*1*2*1/(9*2) -> 222222222.
    // t=3: n1=0 -> both 0.
    assert(out.getAs[Long]("o1") == 2L)
    assert(out.getAs[Long]("e1_nano") == 500000000L + 666666667L)
    assert(out.getAs[Long]("v_nano") == 250000000L + 222222222L)
    val e1 = (500000000L + 666666667L).toDouble / 1e9
    val v = (250000000L + 222222222L).toDouble / 1e9
    val expected = math.floor((2.0 - e1) * (2.0 - e1) / v * 1e6 + 0.5).toLong
    assert(out.getAs[Long]("z2_micro") == expected)
  }

  // -------------------------------------------------------- theilSenTrend

  test("theilSenTrend: one outlier point does not move the median slope") {
    // Slope-10 line with a wild final point. Pairwise micro-slopes:
    // three 10.0s from the clean points, then 333.333/495/980 from the
    // outlier pairs — lower median (rank 3 of 6) stays 10,000,000.
    val pts = Seq(("a", 0L, 0L), ("a", 1L, 10L), ("a", 2L, 20L),
      ("a", 3L, 1000L)).toDF("k", "x", "y")
    val out = TimeSeries.theilSenTrend(pts, "k", "x", "y").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_pairs") == 6L)
    assert(out.head.getAs[Long]("ts_slope_micro") == 10000000L)
  }

  test("theilSenTrend: negative slope truncates exactly; single pair") {
    val pts = Seq(("d", 0L, 100L), ("d", 3L, 0L)).toDF("k", "x", "y")
    val out = TimeSeries.theilSenTrend(pts, "k", "x", "y").collect()
    // -100/3: q = -33, r = -1 -> -33*1e6 + (-1e6 div 3) = -33333333
    // (both engines truncate toward zero at each step).
    assert(out.head.getAs[Long]("n_pairs") == 1L)
    assert(out.head.getAs[Long]("ts_slope_micro") == -33333333L)
  }

  // ----------------------------------------------------- mannKendall (q231)

  test("mannKendall: strictly increasing series — hand S and z") {
    // y = 1..5: S = 10, Var = 5*4*15/18 = 16.667, z = 9/4.0825 = 2.204541.
    val pts = (1L to 5L).map(i => ("k", i, i * 10L)).toDF("k", "x", "y")
    val out = TimeSeries.mannKendall(pts, "k", "x", "y").collect().head
    assert(out.getAs[Long]("s_stat") == 10L)
    assert(out.getAs[Long]("tie_term") == 0L)
    assert(out.getAs[Long]("z_micro") == 2204541L)
  }

  test("mannKendall: ties enter the variance correction") {
    // y = 1,2,2,3: S = 5; tie group t=2 -> term 2*1*9 = 18;
    // Var = (4*3*13 - 18)/18 = 7.667; z = 4/sqrt(7.667) = 1.444630.
    val pts = Seq(("k", 1L, 1L), ("k", 2L, 2L), ("k", 3L, 2L),
      ("k", 4L, 3L)).toDF("k", "x", "y")
    val out = TimeSeries.mannKendall(pts, "k", "x", "y").collect().head
    assert(out.getAs[Long]("s_stat") == 5L)
    assert(out.getAs[Long]("tie_term") == 18L)
    assert(out.getAs[Long]("z_micro") == 1444630L)
  }

  test("mannKendall: trendless series scores zero; sign is symmetric") {
    val flat = Seq(("k", 1L, 5L), ("k", 2L, 5L), ("k", 3L, 5L))
      .toDF("k", "x", "y")
    assert(TimeSeries.mannKendall(flat, "k", "x", "y")
      .collect().head.getAs[Long]("z_micro") == 0L)
    val down = (1L to 5L).map(i => ("k", i, 100L - i * 10L)).toDF("k", "x", "y")
    val out = TimeSeries.mannKendall(down, "k", "x", "y").collect().head
    assert(out.getAs[Long]("s_stat") == -10L)
    assert(out.getAs[Long]("z_micro") == -2204541L)
  }

  // -------------------------------------------------------- runsTest (q220)

  test("runsTest: run counting and the zero-z expectation case") {
    // 10,10,1,1,10,1 around mean 5.5 -> T,T,F,F,T,F: runs = 4 = mu -> z = 0.
    val pts = Seq(("k", 1L, 10L), ("k", 2L, 10L), ("k", 3L, 1L),
      ("k", 4L, 1L), ("k", 5L, 10L), ("k", 6L, 1L)).toDF("k", "t", "y")
    val out = TimeSeries.runsTest(pts, "k", "t", "y").collect().head
    assert((out.getAs[Long]("n_days"), out.getAs[Long]("n_above"),
      out.getAs[Long]("n_below"), out.getAs[Long]("runs")) ==
      ((6L, 3L, 3L, 4L)))
    assert(out.getAs[Long]("z_micro") == 0L)
  }

  test("runsTest: perfect alternation scores the positive hand z") {
    // 10,1,10,1: runs = 4, n1 = n2 = 2 -> z = 1/sqrt(2/3) = 1.224745.
    val pts = Seq(("k", 1L, 10L), ("k", 2L, 1L), ("k", 3L, 10L),
      ("k", 4L, 1L)).toDF("k", "t", "y")
    val out = TimeSeries.runsTest(pts, "k", "t", "y").collect().head
    assert(out.getAs[Long]("runs") == 4L)
    assert(out.getAs[Long]("z_micro") == 1224745L)
  }

  test("runsTest: one-sided and sigma-zero series report null z") {
    // All values equal -> ties land below the (strict) mean cut: one side
    // empty. Two points split 1/1 -> 2*n1*n2 = n -> sigma = 0.
    val flat = Seq(("k", 1L, 5L), ("k", 2L, 5L)).toDF("k", "t", "y")
    val o1 = TimeSeries.runsTest(flat, "k", "t", "y").collect().head
    assert(o1.isNullAt(o1.fieldIndex("z_micro")))
    val two = Seq(("k", 1L, 1L), ("k", 2L, 9L)).toDF("k", "t", "y")
    val o2 = TimeSeries.runsTest(two, "k", "t", "y").collect().head
    assert(o2.isNullAt(o2.fieldIndex("z_micro")))
  }

  // ---------------------------------------------- acfLjungBox (q242)
  test("acf: hand-computed lags over a four-point ramp") {
    // x = 1,2,3,4: mean 2.5, den = 5; r1 = 1.25/5, r2 = -1.5/5,
    // r3 = -2.25/5.
    val d = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("d", "x")
    val out = TimeSeries.acfLjungBox(d, maxLag = 3).collect()
      .map(r => r.getAs[Long]("lag") -> r).toMap
    assert(out(1L).getAs[Long]("n_pairs") == 3L)
    assert(out(1L).getAs[Long]("r_micro") == 250000L)
    assert(out(2L).getAs[Long]("r_micro") == -300000L)
    assert(out(3L).getAs[Long]("r_micro") == -450000L)
    // Q_k replicated with the operator's own double sequence.
    val rs = Seq(1.25 / 5.0, -1.5 / 5.0, -2.25 / 5.0)
    var acc = 0.0
    (1 to 3).foreach { k =>
      acc += rs(k - 1) * rs(k - 1) / (4 - k).toDouble
      val q = acc * 4.0 * 6.0
      assert(out(k.toLong).getAs[Long]("q_micro") ==
        math.floor(q * 1000000.0 + 0.5).toLong, s"q at lag $k")
    }
  }

  test("acf: white-noise-free structure — perfect alternation scores r1 < 0") {
    val xs = (1L to 40L).map(i => (i, if (i % 2 == 0) 10L else 0L))
    val out = TimeSeries.acfLjungBox(xs.toDF("d", "x"), maxLag = 2)
      .collect().map(r => r.getAs[Long]("lag") -> r).toMap
    assert(out(1L).getAs[Long]("r_micro") < -900000L)
    assert(out(2L).getAs[Long]("r_micro") > 900000L)
    assert(out(2L).getAs[Long]("q_micro") > out(1L).getAs[Long]("q_micro"))
  }

  // --------------------------------------------- vonNeumannRatio (q254)
  test("vonNeumann: hand ratio on an alternating series; flat series drop") {
    // x = 1,2,1,2: num = 3, den = 4*10-36 = 4 -> VN = 3.
    val d = Seq(("k", 1L, 1L), ("k", 2L, 2L), ("k", 3L, 1L), ("k", 4L, 2L),
      ("flat", 1L, 5L), ("flat", 2L, 5L)).toDF("key", "d", "x")
    val out = TimeSeries.vonNeumannRatio(d, "key").collect()
    assert(out.length == 1) // the constant series is guarded out
    val r = out.head
    assert(r.getAs[String]("key") == "k")
    assert(r.getAs[Long]("vn_micro") == 3000000L)
    val z = (3.0 - 8.0 / 3.0) / math.sqrt(4.0 * 2.0 / (3.0 * 5.0))
    assert(r.getAs[Long]("z_micro") ==
      math.floor(z * 1e6 + 0.5).toLong)
  }

  test("vonNeumann: a strong trend drives the ratio toward zero") {
    val d = (1L to 40L).map(i => ("k", i, i * 100L)).toDF("key", "d", "x")
    val r = TimeSeries.vonNeumannRatio(d, "key").collect().head
    assert(r.getAs[Long]("vn_micro") < 100000L)
    assert(r.getAs[Long]("z_micro") < -5000000L)
  }

  // ----------------------------------------- binarySegmentSplit (q246)
  test("changepoint: a clean level shift splits exactly at the step") {
    val d = (1 to 6).map(i => ("k", s"2020-01-0$i", if (i <= 3) 10L else 20L))
      .toDF("k", "ds", "x").withColumn("d", to_date(col("ds")))
    val r = TimeSeries.binarySegmentSplit(d, "k").collect().head
    assert(r.getAs[Long]("split_idx") == 3L)
    assert(r.getAs[java.sql.Date]("split_at").toString == "2020-01-03")
    // gain = (6*30 - 3*90)^2 / (6*3*3) = 8100/54 = 150.
    assert(r.getAs[Long]("gain_int") == 150L)
    assert(r.getAs[Long]("mean_before_milli") == 10000L)
    assert(r.getAs[Long]("mean_after_milli") == 20000L)
  }

  test("changepoint: gain ties break to the earliest split per key") {
    val d = Seq(("k", "2020-01-01", 10L), ("k", "2020-01-02", 20L),
      ("k", "2020-01-03", 10L), ("k", "2020-01-04", 20L),
      ("j", "2020-01-01", 1L), ("j", "2020-01-02", 1L))
      .toDF("k", "ds", "x").withColumn("d", to_date(col("ds")))
    val out = TimeSeries.binarySegmentSplit(d, "k").collect()
      .map(r => r.getAs[String]("k") -> r).toMap
    // t=1 and t=3 tie at gain 400/12; t asc picks 1.
    assert(out("k").getAs[Long]("split_idx") == 1L)
    assert(out("k").getAs[Long]("gain_int") == 33L)
    // Flat series: every split has gain 0; earliest wins, means equal.
    assert(out("j").getAs[Long]("split_idx") == 1L)
    assert(out("j").getAs[Long]("gain_int") == 0L)
    assert(out("j").getAs[Long]("mean_before_milli") ==
      out("j").getAs[Long]("mean_after_milli"))
  }
}
