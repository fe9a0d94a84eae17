package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("funnel stage gates are strict-order: click before view never converts") {
    def ts(s: String) = Timestamp.valueOf(s)
    // u1 converts fully in order; u2 clicked BEFORE first view (no click
    // credit, hence no purchase credit either despite purchasing last);
    // u3 views only; u4 never views (invisible to the funnel top).
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      (2L, "click", ts("2024-01-02 09:00:00")),
      (2L, "view", ts("2024-01-02 09:30:00")),
      (2L, "purchase", ts("2024-01-02 10:00:00")),
      (3L, "view", ts("2024-01-03 08:00:00")),
      (4L, "purchase", ts("2024-01-04 07:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val row = EventAnalytics.funnel(
      ev.select(col("user_id"), col("event_type"), col("ts").cast("long").as("sec")),
      Seq("view", "click", "purchase")).head()
    assert((row.getAs[Long]("n_view"), row.getAs[Long]("n_click"),
      row.getAs[Long]("n_purchase")) == ((3L, 1L, 1L)))
  }

  test("funnel generalizes to other stage chains") {
    def ts(i: Int) = i.toLong
    // Stage chain of length 2 with a reversed pair.
    val ev = Seq(
      (1L, "signup", ts(1)), (1L, "purchase", ts(2)),
      (2L, "purchase", ts(1)), (2L, "signup", ts(2))).toDF("user_id", "event_type", "sec")
    val row = EventAnalytics.funnel(ev, Seq("signup", "purchase")).head()
    assert((row.getAs[Long]("n_signup"), row.getAs[Long]("n_purchase")) == ((2L, 1L)))
  }

  test("gated funnel is monotone and grounded in reality at sf0.001") {
    val row = EventAnalytics.conversionFunnel(spark, dir).head()
    val (v, c, p) = (row.getAs[Long]("n_view"), row.getAs[Long]("n_click"),
      row.getAs[Long]("n_purchase"))
    assert(v >= c && c >= p, s"funnel must be monotone: $v/$c/$p")
    assert(v > 0, "harness events must have viewers")
  }

  test("daily anomaly z-scores match an exact integer-sum reference") {
    val out = EventAnalytics.dailyAnomalies(spark, dir).collect()
      .map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("z"), r.getAs[Int]("is_anomaly"))))
      .toMap
    val counts = out.view.mapValues(_._1).toMap
    val nd = counts.size.toLong
    val s1 = counts.values.sum
    val s2 = counts.values.map(n => n * n).sum
    val mean = s1.toDouble / nd
    val sd = math.sqrt(s2.toDouble / nd - mean * mean)
    counts.foreach { case (day, n) =>
      val z = math.rint((n - mean) / sd * 1e4) / 1e4
      assert(out(day)._2 == z, s"$day: ${out(day)._2} vs reference $z")
      assert(out(day)._3 == (if (math.abs((n - mean) / sd) >= 1.5) 1 else 0))
    }
    // Every day accounted for, no fabricated rows.
    assert(s1 == graft.core.Tables.events(spark, dir).count())
  }

  test("retention cohorts conserve users and start at offset zero") {
    val rows = EventAnalytics.retentionCohorts(spark, dir).collect()
    val byCohort = rows.groupBy(_.getAs[String]("cohort"))
    // Offset 0 exists for every cohort (a user is active on their own
    // first day by construction) and is that cohort's maximum (retention
    // can only lose users).
    byCohort.foreach { case (c, rs) =>
      val m = rs.map(r => r.getAs[Int]("day_offset") -> r.getAs[Long]("n_active")).toMap
      assert(m.contains(0), s"cohort $c missing offset 0")
      assert(m(0) == m.values.max, s"cohort $c: day-0 must be the peak")
    }
    // Cohort day-0 sizes partition the user base.
    val users = graft.core.Tables.events(spark, dir)
      .select(countDistinct("user_id")).head().getLong(0)
    val day0Sum = byCohort.values.map(
      _.find(_.getAs[Int]("day_offset") == 0).get.getAs[Long]("n_active")).sum
    assert(day0Sum == users)
  }

  test("markov transitions: counts, probabilities, gaps, equal-sec tiebreak") {
    // u1: a@0 -> b@10 -> a@20 (gaps 10, 10).
    // u2: a@5 -> a@5 with event_id tiebreak (7 before 8 -> a->b at gap 0
    //     would be wrong; ids 7,8 order a then b), then c@15.
    val ev = Seq(
      (1L, "a", 1L, 0L), (1L, "b", 2L, 10L), (1L, "a", 3L, 20L),
      (2L, "a", 7L, 5L), (2L, "b", 8L, 5L), (2L, "c", 9L, 15L)
    ).toDF("user_id", "event_type", "event_id", "sec")
    val m = EventAnalytics.markov(ev).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n_trans"), r.getAs[Long]("n_from"),
          r.getAs[Long]("p_micro"), r.getAs[Long]("avg_gap_secs"))).toMap
    // a->b twice (gaps 10 and 0 -> avg 5), b->a once, b->c once.
    assert(m(("a", "b")) == ((2L, 2L, 1000000L, 5L)))
    assert(m(("b", "a")) == ((1L, 2L, 500000L, 10L)))
    assert(m(("b", "c")) == ((1L, 2L, 500000L, 10L)))
    assert(m.size == 3) // terminal events emit no transition
  }

  test("markov rows are a valid stochastic matrix on real data") {
    val rows = EventAnalytics.markovTransitions(spark, dir).collect()
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (f, rs) =>
      val nFrom = rs.map(_.getAs[Long]("n_from")).distinct
      assert(nFrom.size == 1, s"$f: inconsistent n_from")
      assert(rs.map(_.getAs[Long]("n_trans")).sum == nFrom.head,
        s"$f: transition counts must partition n_from")
      val pSum = rs.map(_.getAs[Long]("p_micro")).sum
      // Truncating division loses < 1 micro-unit per cell.
      assert(pSum <= 1000000L && pSum > 1000000L - rs.length,
        s"$f: row probabilities sum to $pSum")
      rs.foreach(r => assert(r.getAs[Long]("avg_gap_secs") >= 0L))
    }
  }

  test("open-order concurrency: sweep line conserves mass and ends at zero") {
    val rows = EventAnalytics.openOrderConcurrency(spark, dir).collect()
      .sortBy(_.getAs[String]("day"))
    val nOrders = graft.core.Tables.orders(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_starts")).sum == nOrders)
    assert(rows.map(_.getAs[Long]("n_ends")).sum == nOrders)
    // Concurrency is non-negative throughout and exactly zero after the
    // last interval closes (every +1 has its -1 thirty days later).
    rows.foreach(r => assert(r.getAs[Long]("n_open") >= 0L,
      s"negative concurrency on ${r.getAs[String]("day")}"))
    assert(rows.last.getAs[Long]("n_open") == 0L)
    // Running sum is self-consistent: n_open - prev = starts - ends.
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_open") - a.getAs[Long]("n_open") ==
          b.getAs[Long]("n_starts") - b.getAs[Long]("n_ends"))
      case _ =>
    }
  }

  test("q120 sliding WAU: explode formulation equals a direct range recount") {
    val out = EventAnalytics.slidingActiveUsers(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"))).toMap
    assert(out.nonEmpty)
    // Independent recount: distinct users whose day lands in [d-6, d].
    val ud = graft.core.Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = ud.map(_._1).distinct
    for (d <- days) {
      val expectWau = ud.filter { case (ud1, _) =>
        !ud1.isAfter(d) && !ud1.isBefore(d.minusDays(6)) }.map(_._2).distinct.length
      val expectDau = ud.filter(_._1 == d).map(_._2).distinct.length
      val (dau, wau) = out(d.toString)
      assert(dau == expectDau && wau == expectWau, s"day $d")
      assert(dau <= wau)
    }
  }

  test("q121 gap profile: one user's statistics recomputed directly") {
    val rows = EventAnalytics.interArrivalProfile(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("min_gap_s") <= r.getAs[Long]("max_gap_s"))
      assert(r.getAs[Long]("modal_gap_n") <= r.getAs[Long]("n_gaps"))
      assert(r.getAs[Long]("distinct_gaps") <= r.getAs[Long]("n_gaps"))
    }
    val u = rows.head.getAs[Long]("user_id")
    val ts = graft.core.Tables.events(spark, dir)
      .filter(col("user_id") === u)
      .orderBy("ts", "event_id")
      .select((col("ts").cast("long")).as("s")).collect().map(_.getLong(0))
    val gaps = ts.sliding(2).map(p => p(1) - p(0)).toSeq
    val r = rows.find(_.getAs[Long]("user_id") == u).get
    assert(r.getAs[Long]("n_gaps") == gaps.length)
    assert(r.getAs[Long]("sum_gap_s") == gaps.sum)
    assert(r.getAs[Long]("sum_gap_sq") == gaps.map(g => g * g).sum)
    assert(r.getAs[Long]("modal_gap_n") ==
      gaps.groupBy(identity).values.map(_.size).max)
  }

  test("q126 attribution: hand-built journeys credit exactly") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1: click 2 days before purchase -> attributed. u2: click 8 days
    // before -> outside window. u3: view only -> view-assisted, not
    // click-attributed. u4: purchase with no prior touch.
    val ev = Seq(
      (1L, 1L, "click", ts("2024-01-01 00:00:00"), 0.0),
      (2L, 1L, "purchase", ts("2024-01-03 00:00:00"), 10.0),
      (3L, 2L, "click", ts("2024-01-01 00:00:00"), 0.0),
      (4L, 2L, "purchase", ts("2024-01-09 12:00:00"), 20.0),
      (5L, 3L, "view", ts("2024-01-02 00:00:00"), 0.0),
      (6L, 3L, "purchase", ts("2024-01-03 00:00:00"), 40.0),
      (7L, 4L, "purchase", ts("2024-01-03 00:00:00"), 80.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val dir = tmpDir("attr")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    // Reuse the real reader contract by writing the other tables empty?
    // Not needed: touchAttribution only reads events.
    val out = EventAnalytics.touchAttribution(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val d3 = out("2024-01-03")
    assert(d3.getAs[Long]("n_purchases") == 3)
    assert(d3.getAs[Long]("n_click_attributed") == 1)
    assert(d3.getAs[Long]("n_view_assisted") == 1)
    assert(d3.getAs[Long]("attributed_cents") == 1000L)
    assert(d3.getAs[Long]("total_cents") == 13000L)
    val d9 = out("2024-01-09")
    assert(d9.getAs[Long]("n_click_attributed") == 0,
      "a click 8.5 days before the purchase must not attribute")
  }

  test("session MRR: hand journeys — entry cohorts, reciprocal ranks, session breaks") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1, session A: view → purchase at pos 2 (rr 500000), entry view.
    //          session B (gap > 30 min): click, error — no conversion.
    // user 2: purchase alone → pos 1, rr 1000000, entry purchase.
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "purchase"),
      (3L, 1L, ts("2024-01-01 11:00:00"), "click"),
      (4L, 1L, ts("2024-01-01 11:05:00"), "error"),
      (5L, 2L, ts("2024-01-01 09:00:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = EventAnalytics.sessionMrr(ev).collect()
      .map(r => r.getAs[String]("entry_type") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_converting"),
          r.getAs[Long]("sum_rr_micro"), r.getAs[Long]("conv_ppm"),
          r.getAs[Long]("mrr_micro"))).toMap
    assert(out == Map(
      "view" -> ((1L, 1L, 500000L, 1000000L, 500000L)),
      "click" -> ((1L, 0L, 0L, 0L, 0L)),
      "purchase" -> ((1L, 1L, 1000000L, 1000000L, 1000000L))))
  }

  test("session assoc rules: hand baskets — support, confidence, lift") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // Three sessions (distinct users, no gaps): {A,B}, {A}, {A,B} with a
    // repeated B that must NOT inflate the rule (distinct types per basket).
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "A"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "B"),
      (3L, 2L, ts("2024-01-01 10:00:00"), "A"),
      (4L, 3L, ts("2024-01-01 10:00:00"), "A"),
      (5L, 3L, ts("2024-01-01 10:01:00"), "B"),
      (6L, 3L, ts("2024-01-01 10:02:00"), "B")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = EventAnalytics.sessionAssocRules(ev).collect()
      .map(r => (r.getAs[String]("antecedent"), r.getAs[String]("consequent")) ->
        (r.getAs[Long]("n_both"), r.getAs[Long]("support_ppm"),
          r.getAs[Long]("confidence_ppm"), r.getAs[Long]("lift_milli"))).toMap
    // N=3 sessions; n_A=3, n_B=2, n_both=2.
    // A→B: supp 2/3, conf 2/3, lift (2·3)/(3·2) = 1.0.
    assert(out == Map(
      ("A", "B") -> ((2L, 666666L, 666666L, 1000L)),
      ("B", "A") -> ((2L, 666666L, 1000000L, 1000L))))
  }

  test("position attribution: hand journeys — U-shape, remainder rule, window edge") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: 3 touches → 400/200/400.
      (1L, 1L, ts("2024-01-05 10:00:00"), "click", 0.0),
      (2L, 1L, ts("2024-01-06 10:00:00"), "click", 0.0),
      (3L, 1L, ts("2024-01-07 10:00:00"), "click", 0.0),
      (4L, 1L, ts("2024-01-08 10:00:00"), "purchase", 10.0),
      // u2: purchase, no clicks → none.
      (5L, 2L, ts("2024-01-08 10:00:00"), "purchase", 5.0),
      // u3: click 8 days before → outside the 7-day lookback → none.
      (6L, 3L, ts("2024-01-01 09:00:00"), "click", 0.0),
      (7L, 3L, ts("2024-01-09 10:00:00"), "purchase", 7.0),
      // u4: single touch → solo 1000.
      (8L, 4L, ts("2024-01-08 09:00:00"), "click", 0.0),
      (9L, 4L, ts("2024-01-08 10:00:00"), "purchase", 3.0),
      // u5: 5 touches → first 402 (remainder 2), middles 66, last 400.
      (10L, 5L, ts("2024-01-08 01:00:00"), "click", 0.0),
      (11L, 5L, ts("2024-01-08 02:00:00"), "click", 0.0),
      (12L, 5L, ts("2024-01-08 03:00:00"), "click", 0.0),
      (13L, 5L, ts("2024-01-08 04:00:00"), "click", 0.0),
      (14L, 5L, ts("2024-01-08 05:00:00"), "click", 0.0),
      (15L, 5L, ts("2024-01-08 06:00:00"), "purchase", 10.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    // The operator reads via Tables.events(dir); route through a temp dir.
    val dir = java.nio.file.Files.createTempDirectory("posattr").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventAnalytics.positionAttribution(spark, dir).collect()
      .map(r => r.getAs[String]("cls") ->
        (r.getAs[Long]("n_touches"), r.getAs[Long]("attributed_cents"))).toMap
    // u1 cents 1000: 400 + 200 + 400; u5 cents 1000: 402 + 3×66 + 400.
    assert(got == Map(
      "first" -> ((2L, 400L + 402L)),
      "middle" -> ((4L, 200L + 3 * 66L)),
      "last" -> ((2L, 400L + 400L)),
      "solo" -> ((1L, 300L)),
      "none" -> ((2L, 0L))))
    // Credit conservation: touched purchases allocate Σ = 1000 milli each
    // (up to the per-touch cents floor division, absent here by whole cents).
  }

  test("capped balance: window identity equals the literal imperative fold") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // Hand case exercising floor hits, recovery, and an all-debit user.
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "purchase", 50.0), // +5000 → 5000
      (2L, 1L, ts("2024-01-01 10:01:00"), "error", 70.0),    // −7000 → 0 (hit)
      (3L, 1L, ts("2024-01-01 10:02:00"), "signup", 30.0),   // +3000 → 3000
      (4L, 2L, ts("2024-01-01 10:00:00"), "click", 20.0),    // −2000 → 0 (hit)
      (5L, 2L, ts("2024-01-01 10:01:00"), "view", 10.0)      // −1000 → 0 (hit)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventAnalytics.cappedBalance(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("final_cents"),
          r.getAs[Long]("n_floor_hits"))).toMap
    assert(got == Map(1L -> ((3L, 3000L, 1L)), 2L -> ((2L, 0L, 2L))))
  }

  test("capped balance: corpus-wide equality with a driver-side fold") {
    val dir = "/root/testdata/sf0.001"
    val raw = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("us"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    val expect = raw.groupBy(_._1).map { case (u, rows) =>
      var bal = 0L; var hits = 0L
      rows.sortBy(r => (r._3, r._2)).foreach { r =>
        // HALF_UP like Spark's round() (math.rint would be half-even).
        val cents = BigDecimal(r._5 * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        val d = if (r._4 == "purchase" || r._4 == "signup") cents else -cents
        if (bal + d < 0) { bal = 0L; hits += 1 } else bal += d
      }
      u -> (rows.length.toLong, bal, hits)
    }
    val got = EventAnalytics.cappedBalanceEvents(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("final_cents"),
          r.getAs[Long]("n_floor_hits"))).toMap
    assert(got == expect,
      "the prefix-min identity must equal the imperative max(0, bal+d) fold")
  }

  test("cohort LTV: curves are cumulative, bounded, and partition the user base") {
    val dir = "/root/testdata/sf0.001"
    val rows = EventAnalytics.cohortLtv(spark, dir).collect()
    assert(rows.nonEmpty)
    val users = graft.core.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    val cohorts = rows.groupBy(_.getAs[Long]("cohort_wk"))
    assert(cohorts.values.map(_.head.getAs[Long]("cohort_users")).sum == users,
      "cohort sizes partition the distinct-user base")
    cohorts.foreach { case (_, rs) =>
      val byAge = rs.sortBy(_.getAs[Long]("age"))
      assert(byAge.head.getAs[Long]("age") == 0L, "every cohort starts at age 0")
      val cums = byAge.map(_.getAs[Long]("cum_revenue_cents")).toSeq
      assert(cums == cums.sorted, "cumulative revenue is monotone in age")
      assert(byAge.last.getAs[Long]("cum_revenue_cents") ==
        byAge.map(_.getAs[Long]("revenue_cents")).sum)
      byAge.foreach { r =>
        assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_users"))
      }
    }
  }

  test("session metrics agree on session identity with q32 on the events table") {
    val dir = "/root/testdata/sf0.001"
    val sessions = Extended.eventSessions(spark, dir).count()
    val mrr = EventAnalytics.sessionMrr(spark, dir).collect()
    assert(mrr.map(_.getAs[Long]("n_sessions")).sum == sessions,
      "entry-type cohorts partition exactly the q32 session set")
    mrr.foreach { r =>
      assert(r.getAs[Long]("n_converting") <= r.getAs[Long]("n_sessions"))
      assert(r.getAs[Long]("mrr_micro") <= 1000000L)
    }
  }

  test("markov holdout eval (q172): model and hits match a driver recompute") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val rows = EventAnalytics.markovHoldoutEval(spark, dir).collect()
    assert(rows.nonEmpty)
    // Driver recompute of the whole train/predict/score loop.
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val lo = ev.map(_._3).min; val hi = ev.map(_._3).max
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._4))
      sorted.zip(sorted.tail).map { case (a, b) =>
        (a._2, b._2, a._3 * 2 < lo + hi) }
    }.toSeq
    val model = trans.filter(_._3).groupBy(_._1).view.mapValues { ts =>
      ts.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy { case (t, c) => (-c, t) }.head._1
    }.toMap
    val expected = trans.filterNot(_._3)
      .filter(t => model.contains(t._1))
      .groupBy(_._1).view.mapValues { ts =>
        (ts.size.toLong, ts.count(_._2 == model(ts.head._1)).toLong)
      }.toMap
    rows.foreach { r =>
      val f = r.getAs[String]("from_type")
      assert(r.getAs[String]("predicted") == model(f), s"$f model prediction")
      assert((r.getAs[Long]("n_test"), r.getAs[Long]("n_hits")) == expected(f),
        s"$f eval counts")
      assert(r.getAs[Long]("hit_ppm") ==
        1000000L * expected(f)._2 / expected(f)._1)
    }
    assert(rows.length == expected.size)
  }

  // ----------------------------------------------------------- sessionNdcg

  test("session nDCG: ideal-ordered session scores exactly 1000000 ppm") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // purchase then view IS the ideal ordering -> DCG == IDCG.
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "purchase"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = EventAnalytics.sessionNdcg(ev).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("entry_type") == "purchase")
    assert(out.head.getAs[Long]("mean_ndcg_ppm") == 1000000L)
  }

  test("session nDCG: misordered session matches a driver recompute; zero-gain sessions drop") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // Session: view(g1), purchase(g7), error(g0); ideal: purchase, view.
    // Second user: errors only -> IDCG 0 -> excluded from the cohort mean.
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "purchase"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "error"),
      (4L, 2L, ts("2024-01-01 09:00:00"), "error")
    ).toDF("event_id", "user_id", "ts", "event_type")
    def disc(p: Int): Long =
      math.floor(1e9 / (math.log(p + 1.0) / math.log(2.0)) + 0.5).toLong
    val dcg = 1L * disc(1) + 7L * disc(2)
    val idcg = 7L * disc(1) + 1L * disc(2)
    val expected = 1000000L * dcg / idcg
    val out = EventAnalytics.sessionNdcg(ev).collect()
    assert(out.length == 1, "the zero-gain session contributes no cohort")
    assert(out.head.getAs[String]("entry_type") == "view")
    assert(out.head.getAs[Long]("n_scored") == 1L)
    assert(out.head.getAs[Long]("mean_ndcg_ppm") == expected)
  }

  // ----------------------------------------- frequentEventPaths (q260)
  test("frequent paths: planted journeys counted with user support") {
    import spark.implicits._
    // u1 and u2 both walk view > cart > buy; u1 twice (overlapping
    // windows: v c b v c b has trigrams vcb, cbv, bvc, vcb).
    def walk(u: Long, base: Long, ts: Seq[String]) =
      ts.zipWithIndex.map { case (t, i) => (u, t, base + i, base + i) }
    val ev = (walk(1L, 100L, Seq("view", "cart", "buy", "view", "cart", "buy")) ++
      walk(2L, 200L, Seq("view", "cart", "buy")))
      .toDF("user_id", "event_type", "event_id", "sec")
    val out = EventAnalytics.frequentEventPathsOf(ev, steps = 3, topK = 10)
      .collect().map(r => r.getAs[String]("path") ->
        (r.getAs[Long]("n_paths"), r.getAs[Long]("n_users"))).toMap
    assert(out("view > cart > buy") == ((3L, 2L)))
    assert(out("cart > buy > view") == ((1L, 1L)))
    // Short users (< steps events) contribute nothing.
    val short = walk(3L, 300L, Seq("view", "cart"))
      .toDF("user_id", "event_type", "event_id", "sec")
    assert(EventAnalytics.frequentEventPathsOf(short, 3, 10).count() == 0L)
  }
}
