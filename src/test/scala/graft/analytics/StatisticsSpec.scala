package graft.analytics

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class StatisticsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def perDay(rows: (String, Int, Long, Long)*) =
    rows.toDF("g", "day", "a", "b")

  private def rho(rows: (String, Int, Long, Long)*): Map[String, Long] =
    Statistics.spearman(perDay(rows: _*), "g", "day", "a", "b").collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Long]("rho_micro")).toMap

  test("spearman: monotone agreement is exactly +1e6") {
    val out = rho(("g", 1, 10L, 100L), ("g", 2, 20L, 200L),
      ("g", 3, 30L, 400L), ("g", 4, 40L, 800L))
    assert(out("g") == 1000000L)
  }

  test("spearman: perfect reversal is exactly -1e6") {
    // Reversed ranks, n=4: sum_d2 = 9+1+1+9 = 20; 1e6 - 6e6*20/60 = -1e6.
    val out = rho(("g", 1, 10L, 800L), ("g", 2, 20L, 400L),
      ("g", 3, 30L, 200L), ("g", 4, 40L, 100L))
    assert(out("g") == -1000000L)
  }

  test("spearman: hand-computed mid-range value with one swapped pair") {
    // a-ranks 1..4 by day; b swaps days 3,4: rb = 1,2,4,3 → sum_d2 = 2.
    // rho_micro = 1e6 - (6e6*2) div 60 = 1e6 - 200000 = 800000.
    val out = rho(("g", 1, 10L, 1L), ("g", 2, 20L, 2L),
      ("g", 3, 30L, 4L), ("g", 4, 40L, 3L))
    assert(out("g") == 800000L)
  }

  test("spearman: metric ties break by the x column, deterministically") {
    // a ties on days 1,2 → ra follows day order (1,2); any engine agrees.
    val out = rho(("g", 1, 10L, 5L), ("g", 2, 10L, 6L), ("g", 3, 30L, 7L))
    assert(out("g") == 1000000L, "tie broken by day keeps monotone agreement")
  }

  test("spearman: degenerate single-row groups are filtered, not divided by zero") {
    val out = rho(("lone", 1, 10L, 20L),
      ("ok", 1, 1L, 1L), ("ok", 2, 2L, 2L))
    assert(!out.contains("lone") && out("ok") == 1000000L)
  }

  private def mw(rows: (String, Boolean, Long, Long)*): Map[String, (Long, Long, Long, Long, Option[Long])] =
    Statistics.mannWhitney(rows.toDF("g", "is_a", "v", "id"), "g", "is_a", "v", "id")
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("u_a"),
          r.getAs[Long]("u_b"),
          Option(r.getAs[Any]("rb_micro")).map(_.asInstanceOf[Long])))).toMap

  test("mannWhitney: total separation hits the ±1e6 effect-size poles") {
    val lo = mw(("g", true, 1L, 1L), ("g", true, 2L, 2L),
      ("g", false, 3L, 3L), ("g", false, 4L, 4L))
    assert(lo("g") == ((2L, 2L, 0L, 4L, Some(-1000000L))))
    val hi = mw(("g", true, 3L, 1L), ("g", true, 4L, 2L),
      ("g", false, 1L, 3L), ("g", false, 2L, 4L))
    assert(hi("g") == ((2L, 2L, 4L, 0L, Some(1000000L))))
  }

  test("mannWhitney: interleaved cohorts land mid-scale, hand-computed") {
    // A ranks {1,3}: R_a=4, U_a=1, U_b=3, rb = (2e6*1) div 4 - 1e6.
    val out = mw(("g", true, 10L, 1L), ("g", false, 20L, 2L),
      ("g", true, 30L, 3L), ("g", false, 40L, 4L))
    assert(out("g") == ((2L, 2L, 1L, 3L, Some(-500000L))))
  }

  test("mannWhitney: value ties break by id, deterministically") {
    // Both rows value 10: rank follows id, so A gets rank 1.
    val out = mw(("g", true, 10L, 1L), ("g", false, 10L, 2L))
    assert(out("g") == ((1L, 1L, 0L, 1L, Some(-1000000L))))
  }

  test("mannWhitney: a one-sided group reports null effect, not a crash") {
    val out = mw(("g", true, 1L, 1L), ("g", true, 2L, 2L))
    assert(out("g") == ((2L, 0L, 0L, 0L, None)))
  }

  private def chi(rows: (String, String, Int)*): (Long, Long, Long) = {
    val obs = rows.flatMap { case (r, c, k) => Seq.fill(k)((r, c)) }
      .toDF("r", "c")
    val row = Statistics.chiSquare(obs, "r", "c").collect().head
    (row.getAs[Long]("n"), row.getAs[Long]("dof"),
      row.getAs[Long]("chi2_nanounits"))
  }

  test("chiSquare: exact independence scores exactly zero") {
    // Every cell O = R·C/N: 10,20 / 20,40.
    val (n, dof, chi2) = chi(("r1", "c1", 10), ("r1", "c2", 20),
      ("r2", "c1", 20), ("r2", "c2", 40))
    assert((n, dof, chi2) == ((90L, 1L, 0L)))
  }

  test("chiSquare: a perfectly dependent 2x2 diagonal scores chi2 = N") {
    // Diagonal-only: each of the 4 grid cells contributes exactly 5e9.
    val (n, dof, chi2) = chi(("r1", "c1", 10), ("r2", "c2", 10))
    assert((n, dof, chi2) == ((20L, 1L, 20000000000L)))
  }

  test("chiSquare: absent grid cells still carry their expected mass") {
    // 2x3 with an empty (r2,c3) cell — dof counts categories, not cells.
    val (_, dof, chi2) = chi(("r1", "c1", 5), ("r1", "c2", 5), ("r1", "c3", 5),
      ("r2", "c1", 5), ("r2", "c2", 5))
    assert(dof == 2L && chi2 > 0L)
  }

  test("spearman: groups are independent and sum_d2/n are reported exactly") {
    val df = Statistics.spearman(perDay(
      ("up", 1, 1L, 10L), ("up", 2, 2L, 20L), ("up", 3, 3L, 30L),
      ("down", 1, 1L, 30L), ("down", 2, 2L, 20L), ("down", 3, 3L, 10L)),
      "g", "day", "a", "b").collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sum_d2")))).toMap
    assert(df("up") == ((3L, 0L)))
    assert(df("down") == ((3L, 8L))) // (1-3)^2 + 0 + (3-1)^2
  }

  private def ks(rows: (String, Long)*): Map[String, (Long, Long, Long, Long)] =
    Statistics.ksAgainstRest(rows.toDF("g", "v"), "g", "v").collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n1"), r.getAs[Long]("n2"),
          r.getAs[Long]("d_num"), r.getAs[Long]("d_micro")))).toMap

  test("ks: disjoint supports reach exactly D = 1") {
    val out = ks(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
    assert(out("a") == ((2L, 2L, 4L, 1000000L)))
    assert(out("b") == ((2L, 2L, 4L, 1000000L)))
  }

  test("ks: identical distributions give exactly D = 0") {
    val out = ks(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
    assert(out("a") == ((2L, 2L, 0L, 0L)))
  }

  test("ks: hand-computed half-overlap case") {
    // a={1,3}, b={2,3}: ECDFs differ only on [1,2) → D = 1/2.
    // d_num at v=1: |n2·c1 − n1·c2| = |2·1 − 2·0| = 2; n1·n2 = 4.
    val out = ks(("a", 1L), ("a", 3L), ("b", 2L), ("b", 3L))
    assert(out("a") == ((2L, 2L, 2L, 500000L)))
  }

  test("ks: each group tests against the POOLED rest, not pairwise") {
    // c's rest is {1,2}: at v=2, c1=0, c2=2 → d_num = |2·0 − 1·2| = 2.
    val out = ks(("a", 1L), ("b", 2L), ("c", 3L))
    assert(out("c") == ((1L, 2L, 2L, 1000000L)))
  }

  test("pr curve: hand-computed cumulative confusion table") {
    import spark.implicits._
    val df = Seq((3L, true), (3L, false), (2L, true), (1L, false), (1L, true))
      .toDF("s", "y")
    val got = Statistics.prCurve(df, col("s"), col("y")).collect()
      .map(r => r.getAs[Long]("threshold") ->
        (r.getAs[Long]("n_pred"), r.getAs[Long]("n_tp"),
          r.getAs[Long]("precision_ppm"), r.getAs[Long]("recall_ppm"))).toMap
    assert(got == Map(
      3L -> ((2L, 1L, 500000L, 333333L)),
      2L -> ((3L, 2L, 666666L, 666666L)),
      1L -> ((5L, 3L, 600000L, 1000000L))))
  }

  test("quantile normalization: hand-computed pooled mapping") {
    import spark.implicits._
    val df = Seq(("g1", 1L, 101L), ("g1", 2L, 102L), ("g1", 3L, 103L),
      ("g1", 4L, 104L), ("g2", 10L, 201L), ("g2", 20L, 202L))
      .toDF("g", "v", "id")
    val got = Statistics.quantileNormalize(df, col("g"), col("v"), col("id"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("lvv"), r.getAs[Long]("rank_in_group"))).toMap
    // N=6; g1 (n=4): target ranks ⌈r·6/4⌉ = 2,3,5,6 → pooled values
    // 2,3,10,20; g2 (n=2): targets 3,6 → 3,20.
    assert(got == Map(
      101L -> ((2L, 1L)), 102L -> ((3L, 2L)), 103L -> ((10L, 3L)),
      104L -> ((20L, 4L)), 201L -> ((3L, 1L)), 202L -> ((20L, 2L))))
  }

  test("quantile normalization: every row maps to exactly one pooled level; monotone per group") {
    val out = Statistics.docLengthQuantileNorm(spark, dir).collect()
    val docs = graft.core.Tables.documents(spark, dir).count()
    assert(out.length.toLong == docs, "the interval join is a bijection on rows")
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank_in_group"))
      val norms = byRank.map(_.getAs[Long]("norm_chars")).toSeq
      assert(norms == norms.sorted, "normalized values are monotone in rank")
    }
    // Equal-sized groups receive identical normalized multisets — the
    // defining property of quantile normalization.
    val bySize = out.groupBy(_.getAs[String]("source"))
      .values.groupBy(_.size).filter(_._2.size >= 2)
    bySize.foreach { case (_, groups) =>
      val sets = groups.map(_.map(_.getAs[Long]("norm_chars")).sorted.toSeq).toSet
      assert(sets.size == 1, "same-size groups must normalize identically")
    }
  }

  test("pr curve: corpus sweep is monotone and terminates at full recall") {
    val rows = Statistics.docLengthPrCurve(spark, dir).collect()
      .sortBy(-_.getAs[Long]("threshold"))
    assert(rows.length > 10)
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi.getAs[Long]("n_pred") < lo.getAs[Long]("n_pred"),
        "lowering the threshold strictly grows the predicted set")
      assert(hi.getAs[Long]("recall_ppm") <= lo.getAs[Long]("recall_ppm"),
        "recall is monotone in the sweep direction")
      assert(hi.getAs[Long]("n_tp") <= lo.getAs[Long]("n_tp"))
    }
    assert(rows.last.getAs[Long]("recall_ppm") == 1000000L,
      "the all-inclusive threshold captures every positive")
  }

  test("two-proportion z-test matches a driver recompute of the formula (q163)") {
    val r = Statistics.conversionZTest(spark, "/root/testdata/sf0.001").head()
    val (n1, k1) = (r.getAs[Long]("n1"), r.getAs[Long]("k1"))
    val (n2, k2) = (r.getAs[Long]("n2"), r.getAs[Long]("k2"))
    assert(n1 > 0 && n2 > 0)
    val z =
      if (k1 + k2 == 0 || k1 + k2 == n1 + n2) 0.0
      else {
        val (p1, p2) = (k1.toDouble / n1, k2.toDouble / n2)
        val pp = (k1 + k2).toDouble / (n1 + n2)
        (p1 - p2) / math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2))
      }
    assert(r.getAs[Long]("z_micro") == math.floor(z * 1e6 + 0.5).toLong)
    assert(r.getAs[Boolean]("significant_05") == (math.abs(z) >= 1.959964))
  }

  test("CUPED (q167): sufficient stats exact, theta/rho2 match the formula") {
    val r = Statistics.cupedVarianceReduction(spark, "/root/testdata/sf0.001").head()
    val (n, sx, sy) = (r.getAs[Long]("n"), r.getAs[Long]("sx"), r.getAs[Long]("sy"))
    val (sxx, syy, sxy) = (r.getAs[Long]("sxx"), r.getAs[Long]("syy"), r.getAs[Long]("sxy"))
    assert(n > 0 && sx > 0 && sy > 0, "both periods must carry events")
    val covN = n.toDouble * sxy - sx.toDouble * sy
    val varX = n.toDouble * sxx - sx.toDouble * sx
    val varY = n.toDouble * syy - sy.toDouble * sy
    assert(varX > 0 && varY > 0)
    assert(r.getAs[Long]("theta_micro") ==
      math.floor(covN / varX * 1e6 + 0.5).toLong)
    val rho2 = covN * covN / (varX * varY)
    assert(r.getAs[Long]("var_reduction_ppm") ==
      math.floor(rho2 * 1e6 + 0.5).toLong)
    assert(rho2 >= 0 && rho2 <= 1.0 + 1e-12, s"rho2 out of range: $rho2")
  }

  // ------------------------------------------------------------ kendallTauB

  private def tau(rows: (String, Int, Long, Long)*) =
    Statistics.kendallTauB(rows.toDF("g", "x", "a", "b"), "g", "x", "a", "b")
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n0"), r.getAs[Long]("nc"), r.getAs[Long]("nd"),
          r.getAs[Long]("n1"), r.getAs[Long]("n2"),
          Option(r.getAs[Any]("tau_b_micro")).map(_.asInstanceOf[Long])))).toMap

  test("kendallTauB: perfect concordance and perfect reversal hit the poles") {
    val out = tau(
      ("up", 1, 1L, 1L), ("up", 2, 2L, 2L), ("up", 3, 3L, 3L), ("up", 4, 4L, 4L),
      ("dn", 1, 1L, 4L), ("dn", 2, 2L, 3L), ("dn", 3, 3L, 2L), ("dn", 4, 4L, 1L))
    assert(out("up") == ((6L, 6L, 0L, 0L, 0L, Some(1000000L))))
    assert(out("dn") == ((6L, 0L, 6L, 0L, 0L, Some(-1000000L))))
  }

  test("kendallTauB: hand-computed tie correction") {
    // a = 1,2,2,3 vs b = 1,2,3,4: nc=5, n1=1 (the a-tie), nd=n2=0.
    // tau_b = 5/sqrt(5*6) = 0.91287... -> floor(912870.93 + 0.5) = 912871.
    val out = tau(("g", 1, 1L, 1L), ("g", 2, 2L, 2L),
      ("g", 3, 2L, 3L), ("g", 4, 3L, 4L))
    assert(out("g") == ((6L, 5L, 0L, 1L, 0L, Some(912871L))))
  }

  test("kendallTauB: a fully-tied side reports null, not a division error") {
    val out = tau(("g", 1, 7L, 1L), ("g", 2, 7L, 2L), ("g", 3, 7L, 3L))
    assert(out("g")._6.isEmpty)
  }

  // ---------------------------------------------------------------- psi

  test("psi: identical distributions yield zero terms; a shifted bin is positive") {
    val binned = Seq(
      // "same": ref and cur both 10 rows in bin 0, 10 in bin 1.
      ("same", true, 0L), ("same", false, 0L), ("same", true, 1L), ("same", false, 1L),
      // "shift": ref all in bin 0, cur all in bin 1.
      ("shift", true, 0L), ("shift", true, 0L), ("shift", false, 1L), ("shift", false, 1L))
      .toDF("g", "is_ref", "bin")
    val out = Statistics.psi(binned, "g", "is_ref", "bin", 10)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("bin")) ->
        r.getAs[Long]("term_ppm")).toMap
    // Equal counts -> p = q exactly -> term is exactly 0 ppm.
    assert(out(("same", 0L)) == 0L && out(("same", 1L)) == 0L)
    // Shifted mass -> strictly positive terms on both bins.
    assert(out(("shift", 0L)) > 0L && out(("shift", 1L)) > 0L)
  }

  test("psi: terms are never negative (same-sign identity)") {
    val binned = Seq(("g", true, 0L), ("g", true, 1L), ("g", false, 1L),
      ("g", false, 2L), ("g", false, 2L)).toDF("g", "is_ref", "bin")
    val out = Statistics.psi(binned, "g", "is_ref", "bin", 10).collect()
    assert(out.forall(_.getAs[Long]("term_ppm") >= 0L))
  }

  test("psi: matches a hand-computed smoothed term") {
    // One bin, ref 3 of 3, cur 0 of 1; B=10.
    // p = 4/13, q = 1/11; term = (p-q)*ln(p/q).
    val binned = Seq(("g", true, 0L), ("g", true, 0L), ("g", true, 0L),
      ("g", false, 1L)).toDF("g", "is_ref", "bin")
    val out = Statistics.psi(binned, "g", "is_ref", "bin", 10)
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("term_ppm")).toMap
    val p = 4.0 / 13.0; val q = 1.0 / 11.0
    assert(out(0L) == math.floor((p - q) * math.log(p / q) * 1e6 + 0.5).toLong)
  }

  // ----------------------------------------------------- neymanAllocation

  test("neymanAllocation: zero-variance strata get zero; spread dominates size") {
    val rows = Seq(
      ("flat", 10L), ("flat", 10L), ("flat", 10L), ("flat", 10L),
      ("wild", 0L), ("wild", 100L), ("wild", 0L), ("wild", 100L))
      .toDF("h", "v")
    val out = Statistics.neymanAllocation(rows, "h", "v", 1000L)
      .collect().map(r => r.getAs[String]("h") ->
        ((r.getAs[Long]("s"), r.getAs[Long]("ss"), r.getAs[Long]("w_int"),
          r.getAs[Long]("alloc")))).toMap
    assert(out("flat") == ((40L, 400L, 0L, 0L)), "no spread -> no samples")
    // wild: det = 4*20000 - 200^2 = 40000 (in double, exact);
    // w = sqrt(4*40000/3) = sqrt(53333.33) = 230.94 -> 231; alloc = 1000.
    assert(out("wild") == ((200L, 20000L, 231L, 1000L)))
  }

  test("neymanAllocation: equal strata split the budget equally") {
    val rows = Seq(("a", 0L), ("a", 10L), ("b", 0L), ("b", 10L))
      .toDF("h", "v")
    val out = Statistics.neymanAllocation(rows, "h", "v", 1000L)
      .collect().map(r => r.getAs[String]("h") -> r.getAs[Long]("alloc")).toMap
    assert(out == Map("a" -> 500L, "b" -> 500L))
  }

  // ----------------------------------------------------------- diffInDiff

  test("diffInDiff: hand-computed cells — control trend differences out") {
    // T: pre mean 100, post 150 (+50); C: pre 10, post 40 (+30) -> DiD 20.
    val rows = Seq(
      (true, false, 100L), (true, true, 150L),
      (false, false, 10L), (false, true, 40L))
      .toDF("t", "p", "v")
    val out = Statistics.diffInDiff(rows, "t", "p", "v").collect()
    assert(out.length == 4)
    out.foreach(r => assert(r.getAs[Long]("did_micro") == 20L * 1000000L))
  }

  test("diffInDiff: parallel trends yield exactly zero effect") {
    val rows = Seq(
      (true, false, 100L), (true, true, 130L),
      (false, false, 50L), (false, true, 80L))
      .toDF("t", "p", "v")
    val out = Statistics.diffInDiff(rows, "t", "p", "v").collect()
    out.foreach(r => assert(r.getAs[Long]("did_micro") == 0L))
  }

  // -------------------------------------------------------- bootstrapMeanCi

  test("bootstrapMeanCi: replicate means bracket the point estimate; CI ranks are exact") {
    val rows = (1 to 200).map(i => (i.toLong, (i % 50).toLong * 10))
      .toDF("id", "v")
    val out = Statistics.bootstrapMeanCi(rows, "v", "id", b = 100).collect()
    assert(out.length == 100, "every replicate must have positive mass")
    val means = out.map(_.getAs[Long]("mean_micro")).sorted
    val lo = out.head.getAs[Long]("ci_lo_micro")
    val hi = out.head.getAs[Long]("ci_hi_micro")
    assert(lo == means(2) && hi == means(97), "CI = 3rd and 98th order stats")
    assert(out.forall(r => r.getAs[Long]("ci_lo_micro") == lo &&
      r.getAs[Long]("ci_hi_micro") == hi))
    // The true mean must sit inside the 95% CI.
    val vs = (1 to 200).map(i => (i % 50).toLong * 10)
    val trueMean = vs.sum * 1000000L / vs.length
    assert(lo <= trueMean && trueMean <= hi, s"$lo <= $trueMean <= $hi")
  }

  test("bootstrapMeanCi: weights are deterministic — identical runs agree") {
    val rows = (1 to 50).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    def run() = Statistics.bootstrapMeanCi(rows, "v", "id", b = 20)
      .collect().map(r => r.getAs[Long]("rep") -> r.getAs[Long]("mean_micro")).toMap
    assert(run() == run())
  }

  // ---------------------------------------------------------- ebShrunkRates

  test("ebShrunkRates: thin entities shrink to the prior, thick ones barely move") {
    // Global rate: 100 pos / 1000 n = 10%.
    val rows = Seq(("thin", 1L, 1L), ("thick", 899L, 89L), ("mid", 100L, 10L))
      .toDF("e", "n", "pos")
    val out = Statistics.ebShrunkRates(rows, "n", "pos", 20)
      .collect().map(r => r.getAs[String]("e") ->
        ((r.getAs[Long]("raw_ppm"), r.getAs[Long]("shrunk_ppm")))).toMap
    // thin: raw 100%; shrunk = 1e6*(1*1000 + 20*100)/(1000*21) = 142857.
    assert(out("thin") == ((1000000L, 142857L)))
    // mid sits exactly at the global rate -> shrinkage is a no-op.
    assert(out("mid")._1 == 100000L && out("mid")._2 == 100000L)
    // thick: raw 99000/1000000-ish; shrunk moves < 1% of the gap.
    val (rawT, shrT) = out("thick")
    assert(math.abs(shrT - rawT) * 20 < math.abs(out("thin")._2 - out("thin")._1))
  }

  // ------------------------------------------------------ standardizedMeans

  test("standardizedMeans: composition effect cancels under a common mix") {
    // Stratum means identical across groups (h1: 100, h2: 200) but group
    // A is 90% h2 and B is 90% h1: crude means differ wildly, the
    // standardized means must be EQUAL.
    val rows =
      (Seq.fill(1)(("A", "h1", 100L)) ++ Seq.fill(9)(("A", "h2", 200L)) ++
        Seq.fill(9)(("B", "h1", 100L)) ++ Seq.fill(1)(("B", "h2", 200L)))
        .toDF("g", "h", "v")
    val out = Statistics.standardizedMeans(rows, "g", "h", "v")
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("crude_micro"), r.getAs[Long]("std_micro")))).toMap
    assert(out("A")._1 != out("B")._1, "crude means confounded by mix")
    assert(out("A")._2 == out("B")._2, "standardization removes composition")
    // Both standardize to the global-mix blend: (10*100 + 10*200)/20 = 150.
    assert(out("A")._2 == 150000000L)
  }

  test("standardizedMeans: identical mixes leave crude == standardized") {
    val rows = Seq(("A", "h1", 10L), ("A", "h2", 30L),
      ("B", "h1", 20L), ("B", "h2", 40L)).toDF("g", "h", "v")
    val out = Statistics.standardizedMeans(rows, "g", "h", "v")
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("crude_micro"), r.getAs[Long]("std_micro")))).toMap
    out.values.foreach { case (c, s) => assert(c == s) }
  }

  // -------------------------------------------------------------- sprtTrace

  test("sprtTrace: strong positive evidence crosses the H1 boundary and sticks") {
    // p0=0.1 vs p1=0.3; feed days at 50% conversion — overwhelming H1.
    val daily = (1 to 10).map(i => (f"day$i%02d", 20L, 10L))
      .toDF("day", "n", "pos")
    val out = Statistics.sprtTrace(daily, "day", "n", "pos", 0.1, 0.3, 0.05)
      .orderBy(col("day")).collect()
    assert(out.last.getAs[String]("decision") == "accept_h1")
    // Cumulative sum is a strict prefix sum of the day terms.
    val terms = out.map(_.getAs[Long]("llr_day_micro"))
    val cums = out.map(_.getAs[Long]("cum_llr_micro"))
    assert(cums.toSeq == terms.scanLeft(0L)(_ + _).tail.toSeq)
  }

  test("sprtTrace: null-rate data drifts to accept_h0, never accept_h1") {
    val daily = (1 to 40).map(i => (f"day$i%02d", 20L, 2L))
      .toDF("day", "n", "pos") // exactly p0 = 0.1
    val out = Statistics.sprtTrace(daily, "day", "n", "pos", 0.1, 0.3, 0.05)
      .collect()
    assert(!out.exists(_.getAs[String]("decision") == "accept_h1"))
  }

  // --------------------------------------------------------------- anovaF

  test("anovaF: hand-computed two-group case — F and eta-squared exact") {
    // a = {0,10}, b = {100,110}: group means 5/105, grand 55.
    // SSB = 2*50^2 + 2*50^2 = 10000; SSW = 25+25+25+25 = 100.
    // F = (10000/1)/(100/2) = 200; eta2 = 10000/10100 = 0.990099...
    val rows = Seq(("a", 0L), ("a", 10L), ("b", 100L), ("b", 110L))
      .toDF("g", "v")
    val out = Statistics.anovaF(rows, "g", "v").collect().head
    assert(out.getAs[Long]("k_groups") == 2L)
    assert(out.getAs[Long]("n_total") == 4L)
    assert(out.getAs[Long]("ssb") == 10000L)
    assert(out.getAs[Long]("ssw") == 100L)
    assert(out.getAs[Long]("f_micro") == 200000000L)
    assert(out.getAs[Long]("eta2_ppm") == 990099L)
  }

  // ----------------------------------------------------- kruskalWallis

  test("kruskalWallis: hand-computed three-group no-tie case") {
    // g1={1,2} g2={3,4} g3={5,6}: ranks 1..6, R = 3/7/11.
    // H = 12/(6*7)*(9/2+49/2+121/2) - 3*7 = 4.571428...; no ties -> Hc = H.
    val rows = Seq(("g1", 1L), ("g1", 2L), ("g2", 3L), ("g2", 4L),
      ("g3", 5L), ("g3", 6L)).toDF("g", "v")
    val out = Statistics.kruskalWallis(rows, "g", "v").collect().head
    assert(out.getAs[Long]("k_groups") == 3L)
    assert(out.getAs[Long]("n_total") == 6L)
    assert(out.getAs[Long]("h_micro") == 4571429L)
    assert(out.getAs[Long]("hc_micro") == 4571429L)
  }

  test("kruskalWallis: ties take average ranks and the correction divides") {
    // g1={1,1} g2={2,2}: avg ranks 1.5/3.5, H = 2.4;
    // tie sum = 6+6 = 12, C = 1 - 12/60 = 0.8, Hc = 3.0.
    val rows = Seq(("g1", 1L), ("g1", 1L), ("g2", 2L), ("g2", 2L))
      .toDF("g", "v")
    val out = Statistics.kruskalWallis(rows, "g", "v").collect().head
    assert(out.getAs[Long]("h_micro") == 2400000L)
    assert(out.getAs[Long]("hc_micro") == 3000000L)
  }

  test("kruskalWallis: identical distributions score near zero") {
    // Same multiset in both groups -> rank sums proportional to size.
    val rows = (1 to 50).flatMap(i => Seq(("a", i.toLong), ("b", i.toLong)))
      .toDF("g", "v")
    val out = Statistics.kruskalWallis(rows, "g", "v").collect().head
    assert(math.abs(out.getAs[Long]("h_micro")) < 1000L)
  }

  test("anovaF: identical group means yield zero between-group variance") {
    val rows = Seq(("a", 0L), ("a", 10L), ("b", 0L), ("b", 10L))
      .toDF("g", "v")
    val out = Statistics.anovaF(rows, "g", "v").collect().head
    assert(out.getAs[Long]("ssb") == 0L)
    assert(out.getAs[Long]("f_micro") == 0L)
    assert(out.getAs[Long]("eta2_ppm") == 0L)
  }

  // -------------------------------------------------- mutualInformation

  test("mutualInformation: perfectly dependent pair carries ln(2) nats") {
    // X == Y over two balanced values: each observed cell's term is
    // 0.5*ln(2) -> 346,574 ppm-nats; MI = 693,148 ppm (~= ln 2).
    val obs = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x", "y")
    val out = Statistics.mutualInformation(obs, "x", "y").collect()
    assert(out.length == 2, "only observed cells are emitted")
    assert(out.forall(_.getAs[Long]("term_ppm") == 346574L))
    assert(out.forall(_.getAs[Long]("mi_ppm") == 693148L))
  }

  test("mutualInformation: independent uniform pair has zero MI") {
    val obs = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .toDF("x", "y")
    val out = Statistics.mutualInformation(obs, "x", "y").collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Long]("mi_ppm") == 0L))
  }

  // ----------------------------------------------------- lorenzDeciles

  test("lorenzDeciles: hand shares — one entity per tile, exact ppm") {
    // Values 100..1000 cents (1..10 whole dollars — the tile key needs
    // distinct dollars), deciles by value desc: tile 1 = {1000}, tile 10
    // = {100}; shares reduce to 10/55 etc.
    val per = (1L to 10L).map(v => (v, v * 100L)).toDF("id", "cents")
    val out = Statistics.lorenzDeciles(per, "cents", "id")
      .orderBy("decile").collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Long]("n") == 1L))
    assert(out.head.getAs[Long]("cents") == 1000L)
    assert(out.head.getAs[Long]("share_ppm") == 181818L)
    assert(out.last.getAs[Long]("cents") == 100L)
    assert(out.last.getAs[Long]("cum_share_ppm") == 1000000L)
    // Cumulative share is concave: per-tile share nonincreasing.
    out.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi.getAs[Long]("share_ppm") >= lo.getAs[Long]("share_ppm"))
    }
  }

  // ----------------------------------------------- jonckheereTerpstra

  test("jonckheereTerpstra: hand no-tie monotone case") {
    // g1={1,2} g2={3,4} g3={5,6}: every cross-pair ascends -> J=12,
    // J2=24; E2=12; Var=456/72=6.333; z=(24-12)/(2*2.5166)=2.384158.
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L),
      (3L, 6L)).toDF("s", "v")
    val out = Statistics.jonckheereTerpstra(rows, "s", "v").collect().head
    assert(out.getAs[Long]("k_groups") == 3L)
    assert(out.getAs[Long]("j2") == 24L)
    assert(out.getAs[Long]("e2") == 12L)
    assert(out.getAs[Long]("z_micro") == 2384158L)
  }

  test("jonckheereTerpstra: ties carry half-weight and correct the variance") {
    // g1={1,1} g2={1,2}: U12 = 2 less + 2 ties/2 = 3 -> J2 = 6; E2 = 4;
    // Var = 54/72 + 24/96 = 1.0 -> z = (6-4)/2 = 1.0.
    val rows = Seq((1L, 1L), (1L, 1L), (2L, 1L), (2L, 2L)).toDF("s", "v")
    val out = Statistics.jonckheereTerpstra(rows, "s", "v").collect().head
    assert(out.getAs[Long]("j2") == 6L)
    assert(out.getAs[Long]("e2") == 4L)
    assert(out.getAs[Long]("z_micro") == 1000000L)
  }

  test("jonckheereTerpstra: reversed order scores the negated z") {
    val up = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L),
      (3L, 6L))
    val down = up.map { case (s, v) => (4L - s, v) }
    val zUp = Statistics.jonckheereTerpstra(up.toDF("s", "v"), "s", "v")
      .collect().head.getAs[Long]("z_micro")
    val zDown = Statistics.jonckheereTerpstra(down.toDF("s", "v"), "s", "v")
      .collect().head.getAs[Long]("z_micro")
    assert(zUp == -zDown && zUp > 0L)
  }

  // --------------------------------------------------- moodsMedianTest

  test("moodsMedianTest: hand k=2 split around the exact grand median") {
    // g1 = {1,2,3,4}, g2 = {5,6,7,8}: N = 8, lower median = 4 (first v
    // with 2*cum >= 8). above: g1 -> 0, g2 -> 4; tot_above = 4.
    // Expected above per group = 2; each group's chi2 term =
    // (0-2)^2/2 + (4-2)^2/2 = 4 for g1 and the same for g2 -> chi2 = 8.
    val rows = ((1L to 4L).map(("g1", _)) ++ (5L to 8L).map(("g2", _)))
      .toDF("g", "v")
    val out = Statistics.moodsMedianTest(rows, "g", "v").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(out("g1").getAs[Long]("median_v") == 4L)
    assert(out("g1").getAs[Long]("above_g") == 0L)
    assert(out("g2").getAs[Long]("above_g") == 4L)
    out.values.foreach { r =>
      assert(r.getAs[Long]("term_micro") == 4000000L)
      assert(r.getAs[Long]("chi2_micro") == 8000000L)
    }
  }

  test("moodsMedianTest: identical groups score zero") {
    val rows = (1L to 9L).flatMap(v => Seq(("a", v), ("b", v)))
      .toDF("g", "v")
    val out = Statistics.moodsMedianTest(rows, "g", "v").collect()
    out.foreach(r => assert(r.getAs[Long]("chi2_micro") == 0L))
    // Lower median of 1..9 duplicated is 5.
    assert(out.head.getAs[Long]("median_v") == 5L)
  }

  // ---------------------------------------------------- overdispersion

  test("overdispersion: hand variance-to-mean values") {
    // counts {2,4,6}: mean 4, s^2 = (3*56 - 144)/(3*2) = 4 -> D = 1,
    // z = 0. counts {0,0,12}: mean 4, s^2 = (3*144-144)/6 = 48 ->
    // D = 12, z = 11 * sqrt(1) = 11.
    val rows = Seq(("p", 1L, 2L), ("p", 2L, 4L), ("p", 3L, 6L),
      ("c", 1L, 0L), ("c", 2L, 0L), ("c", 3L, 12L)).toDF("g", "day", "c")
    val out = Statistics.overdispersion(rows.select(col("g"), col("c")),
      "g", "c").collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("p").getAs[Long]("dispersion_micro") == 1000000L)
    assert(out("p").getAs[Long]("z_micro") == 0L)
    assert(out("c").getAs[Long]("dispersion_micro") == 12000000L)
    assert(out("c").getAs[Long]("z_micro") == 11000000L)
  }

  test("overdispersion: degenerate series report null") {
    val rows = Seq(("one", 5L), ("zero", 0L), ("zero", 0L)).toDF("g", "c")
    val out = Statistics.overdispersion(rows, "g", "c").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(out("one").isNullAt(out("one").fieldIndex("dispersion_micro")))
    assert(out("zero").isNullAt(out("zero").fieldIndex("z_micro")))
  }

  // ------------------------------------------------------ friedmanTest

  test("friedmanTest: perfectly concordant blocks score W = 1") {
    // 3 blocks, 3 treatments, same order every block: R = (3, 6, 9),
    // chi2 = 12/(3*3*4)*126 - 36 = 6; W = 6/(3*2) = 1.
    val cells = (1 to 3).flatMap(b =>
      Seq((s"b$b", "A", 10L), (s"b$b", "B", 20L), (s"b$b", "C", 30L)))
      .toDF("blk", "trt", "v")
    val out = Statistics.friedmanTest(cells, "blk", "trt", "v")
      .orderBy("treatment").collect()
    assert(out.map(_.getAs[Long]("r_sum")).toSeq == Seq(3L, 6L, 9L))
    out.foreach { r =>
      assert(r.getAs[Long]("b_blocks") == 3L)
      assert(r.getAs[Long]("chi2_micro") == 6000000L)
      assert(r.getAs[Long]("w_ppm") == 1000000L)
    }
  }

  test("friedmanTest: alternating order scores zero; incomplete blocks drop") {
    val cells = Seq(
      ("b1", "A", 1L), ("b1", "B", 2L),
      ("b2", "A", 2L), ("b2", "B", 1L),
      ("b3", "A", 5L) // incomplete: B missing -> excluded
    ).toDF("blk", "trt", "v")
    val out = Statistics.friedmanTest(cells, "blk", "trt", "v")
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("b_blocks") == 2L)
      assert(r.getAs[Long]("chi2_micro") == 0L)
      assert(r.getAs[Long]("w_ppm") == 0L)
    }
  }

  test("friedmanTest: duplicate (block, treatment) rows exclude the block") {
    // b1/b2 are clean concordant blocks; b3 has every treatment present
    // but treatment A twice — pre-r13 the distinct-only completeness
    // check admitted b3, ranking 4 rows in a k=3 block and counting A's
    // b_blocks twice. The row-count guard must drop b3 entirely, so the
    // result is exactly the two-block concordant answer (W = 1).
    val cells = ((1 to 2).flatMap(b =>
      Seq((s"b$b", "A", 10L), (s"b$b", "B", 20L), (s"b$b", "C", 30L)))
      ++ Seq(("b3", "A", 5L), ("b3", "A", 6L),
        ("b3", "B", 20L), ("b3", "C", 30L)))
      .toDF("blk", "trt", "v")
    val out = Statistics.friedmanTest(cells, "blk", "trt", "v")
      .orderBy("treatment").collect()
    assert(out.map(_.getAs[Long]("r_sum")).toSeq == Seq(2L, 4L, 6L))
    out.foreach { r =>
      assert(r.getAs[Long]("b_blocks") == 2L)
      assert(r.getAs[Long]("w_ppm") == 1000000L)
    }
  }

  // ----------------------------------------------------- hillTailIndex

  test("hillTailIndex: hand k=2 estimate over micro-floored logs") {
    // Top-3 of {100,50,25,10,5}: H = ((l100 - l25) + (l50 - l25)) / 2
    // = 1039720 micro-nats; alpha = 1e12 div H = 961797.
    val rows = Seq(100L, 50L, 25L, 10L, 5L).zipWithIndex
      .map { case (v, i) => ("g", v, i.toLong) }.toDF("g", "v", "id")
    val out = Statistics.hillTailIndex(spark, rows, "g", "v", "id", k = 2)
      .collect().head
    assert(out.getAs[Long]("n_top") == 3L)
    assert(out.getAs[Long]("x_k1") == 25L)
    assert(out.getAs[Long]("h_micro") == 1039720L)
    assert(out.getAs[Long]("alpha_micro") == 961797L)
  }

  test("hillTailIndex: underpowered group reports null, not a guess") {
    val rows = Seq(("g", 10L, 1L), ("g", 5L, 2L)).toDF("g", "v", "id")
    val out = Statistics.hillTailIndex(spark, rows, "g", "v", "id", k = 2)
      .collect().head
    assert(out.getAs[Long]("n_top") == 2L)
    assert(out.isNullAt(out.fieldIndex("h_micro")))
    assert(out.isNullAt(out.fieldIndex("alpha_micro")))
  }

  test("hillTailIndex: heavier synthetic tail scores lower alpha") {
    // Pareto-ish alpha=1 tail (x = N/i) vs thin geometric-ish tail.
    val heavy = (1 to 300).map(i => ("h", (30000L / i).max(1L), i.toLong))
    val thin = (1 to 300).map(i => ("t", 1000L + i % 7L, 1000L + i.toLong))
    val out = Statistics.hillTailIndex(spark, (heavy ++ thin)
      .toDF("g", "v", "id"), "g", "v", "id")
      .collect().map(r => r.getAs[String]("g") ->
        r.getAs[Long]("alpha_micro")).toMap
    assert(out("h") < out("t"),
      s"heavy tail must score a smaller exponent: $out")
  }

  // ----------------------------------------------------------- cmhTest

  test("cmhTest: hand single-stratum table") {
    // a=10 b=5 c=5 d=10: E = 7.5, Var = 50625/26100 = 1.939655...,
    // CMH = 2.5^2/Var = 3.222223 (over the floored var_micro); OR_MH = 4.
    val rows = (Seq.fill(10)(("s", true, true)) ++
      Seq.fill(5)(("s", true, false)) ++ Seq.fill(5)(("s", false, true)) ++
      Seq.fill(10)(("s", false, false))).toDF("g", "trt", "out")
    val r = Statistics.cmhTest(rows, "g", "trt", "out").collect().head
    assert((r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("c"),
      r.getAs[Long]("d")) == ((10L, 5L, 5L, 10L)))
    assert(r.getAs[Long]("e_micro") == 7500000L)
    assert(r.getAs[Long]("var_micro") == 1939655L)
    assert(r.getAs[Long]("cmh_micro") == 3222223L)
    assert(r.getAs[Long]("or_mh_micro") == 4000001L)
  }

  test("cmhTest: no association scores zero; pooling beats collapsing") {
    val flat = (Seq.fill(5)(("s", true, true)) ++
      Seq.fill(5)(("s", true, false)) ++ Seq.fill(5)(("s", false, true)) ++
      Seq.fill(5)(("s", false, false))).toDF("g", "trt", "out")
    val r0 = Statistics.cmhTest(flat, "g", "trt", "out").collect().head
    assert(r0.getAs[Long]("cmh_micro") == 0L)
    // Two strata with the SAME within-stratum effect: CMH pools — the
    // statistic grows with the evidence (two strata > one stratum).
    def stratum(g: String) = Seq.fill(10)((g, true, true)) ++
      Seq.fill(5)((g, true, false)) ++ Seq.fill(5)((g, false, true)) ++
      Seq.fill(10)((g, false, false))
    val one = Statistics.cmhTest(stratum("a").toDF("g", "trt", "out"),
      "g", "trt", "out").collect().head.getAs[Long]("cmh_micro")
    val two = Statistics.cmhTest((stratum("a") ++ stratum("b"))
      .toDF("g", "trt", "out"), "g", "trt", "out")
      .collect().head.getAs[Long]("cmh_micro")
    assert(two > one, s"pooled evidence must grow the statistic: $two vs $one")
  }

  test("cmhTest: gated face detects the planted +10% uplift") {
    // sf0.1 (5,000 docs) — the +10% boost is decisive there (CMH ≈ 53);
    // sf0.001's 60 docs are honestly underpowered for a 0.1 effect.
    val out = Statistics.sourceStratifiedCmh(spark, "/root/testdata/sf0.1")
      .collect()
    // chi-square_1 at p=0.001 is 10.83; the planted effect is far above.
    assert(out.head.getAs[Long]("cmh_micro") > 10830000L)
    // OR_MH > 1: treatment raises the outcome odds in every stratum.
    assert(out.head.getAs[Long]("or_mh_micro") > 1000000L)
  }

  // --------------------------------------------------- cochranArmitage

  test("cochranArmitage: hand two-band trend z") {
    // s=1: 1/10 positive; s=2: 9/10. T = 19 - 10*30/20 = 4;
    // Var = 0.25*(50 - 900/20) = 1.25; z = 4/sqrt(1.25) = 3.577709.
    val rows = (Seq.fill(1)((1L, true)) ++ Seq.fill(9)((1L, false)) ++
      Seq.fill(9)((2L, true)) ++ Seq.fill(1)((2L, false))).toDF("s", "pos")
    val out = Statistics.cochranArmitage(rows, "s", "pos")
      .orderBy("s").collect()
    assert(out.length == 2)
    assert(out.head.getAs[Long]("rate_ppm") == 100000L)
    assert(out.last.getAs[Long]("rate_ppm") == 900000L)
    out.foreach(r => assert(r.getAs[Long]("trend_z_micro") == 3577709L))
  }

  test("cochranArmitage: flat rates score zero; degenerate outcomes null") {
    val flat = (1L to 4L).flatMap(s =>
      Seq((s, true), (s, false))).toDF("s", "pos")
    Statistics.cochranArmitage(flat, "s", "pos").collect()
      .foreach(r => assert(r.getAs[Long]("trend_z_micro") == 0L))
    val allPos = Seq((1L, true), (2L, true)).toDF("s", "pos")
    Statistics.cochranArmitage(allPos, "s", "pos").collect().foreach { r =>
      assert(r.isNullAt(r.fieldIndex("trend_z_micro")))
    }
  }

  test("lorenzDeciles: decile populations differ by at most one") {
    val per = (1L to 23L).map(v => (v, (v * 7L % 13L + 1L) * 100L))
      .toDF("id", "cents")
    val sizes = Statistics.lorenzDeciles(per, "cents", "id")
      .collect().map(_.getAs[Long]("n"))
    assert(sizes.sum == 23L)
    assert(sizes.max - sizes.min <= 1L)
  }

  // -------------------------------------------- brownForsythe (q243)
  test("brownForsythe: hand case — spread difference drives W") {
    // g1 = {10,10,10,10} (median 10, all z=0);
    // g2 = {0,10,20,30} (median 15, z = {15,5,5,15}).
    // SSB/SSW on z: means 0 and 10 -> ssb = 200, ssw = 0+100 -> W large.
    val rows = (Seq.fill(4)(("a", 10L)) ++ Seq(("b", 0L), ("b", 10L),
      ("b", 20L), ("b", 30L))).toDF("g", "v")
    val r = Statistics.brownForsythe(rows, "g", "v").collect().head
    assert(r.getAs[Long]("k_groups") == 2L)
    assert(r.getAs[Long]("n_total") == 8L)
    // z2 = 2z: g1 all 0; g2 = {30,10,10,30}. s = 0 and 80, ss = 0 and 2000.
    // tg = 0 and 1600 -> ssb = 1600 - 6400/8 = 800, ssw = 2000 - 1600 = 400.
    assert(r.getAs[Long]("ssb") == 800L)
    assert(r.getAs[Long]("ssw") == 400L)
    // W = (800/1)/(400/6) = 12.
    assert(r.getAs[Long]("w_micro") == 12000000L)
  }

  test("brownForsythe: identical groups score zero dispersion gap") {
    // n=4 per group keeps the per-group s^2/n divisions exact, so the
    // q205 per-group flooring discipline cancels to ssb = 0 precisely.
    val rows = (Seq(("a", 1L), ("a", 3L), ("a", 7L), ("a", 9L)) ++
      Seq(("b", 1L), ("b", 3L), ("b", 7L), ("b", 9L))).toDF("g", "v")
    val r = Statistics.brownForsythe(rows, "g", "v").collect().head
    assert(r.getAs[Long]("ssb") == 0L)
    assert(r.getAs[Long]("w_micro") == 0L)
  }

  test("brownForsythe: even-count median averages the two middles") {
    // g = {1,3,7,100}: med2 = 3+7 = 10 (median 5), not either middle.
    val rows = Seq(("a", 1L), ("a", 3L), ("a", 7L), ("a", 100L),
      ("b", 5L)).toDF("g", "v")
    // With med=5 for a: z2 = |2v-10| = {8,4,4,190}; ss = 36196; s = 206.
    val r = Statistics.brownForsythe(rows, "g", "v").collect().head
    // tg(a) = floor(206^2/4 + .5) = 10609; tg(b) = 0 (z=0, n=1).
    // ssb = 10609 - floor(206^2/5+.5) = 10609 - 8487 = 2122;
    // ssw = 36196 - 10609 = 25587.
    assert(r.getAs[Long]("ssb") == 2122L)
    assert(r.getAs[Long]("ssw") == 25587L)
  }

  // -------------------------------------------- dunnPostHoc (q244)
  test("dunnPostHoc: symmetric shift reproduces the hand z") {
    // g1 = {1,2,3}, g2 = {4,5,6}: no ties, N=6, rank sums 6 and 15.
    // z = (2 - 5) / sqrt((6*7/12)*(1/3+1/3)) = -3/sqrt(7/3) = -1.963961.
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 4L), ("b", 5L), ("b", 6L)).toDF("g", "v")
    val r = Statistics.dunnPostHoc(rows, "g", "v").collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("g1") == "a")
    assert(r.head.getAs[Long]("z_micro") == -1963961L)
  }

  test("dunnPostHoc: identical groups give z = 0 and all pairs appear") {
    val rows = (1L to 4L).flatMap(v =>
      Seq(("a", v), ("b", v), ("c", v))).toDF("g", "v")
    val out = Statistics.dunnPostHoc(rows, "g", "v").collect()
    assert(out.length == 3)
    out.foreach(r => assert(r.getAs[Long]("z_micro") == 0L))
  }

  // -------------------------------------------- cramerVonMises (q252)
  test("cvm: hand-computed pooled weighted square sum") {
    // A = {1,2}, B = {2,4}: diffs (cum1*n2 - cum2*n1) = 2,2,0 with
    // pooled multiplicities 1,2,1 -> U = 4 + 8 + 0 = 12;
    // T = 12 / (2*2*16) = 0.1875.
    val rows = Seq((true, 1L), (true, 2L), (false, 2L), (false, 4L))
      .toDF("is_a", "v")
    val r = Statistics.cramerVonMises(rows, "is_a", "v").collect().head
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Long]("t_micro") == 187500L)
  }

  test("cvm: identical samples score exactly zero") {
    val rows = (1L to 5L).flatMap(v => Seq((true, v), (false, v)))
      .toDF("is_a", "v")
    val r = Statistics.cramerVonMises(rows, "is_a", "v").collect().head
    assert(r.getAs[Long]("t_micro") == 0L)
  }

  // ---------------------------------------- wilcoxonSignedRank (q253)
  test("wilcoxon: hand ranks, balanced and one-sided cases") {
    // d = {1,2,-3}: W2+ = 2+4 = 6 = E -> z = 0.
    val bal = Seq(1L, 2L, -3L).toDF("d")
    val r1 = Statistics.wilcoxonSignedRank(bal, "d").collect().head
    assert(r1.getAs[Long]("n_pairs") == 3L)
    assert(r1.getAs[Long]("w2_plus") == 6L)
    assert(r1.getAs[Long]("z_micro") == 0L)
    // d = {1,2,3}: W2+ = 12, z = 6/sqrt(14).
    val pos = Seq(1L, 2L, 3L).toDF("d")
    val r2 = Statistics.wilcoxonSignedRank(pos, "d").collect().head
    assert(r2.getAs[Long]("w2_plus") == 12L)
    assert(r2.getAs[Long]("z_micro") ==
      math.floor(6.0 / math.sqrt(14.0) * 1e6 + 0.5).toLong)
  }

  test("wilcoxon: ties share doubled average ranks; zeros drop") {
    // d = {1,-1,2,0}: rank2(|1|) = 3 shared, rank2(2) = 6;
    // W2+ = 3 + 6 = 9, tie_sum = 6, Var2 = 14 - 0.5.
    val d = Seq(1L, -1L, 2L, 0L).toDF("d")
    val r = Statistics.wilcoxonSignedRank(d, "d").collect().head
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("w2_plus") == 9L)
    assert(r.getAs[Long]("z_micro") ==
      math.floor(3.0 / math.sqrt(13.5) * 1e6 + 0.5).toLong)
  }

  // -------------------------------------------- bartlett (q249)
  test("bartlett: hand case replicating the per-group floored ln terms") {
    // g1 = {1,3} (var 2), g2 = {2,6} (var 8): sp2 = (2+8)/2 = 5.
    val rows = Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 6L)).toDF("g", "v")
    val r = Statistics.bartlett(rows, "g", "v").collect().head
    assert(r.getAs[Long]("k_groups") == 2L)
    assert(r.getAs[Long]("n_total") == 4L)
    val lnSum = math.floor(1.0 * math.log(2.0) * 1e6 + 0.5) +
      math.floor(1.0 * math.log(8.0) * 1e6 + 0.5)
    val inv = math.floor(1e9 / 1.0 + 0.5) * 2
    val chi2 = (2.0 * math.log(5.0) - lnSum / 1e6) /
      (1.0 + (inv / 1e9 - 1.0 / 2.0) / 3.0)
    assert(r.getAs[Long]("chi2_micro") ==
      math.floor(chi2 * 1e6 + 0.5).toLong)
  }

  test("bartlett: equal variances score ~zero; singletons are dropped") {
    val rows = (Seq(("a", 0L), ("a", 4L), ("b", 10L), ("b", 14L)) ++
      Seq(("c", 7L))).toDF("g", "v")
    val r = Statistics.bartlett(rows, "g", "v").collect().head
    assert(r.getAs[Long]("k_groups") == 2L) // c (n=1) excluded
    assert(math.abs(r.getAs[Long]("chi2_micro")) <= 1L)
  }

  // -------------------------------------------- grubbsMax (q250)
  test("grubbs: the integer deviation argmax finds the planted outlier") {
    // {1,2,3,10}: mean 4, max dev 6 at v=10; s^2 = 50/3.
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 10L)).toDF("g", "v")
    val r = Statistics.grubbsMax(rows, "g", "v").collect().head
    assert(r.getAs[Long]("outlier_v") == 10L)
    val g = (24.0 / 4.0) / math.sqrt((114.0 - 256.0 / 4.0) / 3.0)
    assert(r.getAs[Long]("g_micro") == math.floor(g * 1e6 + 0.5).toLong)
  }

  test("grubbs: deviation ties break to the larger value; n<3 drops") {
    val rows = Seq(("a", 0L), ("a", 4L), ("a", 8L), ("b", 1L), ("b", 2L))
      .toDF("g", "v")
    val out = Statistics.grubbsMax(rows, "g", "v").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("outlier_v") == 8L)
  }

  // -------------------------------------------- pageTrendTest (q248)
  test("pageTrend: a perfect monotone trend scores the hand L and z") {
    // 3 blocks x 3 treatments, value strictly increasing in treatment:
    // every block ranks (1,2,3) -> R = (3,6,9), L = 3+12+27 = 42.
    // E = 3*3*16/4 = 36; Var = 3*9*4*8/144 = 6; z = 6/sqrt(6).
    val cells = (1 to 3).flatMap(b => Seq((b, "a", 10L * b), (b, "b", 100L + b),
      (b, "c", 1000L + b))).toDF("block", "treatment", "v")
    val r = Statistics.pageTrendTest(cells, "block", "treatment", "v")
      .collect().head
    assert(r.getAs[Long]("b_blocks") == 3L)
    assert(r.getAs[Long]("k_treat") == 3L)
    assert(r.getAs[Long]("l_stat") == 42L)
    assert(r.getAs[Long]("e_l_milli") == 36000L)
    assert(r.getAs[Long]("z_micro") == 2449490L)
  }

  test("pageTrend: incomplete and duplicate-row blocks are excluded " +
    "by the q228 both-predicates guard") {
    val base = (1 to 3).flatMap(b => Seq((b, "a", 10L * b), (b, "b", 100L + b),
      (b, "c", 1000L + b)))
    // Block 4 misses treatment c; block 5 duplicates (5, "a").
    val cells = (base ++ Seq((4, "a", 5L), (4, "b", 6L),
      (5, "a", 1L), (5, "a", 2L), (5, "b", 3L), (5, "c", 4L)))
      .toDF("block", "treatment", "v")
    val r = Statistics.pageTrendTest(cells, "block", "treatment", "v")
      .collect().head
    assert(r.getAs[Long]("b_blocks") == 3L)
    assert(r.getAs[Long]("l_stat") == 42L)
  }

  test("dunnPostHoc: tie correction shrinks the variance denominator") {
    // Heavy ties: g1={1,1,2}, g2={1,2,2}. Tie-corrected |z| must exceed
    // the uncorrected value (smaller S^2), sanity-bound below 1.
    val rows = Seq(("a", 1L), ("a", 1L), ("a", 2L),
      ("b", 1L), ("b", 2L), ("b", 2L)).toDF("g", "v")
    val z = Statistics.dunnPostHoc(rows, "g", "v").collect()
      .head.getAs[Long]("z_micro")
    // rank2: value 1 -> t=3, rank2=4 (avg 2); value 2 -> rank2=10 (avg 5).
    // r2bar: a = (4+4+10)/3 = 6, b = (4+10+10)/3 = 8 -> diff/2 = -1.
    // S2 = 6*7/12 - (2*(27-3))/(12*5) = 3.5 - 0.8 = 2.7; var = 2.7*2/3.
    // z = -1/sqrt(1.8) = -0.745356.
    assert(z == -745356L)
  }
}
