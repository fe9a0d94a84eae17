package graft.analytics

import org.apache.spark.sql.functions.{col, lit, sum}

import graft.SparkSpec

class ModelEvalSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- aucExact

  private def auc(rows: (String, Long, Boolean)*): Map[String, Option[Long]] =
    ModelEval.aucExact(rows.toDF("g", "score", "label"), "g", "score", "label")
      .collect()
      .map(r => r.getAs[String]("g") ->
        Option(r.getAs[Any]("auc_micro")).map(_.asInstanceOf[Long])).toMap

  test("aucExact: perfect separation is exactly 1e6, reversal exactly 0") {
    val out = auc(
      ("hi", 1L, false), ("hi", 2L, false), ("hi", 3L, true), ("hi", 4L, true),
      ("lo", 1L, true), ("lo", 2L, true), ("lo", 3L, false), ("lo", 4L, false))
    assert(out("hi") == Some(1000000L))
    assert(out("lo") == Some(0L))
  }

  test("aucExact: a full tie averages to exactly 1/2 via doubled ranks") {
    // 4 rows, one score: rk2 = 2*1 + 4 - 1 = 7 each; u2 = 14 - 6 = 8;
    // auc = 8 / (2*2*2) = 1/2 exactly.
    val out = auc(("g", 5L, true), ("g", 5L, true),
      ("g", 5L, false), ("g", 5L, false))
    assert(out("g") == Some(500000L))
  }

  test("aucExact: single-class groups report null, not a division error") {
    val out = auc(("pos", 1L, true), ("pos", 2L, true),
      ("ok", 1L, false), ("ok", 2L, true))
    assert(out("pos").isEmpty)
    assert(out("ok") == Some(1000000L))
  }

  test("aucExact: hand-computed mixed ordering") {
    // scores asc: n(1) p(2) n(3) p(4) → pairs won by pos: (2>1)=1, (4>1)=1,
    // (4>3)=1 of 4 → auc = 3/4.
    val out = auc(("g", 1L, false), ("g", 2L, true),
      ("g", 3L, false), ("g", 4L, true))
    assert(out("g") == Some(750000L))
  }

  // ------------------------------------------------------- reliabilityBins

  test("reliabilityBins: bin assignment, exact means and gaps") {
    val scored = Seq((50000L, true), (50000L, false), (950000L, true))
      .toDF("score_micro", "label")
    val out = ModelEval.reliabilityBins(scored, "score_micro", "label")
      .collect().map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("avg_score_micro"), r.getAs[Long]("pos_rate_micro"),
          r.getAs[Long]("gap_micro")))).toMap
    assert(out(0L) == ((2L, 1L, 50000L, 500000L, 450000L)))
    assert(out(9L) == ((1L, 1L, 950000L, 1000000L, 50000L)))
  }

  // --------------------------------------------------------------- bhStepUp

  private def bh(ps: Long*): Seq[(Long, Boolean)] =
    ModelEval.bhStepUp(
      ps.zipWithIndex.map { case (p, i) => (s"h$i", p) }.toDF("key", "p"),
      "p", Seq("key"))
      .orderBy(col("rk"))
      .collect().map(r => (r.getAs[Long]("p"), r.getAs[Boolean]("rejected")))
      .toSeq

  test("bhStepUp: classic step-up — k_max=3 rejects exactly ranks 1..3") {
    // m=5, q=0.05: crit p*5 <= i*50000 holds for i=1,2,3 only.
    val out = bh(1000L, 9000L, 30000L, 200000L, 800000L)
    assert(out == Seq((1000L, true), (9000L, true), (30000L, true),
      (200000L, false), (800000L, false)))
  }

  test("bhStepUp: step-up property — a later success rescues earlier ranks") {
    // m=3: i=1,2 fail the criterion but i=3 meets it → ALL rejected.
    val out = bh(40000L, 45000L, 48000L)
    assert(out.forall(_._2))
  }

  test("bhStepUp: no criterion met → k_max null, nothing rejected") {
    val out = bh(600000L, 700000L)
    assert(out.forall(!_._2))
  }

  // --------------------------------------------------------- ipsPolicyValue

  private def md5Head8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("ipsPolicyValue: single-action policy always matches — IPS equals the logged mean") {
    val logged = Seq(("a", 1L, 100L), ("a", 2L, 200L), ("a", 3L, 400L))
      .toDF("action", "user", "r")
    val out = ModelEval.ipsPolicyValue(logged, "action", "user", "r")
      .collect().head
    assert(out.getAs[Long]("n_match") == 3L)
    assert(out.getAs[Long]("ips_contrib_micro") ==
      out.getAs[Long]("avg_logged_micro"))
    // mean = 700/3 -> two-step micro division: 233 * 1e6 + (1e6*1)/3.
    assert(out.getAs[Long]("avg_logged_micro") ==
      233L * 1000000L + 1000000L / 3L)
  }

  test("ipsPolicyValue: match sets agree with a reference policy walk") {
    val logged = Seq(("a", 10L, 100L), ("a", 11L, 100L), ("b", 10L, 50L),
      ("b", 12L, 50L), ("b", 13L, 50L)).toDF("action", "user", "r")
    val out = ModelEval.ipsPolicyValue(logged, "action", "user", "r")
      .collect().map(r => r.getAs[String]("action") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_match")))).toMap
    // Reference: actions sorted (a=0, b=1), pi(user) = md5("pi:u") % 2.
    def pi(u: Long): Long = md5Head8(s"pi:$u") % 2
    val expA = Seq(10L, 11L).count(pi(_) == 0L).toLong
    val expB = Seq(10L, 12L, 13L).count(pi(_) == 1L).toLong
    assert(out("a") == ((2L, expA)))
    assert(out("b") == ((3L, expB)))
  }

  // -------------------------------------------------------------- gainTable

  test("gainTable: hand-computed deciles — capture reaches 1e6, lift ordering holds") {
    // 20 rows, scores 20..1; positives are exactly the top 5 scorers.
    val scored = (1 to 20).map(i => (i.toLong, i.toLong, i > 15))
      .toDF("id", "score", "label")
    val out = ModelEval.gainTable(scored, "score", "label", "id")
      .collect().map(r => r.getAs[Int]("decile") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_pos"), r.getAs[Long]("cum_pos"),
          r.getAs[Long]("resp_ppm"), r.getAs[Long]("capture_ppm"),
          r.getAs[Long]("lift_ppm")))).toMap
    // Deciles of 2: decile 1 = scores 20,19 (both pos), 2 = 18,17 (pos),
    // 3 = 16,15 (one pos), rest none.
    assert(out(1) == ((2L, 2L, 2L, 1000000L, 400000L, 4000000L)))
    assert(out(2) == ((2L, 2L, 4L, 1000000L, 800000L, 4000000L)))
    assert(out(3) == ((2L, 1L, 5L, 500000L, 1000000L, 2000000L)))
    (4 to 10).foreach(d => assert(out(d)._2 == 0L && out(d)._5 == 1000000L))
  }

  test("cvAuc: five folds, each with a defined AUC on the calibrated fixture") {
    val out = ModelEval.cvAuc(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 5)
    out.foreach { r =>
      val auc = r.getAs[Long]("auc_micro")
      // The calibrated synthetic scorer must rank well above chance in
      // every fold (population AUC ~ 2/3 for label = U < score).
      assert(auc > 550000L && auc <= 1000000L, s"fold AUC out of range: $r")
    }
  }

  // ------------------------------------------------------------------ woeIv

  test("woeIv: balanced bins score zero WOE; enriched bins are positive") {
    val scored = (Seq.fill(10)((0L, true)) ++ Seq.fill(10)((0L, false)) ++
      Seq.fill(18)((1L, true)) ++ Seq.fill(2)((1L, false)))
      .toDF("bin", "label")
    val out = ModelEval.woeIv(scored, "bin", "label", 10)
      .collect().map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("woe_micro"), r.getAs[Long]("iv_ppm")))).toMap
    // bin 0: p = 11/38, q = 11/22 -> WOE < 0; bin 1: p = 19/38, q = 3/22
    // -> WOE > 0. IV contributions are same-sign products -> >= 0.
    assert(out(0L)._1 < 0 && out(1L)._1 > 0)
    assert(out.values.forall(_._2 >= 0L), "IV terms are never negative")
    // Hand value for bin 1: (19/38 - 3/22) * ln((19/38)/(3/22)).
    val p = 19.0 / 38.0; val q = 3.0 / 22.0
    assert(out(1L)._2 == math.floor((p - q) * math.log(p / q) * 1e6 + 0.5).toLong)
  }

  test("woeIv: an uninformative feature has near-zero IV everywhere") {
    val scored = (0 until 100).map(i => ((i / 10).toLong, i % 2 == 0))
      .toDF("bin", "label")
    val out = ModelEval.woeIv(scored, "bin", "label", 10).collect()
    assert(out.forall(_.getAs[Long]("iv_ppm") <= 100L),
      "balanced bins contribute ~0 IV")
  }

  // --------------------------------------------------------------- raterKappa

  test("raterKappa: cells reconcile with the two gates run separately") {
    val out = ModelEval.raterKappa(spark, "/root/testdata/sf0.001").collect().head
    val (a, b, c, d, n) = (out.getAs[Long]("a"), out.getAs[Long]("b"),
      out.getAs[Long]("c"), out.getAs[Long]("d"), out.getAs[Long]("n"))
    assert(a + b + c + d == n && n > 0)
    // Marginals: gate A keeps ~25% per language by construction.
    assert((a + b) * 10 >= n * 2 && (a + b) * 10 <= n * 4,
      s"quartile gate marginal ~25%: ${(a, b, c, d)}")
    // Kappa formula recomputed driver-side from the exact cells.
    val po = (a + d).toDouble / n
    val pe = ((a + b).toDouble * (a + c) + (c + d).toDouble * (b + d)) / (n.toDouble * n)
    assert(out.getAs[Long]("kappa_ppm") ==
      math.floor((po - pe) / (1 - pe) * 1e6 + 0.5).toLong)
    // Two hash-independent gates should agree near chance: |kappa| small.
    assert(math.abs(out.getAs[Long]("kappa_ppm")) < 300000L)
  }

  // ------------------------------------------------- thresholdSweep (q213)

  test("thresholdSweep: hand confusion table at every cut") {
    // 10 rows, scores 0.05,0.15,…,0.95 (one per bin), labels = top 4
    // scores positive. At t=0.5: pred_pos=5, tp=4, fp=1, fn=0, tn=5
    // (the 6 negatives split 1 above / 5 below the cut).
    val rows = (0 until 10).map(i =>
      (i.toLong, i * 100000L + 50000L, i >= 6))
    val df = rows.toDF("id", "score", "label")
    val out = ModelEval.thresholdSweep(df, "score", "label")
      .collect().map(r => r.getAs[Long]("threshold_micro") -> r).toMap
    assert(out.size == 9)
    val t5 = out(500000L)
    assert((t5.getAs[Long]("pred_pos"), t5.getAs[Long]("tp"),
      t5.getAs[Long]("fp"), t5.getAs[Long]("fn"), t5.getAs[Long]("tn")) ==
      ((5L, 4L, 1L, 0L, 5L)))
    assert(t5.getAs[Long]("precision_micro") == 800000L)
    assert(t5.getAs[Long]("recall_micro") == 1000000L)
    // F1 = 2·4/(2·4+1+0) = 8/9.
    assert(t5.getAs[Long]("f1_micro") == 8000000L / 9L)
    // Degenerate top cut t=0.9: pred_pos=1, tp=1 → precision 1, recall 1/4.
    val t9 = out(900000L)
    assert(t9.getAs[Long]("precision_micro") == 1000000L)
    assert(t9.getAs[Long]("recall_micro") == 250000L)
  }

  test("thresholdSweep: corpus sweep is monotone and conserves totals") {
    val scored = ModelEval.scoredDocs(
      graft.core.Tables.documents(spark, "/root/testdata/sf0.001"))
    val out = ModelEval.thresholdSweep(scored, "score_micro", "label")
      .orderBy("threshold_micro").collect()
    assert(out.length == 9)
    val n = scored.count()
    val nPos = scored.filter(col("label")).count()
    out.foreach { r =>
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") == nPos)
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fp") +
        r.getAs[Long]("fn") + r.getAs[Long]("tn") == n)
    }
    // Raising the cut only removes predictions: pred_pos and recall
    // are nonincreasing in t.
    out.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi.getAs[Long]("pred_pos") <= lo.getAs[Long]("pred_pos"))
      assert(hi.getAs[Long]("tp") <= lo.getAs[Long]("tp"))
    }
  }

  // ------------------------------------------------------- mcnemar (q215)

  test("mcnemar: hand confusion table with continuity correction") {
    // b=5 (A right, B wrong), c=1, n11=2, n00=2:
    // stat = (|5-1|-1)^2 / 6 = 9/6 = 1.5.
    val rows =
      Seq.fill(2)(("s", true, true)) ++ Seq.fill(2)(("s", false, false)) ++
        Seq.fill(5)(("s", true, false)) ++ Seq.fill(1)(("s", false, true))
    val out = ModelEval.mcnemar(rows.toDF("g", "ca", "cb"), "g", "ca", "cb")
      .collect().head
    assert((out.getAs[Long]("n"), out.getAs[Long]("n11"),
      out.getAs[Long]("n00"), out.getAs[Long]("b"), out.getAs[Long]("c")) ==
      ((10L, 2L, 2L, 5L, 1L)))
    assert(out.getAs[Long]("mcnemar_micro") == 1500000L)
  }

  test("mcnemar: zero discordant pairs reports null, not an error") {
    val rows = Seq(("s", true, true), ("s", false, false))
    val out = ModelEval.mcnemar(rows.toDF("g", "ca", "cb"), "g", "ca", "cb")
      .collect().head
    assert(out.isNullAt(out.fieldIndex("mcnemar_micro")))
  }

  test("mcnemar: gated face fires — informative beats independent scorer") {
    // Classifier A is calibrated to the label channel; B is independent.
    // Discordant pairs must lean heavily toward "A right, B wrong".
    val out = ModelEval.pairedModelMcnemar(spark, "/root/testdata/sf0.001")
      .agg(sum(col("b")).as("b"), sum(col("c")).as("c")).collect().head
    assert(out.getAs[Long]("b") > out.getAs[Long]("c"))
  }

  // ----------------------------------------------------- qiniTable (q218)

  test("qiniTable: hand case — unit uplift per decile accumulates linearly") {
    // Two rows per decile (same score, id tiebreak): one treated
    // responder, one silent control. uplift = 1e6 in every decile;
    // Q(k) = cum_rt - cum_rc*(cum_nt/cum_nc) = k.
    val rows = (1 to 10).flatMap { d =>
      val s = (10 - d) * 1000L
      Seq((2L * d, s, true, true), (2L * d + 1L, s, false, false))
    }.toDF("id", "score", "treated", "outcome")
    val out = ModelEval.qiniTable(rows, "score", "treated", "outcome", "id")
      .orderBy("decile").collect()
    assert(out.length == 10)
    out.zipWithIndex.foreach { case (r, i) =>
      assert((r.getAs[Long]("n_t"), r.getAs[Long]("n_c"),
        r.getAs[Long]("r_t"), r.getAs[Long]("r_c")) == ((1L, 1L, 1L, 0L)))
      assert(r.getAs[Long]("uplift_ppm") == 1000000L)
      assert(r.getAs[Long]("qini_micro") == (i + 1) * 1000000L)
    }
  }

  test("qiniTable: zero treatment effect scores zero uplift and Qini") {
    // Treated and control respond identically in every decile.
    val rows = (1 to 10).flatMap { d =>
      val s = (10 - d) * 1000L
      Seq((4L * d, s, true, true), (4L * d + 1L, s, true, false),
        (4L * d + 2L, s, false, true), (4L * d + 3L, s, false, false))
    }.toDF("id", "score", "treated", "outcome")
    val out = ModelEval.qiniTable(rows, "score", "treated", "outcome", "id")
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("uplift_ppm") == 0L)
      assert(r.getAs[Long]("qini_micro") == 0L)
    }
  }

  // --------------------------------------------------- holmStepDown (q224)

  test("holmStepDown: hand step-down boundary vs BH's step-up") {
    // p = {0.01, 0.02, 0.03, 0.9}, alpha = 0.05, m = 4.
    // Holm: rank 1 passes (0.01*4 <= 0.05), rank 2 fails (0.02*3 > 0.05)
    // -> reject {1}. BH: k_max = 3 -> rejects {1,2,3}. Holm strictly
    // stricter on the same inputs.
    val tests = Seq(("a", 10000L), ("b", 20000L), ("c", 30000L),
      ("d", 900000L)).toDF("key", "p_micro")
    val holm = ModelEval.holmStepDown(tests, "p_micro", Seq("key"))
      .collect().map(r => r.getAs[String]("key") ->
        r.getAs[Boolean]("rejected")).toMap
    assert(holm == Map("a" -> true, "b" -> false, "c" -> false,
      "d" -> false))
    val bh = ModelEval.bhStepUp(tests, "p_micro", Seq("key"))
      .collect().map(r => r.getAs[String]("key") ->
        r.getAs[Boolean]("rejected")).toMap
    assert(bh == Map("a" -> true, "b" -> true, "c" -> true, "d" -> false))
  }

  test("holmStepDown: all-tiny p rejects everything (k_stop null)") {
    val tests = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("key", "p_micro")
    val out = ModelEval.holmStepDown(tests, "p_micro", Seq("key")).collect()
    assert(out.forall(_.getAs[Boolean]("rejected")))
    assert(out.forall(_.isNullAt(out.head.fieldIndex("k_stop"))))
  }

  test("holmFwer rejections are a subset of bhFdr's on the gated fixture") {
    val dir = "/root/testdata/sf0.001"
    def rej(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("rejected")).select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val holm = rej(ModelEval.holmFwer(spark, dir))
    val bh = rej(ModelEval.bhFdr(spark, dir))
    assert(holm.nonEmpty && holm.subsetOf(bh),
      s"Holm must be stricter: holm=${holm.size} bh=${bh.size}")
  }

  // --------------------------------------------- brierDecomposition (q212)

  test("brierDecomposition: hand case — constant-forecast bins decompose exactly") {
    // Two bins, constant forecast within each (within-bin variance 0),
    // so Murphy's identity is exact up to truncation: bin A forecasts
    // 0.2 over 5 rows with 1 positive (gap 0), bin B forecasts 0.9 over
    // 5 rows with 3 positives (gap 0.3). Base rate 0.4.
    val rows = (Seq.fill(4)((200000L, false)) :+ ((200000L, true))) ++
      (Seq.fill(3)((900000L, true)) ++ Seq.fill(2)((900000L, false)))
    val df = rows.zipWithIndex
      .map { case ((s, l), i) => ("g", i.toLong, s, l) }
      .toDF("g", "id", "score", "label")
    val out = ModelEval.brierDecomposition(df, "g", "score", "label")
      .collect().head
    assert(out.getAs[Long]("n") == 10L && out.getAs[Long]("n_pos") == 4L)
    assert(out.getAs[Long]("obar_micro") == 400000L)
    // REL = (5·0² + 5·0.3²)/10 = 0.045 (B: forecast 0.9 vs outcome 0.6);
    // RES = (5·(0.2−0.4)² + 5·(0.6−0.4)²)/10 = 0.04; UNC = 0.4·0.6 = 0.24;
    // Brier = UNC + REL − RES = 0.245 exactly (within-bin variance 0).
    assert(out.getAs[Long]("rel_micro") == 45000L)
    assert(out.getAs[Long]("res_micro") == 40000L)
    assert(out.getAs[Long]("unc_micro") == 240000L)
    assert(out.getAs[Long]("brier_micro") == 245000L)
  }

  test("brierDecomposition: calibrated corpus — REL small, identity within bin width") {
    // Calibration check on the WHOLE corpus as one group (N = 500 at
    // sf0.01 → E[REL | calibrated] = Σ_k p̄(1−p̄)/N ≈ 3400 micro; the
    // 25-doc per-source slices put REL sampling noise near 0.1 and
    // assert nothing).
    val scored = ModelEval.scoredDocs(
      graft.core.Tables.documents(spark, "/root/testdata/sf0.01"))
      .withColumn("g", lit("all"))
    val all = ModelEval.brierDecomposition(scored, "g", "score_micro", "label")
      .collect().head
    val rel = all.getAs[Long]("rel_micro")
    assert(rel < 20000L, s"whole-corpus rel=$rel — scorer should be calibrated")
    // The gated per-source face: identity + range sanity per row
    // (REL there is legitimately sampling-dominated at 25 docs/source).
    val out = ModelEval.brierBySource(spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (brier, bRel, res, unc) = (r.getAs[Long]("brier_micro"),
        r.getAs[Long]("rel_micro"), r.getAs[Long]("res_micro"),
        r.getAs[Long]("unc_micro"))
      // Murphy identity up to the generalized within-bin variance AND
      // covariance terms + truncation slack; at 25 docs/source the
      // within-bin terms dominate — 3% of the unit scale bounds them.
      val resid = math.abs(brier - (unc + bRel - res))
      assert(resid <= 30000L, s"${r.getString(0)} identity residual $resid")
      assert(brier >= 0L && bRel >= 0L && res >= 0L && unc <= 250000L)
    }
  }

  // ------------------------------------- isotonicCalibration (q255)
  test("isotonic: the minimax fit pools the planted violation exactly") {
    // Bin rates .3 (w10), .1 (w10), .6 (w5): PAVA pools the first two
    // to 4/20 = .2 and leaves .6 -> fitted [.2, .2, .6].
    def rows(bin: Long, n: Int, pos: Int) = (1 to n).map(i =>
      (bin * 100000L + i, i <= pos))
    val scored = (rows(0, 10, 3) ++ rows(1, 10, 1) ++ rows(2, 5, 3))
      .toDF("score_micro", "label")
    val out = ModelEval.isotonicCalibration(scored, "score_micro", "label")
      .collect().map(r => r.getAs[Long]("bin") ->
        r.getAs[Long]("iso_rate_micro")).toMap
    assert(out == Map(0L -> 200000L, 1L -> 200000L, 2L -> 600000L))
  }

  test("isotonic: already-monotone rates pass through; output is monotone") {
    def rows(bin: Long, n: Int, pos: Int) = (1 to n).map(i =>
      (bin * 100000L + i, i <= pos))
    val scored = (rows(0, 10, 1) ++ rows(1, 10, 5) ++ rows(2, 10, 9))
      .toDF("score_micro", "label")
    val out = ModelEval.isotonicCalibration(scored, "score_micro", "label")
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Long]("iso_rate_micro")).toSeq ==
      Seq(100000L, 500000L, 900000L))
    assert(out.map(_.getAs[Long]("iso_rate_micro")).toSeq ==
      out.map(_.getAs[Long]("iso_rate_micro")).sorted.toSeq)
  }

  // ------------------------------------------- delongAucCi (q256)
  test("delong: hand placements, variance and the 95% band") {
    // pos {3,5}, neg {1,4}: V10 = {.5, 1}, V01 = {1, .5},
    // AUC = .75, S10 = S01 = .125, SE = sqrt(.125).
    val scored = Seq(("g", 3L, true), ("g", 5L, true),
      ("g", 1L, false), ("g", 4L, false)).toDF("g", "s", "label")
    val r = ModelEval.delongAucCi(scored, "g", "s", "label").collect().head
    assert(r.getAs[Long]("auc_micro") == 750000L)
    val se = math.sqrt(0.125 / 2.0 + 0.125 / 2.0)
    assert(r.getAs[Long]("se_micro") ==
      math.floor(se * 1e6 + 0.5).toLong)
    assert(r.getAs[Long]("lo_micro") ==
      math.floor((0.75 - 1.96 * se) * 1e6 + 0.5).toLong)
    assert(r.getAs[Long]("hi_micro") ==
      math.floor((0.75 + 1.96 * se) * 1e6 + 0.5).toLong)
  }

  // ---------------------------------------- spiegelhalterZ (q259)
  test("spiegelhalter: hand case and the p=1/2 degenerate null") {
    // p = 0.25 with y = {1, 0}: num terms 3.75e11, -1.25e11;
    // den per row 4.6875e22 -> z = 2.5e11 / sqrt(9.375e22).
    val scored = Seq(("g", 250000L, true), ("g", 250000L, false))
      .toDF("g", "s", "label")
    val r = ModelEval.spiegelhalterZ(scored, "g", "s", "label")
      .collect().head
    val z = 2.5e11 / math.sqrt(9.375e22)
    assert(r.getAs[Long]("z_micro") == math.floor(z * 1e6 + 0.5).toLong)
    // Every p = 1/2 -> (1-2p) = 0 everywhere -> variance 0 -> null.
    val half = Seq(("g", 500000L, true), ("g", 500000L, false))
      .toDF("g", "s", "label")
    val rh = ModelEval.spiegelhalterZ(half, "g", "s", "label")
      .collect().head
    assert(rh.isNullAt(rh.fieldIndex("z_micro")))
  }

  test("spiegelhalter: systematic over-prediction drives z negative") {
    // High p, all negatives: (y-p) < 0 and (1-2p) < 0 -> positive num?
    // (y-p)(1-2p) with y=0, p=.9: (-0.9)(-0.8) = +0.72 -> z positive:
    // the statistic is signed by (observed - expected) x direction, so
    // assert magnitude: |z| grows with n.
    def z(n: Int): Long = {
      val scored = (1 to n).map(_ => ("g", 900000L, false)).toDF("g", "s", "label")
      ModelEval.spiegelhalterZ(scored, "g", "s", "label")
        .collect().head.getAs[Long]("z_micro")
    }
    assert(math.abs(z(16)) == 2 * math.abs(z(4)),
      "z must scale with sqrt(n) for a constant miscalibration")
  }

  // ---------------------------------------- krippendorffAlpha (q257)
  test("krippendorff: hand coincidence algebra, perfect and degenerate") {
    // c = {3, 0, 1}: do_num = 2, n_pos = 4, n_neg = 5, n_tot = 9:
    // alpha = 1 - (1e6*2*8) div (2*4*5) / 1e6 = 1 - 0.4 = 0.6.
    def unit(u: Long, labels: Seq[Boolean]) = labels.map(l => (u, l))
    val panel = (unit(1, Seq(true, true, true)) ++
      unit(2, Seq(false, false, false)) ++
      unit(3, Seq(true, false, false))).toDF("u", "label")
    val r = ModelEval.krippendorffAlpha(panel, "u", "label", m = 3)
      .collect().head
    assert(r.getAs[Long]("do_num") == 2L)
    assert(r.getAs[Long]("alpha_micro") == 600000L)
    // Perfect agreement with both values present: alpha = 1.
    val perfect = (unit(1, Seq(true, true, true)) ++
      unit(2, Seq(false, false, false))).toDF("u", "label")
    assert(ModelEval.krippendorffAlpha(perfect, "u", "label", 3)
      .collect().head.getAs[Long]("alpha_micro") == 1000000L)
    // One value only: alpha undefined -> null.
    val mono = unit(1, Seq(true, true, true)).toDF("u", "label")
    val rm = ModelEval.krippendorffAlpha(mono, "u", "label", 3).collect().head
    assert(rm.isNullAt(rm.fieldIndex("alpha_micro")))
  }

  test("krippendorff: incomplete units are excluded by the panel guard") {
    def unit(u: Long, labels: Seq[Boolean]) = labels.map(l => (u, l))
    val panel = (unit(1, Seq(true, true, true)) ++
      unit(2, Seq(false, false, false)) ++
      unit(3, Seq(true, false))).toDF("u", "label") // 2 ratings: dropped
    val r = ModelEval.krippendorffAlpha(panel, "u", "label", m = 3)
      .collect().head
    assert(r.getAs[Long]("n_units") == 2L)
    assert(r.getAs[Long]("alpha_micro") == 1000000L)
  }

  test("delong: ties earn half credit; singleton classes null the band") {
    val tied = Seq(("g", 5L, true), ("g", 5L, false)).toDF("g", "s", "label")
    val r = ModelEval.delongAucCi(tied, "g", "s", "label").collect().head
    assert(r.getAs[Long]("auc_micro") == 500000L)
    assert(r.isNullAt(r.fieldIndex("se_micro")))
    assert(r.isNullAt(r.fieldIndex("lo_micro")))
  }
}
