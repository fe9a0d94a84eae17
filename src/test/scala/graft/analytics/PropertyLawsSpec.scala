package graft.analytics

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Algebraic laws of the statistics battery under seeded random inputs —
  * the invariances a correct implementation cannot help satisfying
  * (shift invariance, antisymmetry, symmetry, monotonicity, mass
  * preservation), checked on several generated cases each. Seeded so
  * failures replay; small case counts keep the Spark-job cost of each
  * law bounded.
  */
class PropertyLawsSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new Random(0xC0FFEE)

  test("isotonic law: fitted rates are monotone and preserve total mass") {
    (1 to 4).foreach { _ =>
      val nBins = 3 + rng.nextInt(6)
      val bins = (0 until nBins).map { b =>
        val w = 1 + rng.nextInt(20)
        (b, w, rng.nextInt(w + 1))
      }
      val scored = bins.flatMap { case (b, w, pos) =>
        (1 to w).map(i => (b * 100000L + i, i <= pos))
      }.toDF("score_micro", "label")
      val out = ModelEval.isotonicCalibration(scored, "score_micro", "label")
        .orderBy("bin").collect()
      val iso = out.map(_.getAs[Long]("iso_rate_micro"))
      assert(iso.sameElements(iso.sorted), s"not monotone: ${iso.toSeq}")
      // PAVA preserves the weighted mean: sum(w * iso) == sum(pos) up to
      // the per-bin micro rounding.
      val mass = out.map(r => r.getAs[Long]("n") *
        r.getAs[Long]("iso_rate_micro")).sum
      val pos = bins.map(b => b._3.toLong * 1000000L).sum
      assert(math.abs(mass - pos) <= bins.map(_._2.toLong).sum,
        s"mass drift: $mass vs $pos")
    }
  }

  test("brown-forsythe / grubbs / changepoint law: shift invariance") {
    (1 to 3).foreach { _ =>
      val shift = 1L + rng.nextInt(1000)
      val rows = (1 to 40).map(i =>
        (s"g${i % 3}", (rng.nextInt(100) + 1).toLong))
      val base = rows.toDF("g", "v")
      val shifted = rows.map { case (g, v) => (g, v + shift) }.toDF("g", "v")
      val bf0 = Statistics.brownForsythe(base, "g", "v").collect().head
      val bf1 = Statistics.brownForsythe(shifted, "g", "v").collect().head
      assert(bf0.getAs[Long]("ssb") == bf1.getAs[Long]("ssb"))
      assert(bf0.getAs[Long]("ssw") == bf1.getAs[Long]("ssw"))
      val g0 = Statistics.grubbsMax(base, "g", "v").collect()
        .map(r => r.getAs[String]("g") -> r.getAs[Long]("g_micro")).toMap
      val g1 = Statistics.grubbsMax(shifted, "g", "v").collect()
        .map(r => r.getAs[String]("g") -> r.getAs[Long]("g_micro")).toMap
      assert(g0 == g1)
      val days = (1 to 30).map(i => ("k", i.toLong, (rng.nextInt(50) + 1).toLong))
      val cp0 = TimeSeries.binarySegmentSplit(
        days.toDF("k", "d", "x"), "k").collect().head
      val cp1 = TimeSeries.binarySegmentSplit(
        days.map { case (k, d, x) => (k, d, x + shift) }.toDF("k", "d", "x"),
        "k").collect().head
      assert(cp0.getAs[Long]("split_idx") == cp1.getAs[Long]("split_idx"))
      assert(cp0.getAs[Long]("gain_int") == cp1.getAs[Long]("gain_int"))
    }
  }

  test("cvm / von-neumann law: cohort symmetry and series reversal") {
    (1 to 3).foreach { _ =>
      val rows = (1 to 30).map(i =>
        (rng.nextBoolean(), (rng.nextInt(20) + 1).toLong))
      val t0 = Statistics.cramerVonMises(rows.toDF("is_a", "v"), "is_a", "v")
        .collect().head
      val t1 = Statistics.cramerVonMises(
        rows.map { case (a, v) => (!a, v) }.toDF("is_a", "v"), "is_a", "v")
        .collect().head
      assert(t0.getAs[Long]("t_micro") == t1.getAs[Long]("t_micro"))
      assert(t0.getAs[Long]("n1") == t1.getAs[Long]("n2"))
      val xs = (1 to 25).map(i => (rng.nextInt(100) + 1).toLong)
      val fwd = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      val rev = xs.reverse.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      val v0 = TimeSeries.vonNeumannRatio(fwd.toDF("k", "d", "x"), "k")
        .collect().head.getAs[Long]("vn_micro")
      val v1 = TimeSeries.vonNeumannRatio(rev.toDF("k", "d", "x"), "k")
        .collect().head.getAs[Long]("vn_micro")
      assert(v0 == v1)
    }
  }

  test("wilcoxon law: negating every difference negates z (±1 micro)") {
    (1 to 3).foreach { _ =>
      val ds = (1 to 25).map(_ => (rng.nextInt(41) - 20).toLong)
        .filter(_ != 0L)
      val z0 = Statistics.wilcoxonSignedRank(ds.toDF("d"), "d")
        .collect().head.getAs[Long]("z_micro")
      val z1 = Statistics.wilcoxonSignedRank(ds.map(-_).toDF("d"), "d")
        .collect().head.getAs[Long]("z_micro")
      assert(math.abs(z0 + z1) <= 1L, s"z0=$z0 z1=$z1")
    }
  }

  test("gopher law: the rule mask is exactly the emitted signals' verdict") {
    val docs = (1 to 20).map { i =>
      val words = (1 to (5 + rng.nextInt(80))).map(_ =>
        Seq("the", "and", "brick", "x1", "...", "#", "lexeme", "12345",
          "•", "z")(rng.nextInt(10))).mkString(" ")
      (i.toLong, words)
    }.toDF("doc_id", "text")
    TextAnalysis.gopherQualityRules(docs).collect().foreach { r =>
      def bit(ok: Boolean, b: Long) = if (ok) b else 0L
      val expected =
        bit(r.getAs[Long]("n_words") >= 50 && r.getAs[Long]("n_words") <= 100000, 1) +
          bit(r.getAs[Long]("mean_len_milli") >= 3000 &&
            r.getAs[Long]("mean_len_milli") <= 10000, 2) +
          bit(r.getAs[Long]("symbol_ppm") <= 100000, 4) +
          bit(r.getAs[Long]("bullet_ppm") <= 900000, 8) +
          bit(r.getAs[Long]("ellipsis_ppm") <= 300000, 16) +
          bit(r.getAs[Long]("alpha_ppm") >= 800000, 32) +
          bit(r.getAs[Long]("stopword_hits") >= 2, 64)
      assert(r.getAs[Long]("rule_mask") == expected, s"row $r")
      assert(r.getAs[Long]("pass") == (if (expected == 127L) 1L else 0L))
    }
  }

  test("components law: fold order never changes the closure") {
    (1 to 2).foreach { _ =>
      val edges = (1 to 35).map(_ =>
        (rng.nextInt(25).toLong, rng.nextInt(25).toLong))
        .filter(e => e._1 != e._2)
      val df = edges.toDF("a_id", "b_id")
      val nodes = df.select(col("a_id").as("doc_id"))
        .unionByName(df.select(col("b_id").as("doc_id"))).distinct()
      val oneShot = Dedup.clusters(nodes, df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val path = tmpDir("cc-law") + "/state"
      val parts = rng.shuffle(edges).grouped(12).toSeq
      parts.foreach(p => graft.warehouse.ComponentsState.update(
        spark, path, p.toDF("a_id", "b_id")))
      val folded = spark.read.parquet(path).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
      assert(folded == oneShot)
    }
  }
}
