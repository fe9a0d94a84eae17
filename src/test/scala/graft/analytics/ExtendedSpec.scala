package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExtendedSpec extends SparkSpec {
  import spark.implicits._

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

  test("winsorize: exact rank fences, clip counts, and clamped sums") {
    // Group g: 1..100 cents. ceil(0.05·100)=5 -> lo=5; ceil(0.95·100)=95.
    // 4 values below the fence, 5 above; clamping adds (5-1..5-4) at the
    // bottom and removes (96..100 -> 95) at the top.
    val rows = (1L to 100L).map(("g", _)).toDF("grp", "cents")
    val r = Extended.winsorize(rows, "grp", "cents").head()
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Long]("lo_cents") == 5L && r.getAs[Long]("hi_cents") == 95L)
    assert(r.getAs[Long]("n_clip_lo") == 4L && r.getAs[Long]("n_clip_hi") == 5L)
    assert(r.getAs[Long]("sum_raw") == 5050L)
    // Bottom: 1+2+3+4 -> 5×4 (+10); top: 96+...+100 -> 95×5 (-15).
    assert(r.getAs[Long]("sum_winsorized") == 5050L + 10L - 15L)
  }

  test("winsorize: tiny and tie-heavy groups keep fences inside the data") {
    val rows = Seq(("a", 7L), ("a", 7L), ("a", 7L), ("b", 1L), ("b", 9L))
      .toDF("grp", "cents")
    val out = Extended.winsorize(rows, "grp", "cents").collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    // All-ties group: fences equal the value, nothing clips.
    assert(out("a").getAs[Long]("lo_cents") == 7L)
    assert(out("a").getAs[Long]("hi_cents") == 7L)
    assert(out("a").getAs[Long]("sum_winsorized") == 21L)
    // n=2: lo rank ceil(0.1)=1, hi rank ceil(1.9)=2 — full span, no clip.
    assert(out("b").getAs[Long]("n_clip_lo") == 0L)
    assert(out("b").getAs[Long]("n_clip_hi") == 0L)
    assert(out("b").getAs[Long]("sum_winsorized") == 10L)
  }

  test("period movers: halves reconcile with the total and ranks are total") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Extended.periodMovers(spark, sfDir).collect()
    val total = graft.core.Tables.lineitem(spark, sfDir)
      .join(graft.core.Tables.part(spark, sfDir),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(sum(org.apache.spark.sql.functions.expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
        .as("cents"))
      .collect().map(r => r.getAs[String]("p_brand") -> r.getAs[Long]("cents")).toMap
    rows.foreach { r =>
      val b = r.getAs[String]("p_brand")
      assert(r.getAs[Long]("early_cents") + r.getAs[Long]("late_cents") == total(b),
        s"brand $b: periods must partition total revenue")
      assert(r.getAs[Long]("delta_cents") ==
        r.getAs[Long]("late_cents") - r.getAs[Long]("early_cents"))
    }
    val ranks = rows.map(_.getAs[Int]("mover_rank")).sorted.toSeq
    assert(ranks == (1 to rows.length))
    val byRank = rows.sortBy(_.getAs[Int]("mover_rank"))
      .map(_.getAs[Long]("delta_cents")).toSeq
    assert(byRank == byRank.sortBy(-_), "risers rank first")
  }

  test("sla aging: buckets partition the open set with a direct recount") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Extended.slaAging(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("age_bucket")).toSet.subsetOf(Set(0, 10, 20)))
    val orders = graft.core.Tables.orders(spark, sfDir)
      .select(to_date(col("o_orderdate")).as("d")).collect().map(_.getDate(0))
    val mxd = orders.maxBy(_.getTime)
    def age(d: java.sql.Date) =
      ((mxd.toLocalDate.toEpochDay - d.toLocalDate.toEpochDay)).toInt
    val openCount = orders.count(age(_) < 30)
    assert(rows.map(_.getAs[Long]("n_open")).sum == openCount.toLong)
  }

  test("revenue concentration: HHI bounded and totals reconcile") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Relational.revenueConcentration(spark, sfDir).collect()
    assert(rows.nonEmpty) // sf0.001 has suppliers in only some nations
    rows.foreach { r =>
      val hhi = r.getAs[Long]("hhi")
      val nb = r.getAs[Long]("n_brands")
      // Perfect equality floor (n equal shares → hhi ≈ 1e8/n, truncation
      // only lowers it) and the monopoly ceiling.
      assert(hhi <= 100000000L, s"${r.getAs[String]("n_name")}: hhi $hhi")
      assert(hhi >= (10000L / nb) * (10000L / nb) * nb / 2,
        "hhi can't sit far below the equal-share floor")
    }
    val direct = graft.core.Tables.lineitem(spark, sfDir)
      .join(graft.core.Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .join(graft.core.Tables.nation(spark, sfDir),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
        .as("cents"))
      .collect().map(r => r.getAs[String]("n_name") -> r.getAs[Long]("cents")).toMap
    assert(rows.map(_.getAs[String]("n_name")).toSet == direct.keySet)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_cents") == direct(r.getAs[String]("n_name")))
    }
  }

  test("rfm segments: scores bounded, customers conserved, quintiles balanced") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Extended.rfmSegments(spark, sfDir).collect()
    val nCust = graft.core.Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    rows.foreach { r =>
      Seq("r", "f", "m").foreach { a =>
        val v = r.getAs[Int](a); assert(v >= 1 && v <= 5, s"$a=$v out of range")
      }
    }
    // Marginal counts per score on each axis are the exact quintile
    // bucket sizes of the rank formula.
    val expectSizes = (0 until 5).map { q =>
      (0 until nCust.toInt).count(rk => rk * 5 / nCust.toInt == q).toLong
    }
    Seq("r", "f", "m").foreach { a =>
      val marg = rows.groupBy(_.getAs[Int](a))
        .view.mapValues(_.map(_.getAs[Long]("n_customers")).sum).toMap
      // score 5 is quintile 0 (best) after the 6−q flip.
      (1 to 5).foreach { score =>
        assert(marg.getOrElse(score, 0L) == expectSizes(5 - score),
          s"axis $a score $score marginal mismatch")
      }
    }
  }

  test("pit feature panel: as-of features are cumulative and leak-free") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Extended.pitFeaturePanel(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("k"),
        r.getAs[Long]("orders_to_date"), r.getAs[Long]("cents_to_date"),
        r.getAs[Int]("days_since_last")))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n, c, dsl) =>
      assert(n >= 1 && c > 0 && dsl >= 0, "no future data can enter a snapshot")
    }
    val perCust = rows.groupBy(_._1)
    val totals = graft.core.Tables.orders(spark, sfDir)
      .groupBy("o_custkey").count().collect()
      .map(r => r.getAs[Long]("o_custkey") -> r.getAs[Long]("count")).toMap
    perCust.foreach { case (cust, rs) =>
      val byK = rs.sortBy(_._2)
      byK.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 <= b._3 && a._4 <= b._4,
            s"customer $cust: features must be cumulative in snapshot order")
        case _ =>
      }
      assert(byK.last._2 == 4L && byK.last._3 == totals(cust),
        s"customer $cust: the final snapshot sees the whole history")
    }
  }

  test("weighted median: hand cases — mass concentration and the lower-median tie rule") {
    import spark.implicits._
    val li = Seq(
      // group (A,X): weight concentrated at price 3 → median 3.
      ("A", "X", 1.0, 1.0), ("A", "X", 2.0, 1.0), ("A", "X", 3.0, 10.0),
      // group (B,Y): 5 units at 1, 5 at 2 → lower weighted median = 1.
      ("B", "Y", 1.0, 5.0), ("B", "Y", 2.0, 5.0)
    ).toDF("l_returnflag", "l_linestatus", "l_extendedprice", "l_quantity")
    val dir = java.nio.file.Files.createTempDirectory("wmed").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Extended.weightedMedianPrice(spark, dir).collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus")) ->
        (r.getAs[Double]("w_median_price"), r.getAs[Long]("total_weight"))).toMap
    assert(got == Map(("A", "X") -> ((3.0, 12L)), ("B", "Y") -> ((1.0, 10L))))
  }

  test("weighted median: corpus groups match a driver-side recompute") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_extendedprice"), col("l_quantity").cast("long"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getLong(3))))
    val expect = rows.groupBy(_._1).map { case (g, rs) =>
      val byPrice = rs.map(_._2).groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .toSeq.sortBy(_._1)
      val total = byPrice.map(_._2).sum
      var cum = 0L
      val med = byPrice.find { case (_, w) => cum += w; cum * 2 >= total }.get._1
      g -> (med, total)
    }
    val got = Extended.weightedMedianPrice(spark, sfDir).collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus")) ->
        (r.getAs[Double]("w_median_price"), r.getAs[Long]("total_weight"))).toMap
    assert(got == expect)
  }

  test("pareto frontier: hand case with dominance, equal-price and duplicate ties") {
    import spark.implicits._
    val parts = Seq(
      // brand A: (10, 5) dominates (12, 5) and (10, 3); (11, 7) survives
      // on size; duplicate frontier point (10, 5) ties with itself.
      ("A", 10.0, 5), ("A", 10.0, 5), ("A", 10.0, 3),
      ("A", 12.0, 5), ("A", 11.0, 7), ("A", 15.0, 6),
      // brand B: a real trade-off keeps both; a cheaper-AND-larger point
      // would have evicted the second.
      ("B", 1.0, 5), ("B", 2.0, 8)
    ).toDF("p_brand", "p_retailprice", "p_size")
    val got = Extended.paretoFrontier(parts).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Double]("price"),
        r.getAs[Int]("sz"), r.getAs[Long]("n_parts"))).toSet
    assert(got == Set(
      ("A", 10.0, 5, 2L), ("A", 11.0, 7, 1L),
      ("B", 1.0, 5, 1L), ("B", 2.0, 8, 1L)))
  }

  test("pareto frontier equals the quadratic NOT-EXISTS form on the part table") {
    val parts = graft.core.Tables.part(spark, "/root/testdata/sf0.001")
      .select(col("p_brand"), col("p_retailprice"), col("p_size"))
    val a = parts.select(col("p_brand"), col("p_retailprice").as("pa"),
      col("p_size").as("sa"))
    val b = parts.select(col("p_brand").as("bb"), col("p_retailprice").as("pb"),
      col("p_size").as("sb"))
    val dominated = a.join(b,
      col("p_brand") === col("bb") && col("pb") <= col("pa") &&
        col("sb") >= col("sa") && (col("pb") < col("pa") || col("sb") > col("sa")),
      "left_semi")
    val brute = a.exceptAll(dominated).distinct()
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSet
    val fast = Extended.paretoFrontier(parts).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Double]("price"),
        r.getAs[Int]("sz"))).toSet
    assert(fast == brute)
    assert(fast.nonEmpty)
    // Frontier shape: within a brand, ascending price ⇒ strictly ascending size.
    fast.groupBy(_._1).foreach { case (_, pts) =>
      val sorted = pts.toSeq.sortBy(_._2)
      assert(sorted.map(_._3) == sorted.map(_._3).sorted, "sizes ascend with price")
      assert(sorted.map(_._3).distinct.size == sorted.size, "strictly ascending")
    }
  }

  test("small-quantity revenue (q156) matches a driver-side correlated recompute") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val li = graft.core.Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1).toLong,
        math.round(r.getDouble(2) * 100)))
    val brands = graft.core.Tables.part(spark, dir)
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // The literal correlated-subquery semantics: qty < 0.2·avg(part).
    val perPart = li.groupBy(_._1).view
      .mapValues(ls => (ls.length.toLong, ls.map(_._2).sum)).toMap
    val expected = li
      .filter { case (p, q, _) =>
        val (n, s) = perPart(p); q * 5 * n < s }
      .groupBy { case (p, _, _) => brands(p) }.view
      .mapValues(ls => (ls.length.toLong, ls.map(_._3).sum)).toMap
    val got = Extended.smallQuantityRevenue(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, "decorrelated plan must equal correlated semantics")
  }

  test("lone-late supplier (q157) matches the EXISTS/NOT-EXISTS definition") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val rows = graft.core.Tables.lineitem(spark, dir)
      .join(graft.core.Tables.orders(spark, dir)
        .filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"),
        col("l_suppkey"),
        (datediff(col("l_shipdate"), col("o_orderdate")) > 60).as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byOrder = rows.groupBy(_._1)
    val expected = rows
      .filter(_._3)
      .filter { case (o, s, _) =>
        val others = byOrder(o).filter(_._2 != s)
        others.nonEmpty && !others.exists(_._3) // EXISTS other ∧ NOT EXISTS other-late
      }
      .groupBy(_._2).view.mapValues(_.map(_._1).distinct.length.toLong).toMap
    val got = Extended.loneLateSupplier(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "aggregate plan must equal the correlated definition")
    assert(got.nonEmpty, "fixture must produce lone-late suppliers")
  }

  test("revenue gini (q158): decimal widening is exact and the BIGINT " +
    "output guard fails loudly past 2^63") {
    // In-range but past the OLD long bound: n=3 equal spenders at 9e17
    // dollars — the old `2·Σrk·d` long intermediate (1.08e19) would have
    // ANSI-thrown mid-plan; the decimal path must produce the exact
    // answer (equal spend → gini exactly 0) with denom still in-bound
    // (9·9e17 = 8.1e18 < 2^63-1).
    val d = 900_000_000_000_000_000L
    val near = Seq((1L, "A", d), (2L, "A", d), (3L, "A", d))
      .toDF("o_custkey", "c_mktsegment", "d")
    val r = Extended.giniProfile(near).head()
    // n=3 equal values: numer = 2·(1+2+3)·d − 4·3d = 0 → gini 0.
    assert(r.getAs[Long]("gini_numer") == 0L &&
      r.getAs[Long]("gini_ppm") == 0L, s"exactness drifted: $r")
    // Over the OUTPUT contract: Σd = 9.15e18 still fits BIGINT but
    // gini_denom = n·Σd = 2.7e19 > 2^63-1 → the named raise_error, not
    // a wrap or anonymous overflow (r9 verdict item 3).
    val over = Seq((1L, "A", 3_050_000_000_000_000_000L),
      (2L, "A", 3_050_000_000_000_000_000L),
      (3L, "A", 3_050_000_000_000_000_000L))
      .toDF("o_custkey", "c_mktsegment", "d")
    val e = intercept[Exception] { Extended.giniProfile(over).collect() }
    assert(e.getMessage.contains("revenueGini: BIGINT output headroom"),
      s"wrong failure mode: ${e.getMessage}")
  }

  test("revenue gini (q158): bounds, and one segment matches a driver recompute") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = Extended.revenueGini(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_customers"),
        r.getAs[Long]("total_dollars"), r.getAs[Long]("gini_numer"),
        r.getAs[Long]("gini_denom"), r.getAs[Long]("gini_ppm"))).toMap
    assert(out.nonEmpty)
    out.foreach { case (seg, (n, total, numer, denom, ppm)) =>
      assert(denom == n * total, s"$seg denom identity")
      assert(ppm >= 0 && ppm < 1000000L, s"$seg gini in [0,1): $ppm")
    }
    // Driver recompute for the lexicographically first segment.
    val seg = out.keys.min
    val dollars = graft.core.Tables.orders(spark, dir)
      .join(graft.core.Tables.customer(spark, dir)
        .filter(col("c_mktsegment") === seg),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._2, t._1)).map(_._2)
    val n = dollars.length.toLong
    val total = dollars.sum
    val numer = 2 * dollars.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum -
      (n + 1) * total
    val denom = n * total
    val ppm = if (denom >= 1000000L) 1000L * numer / (denom / 1000L)
              else 1000000L * numer / denom
    assert(out(seg) == ((n, total, numer, denom, ppm)),
      s"$seg gini drifted from the sorted-rank identity")
  }

  test("dormant rich customers (q166) match the correlated definition") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val cust = graft.core.Tables.customer(spark, dir)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), math.round(r.getDouble(2) * 100)))
    val pos = cust.map(_._3).filter(_ > 0)
    val orders = graft.core.Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val maxD = orders.map(_._2).maxBy(_.toEpochDay)
    val recent = orders.filter(_._2.toEpochDay >= maxD.toEpochDay - 180).map(_._1).toSet
    val nations = graft.core.Tables.nation(spark, dir)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val expected = cust
      .filter { case (ck, _, bal) => bal * pos.length > pos.sum && !recent(ck) }
      .groupBy { case (_, nk, _) => nations(nk) }.view
      .mapValues(cs => (cs.length.toLong, cs.map(_._3).sum)).toMap
    val got = Extended.dormantRichCustomers(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, "anti-join plan must equal the correlated definition")
    assert(got.nonEmpty, "fixture must produce dormant customers")
  }

  test("regional market share (q168): shares bounded, totals reconcile") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val rows = Extended.regionalMarketShare(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("local_cents") <= r.getAs[Long]("total_cents"))
      val ppm = r.getAs[Long]("local_share_ppm")
      assert(ppm >= 0 && ppm <= 1000000L, s"share out of range: $ppm")
    }
    // Totals reconcile with a direct revenue rollup by customer region/year.
    val direct = graft.core.Tables.lineitem(spark, dir)
      .join(graft.core.Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.core.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(graft.core.Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .join(graft.core.Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("yr"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")).as("cents"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("total_cents") ==
        direct((r.getAs[String]("region"), r.getAs[Int]("yr"))))
    }
  }

  test("bag set-ops (q169): multiplicity identities hold against a recount") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val r = Extended.customerOrderBagOps(spark, dir).head()
    // Driver recompute of the per-customer multiplicity table.
    val ords = graft.core.Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d")).collect()
      .map(x => (x.getLong(0), x.getDate(1).toLocalDate))
    val maxD = ords.map(_._2).maxBy(_.toEpochDay)
    val m = ords.groupBy(_._1).view.mapValues { os =>
      val late = os.count(_._2.toEpochDay >= maxD.toEpochDay - 365)
      (os.length - late, late)
    }.toMap
    assert(r.getAs[Long]("n_customers") == m.size.toLong)
    assert(r.getAs[Long]("intersect_all_rows") ==
      m.values.map { case (e, l) => math.min(e, l).toLong }.sum)
    assert(r.getAs[Long]("except_all_rows") ==
      m.values.map { case (e, l) => math.max(e - l, 0).toLong }.sum)
    assert(r.getAs[Long]("intersect_distinct") ==
      m.values.count { case (e, l) => e > 0 && l > 0 }.toLong)
    // Bag-vs-set sanity: ALL counts dominate their distinct counterparts.
    assert(r.getAs[Long]("intersect_all_rows") >= r.getAs[Long]("intersect_distinct"))
  }
}
