package graft.analytics

import org.apache.spark.sql.functions._

import graft.{Explain, SparkSpec}

/** The one-pass profiler: statistic correctness on known data, the
  * single-scan plan shape (its whole reason to exist), and degenerate
  * columns (all-null, constant).
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some(10.0), "a"),
    (2L, Some(20.0), "b"),
    (3L, Some(30.0), "a"),
    (4L, None, "a"),
    (5L, Some(50.0), null)
  ).toDF("id", "x", "s")

  test("per-column statistics are correct on known data") {
    val p = Profile.profile(df).collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(p.keySet == Set("id", "x", "s"))

    val id = p("id")
    assert(id.getAs[Long]("n_rows") == 5 && id.getAs[Long]("n_nulls") == 0)
    assert(id.getAs[Double]("min_num") == 1.0 && id.getAs[Double]("max_num") == 5.0)
    assert(id.getAs[String]("dtype") == "bigint")
    assert(id.getAs[Long]("approx_distinct") == 5, "HLL is exact at tiny cardinality")

    val x = p("x")
    assert(x.getAs[Long]("n_nulls") == 1)
    assert(math.abs(x.getAs[Double]("null_frac") - 0.2) < 1e-12)
    assert(x.getAs[Double]("mean") == 27.5, "mean over non-null values only")
    assert(x.getAs[Double]("min_num") == 10.0 && x.getAs[Double]("max_num") == 50.0)
    val q = x.getSeq[Double](x.fieldIndex("approx_quantiles"))
    assert(q.length == 3 && q(1) >= 10.0 && q(1) <= 50.0, s"p50 inside range: $q")

    val s = p("s")
    assert(s.getAs[Long]("n_nulls") == 1)
    assert(s.getAs[String]("min_str") == "a" && s.getAs[String]("max_str") == "b")
    assert(s.isNullAt(s.fieldIndex("min_num")) && s.isNullAt(s.fieldIndex("mean")))
    // Small domain ≤ capacity ⇒ MG counts are exact, nulls excluded.
    assert(s.getAs[Map[String, Long]]("top_values") == Map("a" -> 3L, "b" -> 1L))
  }

  test("degenerate columns: all-null and constant") {
    val d = Seq((1, Option.empty[Double], "k"), (2, Option.empty[Double], "k"))
      .toDF("id", "dead", "konst")
    val p = Profile.profile(d).collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val dead = p("dead")
    assert(dead.getAs[Long]("n_nulls") == 2 && dead.getAs[Double]("null_frac") == 1.0)
    assert(dead.isNullAt(dead.fieldIndex("min_num")))
    assert(dead.getAs[Long]("approx_distinct") == 0)
    assert(p("konst").getAs[Long]("approx_distinct") == 1)
    assert(p("konst").getAs[Map[String, Long]]("top_values") == Map("k" -> 2L))
  }

  test("the profile is ONE scan of the input regardless of column count") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val s = Explain.audit(Profile.profile(li))
    // 11 columns × 7 statistics each — still a single global aggregate:
    // one scan, plus ≤ 2 exchanges (the aggregation exchange and the
    // narrow-scan spread repartition — the round-robin that buys map-side
    // parallelism when the input lands in fewer partitions than cores;
    // a wide production scan skips it). scans=2 is the AQE double-print.
    assert(s.scans <= 2, s"profiler must stay single-scan: $s")
    assert(s.shuffles <= 4, s"profiler: agg + spread exchanges only: $s")
    assert(s.nestedLoops == 0 && s.smj == 0, s"no joins in a profile: $s")
  }

  test("benford audit: digits, shares, and deviations on real data") {
    val rows = Profile.benfordAudit(spark, "/root/testdata/sf0.001").collect()
    val byCol = rows.groupBy(_.getAs[String]("col_name"))
    assert(byCol.keySet == Set("o_totalprice", "l_extendedprice"))
    byCol.foreach { case (c, rs) =>
      assert(rs.map(_.getAs[Int]("digit")).toSet.subsetOf((1 to 9).toSet))
      // Counts partition the total and observed shares sum to ~1e6
      // (truncating division loses < 1 µ-unit per digit).
      val total = rs.head.getAs[Long]("n_total")
      assert(rs.map(_.getAs[Long]("n_obs")).sum == total, s"$c counts")
      val pSum = rs.map(_.getAs[Long]("p_obs_micro")).sum
      assert(pSum <= 1000000L && pSum > 1000000L - rs.length, s"$c shares: $pSum")
      rs.foreach { r =>
        // dev is exactly obs-share minus the inlined Benford constant.
        assert(r.getAs[Long]("dev_micro") ==
          r.getAs[Long]("p_obs_micro") - r.getAs[Long]("p_benford_micro"))
      }
    }
  }

  test("benford constants are the log10 law in micro-units") {
    // Spot-check the two ends of the inlined table via a known digit:
    // log10(2) ≈ 0.301030, log10(10/9) ≈ 0.045757.
    val rows = Profile.benfordAudit(spark, "/root/testdata/sf0.001").collect()
    val m = rows.map(r => r.getAs[Int]("digit") -> r.getAs[Long]("p_benford_micro")).toMap
    assert(m(1) == 301029L && m(9) == 45757L)
  }

  test("keySkew: hand-built distribution lands in the right log2 buckets") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 4 keys: counts 1, 2, 3, 10 → buckets 0, 1, 1, 3; total 16 rows.
    val df = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(10)("d")).toDF("k")
    val rows = Profile.keySkew(df, "k", "t.k").collect()
    val byBucket = rows.map(r => r.getAs[Long]("log2_bucket") ->
      (r.getAs[Long]("n_keys"), r.getAs[Long]("n_rows"))).toMap
    assert(byBucket == Map(0L -> ((1L, 1L)), 1L -> ((2L, 5L)), 3L -> ((1L, 10L))))
    rows.foreach { r =>
      assert(r.getAs[String]("key_col") == "t.k")
      assert(r.getAs[Long]("n_keys_total") == 4L)
      assert(r.getAs[Long]("n_rows_total") == 16L)
      // top1 = 10/16 = 0.625; top10 covers everything (only 4 keys).
      assert(r.getAs[Long]("top1_share_micro") == 625000L)
      assert(r.getAs[Long]("top10_share_micro") == 1000000L)
    }
  }

  test("expectationsAudit: planted violations are counted exactly per check") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // id 2 duplicated (1 unique violation); one null name; one value
    // outside the accepted set; two out of range.
    val df = Seq(
      (Some(1L), Some("a"), "X", 5L), (Some(2L), Some("b"), "Y", 60L),
      (Some(2L), None, "X", 10L), (Some(3L), Some("d"), "Z", -1L))
      .toDF("id", "name", "cat", "qty")
    val out = Profile.expectationsAudit(df, "t", Seq(
      Profile.Expect("t_id_unique", "unique", "id", uniqueCols = Seq("id")),
      Profile.Expect("t_name_not_null", "not_null", "name", col("name").isNull),
      Profile.Expect("t_cat_accepted", "accepted_values", "cat",
        !col("cat").isin("X", "Y")),
      Profile.Expect("t_qty_range", "range", "qty",
        !(col("qty") >= 0 && col("qty") <= 50))))
      .collect().map(r => r.getAs[String]("check_id") ->
        ((r.getAs[Long]("checked"), r.getAs[Long]("violations"),
          r.getAs[Boolean]("pass")))).toMap
    assert(out("t_id_unique") == ((4L, 1L, false)))
    assert(out("t_name_not_null") == ((4L, 1L, false)))
    assert(out("t_cat_accepted") == ((4L, 1L, false)))
    assert(out("t_qty_range") == ((4L, 2L, false)))
  }

  test("expectationsAudit: a clean table passes every check") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val out = Profile.expectationsAudit(df, "t", Seq(
      Profile.Expect("u", "unique", "id", uniqueCols = Seq("id")),
      Profile.Expect("n", "not_null", "name", col("name").isNull)))
      .collect()
    assert(out.forall(_.getAs[Boolean]("pass")))
    assert(out.forall(_.getAs[Long]("violations") == 0L))
  }

  test("q122 join forecast equals the measured join size") {
    val dir = "/root/testdata/sf0.001"
    val out = Profile.joinForecasts(spark, dir).collect()
    val forecast = out.filter(_.getString(0) == "orders_lineitem")
      .map(_.getAs[Long]("pairs_total")).sum
    val measured = graft.core.Tables.orders(spark, dir)
      .join(graft.core.Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(forecast == measured, s"forecast $forecast vs measured $measured")
    val self = out.filter(_.getString(0) == "lineitem_self_supp")
      .map(_.getAs[Long]("pairs_total")).sum
    val measuredSelf = {
      val l = graft.core.Tables.lineitem(spark, dir).select("l_suppkey")
      l.join(l.withColumnRenamed("l_suppkey", "r"),
        col("l_suppkey") === col("r")).count()
    }
    assert(self == measuredSelf)
  }

  test("q123 layout advisor: runs floor at n_distinct; returnflag recount agrees") {
    val dir = "/root/testdata/sf0.001"
    val out = Profile.layoutAdvisor(spark, dir).collect()
    assert(out.length == 6)
    for (r <- out) {
      assert(r.getAs[Long]("runs_clustered") >= r.getAs[Long]("n_distinct"))
      assert(r.getAs[Long]("runs_clustered") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("resort_gain_ppm") >= 0)
    }
    // Independent recount of l_returnflag runs: per order, sort lines by
    // the same total tiebreak order and count change boundaries.
    val li = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_linestatus"), to_date(col("l_shipdate")).as("sd"),
        col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getString(2), r.getString(3),
        r.getDate(4).toString, r.getLong(5), r.getLong(6), r.getDouble(7))))
    val runs = li.groupBy(_._1).values.map { lines =>
      val flags = lines.map(_._2).sortBy(t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7))
        .map(_._2)
      1 + flags.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    }.sum
    val rf = out.find(_.getString(0) == "l_returnflag").get
    assert(rf.getAs[Long]("runs_clustered") == runs)
  }
}
