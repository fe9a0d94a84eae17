package graft.analytics

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def quotes = Seq(
    // key, time, price
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 10:05:00"), 101.0),
    ("A", ts("2024-01-01 10:10:00"), 102.0),
    ("B", ts("2024-01-01 10:00:00"), 200.0)
  ).toDF("sym", "qt", "price")

  private def trades = Seq(
    ("A", ts("2024-01-01 10:03:00"), 1L), // matches 10:00 quote
    ("A", ts("2024-01-01 10:05:00"), 2L), // equal time → inclusive match 10:05
    ("A", ts("2024-01-01 09:00:00"), 3L), // before any quote → null
    ("B", ts("2024-01-01 11:00:00"), 4L),
    ("C", ts("2024-01-01 10:00:00"), 5L)  // key with no quotes → null
  ).toDF("sym", "tt", "trade_id")

  test("backward as-of join picks latest right row at-or-before left time") {
    val out = AsOfJoin.asOfBackward(trades, quotes, "sym", "sym", "tt", "qt")
      .select($"trade_id", $"asof.price".as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out(1L).contains(100.0))
    assert(out(2L).contains(101.0)) // inclusive at equal timestamps
    assert(out(3L).isEmpty)
    assert(out(4L).contains(200.0))
    assert(out(5L).isEmpty)
  }

  test("forward as-of join picks earliest right row at-or-after left time") {
    val out = AsOfJoin.asOfForward(trades, quotes, "sym", "sym", "tt", "qt")
      .select($"trade_id", $"asof.price".as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(101.0)) // 10:03 → next quote 10:05
    assert(out(2L).contains(101.0)) // equal time → inclusive match 10:05
    assert(out(3L).contains(100.0)) // 09:00 → first quote 10:00
    assert(out(4L).isEmpty)         // 11:00 → no later B quote
    assert(out(5L).isEmpty)         // no C quotes
  }

  test("tolerance nulls out matches beyond the bound, both directions") {
    val fwd = AsOfJoin.asOfForward(trades, quotes, "sym", "sym", "tt", "qt",
      toleranceSec = Some(60L))
      .select($"trade_id", $"asof.price".as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fwd(1L).isEmpty)          // 10:03 → 10:05 is 120s out > 60s
    assert(fwd(2L).contains(101.0))  // equal time, 0s ≤ 60s
    assert(fwd(3L).isEmpty)          // 09:00 → 10:00 is 3600s out
    val bwd = AsOfJoin.asOfBackward(trades, quotes, "sym", "sym", "tt", "qt",
      toleranceSec = Some(120L))
      .select($"trade_id", $"asof.price".as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(bwd(1L).isEmpty)          // 10:03 → 10:00 is 180s back > 120s
    assert(bwd(2L).contains(101.0))  // equal time, 0s ≤ 120s
    assert(bwd(4L).isEmpty)          // 11:00 → 10:00 is 3600s back
  }

  test("salted join equals plain join; salted agg equals plain agg") {
    val big = (1 to 1000).map(i => (i % 3, s"v$i")).toDF("k", "v")
    val small = Seq((0, "zero"), (1, "one"), (2, "two")).toDF("k", "name")
    val plain = big.join(small, "k").count()
    val salted = graft.warehouse.Skew.saltedJoin(big, small, "k").count()
    assert(plain == salted)

    val nums = (1 to 1000).map(i => (i % 3, i.toDouble)).toDF("k", "x")
    val got = graft.warehouse.Skew.saltedCountSum(nums, "k", "x")
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
    val want = nums.groupBy("k")
      .agg(org.apache.spark.sql.functions.count("*").as("n"),
        org.apache.spark.sql.functions.sum("x").as("s"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want)
  }
}
