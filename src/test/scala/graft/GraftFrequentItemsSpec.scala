package graft

import org.apache.spark.sql.functions._

import graft.functions.FrequentItems

class GraftFrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  // 1000 a, 300 b, 120 c, and a 200-item tail at 2 each
  // (total n = 1420 + 400 = 1820).
  private def corpus = {
    val rows =
      Seq.fill(1000)("a") ++ Seq.fill(300)("b") ++ Seq.fill(120)("c") ++
        (0 until 200).flatMap(i => Seq(s"t$i", s"t$i"))
    rows.toDF("item")
  }

  test("MG summary keeps every item above the guarantee threshold") {
    val items = corpus.repartition(7) // force multi-partition merges
    val summary = items
      .agg(FrequentItems.misraGries(items, col("item"), capacity = 20).as("mg"))
      .head().getAs[Map[String, Long]]("mg")
    assert(summary.size <= 20)
    // n/(k+1) = 1820/21 ≈ 86 → a, b, c must survive any eviction order.
    assert(Set("a", "b", "c").subsetOf(summary.keySet))
    // Counts are lower bounds with undercount ≤ n/(k+1).
    val truth = Map("a" -> 1000L, "b" -> 300L, "c" -> 120L)
    truth.foreach { case (k, t) =>
      assert(summary(k) <= t && summary(k) >= t - 1820 / 21,
        s"$k: sketch ${summary(k)} vs true $t")
    }
  }

  test("heavyHitters is exact and partitioning-invariant") {
    val expected = Map("a" -> 1000L, "b" -> 300L, "c" -> 120L)
    Seq(1, 4, 13).foreach { parts =>
      val got = FrequentItems.heavyHitters(corpus.repartition(parts), "item", support = 0.05)
        .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("n")).toMap
      // support 0.05 → threshold 91: a (1000), b (300), c (120) qualify;
      // every tail item sits at 2 ≪ 91.
      assert(got == expected, s"parts=$parts")
    }
    val freqs = FrequentItems.heavyHitters(corpus, "item", support = 0.05)
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Double]("freq")).toMap
    assert(freqs("a") == math.rint(1000.0 / 1820 * 1e6) / 1e6)
  }

  test("support boundary: raising support drops borderline items; nulls ignored") {
    // c = 120/1820 ≈ 6.59% — in at 5%, out at 7%.
    val at7 = FrequentItems.heavyHitters(corpus, "item", support = 0.07)
      .collect().map(_.getAs[String]("item")).toSet
    assert(at7 == Set("a", "b"))
    val withNulls = corpus.union(Seq.fill(50)(null: String).toDF("item"))
    val got = FrequentItems.heavyHitters(withNulls, "item", support = 0.07)
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("n")).toMap
    assert(got == Map("a" -> 1000L, "b" -> 300L), "nulls must not count or crash")
  }
}
