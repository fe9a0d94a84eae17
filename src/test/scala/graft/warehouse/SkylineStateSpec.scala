package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkylineStateSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("skystate-spec").toString + "/state"

  test("3-batch fold equals the one-shot frontier on the part table") {
    val dir = "/root/testdata/sf0.001"
    val parts = graft.core.Tables.part(spark, dir)
    val statePath = tmp()
    var out: org.apache.spark.sql.DataFrame = null
    (0 until 3).foreach { i =>
      out = SkylineState.update(spark, statePath,
        parts.filter(col("p_partkey") % 3 === i))
    }
    val incremental = out.collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Double]("price"),
        r.getAs[Int]("sz"), r.getAs[Long]("n"))).toSet
    val oneShot = graft.analytics.Extended.paretoFrontier(parts).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Double]("price"),
        r.getAs[Int]("sz"), r.getAs[Long]("n_parts"))).toSet
    assert(incremental == oneShot,
      "skyline is mergeable: frontier(frontier(A) ∪ B) = frontier(A ∪ B)")
    assert(incremental.nonEmpty)
  }

  test("dominated points stay out across batches; tie counts accumulate") {
    val statePath = tmp()
    def batch(rows: (String, Double, Int)*) =
      rows.toDF("p_brand", "p_retailprice", "p_size")
    // Batch 1: (10,5) on the frontier with a tie pair; (12,4) dominated.
    SkylineState.update(spark, statePath,
      batch(("A", 10.0, 5), ("A", 10.0, 5), ("A", 12.0, 4)))
    // Batch 2: another (10,5) copy accumulates; (9,6) dominates (10,5)… no —
    // (9,6) is cheaper AND larger, so it evicts (10,5) entirely.
    val out2 = SkylineState.update(spark, statePath,
      batch(("A", 10.0, 5), ("A", 9.0, 6)))
    val got2 = out2.collect()
      .map(r => (r.getAs[Double]("price"), r.getAs[Int]("sz"),
        r.getAs[Long]("n"))).toSet
    assert(got2 == Set((9.0, 6, 1L)),
      "a cheaper-and-larger arrival evicts the old frontier point")
    // Batch 3: a re-arrival of the evicted point must stay out (dominance
    // is monotone), while a genuine trade-off joins the frontier.
    val out3 = SkylineState.update(spark, statePath,
      batch(("A", 10.0, 5), ("A", 8.0, 2)))
    val got3 = out3.collect()
      .map(r => (r.getAs[Double]("price"), r.getAs[Int]("sz"),
        r.getAs[Long]("n"))).toSet
    assert(got3 == Set((9.0, 6, 1L), (8.0, 2, 1L)))
  }

  test("tie counts accumulate across batches when the point survives") {
    val statePath = tmp()
    def batch(rows: (String, Double, Int)*) =
      rows.toDF("p_brand", "p_retailprice", "p_size")
    SkylineState.update(spark, statePath, batch(("B", 5.0, 3), ("B", 5.0, 3)))
    val out = SkylineState.update(spark, statePath, batch(("B", 5.0, 3)))
    val got = out.collect()
      .map(r => (r.getAs[Double]("price"), r.getAs[Int]("sz"),
        r.getAs[Long]("n"))).toSet
    assert(got == Set((5.0, 3, 3L)), "three copies of the frontier point")
  }
}
