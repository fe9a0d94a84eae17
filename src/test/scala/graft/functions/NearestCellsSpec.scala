package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native coarse-assign kernel ([[nearestCellsOf]]) must be
  * STRUCT-FOR-STRUCT equal to the literal expression tree it replaced
  * ([[graft.analytics.IvfIndex.nearestCellsLegacy]]) — same distance
  * doubles (same FP op order), same (d asc, cell asc) order, ties to the
  * smaller cell id. The r18 optimization swapped the k-struct tree for
  * one expression node; this spec is the equality pin.
  */
class NearestCellsSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 6

  private def model(cents: Seq[(Int, Seq[Double])]) =
    graft.analytics.IvfIndex.Model(cents)

  test("native kernel == literal tree, duplicate-centroid ties included") {
    val rng = new scala.util.Random(11)
    // Non-contiguous, unsorted cell ids; one exact duplicate pair (7, 3)
    // so distance ties are REACHABLE and must break to cell 3.
    val cents = Seq(
      5 -> Seq.fill(dim)(rng.nextDouble()),
      7 -> Seq(1.0, 0.5, -0.25, 2.0, 0.0, 1.5),
      3 -> Seq(1.0, 0.5, -0.25, 2.0, 0.0, 1.5),
      12 -> Seq.fill(dim)(rng.nextDouble() * 3 - 1.5),
      1 -> Seq.fill(dim)(rng.nextDouble() * 0.1))
    val m = model(cents)
    val vecs = ((1 to 150).map(_ => Seq.fill(dim)(rng.nextDouble() * 4 - 2)) ++
      Seq(Seq(1.0, 0.5, -0.25, 2.0, 0.0, 1.5), // exactly ON the dup pair
        Seq.fill(dim)(0.0)))
      .toDF("v").select(col("v").cast("array<double>").as("v"))
    Seq(1, 3, 99).foreach { n =>
      val both = vecs.select(
        nearestCellsOf(col("v"), m.centroids, n).as("native"),
        graft.analytics.IvfIndex.nearestCellsLegacy(col("v"), m, n).as("legacy"))
      both.collect().foreach { r =>
        assert(r.get(0) == r.get(1),
          s"n=$n: native ${r.get(0)} != legacy ${r.get(1)}")
      }
    }
    // Tie really breaks to the smaller cell id.
    val tie = vecs.select(nearestCellsOf(col("v"), m.centroids, 2).as("c"))
      .collect().apply(150).getSeq[org.apache.spark.sql.Row](0)
    assert(tie.head.getInt(1) == 3 && tie(1).getInt(1) == 7,
      s"dup-centroid tie must order (3, 7), got ${tie.map(_.getInt(1))}")
  }
}
