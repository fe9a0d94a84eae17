package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native PQ encode kernel ([[pqEncodeCodes]]) must be CODE-FOR-CODE
  * equal to the literal argmin expression tree it replaced
  * ([[graft.analytics.PqIndex.argmin]] over per-subspace slices) — same
  * distances (same FP op order), same tie-breaks (smallest code), ragged
  * rows included. The r18 optimization swapped the tree for one expression
  * node; this spec is the equality pin.
  */
class PqEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val m = 4
  private val dsub = 3
  private val ksub = 5

  // Deterministic books: centroid values from a small integer lattice so
  // exact ties are REACHABLE (duplicate centroids included).
  private val books: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
    (0 until ksub).map {
      case 0 => Seq(0.0, 0.0, 0.0)
      case 1 => Seq(1.0, -1.0, 0.5)
      case 2 => Seq(1.0, -1.0, 0.5) // exact duplicate of code 1: tie case
      case 3 => Seq(-0.5, 2.0, s.toDouble)
      case c => Seq(c.toDouble / 7, 1.0 - c, 0.25 * s)
    }
  }

  private def legacyCodes(vCol: org.apache.spark.sql.Column) =
    array((0 until m).map(s => graft.analytics.PqIndex.argmin(
      graft.analytics.PqIndex.subVec(vCol, s, dsub), books(s))): _*)

  test("native kernel == literal argmin tree on dense, tied and ragged rows") {
    val rng = new scala.util.Random(42)
    val dense = (1 to 200).map(_ => Seq.fill(m * dsub)(rng.nextDouble() * 4 - 2))
    // Rows landing EXACTLY on centroids (distance ties with the duplicate
    // code-1/code-2 pair must break to the smaller code), plus ragged rows
    // (shorter than m*dsub: the slice-truncation semantics).
    val onCentroid = Seq(
      (0 until m).flatMap(s => books(s)(1)),
      (0 until m).flatMap(s => books(s)(3)),
      Seq.fill(m * dsub)(0.0))
    val ragged = Seq(Seq(1.0, 2.0), Seq.fill(7)(0.5), Seq.empty[Double])
    val df = (dense ++ onCentroid ++ ragged).toDF("v")
      .select(col("v").cast("array<double>").as("v"))
    val both = df.select(
      pqEncodeCodes(col("v"), books).as("native"),
      legacyCodes(col("v")).as("legacy"))
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1),
        s"native ${r.getSeq[Int](0)} != legacy ${r.getSeq[Int](1)}")
    }
    // The duplicate-centroid tie really broke to the smaller code.
    val tieRow = df.select(pqEncodeCodes(col("v"), books).as("c"))
      .collect()(dense.size) // first onCentroid row = exact code-1 match
    assert(tieRow.getSeq[Int](0).forall(_ == 1),
      s"tie must break to code 1, got ${tieRow.getSeq[Int](0)}")
  }

  test("PqIndex.encode emits the same codes as the legacy expression form") {
    val rng = new scala.util.Random(7)
    val vecs = (1L to 100L).map(i => (i, Seq.fill(m * dsub)(rng.nextDouble())))
      .toDF("vec_id", "embedding")
    val model = graft.analytics.PqIndex.Model(m, dsub, books)
    val native = graft.analytics.PqIndex.encode(vecs, model)
      .select(col("vec_id"), col("codes"))
    val legacy = vecs.select(col("vec_id"),
      legacyCodes(col("embedding").cast("array<double>")).as("codes"))
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val l = legacy.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(n == l)
  }
}
