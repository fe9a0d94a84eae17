package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.ParquetMeta

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton code. */
  private def zRef(a: Long, b: Long): Long =
    (0 until ZOrder.Bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference interleave") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 9L),
      (65535L, 0L), (0L, 65535L), (65535L, 65535L), (12345L, 54321L))
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (a, b) =>
      assert(got((a, b)) == zRef(a, b), s"z($a,$b)")
    }
    // Spot-check curve identities: z(1,0)=1, z(0,1)=2, z(3,3)=15.
    assert(got((1L, 0L)) == 1L && got((0L, 1L)) == 2L && got((3L, 3L)) == 15L)
  }

  test("z-order layout bounds every file to a tile; linear sort does not skip") {
    // 64×64 grid → 4096 rows, 16 files of 256 rows each. Under z-order a
    // file is one aligned 16×16 tile of the (a, b) plane; under a linear
    // sort by `a` every file spans the full b range.
    val grid = spark.range(4096).select(
      (col("id") / 64).cast("long").as("a"),
      (col("id") % 64).cast("long").as("b"))
    val zPath = tmpDir("zorder")
    val linPath = tmpDir("linear")
    ZOrder.write(grid, "a", "b", zPath, partitions = 16)
    grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(linPath)

    def intersecting(path: String, column: String, lo: Long, hi: Long): Int =
      ParquetMeta.longRanges(spark, path, column)
        .count { case (_, mn, mx) => mx >= lo && mn <= hi }

    // b-only band: b ∈ [0, 7] (1/8 of the domain, a unconstrained).
    val zB = intersecting(zPath, "b", 0, 7)
    val linB = intersecting(linPath, "b", 0, 7)
    assert(linB == 16, s"linear-by-a layout must be unskippable on b, saw $linB/16")
    assert(zB <= 4, s"z-order must skip most files on a b-band, saw $zB/16")

    // a-only band: both layouts skip (z tiles bound a too).
    val zA = intersecting(zPath, "a", 0, 7)
    assert(zA <= 4, s"z-order must also skip on a, saw $zA/16")

    // Rectangle a,b ∈ [0,15]²: exactly one z tile.
    val zRect = ParquetMeta.longRanges(spark, zPath, "a")
      .map(_._1)
      .filter { f =>
        val Seq((_, alo, ahi)) = ParquetMeta.longRanges(spark, f, "a")
        val Seq((_, blo, bhi)) = ParquetMeta.longRanges(spark, f, "b")
        ahi >= 0 && alo <= 15 && bhi >= 0 && blo <= 15
      }
    assert(zRect.size <= 2, s"16×16 rectangle should touch ≤2 z files, saw ${zRect.size}")

    // The layout is lossless: same rows back.
    assert(spark.read.parquet(zPath).as[(Long, Long)].collect().toSet ==
      grid.as[(Long, Long)].collect().toSet)
  }
}
