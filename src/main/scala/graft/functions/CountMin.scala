package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005): fixed-size frequency
  * estimation with a one-sided error guarantee — `estimate ≥ true count`
  * always, `estimate ≤ true count + (e/width)·N` with high probability.
  * The third frequency sketch next to Misra–Gries ([[FrequentItems]],
  * top-k) and HLL (distinct): CMS answers POINT queries over the whole
  * domain from O(depth·width) memory, which neither of the others does.
  *
  * Shape: a typed [[Aggregator]] whose buffer is the flat
  * `depth × width` counter matrix (an `Array[Long]` under Catalyst's
  * native array encoder — no Kryo). Cell updates are element-wise adds,
  * so partial aggregates merge by vector addition: the sketch is a valid
  * distributed partial aggregate with map-side combine, and it rides
  * streaming aggregation state unchanged (see StreamingSketchSpec).
  *
  * Determinism contract: row `i` of the matrix hashes items with the
  * 60-bit hex slice `i % 2` of `md5(item ++ "|" ++ i/2)` — two md5 calls
  * cover all four rows, and an external engine reproduces every cell
  * bit-for-bit from the same definition (the q97 oracle recomputes the
  * whole matrix in DuckDB SQL). Reference behavior anchor:
  * qms_datawarehouse keeps per-run frequency tallies driver-side
  * (src/services/etl.py counters); this is the bounded-memory,
  * mergeable form those tallies take at 100 TB.
  */
object CountMin {

  /** Four rows ⇒ failure probability e^-4 ≈ 1.8% per point query at the
    * e/width overcount bound — the standard depth for analytics use.
    */
  val Depth = 4

  /** The (row-major) cell column index of `item` in hash row `i`:
    * slice `i % 2` of `md5(item + "|" + i/2)` (15 hex chars = 60 bits,
    * always non-negative) mod `width`.
    */
  def position(item: String, i: Int, width: Int): Int = {
    val hex = md5Hex(item + "|" + (i / 2))
    val slice = if (i % 2 == 0) hex.substring(0, 15) else hex.substring(15, 30)
    (java.lang.Long.parseLong(slice, 16) % width).toInt
  }

  private def md5Hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** CMS over pre-weighted `(item, count)` rows — feed it the output of a
    * `groupBy(item).count()` (two md5 calls per DISTINCT item per partial
    * aggregate, not per raw row) or raw rows with weight 1.
    */
  final class Agg(width: Int)(implicit bufEnc: Encoder[Array[Long]])
      extends Aggregator[(String, Long), Array[Long], Array[Long]] {
    require(width > 0, s"width must be positive, got $width")

    def zero: Array[Long] = new Array[Long](Depth * width)

    def reduce(b: Array[Long], row: (String, Long)): Array[Long] = {
      val (item, c) = row
      if (item != null) {
        var i = 0
        while (i < Depth) {
          b(i * width + position(item, i, width)) += c
          i += 1
        }
      }
      b
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = bufEnc
    def outputEncoder: Encoder[Array[Long]] = bufEnc
  }

  /** The sketch of weighted items as an aggregate Column (a
    * `Depth·width`-long array).
    */
  def sketch(df: DataFrame, item: Column, weight: Column, width: Int): Column = {
    val spark = df.sparkSession
    import spark.implicits._
    udaf(new Agg(width)).apply(item, weight.cast("long"))
  }

  /** JVM-side point estimate from a materialized sketch. */
  def estimate(cells: Array[Long], item: String, width: Int): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < Depth) {
      val v = cells(i * width + position(item, i, width))
      if (v < best) best = v
      i += 1
    }
    best
  }

  /** Relational point estimate: `min_i cells[i·width + h_i(item)]`, built
    * from codegen'd md5/conv/element_at — probing a sketch column never
    * leaves the executors (no collect, no UDF).
    */
  def estimateCol(cells: Column, item: Column, width: Int): Column = {
    val probes = (0 until Depth).map { i =>
      val hex = md5(concat(item, lit("|" + (i / 2))).cast("binary"))
      val slice = if (i % 2 == 0) substring(hex, 1, 15) else substring(hex, 16, 15)
      val pos = conv(slice, 16, 10).cast("long") % width
      element_at(cells, (lit(i.toLong * width) + pos).cast("int") + 1)
    }
    least(probes: _*)
  }
}
