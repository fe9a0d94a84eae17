package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002; the theta
  * sketch's core): keep the k smallest DISTINCT hash values of a stream.
  * What HLL cannot do and KMV can: SET OPERATIONS — the k smallest values
  * of `A ∪ B` are computable from the two sketches alone, and the
  * fraction of them present in both sketches estimates `|A∩B|/|A∪B|`
  * (Jaccard) directly. That makes KMV the scale path for cross-source
  * overlap questions the exact shingle-join (q83) answers at
  * distinct-space cost.
  *
  * Shape: a typed [[Aggregator]] over already-hashed values; the buffer
  * is a sorted ≤ k `Array[Long]` (Catalyst native array encoder). Reduce
  * is a binary-search insert, merge is a sorted-merge + trim — O(k)
  * state per group at any corpus scale, with map-side combine.
  *
  * Determinism contract: the sketch is a pure function of the input's
  * distinct hash SET (insertion dedupes, merge dedupes), so any engine
  * hashing the same domain the same way produces the identical array —
  * the q98 oracle rebuilds the per-source sketches and the pairwise
  * union/intersection estimates in DuckDB and hash-compares exactly.
  */
object KmvSketch {

  /** Sorted k-min distinct values of a LongType column (pre-hashed,
    * non-negative by convention — use a 40/60-bit md5 slice).
    */
  final class Agg(k: Int)(implicit bufEnc: Encoder[Array[Long]])
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0, s"k must be positive, got $k")

    def zero: Array[Long] = Array.emptyLongArray

    def reduce(b: Array[Long], v: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(b, v)
      if (pos >= 0) b // already present — KMV is a set sketch
      else {
        val ins = -pos - 1
        if (ins >= k) b // larger than the current k-th min: no-op
        else {
          val n = math.min(b.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = v
          System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // Sorted merge, dedup, trim to k — exactly the k smallest of the
      // union of the two value sets.
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      var last = Long.MinValue; var first = true
      while (n < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (first || v != last) { out(n) = v; n = n + 1; last = v; first = false }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = bufEnc
    def outputEncoder: Encoder[Array[Long]] = bufEnc
  }

  /** The KMV sketch of a hashed-long column as an aggregate Column. */
  def sketch(df: DataFrame, hashed: Column, k: Int): Column = {
    val spark = df.sparkSession
    import spark.implicits._
    udaf(new Agg(k)).apply(hashed.cast("long"))
  }

  /** The k smallest values of the UNION of two sketches (relational:
    * native array ops over two ≤ k arrays).
    */
  def unionK(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** How many of the union-KMV's values appear in BOTH input sketches —
    * the Jaccard numerator of the KMV estimator.
    */
  def bothCount(union: Column, a: Column, b: Column): Column =
    size(array_intersect(array_intersect(union, a), b)).cast("long")
}
