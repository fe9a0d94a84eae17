package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graft.ColumnOps
import org.apache.spark.sql.types.BinaryType

/** Library seam over Spark's OWN runtime-filter Bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter`), exposed as an
  * explicit operator: build a driver-sized binary filter over one frame's
  * key column, probe it as a codegen-friendly predicate on another. No
  * UDFs, no third-party sketch — the probe is the same expression the
  * optimizer itself injects, so it pushes into scans like any predicate.
  *
  * The standard use is the small-side prefilter: build over the SMALL
  * key set, probe the 100 TB side locally (no shuffle), and let an exact
  * join confirm the survivors — Bloom has no false negatives, so the
  * composed result is exact while the big side never shuffles more than
  * its true-hits + fpp.
  */
object BloomFilters {

  /** Build and collect the Bloom filter of `xxhash64(c)` over `df`.
    * The returned blob is `numBits/8` bytes regardless of row count —
    * driver- and broadcast-safe by construction. An EMPTY `df` yields an
    * empty array (the aggregate itself returns null on zero rows), which
    * [[mightContain]] turns into a constant-false predicate — the exact
    * semantics of membership in the empty set, instead of the silent
    * NULL-predicate drop-everything a raw null literal would cause.
    */
  def build(df: DataFrame, c: Column, expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnOps.expression(xxhash64(c)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    Option(df.select(ColumnOps.column(agg).as("bf")).head().getAs[Array[Byte]](0))
      .getOrElse(Array.empty[Byte])
  }

  /** Membership probe against a built filter — usable anywhere a Column
    * predicate is (filters, join conditions), rides predicate pushdown.
    * An empty-set filter (see [[build]]) probes as constant false.
    */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    if (bloom.isEmpty) org.apache.spark.sql.functions.lit(false)
    else ColumnOps.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ColumnOps.expression(xxhash64(c))))
}
