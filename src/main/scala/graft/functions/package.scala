package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column expressions. Pure `Column` combinators — everything stays
  * inside whole-stage codegen (no UDFs, no driver round-trips).
  */
package object functions {

  /** Seconds → `"<M>m <S>s"` with uncapped minutes (`"431m 23s"`).
    *
    * Reproduces the reference's duration rendering in its per-staff report
    * (reference staff_reports.json:13-15 — e.g. `"avgTimeToServe": "14m 52s"`).
    */
  def durationMmSs(secs: Column): Column =
    concat(
      floor(secs / 60).cast("string"), lit("m "),
      (secs % 60).cast("string"), lit("s"))

  /** Whole seconds since epoch (floor), as LongType. */
  def epochSeconds(ts: Column): Column = unix_timestamp(ts)

  /** Deterministic, sorted, comma-joined distinct-set rendering.
    * `collect_set` order is nondeterministic across partitions/runs;
    * sorting then joining makes the value stable for oracle hashing.
    */
  def sortedSetString(c: Column): Column =
    concat_ws(",", array_sort(collect_set(c)))

  /** Cosine similarity between two ArrayType(Float/Double) columns, computed
    * in double precision with a deterministic left-to-right fold (matches a
    * straightforward sequential loop, so an external oracle agrees bitwise
    * modulo final rounding).
    */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val dot = aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    dot / (na * nb)
  }
}
