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

  /** Cosine similarity between two ArrayType(Float/Double) columns — a
    * native fused-loop expression ([[graft.functions.CosineSim]]); double
    * precision, sequential accumulation in index order, so an external
    * oracle computing the plain scalar loop agrees bitwise.
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnOps.column(
      CosineSim(org.apache.spark.sql.graft.ColumnOps.expression(a),
        org.apache.spark.sql.graft.ColumnOps.expression(b)))

  /** Dot product of two vector columns (native fused loop). */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnOps.column(
      DotProduct(org.apache.spark.sql.graft.ColumnOps.expression(a),
        org.apache.spark.sql.graft.ColumnOps.expression(b)))

  /** Distinct word-n-gram shingle hashes (native byte-scan kernel). */
  def shingleHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnOps.column(
      ShingleHashArray(org.apache.spark.sql.graft.ColumnOps.expression(text), n))

  /** 64-lane MinHash signature (native single-pass kernel). */
  def minHashSignature(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnOps.column(
      MinHashSig(org.apache.spark.sql.graft.ColumnOps.expression(text), n))

  /** 64-bit SimHash signature (native single-pass kernel). */
  def simHashSignature(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnOps.column(
      SimHashSig(org.apache.spark.sql.graft.ColumnOps.expression(text), n))
}
