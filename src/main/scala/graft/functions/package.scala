package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column expressions. Pure `Column` combinators — everything stays
  * inside whole-stage codegen (no UDFs, no driver round-trips).
  */
package object functions {

  private def expr(c: Column) = org.apache.spark.sql.graft.ColumnOps.expression(c)
  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graft.ColumnOps.column(e)

  /** Seconds → `"<M>m <S>s"` with uncapped minutes (`"431m 23s"`).
    *
    * Reproduces the reference's duration rendering in its per-staff report
    * (reference staff_reports.json:13-15 — e.g. `"avgTimeToServe": "14m 52s"`).
    */
  def durationMmSs(secs: Column): Column =
    concat(
      floor(secs / 60).cast("string"), lit("m "),
      (secs % 60).cast("string"), lit("s"))

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
    toCol(CosineSim(expr(a), expr(b)))

  /** Dot product of two vector columns (native fused loop). */
  def dotProduct(a: Column, b: Column): Column =
    toCol(DotProduct(expr(a), expr(b)))

  /** Unicode canonicalization: NFC + control-strip + blank-collapse +
    * trim (native kernel with an ASCII zero-alloc fast path; see
    * [[graft.functions.TextKernels]]).
    */
  def nfcClean(text: Column): Column =
    toCol(NfcClean(expr(text)))

  /** Distinct word-n-gram shingle hashes (native byte-scan kernel). */
  def shingleHashes(text: Column, n: Int): Column =
    toCol(ShingleHashArray(expr(text), n))

  /** 64-lane MinHash signature (native single-pass kernel). */
  def minHashSignature(text: Column, n: Int): Column =
    toCol(MinHashSig(expr(text), n))

  /** Portable 60-bit SimHash signature (md5-basis native kernel). */
  def simHashSignature(text: Column, n: Int): Column =
    toCol(SimHashSig(expr(text), n))

  /** Word n-gram shingle strings, duplicates kept (n=1 = token stream);
    * engine-portable tokenization for oracle-checkable joins/counts.
    */
  def shingleStrings(text: Column, n: Int): Column =
    toCol(ShingleStrings(expr(text), n))

  /** Exact Jaccard of two distinct-element long-set columns (fused
    * sort-merge kernel; no intermediate intersect/union arrays).
    */
  def jaccardSets(a: Column, b: Column): Column =
    toCol(JaccardSets(expr(a), expr(b)))

  /** Intersection size of two SORTED distinct long-set columns — one
    * merge pass, no per-call sort or allocation. Callers pre-sort once
    * per row (`sort_array`); the name carries the contract.
    */
  def setOverlapSorted(a: Column, b: Column): Column =
    toCol(SetOverlapSorted(expr(a), expr(b)))

  /** All multi-table hyperplane-LSH bucket codes of a vector column in one
    * native fused pass — element t is table t's packed sign bits under the
    * row-major flattened plane matrix.
    */
  def hyperplaneBuckets(vec: Column, planes: Array[Double],
                        bitsPerTable: Int, numTables: Int): Column =
    toCol(HyperplaneBuckets(expr(vec), planes, bitsPerTable, numTables))

  /** Hamming distance between two packed bit-code columns (array<long>)
    * — XOR + popcount in one fused native pass.
    */
  def hammingDistance(a: Column, b: Column): Column =
    toCol(HammingDist(expr(a), expr(b)))

  /** All m PQ subspace codes (array<int>) of an array<double> vector
    * against the given codebooks — one native expression node; the
    * bit-equality contract with the literal argmin tree is in
    * [[VectorKernels.pqEncode]].
    */
  def pqEncodeCodes(vec: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val m = books.size
    val ksub = books.head.size
    val dsub = books.head.head.size
    val flat = books.flatMap(_.flatMap(identity)).toArray
    // cnorms computed EXACTLY as the plan literal was: left-to-right sum.
    val cnorms = books.flatMap(_.map(c => c.map(x => x * x).sum)).toArray
    toCol(PqEncode(expr(vec), flat, cnorms, m, dsub, ksub))
  }

  /** The n cheapest coarse cells of an array<double> vector as a sorted
    * `array<struct<d:double, cell:int>>` — one native expression node;
    * the bit-equality contract with the literal assign tree is in
    * [[NearestCells]].
    */
  def nearestCellsOf(vec: Column, centroids: Seq[(Int, Seq[Double])],
                     n: Int): Column = {
    require(centroids.nonEmpty, "nearestCellsOf: empty codebook")
    val dim = centroids.head._2.size
    val cents = centroids.flatMap(_._2).toArray
    // cnorms computed EXACTLY as the plan literal was: left-to-right sum.
    val cnorms = centroids.map(_._2.map(x => x * x).sum).toArray
    val ids = centroids.map(_._1).toArray
    toCol(NearestCells(expr(vec), cents, cnorms, ids, dim, n))
  }
}
