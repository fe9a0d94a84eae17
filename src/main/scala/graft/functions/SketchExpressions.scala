package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch signatures as native per-row expressions.
  *
  * MinHash/SimHash signatures are pure functions of one document's text, so
  * the right plan shape is a narrow projection — NOT explode-shingles +
  * 64-lane aggregate (which shuffles 300× the rows and, worse, runs
  * through interpreted higher-order functions). These kernels scan the
  * UTF8 bytes once: token spans are hashed in place (XXH64 over the byte
  * slice — no token strings), each n-token window is hash-chained into a
  * shingle hash, and the signature loops run over a small dedup set.
  * Measured: the whole signature pass for 5000 docs drops from ~9 s
  * (explode + typed aggregate) to well under a second, and it scales
  * embarrassingly parallel — no shuffle at any size.
  */
object SketchKernels {

  val TokenSeed = 42L
  val ChainSeed = 1337L
  val LaneSeed = 7777L
  val NumLanes = 64

  /** Distinct 64-bit hashes of word n-gram shingles, scanning UTF-8 bytes
    * directly (space = 0x20 never occurs inside a multi-byte codepoint).
    * Multiset→set dedup keeps Jaccard-over-hashes equal to
    * Jaccard-over-shingle-sets (modulo 64-bit collisions).
    */
  def shingleHashes(text: UTF8String, n: Int): Array[Long] = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    val window = new Array[Long](n)
    var filled = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    var tokStart = -1
    while (i <= len) {
      val isSpace = i == len || text.getByte(i) == 0x20
      if (!isSpace && tokStart < 0) tokStart = i
      if (isSpace && tokStart >= 0) {
        val th = XXH64.hashUnsafeBytes(base, off + tokStart, i - tokStart, TokenSeed)
        tokStart = -1
        // slide window
        var j = 0
        while (j < n - 1) { window(j) = window(j + 1); j += 1 }
        window(n - 1) = th
        if (filled < n) filled += 1
        if (filled == n) {
          var acc = ChainSeed
          j = 0
          while (j < n) { acc = XXH64.hashLong(window(j), acc); j += 1 }
          if (seen.add(acc)) out += acc
        }
      }
      i += 1
    }
    out.toArray
  }

  /** 64-lane MinHash via Kirsch-Mitzenmacher double hashing. */
  def minHash(shingles: Array[Long]): Array[Long] = {
    val sig = Array.fill(NumLanes)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val h1 = shingles(s)
      val h2 = XXH64.hashLong(h1, LaneSeed)
      var i = 0
      while (i < NumLanes) {
        val h = h1 + i * h2
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** Exact Jaccard of two long-array columns under SET semantics in one
    * fused pass: copy, sort, dedupe, merge-count the intersection
    * (|∪| = |a|+|b|−|∩|). Value-identical to
    * `size(array_intersect)/size(array_union)` for EVERY input — duplicate
    * elements count once and a null element is one set member (equal only
    * to another null), exactly as the array functions treat them — except
    * ∅/∅ which returns 0.0 instead of the SQL form's division by zero.
    * Replaces that formulation in the hot path: it allocates two
    * intermediate arrays and hashes both inputs twice per pair — this is
    * the per-candidate verify of every LSH text pipeline.
    */
  def jaccardLongSets(a: ArrayData, b: ArrayData): Double = {
    val (xs, nx, nullA) = distinctSorted(a)
    val (ys, ny, nullB) = distinctSorted(b)
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val x = xs(i); val y = ys(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (nullA && nullB) inter += 1
    val sa = nx + (if (nullA) 1 else 0)
    val sb = ny + (if (nullB) 1 else 0)
    val union = sa + sb - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  /** Non-null elements sorted and deduped in place; returns (buffer,
    * distinct count, sawNull). One linear pass over the sorted run — noise
    * next to the sort for the already-distinct arrays the LSH verify
    * feeds through here.
    */
  private def distinctSorted(a: ArrayData): (Array[Long], Int, Boolean) = {
    val n = a.numElements()
    val buf = new Array[Long](n)
    var m = 0; var hasNull = false; var i = 0
    while (i < n) {
      if (a.isNullAt(i)) hasNull = true
      else { buf(m) = a.getLong(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(buf, 0, m)
    var w = 0; i = 0
    while (i < m) {
      if (w == 0 || buf(w - 1) != buf(i)) { buf(w) = buf(i); w += 1 }
      i += 1
    }
    (buf, w, hasNull)
  }

  /** |a ∩ b| of two SORTED, distinct, null-free long arrays in one merge
    * pass — no per-call sort, no allocation. The per-candidate verify of
    * the containment join (q115): at a degenerate-vocabulary corpus the
    * candidate space approaches all-pairs, so the per-pair constant IS
    * the query cost. Callers pre-sort once per row (`sort_array`); an
    * unsorted input silently undercounts, which is why the public wrapper
    * name carries the contract.
    */
  def overlapSortedLongSets(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  /** Bit width of the portable SimHash: 60 = 15 hex chars of an md5
    * digest, the widest value every ANSI engine can hold in a signed
    * 64-bit integer (DuckDB: `('0x'||substr(md5(s),1,15))::BIGINT`).
    */
  val SimHashBits = 60

  /** Portable 60-bit SimHash. Unlike the xxh64 shingle chain (a Spark
    * implementation detail), every step here is re-computable in ANSI
    * SQL, which makes the signature itself oracle-checkable in DuckDB
    * (q18): lowercase, tokenize on the RE2 `\s` class, join each word
    * n-gram with single spaces, hash the DISTINCT shingle strings with
    * md5 keeping the top 60 bits (big-endian — the first 15 hex chars),
    * vote per bit (+1/−1), set bit b iff its vote sum is positive.
    * Exact-parity notes: dedup is on the shingle STRING (not its hash, so
    * an in-doc 60-bit collision can't diverge from SQL's
    * `list_distinct`); ties (vote 0) clear the bit in both engines; docs
    * with fewer than n tokens sign 0.
    */
  /** Lowercased tokens split on the RE2 `\s` class — the exact token
    * stream DuckDB's `string_split_regex(lower(text), '\s+')` (minus
    * empties) produces, shared by every oracle-parity text kernel.
    */
  def portableTokens(text: UTF8String): Array[String] = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    var start = -1
    while (i <= s.length) {
      val ws = i == s.length || {
        val c = s.charAt(i)
        c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
      }
      if (!ws && start < 0) start = i
      if (ws && start >= 0) { toks += s.substring(start, i); start = -1 }
      i += 1
    }
    toks.toArray
  }

  /** All word n-gram shingle STRINGS in document order, duplicates kept
    * (n=1 is the raw token stream — term frequencies survive; wrap in
    * `array_distinct` for set semantics). The string form, not a hash, so
    * downstream joins/aggregations are reproducible in any engine.
    */
  def shingleStringArray(text: UTF8String, n: Int): ArrayData = {
    val toks = portableTokens(text)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var k = 0
    while (k < m) {
      if (n == 1) out(k) = UTF8String.fromString(toks(k))
      else {
        val sb = new java.lang.StringBuilder(toks(k))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(k + j)); j += 1 }
        out(k) = UTF8String.fromString(sb.toString)
      }
      k += 1
    }
    new GenericArrayData(out)
  }

  // One digest per thread, reset per shingle: getInstance does a JCA
  // provider lookup + allocation, too heavy for a per-ROW call from
  // generated code (this kernel runs once per document on the hot path).
  private val md5Digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def simHash60Long(text: UTF8String, n: Int): Long = {
    val toks = portableTokens(text)
    val seen = new java.util.HashSet[String]()
    val md = md5Digest.get()
    val sums = new Array[Int](SimHashBits)
    var k = 0
    while (k + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(k))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(k + j)); j += 1 }
      val sh = sb.toString
      if (seen.add(sh)) {
        md.reset()
        val d = md.digest(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
        h = h >>> 4 // top 60 bits of the big-endian digest
        var bit = 0
        while (bit < SimHashBits) {
          sums(bit) += ((((h >>> bit) & 1L) << 1) - 1).toInt
          bit += 1
        }
      }
      k += 1
    }
    var out = 0L
    var bit = 0
    while (bit < SimHashBits) { if (sums(bit) > 0) out |= 1L << bit; bit += 1 }
    out
  }

  // Entry points used from generated code (one static call per row).
  def shingleArray(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(shingleHashes(text, n))
  def minHashArray(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(minHash(shingleHashes(text, n)))
}

sealed abstract class SketchExpression extends UnaryExpression {
  def shingleN: Int

  // n < 1 fails at ANALYSIS time: the window/stride loops in the string
  // kernels would otherwise read past the token array on the executor
  // (a SQL-reachable per-row AIOOBE via e.g. shingle_strings(text, 0)).
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
    else if (shingleN < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires shingle size >= 1, got $shingleN")
    else TypeCheckResult.TypeCheckSuccess
}

/** Distinct word-n-gram shingle hashes of a text column. */
case class ShingleHashArray(child: Expression, shingleN: Int) extends SketchExpression {
  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    SketchKernels.shingleArray(t.asInstanceOf[UTF8String], shingleN)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.SketchKernels.shingleArray($t, $shingleN)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word n-gram shingle STRINGS of a text column, duplicates kept in
  * document order (see [[SketchKernels.shingleStringArray]]) — the
  * oracle-portable counterpart of [[ShingleHashArray]]: tokenization and
  * joining match DuckDB's `string_split_regex(lower(text),'\s+')` +
  * `list_transform` n-gram build exactly, so equi-joins and term counts
  * over these strings are engine-reproducible (q45 decontamination, q46
  * TF-IDF).
  */
case class ShingleStrings(child: Expression, shingleN: Int) extends SketchExpression {
  override def prettyName: String = "shingle_strings"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    SketchKernels.shingleStringArray(t.asInstanceOf[UTF8String], shingleN)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.SketchKernels.shingleStringArray($t, $shingleN)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-lane MinHash signature of a text column. */
case class MinHashSig(child: Expression, shingleN: Int) extends SketchExpression {
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    SketchKernels.minHashArray(t.asInstanceOf[UTF8String], shingleN)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.SketchKernels.minHashArray($t, $shingleN)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact set-semantics Jaccard similarity of two long-array columns —
  * the fused candidate-verify kernel (see [[SketchKernels.jaccardLongSets]]);
  * duplicates and null elements behave exactly as in
  * `size(array_intersect)/size(array_union)`.
  */
case class JaccardSets(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "jaccard_sets"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got ${l.simpleString} / ${r.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.jaccardLongSets(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchKernels.jaccardLongSets($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two sorted distinct long-set columns (fused merge
  * kernel; see [[SketchKernels.overlapSortedLongSets]] for the sortedness
  * contract).
  */
case class SetOverlapSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "set_overlap_sorted"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got ${l.simpleString} / ${r.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.overlapSortedLongSets(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchKernels.overlapSortedLongSets($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Portable 60-bit SimHash signature of a text column (md5 basis — see
  * [[SketchKernels.simHash60Long]]; DuckDB recomputes it bit-identically,
  * which is what lets q18 be oracle-gated rather than rows-only).
  */
case class SimHashSig(child: Expression, shingleN: Int) extends SketchExpression {
  override def prettyName: String = "simhash_sig"
  override def dataType: DataType = LongType

  override def nullSafeEval(t: Any): Any =
    SketchKernels.simHash60Long(t.asInstanceOf[UTF8String], shingleN)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.SketchKernels.simHash60Long($t, $shingleN)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
