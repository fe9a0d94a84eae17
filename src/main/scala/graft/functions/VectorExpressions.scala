package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Allocation-free vector kernels over Spark's columnar `ArrayData` —
  * called both from interpreted eval and from generated code (the codegen
  * body is a single static call, so the expression stays inside
  * whole-stage codegen with zero per-row boxing).
  *
  * Accumulation is sequential double-precision in index order, matching a
  * plain scalar loop — the property external oracles rely on for bitwise
  * agreement (see Similarity scaladoc).
  */
object VectorKernels {
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    acc
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)

  def cosineFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineDD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** All `tables` hyperplane-LSH bucket codes of one vector in a single
    * fused pass: plane (t*bits + b) contributes sign bit b of table t's
    * code. `planes` is the row-major flattened (tables*bits) × dim matrix.
    * One O(tables · bits · dim) loop and one small output array per row —
    * no per-plane Column expressions (tables×bits separate interpreted
    * dot products blow codegen limits; see SNIPPETS notes on sketch
    * signatures).
    *
    * The stride comes from the PLANE matrix, not the row: a ragged vector
    * whose length disagrees with the matrix dim would otherwise silently
    * hash against the wrong plane slice (or read past the matrix). Such
    * rows yield null — they generate no candidates, they don't corrupt
    * buckets.
    */
  def hyperplaneBucketsF(v: ArrayData, planes: Array[Double], bits: Int, tables: Int): ArrayData = {
    val dim = planes.length / (tables * bits)
    if (v.numElements() != dim) return null
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += v.getFloat(i).toDouble * planes(base + i); i += 1 }
        if (dot > 0) code |= (1L << b)
        b += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }

  def hyperplaneBucketsD(v: ArrayData, planes: Array[Double], bits: Int, tables: Int): ArrayData = {
    val dim = planes.length / (tables * bits)
    if (v.numElements() != dim) return null
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += v.getDouble(i) * planes(base + i); i += 1 }
        if (dot > 0) code |= (1L << b)
        b += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Hamming distance between two packed bit-code arrays (array<long>) —
    * one XOR + popcount per word. Ragged pairs return -1 (a caller
    * comparing codes from different plane matrices has a bug; -1 sorts
    * FIRST ascending, so it is loud in any shortlist, never silent).
    */
  def hammingLL(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n) return -1L
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    acc
  }

  /** All `m` PQ subspace codes of one vector in a single pass — the
    * native form of the literal argmin expression tree
    * (`array_sort(array(struct(cnorm − 2·dot, code), …))` per subspace):
    * the same FP operation sequence, so every distance double is
    * bit-identical to the expression form —
    *   dot  = index-order Σ v[s·dsub+j] · books[(s·ksub+c)·dsub+j]
    *          over the OVERLAP of the subvector slice and the centroid
    *          (`slice` truncates on ragged rows; dotDD runs to the
    *          shorter side's length — mirrored by `jmax`),
    *   d    = cnorms[s·ksub+c] − 2.0·dot  (cnorms precomputed EXACTLY as
    *          the plan literal was: left-to-right Σ c_j²),
    * and argmin comparison via [[sqlCmpDouble]] — Spark's own double
    * ordering (array_sort's), ties to the smaller code, NaN never wins
    * unless all are NaN (matching NaN-sorts-last).
    *
    * One expression node replaces ~m·ksub·dsub literal nodes: the plan
    * (and its per-job Catalyst/codegen cost — measured as the dominant
    * driver gap in the PQ-family lifecycles) stops growing with the
    * codebook, and the per-row eval drops the m·ksub struct allocations
    * of the array_sort form.
    */
  def pqEncode(v: ArrayData, books: Array[Double], cnorms: Array[Double],
               m: Int, dsub: Int, ksub: Int): ArrayData = {
    val vlen = v.numElements()
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * dsub
      val jmax = math.min(dsub, math.max(0, vlen - base))
      var bestD = Double.NaN
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val off = (s * ksub + c) * dsub
        var dot = 0.0
        var j = 0
        while (j < jmax) { dot += v.getDouble(base + j) * books(off + j); j += 1 }
        val d = cnorms(s * ksub + c) - 2.0 * dot
        if (c == 0 || sqlCmpDouble(d, bestD) < 0) { bestD = d; bestC = c }
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  /** The n cheapest coarse cells of one vector — the native form of the
    * literal assign tree (see [[NearestCells]] for the bit-equality
    * contract). Distances in centroid-row order, then an in-place
    * selection of the n smallest by (d asc, cell asc) — the same total
    * order `array_sort` imposed on the (d, cell) structs.
    */
  def nearestCells(v: ArrayData, cents: Array[Double], cnorms: Array[Double],
                   cellIds: Array[Int], dim: Int, n: Int): ArrayData = {
    val k = cellIds.length
    val vlen = v.numElements()
    val jmax = math.min(dim, vlen)
    val ds = new Array[Double](k)
    val cs = new Array[Int](k)
    var i = 0
    while (i < k) {
      val off = i * dim
      var dot = 0.0
      var j = 0
      while (j < jmax) { dot += v.getDouble(j) * cents(off + j); j += 1 }
      ds(i) = cnorms(i) - 2.0 * dot
      cs(i) = cellIds(i)
      i += 1
    }
    val take = math.min(n, k)
    val out = new Array[Any](take)
    var t = 0
    while (t < take) {
      var best = t
      var i2 = t + 1
      while (i2 < k) {
        val cmp = sqlCmpDouble(ds(i2), ds(best))
        if (cmp < 0 || (cmp == 0 && cs(i2) < cs(best))) best = i2
        i2 += 1
      }
      val td = ds(t); val tc = cs(t)
      ds(t) = ds(best); cs(t) = cs(best)
      ds(best) = td; cs(best) = tc
      out(t) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](ds(t), cs(t)))
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Spark SQL's double ordering (the one `array_sort` uses): -0.0 == 0.0,
    * NaN equal to itself and greater than everything else.
    */
  private[functions] def sqlCmpDouble(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1 else if (x == y) 0
    else java.lang.Double.compare(x, y)
}

/** `hamming(a, b)` over packed bit codes (array<long>) — XOR + popcount
  * fused in one native pass; the scan kernel of the binary ANN face
  * ([[graft.analytics.BitIndex]]). Codegen is one static call, so the
  * whole approximate-distance scan stays inside whole-stage codegen.
  */
case class HammingDist(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_hamming"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> code columns, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.hammingLL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.hammingLL($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

sealed abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  /** Kernel method suffix chosen once at plan time. */
  protected def suffix: String =
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType)   => "FF"
      case (DoubleType, DoubleType) => "DD"
      case (FloatType, DoubleType)  => "FD"
      case _                        => "DF"
    }
}

/** `dot(a, b)` as a native expression: one fused loop, no intermediate
  * array (a `zip_with` + `aggregate` formulation allocates a scratch array
  * per row — measured ~2× slower on the O(n²) pair kernels).
  */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = suffix match {
    case "FF" => VectorKernels.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "DD" => VectorKernels.dotDD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "FD" => VectorKernels.dotFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case _    => VectorKernels.dotDF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dot$suffix($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `cosine(a, b)` fused into one loop (dot + both norms in a single pass). */
case class CosineSim(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = suffix match {
    case "FF" => VectorKernels.cosineFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case _    => VectorKernels.cosineDD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (elemType(left) == elemType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires matching element types")
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.cosine$suffix($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `hyperplane_buckets(vec)` — every multi-table LSH bucket code of a
  * vector in one native pass (array element t = table t's packed sign
  * bits). The plane matrix rides along as a plan-time reference object, so
  * generated code pays one static call per row; a `zip_with`+`aggregate`
  * formulation of the same 256 dots is interpreted AND re-evaluates its
  * captured subexpressions per element.
  */
case class HyperplaneBuckets(child: Expression, planes: Array[Double],
                             bitsPerTable: Int, numTables: Int) extends UnaryExpression {
  require(bitsPerTable >= 1 && bitsPerTable <= 63, "bitsPerTable must be in 1..63")

  override def prettyName: String = "hyperplane_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // Nullable even for non-null children: ragged vectors hash to null
  // rather than against a wrong plane slice (see kernel scaladoc).
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${other.simpleString}")
  }

  private def suffix: String = child.dataType match {
    case ArrayType(FloatType, _) => "F"
    case _                       => "D"
  }

  override def nullSafeEval(v: Any): Any = suffix match {
    case "F" => VectorKernels.hyperplaneBucketsF(
      v.asInstanceOf[ArrayData], planes, bitsPerTable, numTables)
    case _ => VectorKernels.hyperplaneBucketsD(
      v.asInstanceOf[ArrayData], planes, bitsPerTable, numTables)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VectorKernels.hyperplaneBuckets$suffix(
        $c, $ref, $bitsPerTable, $numTables);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_encode(v)` — all m PQ subspace codes (array<int>) against plan-bound
  * codebooks in ONE expression node; see [[VectorKernels.pqEncode]] for the
  * bit-equality contract with the literal argmin tree it replaces.
  * `books` is flattened as books(s)(c)(j) → [(s·ksub + c)·dsub + j];
  * `cnorms(s·ksub + c)` = Σ_j c_j² computed left-to-right (the plan
  * literal's exact value).
  */
case class PqEncode(child: Expression, books: Array[Double],
                    cnorms: Array[Double], m: Int, dsub: Int, ksub: Int)
    extends UnaryExpression {
  require(books.length == m * ksub * dsub && cnorms.length == m * ksub,
    "codebook shape mismatch")

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.pqEncode(v.asInstanceOf[ArrayData], books, cnorms, m, dsub, ksub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("books", books, "double[]")
    val cRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VectorKernels.pqEncode(
        $c, $bRef, $cRef, $m, $dsub, $ksub);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `nearest_cells(v)` — the n cheapest coarse cells of a vector against
  * plan-bound centroids, as the sorted `array<struct<d:double, cell:int>>`
  * the literal assign tree produced
  * (`slice(array_sort(array(struct(cnorm − 2·dot, cell), …)), 1, n)`):
  * same FP sequence per distance (index-order dot over the overlap, then
  * `cnorm − 2.0·dot`), same (d asc, cell asc) total order with Spark's
  * double ordering, so every emitted struct is bit-identical. One
  * expression node replaces the k-struct literal tree — the plan stops
  * growing with k, and per-row eval drops the k struct allocations +
  * array_sort. `cents` is row-major k×dim; `cnorms(i)` the left-to-right
  * Σ c_j² plan-literal value; `cellIds(i)` the cell id of row i.
  */
case class NearestCells(child: Expression, cents: Array[Double],
                        cnorms: Array[Double], cellIds: Array[Int],
                        dim: Int, n: Int) extends UnaryExpression {
  require(cents.length == cellIds.length * dim && cnorms.length == cellIds.length,
    "centroid shape mismatch")
  require(n >= 1, "n must be >= 1")

  override def prettyName: String = "nearest_cells"
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("d", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("cell", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.nearestCells(v.asInstanceOf[ArrayData], cents, cnorms,
      cellIds, dim, n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "double[]")
    val nRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    val iRef = ctx.addReferenceObj("cellIds", cellIds, "int[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VectorKernels.nearestCells(
        $c, $cRef, $nRef, $iRef, $dim, $n);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
