package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mergeable quantile sketches as first-class columns — the percentile
  * analogue of the HLL distinct-count state: each subset of a column
  * collapses to a bytes-sized Greenwald–Khanna summary, summaries MERGE
  * (associatively, any grouping), and any quantile is answerable from
  * the merged summary within `relativeError` of rank — without
  * re-scanning the rows that built it. That mergeability is what an
  * incremental warehouse needs: per-batch sketches fold into a persisted
  * state table and "p95 so far" reads from KBs of state, not a replay of
  * every batch ever loaded (see [[graft.warehouse.QuantileState]]).
  *
  * The summary implementation is Spark's own battle-tested
  * [[QuantileSummaries]] (the engine under `approx_percentile`, public
  * Apache Spark source) — this module adds what Spark doesn't expose:
  * the sketch as a VALUE (serialized, persistable, re-mergeable across
  * jobs) rather than a transient aggregation buffer.
  *
  * Buffers live as plain JVM objects between `reduce` calls (typed
  * Aggregator ⇒ TypedImperativeAggregate) and cross partial-aggregate
  * boundaries via Java serialization (QuantileSummaries is
  * Serializable; Kryo is JPMS-hostile on Java 17 — the FrequentItems
  * note). The PERSISTED format is the explicit little-schema encoding
  * of [[QuantileSketch.toBytes]] — (relativeError, count, [value, g,
  * delta]*) — so state files never depend on JDK serialization
  * stability across versions.
  *
  * Error bound: a single sketch answers rank within ±relativeError·n;
  * each binary merge adds the operands' errors in the worst case (the
  * GK merge bound), so a batch-over-batch fold of B batches is bounded
  * by ~2·relativeError·n for a balanced merge and B·relativeError·n
  * adversarially. Pick relativeError accordingly (0.001–0.01 is
  * KB-sized either way).
  */
object QuantileSketch {

  // ------------------------------------------------------------ encoding
  /** Compress + serialize: (relativeError, count, n, then n (value, g,
    * delta) triples) — 24 bytes per retained sample, O(1/relativeError ·
    * log(ε·n)) samples total.
    */
  def toBytes(qs0: QuantileSummaries): Array[Byte] = {
    val qs = qs0.compress()
    val sampled = qs.sampled
    val bb = ByteBuffer.allocate(8 + 8 + 4 + sampled.length * 24)
    bb.putDouble(qs.relativeError)
    bb.putLong(qs.count)
    bb.putInt(sampled.length)
    sampled.foreach { s => bb.putDouble(s.value); bb.putLong(s.g); bb.putLong(s.delta) }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): QuantileSummaries = {
    val bb = ByteBuffer.wrap(bytes)
    val relativeError = bb.getDouble
    val count = bb.getLong
    val n = bb.getInt
    val stats = Array.fill(n)(
      QuantileSummaries.Stats(bb.getDouble, bb.getLong, bb.getLong))
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError, stats, count,
      compressed = true)
  }

  private def empty(relativeError: Double): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relativeError)

  /** Mutable aggregation buffer holding the live summary as a plain JVM
    * field between `reduce` calls, but crossing partial-aggregate
    * boundaries in the COMPACT encoding: `writeObject` runs
    * [[QuantileSketch.toBytes]] (which compresses first), so the
    * serialized partial is the KB-sized (value, g, delta) triple array —
    * not a Java-serialized graph of the raw head buffer (tens of
    * thousands of boxed doubles per column). The compression cost moves
    * to the parallel map side; the single final-merge task then
    * deserializes and merges only compressed sketches (this was q72's
    * serial 2.3 s before).
    */
  final class QSBuf(@transient var qs: QuantileSummaries)
      extends java.io.Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val bytes = toBytes(qs)
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val bytes = new Array[Byte](n)
      in.readFully(bytes)
      qs = fromBytes(bytes)
    }
  }

  // ---------------------------------------------------------- aggregators
  /** Values → serialized sketch. Input rows must be non-null (filter
    * first: the primitive-double input encoder would read null as 0.0
    * and silently poison the distribution).
    */
  final class BuildAgg(relativeError: Double)
      extends Aggregator[Double, QSBuf, Array[Byte]] {
    def zero: QSBuf = new QSBuf(empty(relativeError))
    def reduce(b: QSBuf, v: Double): QSBuf = { b.qs = b.qs.insert(v); b }
    def merge(a: QSBuf, b: QSBuf): QSBuf = {
      a.qs = a.qs.compress().merge(b.qs.compress()); a
    }
    def finish(b: QSBuf): Array[Byte] = toBytes(b.qs)
    def bufferEncoder: Encoder[QSBuf] = Encoders.javaSerialization[QSBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Serialized sketches → their merged serialized sketch (the
    * `hll_union_agg` analogue). Null inputs are ignored.
    */
  final class MergeAgg(relativeError: Double)
      extends Aggregator[Array[Byte], QSBuf, Array[Byte]] {
    def zero: QSBuf = new QSBuf(empty(relativeError))
    def reduce(b: QSBuf, bytes: Array[Byte]): QSBuf =
      if (bytes == null) b
      else {
        val other = fromBytes(bytes)
        // A persisted sketch carries its own ε; silently merging a looser
        // sketch would void the stated error bound — fail loudly instead.
        require(other.relativeError == relativeError,
          s"sketch relativeError mismatch: persisted ${other.relativeError}, " +
            s"configured $relativeError — rebuild the state with one epsilon")
        b.qs = b.qs.compress().merge(other)
        b
      }
    def merge(a: QSBuf, b: QSBuf): QSBuf = {
      a.qs = a.qs.compress().merge(b.qs.compress()); a
    }
    def finish(b: QSBuf): Array[Byte] = toBytes(b.qs)
    def bufferEncoder: Encoder[QSBuf] = Encoders.javaSerialization[QSBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate Column: sketch of a double column. */
  def sketchAgg(df: DataFrame, values: Column, relativeError: Double): Column =
    udaf(new BuildAgg(relativeError)).apply(values)

  /** Aggregate Column: union-merge of serialized sketches. */
  def mergeAgg(df: DataFrame, sketches: Column, relativeError: Double): Column =
    udaf(new MergeAgg(relativeError)).apply(sketches)

  /** Scalar Column: evaluate `percentiles` against a serialized sketch →
    * array<double> (null for an empty sketch). State-table-sized inputs;
    * the eval (CodegenFallback) expression is deliberate — this never
    * sits in a corpus-scan hot path.
    */
  def queryValues(sketch: Column, percentiles: Seq[Double]): Column =
    org.apache.spark.sql.graft.ColumnOps.column(QuantileSketchQuery(
      org.apache.spark.sql.graft.ColumnOps.expression(sketch), percentiles))
}

/** `query(percentiles)` over a serialized [[QuantileSketch]] binary. */
case class QuantileSketchQuery(child: Expression, percentiles: Seq[Double])
    extends UnaryExpression with CodegenFallback {
  require(percentiles.nonEmpty && percentiles.forall(p => p >= 0 && p <= 1),
    s"percentiles must be in [0,1], got $percentiles")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val qs = QuantileSketch.fromBytes(input.asInstanceOf[Array[Byte]])
    qs.query(percentiles) match {
      case Some(vs) => new GenericArrayData(vs.toArray)
      case None     => null // empty sketch has no quantiles
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
