package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-memory frequent-items (heavy-hitters) detection: a
  * Misra–Gries summary as a typed Spark [[Aggregator]], plus the standard
  * two-pass exact refinement.
  *
  * The sketch keeps at most `capacity` counters per partial aggregate —
  * O(k) memory regardless of row count, the only shape that survives a
  * 100 TB column with an unbounded domain (an exact groupBy's hash table
  * is domain-sized; this never is). Guarantees (classic MG bounds):
  * every item with true frequency > n/(capacity+1) is present in the
  * merged summary, and each kept counter undercounts its item by at most
  * n/(capacity+1). Merging two summaries then re-decrementing preserves
  * both bounds (the mergeable-summaries result), which is exactly what
  * makes the sketch a valid distributed partial aggregate.
  *
  * The summary alone gives candidates with approximate counts; the
  * refinement pass filters the corpus to the ≤ capacity candidates and
  * counts them exactly — two linear scans total, no domain-sized shuffle
  * (the candidate filter is a broadcast-sized semi join). Any item whose
  * exact count clears `support · n` is provably in the candidate set, so
  * the refined output is EXACT — not sketch-approximate — whenever
  * 1/(capacity+1) ≤ support, and [[heavyHitters]] enforces that.
  *
  * Build-side buffers are mutable hash maps crossing partial-aggregate
  * boundaries via Java serialization (no Kryo — runtime-serializer
  * registration is JPMS-hostile on Java 17); published summaries are
  * immutable maps under Catalyst's native map encoder. The buffer lives
  * as a plain JVM object between `reduce` calls
  * (TypedImperativeAggregate), so encoding costs are paid only at
  * partial-aggregate boundaries, not per row.
  */
object FrequentItems {

  type Summary = Map[String, Long]

  /** MG eviction: decrement every counter by the (capacity+1)-th
    * LARGEST count and drop the non-positives. For the single-item
    * case this equals the classic decrement-by-min step; after a bulk
    * merge (where the buffer can be ~2·capacity) it is the
    * mergeable-summaries rule that restores `size ≤ capacity` in one
    * pass — at most `capacity` counters can exceed the (capacity+1)-th
    * largest value. Decrement mass per shrink stays ≤ n_subset/(k+1),
    * so the global undercount bound is preserved through any merge
    * tree.
    */
  private[functions] def shrinkMap(b: Map[String, Long],
                                   capacity: Int): Map[String, Long] =
    if (b.size <= capacity) b
    else {
      val counts = b.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val dec = counts(counts.length - capacity - 1)
      b.collect { case (k, v) if v > dec => k -> (v - dec) }
    }

  private[functions] def addMaps(a: Map[String, Long],
                                 b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }

  /** In-place MG eviction on the mutable working buffer: decrement by
    * the (capacity+1)-th largest count, drop non-positives. Identical
    * bound math to [[shrinkMap]]; the mutation avoids rebuilding an
    * immutable map in the per-row hot path.
    */
  private def shrinkInPlace(b: java.util.HashMap[String, java.lang.Long],
                            capacity: Int): Unit =
    if (b.size > capacity) {
      val counts = new Array[Long](b.size)
      var i = 0
      val vit = b.values.iterator
      while (vit.hasNext) { counts(i) = vit.next().longValue; i += 1 }
      java.util.Arrays.sort(counts)
      val dec = counts(counts.length - capacity - 1)
      val it = b.entrySet.iterator
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue.longValue
        if (v <= dec) it.remove() else e.setValue(v - dec)
      }
    }

  /** Misra–Gries aggregator over a string column. Partial aggregates and
    * merges both run the decrement rule, so the result is a valid
    * mergeable summary of whatever subset each task saw.
    *
    * Hot-path shape (the q72 profiler runs one of these per column over
    * the whole table): the working buffer is a MUTABLE hash map with 2×
    * slack — eviction fires on overflow past 2·capacity, not per row.
    * The classic decrement argument is slack-invariant (every shrink
    * removes ≥ (capacity+1)·dec mass, so Σ dec ≤ n/(capacity+1)), and
    * `finish` shrinks to ≤ capacity entries, so the published summary
    * carries the exact same MG guarantees — at ~1/capacity the eviction
    * work on high-cardinality columns, with zero per-row allocation.
    */
  final class MisraGries(capacity: Int)(implicit mapEnc: Encoder[Map[String, Long]])
      extends Aggregator[String, java.util.HashMap[String, java.lang.Long], Summary] {
    require(capacity > 0, s"capacity must be positive, got $capacity")

    def zero: java.util.HashMap[String, java.lang.Long] =
      new java.util.HashMap[String, java.lang.Long]

    def reduce(b: java.util.HashMap[String, java.lang.Long],
               item: String): java.util.HashMap[String, java.lang.Long] = {
      if (item != null) {
        val prev = b.get(item)
        b.put(item, if (prev == null) 1L else prev.longValue + 1L)
        if (b.size > 2 * capacity) shrinkInPlace(b, capacity)
      }
      b
    }

    def merge(a: java.util.HashMap[String, java.lang.Long],
              b: java.util.HashMap[String, java.lang.Long])
        : java.util.HashMap[String, java.lang.Long] = {
      val it = b.entrySet.iterator
      while (it.hasNext) {
        val e = it.next()
        val prev = a.get(e.getKey)
        a.put(e.getKey,
          if (prev == null) e.getValue else prev.longValue + e.getValue.longValue)
      }
      if (a.size > 2 * capacity) shrinkInPlace(a, capacity)
      a
    }

    def finish(b: java.util.HashMap[String, java.lang.Long]): Summary = {
      shrinkInPlace(b, capacity)
      val out = Map.newBuilder[String, Long]
      val it = b.entrySet.iterator
      while (it.hasNext) { val e = it.next(); out += e.getKey -> e.getValue.longValue }
      out.result()
    }

    def bufferEncoder: Encoder[java.util.HashMap[String, java.lang.Long]] =
      Encoders.javaSerialization[java.util.HashMap[String, java.lang.Long]]
    def outputEncoder: Encoder[Summary] = mapEnc
  }

  /** Already-built MG summaries → their MG-merged summary (the
    * `hll_union_agg` analogue for heavy hitters): counterwise addition
    * followed by the same shrink rule, so the result is the summary the
    * one-shot sketch of the concatenated inputs could have produced,
    * with the same guarantee bounds. Null inputs are ignored.
    */
  final class MisraGriesMerge(capacity: Int)(implicit mapEnc: Encoder[Map[String, Long]])
      extends Aggregator[Map[String, Long], Map[String, Long], Summary] {
    require(capacity > 0, s"capacity must be positive, got $capacity")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], m: Map[String, Long]): Map[String, Long] =
      if (m == null) b else shrinkMap(addMaps(b, m), capacity)

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      shrinkMap(addMaps(a, b), capacity)

    def finish(b: Map[String, Long]): Summary = b

    def bufferEncoder: Encoder[Map[String, Long]] = mapEnc
    def outputEncoder: Encoder[Summary] = mapEnc
  }

  /** The MG summary of a string column as an aggregate Column. */
  def misraGries(df: DataFrame, column: Column, capacity: Int): Column = {
    val spark = df.sparkSession
    import spark.implicits._
    udaf(new MisraGries(capacity)).apply(column)
  }

  /** Exact heavy hitters of `itemCol`: every item whose frequency is ≥
    * `support` (fraction of non-null rows), found with O(1/support)
    * memory. Pass 1 collapses the corpus into one MG summary (capacity
    * ⌈2/support⌉ ⇒ the MG guarantee threshold n/(capacity+1) < support·n,
    * so no qualifying item can be evicted); pass 2 recounts the ≤
    * capacity candidates exactly. The collected summary is
    * capacity-bounded driver metadata, never corpus-sized. Output: item,
    * exact count, frequency.
    */
  def heavyHitters(df: DataFrame, itemCol: String, support: Double): DataFrame = {
    require(support > 0 && support <= 1, s"support must be in (0,1], got $support")
    val capacity = math.ceil(2.0 / support).toInt
    val items = df.select(col(itemCol)).na.drop(Seq(itemCol))
    // The total row count rides the sketch aggregation — pass 1 is ONE
    // scan producing both the candidates and n.
    val first = items
      .agg(misraGries(items, col(itemCol), capacity).as("mg"),
        count(lit(1)).as("total"))
      .head()
    val summary = first.getAs[Map[String, Long]]("mg")
    val total = first.getAs[Long]("total")
    val spark = df.sparkSession
    import spark.implicits._
    val candidates = summary.keys.toSeq.toDF(itemCol)
    items
      .join(broadcast(candidates), Seq(itemCol), "left_semi")
      .groupBy(itemCol).agg(count(lit(1)).as("n"))
      .filter(col("n") >= lit(total) * support)
      .select(col(itemCol), col("n"),
        round(col("n").cast("double") / lit(total), 6).as("freq"))
  }
}
