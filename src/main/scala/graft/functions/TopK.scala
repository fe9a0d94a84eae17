package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-heap grouped top-k as a typed [[Aggregator]] — the
  * aggregation-based alternative to the `row_number() OVER (PARTITION BY g
  * ORDER BY s DESC) <= k` window.
  *
  * Why it matters at 100 TB: the window form shuffles EVERY row of every
  * group to the group's reducer and sorts there — the shuffle is
  * corpus-sized. An Aggregator participates in partial aggregation
  * (ObjectHashAggregate): each map task keeps at most k entries per group
  * and the exchange carries ≤ k·groups·partitions rows — for k=3 over
  * billions of lineitems, effectively nothing. Same trade the sketch
  * aggregators make, but exact: top-k selection is mergeable, so the
  * partial/final split loses no information.
  *
  * Ordering contract: descending score, then ascending (key, sub) — a
  * TOTAL order, so results are deterministic under any partitioning and
  * equal to the window form's output row-for-row.
  */
object TopK {

  /** One candidate: score to maximize, then (key, sub) as the tiebreak
    * and payload identity.
    */
  final case class Entry(score: Double, key: Long, sub: Long)

  private val ord: Ordering[Entry] =
    Ordering.by((e: Entry) => (-e.score, e.key, e.sub))

  /** Insert into a descending-sorted bounded buffer. O(k) per row with a
    * short-circuit: a row below the current k-th is dropped without
    * allocation (the common case once the buffer warms up).
    */
  private def insert(buf: List[Entry], e: Entry, k: Int): List[Entry] =
    if (buf.lengthCompare(k) >= 0 && ord.gteq(e, buf.last)) buf
    else {
      val (hi, lo) = buf.span(ord.lt(_, e))
      (hi ::: e :: lo).take(k)
    }

  final class TopKAgg(k: Int)(implicit bufEnc: Encoder[List[Entry]],
                              outEnc: Encoder[Seq[Entry]])
      extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    def zero: List[Entry] = Nil
    def reduce(b: List[Entry], a: Entry): List[Entry] = insert(b, a, k)
    def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)((acc, e) => insert(acc, e, k))
    def finish(b: List[Entry]): Seq[Entry] = b
    def bufferEncoder: Encoder[List[Entry]] = bufEnc
    def outputEncoder: Encoder[Seq[Entry]] = outEnc
  }

  /** Column form: `topK(3)(score, key, sub)` inside a `groupBy(...).agg`.
    * Returns the group's top-k entries descending — explode with
    * `posexplode` for (rank-1, entry) rows.
    */
  def topK(k: Int)(score: Column, key: Column, sub: Column)(
      implicit bufEnc: Encoder[List[Entry]], outEnc: Encoder[Seq[Entry]]): Column =
    udaf(new TopKAgg(k)).apply(score, key, sub)

  /** Grouped top-k of `df` by `score` within `group`, k entries per
    * group, ties broken ascending on (key, sub). Output: group columns +
    * rank (1-based) + the entry fields.
    */
  def grouped(df: DataFrame, groupCols: Seq[String], score: Column,
              key: Column, sub: Column, k: Int)(
      implicit bufEnc: Encoder[List[Entry]], outEnc: Encoder[Seq[Entry]]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(topK(k)(score, key, sub).as("top"))
      .select(groupCols.map(col) :+ posexplode(col("top")).as(Seq("pos", "e")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("int").as("rank"),
        col("e.score").as("score"), col("e.key").as("key"),
        col("e.sub").as("sub")): _*)
}
