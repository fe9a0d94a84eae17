package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.transform.Clean
import graft.warehouse.MergeWriter

/** Structured Streaming variant of the sync engine (SURVEY.md §2.I).
  *
  * The reference's "stream" is a sorted incremental cursor drained on a
  * schedule with no overlapping runs (APScheduler `coalesce=True,
  * max_instances=1`, reference src/main.py:70-77). The Spark-native shape is
  * a file-source stream with `Trigger.AvailableNow` — each invocation drains
  * everything new then stops, and Spark's own streaming checkpoint provides
  * exactly-once source offsets (subsuming the reference's hand-rolled
  * high-water mark, SURVEY.md §7.4 item 7). The upsert sink runs in
  * `foreachBatch`, reusing the same idempotent [[MergeWriter]] as batch mode
  * so replays after failure converge.
  */
object StreamingSync {

  /** Drain-and-stop incremental sync of a JSON/NDJSON directory into a
    * warehouse table. Returns the started query; call `awaitTermination()`.
    */
  def availableNow(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      sourceName: String,
      tablePath: String,
      checkpointDir: String,
      clock: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    // DROPMALFORMED for parity with the batch reader (PERMISSIVE would
    // merge a malformed line as an all-null row, null key included).
    val reader = spark.readStream.schema(schema).option("mode", "DROPMALFORMED")
    val tuned = maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n))
    tuned.json(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val cleaned = Clean(batch, sourceName, clock())
          MergeWriter.merge(batch.sparkSession, tablePath, cleaned)
          ()
        }
      }
      .start()
  }

  /** Event-time windowed aggregation with watermarking — the streaming
    * analytics shape (SURVEY.md §2.I S4): tumbling windows over an event
    * timestamp, late data beyond `lateness` dropped, state bounded by the
    * watermark. Batch-equivalent of `Relational.hourlyEventWindows`.
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      window: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming exact deduplication — drop records whose key was already
    * seen within the watermark horizon (`dropDuplicatesWithinWatermark`):
    * the ingestion-side dedup a training-data pipeline runs BEFORE
    * documents reach the warehouse, complementing the batch MinHash/
    * fingerprint passes. State is bounded by the watermark (keys older
    * than `lateness` are evicted), so an unbounded stream holds a
    * bounded key set — the property that matters at 100 TB/day; plain
    * `dropDuplicates` on a stream would grow state forever.
    */
  /** Exact top-k per (event-time window, group) on a stream — the
    * streaming face of [[graft.functions.TopK]]: the same bounded-heap
    * typed Aggregator runs inside a watermarked windowed aggregation, so
    * streaming state per open (window, group) is ≤ k entries (the
    * aggregation buffer IS the heap — no row log), windows emit once the
    * watermark closes them, and the result equals the batch aggregator
    * run over the same data (StreamingTopKSpec pins stream ≡ batch).
    * Complements the approximate windowed Misra–Gries path: MG bounds
    * memory for UNBOUNDED key cardinality; this is exact for a FIXED k.
    */
  def windowedTopK(events: DataFrame, winDur: String, tsCol: String,
                   groupCol: String, score: org.apache.spark.sql.Column,
                   key: org.apache.spark.sql.Column,
                   sub: org.apache.spark.sql.Column, k: Int,
                   lateness: String = "10 minutes")(
      implicit bufEnc: org.apache.spark.sql.Encoder[List[graft.functions.TopK.Entry]],
      outEnc: org.apache.spark.sql.Encoder[Seq[graft.functions.TopK.Entry]]): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), winDur), col(groupCol))
      .agg(graft.functions.TopK.topK(k)(score, key, sub).as("top"))
      .select(col("window.start").cast("long").as("w_start"), col(groupCol),
        posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("w_start"), col(groupCol),
        (col("pos") + 1).cast("int").as("rank"),
        col("e.score").as("score"), col("e.key").as("key"),
        col("e.sub").as("sub"))

  def dedupedStream(events: DataFrame, keyCols: Seq[String], tsCol: String,
                    lateness: String = "1 hour"): DataFrame = {
    require(keyCols.nonEmpty, "dedupedStream needs at least one key column")
    events
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)
  }

  /** Watermarked stream-stream INNER join — the funnel/attribution shape
    * (a view joined to the purchases it led to within a time bound), the
    * one Structured Streaming staple the windowed/dedup/sessionize
    * surface didn't yet cover. Each left event joins right events with
    * equal keys whose timestamp lands in `[leftTs, leftTs + within]`.
    *
    * Both sides MUST carry watermarks and the join MUST bound the two
    * event times against each other — that pair is what lets Spark prove
    * a buffered row can never match again and evict it, so join state is
    * bounded by `within + lateness` of stream history instead of growing
    * forever (the 100 TB/day property; an unbounded stream-stream join
    * is refused by Spark in append mode for exactly this reason).
    *
    * Inner-join matches emit as soon as both rows have arrived (no
    * watermark wait on the output path); rows later than `lateness` may
    * silently lose matches — the documented watermark contract, same as
    * [[windowedCounts]]. Column names must be disjoint across the two
    * sides (rename before calling), leaving the output unambiguous.
    *
    * `joinType = "left_outer"` (or right/full) adds the abandoned-funnel
    * half: a left row that found NO match emits with null right columns
    * once the watermark proves no match can still arrive (i.e.
    * `lateness + within` after its event time) — so unmatched results
    * trail matched ones by the horizon, and rows near the end of a
    * drained stream may still be waiting. Spark requires exactly the
    * watermark + event-time bound this function always builds.
    */
  def streamJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 leftTs: String, rightTs: String,
                 within: String = "1 hour",
                 lateness: String = "10 minutes",
                 joinType: String = "inner"): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"streamJoin: rename overlapping columns first: ${overlap.mkString(", ")}")
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"),
      joinType)
  }

  /** Run the windowed aggregation over a file-source stream into an
    * in-memory sink table (for tests / interactive inspection).
    */
  def runWindowedToMemory(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      queryName: String,
      checkpointDir: String): StreamingQuery = {
    val src = spark.readStream.schema(schema).json(sourceDir)
    windowedCounts(src, "ts")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      // `complete` so windows still open at end-of-stream are visible; a
      // production sink would use `append` and let the watermark close them.
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
