package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.FrequentItems

/** The Misra–Gries aggregator as a STREAMING windowed aggregate: typed
  * Aggregator buffers ride Structured Streaming's aggregation state
  * (native catalyst map encoder — the same reason the batch form needs
  * no Kryo), so bounded-memory frequent-items summaries maintain
  * per-window across micro-batches and must equal the batch sketch of
  * the same data once the watermark closes the window.
  */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("windowed MG sketches stream == batch once windows close") {
    val dir = tmpDir("mg-stream-src")
    val ckpt = tmpDir("mg-stream-ckpt")
    val scratch = tmpDir("mg-stream-scratch")
    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = Paths.get(scratch, name)
      Files.write(tmp, lines.mkString("\n").getBytes)
      Files.move(tmp, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE)
    }
    def ev(ts: String, item: String) = s"""{"ts": "$ts", "item": "$item"}"""

    // Window 1 (10:00): a-heavy; window 2 (11:00): b-heavy.
    writeBatch("b1.ndjson",
      Seq.fill(6)(ev("2024-01-01T10:01:00.000Z", "a")) ++
        Seq(ev("2024-01-01T10:02:00.000Z", "b"), ev("2024-01-01T10:03:00.000Z", "c")))
    val schema = "ts TIMESTAMP, item STRING"
    val src = spark.readStream.schema(schema).json(dir)
      .withWatermark("ts", "0 seconds")
    val counts = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy(window(col("ts"), "1 hour"))
        .agg(FrequentItems.misraGries(df, col("item"), capacity = 4).as("mg"))
        .select(col("window.start").cast("long").as("w"), col("mg"))
    val q = counts(src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory")
      .queryName("mg_out")
      .start()
    q.processAllAvailable()
    // Second batch: fills window 2 AND advances the watermark past
    // window 1, closing it for append emission.
    writeBatch("b2.ndjson",
      Seq.fill(5)(ev("2024-01-01T11:05:00.000Z", "b")) :+
        ev("2024-01-01T12:30:00.000Z", "z"))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql("SELECT * FROM mg_out")
      .collect().map(r => r.getLong(0) -> r.getAs[Map[String, Long]]("mg")).toMap
    // Window 1 closed: its sketch holds exact counts (4 distinct ≤ capacity).
    val w1 = java.time.Instant.parse("2024-01-01T10:00:00Z").getEpochSecond
    assert(streamed.contains(w1), s"window 1 must have closed, saw ${streamed.keySet}")
    assert(streamed(w1) == Map("a" -> 6L, "b" -> 1L, "c" -> 1L))

    // Batch over the same file data produces the identical window-1 sketch.
    val batchDf = spark.read.schema(schema).json(dir)
    val batch = counts(batchDf)
      .collect().map(r => r.getLong(0) -> r.getAs[Map[String, Long]]("mg")).toMap
    assert(batch(w1) == streamed(w1), "stream and batch sketches must agree")
  }

  test("windowed count-min sketches stream == batch once windows close") {
    import graft.functions.CountMin
    val dir = tmpDir("cms-stream-src")
    val ckpt = tmpDir("cms-stream-ckpt")
    val scratch = tmpDir("cms-stream-scratch")
    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = Paths.get(scratch, name)
      Files.write(tmp, lines.mkString("\n").getBytes)
      Files.move(tmp, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE)
    }
    def ev(ts: String, item: String) = s"""{"ts": "$ts", "item": "$item"}"""
    writeBatch("b1.ndjson",
      Seq.fill(4)(ev("2024-01-01T10:01:00.000Z", "x")) ++
        Seq.fill(2)(ev("2024-01-01T10:02:00.000Z", "y")))
    val schema = "ts TIMESTAMP, item STRING"
    val width = 32
    val src = spark.readStream.schema(schema).json(dir)
      .withWatermark("ts", "0 seconds")
    val sketch = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy(window(col("ts"), "1 hour"))
        .agg(CountMin.sketch(df, col("item"), lit(1L), width).as("cms"))
        .select(col("window.start").cast("long").as("w"), col("cms"))
    val q = sketch(src).writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append").format("memory").queryName("cms_out").start()
    q.processAllAvailable()
    writeBatch("b2.ndjson", Seq(ev("2024-01-01T12:30:00.000Z", "z")))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql("SELECT * FROM cms_out").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("cms").toSeq).toMap
    val w1 = java.time.Instant.parse("2024-01-01T10:00:00Z").getEpochSecond
    assert(streamed.contains(w1), s"window 1 must have closed, saw ${streamed.keySet}")
    // The closed window's sketch answers point queries exactly here
    // (2 items, width 32 — collision-free with these hashes or not, the
    // one-sided bound still must hold).
    val cells = streamed(w1).toArray
    assert(CountMin.estimate(cells, "x", width) >= 4L)
    assert(CountMin.estimate(cells, "y", width) >= 2L)
    // And the streaming fold equals the batch sketch of the same files.
    val batch = sketch(spark.read.schema(schema).json(dir)).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("cms").toSeq).toMap
    assert(batch(w1) == streamed(w1), "stream and batch CMS must agree")
  }
}
