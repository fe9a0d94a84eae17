package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.QuantileSketch

/** The GK quantile aggregator as a STREAMING windowed aggregate: the
  * java-serialized QuantileSummaries buffer rides Structured Streaming's
  * aggregation state across micro-batches, so per-window percentile
  * sketches maintain incrementally and, once the watermark closes a
  * window, answer the same quantiles as the batch sketch of that
  * window's data — the streaming half of [[graft.warehouse.QuantileState]]'s
  * batch-over-batch story.
  */
class StreamingQuantileSpec extends SparkSpec {

  test("windowed quantile sketches stream == batch once windows close") {
    val dir = tmpDir("q-stream-src")
    val ckpt = tmpDir("q-stream-ckpt")
    val scratch = tmpDir("q-stream-scratch")
    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = Paths.get(scratch, name)
      Files.write(tmp, lines.mkString("\n").getBytes)
      Files.move(tmp, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE)
    }
    def ev(ts: String, v: Double) = s"""{"ts": "$ts", "v": $v}"""

    // Window 1 (10:00) gets values 1..60 split across TWO micro-batches —
    // the state really carries a partial sketch across the boundary.
    writeBatch("b1.ndjson",
      (1 to 30).map(i => ev("2024-01-01T10:01:00.000Z", i.toDouble)))
    val schema = "ts TIMESTAMP, v DOUBLE"
    val src = spark.readStream.schema(schema).json(dir)
      .withWatermark("ts", "0 seconds")
    val sketched = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy(window(col("ts"), "1 hour"))
        .agg(QuantileSketch.sketchAgg(df, col("v"), relativeError = 0.01).as("qs"))
        .select(col("window.start").cast("long").as("w"),
          QuantileSketch.queryValues(col("qs"), Seq(0.5, 0.9)).as("quantiles"))
    val q = sketched(src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory")
      .queryName("q_out")
      .start()
    q.processAllAvailable()
    writeBatch("b2.ndjson",
      (31 to 60).map(i => ev("2024-01-01T10:02:00.000Z", i.toDouble)))
    q.processAllAvailable()
    // Third batch advances the watermark past window 1, closing it.
    writeBatch("b3.ndjson", Seq(ev("2024-01-01T12:30:00.000Z", 0.0)))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql("SELECT * FROM q_out")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val w1 = java.time.Instant.parse("2024-01-01T10:00:00Z").getEpochSecond
    assert(streamed.contains(w1), s"window 1 must have closed, saw ${streamed.keySet}")
    // 60 values 1..60 at ε=0.01: rank error < 1 position → exact values.
    val Seq(p50, p90) = streamed(w1)
    assert(math.abs(p50 - 30) <= 1, s"p50 was $p50")
    assert(math.abs(p90 - 54) <= 1, s"p90 was $p90")

    // Batch over the same files answers identically for window 1.
    val batch = sketched(spark.read.schema(schema).json(dir))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(batch(w1) == streamed(w1), "stream and batch quantiles must agree")
  }
}
