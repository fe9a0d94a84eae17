package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The streaming windowed aggregation must produce exactly the batch
  * answer when fed the same data — Structured Streaming's unified-model
  * guarantee, asserted against the real testdata events table.
  */
class StreamBatchEquivalenceSpec extends SparkSpec {

  test("streaming hourly windows over events == batch q10 result") {
    val dir = "/root/testdata/sf0.001"

    val batch = graft.analytics.Relational.hourlyEventWindows(spark, dir)
      .collect().map(_.toSeq).toSet

    // Stream the same parquet file. Spark ≥4.1 reads the ns timestamps as
    // micros-truncated TIMESTAMP_NTZ (exactly core.Tables.events' value);
    // cast to the session-UTC timestamp at the edge.
    val rawSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // File-stream sources require a directory — symlink the single table
    // file into one.
    val srcDir = tmpDir("sbe-src")
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(srcDir, "events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val src = spark.readStream.schema(rawSchema)
      .parquet(srcDir)
      .withColumn("ts", col("ts").cast("timestamp"))

    val q = src
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("sbe-ckpt"))
      .outputMode("complete")
      .format("memory")
      .queryName("sbe_out")
      .start()
    q.awaitTermination()

    val streamed = spark.sql("SELECT * FROM sbe_out").collect().map(_.toSeq).toSet
    assert(streamed == batch, s"stream/batch mismatch: ${streamed.size} vs ${batch.size} rows")
  }
}
