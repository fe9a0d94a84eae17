package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The watermarked stream-stream join must produce exactly the batch
  * join's answer when fed the same (in-order) events, and its buffered
  * state must actually shrink as the watermark advances — the two
  * properties that make it usable on an unbounded stream.
  */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  // Spark ≥4.1 reads the fixture's ns-precision parquet as a
  // micros-truncated TIMESTAMP_NTZ (a LongType user schema no longer
  // yields raw nanos — it delivers µs, silently double-truncating any
  // `div 1000`). Ask for NTZ explicitly and cast at the edge.
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def views(df: DataFrame): DataFrame =
    df.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))

  private def buys(df: DataFrame): DataFrame =
    df.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("b_id"))

  test("stream-stream view->purchase join == batch join; watermark evicts state") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    // Batch oracle: every (view, purchase) pair per user within 30 min.
    val ev = graft.core.Tables.events(spark, dir)
    val cond = col("v_user") === col("b_user") &&
      col("b_ts") >= col("v_ts") &&
      col("b_ts") <= col("v_ts") + expr("INTERVAL 30 minutes")
    val expected = views(ev).join(buys(ev), cond)
      .select("v_id", "b_id").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture must produce at least one funnel pair")

    // Split the table into three TIME-ORDERED files so maxFilesPerTrigger=1
    // yields three micro-batches and the watermark advances between them
    // (in-order arrival: nothing is late, so parity must be exact).
    val raw = spark.read.schema(rawSchema).parquet(s"$dir/events.parquet")
    val srcDir = tmpDir("ssj-src")
    // Day-10 / day-20 cuts from 2024-01-01 UTC, as NTZ literals.
    val cuts = Seq(Some("2024-01-11 00:00:00"), Some("2024-01-21 00:00:00"), None)
    cuts.zipWithIndex.foreach { case (hi, i) =>
      val lo = if (i == 0) None else cuts(i - 1)
      val stage = tmpDir(s"ssj-stage$i")
      val pred = lo.map(l => col("ts") >= expr(s"to_timestamp_ntz('$l')")).getOrElse(lit(true)) &&
        hi.map(h => col("ts") < expr(s"to_timestamp_ntz('$h')")).getOrElse(lit(true))
      raw.filter(pred)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = Paths.get(srcDir, f"$i%02d.parquet")
      Files.move(part.toPath, dst, StandardCopyOption.ATOMIC_MOVE)
      // File-source ordering is (modificationTime, path): pin it.
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + i * 60000L))
    }

    def src(): DataFrame = spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .withColumn("ts", col("ts").cast("timestamp")) // UTC session: value-identical

    val joined = StreamingSync.streamJoin(
      views(src()), buys(src()),
      leftKey = "v_user", rightKey = "b_user",
      leftTs = "v_ts", rightTs = "b_ts",
      within = "30 minutes", lateness = "10 minutes")

    val q = joined.select("v_id", "b_id")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("ssj-ckpt"))
      .outputMode("append")
      .format("memory")
      .queryName("ssj_out")
      .start()
    q.awaitTermination()

    val got = spark.sql("SELECT * FROM ssj_out").as[(Long, Long)].collect()
    assert(got.toSet == expected,
      s"stream/batch mismatch: ${got.length} streamed vs ${expected.size} batch pairs")
    assert(got.length == expected.size, "append mode must emit each pair exactly once")

    // State boundedness: the symmetric hash join must have EVICTED rows
    // once the watermark passed their match horizon — on an unbounded
    // stream this is the difference between O(within) and O(everything).
    val progress = q.recentProgress
    val removed = progress.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
    assert(removed > 0, "watermark advanced across 3 micro-batches but evicted nothing")
    val finalState = progress.last.stateOperators.map(_.numRowsTotal).sum
    val totalInput = views(ev).count() + buys(ev).count()
    assert(finalState < totalInput,
      s"final state ($finalState rows) must be smaller than total input ($totalInput)")
  }

  test("left-outer stream join emits abandoned funnels, never false ones") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.core.Tables.events(spark, dir)
    val cond = col("v_user") === col("b_user") &&
      col("b_ts") >= col("v_ts") &&
      col("b_ts") <= col("v_ts") + expr("INTERVAL 30 minutes")
    val batchOuter = views(ev).join(buys(ev), cond, "left_outer")
    val batchMatched = batchOuter.filter(col("b_id").isNotNull)
      .select("v_id", "b_id").as[(Long, Long)].collect().toSet
    val batchUnmatched = batchOuter.filter(col("b_id").isNull)
      .select("v_id").as[Long].collect().toSet
    assert(batchUnmatched.nonEmpty, "fixture must contain abandoned funnels")
    // Unmatched views provably closed by a watermark the stream ACTED on
    // must have emitted by stream end. The last file's own watermark only
    // flushes via a trailing no-data batch (timing Spark doesn't
    // guarantee at AvailableNow termination), so the conservative bound
    // is the second-to-last file's horizon: anything older than
    // (day-20 cut) - lateness - within emitted while batch 3 processed.
    // Younger unmatched views may legitimately still be buffered.
    val closedBySec = 1704067200L + 20 * 86400L - (10 + 30 + 1) * 60
    val mustEmit = views(ev)
      .filter(col("v_ts").cast("long") < closedBySec &&
        col("v_id").isin(batchUnmatched.toSeq: _*))
      .select("v_id").as[Long].collect().toSet

    // Reuse the three time-ordered files written by the inner-join test's
    // layout: rebuild them here so this test stands alone.
    val raw = spark.read.schema(rawSchema).parquet(s"$dir/events.parquet")
    val srcDir = tmpDir("ssjo-src")
    val cuts = Seq(Some("2024-01-11 00:00:00"), Some("2024-01-21 00:00:00"), None)
    cuts.zipWithIndex.foreach { case (hi, i) =>
      val lo = if (i == 0) None else cuts(i - 1)
      val stage = tmpDir(s"ssjo-stage$i")
      val pred = lo.map(l => col("ts") >= expr(s"to_timestamp_ntz('$l')")).getOrElse(lit(true)) &&
        hi.map(h => col("ts") < expr(s"to_timestamp_ntz('$h')")).getOrElse(lit(true))
      raw.filter(pred)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = Paths.get(srcDir, f"$i%02d.parquet")
      Files.move(part.toPath, dst, StandardCopyOption.ATOMIC_MOVE)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    def src(): DataFrame = spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .withColumn("ts", col("ts").cast("timestamp"))

    val q = StreamingSync.streamJoin(
      views(src()), buys(src()),
      leftKey = "v_user", rightKey = "b_user",
      leftTs = "v_ts", rightTs = "b_ts",
      within = "30 minutes", lateness = "10 minutes",
      joinType = "left_outer")
      .select("v_id", "b_id")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("ssjo-ckpt"))
      .outputMode("append")
      .format("memory")
      .queryName("ssjo_out")
      .start()
    q.awaitTermination()

    val rows = spark.sql("SELECT * FROM ssjo_out").collect()
    val gotMatched = rows.filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotUnmatched = rows.filter(_.isNullAt(1)).map(_.getLong(0)).toSet
    assert(gotMatched == batchMatched, "matched pairs must equal the batch inner join")
    assert(gotUnmatched.subsetOf(batchUnmatched),
      s"false abandonments emitted: ${(gotUnmatched -- batchUnmatched).take(5)}")
    assert(mustEmit.subsetOf(gotUnmatched),
      s"watermark-closed abandonments missing: ${(mustEmit -- gotUnmatched).take(5)}")
  }

  test("streamJoin refuses ambiguous column names") {
    val df = Seq((1L, 1L)).toDF("k", "ts")
    val e = intercept[IllegalArgumentException] {
      StreamingSync.streamJoin(df, df, "k", "k", "ts", "ts")
    }
    assert(e.getMessage.contains("rename"))
  }
}
