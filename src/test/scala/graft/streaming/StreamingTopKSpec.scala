package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  test("windowed exact top-k: stream equals batch once windows close") {
    val dir = tmpDir("topk-stream-src")
    val ckpt = tmpDir("topk-stream-ckpt")
    val scratch = tmpDir("topk-stream-scratch")
    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = Paths.get(scratch, name)
      Files.write(tmp, lines.mkString("\n").getBytes)
      Files.move(tmp, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE)
    }
    def ev(ts: String, g: String, s: Double, id: Long) =
      s"""{"ts": "$ts", "g": "$g", "s": $s, "id": $id}"""

    // Window 1 (10:00): four scored rows in group x, two in y (k=2 cut
    // must drop the weakest x rows, ties broken by id).
    writeBatch("b1.ndjson", Seq(
      ev("2024-01-01T10:01:00.000Z", "x", 5.0, 1),
      ev("2024-01-01T10:02:00.000Z", "x", 9.0, 2),
      ev("2024-01-01T10:03:00.000Z", "x", 5.0, 3),
      ev("2024-01-01T10:04:00.000Z", "x", 1.0, 4),
      ev("2024-01-01T10:05:00.000Z", "y", 3.0, 5)))
    val schema = "ts TIMESTAMP, g STRING, s DOUBLE, id BIGINT"
    val src = spark.readStream.schema(schema).json(dir)
    val q = StreamingSync.windowedTopK(src, "1 hour", "ts", "g",
        col("s"), col("id"), lit(0L), k = 2, lateness = "0 seconds")
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory")
      .queryName("topk_out")
      .start()
    q.processAllAvailable()
    // Second micro-batch: more window-1-adjacent data would be late; fill
    // window 2 and push the watermark past window 1 to close it.
    writeBatch("b2.ndjson", Seq(
      ev("2024-01-01T11:10:00.000Z", "x", 7.0, 6),
      ev("2024-01-01T11:11:00.000Z", "x", 8.0, 7),
      ev("2024-01-01T12:30:00.000Z", "z", 1.0, 8)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("topk_out")
      .select("w_start", "g", "rank", "score", "key")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getDouble(3), r.getLong(4))).toSet
    // Batch reference over the same rows (windows 1 and 2 closed; the
    // 12:30 'z' row's window is still open and must NOT have emitted).
    val w1 = java.time.Instant.parse("2024-01-01T10:00:00Z").getEpochSecond
    val w2 = java.time.Instant.parse("2024-01-01T11:00:00Z").getEpochSecond
    val expect = Set(
      (w1, "x", 1, 9.0, 2L), (w1, "x", 2, 5.0, 1L),
      (w1, "y", 1, 3.0, 5L),
      (w2, "x", 1, 8.0, 7L), (w2, "x", 2, 7.0, 6L))
    assert(got == expect, s"got $got")
  }
}
