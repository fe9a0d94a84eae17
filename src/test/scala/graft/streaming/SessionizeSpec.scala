package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.Sessionize.{Event, UserSession}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private var nextId = 0L
  private def ev(u: Long, t: String, v: Double) = {
    nextId += 1
    Event(nextId, u, Timestamp.valueOf(t), "click", v)
  }

  test("batch sessionization splits on gaps and aggregates per session") {
    val events = Seq(
      ev(1, "2024-01-01 10:00:00", 1.0),
      ev(1, "2024-01-01 10:10:00", 2.0), // same session (10 min gap)
      ev(1, "2024-01-01 12:00:00", 3.0), // new session (>30 min gap)
      ev(2, "2024-01-01 09:00:00", 5.0)
    ).toDS()
    val sessions = Sessionize.sessionsBatch(events, gapSeconds = 1800)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(sessions.length == 3)
    val s1 = sessions(0)
    assert(s1.user_id == 1 && s1.n_events == 2 && s1.total_value == 3.0)
    assert(s1.session_end == Timestamp.valueOf("2024-01-01 10:10:00"))
    assert(sessions(1).n_events == 1 && sessions(1).total_value == 3.0)
    assert(sessions(2).user_id == 2)
  }

  test("out-of-order events within a batch are sorted before sessionizing") {
    val events = Seq(
      ev(1, "2024-01-01 10:10:00", 2.0),
      ev(1, "2024-01-01 10:00:00", 1.0)
    ).toDS()
    val sessions = Sessionize.sessionsBatch(events, gapSeconds = 1800).collect()
    assert(sessions.length == 1)
    assert(sessions(0).session_start == Timestamp.valueOf("2024-01-01 10:00:00"))
  }

  test("gaps-and-islands batch path matches the keyed-state callback exactly") {
    // Real corpus: every (user, session) from both implementations must
    // agree. total_value rounds like the gated query does — double
    // summation order differs between a sequential fold and a partial
    // aggregate.
    val events = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "ts", "event_type", "value")
      .as[Event]
    def key(s: UserSession) =
      (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events,
        math.round(s.total_value * 100))
    val sql = Sessionize.sessionsBatch(events, gapSeconds = 1800).collect().map(key).sorted
    val state = Sessionize.sessionsBatchState(events, gapSeconds = 1800).collect().map(key).sorted
    assert(sql.length == state.length && sql.sameElements(state),
      s"gaps-and-islands diverged from keyed state: ${sql.length} vs ${state.length} sessions")
  }

  test("batch plan has no per-group buffering (no FlatMapGroupsWithState)") {
    val events = Seq(ev(1, "2024-01-01 10:00:00", 1.0)).toDS()
    val df = Sessionize.sessionsBatch(events, gapSeconds = 1800)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("FlatMapGroupsWithState"),
      "batch sessionization must use the windowed gaps-and-islands plan")
    assert(plan.contains("Window"), s"expected window operators in:\n$plan")
  }

  test("streaming sessionization closes sessions via event-time timeout") {
    val dir = tmpDir("sess-src")
    val ckpt = tmpDir("sess-ckpt")
    val scratch = tmpDir("sess-scratch")
    // Atomic appearance in the watched dir (file-source contract): a
    // direct create-then-write can be listed empty and marked processed.
    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = java.nio.file.Paths.get(scratch, name)
      java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    writeBatch("b1.ndjson", Seq(
      """{"event_id": 1, "user_id": 1, "ts": "2024-01-01T10:00:00.000Z", "event_type": "click", "value": 1.0}""",
      """{"event_id": 2, "user_id": 1, "ts": "2024-01-01T10:10:00.000Z", "event_type": "click", "value": 2.0}"""))

    // One continuous query (the memory sink cannot recover a checkpoint);
    // processAllAvailable() drains each file batch synchronously.
    val schema = org.apache.spark.sql.Encoders.product[Event].schema
    val src = spark.readStream.schema(schema).json(dir)
      .withWatermark("ts", "0 seconds").as[Event]
    val q = Sessionize.sessionsStream(src, gapSeconds = 1800)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory")
      .queryName("sessions_out")
      .start()
    q.processAllAvailable()
    // A much-later event advances the watermark past the first session's
    // timeout → the closed session is emitted in a later micro-batch.
    writeBatch("b2.ndjson", Seq(
      """{"event_id": 3, "user_id": 1, "ts": "2024-01-01T13:00:00.000Z", "event_type": "click", "value": 9.0}"""))
    q.processAllAvailable()
    q.stop()

    val out = spark.sql("SELECT * FROM sessions_out").as[UserSession].collect()
    assert(out.exists(s => s.n_events == 2 && s.total_value == 3.0),
      s"expected first closed session in ${out.toSeq}")
  }
}
