package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization with custom keyed state —
  * `flatMapGroupsWithState` over a `KeyValueGroupedDataset` (the
  * Structured Streaming custom-state surface; beyond-reference operator
  * for event analytics).
  *
  * Semantics: events for a user belong to one session while consecutive
  * gaps stay under `gapSeconds`; a session closes when the gap is
  * exceeded (or, in streaming, when event-time timeout fires). The same
  * callback serves batch (all events at once, emit every closed session +
  * the trailing one) and streaming (state carries the open session across
  * micro-batches).
  *
  * Scale: state is O(1) per active user key (just the open session
  * aggregate), bounded by the watermark-driven timeout — no event buffering.
  */
object Sessionize {

  final case class Event(event_id: Long, user_id: Long, ts: Timestamp,
                         event_type: String, value: Double)
  // start/end in MICROSECONDS since epoch: Timestamp.getTime is ms-truncated
  // and a ms-granular gap comparison can disagree with an external oracle
  // computing at full precision on gaps within 1ms of the threshold.
  final case class OpenSession(start: Long, end: Long, n: Long, total: Double)
  final case class UserSession(user_id: Long, session_start: Timestamp,
                               session_end: Timestamp, n_events: Long, total_value: Double)

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  private def toTimestamp(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
    t
  }

  def sessionFn(gapSeconds: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[UserSession] = {

    def toSession(s: OpenSession): UserSession =
      UserSession(userId, toTimestamp(s.start), toTimestamp(s.end), s.n, s.total)

    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession).iterator
      state.remove()
      return out
    }

    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[UserSession]
    sorted.foreach { e =>
      val t = micros(e.ts)
      open match {
        case Some(s) if t - s.end <= gapSeconds * 1000000L =>
          open = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
        case Some(s) =>
          closed += toSession(s)
          open = Some(OpenSession(t, t, 1, e.value))
        case None =>
          open = Some(OpenSession(t, t, 1, e.value))
      }
    }

    open match {
      case Some(s) =>
        state.update(s)
        if (state.getOption.isDefined) {
          // In streaming, close the session `gapSeconds` past its end in
          // event time; in batch the timeout never fires and the trailing
          // session is emitted below.
          try state.setTimeoutTimestamp(s.end / 1000 + gapSeconds * 1000)
          catch { case _: UnsupportedOperationException => () } // batch mode
        }
      case None => ()
    }
    closed.result().iterator
  }

  /** Batch sessionization via gaps-and-islands — the scale-safe batch
    * path: a `lag` window marks session breaks, a running sum over the
    * same (partition, ordering) assigns session ids, and one aggregate
    * folds each island. Per-row window state only — no per-user event
    * buffering, so a hot key (bot user at 100 TB) streams through the
    * sort instead of materializing in executor memory the way the
    * `flatMapGroupsWithState` batch path does ([[sessionsBatchState]]
    * collects each group into a Seq to sort it).
    *
    * Plan: ONE shuffle (hash by user_id) + one within-partition sort
    * serves both window functions, and the final (user_id, sid) hash
    * aggregate reuses the user_id partitioning (grouping keys are a
    * superset), so no second exchange.
    *
    * Gap comparison is in microseconds of event time, matching
    * [[sessionFn]] exactly; identical output is spec-asserted.
    */
  def sessionsBatch(events: Dataset[Event], gapSeconds: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    events.toDF()
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("brk",
        when(col("ts_us") - lag("ts_us", 1).over(byUser) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("brk").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(
        timestamp_micros(min("ts_us")).as("session_start"),
        timestamp_micros(max("ts_us")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum("value").as("total_value"))
      .drop("sid")
      .as[UserSession]
  }

  /** Batch sessionization through the streaming callback — kept as the
    * semantics oracle for [[sessionsBatch]] and for parity testing with
    * [[sessionsStream]]. Buffers each user's events in executor memory
    * (fine at test scale; use [[sessionsBatch]] for real batch runs).
    */
  def sessionsBatchState(events: Dataset[Event], gapSeconds: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (k: Long, it: Iterator[Event], st: GroupState[OpenSession]) => {
          val closed = sessionFn(gapSeconds)(k, it, st).toSeq
          val trailing = st.getOption.toSeq
            .map(s => UserSession(k, toTimestamp(s.start), toTimestamp(s.end), s.n, s.total))
          (closed ++ trailing).iterator
        })
  }

  /** Streaming sessionization: closed sessions emitted as the event-time
    * watermark passes each session's gap timeout. `events` must carry a
    * watermark on `ts`.
    */
  def sessionsStream(events: Dataset[Event], gapSeconds: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionFn(gapSeconds) _)
  }
}
