package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous SCD Type-2 folding of a change stream — the streaming
  * complement to [[graft.warehouse.Scd2]]: a CDC feed flows in, closed
  * dimension versions flow out the moment the change that closes them
  * arrives, and the open (current) version of every key lives in keyed
  * state. The same callback serves batch (emit closed + trailing
  * current, the [[graft.warehouse.Scd2.buildHistory]] parity form) and
  * streaming (state carries the current version across micro-batches).
  *
  * Scale/state: O(1) per key — only the current (attr, valid_from)
  * pair, never history (closed versions are emitted, not retained). No
  * timeout: a dimension key's current version is live indefinitely by
  * definition (state size is dimension cardinality, the same footprint
  * the batch dimension table has).
  *
  * Ordering: changes are sorted by `ord` within each micro-batch; a
  * change strictly BEFORE the current version's `valid_from` is LATE
  * (delivery reordered across batches) and is dropped rather than
  * allowed to mint a negative-duration version — the same boundary as
  * [[graft.warehouse.Scd2.merge]]'s strict guard (`ord < valid_from`). Feed batches in
  * `ord` order (or bound disorder with a watermark upstream) for a
  * lossless fold; [[graft.warehouse.Scd2.buildHistory]] re-derives
  * affected keys when late data must be honored.
  */
object Scd2Stream {

  final case class Change(key: Long, attr: String, ord: Long)
  final case class CurrentVersion(attr: String, valid_from: Long)
  final case class Version(key: Long, attr: String, valid_from: Long,
                           valid_to: Option[Long], is_current: Int)

  def scd2Fn(key: Long, changes: Iterator[Change],
             state: GroupState[CurrentVersion]): Iterator[Version] = {
    val sorted = changes.toSeq.sortBy(c => (c.ord, c.attr))
    var cur = state.getOption
    val closed = Seq.newBuilder[Version]
    sorted.foreach { c =>
      cur match {
        case Some(s) if s.attr == c.attr => () // same-value run collapses
        // `>=`, matching Scd2.merge's strict guard exactly (only
        // `ord < valid_from` is late): a change at the current version's
        // own ord closes it as a zero-duration version, as the batch
        // merge does.
        case Some(s) if c.ord >= s.valid_from =>
          closed += Version(key, s.attr, s.valid_from, Some(c.ord), 0)
          cur = Some(CurrentVersion(c.attr, c.ord))
        case Some(_) => () // late arrival — dropped (see scaladoc)
        case None => cur = Some(CurrentVersion(c.attr, c.ord))
      }
    }
    cur.foreach(state.update)
    closed.result().iterator
  }

  /** Streaming fold: emits CLOSED versions as changes arrive; current
    * versions live in state until the change that closes them.
    */
  def historyStream(changes: Dataset[Change]): Dataset[Version] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(scd2Fn _)
  }

  /** Batch form through the same callback, trailing current versions
    * appended — kept as the parity oracle against
    * [[graft.warehouse.Scd2.buildHistory]].
    */
  def historyBatchState(changes: Dataset[Change]): Dataset[Version] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (k: Long, it: Iterator[Change], st: GroupState[CurrentVersion]) => {
          val closed = scd2Fn(k, it, st).toSeq
          val cur = st.getOption.toSeq.map(s =>
            Version(k, s.attr, s.valid_from, None, 1))
          (closed ++ cur).iterator
        })
  }
}
