package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** Slowly-changing-dimension Type 2: attribute history as validity
  * intervals — every change closes the prior version (`valid_to`) and
  * opens a new one, the current version carrying `valid_to IS NULL`. The
  * SCD1 last-write-wins upsert ([[MergeWriter.merge]], reference
  * analogue src/services/etl.py:60-76's ON CONFLICT upsert) keeps only the latest
  * state; Type 2 is what a warehouse needs the moment anyone asks "what
  * was this attribute when that order shipped?".
  *
  * Two forms, both key-partitioned (one shuffle each at any scale):
  *  - [[buildHistory]]: derive the full history from a change log in one
  *    window pass — run-collapse + lead(). Used for initial loads and as
  *    the spec oracle for the incremental path.
  *  - [[merge]]: fold one batch of updates into an existing dimension —
  *    the nightly-load shape: equi-join on the key, close changed
  *    versions, append new ones. Work ∝ dimension + batch, never history².
  */
object Scd2 {

  /** Full SCD2 history from a change log `(key, attr, ord)`: consecutive
    * equal values collapse into one version (a reported "change" to the
    * same value is no change), `valid_from` is the run's first `ord`,
    * `valid_to` the next run's start (null while current). `ord` must be
    * a total order per key (pass a tiebroken struct if the timestamp
    * alone can tie).
    */
  def buildHistory(log: DataFrame, key: String, attr: String, ord: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord)
    log
      .withColumn("__prev", lag(col(attr), 1).over(w))
      // Run starts: first row per key, or value differs from predecessor.
      .filter(col("__prev").isNull || col("__prev") =!= col(attr))
      .withColumn("valid_from", col(ord))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy(key).orderBy("valid_from")))
      .select(col(key), col(attr),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }

  /** Fold `updates` `(key, attr, ord)` — at most one row per key, e.g. a
    * batch's latest state per key — into an existing SCD2 `dim`. A key
    * whose current version already carries the same attr is untouched
    * (idempotent re-loads); a changed key's current version closes at
    * the update's `ord` and a new open version is appended; an unseen
    * key inserts its first version.
    *
    * PRECONDITION: every update's `ord` must be ≥ the current version's
    * `valid_from` for its key — the incremental fold is forward-only
    * (closing a version before it opened would mint a negative-duration
    * interval). Late-arriving changes need a [[buildHistory]]
    * re-derivation of the affected keys instead. `strict = true` (the
    * default) enforces this — plus the at-most-one-row-per-key contract
    * on `updates` (a duplicate key would fan out the left join and
    * silently duplicate that key's entire history) — with one key-join
    * count and one groupBy-count over the (dimension/batch-sized, not
    * history-replay-sized) inputs, throwing instead of corrupting; pass
    * `strict = false` only when the caller already orders AND dedups its
    * batches.
    */
  def merge(dim: DataFrame, updates: DataFrame, key: String, attr: String,
            ord: String, strict: Boolean = true): DataFrame = {
    val up = updates.select(
      col(key), col(attr).as("__new_attr"), col(ord).as("__new_from"))
    if (strict) {
      val dupKeys = up.groupBy(key).count().filter(col("count") > 1).count()
      require(dupKeys == 0,
        s"Scd2.merge: $dupKeys update key(s) appear more than once in the batch — " +
          "collapse to the latest row per key (e.g. a row_number LWW pass) first")
      val late = dim.filter(col("is_current") === 1)
        .join(up, Seq(key))
        .filter(col("__new_from") < col("valid_from"))
        .count()
      require(late == 0,
        s"Scd2.merge: $late update(s) precede their key's current valid_from — " +
          "late-arriving changes require a buildHistory re-derivation")
    }
    val joined = dim.join(up, Seq(key), "left")
    val closed = joined.select(
      col(key), col(attr),
      col("valid_from"),
      when(col("is_current") === 1 && col("__new_attr").isNotNull &&
        col("__new_attr") =!= col(attr), col("__new_from"))
        .otherwise(col("valid_to")).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
    val openedFromChange = joined
      .filter(col("is_current") === 1 && col("__new_attr").isNotNull &&
        col("__new_attr") =!= col(attr))
      .select(col(key), col("__new_attr").as(attr),
        col("__new_from").as("valid_from"),
        lit(null).cast(joined.schema("valid_to").dataType).as("valid_to"),
        lit(1).as("is_current"))
    val openedFromNew = up.join(dim.select(key).distinct(), Seq(key), "left_anti")
      .select(col(key), col("__new_attr").as(attr),
        col("__new_from").as("valid_from"),
        lit(null).cast(joined.schema("valid_to").dataType).as("valid_to"),
        lit(1).as("is_current"))
    closed.unionByName(openedFromChange).unionByName(openedFromNew)
  }

  // ---------------------------------------------------------------- q63
  /** SCD2 history of each user's event-type "state" derived from the
    * events stream: run-collapsed transitions with validity intervals in
    * epoch seconds (ns parquet floored at the edge, the
    * [[graft.core.Tables.events]] note), ordered per user by
    * (second, event_id) so ordering ties are impossible.
    */
  def userStateHistory(spark: SparkSession, dir: String): DataFrame = {
    val log = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        struct(col("ts").cast("long").as("sec"), col("event_id")).as("__ord"))
    buildHistory(log, "user_id", "event_type", "__ord")
      .select(col("user_id"), col("event_type"),
        col("valid_from.sec").as("valid_from"),
        col("valid_to.sec").as("valid_to"),
        col("is_current"))
  }

  /** Shared q63/q67 oracle CTE chain deriving the user-state run history
    * from events — ONE copy so the two oracles can never drift apart
    * (the plantedTwinCte discipline). Exposes `log(user_id, event_type,
    * sec, event_id)` and `hist(user_id, state, valid_from, valid_to)`.
    */
  private val historyCtes =
    """log AS (
      |  SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS sec, event_id
      |  FROM events
      |), runs AS (
      |  SELECT user_id, event_type, sec, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev
      |  FROM log
      |), starts AS (
      |  SELECT user_id, event_type, sec AS valid_from, event_id
      |  FROM runs WHERE prev IS NULL OR prev <> event_type
      |), hist AS (
      |  SELECT user_id, event_type AS state, valid_from,
      |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
      |  FROM starts
      |)""".stripMargin

  private val userStateHistorySql =
    s"""WITH $historyCtes
       |SELECT user_id, state AS event_type, valid_from, valid_to,
       |  CAST(valid_to IS NULL AS INT) AS is_current
       |FROM hist""".stripMargin

  /** Point-in-time (temporal) join — the consumption side of Type-2
    * history and the reason it exists: each fact row joins the dimension
    * version whose validity interval contained the fact's `ord`. The
    * key equality makes this a plain hash/sort-merge equi-join with the
    * interval test as a residual — no range explosion at any scale —
    * and each fact matches AT MOST one version (intervals per key are
    * disjoint by construction).
    */
  def pointInTimeJoin(facts: DataFrame, dim: DataFrame, key: String,
                      ord: String): DataFrame = {
    val d = dim.withColumnRenamed(key, "__k")
    facts.join(d,
      facts(key) === d("__k") && facts(ord) >= d("valid_from") &&
        (d("valid_to").isNull || facts(ord) < d("valid_to")))
      .drop("__k")
  }

  // ---------------------------------------------------------------- q67
  /** Events temporally joined to the q63 user-state history: every event
    * resolves the state version active at its own timestamp, and the
    * query reports events-per-version — the run length each Type-2
    * interval actually covered. End-to-end SCD2 round trip (derive
    * history → consume it) under one oracle.
    */
  def eventsPointInTime(spark: SparkSession, dir: String): DataFrame = {
    val history = userStateHistory(spark, dir)
      .withColumnRenamed("event_type", "state")
    val facts = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("long").as("sec"))
    pointInTimeJoin(facts, history, "user_id", "sec")
      .groupBy("user_id", "state", "valid_from")
      .agg(count(lit(1)).as("n_events"))
  }

  private val eventsPointInTimeSql =
    s"""WITH $historyCtes
       |SELECT h.user_id, h.state, h.valid_from,
       |  CAST(count(*) AS BIGINT) AS n_events
       |FROM log l JOIN hist h
       |  ON l.user_id = h.user_id AND l.sec >= h.valid_from
       |  AND (h.valid_to IS NULL OR l.sec < h.valid_to)
       |GROUP BY 1, 2, 3""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q63_scd2_history", userStateHistory _, Some(userStateHistorySql)),
    NamedQuery("q67_point_in_time", eventsPointInTime _, Some(eventsPointInTimeSql)))
}
