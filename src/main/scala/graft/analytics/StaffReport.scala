package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.durationMmSs

/** Per-staff throughput + service-time report — reproduces the reference's
  * production analytics artifact field-for-field (reference
  * staff_reports.json:2-16; SURVEY.md §2.D A1-A7):
  *
  *  - `roomUserName`        staff username (ticket.staffId ⋈ user._id)
  *  - `companyNames`        sorted distinct company names served
  *  - `companyPicture`/`staffPicture`  any-value scalars (null if the
  *                          fixture lacks the column)
  *  - `totalTickets`        count per staff
  *  - `avg/min/maxTicketsPerDay`  two-level per-day stats, integer-rounded
  *                          average (the reference emits `10`, not `10.0`)
  *  - `avg/min/maxTimeToServe`   `"<M>m <S>s"` with uncapped minutes, over
  *                          served tickets only, from servedDate − calledAt
  *
  * Scale: tickets is the fact table; users is a dimension and is broadcast.
  * Both aggregation levels are hash aggregates with map-side partials; the
  * only shuffles are the two groupBys on staffId.
  */
object StaffReport {

  private def colOrNull(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) col(name) else lit(null).cast("string")

  /** Tolerate schema-inferred sources: ISO-string time columns are coerced
    * to TimestampType (the reference's datetime normalization, capability
    * #3) so duration arithmetic is well-typed regardless of how the
    * warehouse table was loaded.
    */
  private def coerceTimestamps(df: DataFrame, names: Seq[String]): DataFrame =
    names.foldLeft(df) { (d, n) =>
      if (d.columns.contains(n) &&
        d.schema(n).dataType == org.apache.spark.sql.types.StringType)
        d.withColumn(n, expr(s"try_to_timestamp(`$n`)"))
      else d
    }

  def build(tickets0: DataFrame, users: DataFrame): DataFrame = {
    val tickets = coerceTimestamps(tickets0, Seq("date", "calledAt", "servedDate"))
    val t = tickets.alias("t")
    val u = users.alias("u")

    val perDay = t
      .groupBy(col("t.staffId"), to_date(col("t.date")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("staffId").as("d_staffId"))
      .agg(
        round(avg("cnt")).cast("long").as("avgTicketsPerDay"),
        min("cnt").as("minTicketsPerDay"),
        max("cnt").as("maxTicketsPerDay"))

    val serve = t
      .filter(col("t.served") === true)
      .withColumn("serveSec",
        unix_timestamp(col("t.servedDate")) - unix_timestamp(col("t.calledAt")))
      .groupBy(col("t.staffId").as("s_staffId"))
      .agg(
        floor(avg("serveSec")).cast("long").as("avgServeSec"),
        min("serveSec").as("minServeSec"),
        max("serveSec").as("maxServeSec"))

    val totals = t
      .groupBy(col("t.staffId").as("staffId"))
      .agg(
        count(lit(1)).as("totalTickets"),
        array_sort(collect_set(colOrNull(t, "companyName"))).as("companyNames"),
        first(colOrNull(t, "companyPicture"), ignoreNulls = true).as("companyPicture"))

    val staffPicture =
      if (users.columns.contains("picture")) col("u.picture")
      else lit(null).cast("string")

    totals
      .join(perDay, col("staffId") === col("d_staffId")).drop("d_staffId")
      .join(serve, col("staffId") === col("s_staffId"), "left").drop("s_staffId")
      .join(broadcast(u), col("staffId") === col("u._id"))
      .select(
        col("u.username").as("roomUserName"),
        col("companyNames"),
        col("companyPicture"),
        staffPicture.as("staffPicture"),
        col("totalTickets"),
        col("avgTicketsPerDay"), col("minTicketsPerDay"), col("maxTicketsPerDay"),
        durationMmSs(col("avgServeSec")).as("avgTimeToServe"),
        durationMmSs(col("minServeSec")).as("minTimeToServe"),
        durationMmSs(col("maxServeSec")).as("maxTimeToServe"))
  }
}
