package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** Ratings summaries — SURVEY.md §2.D A7, the `rating` collection surface
  * (reference scripts/seed_mock.py:47-58: one `stars` score linked to a
  * room, staff user, and company). Average stars + rating counts per
  * room / staff / company, with the staff level joined to `users` for the
  * display name, StaffReport-style.
  *
  * Scale: ratings is the fact side; each summary is one hash aggregate
  * with map-side partials (one shuffle on the dimension key); users is a
  * dimension and is broadcast.
  */
object RatingsSummary {

  /** The one stars-stat list every summary level shares (scale = avg
    * rounding: 2 for the library report faces, 4 for the oracle-hashed
    * gated query).
    */
  private def starsStats(scale: Int): Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_ratings"),
    round(avg("stars"), scale).as("avg_stars"),
    min("stars").as("min_stars"),
    max("stars").as("max_stars"))

  /** Shared kernel: stars stats per key column. */
  private def summarize(ratings: DataFrame, keyCol: String, nameCol: String): DataFrame =
    ratings
      .groupBy(col(keyCol), col(nameCol))
      .agg(starsStats(2).head, starsStats(2).tail: _*)

  def byRoom(ratings: DataFrame): DataFrame = summarize(ratings, "roomId", "roomName")

  def byCompany(ratings: DataFrame): DataFrame = summarize(ratings, "companyId", "companyName")

  /** Per-staff summary with the username resolved from `users`
    * (rating.userId ⋈ users._id, broadcast dimension join).
    */
  def perStaff(ratings: DataFrame, users: DataFrame): DataFrame = {
    val aggs = starsStats(2) :+ array_sort(collect_set(col("roomName"))).as("roomNames")
    ratings
      .groupBy(col("userId"))
      .agg(aggs.head, aggs.tail: _*)
      .join(broadcast(users.select(col("_id"), col("username"))),
        col("userId") === col("_id"))
      .select(col("username"), col("n_ratings"), col("avg_stars"),
        col("min_stars"), col("max_stars"), col("roomNames"))
  }

  // ---------------------------------------------------------------- q34
  /** Gated query: the testdata has no rating table, so derive a
    * rating-shaped stream from `events` with a deterministic stars map
    * (clamped ceil of value/20 → 1..5) — the same expression the DuckDB
    * oracle computes — then run the room-level and staff-level summaries
    * as a union. Exercises the A7 aggregate shape end-to-end:
    * avg + count + min/max stars per target at two dimension levels.
    */
  def ratingsSummary(spark: SparkSession, dir: String): DataFrame = {
    val stars = least(lit(5L), greatest(lit(1L), ceil(col("value") / 20.0d)))
    val rated = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), stars.as("stars"))
    def level(name: String, target: org.apache.spark.sql.Column): DataFrame =
      rated.groupBy(target.as("target"))
        .agg(starsStats(4).head, starsStats(4).tail: _*)
        .withColumn("level", lit(name))
    level("room", col("event_type"))
      .unionByName(level("staff", col("user_id").cast("string")))
      .select(col("level"), col("target"), col("n_ratings"),
        col("avg_stars"), col("min_stars"), col("max_stars"))
  }

  private val ratingsSummarySql =
    """WITH rated AS (
      |  SELECT event_type, user_id,
      |    least(5, greatest(1, CAST(ceil(value / 20.0) AS BIGINT))) AS stars
      |  FROM events
      |)
      |SELECT 'room' AS level, event_type AS target,
      |  CAST(count(*) AS BIGINT) AS n_ratings, round(avg(stars), 4) AS avg_stars,
      |  min(stars) AS min_stars, max(stars) AS max_stars
      |FROM rated GROUP BY event_type
      |UNION ALL
      |SELECT 'staff' AS level, CAST(user_id AS VARCHAR) AS target,
      |  CAST(count(*) AS BIGINT) AS n_ratings, round(avg(stars), 4) AS avg_stars,
      |  min(stars) AS min_stars, max(stars) AS max_stars
      |FROM rated GROUP BY user_id""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q34_ratings_summary", ratingsSummary _, Some(ratingsSummarySql)))
}
