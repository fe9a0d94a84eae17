package graft.core

import org.apache.spark.sql.types._

/** Canonical StructTypes for the reference's collections (FIXTURES.md;
  * derived from reference scripts/seed_mock.py:19-69 and
  * tests/test_sync.py:22-26). Field order is the canonical JSON
  * serialization order (SURVEY.md §7.4 item 4). All fields nullable — the
  * reference's documents are schemaless; a fixed schema with nullable
  * fields is the engine's deliberate improvement over per-batch inference
  * (SURVEY.md §1.3).
  */
object Schemas {

  val ticket: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("date", TimestampType),
    StructField("calledAt", TimestampType),
    StructField("servedDate", TimestampType),
    StructField("companyId", StringType),
    StructField("companyName", StringType),
    StructField("serviceName", StringType),
    StructField("roomId", StringType),
    StructField("staffId", StringType),
    StructField("ticketNumber", StringType),
    StructField("sequentialNumber", LongType),
    StructField("served", BooleanType),
    StructField("updated_at", TimestampType)))

  val users: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("username", StringType),
    StructField("email", StringType),
    StructField("phone", StringType),
    StructField("password", StringType),
    StructField("role", StringType),
    StructField("assignedRooms", ArrayType(StringType)),
    StructField("updated_at", TimestampType)))

  val rating: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("ticketId", StringType),
    StructField("ticketNumber", StringType),
    StructField("roomId", StringType),
    StructField("roomName", StringType),
    StructField("companyId", StringType),
    StructField("companyName", StringType),
    StructField("userId", StringType),
    StructField("userName", StringType),
    StructField("stars", LongType),
    StructField("updated_at", TimestampType)))

  val displayTicket: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("ticketId", StringType),
    StructField("companyName", StringType),
    StructField("roomId", StringType),
    StructField("roomName", StringType),
    StructField("ticketNumber", StringType),
    StructField("ticketCreatedAt", TimestampType),
    StructField("updated_at", TimestampType)))

  /** Collection-name → schema registry used by the sync CLI; collections
    * not listed fall back to schema inference + watermark coercion.
    */
  val byCollection: Map[String, StructType] = Map(
    "ticket" -> ticket,
    "tickets" -> ticket,
    "users" -> users,
    "user" -> users,
    "rating" -> rating,
    "ratings" -> rating,
    "display_ticket" -> displayTicket)
}
