package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Per-batch normalization — the Spark-first restatement of the reference's
  * cleaning pass (reference src/services/transform.py:21-43):
  *
  *  - primary-key column cast to string (transform.py:26-27),
  *  - nested struct/array columns rendered as canonical JSON strings with
  *    ISO-8601 timestamps (MongoJSONEncoder parity, transform.py:8-18,33-36),
  *  - everything else passed through typed,
  *  - lineage columns `_source` / `_synced_at` (reference
  *    src/services/etl.py:144-145).
  *
  * All pure `Column` projections — no UDFs, fully codegen'd, schema-driven
  * (we inspect the StructType once on the driver; executors run a plain
  * `select`). Unlike the reference's per-cell Python `apply`, this costs one
  * projection regardless of row count.
  */
object Clean {

  val IsoTimestampFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"

  /** JSON-stringify a nested column with ISO timestamps. */
  def jsonify(c: Column): Column =
    to_json(c, Map("timestampFormat" -> IsoTimestampFormat))

  /** Schema-driven normalization projection. Keeps flat typed columns as-is;
    * nested values become JSON strings only here at the warehouse edge, so
    * upstream analytics can still query them natively (SURVEY.md §1.4).
    */
  def normalize(df: DataFrame, idCol: String = "_id"): DataFrame = {
    val cols = df.schema.fields.map { f =>
      (f.name, f.dataType) match {
        // ObjectId stringification parity (reference transform.py:26-27
        // `astype(str)` on pymongo ObjectId → the BARE 24-hex id): an
        // extended-JSON id arrives either as struct<$oid:string> (inferred
        // schema) or as the raw `{"$oid": "..."}` text (registered
        // StringType schema) — both must land as the hex, not JSON.
        case (n, s: StructType) if n == idCol && s.fieldNames.sameElements(Array("$oid")) =>
          col(n).getField("$oid").as(n)
        // Non-ObjectId struct/array ids (and every other nested column)
        // keep canonical-JSON form — only the $oid shape has a bare-hex
        // string parity.
        case (n, _: StructType | _: ArrayType) => jsonify(col(n)).as(n)
        case (n, _) if n == idCol =>
          val s = col(n).cast("string")
          val oid = regexp_extract(s,
            """^\s*\{\s*"\$oid"\s*:\s*"([0-9a-fA-F]{24})"\s*\}\s*$""", 1)
          when(oid =!= "", oid).otherwise(s).as(n)
        case (n, _)                            => col(n)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Lineage columns. `syncedAt` is injected (not `current_timestamp()`) so
    * runs are deterministic and replay-idempotent (SURVEY.md §7.4 item 3).
    */
  def withLineage(df: DataFrame, source: String, syncedAt: java.sql.Timestamp): DataFrame =
    df.withColumn("_source", lit(source))
      .withColumn("_synced_at", lit(syncedAt))

  /** Full cleaning pass: normalize + lineage. */
  def apply(df: DataFrame, source: String, syncedAt: java.sql.Timestamp, idCol: String = "_id"): DataFrame =
    withLineage(normalize(df, idCol), source, syncedAt)
}
