package graft.transform

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class CleanSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("_id", LongType),
    StructField("name", StringType),
    StructField("meta", StructType(Seq(StructField("foo", StringType)))),
    StructField("tags", ArrayType(StringType)),
    StructField("updated_at", TimestampType)))

  private val ts = Timestamp.valueOf("2024-03-01 10:00:00")

  private def df = spark.createDataFrame(
    java.util.List.of(
      Row(1L, "Alice", Row("bar"), Seq("a", "b"), ts),
      Row(2L, "Bob", null, null, ts)),
    schema)

  test("normalize stringifies the id column") {
    val out = Clean.normalize(df)
    assert(out.schema("_id").dataType == StringType)
    assert(out.select("_id").collect().map(_.getString(0)).toSet == Set("1", "2"))
  }

  test("ObjectId ids land as the bare 24-hex, in both arrival shapes") {
    // Reference parity (transform.py:26-27): str(ObjectId) is the hex,
    // never '{"$oid": ...}'. Inferred extended JSON arrives as a struct;
    // a registered StringType schema arrives as the raw JSON text.
    val hex = "655f1a2b3c4d5e6f70718283"
    val structShape = spark.createDataFrame(
      java.util.List.of(Row(Row(hex), "x")),
      StructType(Seq(
        StructField("_id", StructType(Seq(StructField("$oid", StringType)))),
        StructField("name", StringType))))
    assert(Clean.normalize(structShape).select("_id").head().getString(0) == hex)
    val stringShape = spark.createDataFrame(
      java.util.List.of(
        Row(s"""{"$$oid": "$hex"}""", "x"),
        Row("plain-id", "y")),
      StructType(Seq(
        StructField("_id", StringType), StructField("name", StringType))))
    val got = Clean.normalize(stringShape).select("_id").collect().map(_.getString(0)).toSet
    assert(got == Set(hex, "plain-id"), got.toString)
  }

  test("normalize renders nested struct/array as JSON strings, nulls preserved") {
    val out = Clean.normalize(df).orderBy("_id").collect()
    assert(out(0).getAs[String]("meta") == """{"foo":"bar"}""")
    assert(out(0).getAs[String]("tags") == """["a","b"]""")
    assert(out(1).getAs[String]("meta") == null)
    assert(out(1).getAs[String]("tags") == null)
  }

  test("normalize leaves flat typed columns untouched") {
    val out = Clean.normalize(df)
    assert(out.schema("updated_at").dataType == TimestampType)
    assert(out.schema("name").dataType == StringType)
  }

  test("withLineage adds deterministic _source and _synced_at") {
    val syncedAt = Timestamp.valueOf("2024-03-02 00:00:00")
    val out = Clean(df, "src_a", syncedAt)
    val r = out.select("_source", "_synced_at").distinct().collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "src_a")
    assert(r(0).getTimestamp(1) == syncedAt)
  }

  test("timestamps inside nested structs render ISO-8601") {
    val s = StructType(Seq(
      StructField("_id", StringType),
      StructField("inner", StructType(Seq(StructField("at", TimestampType))))))
    val d = spark.createDataFrame(
      java.util.List.of(Row("x", Row(Timestamp.valueOf("2024-03-01 10:00:00")))), s)
    val json = Clean.normalize(d).select("inner").head().getString(0)
    assert(json.contains("2024-03-01T10:00:00"))
  }
}
