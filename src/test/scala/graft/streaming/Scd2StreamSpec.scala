package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.streaming.Scd2Stream.{Change, Version}

class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  private def asTuple(v: Version) =
    (v.key, v.attr, v.valid_from, v.valid_to, v.is_current)

  test("keyed-state fold equals the window-based buildHistory exactly") {
    val rnd = new scala.util.Random(42)
    val attrs = Vector("bronze", "silver", "gold")
    val log = (1 to 500).map(i => Change(i % 20L, attrs(rnd.nextInt(3)), i.toLong))
    val viaState = Scd2Stream.historyBatchState(log.toDS())
      .collect().map(asTuple).toSet
    val viaWindows = graft.warehouse.Scd2
      .buildHistory(log.toDF("key", "attr", "ord"), "key", "attr", "ord")
      .collect().map { r =>
        (r.getAs[Long]("key"), r.getAs[String]("attr"), r.getAs[Long]("valid_from"),
          Option(r.getAs[java.lang.Long]("valid_to")).map(_.longValue()),
          r.getAs[Int]("is_current"))
      }.toSet
    assert(viaState == viaWindows,
      s"state fold diverged: ${viaState.size} vs ${viaWindows.size} versions")
    assert(viaState.count(_._5 == 1) == 20, "one current version per key")
  }

  test("streaming fold emits closed versions across micro-batches; late changes drop") {
    val dir = tmpDir("scd2-stream-src")
    val ckpt = tmpDir("scd2-stream-ckpt")
    val scratch = tmpDir("scd2-stream-scratch")
    // The file source requires files to APPEAR atomically: write outside
    // the watched dir, then move in — a direct create-then-write can be
    // listed empty and recorded as processed.
    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = Paths.get(scratch, name)
      Files.write(tmp, lines.mkString("\n").getBytes)
      Files.move(tmp, Paths.get(dir, name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    writeBatch("b1.ndjson", Seq(
      """{"key": 1, "attr": "bronze", "ord": 10}""",
      """{"key": 1, "attr": "silver", "ord": 20}""",
      """{"key": 2, "attr": "bronze", "ord": 15}"""))

    val schema = org.apache.spark.sql.Encoders.product[Change].schema
    val src = spark.readStream.schema(schema).json(dir).as[Change]
    val q = Scd2Stream.historyStream(src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory")
      .queryName("scd2_out")
      .start()
    q.processAllAvailable()
    val afterB1 = spark.sql("SELECT * FROM scd2_out").as[Version]
      .collect().map(asTuple).toSet
    assert(afterB1 == Set((1L, "bronze", 10L, Some(20L), 0)),
      s"batch 1 must close exactly key 1's bronze version: $afterB1")

    // Batch 2: closes key 2, carries a same-value no-op for key 1, and a
    // LATE change (ord 5 < key 2's current valid_from 15) that must drop.
    writeBatch("b2.ndjson", Seq(
      """{"key": 2, "attr": "gold", "ord": 30}""",
      """{"key": 1, "attr": "silver", "ord": 40}""",
      """{"key": 2, "attr": "zinc", "ord": 5}"""))
    q.processAllAvailable()
    q.stop()

    val all = spark.sql("SELECT * FROM scd2_out").as[Version].collect().map(asTuple).toSet
    assert(all == Set(
      (1L, "bronze", 10L, Some(20L), 0),
      (2L, "bronze", 15L, Some(30L), 0)),
      s"final closed set wrong: $all")
  }
}
