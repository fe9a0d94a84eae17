package graft.warehouse

import java.sql.Timestamp

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import graft.SparkSpec

/** Regressions for the round-1 code-review findings. */
class MergeWriterRegressionSpec extends SparkSpec {
  import spark.implicits._

  private val t1 = Timestamp.valueOf("2024-01-01 00:00:00")

  test("merge uses the table's stored bucket count, not the caller's") {
    val path = tmpDir("mwr") + "/tbl"
    val b1 = Seq(("1", "a", t1), ("2", "b", t1)).toDF("_id", "payload", "_synced_at")
    MergeWriter.merge(spark, path, b1, numBuckets = 8)
    // A later merge with a mismatched modulus must not duplicate keys.
    val b2 = Seq(("1", "a2", t1), ("3", "c", t1)).toDF("_id", "payload", "_synced_at")
    MergeWriter.merge(spark, path, b2, numBuckets = 64)
    val rows = MergeWriter.read(spark, path).collect()
    assert(rows.length == 3, rows.map(_.mkString(",")).mkString("; "))
    assert(rows.count(_.getAs[String]("_id") == "1") == 1)
  }

  test("concurrent merges into the same table serialize and lose nothing") {
    val path = tmpDir("mwr") + "/tbl"
    MergeWriter.merge(spark, path,
      Seq(("seed", "s", t1)).toDF("_id", "payload", "_synced_at"))
    val futures = (0 until 4).map { i =>
      Future {
        val batch = (0 until 10)
          .map(j => (s"k$i-$j", s"v$i", t1)).toDF("_id", "payload", "_synced_at")
        MergeWriter.merge(spark, path, batch)
      }
    }
    Await.result(Future.sequence(futures), 5.minutes)
    assert(MergeWriter.read(spark, path).count() == 41) // seed + 4×10, none lost
  }

  test("fresh warehouse recentRuns returns an empty typed log, not an error") {
    val history = new graft.meta.History(spark, tmpDir("mwr-meta"))
    val out = history.recentRuns(10)
    assert(out.columns.contains("started_at"))
    assert(out.count() == 0)
  }

  test("empty blobs yield zero frames") {
    val media = Seq((1L, "video", Array.empty[Byte], "mp4"))
      .toDF("media_id", "kind", "media", "declared_format")
    assert(graft.multimodal.Multimodal.sampleFrames(media, 16, 1).count() == 0)
  }

  test("SQL duration_mmss matches the Column API on fractional seconds") {
    graft.GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT duration_mmss(90.5D) AS d").head().getString(0)
    val viaCol = Seq(90.5).toDF("s")
      .select(graft.functions.durationMmSs(org.apache.spark.sql.functions.col("s")))
      .head().getString(0)
    assert(viaSql == viaCol, s"sql=$viaSql col=$viaCol")
  }
}
