package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "image", "PNGDATA-aaaaaaaaaaaaaaaa".getBytes("UTF-8"), "png"),
    (2L, "audio", "WAVDATA-bbbbbbbb".getBytes("UTF-8"), "wav"),
    (3L, "video", ("MP4" * 40).getBytes("UTF-8"), "mp4")
  ).toDF("media_id", "kind", "media", "declared_format")

  test("toMediaTable builds the canonical schema with typed metadata") {
    val t = Multimodal.toMediaTable(media)
    assert(t.schema("media").dataType.typeName == "binary")
    val r = t.filter($"media_id" === 1).select("meta.byte_len", "meta.content_md5").head()
    assert(r.getLong(0) == 24L)
    assert(r.getString(1).length == 32)
  }

  test("decodeStub is deterministic and partition-parallel") {
    val ds = media.select("media_id", "kind", "media", "declared_format")
      .as[Multimodal.MediaRow]
    val d1 = Multimodal.decodeStub(ds).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeStub(ds.repartition(3)).collect().sortBy(_.media_id)
    assert(d1.map(_.content_md5).sameElements(d2.map(_.content_md5)))
    assert(d1.forall(_.features.length == 8))
    assert(d1.forall(r => r.width >= 16 && r.width < 80))
    // repartitioning must not change any decoded value (no partition leakage)
    assert(d1.zip(d2).forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("sampleFrames slices blobs with correct offsets and stride") {
    val frames = Multimodal.sampleFrames(media.filter($"media_id" === 3),
      frameBytes = 16, everyNth = 2).collect()
    // 120 bytes / 16 = 8 frames, every 2nd → indices 0,2,4,6
    assert(frames.map(_.getAs[Int]("frame_idx")).sorted.sameElements(Array(0, 2, 4, 6)))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length == 16))
  }
}
