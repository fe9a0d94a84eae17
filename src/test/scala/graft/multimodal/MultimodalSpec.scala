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

  test("BMP/WAV codecs round-trip exactly and decode() dispatches real vs stub") {
    // 2×2 image with known pixels: R G / B W → exact channel & quadrant means.
    val rgb = Array[Int](255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    val bmp = MediaCodecs.encodeBmp24(2, 2, rgb)
    val (bw, bh, bf) = MediaCodecs.decodeBmp24(bmp).get
    assert(bw == 2 && bh == 2)
    assert(math.abs(bf(1) - 510f / 4 / 255) < 1e-6, s"mean R: ${bf(1)}") // R: 255,0,0,255
    assert(math.abs(bf(4) - 85f / 255) < 1e-6, s"TL quadrant: ${bf(4)}") // red pixel
    assert(math.abs(bf(7) - 1.0f) < 1e-6, s"BR quadrant: ${bf(7)}") // white pixel

    // Constant-amplitude PCM: every slice RMS is exactly 16384/32768 = 0.5.
    val wav = MediaCodecs.encodeWavPcm16(8000, 1, Array.fill[Short](800)(16384))
    val (ch, sr, af) = MediaCodecs.decodeWavPcm16(wav).get
    assert(ch == 1 && sr == 8000)
    assert(af.forall(v => math.abs(v - 0.5f) < 1e-4), af.toSeq.toString)

    // decode(): real decoders for bmp/wav, deterministic stub for the rest.
    val ds = Seq(
      (1L, "image", bmp, "bmp"),
      (2L, "audio", wav, "wav"),
      (3L, "image", "PNGDATA-aaaaaaaaaaaaaaaa".getBytes("UTF-8"), "png"))
      .toDF("media_id", "kind", "media", "declared_format")
      .as[Multimodal.MediaRow]
    val out = Multimodal.decode(ds).collect().sortBy(_.media_id)
    assert(out(0).width == 2 && out(0).height == 2)
    assert(out(0).features.sameElements(bf))
    assert(out(1).width == 1 && out(1).height == 8000)
    val stub = Multimodal.decodeStub(ds).collect().sortBy(_.media_id)
    assert(out(2).width == stub(2).width && out(2).height == stub(2).height &&
      out(2).features.sameElements(stub(2).features),
      "non-decodable formats must fall back to the stub")
    // Truncated/garbage bytes under a real-format label also fall back, not crash.
    val bad = Seq((4L, "image", bmp.take(20), "bmp"))
      .toDF("media_id", "kind", "media", "declared_format").as[Multimodal.MediaRow]
    assert(Multimodal.decode(bad).collect().head.width >= 16)

    // Crafted headers whose size math overflows Int must yield the stub
    // fallback (None from the codec), never an index crash: a BMP header
    // declaring 65536×65536 on a 60-byte blob, and a WAV 'data' chunk
    // declaring 2^31-1 bytes on a 100-byte blob.
    val evilBmp = bmp.take(54).clone()
    for (i <- 0 until 4) { evilBmp(18 + i) = 0; evilBmp(22 + i) = 0 }
    evilBmp(20) = 1; evilBmp(24) = 1 // width = height = 65536
    assert(MediaCodecs.decodeBmp24(evilBmp ++ Array.fill[Byte](6)(0)).isEmpty)
    val evilWav = wav.take(100).clone()
    for (i <- 0 until 4) evilWav(40 + i) = 0xFF.toByte
    evilWav(43) = 0x7F.toByte // data chunk size = Int.MaxValue
    assert(MediaCodecs.decodeWavPcm16(evilWav).isEmpty)
  }

  test("decode() dispatches gif/tiff/mp3/mp4 to the real parsers, not the stub") {
    def flatImage(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, 0x804020)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val ds = Seq(
      (1L, "image", flatImage("gif", 21, 13), "gif"),
      (2L, "image", flatImage("tiff", 19, 11), "tiff"),
      (3L, "audio", MediaCodecs.encodeMp3(frames = 25, bitrateKbps = 128, sampleRate = 32000), "mp3"),
      (4L, "video", MediaCodecs.encodeMp4(timescale = 1000, duration = 7500, Seq((640, 480))), "mp4"))
      .toDF("media_id", "kind", "media", "declared_format")
      .as[Multimodal.MediaRow]
    val out = Multimodal.decode(ds).collect().sortBy(_.media_id)
    assert(out(0).width == 21 && out(0).height == 13, "gif dims must be real, not md5-derived")
    assert(out(1).width == 19 && out(1).height == 11)
    assert(out(2).width == 2 && out(2).height == 32000, "mp3 → (channels, sampleRate)")
    assert(out(2).features(0) == (25L * 1152.0 / 32000).toFloat, "mp3 duration from frame walk")
    assert(out(3).width == 640 && out(3).height == 480)
    assert(out(3).features(0) == 7.5f, "mp4 duration = mvhd duration/timescale")
  }

  test("sampleFrames slices blobs with correct offsets and stride") {
    val frames = Multimodal.sampleFrames(media.filter($"media_id" === 3),
      frameBytes = 16, everyNth = 2).collect()
    // 120 bytes / 16 = 8 frames, every 2nd → indices 0,2,4,6
    assert(frames.map(_.getAs[Int]("frame_idx")).sorted.sameElements(Array(0, 2, 4, 6)))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length == 16))
  }

  test("aHash: cross-codec identity, sensitivity, and the sub-grid guard (q170)") {
    // One deterministic 16x14 raster through BOTH real codecs must land
    // on the SAME 64-bit hash (identical decoded pixels), a different
    // image lands far away, and images smaller than the 8x8 grid refuse.
    def pixels(seed: Long, w: Int, h: Int): Array[Byte] = {
      val rgb = new Array[Byte](w * h * 3)
      var k = 0
      var i = 0
      while (i < w * h) {
        val base = seed * 3 + i
        rgb(k) = ((base * 3) % 256).toByte
        rgb(k + 1) = ((base * 5) % 256).toByte
        rgb(k + 2) = ((base * 7) % 256).toByte
        k += 3; i += 1
      }
      rgb
    }
    val (w, h) = (16, 14)
    val rgb = pixels(42L, w, h)
    val viaPng = MediaCodecs.decodePngRaster(MediaCodecs.encodePng(w, h, rgb))
      .flatMap { case (pw, ph, bpp, r) => MediaCodecs.aHash64(pw, ph, bpp, r) }
    val viaBmp = MediaCodecs.decodeBmp24Raster(MediaCodecs.encodeBmp24(w, h, rgb))
      .flatMap { case (bw, bh, r) => MediaCodecs.aHash64(bw, bh, 3, r) }
    assert(viaPng.isDefined && viaPng == viaBmp,
      s"same pixels through two codecs must hash identically: $viaPng vs $viaBmp")
    val other = MediaCodecs.aHash64(w, h, 3, pixels(43L, w, h)).get
    assert(java.lang.Long.bitCount(viaPng.get ^ other) > 3,
      "different formula images must not collide inside the dedup radius")
    assert(MediaCodecs.aHash64(7, 14, 3, pixels(1L, 7, 14)).isEmpty,
      "an image narrower than the 8x8 grid must refuse, not emit garbage")
  }

  test("audioHash64: volume invariance, sensitivity, short-clip guard (q171)") {
    def chirp(src: Long, scale: Int): Array[Short] =
      Array.tabulate[Short](160)(i =>
        (((src * 7 + i.toLong * i * (src % 97 + 1) + i * 13) % 8192) * scale).toShort)
    val quiet = MediaCodecs.audioHash64(chirp(42L, 1)).get
    // The SAME recording at double volume through the REAL wav round-trip.
    val loudBytes = MediaCodecs.encodeWavPcm16(8000, 1, chirp(42L, 2))
    val loud = MediaCodecs.decodeWavSamples(loudBytes)
      .flatMap { case (_, _, smp) => MediaCodecs.audioHash64(smp) }.get
    assert(quiet == loud, "uniform volume change must not move the fingerprint")
    val other = MediaCodecs.audioHash64(chirp(43L, 1)).get
    assert(java.lang.Long.bitCount(quiet ^ other) > 3,
      "different chirps must not collide inside the dedup radius")
    assert(MediaCodecs.audioHash64(Array.fill[Short](63)(5)).isEmpty,
      "clips shorter than the 64-slice grid must refuse")
  }
}
