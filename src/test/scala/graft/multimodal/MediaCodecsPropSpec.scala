package graft.multimodal

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure-JVM codecs: encode→decode round-trips must
  * hold for ARBITRARY dimensions/pixel/sample data (no Spark session —
  * the kernels are plain functions), and decode must be total (None,
  * never a throw) on arbitrary garbage bytes. Seeded-random cases so
  * failures reproduce.
  */
class MediaCodecsPropSpec extends AnyFunSuite {

  test("BMP round-trip: dimensions exact, features bounded, any size") {
    // Fresh seeded stream PER TEST: a shared Random would make each
    // test's cases depend on suite execution order/subset, so a failure
    // seen in CI would not reproduce under testOnly -z.
    val rnd = new Random(42)
    (1 to 200).foreach { _ =>
      val w = 1 + rnd.nextInt(17)
      val h = 1 + rnd.nextInt(17)
      val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt().toByte)
      val (dw, dh, feats) = MediaCodecs.decodeBmp24(MediaCodecs.encodeBmp24(w, h, rgb)).get
      assert(dw == w && dh == h)
      assert(feats.length == 8 && feats.forall(f => f >= 0.0f && f <= 1.0f))
      // Overall mean intensity recomputed independently of the decoder.
      val mean = rgb.map(b => (b & 0xFF).toDouble).sum / (w * h * 3) / 255.0
      assert(math.abs(feats(0) - mean) < 1e-5, s"${w}x$h mean ${feats(0)} vs $mean")
    }
  }

  test("WAV round-trip: format fields exact, RMS bounded, any sample count") {
    val rnd = new Random(43)
    (1 to 200).foreach { _ =>
      val rate = 1 + rnd.nextInt(192000)
      val ch = 1 + rnd.nextInt(8)
      val samples = Array.fill[Short](rnd.nextInt(400))(rnd.nextInt().toShort)
      val (dch, drate, feats) =
        MediaCodecs.decodeWavPcm16(MediaCodecs.encodeWavPcm16(rate, ch, samples)).get
      assert(dch == ch && drate == rate)
      // RMS of int16 normalized by 32768: |Short.MinValue| hits 1.0 exactly.
      assert(feats.forall(f => f >= 0.0f && f <= 1.0f), feats.toSeq.toString)
    }
  }

  test("decoders are total on arbitrary bytes: None or Some, never a throw") {
    val rnd = new Random(44)
    val pngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    (1 to 500).foreach { _ =>
      val junk = Array.fill[Byte](rnd.nextInt(300))(rnd.nextInt().toByte)
      MediaCodecs.decodeBmp24(junk)
      MediaCodecs.decodeWavPcm16(junk)
      MediaCodecs.decodePng(junk)
      // Valid magic bytes with garbage headers — the adversarial corner.
      MediaCodecs.decodeBmp24("BM".getBytes("US-ASCII") ++ junk)
      MediaCodecs.decodeWavPcm16("RIFF0000WAVE".getBytes("US-ASCII") ++ junk)
      MediaCodecs.decodePng(pngSig ++ junk)
    }
  }

  test("PNG round-trip decodes to EXACTLY the BMP features of the same pixels") {
    // The two image decoders share feature semantics; encoding one pixel
    // buffer both ways and decoding must agree bit-for-bit — the
    // cross-codec consistency a downstream feature pipeline relies on.
    val rnd = new Random(45)
    (1 to 100).foreach { _ =>
      val w = 1 + rnd.nextInt(17)
      val h = 1 + rnd.nextInt(17)
      val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt().toByte)
      val png = MediaCodecs.decodePng(MediaCodecs.encodePng(w, h, rgb)).get
      val bmp = MediaCodecs.decodeBmp24(MediaCodecs.encodeBmp24(w, h, rgb)).get
      assert(png._1 == w && png._2 == h)
      assert(png._3.toSeq == bmp._3.toSeq, s"${w}x$h PNG/BMP feature divergence")
    }
  }

  test("PNG scanline filters 1-4 reconstruct identically to filter 0") {
    // Hand-roll an encoder that can emit any filter type, per the PNG
    // spec's forward direction; the decoder must invert all of them to
    // the same raster (asserted via the feature vector).
    def putBe32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write((v >> 24) & 0xFF); b.write((v >> 16) & 0xFF)
      b.write((v >> 8) & 0xFF); b.write(v & 0xFF)
    }
    def chunk(out: java.io.ByteArrayOutputStream, ctype: String, data: Array[Byte]): Unit = {
      putBe32(out, data.length)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      putBe32(out, crc.getValue.toInt)
    }
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    def encodeWithFilter(w: Int, h: Int, rgb: Array[Byte], filter: Int): Array[Byte] = {
      val st = w * 3
      val raw = new Array[Byte]((st + 1) * h)
      var y = 0
      while (y < h) {
        raw(y * (st + 1)) = filter.toByte
        var k = 0
        while (k < st) {
          val x = rgb(y * st + k) & 0xFF
          val a = if (k >= 3) rgb(y * st + k - 3) & 0xFF else 0
          val b = if (y > 0) rgb((y - 1) * st + k) & 0xFF else 0
          val c = if (y > 0 && k >= 3) rgb((y - 1) * st + k - 3) & 0xFF else 0
          val v = filter match {
            case 0 => x
            case 1 => x - a
            case 2 => x - b
            case 3 => x - (a + b) / 2
            case 4 => x - paeth(a, b, c)
          }
          raw(y * (st + 1) + 1 + k) = (v & 0xFF).toByte
          k += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      val ihdr = new java.io.ByteArrayOutputStream()
      putBe32(ihdr, w); putBe32(ihdr, h)
      ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
      chunk(out, "IHDR", ihdr.toByteArray)
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val zbuf = new Array[Byte](raw.length + 1024)
      val zOut = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) zOut.write(zbuf, 0, deflater.deflate(zbuf))
      deflater.end()
      chunk(out, "IDAT", zOut.toByteArray)
      chunk(out, "IEND", Array.empty[Byte])
      out.toByteArray
    }
    val rnd = new Random(46)
    (1 to 40).foreach { _ =>
      val w = 2 + rnd.nextInt(12)
      val h = 2 + rnd.nextInt(12)
      val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt().toByte)
      val ref = MediaCodecs.decodePng(encodeWithFilter(w, h, rgb, 0)).get
      (1 to 4).foreach { f =>
        val got = MediaCodecs.decodePng(encodeWithFilter(w, h, rgb, f)).get
        assert(got._3.toSeq == ref._3.toSeq, s"filter $f diverged at ${w}x$h")
      }
    }
  }

  test("JPEG round-trip: dimensions exact, lossy features within tolerance") {
    val rnd = new Random(47)
    (1 to 40).foreach { _ =>
      val w = 8 + rnd.nextInt(40)
      val h = 8 + rnd.nextInt(40)
      // Flat color: DC-only blocks, so the lossy error stays small and
      // the round-trip tolerance is a real assertion, not a tautology.
      val cr = rnd.nextInt(256); val cg = rnd.nextInt(256); val cb = rnd.nextInt(256)
      val rgb = new Array[Byte](w * h * 3)
      var k = 0
      while (k < rgb.length) {
        rgb(k) = cr.toByte; rgb(k + 1) = cg.toByte; rgb(k + 2) = cb.toByte
        k += 3
      }
      val (dw, dh, feats) = MediaCodecs.decodeJpeg(MediaCodecs.encodeJpeg(w, h, rgb)).get
      assert(dw == w && dh == h, s"dimensions must survive lossy compression: ${w}x$h")
      assert(feats.forall(f => f >= 0.0f && f <= 1.0f))
      assert(math.abs(feats(1) - cr / 255.0) < 0.03, s"R ${feats(1)} vs ${cr / 255.0}")
      assert(math.abs(feats(2) - cg / 255.0) < 0.03, s"G ${feats(2)} vs ${cg / 255.0}")
      assert(math.abs(feats(3) - cb / 255.0) < 0.03, s"B ${feats(3)} vs ${cb / 255.0}")
    }
  }

  test("JPEG decode is total: garbage, truncation, and bombs yield None, never a throw") {
    val rnd = new Random(48)
    (1 to 200).foreach { _ =>
      val junk = Array.fill[Byte](rnd.nextInt(300))(rnd.nextInt().toByte)
      MediaCodecs.decodeJpeg(junk)
      // Valid SOI marker with garbage after it — the adversarial corner.
      MediaCodecs.decodeJpeg(Array(0xFF.toByte, 0xD8.toByte) ++ junk)
    }
    // Truncate a real stream at every length: the entropy decoder must
    // fail closed at all of them (or, for near-complete prefixes, decode).
    val ok = MediaCodecs.encodeJpeg(16, 16, new Array[Byte](16 * 16 * 3))
    (0 until ok.length by 7).foreach { n =>
      MediaCodecs.decodeJpeg(ok.take(n)) // must not throw
    }
    assert(MediaCodecs.decodeJpeg(ok).isDefined)
    // Byte-flip corruption across the stream.
    (0 until ok.length by 11).foreach { i =>
      val bad = ok.clone(); bad(i) = (bad(i) ^ 0x5A).toByte
      MediaCodecs.decodeJpeg(bad) // must not throw
    }
  }

  test("PNG zip-bomb headers and truncated streams yield None, never OOM/throw") {
    // 2^15 × 2^15 RGB header claims a 3 GiB raster: must refuse.
    val bomb = {
      val real = MediaCodecs.encodePng(2, 2, new Array[Byte](12))
      // Surgically rewrite IHDR's width/height (offsets 16 and 20).
      val b = real.clone()
      def setBe32(off: Int, v: Int): Unit = {
        b(off) = ((v >> 24) & 0xFF).toByte; b(off + 1) = ((v >> 16) & 0xFF).toByte
        b(off + 2) = ((v >> 8) & 0xFF).toByte; b(off + 3) = (v & 0xFF).toByte
      }
      setBe32(16, 1 << 15); setBe32(20, 1 << 15)
      b
    }
    assert(MediaCodecs.decodePng(bomb).isEmpty)
    // Truncated zlib stream: drop the last 8 bytes of a valid file.
    val ok = MediaCodecs.encodePng(4, 4, new Array[Byte](48))
    assert(MediaCodecs.decodePng(ok.dropRight(20)).isEmpty)
    assert(MediaCodecs.decodePng(ok).isDefined)
  }
}
