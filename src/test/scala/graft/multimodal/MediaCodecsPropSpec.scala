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

  test("GIF/TIFF round-trips: dims exact; TIFF lossless matches BMP features; GIF flat-color exact") {
    def encodeVia(fmt: String, w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0; var k = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y,
            ((rgb(k) & 0xFF) << 16) | ((rgb(k + 1) & 0xFF) << 8) | (rgb(k + 2) & 0xFF))
          k += 3; x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK must ship a $fmt writer")
      out.toByteArray
    }
    val rnd = new Random(51)
    (1 to 40).foreach { _ =>
      val w = 1 + rnd.nextInt(17)
      val h = 1 + rnd.nextInt(17)
      // TIFF is lossless: arbitrary pixels must reproduce the BMP
      // features of the same buffer bit-for-bit.
      val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt().toByte)
      val tiff = MediaCodecs.decodeTiff(encodeVia("tiff", w, h, rgb)).get
      val bmp = MediaCodecs.decodeBmp24(MediaCodecs.encodeBmp24(w, h, rgb)).get
      assert(tiff._1 == w && tiff._2 == h)
      assert(tiff._3.toSeq == bmp._3.toSeq, s"${w}x$h TIFF/BMP feature divergence")
      // GIF palettizes at encode; a flat color fits one palette slot so
      // the stored frame is exact.
      val cr = rnd.nextInt(256); val cg = rnd.nextInt(256); val cb = rnd.nextInt(256)
      val flat = new Array[Byte](w * h * 3)
      var k = 0
      while (k < flat.length) {
        flat(k) = cr.toByte; flat(k + 1) = cg.toByte; flat(k + 2) = cb.toByte; k += 3
      }
      val gif = MediaCodecs.decodeGif(encodeVia("gif", w, h, flat)).get
      assert(gif._1 == w && gif._2 == h)
      assert(math.abs(gif._3(1) - cr / 255.0) < 1e-5, s"GIF R ${gif._3(1)} vs ${cr / 255.0}")
      assert(math.abs(gif._3(2) - cg / 255.0) < 1e-5)
      assert(math.abs(gif._3(3) - cb / 255.0) < 1e-5)
    }
    // Magic-byte gates: a GIF blob through the TIFF gate (and vice versa)
    // must refuse even though imageio could sniff both.
    val gifBytes = encodeVia("gif", 4, 4, new Array[Byte](48))
    val tiffBytes = encodeVia("tiff", 4, 4, new Array[Byte](48))
    assert(MediaCodecs.decodeTiff(gifBytes).isEmpty)
    assert(MediaCodecs.decodeGif(tiffBytes).isEmpty)
  }

  test("MP3 frame walk: duration/bitrate/rate/channels exact; ID3 tags handled; VBR flagged") {
    val rnd = new Random(52)
    (1 to 100).foreach { _ =>
      val frames = 1 + rnd.nextInt(60)
      val kbps = Array(32, 64, 96, 128, 160, 192, 256, 320)(rnd.nextInt(8))
      val rate = Array(44100, 48000, 32000)(rnd.nextInt(3))
      val mono = rnd.nextBoolean()
      val bytes = MediaCodecs.encodeMp3(frames, kbps, rate, mono)
      val (ch, r, f) = MediaCodecs.parseMp3Meta(bytes).get
      assert(ch == (if (mono) 1 else 2) && r == rate)
      assert(f(0) == (frames.toLong * 1152.0 / rate).toFloat, s"duration $frames@$rate")
      assert(f(1) == kbps.toFloat && f(2) == frames.toFloat && f(3) == 0.0f)
      // A leading ID3v2 tag (syncsafe size) and trailing ID3v1 block must
      // both be stepped over, not break the walk.
      val id3size = rnd.nextInt(200)
      val id3v2 = Array[Byte]('I', 'D', '3', 4, 0, 0,
        ((id3size >> 21) & 0x7F).toByte, ((id3size >> 14) & 0x7F).toByte,
        ((id3size >> 7) & 0x7F).toByte, (id3size & 0x7F).toByte) ++ new Array[Byte](id3size)
      val id3v1 = "TAG".getBytes("US-ASCII") ++ new Array[Byte](125)
      val tagged = MediaCodecs.parseMp3Meta(id3v2 ++ bytes ++ id3v1).get
      assert(tagged._3(2) == frames.toFloat, "frame count must survive ID3 wrapping")
    }
    // Two CBR runs at different bitrates = a VBR stream: flag set, mean
    // bitrate the frame-weighted mean.
    val vbr = MediaCodecs.parseMp3Meta(
      MediaCodecs.encodeMp3(10, 128, 44100) ++ MediaCodecs.encodeMp3(10, 64, 44100)).get
    assert(vbr._3(3) == 1.0f && vbr._3(1) == 96.0f && vbr._3(2) == 20.0f)
  }

  test("MP3 walk is total: garbage, truncation, mid-stream format change yield None") {
    val rnd = new Random(53)
    (1 to 300).foreach { _ =>
      val junk = Array.fill[Byte](rnd.nextInt(300))(rnd.nextInt().toByte)
      MediaCodecs.parseMp3Meta(junk) // must not throw
      MediaCodecs.parseMp3Meta(Array(0xFF.toByte, 0xFB.toByte) ++ junk)
      MediaCodecs.parseMp3Meta("ID3".getBytes("US-ASCII") ++ junk)
    }
    val ok = MediaCodecs.encodeMp3(8, 128, 44100)
    (0 until ok.length).foreach { n =>
      val r = MediaCodecs.parseMp3Meta(ok.take(n))
      // Any cut that is not a whole number of frames must fail closed.
      assert(r.isEmpty || n % (144 * 128 * 1000 / 44100) == 0, s"cut at $n parsed")
    }
    // A sample-rate change mid-stream is malformation, not VBR.
    assert(MediaCodecs.parseMp3Meta(
      MediaCodecs.encodeMp3(4, 128, 44100) ++ MediaCodecs.encodeMp3(4, 128, 48000)).isEmpty)
  }

  test("MP4 box walk: timescale/duration/dims/tracks exact") {
    val rnd = new Random(54)
    (1 to 100).foreach { _ =>
      val ts = 1 + rnd.nextInt(100000)
      val dur = rnd.nextInt(Int.MaxValue).toLong
      val nTracks = 1 + rnd.nextInt(3)
      val dims = Seq.fill(nTracks)((rnd.nextInt(4000), rnd.nextInt(4000)))
      val (w, h, f) = MediaCodecs.parseMp4Meta(MediaCodecs.encodeMp4(ts, dur, dims)).get
      assert(w == dims.map(_._1).max && h == dims.map(_._2).max)
      assert(f(0) == (dur.toDouble / ts).toFloat)
      assert(f(1) == ts.toFloat && f(2) == nTracks.toFloat)
    }
  }

  test("MP4 walk is total: garbage, truncation, lying box sizes yield None") {
    val rnd = new Random(55)
    (1 to 300).foreach { _ =>
      val junk = Array.fill[Byte](rnd.nextInt(300))(rnd.nextInt().toByte)
      MediaCodecs.parseMp4Meta(junk) // must not throw
      MediaCodecs.parseMp4Meta(Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes("US-ASCII") ++ junk)
    }
    val ok = MediaCodecs.encodeMp4(1000, 5000, Seq((640, 480)))
    (0 until ok.length).foreach(n => MediaCodecs.parseMp4Meta(ok.take(n))) // never throws
    assert(MediaCodecs.parseMp4Meta(ok.dropRight(1)).isEmpty, "truncated tail must fail closed")
    // 64-bit largesize near Long.MaxValue: the bounds check must not be
    // defeated by addition overflow.
    val bomb = ok.clone()
    // Rewrite moov's 32-bit size to 1 (= "64-bit size follows") — the
    // following 8 bytes (mvhd's header) now read as a huge largesize.
    val moovOff = {
      var i = 0; var found = -1
      while (found < 0 && i + 8 <= bomb.length) {
        if (new String(bomb, i + 4, 4, "US-ASCII") == "moov") found = i
        else i += 1
      }
      found
    }
    assert(moovOff >= 0)
    bomb(moovOff) = 0; bomb(moovOff + 1) = 0; bomb(moovOff + 2) = 0; bomb(moovOff + 3) = 1
    assert(MediaCodecs.parseMp4Meta(bomb).isEmpty)
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
