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
    (1 to 500).foreach { _ =>
      val junk = Array.fill[Byte](rnd.nextInt(300))(rnd.nextInt().toByte)
      MediaCodecs.decodeBmp24(junk)
      MediaCodecs.decodeWavPcm16(junk)
      // Valid magic bytes with garbage headers — the adversarial corner.
      MediaCodecs.decodeBmp24("BM".getBytes("US-ASCII") ++ junk)
      MediaCodecs.decodeWavPcm16("RIFF0000WAVE".getBytes("US-ASCII") ++ junk)
    }
  }
}
