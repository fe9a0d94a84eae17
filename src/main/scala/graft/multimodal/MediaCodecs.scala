package graft.multimodal

/** Pure-JVM codecs — no external libraries, so the decode path is real
  * (not a stub) for every format this JVM can honestly parse:
  *
  *  - BMP, 24-bit uncompressed (BITMAPFILEHEADER + BITMAPINFOHEADER,
  *    bottom-up BGR rows padded to 4 bytes) — the Windows bitmap layout.
  *  - WAV, PCM 16-bit (RIFF/WAVE container, `fmt ` + `data` chunks,
  *    little-endian int16 samples).
  *  - PNG, non-interlaced 8-bit RGB/RGBA — a genuinely COMPRESSED
  *    format: its codec is zlib, which ships in the JDK
  *    (`java.util.zip`), plus the five scanline filters decoded here.
  *  - JPEG, via the JDK's own `javax.imageio` plugin (every JRE ships a
  *    baseline JPEG reader/writer — still zero external dependencies).
  *    The dominant format of real image-text corpora.
  *
  * Codecs that truly need external libraries (mp3/mp4/…) remain behind
  * the documented stub boundary in [[Multimodal.decode]].
  *
  * Encoders exist so specs can round-trip known pixels/samples through
  * the real decoder and assert exact features — and so fixtures are
  * self-contained rather than checked-in binaries.
  */
object MediaCodecs {

  // ------------------------------------------------------------- helpers
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def putLe16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xFF); b.write((v >> 8) & 0xFF)
  }
  private def putLe32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xFF); b.write((v >> 8) & 0xFF)
    b.write((v >> 16) & 0xFF); b.write((v >> 24) & 0xFF)
  }

  // ----------------------------------------------------------------- BMP
  /** 24bpp bottom-up BMP from row-major RGB triples (top-to-bottom). */
  def encodeBmp24(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "need width*height RGB triples")
    val rowPad = (4 - (width * 3) % 4) % 4
    val imageSize = (width * 3 + rowPad) * height
    val out = new java.io.ByteArrayOutputStream(54 + imageSize)
    out.write('B'); out.write('M')
    putLe32(out, 54 + imageSize); putLe32(out, 0); putLe32(out, 54)
    putLe32(out, 40); putLe32(out, width); putLe32(out, height)
    putLe16(out, 1); putLe16(out, 24); putLe32(out, 0); putLe32(out, imageSize)
    putLe32(out, 2835); putLe32(out, 2835); putLe32(out, 0); putLe32(out, 0)
    var y = height - 1 // bottom-up: last image row first
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val i = (y * width + x) * 3
        out.write(rgb(i + 2)); out.write(rgb(i + 1)); out.write(rgb(i)) // BGR
        x += 1
      }
      var p = 0
      while (p < rowPad) { out.write(0); p += 1 }
      y -= 1
    }
    out.toByteArray
  }

  /** Decoded image: (width, height, 8 features ∈ [0,1]): overall mean
    * intensity, mean R/G/B, and per-quadrant (TL/TR/BL/BR) mean intensity
    * — real pixel statistics, orientation-corrected for the bottom-up row
    * order. None if the bytes are not 24bpp uncompressed BMP.
    */
  /** Raw top-down row-major RGB raster of a 24bpp uncompressed BMP —
    * the pixel source for both the feature decoder below and the
    * perceptual hash ([[aHash64]]). Same totality contract: None on any
    * malformation, never a crash.
    */
  def decodeBmp24Raster(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = le32(bytes, 10)
    val width = le32(bytes, 18)
    val height = le32(bytes, 22)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    if (bpp != 24 || compression != 0 || width <= 0 || height <= 0) return None
    // Size math in Long: crafted headers (width·height ≈ 2³²) overflow an
    // Int bound check into "passes", then the pixel loop walks off the
    // array — a corrupt blob must yield None, never an executor crash.
    if (dataOffset < 54) return None
    if (height.toLong > (64L << 20) / (width.toLong * 3 + 1)) return None
    val rowPad = (4 - (width * 3) % 4) % 4
    val need = dataOffset.toLong + (width.toLong * 3 + rowPad) * height.toLong
    if (bytes.length.toLong < need) return None
    val raster = new Array[Byte](width * height * 3)
    var fy = 0
    while (fy < height) {
      val imgY = height - 1 - fy // bottom-up
      val rowOff = dataOffset + fy * (width * 3 + rowPad)
      var x = 0
      while (x < width) {
        val o = (imgY * width + x) * 3
        raster(o) = bytes(rowOff + x * 3 + 2)     // R
        raster(o + 1) = bytes(rowOff + x * 3 + 1) // G
        raster(o + 2) = bytes(rowOff + x * 3)     // B
        x += 1
      }
      fy += 1
    }
    Some((width, height, raster))
  }

  def decodeBmp24(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    val (width, height, raster) = decodeBmp24Raster(bytes) match {
      case Some(t) => t
      case None => return None
    }
    var sumR, sumG, sumB = 0.0
    val quad = new Array[Double](4)
    val quadN = new Array[Long](4)
    var imgY = 0
    while (imgY < height) {
      var x = 0
      while (x < width) {
        val o = (imgY * width + x) * 3
        val r = raster(o) & 0xFF
        val g = raster(o + 1) & 0xFF
        val b = raster(o + 2) & 0xFF
        sumR += r; sumG += g; sumB += b
        val q = (if (imgY >= height / 2) 2 else 0) + (if (x >= width / 2) 1 else 0)
        quad(q) += (r + g + b) / 3.0
        quadN(q) += 1
        x += 1
      }
      imgY += 1
    }
    val n = width.toLong * height
    val feats = Array(
      ((sumR + sumG + sumB) / (3.0 * n) / 255.0).toFloat,
      (sumR / n / 255.0).toFloat, (sumG / n / 255.0).toFloat, (sumB / n / 255.0).toFloat,
      (if (quadN(0) > 0) quad(0) / quadN(0) / 255.0 else 0.0).toFloat,
      (if (quadN(1) > 0) quad(1) / quadN(1) / 255.0 else 0.0).toFloat,
      (if (quadN(2) > 0) quad(2) / quadN(2) / 255.0 else 0.0).toFloat,
      (if (quadN(3) > 0) quad(3) / quadN(3) / 255.0 else 0.0).toFloat)
    Some((width, height, feats))
  }

  // ----------------------------------------------------------------- WAV
  /** RIFF/WAVE, PCM 16-bit little-endian, interleaved channels. */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    out.write("RIFF".getBytes("US-ASCII")); putLe32(out, 36 + dataSize)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); putLe32(out, 16)
    putLe16(out, 1); putLe16(out, channels); putLe32(out, sampleRate)
    putLe32(out, sampleRate * channels * 2); putLe16(out, channels * 2); putLe16(out, 16)
    out.write("data".getBytes("US-ASCII")); putLe32(out, dataSize)
    samples.foreach(s => putLe16(out, s & 0xFFFF))
    out.toByteArray
  }

  /** Decoded audio: (channels, sampleRate, 8 features): RMS amplitude
    * (normalized by 32768) over 8 equal time slices — real signal energy
    * contour. None if the bytes are not PCM-16 RIFF/WAVE.
    */
  /** Raw PCM samples of a 16-bit RIFF/WAVE — (channels, sampleRate,
    * samples); the source for both the feature decoder and the audio
    * fingerprint ([[audioHash64]]). Same totality contract.
    */
  def decodeWavSamples(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
    // Walk chunks: fmt then data may be separated by optional chunks.
    var off = 12
    var channels = 0; var sampleRate = 0; var fmtOk = false
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length && (dataOff < 0 || !fmtOk)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = le32(bytes, off + 4)
      // Long bound: a crafted chunk size near 2³¹ overflows `off+8+size`
      // negative and would pass an Int check, then index past the array.
      if (size < 0 || off.toLong + 8 + size > bytes.length.toLong) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = le16(bytes, off + 8)
          channels = le16(bytes, off + 10)
          sampleRate = le32(bytes, off + 12)
          val bits = le16(bytes, off + 22)
          fmtOk = audioFormat == 1 && bits == 16 && channels > 0
        case "data" =>
          dataOff = off + 8; dataLen = size
        case _ => ()
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0) return None
    val nSamples = dataLen / 2
    val samples = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      samples(i) = le16(bytes, dataOff + i * 2).toShort
      i += 1
    }
    Some((channels, sampleRate, samples))
  }

  def decodeWavPcm16(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    val (channels, sampleRate, samples) = decodeWavSamples(bytes) match {
      case Some(t) => t
      case None => return None
    }
    val nSamples = samples.length
    val feats = new Array[Float](8)
    if (nSamples > 0) {
      var slice = 0
      while (slice < 8) {
        val from = (slice.toLong * nSamples / 8).toInt
        val until = ((slice + 1).toLong * nSamples / 8).toInt
        var sum = 0.0; var i = from
        while (i < until) {
          val s = samples(i).toDouble
          sum += s * s
          i += 1
        }
        feats(slice) =
          if (until > from) (math.sqrt(sum / (until - from)) / 32768.0).toFloat else 0.0f
        slice += 1
      }
    }
    Some((channels, sampleRate, feats))
  }

  /** 64-bit energy-contour fingerprint of a PCM stream — the audio
    * analogue of [[aHash64]]: 64 equal time slices, bit(k) = 1 iff the
    * slice's energy mean beats the global energy mean. VOLUME-INVARIANT
    * by construction (uniform scaling multiplies every energy by the
    * same c², leaving every comparison unchanged) — the same recording
    * at a different loudness lands at hamming 0.
    *
    * Exact integers throughout: energy = Σ s² in Long, slice bounds are
    * the integer partition [k·n div 64, (k+1)·n div 64), and the mean
    * comparison is the cross-multiplication e_k · n > e_total · n_k.
    * Streams shorter than 64 samples yield None (an empty slice).
    * Headroom: e_total·n_k < 2⁶³ holds to ~7.7×10⁵ samples (≈48 s at
    * 16 kHz — n²·s²max/64 bound); fingerprint longer audio per ~30 s
    * window, which is also the right dedup granularity.
    */
  def audioHash64(samples: Array[Short]): Option[Long] = {
    val n = samples.length
    if (n < 64) return None
    val eSlice = new Array[Long](64)
    val nSlice = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < n) {
      val k = ((i.toLong * 64) / n).toInt
      val s = samples(i).toLong
      eSlice(k) += s * s
      nSlice(k) += 1
      total += s * s
      i += 1
    }
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (eSlice(k) * n > total * nSlice(k)) hash |= 1L << (63 - k)
      k += 1
    }
    Some(hash)
  }

  // ----------------------------------------------------------------- PNG
  // A real COMPRESSED codec with zero external dependencies: PNG's
  // compression is zlib, and `java.util.zip.{Inflater, Deflater, CRC32}`
  // ship in the JDK — so non-interlaced 8-bit RGB/RGBA PNG decodes for
  // real, moving the stub boundary down to formats whose codecs
  // genuinely don't exist on this JVM (MP3/MP4).

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Max decoded raster this decoder will materialize (64 MiB) — a
    * crafted 1×2³⁰ header must yield None, not an executor OOM (the
    * zip-bomb guard; same philosophy as the BMP Long-math bound).
    */
  private val MaxRasterBytes = 64L << 20

  /** Non-interlaced 8-bit truecolor PNG (color type 2 = RGB, 6 = RGBA)
    * → (width, height, the same 8 pixel-statistics features as
    * [[decodeBmp24]]). Alpha is ignored. Any malformation — bad
    * signature, wrong IHDR shape, truncated/corrupt zlib stream, wrong
    * raster size, unknown filter type — yields None.
    */
  /** Raw top-down row-major RGB(A) raster of a non-interlaced 8-bit
    * truecolor PNG — (width, height, bytesPerPixel, raster); the pixel
    * source for the feature decoder and the perceptual hash. Totality
    * contract unchanged: None on any malformation.
    */
  def decodePngRaster(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (bytes.length < PngSig.length + 25 + 12) return None
    var i = 0
    while (i < PngSig.length) { if (bytes(i) != PngSig(i)) return None; i += 1 }
    var pos = PngSig.length
    var width, height, bitDepth, colorType, interlace = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && pos + 12 <= bytes.length) {
      val clen = be32(bytes, pos)
      if (clen < 0 || pos + 12L + clen > bytes.length) return None
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      ctype match {
        case "IHDR" =>
          if (clen != 13) return None
          width = be32(bytes, pos + 8)
          height = be32(bytes, pos + 12)
          bitDepth = bytes(pos + 16) & 0xFF
          colorType = bytes(pos + 17) & 0xFF
          interlace = bytes(pos + 20) & 0xFF
        case "IDAT" => idat.write(bytes, pos + 8, clen)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      pos += 12 + clen
    }
    if (!sawEnd || width <= 0 || height <= 0 || bitDepth != 8 || interlace != 0)
      return None
    val bpp = colorType match {
      case 2 => 3
      case 6 => 4
      case _ => return None
    }
    // Division, not multiplication: (stride+1)*height on crafted 2³¹-ish
    // dimensions wraps Long and would sail past the bomb guard into a
    // NegativeArraySizeException. stride+1 ≤ 2³³ can't overflow.
    val stride = width.toLong * bpp
    if (height.toLong > MaxRasterBytes / (stride + 1)) return None
    val rawLen = (stride + 1) * height
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
      if (off != raw.length) return None
      // The stream must END here: an IDAT that inflates past the raster
      // is a wrong-size stream and must be rejected, not truncated.
      val scratch = new Array[Byte](1)
      var guard = 0
      while (!inf.finished() && guard < 4) {
        if (inf.inflate(scratch, 0, 1) > 0) return None
        if (inf.needsInput() || inf.needsDictionary()) return None
        guard += 1
      }
      if (!inf.finished()) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()

    // Unfilter in place into a packed raster (top-down rows).
    val st = stride.toInt
    val raster = new Array[Byte](st * height)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    var y = 0
    while (y < height) {
      val f = raw(y * (st + 1)) & 0xFF
      val base = y * (st + 1) + 1
      var k = 0
      while (k < st) {
        val x = raw(base + k) & 0xFF
        val a = if (k >= bpp) raster(y * st + k - bpp) & 0xFF else 0
        val b = if (y > 0) raster((y - 1) * st + k) & 0xFF else 0
        val c = if (y > 0 && k >= bpp) raster((y - 1) * st + k - bpp) & 0xFF else 0
        val v = f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
          case _ => return None
        }
        raster(y * st + k) = (v & 0xFF).toByte
        k += 1
      }
      y += 1
    }
    Some((width, height, bpp, raster))
  }

  def decodePng(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    val (width, height, bpp, raster) = decodePngRaster(bytes) match {
      case Some(t) => t
      case None => return None
    }
    val st = width * bpp
    // Same feature semantics as decodeBmp24 (mean luma + RGB means +
    // quadrant lumas), over top-down RGB(A) rows.
    var sumR, sumG, sumB = 0.0
    val quad = new Array[Double](4)
    val quadN = new Array[Long](4)
    var imgY = 0
    while (imgY < height) {
      var px = 0
      while (px < width) {
        val o = imgY * st + px * bpp
        val r = raster(o) & 0xFF
        val g = raster(o + 1) & 0xFF
        val b = raster(o + 2) & 0xFF
        sumR += r; sumG += g; sumB += b
        val q = (if (imgY >= height / 2) 2 else 0) + (if (px >= width / 2) 1 else 0)
        quad(q) += (r + g + b) / 3.0
        quadN(q) += 1
        px += 1
      }
      imgY += 1
    }
    val n = width.toLong * height
    val feats = Array(
      ((sumR + sumG + sumB) / (3.0 * n) / 255.0).toFloat,
      (sumR / n / 255.0).toFloat, (sumG / n / 255.0).toFloat, (sumB / n / 255.0).toFloat,
      (if (quadN(0) > 0) quad(0) / quadN(0) / 255.0 else 0.0).toFloat,
      (if (quadN(1) > 0) quad(1) / quadN(1) / 255.0 else 0.0).toFloat,
      (if (quadN(2) > 0) quad(2) / quadN(2) / 255.0 else 0.0).toFloat,
      (if (quadN(3) > 0) quad(3) / quadN(3) / 255.0 else 0.0).toFloat)
    Some((width, height, feats))
  }

  // -------------------------------------------------------- perceptual hash
  /** 64-bit average-hash (aHash) over a raw RGB(A) raster — the classic
    * perceptual image fingerprint: partition the image into an 8×8 grid
    * of cells, bit(i,j) = 1 iff cell luma-mean > global luma-mean, MSB
    * first by (i·8+j). Near-identical images (re-encodes, format
    * conversions, slight noise) land within a few bits; unrelated images
    * differ in ~32.
    *
    * EXACT integer arithmetic start to finish (the oracle contract):
    * luma = r+g+b (no division), cell bounds are the integer partitions
    * [i·h div 8, (i+1)·h div 8), and the mean comparison is the
    * cross-multiplication cell_sum · n_total > total_sum · cell_n — so
    * any engine that can index pixels reproduces the hash bit for bit.
    * Images smaller than 8×8 yield None (a cell would be empty).
    */
  def aHash64(width: Int, height: Int, bytesPerPixel: Int,
              raster: Array[Byte]): Option[Long] = {
    if (width < 8 || height < 8 || bytesPerPixel < 3) return None
    val cellSum = new Array[Long](64)
    val cellN = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < height) {
      val ci = (y * 8) / height // inverse of the bound partition: cell of row y
      var x = 0
      while (x < width) {
        val cj = (x * 8) / width
        val o = (y * width + x) * bytesPerPixel
        val luma = (raster(o) & 0xFF) + (raster(o + 1) & 0xFF) + (raster(o + 2) & 0xFF)
        val c = ci * 8 + cj
        cellSum(c) += luma
        cellN(c) += 1
        total += luma
        x += 1
      }
      y += 1
    }
    val nTotal = width.toLong * height
    var hash = 0L
    var c = 0
    while (c < 64) {
      if (cellSum(c) * nTotal > total * cellN(c)) hash |= 1L << (63 - c)
      c += 1
    }
    Some(hash)
  }

  // ---------------------------------------------------------------- JPEG
  // The JDK bundles a baseline JPEG codec behind javax.imageio (the
  // com.sun.imageio plugin is part of every JRE) — so JPEG, the format
  // real image corpora are actually made of, decodes for real without
  // adding a dependency. Unlike BMP/WAV/PNG the bit layout isn't parsed
  // here; the contract is the same: total function, None on any
  // malformation, bomb-guarded before the raster materializes.

  /** JPEG → (width, height, the same 8 pixel-statistics features as
    * [[decodeBmp24]]). Dimensions are peeked from the frame header
    * BEFORE the raster decodes (the bomb guard — a crafted 65k×65k
    * header must yield None, not a 12 GiB allocation). Any
    * malformation — missing SOI, truncated entropy stream, corrupt
    * segment — yields None, never a throw.
    *
    * JPEG is LOSSY: round-trips preserve dimensions exactly but pixel
    * statistics only approximately (DCT quantization + chroma
    * subsampling), so callers gate features with a tolerance, not
    * equality — the q69 pattern, vs q66's bit-exact PNG.
    */
  def decodeJpeg(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    // SOI marker: every JPEG stream starts FF D8.
    if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8)
      return None
    decodeImageIO(bytes)
  }

  /** GIF via the same JDK plugin registry (LZW + 256-color palette —
    * lossless for palette-sized fixtures; real GIFs quantize at ENCODE
    * time, so decode is exact w.r.t. the stored frame).
    */
  def decodeGif(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    // GIF87a/GIF89a signature.
    if (bytes.length < 6 || bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F')
      return None
    decodeImageIO(bytes)
  }

  /** TIFF via the JDK plugin (bundled since Java 9). */
  def decodeTiff(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    // Little- or big-endian TIFF magic: II*\0 or MM\0*.
    val ok = bytes.length >= 8 &&
      ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 && bytes(3) == 0) ||
        (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && bytes(3) == 42))
    if (!ok) return None
    decodeImageIO(bytes)
  }

  /** Shared imageio decode path: dimension peek BEFORE raster decode
    * (bomb guard), per-row bulk pixel read, the standard 8 features.
    * Which formats land here is decided by the magic-byte gates above —
    * the registry itself would happily sniff anything it knows.
    */
  private def decodeImageIO(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || h.toLong > MaxRasterBytes / (w.toLong * 3 + 1))
            return None
          val img = reader.read(0)
          var sumR, sumG, sumB = 0.0
          val quad = new Array[Double](4)
          val quadN = new Array[Long](4)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val px = row(x)
              val r = (px >> 16) & 0xFF
              val g = (px >> 8) & 0xFF
              val b = px & 0xFF
              sumR += r; sumG += g; sumB += b
              val q = (if (y >= h / 2) 2 else 0) + (if (x >= w / 2) 1 else 0)
              quad(q) += (r + g + b) / 3.0
              quadN(q) += 1
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          val feats = Array(
            ((sumR + sumG + sumB) / (3.0 * n) / 255.0).toFloat,
            (sumR / n / 255.0).toFloat, (sumG / n / 255.0).toFloat, (sumB / n / 255.0).toFloat,
            (if (quadN(0) > 0) quad(0) / quadN(0) / 255.0 else 0.0).toFloat,
            (if (quadN(1) > 0) quad(1) / quadN(1) / 255.0 else 0.0).toFloat,
            (if (quadN(2) > 0) quad(2) / quadN(2) / 255.0 else 0.0).toFloat,
            (if (quadN(3) > 0) quad(3) / quadN(3) / 255.0 else 0.0).toFloat)
          Some((w, h, feats))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch {
      // imageio throws IIOException/IllegalArgument/... on corrupt
      // streams; totality (None) is this codec family's contract.
      case scala.util.control.NonFatal(_) => None
    }
  }

  // ------------------------------------------------------- MP3 metadata
  // Full MP3 DECODE needs a synthesis filterbank no JDK ships — the
  // PERMANENT external-codec boundary (decided round 14; contract and
  // rationale in COVERAGE.md's "MP3/MP4 SAMPLE decode" row: no codec in
  // the JDK, no reference PCM in a zero-egress container to honestly
  // spec a hand-rolled decoder against). But the CONTAINER
  // is public-format header walking, the same class as the WAV/PNG
  // parsing above: every MPEG audio frame announces its version, layer,
  // bitrate, sample rate, and (implicitly) byte length in a 4-byte
  // header, so duration/bitrate/channel metadata — what a corpus
  // pipeline actually filters on — comes from a linear frame walk with
  // zero dependencies.

  private val Mp3BitrateKbpsV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
  private val Mp3BitrateKbpsV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1)
  private val Mp3SampleRateV1 = Array(44100, 48000, 32000, -1)

  /** MPEG audio (Layer III) metadata: (channels, sampleRate, 8 features:
    * duration seconds, mean bitrate kbps, frame count, VBR flag,
    * 0×4). A leading ID3v2 tag is skipped (size is syncsafe); a trailing
    * ID3v1 block ("TAG", 128 bytes) ends the walk cleanly. None if no
    * valid frame sequence is found — truncated mid-frame data, garbage,
    * or a reserved version/bitrate/samplerate code all fail totality-
    * style, never throw.
    */
  def parseMp3Meta(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    var off = 0L
    // ID3v2 header: "ID3" vv flags size(4 × 7-bit syncsafe).
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      off = 10L + size
    }
    var frames = 0L
    var samples = 0L
    var rateSum = 0.0
    var firstRate = -1
    var firstBitrate = -1
    var vbr = false
    var channels = -1
    var sampleRate = -1
    while (off + 4 <= bytes.length) {
      val b1 = bytes(off.toInt) & 0xFF
      val b2 = bytes(off.toInt + 1) & 0xFF
      if (b1 != 0xFF || (b2 & 0xE0) != 0xE0) {
        // Not a frame sync. Trailing ID3v1 ("TAG" + 125 bytes) after ≥1
        // frame is the one tolerated coda; anything else is malformation.
        if (frames > 0 && off + 3 <= bytes.length &&
          bytes(off.toInt) == 'T' && bytes(off.toInt + 1) == 'A' && bytes(off.toInt + 2) == 'G')
          return finishMp3(frames, samples, rateSum, vbr, channels, sampleRate)
        return None
      }
      val versionBits = (b2 >> 3) & 0x3 // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
      val layerBits = (b2 >> 1) & 0x3   // 1=Layer III
      if (versionBits == 1 || layerBits != 1) return None
      val b3 = bytes(off.toInt + 2) & 0xFF
      val bitrateIdx = (b3 >> 4) & 0xF
      val rateIdx = (b3 >> 2) & 0x3
      val padding = (b3 >> 1) & 0x1
      val kbps =
        (if (versionBits == 3) Mp3BitrateKbpsV1L3 else Mp3BitrateKbpsV2L3)(bitrateIdx)
      val baseRate = Mp3SampleRateV1.lift(rateIdx).getOrElse(-1)
      if (kbps <= 0 || baseRate <= 0) return None // free-format/reserved codes
      val rate = versionBits match {
        case 3 => baseRate      // MPEG1
        case 2 => baseRate / 2  // MPEG2
        case _ => baseRate / 4  // MPEG2.5
      }
      val b4 = bytes(off.toInt + 3) & 0xFF
      val chans = if (((b4 >> 6) & 0x3) == 3) 1 else 2 // 3 = mono
      val samplesPerFrame = if (versionBits == 3) 1152 else 576
      val frameLen = samplesPerFrame / 8 * kbps * 1000 / rate + padding
      if (frameLen < 4 || off + frameLen > bytes.length) return None // truncated frame
      if (frames == 0) { firstRate = rate; firstBitrate = kbps; channels = chans; sampleRate = rate }
      else if (rate != firstRate || chans != channels) return None // mid-stream format change
      if (kbps != firstBitrate) vbr = true
      frames += 1
      samples += samplesPerFrame
      rateSum += kbps
      off += frameLen
    }
    if (off != bytes.length) return None // dangling partial header
    finishMp3(frames, samples, rateSum, vbr, channels, sampleRate)
  }

  private def finishMp3(frames: Long, samples: Long, rateSum: Double, vbr: Boolean,
                        channels: Int, sampleRate: Int): Option[(Int, Int, Array[Float])] =
    if (frames == 0) None
    else Some((channels, sampleRate, Array(
      (samples.toDouble / sampleRate).toFloat,
      (rateSum / frames).toFloat,
      frames.toFloat,
      if (vbr) 1.0f else 0.0f,
      0.0f, 0.0f, 0.0f, 0.0f)))

  /** Fixture encoder: a valid constant-bitrate MPEG1 Layer III stream of
    * `frames` frames (headers real, payload zeros — the parser never
    * reads past the header, exactly like real duration scanners).
    */
  def encodeMp3(frames: Int, bitrateKbps: Int, sampleRate: Int,
                mono: Boolean = false): Array[Byte] = {
    val bitrateIdx = Mp3BitrateKbpsV1L3.indexOf(bitrateKbps)
    val rateIdx = Mp3SampleRateV1.indexOf(sampleRate)
    require(bitrateIdx > 0 && rateIdx >= 0 && rateIdx < 3,
      s"unsupported MPEG1 L3 bitrate/rate: $bitrateKbps kbps @ $sampleRate Hz")
    val frameLen = 144 * bitrateKbps * 1000 / sampleRate
    val out = new java.io.ByteArrayOutputStream(frames * frameLen)
    (0 until frames).foreach { _ =>
      val frame = new Array[Byte](frameLen)
      frame(0) = 0xFF.toByte
      frame(1) = 0xFB.toByte // sync | MPEG1 | Layer III | no CRC
      frame(2) = ((bitrateIdx << 4) | (rateIdx << 2)).toByte
      frame(3) = (if (mono) 0xC0 else 0x00).toByte
      out.write(frame)
    }
    out.toByteArray
  }

  // -------------------------------------------------------- MP4 metadata
  // Same boundary call as MP3: frame DECODE needs H.264/AAC codecs, but
  // the ISO BMFF CONTAINER is a public length-prefixed box tree —
  // `mvhd` carries timescale+duration, `tkhd` carries track dims. A
  // box walk (with 64-bit largesize support and strict bounds) covers
  // the metadata pass a multimodal corpus pipeline runs before any
  // decode fan-out.

  private def be32L(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
  private def be64L(b: Array[Byte], off: Int): Long =
    (be32L(b, off) << 32) | be32L(b, off + 4)
  private def boxType(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Child box spans of a container: (typeString, payloadStart, payloadEnd). */
  private def mp4Children(bytes: Array[Byte], start: Long, end: Long):
      Option[List[(String, Long, Long)]] = {
    val out = List.newBuilder[(String, Long, Long)]
    var off = start
    while (off < end) {
      if (off + 8 > end) return None // dangling partial header
      var size = be32L(bytes, off.toInt)
      var headerLen = 8L
      if (size == 1) {
        if (off + 16 > end) return None
        size = be64L(bytes, off.toInt + 8)
        headerLen = 16L
      } else if (size == 0) size = end - off // "to end of enclosing box"
      // `size > end - off` (not `off + size > end`): a crafted 64-bit
      // largesize near Long.MaxValue would wrap the addition negative and
      // sail through the bounds check into a negative array index.
      if (size < headerLen || size > end - off) return None // bounds lie
      out += ((boxType(bytes, off.toInt + 4), off + headerLen, off + size))
      off += size
    }
    Some(out.result())
  }

  /** MP4/ISO-BMFF metadata: (width, height — the max tkhd dims across
    * tracks, 0 for audio-only, 8 features: duration seconds
    * (mvhd duration/timescale), timescale, track count, 0×5). None on
    * any malformation — missing ftyp/moov/mvhd, truncated box, a size
    * field pointing outside the blob.
    */
  def parseMp4Meta(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    val top = mp4Children(bytes, 0L, bytes.length.toLong).getOrElse(return None)
    if (!top.headOption.exists(_._1 == "ftyp")) return None
    val (_, moovS, moovE) = top.find(_._1 == "moov").getOrElse(return None)
    val moov = mp4Children(bytes, moovS, moovE).getOrElse(return None)
    val (_, mvS, mvE) = moov.find(_._1 == "mvhd").getOrElse(return None)
    if (mvS + 4 > mvE) return None
    val mvhdV = bytes(mvS.toInt) & 0xFF
    // v0: ver/flags 4, creation 4, modification 4, timescale 4, duration 4
    // v1: ver/flags 4, creation 8, modification 8, timescale 4, duration 8
    val (timescale, duration) = mvhdV match {
      case 0 if mvS + 20 <= mvE => (be32L(bytes, mvS.toInt + 12), be32L(bytes, mvS.toInt + 16))
      case 1 if mvS + 32 <= mvE => (be32L(bytes, mvS.toInt + 20), be64L(bytes, mvS.toInt + 24))
      case _                    => return None
    }
    if (timescale <= 0) return None
    var width = 0
    var height = 0
    var tracks = 0
    moov.filter(_._1 == "trak").foreach { case (_, tS, tE) =>
      val trak = mp4Children(bytes, tS, tE).getOrElse(return None)
      val (_, kS, kE) = trak.find(_._1 == "tkhd").getOrElse(return None)
      if (kS + 4 > kE) return None
      // tkhd dims are the LAST 8 payload bytes (16.16 fixed) in both
      // versions — offset from the end sidesteps the v0/v1 field widths.
      val tkhdV = bytes(kS.toInt) & 0xFF
      val needed = if (tkhdV == 0) 84L else 96L
      if (tkhdV > 1 || kE - kS < needed) return None
      val w = (be32L(bytes, (kE - 8).toInt) >> 16).toInt
      val h = (be32L(bytes, (kE - 4).toInt) >> 16).toInt
      width = math.max(width, w)
      height = math.max(height, h)
      tracks += 1
    }
    if (tracks == 0) return None
    Some((width, height, Array(
      (duration.toDouble / timescale).toFloat,
      timescale.toFloat, tracks.toFloat, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f)))
  }

  /** Fixture encoder: minimal `ftyp` + `moov(mvhd, trak(tkhd)*)` tree
    * with real timescale/duration/dims (payload fields beyond those are
    * zero — the walk never reads them).
    */
  def encodeMp4(timescale: Int, duration: Long, trackDims: Seq[(Int, Int)]): Array[Byte] = {
    def putBe32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
      o.write(((v >> 24) & 0xFF).toInt); o.write(((v >> 16) & 0xFF).toInt)
      o.write(((v >> 8) & 0xFF).toInt); o.write((v & 0xFF).toInt)
    }
    def box(t: String, payload: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(8 + payload.length)
      putBe32(o, 8L + payload.length)
      o.write(t.getBytes("US-ASCII")); o.write(payload)
      o.toByteArray
    }
    val ftyp = box("ftyp", "isom0000isomiso2".getBytes("US-ASCII"))
    val mvhdP = new java.io.ByteArrayOutputStream()
    putBe32(mvhdP, 0) // v0 + flags
    putBe32(mvhdP, 0); putBe32(mvhdP, 0) // creation, modification
    putBe32(mvhdP, timescale); putBe32(mvhdP, duration)
    (0 until 19).foreach(_ => putBe32(mvhdP, 0)) // rate..next_track_ID
    val traks = trackDims.map { case (w, h) =>
      val p = new java.io.ByteArrayOutputStream()
      (0 until 19).foreach(_ => putBe32(p, 0)) // v0 fields through matrix
      putBe32(p, w.toLong << 16); putBe32(p, h.toLong << 16)
      box("trak", box("tkhd", p.toByteArray))
    }
    val moovP = new java.io.ByteArrayOutputStream()
    moovP.write(box("mvhd", mvhdP.toByteArray))
    traks.foreach(moovP.write)
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(box("moov", moovP.toByteArray))
    out.toByteArray
  }

  /** RGB8 JPEG encoder (ImageIO baseline writer, explicit quality) —
    * spec/oracle fixtures synthesize blobs through the real compressor
    * so the decode path under test is the full Huffman/DCT pipeline.
    */
  def encodeJpeg(width: Int, height: Int, rgb: Array[Byte], quality: Float = 0.92f): Array[Byte] = {
    require(rgb.length == width * height * 3, "need width*height RGB triples")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    var k = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y,
          ((rgb(k) & 0xFF) << 16) | ((rgb(k + 1) & 0xFF) << 8) | (rgb(k + 2) & 0xFF))
        k += 3
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Minimal RGB8 PNG encoder (filter 0 rows, one zlib stream) — spec
    * fixtures round-trip through the real decoder, self-contained.
    */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "need width*height RGB triples")
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    def putBe32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write((v >> 24) & 0xFF); b.write((v >> 16) & 0xFF)
      b.write((v >> 8) & 0xFF); b.write(v & 0xFF)
    }
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      putBe32(out, data.length)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      putBe32(out, crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    putBe32(ihdr, width); putBe32(ihdr, height)
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    val rawRows = new Array[Byte]((width * 3 + 1) * height)
    var y = 0
    while (y < height) {
      rawRows(y * (width * 3 + 1)) = 0 // filter: None
      System.arraycopy(rgb, y * width * 3, rawRows, y * (width * 3 + 1) + 1, width * 3)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(rawRows); deflater.finish()
    val zbuf = new Array[Byte](rawRows.length + 1024)
    val zOut = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(zbuf)
      zOut.write(zbuf, 0, n)
    }
    deflater.end()
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }
}
