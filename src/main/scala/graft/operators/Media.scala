package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Real trivial-container media kernels — the decode step behind m02/m07.
  *
  * Three genuine, publicly-specified uncompressed formats that are
  * writable AND parsable in pure JVM code (no codec library needed):
  *
  *   - BMP (Windows 3.x `BITMAPINFOHEADER`, 8-bit palettized grayscale):
  *     bottom-up pixel rows, 4-byte row padding, palette indirection —
  *     the classic container quirks a real decoder must honor.
  *   - WAV (RIFF PCM, mono 16-bit little-endian): chunk-walk parsing of
  *     `fmt ` + `data` (tolerating unknown chunks and odd-size padding).
  *   - Y4M (YUV4MPEG2, C420): ASCII parameter header + per-frame `FRAME`
  *     markers over raw planar YUV bytes.
  *
  * Payloads are generated deterministically from `doc_id` (the corpus has
  * no media bytes), but everything from the container bytes onward is
  * REAL: `MediaGen` writes honest files, `MediaCodec` parses them back the
  * way a production ingest would, and the DuckDB oracle re-derives the
  * decoded values from the generation rule — so a gate pass proves the
  * decoder read real pixels/samples back through a real container format
  * (the m04 magic-sniff discipline, extended to full decode).
  *
  * Reference analogue: flock models media blobs as opaque payload bytes
  * routed to workers (flock/src/transmute/payload.rs); the decode itself
  * is out of scope there, so the kernels here follow the public format
  * specs instead.
  */
object Media {

  // ---- deterministic content rules (shared with the DuckDB oracles) ----

  /** Image pixel rule: 16×16 grayscale. Images form ~40 near-dup clusters
    * (base pattern from `cluster`) with a small per-variant perturbation
    * (+15 on the few pixels whose raster index ≡ variant mod 61), so the
    * m07 pHash topology has real near-duplicate families to find.
    */
  val ImgW = 16
  val ImgH = 16
  def imgCluster(docId: Long): Long = (docId / 3) % 40
  def imgVariant(docId: Long): Long = (docId / 120) % 61
  def pixel(docId: Long, r: Int, c: Int): Int = {
    val base = ((imgCluster(docId) * 41 + r * 7 + c * 13) % 240).toInt
    base + (if ((r * ImgW + c) % 61 == imgVariant(docId)) 15 else 0)
  }

  /** Audio rule: mono 16-bit PCM at 8 kHz; sample count varies per doc. */
  val WavRate = 8000
  def wavSamples(docId: Long): Int = (160 + (docId % 37) * 16).toInt
  def wavSample(docId: Long, i: Int): Short =
    (((docId * 13 + i.toLong * 7) % 2048) - 1024).toShort

  /** Video rule: 8×8 C420 frames, 1-5 frames per doc; every plane byte
    * (luma and chroma) follows the same integer rule.
    */
  val VidW = 8
  val VidH = 8
  val VidFrameBytes: Int = VidW * VidH + 2 * ((VidW / 2) * (VidH / 2)) // 96
  def vidFrames(docId: Long): Int = (1 + docId % 5).toInt
  def vidByte(docId: Long, f: Int, i: Int): Int =
    ((docId * 11 + f.toLong * 5 + i.toLong * 3) % 256).toInt

  val Y4mHeader: Array[Byte] =
    s"YUV4MPEG2 W$VidW H$VidH F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
  val Y4mFrameMarker: Array[Byte] = "FRAME\n".getBytes("US-ASCII")

  /** Exact container sizes (inlined into the m02 oracle SQL). */
  val BmpBytes: Int = 14 + 40 + 256 * 4 + ImgW * ImgH // rows 4-aligned at W=16
  def wavBytes(docId: Long): Long = 44L + 2L * wavSamples(docId)
  def y4mBytes(docId: Long): Long =
    Y4mHeader.length + vidFrames(docId).toLong *
      (Y4mFrameMarker.length + VidFrameBytes)

  // ---- writers ----

  object MediaGen {

    /** 8-bit palettized grayscale BMP (BITMAPFILEHEADER +
      * BITMAPINFOHEADER + 256-entry gray palette + bottom-up pixel rows).
      */
    def bmp(docId: Long): Array[Byte] = {
      val rowBytes = ((ImgW + 3) / 4) * 4
      val pixOff = 14 + 40 + 256 * 4
      val size = pixOff + rowBytes * ImgH
      val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(size)
        .putShort(0).putShort(0).putInt(pixOff)
      b.putInt(40).putInt(ImgW).putInt(ImgH).putShort(1).putShort(8)
        .putInt(0).putInt(rowBytes * ImgH).putInt(2835).putInt(2835)
        .putInt(256).putInt(0)
      var i = 0
      while (i < 256) {
        b.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte); i += 1
      }
      var r = ImgH - 1 // BMP stores rows bottom-up
      while (r >= 0) {
        var c = 0
        while (c < ImgW) { b.put(pixel(docId, r, c).toByte); c += 1 }
        var p = ImgW
        while (p < rowBytes) { b.put(0.toByte); p += 1 }
        r -= 1
      }
      b.array()
    }

    /** RIFF/WAVE, PCM mono 16-bit LE, canonical 44-byte header. */
    def wav(docId: Long): Array[Byte] = {
      val n = wavSamples(docId)
      val dataBytes = n * 2
      val b = ByteBuffer.allocate(44 + dataBytes)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
        .put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(WavRate).putInt(WavRate * 2)
        .putShort(2).putShort(16)
      b.put("data".getBytes("US-ASCII")).putInt(dataBytes)
      var i = 0
      while (i < n) { b.putShort(wavSample(docId, i)); i += 1 }
      b.array()
    }

    /** YUV4MPEG2 C420 stream: ASCII header + FRAME-marked raw planes. */
    def y4m(docId: Long): Array[Byte] = {
      val f = vidFrames(docId)
      val b = ByteBuffer.allocate(y4mBytes(docId).toInt)
      b.put(Y4mHeader)
      var fi = 0
      while (fi < f) {
        b.put(Y4mFrameMarker)
        var i = 0
        while (i < VidFrameBytes) { b.put(vidByte(docId, fi, i).toByte); i += 1 }
        fi += 1
      }
      b.array()
    }
  }

  // ---- parsers (the real decode step) ----

  /** Decoded-asset metadata: what a media-lake ingest extracts per blob.
    * `n_frames` is samples for audio, frames for video, 1 for images;
    * `content_sum` sums every decoded pixel/sample/plane-byte value — the
    * value that PROVES real content came back out of the container.
    */
  case class AssetMeta(doc_id: Long, modality: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Long, content_sum: Long)

  object MediaCodec {

    /** Parse an 8-bit palettized BMP: header fields at their spec offsets,
      * palette indirection, bottom-up rows with 4-byte padding. Returns
      * (width, height, pixels in top-down raster order).
      */
    def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(b.get(0) == 'B' && b.get(1) == 'M', "not a BMP")
      val pixOff = b.getInt(10)
      val hdrSize = b.getInt(14)
      require(hdrSize >= 40, s"unsupported BMP header size $hdrSize")
      val w = b.getInt(18)
      val h = b.getInt(22)
      val bpp = b.getShort(28).toInt
      require(bpp == 8, s"unsupported bpp $bpp")
      require(b.getInt(30) == 0, "compressed BMP unsupported")
      val nColors = { val c = b.getInt(46); if (c == 0) 256 else c }
      val palOff = 14 + hdrSize
      // Gray level = the palette's blue channel (entries are B,G,R,0).
      val gray = Array.tabulate(nColors)(i => bytes(palOff + 4 * i) & 0xff)
      val rowBytes = ((w + 3) / 4) * 4
      val px = new Array[Int](w * h)
      var r = 0
      while (r < h) {
        val srcRow = pixOff + (h - 1 - r) * rowBytes // bottom-up
        var c = 0
        while (c < w) {
          px(r * w + c) = gray(bytes(srcRow + c) & 0xff)
          c += 1
        }
        r += 1
      }
      (w, h, px)
    }

    /** Walk RIFF chunks to `fmt ` + `data`; returns (nSamples, sampleSum).
      * Tolerates unknown chunks and odd-size pad bytes per the RIFF spec.
      */
    def decodeWav(bytes: Array[Byte]): (Long, Long) = {
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
      require(tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE")
      var off = 12
      var bits = -1; var channels = -1
      var nSamples = 0L; var sum = 0L
      while (off + 8 <= bytes.length) {
        val id = tag(off)
        val size = b.getInt(off + 4)
        if (id == "fmt ") {
          require(b.getShort(off + 8) == 1, "non-PCM WAV unsupported")
          channels = b.getShort(off + 10).toInt
          bits = b.getShort(off + 22).toInt
        } else if (id == "data") {
          require(bits == 16 && channels == 1,
            s"unsupported PCM layout ${bits}bit×$channels")
          nSamples = size / 2L
          var i = 0
          while (i < nSamples) { sum += b.getShort(off + 8 + 2 * i); i += 1 }
        }
        off += 8 + size + (size & 1) // chunks pad to even length
      }
      (nSamples, sum)
    }

    /** Parse a YUV4MPEG2 stream: W/H from the header tokens, then count
      * FRAME sections and sum every plane byte (luma + chroma).
      */
    def decodeY4m(bytes: Array[Byte]): (Int, Int, Long, Long) = {
      val nl = bytes.indexOf('\n'.toByte)
      require(nl > 0, "no Y4M header line")
      val header = new String(bytes, 0, nl, "US-ASCII")
      val toks = header.split(" ")
      require(toks(0) == "YUV4MPEG2", "not a YUV4MPEG2 stream")
      val w = toks.collectFirst { case t if t.startsWith("W") => t.tail.toInt }
        .getOrElse(sys.error("Y4M header missing W"))
      val h = toks.collectFirst { case t if t.startsWith("H") => t.tail.toInt }
        .getOrElse(sys.error("Y4M header missing H"))
      require(toks.exists(_ == "C420"), "only C420 supported")
      val frameBytes = w * h + 2 * ((w / 2) * (h / 2))
      var off = nl + 1
      var frames = 0L; var sum = 0L
      while (off < bytes.length) {
        val mEnd = {
          var i = off
          while (i < bytes.length && bytes(i) != '\n'.toByte) i += 1
          i
        }
        require(new String(bytes, off, 5, "US-ASCII") == "FRAME",
          "missing FRAME marker")
        off = mEnd + 1
        var i = 0
        while (i < frameBytes) { sum += bytes(off + i) & 0xff; i += 1 }
        off += frameBytes
        frames += 1
      }
      (w, h, frames, sum)
    }

    /** Modality dispatch by doc_id (generation layout), decode by the
      * format's own magic bytes — decode NEVER trusts the layout rule.
      */
    def decode(docId: Long, payload: Array[Byte]): AssetMeta =
      if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') {
        val (w, h, px) = decodeBmp(payload)
        AssetMeta(docId, "image/bmp", payload.length.toLong, w, h, 1L,
          px.foldLeft(0L)(_ + _))
      } else if (payload.length >= 4 &&
          new String(payload, 0, 4, "US-ASCII") == "RIFF") {
        val (n, sum) = decodeWav(payload)
        AssetMeta(docId, "audio/wav", payload.length.toLong, 0, 0, n, sum)
      } else {
        val (w, h, f, sum) = decodeY4m(payload)
        AssetMeta(docId, "video/y4m", payload.length.toLong, w, h, f, sum)
      }
  }

  // ---- perceptual hash (real integer DCT over decoded pixels) ----

  /** 63-bit DCT perceptual hash, exact-integer end to end (the p104
    * discipline): 16×16 grayscale → 2×2 mean-pool to 8×8 (floor division,
    * all values non-negative → shared Spark/DuckDB semantics) → 8×8
    * type-II DCT with the cosine table quantized to 10⁶ (the SAME integer
    * literals are inlined into the DuckDB oracle, so there is no
    * cross-engine float) → one bit per AC coefficient, set iff
    * 63·coef > Σ(AC coefs) (strictly-above-mean without any division).
    * Max |coef| ≤ 254·64·10¹² ≈ 1.6e16 and 63·|coef| ≈ 1.0e18, far inside
    * Long. Bit index u·8+v−1 ∈ [0,62] ⇒ the hash is a non-negative Long.
    */
  object PHash {
    val Scale = 1000000L

    /** C(k)(n) = round(cos(π(2n+1)k/16)·10⁶) — quantized DCT-II basis. */
    val C: Array[Array[Long]] = Array.tabulate(8, 8)((k, n) =>
      math.round(math.cos(math.Pi * (2 * n + 1) * k / 16.0) * Scale))

    def phash64(w: Int, h: Int, px: Array[Int]): Long = {
      require(w == ImgW && h == ImgH, s"pHash expects ${ImgW}x$ImgH, got ${w}x$h")
      val p = Array.ofDim[Long](8, 8)
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          p(r)(c) = (px(2 * r * w + 2 * c) + px(2 * r * w + 2 * c + 1) +
            px((2 * r + 1) * w + 2 * c) + px((2 * r + 1) * w + 2 * c + 1)).toLong / 4
          c += 1
        }
        r += 1
      }
      val coef = Array.ofDim[Long](8, 8)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var s = 0L
          var rr = 0
          while (rr < 8) {
            var cc = 0
            while (cc < 8) { s += p(rr)(cc) * C(u)(rr) * C(v)(cc); cc += 1 }
            rr += 1
          }
          coef(u)(v) = s
          v += 1
        }
        u += 1
      }
      var ac = 0L
      u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) { if (u != 0 || v != 0) ac += coef(u)(v); v += 1 }
        u += 1
      }
      var hash = 0L
      u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          if ((u != 0 || v != 0) && 63L * coef(u)(v) > ac)
            hash |= 1L << (u * 8 + v - 1)
          v += 1
        }
        u += 1
      }
      hash
    }

    /** The cosine table as SQL VALUES rows `(k, n, c)` — inlined into the
      * m07 oracle so both engines multiply the identical integers.
      */
    def cosTableSql: String =
      (for (k <- 0 until 8; n <- 0 until 8)
        yield s"($k,$n,${C(k)(n)})").mkString(",")
  }
}
