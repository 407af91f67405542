package graft

import graft.operators.Media
import org.scalatest.funsuite.AnyFunSuite

/** The real media kernels behind m02/m07: container round-trips (write a
  * genuine BMP/WAV/Y4M, parse it back, recover exactly the generated
  * content) and the integer DCT pHash's structural properties.
  */
class MediaSpec extends AnyFunSuite {

  test("BMP round-trip recovers every pixel through the real container") {
    Seq(0L, 3L, 120L, 483L).foreach { id =>
      val bytes = Media.MediaGen.bmp(id)
      // Spec offsets: 'BM' magic, bpp=8 at 28, positive height (bottom-up).
      assert(bytes(0) == 'B' && bytes(1) == 'M')
      assert(bytes.length == Media.BmpBytes)
      val (w, h, px) = Media.MediaCodec.decodeBmp(bytes)
      assert(w == Media.ImgW && h == Media.ImgH)
      for (r <- 0 until h; c <- 0 until w)
        assert(px(r * w + c) == Media.pixel(id, r, c),
          s"pixel mismatch at doc $id ($r,$c)")
    }
  }

  test("BMP decoder actually honors bottom-up row order") {
    // Flip the raw pixel rows of a real BMP in place: a decoder that reads
    // rows top-down would return the ORIGINAL image for the flipped bytes.
    val id = 6L
    val bytes = Media.MediaGen.bmp(id)
    val pixOff = 14 + 40 + 256 * 4
    val flipped = bytes.clone()
    for (r <- 0 until Media.ImgH; c <- 0 until Media.ImgW)
      flipped(pixOff + r * Media.ImgW + c) =
        bytes(pixOff + (Media.ImgH - 1 - r) * Media.ImgW + c)
    val (_, _, px) = Media.MediaCodec.decodeBmp(flipped)
    for (r <- 0 until Media.ImgH; c <- 0 until Media.ImgW)
      assert(px(r * Media.ImgW + c) ==
        Media.pixel(id, Media.ImgH - 1 - r, c))
  }

  test("WAV round-trip recovers sample count and sum; unknown chunks skip") {
    Seq(1L, 37L, 184L, 4999L).foreach { id =>
      val bytes = Media.MediaGen.wav(id)
      assert(bytes.length == Media.wavBytes(id))
      val (n, sum) = Media.MediaCodec.decodeWav(bytes)
      assert(n == Media.wavSamples(id).toLong)
      val expect = (0 until Media.wavSamples(id))
        .map(i => Media.wavSample(id, i).toLong).sum
      assert(sum == expect, s"sample sum mismatch for doc $id")
    }
    // Chunk-walk honesty: insert an unknown odd-size chunk before `data`
    // (odd sizes pad to even per RIFF) — the decoder must skip it.
    val base = Media.MediaGen.wav(1L)
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 0) // 3 payload bytes + 1 pad
    val patched = java.nio.ByteBuffer
      .allocate(base.length + junk.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    patched.put(base, 0, 36).put(junk).put(base, 36, base.length - 36)
    val arr = patched.array()
    // Fix the RIFF size field for the inserted bytes.
    val bb = java.nio.ByteBuffer.wrap(arr)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, arr.length - 8)
    val (n1, s1) = Media.MediaCodec.decodeWav(arr)
    val (n0, s0) = Media.MediaCodec.decodeWav(base)
    assert(n1 == n0 && s1 == s0, "JUNK chunk changed decoded audio")
  }

  test("Y4M round-trip recovers frame count and plane-byte sum") {
    Seq(2L, 5L, 302L, 4997L).foreach { id =>
      val bytes = Media.MediaGen.y4m(id)
      assert(bytes.length == Media.y4mBytes(id))
      val (w, h, f, sum) = Media.MediaCodec.decodeY4m(bytes)
      assert(w == Media.VidW && h == Media.VidH)
      assert(f == Media.vidFrames(id).toLong)
      val expect = (0 until Media.vidFrames(id)).flatMap(fi =>
        (0 until Media.VidFrameBytes).map(i =>
          Media.vidByte(id, fi, i).toLong)).sum
      assert(sum == expect, s"plane sum mismatch for doc $id")
    }
  }

  test("decode dispatches on magic bytes, not the doc_id layout") {
    val m = Media.MediaCodec.decode(1L, Media.MediaGen.bmp(1L))
    assert(m.modality == "image/bmp" && m.width == 16 && m.n_frames == 1L)
    val a = Media.MediaCodec.decode(0L, Media.MediaGen.wav(0L))
    assert(a.modality == "audio/wav" && a.n_frames == 160L)
    val v = Media.MediaCodec.decode(0L, Media.MediaGen.y4m(0L))
    assert(v.modality == "video/y4m" && v.n_frames == 1L)
  }

  test("pHash: 63-bit, deterministic, near for same-cluster variants") {
    def hashOf(id: Long): Long = {
      val (w, h, px) = Media.MediaCodec.decodeBmp(Media.MediaGen.bmp(id))
      Media.PHash.phash64(w, h, px)
    }
    val ids = (0 until 500).map(_ * 3L)
    val hs = ids.map(hashOf)
    assert(hs.forall(h => h >= 0L), "bit 63 must stay clear")
    assert(hs.toSet.size > 30, "hashes collapse — DCT degenerate")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // Same cluster (doc_id ≡ mod 120 ⇒ same base pattern, ≠ variant):
    // tiny Hamming distance. Distinct clusters: large.
    val sameCluster = for (k <- 0 until 40) yield
      ham(hashOf(k * 3L), hashOf(k * 3L + 120L))
    assert(sameCluster.forall(_ <= 6), s"same-cluster too far: $sameCluster")
    val cross = for (k <- 0 until 39) yield
      ham(hashOf(k * 3L), hashOf(k * 3L + 3L))
    assert(cross.count(_ > 14) > 30, s"cross-cluster too near: $cross")
  }

  test("cosine table is the DCT-II basis quantized to 1e6") {
    assert(Media.PHash.C(0).forall(_ == 1000000L))
    // k=4 row alternates ±round(cos(pi/4)*1e6)
    assert(Media.PHash.C(4).map(math.abs).forall(_ == 707107L))
    assert(Media.PHash.cosTableSql.startsWith("(0,0,1000000)"))
    assert(Media.PHash.cosTableSql.split(",\\(").length == 64)
  }
}
