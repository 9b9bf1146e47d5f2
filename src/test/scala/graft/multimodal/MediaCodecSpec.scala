package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level ground truth for the hand-rolled BMP/WAV codecs: known-file
  * layouts checked field by field, round-trip laws over the dimension
  * grid (including every stride-padding class), and loud rejection of
  * malformed input. No SparkSession — the codec is plain bytes in/out. */
class MediaCodecSpec extends AnyFunSuite {
  import MediaCodec._

  test("BMP: known 2x2 file is byte-exact (header fields + padding)") {
    // w=2 → 6 pixel bytes/row, stride 8 (2 pad bytes/row), data 16, file 70
    val b = encodeBmp(2, 2, i => i + 1)
    assert(b.length == 70)
    assert(b(0) == 'B' && b(1) == 'M')
    def rd32(off: Int) = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    assert(rd32(2) == 70, "file size field")
    assert(rd32(10) == 54, "pixel offset")
    assert(rd32(14) == 40, "DIB header size")
    assert(rd32(18) == 2 && rd32(22) == 2, "dims")
    assert((b(28) & 0xff) == 24, "bpp")
    assert(rd32(34) == 16, "padded data size")
    // row 0 payload bytes 1..6 then two zero pads; row 1: 7..12 + pads
    assert(b.slice(54, 62).toSeq == Seq[Byte](1, 2, 3, 4, 5, 6, 0, 0))
    assert(b.slice(62, 70).toSeq == Seq[Byte](7, 8, 9, 10, 11, 12, 0, 0))
    val info = decodeBmp(b)
    assert(info == BmpInfo(2, 2, 24, 70, (1 to 12).sum.toLong))
  }

  test("BMP: round-trip across all four stride-padding classes") {
    // w*3 mod 4 = 0,1,2,3 ⇔ w mod 4 cycles — cover each with varied h
    for (w <- 1 to 9; h <- Seq(1, 3, 8)) {
      val b = encodeBmp(w, h, i => (i * 37 + 11) & 0xff)
      val info = decodeBmp(b)
      assert(info.width == w && info.height == h && info.bitsPerPixel == 24)
      assert(info.fileSize == b.length)
      val expectSum = (0 until w * 3 * h).map(i => (i * 37 + 11) & 0xff).sum.toLong
      assert(info.payloadSum == expectSum,
        s"stride padding leaked into payload sum at ${w}x$h")
    }
  }

  test("BMP: malformed inputs are rejected loudly") {
    val ok = encodeBmp(4, 4, _ => 1)
    intercept[IllegalArgumentException](decodeBmp(ok.take(53))) // truncated
    val badMagic = ok.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](decodeBmp(badMagic))
    val badSize = ok.clone(); badSize(2) = (badSize(2) + 1).toByte
    intercept[IllegalArgumentException](decodeBmp(badSize))
    val bpp32 = ok.clone(); bpp32(28) = 32
    intercept[IllegalArgumentException](decodeBmp(bpp32))
    val compressed = ok.clone(); compressed(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](decodeBmp(compressed))
  }

  test("WAV: known mono-8-bit file with odd data size exercises the pad rule") {
    // 3 frames x 1 ch x 8 bit = 3 payload bytes (odd) → 1 pad byte;
    // file = 12 RIFF + 12 LIST + 24 fmt + 8 data hdr + 3 + 1 = 60
    val b = encodeWav(8000, 1, 8, 3, i => 10 + i)
    assert(b.length == 60)
    assert(new String(b.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(b.slice(8, 12), "US-ASCII") == "WAVE")
    assert(new String(b.slice(12, 16), "US-ASCII") == "LIST")
    assert(new String(b.slice(24, 28), "US-ASCII") == "fmt ")
    assert(new String(b.slice(48, 52), "US-ASCII") == "data")
    assert(b.slice(56, 59).toSeq == Seq[Byte](10, 11, 12))
    assert(b(59) == 0, "odd data chunk must carry a pad byte")
    val info = decodeWav(b)
    assert(info == WavInfo(8000, 1, 8, 3L, 60, 33L))
  }

  test("WAV: round-trip over rate/channel/width grid; chunk walk skips LIST") {
    for (rate <- Seq(8000, 44100); ch <- Seq(1, 2); nf <- Seq(1, 7, 256)) {
      val bits = if (ch == 1) 8 else 16
      val b = encodeWav(rate, ch, bits, nf, i => (i * 13 + 5) & 0xff)
      val info = decodeWav(b)
      assert(info.sampleRate == rate && info.channels == ch &&
        info.bitsPerSample == bits && info.nFrames == nf.toLong)
      val n = nf * ch * bits / 8
      assert(info.payloadSum == (0 until n).map(i => (i * 13 + 5) & 0xff).sum.toLong,
        "pad byte must not count toward the payload sum")
    }
  }

  test("WAV: malformed inputs are rejected loudly") {
    val ok = encodeWav(8000, 2, 16, 4, _ => 1)
    intercept[IllegalArgumentException](decodeWav(ok.take(11)))
    val badRiff = ok.clone(); badRiff(0) = 'X'
    intercept[IllegalArgumentException](decodeWav(badRiff))
    val badSize = ok.clone(); badSize(4) = (badSize(4) + 1).toByte
    intercept[IllegalArgumentException](decodeWav(badSize))
    // corrupt blockAlign: fmt self-consistency check must fire
    val badAlign = ok.clone(); badAlign(44) = 3
    intercept[IllegalArgumentException](decodeWav(badAlign))
    // non-PCM format code
    val nonPcm = ok.clone(); nonPcm(32) = 3
    intercept[IllegalArgumentException](decodeWav(nonPcm))
  }

  test("BMP resize: nearest-neighbor exactness law across the stride grid") {
    // decode(resize(img, w/2, h/2)).channel(x, y, c) == img.channel(2x, 2y, c)
    // EXACTLY when w, h are even (sx = x*w/(w/2) = 2x); odd dims still
    // follow the floor law sx = x*w/nw. Grid covers all four stride
    // classes of both source and destination widths.
    for (w <- Seq(4, 5, 6, 7, 8, 13); h <- Seq(2, 3, 4, 9)) {
      val src = encodeBmp(w, h, i => (i * 31 + 7) % 256)
      val (nw, nh) = (math.max(1, w / 2), math.max(1, h / 2))
      val out = resizeBmp(src, nw, nh)
      val info = decodeBmp(out)
      assert(info.width == nw && info.height == nh)
      assert(out.length == 54 + bmpStride(nw) * nh, s"${w}x$h size law")
      for (y <- 0 until nh; x <- 0 until nw; c <- 0 until 3) {
        val sx = (x.toLong * w / nw).toInt
        val sy = (y.toLong * h / nh).toInt
        assert(bmpChannel(out, x, y, c) == bmpChannel(src, sx, sy, c),
          s"${w}x$h -> ${nw}x$nh at ($x,$y,$c)")
      }
    }
    // identity resize is byte-identical (same dims → same stride/pixels)
    val img = encodeBmp(6, 4, i => (i * 3 + 1) % 256)
    assert(resizeBmp(img, 6, 4).toSeq == img.toSeq)
    // upscale refuses
    intercept[IllegalArgumentException](resizeBmp(img, 12, 4))
  }

  test("payload-sum closed form used by the DuckDB oracle holds") {
    // sum_{i<n} (i*k + c) % 256 = (n/256)*32640 + partial, gcd(k,256)=1
    for (k <- Seq(7, 11); c <- Seq(0L, 13L, 251L); n <- Seq(0, 1, 255, 256, 1000)) {
      val direct = (0 until n).map(i => ((i.toLong * k + c) % 256).toInt).sum.toLong
      val closed = (n / 256).toLong * 32640L +
        (0 until n % 256).map(j => ((j.toLong * k + c) % 256).toInt).sum.toLong
      assert(direct == closed, s"k=$k c=$c n=$n")
    }
  }
}
