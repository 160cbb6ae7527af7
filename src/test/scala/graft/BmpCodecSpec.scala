package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BmpCodec
import graft.ops.Multimodal

/** The pure-JVM 24-bit BMP codec behind the multimodal decoder seam:
  * byte-level format conformance plus encode→decode round trips across
  * every stride-padding class. No SparkSession needed — the codec is
  * plain JVM code; its Spark-side integration is oracle-checked by q131.
  */
class BmpCodecSpec extends AnyFunSuite {

  test("golden bytes: 2x2 image is byte-exact (header, BGR order, padding)") {
    // pixels: (0,0)=RGB(1,2,3) (1,0)=(4,5,6) (0,1)=(7,8,9) (1,1)=(10,11,12)
    val px = Map((0, 0) -> 0x010203, (1, 0) -> 0x040506,
                 (0, 1) -> 0x070809, (1, 1) -> 0x0a0b0c)
    val bytes = BmpCodec.encode(2, 2, (x, y) => px((x, y)))
    // stride = 2*3 rounded up to 4 bytes = 8; file = 14 + 40 + 2*8 = 70
    assert(bytes.length === 70)
    assert(bytes(0) === 'B'.toByte && bytes(1) === 'M'.toByte)
    assert(bytes(10) === 54) // pixel-array offset
    assert(bytes(18) === 2 && bytes(22) === 2) // width, height (LE low byte)
    assert(bytes(28) === 24) // bits per pixel
    // bottom-up: first file row is image row y=1, B-G-R per pixel, 2 pad
    val row0 = bytes.slice(54, 62).map(_ & 0xff).toSeq
    assert(row0 === Seq(9, 8, 7, 12, 11, 10, 0, 0))
    val row1 = bytes.slice(62, 70).map(_ & 0xff).toSeq
    assert(row1 === Seq(3, 2, 1, 6, 5, 4, 0, 0))
  }

  test("round trip recovers every pixel for all four stride-padding classes") {
    // widths 4..8 exercise row padding 0,1,2,3,0; heights vary too
    for (w <- 4 to 8; h <- 3 to 6) {
      val img = BmpCodec.decode(
        BmpCodec.encode(w, h, (x, y) => Multimodal.patternPixel(w * 100 + h, x, y)))
      assert(img.width === w && img.height === h)
      for (x <- 0 until w; y <- 0 until h)
        assert(img.pixel(x, y) === Multimodal.patternPixel(w * 100 + h, x, y),
          s"pixel ($x,$y) of ${w}x$h")
    }
  }

  test("top-down (negative height) BMPs decode with the same pixel origin") {
    val up = BmpCodec.encode(5, 4, (x, y) => Multimodal.patternPixel(7, x, y))
    // flip to top-down: negate height and reverse the row order in place
    val stride = 16 // (5*3 + 3) & ~3
    val down = up.clone()
    val hBytes = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-4).array()
    System.arraycopy(hBytes, 0, down, 22, 4)
    for (r <- 0 until 4)
      System.arraycopy(up, 54 + (3 - r) * stride, down, 54 + r * stride, stride)
    val img = BmpCodec.decode(down)
    for (x <- 0 until 5; y <- 0 until 4)
      assert(img.pixel(x, y) === Multimodal.patternPixel(7, x, y))
  }

  test("malformed input throws (quarantine-routable), never a wrong image") {
    val good = BmpCodec.encode(4, 3, (_, _) => 0x112233)
    intercept[IllegalArgumentException](BmpCodec.decode(Array[Byte](1, 2, 3)))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](BmpCodec.decode(badMagic))
    val truncated = good.take(good.length - 4)
    intercept[IllegalArgumentException](BmpCodec.decode(truncated))
    val bpp8 = good.clone(); bpp8(28) = 8
    intercept[IllegalArgumentException](BmpCodec.decode(bpp8))
  }

  test("hostile headers fail typed, not with an index/overflow escape") {
    def putIntLE(b: Array[Byte], at: Int, v: Int): Unit = {
      val e = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
      System.arraycopy(e, 0, b, at, 4)
    }
    val good = BmpCodec.encode(4, 3, (_, _) => 0x112233)
    // negative pixel offset: would index bytes(-1000+...) unguarded
    val negOff = good.clone(); putIntLE(negOff, 10, -1000)
    intercept[IllegalArgumentException](BmpCodec.decode(negOff))
    // offset past the end of the file
    val farOff = good.clone(); putIntLE(farOff, 10, good.length + 64)
    intercept[IllegalArgumentException](BmpCodec.decode(farOff))
    // absurd width: stride*height overflows Int unguarded
    val huge = good.clone(); putIntLE(huge, 18, 1 << 29)
    intercept[IllegalArgumentException](BmpCodec.decode(huge))
  }

  test("2x downsample keeps exactly the even-coordinate pixels at ceil-half dims") {
    val w = 7; val h = 5; val id = 42L
    val asset = Multimodal.Asset(id, "s",
      BmpCodec.encode(w, h, (x, y) => Multimodal.patternPixel(id, x, y)))
    val small = Multimodal.downsampleBmpBatch(Seq(asset)).head
    val img = BmpCodec.decode(small.content)
    assert(img.width === (w + 1) / 2 && img.height === (h + 1) / 2)
    for (y2 <- 0 until img.height; x2 <- 0 until img.width) {
      val expect = Multimodal.patternPixel(id, 2 * x2, 2 * y2)
      val got = (img.r(x2, y2) << 16) | (img.g(x2, y2) << 8) | img.b(x2, y2)
      assert(got === expect, s"pixel ($x2,$y2) must be source pixel (${2*x2},${2*y2})")
    }
  }

  test("wav decimation keeps the even-index samples at half the rate") {
    val id = 7L
    val samples = Array.tabulate(13)(Multimodal.patternSample(id, _))
    val asset = Multimodal.Asset(id, "s", graft.ops.WavCodec.encode(8000, samples))
    val half = Multimodal.decimateWavBatch(Seq(asset)).head
    val au = graft.ops.WavCodec.decode(half.content)
    assert(au.sampleRate === 4000)
    assert(au.samples.toSeq === (0 until 7).map(i => samples(2 * i)))
  }

  test("batch decoder reduces to exact integer stats") {
    val id = 42L
    val a = Multimodal.Asset(id, "s",
      BmpCodec.encode(6, 5, (x, y) => Multimodal.patternPixel(id, x, y)))
    val st = Multimodal.decodeBmpBatch(Seq(a)).head
    var (sr, sg, sb, wl) = (0L, 0L, 0L, 0L)
    for (y <- 0 until 5; x <- 0 until 6) {
      val base = id * 31 + x * 7 + y * 13
      val (r, g, b) = (base % 256, (base + 41) % 256, (base + 82) % 256)
      sr += r; sg += g; sb += b; wl += (y * 6 + x) * (r + g + b)
    }
    assert((st.sum_r, st.sum_g, st.sum_b, st.wlum) === ((sr, sg, sb, wl)))
    assert(st.width === 6 && st.height === 5)
  }

  test("q399 edge-energy decoder matches a pixel-walk mirror") {
    import graft.ops.{BmpCodec, Multimodal}
    for (id <- Seq(2L, 11L, 42L)) {
      val (w, h) = ((4 + id % 5).toInt, (3 + id % 4).toInt)
      val bytes = BmpCodec.encode(w, h,
        (x, y) => Multimodal.patternPixel(id, x, y))
      val st = Multimodal.edgeBmpBatch(
        Seq(Multimodal.Asset(id, "s", bytes))).head
      def lum(x: Int, y: Int) = {
        val base = id * 31 + x * 7 + y * 13
        base % 256 + (base + 41) % 256 + (base + 82) % 256
      }
      var (gh, gv) = (0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        if (x + 1 < w) gh += math.abs(lum(x + 1, y) - lum(x, y))
        if (y + 1 < h) gv += math.abs(lum(x, y + 1) - lum(x, y))
      }
      assert(st.width == w.toLong && st.height == h.toLong)
      assert(st.grad_h == gh, s"img $id grad_h")
      assert(st.grad_v == gv, s"img $id grad_v")
    }
  }
}
