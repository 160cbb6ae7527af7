package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM 24-bit uncompressed BMP codec (Windows BITMAPINFOHEADER,
  * `BI_RGB`) — the REAL decoder behind the multimodal seam
  * ([[Multimodal.decodeAssets]]). BMP is a public, spec-stable format
  * (little-endian headers, bottom-up rows, B-G-R channel order, rows
  * padded to 4-byte boundaries) that needs no codec library, so the
  * bytes→pixels step can be genuinely exercised in this offline
  * container: q131 encodes deterministic images, ships them through the
  * binary-column plumbing, decodes them with THIS parser, and the
  * DuckDB oracle recomputes the expected pixel statistics arithmetically
  * — a header-offset, stride, row-order, or channel-order bug all
  * surface as an oracle hash mismatch, not a silently-wrong feature.
  *
  * Mirrors the reference's convert layer contract (strict parse with
  * typed failure, cf. RecordConverter.java:29-82's per-field throws):
  * decode throws on malformed input rather than guessing, so the caller
  * can route the row to quarantine (A4/A9 semantics).
  */
object BmpCodec {

  private val FileHeaderSize = 14
  private val InfoHeaderSize = 40

  /** Decoded image: dimensions plus row-major top-left-origin pixels,
    * each packed 0xRRGGBB.
    */
  final case class Image(width: Int, height: Int, pixels: Array[Int]) {
    def pixel(x: Int, y: Int): Int = pixels(y * width + x)
    def r(x: Int, y: Int): Int = (pixel(x, y) >> 16) & 0xff
    def g(x: Int, y: Int): Int = (pixel(x, y) >> 8) & 0xff
    def b(x: Int, y: Int): Int = pixel(x, y) & 0xff
  }

  private def rowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Encode a top-left-origin pixel function into a standards-conformant
    * bottom-up 24-bit BMP (BM magic, 54-byte header block, padded rows,
    * B-G-R byte order).
    */
  def encode(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val stride = rowStride(width)
    val size = FileHeaderSize + InfoHeaderSize + stride * height
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(size)
    buf.putInt(0) // reserved
    buf.putInt(FileHeaderSize + InfoHeaderSize) // pixel-array offset
    buf.putInt(InfoHeaderSize)
    buf.putInt(width)
    buf.putInt(height) // positive = bottom-up row order
    buf.putShort(1)    // planes
    buf.putShort(24)   // bits per pixel
    buf.putInt(0)      // BI_RGB (uncompressed)
    buf.putInt(stride * height)
    buf.putInt(2835).putInt(2835) // 72 DPI in px/metre
    buf.putInt(0).putInt(0)       // palette size / important colors
    var fileRow = 0
    while (fileRow < height) {
      val y = height - 1 - fileRow // bottom-up: last image row first
      var x = 0
      while (x < width) {
        val p = rgb(x, y)
        buf.put((p & 0xff).toByte)         // B
        buf.put(((p >> 8) & 0xff).toByte)  // G
        buf.put(((p >> 16) & 0xff).toByte) // R
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      fileRow += 1
    }
    buf.array()
  }

  /** Strict decode: BM magic, 24bpp, BI_RGB only; honors the header's
    * pixel-array offset and both row orders (positive height = bottom-up,
    * negative = top-down). Throws `IllegalArgumentException` on anything
    * malformed — quarantine-routable, never a silent wrong answer.
    */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= FileHeaderSize + InfoHeaderSize,
      s"truncated BMP: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get(0) == 'B' && buf.get(1) == 'M', "bad BMP magic")
    val pixelOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(bpp == 24, s"unsupported bpp $bpp (only 24-bit)")
    require(compression == 0, s"unsupported compression $compression (only BI_RGB)")
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0, s"bad dimensions ${width}x$rawHeight")
    // a hostile/corrupt header must fail the TYPED way, not escape as
    // an ArrayIndexOutOfBounds: the offset can be negative or point
    // past the file, and stride·height can overflow Int for absurd
    // dimensions — cap dims below Int overflow in rowStride, then
    // validate the full extent in Long before any indexing
    require(width <= (1 << 28) && height <= (1 << 28),
      s"implausible dimensions ${width}x$height")
    require(pixelOffset >= FileHeaderSize + InfoHeaderSize &&
      pixelOffset <= bytes.length,
      s"bad pixel-array offset $pixelOffset")
    val stride = rowStride(width)
    val need = pixelOffset.toLong + stride.toLong * height.toLong
    require(bytes.length.toLong >= need,
      s"pixel array truncated: need $need, have ${bytes.length}")
    val pixels = new Array[Int](width * height)
    var fileRow = 0
    while (fileRow < height) {
      val y = if (topDown) fileRow else height - 1 - fileRow
      val rowBase = pixelOffset + fileRow * stride
      var x = 0
      while (x < width) {
        val i = rowBase + x * 3
        val b = bytes(i) & 0xff
        val g = bytes(i + 1) & 0xff
        val r = bytes(i + 2) & 0xff
        pixels(y * width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      fileRow += 1
    }
    Image(width, height, pixels)
  }
}
