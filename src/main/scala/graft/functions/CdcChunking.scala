package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary kernel for q426.
  *
  * Computes, in ONE pass over the text, the exact array the query's
  * declarative form builds per document:
  *
  * {{{
  * concat(array(0),
  *   filter(sequence(8, length(text)), i -> i < length(text) AND
  *     CAST(conv(substring(md5(substring(text, i - 7, 8)), 1, 8), 16, 10)
  *          AS BIGINT) % 64 = 0),
  *   array(length(text)))
  * }}}
  *
  * The declarative form is the DECLARED cut predicate (the DuckDB oracle
  * replays it verbatim) but its Spark evaluation is an interpreted
  * higher-order-function lambda: per character it allocates the 8-char
  * window substring, runs MD5 through the hex-string codec, re-parses 8
  * hex chars with conv(), casts, and takes the modulo — microseconds per
  * position where the underlying decision needs none of the allocations.
  * Algebra used here, all exact:
  *
  *  - `conv(substring(hex, 1, 8), 16, 10)` is the first 4 digest bytes as
  *    a big-endian unsigned 32-bit value v; `v % 64` is `digest[3] & 63`.
  *  - MD5's first output word is the little-endian A register, so
  *    `digest[3] = (A >>> 24) & 0xFF` and the cut predicate collapses to
  *    `((A >>> 24) & 63) == 0` — only the A register of a single-block
  *    MD5 (window ≤ 32 UTF-8 bytes < 56) is ever needed.
  *  - For ASCII text (char = byte) the padded MD5 block differs between
  *    positions only in message words 0–1, so the kernel writes two ints
  *    and runs the 64-round compression; no per-position buffers at all.
  *
  * Equality with the declarative form (including non-ASCII, where the
  * window is 8 CHARS = up to 32 bytes) is spec-asserted over generated
  * corpora (OpsSpec "q426 boundary kernel"). The MD5 round constants and
  * shifts are the RFC 1321 table.
  */
object CdcKernel {

  // RFC 1321 T-table: floor(abs(sin(i + 1)) * 2^32), i = 0..63.
  private val K: Array[Int] = Array(
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee,
    0xf57c0faf, 0x4787c62a, 0xa8304613, 0xfd469501,
    0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821,
    0xf61e2562, 0xc040b340, 0x265e5a51, 0xe9b6c7aa,
    0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed,
    0xa9e3e905, 0xfcefa3f8, 0x676f02d9, 0x8d2a4c8a,
    0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70,
    0x289b7ec6, 0xeaa127fa, 0xd4ef3085, 0x04881d05,
    0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039,
    0x655b59c3, 0x8f0ccc92, 0xffeff47d, 0x85845dd1,
    0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391)

  private val S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  /** Final A register of single-block MD5 over message words `m`. */
  private def md5A(m: Array[Int]): Int = {
    var a = 0x67452301
    var b = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476
    var i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (b & c) | (~b & d); g = i }
      else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
      else { f = c ^ (b | ~d); g = (7 * i) & 15 }
      val tmp = d
      d = c
      c = b
      val sum = a + f + K(i) + m(g)
      b = b + Integer.rotateLeft(sum, S(i))
      a = tmp
      i += 1
    }
    0x67452301 + a
  }

  /** Cut predicate at (1-based char) position i: low 6 bits of the 4th
    * MD5 digest byte of the trailing 8-char window are zero. */
  @inline private def cut(m: Array[Int]): Boolean =
    ((md5A(m) >>> 24) & 63) == 0

  def boundaries(s: UTF8String): ArrayData = {
    val nChars = s.numChars()
    var out = new Array[Int](math.max(4, nChars / 32 + 4))
    var n = 0
    @inline def add(v: Int): Unit = {
      if (n == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
      out(n) = v
      n += 1
    }
    add(0)
    if (nChars > 8) {
      val bytes = s.getBytes
      val m = new Array[Int](16)
      if (bytes.length == nChars) {
        // ASCII fast path: the window is bytes [i-8, i) (0-based) for the
        // 1-based position i; the padded block is constant except words
        // 0-1 (8 window bytes), 0x80 pad in word 2, bit length 64 in 14.
        m(2) = 0x80
        m(14) = 64
        var i = 8
        while (i < nChars) {
          val o = i - 8
          m(0) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
            ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
          m(1) = (bytes(o + 4) & 0xff) | ((bytes(o + 5) & 0xff) << 8) |
            ((bytes(o + 6) & 0xff) << 16) | ((bytes(o + 7) & 0xff) << 24)
          if (cut(m)) add(i)
          i += 1
        }
      } else {
        // Generic path: char c starts at byte offs(c); the window for
        // position i is bytes [offs(i-8), offs(i)) — 8 chars, ≤ 32 bytes,
        // always a single padded MD5 block.
        val offs = new Array[Int](nChars + 1)
        var c = 0
        var o = 0
        while (c < nChars) {
          offs(c) = o
          val b = bytes(o) & 0xff
          o += (if (b < 0x80) 1
                else if ((b & 0xe0) == 0xc0) 2
                else if ((b & 0xf0) == 0xe0) 3
                else 4)
          c += 1
        }
        offs(nChars) = bytes.length
        var i = 8
        while (i < nChars) {
          val start = offs(i - 8)
          val end = offs(i)
          val len = end - start
          java.util.Arrays.fill(m, 0)
          var j = 0
          while (j < len) {
            m(j >> 2) |= (bytes(start + j) & 0xff) << ((j & 3) << 3)
            j += 1
          }
          m(len >> 2) |= 0x80 << ((len & 3) << 3)
          m(14) = len << 3
          if (cut(m)) add(i)
          i += 1
        }
      }
    }
    add(nChars)
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, n))
  }
}

/** `cdc_boundaries(text)` — array<int> of q426's chunk boundaries:
  * 0, every cut position, length(text). See [[CdcKernel]]. */
case class CdcBoundaries(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def nullSafeEval(s: Any): Any =
    CdcKernel.boundaries(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcKernel.boundaries($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CdcChunking {
  def cdc_boundaries(c: Column): Column =
    ColumnBridge.column(CdcBoundaries(ColumnBridge.expression(c)))
}
