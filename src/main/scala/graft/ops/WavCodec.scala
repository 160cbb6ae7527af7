package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM PCM16 mono WAV codec — the AUDIO sibling of [[BmpCodec]]
  * behind the multimodal seam ([[Multimodal.decodeAssetsAs]]). RIFF/WAVE
  * is a public, spec-stable container (little-endian chunked headers,
  * 16-bit signed little-endian samples) needing no codec library, so the
  * bytes→samples step is genuinely exercised offline: q192 encodes
  * deterministic sample streams, ships them through the binary-column
  * plumbing, decodes with THIS parser, and the DuckDB oracle recomputes
  * the expected sample statistics arithmetically — a header-offset,
  * endianness, or sample-order bug surfaces as an oracle hash mismatch.
  *
  * Same strict-parse contract as [[BmpCodec]] (decode throws on
  * malformed input — A4/A9 quarantine semantics, cf. the reference's
  * RecordConverter.java:29-82 per-field throws).
  */
object WavCodec {

  private val HeaderSize = 44 // canonical RIFF + fmt(16) + data header

  final case class Audio(sampleRate: Int, samples: Array[Short])

  /** Encode mono PCM16 samples into a canonical 44-byte-header WAV. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(HeaderSize + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataLen) // chunk size = file size - 8
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)           // PCM fmt chunk length
    buf.putShort(1)          // audio format: PCM
    buf.putShort(1)          // channels: mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate (mono 16-bit)
    buf.putShort(2)          // block align
    buf.putShort(16)         // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Strict decode: validates every header field this encoder pins. */
  def decode(bytes: Array[Byte]): Audio = {
    require(bytes.length >= HeaderSize, s"truncated WAV (${bytes.length} B)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(expect: String): Unit = {
      val got = Array.fill(4)(buf.get()).map(_.toChar).mkString
      require(got == expect, s"bad chunk tag: expected $expect got $got")
    }
    tag("RIFF")
    val riffLen = buf.getInt
    tag("WAVE")
    tag("fmt ")
    require(buf.getInt == 16, "non-PCM fmt chunk length")
    require(buf.getShort == 1, "not PCM")
    require(buf.getShort == 1, "not mono")
    val rate = buf.getInt
    buf.getInt   // byte rate
    buf.getShort // block align
    require(buf.getShort == 16, "not 16-bit")
    tag("data")
    val dataLen = buf.getInt
    require(dataLen % 2 == 0 && dataLen == bytes.length - HeaderSize,
      s"data length $dataLen inconsistent with file size ${bytes.length}")
    require(riffLen == 36 + dataLen, s"RIFF size $riffLen inconsistent")
    val samples = new Array[Short](dataLen / 2)
    var i = 0
    while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
    Audio(rate, samples)
  }
}
