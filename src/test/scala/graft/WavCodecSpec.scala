package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, WavCodec}

/** The pure-JVM PCM16 mono WAV codec behind the multimodal decoder seam:
  * byte-level RIFF conformance plus encode→decode round trips and
  * strict-parse failure modes. No SparkSession needed — the codec is
  * plain JVM code; its Spark-side integration is oracle-checked by q192.
  */
class WavCodecSpec extends AnyFunSuite {

  test("golden bytes: 2-sample clip is byte-exact (chunk tags, LE fields, sample order)") {
    val bytes = WavCodec.encode(8000, Array[Short](1, -2))
    assert(bytes.length === 48) // 44-byte header + 2×2 data
    assert(new String(bytes.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
    assert(new String(bytes.slice(12, 16), "US-ASCII") === "fmt ")
    assert(new String(bytes.slice(36, 40), "US-ASCII") === "data")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    assert(buf.getInt(4) === 40)        // RIFF size = 36 + 4
    assert(buf.getShort(20) === 1)      // PCM
    assert(buf.getShort(22) === 1)      // mono
    assert(buf.getInt(24) === 8000)     // sample rate
    assert(buf.getShort(34) === 16)     // bits per sample
    assert(buf.getInt(40) === 4)        // data length
    assert(buf.getShort(44) === 1 && buf.getShort(46) === -2)
  }

  test("round trip recovers every sample across clip lengths") {
    for (id <- 0L to 20L; n <- Seq(1, 8, 15)) {
      val samples = Array.tabulate(n)(Multimodal.patternSample(id, _))
      val au = WavCodec.decode(WavCodec.encode(8000, samples))
      assert(au.sampleRate === 8000)
      assert(au.samples.toSeq === samples.toSeq, s"clip $id len $n")
    }
  }

  test("strict parse rejects corrupted headers (quarantine contract)") {
    val good = WavCodec.encode(8000, Array[Short](5, 6, 7))
    assertThrows[IllegalArgumentException](WavCodec.decode(good.take(10)))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](WavCodec.decode(badMagic))
    val badBits = good.clone(); badBits(34) = 8 // claim 8-bit samples
    assertThrows[IllegalArgumentException](WavCodec.decode(badBits))
    val truncated = good.dropRight(1) // data length now inconsistent
    assertThrows[IllegalArgumentException](WavCodec.decode(truncated))
  }

  test("q398 zero-crossing/frame decoder matches a sample-walk mirror") {
    import graft.ops.Multimodal
    for (id <- Seq(0L, 7L, 23L)) {
      val n = (16 + id % 16).toInt
      val samples = Array.tabulate(n)(Multimodal.patternSample(id, _))
      val asset = Multimodal.Asset(id, "s",
        WavCodec.encode(8000, samples))
      val st = Multimodal.zcWavBatch(Seq(asset)).head
      val vs = samples.map(_.toLong)
      val zc = (1 until n).count(k => (vs(k) >= 0) != (vs(k - 1) >= 0)).toLong
      val frames = vs.grouped(8).toSeq
      assert(st.n_samples == n.toLong)
      assert(st.zero_crossings == zc, s"clip $id zc")
      assert(st.sum_sq == vs.map(v => v * v).sum)
      assert(st.n_frames == frames.length.toLong)
      assert(st.max_frame_sumabs == frames.map(_.map(math.abs).sum).max)
    }
  }

  test("q400 silence-run decoder matches a run-walk mirror") {
    import graft.ops.Multimodal
    for (id <- Seq(1L, 9L, 30L)) {
      val n = (16 + id % 16).toInt
      val samples = Array.tabulate(n)(Multimodal.patternSample(id, _))
      val st = Multimodal.silenceWavBatch(Seq(Multimodal.Asset(id, "s",
        WavCodec.encode(8000, samples)))).head
      val flags = samples.map(v => math.abs(v.toLong) < Multimodal.SilenceT)
      val runs = flags.foldLeft(List.empty[Long]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 =>
          (acc.head + 1) :: acc.tail
        case (acc, true) => 1L :: acc
        case (acc, false) => 0L :: acc
      }.filter(_ > 0)
      assert(st.n_silent == flags.count(identity).toLong, s"clip $id silent")
      assert(st.n_runs == runs.length.toLong, s"clip $id runs")
      assert(st.max_run == (if (runs.isEmpty) 0L else runs.max))
    }
  }
}
