package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Multimodal-column plumbing (B13): opaque binary payloads + typed
  * metadata, decoded by a per-partition decoder and aggregated downstream.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * STUB decoder (clearly marked): it derives deterministic fake features
  * from the bytes. Everything around it — the binary column, the typed
  * Dataset boundary, the mapPartitions batch shape, the metadata schema,
  * the downstream aggregation — is the real plumbing a codec would plug
  * into (swap `decodeStub`'s body for an actual decoder; signature stays).
  */
object Multimodal {

  /** Raw asset: content is an opaque binary payload. */
  case class Asset(doc_id: Long, source: String, content: Array[Byte])

  /** Typed metadata a decoder would produce. */
  case class DecodedAsset(doc_id: Long, source: String, n_bytes: Long,
                          width: Long, height: Long, first_byte: Long,
                          brightness: Double)

  /** STUB decode — deterministic fake features in place of a codec:
    * dimensions from the byte length, brightness from the first byte.
    * A real implementation would decode `a.content` here (and only here).
    */
  def decodeStub(a: Asset): DecodedAsset = {
    val len = a.content.length.toLong
    val first = if (a.content.nonEmpty) a.content(0) & 0xff else 0
    DecodedAsset(a.doc_id, a.source, len,
      width = 64 + len % 64, height = 64 + len % 48,
      first_byte = first.toLong, brightness = first / 255.0)
  }

  /** The decode boundary: binary-payload DataFrame → typed Dataset →
    * per-partition BATCHED decode → DataFrame. Batching is the load-bearing
    * shape (mapInPandas/mapInArrow image): a real codec initializes once
    * and decodes `batchSize` payloads per call — model/codec setup and
    * accelerator transfer amortize across the batch instead of being paid
    * per row. The stub decodes elementwise inside the batch; swapping in
    * a real `Seq[Asset] => Seq[DecodedAsset]` keeps every signature. */
  def decodeAssets(df: DataFrame, batchSize: Int = 64,
                   decoder: Seq[Asset] => Seq[DecodedAsset] = decodeBatch): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // `decoder` is the injection seam: a real codec (or a test double)
    // drops in without touching the pipeline — it must be serializable,
    // since it ships to executors inside the mapPartitions closure.
    df.as[Asset].mapPartitions {
      _.grouped(batchSize).flatMap(decoder)
    }.toDF()
  }

  /** One codec call per batch — the seam a real decoder replaces. */
  def decodeBatch(batch: Seq[Asset]): Seq[DecodedAsset] =
    batch.map(decodeStub)

  /** Typed variant of [[decodeAssets]]: same binary-column → batched
    * per-partition decode shape, but the decoder picks its own output
    * row type (a real pipeline's feature schema is decoder-specific).
    * q131 plugs the REAL BMP parser in here — proof the seam takes an
    * actual codec, not only the stub. */
  def decodeAssetsAs[T <: Product](df: DataFrame, batchSize: Int)(
      decoder: Seq[Asset] => Seq[T])(
      implicit ev: org.apache.spark.sql.Encoder[T]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[Asset].mapPartitions(_.grouped(batchSize).flatMap(decoder)).toDF()
  }

  /** Real decoded-image features (q131): exact integer pixel statistics.
    * `wlum` is the POSITION-weighted luminance sum Σ (y·w+x)·(r+g+b) —
    * order-sensitive, so a decoder that flips row order or swaps the
    * B-G-R channels produces a different number even when the plain
    * channel sums collide. */
  case class ImageStats(doc_id: Long, width: Long, height: Long,
                        sum_r: Long, sum_g: Long, sum_b: Long, wlum: Long)

  /** Deterministic test-pattern pixel: channel c of pixel (x,y) of image
    * `docId` is (docId·31 + x·7 + y·13 + c·41) mod 256. Pure integer —
    * the DuckDB oracle recomputes it arithmetically, making the full
    * encode→bytes→decode round trip hash-checkable. */
  def patternPixel(docId: Long, x: Int, y: Int): Int = {
    val base = docId * 31 + x * 7 + y * 13
    val r = ((base) % 256).toInt
    val g = ((base + 41) % 256).toInt
    val b = ((base + 82) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** The real-codec batch decoder: parse actual BMP bytes, reduce to
    * exact integer stats. */
  def decodeBmpBatch(batch: Seq[Asset]): Seq[ImageStats] = batch.map { a =>
    val img = BmpCodec.decode(a.content)
    var (sr, sg, sb, wl) = (0L, 0L, 0L, 0L)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val (r, g, b) = (img.r(x, y), img.g(x, y), img.b(x, y))
        sr += r; sg += g; sb += b
        wl += (y.toLong * img.width + x) * (r + g + b)
        x += 1
      }
      y += 1
    }
    ImageStats(a.doc_id, img.width, img.height, sr, sg, sb, wl)
  }

  /** One perceptual-hash row per image for q363. */
  case class ImageHash(doc_id: Long, source: String, width: Long,
                       height: Long, ahash: Long)

  /** Per-image Otsu stats (q430): exact integer argmax of the between-
    * class variance over the distinct-luminance threshold grid. */
  case class OtsuStats(doc_id: Long, source: String, width: Long,
                       height: Long, otsu_t: Long, fg_px: Long)

  /** Otsu batch decoder (q430): luminance = (2r+5g+b) DIV 8 (the q363
    * aHash convention); between-class variance compared through the
    * floor-scaled integer score (s0·n − s·c0)²·10⁶ DIV (c0·(n−c0)) —
    * a DEFINED fixed-point algorithm the oracle replays digit-
    * identically (no doubles, ties break to the SMALLEST threshold).
    * Sweeping only distinct luminances below the max is exact: the
    * score is constant on each inter-value plateau and the smallest-t
    * tie-break lands on a distinct value. A flat image (no candidate)
    * degenerates to t = max luminance with zero foreground. */
  def otsuBmpBatch(batch: Seq[Asset]): Seq[OtsuStats] = batch.map { a =>
    val img = BmpCodec.decode(a.content)
    val n = img.width * img.height
    val lums = new Array[Long](n)
    var sum = 0L
    var y = 0; var i = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        lums(i) = (2L * img.r(x, y) + 5L * img.g(x, y) + img.b(x, y)) / 8
        sum += lums(i); i += 1; x += 1
      }
      y += 1
    }
    val maxL = lums.max
    var bestF = -1L
    var bestT = maxL
    lums.distinct.sorted.foreach { t =>
      if (t < maxL) {
        var c0 = 0L; var s0 = 0L
        lums.foreach { l => if (l <= t) { c0 += 1; s0 += l } }
        val num = s0 * n - sum * c0
        val f = num * num * 1000000L / (c0 * (n - c0))
        if (f > bestF) { bestF = f; bestT = t }
      }
    }
    OtsuStats(a.doc_id, a.source, img.width, img.height, bestT,
      lums.count(_ > bestT).toLong)
  }

  /** aHash batch decoder (q363): parse actual BMP bytes, threshold each
    * pixel's integer luminance (2r+5g+b) DIV 8 against the image mean,
    * pack bits row-major. ≤48 pixels per image keeps the hash in int64. */
  def ahashBmpBatch(batch: Seq[Asset]): Seq[ImageHash] = batch.map { a =>
    val img = BmpCodec.decode(a.content)
    val n = img.width * img.height
    val lums = new Array[Long](n)
    var sum = 0L
    var y = 0
    var i = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        lums(i) = (2L * img.r(x, y) + 5L * img.g(x, y) + img.b(x, y)) / 8
        sum += lums(i)
        i += 1; x += 1
      }
      y += 1
    }
    val mean = sum / n
    var h = 0L
    i = 0
    while (i < n) { if (lums(i) > mean) h |= (1L << i); i += 1 }
    ImageHash(a.doc_id, a.source, img.width, img.height, h)
  }

  /** One (channel, 64-wide intensity bin) count row for q333. */
  case class ChannelBin(doc_id: Long, source: String, channel: String,
                        bin: Long, cnt: Long)

  /** Histogram batch decoder (q333): parse actual BMP bytes, bin each
    * channel's pixels into four intensity classes, emit 12 PRE-REDUCED
    * rows per image — pixels never leave the batch. */
  def histogramBmpBatch(batch: Seq[Asset]): Seq[ChannelBin] = batch.flatMap { a =>
    val img = BmpCodec.decode(a.content)
    val counts = Array.ofDim[Long](3, 4)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        counts(0)(img.r(x, y) / 64) += 1
        counts(1)(img.g(x, y) / 64) += 1
        counts(2)(img.b(x, y) / 64) += 1
        x += 1
      }
      y += 1
    }
    for (c <- 0 until 3; b <- 0 until 4)
      yield ChannelBin(a.doc_id, a.source, Seq("r", "g", "b")(c), b.toLong,
        counts(c)(b))
  }

  /** Real decoded-audio features (q192): exact integer sample stats.
    * `wsum` is the position-weighted SIGNED sum Σ (k+1)·sₖ — a decoder
    * that reverses sample order or flips endianness produces a
    * different number even when |s| aggregates collide. */
  case class AudioStats(doc_id: Long, sample_rate: Long, n_samples: Long,
                        sum_abs: Long, peak: Long, wsum: Long)

  /** REAL 2× nearest-neighbor DOWNSAMPLE through the codec — the
    * resize step of the original multimodal mandate made real (the
    * metadata-only `resizeStub` remains for the stub pipeline): parse
    * actual BMP bytes, keep the even-coordinate pixels, and RE-ENCODE
    * a standards-conformant BMP. Output dimensions are ⌈w/2⌉×⌈h/2⌉.
    * Runs inside the same batched mapPartitions seam as every codec. */
  def downsampleBmpBatch(batch: Seq[Asset]): Seq[Asset] = batch.map { a =>
    val img = BmpCodec.decode(a.content)
    val (w2, h2) = ((img.width + 1) / 2, (img.height + 1) / 2)
    Asset(a.doc_id, a.source, BmpCodec.encode(w2, h2, (x, y) =>
      (img.r(2 * x, 2 * y) << 16) | (img.g(2 * x, 2 * y) << 8) |
        img.b(2 * x, 2 * y)))
  }

  /** REAL audio DECIMATION through the codec — keep every 2nd sample
    * and RE-ENCODE a conformant WAV at HALF the sample rate (the
    * simplest correct resample for a band-limited-enough signal; a
    * production pipeline inserts an anti-alias filter before this
    * exact step). Same batched seam as every codec. */
  def decimateWavBatch(batch: Seq[Asset]): Seq[Asset] = batch.map { a =>
    val au = WavCodec.decode(a.content)
    val half = Array.tabulate((au.samples.length + 1) / 2)(i => au.samples(2 * i))
    Asset(a.doc_id, a.source, WavCodec.encode(au.sampleRate / 2, half))
  }

  /** Deterministic test-pattern sample k of clip `docId`: pure integer,
    * range-exact int16 — the DuckDB oracle recomputes it
    * arithmetically, making the encode→bytes→decode round trip
    * hash-checkable (the audio twin of [[patternPixel]]). */
  def patternSample(docId: Long, k: Int): Short =
    (((docId * 31 + k.toLong * 7919) % 65536) - 32768).toShort

  /** Per-clip gain-staging stats (q439): exact integer peak/energy/
    * clip census through the real WAV codec. */
  case class HeadroomStats(doc_id: Long, source: String, n_samples: Long,
                           peak: Long, energy: Long, n_clipped: Long)

  /** Headroom batch decoder (q439): peak |sample|, Σv² energy, and the
    * count of full-scale samples (|v| ≥ 32767 — the int16 rails, both
    * of them: −32768 clips too). All exact integers; the oracle
    * replays the pattern arithmetically. */
  def headroomWavBatch(batch: Seq[Asset]): Seq[HeadroomStats] =
    batch.map { a =>
      val au = WavCodec.decode(a.content)
      var (pk, en, cl) = (0L, 0L, 0L)
      var k = 0
      while (k < au.samples.length) {
        val v = au.samples(k).toLong
        val av = math.abs(v)
        if (av > pk) pk = av
        en += v * v
        if (av >= 32767L) cl += 1
        k += 1
      }
      HeadroomStats(a.doc_id, a.source, au.samples.length.toLong, pk, en, cl)
    }

  /** The real-codec audio batch decoder: parse actual WAV bytes, reduce
    * to exact integer stats. */
  def decodeWavBatch(batch: Seq[Asset]): Seq[AudioStats] = batch.map { a =>
    val au = WavCodec.decode(a.content)
    var (sa, pk, ws) = (0L, 0L, 0L)
    var k = 0
    while (k < au.samples.length) {
      val v = au.samples(k).toLong
      sa += math.abs(v)
      pk = math.max(pk, math.abs(v))
      ws += (k + 1) * v
      k += 1
    }
    AudioStats(a.doc_id, au.sampleRate.toLong, au.samples.length.toLong,
      sa, pk, ws)
  }

  /** q400 silence threshold: |sample| below this is silence. ONE
    * constant interpolated into both engines. */
  val SilenceT = 8192L

  case class AudioZc(doc_id: Long, n_samples: Long, zero_crossings: Long,
                     sum_sq: Long, n_frames: Long, max_frame_sumabs: Long)

  /** Zero-crossing + frame-loudness decoder (q398): sign convention is
    * v ≥ 0 ⇒ positive (zero counts as positive — one rule both engines
    * replay); frames are non-overlapping 8-sample windows, last one
    * partial. */
  def zcWavBatch(batch: Seq[Asset]): Seq[AudioZc] = batch.map { a =>
    val au = WavCodec.decode(a.content)
    var (zc, ssq) = (0L, 0L)
    var (frameSum, maxFrame, nFrames) = (0L, 0L, 0L)
    var k = 0
    while (k < au.samples.length) {
      val v = au.samples(k).toLong
      ssq += v * v
      if (k > 0 && (v >= 0) != (au.samples(k - 1) >= 0)) zc += 1
      if (k % 8 == 0) { frameSum = 0L; nFrames += 1 }
      frameSum += math.abs(v)
      maxFrame = math.max(maxFrame, frameSum)
      k += 1
    }
    AudioZc(a.doc_id, au.samples.length.toLong, zc, ssq, nFrames, maxFrame)
  }

  case class AudioRuns(doc_id: Long, n_samples: Long, n_silent: Long,
                       n_runs: Long, max_run: Long)

  /** Silence-run decoder (q400): maximal runs of consecutive samples
    * with |v| < [[SilenceT]]. */
  def silenceWavBatch(batch: Seq[Asset]): Seq[AudioRuns] = batch.map { a =>
    val au = WavCodec.decode(a.content)
    var (nSil, nRuns, maxRun, cur) = (0L, 0L, 0L, 0L)
    var k = 0
    while (k < au.samples.length) {
      if (math.abs(au.samples(k).toLong) < SilenceT) {
        if (cur == 0L) nRuns += 1
        cur += 1; nSil += 1
        maxRun = math.max(maxRun, cur)
      } else cur = 0L
      k += 1
    }
    AudioRuns(a.doc_id, au.samples.length.toLong, nSil, nRuns, maxRun)
  }

  case class ImageEdges(doc_id: Long, width: Long, height: Long,
                        grad_h: Long, grad_v: Long)

  /** L1 gradient-energy decoder (q399) over luminance = r + g + b. */
  def edgeBmpBatch(batch: Seq[Asset]): Seq[ImageEdges] = batch.map { a =>
    val img = BmpCodec.decode(a.content)
    def lum(x: Int, y: Int) = (img.r(x, y) + img.g(x, y) + img.b(x, y)).toLong
    var (gh, gv) = (0L, 0L)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        if (x + 1 < img.width) gh += math.abs(lum(x + 1, y) - lum(x, y))
        if (y + 1 < img.height) gv += math.abs(lum(x, y + 1) - lum(x, y))
        x += 1
      }
      y += 1
    }
    ImageEdges(a.doc_id, img.width, img.height, gh, gv)
  }

  /** STUB resize — a real implementation rescales pixels; the stub halves
    * the fake dimensions, preserving the typed metadata contract. */
  def resizeStub(m: DecodedAsset, maxDim: Long): DecodedAsset = {
    var (w, h) = (m.width, m.height)
    while (math.max(w, h) > maxDim) { w = w / 2; h = h / 2 }
    m.copy(width = w, height = h)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B13: binary assets → stub decode → per-source content stats with
    // hash-based dedup counting.
    "q30_multimodal_stats" -> { (s, d) =>
      val assets = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
                col("text").cast("binary").as("content"))
      val meta = decodeAssets(assets)
      val hashes = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("chash"))
      meta.join(hashes, "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_assets"),
             countDistinct(col("chash")).as("n_unique"),
             sum(col("n_bytes")).as("total_bytes"),
             max(col("width")).as("max_width"),
             max(col("height")).as("max_height"),
             // exact-integer numerator keeps the double division identical
             // across engines (brightness itself is first_byte/255.0)
             (sum(col("first_byte")).cast("double") /
               count(lit(1)) / 255.0).as("avg_brightness"))
        .orderBy("source")
    },

    // B13: frame sampling over a "video" asset — the asset's byte stream
    // is segmented into fixed 64-byte frames, every 3rd frame is sampled
    // (the temporal-downsampling pass a video pipeline runs before
    // feature extraction), and per-frame features aggregate per asset.
    // Everything is codegen'd Catalyst expressions over the payload —
    // no UDF; a real codec would only replace the byte→frame mapping.
    // Exact integer frame sums keep the oracle bit-identical.
    "q52_multimodal_frames" -> { (s, d) =>
      Tables.documents(s, d)
        // empty assets excluded on BOTH sides: Spark's sequence(0, -1)
        // yields a DESCENDING [0, -1] (one spurious frame) where DuckDB's
        // generate_series(0, -1) is empty — same trap shingleExpr guards
        .filter(col("doc_id") % 31 === 0 && length(col("text")) >= 1)
        .select(col("doc_id"), col("text"),
          explode(expr("sequence(0, CAST(ceil(length(text) / 64.0) AS INT) - 1)")).as("f"))
        .filter(col("f") % 3 === 0)
        .withColumn("frame", expr("substring(text, f * 64 + 1, 64)"))
        .withColumn("fsum",
          expr("aggregate(transform(sequence(1, length(frame)), i -> ascii(substring(frame, i, 1))), 0, (a, x) -> a + x)"))
        .withColumn("flen", length(col("frame")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"),
             sum(col("flen")).cast("long").as("sampled_bytes"),
             sum(col("fsum")).cast("long").as("sum_bytes_val"),
             max(col("fsum")).cast("long").as("max_frame_sum"),
             // brightness over the sampled frames: exact integer numerator
             (sum(col("fsum")).cast("double") /
               (sum(col("flen")) * lit(255))).as("avg_brightness"))
        .orderBy("doc_id")
    },

    // B13/D7 made end-to-end REAL: per document, a standards-conformant
    // 24-bit BMP (4–8 × 3–6 px, deterministic test-pattern pixels) is
    // encoded, shipped as an opaque binary column, and decoded by the
    // pure-JVM BmpCodec parser behind the batched decoder seam. The
    // oracle recomputes the expected pixel statistics ARITHMETICALLY
    // (the pattern is an integer function of doc_id, x, y) — so stride
    // padding, the bottom-up row order, the B-G-R byte order, and the
    // header's pixel offset are all verified by hash compare, and the
    // position-weighted wlum makes row/channel mixups observable even
    // where plain sums would collide. Scale shape: encode and decode are
    // per-row map work (no shuffle at all before the final orderBy);
    // real MB-scale assets would stream through the same batched
    // mapPartitions boundary with the codec initialized once per batch.
    "q131_bmp_roundtrip" -> { (s, d) =>
      import s.implicits._
      val assets = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          val w = (4 + id % 5).toInt
          val h = (3 + id % 4).toInt
          Asset(id, src, BmpCodec.encode(w, h, (x, y) => patternPixel(id, x, y)))
        }.toDF()
      decodeAssetsAs(assets, batchSize = 64)(decodeBmpBatch)
        .select(col("doc_id"), col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"), col("wlum"))
        .orderBy("doc_id")
    },

    // REAL audio decode round trip — the WAV twin of q131: per doc a
    // deterministic PCM16 clip (8 + id%8 samples at 8 kHz) is encoded
    // into actual RIFF/WAVE bytes, shipped through the binary-column
    // seam, parsed back by WavCodec's strict decoder, and reduced to
    // exact integer sample statistics the oracle recomputes
    // arithmetically. Header offsets, the 16-bit little-endian sample
    // encoding, and sample ORDER (the signed position-weighted wsum)
    // are all hash-verified. Scale shape identical to q131: pure
    // per-row map work, codec amortized per mapPartitions batch, no
    // shuffle before the final orderBy.
    "q192_wav_roundtrip" -> { (s, d) =>
      import s.implicits._
      val assets = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          val n = (8 + id % 8).toInt
          Asset(id, src,
            WavCodec.encode(8000, Array.tabulate(n)(patternSample(id, _))))
        }.toDF()
      decodeAssetsAs(assets, batchSize = 64)(decodeWavBatch)
        .select(col("doc_id"), col("sample_rate"), col("n_samples"),
          col("sum_abs"), col("peak"), col("wsum"))
        .orderBy("doc_id")
    },

    // REAL image RESIZE round trip — q131's pipeline with a genuine
    // 2× nearest-neighbor downsample in the middle: encode the
    // test-pattern BMP, decode the actual bytes, keep even-coordinate
    // pixels, RE-ENCODE a conformant BMP at ⌈w/2⌉×⌈h/2⌉, decode
    // AGAIN, and reduce to exact integer stats of the small image.
    // The oracle recomputes the even-coordinate subgrid
    // arithmetically, so both encode passes, both decode passes, and
    // the subsample geometry are all hash-verified. Same scale shape
    // as q131: pure per-row map work through the batched codec seam,
    // no shuffle before the final orderBy.
    "q259_bmp_downsample" -> { (s, d) =>
      import s.implicits._
      val assets = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          val w = (4 + id % 5).toInt
          val h = (3 + id % 4).toInt
          Asset(id, src, BmpCodec.encode(w, h, (x, y) => patternPixel(id, x, y)))
        }.toDF()
      val small = decodeAssetsAs(assets, batchSize = 64)(downsampleBmpBatch)
      decodeAssetsAs(small, batchSize = 64)(decodeBmpBatch)
        .select(col("doc_id"), col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"), col("wlum"))
        .orderBy("doc_id")
    },

    // REAL audio RESAMPLE round trip — q192's pipeline with a genuine
    // 2× decimation in the middle: encode the test-pattern WAV,
    // decode the actual bytes, keep every 2nd sample, RE-ENCODE a
    // conformant WAV at half the sample rate, decode AGAIN, and
    // reduce to exact integer stats. The oracle recomputes the
    // even-index subsequence arithmetically — both encodes, both
    // decodes, the header's halved rate, and the sample order are all
    // hash-verified. Per-row map work through the batched codec seam.
    "q260_wav_decimate" -> { (s, d) =>
      import s.implicits._
      val assets = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          val n = (8 + id % 8).toInt
          Asset(id, src,
            WavCodec.encode(8000, Array.tabulate(n)(patternSample(id, _))))
        }.toDF()
      val half = decodeAssetsAs(assets, batchSize = 64)(decimateWavBatch)
      decodeAssetsAs(half, batchSize = 64)(decodeWavBatch)
        .select(col("doc_id"), col("sample_rate"), col("n_samples"),
          col("sum_abs"), col("peak"), col("wsum"))
        .orderBy("doc_id")
    },

    // Per-SOURCE color-channel HISTOGRAM through the real codec — the
    // corpus-level image-statistics reduction (q131 audits one image's
    // sums; a dataset card wants the channel DISTRIBUTION): decode
    // actual BMP bytes, bin every pixel's r/g/b into four 64-wide
    // intensity classes, aggregate per (source, channel, bin). The
    // decoder emits 12 pre-reduced rows per image (never raw pixels),
    // so bytes stay inside the mapPartitions batch and the shuffle
    // carries (source, channel, bin, count) — the multimodal analog of
    // the map-side-combine rule. Oracle recomputes the pattern
    // arithmetically (the q131 convention).
    "q333_bmp_histogram" -> { (s, d) =>
      import s.implicits._
      val assets = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          val w = (4 + id % 5).toInt
          val h = (3 + id % 4).toInt
          Asset(id, src, BmpCodec.encode(w, h, (x, y) => patternPixel(id, x, y)))
        }.toDF()
      decodeAssetsAs(assets, batchSize = 64)(histogramBmpBatch)
        .groupBy("source", "channel", "bin")
        .agg(sum(col("cnt")).cast("long").as("n_px"))
        .orderBy("source", "channel", "bin")
    },

    // PERCEPTUAL-HASH image dedup through the real codec — the
    // multimodal sibling of q24's md5 content dedup: byte-level hashing
    // misses re-encoded copies of the SAME pixels, so image pipelines
    // dedup on a perceptual hash; this is the classic aHash
    // (average-hash): integer luminance (2r+5g+b) DIV 8 per pixel,
    // threshold each pixel against the image's mean, pack the bits in
    // row-major order (≤48 px, so the hash holds int64). The decoder
    // emits ONE (w, h, hash) row per image — pixels never leave the
    // batch — and duplicate CLUSTERS are a (w, h, hash) group-by.
    // Oracle recomputes the hash arithmetically from the pattern (the
    // q131 convention), proving bit-exact pixel recovery through the
    // real encode→bytes→decode round trip.
    "q363_phash_dedup" -> { (s, d) =>
      import s.implicits._
      val assets = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          val w = (4 + id % 5).toInt
          val h = (3 + id % 4).toInt
          Asset(id, src, BmpCodec.encode(w, h, (x, y) => patternPixel(id, x, y)))
        }.toDF()
      val hashed = decodeAssetsAs(assets, batchSize = 64)(ahashBmpBatch)
      hashed.groupBy("width", "height", "ahash")
        .agg(count(lit(1)).as("csz"))
        .groupBy("width", "height")
        .agg(count(lit(1)).cast("long").as("n_clusters"),
          sum(col("csz")).cast("long").as("n_images"),
          max(col("csz")).cast("long").as("max_cluster"),
          sum(col("csz") - 1).cast("long").as("dup_images"))
        .orderBy("width", "height")
    },

    // ZERO-CROSSING + frame-loudness census through the REAL WAV codec
    // — the spectral-proxy reduction a speech pipeline runs before any
    // FFT (zc rate separates voiced/unvoiced/noise; the 8-sample frame
    // envelope is the loudness contour): per doc a 16+id%16-sample
    // deterministic PCM16 clip is encoded to RIFF bytes, decoded back,
    // and reduced to exact integers — zero crossings under the v ≥ 0 ⇒
    // positive convention, Σv² energy, and the max non-overlapping
    // 8-sample frame Σ|v|. The oracle replays the pattern
    // arithmetically, so the codec round trip is hash-verified sample
    // by sample. Pure per-row map through the batched codec seam — no
    // shuffle before the final orderBy, same scale shape as q192.
    "q398_wav_zero_crossings" -> { (s, d) =>
      import s.implicits._
      val assets = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          val n = (16 + id % 16).toInt
          Asset(id, src,
            WavCodec.encode(8000, Array.tabulate(n)(patternSample(id, _))))
        }.toDF()
      decodeAssetsAs(assets, batchSize = 64)(zcWavBatch)
        .select(col("doc_id"), col("n_samples"), col("zero_crossings"),
          col("sum_sq"), col("n_frames"), col("max_frame_sumabs"))
        .orderBy("doc_id")
    },

    // L1 GRADIENT-ENERGY census through the REAL BMP codec — the
    // edge-content reduction (blur/quality proxy: near-zero gradient
    // energy at normal variance means flat or synthetic fills; q333's
    // histogram sees the palette, THIS sees the structure): per-pixel
    // luminance r+g+b, horizontal + vertical absolute-difference sums
    // in exact integers. The oracle recomputes the pattern's luminance
    // grid arithmetically — both codec passes and the neighbor
    // geometry (row stride, padding) are hash-verified.
    "q399_bmp_edge_energy" -> { (s, d) =>
      import s.implicits._
      val assets = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          val w = (4 + id % 5).toInt
          val h = (3 + id % 4).toInt
          Asset(id, src, BmpCodec.encode(w, h, (x, y) => patternPixel(id, x, y)))
        }.toDF()
      decodeAssetsAs(assets, batchSize = 64)(edgeBmpBatch)
        .select(col("doc_id"), col("width"), col("height"),
          col("grad_h"), col("grad_v"),
          (col("grad_h") + col("grad_v")).as("edge_total"))
        .orderBy("doc_id")
    },

    // SILENCE-RUN census through the REAL WAV codec — the trim/VAD
    // preprocessing read (how much of each clip is dead air, and is it
    // one leading block or scattered?): maximal runs of consecutive
    // samples with |v| < SilenceT, exact counts + longest run +
    // silent_ppm. The oracle rebuilds the runs with the classic
    // k − row_number() run-id trick over the arithmetic pattern.
    "q400_wav_silence_runs" -> { (s, d) =>
      import s.implicits._
      val assets = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          val n = (16 + id % 16).toInt
          Asset(id, src,
            WavCodec.encode(8000, Array.tabulate(n)(patternSample(id, _))))
        }.toDF()
      decodeAssetsAs(assets, batchSize = 64)(silenceWavBatch)
        .select(col("doc_id"), col("n_samples"), col("n_silent"),
          col("n_runs"), col("max_run"),
          expr("CAST(n_silent * 1000000 DIV n_samples AS BIGINT)")
            .as("silent_ppm"))
        .orderBy("doc_id")
    },

    // OTSU binarization-threshold census through the REAL BMP codec —
    // the document-scan/segmentation preprocessor's first decision
    // (q333 gives the channel distribution; q399 the edge energy; this
    // the optimal foreground/background SPLIT): per image the exact
    // integer Otsu threshold (argmax of between-class variance over
    // the distinct-luminance grid — see otsuBmpBatch for the pinned
    // fixed-point score and tie rule), aggregated per source with the
    // foreground-pixel share. Decoder emits ONE row per image; pixels
    // never leave the batch (the q333/q363 rule). The oracle replays
    // pattern pixels arithmetically and the identical argmax in SQL,
    // so the codec round trip stays hash-verified.
    "q430_otsu_threshold" -> { (s, d) =>
      import s.implicits._
      val assets = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          val w = (4 + id % 5).toInt
          val h = (3 + id % 4).toInt
          Asset(id, src, BmpCodec.encode(w, h, (x, y) => patternPixel(id, x, y)))
        }.toDF()
      decodeAssetsAs(assets, batchSize = 64)(otsuBmpBatch)
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_images"),
          min(col("otsu_t")).cast("long").as("min_t"),
          max(col("otsu_t")).cast("long").as("max_t"),
          sum(col("otsu_t")).cast("long").as("sum_t"),
          sum(col("fg_px")).cast("long").as("fg_px"),
          sum(col("width") * col("height")).cast("long").as("n_px"))
        .withColumn("mean_t", expr("CAST(sum_t DIV n_images AS BIGINT)"))
        .withColumn("fg_ppm",
          expr("CAST(fg_px * 1000000 DIV n_px AS BIGINT)"))
        .orderBy("source")
    },

    // GAIN-STAGING / HEADROOM audit through the REAL WAV codec — the
    // normalize-or-reject decision an audio-ingest pipeline makes
    // before feature extraction (q398 reads spectral proxies, q400
    // silence; this reads LEVELS): per source, the peak-of-peaks, the
    // count of full-scale samples (|v| ≥ 32767 — BOTH int16 rails;
    // clipping destroys training signal irreversibly), the clipped
    // share in floor-ppm, and the mean per-clip energy (Σv² DIV
    // samples — the integer RMS² proxy; no sqrt needed to RANK
    // loudness). Codec round trip stays hash-verified: the oracle
    // replays the PCM pattern arithmetically. One row per clip leaves
    // the decoder batch; per-source reduction is map-combined.
    "q439_wav_headroom" -> { (s, d) =>
      import s.implicits._
      val assets = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          val n = (16 + id % 16).toInt
          Asset(id, src,
            WavCodec.encode(8000, Array.tabulate(n)(patternSample(id, _))))
        }.toDF()
      decodeAssetsAs(assets, batchSize = 64)(headroomWavBatch)
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_clips"),
          sum(col("n_samples")).cast("long").as("n_samples"),
          max(col("peak")).cast("long").as("peak"),
          sum(col("energy")).cast("long").as("sum_energy"),
          sum(col("n_clipped")).cast("long").as("n_clipped"))
        .withColumn("clip_ppm",
          expr("CAST(n_clipped * 1000000 DIV n_samples AS BIGINT)"))
        .withColumn("mean_energy",
          expr("CAST(sum_energy DIV n_samples AS BIGINT)"))
        .orderBy("source")
    }
  )

  def oracle: Map[String, String] = Map(
    // The stub's fake features are pure functions of the text bytes, so
    // the oracle reproduces them exactly in SQL.
    "q30_multimodal_stats" ->
      """SELECT source,
        | CAST(COUNT(*) AS BIGINT) AS n_assets,
        | CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
        | CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        | CAST(MAX(64 + octet_length(encode(text)) % 64) AS BIGINT) AS max_width,
        | CAST(MAX(64 + octet_length(encode(text)) % 48) AS BIGINT) AS max_height,
        | CAST(SUM(ascii(substr(text, 1, 1))) AS DOUBLE) / COUNT(*) / 255.0 AS avg_brightness
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q52_multimodal_frames" ->
      """WITH fr AS (
        |  SELECT doc_id,
        |    substr(text, f * 64 + 1, 64) AS frame
        |  FROM documents,
        |    UNNEST(generate_series(0, CAST(ceil(length(text) / 64.0) AS BIGINT) - 1)) AS g(f)
        |  WHERE doc_id % 31 = 0 AND length(text) >= 1 AND f % 3 = 0),
        |fs AS (
        |  SELECT doc_id, length(frame) AS flen,
        |    list_sum(list_transform(generate_series(1, length(frame)),
        |      i -> ord(substr(frame, i, 1)))) AS fsum
        |  FROM fr)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
        | CAST(SUM(flen) AS BIGINT) AS sampled_bytes,
        | CAST(SUM(fsum) AS BIGINT) AS sum_bytes_val,
        | CAST(MAX(fsum) AS BIGINT) AS max_frame_sum,
        | CAST(SUM(fsum) AS DOUBLE) / (SUM(flen) * 255) AS avg_brightness
        |FROM fs GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // The decoded statistics equal the test pattern's closed-form sums:
    // channel c of pixel (x,y) is (doc_id·31 + x·7 + y·13 + c·41) % 256,
    // summed over the doc's w×h grid — if the Spark side's BMP parse
    // mis-handles stride/row-order/channel-order/offset, its sums
    // cannot match these.
    "q131_bmp_roundtrip" ->
      """WITH imgs AS (
        |  SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS w,
        |         CAST(3 + doc_id % 4 AS BIGINT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT i.doc_id, i.w, i.h, x, y,
        |    (i.doc_id * 31 + x * 7 + y * 13) % 256 AS r,
        |    (i.doc_id * 31 + x * 7 + y * 13 + 41) % 256 AS g,
        |    (i.doc_id * 31 + x * 7 + y * 13 + 82) % 256 AS b
        |  FROM imgs i,
        |    UNNEST(generate_series(0, 7)) AS gx(x),
        |    UNNEST(generate_series(0, 5)) AS gy(y)
        |  WHERE x < i.w AND y < i.h)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(SUM(r) AS BIGINT) AS sum_r,
        |  CAST(SUM(g) AS BIGINT) AS sum_g,
        |  CAST(SUM(b) AS BIGINT) AS sum_b,
        |  CAST(SUM((y * w + x) * (r + g + b)) AS BIGINT) AS wlum
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,

    "q192_wav_roundtrip" ->
      """WITH clips AS (
        |  SELECT doc_id, CAST(8 + doc_id % 8 AS BIGINT) AS n
        |  FROM documents),
        |s AS (
        |  SELECT c.doc_id, g.k,
        |    ((c.doc_id * 31 + g.k * 7919) % 65536) - 32768 AS v
        |  FROM clips c, UNNEST(generate_series(0, 14)) AS g(k)
        |  WHERE g.k < c.n)
        |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
        |  CAST(MAX(ABS(v)) AS BIGINT) AS peak,
        |  CAST(SUM((k + 1) * v) AS BIGINT) AS wsum
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // The downsampled image keeps the even-coordinate pixels of the
    // pattern; the oracle recomputes that subgrid arithmetically with
    // the SMALL image's (x2, y2, w2) indexing for wlum.
    "q259_bmp_downsample" ->
      """WITH imgs AS (
        |  SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS w,
        |         CAST(3 + doc_id % 4 AS BIGINT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT i.doc_id,
        |    (i.w + 1) // 2 AS w2, (i.h + 1) // 2 AS h2, x2, y2,
        |    (i.doc_id * 31 + (2 * x2) * 7 + (2 * y2) * 13) % 256 AS r,
        |    (i.doc_id * 31 + (2 * x2) * 7 + (2 * y2) * 13 + 41) % 256 AS g,
        |    (i.doc_id * 31 + (2 * x2) * 7 + (2 * y2) * 13 + 82) % 256 AS b
        |  FROM imgs i,
        |    UNNEST(generate_series(0, 3)) AS gx(x2),
        |    UNNEST(generate_series(0, 2)) AS gy(y2)
        |  WHERE 2 * x2 < i.w AND 2 * y2 < i.h)
        |SELECT doc_id, w2 AS width, h2 AS height,
        |  CAST(SUM(r) AS BIGINT) AS sum_r,
        |  CAST(SUM(g) AS BIGINT) AS sum_g,
        |  CAST(SUM(b) AS BIGINT) AS sum_b,
        |  CAST(SUM((y2 * w2 + x2) * (r + g + b)) AS BIGINT) AS wlum
        |FROM px GROUP BY doc_id, w2, h2 ORDER BY doc_id""".stripMargin,

    // The decimated clip keeps the even-index samples of the pattern
    // at half the sample rate, re-indexed (k2 + 1 position weights).
    "q260_wav_decimate" ->
      """WITH clips AS (
        |  SELECT doc_id, CAST(8 + doc_id % 8 AS BIGINT) AS n
        |  FROM documents),
        |s AS (
        |  SELECT c.doc_id, g.k2,
        |    ((c.doc_id * 31 + (2 * g.k2) * 7919) % 65536) - 32768 AS v
        |  FROM clips c, UNNEST(generate_series(0, 7)) AS g(k2)
        |  WHERE 2 * g.k2 < c.n)
        |SELECT doc_id, CAST(4000 AS BIGINT) AS sample_rate,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
        |  CAST(MAX(ABS(v)) AS BIGINT) AS peak,
        |  CAST(SUM((k2 + 1) * v) AS BIGINT) AS wsum
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q333_bmp_histogram" ->
      """WITH imgs AS (
        |  SELECT doc_id, source, CAST(4 + doc_id % 5 AS BIGINT) AS w,
        |         CAST(3 + doc_id % 4 AS BIGINT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT i.source,
        |    (i.doc_id * 31 + x * 7 + y * 13) % 256 AS r,
        |    (i.doc_id * 31 + x * 7 + y * 13 + 41) % 256 AS g,
        |    (i.doc_id * 31 + x * 7 + y * 13 + 82) % 256 AS b
        |  FROM imgs i,
        |    UNNEST(generate_series(0, 7)) AS gx(x),
        |    UNNEST(generate_series(0, 5)) AS gy(y)
        |  WHERE x < i.w AND y < i.h),
        |lng AS (
        |  SELECT source, 'r' AS channel, r // 64 AS bin FROM px
        |  UNION ALL SELECT source, 'g', g // 64 FROM px
        |  UNION ALL SELECT source, 'b', b // 64 FROM px),
        |cnt AS (SELECT source, channel, CAST(bin AS BIGINT) AS bin,
        |          CAST(COUNT(*) AS BIGINT) AS n_px
        |        FROM lng GROUP BY 1, 2, 3),
        |grid AS (
        |  SELECT DISTINCT d.source, c.channel, CAST(b.b AS BIGINT) AS bin
        |  FROM documents d,
        |       (SELECT UNNEST(['r', 'g', 'b']) AS channel) c,
        |       UNNEST(generate_series(0, 3)) AS b(b))
        |SELECT g.source, g.channel, g.bin,
        |  CAST(COALESCE(n_px, 0) AS BIGINT) AS n_px
        |FROM grid g LEFT JOIN cnt USING (source, channel, bin)
        |ORDER BY source, channel, bin""".stripMargin,

    "q363_phash_dedup" ->
      """WITH imgs AS (
        |  SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS w,
        |         CAST(3 + doc_id % 4 AS BIGINT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT i.doc_id, i.w, i.h, y * i.w + x AS idx,
        |    (2 * ((i.doc_id * 31 + x * 7 + y * 13) % 256)
        |     + 5 * ((i.doc_id * 31 + x * 7 + y * 13 + 41) % 256)
        |     + ((i.doc_id * 31 + x * 7 + y * 13 + 82) % 256)) // 8 AS lum
        |  FROM imgs i,
        |    UNNEST(generate_series(0, 7)) AS gx(x),
        |    UNNEST(generate_series(0, 5)) AS gy(y)
        |  WHERE x < i.w AND y < i.h),
        |mn AS (
        |  SELECT doc_id, w, h, SUM(lum) // (w * h) AS mean
        |  FROM px GROUP BY 1, 2, 3),
        |hs AS (
        |  SELECT px.doc_id, px.w AS width, px.h AS height,
        |    CAST(SUM(CASE WHEN px.lum > mn.mean
        |      THEN (1::BIGINT << px.idx) ELSE 0 END) AS BIGINT) AS ahash
        |  FROM px JOIN mn USING (doc_id) GROUP BY 1, 2, 3),
        |cl AS (
        |  SELECT width, height, ahash, CAST(COUNT(*) AS BIGINT) AS csz
        |  FROM hs GROUP BY 1, 2, 3)
        |SELECT CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
        |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
        |  CAST(SUM(csz) AS BIGINT) AS n_images,
        |  CAST(MAX(csz) AS BIGINT) AS max_cluster,
        |  CAST(SUM(csz - 1) AS BIGINT) AS dup_images
        |FROM cl GROUP BY 1, 2 ORDER BY width, height""".stripMargin,

    "q398_wav_zero_crossings" ->
      """WITH clips AS (
        |  SELECT doc_id, CAST(16 + doc_id % 16 AS BIGINT) AS n
        |  FROM documents),
        |s AS (
        |  SELECT c.doc_id, g.k,
        |    ((c.doc_id * 31 + g.k * 7919) % 65536) - 32768 AS v
        |  FROM clips c, UNNEST(generate_series(0, 30)) AS g(k)
        |  WHERE g.k < c.n),
        |zc AS (
        |  SELECT a.doc_id,
        |    CAST(SUM(CASE WHEN (a.v >= 0) <> (b.v >= 0) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS zc
        |  FROM s a JOIN s b ON b.doc_id = a.doc_id AND b.k = a.k - 1
        |  GROUP BY 1),
        |fr AS (SELECT doc_id, k // 8 AS f, CAST(SUM(ABS(v)) AS BIGINT) AS fs
        |  FROM s GROUP BY 1, 2),
        |fa AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
        |    CAST(MAX(fs) AS BIGINT) AS mf
        |  FROM fr GROUP BY 1)
        |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  zc.zc AS zero_crossings,
        |  CAST(SUM(v * v) AS BIGINT) AS sum_sq,
        |  fa.n_frames, fa.mf AS max_frame_sumabs
        |FROM s JOIN zc USING (doc_id) JOIN fa USING (doc_id)
        |GROUP BY s.doc_id, zc.zc, fa.n_frames, fa.mf
        |ORDER BY s.doc_id""".stripMargin,

    "q399_bmp_edge_energy" ->
      """WITH imgs AS (
        |  SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS w,
        |    CAST(3 + doc_id % 4 AS BIGINT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT i.doc_id, i.w, i.h, gx.x, gy.y,
        |    ((i.doc_id * 31 + gx.x * 7 + gy.y * 13) % 256)
        |     + ((i.doc_id * 31 + gx.x * 7 + gy.y * 13 + 41) % 256)
        |     + ((i.doc_id * 31 + gx.x * 7 + gy.y * 13 + 82) % 256) AS lum
        |  FROM imgs i,
        |    UNNEST(generate_series(0, 8)) AS gx(x),
        |    UNNEST(generate_series(0, 6)) AS gy(y)
        |  WHERE gx.x < i.w AND gy.y < i.h),
        |gh AS (
        |  SELECT a.doc_id, CAST(SUM(ABS(b.lum - a.lum)) AS BIGINT) AS grad_h
        |  FROM px a JOIN px b
        |    ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
        |  GROUP BY 1),
        |gv AS (
        |  SELECT a.doc_id, CAST(SUM(ABS(b.lum - a.lum)) AS BIGINT) AS grad_v
        |  FROM px a JOIN px b
        |    ON b.doc_id = a.doc_id AND b.x = a.x AND b.y = a.y + 1
        |  GROUP BY 1)
        |SELECT i.doc_id, i.w AS width, i.h AS height,
        |  gh.grad_h, gv.grad_v, gh.grad_h + gv.grad_v AS edge_total
        |FROM imgs i JOIN gh USING (doc_id) JOIN gv USING (doc_id)
        |ORDER BY 1""".stripMargin,

    "q400_wav_silence_runs" ->
      s"""WITH clips AS (
        |  SELECT doc_id, CAST(16 + doc_id % 16 AS BIGINT) AS n
        |  FROM documents),
        |s AS (
        |  SELECT c.doc_id, g.k,
        |    ((c.doc_id * 31 + g.k * 7919) % 65536) - 32768 AS v
        |  FROM clips c, UNNEST(generate_series(0, 30)) AS g(k)
        |  WHERE g.k < c.n),
        |sil AS (
        |  SELECT doc_id, k,
        |    k - row_number() OVER (PARTITION BY doc_id ORDER BY k) AS grp
        |  FROM s WHERE ABS(v) < $SilenceT),
        |runs AS (SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS rl
        |  FROM sil GROUP BY 1, 2),
        |ra AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_runs,
        |    CAST(MAX(rl) AS BIGINT) AS max_run,
        |    CAST(SUM(rl) AS BIGINT) AS n_silent
        |  FROM runs GROUP BY 1),
        |ns AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_samples
        |  FROM s GROUP BY 1)
        |SELECT ns.doc_id, ns.n_samples,
        |  CAST(COALESCE(ra.n_silent, 0) AS BIGINT) AS n_silent,
        |  CAST(COALESCE(ra.n_runs, 0) AS BIGINT) AS n_runs,
        |  CAST(COALESCE(ra.max_run, 0) AS BIGINT) AS max_run,
        |  CAST(COALESCE(ra.n_silent, 0) * 1000000 // ns.n_samples AS BIGINT)
        |    AS silent_ppm
        |FROM ns LEFT JOIN ra USING (doc_id) ORDER BY 1""".stripMargin,

    "q430_otsu_threshold" ->
      """WITH imgs AS (
        |  SELECT doc_id, source, CAST(4 + doc_id % 5 AS BIGINT) AS w,
        |         CAST(3 + doc_id % 4 AS BIGINT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT i.doc_id, i.source, i.w, i.h,
        |    (2 * ((i.doc_id * 31 + x * 7 + y * 13) % 256)
        |     + 5 * ((i.doc_id * 31 + x * 7 + y * 13 + 41) % 256)
        |     + ((i.doc_id * 31 + x * 7 + y * 13 + 82) % 256)) // 8 AS lum
        |  FROM imgs i,
        |    UNNEST(generate_series(0, 7)) AS gx(x),
        |    UNNEST(generate_series(0, 5)) AS gy(y)
        |  WHERE x < i.w AND y < i.h),
        |st AS (
        |  SELECT doc_id, source, COUNT(*) AS n, SUM(lum) AS s,
        |    MAX(lum) AS maxl
        |  FROM px GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT p.doc_id, p.lum AS t
        |  FROM px p JOIN st USING (doc_id) WHERE p.lum < st.maxl),
        |ft AS (
        |  SELECT c.doc_id, c.t, st.n, st.s,
        |    SUM(CASE WHEN p.lum <= c.t THEN 1 ELSE 0 END) AS c0,
        |    SUM(CASE WHEN p.lum <= c.t THEN p.lum ELSE 0 END) AS s0
        |  FROM cand c JOIN px p USING (doc_id) JOIN st USING (doc_id)
        |  GROUP BY 1, 2, 3, 4),
        |scored AS (
        |  SELECT doc_id, t,
        |    (s0 * n - s * c0) * (s0 * n - s * c0) * 1000000
        |      // (c0 * (n - c0)) AS f
        |  FROM ft),
        |best AS (
        |  SELECT doc_id, t AS otsu_t FROM (
        |    SELECT doc_id, t,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY f DESC, t) AS rk
        |    FROM scored) WHERE rk = 1),
        |per AS (
        |  SELECT st.doc_id, st.source, st.n,
        |    COALESCE(b.otsu_t, st.maxl) AS otsu_t
        |  FROM st LEFT JOIN best b USING (doc_id)),
        |fg AS (
        |  SELECT p.doc_id, SUM(CASE WHEN p.lum > per.otsu_t THEN 1 ELSE 0 END)
        |    AS fg_px
        |  FROM px p JOIN per USING (doc_id) GROUP BY 1)
        |SELECT per.source, CAST(COUNT(*) AS BIGINT) AS n_images,
        |  CAST(MIN(per.otsu_t) AS BIGINT) AS min_t,
        |  CAST(MAX(per.otsu_t) AS BIGINT) AS max_t,
        |  CAST(SUM(per.otsu_t) AS BIGINT) AS sum_t,
        |  CAST(SUM(fg.fg_px) AS BIGINT) AS fg_px,
        |  CAST(SUM(per.n) AS BIGINT) AS n_px,
        |  CAST(SUM(per.otsu_t) // COUNT(*) AS BIGINT) AS mean_t,
        |  CAST(SUM(fg.fg_px) * 1000000 // SUM(per.n) AS BIGINT) AS fg_ppm
        |FROM per JOIN fg USING (doc_id)
        |GROUP BY per.source ORDER BY per.source""".stripMargin,

    "q439_wav_headroom" ->
      """WITH clips AS (
        |  SELECT doc_id, source, CAST(16 + doc_id % 16 AS BIGINT) AS n
        |  FROM documents),
        |smp AS (
        |  SELECT c.source, c.doc_id,
        |    ((c.doc_id * 31 + k.k * 7919) % 65536) - 32768 AS v
        |  FROM clips c, UNNEST(generate_series(0, 30)) AS k(k)
        |  WHERE k.k < c.n),
        |per AS (
        |  SELECT source, doc_id, COUNT(*) AS n_samples, MAX(ABS(v)) AS peak,
        |    SUM(v * v) AS energy,
        |    SUM(CASE WHEN ABS(v) >= 32767 THEN 1 ELSE 0 END) AS n_clipped
        |  FROM smp GROUP BY 1, 2)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_clips,
        |  CAST(SUM(n_samples) AS BIGINT) AS n_samples,
        |  CAST(MAX(peak) AS BIGINT) AS peak,
        |  CAST(SUM(energy) AS BIGINT) AS sum_energy,
        |  CAST(SUM(n_clipped) AS BIGINT) AS n_clipped,
        |  CAST(SUM(n_clipped) * 1000000 // SUM(n_samples) AS BIGINT)
        |    AS clip_ppm,
        |  CAST(SUM(energy) // SUM(n_samples) AS BIGINT) AS mean_energy
        |FROM per GROUP BY source ORDER BY source""".stripMargin
  )
}
