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
  def decodeAssets(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[Asset].mapPartitions {
      _.grouped(batchSize).flatMap(decodeBatch)
    }.toDF()
  }

  /** One codec call per batch — the seam a real decoder replaces. */
  def decodeBatch(batch: Seq[Asset]): Seq[DecodedAsset] =
    batch.map(decodeStub)

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
        |FROM documents GROUP BY source ORDER BY source""".stripMargin
  )
}
