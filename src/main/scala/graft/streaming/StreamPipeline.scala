package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.functions.StrictConvert
import graft.sink.{SinkConfig, TwoPhaseParquetSink}

/** End-to-end streaming assembly, the Spark image of the whole reference
  * dataflow (SURVEY.md §3.1):
  *
  *   source (Kafka / MemoryStream) ─ A1
  *     → envelope decode, permissive from_json (corrupt → null)  ─ A3/A7
  *     → strict-convert validation split (good / DLQ)            ─ A4/A9
  *     → two-phase exactly-once parquet sink                     ─ A10/A12-14
  *
  * The Connect machinery the reference needed for correctness — Phaser
  * barriers, retry boundaries, offset rewind (A6/A11/A13) — is subsumed by
  * Structured Streaming's checkpoint: offsets advance only after the batch
  * lands, replays carry the same batchId, and the sink's commit ledger
  * makes replays no-ops.
  */
object StreamPipeline {

  /** The SinkRecord envelope image (SURVEY.md §1.4, FIXTURES.md F3). */
  val EnvelopeSchema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))

  /** Kafka source assembly (A1). Offline environments test through
    * MemoryStream instead; this is the production wiring. */
  def kafkaSource(spark: SparkSession, bootstrapServers: String,
                  topic: String, maxOffsetsPerTrigger: Long): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()
      .select(col("topic"), col("partition"), col("offset"),
              col("key").cast("string"),
              col("value").cast("string"))

  /** Decode the value payload against a declared schema. Permissive with a
    * corrupt-record column: a malformed payload sets `payload._corrupt`
    * (from_json's all-null struct is indistinguishable from legitimately
    * null fields otherwise), which the validation split routes to the DLQ
    * — the A3 non-Struct type filter. */
  val CorruptField = "_corrupt"
  def decode(envelope: DataFrame, valueSchema: StructType): DataFrame = {
    val parseSchema = valueSchema.add(StructField(CorruptField, StringType, nullable = true))
    envelope.withColumn("payload",
      from_json(col("value"), parseSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptField)))
  }

  /** A9/A4: split decoded records into (good, dlq). A record is bad when
    * the payload failed to parse or the strict converter rejects it
    * against the destination schema; the error column carries the reason
    * (errant-record report image). */
  def validationSplit(decoded: DataFrame, target: StructType): (DataFrame, DataFrame) = {
    val payloadStruct = struct(target.fields.map(f => col(s"payload.${f.name}")).toIndexedSeq: _*)
    val withErr = decoded.withColumn("err",
      when(col("payload").isNull || col(s"payload.$CorruptField").isNotNull,
           lit("unparseable payload"))
        .otherwise(StrictConvert.convert_error_as(payloadStruct, target)))
    (withErr.filter(col("err").isNull).drop("err"),
     withErr.filter(col("err").isNotNull))
  }

  /** Assemble and start the full pipeline on any streaming envelope
    * source. Returns the query plus the two sinks (data + DLQ) so tests
    * and operators can observe both legs.
    */
  def start(source: DataFrame, valueSchema: StructType, target: StructType,
            config: SinkConfig, dlqDir: String,
            checkpointDir: String): (StreamingQuery, TwoPhaseParquetSink, TwoPhaseParquetSink) = {
    val sink = new TwoPhaseParquetSink(config)
    val dlqSink = new TwoPhaseParquetSink(SinkConfig(dlqDir))
    val query = decode(source, valueSchema)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (good, dlq) = validationSplit(batch, target)
        // flatten the good leg onto the destination schema (A8)
        val flat = good.select(
          (Seq(col("topic"), col("partition"), col("offset")) ++
            target.fields.map(f => col(s"payload.${f.name}").as(f.name))): _*)
        sink.writeBatch(flat, batchId)
        dlqSink.writeBatch(
          dlq.select(col("topic"), col("partition"), col("offset"),
                     col("value"), col("err")), batchId)
        ()
      }
      .start()
    (query, sink, dlqSink)
  }
}
