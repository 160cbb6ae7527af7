package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.functions.StrictConvert
import graft.sink.{AppendRowsException, ErrorClassifier, QuarantineLedger, SinkConfig, TwoPhaseParquetSink}

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

  /** Schema-inference fallback (reference RecordConverter.java:17-23:
    * when `valueSchema()` is null the converter infers the type from the
    * runtime value and treats it as OPTIONAL). The Spark image infers from
    * a bounded sample of the payloads themselves — `spark.read.json`
    * merges field sets across the whole sample (a field present in any
    * record survives, typed by the widest observed type), and every
    * inferred field is nullable, i.e. optional: a record missing one
    * decodes with a null, it is not rejected.
    *
    * Inference needs data, so it runs on a batch envelope (the sample
    * subtree is bounded by `sampleSize` — constant work no matter the
    * table size). A streaming caller infers once from its first micro
    * batch inside foreachBatch and reuses the schema from there on.
    */
  def inferValueSchema(envelope: DataFrame, sampleSize: Int = 1000): StructType = {
    val spark = envelope.sparkSession
    // Deterministic sample: order by the envelope coordinates before the
    // limit — a bare limit() takes whichever partitions answer first, so
    // two runs (or two restarts racing to write the schema file) could
    // learn different field sets. orderBy+limit plans as per-partition
    // top-N + driver merge (TakeOrderedAndProject), not a global sort.
    // The ≤sampleSize strings are then collected and inferred from a
    // LOCAL dataset: the inference job degenerates to a single tiny task
    // instead of a full distributed JSON-datasource scan per call.
    val sample = envelope.select(col("value"), col("topic"), col("partition"), col("offset"))
      .filter(col("value").isNotNull)
      .orderBy(col("topic"), col("partition"), col("offset"))
      .limit(sampleSize)
      .select(col("value")).as(org.apache.spark.sql.Encoders.STRING)
      .collect().toIndexedSeq
    val inferred = spark.read
      .json(spark.createDataset(sample)(org.apache.spark.sql.Encoders.STRING)).schema
    // a corrupt record in the sample makes read.json emit its own corrupt
    // column; drop it — [[decode]] adds the pipeline's CorruptField itself
    val corruptCol = spark.conf.get("spark.sql.columnNameOfCorruptRecord", "_corrupt_record")
    StructType(inferred.fields.filterNot(_.name == corruptCol)
      .map(_.copy(nullable = true)))
  }

  /** [[decode]] without a declared schema: infer, then decode. */
  def decodeInferred(envelope: DataFrame, sampleSize: Int = 1000): DataFrame =
    decode(envelope, inferValueSchema(envelope, sampleSize))

  /** Drift observability for the learn-once inference choice
    * ([[startInferred]]): the reference infers PER RECORD
    * (RecordConverter.java:17-19), so a field appearing mid-stream is
    * picked up there but silently dropped forever here. The monitor
    * closes the observability gap: each batch counts payload rows whose
    * top-level keys include a field absent from the learned schema, so an
    * operator sees drift the batch it starts (and can choose to restart
    * with a wider schema) instead of discovering dropped fields months
    * later. Counters only — decode behavior stays learn-once stable. */
  final class SchemaDriftMonitor extends Serializable {
    private val rows = new java.util.concurrent.atomic.AtomicLong()
    private val batches = new java.util.concurrent.atomic.AtomicLong()
    private[streaming] def record(n: Long): Unit = {
      rows.addAndGet(n)
      if (n > 0) batches.incrementAndGet()
    }
    /** Rows seen so far carrying at least one unknown top-level field. */
    def driftRows: Long = rows.get
    /** Batches so far in which any drift was observed. */
    def driftBatches: Long = batches.get
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
    *
    * `appendCheck` is the injection point for the remote append's
    * row-level response (reference: AppendRowsResponse row errors): given
    * the batch about to land, it returns the (topic, partition, offset,
    * error) coordinates of rows the remote rejects — empty when all rows
    * are acceptable. The quarantine FEEDBACK LOOP (reference
    * BigqueryStorageWriteSinkTask.java:224-242 → :103-106) then plays out
    * across a failure and its checkpoint replay:
    *
    *   1. appendCheck names corrupted rows → they are recorded in the
    *      durable [[QuarantineLedger]] under `quarantineDir` and the batch
    *      THROWS — offsets rewind, nothing landed (preCommit rewind).
    *   2. The restarted query replays the same batch; rows whose
    *      coordinates are in the ledger are split out by a broadcast
    *      lookup BEFORE the append and land in the DLQ with the recorded
    *      error (put()'s corruptedRowOffsets skip → errorReport).
    *   3. The re-append of the surviving rows succeeds and commits.
    *
    * A THROWING appendCheck (transport failure, not row rejection) is
    * classified by [[ErrorClassifier]]: retriable errors propagate as-is
    * so the engine replays the batch unchanged (no quarantine — the rows
    * are fine, the transport wasn't); unretriable ones are wrapped fatal,
    * mirroring hasUnretryableError (BigqueryStreamWriter.java:153-183).
    */
  def start(source: DataFrame, valueSchema: StructType, target: StructType,
            config: SinkConfig, dlqDir: String, checkpointDir: String,
            quarantineDir: Option[String] = None,
            appendCheck: DataFrame => Seq[(String, Int, Long, String)] = _ => Seq.empty)
      : (StreamingQuery, TwoPhaseParquetSink, TwoPhaseParquetSink) =
    startWith(source, _ => valueSchema, target, config, dlqDir,
              checkpointDir, quarantineDir, appendCheck)

  /** [[start]] without a declared value schema: the schema is inferred
    * from the first non-empty micro batch's payloads (bounded sample, see
    * [[inferValueSchema]]) and reused for the rest of the query — the
    * streaming leg of the reference's null-valueSchema fallback. The
    * TARGET schema stays declared: the destination contract is external,
    * only the source's shape is discovered. After a restart the schema is
    * re-inferred from the replayed batch — same data, same inference. */
  def startInferred(source: DataFrame, target: StructType,
                    config: SinkConfig, dlqDir: String, checkpointDir: String,
                    quarantineDir: Option[String] = None,
                    appendCheck: DataFrame => Seq[(String, Int, Long, String)] = _ => Seq.empty,
                    sampleSize: Int = 1000,
                    drift: Option[SchemaDriftMonitor] = None)
      : (StreamingQuery, TwoPhaseParquetSink, TwoPhaseParquetSink) = {
    // The learned schema is DURABLE next to the checkpoint: a restarted
    // query resumes mid-stream, so re-inferring from whichever batch the
    // checkpoint replays could type the stream differently than the
    // committed prefix — the schema must be learned once, ever.
    val schemaFile = java.nio.file.Paths.get(checkpointDir, "_inferred_value_schema.ddl")
    val memo = new java.util.concurrent.atomic.AtomicReference[StructType]()
    def persisted(): Option[StructType] =
      if (java.nio.file.Files.exists(schemaFile))
        Some(StructType.fromDDL(java.nio.file.Files.readString(schemaFile)))
      else None
    startWith(source, batch => {
      val schema = Option(memo.get).orElse(persisted()).map { s => memo.set(s); s }.getOrElse {
        // Reconcile inference toward the DESTINATION contract: every
        // target field is parsed at its TARGET type (nullable — the
        // strict converter applies its own required-field rules), because
        // a drifted inferred type (quoted number → STRING) would fail
        // StrictConvert's analysis-time type check and crash the query
        // instead of routing rows to the DLQ. Non-target fields keep
        // their inferred types (parsed, then ignored by the flatten);
        // matching is case-insensitive like Spark's resolver, and the
        // pipeline's reserved corrupt column is excluded so decode's own
        // corrupt field stays unique.
        val targetNames = target.fieldNames.map(_.toLowerCase).toSet
        val extra = inferValueSchema(batch, sampleSize).fields.filterNot(f =>
          targetNames.contains(f.name.toLowerCase) ||
            f.name.equalsIgnoreCase(CorruptField))
        val inferred = StructType(
          extra ++ target.fields.map(f => StructField(f.name, f.dataType, nullable = true)))
        if (!batch.isEmpty) { // an empty batch teaches nothing
          java.nio.file.Files.createDirectories(schemaFile.getParent)
          val tmp = schemaFile.resolveSibling(schemaFile.getFileName.toString + ".tmp")
          java.nio.file.Files.writeString(tmp, inferred.toDDL)
          java.nio.file.Files.move(tmp, schemaFile,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          memo.set(inferred)
        }
        inferred
      }
      // drift signal: rows whose payload carries a top-level field the
      // learned schema does not know. Case-insensitive like the schema
      // reconciliation above; malformed payloads yield NULL keys and are
      // not drift (they already route to the DLQ as unparseable).
      drift.foreach { m =>
        // Locale.ROOT: this lowercasing is compared against Spark's
        // locale-independent lower() — default toLowerCase under tr/az
        // JVMs maps I→ı and would flag every row as drifted
        val known = (schema.fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet +
            CorruptField.toLowerCase(java.util.Locale.ROOT))
          .toSeq.sorted.map(lit(_))
        val n = batch
          .filter(col("value").isNotNull)
          .filter(size(array_except(
            transform(json_object_keys(col("value")), k => lower(k)),
            array(known: _*))) > 0)
          .count()
        m.record(n)
      }
      schema
    }, target, config, dlqDir, checkpointDir, quarantineDir, appendCheck)
  }

  private def startWith(source: DataFrame, schemaFor: DataFrame => StructType,
                        target: StructType, config: SinkConfig,
                        dlqDir: String, checkpointDir: String,
                        quarantineDir: Option[String],
                        appendCheck: DataFrame => Seq[(String, Int, Long, String)])
      : (StreamingQuery, TwoPhaseParquetSink, TwoPhaseParquetSink) = {
    val sink = new TwoPhaseParquetSink(config)
    val dlqSink = new TwoPhaseParquetSink(SinkConfig(dlqDir))
    val ledger = quarantineDir.map(new QuarantineLedger(_))
    val query = source
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        val spark = rawBatch.sparkSession
        import spark.implicits._
        // decode per batch (a from_json projection — identical plan to
        // decoding the stream, but the schema may come from the batch)
        val batch = decode(rawBatch, schemaFor(rawBatch))
        val (good, dlq) = validationSplit(batch, target)
        // flatten the good leg onto the destination schema (A8); the raw
        // envelope payload rides along UNDER A RESERVED ALIAS so
        // quarantined rows reach the DLQ with their original payload — a
        // bare "value" would collide with (and silently drop) a target
        // field of the same name.
        val flatAll = good.select(
          (Seq(col("topic"), col("partition"), col("offset"),
               col("value").as("_envelope_value")) ++
            target.fields.map(f => col(s"payload.${f.name}").as(f.name))): _*)
        // (2) feedback: previously-quarantined coordinates skip the append
        val quarantined = ledger.map(_.load()).getOrElse(Seq.empty)
        val (toAppend, dlqQuarantine) =
          if (quarantined.isEmpty) (flatAll, None)
          else {
            val qdf = quarantined.map(e => (e.topic, e.partition, e.offset, e.error))
              .toDF("topic", "partition", "offset", "_qerr")
            val marked = flatAll.join(broadcast(qdf),
              Seq("topic", "partition", "offset"), "left_outer")
            (marked.filter(col("_qerr").isNull).drop("_qerr"),
             Some(marked.filter(col("_qerr").isNotNull)
               .select(col("topic"), col("partition"), col("offset"),
                       col("_envelope_value").as("value"),
                       col("_qerr").as("err"))))
          }
        val appendable = toAppend.drop("_envelope_value")
        // (1) remote row-level response: record + fail, or classify
        val corrupted =
          try appendCheck(appendable)
          catch {
            case e: Throwable if ErrorClassifier.isRetriable(e) => throw e
            case e: Throwable =>
              throw new IllegalStateException("unretriable append failure", e)
          }
        if (corrupted.nonEmpty) {
          ledger.foreach(_.append(batchId, corrupted))
          throw AppendRowsException(corrupted)
        }
        sink.writeBatch(appendable, batchId)
        val dlqLeg = dlq.select(col("topic"), col("partition"), col("offset"),
                                col("value"), col("err"))
        dlqSink.writeBatch(
          dlqQuarantine.map(dlqLeg.unionByName(_)).getOrElse(dlqLeg), batchId)
        ()
      }
      .start()
    (query, sink, dlqSink)
  }
}
