package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{ErrorClassifier, SinkConfig, TwoPhaseParquetSink, WriteMode}
import graft.streaming.StreamPipeline

/** Mirrors the reference's writer/integration test coverage
  * (BigqueryStreamWriterTest.java, BigqueryStreamWriterIntegrationTest.java):
  * buffering/landing, pending-mode invisibility before commit, replay
  * idempotence (ALREADY_EXISTS), row-level error split, reset/finalize.
  */
class StreamPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  case class Env(topic: String, partition: Int, offset: Long, key: String, value: String)

  private val valueSchema = StructType(Seq(
    StructField("id", StringType), StructField("int_value", LongType)))
  // FIXTURES.md F1 — (id STRING required, int_value INT64 required)
  private val target = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("int_value", LongType, nullable = false)))

  private def tmp(): String = Files.createTempDirectory("graft-sink").toString

  private def runPipeline(records: Seq[Env], mode: WriteMode) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Env]
    stream.addData(records)
    val (q, sink, dlq) = StreamPipeline.start(
      stream.toDF(), valueSchema, target,
      SinkConfig(tmp(), mode), dlqDir = tmp(), checkpointDir = tmp())
    q.awaitTermination(60000)
    (sink, dlq)
  }

  test("committed mode: good rows visible immediately, bad rows in DLQ") {
    val records = Seq(
      Env("t", 0, 0L, null, """{"id":"id-0","int_value":123}"""),
      Env("t", 0, 1L, null, """{"id":"id-1","int_value":456}"""),
      Env("t", 0, 2L, null, """not json at all"""),
      Env("t", 0, 3L, null, """{"id":null,"int_value":7}"""))
    val (sink, dlq) = runPipeline(records, WriteMode.Committed)
    val good = sink.read(spark).collect()
    assert(good.map(_.getAs[String]("id")).sorted.toSeq == Seq("id-0", "id-1"))
    val bad = dlq.read(spark).collect()
    assert(bad.length == 2)
    val errByOffset = bad.map(r => r.getAs[Long]("offset") -> r.getAs[String]("err")).toMap
    assert(errByOffset(2L) == "unparseable payload")
    assert(errByOffset(3L).contains("required field $.id"))
  }

  test("pending mode: rows invisible until commit, visible after") {
    val records = Seq(Env("t", 0, 0L, null, """{"id":"a","int_value":1}"""))
    val (sink, _) = runPipeline(records, WriteMode.Pending)
    assert(sink.read(spark).isEmpty, "pending rows must be invisible before commit")
    sink.commit()
    assert(sink.read(spark).count() == 1, "commit publishes staged batches")
    assert(sink.committedBatchIds().nonEmpty)
  }

  test("pending mode: reset discards staged rows") {
    val records = Seq(Env("t", 0, 0L, null, """{"id":"a","int_value":1}"""))
    val (sink, _) = runPipeline(records, WriteMode.Pending)
    sink.reset()
    sink.commit()
    assert(sink.read(spark).isEmpty, "reset batches must never surface")
  }

  test("batch replay is idempotent (ALREADY_EXISTS image)") {
    import spark.implicits._
    val sink = new TwoPhaseParquetSink(SinkConfig(tmp()))
    val df = Seq(("a", 1L)).toDF("id", "int_value")
    sink.writeBatch(df, batchId = 7L)
    sink.writeBatch(df, batchId = 7L) // replay after recovery
    assert(sink.read(spark).count() == 1, "replayed batch must not duplicate rows")
    assert(sink.committedBatchIds() == Seq(7L))
  }

  test("crash between data write and marker: replay repairs and re-marks") {
    import spark.implicits._
    val dir = tmp()
    val sink = new TwoPhaseParquetSink(SinkConfig(dir))
    sink.writeBatch(Seq(("a", 1L)).toDF("id", "v"), 3L)
    // simulate crash after the parquet landed but before the marker
    Files.delete(java.nio.file.Paths.get(dir, "_commits", "3"))
    sink.writeBatch(Seq(("a", 1L)).toDF("id", "v"), 3L) // checkpoint replay
    assert(sink.read(spark).count() == 1)
    assert(sink.committedBatchIds() == Seq(3L))
  }

  test("torn staging write is repaired by replay, not skipped") {
    import spark.implicits._
    val dir = tmp()
    val sink = new TwoPhaseParquetSink(SinkConfig(dir, WriteMode.Pending))
    // simulate a crash mid-stage: partial garbage where the batch dir goes
    val staged = java.nio.file.Paths.get(dir, "_staging", "batch=0")
    Files.createDirectories(staged)
    Files.writeString(staged.resolve("part-garbage.parquet"), "not parquet")
    sink.writeBatch(Seq(("a", 1L), ("b", 2L)).toDF("id", "v"), 0L) // replay
    sink.commit()
    assert(sink.read(spark).count() == 2, "replay must overwrite the torn staging dir")
  }

  test("config validation rejects unknown write.mode (A16)") {
    assert(WriteMode.parse("PENDING") == WriteMode.Pending)
    val e = intercept[IllegalArgumentException] { WriteMode.parse("yolo") }
    assert(e.getMessage.contains("write.mode"))
    intercept[IllegalArgumentException] { SinkConfig(tmp(), maxRecordsPerTrigger = 0) }
  }

  test("error classification table marks IO as retriable, logic as not") {
    assert(ErrorClassifier.isRetriable(new java.io.IOException("net")))
    assert(!ErrorClassifier.isRetriable(new IllegalStateException("bug")))
    // the reference's code table, verbatim (BigqueryStreamWriter.java:120-127)
    for (code <- Seq("INTERNAL", "ABORTED", "CANCELLED",
                     "FAILED_PRECONDITION", "DEADLINE_EXCEEDED", "UNAVAILABLE"))
      assert(ErrorClassifier.isRetriable(graft.sink.TransportException(code)))
    for (code <- Seq("INVALID_ARGUMENT", "NOT_FOUND", "PERMISSION_DENIED",
                     "ALREADY_EXISTS", "OUT_OF_RANGE"))
      assert(!ErrorClassifier.isRetriable(graft.sink.TransportException(code)),
        s"$code must not retry (handled by dedicated paths or fatal)")
  }

  test("quarantine feedback loop: corrupted rows rewind, then DLQ on replay") {
    // The image of the reference's corrupted-row preCommit test
    // (BigqueryStorageWriteSinkTaskTest.java:197-224): a remote append
    // names rejected rows → offsets rewind with nothing landed → the
    // replay routes exactly those rows to the error reporter and the rest
    // commit.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sinkDir = tmp(); val dlqDir = tmp(); val ckpt = tmp(); val qDir = tmp()
    // content-addressed rejection: a plain retry would fail identically
    // forever — only the quarantine loop makes progress
    val reject: org.apache.spark.sql.DataFrame => Seq[(String, Int, Long, String)] =
      df => df.filter(col("id") === "poison")
        .select("topic", "partition", "offset").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
                   "row rejected by remote append")).toSeq
    val stream = MemoryStream[Env]
    stream.addData(Seq(
      Env("t", 0, 0L, null, """{"id":"id-0","int_value":1}"""),
      Env("t", 0, 1L, null, """{"id":"poison","int_value":2}"""),
      Env("t", 0, 2L, null, """{"id":"id-2","int_value":3}""")))
    def run() = StreamPipeline.start(stream.toDF(), valueSchema, target,
      SinkConfig(sinkDir), dlqDir, ckpt, quarantineDir = Some(qDir),
      appendCheck = reject)

    // attempt 1: the append fails, nothing lands, the batch rewinds
    val (q1, sink1, _) = run()
    intercept[Exception] { q1.awaitTermination(60000) }
    assert(sink1.read(spark).isEmpty, "failed append must land nothing")
    assert(sink1.committedBatchIds().isEmpty)

    // attempt 2: checkpoint replays the same batch; the quarantined row is
    // split to the DLQ before the append, which now succeeds
    val (q2, sink2, dlq2) = run()
    q2.awaitTermination(60000)
    assert(q2.exception.isEmpty, s"replay must succeed: ${q2.exception}")
    val good = sink2.read(spark).collect()
    assert(good.map(_.getAs[Long]("offset")).sorted.toSeq == Seq(0L, 2L))
    assert(!good.exists(_.getAs[String]("id") == "poison"))
    val bad = dlq2.read(spark).collect()
    assert(bad.length == 1 && bad.head.getAs[Long]("offset") == 1L)
    assert(bad.head.getAs[String]("err") == "row rejected by remote append")
    assert(sink2.committedBatchIds() == Seq(0L))
  }

  test("quarantine ledger round-trips commas, newlines, and backslash sequences") {
    val ledger = new graft.sink.QuarantineLedger(tmp())
    // "a\nb" (literal backslash + n) is the killer: its escaped form
    // contains the two-char sequence "\n", which a naive sequential
    // replace-based unescape would turn into a real linefeed
    val nasty = Seq(
      ("topic,with,commas", 0, 1L, "line1\nline2"),
      ("a\\nb", 1, 2L, "back\\slash, and \\c too"),
      ("plain", 2, 3L, "\\"))
    ledger.append(0L, nasty)
    val back = ledger.load().map(e => (e.topic, e.partition, e.offset, e.error))
    assert(back.toSet == nasty.toSet, s"round-trip mismatch: $back")
  }

  test("quarantine ledger accumulates successive rejection rounds for one batch") {
    val ledger = new graft.sink.QuarantineLedger(tmp())
    // round 1: the remote rejects row 1; the batch fails and replays
    ledger.append(5L, Seq(("t", 0, 1L, "bad utf8")))
    // round 2, same replayed batch: row 1 re-recorded (skipped — first
    // error wins) AND a new rejection surfaces. A REPLACE here would
    // forget row 1 and let the feedback loop flip-flop forever.
    ledger.append(5L, Seq(("t", 0, 1L, "different message"), ("t", 0, 2L, "oversize")))
    val back = ledger.load().map(e => (e.topic, e.partition, e.offset, e.error))
    assert(back.toSet == Set(("t", 0, 1L, "bad utf8"), ("t", 0, 2L, "oversize")),
      s"both rounds must accumulate: $back")
  }

  test("maxRecordsPerTrigger (buffer.size) bounds rows per append unit") {
    val dir = tmp()
    val sink = new TwoPhaseParquetSink(SinkConfig(dir, maxRecordsPerTrigger = 10L))
    sink.writeBatch(spark.range(95).toDF("v").coalesce(1), 0L)
    val parts = new java.io.File(s"$dir/data/batch=0").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.length >= 10, s"95 rows / buffer 10 needs ≥10 appends, got ${parts.length}")
    parts.foreach { f =>
      assert(spark.read.parquet(f.getPath).count() <= 10L,
        s"append unit ${f.getName} exceeds buffer.size")
    }
    assert(sink.read(spark).count() == 95L)
  }

  test("retriable transport failure propagates without quarantining rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val qDir = tmp()
    val stream = MemoryStream[Env]
    stream.addData(Seq(Env("t", 0, 0L, null, """{"id":"a","int_value":1}""")))
    val (q, sink, _) = StreamPipeline.start(stream.toDF(), valueSchema, target,
      SinkConfig(tmp()), dlqDir = tmp(), checkpointDir = tmp(),
      quarantineDir = Some(qDir),
      appendCheck = _ => throw new java.io.IOException("transient network"))
    intercept[Exception] { q.awaitTermination(60000) }
    assert(new graft.sink.QuarantineLedger(qDir).isEmpty,
      "a transport failure must not quarantine rows — the rows are fine")
    assert(sink.committedBatchIds().isEmpty)
  }

  test("startInferred runs the full pipeline with no declared value schema") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Env]
    stream.addData(Seq(
      Env("t", 0, 0L, null, """{"id":"id-0","int_value":123}"""),
      Env("t", 0, 1L, null, """not json at all"""),
      Env("t", 0, 2L, null, """{"id":null,"int_value":7}""")))
    val (q, sink, dlq) = StreamPipeline.startInferred(
      stream.toDF(), target, SinkConfig(tmp()), dlqDir = tmp(), checkpointDir = tmp())
    q.awaitTermination(60000)
    assert(q.exception.isEmpty, s"inferred pipeline must run clean: ${q.exception}")
    val good = sink.read(spark).collect()
    assert(good.map(_.getAs[String]("id")).toSeq == Seq("id-0"))
    assert(good.head.getAs[Long]("int_value") == 123L)
    val bad = dlq.read(spark).collect()
    val errByOffset = bad.map(r => r.getAs[Long]("offset") -> r.getAs[String]("err")).toMap
    assert(errByOffset(1L) == "unparseable payload")
    assert(errByOffset(2L).contains("required field $.id"),
      "strict converter rules still apply to inferred payloads")
  }

  test("startInferred survives type drift: target types win, bad rows go to DLQ") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Env]
    // every int_value arrives QUOTED — inference alone would type it
    // STRING and fail the strict converter's analysis-time type check;
    // reconciling to the target type parses row 0 as a corrupt record
    // (PERMISSIVE: unconvertible field → whole record flagged) → DLQ
    stream.addData(Seq(
      Env("t", 0, 0L, null, """{"id":"id-0","int_value":"not a number"}"""),
      Env("t", 0, 1L, null, """{"id":"id-1","int_value":456}""")))
    val ckpt = tmp()
    val (q, sink, dlq) = StreamPipeline.startInferred(
      stream.toDF(), target, SinkConfig(tmp()), dlqDir = tmp(), checkpointDir = ckpt)
    q.awaitTermination(60000)
    assert(q.exception.isEmpty, s"type drift must not crash the query: ${q.exception}")
    assert(sink.read(spark).collect().map(_.getAs[String]("id")).toSeq == Seq("id-1"))
    assert(dlq.read(spark).collect().map(_.getAs[Long]("offset")).toSeq == Seq(0L))
    // the learned schema is durable next to the checkpoint
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(ckpt, "_inferred_value_schema.ddl")))
  }

  test("drift monitor counts unknown-field rows while decode stays learn-once stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Env]
    stream.addData(Seq(Env("t", 0, 0L, null, """{"id":"id-0","int_value":1}""")))
    val ckpt = tmp(); val out = tmp(); val dlqD = tmp()
    val monitor = new StreamPipeline.SchemaDriftMonitor
    val (q, _, _) = StreamPipeline.startInferred(
      stream.toDF(), target, SinkConfig(out), dlqDir = dlqD, checkpointDir = ckpt,
      drift = Some(monitor))
    q.awaitTermination(60000)
    assert(q.exception.isEmpty)
    assert(monitor.driftRows == 0L, "the learning batch cannot drift from itself")
    // a field appears mid-stream: the reference's per-record inference
    // would pick it up; learn-once drops it — but the monitor must SAY so
    stream.addData(Seq(
      Env("t", 0, 1L, null, """{"id":"id-1","int_value":2,"brand_new_field":true}"""),
      Env("t", 0, 2L, null, """{"id":"id-2","int_value":3}""")))
    val (q2, sink2, dlq2) = StreamPipeline.startInferred(
      stream.toDF(), target, SinkConfig(out), dlqDir = dlqD, checkpointDir = ckpt,
      drift = Some(monitor))
    q2.awaitTermination(60000)
    assert(q2.exception.isEmpty, s"drift must not destabilize decode: ${q2.exception}")
    assert(monitor.driftRows == 1L, s"exactly the one new-field row: ${monitor.driftRows}")
    assert(monitor.driftBatches == 1L)
    // decode unchanged: all three rows land, the unknown field is dropped
    assert(sink2.read(spark).collect().map(_.getAs[String]("id")).toSet ==
      Set("id-0", "id-1", "id-2"))
    assert(dlq2.read(spark).isEmpty)
  }

  test("schema inference fallback: missing fields decode as optional nulls") {
    // reference RecordConverter.java:17-23 — null valueSchema ⇒ infer
    // from the value itself, everything optional
    import spark.implicits._
    val n: String = null
    val env = Seq(
      ("t", 0, 0L, n, """{"id":"a","int_value":1}"""),
      ("t", 0, 1L, n, """{"id":"b"}"""), // missing int_value: optional
      ("t", 0, 2L, n, """not json""")    // corrupt: flagged, not thrown
    ).toDF("topic", "partition", "offset", "key", "value")
    val inferred = StreamPipeline.inferValueSchema(env)
    assert(inferred.fieldNames.sorted.toSeq == Seq("id", "int_value"),
      s"merged sample inference, no corrupt column: $inferred")
    assert(inferred.forall(_.nullable), "inferred fields must be optional")
    val rows = StreamPipeline.decodeInferred(env)
      .select(col("offset"), col("payload.id").as("id"),
        col("payload.int_value").as("iv"),
        col(s"payload.${StreamPipeline.CorruptField}").as("corrupt"))
      .collect().map(r => r.getAs[Long]("offset") ->
        ((r.getAs[String]("id"), Option(r.get(2)), r.getAs[String]("corrupt") != null))).toMap
    assert(rows(0L) == (("a", Some(1L), false)))
    assert(rows(1L) == (("b", None, false)), "missing optional field is null, not a reject")
    assert(rows(2L)._3, "corrupt payload is flagged for the DLQ split")
  }

  test("multi-batch pending commit publishes in batch order") {
    import spark.implicits._
    val sink = new TwoPhaseParquetSink(SinkConfig(tmp(), WriteMode.Pending))
    sink.writeBatch(Seq(("a", 1L)).toDF("id", "v"), 0L)
    sink.writeBatch(Seq(("b", 2L)).toDF("id", "v"), 1L)
    assert(sink.read(spark).isEmpty)
    sink.commit()
    assert(sink.read(spark).count() == 2)
    assert(sink.committedBatchIds() == Seq(0L, 1L))
  }
}
