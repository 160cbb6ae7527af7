package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{SinkConfig, TwoPhaseParquetSink, WriteMode}

/** Crash-injection walk of the pending-mode two-phase commit: the
  * publish sequence for batches (0, 1) is the four atomic filesystem
  * steps [move(0), mark(0), move(1), mark(1)]; a crash can land after
  * any prefix of them. For EVERY prefix, the recovery protocol — the
  * streaming engine replays each uncommitted batch through writeBatch,
  * then commit() runs — must converge to exactly-once visibility:
  * every row visible exactly once, every batch marked committed.
  *
  * This generalizes the reference's pending-mode invisibility test
  * (BigqueryStreamWriterIntegrationTest.java:87-116) to crash timing,
  * exercising the repair paths in TwoPhaseParquetSink.commit() (the
  * marker-less-target case is a crash between a batch's atomic move and
  * its marker — without repair, the replayed staging copy's move would
  * throw FileAlreadyExists and wedge the sink).
  */
class CrashRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(): String = Files.createTempDirectory("graft-crash").toString

  private def deleteRec(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRec(_)) finally s.close()
    }
    Files.delete(p)
  }

  /** Rows of batch b — same batchId ⇒ same offset range ⇒ same rows,
    * which is the invariant replay relies on. */
  private def batchDf(b: Long) = {
    import spark.implicits._
    Seq((s"batch$b-row0", b * 10), (s"batch$b-row1", b * 10 + 1)).toDF("id", "v")
  }

  /** Manually perform the first `steps` atomic steps of commit() for
    * batches 0,1, simulating a crash at that point. */
  private def partialCommit(dir: String, steps: Int): Unit = {
    val ops: Seq[() => Unit] = Seq(
      () => Files.move(Paths.get(dir, "_staging", "batch=0"),
        Paths.get(dir, "data", "batch=0"), StandardCopyOption.ATOMIC_MOVE),
      () => Files.createFile(Paths.get(dir, "_commits", "0")),
      () => Files.move(Paths.get(dir, "_staging", "batch=1"),
        Paths.get(dir, "data", "batch=1"), StandardCopyOption.ATOMIC_MOVE),
      () => Files.createFile(Paths.get(dir, "_commits", "1")))
    ops.take(steps).foreach(_.apply())
  }

  test("recovery converges to exactly-once from a crash after ANY commit step") {
    for (crashAfter <- 0 to 4) {
      val dir = tmp()
      val sink = new TwoPhaseParquetSink(SinkConfig(dir, WriteMode.Pending))
      sink.writeBatch(batchDf(0), 0L)
      sink.writeBatch(batchDf(1), 1L)
      partialCommit(dir, crashAfter) // crash leaves this prefix behind
      // --- recovery: a fresh sink instance (new JVM), engine replays
      // every batch whose marker is missing, then commit() runs
      val recovered = new TwoPhaseParquetSink(SinkConfig(dir, WriteMode.Pending))
      for (b <- 0L to 1L if !recovered.isCommitted(b))
        recovered.writeBatch(batchDf(b), b)
      recovered.commit()
      val rows = recovered.read(spark).collect().map(_.getAs[String]("id")).sorted.toSeq
      assert(rows == Seq("batch0-row0", "batch0-row1", "batch1-row0", "batch1-row1"),
        s"crashAfter=$crashAfter: rows must appear exactly once, got $rows")
      assert(recovered.committedBatchIds() == Seq(0L, 1L),
        s"crashAfter=$crashAfter: both markers must exist")
    }
  }

  test("double crash: failing again mid-recovery still converges") {
    val dir = tmp()
    val sink = new TwoPhaseParquetSink(SinkConfig(dir, WriteMode.Pending))
    sink.writeBatch(batchDf(0), 0L)
    sink.writeBatch(batchDf(1), 1L)
    partialCommit(dir, 1) // crash #1: batch 0 moved but unmarked
    // recovery #1 replays the unmarked batches (staging both again),
    // then crashes before its commit() — and its own partial commit
    // repairs batch 0 (drops the duplicate, marks) but dies before
    // touching batch 1
    val r1 = new TwoPhaseParquetSink(SinkConfig(dir, WriteMode.Pending))
    for (b <- 0L to 1L if !r1.isCommitted(b)) r1.writeBatch(batchDf(b), b)
    // crash #2: commit()'s batch-0 repair completed (duplicate staged
    // copy dropped, marker written) but it died before touching batch 1
    deleteRec(Paths.get(dir, "_staging", "batch=0"))
    Files.createFile(Paths.get(dir, "_commits", "0"))
    // recovery #2: full protocol from scratch on a fresh instance
    val r2 = new TwoPhaseParquetSink(SinkConfig(dir, WriteMode.Pending))
    for (b <- 0L to 1L if !r2.isCommitted(b)) r2.writeBatch(batchDf(b), b)
    r2.commit()
    assert(r2.read(spark).count() == 4, "all four rows exactly once")
    assert(r2.committedBatchIds() == Seq(0L, 1L))
  }

  test("committed-mode torn write (data dir, no marker) repairs by overwrite") {
    val dir = tmp()
    val sink = new TwoPhaseParquetSink(SinkConfig(dir))
    sink.writeBatch(batchDf(0), 0L)
    // crash after the parquet commit but before the marker
    Files.delete(Paths.get(dir, "_commits", "0"))
    val recovered = new TwoPhaseParquetSink(SinkConfig(dir))
    recovered.writeBatch(batchDf(0), 0L) // replay overwrites in place
    assert(recovered.read(spark).count() == 2)
    assert(recovered.committedBatchIds() == Seq(0L))
  }
}
