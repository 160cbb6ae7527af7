package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables

/** Fixture-drift guard for `Tables.events`.
  *
  * The driver regenerates the testdata between rounds, and `events.ts` has
  * shipped as BOTH parquet TIMESTAMP(NANOS) (Spark 4 reads it only as raw
  * long nanos under `spark.sql.legacy.parquet.nanosAsLong`) and
  * TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ). Round 5 lost 49
  * queries to a silent dtype flip; this spec writes one fixture per
  * encoding the loader claims to support and asserts every one resolves to
  * the same µs `TimestampType` column with identical values — so the next
  * flip fails HERE, loudly, instead of in 49 downstream queries.
  */
class TablesFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // 2023-11-14T22:13:20.123456789Z as epoch nanos; µs truncation floors.
  private val nanos  = 1700000000123456789L
  private val micros = 1700000000123456L

  private def writeFixture(schema: StructType, rows: Seq[Row]): String = {
    val dir = Files.createTempDirectory("graft-events-fixture").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loadedMicros(dir: String): Long = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"Tables.events must normalize ts to TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts"))).head.getLong(0)
  }

  test("events loader handles raw long nanos (legacy TIMESTAMP(NANOS) read)") {
    val dir = writeFixture(
      StructType(Seq(StructField("user_id", LongType), StructField("ts", LongType))),
      Seq(Row(1L, nanos)))
    assert(loadedMicros(dir) == micros)
  }

  test("events loader handles native timestamp[us] read as TIMESTAMP_NTZ") {
    val dir = writeFixture(
      StructType(Seq(StructField("user_id", LongType), StructField("ts", TimestampNTZType))),
      Seq(Row(1L, java.time.LocalDateTime.ofEpochSecond(
        micros / 1000000L, (micros % 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC))))
    assert(loadedMicros(dir) == micros)
  }

  test("events loader passes through session-TZ TimestampType unchanged") {
    val dir = writeFixture(
      StructType(Seq(StructField("user_id", LongType), StructField("ts", TimestampType))),
      Seq(Row(1L, new Timestamp(micros / 1000L))))
    // fixture value has ms precision: assert on the same truncation
    assert(loadedMicros(dir) == (micros / 1000L) * 1000L)
  }

  test("the shipped testdata's events.ts loads as TimestampType at every SF") {
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val df = Tables.events(spark, s"/root/testdata/$sf")
      assert(df.schema("ts").dataType == TimestampType, s"$sf ts dtype drifted")
      assert(df.limit(1).count() == 1L, s"$sf events unreadable")
    }
  }
}
