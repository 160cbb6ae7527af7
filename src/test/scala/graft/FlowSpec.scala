package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.convert.SchemaReconcile
import graft.flow.Flow

class FlowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("microBatchIds cuts per-partition count-based chunks") {
    val df = (0L until 250L).map(i => (i % 2, i)).toDF("p", "off")
    val out = Flow.microBatchIds(df, col("p"), col("off"), 50)
      .groupBy("p", "mb_chunk").count().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // 125 rows per partition → chunks of 50,50,25
    assert(out((0L, 0L)) == 50 && out((0L, 1L)) == 50 && out((0L, 2L)) == 25)
    assert(out((1L, 2L)) == 25)
  }

  test("boundaryCutIds cuts exactly AFTER each boundary offset") {
    val df = (0L until 10L).map(i => (1L, i)).toDF("p", "off")
    val out = Flow.boundaryCutIds(df, col("p"), col("off"), col("off") === 3 || col("off") === 7)
      .select("off", "cut_batch").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(3) == 0, "boundary row stays in its batch")
    assert(out(4) == 1, "next row starts the new batch")
    assert(out(7) == 1 && out(8) == 2)
  }

  test("quarantineSplit partitions rows exactly") {
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
    val bad = Seq(3L, 5L, 97L).toDF("k")
    val (good, dlq) = Flow.quarantineSplit(df, bad, Seq("k"))
    assert(good.count() == 97 && dlq.count() == 3)
    assert(good.join(dlq, Seq("k"), "inner").count() == 0)
  }

  test("dedupSurvivor keeps the deterministic first-ranked row") {
    val df = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "ord", "v")
    val out = Flow.dedupSurvivor(df, Seq(col("k")), Seq(col("ord").desc))
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "b", 2L -> "c"))
  }

  test("SchemaReconcile drops unknown fields and casts survivors") {
    val df = Seq((1, "x", 2.5, "extra")).toDF("a", "b", "c", "junk")
    val target = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("c", StringType, nullable = true)))
    val out = SchemaReconcile.reconcile(df, target)
    assert(out.schema.fieldNames.toSeq == Seq("a", "c"))
    assert(out.schema("a").dataType == LongType)
    val r = out.collect()(0)
    assert(r.getLong(0) == 1L && r.getString(1) == "2.5")
  }

  test("SchemaReconcile fails fast on missing required field") {
    val df = Seq((1, "x")).toDF("a", "b")
    val target = StructType(Seq(StructField("zz", LongType, nullable = false)))
    val e = intercept[IllegalArgumentException] {
      SchemaReconcile.reconcile(df, target)
    }
    assert(e.getMessage.contains("zz"))
  }
}
