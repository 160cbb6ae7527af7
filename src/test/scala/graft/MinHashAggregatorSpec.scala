package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashAggregator

class MinHashAggregatorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("aggregator signature matches Spark's hash() expression exactly") {
    val sh = Seq((1L, "a b c"), (1L, "b c d"), (2L, "x y z"), (2L, "a b c"))
      .toDF("doc_id", "sh")
    val n = 8
    val minCols = (0 until n).map(i => min(hash(col("sh"), lit(i))).as(s"h$i"))
    val viaExpr = sh.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .collect().map(r => r.getLong(0) -> (0 until n).map(i => r.getInt(i + 1))).toMap
    val agg = udaf(MinHashAggregator(n))
    val viaAgg = sh.groupBy("doc_id").agg(agg(col("sh")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(viaAgg(1L) == viaExpr(1L), s"${viaAgg(1L)} vs ${viaExpr(1L)}")
    assert(viaAgg(2L) == viaExpr(2L))
  }

  test("merge is elementwise min (partition-order independent)") {
    val a = MinHashAggregator(4)
    val m = a.merge(Array(5, 1, 9, 0), Array(3, 2, 9, -4))
    assert(m.toSeq == Seq(3, 1, 9, -4))
  }

  test("signatures of identical shingle sets are identical, Jaccard-ish for near sets") {
    val docs = (1 to 2).flatMap(d => Seq("a b c", "b c d", "c d e").map((d.toLong, _))) ++
      Seq((3L, "zz yy xx"))
    val agg = udaf(MinHashAggregator(16))
    val sigs = docs.toDF("doc_id", "sh").groupBy("doc_id").agg(agg(col("sh")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(sigs(1L) == sigs(2L), "equal sets → equal signatures")
    assert(sigs(1L) != sigs(3L), "disjoint sets → different signatures")
  }
}
