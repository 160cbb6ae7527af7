package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Typed distributed MinHash sketch: a `Aggregator[String, sig, sig]`
  * producing a numHashes-wide signature per group (document), mergeable
  * across partitions by elementwise min — the map-side-combinable sketch
  * the 100 TB dedup path runs on (SURVEY.md §2B B11; the SQL-expression
  * formulation lives in graft.ops.Dedup.minhashBands).
  *
  * Hash parity: reproduces Spark's `hash(shingle, i)` exactly —
  * Murmur3Hash folds seed 42 through each argument
  * (hashInt(i, hashUnsafeBytes(shingle, 42))) — so signatures from this
  * Aggregator and from the expression path are interchangeable.
  */
case class MinHashAggregator(numHashes: Int)
    extends Aggregator[String, Array[Int], Array[Int]] {

  override def zero: Array[Int] = Array.fill(numHashes)(Int.MaxValue)

  override def reduce(buf: Array[Int], shingle: String): Array[Int] = {
    val u = UTF8String.fromString(shingle)
    val hstr = Murmur3_x86_32.hashUnsafeBytes(
      u.getBaseObject, u.getBaseOffset, u.numBytes(), 42)
    var i = 0
    while (i < numHashes) {
      val h = Murmur3_x86_32.hashInt(i, hstr)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(reduction: Array[Int]): Array[Int] = reduction

  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
}
