package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03 —
  * public algorithm): Rabin-Karp rolling hashes over byte k-grams, then
  * the minimum hash of every window of w consecutive k-gram hashes
  * (rightmost-min rule), deduplicated consecutively. Guarantees: any match
  * of length ≥ w + k − 1 between two documents shares a fingerprint, and
  * an edit only perturbs fingerprints within w + k − 1 bytes of it.
  *
  * Rolling hash: h_i = Σ b_{i+j}·B^{k−1−j} mod M with B=257, M=2^31−1 —
  * pure integer arithmetic, reproducible anywhere.
  *
  * One row in, one modest array out, schema-recursive nowhere —
  * CodegenFallback, like Spark's own collection expressions of this shape.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, "k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects STRING, got ${other.simpleString}")
  }

  private val B = 257L
  private val M = 2147483647L // 2^31 - 1
  // B^(k-1) mod M, for removing the outgoing byte
  private val Bk1: Long = {
    var p = 1L; var i = 0
    while (i < k - 1) { p = p * B % M; i += 1 }
    p
  }

  override def nullSafeEval(value: Any): Any = {
    val bytes = value.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val nHashes = n - k + 1
    val hashes = new Array[Long](nHashes)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + (bytes(i) & 0xff)) % M; i += 1 }
    hashes(0) = h
    i = 1
    while (i < nHashes) {
      h = (h - (bytes(i - 1) & 0xff) * Bk1 % M + M) % M
      h = (h * B + (bytes(i + k - 1) & 0xff)) % M
      hashes(i) = h
      i += 1
    }
    if (nHashes <= w) {
      // document shorter than one window: fingerprint = global min
      var mn = hashes(0); i = 1
      while (i < nHashes) { if (hashes(i) < mn) mn = hashes(i); i += 1 }
      return new GenericArrayData(Array(mn))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastPicked = -1
    var wStart = 0
    while (wStart <= nHashes - w) {
      // rightmost minimal hash in window [wStart, wStart + w)
      var minIdx = wStart
      var j = wStart + 1
      while (j < wStart + w) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
      if (minIdx != lastPicked) { out += hashes(minIdx); lastPicked = minIdx }
      wStart += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Winnow {
  def winnow_fingerprints(c: Column, k: Int = 5, w: Int = 4): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(c), k, w))
}
