package graft.functions

import java.text.Normalizer
import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-codec expressions for the curation surface.
  *
  * Both are UnaryExpressions with `doGenCode` emitting one static call —
  * the kernel work (zlib, ICU-style normalization) lives in a JVM
  * library, so unlike [[VectorExpressions]] there is no loop to unroll,
  * but generating the call keeps the projection inside the surrounding
  * WholeStageCodegen span instead of forcing an eval() island the way a
  * Scala UDF would (boxing + lambda dispatch per row).
  */
object TextCodecs {

  /** NFC-normalize (Unicode canonical composition) — the text-hygiene
    * step run before any hash-based dedup tier: "café" composed and
    * "café" decomposed hash differently but ARE the same text. */
  def nfcJava(s: UTF8String): UTF8String =
    UTF8String.fromString(Normalizer.normalize(s.toString, Normalizer.Form.NFC))

  /** Deflate (zlib level 6) byte length of the UTF-8 text — the
    * compression-ratio quality signal (CCNet/RefinedWeb lineage):
    * template spam and boilerplate compress far below prose. Level and
    * strategy are pinned so the measurement is deterministic. */
  def deflateLenJava(s: UTF8String): Long = {
    val bytes = s.getBytes
    val d = new Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](256)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  def deflate_len(c: Column): Column =
    ColumnBridge.column(DeflateLength(ColumnBridge.expression(c)))
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    TextCodecs.nfcJava(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCodecs.nfcJava($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class DeflateLength(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(s: Any): Any =
    TextCodecs.deflateLenJava(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCodecs.deflateLenJava($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
