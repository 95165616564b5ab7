package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC kernel — lives in its own object so the Scala static
  * forwarder is callable from generated Java (the IsoMicrosFormat pattern).
  *
  * Fast path: a pure-ASCII string (the overwhelming majority of web corpus
  * rows) is NFC by definition — detected with one pass over the BYTES
  * (every UTF-8 continuation/lead byte has the high bit set), returning
  * the input UTF8String without decoding or allocating. Non-ASCII rows go
  * through `java.text.Normalizer` (canonical composition per UAX#15 —
  * the same spec DuckDB's utf8proc `nfc_normalize` implements, which is
  * what makes the cross-engine oracle exact).
  */
object NfcNormalize {
  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
  }
}

/** Native Catalyst expression for NFC canonicalization — the first step of
  * text-dedup canonicalization at corpus scale: unicode-equivalent
  * spellings ("Café" precomposed vs "Cafe" + combining acute) MUST collapse
  * to one byte sequence before exact-hash or MinHash dedup, or every
  * equivalent pair silently survives as a "distinct" document. Spark ships
  * no normalization function; the composed workaround is a Scala UDF
  * (serialization boundary, no codegen). This expression stays inside
  * WholeStageCodegen with an allocation-free ASCII bypass.
  */
case class NfcNormalizeExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING input, got ${child.dataType.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    NfcNormalize.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpression =
    copy(child = newChild)
}

object NfcNormalizeExpression {
  /** Column wrapper for the native expression. */
  def column(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(NfcNormalizeExpression(ColumnBridge.expression(c)))
  }
}
