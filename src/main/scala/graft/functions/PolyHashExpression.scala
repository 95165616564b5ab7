package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for the cross-engine polynomial fingerprint:
  * fold (acc·31 + codepoint) mod 1e9+7 over the string's code points —
  * semantically identical to the composed
  * aggregate(transform(split(s,''), ascii), …) HOF pipeline and to DuckDB's
  * list_reduce over string_split(s, ''), but one tight generated-Java loop
  * instead of per-character array allocation + interpreted lambdas.
  */
object PolyHashKernel {
  val Prime = 1000000007L

  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Prime
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Native codegen form of [[graft.operators.Dedup.polyHash]] — the dedup
  * family's hot kernel (every shingle of every document flows through it).
  */
case class PolyHashExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    PolyHashKernel.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHashKernel.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpression =
    copy(child = newChild)
}

object PolyHashExpression {
  def column(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PolyHashExpression(ColumnBridge.expression(c)))
  }
}
