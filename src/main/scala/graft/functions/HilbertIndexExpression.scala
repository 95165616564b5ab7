package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Static kernel for the Hilbert curve index — semantically identical to
  * the composed form in [[graft.operators.Layout.hilbertIndex]] (five
  * when/mask/add projection stages), but ONE tight generated loop per row
  * instead of `order` chained projections whose rx/ry classification
  * expressions each re-evaluate interpreted CASE trees. Same public
  * algorithm (the standard iterative xy→d conversion: quadrant bits,
  * s²·(3·rx XOR ry) contribution, reflect+swap rotation); LayoutSpec
  * proves the two forms bit-identical on the full grid, so the DuckDB
  * oracle written against the composed recurrence gates this kernel too.
  */
object HilbertKernel {
  def index(order: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Native codegen form of [[graft.operators.Layout.hilbertIndex]]. */
case class HilbertIndexExpression(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  require(order >= 1 && order <= 31, s"order must be in [1, 31], got $order")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertKernel.index(order, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HilbertKernel.index($order, $a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndexExpression {
  def column(x: Column, y: Column, order: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(HilbertIndexExpression(
      ColumnBridge.expression(x), ColumnBridge.expression(y), order))
  }
}
