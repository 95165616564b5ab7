package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Static kernels for dense-vector scoring — the per-pair inner loop of the
  * similarity-search family ([[graft.operators.Similarity]]).
  *
  * Semantics are IDENTICAL to the composed higher-order-function forms
  * (`aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` etc.): the same
  * left-to-right IEEE accumulation order, `java.lang.Math.sqrt` on both
  * sides, so results are bit-identical and the DuckDB oracles written
  * against the composed forms gate these kernels too (VectorKernelSpec
  * proves pairwise bit-equality). The difference is purely mechanical: ONE
  * fused primitive loop per pair versus three HOF folds whose lambda trees
  * re-evaluate per element — the same rationale as [[HilbertKernel]].
  *
  * Null/ragged contract (matches the composed forms): a null element or a
  * length mismatch yields SQL NULL (`zip_with` pads the shorter side with
  * null, which poisons the fold); the expressions check validity before
  * invoking the kernels, so the kernels themselves assume dense equal-length
  * input.
  *
  * One documented divergence: a zero-norm input makes the composed form
  * raise DIVIDE_BY_ZERO under Spark 4's default ANSI mode, while the fused
  * kernel computes the raw IEEE result (NaN) — which is what the DuckDB
  * oracle's double division produces. Real embeddings are nonzero, so no
  * catalog query reaches the edge either way (VectorKernelSpec pins both
  * behaviors).
  */
object VectorKernels {
  /** True iff the pair must evaluate to SQL NULL (ragged or null element). */
  def invalid(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    if (n != b.numElements()) return true
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Fused cosine: dot, |a|², |b|² in one pass, then dot/(√aa·√bb) — the
    * identical float ops the composed `dot/(norm·norm)` performs, just
    * without re-walking each array three times.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    dot / (java.lang.Math.sqrt(aa) * java.lang.Math.sqrt(bb))
  }

  /** Exact int64 dot of two quantized (int8-in-int64) vectors. */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}

private[functions] trait VectorPairExpression { self: BinaryExpression =>
  def elementType: DataType
  def fnName: String

  // The expression introduces NULL itself (ragged / null-element pairs),
  // independent of input nullability — without this override codegen would
  // constant-fold ev.isNull to `false` for non-nullable inputs.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _)) if l == elementType && r == elementType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$fnName requires (ARRAY<${elementType.sql}>, ARRAY<${elementType.sql}>), " +
            s"got (${l.sql}, ${r.sql})")
    }
}

/** Native codegen form of [[graft.operators.Similarity.cosine]]. */
case class CosineSimilarityExpression(left: Expression, right: Expression)
    extends BinaryExpression with VectorPairExpression {
  override def elementType: DataType = DoubleType
  override def fnName: String = "cosine_similarity"
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (VectorKernels.invalid(x, y)) null else VectorKernels.cosine(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if (graft.functions.VectorKernels.invalid($a, $b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.VectorKernels.cosine($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpression {
  def column(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(CosineSimilarityExpression(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

/** Native codegen form of [[graft.operators.Similarity.intDot]]. */
case class DotProductLongExpression(left: Expression, right: Expression)
    extends BinaryExpression with VectorPairExpression {
  override def elementType: DataType = LongType
  override def fnName: String = "dot_long"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (VectorKernels.invalid(x, y)) null else VectorKernels.dotLong(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if (graft.functions.VectorKernels.invalid($a, $b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.VectorKernels.dotLong($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLongExpression =
    copy(left = newLeft, right = newRight)
}

object DotProductLongExpression {
  def column(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(DotProductLongExpression(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
