package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Formatting kernel for the Go `.999`-trimmed ISO-8601 rendering
  * (reference internal/processor/processor.go:16-18): µs epoch → UTC,
  * truncate to milliseconds, trim trailing fractional zeros, bare second
  * has no dot. Lives in its own object (no companion class) so the Scala
  * static forwarder is callable from generated Java.
  */
object IsoMicrosFormat {
  private val baseFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss")
    .withZone(java.time.ZoneOffset.UTC)

  def format(epochMicros: Long): UTF8String = {
    val seconds = Math.floorDiv(epochMicros, 1000000L)
    val microsInSec = Math.floorMod(epochMicros, 1000000L)
    val ms = microsInSec / 1000L // truncation, as Go's .999 formatting
    val base = baseFmt.format(java.time.Instant.ofEpochSecond(seconds))
    val out =
      if (ms == 0L) base + "Z"
      else {
        var frac = f"$ms%03d"
        while (frac.endsWith("0")) frac = frac.substring(0, frac.length - 1)
        base + "." + frac + "Z"
      }
    UTF8String.fromString(out)
  }
}

/** Native Catalyst expression for the trimmed ISO format — a codegen'd
  * single-call kernel instead of the composed
  * date_format+regexp_replace pipeline (SURVEY.md §4.2: the clean option).
  * Both implementations are golden-tested against the same vectors;
  * `q_pipe_iso_trim_native` proves them equal on real data under the
  * DuckDB oracle.
  */
case class IsoMicrosTrimExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"iso_micros_trimmed requires BIGINT input, got ${child.dataType.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    IsoMicrosFormat.format(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IsoMicrosFormat.format($c)")

  override protected def withNewChildInternal(newChild: Expression): IsoMicrosTrimExpression =
    copy(child = newChild)
}

object IsoMicrosTrimExpression {
  /** Column wrapper for the native expression (Spark 4 bridges Column and
    * Expression through classic.ExpressionUtils).
    */
  def column(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(IsoMicrosTrimExpression(ColumnBridge.expression(c)))
  }
}
