package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for the 30-bit SimHash fingerprint — semantically identical
  * to the composed HOF form it replaces
  * (`aggregate(transform(sequence(0,29), i => majority-vote bit), …)` over
  * `transform(split(trim(text), "\s+"), polyHash)`), but ONE tight generated
  * loop per document instead of 30 interpreted re-aggregations of the token
  * array (HOF lambdas never enter whole-stage codegen; this was the
  * dominant cost of every simhash query — measured 4.2 s → sub-second for
  * q_dedup_simhash_bands at sf0.1).
  *
  * Exact-parity notes (the oracle replays the composed form in DuckDB, so
  * every detail must match it):
  *  - `trim` strips U+0020 ONLY (Spark/DuckDB `trim` semantics — NOT Java's
  *    `String.trim`, which also strips control chars like `\n`);
  *  - the split is Java regex `\s+` with limit -1, exactly Spark's
  *    `functions.split` — an all-whitespace or empty input yields the single
  *    empty token whose hash 0 votes every bit down (sim = 0);
  *  - per-token hash is [[PolyHashKernel.hash]]; bit i's vote is
  *    `((h >>> i) & 1) * 2 - 1`, the integer form of the composed
  *    `floor(h / 2^i) % 2 * 2 - 1` (h < 2^30, so the double division in the
  *    composed form was exact).
  */
object SimHashKernel {
  val Bits = 30
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  def simhash(s: UTF8String): Long = {
    val str = s.toString
    var b = 0
    var e = str.length
    while (b < e && str.charAt(b) == ' ') b += 1
    while (e > b && str.charAt(e - 1) == ' ') e -= 1
    val toks = Whitespace.split(str.substring(b, e), -1)
    val cnt = new Array[Int](Bits)
    var ti = 0
    while (ti < toks.length) {
      val h = PolyHashKernel.hash(UTF8String.fromString(toks(ti)))
      var i = 0
      while (i < Bits) {
        cnt(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      ti += 1
    }
    var sim = 0L
    var i = 0
    while (i < Bits) {
      if (cnt(i) > 0) sim |= (1L << i)
      i += 1
    }
    sim
  }
}

/** Native codegen form of [[graft.operators.Dedup.simhash]]. */
case class SimHashExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash requires STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    SimHashKernel.simhash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashKernel.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpression =
    copy(child = newChild)
}

object SimHashExpression {
  def column(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHashExpression(ColumnBridge.expression(c)))
  }
}
