package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static kernels for the MinHash signature pipeline's two array stages —
  * semantically identical to the composed-HOF forms they replace
  * (`Dedup.shingleHashesFromTokenHashesComposed` /
  * `Dedup.minhashSignatureComposed`; DedupSpec proves bit-identity on the
  * real corpus), but tight generated loops instead of interpreted lambdas:
  * the composed signature alone re-walked the shingle set 16 times through
  * `array_min(transform(...))`, the per-element cost of every LSH / CC /
  * decontamination query.
  */
object MinHashKernels {
  val Prime: Long = PolyHashKernel.Prime
  val NumHashes = 16
  val HashA: Array[Long] =
    Array.tabulate(NumHashes)(j => (2L * j + 1) * 1000003L % Prime)
  val HashB: Array[Long] =
    Array.tabulate(NumHashes)(j => (j.toLong * 777767777L + 12345L) % Prime)

  /** Per-token polynomial hashes straight from text: Spark-semantics
    * tokenization (space-only trim, regex `\s+` split with limit -1 — an
    * empty or all-space input yields the single empty token, hash 0) with
    * [[PolyHashKernel]] applied in the same loop — replaces the
    * `transform(split(trim(text)), polyHash)` form whose lambda ran
    * interpreted once per token.
    */
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")
  def tokenHashes(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val str = s.toString
    var b = 0
    var e = str.length
    while (b < e && str.charAt(b) == ' ') b += 1
    while (e > b && str.charAt(e - 1) == ' ') e -= 1
    val toks = Whitespace.split(str.substring(b, e), -1)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = PolyHashKernel.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(toks(i)))
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Distinct k-shingle rolling hashes over a token-hash array, preserving
    * first-occurrence order (exactly `array_distinct(transform(...))`): for
    * each of max(n−k+1, 1) windows, fold (acc·31 + h) mod P over the
    * (end-clamped) window — a doc shorter than k folds its whole window.
    */
  def shingleHashes(th: ArrayData, k: Int): ArrayData = {
    val n = th.numElements()
    val nw = math.max(n - (k - 1), 1)
    val seen = new java.util.HashSet[java.lang.Long](nw * 2)
    val out = new java.util.ArrayList[java.lang.Long](nw)
    var i = 0
    while (i < nw) {
      var acc = 0L
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        acc = (acc * 31 + th.getLong(j)) % Prime
        j += 1
      }
      if (seen.add(acc)) out.add(acc)
      i += 1
    }
    val res = new Array[Long](out.size())
    var r = 0
    while (r < res.length) { res(r) = out.get(r); r += 1 }
    ArrayData.toArrayData(res)
  }

  /** sig[j] = min over shingle hashes x of (a_j·x + b_j) mod P. A min over
    * a multiset equals the min over its distinct set, so this slots in
    * wherever the composed form ran. An empty input yields all-null slots,
    * exactly `array_min(empty)`.
    */
  def signature(shd: ArrayData): ArrayData = {
    val n = shd.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](NumHashes))
    val out = new Array[Long](NumHashes)
    var j = 0
    while (j < NumHashes) {
      val a = HashA(j)
      val b = HashB(j)
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * shd.getLong(i) + b) % Prime
        if (v < mn) mn = v
        i += 1
      }
      out(j) = mn
      j += 1
    }
    ArrayData.toArrayData(out)
  }
}

private[functions] trait LongArrayToLongArray extends UnaryExpression {
  // containsNull = true matches the composed forms' types (aggregate /
  // array_min produce nullable elements), keeping dumped parquet schemas
  // and therefore the type-strict oracle gate unchanged.
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"${prettyName} requires ARRAY<BIGINT> input, got ${t.sql}")
    }
}

/** Native codegen form of `Dedup.tokenHashes(TextAnalysis.tokens(text))` —
  * text in, per-token polynomial hashes out, one generated loop.
  */
case class TokenHashesExpression(child: Expression) extends UnaryExpression {
  override def prettyName: String = "token_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"token_hashes requires STRING input, got ${t.sql}")
    }
  override protected def nullSafeEval(v: Any): Any =
    MinHashKernels.tokenHashes(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashKernels.tokenHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenHashesExpression =
    copy(child = newChild)
}

/** Native codegen form of [[graft.operators.Dedup.shingleHashesFromTokenHashes]]
  * at the default k = 3.
  */
case class ShingleHashesExpression(child: Expression)
    extends LongArrayToLongArray {
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(v: Any): Any =
    MinHashKernels.shingleHashes(v.asInstanceOf[ArrayData], 3)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashKernels.shingleHashes($c, 3)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpression =
    copy(child = newChild)
}

/** Native codegen form of [[graft.operators.Dedup.minhashSignature]]. */
case class MinHashSignatureExpression(child: Expression)
    extends LongArrayToLongArray {
  override def prettyName: String = "minhash_signature"
  override protected def nullSafeEval(v: Any): Any =
    MinHashKernels.signature(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashKernels.signature($c)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpression =
    copy(child = newChild)
}

object MinHashExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def tokenHashes(c: Column): Column =
    ColumnBridge.column(TokenHashesExpression(ColumnBridge.expression(c)))

  def shingleHashes(c: Column): Column =
    ColumnBridge.column(ShingleHashesExpression(ColumnBridge.expression(c)))

  def minhashSignature(c: Column): Column =
    ColumnBridge.column(MinHashSignatureExpression(ColumnBridge.expression(c)))
}
