package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-document token repetition stats as ONE row-local expression:
  * array<string> tokens -> struct(n_tokens, n_distinct, top_count).
  *
  * The statistic is per document, so the
  * explode -> groupBy(doc, tok) -> groupBy(doc) formulation — which
  * shuffles the ENTIRE token stream twice — is structurally wasteful:
  * this kernel computes the same three numbers inside the scan with an
  * open-addressing table over 64-bit XXH64 token hashes, zero shuffle.
  * (Distinctness via 64-bit hashes: collision probability per document
  * is ~n^2/2^65 — ~1e-16 at 1k tokens — the same accepted bound as the
  * shingle kernels.) Codegen emits a call into the static `compute`
  * kernel, so the expression stays inside whole-stage codegen.
  */
case class TokenStatsExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "token_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_stats requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TokenStatsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenStatsExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)
}

object TokenStatsExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def of(tokens: Column): Column =
    ColumnBridge.column(TokenStatsExpr(ColumnBridge.expression(tokens)))

  private final val Seed = 0x7A57C0DEL

  /** Shared interpreted/codegen kernel: one pass, open-addressing
    * linear-probe table (power-of-two capacity >= 2n). Null tokens
    * count as one distinct sentinel value. */
  def compute(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    if (n == 0)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    // cap doubles past 2n, so cap may reach 2^30 (the largest Int
    // power of two); n above 2^29 would need cap > 2^30, where the
    // shift wraps negative and the probe loop could never find a free
    // slot — fail loud instead of hanging the task
    require(n <= (1 << 29), s"token_stats: array too large ($n elements)")
    var cap = 8
    while (cap < n * 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val counts = new Array[Int](cap)
    var distinct = 0L
    var top = 0
    var i = 0
    while (i < n) {
      // sentinel for null; real hashes are never exactly this because
      // occupied slots are tracked by counts, not key value
      val h = if (toks.isNullAt(i)) 0x9E3779B97F4A7C15L else {
        val t = toks.getUTF8String(i)
        XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)
      }
      var slot = (h & mask).toInt
      while (counts(slot) != 0 && keys(slot) != h) slot = (slot + 1) & mask
      if (counts(slot) == 0) { keys(slot) = h; distinct += 1 }
      counts(slot) += 1
      if (counts(slot) > top) top = counts(slot)
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, distinct, top.toLong))
  }
}
