package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-document token repetition stats as ONE row-local expression:
  * array<string> tokens -> struct(n_tokens, n_distinct, top_count,
  * singleton_count). `singleton_count` is the number of distinct
  * tokens occurring exactly once — `n_tokens - singleton_count` is the
  * occurrence mass of repeated tokens, the Gopher/MassiveText
  * duplicate-n-gram signal when fed an n-gram array.
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
    StructField("top_count", LongType, nullable = false),
    StructField("singleton_count", LongType, nullable = false)))

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

/** [[TokenStatsExpr]] over n-gram WINDOWS of the token array, without
  * ever materializing the n-gram strings: each token hashes once, each
  * window combines its n token hashes with an order-dependent 64-bit
  * polynomial mix, and the same open-addressing table runs over the
  * window hashes. Equivalent to `TokenStatsExpr(wordNGrams(text, n))`
  * (tokens cannot contain the join separator, so the string join is
  * injective) but allocation-free and fully inside whole-stage codegen
  * — the HOF formulation (`transform` + `array_join`) is
  * CodegenFallback and breaks the WSCG span.
  */
case class NGramStatsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram_stats: n must be >= 1, got $n")

  override def prettyName: String = "ngram_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("singleton_count", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_stats requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TokenStatsExpr.computeGrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenStatsExpr.computeGrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGramStatsExpr =
    copy(child = newChild)
}

object NGramStatsExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def of(tokens: Column, n: Int): Column =
    ColumnBridge.column(NGramStatsExpr(ColumnBridge.expression(tokens), n))
}

object TokenStatsExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def of(tokens: Column): Column =
    ColumnBridge.column(TokenStatsExpr(ColumnBridge.expression(tokens)))

  private[functions] final val Seed = 0x7A57C0DEL

  def compute(toks: ArrayData): InternalRow = computeGrams(toks, 1)

  /** Shared interpreted/codegen kernel: hash each token once, combine
    * each length-`n` window with an order-dependent polynomial mix,
    * then one pass of an open-addressing linear-probe table
    * (power-of-two capacity >= 2k) over the window hashes. Null tokens
    * count as one distinct sentinel value. Fewer than n tokens -> all
    * zeros (no windows). */
  def computeGrams(toks: ArrayData, n: Int): InternalRow = {
    val m = toks.numElements()
    val k = m - n + 1
    if (k <= 0)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L))
    // cap doubles past 2k, so cap may reach 2^30 (the largest Int
    // power of two); k above 2^29 would need cap > 2^30, where the
    // shift wraps negative and the probe loop could never find a free
    // slot — fail loud instead of hanging the task
    require(k <= (1 << 29), s"token_stats: array too large ($m elements)")
    // one hash per token, shared by every window covering it
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      // sentinel for null; real hashes are never exactly this because
      // occupied slots are tracked by counts, not key value
      th(i) = if (toks.isNullAt(i)) 0x9E3779B97F4A7C15L else {
        val t = toks.getUTF8String(i)
        XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)
      }
      i += 1
    }
    var cap = 8
    while (cap < k * 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val counts = new Array[Int](cap)
    var distinct = 0L
    var singletons = 0L
    var top = 0
    i = 0
    while (i < k) {
      // order-dependent polynomial window mix; for n == 1 use the
      // token hash directly (bit-identical to the historical unigram
      // behavior, zero combine cost)
      var h = th(i)
      var j = 1
      while (j < n) {
        h = h * 0x100000001B3L + th(i + j) // FNV-prime polynomial step
        j += 1
      }
      var slot = (h & mask).toInt
      while (counts(slot) != 0 && keys(slot) != h) slot = (slot + 1) & mask
      if (counts(slot) == 0) { keys(slot) = h; distinct += 1; singletons += 1 }
      else if (counts(slot) == 1) singletons -= 1
      counts(slot) += 1
      if (counts(slot) > top) top = counts(slot)
      i += 1
    }
    new GenericInternalRow(Array[Any](k.toLong, distinct, top.toLong, singletons))
  }
}

/** Per-document unigram ENTROPY as one row-local expression:
  * array<string> tokens -> H = ln(n) - (sum c ln c)/n over the token
  * multiset — the repetitiveness score (q166's semantics) computed
  * inside the scan with [[TokenStatsExpr]]'s open-addressing hash
  * table instead of two corpus-wide shuffles. Zero or one tokens ->
  * 0.0. Deterministic: the table iteration order depends only on the
  * token hashes, never on partitioning. */
case class TokenEntropyExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "token_entropy"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_entropy requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TokenEntropyExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenEntropyExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenEntropyExpr =
    copy(child = newChild)
}

object TokenEntropyExpr {
  def of(tokens: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      TokenEntropyExpr(org.apache.spark.sql.graft.ColumnBridge.expression(tokens)))

  /** Shared interpreted/codegen kernel (TokenStatsExpr's table). */
  def compute(toks: ArrayData): Double = {
    val m = toks.numElements()
    if (m <= 1) return 0.0
    require(m <= (1 << 29), s"token_entropy: array too large ($m elements)")
    val mask = {
      var cap = 8
      while (cap < m * 2) cap <<= 1
      cap - 1
    }
    val keys = new Array[Long](mask + 1)
    val counts = new Array[Int](mask + 1)
    var i = 0
    while (i < m) {
      val h = if (toks.isNullAt(i)) 0x9E3779B97F4A7C15L else {
        val t = toks.getUTF8String(i)
        XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, TokenStatsExpr.Seed)
      }
      var slot = (h & mask).toInt
      while (counts(slot) != 0 && keys(slot) != h) slot = (slot + 1) & mask
      if (counts(slot) == 0) keys(slot) = h
      counts(slot) += 1
      i += 1
    }
    var clnc = 0.0
    var s = 0
    while (s <= mask) {
      val c = counts(s)
      if (c > 1) clnc += c * math.log(c.toDouble) // c == 1 contributes 0
      s += 1
    }
    math.log(m.toDouble) - clnc / m
  }
}
