package graft.dedup

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distinct word-n-gram shingle hashes in one pass: for each n-token
  * window, chain-hash the tokens with XXH64 (hash of token j seeds the
  * hash of token j+1), then sort+dedup the resulting longs.
  *
  * Replaces the `transform(wordShingles(text, n), xxhash64)` pipeline,
  * which (a) materializes every shingle string (slice + array_join
  * allocations per position) and (b) runs as interpreted HOF lambdas.
  * Token join with a space is injective on token sequences (tokens
  * cannot contain whitespace), so equal chain-hashes <=> equal shingle
  * strings modulo 64-bit collisions — the distinct-cardinality
  * semantics NGramJaccard/MinHash rely on are preserved.
  *
  * Short-doc rule matches TextFunctions.wordShingles: fewer than n
  * tokens => one shingle covering all tokens.
  *
  * Codegen emits a call into the static `compute` kernel, so the
  * expression participates in whole-stage codegen (no interpreted
  * fallback projection, and common-subexpression elimination can
  * dedup repeated references the optimizer pushes into filters).
  */
case class ShingleHashes(child: Expression, n: Int, seed: Long)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.dedup.ShingleHashes.compute($c, $n, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Distinct n-gram shingle hashes of a token-array column. */
  def of(tokens: Column, n: Int, seed: Long = 42L): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), n, seed))

  /** Shared interpreted/codegen kernel. */
  def compute(toks: ArrayData, n: Int, seed: Long): ArrayData = {
    val m = toks.numElements()
    // per-token hashes once; windows chain them
    val th = new Array[Long](m)
    var j = 0
    while (j < m) {
      th(j) = if (toks.isNullAt(j)) 0L else {
        val t = toks.getUTF8String(j)
        XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, seed)
      }
      j += 1
    }
    val win = math.min(n, math.max(m, 1))
    val count = math.max(m - n + 1, 1)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = seed
      var p = i
      val end = math.min(i + win, m)
      while (p < end) { h = XXH64.hashLong(th(p), h); p += 1 }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < count) {
      if (i == 0 || out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }
}
