package graft.dedup

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
  * MOSS algorithm): rolling k-gram chain hashes over the token stream,
  * then the rightmost minimum of every w-hash window is selected. The
  * selected hash set is the document's fingerprint.
  *
  * Guarantee: two documents sharing a contiguous token run of at least
  * w + k - 1 tokens share at least one fingerprint — so fingerprint
  * equality is a sound blocking key for plagiarism/near-dup candidate
  * generation, at a density of ~2/(w+1) of the k-gram count.
  *
  * Same kernel shape as ShingleHashes (one pass, positional rolling
  * hashes instead of a distinct set) with whole-stage codegen.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int, seed: Long)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, "k-gram size and window must be >= 1")

  override def prettyName: String = "winnow_fingerprints"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[ArrayData], k, w, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.dedup.WinnowFingerprints.compute($c, $k, $w, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Winnowing fingerprints of a token-array column. */
  def of(tokens: Column, k: Int = 4, w: Int = 4, seed: Long = 42L): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(tokens), k, w, seed))

  /** Shared interpreted/codegen kernel. */
  def compute(toks: ArrayData, k: Int, w: Int, seed: Long): ArrayData = {
    val m = toks.numElements()
    val th = new Array[Long](m)
    var j = 0
    while (j < m) {
      th(j) = if (toks.isNullAt(j)) 0L else {
        val t = toks.getUTF8String(j)
        XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, seed)
      }
      j += 1
    }
    // positional k-gram chain hashes; short docs get one gram over all
    val win = math.min(k, math.max(m, 1))
    val nGrams = math.max(m - k + 1, 1)
    val g = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = seed
      var p = i
      val end = math.min(i + win, m)
      while (p < end) { h = XXH64.hashLong(th(p), h); p += 1 }
      g(i) = h
      i += 1
    }
    // robust winnowing: rightmost minimum of each w-window; record
    // each selected POSITION once
    val sel = new Array[Long](nGrams)
    var nSel = 0
    var lastPos = -1
    val nWin = math.max(nGrams - w + 1, 1)
    i = 0
    while (i < nWin) {
      val end = math.min(i + w, nGrams)
      var minPos = i
      var p = i + 1
      while (p < end) { if (g(p) <= g(minPos)) minPos = p; p += 1 }
      if (minPos != lastPos) { sel(nSel) = g(minPos); nSel += 1; lastPos = minPos }
      i += 1
    }
    val out = java.util.Arrays.copyOf(sel, nSel)
    java.util.Arrays.sort(out)
    var wr = 0
    i = 0
    while (i < nSel) {
      if (i == 0 || out(i) != out(i - 1)) { out(wr) = out(i); wr += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, wr))
  }

  /** Candidate near-dup/plagiarism pairs: documents sharing at least
    * `minShared` winnowing fingerprints. Same scale shape as the other
    * blocking schemes: kernel once per doc (cached), shuffle carries
    * (doc, 8-byte fingerprint), per-fingerprint micro self-join with a
    * df-cut guard on ubiquitous fingerprints. */
  def candidatePairs(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 4,
      w: Int = 4,
      minShared: Int = 2,
      maxDf: Int = 1000): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val fps = graft.operators.Partitioning.spread(docs)
      .select(col(idCol).as("doc"),
        of(graft.functions.TextFunctions.wsTokens(lower(col(textCol))), k, w).as("fps"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val postings = fps.select(col("doc"), explode(col("fps")).as("fp"))
    val ubiquitous = postings.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("fp"))
    val cut = postings.join(broadcast(ubiquitous), Seq("fp"), "left_anti")
    val a = cut.select(col("doc").as("doc_a"), col("fp"))
    val b = cut.select(col("doc").as("doc_b"), col("fp"))
    a.join(b, a("fp") === b("fp") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }
}
