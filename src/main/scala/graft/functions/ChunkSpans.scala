package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `chunk_spans(text, chunkSize, overlap)` — a native Catalyst
  * GENERATOR (the UDTF leg of the custom-function surface, next to
  * the scalar kernels and the BottomK UDAF): one input document row
  * expands to its overlapping chunk rows
  * `(chunk_idx, chunk_start, chunk_text)` directly inside
  * `GenerateExec`, with no intermediate sequence array.
  *
  * Same span semantics as `operators.Chunker` (chunk i covers
  * `[i*stride, i*stride+chunkSize)`, stride = chunkSize - overlap,
  * null text = empty, every doc yields >= 1 chunk) — `ChunkSpansSpec`
  * pins the two surfaces equal, and the SQL registration makes the
  * generator usable as `LATERAL VIEW chunk_spans(...)` /
  * `SELECT chunk_spans(...)`. Generators run row-at-a-time inside
  * GenerateExec (CodegenFallback is the norm for custom generators —
  * built-in explode gets special-cased codegen, arbitrary ones do
  * not); the per-row work here is substring slicing only.
  *
  * Offsets are CHARACTER-based (UTF8String.substring counts code
  * points, matching the `substr`/`length` semantics the Chunker
  * operator and its DuckDB oracle use).
  */
case class ChunkSpans(text: Expression, size: Expression, overlap: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, size, overlap)

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, size.dataType, overlap.dataType) match {
      case (StringType, IntegerType, IntegerType)
          if size.foldable && overlap.foldable =>
        val s = size.eval().asInstanceOf[Int]
        val o = overlap.eval().asInstanceOf[Int]
        if (s <= 0) TypeCheckResult.TypeCheckFailure(
          s"chunk_spans: chunkSize must be positive, got $s")
        else if (o < 0 || o >= s) TypeCheckResult.TypeCheckFailure(
          s"chunk_spans: overlap must be in [0, chunkSize), got $o")
        else TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"chunk_spans requires (string, const int, const int), got $other")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("chunk_start", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  @transient private lazy val chunkSize: Int = size.eval().asInstanceOf[Int]
  @transient private lazy val stride: Int = chunkSize - overlap.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = text.eval(input)
    val t = if (raw == null) UTF8String.EMPTY_UTF8 else raw.asInstanceOf[UTF8String]
    val len = t.numChars()
    val n = if (len <= chunkSize) 1
      else 1 + ((len - chunkSize + (stride - 1)) / stride)
    (0 until n).iterator.map { i =>
      val start = i * stride
      InternalRow(i.toLong, start.toLong,
        t.substring(start, math.min(start + chunkSize, len)))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkSpans =
    copy(text = newChildren(0), size = newChildren(1), overlap = newChildren(2))
}
