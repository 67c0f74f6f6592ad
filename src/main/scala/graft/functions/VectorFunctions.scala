package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Dense-vector math over `array<float>` / `array<double>` columns.
  *
  * Backed by the codegen'd kernels in VectorExpressions (a primitive
  * loop inside whole-stage codegen) — NOT by zip_with/aggregate, whose
  * per-element interpreted lambdas are ~70x slower on the ANN/near-dup
  * hot paths. Accumulation is left-to-right in double, identical to
  * the sequential HOF semantics, so oracle comparisons are unaffected.
  */
object VectorFunctions {

  private def wrap2(f: (org.apache.spark.sql.catalyst.expressions.Expression,
      org.apache.spark.sql.catalyst.expressions.Expression) =>
      org.apache.spark.sql.catalyst.expressions.Expression)(a: Column, b: Column): Column =
    ColumnBridge.column(f(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Elementwise product then left-to-right sum, in double. */
  def dot(a: Column, b: Column): Column = wrap2(DotProduct.apply)(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(wrap2(SquaredL2Distance.apply)(a, b))

  /** Cosine similarity in [-1, 1]; null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(dot(a, b) / (na * nb))
  }

  /** Cosine from a precomputed dot and precomputed norms — use when
    * norms can be computed once per row instead of once per pair
    * (turns 3 vector passes per candidate pair into 1). */
  def cosineWithNorms(dotCol: Column, normA: Column, normB: Column): Column =
    when(normA === 0.0 || normB === 0.0, lit(null).cast("double"))
      .otherwise(dotCol / (normA * normB))
}
