package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` columns,
  * built from codegen'd higher-order functions (zip_with / aggregate)
  * — no UDFs, so the expressions stay inside whole-stage codegen and
  * are usable in any Catalyst context (joins, aggregations, filters).
  *
  * All arithmetic is performed in Double regardless of input element
  * type: float inputs are widened exactly, and accumulation order is
  * left-to-right (deterministic, matches a sequential C loop).
  */
object VectorFunctions {

  /** Elementwise product then left-to-right sum, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, x) => acc + x))

  /** Cosine similarity in [-1, 1]; null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(dot(a, b) / (na * nb))
  }
}
