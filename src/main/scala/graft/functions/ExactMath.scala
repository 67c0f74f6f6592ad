package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Literal, Round}

/** Driver-side evaluation of the EXACT scalar kernels the distributed
  * plans use — for the stores' driver-resolved micro-serve paths,
  * whose outputs must be bit-identical to the distributed routes
  * (and hence to the DuckDB oracles downstream). */
object ExactMath {

  /** Spark's `round(x, scale)` (HALF_UP over the decimal string
    * representation) evaluated through the very Round expression the
    * plans compile — no re-implementation to drift. */
  def round(x: Double, scale: Int): Double =
    Round(Literal(x), Literal(scale)).eval().asInstanceOf[Double]

  /** The [[VectorExpressions]] dot product's exact semantics: strict
    * left-to-right accumulation in double (matching the generated
    * loop bit for bit). */
  def dotFloat(a: IndexedSeq[Float], b: IndexedSeq[Float]): Double = {
    require(a.length == b.length,
      s"vec_dot: vector lengths differ (${a.length} vs ${b.length})")
    var acc = 0.0
    var i = 0
    while (i < a.length) {
      acc += a(i).toDouble * b(i).toDouble
      i += 1
    }
    acc
  }

  /** [[dotFloat]] over double arrays. */
  def dotDouble(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
    require(a.length == b.length,
      s"vec_dot: vector lengths differ (${a.length} vs ${b.length})")
    var acc = 0.0
    var i = 0
    while (i < a.length) {
      acc += a(i) * b(i)
      i += 1
    }
    acc
  }
}
