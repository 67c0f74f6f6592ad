package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused mat-vec kernels against a LITERAL matrix — the projection
  * shapes PCA/whitening need at scale.
  *
  * Why not k separate dot-product expressions: at k = 64 the combined
  * tree blows past whole-stage codegen's method budget and the whole
  * projection falls back to interpreted evaluation (measured on the
  * Mahalanobis query: the scan dominates end-to-end). One expression
  * with one generated double loop stays inside codegen at any k that
  * fits in a method (the matrix itself is a referenced object, not
  * inlined source).
  *
  * Null handling matches the vector kernels: null array -> null,
  * null ELEMENTS read as 0.0.
  */
abstract class MatVecKernel extends UnaryExpression {
  def matrix: Array[Array[Double]] // k x d, row-major directions
  def shift: Array[Double] // length k, subtracted per output

  // @transient lazy (the IvfKernels convention): Java deserialization
  // runs this abstract class's initializer before the case-class
  // fields are populated — an eager `matrix.length` NPEs there
  @transient protected lazy val k: Int = matrix.length
  @transient protected lazy val d: Int = if (matrix.isEmpty) 0 else matrix(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      if (matrix.nonEmpty && matrix.forall(_.length == d) && shift.length == k)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName: matrix must be non-empty rectangular with shift of length k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got $other")
  }

  protected def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** java expression reading element i of ArrayData `v` as double. */
  protected def get(v: String, i: String): String =
    if (elemIsFloat) s"($v.isNullAt($i) ? 0.0 : (double) $v.getFloat($i))"
    else s"($v.isNullAt($i) ? 0.0 : $v.getDouble($i))"

  protected def getEval(v: ArrayData, i: Int): Double =
    if (v.isNullAt(i)) 0.0
    else if (elemIsFloat) v.getFloat(i).toDouble
    else v.getDouble(i)

  protected def checkLen(n: Int): Unit =
    if (n != d) throw new IllegalArgumentException(
      s"$prettyName: vector length $n, matrix expects $d")
}

/** `array<double>` of the k projections: out_j = x . m_j - shift_j. */
case class MatVecProject(child: Expression, matrix: Array[Array[Double]],
    shift: Array[Double]) extends MatVecKernel {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "matvec_project"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    checkLen(a.numElements())
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val mj = matrix(j)
      var acc = 0.0
      var i = 0
      while (i < d) { acc += mj(i) * getEval(a, i); i += 1 }
      out(j) = acc - shift(j)
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("matrix", matrix, "double[][]")
    val sRef = ctx.addReferenceObj("shift", shift, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val mj = ctx.freshName("mj")
      s"""
         |if ($v.numElements() != $d) {
         |  throw new IllegalArgumentException(
         |    "matvec_project: vector length " + $v.numElements() + ", matrix expects $d");
         |}
         |double[] $out = new double[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  double[] $mj = $mRef[$j];
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $acc += $mj[$i] * ${get(v, i)};
         |  }
         |  $out[$j] = $acc - $sRef[$j];
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecProject =
    copy(child = newChild)
}

/** Scalar sum_j w_j * (x . m_j - shift_j)^2 — squared Mahalanobis
  * distance when m are eigenvectors, shift the projected mean, and
  * w the inverse variances; one fused loop, no intermediate array. */
case class MahalanobisDistSq(child: Expression, matrix: Array[Array[Double]],
    shift: Array[Double], weights: Array[Double]) extends MatVecKernel {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "mahalanobis_dist_sq"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (weights.length != k)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: weights length ${weights.length} != k=$k")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    checkLen(a.numElements())
    var total = 0.0
    var j = 0
    while (j < k) {
      val mj = matrix(j)
      var acc = 0.0
      var i = 0
      while (i < d) { acc += mj(i) * getEval(a, i); i += 1 }
      val pc = acc - shift(j)
      total += pc * pc * weights(j)
      j += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("matrix", matrix, "double[][]")
    val sRef = ctx.addReferenceObj("shift", shift, "double[]")
    val wRef = ctx.addReferenceObj("weights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val total = ctx.freshName("total")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val pc = ctx.freshName("pc")
      val mj = ctx.freshName("mj")
      s"""
         |if ($v.numElements() != $d) {
         |  throw new IllegalArgumentException(
         |    "mahalanobis_dist_sq: vector length " + $v.numElements() + ", matrix expects $d");
         |}
         |double $total = 0.0;
         |for (int $j = 0; $j < $k; $j++) {
         |  double[] $mj = $mRef[$j];
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $acc += $mj[$i] * ${get(v, i)};
         |  }
         |  double $pc = $acc - $sRef[$j];
         |  $total += $pc * $pc * $wRef[$j];
         |}
         |${ev.value} = $total;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MahalanobisDistSq =
    copy(child = newChild)
}
