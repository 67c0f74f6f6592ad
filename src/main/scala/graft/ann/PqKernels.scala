package graft.ann

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-stage-codegen kernels for the PQ hot path.
  *
  * The declarative formulations they replace are correct but pay a
  * structural tax Catalyst cannot optimize away:
  *   - encoding as `array_min(array(struct(l2, c), ...))` builds an
  *     m*k-subexpression tree evaluated per row (128 kernel calls for
  *     m=8, k=16) plus per-row struct/array allocation;
  *   - ADC as `aggregate(zip_with(codes, qtbl, ...))` is a
  *     higher-order function — interpreted lambda per element, boxed,
  *     outside codegen (the same ~70x penalty measured for the cosine
  *     kernels in VectorExpressions).
  * Both kernels below generate flat primitive loops inside whole-stage
  * codegen; the arithmetic (left-to-right double accumulation,
  * first-wins argmin = smallest centroid index on ties) matches the
  * declarative forms bit for bit, so swapping them changes plans, not
  * results.
  */

/** argmin-centroid codes: array<float|double> vector -> array<int> of
  * m codes. The codebooks ride along as a flattened double[]
  * reference object ((j*k + c)*subDim layout), not literals — one
  * array, not an m*k*subDim expression forest. */
case class PqEncodeCodes(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = codebooks.length
  private val k = codebooks.head.length
  private val sub = codebooks.head.head.length

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float|double>, got $other")
  }

  private def flat: Array[Double] = {
    val f = new Array[Double](m * k * sub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        System.arraycopy(codebooks(j)(c), 0, f, (j * k + c) * sub, sub)
        c += 1
      }
      j += 1
    }
    f
  }

  @transient private lazy val flatEval: Array[Double] = flat

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val cb = flatEval
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.MaxValue
      var bc = 0
      var c = 0
      while (c < k) {
        var d = 0.0
        val base = (j * k + c) * sub
        var p = 0
        while (p < sub) {
          val x = if (fl) v.getFloat(j * sub + p).toDouble else v.getDouble(j * sub + p)
          val t = x - cb(base + p)
          d += t * t
          p += 1
        }
        if (d < best) { best = d; bc = c }
        c += 1
      }
      codes(j) = bc
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
    val get =
      if (isFloat) (i: String) => s"(double) %s.getFloat($i)"
      else (i: String) => s"%s.getDouble($i)"
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bc = ctx.freshName("bc")
      val base = ctx.freshName("base")
      s"""
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  double $best = Double.MAX_VALUE; int $bc = 0;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d = 0.0;
         |    int $base = ($j * $k + $c) * $sub;
         |    for (int $p = 0; $p < $sub; $p++) {
         |      double $t = ${get(s"$j * $sub + $p").format(v)} - $cbRef[$base + $p];
         |      $d += $t * $t;
         |    }
         |    if ($d < $best) { $best = $d; $bc = $c; }
         |  }
         |  $codes[$j] = $bc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

/** Residual PQ codes: argmin-centroid codes of (vector - ivfCentroid
  * [cell]) — the FAISS IVF-PQ refinement, where codebooks quantize the
  * residual around the cell centroid instead of the raw vector (the
  * residual distribution is tighter, so the same m*k budget spends
  * its precision where the vectors actually live). Children are
  * (vector, cell id); both codebooks and IVF centroids ride as
  * flattened reference arrays. */
case class ResidualPqEncodeCodes(
    left: Expression,  // array<float|double> vector
    right: Expression, // int cell id
    ivfCentroids: Array[Array[Double]],
    codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {

  private val m = codebooks.length
  private val k = codebooks.head.length
  private val sub = codebooks.head.head.length
  private val dim = ivfCentroids.head.length

  override def prettyName: String = "pq_encode_residual"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode_residual requires (array<float|double>, int cell), got $other")
    }

  private def flatBooks: Array[Double] = {
    val f = new Array[Double](m * k * sub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        System.arraycopy(codebooks(j)(c), 0, f, (j * k + c) * sub, sub)
        c += 1
      }
      j += 1
    }
    f
  }

  private def flatCentroids: Array[Double] = {
    val f = new Array[Double](ivfCentroids.length * dim)
    var i = 0
    while (i < ivfCentroids.length) {
      System.arraycopy(ivfCentroids(i), 0, f, i * dim, dim)
      i += 1
    }
    f
  }

  @transient private lazy val booksEval: Array[Double] = flatBooks
  @transient private lazy val centroidsEval: Array[Double] = flatCentroids

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v0: Any, cell0: Any): Any = {
    val v = v0.asInstanceOf[ArrayData]
    val cellBase = cell0.asInstanceOf[Int] * dim
    val fl = isFloat
    val cb = booksEval
    val cen = centroidsEval
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.MaxValue
      var bc = 0
      var c = 0
      while (c < k) {
        var d = 0.0
        val base = (j * k + c) * sub
        var p = 0
        while (p < sub) {
          val idx = j * sub + p
          val x = (if (fl) v.getFloat(idx).toDouble else v.getDouble(idx)) - cen(cellBase + idx)
          val t = x - cb(base + p)
          d += t * t
          p += 1
        }
        if (d < best) { best = d; bc = c }
        c += 1
      }
      codes(j) = bc
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqResBooks", flatBooks, "double[]")
    val cenRef = ctx.addReferenceObj("ivfCentroids", flatCentroids, "double[]")
    val getElem =
      if (isFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (v, cell) => {
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val x = ctx.freshName("x")
      val idx = ctx.freshName("idx")
      val best = ctx.freshName("best")
      val bc = ctx.freshName("bc")
      val base = ctx.freshName("base")
      val cellBase = ctx.freshName("cellBase")
      s"""
         |int $cellBase = $cell * $dim;
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  double $best = Double.MAX_VALUE; int $bc = 0;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d = 0.0;
         |    int $base = ($j * $k + $c) * $sub;
         |    for (int $p = 0; $p < $sub; $p++) {
         |      int $idx = $j * $sub + $p;
         |      double $x = ${getElem(v, idx)} - $cenRef[$cellBase + $idx];
         |      double $t = $x - $cbRef[$base + $p];
         |      $d += $t * $t;
         |    }
         |    if ($d < $best) { $best = $d; $bc = $c; }
         |  }
         |  $codes[$j] = $bc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ResidualPqEncodeCodes =
    copy(left = l, right = r)
}

/** ADC distance: sum over subspaces of qtbl[j][codes[j]], with
  * codes: array<int>, qtbl: array<array<double>>. */
case class AdcDistance(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<int> codes, array<array<double>> qtbl), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val qtbl = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += qtbl.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, qtbl) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $codes.numElements();
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += $qtbl.getArray($j).getDouble($codes.getInt($j));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcDistance =
    copy(left = l, right = r)
}
