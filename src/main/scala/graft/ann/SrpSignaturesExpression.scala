package graft.ann

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused multi-table SRP signature kernel: element t of the result is
  * [[Ann.srpSignature]](vec, nBits, dim, seedBase + t) — all `tables`
  * signatures in ONE generated loop nest over the input vector.
  *
  * The composed Column form builds `tables x nBits` separate
  * DotProduct(vec, 64-literal plane array) subtrees — ~5,000 expression
  * nodes for the standard 8x8x64 family — which costs real driver time
  * in analysis/optimization and a large whole-stage-codegen method per
  * signing site, and re-reads every vector element `tables * nBits`
  * times at runtime. This expression is one plan node: the vector is
  * hoisted into a local double[] once per row (null elements read as
  * 0.0, exactly like the VecBinaryKernel dot), then each (table, bit)
  * accumulates `acc += d[i] * plane[i]` left-to-right in double —
  * bit-for-bit the DotProduct order — and sets bit b iff `acc >= 0.0`.
  *
  * Null/edge semantics replicate the composed form exactly (pinned by
  * SrpSignaturesSpec):
  *  - null vector: the composed `when(dot >= 0, 1<<b).otherwise(0)`
  *    yields 0 per bit (null condition falls through), so every table's
  *    signature is 0 — the result is a ZEROS array, never null;
  *  - length mismatch: DotProduct fails loud, so does this kernel;
  *  - null elements contribute 0.0 to the projection.
  */
case class SrpSignatures(child: Expression, nBits: Int, dim: Int,
    seedBase: Long, tables: Int) extends UnaryExpression {

  require(nBits > 0 && nBits < 31, s"nBits must be in [1, 30], got $nBits")
  require(tables > 0, s"tables must be positive, got $tables")

  override def prettyName: String = "srp_signatures"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_signatures requires array<float|double>, got $other")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** planes(t)(b)(i) flattened to [(t*nBits + b)*dim + i] — identical
    * values to the composed form's per-table [[Ann.hyperplanes]]. */
  private lazy val flatPlanes: Array[Double] = {
    val out = new Array[Double](tables * nBits * dim)
    var t = 0
    while (t < tables) {
      val p = Ann.hyperplanes(nBits, dim, seedBase + t)
      var b = 0
      while (b < nBits) {
        System.arraycopy(p(b), 0, out, (t * nBits + b) * dim, dim)
        b += 1
      }
      t += 1
    }
    out
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val sigs = new Array[Int](tables)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"srp_signatures: vector length ${arr.numElements()} != dim $dim")
      val d = new Array[Double](dim)
      val fl = isFloat
      var i = 0
      while (i < dim) {
        d(i) = if (arr.isNullAt(i)) 0.0
          else if (fl) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      val pl = flatPlanes
      var t = 0
      while (t < tables) {
        var sig = 0
        var b = 0
        while (b < nBits) {
          val off = (t * nBits + b) * dim
          var acc = 0.0
          var j = 0
          while (j < dim) { acc += d(j) * pl(off + j); j += 1 }
          if (acc >= 0.0) sig |= (1 << b)
          b += 1
        }
        sigs(t) = sig
        t += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("planes", flatPlanes, "double[]")
    val uad = classOf[UnsafeArrayData].getName
    val sigs = ctx.freshName("sigs")
    val d = ctx.freshName("d")
    val acc = ctx.freshName("acc")
    val sig = ctx.freshName("sig")
    val off = ctx.freshName("off")
    val t = ctx.freshName("t")
    val b = ctx.freshName("b")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val getElem =
      if (isFloat) s"(double) ${childGen.value}.getFloat($i)"
      else s"${childGen.value}.getDouble($i)"
    val resultCode =
      code"""
         |${childGen.code}
         |int[] $sigs = new int[$tables];
         |if (!${childGen.isNull}) {
         |  if (${childGen.value}.numElements() != $dim) {
         |    throw new IllegalArgumentException(
         |      "srp_signatures: vector length " + ${childGen.value}.numElements() +
         |      " != dim " + $dim);
         |  }
         |  double[] $d = new double[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $d[$i] = ${childGen.value}.isNullAt($i) ? 0.0 : $getElem;
         |  }
         |  for (int $t = 0; $t < $tables; $t++) {
         |    int $sig = 0;
         |    for (int $b = 0; $b < $nBits; $b++) {
         |      int $off = ($t * $nBits + $b) * $dim;
         |      double $acc = 0.0;
         |      for (int $j = 0; $j < $dim; $j++) {
         |        $acc += $d[$j] * $planesRef[$off + $j];
         |      }
         |      if ($acc >= 0.0) $sig |= (1 << $b);
         |    }
         |    $sigs[$t] = $sig;
         |  }
         |}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  $uad.fromPrimitiveArray($sigs);
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SrpSignatures =
    copy(child = newChild)
}
