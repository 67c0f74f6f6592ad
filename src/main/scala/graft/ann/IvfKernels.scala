package graft.ann

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-stage-codegen kernels for IVF cell assignment.
  *
  * The declarative formulation they replace —
  * `array_min(array(struct(sqrt(l2sq(vec, ctr_0)), 0), ...))` — builds
  * an nlist-way expression forest with dim literals per centroid.
  * Correct at nlist=16, but at production nlist (thousands, ~sqrt(N))
  * the generated method blows the JVM 64KB bytecode / constant-pool
  * limits and Catalyst silently falls back to interpreted eval over
  * boxed structs — the same structural tax PqEncodeCodes removes for
  * the PQ path (see PqKernels.scala). These kernels carry the
  * centroids as ONE flattened double[] reference object and emit a
  * flat primitive loop whose size is independent of nlist.
  *
  * Arithmetic matches the declarative form bit for bit: per-centroid
  * distance is sqrt of a left-to-right double accumulation of
  * (x-c)^2 (same as SquaredL2Distance + sqrt), comparison is on the
  * sqrt'd value (so two squared distances that round to the same
  * sqrt still tie, exactly as the struct compare sees them), ties
  * break to the smallest cell id (struct's second field) — which a
  * first-wins scan gives for free because the centroids are sorted by
  * id at construction — and NaN distances sort LAST (Spark's double
  * ordering places NaN above every value, so a NaN-bearing vector
  * still assigns to its nearest finite centroid; a bare `<` would
  * have frozen on the first NaN). Null vector -> null; null elements
  * -> 0.0 (matching VecBinaryKernel).
  */
abstract class CentroidKernel extends UnaryExpression {

  /** (cellId, centroid) pairs; sorted by id internally. */
  def centroids: Array[(Int, Array[Double])]

  // lazy: referenced from the base class but backed by the subclass
  // constructor param, which is not yet assigned during base init
  @transient protected lazy val sorted: Array[(Int, Array[Double])] = {
    val s = centroids.sortBy(_._1)
    require(s.nonEmpty && s.forall(_._2.length == s.head._2.length),
      s"$prettyName: centroid dimensions differ")
    s
  }
  protected def nlist: Int = sorted.length
  protected def dim: Int = sorted.head._2.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got $other")
  }

  protected def flatCentroids: Array[Double] = {
    val f = new Array[Double](nlist * dim)
    var i = 0
    while (i < nlist) {
      System.arraycopy(sorted(i)._2, 0, f, i * dim, dim)
      i += 1
    }
    f
  }

  protected def cellIds: Array[Int] = sorted.map(_._1)

  @transient protected lazy val flatEval: Array[Double] = flatCentroids
  @transient protected lazy val idsEval: Array[Int] = cellIds

  protected def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** All nlist distances (sqrt'd) for one input vector — eval path. */
  protected def distsEval(input: Any): Array[Double] = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"$prettyName: vector lengths differ (${v.numElements()} vs $dim)")
    val fl = isFloat
    val cen = flatEval
    val out = new Array[Double](nlist)
    var i = 0
    while (i < nlist) {
      var acc = 0.0
      val base = i * dim
      var p = 0
      while (p < dim) {
        val x = if (v.isNullAt(p)) 0.0
        else if (fl) v.getFloat(p).toDouble else v.getDouble(p)
        val t = x - cen(base + p)
        acc += t * t
        p += 1
      }
      out(i) = math.sqrt(acc)
      i += 1
    }
    out
  }

  /** Java statements computing double[] `distVar` of length nlist for
    * input array `v` — codegen twin of distsEval. */
  protected def distsJava(ctx: CodegenContext, v: String, distVar: String): String = {
    val cenRef = ctx.addReferenceObj("ivfFlatCentroids", flatCentroids, "double[]")
    val i = ctx.freshName("i")
    val p = ctx.freshName("p")
    val x = ctx.freshName("x")
    val t = ctx.freshName("t")
    val acc = ctx.freshName("acc")
    val base = ctx.freshName("base")
    val getX =
      if (isFloat) s"(double) $v.getFloat($p)" else s"$v.getDouble($p)"
    s"""
       |if ($v.numElements() != $dim) {
       |  throw new IllegalArgumentException(
       |    "$prettyName: vector lengths differ (" + $v.numElements() + " vs $dim)");
       |}
       |double[] $distVar = new double[$nlist];
       |for (int $i = 0; $i < $nlist; $i++) {
       |  double $acc = 0.0;
       |  int $base = $i * $dim;
       |  for (int $p = 0; $p < $dim; $p++) {
       |    double $x = $v.isNullAt($p) ? 0.0 : $getX;
       |    double $t = $x - $cenRef[$base + $p];
       |    $acc += $t * $t;
       |  }
       |  $distVar[$i] = java.lang.Math.sqrt($acc);
       |}
     """.stripMargin
  }
}

/** Nearest-centroid cell id: array<float|double> vector -> int. */
case class ArgminCell(child: Expression, centroids: Array[(Int, Array[Double])])
    extends CentroidKernel {

  override def prettyName: String = "ivf_argmin_cell"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val d = distsEval(input)
    var best = 0
    var i = 1
    while (i < nlist) {
      // NaN sorts last: a finite distance beats a NaN incumbent
      if (d(i) < d(best) || (d(best).isNaN && !d(i).isNaN)) best = i
      i += 1
    }
    idsEval(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ivfCellIds", cellIds, "int[]")
    nullSafeCodeGen(ctx, ev, v => {
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val i = ctx.freshName("i")
      s"""
         |${distsJava(ctx, v, dist)}
         |int $best = 0;
         |for (int $i = 1; $i < $nlist; $i++) {
         |  if ($dist[$i] < $dist[$best] ||
         |      (Double.isNaN($dist[$best]) && !Double.isNaN($dist[$i]))) $best = $i;
         |}
         |${ev.value} = $idsRef[$best];
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArgminCell =
    copy(child = newChild)
}

/** The nprobe nearest cell ids ordered by (distance asc, id asc):
  * array<float|double> vector -> array<int>. Selection is an
  * O(nlist * nprobe) partial pass — nprobe is small (<=64) while a
  * full sort would be O(nlist log nlist) per row. */
case class NearestCells(
    child: Expression,
    centroids: Array[(Int, Array[Double])],
    nprobe: Int)
    extends CentroidKernel {

  require(nprobe >= 1, "nprobe must be >= 1")
  private val take = math.min(nprobe, centroids.length)

  override def prettyName: String = "ivf_nearest_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val d = distsEval(input)
    val used = new Array[Boolean](nlist)
    val out = new Array[Int](take)
    var s = 0
    while (s < take) {
      var best = -1
      var i = 0
      while (i < nlist) {
        if (!used(i) && (best < 0 || d(i) < d(best) ||
            (d(best).isNaN && !d(i).isNaN))) best = i
        i += 1
      }
      used(best) = true
      out(s) = idsEval(best)
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ivfCellIds", cellIds, "int[]")
    nullSafeCodeGen(ctx, ev, v => {
      val dist = ctx.freshName("dist")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      s"""
         |${distsJava(ctx, v, dist)}
         |boolean[] $used = new boolean[$nlist];
         |int[] $out = new int[$take];
         |for (int $s = 0; $s < $take; $s++) {
         |  int $best = -1;
         |  for (int $i = 0; $i < $nlist; $i++) {
         |    if (!$used[$i] && ($best < 0 || $dist[$i] < $dist[$best] ||
         |        (Double.isNaN($dist[$best]) && !Double.isNaN($dist[$i])))) $best = $i;
         |  }
         |  $used[$best] = true;
         |  $out[$s] = $idsRef[$best];
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}
