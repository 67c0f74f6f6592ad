package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}
import graft.functions.VectorFunctions

/** Distributed covariance + PCA for embedding columns — the analytics
  * an embedding-bearing corpus needs before ANN/quantization tuning
  * (how anisotropic is the space? how many effective dimensions?) and
  * for whitening / dimensionality reduction ahead of similarity
  * search.
  *
  * Scale split, deliberately:
  *  - the COVARIANCE pass is the distributed part: one
  *    `treeAggregate` over the vectors accumulating (n, Σx, Σxxᵀ) in
  *    primitive arrays per partition — d(d+1)/2 doubles of state, NO
  *    row blowup. (The declarative alternative — posexplode to (i,j)
  *    pairs — multiplies the corpus by d²/2 rows; at 64 dims that is
  *    a 2000x shuffle and the reason this is one of the repo's rare
  *    justified RDD kernels.)
  *  - the EIGENDECOMPOSITION runs on the driver: the Gram matrix is
  *    d x d (64x64 here) regardless of corpus size — cyclic Jacobi,
  *    deterministic, no external library.
  *  - the PROJECTION is again distributed and codegen'd: top-k
  *    principal directions become literal arrays, each output
  *    coordinate one [[VectorFunctions.dot]] kernel against the scan —
  *    broadcast-free map-side work.
  */
object Pca {

  /** Sufficient statistics of one pass: count, per-dim sums, and the
    * upper-triangular Σ x_i x_j (row-major packed). */
  final case class Stats(n: Long, sums: Array[Double], prods: Array[Double], dim: Int) {
    def mean: Array[Double] = sums.map(_ / n)
    /** cov(i,j) = E[x_i x_j] - E[x_i] E[x_j] (population). */
    def covMatrix: Array[Array[Double]] = {
      val m = mean
      val c = Array.ofDim[Double](dim, dim)
      var idx = 0
      var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          val v = prods(idx) / n - m(i) * m(j)
          c(i)(j) = v; c(j)(i) = v
          idx += 1; j += 1
        }
        i += 1
      }
      c
    }
  }

  /** One distributed pass: treeAggregate of (n, Σx, Σ upper xxᵀ).
    * Rows deserialize straight to primitive `Array[Double]` (Dataset
    * encoder) — the per-element boxing of a Row-based RDD would
    * dominate the whole pass at depth 64. */
  def fitStats(emb: DataFrame, vecCol: String, dim: Int): Stats = {
    val tri = dim * (dim + 1) / 2
    val sp = emb.sparkSession
    import sp.implicits._
    val vecs = emb.select(col(vecCol).cast("array<double>")).na.drop()
      .as[Array[Double]]
    val zero = (0L, new Array[Double](dim), new Array[Double](tri))
    val (n, sums, prods) = vecs.rdd
      .treeAggregate(zero)(
        seqOp = { case ((cnt, s, p), a) =>
          require(a.length == dim, s"PCA: vector of length ${a.length}, expected $dim")
          var i = 0
          var idx = 0
          while (i < dim) {
            val xi = a(i)
            s(i) += xi
            var j = i
            while (j < dim) { p(idx) += xi * a(j); idx += 1; j += 1 }
            i += 1
          }
          (cnt + 1L, s, p)
        },
        combOp = { case ((c1, s1, p1), (c2, s2, p2)) =>
          var i = 0
          while (i < dim) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < tri) { p1(i) += p2(i); i += 1 }
          (c1 + c2, s1, p1)
        })
    require(n > 0, "PCA: empty input")
    Stats(n, sums, prods, dim)
  }

  /** Upper-triangle covariance entries as a small DataFrame
    * `(i, j, cov)` (i <= j, 0-based) — the oracle-checkable artifact
    * of the distributed pass. */
  def covarianceDf(emb: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = emb.sparkSession
    val st = fitStats(emb, vecCol, dim)
    val c = st.covMatrix
    val rows = for (i <- 0 until dim; j <- i until dim)
      yield Row(i, j, c(i)(j))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("i", IntegerType, nullable = false),
        StructField("j", IntegerType, nullable = false),
        StructField("cov", DoubleType, nullable = false))))
  }

  /** Eigendecomposition of a symmetric matrix by cyclic Jacobi:
    * (eigenvalues desc, eigenvectors as rows, same order). */
  def eigSym(a0: Array[Array[Double]], maxSweeps: Int = 64, tol: Double = 1e-12)
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > tol && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol / (d * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0)) // theta == 0
              case x => x
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map(i => Array.tabulate(d)(k => v(k)(i))).toArray
    (evals, evecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Fitted model: mean + top-k principal directions (rows) with
    * their eigenvalues (variance along each). */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
      variances: Array[Double]) {
    def k: Int = components.length
  }

  def fit(emb: DataFrame, vecCol: String, dim: Int, k: Int): Model = {
    require(k >= 1 && k <= dim, s"k out of range: $k (dim $dim)")
    val st = fitStats(emb, vecCol, dim)
    val (evals, evecs) = eigSym(st.covMatrix)
    Model(st.mean, evecs.take(k), evals.take(k))
  }

  /** Project each vector onto the top-k directions: input columns +
    * `pc0..pc{k-1}`. Each coordinate is dot(x, v_j) - dot(mean, v_j):
    * the direction enters the plan as a literal array against the
    * codegen'd dot kernel — pure map-side scan work, no shuffle, no
    * driver round-trips past the (tiny) fitted model. */
  private def shifts(model: Model): Array[Double] =
    model.components.map(_.zip(model.mean).map { case (a, b) => a * b }.sum)

  def project(emb: DataFrame, vecCol: String, model: Model): DataFrame = {
    // ONE fused kernel for all k directions (graft.functions
    // .MatVecProject): k separate dot expressions blow the codegen
    // method budget around k~64 and drop the whole scan to
    // interpreted evaluation
    val pcs = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.MatVecProject(
        org.apache.spark.sql.graft.ColumnBridge.expression(col(vecCol)),
        model.components, shifts(model)))
    val withPcs = emb.withColumn("__pcs", pcs)
    model.components.indices
      .foldLeft(withPcs) { case (df, j) =>
        df.withColumn(s"pc$j", element_at(col("__pcs"), j + 1))
      }
      .drop("__pcs")
  }

  /** Mahalanobis distance (squared) of every vector under a FULL-rank
    * model (k = dim): sum_j pc_j^2 / lambda_j, each pc_j one codegen'd
    * dot kernel against a literal direction. Directions with variance
    * below `minVar` are dropped from the sum (near-null directions
    * would divide by ~0 and flag numerical noise as outliers).
    *
    * This is the covariance-AWARE outlier score: a point one unit off
    * along a low-variance direction is a glaring outlier that
    * centroid-cosine ([[EmbeddingOutliers]]) can entirely miss,
    * because cosine weights every direction equally. */
  def mahalanobis(emb: DataFrame, vecCol: String, model: Model,
      minVar: Double = 1e-9): DataFrame = {
    val keep = model.variances.zipWithIndex.filter(_._1 > minVar)
    require(keep.nonEmpty, "Mahalanobis: all directions below minVar")
    val mat = keep.map { case (_, j) => model.components(j) }
    val sh = shifts(model)
    val kernel = graft.functions.MahalanobisDistSq(
      org.apache.spark.sql.graft.ColumnBridge.expression(col(vecCol)),
      mat, keep.map { case (_, j) => sh(j) }, keep.map { case (v, _) => 1.0 / v })
    emb.withColumn("maha", org.apache.spark.sql.graft.ColumnBridge.column(kernel))
  }

  /** Gauss-Jordan inverse with partial pivoting — deliberately a
    * DIFFERENT factorization from [[eigSym]], so the q167b contract's
    * two Mahalanobis formulations share no linear algebra beyond the
    * covariance ingredients themselves. */
  private[graft] def invertSymmetric(a0: Array[Array[Double]]): Array[Array[Double]] = {
    val d = a0.length
    val a = a0.map(_.clone())
    val inv = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var c = 0
    while (c < d) {
      var p = c
      var r = c + 1
      while (r < d) { if (math.abs(a(r)(c)) > math.abs(a(p)(c))) p = r; r += 1 }
      require(math.abs(a(p)(c)) > 1e-300, s"singular matrix at column $c")
      if (p != c) { val t = a(p); a(p) = a(c); a(c) = t
        val ti = inv(p); inv(p) = inv(c); inv(c) = ti }
      val piv = a(c)(c)
      var j = 0
      while (j < d) { a(c)(j) /= piv; inv(c)(j) /= piv; j += 1 }
      r = 0
      while (r < d) {
        if (r != c) {
          val f = a(r)(c)
          if (f != 0.0) {
            var jj = 0
            while (jj < d) {
              a(r)(jj) -= f * a(c)(jj); inv(r)(jj) -= f * inv(c)(jj); jj += 1
            }
          }
        }
        r += 1
      }
      c += 1
    }
    inv
  }

  /** maha² via the solve-free quadratic form (x−μ)ᵀ A (x−μ) with a
    * LITERAL matrix A (typically [[invertSymmetric]] of the
    * covariance) — the contract twin of [[mahalanobis]], which goes
    * through the eigendecomposition instead. Two fused codegen
    * kernels: y = A(x−μ) (MatVecProject with A·μ folded into the
    * shifts), then y·x − y·μ. Adds column `maha2`. */
  def mahalanobisByMatrix(
      emb: DataFrame, vecCol: String,
      mean: Array[Double], a: Array[Array[Double]]): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    val aShift = a.map(row => row.zip(mean).map { case (x, y) => x * y }.sum)
    val y = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.MatVecProject(
        org.apache.spark.sql.graft.ColumnBridge.expression(col(vecCol)),
        a, aShift))
    val muLit = array(mean.toIndexedSeq.map(lit(_)): _*)
    emb.withColumn("__y", y)
      .withColumn("maha2",
        VF.dot(col("__y"), col(vecCol)) - VF.dot(col("__y"), muLit))
      .drop("__y")
  }
}
