package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Optimized product quantization (OPQ, Ge et al. CVPR 2013 — the
  * non-parametric eigenvalue-allocation variant): rotate vectors into
  * the PCA eigenbasis BEFORE product quantization, with principal
  * directions dealt to subspaces so each subspace carries a balanced
  * share of the total variance.
  *
  * Why plain PQ leaves recall on the table: PQ quantizes each
  * contiguous dim-slice independently, so CORRELATED dimensions waste
  * codebook entropy (the codebook spends cells on the correlation
  * structure instead of the residual), and a subspace that happens to
  * hold most of the variance saturates its k cells while low-variance
  * subspaces idle. The eigenbasis removes the correlations; the
  * allocation balances per-subspace variance (greedy on eigenvalue
  * log-products — the paper's balanced-variance criterion).
  *
  * The rotation is ORTHONORMAL (a permuted eigenbasis), and vectors
  * are mean-centered before it, so L2 distances are preserved exactly:
  * ADC in rotated space estimates the same distances PQ estimated in
  * the original space — same contract, strictly better codebooks on
  * anisotropic data (OpqSpec measures the recall gain on a planted
  * low-rank corpus and parity on the harness embeddings).
  *
  * Scale shape identical to [[Pq]]: rotation + encode is one fused
  * map-side kernel chain (MatVecProject → PqEncodeCodes, both
  * codegen'd, the matrix a broadcast literal), queries rotate on the
  * driver (they are broadcast-sized by contract), and the exact
  * cosine re-rank reads the ORIGINAL vectors — approximation never
  * touches the returned scores.
  */
object Opq {

  /** rotation rows = permuted eigenbasis (m·subDim = dim rows);
    * shifts = rotation · mean (centering folded into the kernel). */
  final case class Model(
      rotation: Array[Array[Double]],
      shifts: Array[Double],
      pq: Pq.Model) {
    def dim: Int = pq.dim
  }

  /** Deal eigen-directions (sorted by eigenvalue desc) onto `m`
    * subspaces balancing the per-subspace variance PRODUCT (Ge et
    * al.'s eigenvalue allocation): each direction goes to the
    * unfilled subspace with the smallest log-product so far. Returns
    * the direction index order: positions [j*subDim, (j+1)*subDim)
    * hold subspace j's directions. */
  private[ann] def eigenvalueAllocation(variances: Array[Double], m: Int): Array[Int] = {
    val d = variances.length
    require(d % m == 0, s"dim $d must be divisible by m $m")
    val cap = d / m
    val buckets = Array.fill(m)(List.empty[Int])
    val logProd = new Array[Double](m)
    // variances arrive eigen-sorted desc from Pca.fit; floor tiny /
    // zero eigenvalues so the log stays finite
    variances.zipWithIndex.foreach { case (v, i) =>
      val open = (0 until m).filter(buckets(_).length < cap)
      val tgt = open.minBy(b => (logProd(b), b))
      buckets(tgt) = i :: buckets(tgt)
      logProd(tgt) += math.log(math.max(v, 1e-12))
    }
    buckets.flatMap(_.reverse)
  }

  /** Fit: distributed covariance pass → driver eigen → allocation →
    * PQ codebooks trained on the ROTATED sample (same bounded
    * deterministic sample recipe as [[Pq.train]]). */
  /** The rotation alone (distributed covariance → driver eigen →
    * eigenvalue allocation): (rotation rows, shifts). Shared with the
    * [[IvfOpq]] composition, which trains its codebooks through
    * IVF-PQ instead of the plain PQ below. */
  private[ann] def fitRotation(
      corpus: DataFrame, vecCol: String, dim: Int, m: Int)
      : (Array[Array[Double]], Array[Double]) = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val pca = graft.ml.Pca.fit(corpus, vecCol, dim, k = dim)
    val order = eigenvalueAllocation(pca.variances, m)
    val rotation = order.map(pca.components(_))
    val shifts = rotation.map(row =>
      row.zip(pca.mean).map { case (a, b) => a * b }.sum)
    (rotation, shifts)
  }

  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int = 8,
      k: Int = 16,
      iterations: Int = 3,
      maxSamples: Int = 0): Model = {
    val (rotation, shifts) = fitRotation(corpus, vecCol, dim, m)
    val cap = if (maxSamples > 0) maxSamples else k * 256
    val sample = KMeans.sampleVectors(corpus, idCol, vecCol, cap)
    val rotated = sample.map(v => rotate(v, rotation, shifts))
    Model(rotation, shifts, Pq.trainOnVectors(rotated, dim, m, k, iterations))
  }

  private def rotate(v: Array[Double], rotation: Array[Array[Double]],
      shifts: Array[Double]): Array[Double] =
    Array.tabulate(rotation.length) { j =>
      val row = rotation(j)
      var acc = 0.0
      var i = 0
      while (i < row.length) { acc += row(i) * v(i); i += 1 }
      acc - shifts(j)
    }

  /** The rotated-vector column: one fused codegen MatVec kernel. */
  private def rotatedCol(vecCol: String, model: Model): Column =
    ColumnBridge.column(graft.functions.MatVecProject(
      ColumnBridge.expression(col(vecCol)), model.rotation, model.shifts))

  /** Append `codes`: rotate → PQ-encode, one map-side kernel chain. */
  def encode(corpus: DataFrame, vecCol: String, model: Model): DataFrame = {
    val codes = ColumnBridge.column(PqEncodeCodes(
      ColumnBridge.expression(rotatedCol(vecCol, model)), model.pq.codebooks))
    graft.operators.Partitioning.spread(corpus).withColumn("codes", codes)
  }

  /** ADC top-k over OPQ codes with exact cosine re-rank on the
    * ORIGINAL vectors — [[Pq.adcTopK]]'s contract, with the per-query
    * distance table built from the ROTATED query (queries are
    * broadcast-sized and rotate on the driver). */
  def adcTopK(
      encoded: DataFrame, // corpus with `codes` (and the vector column)
      queries: DataFrame, // (qid, qvec)
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      queryVecCol: String,
      model: Model,
      k: Int,
      shortlist: Int): DataFrame = {
    val spark = encoded.sparkSession
    val tables = Pq.collectQueries(queries, queryIdCol, queryVecCol).map {
      case (qid, qv) =>
        (qid, qv.toSeq,
          Pq.distanceTable(rotate(qv, model.rotation, model.shifts), model.pq)
            .map(_.toSeq).toSeq)
    }
    import spark.implicits._
    val qdf = tables.toIndexedSeq.toDF(queryIdCol, queryVecCol, "qtbl")

    val scored = encoded.crossJoin(broadcast(qdf))
      .withColumn("adc", Pq.adcColumn)
    val wAdc = Window.partitionBy(col(queryIdCol)).orderBy(col("adc").asc, col(idCol))
    val short = scored.withColumn("srnk", row_number().over(wAdc))
      .filter(col("srnk") <= shortlist)
    val reranked = short.withColumn("cos",
      graft.functions.VectorFunctions.cosineWithNorms(
        graft.functions.VectorFunctions.dot(col(vecCol), col(queryVecCol)),
        graft.functions.VectorFunctions.l2Norm(col(vecCol)),
        graft.functions.VectorFunctions.l2Norm(col(queryVecCol))))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("cos").desc, col(idCol))
    reranked.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(queryIdCol).as("query_id"), col(idCol).as("neighbor_id"),
        col("cos"), col("rnk"))
  }
}
