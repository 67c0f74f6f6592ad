package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** The fully-composed scale index — OPQ rotation + IVF cells +
  * residual PQ (the FAISS `OPQd,IVFn,PQm` index string): vectors are
  * rotated into the variance-balanced eigenbasis FIRST, and the
  * entire IVF-PQ machinery (cell train/assign, residual codebooks,
  * ADC) runs in rotated space, where the codebooks stop wasting
  * entropy on cross-dimension correlations. The rotation is
  * orthonormal with the mean-shift folded in, so L2 geometry — cell
  * Voronoi boundaries, residual distances, ADC estimates — is
  * EXACTLY preserved; the final re-rank reads ORIGINAL vectors, so
  * returned cosines never see the rotation at all.
  *
  * Composition, not re-implementation: `train` feeds the rotated
  * corpus column through [[IvfPq.train]] verbatim; `index` and
  * [[topK]] differ from IVF-PQ only in WHERE the rotated column
  * comes from (one fused MatVecProject kernel) and in re-ranking on
  * the untouched original column. The exhaustive setting (nprobe =
  * nlist, unbounded shortlist) therefore still provably degenerates
  * to brute force — the q74b/q181b argument carried through the
  * rotation — which is what keeps the oracle twin exact.
  */
object IvfOpq {

  final case class Model(
      rotation: Array[Array[Double]],
      shifts: Array[Double],
      ivfpq: IvfPq.Model)

  private def rotCol(vecCol: Column,
      rotation: Array[Array[Double]], shifts: Array[Double]): Column =
    ColumnBridge.column(graft.functions.MatVecProject(
      ColumnBridge.expression(vecCol), rotation, shifts))

  private def rotCol(vecCol: Column, model: Model): Column =
    rotCol(vecCol, model.rotation, model.shifts)

  /** PCA rotation (eigenvalue allocation, the [[Opq]] prelude) + an
    * IVF-PQ trained on the ROTATED corpus column. */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nlist: Int = 16,
      m: Int = 8,
      k: Int = 16,
      iterations: Int = 2): Model = {
    val (rotation, shifts) = Opq.fitRotation(corpus, vecCol, dim, m)
    val rotated = corpus.withColumn("__rot", rotCol(col(vecCol), rotation, shifts))
    val ivfpq = IvfPq.train(rotated, idCol, "__rot", dim, nlist, m, k,
      iterations, residual = true)
    Model(rotation, shifts, ivfpq)
  }

  /** Corpus -> (original columns, cell, codes); cell assignment and
    * residual codes computed in rotated space, original vector kept
    * for the re-rank. */
  def index(corpus: DataFrame, vecCol: String, model: Model): DataFrame =
    IvfPq.index(
        corpus.withColumn("__rot", rotCol(col(vecCol), model)), "__rot",
        model.ivfpq)
      .drop("__rot")

  /** Top-k: probe nprobe cells with the ROTATED query (per-(query,
    * cell) residual ADC tables), score only those cells' codes,
    * exact-cosine re-rank the shortlist on ORIGINAL vectors. */
  def topK(
      indexed: DataFrame, // output of [[index]]
      queries: DataFrame, // (qid, qvec)
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      queryVecCol: String,
      model: Model,
      k: Int,
      nprobe: Int,
      shortlist: Int): DataFrame = {
    val qRot = queries.withColumn("__qrot", rotCol(col(queryVecCol), model))
    // per-(query, probed cell) residual tables from the rotated query;
    // the ORIGINAL query vector joins back by id for the re-rank
    val probed = IvfPq.residualQueryTables(
        indexed.sparkSession, qRot, queryIdCol, "__qrot", model.ivfpq, nprobe)
      .drop("__qrot")
      .join(broadcast(queries.select(col(queryIdCol), col(queryVecCol))),
        Seq(queryIdCol))
    val scored = indexed.join(broadcast(probed), Seq("cell"))
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
