package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 scalar quantization — the storage-side
  * compression for embedding corpora: each float32 dimension becomes
  * one signed byte (`q_i = floor(x_i * 127 / max|x| + 0.5)`, range
  * [-127, 127]), a 4x size cut on the column that dominates an
  * embedding table's footprint. Cosine similarity is scale-invariant,
  * so similarity search runs directly on the quantized codes — no
  * dequantization and no stored scale needed for ranking; `qscale`
  * (max|x|/127) is kept for magnitude-faithful reconstruction
  * (`x_i ≈ q_i * qscale`, max element error qscale/2).
  *
  * This is the simplest point on the compression curve the PQ/IVF-PQ
  * family (graft.ann.Pq/IvfPq) extends: SQ8 is per-dimension rounding
  * (no training, exact within 1/254 relative), PQ is trained
  * sub-vector codebooks (8-32x, approximate). A 100 TB float corpus
  * that must stay exactly re-rankable ships SQ8; one that can afford
  * codebook error ships PQ.
  *
  * Everything is a narrow projection (HOF transform + array_max) —
  * no shuffle, no UDFs; the rounding is floor(x + 0.5) explicitly so
  * the arithmetic is engine-portable (no round-half-mode ambiguity).
  * (Reference scope: nvd2mysqlloader has no vector surface — part of
  * the mandated similarity-search extension set.)
  */
object ScalarQuant {

  /** Adds `qCol` (array<tinyint>) and `scaleCol` (double). Zero
    * vectors quantize to zeros with scale 0 (the guard keeps the
    * division from producing Infinity under ANSI). A null vector
    * fails loud (repo convention — DataSplit/PageRank): silently
    * passing null through would surface later as null cosines in
    * topK, far from the cause. */
  def quantize(
      df: DataFrame,
      vecCol: String,
      qCol: String = "qvec",
      scaleCol: String = "qscale"): DataFrame = {
    val checked = when(col(vecCol).isNull,
      raise_error(lit(s"ScalarQuant: null vector in '$vecCol' cannot be quantized")))
      .otherwise(col(vecCol))
    val ma = array_max(transform(checked, x => abs(x.cast("double"))))
    df.withColumn("__ma", ma)
      .withColumn(scaleCol, col("__ma") / 127.0)
      .withColumn(qCol,
        when(col("__ma") === 0.0,
          transform(col(vecCol), _ => lit(0).cast("tinyint")))
          .otherwise(transform(col(vecCol), x =>
            floor(x.cast("double") * 127.0 / col("__ma") + 0.5).cast("tinyint"))))
      .drop("__ma")
  }

  /** Magnitude-faithful reconstruction of a quantized vector. */
  def dequantize(qCol: Column, scaleCol: Column): Column =
    transform(qCol, q => q.cast("double") * scaleCol)

  /** Exact top-k by cosine OVER THE QUANTIZED CODES for both corpus
    * and queries — the memory-bound brute-force path at 1/4 the bytes.
    * Output matches `Ann.bruteForceTopK` (query_id, neighbor_id, cos,
    * rnk), with `cos` the quantized-domain cosine. */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      queryVecCol: String,
      k: Int): DataFrame = {
    val qc = quantize(corpus, vecCol, "__q", "__s")
      .select(col(idCol), col("__q").cast("array<double>").as("__dq"))
    val qq = quantize(queries, queryVecCol, "__q", "__s")
      .select(col(queryIdCol), col("__q").cast("array<double>").as("__dqq"))
    Ann.bruteForceTopK(qc, qq, idCol, "__dq", queryIdCol, "__dqq", k)
  }
}
