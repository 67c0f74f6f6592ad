package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: the composed index that actually scales — IVF cell
  * partition pruning bounds WHICH rows are touched (nprobe/nlist of
  * the corpus), PQ codes bound WHAT is read per touched row (m bytes
  * instead of the vector), and ADC scoring bounds the WORK per row
  * (m table lookups). The exact re-rank then reads true vectors for
  * only `shortlist` rows per query. At 100 TB this is the difference
  * between scanning the corpus per query and touching a few
  * code-only partitions.
  *
  * Simplification vs FAISS: codebooks are trained on RAW vectors, not
  * per-cell residuals — residual training couples the two models and
  * needs an extra corpus pass at train time; the spec pins the recall
  * this simpler form achieves, and the exhaustive setting (nprobe =
  * nlist, shortlist = corpus) still degenerates to exact brute force.
  *
  * Serve-time layout: write `index(...)` partitioned by `cell` so the
  * per-query cell filter becomes parquet partition pruning, and only
  * (id, codes) columns are read until the re-rank.
  */
object IvfPq {

  final case class Model(ivf: Ivf.Model, pq: Pq.Model)

  /** Both trainings run on the same one-job bounded sample recipe —
    * two driver-local Lloyd runs, no extra corpus passes. */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nlist: Int = 16,
      m: Int = 8,
      k: Int = 16,
      iterations: Int = 2): Model =
    Model(
      Ivf.train(corpus, idCol, vecCol, nlist, iterations),
      Pq.train(corpus, idCol, vecCol, dim, m, k, iterations))

  /** Corpus -> (original columns, cell, codes). */
  def index(corpus: DataFrame, vecCol: String, model: Model): DataFrame =
    Pq.encode(Ivf.index(corpus, vecCol, model.ivf), vecCol, model.pq)

  /** Top-k: probe nprobe cells, ADC-score only those cells' codes,
    * exact-cosine re-rank the per-query shortlist. */
  def topK(
      indexed: DataFrame, // corpus with `cell` and `codes`
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      queryVecCol: String,
      model: Model,
      k: Int,
      nprobe: Int,
      shortlist: Int): DataFrame = {
    val qdf = Pq.queryTables(
      indexed.sparkSession, queries, queryIdCol, queryVecCol, model.pq)
    val probed = Ivf.probeCells(qdf, queryVecCol, model.ivf, nprobe)

    // only rows in a probed cell are ADC-scored; everything else is
    // pruned by the broadcast join on `cell`
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
