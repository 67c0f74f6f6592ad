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
  * Codebooks quantize per-cell RESIDUALS (vector - cell centroid), the
  * FAISS recipe: residuals concentrate around the origin, so the same
  * m*k budget spends its precision where vectors actually live. The
  * coupling costs nothing extra at train time — both models fit on
  * the SAME one-job bounded sample (residuals derived driver-side) —
  * and the exhaustive setting (nprobe = nlist, shortlist = corpus)
  * still degenerates to exact brute force (oracle-checked as q74b).
  * `residual = false` keeps the simpler raw-vector codebooks.
  *
  * Serve-time layout: write `index(...)` partitioned by `cell` so the
  * per-query cell filter becomes parquet partition pruning, and only
  * (id, codes) columns are read until the re-rank.
  */
object IvfPq {

  final case class Model(ivf: Ivf.Model, pq: Pq.Model, residual: Boolean = true)

  /** Both trainings run on the same one-job bounded sample recipe —
    * two driver-local Lloyd runs, no extra corpus passes. Residual
    * mode assigns each sample vector its nearest IVF centroid and
    * fits the codebooks on (vector - centroid), all on the driver. */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nlist: Int = 16,
      m: Int = 8,
      k: Int = 16,
      iterations: Int = 2,
      residual: Boolean = true): Model = {
    val ivf = Ivf.train(corpus, idCol, vecCol, nlist, iterations)
    val pq =
      if (!residual) Pq.train(corpus, idCol, vecCol, dim, m, k, iterations)
      else {
        val sample = KMeans.sampleVectors(corpus, idCol, vecCol, k * 256)
        val residuals = sample.map { v =>
          val ctr = ivf.centroids.minBy { case (cid, c) =>
            var d = 0.0; var p = 0
            while (p < v.length) { val t = v(p) - c(p); d += t * t; p += 1 }
            (d, cid) // tie-break on cell id, matching the plan-side argmin
          }._2
          Array.tabulate(v.length)(p => v(p) - ctr(p))
        }
        Pq.trainOnVectors(residuals, dim, m, k, iterations)
      }
    Model(ivf, pq, residual)
  }

  /** Corpus -> (original columns, cell, codes). */
  def index(corpus: DataFrame, vecCol: String, model: Model): DataFrame = {
    val celled = Ivf.index(corpus, vecCol, model.ivf)
    if (!model.residual) Pq.encode(celled, vecCol, model.pq)
    else {
      import org.apache.spark.sql.graft.ColumnBridge
      val codes = ColumnBridge.column(ResidualPqEncodeCodes(
        ColumnBridge.expression(col(vecCol)),
        ColumnBridge.expression(col("cell").cast("int")),
        model.ivf.centroids.map(_._2),
        model.pq.codebooks))
      graft.operators.Partitioning.spread(celled).withColumn("codes", codes)
    }
  }

  /** Per-(query, probed cell) residual ADC tables: the residual of a
    * query differs per cell, so each probed (query, cell) pair gets
    * its own m x k table over (query - cellCentroid). Probing happens
    * driver-side on the already-collected query set — same arithmetic
    * and tie-break as the plan-side argmin. */
  private[ann] def residualQueryTables(
      spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      model: Model,
      nprobe: Int): DataFrame = {
    val rows = Pq.collectQueries(queries, queryIdCol, queryVecCol).flatMap {
      case (qid, qv) =>
        val nearest = model.ivf.centroids.map { case (cid, c) =>
          var d = 0.0; var p = 0
          while (p < qv.length) { val t = qv(p) - c(p); d += t * t; p += 1 }
          (d, cid, c)
        }.sortBy(t => (t._1, t._2)).take(nprobe)
        nearest.map { case (_, cid, c) =>
          val res = Array.tabulate(qv.length)(p => qv(p) - c(p))
          (qid, qv.toSeq, cid, Pq.distanceTable(res, model.pq).map(_.toSeq).toSeq)
        }
    }
    import spark.implicits._
    rows.toIndexedSeq.toDF(queryIdCol, queryVecCol, "cell", "qtbl")
  }

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
    val probed =
      if (model.residual)
        residualQueryTables(
          indexed.sparkSession, queries, queryIdCol, queryVecCol, model, nprobe)
      else
        Ivf.probeCells(
          Pq.queryTables(indexed.sparkSession, queries, queryIdCol, queryVecCol, model.pq),
          queryVecCol, model.ivf, nprobe)

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
