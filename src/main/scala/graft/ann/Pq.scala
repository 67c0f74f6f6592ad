package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate nearest neighbor: split
  * each dim-d vector into `m` subvectors, k-means each subspace into
  * `k` centroids (a codebook), and store each corpus vector as m small
  * codes. Query scoring is ADC (asymmetric distance computation): per
  * query, precompute an m x k table of subspace distances, then a
  * candidate's approximate distance is m table lookups — no vector
  * arithmetic per candidate. An exact re-rank of the ADC shortlist
  * gives the final top-k (shortlist = corpus size degenerates to exact
  * brute force, which the spec asserts).
  *
  * Scale shape: codebooks are tiny (m*k*subDim doubles, broadcast as
  * literals); training follows Ivf.train's one-job hash-ordered sample
  * + driver Lloyd; encoding is a narrow projection (argmin over k
  * literal centroids per subspace); the 8-byte codes column is what an
  * index at 100 TB actually stores — a 32x compression of a 64-dim
  * float vector.
  */
object Pq {

  /** codebooks(j)(c) = centroid c of subspace j (subDim doubles). */
  final case class Model(codebooks: Array[Array[Array[Double]]], dim: Int) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def subDim: Int = dim / m
  }

  /** Train per-subspace codebooks on a bounded deterministic sample
    * (same recipe as Ivf.train: one TakeOrdered job, local Lloyd). */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int = 8,
      k: Int = 16,
      iterations: Int = 3,
      maxSamples: Int = 0): Model = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val cap = if (maxSamples > 0) maxSamples else k * 256
    trainOnVectors(KMeans.sampleVectors(corpus, idCol, vecCol, cap), dim, m, k, iterations)
  }

  /** Lloyd per subspace over an already-materialized sample — shared
    * by raw training above and IvfPq's residual training (which
    * transforms the sample before codebook fitting). */
  private[ann] def trainOnVectors(
      sample: Array[Array[Double]],
      dim: Int,
      m: Int,
      k: Int,
      iterations: Int): Model = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val sub = dim / m
    val books = Array.tabulate(m) { j =>
      val off = j * sub
      val subSample = sample.map(v => java.util.Arrays.copyOfRange(v, off, off + sub))
      KMeans.lloyd(subSample, k, iterations)
    }
    Model(books, dim)
  }

  /** Append an m-element `codes` column (argmin centroid per
    * subspace) via the whole-stage-codegen PqEncodeCodes kernel —
    * one flat primitive loop per row instead of the m*k-subexpression
    * array_min(struct(l2, c)) forest it replaces (same argmin
    * semantics: first-wins tie-break = smallest centroid index).
    * spread() first: the m*k*subDim distance evaluations per row are
    * the expensive stage and must not run on a single input split. */
  def encode(corpus: DataFrame, vecCol: String, model: Model): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val codes = ColumnBridge.column(
      PqEncodeCodes(ColumnBridge.expression(col(vecCol)), model.codebooks))
    graft.operators.Partitioning.spread(corpus).withColumn("codes", codes)
  }

  /** Per-query ADC lookup tables as a broadcast-able frame
    * (queryId, queryVec, qtbl), qtbl = m x k subspace squared
    * distances. Queries must be broadcast-sized (collected on the
    * driver to build the literals). Shared by PQ and IVF-PQ. */
  /** Collect a broadcast-sized query set to the driver, widening
    * floats numerically, never via strings: Float.toString is the
    * shortest round-trip repr, so "0.1".toDouble != 0.1f.toDouble —
    * the exact-cosine re-rank must see the same double-widened query
    * vector a plain (non-collected) plan would. */
  private[ann] def collectQueries(
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String): Array[(Long, Array[Double])] =
    queries.select(col(queryIdCol), col(queryVecCol)).collect().map { r =>
      val qv = r.getSeq[Any](1).map {
        case f: java.lang.Float  => f.toDouble
        case d: java.lang.Double => d.doubleValue()
        case x                   => x.toString.toDouble
      }.toArray
      (r.getLong(0), qv)
    }

  /** The m x k subspace squared-distance table for one query vector
    * (optionally a residual) against the codebooks. */
  private[ann] def distanceTable(qv: Array[Double], model: Model): Array[Array[Double]] = {
    val sub = model.subDim
    Array.tabulate(model.m) { j =>
      val off = j * sub
      model.codebooks(j).map { ctr =>
        var d = 0.0; var p = 0
        while (p < sub) { val t = qv(off + p) - ctr(p); d += t * t; p += 1 }
        d
      }
    }
  }

  private[ann] def queryTables(
      spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      model: Model): DataFrame = {
    val tables = collectQueries(queries, queryIdCol, queryVecCol).map {
      case (qid, qv) => (qid, qv, distanceTable(qv, model))
    }
    import spark.implicits._
    tables.toIndexedSeq.map { case (qid, qv, tbl) =>
      (qid, qv.toSeq, tbl.map(_.toSeq).toSeq)
    }.toDF(queryIdCol, queryVecCol, "qtbl")
  }

  /** approx dist = sum over subspaces of qtbl[j][code_j]; expects
    * `codes` (corpus side) and `qtbl` (query side) columns. Codegen
    * AdcDistance kernel — the aggregate(zip_with(...)) HOF form it
    * replaces evaluates an interpreted lambda per subspace per
    * candidate row (the measured ~70x HOF penalty; this runs once per
    * (candidate x query) pair, the hottest loop in the PQ path). */
  private[ann] def adcColumn: Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(AdcDistance(
      ColumnBridge.expression(col("codes")),
      ColumnBridge.expression(col("qtbl"))))
  }

  /** ADC top-k with exact cosine re-rank of the `shortlist` nearest-
    * by-ADC candidates. Queries must be broadcast-sized (collected to
    * build the per-query distance tables). */
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
    val qdf = queryTables(encoded.sparkSession, queries, queryIdCol, queryVecCol, model)
    val approx = adcColumn

    val scored = encoded.crossJoin(broadcast(qdf))
      .withColumn("adc", approx)
    val wAdc = Window.partitionBy(col(queryIdCol)).orderBy(col("adc").asc, col(idCol))
    val short = scored.withColumn("srnk", row_number().over(wAdc))
      .filter(col("srnk") <= shortlist)
    // exact cosine re-rank of the shortlist only
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
