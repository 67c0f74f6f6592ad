package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate nearest neighbor: partition the
  * corpus into `nlist` Voronoi cells around learned centroids; at
  * query time probe only the `nprobe` nearest cells and re-rank
  * exactly within them.
  *
  * Scale shape: centroids are tiny (nlist x dim doubles) and live
  * broadcast; the corpus is scanned ONCE to assign cells (a narrow
  * column append, no shuffle) and can be written back partitioned by
  * cell so probes prune whole files; each query touches
  * ~nprobe/nlist of the data. Training is Lloyd's algorithm with
  * deterministic strided seeding — each iteration is one
  * broadcast-join + groupBy-avg (two narrow shuffles of (cell, vec)
  * partial sums).
  */
object Ivf {

  final case class Model(centroids: Array[(Int, Array[Double])]) {
    def nlist: Int = centroids.length
  }

  /** argmin-cell assignment column for a vector column, given
    * broadcast centroid literals: one SquaredL2Distance kernel call
    * per centroid, folded into a least() chain. */
  private def cellCol(vec: org.apache.spark.sql.Column, m: Model): org.apache.spark.sql.Column = {
    val dists = m.centroids.map { case (cid, ctr) =>
      struct(l2DistanceTo(vec, ctr).as("d"), lit(cid).as("cid"))
    }
    // array_min on structs orders by first field => nearest centroid
    array_min(array(dists.toIndexedSeq: _*)).getField("cid")
  }

  private def l2DistanceTo(vec: org.apache.spark.sql.Column, ctr: Array[Double]) = {
    val carr = array(ctr.map(lit).toIndexedSeq: _*)
    graft.functions.VectorFunctions.l2Distance(vec, carr)
  }

  /** Train by Lloyd's algorithm on a bounded deterministic sample.
    *
    * The standard IVF recipe (what FAISS does): k-means never needs
    * the full corpus — a few hundred samples per centroid suffice —
    * so the cluster does ONE job (a hash-ordered TakeOrdered sample:
    * per-partition top-N + driver merge, no full sort) and Lloyd's
    * iterations run on the driver over that sample. Versus distributed
    * iterations this removes 2 shuffles per iteration and is the only
    * form that stays sane at 100 TB, where even one extra full pass
    * over the corpus dwarfs the entire training cost.
    *
    * Deterministic: sample = `maxSamples` rows minimizing
    * xxhash64(id) (stable under partitioning), seeds = first nlist of
    * those in hash order, ties in assignment broken by cell id.
    */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      iterations: Int = 2,
      maxSamples: Int = 0): Model = {
    val cap = if (maxSamples > 0) maxSamples else nlist * 256
    val sample = KMeans.sampleVectors(corpus, idCol, vecCol, cap)
    val centroids = KMeans.lloyd(sample, nlist, iterations)
    Model(centroids.zipWithIndex.map { case (ctr, i) => i -> ctr })
  }

  /** Assign each corpus row its IVF cell (write this frame partitioned
    * by `cell` for file-level pruning at serve time). */
  def index(corpus: DataFrame, vecCol: String, model: Model): DataFrame =
    corpus.withColumn("cell", cellCol(col(vecCol), model))

  /** Explode each query row into its `nprobe` nearest cells (adds a
    * `cell` column). Shared by the pure-IVF and IVF-PQ probe paths. */
  private[ann] def probeCells(
      queries: DataFrame,
      queryVecCol: String,
      model: Model,
      nprobe: Int): DataFrame = {
    val cellDists = model.centroids.map { case (cid, ctr) =>
      struct(l2DistanceTo(col(queryVecCol), ctr).as("d"), lit(cid).as("cid"))
    }
    queries
      .withColumn("__probe",
        explode(slice(array_sort(array(cellDists.toIndexedSeq: _*)), 1, nprobe)))
      .withColumn("cell", col("__probe.cid"))
      .drop("__probe")
  }

  /** Top-k by cosine probing the nprobe nearest cells per query. */
  def topK(
      indexed: DataFrame, // corpus with `cell`
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      queryVecCol: String,
      model: Model,
      k: Int,
      nprobe: Int): DataFrame = {

    val probed = probeCells(queries, queryVecCol, model, nprobe)

    val corpusN = indexed.withColumn("__cn", l2Norm(col(vecCol)))
    val queriesN = probed.withColumn("__qn", l2Norm(col(queryVecCol)))

    val joined = corpusN.join(broadcast(queriesN), Seq("cell"))
      .withColumn("cos", cosineWithNorms(
        dot(col(vecCol), col(queryVecCol)), col("__cn"), col("__qn")))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("cos").desc, col(idCol))
    joined
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(queryIdCol).as("query_id"), col(idCol).as("neighbor_id"),
        col("cos"), col("rnk"))
  }
}
