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

  /** argmin-cell assignment column for a vector column: one codegen
    * ArgminCell kernel carrying the centroids as a flattened double[]
    * reference object. Replaces the former
    * `array_min(array(struct(l2, cid), ...))` literal forest, whose
    * generated code grew with nlist x dim and fell out of codegen at
    * production nlist (see IvfKernels.scala for the bit-for-bit
    * equivalence argument; IvfKernelSpec proves it at nlist=256). */
  private[ann] def cellCol(vec: org.apache.spark.sql.Column, m: Model): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ArgminCell(org.apache.spark.sql.graft.ColumnBridge.expression(vec), m.centroids))

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
    * `cell` column). Shared by the pure-IVF and IVF-PQ probe paths.
    * A null query vector produces no probes — the query row is
    * dropped (explode of the kernel's null output), which is also
    * the only sound answer for a vectorless query. */
  private[ann] def probeCells(
      queries: DataFrame,
      queryVecCol: String,
      model: Model,
      nprobe: Int): DataFrame = {
    val nearest = org.apache.spark.sql.graft.ColumnBridge.column(
      NearestCells(
        org.apache.spark.sql.graft.ColumnBridge.expression(col(queryVecCol)),
        model.centroids, nprobe))
    queries.withColumn("cell", explode(nearest))
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
      nprobe: Int): DataFrame =
    topKPrepared(indexed.withColumn("__cn", l2Norm(col(vecCol))),
      queries, idCol, vecCol, queryIdCol, queryVecCol, model, k, nprobe)

  /** [[topK]] over a corpus that ALREADY carries its `__cn` l2-norm
    * column — the route for [[IvfStore]], which persists the norm so
    * serve-time probes skip the recompute. Same arithmetic by
    * construction. */
  private[ann] def topKPrepared(
      corpusN: DataFrame, // corpus with `cell` and `__cn`
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      queryVecCol: String,
      model: Model,
      k: Int,
      nprobe: Int): DataFrame = {

    val probed = probeCells(queries, queryVecCol, model, nprobe)
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
