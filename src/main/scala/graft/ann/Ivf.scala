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

  /** Train by Lloyd's iterations from deterministic strided seeds. */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      iterations: Int = 2): Model = {
    val n = corpus.count()
    val stride = math.max(n / nlist, 1L)
    // strided seeding: row_number over id order, take every stride-th
    val w = Window.orderBy(col(idCol))
    val seeds = corpus
      .withColumn("__rn", row_number().over(w))
      .filter((col("__rn") - 1) % stride === 0)
      .limit(nlist)
      .select(col(vecCol))
      .collect()
      .zipWithIndex
      .map { case (r, i) =>
        i -> r.getSeq[Any](0).map(x => x.toString.toDouble).toArray
      }
    var model = Model(seeds)
    var it = 0
    while (it < iterations) {
      // assign + per-cell mean (partial aggregation; vectors summed
      // elementwise via posexplode to stay set-based)
      val assigned = corpus.select(col(vecCol).as("v"), cellCol(col(vecCol), model).as("cell"))
      val means = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ms"))
        .select(col("cell"), transform(col("ms"), s => s.getField("m")).as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      if (means.nonEmpty) model = Model(means)
      it += 1
    }
    model
  }

  /** Assign each corpus row its IVF cell (write this frame partitioned
    * by `cell` for file-level pruning at serve time). */
  def index(corpus: DataFrame, vecCol: String, model: Model): DataFrame =
    corpus.withColumn("cell", cellCol(col(vecCol), model))

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

    // per query: nprobe nearest centroids
    val cellDists = model.centroids.map { case (cid, ctr) =>
      struct(l2DistanceTo(col(queryVecCol), ctr).as("d"), lit(cid).as("cid"))
    }
    val probed = queries
      .withColumn("__probe",
        explode(slice(array_sort(array(cellDists.toIndexedSeq: _*)), 1, nprobe)))
      .withColumn("cell", col("__probe.cid"))
      .drop("__probe")

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
