package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Embedding-space outlier detection for labelled corpora: score every
  * vector by cosine similarity to its OWN group's centroid and surface
  * the least-typical members — the standard screen for mislabelled /
  * noisy rows before embeddings feed a training mix (and the
  * cheap-side half of SemDeDup-style curation: prototypes come from
  * the same centroids).
  *
  * Dataflow, all relational:
  *  - centroids: posexplode the vectors -> groupBy (label, pos) avg —
  *    one shuffle keyed by (label, dim), parallel across dims x labels
  *    (never a per-label collect) -> reassemble each centroid with
  *    array_sort(collect_list(struct(pos, m))). The centroid table has
  *    |labels| rows — broadcast by construction.
  *  - scoring: map-side broadcast join + the codegen'd double-accurate
  *    cosine kernel ([[VectorFunctions.cosine]]) — the corpus is
  *    scanned once, never shuffled.
  *  - outliers: per-label bottom-k by cosine (window row_number with a
  *    unique id tie-break) — one shuffle keyed by label; k and
  *    |labels| are small, so the window never sees unbounded state.
  *
  * At 100 TB the only corpus-sized costs are the posexplode aggregate
  * (dims x |labels| output rows — tiny) and the broadcast-join scan.
  */
object EmbeddingOutliers {

  /** Per-label mean vector `(labelCol, centroid: array<double>)`. */
  def centroids(emb: DataFrame, labelCol: String, vecCol: String): DataFrame =
    emb.select(col(labelCol), posexplode(col(vecCol)))
      .groupBy(col(labelCol), col("pos")).agg(avg(col("col")).as("m"))
      .groupBy(col(labelCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("centroid"))

  /** Every vector with its cosine to its own label centroid:
    * input columns + `cos`. */
  def scored(emb: DataFrame, labelCol: String, vecCol: String): DataFrame =
    emb.join(broadcast(centroids(emb, labelCol, vecCol)), labelCol)
      .withColumn("cos", VectorFunctions.cosine(col(vecCol), col("centroid")))
      .drop("centroid")

  /** Bottom-k least-typical vectors per label:
    * `(labelCol, idCol, cos, rank)`, rank 1 = farthest from centroid.
    * Tie-break on id for cross-engine determinism. */
  def outliers(emb: DataFrame, labelCol: String, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(labelCol)).orderBy(col("cos").asc, col(idCol).asc)
    scored(emb, labelCol, vecCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(labelCol), col(idCol), col("cos"), col("rank"))
  }
}
