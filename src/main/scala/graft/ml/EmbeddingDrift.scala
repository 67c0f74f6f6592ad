package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Embedding-space drift between two corpus versions — the
  * representation-level companion of the column-stats drift monitor
  * ([[graft.operators.DriftReport]]): a re-embedded or re-sampled
  * corpus can keep every scalar column distribution while the vectors
  * move. Per label: version sizes, the L2 shift of the mean vector,
  * and mean-norm change — the cheap sufficient summary that pages a
  * human before an ANN index trained on version A serves version B.
  *
  * Scale shape: two centroid aggregations (posexplode keyed by
  * (label, dim) — dims x labels output rows) + two scalar-norm
  * aggregations, then a |labels|-row join. Nothing pairwise, nothing
  * driver-side.
  */
object EmbeddingDrift {

  private def stats(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val cent = EmbeddingOutliers.centroids(df, labelCol, vecCol)
    val norms = df.groupBy(col(labelCol))
      .agg(count(lit(1)).as("n"),
        avg(VectorFunctions.l2Norm(col(vecCol))).as("mean_norm"))
    cent.join(norms, labelCol)
  }

  /** `(labelCol, n_a, n_b, centroid_shift, mean_norm_a, mean_norm_b)`
    * over labels present in BOTH versions (a label that appears or
    * vanishes entirely is a set-level diff, SnapshotDiff's job). */
  def report(a: DataFrame, b: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val sa = stats(a, labelCol, vecCol)
      .select(col(labelCol), col("centroid").as("ca"),
        col("n").as("n_a"), col("mean_norm").as("mean_norm_a"))
    val sb = stats(b, labelCol, vecCol)
      .select(col(labelCol), col("centroid").as("cb"),
        col("n").as("n_b"), col("mean_norm").as("mean_norm_b"))
    sa.join(sb, labelCol)
      .select(col(labelCol), col("n_a"), col("n_b"),
        VectorFunctions.l2Distance(col("ca"), col("cb")).as("centroid_shift"),
        col("mean_norm_a"), col("mean_norm_b"))
  }
}
