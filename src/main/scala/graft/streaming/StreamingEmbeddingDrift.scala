package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ml.EmbeddingDrift

/** Streaming representation-drift gate: every micro-batch of incoming
  * embeddings is compared against a FROZEN baseline (the corpus the
  * serving ANN index / classifier was built on) with
  * [[EmbeddingDrift.report]]; per-label rows whose centroid shift
  * exceeds `maxShift` are appended to an alert log. The batch twin of
  * the column-stats drift gate, for the failure the scalar columns
  * can't see: a re-embedded or distribution-shifted feed whose lengths
  * and languages all look normal.
  *
  * Stateless by design: the baseline is read-only (frozen-model
  * semantics — same contract as the IVF store's frozen centroids), so
  * the gate needs no streaming state, restarts are trivially correct,
  * and each drain costs one centroid aggregation of the BATCH plus a
  * |labels|-row join against the baseline's precomputed stats.
  */
object StreamingEmbeddingDrift {

  /** One micro-batch step (exposed for direct use and tests): appends
    * `(labelCol, n_a=baseline, n_b=batch, centroid_shift, mean_norm_a,
    * mean_norm_b, batch_id)` for labels over `maxShift` to `alertDir`,
    * and the full report to `reportDir` when given. */
  def process(
      baseline: DataFrame,
      batch: DataFrame,
      labelCol: String,
      vecCol: String,
      maxShift: Double,
      alertDir: String,
      batchId: Long,
      reportDir: Option[String] = None): Unit = {
    if (batch.isEmpty) return
    val report = EmbeddingDrift.report(baseline, batch, labelCol, vecCol)
      .withColumn("batch_id", lit(batchId))
    val persisted = report.persist()
    try {
      reportDir.foreach(d => persisted.write.mode(SaveMode.Append).parquet(d))
      persisted.filter(col("centroid_shift") > maxShift)
        .write.mode(SaveMode.Append).parquet(alertDir)
    } finally { persisted.unpersist(); () }
  }

  /** File-source drive: watch `inDir` for parquet batches of
    * embeddings, gate each against the baseline. */
  def stream(
      spark: SparkSession,
      inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      baseline: DataFrame,
      labelCol: String,
      vecCol: String,
      maxShift: Double,
      alertDir: String,
      checkpointDir: String,
      reportDir: Option[String] = None): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        process(baseline, batch, labelCol, vecCol, maxShift, alertDir, id, reportDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
