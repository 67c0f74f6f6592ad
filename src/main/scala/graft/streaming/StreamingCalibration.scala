package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ml.IsotonicStore

/** Streaming maintenance of the isotonic-calibration state: scored,
  * labeled micro-batches fold into the [[IsotonicStore]] and the
  * served calibration stays current — the "quality-gate calibrator
  * that never re-reads the corpus" composed with Structured
  * Streaming's at-least-once foreachBatch.
  *
  * Exactly-once BY THE STORE, not by the sink: foreachBatch may
  * redeliver a batch after any crash, and `IsotonicStore.appendBatch`
  * absorbs each monotone batch id at most once because the id is
  * recorded atomically with the swapped statistics. No upstream
  * dedup, no idempotent-write contract on the caller — the integer
  * bin counts cannot double (IsotonicSpec drives the redelivery and
  * crash windows; the file-stream drive is spec-equal to one batch
  * build over everything delivered).
  */
object StreamingCalibration {

  /** One micro-batch step; exposed for direct use and tests. */
  def process(batch: DataFrame, scoreCol: String, labelCol: String,
      path: String, batchId: Long): Unit =
    if (!batch.isEmpty)
      IsotonicStore.appendBatch(batch.sparkSession, batch, scoreCol, labelCol,
        path, batchId)

  /** File-source drive: watch `inDir` for parquet batches carrying
    * `scoreCol`/`labelCol`, fold each into the store at `path` (which
    * must exist — [[IsotonicStore.create]] seeds it). */
  def stream(
      spark: SparkSession,
      inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      scoreCol: String,
      labelCol: String,
      path: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        process(batch, scoreCol, labelCol, path, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
