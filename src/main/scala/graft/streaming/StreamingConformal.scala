package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ml.ConformalStore

/** Streaming maintenance of the split-conformal calibration state:
  * scored calibration micro-batches fold into the [[ConformalStore]]
  * histogram and the served acceptance threshold stays current — the
  * distribution-free quality gate that re-calibrates continuously
  * without ever re-reading the corpus.
  *
  * Exactly-once BY THE STORE, not by the sink (the
  * [[StreamingCalibration]] contract verbatim): foreachBatch may
  * redeliver after any crash, and `ConformalStore.appendBatch` absorbs
  * each monotone batch id at most once because the id is recorded
  * atomically with the swapped histogram. ConformalStoreSpec drives
  * the redelivery window and pins the file-stream drive's served
  * threshold bit-equal to a one-shot quantile over everything
  * delivered.
  */
object StreamingConformal {

  /** One micro-batch step; exposed for direct use and tests. */
  def process(batch: DataFrame, scoreCol: String, path: String,
      batchId: Long): Unit =
    if (!batch.isEmpty)
      ConformalStore.appendBatch(batch.sparkSession, batch, scoreCol, path,
        batchId)

  /** File-source drive: watch `inDir` for parquet batches carrying
    * `scoreCol`, fold each into the store at `path` (which must
    * exist — [[ConformalStore.create]] seeds it). */
  def stream(
      spark: SparkSession,
      inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      scoreCol: String,
      path: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        process(batch, scoreCol, path, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
