package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.SampleStore

/** Streaming maintenance of the stratified bottom-k sample: corpus
  * micro-batches fold into the [[SampleStore]] and the maintained
  * eval slice stays exactly the slice a from-scratch pass over
  * everything delivered would carve — the held-out set that never
  * re-reads the corpus.
  *
  * Replay safety is DOUBLE here: the batch-id guard absorbs each
  * monotone id at most once (the [[StreamingCalibration]] contract),
  * and the bottom-k monoid is idempotent besides — even a batch
  * folded twice through the raw [[SampleStore.append]] cannot change
  * the sample (SampleStoreSpec pins both).
  */
object StreamingSample {

  /** One micro-batch step; exposed for direct use and tests. */
  def process(batch: DataFrame, strataCol: String, keyCol: String,
      path: String, batchId: Long): Unit =
    if (!batch.isEmpty)
      SampleStore.appendBatch(batch.sparkSession, batch, strataCol, keyCol,
        path, batchId)

  /** File-source drive: watch `inDir` for parquet batches carrying
    * `strataCol`/`keyCol`, fold each into the store at `path` (which
    * must exist — [[SampleStore.create]] seeds it). */
  def stream(
      spark: SparkSession,
      inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      strataCol: String,
      keyCol: String,
      path: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        process(batch, strataCol, keyCol, path, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
