package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.VocabStore

/** Streaming maintenance of the vocabulary statistics: tokenized
  * postings micro-batches fold into the [[VocabStore]] and the served
  * term table (heavy-hitters, df, OOV probes) stays current without
  * re-tokenizing the corpus.
  *
  * Exactly-once BY THE STORE (the [[StreamingCalibration]] contract):
  * foreachBatch may redeliver, and `VocabStore.appendBatch` absorbs
  * each monotone batch id at most once because the id is recorded
  * atomically with the swapped statistics — load-bearing here, since
  * re-absorbing a vocab batch WOULD double its counts (this monoid is
  * not idempotent, unlike the bottom-k sample's).
  */
object StreamingVocab {

  /** One micro-batch step; exposed for direct use and tests. */
  def process(batch: DataFrame, idCol: String, termCol: String,
      path: String, batchId: Long): Unit =
    if (!batch.isEmpty)
      VocabStore.appendBatch(batch.sparkSession, batch, idCol, termCol,
        path, batchId)

  /** File-source drive: watch `inDir` for parquet postings batches
    * carrying `idCol`/`termCol`, fold each into the store at `path`
    * (which must exist — [[VocabStore.create]] seeds it). */
  def stream(
      spark: SparkSession,
      inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      idCol: String,
      termCol: String,
      path: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        process(batch, idCol, termCol, path, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
