package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.nvd.{CveFlatten, NvdDedup, NvdSchema, NvdStore}

/** Incremental NVD ingest as a Structured Stream — the reference's
  * polling micro-batch pattern (SURVEY §2.9: rolling modified/recent
  * feeds, nvd2mysqlloader.py:160) expressed with a file-source stream.
  *
  * New feed JSON files dropped into `stagingDir` are picked up by the
  * next `Trigger.AvailableNow` run (cron-parity with the reference,
  * which is meant to be run periodically); each micro-batch flattens,
  * dedups within-batch, and upserts into the parquet store keyed by
  * cve_id — so re-delivered or amended CVEs overwrite (last write
  * wins), giving end-to-end idempotence on top of exactly-once source
  * tracking from the checkpoint.
  */
object NvdStreamIngest {

  /** Start (and with AvailableNow, run to drain) the ingest stream. */
  def start(
      spark: SparkSession,
      stagingDir: String,
      storePath: String,
      checkpointDir: String,
      strictReferenceSemantics: Boolean = true): StreamingQuery = {

    val items = spark.readStream
      .schema(NvdSchema.feed)
      .option("multiLine", "true")
      .option("maxFilesPerTrigger", "8")
      .json(stagingDir)
      .select(explode(col("CVE_Items")).as("item"))
      // files arriving later in the stream rank higher: encode arrival
      // order from the batch id inside foreachBatch below
      .withColumn("feed_rank", lit(0))

    val flat = CveFlatten.flattenItems(items, strictReferenceSemantics)

    flat.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // within-batch dedup: keep the newest last_modified per cve_id;
        // across batches the keyed store upsert is the dedup
        val deduped = NvdDedup.lastWriteWins(
          batch.withColumn("feed_rank", lit(batchId)))
        NvdStore.upsert(batch.sparkSession, deduped.drop("feed_rank"), storePath)
        ()
      }
      .start()
  }
}
