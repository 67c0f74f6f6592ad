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
  *
  * Malformed feed documents are QUARANTINED, not dropped: when
  * `quarantineDir` is set, each micro-batch appends (file, batch_id,
  * corrupt_sample) rows for documents that failed to parse — the
  * PERMISSIVE `_corrupt_record` column on the file path, the raw
  * `content` on the zip path — and only parseable documents reach the
  * flatten. Without a quarantine dir the corrupt rows are still
  * excluded from the load (the explode drops them); the dir just adds
  * the audit trail.
  */
object NvdStreamIngest {

  /** Per-FILE priority inside a batch (reference semantics: years
    * ascend, then modified, then recent — nvd2mysqlloader.py:154-158).
    * Without it, two files landing in the same micro-batch would tie
    * on feed_rank and last-write-wins would pick nondeterministically.
    * `fileName` is any path-or-entry-name column ending in
    * `nvdcve-1.1-<modifier>.json`; the year cast is guarded by the
    * 4-digit rlike, so it is ANSI-safe on arbitrary names. */
  private[streaming] def feedPriority(fileName: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val modifier = regexp_replace(
      regexp_extract(fileName, "([^/]+)\\.json$", 1), "^nvdcve-1\\.1-", "")
    when(modifier === "modified", lit(900))
      .when(modifier === "recent", lit(901))
      .when(modifier.rlike("^\\d{4}$"), modifier.cast("int") - 1900)
      .otherwise(lit(0))
  }

  /** Shared sink tail over a feed-level stream carrying
    * (file, corrupt, corrupt_sample, items). Quarantine append + keyed
    * upsert happen per micro-batch. */
  private def sinkTo(
      feedRows: DataFrame,
      storePath: String,
      checkpointDir: String,
      strictReferenceSemantics: Boolean,
      quarantineDir: Option[String]): StreamingQuery =
    feedRows.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        quarantineDir.foreach { qd =>
          val bad = batch.filter(col("corrupt"))
            .select(col("file"), lit(batchId).as("batch_id"),
              col("corrupt_sample"))
          // an append of zero rows would still CREATE the quarantine
          // dir — only write when something is actually quarantined
          if (!bad.isEmpty)
            bad.write.mode("append").parquet(qd)
        }
        val items = batch.filter(!col("corrupt"))
          .select(explode(col("items")).as("item"),
            feedPriority(col("file")).as("feed_rank"))
        // rank = arrival batch then per-file priority within the batch;
        // across batches the keyed store upsert is the dedup
        val deduped = NvdDedup.lastWriteWins(
          CveFlatten.flattenItems(items, strictReferenceSemantics)
            .withColumn("feed_rank", lit(batchId) * 1000 + col("feed_rank")))
        NvdStore.upsert(batch.sparkSession, deduped.drop("feed_rank"), storePath)
        ()
      }
      .start()

  /** Start (and with AvailableNow, run to drain) the ingest stream. */
  def start(
      spark: SparkSession,
      stagingDir: String,
      storePath: String,
      checkpointDir: String,
      strictReferenceSemantics: Boolean = true,
      quarantineDir: Option[String] = None): StreamingQuery = {
    val feedRows = spark.readStream
      .schema(NvdSchema.feed)
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("maxFilesPerTrigger", "8")
      .json(stagingDir)
      .select(
        input_file_name().as("file"),
        col(NvdSchema.corruptRecordCol).isNotNull.as("corrupt"),
        substring(coalesce(col(NvdSchema.corruptRecordCol), lit("")), 1, 200)
          .as("corrupt_sample"),
        col("CVE_Items").as("items"))
    sinkTo(feedRows, storePath, checkpointDir, strictReferenceSemantics,
      quarantineDir)
  }

  /** Zip-direct ingest: feed ARCHIVES dropped into `zipDir` stream
    * through the ziptext micro-batch source — no staging unzip step
    * exists at all, on the driver or anywhere else. Decompression and
    * parsing happen in the scan tasks of each micro-batch; the file
    * priority comes from the archive's entry name. Corrupt detection
    * is the same `_corrupt_record` column as the file path: `from_json`
    * fills it with the raw input when the document does not parse. */
  def startFromZips(
      spark: SparkSession,
      zipDir: String,
      storePath: String,
      checkpointDir: String,
      strictReferenceSemantics: Boolean = true,
      quarantineDir: Option[String] = None): StreamingQuery = {
    val feedRows = spark.readStream.format("ziptext").load(zipDir)
      .select(from_json(col("content"), NvdSchema.feed).as("feed"),
        col("entry"))
      .select(
        col("entry").as("file"),
        col("feed").getField(NvdSchema.corruptRecordCol).isNotNull.as("corrupt"),
        substring(coalesce(col("feed").getField(NvdSchema.corruptRecordCol), lit("")), 1, 200)
          .as("corrupt_sample"),
        col("feed.CVE_Items").as("items"))
    sinkTo(feedRows, storePath, checkpointDir, strictReferenceSemantics,
      quarantineDir)
  }
}
