package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus curation — the continuous-ingest twin of
  * `graft.pipeline.CorpusPipeline`. Per micro-batch of documents
  * (doc_id, text, lang):
  *
  *   1. CLEAN (stateless): language known, word count in range,
  *      quality score above threshold — same predicates as the batch
  *      pipeline, pushed into the batch's scan;
  *   2. ADMIT vs history (stateful): near-duplicate rejection against
  *      the admitted-corpus signature state
  *      (`StreamingNearDupDedup`). Exact duplicates are Jaccard 1.0,
  *      so the near-dup threshold SUBSUMES exact dedup — one state,
  *      not two;
  *   3. APPEND the admitted rows to the curated store, partitioned by
  *      language — append-only, O(batch) I/O per drain.
  *
  * Replayed doc ids (at-least-once delivery, checkpoint retry) are
  * ignored by the admission state, so the curated store is not
  * double-appended on replay. Non-atomicity bound: the state append
  * and the store append are two writes — a crash between them leaves
  * a doc admitted-in-state but missing from the store. That loses at
  * most one batch's curated COPIES (never corrupts state), and the
  * store is rebuildable as `state ids ⋉ raw corpus`; doing better
  * requires a transactional table format, which plain parquet is not.
  */
object StreamingCorpusPipeline {

  final case class Options(
      minWords: Int = 10,
      maxWords: Int = 5000,
      minQuality: Double = 0.3,
      nearDupJaccard: Double = 0.8)

  final case class BatchReport(input: Long, afterClean: Long, admitted: Long)

  /** The stateless cleaning stage — THE batch pipeline's, not a
    * copy, so batch and continuous curation cannot diverge. */
  def clean(docs: DataFrame, opts: Options): DataFrame =
    graft.pipeline.CorpusPipeline.clean(
      docs, opts.minWords, opts.maxWords, opts.minQuality)

  /** One micro-batch step; exposed for direct (batch) use and tests. */
  def processBatch(
      spark: SparkSession,
      batch: DataFrame, // (doc_id, text, lang)
      storeDir: String,
      sigStateDir: String,
      opts: Options = Options()): BatchReport = {
    val input = batch.count()
    val cleaned = clean(batch, opts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val afterClean = cleaned.count()

    var admitted = 0L
    StreamingNearDupDedup.process(
      spark, cleaned.select(col("doc_id"), col("text")), sigStateDir,
      opts.nearDupJaccard,
      onAdmitted = { ids =>
        val curated = cleaned
          .join(ids.withColumnRenamed("doc", "doc_id"), Seq("doc_id"), "left_semi")
          .drop("n_words", "quality")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        admitted = curated.count()
        if (admitted > 0)
          curated.write.mode(SaveMode.Append).partitionBy("lang").parquet(storeDir)
        curated.unpersist()
        ()
      })
    cleaned.unpersist()
    BatchReport(input, afterClean, admitted)
  }

  /** Curate a document stream (parquet drop dir) into `storeDir`. */
  def start(
      spark: SparkSession,
      streamDir: String,
      storeDir: String,
      sigStateDir: String,
      checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType,
      opts: Options = Options()): StreamingQuery =
    spark.readStream.schema(schema).parquet(streamDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val r = processBatch(spark, batch, storeDir, sigStateDir, opts)
        org.slf4j.LoggerFactory.getLogger(getClass)
          .info(s"corpus batch $batchId: in=${r.input} clean=${r.afterClean} admitted=${r.admitted}")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
