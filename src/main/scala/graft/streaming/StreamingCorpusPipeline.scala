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
  * a doc admitted-in-state but missing from the store. That window is
  * HEALED on replay (step 0 of `processBatch`): the failed batch is
  * re-delivered with the same rows (the checkpoint never committed),
  * so the batch's already-admitted ids are probed against the store
  * and the missing curated rows re-appended before normal processing.
  * The heal is idempotent — ids already in the store are skipped — so
  * a crash mid-heal just re-heals on the next replay.
  */
object StreamingCorpusPipeline {

  final case class Options(
      minWords: Int = 10,
      maxWords: Int = 5000,
      minQuality: Double = 0.3,
      nearDupJaccard: Double = 0.8,
      // Gopher-style boilerplate gate; stateless (row-local kernel),
      // so it composes with streaming exactly like clean()
      maxTopTokenFrac: Option[Double] = None,
      // n-gram tier of the gate (top-bigram share / repeated-trigram
      // fraction) — also stateless, see CorpusPipeline.ngramRepetitionGate
      maxTopBigramShare: Option[Double] = None,
      maxDupTrigramFrac: Option[Double] = None,
      // entropy floor (CorpusPipeline.entropyGate) — stateless too
      minEntropy: Option[Double] = None)

  final case class BatchReport(
      input: Long, afterClean: Long, admitted: Long, healed: Long = 0L)

  /** The stateless cleaning stage (incl. the optional repetition
    * gate) — THE batch pipeline's, not a copy, so batch and continuous
    * curation cannot diverge. */
  def clean(docs: DataFrame, opts: Options): DataFrame = {
    val base = graft.pipeline.CorpusPipeline.clean(
      docs, opts.minWords, opts.maxWords, opts.minQuality)
    val unigram = opts.maxTopTokenFrac.fold(base)(
      graft.pipeline.CorpusPipeline.repetitionGate(base, _))
    val ngram =
      if (opts.maxTopBigramShare.isEmpty && opts.maxDupTrigramFrac.isEmpty) unigram
      else graft.pipeline.CorpusPipeline.ngramRepetitionGate(
        unigram, opts.maxTopBigramShare, opts.maxDupTrigramFrac)
    opts.minEntropy.fold(ngram)(
      graft.pipeline.CorpusPipeline.entropyGate(ngram, _))
  }

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

    // Step 0 — HEAL the state/store crash window. A previous attempt
    // of this batch may have crashed between the signature-state
    // append and the curated-store append: those docs are in state but
    // their curated rows were never written, and the normal path would
    // anti-join them away forever. The replayed batch carries their
    // full rows, so re-derive the missing append here. The store is
    // scanned (doc_id column only) ONLY when the batch actually holds
    // already-admitted ids — post-crash replay or duplicate delivery —
    // never on the clean path. Idempotent: ids already in the store
    // are skipped, so a crash mid-heal re-heals on the next replay.
    val healed = healCrashWindow(spark, cleaned, storeDir, sigStateDir)

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
    BatchReport(input, afterClean, admitted, healed)
  }

  /** Re-append curated rows for docs of `cleaned` that are admitted in
    * the signature state but absent from the curated store (the
    * state/store crash window). Returns the number of rows healed.
    * O(batch) against the state's id column on every call; the store's
    * id column is read only when already-admitted ids are present. */
  private def healCrashWindow(
      spark: SparkSession,
      cleaned: DataFrame,
      storeDir: String,
      sigStateDir: String): Long = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(sigStateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(sigStateDir))) return 0L
    val stateIds = spark.read.parquet(sigStateDir)
      .select(col("doc").as("doc_id"))
    val replayed = cleaned.join(stateIds, Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val healed =
      try {
        if (replayed.isEmpty) 0L
        else {
          val missing =
            if (!fs.exists(new Path(storeDir))) replayed
            else replayed.join(
              spark.read.parquet(storeDir).select(col("doc_id")),
              Seq("doc_id"), "left_anti")
          // lineage CUT before writing into a path the plan reads —
          // same recacheByPath hazard as the state append
          val rows = missing.drop("n_words", "quality").localCheckpoint(true)
          val n = rows.count()
          if (n > 0)
            rows.write.mode(SaveMode.Append).partitionBy("lang").parquet(storeDir)
          n
        }
      } finally replayed.unpersist()
    healed
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
          .info(s"corpus batch $batchId: in=${r.input} clean=${r.afterClean} admitted=${r.admitted} healed=${r.healed}")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
