package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.SpanDedup

/** Streaming repeated-SPAN dedup — the incremental twin of
  * `SpanDedup` (q138), completing the streaming curation family
  * (near-dup, semantic, now substring-level): detect spans of an
  * incoming document that repeat anything seen EARLIER in the stream
  * or elsewhere in the same micro-batch.
  *
  * State = the DISTINCT window hashes of everything ingested — one
  * long per distinct `windowTokens`-gram, the streaming analogue of
  * the batch route's duplicated-hash set. Linear in corpus vocabulary
  * of n-grams; at real scale this lives as a bucketed store exactly
  * like `PostingsStore` (hash-keyed directory layout) — here it is an
  * append-only parquet of longs with the same compaction hygiene as
  * the other streaming states.
  *
  * Per micro-batch:
  *   1. replay-filter the incoming ids against the processed-ids
  *      state (`<stateDir>/ids`) — an at-least-once source that
  *      re-delivers a document must not make it "repeat itself"
  *      against the hashes its first delivery planted;
  *   2. window-hash the remaining docs (same kernel as batch —
  *      `SpanDedup.windowHashes`);
  *   3. marked = windows hitting the hash STATE
  *      (`<stateDir>/hashes`, semi-join) ∪ windows duplicated WITHIN
  *      the batch (count > 1 — identical to the batch detection
  *      applied to the batch alone);
  *   4. merge marks into maximal spans (`SpanDedup.mergeMarked`,
  *      the shared gaps-and-islands) and hand them to `onSpans`;
  *   5. append the batch's new ids and NEW distinct hashes to their
  *      states (hash append anti-joins first: the hash state stays
  *      one row per distinct hash).
  *
  * Streaming asymmetry (inherent, same as the near-dup/semantic
  * twins): the FIRST occurrence of a window streams through clean —
  * only later occurrences see it in state. A one-drain stream over a
  * whole corpus therefore equals the batch detection exactly (step 2's
  * within-batch arm IS the batch rule); split across drains, spans
  * detect against history from the second drain on.
  */
object StreamingSpanDedup {

  /** One micro-batch step; exposed for direct use and specs.
    * `batch` carries (idCol, textCol); `onSpans` receives this batch's
    * (idCol, span_start, span_end, n_windows) detections. */
  def process(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      stateDir: String,
      windowTokens: Int = 8,
      onSpans: DataFrame => Unit = _ => ()): Unit = {
    val hashDir = s"$stateDir/hashes"
    val idsDir = s"$stateDir/ids"
    val fs = new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(hashDir, idsDir).foreach(d => graft.operators.SwapDir.heal(fs, new Path(d)))

    // within-batch id dedup + replay filter against processed ids:
    // a re-delivered doc must not "repeat itself" against the hashes
    // its first delivery planted
    val distinctDocs = batch.dropDuplicates(idCol)
    val seenIds =
      if (fs.exists(new Path(idsDir))) spark.read.parquet(idsDir)
      else distinctDocs.select(col(idCol)).limit(0)
    val incoming = distinctDocs
      .join(seenIds, Seq(idCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val wins = SpanDedup.windowHashes(incoming, idCol, textCol, windowTokens)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val state =
        if (fs.exists(new Path(hashDir))) spark.read.parquet(hashDir)
        else wins.select(col("whash")).limit(0)

      val dupInBatch = wins.groupBy(col("whash"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1)
        .select(col("whash"))
      val marked = wins
        .join(state.unionByName(dupInBatch).distinct(), Seq("whash"), "left_semi")
        .select(col(idCol), col("pos"))

      // SNAPSHOT with lineage cut before state is appended below — the
      // span frame must not re-read a state dir its own plan feeds
      // (same recacheByPath hazard as the other streaming states)
      val spans = SpanDedup.mergeMarked(marked, idCol, windowTokens)
        .localCheckpoint(true)
      onSpans(spans)

      // hash state stays one row per DISTINCT hash ever seen
      wins.select(col("whash")).distinct()
        .join(state, Seq("whash"), "left_anti")
        .write.mode(SaveMode.Append).parquet(hashDir)
      incoming.select(col(idCol))
        .write.mode(SaveMode.Append).parquet(idsDir)
    } finally { wins.unpersist(); incoming.unpersist() }
    ()
  }

  /** Compact both append-only states (small-files hygiene);
    * crash-safe staged publish, same as the other streaming states. */
  def compactState(spark: SparkSession, stateDir: String, targetFiles: Int = 8): Unit =
    Seq(s"$stateDir/hashes", s"$stateDir/ids").foreach { d =>
      val dst = new Path(d)
      val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.operators.SwapDir.heal(fs, dst)
      if (fs.exists(dst)) {
        val staging = new Path(dst.getParent, "." + dst.getName + ".compacting")
        if (fs.exists(staging)) fs.delete(staging, true)
        spark.read.parquet(d)
          .distinct()
          .coalesce(targetFiles)
          .write.mode(SaveMode.Overwrite).parquet(staging.toString)
        graft.operators.SwapDir.swap(fs, staging, dst)
      }
    }

  /** Watch a parquet drop dir of documents; per drain, emit span
    * detections via `onSpans` and fold the batch's windows into
    * state. */
  def start(
      spark: SparkSession,
      streamDir: String,
      stateDir: String,
      checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType,
      idCol: String = "doc_id",
      textCol: String = "text",
      windowTokens: Int = 8,
      onSpans: DataFrame => Unit = _ => ()): StreamingQuery =
    spark.readStream.schema(schema).parquet(streamDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        process(spark, batch, idCol, textCol, stateDir, windowTokens, onSpans)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
