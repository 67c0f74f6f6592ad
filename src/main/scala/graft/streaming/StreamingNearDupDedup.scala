package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.dedup.{MinHashLSH, ShingleHashes}
import graft.functions.TextFunctions

/** Streaming near-duplicate dedup: admit a document stream while
  * rejecting near-duplicates of anything already admitted — the
  * continuous-ingest form of corpus dedup.
  *
  * State = (doc, shingle hashes, minhash signature) of every ADMITTED
  * document: signature bytes, never text. Per micro-batch:
  *   1. shingle+sign the incoming docs (kernels, spread, cached),
  *   2. band incoming and state signatures, bucket-join for candidate
  *      pairs — incoming vs state, and incoming vs earlier-id incoming,
  *   3. exact-Jaccard verify candidates on the stored shingle sets,
  *   4. admit non-duplicates; APPEND only their rows to the state
  *      parquet (O(batch) I/O — history is never rewritten).
  *
  * Cost per batch is O(batch) kernels plus bucket micro-joins — the
  * admitted history is touched only through its banded signatures, and
  * only in colliding buckets. Admission rule: a doc is dropped iff it
  * near-dups ANY admitted doc (regardless of id order) or any
  * smaller-id doc of its own batch — deterministic, order-independent
  * within the batch, and slightly stricter than sequential-greedy (it
  * drops whole duplicate chains, the component-style semantics).
  * Replayed doc ids (at-least-once delivery, checkpoint retry) are
  * ignored rather than re-admitted.
  */
object StreamingNearDupDedup {

  private val B = 32
  private val H = 128
  private val MaxBucket = 1000

  private def shingleSign(docs: DataFrame): DataFrame =
    graft.operators.Partitioning.spread(docs)
      .select(col("doc"),
        ShingleHashes.of(TextFunctions.wsTokens(lower(col("text"))), 3).as("shs"))
      .select(col("doc"), col("shs"),
        MinHashLSH.signatureOfHashes(col("shs"), H).as("sig"))

  // shared banding formula + skew guard from the batch path
  private def banded(sigs: DataFrame): DataFrame =
    MinHashLSH.banded(sigs.select(col("doc"), col("sig")), B, H / B)

  /** One micro-batch step; exposed for direct (batch) use and tests.
    * `onAdmitted` runs with THIS batch's newly admitted doc ids (one
    * `doc` column) while the batch's frames are still cached — the
    * hook downstream sinks (e.g. StreamingCorpusPipeline's curated
    * store) use to write the admitted rows without re-deriving them
    * from the cumulative state. */
  def process(
      spark: SparkSession,
      batch: DataFrame, // (doc_id, text)
      stateDir: String,
      minJaccard: Double,
      onAdmitted: DataFrame => Unit = _ => ()): Unit = {
    val fs = new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // restore state from a compaction interrupted mid-swap, if any
    graft.operators.SwapDir.heal(fs, new Path(stateDir))
    val hasState = fs.exists(new Path(stateDir))
    val rawIncoming = batch.select(col("doc_id").as("doc"), col("text"))
    val state =
      if (hasState) spark.read.parquet(stateDir)
      else shingleSign(rawIncoming).limit(0)

    // replay idempotence: a doc id already admitted (checkpoint retry,
    // at-least-once source) is not re-processed or re-appended
    val incoming = shingleSign(
        rawIncoming.join(state.select(col("doc")), Seq("doc"), "left_anti"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // candidates: an incoming doc vs ANY admitted state doc, and vs
    // smaller-id docs of its own batch — with the batch path's
    // oversized-bucket guard (one degenerate band value shared by a
    // growing slice of history would otherwise make every future
    // micro-batch quadratic in that bucket)
    // The drop set is computed ONCE over state∪incoming and
    // anti-joined against BOTH join sides: per-side sets
    // (incoming-only on one side, union on the other) disagree, and
    // the effective drop becomes their union — extra recall loss no
    // single threshold describes. localCheckpoint(eager) because the
    // tiny set feeds two broadcast anti-joins — without it each join
    // re-runs the count over the full banded union.
    val bState = banded(state)
      .select(col("doc").as("other"), col("band"), col("bucket"), lit(true).as("in_state"))
    val bNew = banded(incoming)
      .select(col("doc").as("other"), col("band"), col("bucket"), lit(false).as("in_state"))
    val allBanded = bState.unionByName(bNew)
    val oversized =
      MinHashLSH.oversizedBuckets(allBanded, Seq("band", "bucket"), MaxBucket)
        .localCheckpoint(true)
    val a = banded(incoming)
      .select(col("doc").as("cand"), col("band"), col("bucket"))
      .join(broadcast(oversized), Seq("band", "bucket"), "left_anti")
    val cand = a.join(
        allBanded.join(broadcast(oversized), Seq("band", "bucket"), "left_anti")
          .select(col("other"), col("band"), col("bucket"), col("in_state")),
        Seq("band", "bucket"))
      .filter(col("in_state") || col("other") < col("cand"))
      .select(col("cand"), col("other")).distinct()

    val shsAll = state.unionByName(incoming).select(col("doc"), col("shs"))
    val verified = cand
      .join(shsAll.withColumnRenamed("doc", "cand").withColumnRenamed("shs", "sh_a"), Seq("cand"))
      .join(shsAll.withColumnRenamed("doc", "other").withColumnRenamed("shs", "sh_b"), Seq("other"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("j", col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("j") >= minJaccard)
      .select(col("cand").as("doc")).distinct()

    // state is append-only: write ONLY the admitted rows (O(batch)
    // I/O; rewriting the whole history each batch would grow without
    // bound). Parquet append commits through a _temporary dir, so a
    // crash leaves no visible partial files.
    // SNAPSHOT before the state append, with lineage CUT
    // (localCheckpoint, like ConnectedComponents): the plan reads
    // stateDir, and appending there both (a) would make a lazy
    // re-evaluation see the batch's own rows in state and classify
    // every admitted doc as a duplicate of itself, and (b) invalidates
    // any cache over that path (recacheByPath RECOMPUTES a persisted
    // frame post-append — persist alone does not freeze the answer).
    val admitted = incoming.join(verified, Seq("doc"), "left_anti")
      .localCheckpoint(true)
    admitted.write.mode(SaveMode.Append).parquet(stateDir)
    onAdmitted(admitted.select(col("doc")))
    incoming.unpersist()
    ()
  }

  /** Compact the append-only signature state into few large files.
    *
    * Every micro-batch appends O(1) small parquet files, so after N
    * drains the state dir holds O(N) files and every batch's state
    * read pays O(N) open/footer costs — the classic small-files
    * problem. Run this OFFLINE (no drain in flight): rewrites the
    * state coalesced into `targetFiles` files in a staging dir, then
    * SwapDir-swaps it into place — a crash mid-compaction leaves the
    * old state intact (the read path heals interrupted swaps).
    * Content is unchanged, so admission semantics are unaffected.
    */
  def compactState(spark: SparkSession, stateDir: String, targetFiles: Int = 8): Unit = {
    val dst = new Path(stateDir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.operators.SwapDir.heal(fs, dst)
    if (!fs.exists(dst)) return
    val staging = new Path(dst.getParent, "." + dst.getName + ".compacting")
    if (fs.exists(staging)) fs.delete(staging, true)
    spark.read.parquet(stateDir)
      .coalesce(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    graft.operators.SwapDir.swap(fs, staging, dst)
  }

  def start(
      spark: SparkSession,
      streamDir: String,
      stateDir: String,
      checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType,
      minJaccard: Double = 0.8): StreamingQuery =
    spark.readStream.schema(schema).parquet(streamDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        process(spark, batch, stateDir, minJaccard)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
