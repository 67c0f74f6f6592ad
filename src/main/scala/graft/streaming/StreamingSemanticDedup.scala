package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ann.Ann
import graft.dedup.SemanticDedup

/** Streaming SEMANTIC dedup — the embedding twin of
  * `StreamingNearDupDedup`: admit embedding-bearing documents while
  * rejecting semantic duplicates (cosine > threshold) of anything
  * already admitted, with `SemanticDedup.keepers` deciding survivors.
  *
  * State = (doc, embedding) of every ADMITTED document — the keeper
  * set. Per micro-batch:
  *   1. replay-filter the incoming ids against state (at-least-once
  *      delivery re-delivers admitted ids; they are ignored),
  *   2. SRP-LSH pair graph over state ∪ incoming
  *      (`Ann.lshNearDupPairs` — banded buckets, exact-cosine verify,
  *      id-only shuffles; state–state pairs cannot exist because state
  *      is mutually non-duplicate BY construction at this threshold),
  *   3. `SemanticDedup.keepers` over the union: a component is
  *      CONTAMINATED when it already holds an admitted doc — every
  *      incoming member of such a component is a duplicate of admitted
  *      history and drops; in a fresh (all-incoming) component exactly
  *      the keeper survives; singletons survive,
  *   4. APPEND the admitted (doc, embedding) rows to the state parquet
  *      (O(batch) I/O — history is never rewritten).
  *
  * Per-batch cost: the union re-signs state embeddings through the SRP
  * kernels — one codegen pass over history, id-only shuffles, no
  * all-pairs step anywhere. The stored-signature refinement
  * (`StreamingNearDupDedup` keeps minhash signatures in state for
  * exactly this reason) applies here verbatim if history re-signing
  * ever dominates; the admission semantics would be unchanged.
  */
object StreamingSemanticDedup {

  /** One micro-batch step; exposed for direct (batch) use and tests.
    * `batch` carries (doc_id, embedding); `onAdmitted` runs with this
    * batch's newly admitted ids (one `doc` column) — the hook
    * downstream sinks use to write admitted rows without re-deriving
    * them from cumulative state. */
  def process(
      spark: SparkSession,
      batch: DataFrame, // (doc_id, embedding)
      stateDir: String,
      threshold: Double,
      dim: Int = 64,
      nBits: Int = 8,
      tables: Int = 8,
      maxBucketSize: Int = 10000,
      onAdmitted: DataFrame => Unit = _ => ()): Unit = {
    val fs = new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.operators.SwapDir.heal(fs, new Path(stateDir))
    val hasState = fs.exists(new Path(stateDir))
    // within-batch id dedup FIRST: an at-least-once source can deliver
    // the same doc_id twice inside one drain, and the state anti-join
    // below only screens against PRIOR state — without this both
    // copies would be admitted and appended, permanently breaking the
    // one-row-per-admitted-doc state invariant
    val rawIncoming = batch.select(col("doc_id").as("doc"), col("embedding"))
      .dropDuplicates("doc")
    val state =
      if (hasState) spark.read.parquet(stateDir)
      else rawIncoming.limit(0)

    // replay idempotence: an already-admitted id is not re-processed
    val incoming = rawIncoming
      .join(state.select(col("doc")), Seq("doc"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val union = state.unionByName(incoming)
    val (rawPairs, releasePairs) = Ann.lshNearDupPairsReleasable(
      union, "doc", "embedding",
      threshold = threshold, nBits = nBits, tables = tables, dim = dim,
      maxBucketSize = maxBucketSize)
    val pairs = rawPairs.select(col("vec_a").as("va"), col("vec_b").as("vb"))

    // keepers over the union: keeper = component minimum (or self for
    // singletons). A component holding ANY admitted doc is history —
    // all its incoming members drop, even one with an id below every
    // admitted member's (kept=true would falsely admit it otherwise).
    val keep = SemanticDedup.keepers(union, "doc", pairs, "va", "vb")
    val contaminated = keep
      .join(state.select(col("doc")), Seq("doc"), "left_semi")
      .select(col("keeper")).distinct()
      // usually duplicate-GROUP sized, and read by one anti-join below.
      // NO forced broadcast: under dup-heavy input (re-ingesting an
      // already-curated corpus) this approaches batch cardinality, and
      // a broadcast hint would collect it to the driver regardless of
      // size — the planner/AQE broadcasts it when it actually fits
      .localCheckpoint(true)
    val admittedIds = keep.filter(col("kept"))
      .join(contaminated, Seq("keeper"), "left_anti")
      .select(col("doc"))

    // SNAPSHOT with lineage cut before appending into a path the plan
    // reads (same recacheByPath hazard as StreamingNearDupDedup)
    val admitted = incoming.join(admittedIds, Seq("doc"), "left_semi")
      .localCheckpoint(true)
    // everything derived from the pairs is materialized now — release
    // the postings cache, or each drain leaks one cached copy of the
    // ever-growing history's signatures
    releasePairs()
    admitted.write.mode(SaveMode.Append).parquet(stateDir)
    onAdmitted(admitted.select(col("doc")))
    incoming.unpersist()
    ()
  }

  /** Compact the append-only keeper state (small-files hygiene);
    * crash-safe via the same staged SwapDir publish as
    * `StreamingNearDupDedup.compactState`. */
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

  /** Admit an embedding stream (parquet drop dir) into `stateDir`.
    * All of `process`'s knobs pass through — recall tuning (nBits /
    * tables) is corpus-dependent, and `onAdmitted` is how downstream
    * sinks consume each drain's admitted ids. */
  def start(
      spark: SparkSession,
      streamDir: String,
      stateDir: String,
      checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType,
      threshold: Double = 0.9,
      dim: Int = 64,
      nBits: Int = 8,
      tables: Int = 8,
      maxBucketSize: Int = 10000,
      onAdmitted: DataFrame => Unit = _ => ()): StreamingQuery =
    spark.readStream.schema(schema).parquet(streamDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        process(spark, batch, stateDir, threshold, dim, nBits, tables,
          maxBucketSize, onAdmitted)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
