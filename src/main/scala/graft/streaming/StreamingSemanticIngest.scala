package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ann.SrpStore
import graft.operators.PairGraphStore

/** End-to-end streaming SEMANTIC ingestion: micro-batches of new
  * embeddings arrive as files, and per batch the pipeline
  *   1. near-dups the delta against the grown corpus via the
  *      persisted SRP signature index ([[SrpStore.Handle.nearDupsOfDelta]]
  *      — delta signed fresh, corpus read as signature rows, vectors
  *      fetched candidate-pruned for the verify),
  *   2. folds the verified pairs into the [[PairGraphStore]] and
  *      maintains its persisted core numbers at delta cost
  *      (`appendAndMaintainCores`),
  *   3. folds the delta vectors into the SRP index (`append`),
  * so BOTH graph state (edges + cores) and dedup state (signatures +
  * vectors) stay current without any full-corpus pass — the 100 TB
  * continuous-ingestion shape for semantic dedup / graph analytics.
  *
  * Replay safety end to end (foreachBatch redelivery after a crash at
  * ANY point): the batch is first restricted to ids the SRP store has
  * not absorbed (a replay after step 3 is a no-op); a replay after
  * step 2 recomputes the same pairs (the store hasn't absorbed the
  * delta yet, signatures are seeded-deterministic) and
  * `appendAndMaintainCores` dedups edges and tolerates stale cores;
  * a crash inside step 3's two writes is healed by SrpStore.append's
  * own at-least-once-postings / exactly-once-vectors ordering.
  * StreamingSemanticIngestSpec drains the happy path and drives the
  * crash windows explicitly.
  */
object StreamingSemanticIngest {

  /** One micro-batch step; exposed for direct use and tests. */
  def process(
      batch: DataFrame, // (idCol, vecCol) rows, SRP store's columns
      srp: SrpStore.Handle,
      graph: PairGraphStore.Handle,
      maxK: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val fresh = batch
      .join(srp.vectors.select(col("id").as(srp.idCol)), Seq(srp.idCol), "left_anti")
      .localCheckpoint()
    if (!fresh.isEmpty) {
      val pairs = srp.nearDupsOfDelta(fresh).localCheckpoint()
      if (!pairs.isEmpty) { graph.appendAndMaintainCores(pairs, maxK); () }
      srp.append(fresh)
      ()
    }
  }

  /** File-source drive: watch `inDir` for parquet batches of new
    * (id, vector) rows, ingest each through [[process]]. */
  def stream(
      spark: SparkSession,
      inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      srp: SrpStore.Handle,
      graph: PairGraphStore.Handle,
      maxK: Int,
      checkpointDir: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        process(batch, srp, graph, maxK)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
