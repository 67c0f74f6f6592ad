package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{CoPresenceStore, PairGraphStore}

/** Events stream → behavioral community graph, end to end: each
  * micro-batch of raw events folds into the [[CoPresenceStore]] pair
  * counts, and the pairs that CROSS the edge threshold with that batch
  * drive [[PairGraphStore.Handle.appendAndMaintainCommunities]] — the
  * persisted LPA labels stay current with the event stream at
  * delta-neighborhood cost, and the quadratic windowed self-join only
  * ever runs over one batch's windows. This is the streaming form of
  * the q188/q188b pipeline (same generator, same LPA) under the
  * window-alignment contract documented on [[CoPresenceStore]].
  *
  * Exactly-once composition: the counts store's batch ledger commits
  * AFTER the community maintenance inside [[CoPresenceStore.absorbBatch]]
  * (maintenance is replay-tolerant, the ledger is not — see the
  * ordering argument there), so any crash/replay window converges to
  * the state of a single batch pass
  * (StreamingEventsGraphSpec drives the windows explicitly).
  */
object StreamingEventsGraph {

  /** One micro-batch step; exposed for direct use and tests. The
    * graph store materializes WITH the first crossing batch (lazy
    * bootstrap — `ensure` builds from it, later batches open) so no
    * empty-graph state ever persists; on the build path the following
    * maintain dedups the batch to a no-op and persists the labels,
    * which is also exactly the replay path after a build-then-crash
    * window. */
  def process(
      events: DataFrame,
      batchId: Long,
      countsPath: String,
      graphPath: String,
      actorCol: String = "user_id",
      tsCol: String = "ts",
      rounds: Int = 3): Unit = {
    val spark = events.sparkSession
    CoPresenceStore.absorbBatch(
      spark, events, actorCol, tsCol, countsPath, batchId) { crossed =>
      if (!crossed.isEmpty) {
        val g = PairGraphStore.ensure(
          crossed.select(col("ua"), col("ub")),
          "ua", "ub", None, spark, graphPath)
        g.appendAndMaintainCommunities(
          crossed.select(col("ua"), col("ub")), rounds)
        ()
      }
    }
    // revocation-ledger hygiene on the INGEST path too: a mixed
    // workload interleaves absorbs between takedowns, and the ledger
    // a takedown left behind should not have to wait for the next
    // takedown batch to compact away (free existence probe otherwise)
    if (PairGraphStore.exists(spark, graphPath))
      PairGraphStore.autoCompact(PairGraphStore.open(spark, graphPath))
    ()
  }

  /** One ACTOR-takedown micro-batch — the deletion direction: drop
    * the removed users' co-presence history from the counts store
    * ([[CoPresenceStore.removeActors]]) and revoke their at-threshold
    * edges from the community graph at affected-component cost. When
    * the store carries guard-dropped hot windows, pass the absorbed
    * `events` source: the ledgered windows are RECOUNTED from it
    * (ledger-bounded cost), and pairs the recovery pushes ACROSS the
    * edge threshold are appended to the graph — removal first, then
    * the append, both replay-tolerant. Idempotent without a ledger: a
    * replayed takedown finds no incident count rows and an already-
    * reduced hot set, so both maintenance frames come back empty; a
    * crash between the graph maintenance and the counts swap replays
    * to the same state (the absorbBatch ordering argument). A graph
    * store that never materialized bootstraps lazily from the first
    * recovered crossing set (the [[process]] shape) — at high event
    * density every window can be hot until a takedown thins them, so
    * the FIRST graph edges can legitimately arrive through recovery. */
  def processTakedown(
      actors: DataFrame,
      countsPath: String,
      graphPath: String,
      rounds: Int = 3,
      events: Option[DataFrame] = None,
      actorCol: String = "user_id",
      tsCol: String = "ts"): Unit = {
    val spark = actors.sparkSession
    if (actors.isEmpty) return
    CoPresenceStore.removeActors(spark, actors, countsPath, events,
      actorCol, tsCol) { (gone, crossed) =>
      if (PairGraphStore.exists(spark, graphPath) && !gone.isEmpty) {
        PairGraphStore.open(spark, graphPath)
          .removeEdgesAndMaintainCommunities(
            gone.select(col("ua"), col("ub")), rounds)
        ()
      }
      if (!crossed.isEmpty) {
        val g = PairGraphStore.ensure(
          crossed.select(col("ua"), col("ub")),
          "ua", "ub", None, spark, graphPath)
        g.appendAndMaintainCommunities(
          crossed.select(col("ua"), col("ub")), rounds)
        ()
      }
    }
    // revocation-ledger hygiene (the StreamingTakedown policy): under
    // a sustained actor-takedown stream the graph's merge-on-read
    // ledger grows without bound; past the ratio the store compacts
    // with its maintained states riding the swap
    if (PairGraphStore.exists(spark, graphPath))
      PairGraphStore.autoCompact(PairGraphStore.open(spark, graphPath))
    ()
  }

  /** File-source drive of [[processTakedown]]: watch `inDir` for
    * parquet batches of takedown actor ids. `events` (the absorbed
    * event history, a batch frame) enables hot-window recovery. */
  def streamTakedown(
      spark: SparkSession,
      inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      countsPath: String,
      graphPath: String,
      checkpointDir: String,
      rounds: Int = 3,
      events: Option[DataFrame] = None): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processTakedown(batch, countsPath, graphPath, rounds, events)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** File-source drive: watch `inDir` for parquet batches of raw
    * events (window-aligned by the ingest layout), keep counts and
    * community labels current per batch. */
  def stream(
      spark: SparkSession,
      inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      countsPath: String,
      graphPath: String,
      checkpointDir: String,
      actorCol: String = "user_id",
      tsCol: String = "ts",
      rounds: Int = 3): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        process(batch, batchId, countsPath, graphPath, actorCol, tsCol, rounds)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
