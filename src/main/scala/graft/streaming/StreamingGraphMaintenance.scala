package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.PairGraphStore

/** Streaming maintenance of a persisted similarity graph: verified
  * near-dup edge batches arrive as files (the shape an upstream
  * delta-dedup pass — `LshStore.nearDupsOfDelta`, the SRP verify —
  * emits for newly-ingested documents), and each micro-batch folds
  * into the [[PairGraphStore]] AND updates its persisted core
  * numbers at delta cost via `appendAndMaintainCores` — the graph
  * analytics state stays current WITHOUT ever re-peeling the grown
  * graph.
  *
  * The foreachBatch pattern (the repo's quarantine/postings-ingest
  * convention): semantics identical to the batch ingest by
  * construction, and replay-safe — `appendAndMaintainCores` dedups
  * the delta against the stored edges and its maintenance traversal
  * tolerates already-present edges, so a batch re-delivered after a
  * crash anywhere in {append, maintain, cores swap} converges to the
  * same state (StreamingGraphMaintenanceSpec drives the crash
  * windows explicitly).
  */
object StreamingGraphMaintenance {

  /** One micro-batch step; exposed for direct use and tests. */
  def process(batch: DataFrame, store: PairGraphStore.Handle, maxK: Int): Unit = {
    if (!batch.isEmpty) { store.appendAndMaintainCores(batch, maxK); () }
  }

  /** FULL-state micro-batch step: fold the delta once and maintain
    * EVERY persisted state — core numbers, community labels, the
    * PageRank iterates, and (when `trussK` is set) the k-truss edge
    * set — at delta cost. The composition is safe BECAUSE each
    * maintainer is replay-idempotent: the first call appends the
    * batch's fresh edges, and each later maintainer finds them
    * already stored (its own replay path) yet still drives its state
    * to the grown graph's fixpoint. A crash between maintainers
    * leaves some states ahead of others; the re-delivered batch
    * re-runs all of them and each converges — the same argument each
    * state's own crash-window spec pins individually. */
  def processAll(
      batch: DataFrame,
      store: PairGraphStore.Handle,
      maxK: Int,
      rounds: Int = 3,
      iterations: Int = 3,
      trussK: Option[Int] = None): Unit = {
    if (batch.isEmpty) return
    store.appendAndMaintainCores(batch, maxK)
    store.appendAndMaintainCommunities(batch, rounds)
    store.appendAndMaintainRanks(batch, iterations)
    trussK.foreach(k => store.appendAndMaintainTruss(batch, k))
    ()
  }

  /** FULL-state REVOCATION step — the deletion twin of [[processAll]]:
    * one micro-batch of revoked pairs tombstones the edge view once
    * and maintains the community labels (affected-component
    * re-propagation), cores (frontier h-index demotion), the PageRank
    * iterates (kept-graph patch recompute), and optionally the
    * k-truss (closure-peel eviction) together; distance states
    * invalidate inside the first revoke and re-derive from the kept
    * view on their next ensure. Communities run FIRST: their
    * maintainer revokes WITHOUT invalidating the labels state it just
    * patched, and the later maintainers' revokes find the batch
    * already tombstoned (present set empty) so they touch no state
    * dirs. Composition is safe by the same replay argument as
    * insertions: later maintainers see the batch already tombstoned
    * (their own replay path) and still drive their states to the kept
    * graph's fixpoint; a crash between maintainers re-runs all of
    * them and each converges. */
  def processAllRemove(
      batch: DataFrame,
      store: PairGraphStore.Handle,
      maxK: Int,
      iterations: Int = 3,
      rounds: Int = 3,
      trussK: Option[Int] = None): Unit = {
    // materialize ONCE (before the emptiness probe, which would
    // otherwise execute the batch plan a second time): each maintainer
    // canonicalizes + signatures the batch itself, so an expensive
    // batch plan (StreamingTakedown's incident-edge derivation: two
    // semi-joins + distinct over the physical edge rows) would
    // otherwise re-execute per maintainer — 3-4x the derivation cost
    // on every replayed takedown batch
    val b = graft.operators.Partitioning.checkpointCompact(batch)
    if (b.isEmpty) return
    // all-states replay short-circuit: one distinct+sig job instead of
    // four canonicalize+signature+ensure passes when every maintainer's
    // marker for this batch is already present (the steady replay of
    // an idempotent takedown stream)
    if (store.allRemovalMarkersPresent(b, trussK.isDefined)) return
    store.removeEdgesAndMaintainCommunities(b, rounds)
    store.removeEdgesAndMaintainCores(b, maxK)
    store.removeEdgesAndMaintainRanks(b, iterations)
    trussK.foreach(k => store.removeEdgesAndMaintainTruss(b, k))
    ()
  }

  /** File-source drive of [[processAllRemove]] — revocation batches
    * (store srcCol/dstCol columns) keep cohesion and centrality
    * current as edges are taken down. */
  def streamAllRemove(
      spark: SparkSession,
      inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      store: PairGraphStore.Handle,
      maxK: Int,
      iterations: Int,
      checkpointDir: String,
      rounds: Int = 3,
      trussK: Option[Int] = None): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processAllRemove(batch, store, maxK, iterations, rounds, trussK)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** File-source drive: watch `inDir` for parquet batches of verified
    * canonical edges (store's srcCol/dstCol/weight columns), maintain
    * the store per batch. */
  def stream(
      spark: SparkSession,
      inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      store: PairGraphStore.Handle,
      maxK: Int,
      checkpointDir: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        process(batch, store, maxK)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** File-source drive of [[processAll]] — the one-stream shape that
    * keeps cohesion, communities, and centrality current together. */
  def streamAll(
      spark: SparkSession,
      inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      store: PairGraphStore.Handle,
      maxK: Int,
      rounds: Int,
      iterations: Int,
      checkpointDir: String,
      trussK: Option[Int] = None): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processAll(batch, store, maxK, rounds, iterations, trussK)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
