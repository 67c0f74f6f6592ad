package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.dedup.LshStore
import graft.operators.{PairGraphStore, PostingsStore}

/** End-to-end streaming RIGHT-TO-FORGET: a file-stream of takedown
  * document ids drives, per micro-batch, (1) the text index's
  * merge-on-read tombstones ([[LshStore.Handle.remove]]) and (2) the
  * similarity graph's edge revocation with every persisted state
  * maintained at affected-region cost
  * ([[StreamingGraphMaintenance.processAllRemove]]: communities,
  * cores, ranks, optional truss) — the deletion twin of the ingest
  * composition (`StreamingNearDupDedup` → `processAll`).
  *
  * Replay safety (foreachBatch is at-least-once): LshStore.remove
  * excludes already-tombstoned ids up front, and the graph batch is
  * the removed ids' INCIDENT edges taken from the PHYSICAL edge rows
  * — not the merge-on-read view — so a replay after a crash anywhere
  * (tombstones landed / some graph states maintained / none) re-derives
  * the SAME edge batch and every maintainer converges (a batch whose
  * ledger already landed finds its present-set empty and its state
  * recomputation a no-op). Deriving from the serve view instead would
  * hand a replay an EMPTY batch and leave half-maintained states
  * stale forever — the composition-level crash-window gotcha
  * (StreamingTakedownSpec drives the windows explicitly).
  */
object StreamingTakedown {

  /** The removed ids' incident edges, from the store's PHYSICAL rows
    * (replay-stable — see the object doc). */
  private[streaming] def incidentEdges(
      graph: PairGraphStore.Handle, ids: DataFrame): DataFrame = {
    val rid = ids.select(col(ids.columns.head).cast("long").as("__rid"))
      .distinct()
    val e = graph.physicalEdges
      .select(col(graph.srcCol), col(graph.dstCol))
    // literal route for a driver-bounded id batch: ONE filter pass —
    // no broadcast builds, no union, and no distinct (the stored pair
    // rows are already unique, and every consumer re-canonicalizes
    // with its own distinct anyway, so the frame's VALUE set — and
    // each maintainer's batch signature — is identical to the
    // semi-join shape below). An unbounded batch keeps the
    // distributed shape.
    val sample = rid.limit(graft.operators.KeyPrune.MaxLiteralKeys + 1).collect()
    if (sample.length <= graft.operators.KeyPrune.MaxLiteralKeys) {
      val lits = sample.map(_.getLong(0))
      return e.filter(col(graph.srcCol).isin(lits.toIndexedSeq: _*) ||
        col(graph.dstCol).isin(lits.toIndexedSeq: _*))
    }
    e.join(broadcast(rid.withColumnRenamed("__rid", graph.srcCol)),
        Seq(graph.srcCol), "left_semi")
      .unionByName(
        e.join(broadcast(rid.withColumnRenamed("__rid", graph.dstCol)),
          Seq(graph.dstCol), "left_semi")
          .select(col(graph.srcCol), col(graph.dstCol)))
      .distinct()
  }

  /** One takedown micro-batch; exposed for direct use and tests.
    * `postings` (optional) extends the composition to the SEARCH
    * index — the same ids leave BM25/conjunction/phrase results
    * ([[PostingsStore.Handle.remove]], itself replay-idempotent).
    *
    * AUTO-COMPACT: under a sustained takedown stream, merge-on-read
    * ledgers grow without bound — every serve pays the anti-join, and
    * the search index's max_tf stays a loose upper bound. After the
    * batch commits, both stores compact when their tombstone ratio
    * exceeds `compactRatio` ([[LshStore.autoCompact]] /
    * [[PostingsStore.autoCompact]] — free probes when no ledger
    * exists; serve results identical before/after by the stores'
    * compact contracts). Ordered LAST: compaction is hygiene, never a
    * correctness dependency, and a crash mid-compact heals at the
    * next open (SwapDir) while the replay re-runs the idempotent
    * removes. Pass `Double.MaxValue` to disable. */
  def process(
      ids: DataFrame,
      lsh: LshStore.Handle,
      graph: PairGraphStore.Handle,
      maxK: Int,
      iterations: Int = 3,
      rounds: Int = 3,
      trussK: Option[Int] = None,
      postings: Option[PostingsStore.Handle] = None,
      compactRatio: Double = 0.25): Unit = {
    if (ids.isEmpty) return
    lsh.remove(ids)
    postings.foreach(_.remove(ids))
    StreamingGraphMaintenance.processAllRemove(
      incidentEdges(graph, ids), graph, maxK, iterations, rounds, trussK)
    LshStore.autoCompact(lsh, compactRatio)
    postings.foreach(PostingsStore.autoCompact(_, compactRatio))
    PairGraphStore.autoCompact(graph, compactRatio)
    ()
  }

  /** File-source drive: watch `inDir` for parquet batches of takedown
    * ids (single column castable to long). */
  def stream(
      spark: SparkSession,
      inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      lsh: LshStore.Handle,
      graph: PairGraphStore.Handle,
      maxK: Int,
      checkpointDir: String,
      iterations: Int = 3,
      rounds: Int = 3,
      trussK: Option[Int] = None,
      postings: Option[PostingsStore.Handle] = None,
      compactRatio: Double = 0.25): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        process(batch, lsh, graph, maxK, iterations, rounds, trussK, postings,
          compactRatio)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
