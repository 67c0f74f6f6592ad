package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.dedup.LshStore
import graft.operators.{PairGraphStore, PostingsStore}

/** The UNIFIED right-to-forget stream: one takedown feed carrying
  * `(kind, id)` rows fans out per micro-batch to every store in the
  * engine —
  *   - `kind = "doc"` → the text dedup index (LSH tombstones), the
  *     search index (exactly-once df/cf decrements), the similarity
  *     graph (edge revocation with every persisted state maintained
  *     at affected-region cost), and any caller-supplied doc-keyed
  *     forgetters — monoid stores (vocabulary, calibration, samples;
  *     each exactly-once via its own removal ledger and the stream's
  *     monotone batch id) and vector indexes (SrpStore / IvfStore /
  *     GraphAnn removes are idempotent tombstone ledgers, so they
  *     ride `extra` ignoring the batch id; StreamingForgetSpec
  *     drives the GraphAnn leg through the unified feed);
  *   - `kind = "actor"` → the behavioral layer: co-presence counts
  *     (physical incident delete + hot-window recovery when the
  *     events source is supplied) and the community graph.
  *
  * One feed instead of N: a production deletion request usually names
  * BOTH content and accounts, and fanning out from a single ordered
  * stream gives every store the same batch boundary — no cross-store
  * window where a replay has forgotten a user's documents but not
  * their behavior.
  *
  * Replay safety (foreachBatch is at-least-once): each leg is
  * independently replay-tolerant — LshStore/PostingsStore removes
  * exclude already-tombstoned/ledgered ids, graph maintenance
  * re-derives its batch from PHYSICAL rows ([[StreamingTakedown]]'s
  * argument), the co-presence takedown finds no incident rows and an
  * already-reduced hot set ([[StreamingEventsGraph]]), and the extra
  * forgetters receive the stream's monotone batch id for their
  * exactly-once ledgers. A crash between ANY two legs therefore
  * replays the whole (kind, id) batch and every leg converges
  * (StreamingForgetSpec drives the windows explicitly). Auto-compact
  * hygiene runs last, per the [[StreamingTakedown.process]] policy.
  */
object StreamingForget {

  /** Doc-side fan-out targets. `extra` forgetters receive (removed
    * doc ids, the stream's batch id) — wire monoid stores here, e.g.
    * `(ids, bid) => VocabStore.removeBatch(spark, postingsOf(ids),
    * "doc_id", "w", path, bid)`. Each must be exactly-once or
    * idempotent under redelivery. */
  final case class DocTargets(
      lsh: LshStore.Handle,
      graph: PairGraphStore.Handle,
      maxK: Int,
      iterations: Int = 3,
      rounds: Int = 3,
      trussK: Option[Int] = None,
      postings: Option[PostingsStore.Handle] = None,
      compactRatio: Double = 0.25,
      extra: Seq[(DataFrame, Long) => Unit] = Nil)

  /** Actor-side fan-out targets ([[StreamingEventsGraph]]'s layer).
    * `events` enables hot-window recovery on the counts store. */
  final case class ActorTargets(
      countsPath: String,
      graphPath: String,
      events: Option[DataFrame] = None,
      rounds: Int = 3,
      actorCol: String = "user_id",
      tsCol: String = "ts")

  /** One unified micro-batch; exposed for direct use and tests.
    * Unknown kinds fail loud — silently dropping a takedown row is
    * the one wrong answer a right-to-forget pipeline can give. */
  def process(
      batch: DataFrame,
      batchId: Long,
      doc: DocTargets,
      actor: ActorTargets): Unit = {
    if (batch.isEmpty) return
    val canon = batch.select(
      lower(trim(col(batch.columns.head))).as("kind"),
      col(batch.columns(1)).cast("long").as("id"))
      .localCheckpoint()
    val unknown = canon.filter(!col("kind").isin("doc", "actor"))
    require(unknown.isEmpty,
      "StreamingForget: batch contains rows of unknown kind " +
        s"${unknown.select(col("kind")).distinct().collect().mkString(",")} " +
        "- a takedown row must never be dropped silently")
    val docs = canon.filter(col("kind") === "doc").select(col("id"))
      .localCheckpoint()
    val actors = canon.filter(col("kind") === "actor").select(col("id"))
      .localCheckpoint()
    if (!docs.isEmpty) {
      StreamingTakedown.process(docs, doc.lsh, doc.graph, doc.maxK,
        doc.iterations, doc.rounds, doc.trussK, doc.postings,
        doc.compactRatio)
      doc.extra.foreach(f => f(docs, batchId))
    }
    if (!actors.isEmpty)
      StreamingEventsGraph.processTakedown(actors, actor.countsPath,
        actor.graphPath, actor.rounds, actor.events, actor.actorCol,
        actor.tsCol)
  }

  /** File-source drive: watch `inDir` for parquet batches of
    * (kind STRING, id LONG) takedown rows. */
  def stream(
      spark: SparkSession,
      inDir: String,
      checkpointDir: String,
      doc: DocTargets,
      actor: ActorTargets): StreamingQuery =
    spark.readStream.schema("kind STRING, id LONG").parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        process(batch, batchId, doc, actor)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
