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
    * the one wrong answer a right-to-forget pipeline can give.
    *
    * ALL-STORES-APPLIED marker (the [[PairGraphStore]] wave-6 idiom,
    * one level up): after every leg — including auto-compacts — a
    * single marker file records (batch signature, target parameters,
    * one filesystem fingerprint per store dir). A redelivered batch
    * whose marker matches ALL of those skips the entire fan-out: the
    * fingerprints prove the stores are byte-for-byte in the
    * post-application state of THIS batch under THESE parameters, and
    * re-applying an idempotent removal to its own result is a no-op
    * (including the compact-ratio probes — identical state yields the
    * identical ratio decision the marker-write run already took).
    * Crash windows: the marker is written LAST, so a crash anywhere in
    * the fan-out leaves it absent/stale and the replay runs every leg
    * (each independently replay-tolerant — the original argument,
    * unchanged); a store mutated by ANY other writer after the marker
    * (ingest, direct remove, external compact) changes its fingerprint
    * and the replay runs in full. The gate only arms with no `extra`
    * forgetters (their state is caller-owned — nothing to fingerprint)
    * and assumes `actor.events` is the stable absorbed history the
    * replay contract already requires. */
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
    val markerSig = if (doc.extra.isEmpty) batchSig(canon, doc, actor) else None
    if (markerSig.exists(s => markerMatches(canon.sparkSession, doc, actor, s)))
      return
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
    markerSig.foreach(s => writeMarker(canon.sparkSession, doc, actor, s))
  }

  /** Marker file name — lives INSIDE the LSH store dir so a rebuilt/
    * deleted text index takes the composition marker with it (the
    * other stores are covered by content fingerprints). Excluded from
    * the fingerprint walk: the marker must not fingerprint itself. */
  private val MarkerName = "_forget_applied"

  /** Order-independent batch identity + the parameters that shape the
    * fan-out: the wave-6 bit_xor(xxhash64) batch signature over the
    * canonical (kind, id) rows (one agg job over the checkpointed
    * batch), concatenated with every target parameter whose change
    * would change a maintainer's fixpoint. None for an aliasing-free
    * empty signature (the callers return on empty batches first). */
  private def batchSig(canon: DataFrame, doc: DocTargets,
      actor: ActorTargets): Option[String] = {
    val r = canon.agg(expr("bit_xor(xxhash64(kind, id))")).head()
    if (r.isNullAt(0)) None
    else Some(java.lang.Long.toHexString(r.getLong(0)) +
      s"|maxK=${doc.maxK},it=${doc.iterations},r=${doc.rounds}" +
      s",truss=${doc.trussK},cr=${doc.compactRatio}" +
      s",ps=${doc.postings.isDefined}" +
      s",ar=${actor.rounds},ac=${actor.actorCol},tc=${actor.tsCol}" +
      s",ev=${actor.events.isDefined}")
  }

  /** Every store dir the fan-out can touch. */
  private def storeDirs(doc: DocTargets, actor: ActorTargets): Seq[String] =
    Seq(doc.lsh.path, doc.graph.path) ++ doc.postings.map(_.path) ++
      Seq(actor.countsPath, actor.graphPath)

  /** Driver-only filesystem fingerprint of a store dir: every file's
    * (path, length, mtime), recursively, hashed. No Spark job. */
  private def dirFingerprint(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): String = {
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) return "absent"
    val md = java.security.MessageDigest.getInstance("MD5")
    def walk(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).sortBy(_.getPath.getName).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName != MarkerName)
          md.update(s"${st.getPath}:${st.getLen}:${st.getModificationTime}\n"
            .getBytes("UTF-8"))
      }
    walk(root)
    md.digest().map("%02x".format(_)).mkString
  }

  /** The marker's full expected content for the CURRENT store state. */
  private def markerContent(spark: SparkSession, doc: DocTargets,
      actor: ActorTargets, sig: String): String = {
    val fs = new org.apache.hadoop.fs.Path(doc.lsh.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (s"v1 $sig" +: storeDirs(doc, actor).map(d =>
      s"$d=${dirFingerprint(fs, d)}")).mkString("\n")
  }

  private def markerPath(doc: DocTargets) =
    new org.apache.hadoop.fs.Path(doc.lsh.path, MarkerName)

  private def markerMatches(spark: SparkSession, doc: DocTargets,
      actor: ActorTargets, sig: String): Boolean = {
    val p = markerPath(doc)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val stored =
      try {
        val len = fs.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](len)
        val in = fs.open(p)
        try in.readFully(0, buf) finally in.close()
        new String(buf, "UTF-8")
      } catch { case _: java.io.IOException => return false }
    stored == markerContent(spark, doc, actor, sig)
  }

  /** Written LAST (a crash before this point keeps the full replay);
    * a torn write parses unequal and is treated as absent. */
  private def writeMarker(spark: SparkSession, doc: DocTargets,
      actor: ActorTargets, sig: String): Unit = {
    val p = markerPath(doc)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(markerContent(spark, doc, actor, sig).getBytes("UTF-8"))
    finally out.close()
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
