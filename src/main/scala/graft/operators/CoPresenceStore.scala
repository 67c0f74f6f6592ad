package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintainable co-presence pair counts — the
  * streaming decomposition of [[CoPresence.pairs]]: a pair's shared-
  * window count is an INTEGER monoid over WINDOW-DISJOINT event
  * batches, so an events stream folds in one batch-sized co-presence
  * pass plus a pair-table merge per micro-batch, and the accumulated
  * counts equal a from-scratch pass over every absorbed event.
  * (Reference scope: none — the events-to-graph bridge of the
  * training-data extension set; the [[VocabStore]] bag-monoid pattern
  * applied to the q188 family's edge generator.)
  *
  * CONTRACT (the doc-disjointness analogue): batches partition the
  * event stream by COMPLETE time windows — every `floor(epoch/
  * windowSec)` window's events arrive inside one batch. Per-batch
  * counts then sum exactly (a pair's shared windows split across
  * batches by window), and the `maxWindowActors` hot-window guard —
  * evaluated per window — sees each window's full population. The
  * natural event-time micro-batch (ingest by arrival hour/day) has
  * this shape; the monoid is NOT idempotent, so [[absorbBatch]]'s
  * batch-id ledger is load-bearing under at-least-once redelivery.
  *
  * [[absorbBatch]] also computes which pairs CROSS the `minShared`
  * edge threshold with this batch and hands them to a caller-supplied
  * maintenance action (the [[PairGraphStore]] composition:
  * `appendAndMaintainCommunities`) BEFORE the counts swap commits the
  * batch. Ordering argument: the swap is the commit point, so a crash
  * anywhere earlier — including mid-maintenance — replays the batch
  * against unchanged counts, recomputes the SAME crossing set, and
  * re-drives the (replay-tolerant) maintenance; a ledger-committed
  * batch implies its maintenance completed. Edges never un-cross
  * under absorbs (counts only grow), so the edge set after N batches
  * equals [[CoPresence.pairs]] over the union
  * (StreamingEventsGraphSpec pins it, crash windows included).
  *
  * LEDGERS (v3 — the scale form): two id ledgers swap ATOMICALLY with
  * the counts —
  *   - `hotWindows`: windows some absorbed batch GUARD-DROPPED (their
  *     pairs were never counted). Bounded by time-range/windowSec.
  *   - `removedActors`: every actor a takedown ever removed. Bounded
  *     by takedown volume — UNBOUNDED under a sustained production
  *     deletion stream. Load-bearing for hot-window RECOVERY: a
  *     recovered window must exclude ALL removed actors' events, not
  *     only the current batch's ("takedown = ban" — see
  *     [[removeActors]]).
  * Each ledger lives INLINE on the meta line while it holds at most
  * [[MaxMetaIds]] ids (the v2 form — zero extra reads, literal
  * predicates) and SPILLS to a parquet sibling (`_hotwin`/`_banned`)
  * inside the swapped state dir past that — meta stays O(1), the
  * recount's exclusion switches from a literal predicate to a
  * broadcast anti-join, and the redelivery probe becomes a
  * takedown-sized anti-join instead of a driver set. Leading
  * underscores keep the siblings invisible to the counts read. Both
  * forms swap with the counts, so a crash anywhere before the swap
  * leaves counts AND ledgers unchanged together (the v1 external
  * append log could over-state across the crash window; the atomic
  * form is also what makes recovery replay-safe — a replayed takedown
  * sees the already-reduced hot set and recounts nothing).
  */
object CoPresenceStore {

  private def dir(path: String) = s"$path/copresence"
  private def metaFile(path: String) = s"${dir(path)}/_graft_copresence_meta"

  /** Inline-ledger cap: at most this many ids ride the meta text line;
    * past it a ledger spills to its parquet sibling inside the same
    * atomic swap and every consumer switches to the join form. */
  private[graft] val MaxMetaIds = 1000

  final case class Config(
      windowSec: Int, minShared: Int, maxWindowActors: Int)

  /** One ledger's persisted form: `inline` holds the ids while
    * `count <= MaxMetaIds`; past that `inline` is empty and the ids
    * live in the `sub` parquet sibling (spilled ⇔ count > MaxMetaIds —
    * no separate flag needed). */
  private final case class Ledger(count: Long, inline: Seq[Long]) {
    def spilled: Boolean = count > MaxMetaIds
    def isEmpty: Boolean = count == 0L
  }

  private final case class State(
      lastBatch: Long, cfg: Config,
      hot: Ledger, removed: Ledger)

  /** A spilled ledger's id frame (single `__id` column). */
  private def ledgerFrame(spark: SparkSession, path: String,
      sub: String): DataFrame =
    spark.read.schema("__id LONG").parquet(s"${dir(path)}/$sub")

  /** A ledger as a one-column frame regardless of form. */
  private def ledgerDf(spark: SparkSession, path: String, sub: String,
      l: Ledger): DataFrame =
    if (l.spilled) ledgerFrame(spark, path, sub)
    else spark.createDataFrame(
      spark.sparkContext.parallelize(
        l.inline.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__id",
          org.apache.spark.sql.types.LongType))))

  /** What a [[writeState]] call should persist for one ledger. */
  private sealed trait LedgerW
  /** Driver-side ids (spills automatically past [[MaxMetaIds]]). */
  private final case class LIds(ids: Seq[Long]) extends LedgerW
  /** A distributed id frame with its known count (never collected
    * when over the cap; collapses to the inline form when under). */
  private final case class LFrame(df: DataFrame, n: Long) extends LedgerW
  /** The CURRENT sibling unchanged (pass-through for a spilled ledger
    * the operation does not touch — a filesystem copy, no Spark job). */
  private final case class LKeep(n: Long) extends LedgerW

  private def writeState(spark: SparkSession, rows: DataFrame, path: String,
      cfg: Config, lastBatch: Long,
      hot: LedgerW, removed: LedgerW): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = dir(path) + ".staging"
    fs.delete(new Path(staging), true)
    // an empty state (the create bootstrap) must still write ONE
    // schema-bearing part file or the read-back cannot infer
    (if (rows.isEmpty) Partitioning.emptyOnePartition(spark, rows.schema)
     else rows.repartition(1).sortWithinPartitions(col("ua"), col("ub")))
      .write.mode(SaveMode.Overwrite).parquet(staging)
    // per-ledger: inline ids on the meta line while small, a parquet
    // sibling inside the SAME staging dir past the cap — one swap
    // commits counts and both ledgers together
    def persist(sub: String, w: LedgerW): (Long, Seq[Long]) = w match {
      case LIds(ids) =>
        if (ids.size <= MaxMetaIds) (ids.size.toLong, ids)
        else {
          ledgerDf(spark, path, sub, Ledger(0, ids))
            .coalesce(1).write.mode(SaveMode.Overwrite)
            .parquet(s"$staging/$sub")
          (ids.size.toLong, Seq.empty)
        }
      case LFrame(df, n) =>
        if (n <= MaxMetaIds)
          (n, df.collect().map(_.getLong(0)).toSeq)
        else {
          df.select(col(df.columns.head).as("__id"))
            .coalesce(1).write.mode(SaveMode.Overwrite)
            .parquet(s"$staging/$sub")
          (n, Seq.empty)
        }
      case LKeep(n) =>
        org.apache.hadoop.fs.FileUtil.copy(
          fs, new Path(s"${dir(path)}/$sub"),
          fs, new Path(s"$staging/$sub"),
          false, spark.sparkContext.hadoopConfiguration)
        (n, Seq.empty)
    }
    val (hotN, hotIds) = persist("_hotwin", hot)
    val (remN, remIds) = persist("_banned", removed)
    val out = fs.create(new Path(s"$staging/_graft_copresence_meta"), true)
    try out.write(
      (s"lastBatch=$lastBatch\nwindowSec=${cfg.windowSec}\n" +
        s"minShared=${cfg.minShared}\n" +
        s"maxWindowActors=${cfg.maxWindowActors}\n" +
        s"hotCount=$hotN\nremovedCount=$remN\n" +
        s"hotWindows=${hotIds.sorted.mkString(",")}\n" +
        s"removedActors=${remIds.sorted.mkString(",")}").getBytes("UTF-8"))
    finally out.close()
    SwapDir.swap(fs, new Path(staging), new Path(dir(path)))
  }

  private def readState(spark: SparkSession, path: String): State = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(metaFile(path)))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    val kv = body.split("\n").map(_.split("=", 2))
      .map(a => a(0) -> (if (a.length > 1) a(1) else "")).toMap
    def ids(key: String): Seq[Long] = kv.getOrElse(key, "") match {
      case "" => Seq.empty
      case s => s.split(",").toSeq.map(_.toLong)
    }
    val hotIds = ids("hotWindows")
    val remIds = ids("removedActors")
    // pre-v3 metas carry no counts: the ledgers were inline-only
    State(kv("lastBatch").toLong,
      Config(kv("windowSec").toInt, kv("minShared").toInt,
        kv("maxWindowActors").toInt),
      Ledger(kv.get("hotCount").map(_.toLong)
        .getOrElse(hotIds.size.toLong), hotIds),
      Ledger(kv.get("removedCount").map(_.toLong)
        .getOrElse(remIds.size.toLong), remIds))
  }

  /** Initialize an EMPTY count state (the stream absorbs from zero). */
  def create(spark: SparkSession, path: String, cfg: Config): Unit = {
    require(cfg.windowSec > 0 && cfg.minShared >= 1 && cfg.maxWindowActors >= 2)
    writeState(spark,
      spark.range(0).select(col("id").as("ua"), col("id").as("ub"),
        col("id").as("n")),
      path, cfg, lastBatch = -1L, LIds(Seq.empty), LIds(Seq.empty))
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(dir(path)))
    fs.exists(new Path(metaFile(path)))
  }

  /** The accumulated (ua, ub, n) pair counts (sub-threshold included —
    * they are the state that lets a later batch cross). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(dir(path)))
    spark.read.parquet(dir(path))
  }

  /** The CURRENT edge view: pairs at or above the stored threshold —
    * equal to [[CoPresence.pairs]] over every absorbed event. */
  def edges(spark: SparkSession, path: String): DataFrame = {
    val st = readState(spark, path)
    read(spark, path).filter(col("n") >= st.cfg.minShared)
      .select(col("ua"), col("ub"), col("n").as("shared"))
  }

  /** Fold one WINDOW-ALIGNED events batch in exactly-once and drive
    * `maintain` with the pairs that newly crossed `minShared` (empty
    * frame possible). See the object doc for the ordering argument;
    * `maintain` MUST be replay-tolerant (every [[PairGraphStore]]
    * maintainer is). A batch id at or below the ledger is a completed
    * redelivery: nothing runs. Windows the batch's pairing guard-
    * dropped join the meta `hotWindows` ledger in the SAME swap. */
  def absorbBatch(
      spark: SparkSession,
      events: DataFrame,
      actorCol: String,
      tsCol: String,
      path: String,
      batchId: Long)(maintain: DataFrame => Unit): Unit = {
    val st = readState(spark, path)
    if (batchId <= st.lastBatch) return
    val cfg = st.cfg
    // per-batch counts through the SAME generator (minShared=1 keeps
    // sub-threshold counts; the hot-window guard sees each complete
    // window's population by the alignment contract)
    val batchCounts = CoPresence.pairs(events, actorCol, tsCol,
        cfg.windowSec, minShared = 1, cfg.maxWindowActors)
      .select(col("ua").cast("long").as("ua"),
        col("ub").cast("long").as("ub"), col("shared").as("n"))
    val old = read(spark, path)
    val merged = old.unionByName(batchCounts)
      .groupBy(col("ua"), col("ub")).agg(sum(col("n")).as("n"))
      .localCheckpoint()
    val crossed = merged.as("m")
      .join(old.select(col("ua"), col("ub"), col("n").as("__oldn")),
        Seq("ua", "ub"), "left")
      .filter(col("n") >= cfg.minShared &&
        coalesce(col("__oldn"), lit(0L)) < cfg.minShared)
      .select(col("ua"), col("ub"))
      .localCheckpoint()
    maintain(crossed)
    // windows this batch's pairing GUARD-DROPPED carry no counted
    // signal — fold them into the hot ledger so [[removeActors]] can
    // recover (recount) or refuse them later
    val batchHot = CoPresence.hotWindows(events, actorCol, tsCol,
        cfg.windowSec, cfg.maxWindowActors)
      .collect().map(_.getLong(0))
    val hotNow: LedgerW =
      if (!st.hot.spilled) LIds((st.hot.inline ++ batchHot).distinct)
      else {
        val hf = ledgerFrame(spark, path, "_hotwin")
          .unionByName(ledgerDf(spark, path, "_hotwin",
            Ledger(0, batchHot.toSeq)))
          .distinct().localCheckpoint()
        LFrame(hf, hf.count())
      }
    val removedNow: LedgerW =
      if (st.removed.spilled) LKeep(st.removed.count)
      else LIds(st.removed.inline)
    // the commit point: counts + ledgers swap atomically AFTER the
    // maintenance action completed
    writeState(spark, merged, path, cfg, batchId, hotNow, removedNow)
  }

  /** True when some absorbed batch guard-dropped a window that has not
    * been recovered since. */
  def hotWindowsSeen(spark: SparkSession, path: String): Boolean =
    !readState(spark, path).hot.isEmpty

  /** Take ACTORS down — the behavioral-graph right-to-forget: an
    * actor's co-presence history involves exactly the count rows
    * INCIDENT to them (another pair's shared-window count never
    * mentions the removed actor), so the takedown is a physical
    * delete of incident rows, with the graph delta handed to
    * `maintain(gone, crossed)` BEFORE the counts swap commits (the
    * [[absorbBatch]] ordering argument: maintenance is replay-
    * tolerant, and a replayed takedown finds no incident rows and no
    * still-recoverable hot windows, so both frames come back empty).
    *
    * HOT-WINDOW RECOVERY: a window some absorb guard-dropped was
    * never counted, and removing actors can push its population back
    * UNDER the cap — from-scratch over the kept events would then
    * count it, so bounded state alone cannot serve the takedown.
    * When the caller supplies the `events` source (the full absorbed
    * event history — the store trusts it, matching the absorb
    * contract), the ledgered hot windows are RECOUNTED from it:
    * events are restricted to those windows (cost bounded by ledger
    * size, not corpus), every ever-removed actor is excluded
    * ("takedown = ban": a later re-admission of a removed actor is
    * out of recovery contract — rebuild instead), and the per-window
    * guard re-applies — windows still over the cap with the kept
    * population stay on the ledger, windows now under it contribute
    * their kept pairs. Recovered additions can push pairs ACROSS
    * `minShared`: those arrive as `crossed` (append direction), while
    * the incident at-threshold pairs arrive as `gone` (revocation) —
    * disjoint sets, since recovered pairs mention kept actors only.
    * The final counts equal a from-scratch [[CoPresence.pairs]] pass
    * over (events minus all removed actors' rows), guard included
    * (StreamingEventsGraphSpec pins it, crash windows included).
    *
    * FAILS LOUD only when hot windows exist and no `events` source is
    * supplied — the one case bounded state genuinely cannot serve. */
  def removeActors(
      spark: SparkSession,
      actors: DataFrame,
      path: String,
      events: Option[DataFrame] = None,
      actorCol: String = "user_id",
      tsCol: String = "ts")(maintain: (DataFrame, DataFrame) => Unit): Unit = {
    val st = readState(spark, path)
    val cfg = st.cfg
    require(st.hot.isEmpty || events.nonEmpty,
      "removeActors: an absorbed batch guard-dropped a hot window - " +
        "a takedown could un-suppress it and the suppressed pairs were " +
        "never counted; pass the absorbed events source so the ledgered " +
        "windows can be recounted, or rebuild from the kept events")
    // takedown batches are actor-id-sized (human/process-scale, not
    // corpus-scale) — collected once; the ACCUMULATED ban ledger is
    // what outgrows the driver, not one batch
    val ridIds = actors.select(col(actors.columns.head).cast("long").as("__a"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val rid = spark.createDataFrame(
      spark.sparkContext.parallelize(ridIds.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__a",
          org.apache.spark.sql.types.LongType))))
    // fully-ledgered redelivery: every id rides the ban ledger, which
    // commits ATOMICALLY with the counts swap — so the batch's
    // incident delete and recovery already landed, a recount of the
    // still-hot windows under the identical exclusion set would fold
    // in nothing, and maintain would get two empty frames. Serve the
    // stored state outright (the applied-batch-marker idiom). Inline
    // ledger: a driver set probe; spilled: a takedown-sized anti-join
    // against the parquet sibling — the ledger is never collected.
    val freshCount =
      if (!st.removed.spilled) (ridIds.toSet -- st.removed.inline).size.toLong
      else rid.join(ledgerFrame(spark, path, "_banned")
          .withColumnRenamed("__id", "__a"), Seq("__a"), "left_anti").count()
    if (ridIds.nonEmpty && freshCount == 0L) return
    val newRemovedCount = st.removed.count + freshCount
    val old = read(spark, path).localCheckpoint()
    val incident = old
      .join(broadcast(rid.withColumnRenamed("__a", "ua")), Seq("ua"), "left_semi")
      .unionByName(old
        .join(broadcast(rid.withColumnRenamed("__a", "ub")), Seq("ub"), "left_semi")
        .select(col("ua"), col("ub"), col("n")))
      .distinct()
      .localCheckpoint()
    val gone = incident.filter(col("n") >= cfg.minShared)
      .select(col("ua"), col("ub"))
      .localCheckpoint()
    val keptCounts = old.join(broadcast(incident.select(col("ua"), col("ub"))),
      Seq("ua", "ub"), "left_anti")
    // ---- ledgered hot-window recount (empty ledger: zero extra jobs)
    val (merged, crossed, stillHot: LedgerW) =
      if (st.hot.isEmpty) (keptCounts, emptyPairs(spark),
        LIds(Seq.empty): LedgerW)
      else {
        // exclusion set = EVERY ever-removed actor + this batch.
        // Inline ledger: the literal predicate (one codegen'd filter,
        // the micro path). Spilled — or spilling with this batch: a
        // broadcast anti-join against the parquet sibling; the ledger
        // is never collected to the driver and never becomes a
        // million-literal plan.
        val winHit =
          if (!st.hot.spilled)
            floor(unix_timestamp(col(tsCol)) / cfg.windowSec)
              .isInCollection(st.hot.inline)
          else lit(true) // spilled: membership via the semi-join below
        val hotEv0 = events.get.filter(winHit)
        val hotEv1 =
          if (!st.hot.spilled) hotEv0
          else hotEv0
            .withColumn("__w",
              floor(unix_timestamp(col(tsCol)) / cfg.windowSec))
            .join(broadcast(ledgerFrame(spark, path, "_hotwin")
              .withColumnRenamed("__id", "__w")), Seq("__w"), "left_semi")
            .drop("__w")
        val banInline = !st.removed.spilled && newRemovedCount <= MaxMetaIds
        val hotEv = (
          if (banInline)
            hotEv1.filter(!col(actorCol).cast("long")
              .isInCollection((st.removed.inline ++ ridIds).distinct))
          else hotEv1
            .withColumn("__a", col(actorCol).cast("long"))
            .join(broadcast(ledgerDf(spark, path, "_banned", st.removed)
              .withColumnRenamed("__id", "__a")
              .unionByName(rid).distinct()), Seq("__a"), "left_anti")
            .drop("__a"))
          .select(col(actorCol), col(tsCol))
          .localCheckpoint()
        val recount = CoPresence.pairs(hotEv, actorCol, tsCol,
            cfg.windowSec, minShared = 1, cfg.maxWindowActors)
          .select(col("ua").cast("long").as("ua"),
            col("ub").cast("long").as("ub"), col("shared").as("n"))
        val m = keptCounts.unionByName(recount)
          .groupBy(col("ua"), col("ub")).agg(sum(col("n")).as("n"))
          .localCheckpoint()
        // recovered additions that cross the edge threshold (recount
        // pairs mention kept actors only, so disjoint from `gone`)
        val c = m.join(old.select(col("ua"), col("ub"), col("n").as("__oldn")),
            Seq("ua", "ub"), "left")
          .filter(col("n") >= cfg.minShared &&
            coalesce(col("__oldn"), lit(0L)) < cfg.minShared)
          .select(col("ua"), col("ub"))
          .localCheckpoint()
        val stillDf = CoPresence.hotWindows(hotEv, actorCol, tsCol,
            cfg.windowSec, cfg.maxWindowActors)
          .localCheckpoint()
        // a spilled hot ledger stays distributed end to end; inline
        // ledgers keep the driver form (still-hot ⊆ ledger, so the
        // collect is cap-bounded)
        val still: LedgerW =
          if (!st.hot.spilled)
            LIds(stillDf.collect().map(_.getLong(0)).toSeq)
          else LFrame(stillDf, stillDf.count())
        (m, c, still)
      }
    maintain(gone, crossed)
    // new ban ledger: inline while the TOTAL stays under the cap;
    // spills to the `_banned` sibling past it (and stays spilled — the
    // union frame is never collected)
    val removedNow: LedgerW =
      if (!st.removed.spilled && newRemovedCount <= MaxMetaIds)
        LIds((st.removed.inline ++ ridIds).distinct)
      else LFrame(
        ledgerDf(spark, path, "_banned", st.removed)
          .unionByName(rid.withColumnRenamed("__a", "__id"))
          .distinct().localCheckpoint(),
        newRemovedCount)
    writeState(spark, merged, path, cfg, st.lastBatch, stillHot, removedNow)
  }

  private def emptyPairs(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("ua"), col("id").as("ub"))

  /** From-scratch reference over a full events frame (specs/oracles). */
  def fromScratch(events: DataFrame, actorCol: String, tsCol: String,
      cfg: Config): DataFrame =
    CoPresence.pairs(events, actorCol, tsCol, cfg.windowSec, cfg.minShared,
      cfg.maxWindowActors)
}
