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
  * LEDGERS (v2): the meta file carries two driver-side id ledgers,
  * swapped ATOMICALLY with the counts —
  *   - `hotWindows`: windows some absorbed batch GUARD-DROPPED (their
  *     pairs were never counted). Bounded by time-range/windowSec
  *     (a year of 10-minute windows is ~52k longs), never by data
  *     volume — at a scale where that outgrows a meta line the set
  *     moves to a `_hotwin` parquet sibling inside the same swap.
  *   - `removedActors`: every actor a takedown ever removed. Bounded
  *     by takedown volume. Load-bearing for hot-window RECOVERY: a
  *     recovered window must exclude ALL removed actors' events, not
  *     only the current batch's ("takedown = ban" — see
  *     [[removeActors]]).
  * Both live inside the swapped state dir, so a crash anywhere before
  * the swap leaves counts AND ledgers unchanged together (the v1
  * external append log could over-state across the crash window; the
  * atomic form is also what makes recovery replay-safe — a replayed
  * takedown sees the already-reduced hot set and recounts nothing).
  */
object CoPresenceStore {

  private def dir(path: String) = s"$path/copresence"
  private def metaFile(path: String) = s"${dir(path)}/_graft_copresence_meta"

  final case class Config(
      windowSec: Int, minShared: Int, maxWindowActors: Int)

  private final case class State(
      lastBatch: Long, cfg: Config,
      hotWindows: Seq[Long], removedActors: Seq[Long])

  private def writeState(spark: SparkSession, rows: DataFrame, path: String,
      cfg: Config, lastBatch: Long,
      hotWindows: Seq[Long], removedActors: Seq[Long]): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = dir(path) + ".staging"
    fs.delete(new Path(staging), true)
    // an empty state (the create bootstrap) must still write ONE
    // schema-bearing part file or the read-back cannot infer
    (if (rows.isEmpty) Partitioning.emptyOnePartition(spark, rows.schema)
     else rows.repartition(1).sortWithinPartitions(col("ua"), col("ub")))
      .write.mode(SaveMode.Overwrite).parquet(staging)
    val out = fs.create(new Path(s"$staging/_graft_copresence_meta"), true)
    try out.write(
      (s"lastBatch=$lastBatch\nwindowSec=${cfg.windowSec}\n" +
        s"minShared=${cfg.minShared}\n" +
        s"maxWindowActors=${cfg.maxWindowActors}\n" +
        s"hotWindows=${hotWindows.sorted.mkString(",")}\n" +
        s"removedActors=${removedActors.sorted.mkString(",")}").getBytes("UTF-8"))
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
    State(kv("lastBatch").toLong,
      Config(kv("windowSec").toInt, kv("minShared").toInt,
        kv("maxWindowActors").toInt),
      ids("hotWindows"), ids("removedActors"))
  }

  /** Initialize an EMPTY count state (the stream absorbs from zero). */
  def create(spark: SparkSession, path: String, cfg: Config): Unit = {
    require(cfg.windowSec > 0 && cfg.minShared >= 1 && cfg.maxWindowActors >= 2)
    writeState(spark,
      spark.range(0).select(col("id").as("ua"), col("id").as("ub"),
        col("id").as("n")),
      path, cfg, lastBatch = -1L, Seq.empty, Seq.empty)
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
    // signal — fold them into the meta ledger so [[removeActors]] can
    // recover (recount) or refuse them later
    val batchHot = CoPresence.hotWindows(events, actorCol, tsCol,
        cfg.windowSec, cfg.maxWindowActors)
      .collect().map(_.getLong(0))
    val hotNow = (st.hotWindows ++ batchHot).distinct
    // the commit point: counts + ledgers swap atomically AFTER the
    // maintenance action completed
    writeState(spark, merged, path, cfg, batchId, hotNow, st.removedActors)
  }

  /** True when some absorbed batch guard-dropped a window that has not
    * been recovered since. */
  def hotWindowsSeen(spark: SparkSession, path: String): Boolean =
    readState(spark, path).hotWindows.nonEmpty

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
    require(st.hotWindows.isEmpty || events.nonEmpty,
      "removeActors: an absorbed batch guard-dropped a hot window - " +
        "a takedown could un-suppress it and the suppressed pairs were " +
        "never counted; pass the absorbed events source so the ledgered " +
        "windows can be recounted, or rebuild from the kept events")
    // takedown batches are actor-id-sized (human/process-scale, not
    // corpus-scale) — collected once for the ban ledger
    val ridIds = actors.select(col(actors.columns.head).cast("long").as("__a"))
      .distinct().collect().map(_.getLong(0)).toSeq
    // fully-ledgered redelivery: every id rides the ban ledger, which
    // commits ATOMICALLY with the counts swap — so the batch's
    // incident delete and recovery already landed, a recount of the
    // still-hot windows under the identical exclusion set would fold
    // in nothing, and maintain would get two empty frames. Serve the
    // stored state outright (the applied-batch-marker idiom): a
    // replayed takedown is a meta read + one id collect.
    if (ridIds.nonEmpty && ridIds.forall(st.removedActors.toSet)) return
    val rid = spark.createDataFrame(
      spark.sparkContext.parallelize(ridIds.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__a",
          org.apache.spark.sql.types.LongType))))
    val removedAll = (st.removedActors ++ ridIds).distinct
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
    val (merged, crossed, stillHot) =
      if (st.hotWindows.isEmpty) (keptCounts, emptyPairs(spark), st.hotWindows)
      else {
        val hotEv = events.get
          .filter(floor(unix_timestamp(col(tsCol)) / cfg.windowSec)
            .isInCollection(st.hotWindows) &&
            !col(actorCol).cast("long").isInCollection(removedAll))
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
        val still = CoPresence.hotWindows(hotEv, actorCol, tsCol,
            cfg.windowSec, cfg.maxWindowActors)
          .collect().map(_.getLong(0)).toSeq
        (m, c, still)
      }
    maintain(gone, crossed)
    writeState(spark, merged, path, cfg, st.lastBatch, stillHot, removedAll)
  }

  private def emptyPairs(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("ua"), col("id").as("ub"))

  /** From-scratch reference over a full events frame (specs/oracles). */
  def fromScratch(events: DataFrame, actorCol: String, tsCol: String,
      cfg: Config): DataFrame =
    CoPresence.pairs(events, actorCol, tsCol, cfg.windowSec, cfg.minShared,
      cfg.maxWindowActors)
}
