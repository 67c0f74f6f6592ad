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
  * (counts only grow), so the edge set after N batches equals
  * [[CoPresence.pairs]] over the union (StreamingEventsGraphSpec pins
  * it, crash windows included).
  */
object CoPresenceStore {

  private def dir(path: String) = s"$path/copresence"
  private def metaFile(path: String) = s"${dir(path)}/_graft_copresence_meta"

  final case class Config(
      windowSec: Int, minShared: Int, maxWindowActors: Int)

  private def writeState(spark: SparkSession, rows: DataFrame, path: String,
      cfg: Config, lastBatch: Long): Unit = {
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
        s"maxWindowActors=${cfg.maxWindowActors}").getBytes("UTF-8"))
    finally out.close()
    SwapDir.swap(fs, new Path(staging), new Path(dir(path)))
  }

  private def readMeta(spark: SparkSession, path: String): (Long, Config) = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(metaFile(path)))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    val kv = body.split("\n").map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
    (kv("lastBatch").toLong,
      Config(kv("windowSec").toInt, kv("minShared").toInt,
        kv("maxWindowActors").toInt))
  }

  /** Initialize an EMPTY count state (the stream absorbs from zero). */
  def create(spark: SparkSession, path: String, cfg: Config): Unit = {
    require(cfg.windowSec > 0 && cfg.minShared >= 1 && cfg.maxWindowActors >= 2)
    writeState(spark,
      spark.range(0).select(col("id").as("ua"), col("id").as("ub"),
        col("id").as("n")),
      path, cfg, lastBatch = -1L)
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
    val (_, cfg) = readMeta(spark, path)
    read(spark, path).filter(col("n") >= cfg.minShared)
      .select(col("ua"), col("ub"), col("n").as("shared"))
  }

  /** Fold one WINDOW-ALIGNED events batch in exactly-once and drive
    * `maintain` with the pairs that newly crossed `minShared` (empty
    * frame possible). See the object doc for the ordering argument;
    * `maintain` MUST be replay-tolerant (every [[PairGraphStore]]
    * maintainer is). A batch id at or below the ledger is a completed
    * redelivery: nothing runs. */
  def absorbBatch(
      spark: SparkSession,
      events: DataFrame,
      actorCol: String,
      tsCol: String,
      path: String,
      batchId: Long)(maintain: DataFrame => Unit): Unit = {
    val (lastBatch, cfg) = readMeta(spark, path)
    if (batchId <= lastBatch) return
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
    // guard ledger: windows the batch's pairing DROPPED carry no
    // counted signal — record them (append; duplicates harmless) so
    // [[removeActors]] can refuse when a takedown might un-suppress
    // one. Ordered before the commit: a crash leaves the ledger
    // OVER-stated only (spurious rows re-append on replay), which can
    // only make removeActors more conservative.
    val hot = CoPresence.hotWindows(events, actorCol, tsCol,
      cfg.windowSec, cfg.maxWindowActors).localCheckpoint()
    if (!hot.isEmpty)
      hot.coalesce(1).write.mode(SaveMode.Append).parquet(s"$path/hotwindows")
    // the commit point: counts + ledger swap atomically AFTER the
    // maintenance action completed
    writeState(spark, merged, path, cfg, batchId)
  }

  /** True when any absorbed batch guard-dropped a window. */
  def hotWindowsSeen(spark: SparkSession, path: String): Boolean = {
    val p = new Path(s"$path/hotwindows")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Take ACTORS down — the behavioral-graph right-to-forget: an
    * actor's co-presence history involves exactly the count rows
    * INCIDENT to them (another pair's shared-window count never
    * mentions the removed actor), so the takedown is a physical
    * delete of incident rows, with the incident AT-THRESHOLD pairs —
    * the edges that must leave the graph — handed to `maintain`
    * BEFORE the counts swap commits (the [[absorbBatch]] ordering
    * argument: maintenance is replay-tolerant, and a replayed
    * takedown finds no incident rows and no-ops). Later absorbs may
    * legitimately re-introduce the actor: counts restart from zero,
    * matching a from-scratch pass over (events minus the actor's
    * pre-takedown history).
    *
    * FAILS LOUD when any absorbed batch guard-dropped a hot window:
    * removing an actor can push such a window back UNDER the cap, and
    * the pairs it suppressed were never counted — bounded state
    * cannot recover them (the raw events can: rebuild). Exact
    * otherwise (StreamingEventsGraphSpec pins equality with a
    * from-scratch pass over the kept events). */
  def removeActors(
      spark: SparkSession,
      actors: DataFrame,
      path: String)(maintain: DataFrame => Unit): Unit = {
    require(!hotWindowsSeen(spark, path),
      "removeActors: an absorbed batch guard-dropped a hot window - " +
        "a takedown could un-suppress it and the suppressed pairs were " +
        "never counted; rebuild the store from the kept events instead")
    val (lastBatch, cfg) = readMeta(spark, path)
    val rid = actors.select(col(actors.columns.head).cast("long").as("__a"))
      .distinct().localCheckpoint()
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
    maintain(gone)
    val kept = old.join(broadcast(incident.select(col("ua"), col("ub"))),
      Seq("ua", "ub"), "left_anti")
    writeState(spark, kept, path, cfg, lastBatch)
  }

  /** From-scratch reference over a full events frame (specs/oracles). */
  def fromScratch(events: DataFrame, actorCol: String, tsCol: String,
      cfg: Config): DataFrame =
    CoPresence.pairs(events, actorCol, tsCol, cfg.windowSec, cfg.minShared,
      cfg.maxWindowActors)
}
