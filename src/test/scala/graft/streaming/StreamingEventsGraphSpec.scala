package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.operators.{CoPresence, CoPresenceStore, LabelPropagation, PairGraphStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class StreamingEventsGraphSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("evgraph").toString

  private val cfg =
    CoPresenceStore.Config(windowSec = 600, minShared = 3, maxWindowActors = 100)

  private def events = graft.Tables.load(spark, sf001, "events")
    .select(col("user_id"), col("ts"))

  // window-aligned 3-way split: every 600 s window's events land in
  // exactly one batch (the CoPresenceStore contract)
  private def batchOf(i: Int): DataFrame =
    events.filter(
      pmod(floor(unix_timestamp(col("ts")) / cfg.windowSec), lit(3)) === i)

  private def fromScratchPairs: DataFrame =
    CoPresence.pairs(events, "user_id", "ts",
      cfg.windowSec, cfg.minShared, cfg.maxWindowActors)

  private def wantLabels: Map[Long, Long] =
    LabelPropagation.run(fromScratchPairs.select(col("ua"), col("ub")),
        "ua", "ub", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def gotLabels(graphPath: String): Map[Long, Long] =
    PairGraphStore.open(spark, graphPath).ensureCommunities(rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("ua"), col("ub")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("window-aligned batches converge to the from-scratch graph and labels") {
    val dir = tmp()
    CoPresenceStore.create(spark, s"$dir/counts", cfg)
    (0 until 3).foreach { i =>
      StreamingEventsGraph.process(batchOf(i), i, s"$dir/counts", s"$dir/graph")
    }
    // accumulated counts equal one pass over everything
    val wantCounts = CoPresence.pairs(events, "user_id", "ts",
        cfg.windowSec, 1, cfg.maxWindowActors)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val gotCounts = CoPresenceStore.read(spark, s"$dir/counts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotCounts == wantCounts)
    // the edge views agree (store-level and graph-level)
    assert(pairSet(CoPresenceStore.edges(spark, s"$dir/counts"))
      == pairSet(fromScratchPairs))
    assert(pairSet(PairGraphStore.open(spark, s"$dir/graph").edges)
      == pairSet(fromScratchPairs))
    // maintained labels equal a from-scratch LPA over the full graph
    assert(gotLabels(s"$dir/graph") == wantLabels)
    assert(wantLabels.nonEmpty, "fixture must produce a non-trivial graph")
  }

  test("redelivered batch no-ops; a pre-swap crash window heals on replay") {
    val dir = tmp()
    CoPresenceStore.create(spark, s"$dir/counts", cfg)
    StreamingEventsGraph.process(batchOf(0), 0, s"$dir/counts", s"$dir/graph")
    StreamingEventsGraph.process(batchOf(1), 1, s"$dir/counts", s"$dir/graph")
    val countsOnce = CoPresenceStore.read(spark, s"$dir/counts")
      .collect().map(_.toSeq).toSet
    val labelsOnce = gotLabels(s"$dir/graph")
    // foreachBatch redelivery of a COMMITTED batch: nothing moves
    StreamingEventsGraph.process(batchOf(1), 1, s"$dir/counts", s"$dir/graph")
    assert(CoPresenceStore.read(spark, s"$dir/counts")
      .collect().map(_.toSeq).toSet == countsOnce)
    assert(gotLabels(s"$dir/graph") == labelsOnce)

    // crash window: batch 2's community maintenance ran, the counts
    // swap did NOT commit — simulate by driving the maintenance with
    // the crossing set computed against the CURRENT counts, exactly
    // what absorbBatch had done before dying
    val old = CoPresenceStore.read(spark, s"$dir/counts")
    val b2 = CoPresence.pairs(batchOf(2), "user_id", "ts",
        cfg.windowSec, 1, cfg.maxWindowActors)
      .select(col("ua"), col("ub"), col("shared").as("n"))
    val merged = old.unionByName(b2)
      .groupBy(col("ua"), col("ub")).agg(sum(col("n")).as("n"))
    val crossed = merged
      .join(old.select(col("ua"), col("ub"), col("n").as("__oldn")),
        Seq("ua", "ub"), "left")
      .filter(col("n") >= cfg.minShared &&
        coalesce(col("__oldn"), lit(0L)) < cfg.minShared)
      .select(col("ua"), col("ub"))
    PairGraphStore.open(spark, s"$dir/graph")
      .appendAndMaintainCommunities(crossed, rounds = 3)
    // ledger still at batch 1, so the redelivery re-absorbs batch 2:
    // same crossing set, replay-tolerant maintenance, then the commit
    StreamingEventsGraph.process(batchOf(2), 2, s"$dir/counts", s"$dir/graph")
    assert(pairSet(PairGraphStore.open(spark, s"$dir/graph").edges)
      == pairSet(fromScratchPairs))
    assert(gotLabels(s"$dir/graph") == wantLabels)
  }

  test("actor takedown equals from-scratch over kept events; replay no-ops; hot windows fail loud") {
    val dir = tmp()
    CoPresenceStore.create(spark, s"$dir/counts", cfg)
    (0 until 3).foreach { i =>
      StreamingEventsGraph.process(batchOf(i), i, s"$dir/counts", s"$dir/graph")
    }
    val removed = events.select(col("user_id")).distinct()
      .filter(pmod(col("user_id"), lit(9)) === 0)
    StreamingEventsGraph.processTakedown(removed, s"$dir/counts", s"$dir/graph")
    val kept = events.filter(pmod(col("user_id"), lit(9)) =!= 0)
    // counts equal a from-scratch pass over the kept events
    val wantCounts = CoPresence.pairs(kept, "user_id", "ts",
        cfg.windowSec, 1, cfg.maxWindowActors)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val gotCounts = CoPresenceStore.read(spark, s"$dir/counts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotCounts == wantCounts)
    // graph edge view and labels equal the kept-events from-scratch run
    val keptPairs = CoPresence.pairs(kept, "user_id", "ts",
      cfg.windowSec, cfg.minShared, cfg.maxWindowActors)
    assert(pairSet(PairGraphStore.open(spark, s"$dir/graph").edges)
      == pairSet(keptPairs))
    val want = LabelPropagation.run(keptPairs.select(col("ua"), col("ub")),
        "ua", "ub", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotLabels(s"$dir/graph") == want)
    assert(want.nonEmpty && want.size < wantLabels.size,
      "fixture must actually remove community members")
    // replayed takedown: no incident rows, nothing moves
    StreamingEventsGraph.processTakedown(removed, s"$dir/counts", s"$dir/graph")
    assert(CoPresenceStore.read(spark, s"$dir/counts")
      .collect().map(_.toSeq).toSet
      == gotCounts.map { case ((a, b), n) => Seq[Any](a, b, n) }.toSet)
    assert(gotLabels(s"$dir/graph") == want)

    // a store that ever guard-dropped a hot window refuses takedowns
    val dir2 = tmp()
    val tiny = CoPresenceStore.Config(windowSec = 600, minShared = 3,
      maxWindowActors = 2)
    CoPresenceStore.create(spark, s"$dir2/counts", tiny)
    StreamingEventsGraph.process(events, 0, s"$dir2/counts", s"$dir2/graph")
    assert(CoPresenceStore.hotWindowsSeen(spark, s"$dir2/counts"),
      "fixture must trip the hot-window guard")
    val ex = intercept[IllegalArgumentException] {
      StreamingEventsGraph.processTakedown(removed, s"$dir2/counts",
        s"$dir2/graph")
    }
    assert(ex.getMessage.contains("hot window"))
  }

  test("file-stream drive: AvailableNow passes resume batch ids from the checkpoint") {
    val dir = tmp()
    CoPresenceStore.create(spark, s"$dir/counts", cfg)
    val inDir = s"$dir/in"
    val schema = events.schema
    // two stream passes over a growing directory, one checkpoint: the
    // second pass's batch id continues past the first's (the ledger
    // would reject a restarted id sequence)
    batchOf(0).write.parquet(s"$inDir/b0")
    // a file-source batch = whatever files are new; each sub-dir write
    // holds complete windows, so alignment is preserved however the
    // source groups them
    StreamingEventsGraph.stream(spark, s"$inDir/*", schema,
      s"$dir/counts", s"$dir/graph", s"$dir/ckpt").awaitTermination()
    batchOf(1).write.parquet(s"$inDir/b1")
    batchOf(2).write.parquet(s"$inDir/b2")
    StreamingEventsGraph.stream(spark, s"$inDir/*", schema,
      s"$dir/counts", s"$dir/graph", s"$dir/ckpt").awaitTermination()
    assert(pairSet(PairGraphStore.open(spark, s"$dir/graph").edges)
      == pairSet(fromScratchPairs))
    assert(gotLabels(s"$dir/graph") == wantLabels)
  }
}
