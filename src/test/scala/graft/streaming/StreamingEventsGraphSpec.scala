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

    // a store that guard-dropped a hot window refuses takedowns ONLY
    // when no events source is supplied for the recount
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
    // with the events source the same takedown completes: ledgered
    // windows recount from the kept events, still-over-cap windows
    // stay dropped — counts equal from-scratch over kept, guard
    // included
    StreamingEventsGraph.processTakedown(removed, s"$dir2/counts",
      s"$dir2/graph", events = Some(events))
    val wantTiny = CoPresence.pairs(kept, "user_id", "ts",
        tiny.windowSec, 1, tiny.maxWindowActors)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val gotTiny = CoPresenceStore.read(spark, s"$dir2/counts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotTiny == wantTiny)
  }

  // planted fixture: (user, window) presence with controlled window
  // populations; ts = epoch seconds cast to timestamp
  private def planted(rows: (Long, Long)*): DataFrame =
    spark.createDataFrame(rows.toSeq).toDF("user_id", "w")
      .select(col("user_id"), (col("w") * 600 + 5).cast("timestamp").as("ts"))

  private def countsMap(path: String): Map[(Long, Long), Long] =
    CoPresenceStore.read(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("hot-window recovery: takedown recounts ledgered windows, revokes AND appends") {
    val dir = tmp()
    val cfg5 = CoPresenceStore.Config(windowSec = 600, minShared = 2,
      maxWindowActors = 5)
    CoPresenceStore.create(spark, s"$dir/counts", cfg5)
    // windows 0-2: actors 1..6 (pop 6 > 5 -> HOT, never counted);
    // windows 10-12: actors 1..4 (pop 4 <= 5 -> counted, all pairs n=3)
    val all = (for (w <- 0L to 2L; u <- 1L to 6L) yield (u, w)) ++
      (for (w <- 10L to 12L; u <- 1L to 4L) yield (u, w))
    val evs = planted(all: _*)
    StreamingEventsGraph.process(evs, 0, s"$dir/counts", s"$dir/graph")
    assert(CoPresenceStore.hotWindowsSeen(spark, s"$dir/counts"))
    assert(countsMap(s"$dir/counts").keySet
      == (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toSet)
    // take down actor 4 with the events source: windows 0-2 drop to
    // pop 5 <= 5 and RECOVER; incident pairs (1,4)(2,4)(3,4) leave the
    // graph; recovered pairs with 5/6 cross the threshold and join it
    val removed = planted((4L, 0L)).select(col("user_id")).distinct()
    StreamingEventsGraph.processTakedown(removed, s"$dir/counts",
      s"$dir/graph", events = Some(evs))
    val keptEv = evs.filter(col("user_id") =!= 4L)
    val wantCounts = CoPresence.pairs(keptEv, "user_id", "ts",
        cfg5.windowSec, 1, cfg5.maxWindowActors)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(countsMap(s"$dir/counts") == wantCounts)
    // recovered: (1,2)(1,3)(2,3) at 3+3=6, the seven pairs with 5/6 at 3
    assert(wantCounts((1L, 2L)) == 6L && wantCounts((1L, 5L)) == 3L &&
      wantCounts((5L, 6L)) == 3L)
    val keptPairs = CoPresence.pairs(keptEv, "user_id", "ts",
      cfg5.windowSec, cfg5.minShared, cfg5.maxWindowActors)
    assert(pairSet(PairGraphStore.open(spark, s"$dir/graph").edges)
      == pairSet(keptPairs))
    val want = LabelPropagation.run(keptPairs.select(col("ua"), col("ub")),
        "ua", "ub", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotLabels(s"$dir/graph") == want)
    // the ledger is consumed: recovered windows leave it
    assert(!CoPresenceStore.hotWindowsSeen(spark, s"$dir/counts"))
    // replayed takedown: no incident rows, empty ledger -> no-op
    StreamingEventsGraph.processTakedown(removed, s"$dir/counts",
      s"$dir/graph", events = Some(evs))
    assert(countsMap(s"$dir/counts") == wantCounts)
    assert(gotLabels(s"$dir/graph") == want)
  }

  test("recovery ban semantics: still-hot windows exclude EVERY removed actor") {
    val dir = tmp()
    val cfg4 = CoPresenceStore.Config(windowSec = 600, minShared = 2,
      maxWindowActors = 4)
    CoPresenceStore.create(spark, s"$dir/counts", cfg4)
    val all = (for (w <- 0L to 2L; u <- 1L to 6L) yield (u, w)) ++
      (for (w <- 10L to 12L; u <- 1L to 4L) yield (u, w))
    val evs = planted(all: _*)
    StreamingEventsGraph.process(evs, 0, s"$dir/counts", s"$dir/graph")
    // takedown of 4: windows 0-2 drop to pop 5 > 4 -> STILL hot (stay
    // ledgered); only the incident rows leave
    StreamingEventsGraph.processTakedown(planted((4L, 0L)).select(col("user_id")),
      s"$dir/counts", s"$dir/graph", events = Some(evs))
    assert(CoPresenceStore.hotWindowsSeen(spark, s"$dir/counts"))
    assert(countsMap(s"$dir/counts").keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // takedown of 5: recovery must exclude BOTH 4 (the ban ledger) and
    // 5 -> pop 4 <= 4, windows recover with pairs among {1,2,3,6} only.
    // A recovery that excluded only the current batch would see pop 5
    // and recover nothing.
    StreamingEventsGraph.processTakedown(planted((5L, 0L)).select(col("user_id")),
      s"$dir/counts", s"$dir/graph", events = Some(evs))
    val keptEv = evs.filter(col("user_id") =!= 4L && col("user_id") =!= 5L)
    val wantCounts = CoPresence.pairs(keptEv, "user_id", "ts",
        cfg4.windowSec, 1, cfg4.maxWindowActors)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(countsMap(s"$dir/counts") == wantCounts)
    assert(wantCounts((1L, 6L)) == 3L, "windows must actually recover")
    assert(!CoPresenceStore.hotWindowsSeen(spark, s"$dir/counts"))
    val keptPairs = CoPresence.pairs(keptEv, "user_id", "ts",
      cfg4.windowSec, cfg4.minShared, cfg4.maxWindowActors)
    assert(pairSet(PairGraphStore.open(spark, s"$dir/graph").edges)
      == pairSet(keptPairs))
  }

  test("spilled ban ledger: a 10k-actor takedown stream keeps meta O(1), recovery intact") {
    val dir = tmp()
    val cfg5 = CoPresenceStore.Config(windowSec = 600, minShared = 2,
      maxWindowActors = 5)
    CoPresenceStore.create(spark, s"$dir/counts", cfg5)
    // the recovery fixture: windows 0-2 hot (pop 6 > 5), 10-12 counted
    val all = (for (w <- 0L to 2L; u <- 1L to 6L) yield (u, w)) ++
      (for (w <- 10L to 12L; u <- 1L to 4L) yield (u, w))
    val evs = planted(all: _*)
    CoPresenceStore.absorbBatch(spark, evs, "user_id", "ts",
      s"$dir/counts", 0L)(_ => ())
    // a sustained deletion stream: 6 batches x 2000 actor ids (absent
    // from the events — the GDPR-request-for-a-user-with-no-rows
    // shape), pushing the ban ledger far past the inline cap
    (0 until 6).foreach { b =>
      val ids = spark.range(100000L + b * 2000L, 100000L + (b + 1) * 2000L)
        .select(col("id").as("user_id"))
      CoPresenceStore.removeActors(spark, ids, s"$dir/counts",
        events = Some(evs))((_, _) => ())
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaLen = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      s"$dir/counts/copresence/_graft_copresence_meta")).getLen
    assert(metaLen < 1024L,
      s"meta must stay O(1) with a 12k-id ban ledger; got $metaLen bytes")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/counts/copresence/_banned")),
      "the ban ledger must have spilled to its parquet sibling")
    // windows 0-2 keep pop 6 (absent ids remove nothing): still hot
    assert(CoPresenceStore.hotWindowsSeen(spark, s"$dir/counts"))
    // now take down actor 4 THROUGH the spilled ledger: the recount's
    // exclusion runs as the anti-join (12k ids never hit a literal
    // plan or the driver) and windows 0-2 recover at pop 5
    CoPresenceStore.removeActors(spark,
      planted((4L, 0L)).select(col("user_id")).distinct(),
      s"$dir/counts", events = Some(evs))((_, _) => ())
    val keptEv = evs.filter(col("user_id") =!= 4L)
    val wantCounts = CoPresence.pairs(keptEv, "user_id", "ts",
        cfg5.windowSec, 1, cfg5.maxWindowActors)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(countsMap(s"$dir/counts") == wantCounts,
      "recovery through the spilled ledger must equal from-scratch over kept events")
    assert(!CoPresenceStore.hotWindowsSeen(spark, s"$dir/counts"))
    // fully-ledgered redelivery probes the SPILLED ledger (anti-join,
    // not a driver set) and no-ops
    val replay = spark.range(100000L, 100100L).select(col("id").as("user_id"))
    CoPresenceStore.removeActors(spark, replay, s"$dir/counts",
      events = Some(evs))((_, _) =>
      fail("fully-ledgered redelivery must not re-run maintenance"))
    assert(countsMap(s"$dir/counts") == wantCounts)
  }

  test("recovery crash window: maintenance ran, counts swap did not - replay converges") {
    val dir = tmp()
    val cfg5 = CoPresenceStore.Config(windowSec = 600, minShared = 2,
      maxWindowActors = 5)
    CoPresenceStore.create(spark, s"$dir/counts", cfg5)
    val all = (for (w <- 0L to 2L; u <- 1L to 6L) yield (u, w)) ++
      (for (w <- 10L to 12L; u <- 1L to 4L) yield (u, w))
    val evs = planted(all: _*)
    StreamingEventsGraph.process(evs, 0, s"$dir/counts", s"$dir/graph")
    val removed = planted((4L, 0L)).select(col("user_id")).distinct()
    // simulate: removeActors ran its maintain (graph revoke + append)
    // and died BEFORE the counts swap — drive the real maintain, then
    // abort the store write by throwing after it
    val boom = intercept[RuntimeException] {
      CoPresenceStore.removeActors(spark, removed, s"$dir/counts",
        Some(evs), "user_id", "ts") { (gone, crossed) =>
        val g = PairGraphStore.open(spark, s"$dir/graph")
        g.removeEdgesAndMaintainCommunities(gone, rounds = 3)
        g.appendAndMaintainCommunities(crossed, rounds = 3)
        throw new RuntimeException("crash before swap")
      }
    }
    assert(boom.getMessage == "crash before swap")
    // counts unchanged (still pre-takedown), graph already maintained;
    // the replayed takedown recomputes the SAME gone/crossed sets and
    // the replay-tolerant maintainers no-op into the committed state
    assert(CoPresenceStore.hotWindowsSeen(spark, s"$dir/counts"))
    StreamingEventsGraph.processTakedown(removed, s"$dir/counts",
      s"$dir/graph", events = Some(evs))
    val keptEv = evs.filter(col("user_id") =!= 4L)
    val wantCounts = CoPresence.pairs(keptEv, "user_id", "ts",
        cfg5.windowSec, 1, cfg5.maxWindowActors)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(countsMap(s"$dir/counts") == wantCounts)
    val keptPairs = CoPresence.pairs(keptEv, "user_id", "ts",
      cfg5.windowSec, cfg5.minShared, cfg5.maxWindowActors)
    assert(pairSet(PairGraphStore.open(spark, s"$dir/graph").edges)
      == pairSet(keptPairs))
    val want = LabelPropagation.run(keptPairs.select(col("ua"), col("ub")),
        "ua", "ub", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotLabels(s"$dir/graph") == want)
  }

  test("re-crossing a revoked pair readmits it instead of wedging the stream") {
    val dir = tmp()
    val cfg = CoPresenceStore.Config(windowSec = 600, minShared = 2,
      maxWindowActors = 100)
    CoPresenceStore.create(spark, s"$dir/counts", cfg)
    // batch 0: actors 1,2,3 share windows 0,1 -> all three pairs cross
    StreamingEventsGraph.process(
      planted((for (w <- 0L to 1L; u <- 1L to 3L) yield (u, w)): _*),
      0, s"$dir/counts", s"$dir/graph")
    assert(pairSet(PairGraphStore.open(spark, s"$dir/graph").edges)
      == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // takedown of 3 revokes (1,3) and (2,3)
    StreamingEventsGraph.processTakedown(
      planted((3L, 0L)).select(col("user_id")), s"$dir/counts", s"$dir/graph")
    assert(pairSet(PairGraphStore.open(spark, s"$dir/graph").edges)
      == Set((1L, 2L)))
    // batch 1 re-introduces actor 3 with actor 1 over fresh windows:
    // (1,3)'s count restarts and re-crosses — previously this wedged
    // the stream on append's revoked-pair clash; now the counted
    // re-cross READMITS the pair and maintenance proceeds
    StreamingEventsGraph.process(
      planted((1L, 10L), (3L, 10L), (1L, 11L), (3L, 11L)),
      1, s"$dir/counts", s"$dir/graph")
    assert(pairSet(PairGraphStore.open(spark, s"$dir/graph").edges)
      == Set((1L, 2L), (1L, 3L)))
    val labels = gotLabels(s"$dir/graph")
    val wantL = LabelPropagation.run(
        planted((1L, 0L)).sparkSession.createDataFrame(
          Seq((1L, 2L), (1L, 3L))).toDF("ua", "ub"),
        "ua", "ub", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == wantL)
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
