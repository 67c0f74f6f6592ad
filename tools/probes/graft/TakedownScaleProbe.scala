package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.operators.{CoPresence, CoPresenceStore, LabelPropagation, PairGraphStore}
import graft.streaming.StreamingEventsGraph

/** Deep-tier probe for the ACTOR-takedown path (q220) at replicated
  * event density — the configuration where the hot-window guard fires
  * on (nearly) every window, which used to make
  * [[CoPresenceStore.removeActors]] refuse outright. With hot-window
  * RECOVERY the takedown must now COMPLETE, recounting the ledgered
  * windows from the kept events, and the result must EQUAL a
  * from-scratch pass over (k-fold events minus the removed actors):
  * counts (guard included), edge view, and LPA labels.
  *
  * Prints build/absorb/takedown timings for the COVERAGE tier row and
  * fails loud (exit 1) on any equality miss.
  *
  * Usage: runMain graft.TakedownScaleProbe [k] [srcSf]
  */
object TakedownScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(8)
    val src = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")

    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory(s"takedown$k").toString
    try {
      // k-fold events replica, ids offset per replica (the ScaleProbe
      // recipe): same windows, k x the per-window actor population
      val base = spark.read.parquet(s"$src/events.parquet")
        .select(col("event_id"), col("user_id"), col("ts"))
      val maxU = base.agg(max(col("user_id"))).first().getLong(0) + 1L
      (0 until k).map(r => base.withColumn("user_id",
          col("user_id") + lit(r.toLong * maxU)))
        .reduce(_ unionByName _)
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$work/events.parquet")
      val events = spark.read.parquet(s"$work/events.parquet")
        .select(col("user_id"), col("ts"))
      println(s"TAKEDOWN ${k}x events = ${events.count()} rows")

      val cfg = CoPresenceStore.Config(
        windowSec = 600, minShared = 3, maxWindowActors = 100)
      val countsPath = s"$work/counts"
      val graphPath = s"$work/graph"
      var t0 = System.nanoTime()
      CoPresenceStore.create(spark, countsPath, cfg)
      StreamingEventsGraph.process(events, 0L, countsPath, graphPath)
      val absorbSec = (System.nanoTime() - t0) / 1e9
      val hotSeen = CoPresenceStore.hotWindowsSeen(spark, countsPath)
      println(f"TAKEDOWN absorb $absorbSec%.2f s, hotWindowsSeen=$hotSeen")

      val removed = events.select(col("user_id")).distinct()
        .filter(pmod(col("user_id"), lit(9)) === 0)
      t0 = System.nanoTime()
      StreamingEventsGraph.processTakedown(removed, countsPath, graphPath,
        events = Some(events))
      val takedownSec = (System.nanoTime() - t0) / 1e9
      println(f"TAKEDOWN takedown+recovery $takedownSec%.2f s")

      // ---- equality vs from-scratch over the kept events ----
      val kept = events.filter(pmod(col("user_id"), lit(9)) =!= 0)
        .localCheckpoint()
      val wantCounts = CoPresence.pairs(kept, "user_id", "ts",
          cfg.windowSec, 1, cfg.maxWindowActors)
        .select(col("ua").cast("long").as("ua"),
          col("ub").cast("long").as("ub"), col("shared").as("n"))
        .localCheckpoint()
      val gotCounts = CoPresenceStore.read(spark, countsPath)
      val cDiff = gotCounts.exceptAll(wantCounts).count() +
        wantCounts.exceptAll(gotCounts).count()
      println(s"TAKEDOWN counts rows=${gotCounts.count()} diff=$cDiff")

      val wantEdges = wantCounts.filter(col("n") >= cfg.minShared)
        .select(col("ua"), col("ub"))
      val gotEdges =
        if (PairGraphStore.exists(spark, graphPath))
          PairGraphStore.open(spark, graphPath).edges
            .select(col("ua"), col("ub"))
        else spark.range(0).select(col("id").as("ua"), col("id").as("ub"))
      val eDiff = gotEdges.exceptAll(wantEdges).count() +
        wantEdges.exceptAll(gotEdges).count()
      println(s"TAKEDOWN edges=${gotEdges.count()} diff=$eDiff")

      val wantLabels = LabelPropagation.run(wantEdges, "ua", "ub", rounds = 3)
      val gotLabels =
        if (PairGraphStore.exists(spark, graphPath))
          PairGraphStore.open(spark, graphPath).ensureCommunities(rounds = 3)
            .select(col("node"), col("community"))
        else spark.range(0).select(col("id").as("node"), col("id").as("community"))
      val lDiff = gotLabels.exceptAll(wantLabels).count() +
        wantLabels.exceptAll(gotLabels).count()
      println(s"TAKEDOWN labels=${gotLabels.count()} diff=$lDiff")

      if (cDiff + eDiff + lDiff > 0) {
        println("TAKEDOWN FAILED: maintained state != from-scratch over kept")
        sys.exit(1)
      }
      println(f"TAKEDOWN OK ${k}x: absorb $absorbSec%.2f s, " +
        f"takedown $takedownSec%.2f s, state == from-scratch over kept")
    } finally {
      spark.stop()
      ScaleProbe.deleteRecursively(java.nio.file.Paths.get(work))
    }
  }
}
