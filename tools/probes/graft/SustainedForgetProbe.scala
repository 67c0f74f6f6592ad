package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.dedup.{LshStore, MinHashLSH}
import graft.operators.{CoPresence, CoPresenceStore, PairGraphStore, PostingsStore}
import graft.streaming.{StreamingEventsGraph, StreamingForget}

/** Deep-tier probe for the SUSTAINED unified-takedown stream: 20 mixed
  * (kind, id) micro-batches against a k-fold replica, with auto-compact
  * firing MID-STREAM on the merge-on-read stores. Asserts the end state
  * equals from-scratch over the kept corpus + kept events, and prints a
  * per-batch serve timing (fixed delta dedup + BM25 probe) so the
  * COVERAGE tier row can show the serve path FLAT across the compact
  * boundary — the claim that tombstone hygiene neither wedges the
  * stream nor degrades serving under a production deletion stream.
  *
  * Usage: runMain graft.SustainedForgetProbe [k] [srcSf]
  */
object SustainedForgetProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(8)
    val src = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")

    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory(s"forget$k").toString
    try {
      // k-fold replicas, ids offset, docs near- (not exact-) duplicated
      // (the ScaleProbe recipe)
      val docsBase = spark.read.parquet(s"$src/documents.parquet")
        .select(col("doc_id"), col("text"))
      val maxD = docsBase.agg(max(col("doc_id"))).first().getLong(0) + 1L
      (0 until k).map(r => docsBase
          .withColumn("doc_id", col("doc_id") + lit(r.toLong * maxD))
          .withColumn("text", concat(col("text"), lit(" rep"), lit(r))))
        .reduce(_ unionByName _)
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$work/documents.parquet")
      val docs = spark.read.parquet(s"$work/documents.parquet")
      val evBase = spark.read.parquet(s"$src/events.parquet")
        .select(col("user_id"), col("ts"))
      val maxU = evBase.agg(max(col("user_id"))).first().getLong(0) + 1L
      (0 until k).map(r => evBase.withColumn("user_id",
          col("user_id") + lit(r.toLong * maxU)))
        .reduce(_ unionByName _)
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$work/events.parquet")
      val events = spark.read.parquet(s"$work/events.parquet")
      println(s"FORGET ${k}x docs=${docs.count()} events=${events.count()}")

      def pairsOf(corpus: DataFrame): DataFrame =
        MinHashLSH.verifyJaccard(
          MinHashLSH.candidatePairs(corpus, "doc_id", "text",
            numHashes = 128, bands = 32, shingleN = 3),
          corpus, "doc_id", "text", shingleN = 3, minJaccard = 0.8)
          .select(col("doc_a"), col("doc_b"))

      var t0 = System.nanoTime()
      val lsh = LshStore.build(docs, "doc_id", "text", s"$work/lsh")
      val ps = PostingsStore.build(docs, "doc_id", "text", s"$work/postings",
        nBuckets = 16)
      val g = PairGraphStore.build(pairsOf(docs), "doc_a", "doc_b", None,
        s"$work/graph")
      g.ensureCommunities(rounds = 3)
      val cfg = CoPresenceStore.Config(
        windowSec = 600, minShared = 3, maxWindowActors = 100)
      CoPresenceStore.create(spark, s"$work/counts", cfg)
      StreamingEventsGraph.process(events, 0L, s"$work/counts", s"$work/egraph")
      println(f"FORGET builds ${(System.nanoTime() - t0) / 1e9}%.2f s")

      val doc = StreamingForget.DocTargets(lsh, g, maxK = 4,
        postings = Some(ps))
      val actor = StreamingForget.ActorTargets(s"$work/counts",
        s"$work/egraph", events = Some(events))
      // serve probe: a fixed 1%-sized fresh delta, ids disjoint from
      // the corpus and every removed slice
      val probe = docs.filter(pmod(col("doc_id"), lit(100)) === 3)
        .withColumn("doc_id", col("doc_id") + lit(100L * maxD * k))
        .localCheckpoint()
      val terms = Seq("vector", "stream", "window")

      val times = Array.ofDim[Double](20)
      val compactAt = scala.collection.mutable.ArrayBuffer.empty[Int]
      (0 until 20).foreach { b =>
        val batch = docs.filter(pmod(col("doc_id"), lit(40)) === b)
          .select(lit("doc").as("kind"), col("doc_id").cast("long").as("id"))
          .unionByName(events.select(col("user_id")).distinct()
            .filter(pmod(col("user_id"), lit(100)) === b)
            .select(lit("actor").as("kind"), col("user_id").cast("long").as("id")))
        val hadLedger = lsh.removedIds.count() > 0
        t0 = System.nanoTime()
        StreamingForget.process(batch, b.toLong, doc, actor)
        val batchSec = (System.nanoTime() - t0) / 1e9
        if (hadLedger && lsh.removedIds.count() == 0) compactAt += b
        t0 = System.nanoTime()
        val n = lsh.nearDupsOfDelta(probe, "text", minJaccard = 0.8).count()
        val s = ps.bm25Search(terms, k = 20).count()
        times(b) = (System.nanoTime() - t0) / 1e9
        println(f"FORGET batch $b%2d: process $batchSec%.2f s, " +
          f"serve ${times(b)}%.2f s (dedup=$n, search=$s)")
      }
      require(compactAt.nonEmpty,
        "auto-compact must fire mid-stream at this removal rate")
      println(s"FORGET compactions at batches ${compactAt.mkString(",")}")
      def median(xs: Seq[Double]): Double = {
        val s = xs.sorted; s(s.length / 2)
      }
      val pre = median(times.take(compactAt.head).toSeq)
      val post = median(times.drop(compactAt.head + 1).toSeq)
      println(f"FORGET serve median pre-compact $pre%.2f s, post $post%.2f s")

      // ---- end state == from-scratch over kept corpus + kept events
      val kept = docs.filter(pmod(col("doc_id"), lit(40)) >= 20)
        .localCheckpoint()
      val keptEv = events.filter(pmod(col("user_id"), lit(100)) >= 20)
        .localCheckpoint()
      val keptLsh = LshStore.build(kept, "doc_id", "text", s"$work/lshref")
      val a1 = lsh.nearDupsOfDelta(probe, "text", minJaccard = 0.8)
      val b1 = keptLsh.nearDupsOfDelta(probe, "text", minJaccard = 0.8)
      val dDedup = a1.exceptAll(b1).count() + b1.exceptAll(a1).count()
      val keptPs = PostingsStore.build(kept, "doc_id", "text",
        s"$work/psref", nBuckets = 16)
      val a2 = ps.bm25Search(terms, k = 20)
      val b2 = keptPs.bm25Search(terms, k = 20)
      val dSearch = a2.exceptAll(b2).count() + b2.exceptAll(a2).count()
      val keptG = PairGraphStore.build(pairsOf(kept), "doc_a", "doc_b", None,
        s"$work/gref")
      val a3 = g.ensureCommunities(rounds = 3)
      val b3 = keptG.ensureCommunities(rounds = 3)
      val dGraph = a3.exceptAll(b3).count() + b3.exceptAll(a3).count()
      val wantCounts = CoPresence.pairs(keptEv, "user_id", "ts",
          cfg.windowSec, 1, cfg.maxWindowActors)
        .select(col("ua").cast("long").as("ua"),
          col("ub").cast("long").as("ub"), col("shared").as("n"))
      val gotCounts = CoPresenceStore.read(spark, s"$work/counts")
      val dCounts = gotCounts.exceptAll(wantCounts).count() +
        wantCounts.exceptAll(gotCounts).count()
      println(s"FORGET diffs: dedup=$dDedup search=$dSearch " +
        s"graph=$dGraph counts=$dCounts")
      if (dDedup + dSearch + dGraph + dCounts > 0) {
        println("FORGET FAILED: end state != from-scratch over kept")
        sys.exit(1)
      }
      println(f"FORGET OK ${k}x: 20 mixed batches, compactions at " +
        f"${compactAt.mkString("/")}, serve pre $pre%.2f s post $post%.2f s, " +
        "state == from-scratch over kept")
    } finally {
      spark.stop()
      ScaleProbe.deleteRecursively(java.nio.file.Paths.get(work))
    }
  }
}
