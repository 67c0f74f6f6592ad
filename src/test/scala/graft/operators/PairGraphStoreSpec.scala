package graft.operators

import java.nio.file.Files
import graft.SparkSpec
import graft.ann.Ann
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The pair-graph store's two contracts: (1) fidelity — the stored
  * edge frame IS the generator's frame, bit for bit; (2) consumer
  * equality — every graph metric computed from the store equals the
  * same metric computed inline, which is what lets the store-served
  * queries keep the inline queries' oracles and spec posture. */
class PairGraphStoreSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("pairgraph").toString + "/store"

  private def inlinePairs: DataFrame =
    Ann.lshNearDupPairs(graft.Tables.load(spark, sf001, "embeddings"),
      "vec_id", "embedding", threshold = 0.35, nBits = 8, tables = 8,
      dim = 64, maxBucketSize = 10000)

  private def asSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("round-trip fidelity: stored edges equal the generator frame exactly") {
    val path = tmp()
    val h = PairGraphStore.build(inlinePairs, "vec_a", "vec_b", Some("cos"), path)
    assert(asSet(h.edges.select(col("vec_a"), col("vec_b"), col("cos"))) ==
      asSet(inlinePairs.select(col("vec_a"), col("vec_b"), col("cos"))))
    // canonical orientation survives the round trip
    assert(h.edges.filter(col("vec_a") >= col("vec_b")).isEmpty)
    val reopened = PairGraphStore.open(spark, path)
    assert(reopened.srcCol == "vec_a" && reopened.dstCol == "vec_b" &&
      reopened.weightCol.contains("cos"))
  }

  test("consumer equality: LPA, weighted LPA and k-core match the inline route") {
    val path = tmp()
    val stored = PairGraphStore
      .build(inlinePairs, "vec_a", "vec_b", Some("cos"), path).edges
    val inline = inlinePairs.localCheckpoint()

    def lpa(e: DataFrame, w: Option[String]) =
      LabelPropagation.run(e, "vec_a", "vec_b", rounds = 3, weightCol = w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa(stored, None) == lpa(inline, None))
    assert(lpa(stored, Some("cos")) == lpa(inline, Some("cos")))

    def kcore(e: DataFrame) = KCore.run(e, "vec_a", "vec_b", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kcore(stored) == kcore(inline))
  }

  test("ensure builds once, then serves without running the generator") {
    val path = tmp()
    var generatorRuns = 0
    def gen: DataFrame = { generatorRuns += 1; inlinePairs }
    val h1 = PairGraphStore.ensure(gen, "vec_a", "vec_b", Some("cos"), spark, path)
    val n = h1.edgeCount
    assert(generatorRuns == 1 && n > 0)
    val h2 = PairGraphStore.ensure(gen, "vec_a", "vec_b", Some("cos"), spark, path)
    assert(generatorRuns == 1, "existing store must not re-run the generator")
    assert(h2.edgeCount == n)
  }

  test("append folds a delta in; compact preserves the edge set") {
    val sp = spark; import sp.implicits._
    val path = tmp()
    val base = Seq((1L, 2L, 0.9), (2L, 3L, 0.8)).toDF("vec_a", "vec_b", "cos")
    val delta = Seq((1L, 4L, 0.7)).toDF("vec_a", "vec_b", "cos")
    val h = PairGraphStore.build(base, "vec_a", "vec_b", Some("cos"), path)
    h.append(delta)
    assert(asSet(h.edges) ==
      Set((1L, 2L, 0.9), (2L, 3L, 0.8), (1L, 4L, 0.7)))
    PairGraphStore.compact(h, targetFiles = 2)
    assert(asSet(h.edges) ==
      Set((1L, 2L, 0.9), (2L, 3L, 0.8), (1L, 4L, 0.7)))
    // an empty delta is a no-op, not an error
    h.append(delta.limit(0))
    assert(h.edgeCount == 3)
  }

  private def listStateFiles(h: PairGraphStore.Handle, sub: String)
      : Map[String, (Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"${h.path}/$sub/data")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(d: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(d).toSeq.flatMap(s =>
        if (s.isDirectory) walk(s.getPath) else Seq(s))
    walk(p).filter(_.getPath.getName.startsWith("part-"))
      .map(s => s.getPath.toString -> (s.getLen, s.getModificationTime)).toMap
  }

  private def fromScratchLabels(edges: DataFrame, rounds: Int,
      w: Option[String]): Map[Long, (Long, Long)] = {
    val labels = LabelPropagation.run(edges, "vec_a", "vec_b", rounds, weightCol = w)
    val comps = graft.dedup.ConnectedComponents.runAdaptive(edges, "vec_a", "vec_b")
    labels.join(comps.withColumnRenamed("member", "node"), Seq("node"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  private def asLabelMap(df: DataFrame): Map[Long, (Long, Long)] =
    df.select(col("node"), col("community"), col("comp"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("append dedups: re-appended and duplicated weighted pairs never double") {
    val sp = spark; import sp.implicits._
    val h = PairGraphStore.build(
      Seq((1L, 2L, 0.9)).toDF("vec_a", "vec_b", "cos"),
      "vec_a", "vec_b", Some("cos"), tmp())
    // within-batch duplicate with two different weights: one row, max
    val dup = Seq((1L, 3L, 0.5), (1L, 3L, 0.7)).toDF("vec_a", "vec_b", "cos")
    h.append(dup)
    assert(asSet(h.edges) == Set((1L, 2L, 0.9), (1L, 3L, 0.7)))
    // re-appending an already-stored pair is a no-op (replayed batch)
    h.append(dup)
    assert(h.edgeCount == 2)
    h.append(Seq((1L, 2L, 0.9)).toDF("vec_a", "vec_b", "cos"))
    assert(h.edgeCount == 2)
  }

  test("cores maintenance rewrites only changed partitions; results equal from-scratch") {
    val sp = spark; import sp.implicits._
    // two far-apart families: a triangle at {1,2,3} and one at
    // {40,41,42}; the delta closes a square onto the first only
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (40L, 41L), (41L, 42L), (40L, 42L))
      .toDF("vec_a", "vec_b")
    val delta = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("vec_a", "vec_b")
    val h = PairGraphStore.build(base, "vec_a", "vec_b", None, tmp())
    h.ensureCores(maxK = 3)
    val before = listStateFiles(h, "graphcores")
    val maintained = h.appendAndMaintainCores(delta, maxK = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = KCore.coreNumbers(base.unionByName(delta), "vec_a", "vec_b", 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(maintained == want)
    assert(h.ensureCores(3).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      == want, "persisted state must match the returned frame")
    val after = listStateFiles(h, "graphcores")
    // the untouched family's partitions (pb 8, 9, 10 for nodes
    // 40..42) keep their exact files; the changed family's (pb 1..4)
    // were rewritten
    val untouched = before.keys.filter(k =>
      Seq(8, 9, 10).exists(pb => k.contains(s"pb=$pb/")))
    assert(untouched.nonEmpty, "fixture must produce untouched partitions")
    untouched.foreach { k =>
      assert(after.get(k).contains(before(k)),
        s"untouched partition file changed: $k")
    }
    assert(before.keys.exists(k => k.contains("pb=4/") && !after.contains(k)) ||
      after.keys.exists(k => k.contains("pb=4/") && !before.contains(k)),
      "changed partitions must have been rewritten")
  }

  test("community maintenance equals from-scratch LPA on a planted merge") {
    val sp = spark; import sp.implicits._
    // three communities; the delta merges the first two through a NEW
    // node (50) and leaves the third untouched
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("vec_a", "vec_b")
    val delta = Seq((3L, 50L), (50L, 10L)).toDF("vec_a", "vec_b")
    val h = PairGraphStore.build(base, "vec_a", "vec_b", None, tmp())
    h.ensureCommunities(rounds = 3)
    val before = listStateFiles(h, "graphlabels")
    val maintained = asLabelMap(h.appendAndMaintainCommunities(delta, rounds = 3))
    val want = fromScratchLabels(base.unionByName(delta), 3, None)
    assert(maintained == want,
      s"diff=${(maintained.toSet -- want.toSet).take(5)} / ${(want.toSet -- maintained.toSet).take(5)}")
    // persisted state serves the same rows
    assert(asLabelMap(h.ensureCommunities(rounds = 3)) == want)
    // the untouched community's partitions (pb 20..22) keep their files
    val after = listStateFiles(h, "graphlabels")
    val untouched = before.keys.filter(k =>
      Seq(20, 21, 22).exists(pb => k.contains(s"pb=$pb/")))
    assert(untouched.nonEmpty, "fixture must produce untouched partitions")
    untouched.foreach { k =>
      assert(after.get(k).contains(before(k)),
        s"untouched partition file changed: $k")
    }
    // replay: the same delta again is a no-op on edges and labels
    val replayed = asLabelMap(h.appendAndMaintainCommunities(delta, rounds = 3))
    assert(replayed == want)
    assert(h.edgeCount == base.count() + delta.count())
  }

  test("community maintenance equals from-scratch on randomized graph/delta splits") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(11L)
    for (trial <- 1 to 3) {
      val n = 40 + rnd.nextInt(30)
      // unique by PAIR (not by tuple): a pair recurring with two
      // weights would make the raw union and the deduped store vote
      // differently — the store's dedup contract is per-pair
      val all = (0 until (n * 2)).map { _ =>
          val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
          (math.min(a, b), math.max(a, b),
            math.rint(rnd.nextDouble() * 100) / 100 + 0.01)
        }.filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      val (baseE, deltaE) = all.partition(_ => rnd.nextDouble() < 0.75)
      if (baseE.nonEmpty && deltaE.nonEmpty) {
        val base = baseE.toDF("vec_a", "vec_b", "cos")
        val delta = deltaE.toDF("vec_a", "vec_b", "cos")
        val h = PairGraphStore.build(base, "vec_a", "vec_b", Some("cos"), tmp())
        // weighted voting exercised on odd trials
        val weighted = trial % 2 == 1
        val got = asLabelMap(
          h.appendAndMaintainCommunities(delta, rounds = 3, weighted = weighted))
        val want = fromScratchLabels(base.unionByName(delta), 3,
          if (weighted) Some("cos") else None)
        assert(got == want, s"trial $trial (weighted=$weighted): " +
          s"diff=${(got.toSet -- want.toSet).take(5)} / ${(want.toSet -- got.toSet).take(5)}")
      }
    }
  }

  test("community revocation equals from-scratch on a planted split; files; replay") {
    val sp = spark; import sp.implicits._
    // one 6-cycle (splits into two paths when two opposite edges go)
    // and an untouched triangle
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (1L, 6L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("vec_a", "vec_b")
    val gone = Seq((2L, 3L), (5L, 6L)).toDF("vec_a", "vec_b")
    val h = PairGraphStore.build(base, "vec_a", "vec_b", None, tmp())
    h.ensureCommunities(rounds = 3)
    val before = listStateFiles(h, "graphlabels")
    val maintained = asLabelMap(
      h.removeEdgesAndMaintainCommunities(gone, rounds = 3))
    val kept = base.join(gone, Seq("vec_a", "vec_b"), "left_anti")
    val want = fromScratchLabels(kept, 3, None)
    assert(maintained == want,
      s"diff=${(maintained.toSet -- want.toSet).take(5)} / ${(want.toSet -- maintained.toSet).take(5)}")
    // the cycle genuinely split: two component ids where there was one
    assert(maintained.filter(_._1 <= 6L).values.map(_._2).toSet.size == 2)
    // persisted state serves the same rows; the edge view is the kept set
    assert(asLabelMap(h.ensureCommunities(rounds = 3)) == want)
    assert(h.edges.count() == kept.count())
    // the untouched triangle's partitions keep their files
    val after = listStateFiles(h, "graphlabels")
    val untouched = before.keys.filter(k =>
      Seq(20, 21, 22).exists(pb => k.contains(s"pb=$pb/")))
    assert(untouched.nonEmpty, "fixture must produce untouched partitions")
    untouched.foreach { k =>
      assert(after.get(k).contains(before(k)),
        s"untouched partition file changed: $k")
    }
    // replay: the same revocation again is a no-op on edges and labels
    val replayFiles = listStateFiles(h, "graphlabels")
    assert(asLabelMap(h.removeEdgesAndMaintainCommunities(gone, rounds = 3))
      == want)
    assert(listStateFiles(h, "graphlabels") == replayFiles,
      "a fully-replayed revocation must rewrite no label partitions")
    // crash window: tombstones landed, labels stale — simulate the
    // ledger write revoke() performs (labels untouched), then replay
    val h2 = PairGraphStore.build(base, "vec_a", "vec_b", None, tmp())
    h2.ensureCommunities(rounds = 3)
    gone.select(col("vec_a").cast("long").as("a"),
        col("vec_b").cast("long").as("b"))
      .coalesce(1).write.mode("append").parquet(s"${h2.path}/removededges")
    assert(asLabelMap(h2.removeEdgesAndMaintainCommunities(gone, rounds = 3))
      == want, "replay over a tombstones-landed/labels-stale window")
  }

  test("community revocation: isolated nodes drop; randomized splits equal from-scratch") {
    val sp = spark; import sp.implicits._
    // node 9 loses its only edge: it must leave the labels state
    val base = Seq((1L, 2L), (2L, 3L), (3L, 9L)).toDF("vec_a", "vec_b")
    val h = PairGraphStore.build(base, "vec_a", "vec_b", None, tmp())
    h.ensureCommunities(rounds = 3)
    val got = asLabelMap(h.removeEdgesAndMaintainCommunities(
      Seq((3L, 9L)).toDF("vec_a", "vec_b"), rounds = 3))
    assert(!got.contains(9L), "isolated node must drop from the state")
    assert(got == fromScratchLabels(Seq((1L, 2L), (2L, 3L)).toDF("vec_a", "vec_b"), 3, None))

    val rnd = new scala.util.Random(23L)
    for (trial <- 1 to 3) {
      val n = 40 + rnd.nextInt(30)
      val all = (0 until (n * 2)).map { _ =>
          val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
          (math.min(a, b), math.max(a, b),
            math.rint(rnd.nextDouble() * 100) / 100 + 0.01)
        }.filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      val (goneE, keptE) = all.partition(_ => rnd.nextDouble() < 0.25)
      if (goneE.nonEmpty && keptE.nonEmpty) {
        val full = all.toDF("vec_a", "vec_b", "cos")
        val gone = goneE.toDF("vec_a", "vec_b", "cos")
        val h2 = PairGraphStore.build(full, "vec_a", "vec_b", Some("cos"), tmp())
        val weighted = trial % 2 == 1
        h2.ensureCommunities(rounds = 3, weighted = weighted)
        val got2 = asLabelMap(h2.removeEdgesAndMaintainCommunities(
          gone, rounds = 3, weighted = weighted))
        val want2 = fromScratchLabels(keptE.toDF("vec_a", "vec_b", "cos"), 3,
          if (weighted) Some("cos") else None)
        assert(got2 == want2, s"trial $trial (weighted=$weighted): " +
          s"diff=${(got2.toSet -- want2.toSet).take(5)} / ${(want2.toSet -- got2.toSet).take(5)}")
      }
    }
  }

  private def asGsMap(df: DataFrame): Map[Long, Seq[Double]] =
    df.select(col("node"), col("gs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  private def fromScratchGs(edges: DataFrame, w: Option[String])
      : Map[Long, Seq[Double]] = {
    val sym = edges.select((Seq(col("vec_a").as("src"), col("vec_b").as("dst"))
        ++ w.map(col)): _*)
      .unionByName(edges.select((Seq(col("vec_b").as("src"), col("vec_a").as("dst"))
        ++ w.map(col)): _*))
    asGsMap(PageRank.gIterates(sym, "src", "dst", 3, weightCol = w))
  }

  test("rank maintenance equals from-scratch g-iterates bit-for-bit on a planted patch") {
    val sp = spark; import sp.implicits._
    // two far-apart families; the delta attaches a NEW node to the
    // first only — under pr the 1/N shift would touch everybody, but
    // the N-free iterates of the untouched family must not move
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (40L, 41L), (41L, 42L), (40L, 42L))
      .toDF("vec_a", "vec_b")
    val delta = Seq((3L, 50L)).toDF("vec_a", "vec_b")
    val h = PairGraphStore.build(base, "vec_a", "vec_b", None, tmp())
    val oldGs = asGsMap(h.ensureRanks())
    val before = listStateFiles(h, "graphranks")
    val maintained = asGsMap(h.appendAndMaintainRanks(delta))
    val want = fromScratchGs(base.unionByName(delta), None)
    assert(maintained == want,
      s"diff=${maintained.toSet.diff(want.toSet).take(3)} / ${want.toSet.diff(maintained.toSet).take(3)}")
    // the untouched family's iterates did not move AT ALL
    Seq(40L, 41L, 42L).foreach(k => assert(maintained(k) == oldGs(k)))
    // persisted state serves the same rows; untouched partitions keep files
    assert(asGsMap(h.ensureRanks()) == want)
    val after = listStateFiles(h, "graphranks")
    val untouched = before.keys.filter(k =>
      Seq(8, 9, 10).exists(pb => k.contains(s"pb=$pb/")))
    assert(untouched.nonEmpty, "fixture must produce untouched partitions")
    untouched.foreach { k =>
      assert(after.get(k).contains(before(k)),
        s"untouched partition file changed: $k")
    }
    // serve layer: pr sums to ~1 over the grown graph and agrees with
    // the inline run route at 1e-12 relative
    val pr = h.pageRanks().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    val sym = base.unionByName(delta)
    val inline = PageRank.run(
        sym.select($"vec_a".as("src"), $"vec_b".as("dst"))
          .unionByName(sym.select($"vec_b".as("src"), $"vec_a".as("dst"))),
        "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("pr")).toMap
    inline.foreach { case (k, v) =>
      assert(math.abs(pr(k) - v) <= 1e-12 * math.max(1.0, math.abs(v))) }
    // replay: the same delta again is a no-op on edges and values
    val replayed = asGsMap(h.appendAndMaintainRanks(delta))
    assert(replayed == want)
    assert(h.edgeCount == base.count() + delta.count())
  }

  test("rank maintenance equals from-scratch on randomized graph/delta splits") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(17L)
    for (trial <- 1 to 3) {
      val n = 40 + rnd.nextInt(30)
      val all = (0 until (n * 2)).map { _ =>
          val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
          (math.min(a, b), math.max(a, b),
            math.rint(rnd.nextDouble() * 100) / 100 + 0.01)
        }.filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      val (baseE, deltaE) = all.partition(_ => rnd.nextDouble() < 0.75)
      if (baseE.nonEmpty && deltaE.nonEmpty) {
        val base = baseE.toDF("vec_a", "vec_b", "cos")
        val delta = deltaE.toDF("vec_a", "vec_b", "cos")
        val h = PairGraphStore.build(base, "vec_a", "vec_b", Some("cos"), tmp())
        val weighted = trial % 2 == 1
        val got = asGsMap(h.appendAndMaintainRanks(delta, weighted = weighted))
        val want = fromScratchGs(base.unionByName(delta),
          if (weighted) Some("cos") else None)
        assert(got == want, s"trial $trial (weighted=$weighted): " +
          s"diff=${got.toSet.diff(want.toSet).take(3)} / ${want.toSet.diff(got.toSet).take(3)}")
      }
    }
  }

  test("rank revocation equals from-scratch bit-for-bit; isolated nodes drop; replay stable") {
    val sp = spark; import sp.implicits._
    // two families joined by a bridge, plus a pendant; revoking the
    // bridge + the pendant's only edge must (a) keep far-family
    // iterates that are > T hops from any deleted endpoint unmoved,
    // (b) drop the isolated pendant from the state entirely
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 40L),
        (40L, 41L), (41L, 42L), (40L, 42L), (42L, 43L), (43L, 44L),
        (44L, 45L), (45L, 46L), (1L, 60L))
      .toDF("vec_a", "vec_b")
    val gone = Seq((3L, 40L), (1L, 60L)).toDF("vec_a", "vec_b")
    val kept = Seq((1L, 2L), (2L, 3L), (1L, 3L),
        (40L, 41L), (41L, 42L), (40L, 42L), (42L, 43L), (43L, 44L),
        (44L, 45L), (45L, 46L))
      .toDF("vec_a", "vec_b")
    val h = PairGraphStore.build(base, "vec_a", "vec_b", None, tmp())
    h.ensureRanks()
    val maintained = asGsMap(h.removeEdgesAndMaintainRanks(gone))
    val want = fromScratchGs(kept, None)
    assert(maintained == want,
      s"diff=${maintained.toSet.diff(want.toSet).take(3)} / ${want.toSet.diff(maintained.toSet).take(3)}")
    assert(!maintained.contains(60L), "isolated node must leave the state")
    // persisted state serves the same rows; edge view excludes the batch
    assert(asGsMap(h.ensureRanks()) == want)
    assert(h.edgeCount == 10)
    // replay recomputes the same patch to the same values
    assert(asGsMap(h.removeEdgesAndMaintainRanks(gone)) == want)
  }

  test("rank revocation equals from-scratch on randomized splits") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(19L)
    for (trial <- 1 to 3) {
      val n = 40 + rnd.nextInt(30)
      val all = (0 until (n * 2)).map { _ =>
          val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
          (math.min(a, b), math.max(a, b),
            math.rint(rnd.nextDouble() * 100) / 100 + 0.01)
        }.filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      val (deletedE, keptE) = all.partition(_ => rnd.nextInt(5) == 0)
      if (deletedE.nonEmpty && keptE.nonEmpty) {
        val h = PairGraphStore.build(all.toDF("vec_a", "vec_b", "cos"),
          "vec_a", "vec_b", Some("cos"), tmp())
        val weighted = trial % 2 == 1
        h.ensureRanks(weighted = weighted)
        val got = asGsMap(h.removeEdgesAndMaintainRanks(
          deletedE.toDF("vec_a", "vec_b", "cos"), weighted = weighted))
        val want = fromScratchGs(keptE.toDF("vec_a", "vec_b", "cos"),
          if (weighted) Some("cos") else None)
        assert(got == want, s"trial $trial (weighted=$weighted): " +
          s"diff=${got.toSet.diff(want.toSet).take(3)} / ${want.toSet.diff(got.toSet).take(3)}")
      }
    }
  }

  private def asDsMap(df: DataFrame): Map[Long, Seq[Double]] =
    df.select(col("node"), col("ds"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  private def fromScratchDs(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      cost: DataFrame => DataFrame): Map[Long, Seq[Double]] =
    asDsMap(MinPlusDistances.iterates(cost(edges), "src", "dst", "w",
      seeds, maxHops))

  test("distance maintenance equals from-scratch iterates; improvements only; replay no-op") {
    val sp = spark; import sp.implicits._
    // two families; seeds in the first; the delta opens a shortcut
    // into the second THROUGH a new node
    def sym(e: DataFrame): DataFrame =
      e.select($"vec_a".as("src"), $"vec_b".as("dst"), (lit(1.0) - $"cos").as("w"))
        .unionByName(
          e.select($"vec_b".as("src"), $"vec_a".as("dst"), (lit(1.0) - $"cos").as("w")))
    val base = Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (40L, 41L, 0.9), (41L, 42L, 0.7))
      .toDF("vec_a", "vec_b", "cos")
    val delta = Seq((3L, 50L, 0.95), (40L, 50L, 0.9)).toDF("vec_a", "vec_b", "cos")
    val seeds = Seq(1L).toDF("node")
    val h = PairGraphStore.build(base, "vec_a", "vec_b", Some("cos"), tmp())
    val oldDs = asDsMap(h.ensureDistances("s1", seeds, maxHops = 4,
      costMode = "oneMinusWeight"))
    // the far family is unreached before the delta
    assert(!oldDs.contains(40L))
    val before = listStateFiles(h, "graphdists_s1")
    val maintained = asDsMap(h.appendAndMaintainDistances(delta, "s1", seeds,
      maxHops = 4, costMode = "oneMinusWeight"))
    val want = fromScratchDs(base.unionByName(delta), seeds, 4, sym)
    assert(maintained == want,
      s"diff=${maintained.toSet.diff(want.toSet).take(3)} / ${want.toSet.diff(maintained.toSet).take(3)}")
    // monotone contract: no maintained value exceeds the stored one
    oldDs.foreach { case (k, ds) =>
      ds.zip(maintained(k)).foreach { case (o, m) => assert(m <= o) } }
    // seed row untouched — its partition keeps its file
    val after = listStateFiles(h, "graphdists_s1")
    val untouched = before.keys.filter(_.contains("pb=1/"))
    assert(untouched.nonEmpty)
    untouched.foreach(k => assert(after.get(k).contains(before(k)),
      s"untouched partition file changed: $k"))
    // persisted state serves the same rows; replay improves nothing
    assert(asDsMap(h.ensureDistances("s1", seeds, 4, "oneMinusWeight")) == want)
    val afterReplay = listStateFiles(h, "graphdists_s1")
    assert(asDsMap(h.appendAndMaintainDistances(delta, "s1", seeds, 4,
      "oneMinusWeight")) == want)
    assert(listStateFiles(h, "graphdists_s1") == afterReplay,
      "replay must rewrite no state partitions")
  }

  test("distance maintenance equals from-scratch on randomized splits and cost modes") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(43L)
    for (trial <- 1 to 3) {
      val n = 30 + rnd.nextInt(30)
      val all = (0 until (n * 2)).map { _ =>
          val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
          (math.min(a, b), math.max(a, b),
            math.rint(rnd.nextDouble() * 80) / 100 + 0.1)
        }.filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      val (baseE, deltaE) = all.partition(_ => rnd.nextDouble() < 0.7)
      if (baseE.nonEmpty && deltaE.nonEmpty) {
        val base = baseE.toDF("vec_a", "vec_b", "cos")
        val delta = deltaE.toDF("vec_a", "vec_b", "cos")
        val seeds = (0 until 2).map(_ => rnd.nextInt(n).toLong).distinct.toDF("node")
        val mode = if (trial % 2 == 1) "oneMinusWeight" else "unit"
        def symM(e: DataFrame): DataFrame = {
          val c = if (mode == "unit") lit(1.0) else lit(1.0) - $"cos"
          e.select($"vec_a".as("src"), $"vec_b".as("dst"), c.as("w"))
            .unionByName(e.select($"vec_b".as("src"), $"vec_a".as("dst"), c.as("w")))
        }
        val h = PairGraphStore.build(base, "vec_a", "vec_b", Some("cos"), tmp())
        val got = asDsMap(h.appendAndMaintainDistances(delta, "r", seeds,
          maxHops = 3, costMode = mode))
        val want = fromScratchDs(base.unionByName(delta), seeds, 3, symM)
        assert(got == want, s"trial $trial mode=$mode: " +
          s"diff=${got.toSet.diff(want.toSet).take(3)} / ${want.toSet.diff(got.toSet).take(3)}")
      }
    }
  }

  test("distance revocation equals from-scratch; unreached drop; files; replay") {
    val sp = spark; import sp.implicits._
    def sym(e: DataFrame): DataFrame =
      e.select($"vec_a".as("src"), $"vec_b".as("dst"), (lit(1.0) - $"cos").as("w"))
        .unionByName(
          e.select($"vec_b".as("src"), $"vec_a".as("dst"), (lit(1.0) - $"cos").as("w")))
    // near family: seed 1, detour 1-2-3 (cost .3) under a shortcut 1-3
    // (cost .05), node 7 hanging off 3; far family seeded at 40,
    // DISCONNECTED — outside any kept-hop radius of the deletion
    val base = Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (1L, 3L, 0.95), (3L, 7L, 0.9),
      (40L, 41L, 0.9), (41L, 42L, 0.7)).toDF("vec_a", "vec_b", "cos")
    val gone = Seq((1L, 3L, 0.95), (3L, 7L, 0.9)).toDF("vec_a", "vec_b", "cos")
    val seeds = Seq(1L, 40L).toDF("node")
    val h = PairGraphStore.build(base, "vec_a", "vec_b", Some("cos"), tmp())
    val oldDs = asDsMap(h.ensureDistances("s1", seeds, maxHops = 4,
      costMode = "oneMinusWeight"))
    assert(oldDs.contains(7L), "fixture: 7 reached before the deletion")
    val before = listStateFiles(h, "graphdists_s1")
    val maintained = asDsMap(h.removeEdgesAndMaintainDistances(gone, "s1",
      seeds, maxHops = 4, costMode = "oneMinusWeight"))
    val kept = base.join(gone.select($"vec_a", $"vec_b"),
      Seq("vec_a", "vec_b"), "left_anti")
    val want = fromScratchDs(kept, seeds, 4, sym)
    assert(maintained == want,
      s"diff=${maintained.toSet.diff(want.toSet).take(3)} / ${want.toSet.diff(maintained.toSet).take(3)}")
    // the shortcut's removal genuinely raised 3's distance to the detour
    assert(maintained(3L).last > oldDs(3L).last)
    // monotone contract: deletions never lower a value
    maintained.foreach { case (k, ds) =>
      oldDs.get(k).foreach(_.zip(ds).foreach { case (o, m) => assert(m >= o) }) }
    // 7 lost its only link: dropped from the state (from-scratch shape)
    assert(!maintained.contains(7L))
    // the far family is outside the affected radius: files untouched
    val after = listStateFiles(h, "graphdists_s1")
    val untouched = before.keys.filter(k =>
      Seq(8, 10).exists(pb => k.contains(s"pb=$pb/")))
    assert(untouched.nonEmpty, "fixture must produce untouched partitions")
    untouched.foreach(k => assert(after.get(k).contains(before(k)),
      s"untouched partition file changed: $k"))
    // persisted state serves the same rows; replay rewrites nothing
    assert(asDsMap(h.ensureDistances("s1", seeds, 4, "oneMinusWeight")) == want)
    val afterReplay = listStateFiles(h, "graphdists_s1")
    assert(asDsMap(h.removeEdgesAndMaintainDistances(gone, "s1", seeds, 4,
      "oneMinusWeight")) == want)
    assert(listStateFiles(h, "graphdists_s1") == afterReplay,
      "replay must rewrite no state partitions")
  }

  test("distance revocation equals from-scratch on randomized splits and cost modes") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(61L)
    for (trial <- 1 to 3) {
      val n = 30 + rnd.nextInt(30)
      val all = (0 until (n * 2)).map { _ =>
          val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
          (math.min(a, b), math.max(a, b),
            math.rint(rnd.nextDouble() * 80) / 100 + 0.1)
        }.filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      val (goneE, keptE) = all.partition(_ => rnd.nextDouble() < 0.3)
      if (goneE.nonEmpty && keptE.nonEmpty) {
        val full = all.toDF("vec_a", "vec_b", "cos")
        val gone = goneE.toDF("vec_a", "vec_b", "cos")
        val seeds = (0 until 2).map(_ => rnd.nextInt(n).toLong).distinct.toDF("node")
        val mode = if (trial % 2 == 1) "oneMinusWeight" else "unit"
        def symM(e: DataFrame): DataFrame = {
          val c = if (mode == "unit") lit(1.0) else lit(1.0) - $"cos"
          e.select($"vec_a".as("src"), $"vec_b".as("dst"), c.as("w"))
            .unionByName(e.select($"vec_b".as("src"), $"vec_a".as("dst"), c.as("w")))
        }
        val h = PairGraphStore.build(full, "vec_a", "vec_b", Some("cos"), tmp())
        h.ensureDistances("r", seeds, maxHops = 3, costMode = mode)
        val got = asDsMap(h.removeEdgesAndMaintainDistances(gone, "r", seeds,
          maxHops = 3, costMode = mode))
        val want = fromScratchDs(keptE.toDF("vec_a", "vec_b", "cos"), seeds, 3, symM)
        assert(got == want, s"trial $trial mode=$mode: " +
          s"diff=${got.toSet.diff(want.toSet).take(3)} / ${want.toSet.diff(got.toSet).take(3)}")
      }
    }
  }

  test("truss maintenance equals from-scratch; pruned partitions; replay no-op") {
    val sp = spark; import sp.implicits._
    // K4 at {1..4} missing edge (1,2); a complete K4 at {40..43};
    // the delta completes the near family's K4 only
    val base = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
        (40L, 41L), (40L, 42L), (40L, 43L), (41L, 42L), (41L, 43L), (42L, 43L))
      .toDF("vec_a", "vec_b")
    val delta = Seq((1L, 2L)).toDF("vec_a", "vec_b")
    val h = PairGraphStore.build(base, "vec_a", "vec_b", None, tmp())
    def asEdgeSet(df: DataFrame) =
      df.select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val oldT = asEdgeSet(h.ensureTruss(k = 4))
    // only the complete far K4 is in the base 4-truss
    assert(oldT == Set((40L, 41L), (40L, 42L), (40L, 43L),
      (41L, 42L), (41L, 43L), (42L, 43L)))
    val before = listStateFiles(h, "graphtruss")
    val maintained = asEdgeSet(h.appendAndMaintainTruss(delta, k = 4))
    val want = asEdgeSet(Truss.kTruss(base.unionByName(delta), "vec_a", "vec_b", 4))
    assert(maintained == want)
    assert(asEdgeSet(h.ensureTruss(4)) == want,
      "persisted state must match the returned frame")
    val after = listStateFiles(h, "graphtruss")
    // the far K4's rows (a in 40..42 → pb 8..10) keep their files;
    // the promoted near K4 writes pb 1..3
    val untouched = before.keys.filter(k =>
      Seq(8, 9, 10).exists(pb => k.contains(s"pb=$pb/")))
    assert(untouched.nonEmpty, "fixture must produce untouched partitions")
    untouched.foreach(k => assert(after.get(k).contains(before(k)),
      s"untouched partition file changed: $k"))
    assert(after.keys.exists(k => k.contains("pb=1/") && !before.contains(k)),
      "promoted edges' partitions must have been written")
    // replay: the re-delivered batch appends nothing and rewrites nothing
    assert(asEdgeSet(h.appendAndMaintainTruss(delta, k = 4)) == want)
    assert(listStateFiles(h, "graphtruss") == after,
      "replayed batch must rewrite no state partitions")
    assert(h.edgeCount == 12)
  }

  test("edge revocation maintains cores+truss; pruned partitions; replay; compact purges") {
    val sp = spark; import sp.implicits._
    // two complete K4s; revoking one near-K4 edge demotes that clique
    // (cores 3 -> 2, truss eviction) and must not touch the far one
    val base = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
        (40L, 41L), (40L, 42L), (40L, 43L), (41L, 42L), (41L, 43L), (42L, 43L))
      .toDF("vec_a", "vec_b")
    val gone = Seq((1L, 2L)).toDF("vec_a", "vec_b")
    val kept = base.join(gone, base("vec_a") === gone("vec_a") &&
        base("vec_b") === gone("vec_b"), "left_anti")
      .select(base("vec_a"), base("vec_b"))
    val h = PairGraphStore.build(base, "vec_a", "vec_b", None, tmp())
    h.ensureCores(maxK = 3)
    h.ensureTruss(k = 4)
    h.ensureCommunities(rounds = 3)
    val coresBefore = listStateFiles(h, "graphcores")
    def coresMap(df: DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = coresMap(h.removeEdgesAndMaintainCores(gone, maxK = 3))
    assert(got == coresMap(KCore.coreNumbers(kept, "vec_a", "vec_b", 3)))
    assert(got(40L) == 3 && got(1L) == 2)
    // far K4's partitions keep their files
    val coresAfter = listStateFiles(h, "graphcores")
    val untouched = coresBefore.keys.filter(kk =>
      Seq(8, 9, 10, 11).exists(pb => kk.contains(s"pb=$pb/")))
    assert(untouched.nonEmpty)
    untouched.foreach(kk => assert(coresAfter.get(kk).contains(coresBefore(kk))))
    // the serve view excludes the revoked pair everywhere
    assert(h.edgeCount == 11)
    // truss maintains against the already-tombstoned batch (the
    // composed-maintainer shape): near K4 evicted, far K4 stays
    def edgeSet(df: DataFrame) =
      df.select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotT = edgeSet(h.removeEdgesAndMaintainTruss(gone, k = 4))
    assert(gotT == edgeSet(Truss.kTruss(kept, "vec_a", "vec_b", 4)))
    assert(gotT == Set((40L, 41L), (40L, 42L), (40L, 43L),
      (41L, 42L), (41L, 43L), (42L, 43L)))
    // labels were invalidated and re-derive from the KEPT view
    val lpaServed = h.ensureCommunities(rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lpaKept = LabelPropagation.run(kept, "vec_a", "vec_b", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpaServed == lpaKept)
    // replay: both maintainers find the fixpoint, no partitions rewrite
    val coresSteady = listStateFiles(h, "graphcores")
    val trussSteady = listStateFiles(h, "graphtruss")
    assert(coresMap(h.removeEdgesAndMaintainCores(gone, maxK = 3)) == got)
    assert(edgeSet(h.removeEdgesAndMaintainTruss(gone, k = 4)) == gotT)
    assert(listStateFiles(h, "graphcores") == coresSteady)
    assert(listStateFiles(h, "graphtruss") == trussSteady)
    // re-appending a revoked pair fails loud
    val ex = intercept[IllegalArgumentException] { h.append(gone) }
    assert(ex.getMessage.contains("revoked"))
    // compact purges the physical rows and the ledger
    val c = PairGraphStore.compact(h, targetFiles = 2)
    assert(c.removedEdges.isEmpty)
    assert(c.physicalEdges.count() == 11)
    c.append(gone)
    assert(c.edgeCount == 12)
  }

  test("unweighted store round-trips without a weight column") {
    val sp = spark; import sp.implicits._
    val path = tmp()
    val base = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    PairGraphStore.build(base, "a", "b", None, path)
    val h = PairGraphStore.open(spark, path)
    assert(h.weightCol.isEmpty)
    assert(h.edges.columns.toSeq == Seq("a", "b"))
    assert(h.edges.count() == 2)
  }

  test("autoCompact fires at the revoked ratio; maintained states ride the swap") {
    val sp = spark; import sp.implicits._
    val path = tmp()
    // a 5-clique chain: 20 edges, labels persisted up front
    val edges = (for (g <- 0L until 2L; a <- 0L until 5L; b <- (a + 1) until 5L)
      yield (g * 5 + a, g * 5 + b)).toDF("a", "b")
    val h = PairGraphStore.build(edges, "a", "b", None, path)
    val labels0 = h.ensureCommunities(rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(PairGraphStore.revokedRatio(h).isEmpty)
    assert(PairGraphStore.autoCompact(h) eq h)
    // revoke 4 of 20 edges (20% <= 25%): ledger stays, no compaction
    h.removeEdgesAndMaintainCommunities(
      Seq((0L, 1L), (0L, 2L), (5L, 6L), (5L, 7L)).toDF("a", "b"), rounds = 3)
    val r1 = PairGraphStore.revokedRatio(h)
    assert(r1.exists(r => r > 0 && r <= 0.25), s"ratio $r1")
    PairGraphStore.autoCompact(h)
    assert(PairGraphStore.revokedRatio(h).nonEmpty, "ledger must survive a no-op")
    // revoke 2 more (6/20 = 30% > 25%): compaction fires
    h.removeEdgesAndMaintainCommunities(
      Seq((0L, 3L), (5L, 8L)).toDF("a", "b"), rounds = 3)
    val servedBefore = h.edges.collect().map(_.toSeq).toSet
    val labelsBefore = h.ensureCommunities(rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(PairGraphStore.revokedRatio(h).exists(_ > 0.25))
    PairGraphStore.autoCompact(h)
    assert(PairGraphStore.revokedRatio(h).isEmpty, "compaction must clear the ledger")
    assert(h.physicalEdges.count() == 14)
    assert(h.edges.collect().map(_.toSeq).toSet == servedBefore)
    // the maintained labels state rode the swap: its meta survives and
    // the serve is identical WITHOUT a rebuild
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$path/graphlabels/_graft_labels_meta")),
      "labels state must ride the compaction swap")
    assert(h.ensureCommunities(rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == labelsBefore)
    assert(labelsBefore != labels0, "the revocations must have moved labels")
  }
}
