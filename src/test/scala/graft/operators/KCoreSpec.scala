package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkSpec {

  private def core(edges: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Long] =
    KCore.run(edges, "a", "b", k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  // K4 with a tail: 1-2-3-4 complete, 5 hangs off 1, 6 off 5
  private def fixture = {
    val sp = spark; import sp.implicits._
    (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)) ++
      Seq((1L, 5L), (5L, 6L))).toDF("a", "b")
  }

  test("2-core strips the tail; 3-core is exactly the K4; 4-core is empty") {
    val c2 = core(fixture, 2)
    assert(c2.keySet == Set(1L, 2L, 3L, 4L), s"2-core: $c2")
    val c3 = core(fixture, 3)
    assert(c3.keySet == Set(1L, 2L, 3L, 4L))
    assert(c3.values.forall(_ == 3L))
    assert(core(fixture, 4).isEmpty)
  }

  test("peeling cascades: a chain fully dissolves at k=2") {
    val sp = spark; import sp.implicits._
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    // every interior node has degree 2, but removing the endpoints
    // cascades: no 2-core survives
    assert(core(chain, 2).isEmpty)
    // a 4-cycle DOES survive at k=2
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    assert(core(cycle, 2).keySet == Set(1L, 2L, 3L, 4L))
  }

  test("coreNumbers: tail nodes 1, K4 members 3") {
    val cn = KCore.coreNumbers(fixture, "a", "b", maxK = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cn(6L) == 1 && cn(5L) == 1)
    Seq(1L, 2L, 3L, 4L).foreach(n => assert(cn(n) == 3, s"node $n: ${cn(n)}"))
  }

  test("non-convergence fails loud instead of returning a half-peeled core") {
    val sp = spark; import sp.implicits._
    // a 12-node chain needs ~6 cascade rounds at k=2; with a 2-round
    // budget the peel is mid-flight and MUST throw, never report the
    // surviving interior nodes as 2-core members (the true 2-core is empty)
    val chain = (1L to 11L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      KCore.run(chain, "a", "b", k = 2, maxRounds = 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // with budget, the same chain converges to the empty core
    assert(KCore.run(chain, "a", "b", k = 2).isEmpty)
  }

  test("deterministic under repartitioning; duplicate/reversed edges collapse") {
    val sp = spark; import sp.implicits._
    val messy = fixture.union(fixture.select($"b".as("a"), $"a".as("b")))
    assert(core(messy, 3) == core(fixture.repartition(7), 3))
  }

  // ---- incremental maintenance under edge insertion -------------------

  private def coresOf(edges: org.apache.spark.sql.DataFrame, maxK: Int): Map[Long, Int] =
    KCore.coreNumbers(edges, "a", "b", maxK).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def maintained(
      old: org.apache.spark.sql.DataFrame,
      delta: org.apache.spark.sql.DataFrame, maxK: Int): Map[Long, Int] = {
    val oc = KCore.coreNumbers(old, "a", "b", maxK)
    KCore.maintainAfterInsert(oc, old, delta, "a", "b", maxK).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("maintain: closing a tail into a cycle promotes the whole chain") {
    val sp = spark; import sp.implicits._
    // K4 with tail 1-5-6; adding (6,2) closes the tail into a cycle:
    // 5 and 6 rise 1 -> 2, the K4 stays at 3 — a cascade the closure
    // must follow two hops down the old core-1 chain
    val delta = Seq((6L, 2L)).toDF("a", "b")
    val got = maintained(fixture, delta, maxK = 5)
    assert(got == coresOf(fixture.union(delta), 5), s"maintain: $got")
    assert(got(5L) == 2 && got(6L) == 2 && got(1L) == 3)
  }

  test("maintain: new nodes enter from core 0 and can climb levels") {
    val sp = spark; import sp.implicits._
    // nodes 7..9 are unseen by the old graph; the delta wires them into
    // a triangle hanging off the K4 — they must reach core 2 from 0
    val delta = Seq((7L, 8L), (8L, 9L), (7L, 9L), (7L, 1L)).toDF("a", "b")
    val got = maintained(fixture, delta, maxK = 5)
    assert(got == coresOf(fixture.union(delta), 5), s"maintain: $got")
    assert(got(7L) == 2 && got(8L) == 2 && got(9L) == 2)
  }

  test("maintain: a no-op delta (already-present edges) changes nothing") {
    val sp = spark; import sp.implicits._
    val delta = Seq((1L, 2L), (5L, 6L)).toDF("a", "b")
    assert(maintained(fixture, delta, maxK = 5) == coresOf(fixture, 5))
  }

  test("distributed maintain route (forced) equals from-scratch too") {
    val sp = spark; import sp.implicits._
    // driverMaxEdges = 0 forces the wave-synchronous distributed
    // formulation — the 100 TB route the adaptive split hides at
    // test scale; both planted cascades must match the exact peel
    for (delta <- Seq(
        Seq((6L, 2L)),
        Seq((7L, 8L), (8L, 9L), (7L, 9L), (7L, 1L)))) {
      val deltaDf = delta.toDF("a", "b")
      val oc = KCore.coreNumbers(fixture, "a", "b", maxK = 5)
      val got = KCore.maintainAfterInsert(oc, fixture, deltaDf, "a", "b",
        maxK = 5, driverMaxEdges = 0).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == coresOf(fixture.union(deltaDf), 5), s"delta=$delta got=$got")
    }
  }

  private def maintainedDel(
      old: org.apache.spark.sql.DataFrame,
      deleted: org.apache.spark.sql.DataFrame, maxK: Int,
      driverMax: Long = 512L * 1024): Map[Long, Int] = {
    val oc = KCore.coreNumbers(old, "a", "b", maxK)
    KCore.maintainAfterDelete(oc, old, deleted, "a", "b", maxK,
      driverMaxEdges = driverMax).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("decremental maintain: planted demotion cascade, isolation, no-op replay") {
    val sp = spark; import sp.implicits._
    // deleting a K4 edge demotes the whole clique 3 -> 2 (they still
    // form a 4-cycle); the tail stays at 1
    val got = maintainedDel(fixture, Seq((1L, 2L)).toDF("a", "b"), maxK = 5)
    val want = coresOf(fixture.join(Seq((1L, 2L)).toDF("a", "b"),
      Seq("a", "b"), "left_anti"), 5)
    assert(got == want, s"got=$got want=$want")
    assert(got(3L) == 2 && got(4L) == 2)
    // deleting the tail's edges isolates node 6: it drops out entirely
    val got2 = maintainedDel(fixture, Seq((5L, 6L)).toDF("a", "b"), maxK = 5)
    assert(!got2.contains(6L) && got2(5L) == 1)
    // deleting an edge that was never present changes nothing
    assert(maintainedDel(fixture, Seq((1L, 9L)).toDF("a", "b"), maxK = 5) ==
      coresOf(fixture, 5))
  }

  test("decremental maintain equals from-scratch on randomized splits, both routes") {
    val sp = spark; import sp.implicits._
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed * 13)
      val n = 20
      val all = (for {
        i <- 1 to n; j <- (i + 1) to n
        if rnd.nextDouble() < 0.18
      } yield (i.toLong, j.toLong)).toSeq
      val (deleted, kept) = all.partition(_ => rnd.nextInt(5) == 0)
      if (deleted.nonEmpty && kept.nonEmpty) {
        val allDf = all.toDF("a", "b"); val delDf = deleted.toDF("a", "b")
        val want = coresOf(kept.toDF("a", "b"), 6)
        assert(maintainedDel(allDf, delDf, maxK = 6) == want, s"seed=$seed driver")
        assert(maintainedDel(allDf, delDf, maxK = 6, driverMax = 0L) == want,
          s"seed=$seed distributed")
      }
    }
  }

  test("maintain equals from-scratch on randomized graphs and deltas") {
    val sp = spark; import sp.implicits._
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val n = 24
      val all = (for {
        i <- 1 to n; j <- (i + 1) to n
        if rnd.nextDouble() < 0.12
      } yield (i.toLong, j.toLong)).distinct
      // random split: ~1/5 of edges arrive as the delta batch
      val (delta, old) = all.partition(_ => rnd.nextDouble() < 0.2)
      if (old.nonEmpty && delta.nonEmpty) {
        val oldDf = old.toDF("a", "b")
        val deltaDf = delta.toDF("a", "b")
        val got = maintained(oldDf, deltaDf, maxK = 8)
        val want = coresOf(oldDf.union(deltaDf), 8)
        assert(got == want, s"seed=$seed got=$got want=$want")
      }
    }
  }
}
