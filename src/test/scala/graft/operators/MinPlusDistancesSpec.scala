package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinPlusDistancesSpec extends SparkSpec {

  private def dists(edges: Seq[(Long, Long, Double)], seeds: Seq[Long],
      maxHops: Int): Map[Long, Double] = {
    val sp = spark; import sp.implicits._
    val e = (edges ++ edges.map(t => (t._2, t._1, t._3))).toDF("src", "dst", "w")
    MinPlusDistances.fromSeeds(e, "src", "dst", "w", seeds.toDF("node"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  /** Driver-side reference: full (non-frontier) hop-bounded
    * Bellman-Ford — the independent formulation the frontier cut must
    * match exactly. */
  private def reference(edges: Seq[(Long, Long, Double)], seeds: Seq[Long],
      maxHops: Int): Map[Long, Double] = {
    val sym = edges ++ edges.map(t => (t._2, t._1, t._3))
    var d = seeds.distinct.map(_ -> 0.0).toMap
    for (_ <- 1 to maxHops) {
      val relaxed = sym.flatMap { case (u, v, w) => d.get(u).map(du => v -> (du + w)) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
      d = (d.keySet ++ relaxed.keySet).map { k =>
        k -> math.min(d.getOrElse(k, Double.PositiveInfinity),
          relaxed.getOrElse(k, Double.PositiveInfinity))
      }.toMap
    }
    d
  }

  test("planted shapes: cheap detour beats short hop, horizon cap, multi-source min") {
    // direct edge 1->3 costs 1.0; the 2-hop detour through 2 costs 0.3
    assert(dists(Seq((1L, 3L, 1.0), (1L, 2L, 0.1), (2L, 3L, 0.2)), Seq(1L), 4) ==
      Map(1L -> 0.0, 2L -> 0.1, 3L -> 0.30000000000000004))
    // but with maxHops = 1 only the direct edge is allowed
    assert(dists(Seq((1L, 3L, 1.0), (1L, 2L, 0.1), (2L, 3L, 0.2)), Seq(1L), 1) ==
      Map(1L -> 0.0, 2L -> 0.1, 3L -> 1.0))
    // multi-source: each node takes its nearest seed
    assert(dists(Seq((1L, 2L, 0.5), (2L, 3L, 0.5), (10L, 3L, 0.2)), Seq(1L, 10L), 4) ==
      Map(1L -> 0.0, 10L -> 0.0, 2L -> 0.5, 3L -> 0.2))
    // unreached beyond the horizon absent; off-graph seed at 0
    assert(dists(Seq((1L, 2L, 0.5)), Seq(9L), 3) == Map(9L -> 0.0))
    // zero maxHops: seeds only
    assert(dists(Seq((1L, 2L, 0.5)), Seq(1L), 0) == Map(1L -> 0.0))
    // negative weight fails loud
    val sp = spark; import sp.implicits._
    val bad = Seq((1L, 2L, -0.1)).toDF("src", "dst", "w")
    intercept[Exception] {
      MinPlusDistances.fromSeeds(bad, "src", "dst", "w", Seq(1L).toDF("node"), 2)
        .collect()
    }
  }

  test("iterates: hop t equals fromSeeds at maxHops=t; unreached hops are +Inf") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(41L)
    val n = 25
    val edges = (0 until n * 2).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b), math.rint(rnd.nextDouble() * 100) / 100)
      }.filter(e => e._1 != e._2)
      .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
    val sym = (edges ++ edges.map(t => (t._2, t._1, t._3))).toDF("src", "dst", "w")
    val seeds = Seq(0L, 7L).toDF("node")
    val its = MinPlusDistances.iterates(sym, "src", "dst", "w", seeds, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(its.values.forall(_.length == 4))
    for (t <- 1 to 4) {
      val want = MinPlusDistances.fromSeeds(sym, "src", "dst", "w", seeds, t)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // reached nodes agree exactly; nodes absent from fromSeeds at
      // this horizon are +Inf in the iterate array
      its.foreach { case (k, ds) =>
        assert(ds(t - 1) == want.getOrElse(k, Double.PositiveInfinity),
          s"hop $t node $k") }
      want.keys.foreach(k => assert(its.contains(k)))
    }
    // non-increasing in t
    its.values.foreach(ds =>
      assert(ds.sliding(2).forall(p => p.length < 2 || p(0) >= p(1))))
  }

  test("randomized graphs match the full-relaxation reference bit-for-bit") {
    val rnd = new scala.util.Random(29L)
    for (trial <- 1 to 4) {
      val n = 25 + rnd.nextInt(30)
      val edges = (0 until n * 2).map { _ =>
          val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
          (math.min(a, b), math.max(a, b), math.rint(rnd.nextDouble() * 100) / 100)
        }.filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      val seeds = (0 until 1 + rnd.nextInt(3)).map(_ => rnd.nextInt(n).toLong).distinct
      val hops = 1 + rnd.nextInt(5)
      val got = dists(edges, seeds, hops)
      val want = reference(edges, seeds, hops)
      assert(got == want, s"trial $trial (n=$n seeds=$seeds hops=$hops): " +
        s"diff=${got.toSet.diff(want.toSet).take(3)} / ${want.toSet.diff(got.toSet).take(3)}")
    }
  }
}
