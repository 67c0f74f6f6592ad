package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BfsDistancesSpec extends SparkSpec {

  private def dists(edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int)
      : Map[Long, Int] = {
    val sp = spark; import sp.implicits._
    val e = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    BfsDistances.fromSeeds(e, "src", "dst", seeds.toDF("node"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  /** Driver-side reference BFS (undirected). */
  private def reference(edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int)
      : Map[Long, Int] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    var dist = seeds.distinct.map(_ -> 0).toMap
    var frontier = seeds.distinct
    for (t <- 1 to maxHops) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .distinct.filterNot(dist.contains)
      dist = dist ++ next.map(_ -> t)
      frontier = next
    }
    dist
  }

  test("planted shapes: chain rings, cycle meet-in-the-middle, horizon cap, off-graph seed") {
    // chain 1-2-3-4-5 seeded at 1: dist = position
    assert(dists(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), Seq(1L), 10) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    // cap at 2: nodes beyond the horizon absent
    assert(dists(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), Seq(1L), 2) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2))
    // 6-cycle seeded at one node: the antipode is at 3, both arcs agree
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 0L))
    assert(dists(cyc, Seq(0L), 10) ==
      Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 2, 5L -> 1))
    // multi-source: min over seeds, disconnected component unreached
    assert(dists(Seq((1L, 2L), (2L, 3L), (10L, 11L)), Seq(1L, 10L), 10) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 10L -> 0, 11L -> 1))
    // a seed absent from the edge set is still at distance 0
    assert(dists(Seq((1L, 2L)), Seq(99L), 3) == Map(99L -> 0))
    // maxHops = 0: seeds only
    assert(dists(Seq((1L, 2L)), Seq(1L), 0) == Map(1L -> 0))
  }

  test("randomized graphs match a driver-side reference BFS") {
    val rnd = new scala.util.Random(19L)
    for (trial <- 1 to 4) {
      val n = 30 + rnd.nextInt(40)
      val edges = (0 until n * 2).map { _ =>
          val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
          (math.min(a, b), math.max(a, b))
        }.filter(e => e._1 != e._2).distinct
      val seeds = (0 until 1 + rnd.nextInt(4)).map(_ => rnd.nextInt(n).toLong).distinct
      val hops = 1 + rnd.nextInt(5)
      assert(dists(edges, seeds, hops) == reference(edges, seeds, hops),
        s"trial $trial (n=$n seeds=$seeds hops=$hops)")
    }
  }
}
