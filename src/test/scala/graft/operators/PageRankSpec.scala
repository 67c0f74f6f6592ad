package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  test("run: mass conservation, symmetry, and hub dominance on a known graph") {
    val sp = spark; import sp.implicits._
    // star: hub 1 connected to 2,3,4 (undirected -> both directions)
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val pr = PageRank.run(edges, "src", "dst", iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("pr")).toMap

    // undirected graph with both directions: total mass conserved at 1
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, s"mass not conserved: $pr")
    // spokes are symmetric, hub dominates
    assert(math.abs(pr(2L) - pr(3L)) < 1e-12 && math.abs(pr(3L) - pr(4L)) < 1e-12)
    assert(pr(1L) > pr(2L) * 2, s"hub must dominate spokes: $pr")

    // closed-form fixed point of the star (h = (1-d)/n + 3ds,
    // s = (1-d)/n + dh/3): h ≈ 0.47973, s ≈ 0.17339 at d=0.85, n=4;
    // after 10 rounds power iteration is within the d^t envelope
    val d = 0.85; val base = (1 - d) / 4.0
    val hubClosed = (base + 3 * d * base) / (1 - d * d)
    assert(math.abs(pr(1L) - hubClosed) < 0.05,
      s"hub ${pr(1L)} should be near closed form $hubClosed")
  }

  test("run with weights: rank splits in proportion to edge weight; unweighted path unchanged") {
    val sp = spark; import sp.implicits._
    // hub 1 points to 2 (w=9) and 3 (w=1): after one round node 2
    // receives 9x node 3's contribution from the hub
    val edges = Seq((1L, 2L, 9.0), (1L, 3L, 1.0)).toDF("src", "dst", "w")
    val pr = PageRank.run(edges, "src", "dst", iterations = 1,
        weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("pr")).toMap
    val base = (1 - 0.85) / 3.0
    assert(math.abs((pr(2L) - base) / (pr(3L) - base) - 9.0) < 1e-9,
      s"weighted split must be 9:1, got $pr")

    // weightCol = None must equal an explicit all-equal-weights run
    val und = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val a = PageRank.run(und, "src", "dst", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("pr")).toMap
    val b = PageRank.run(und.withColumn("w", org.apache.spark.sql.functions.lit(2.5)),
        "src", "dst", iterations = 4, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("pr")).toMap
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12,
      s"constant weights must match unweighted: $k") }
  }

  test("run: dangling-free on symmetric input; directed chain leaks mass as documented") {
    val sp = spark; import sp.implicits._
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst") // 3 has no out-edges
    val pr = PageRank.run(chain, "src", "dst", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("pr")).toMap
    assert(pr.size === 3)
    assert(pr.values.sum < 1.0, "directed dangling node leaks mass (simplified variant)")
    assert(pr(3L) > pr(2L) * 0.8 && pr(1L) < pr(3L), "rank flows down the chain")
    intercept[IllegalArgumentException](PageRank.run(chain, "src", "dst", iterations = 0))
    intercept[IllegalArgumentException](PageRank.run(chain, "src", "dst", damping = 1.0))
  }

  test("gIterates: g_t/N agrees with run's pr_t; every iterate present") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7L)
    val n = 30
    val und = (0 until 60).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
          math.rint(rnd.nextDouble() * 100) / 100 + 0.01)
      }.filter(e => e._1 != e._2).distinct
    val edges = (und ++ und.map(e => (e._2, e._1, e._3))).toDF("src", "dst", "w")
    for (weighted <- Seq(false, true)) {
      val w = if (weighted) Some("w") else None
      val gs = PageRank.gIterates(edges, "src", "dst", iterations = 3, weightCol = w)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val nn = gs.size.toDouble
      assert(gs.values.forall(_.length == 3), "one g per round")
      for (t <- 1 to 3) {
        val pr = PageRank.run(edges, "src", "dst", iterations = t, weightCol = w)
          .collect().map(r => r.getLong(0) -> r.getAs[Double]("pr")).toMap
        pr.foreach { case (k, v) =>
          assert(math.abs(gs(k)(t - 1) / nn - v) <= 1e-12 * math.max(1.0, math.abs(v)),
            s"weighted=$weighted t=$t node=$k: g/N=${gs(k)(t - 1) / nn} pr=$v")
        }
      }
      // the N-free recurrence never mentions N: adding an ISOLATED
      // extra edge component far away leaves existing g values
      // BIT-identical (under run, every pr would shift through 1/N)
      val edges2 = edges.unionByName(Seq((900L, 901L, 1.0), (901L, 900L, 1.0))
        .toDF("src", "dst", "w"))
      val gs2 = PageRank.gIterates(edges2, "src", "dst", iterations = 3, weightCol = w)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      gs.foreach { case (k, v) => assert(gs2(k) == v,
        s"weighted=$weighted node $k: disjoint growth must not move g") }
    }
  }

  test("personalized: seed locality, all-seeds degeneration, off-graph seed, reference equality") {
    val sp = spark; import sp.implicits._
    // path 1-2-3-4-5 seeded at 1: the seed dominates and the far end
    // trails the near end (finite unrolls carry a parity wave down
    // the path, so strict per-hop monotonicity only holds at the
    // fixpoint — assert the endpoints, not the middle)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (path ++ path.map(_.swap)).toDF("src", "dst")
    val ppr = PageRank.personalized(edges, "src", "dst", Seq(1L).toDF("node"),
        iterations = 6)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("pr")).toMap
    assert(ppr(1L) == ppr.values.max, s"seed must dominate: $ppr")
    assert(ppr(5L) < ppr(2L) && ppr(4L) < ppr(2L),
      s"far end must trail the seed's neighborhood: $ppr")
    assert(math.abs(ppr.values.sum - 1.0) < 1e-9, "undirected input conserves mass")

    // seeding EVERY node degenerates to uniform PageRank (1e-12: the
    // two routes associate (1-d)/N vs (1-d)*(1/N) differently)
    val nodes = edges.select($"src".as("node")).distinct()
    val uni = PageRank.personalized(edges, "src", "dst", nodes, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("pr")).toMap
    val run = PageRank.run(edges, "src", "dst", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("pr")).toMap
    run.foreach { case (k, v) => assert(math.abs(uni(k) - v) < 1e-12) }

    // a seed absent from the edge set still teleports to itself
    val off = PageRank.personalized(edges, "src", "dst",
        Seq(1L, 99L).toDF("node"), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("pr")).toMap
    assert(off(99L) > 0.0 && off.contains(1L))

    // randomized graphs vs a driver-side reference recurrence
    val rnd = new scala.util.Random(23L)
    for (trial <- 1 to 3) {
      val n = 20 + rnd.nextInt(20)
      val und = (0 until n * 2).map { _ =>
          (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
        }.filter(e => e._1 != e._2).distinct
      val all = und ++ und.map(_.swap)
      val seeds = (0 until 1 + rnd.nextInt(3)).map(_ => rnd.nextInt(n).toLong).distinct
      val got = PageRank.personalized(all.toDF("src", "dst"), "src", "dst",
          seeds.toDF("node"), iterations = 3)
        .collect().map(r => r.getLong(0) -> r.getAs[Double]("pr")).toMap
      // reference: dense driver recurrence
      val vs = (all.flatMap(e => Seq(e._1, e._2)) ++ seeds).distinct
      val deg = all.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
      val t = vs.map(v => v -> (if (seeds.contains(v)) 1.0 / seeds.size else 0.0)).toMap
      var p = t
      for (_ <- 1 to 3) {
        val in = all.groupBy(_._2).map { case (dst, es) =>
          dst -> es.map(e => p(e._1) / deg(e._1)).sum
        }
        p = vs.map(v => v -> ((1.0 - 0.85) * t(v) + 0.85 * in.getOrElse(v, 0.0))).toMap
      }
      p.foreach { case (k, v) =>
        assert(math.abs(got(k) - v) <= 1e-9 * math.max(1.0, math.abs(v)),
          s"trial $trial node $k: got ${got(k)} want $v") }
    }
  }

  test("gIterates: deterministic across runs and partitionings (sorted folds)") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(13L)
    val n = 40
    val und = (0 until 120).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
          math.rint(rnd.nextDouble() * 100) / 100 + 0.01)
      }.filter(e => e._1 != e._2).distinct
    val all = und ++ und.map(e => (e._2, e._1, e._3))
    val a = PageRank.gIterates(all.toDF("src", "dst", "w").repartition(1),
        "src", "dst", 3, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = PageRank.gIterates(
        scala.util.Random.shuffle(all).toDF("src", "dst", "w").repartition(17),
        "src", "dst", 3, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b, "g iterates must be bit-identical across partitionings")
  }
}
