package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {

  private def report(edges: org.apache.spark.sql.DataFrame) =
    Triangles.perNode(edges, "a", "b")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

  test("triangle, square, star: counts and clustering coefficients by hand") {
    val sp = spark; import sp.implicits._
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),             // triangle
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L), // 4-cycle: no triangles
      (20L, 21L), (20L, 22L), (20L, 23L)        // star: no triangles
    ).toDF("a", "b")
    val out = report(edges)
    Seq(1L, 2L, 3L).foreach { n =>
      assert(out(n) == ((2L, 1L, 1.0)), s"node $n: ${out(n)}")
    }
    Seq(10L, 11L, 12L, 13L).foreach(n => assert(out(n)._2 == 0L && out(n)._3 == 0.0))
    assert(out(20L) == ((3L, 0L, 0.0)))
    assert(out(21L)._1 == 1L && out(21L)._3 == 0.0) // leaf: deg < 2 -> lcc 0
  }

  test("K4: every node in 3 triangles with lcc 1; duplicate/reversed input edges collapse") {
    val sp = spark; import sp.implicits._
    val base = for { i <- 1 to 4; j <- 1 to 4 if i < j } yield (i.toLong, j.toLong)
    // feed duplicates and reversals: the operator must dedupe
    val edges = (base ++ base.map(_.swap) ++ base).toDF("a", "b")
    val out = report(edges)
    (1L to 4L).foreach { n =>
      assert(out(n) == ((3L, 3L, 1.0)), s"node $n: ${out(n)}")
    }
  }

  test("matches the naive a<b<c three-join on a pseudo-random graph (hub-heavy)") {
    val sp = spark; import sp.implicits._
    // hub-heavy: node 0 connects widely (the shape that breaks naive
    // neighbor joins); plus random edges
    val rnd = new scala.util.Random(3)
    val edges = ((0 until 60).map(i => (0L, (i + 1).toLong)) ++
      (0 until 200).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)))
      .filter(e => e._1 != e._2)
      .toDF("a", "b")
    val out = report(edges)
    // naive reference: distinct id-ordered pairs, triple join
    val prs = edges
      .select(least($"a", $"b").as("x"), greatest($"a", $"b").as("y"))
      .distinct()
    val tri = prs.as("p1")
      .join(prs.as("p2"), col("p1.x") === col("p2.x") && col("p1.y") < col("p2.y"))
      .join(prs.as("p3"), col("p3.x") === col("p1.y") && col("p3.y") === col("p2.y"))
      .select(col("p1.x").as("a"), col("p1.y").as("b"), col("p2.y").as("c"))
    val naive = tri.select(explode(array($"a", $"b", $"c")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (n, (_, t, _)) =>
      assert(t == naive.getOrElse(n, 0L), s"node $n: oriented $t vs naive ${naive.getOrElse(n, 0L)}")
    }
  }

  private def maintained(
      old: org.apache.spark.sql.DataFrame,
      delta: org.apache.spark.sql.DataFrame) = {
    val oc = Triangles.perNode(old, "a", "b")
    Triangles.maintainAfterInsert(oc, old, delta, "a", "b")
      .select("node", "degree", "triangles", "lcc")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
  }

  test("maintain: multi-fresh-edge triangles count once; new nodes enter") {
    val sp = spark; import sp.implicits._
    // old graph: path 1-2-3; delta closes the triangle AND wires a new
    // K3 (4,5,6) with 4 attached to 1 — the {4,5,6} triangle has THREE
    // fresh edges and must count exactly once per node
    val old = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val delta = Seq((1L, 3L), (1L, 4L), (4L, 5L), (5L, 6L), (4L, 6L)).toDF("a", "b")
    val got = maintained(old, delta)
    assert(got == report(old.union(delta)), s"got=$got")
    assert(got(4L)._2 == 1 && got(5L)._2 == 1 && got(6L)._2 == 1)
    assert(got(1L)._2 == 1)
  }

  test("maintain: replayed (already-present) delta edges are a no-op") {
    val sp = spark; import sp.implicits._
    val old = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val delta = Seq((1L, 2L), (3L, 1L)).toDF("a", "b") // present (one reversed)
    assert(maintained(old, delta) == report(old))
  }

  test("maintain equals from-scratch on randomized graphs and deltas") {
    val sp = spark; import sp.implicits._
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val n = 20
      val allE = (for {
        i <- 1 to n; j <- (i + 1) to n
        if rnd.nextDouble() < 0.18
      } yield (i.toLong, j.toLong)).distinct
      val (delta, old) = allE.partition(_ => rnd.nextDouble() < 0.25)
      if (old.nonEmpty && delta.nonEmpty) {
        val got = maintained(old.toDF("a", "b"), delta.toDF("a", "b"))
        val want = report(old.toDF("a", "b").union(delta.toDF("a", "b")))
        assert(got == want, s"seed=$seed")
      }
    }
  }

  test("deterministic under repartitioning; empty edges yield empty report") {
    val sp = spark; import sp.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    assert(report(edges) == report(edges.repartition(7)))
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Triangles.perNode(none, "a", "b").count() == 0)
  }
}
