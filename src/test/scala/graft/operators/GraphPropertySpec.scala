package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-based invariants of the graph-cohesion operators over
  * generated graphs (fixed-seed raw ScalaCheck generators, the
  * OperatorPropertySpec convention). */
class GraphPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def randomEdges(nNodes: Int, nEdges: Int, seed: Long) = {
    val sp = spark; import sp.implicits._
    samples(for {
      a <- Gen.chooseNum(0L, nNodes.toLong - 1)
      b <- Gen.chooseNum(0L, nNodes.toLong - 1) if a != b
    } yield (a, b), nEdges, seed).toDF("a", "b")
  }

  test("per-node triangle counts sum to 3x the number of distinct triangles") {
    for (seed <- Seq(11L, 23L, 47L)) {
      val edges = randomEdges(40, 160, seed)
      val report = Triangles.perNode(edges, "a", "b")
      val perNodeSum = report.agg(sum(col("triangles"))).head().getLong(0)
      // distinct triangles via the naive a<b<c join
      val prs = edges
        .select(least(col("a"), col("b")).as("x"), greatest(col("a"), col("b")).as("y"))
        .distinct()
      val total = prs.as("p1")
        .join(prs.as("p2"), col("p1.x") === col("p2.x") && col("p1.y") < col("p2.y"))
        .join(prs.as("p3"), col("p3.x") === col("p1.y") && col("p3.y") === col("p2.y"))
        .count()
      assert(perNodeSum == 3 * total, s"seed $seed: $perNodeSum vs 3*$total")
    }
  }

  test("(k+1)-core nests inside the k-core; core degrees never below k") {
    for (seed <- Seq(5L, 17L)) {
      val edges = randomEdges(30, 140, seed)
      val cores = (1 to 4).map(k => k ->
        KCore.run(edges, "a", "b", k).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap)
      cores.sliding(2).foreach { case Seq((k, ck), (_, ck1)) =>
        assert(ck1.keySet.subsetOf(ck.keySet), s"seed $seed: ${k + 1}-core not in $k-core")
      }
      cores.foreach { case (k, c) =>
        c.foreach { case (n, d) => assert(d >= k, s"seed $seed: node $n degree $d < $k") }
      }
    }
  }

  test("LPA communities refine connected components (never cross a component)") {
    for (seed <- Seq(31L, 53L)) {
      val edges = randomEdges(40, 70, seed)
        .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
        .distinct()
      val lpa = LabelPropagation.run(edges, "a", "b", rounds = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val cc = graft.dedup.ConnectedComponents.run(edges, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // same-community implies same-component
      val nodes = lpa.keySet.toSeq
      for (i <- nodes.indices; j <- (i + 1) until nodes.size) {
        val (x, y) = (nodes(i), nodes(j))
        if (lpa(x) == lpa(y))
          assert(cc(x) == cc(y), s"seed $seed: $x,$y share community across components")
      }
    }
  }
}
