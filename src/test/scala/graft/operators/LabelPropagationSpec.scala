package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelPropagationSpec extends SparkSpec {

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("disjoint cliques converge to one community each (the min id)") {
    val sp = spark; import sp.implicits._
    // clique {1,2,3}, clique {10,11,12,13}, pair {20,21}
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L),
      (20L, 21L)
    ).toDF("a", "b")
    val out = labelsOf(LabelPropagation.run(edges, "a", "b", rounds = 3))
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(Set(10L, 11L, 12L, 13L).map(out).size == 1)
    assert(out(20L) == out(21L))
    // three distinct communities, labelled by a member id
    assert(Set(out(1L), out(10L), out(20L)).size == 3)
    assert(out(1L) == 1L && out(10L) == 10L && out(20L) == 20L)
  }

  test("one round, by hand: majority vote with min-label ties, self-vote included") {
    val sp = spark; import sp.implicits._
    // star: center 5 linked to 1,2,3 — after one round the center
    // hears {1,2,3,self=5}: all tied at 1 -> min = 1; leaf 1 hears
    // {5, self=1} tie -> 1; leaves 2,3 hear {5, self} -> min(2,5)=2, 3
    val edges = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("a", "b")
    val out = labelsOf(LabelPropagation.run(edges, "a", "b", rounds = 1))
    assert(out(5L) == 1L)
    assert(out(1L) == 1L)
    assert(out(2L) == 2L)
    assert(out(3L) == 3L)
  }

  test("a bridge between two triangles does not merge the communities") {
    val sp = spark; import sp.implicits._
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (7L, 8L), (7L, 9L), (8L, 9L),
      (3L, 7L) // bridge
    ).toDF("a", "b")
    val out = labelsOf(LabelPropagation.run(edges, "a", "b", rounds = 3))
    // each triangle stays internally uniform; LPA's point vs CC (which
    // would merge everything through the bridge)
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(7L) == out(8L) && out(8L) == out(9L))
    assert(out(1L) != out(7L), s"bridge must not merge: $out")
  }

  test("weighted votes: a node between two communities adopts the heavier side") {
    val sp = spark; import sp.implicits._
    // node 5 touches community {1,2} (weights 0.9 each) and community
    // {10,11} (weights 0.2 each): unweighted it's a 2-2 tie -> min
    // label; weighted it must side with {1,2}
    val edges = Seq(
      (1L, 2L, 0.9), (1L, 5L, 0.9), (2L, 5L, 0.9),
      (10L, 11L, 0.2), (10L, 5L, 0.2), (11L, 5L, 0.2)
    ).toDF("a", "b", "w")
    val weighted = labelsOf(LabelPropagation.run(
      edges, "a", "b", rounds = 3, weightCol = Some("w")))
    assert(weighted(5L) == weighted(1L),
      s"node 5 must join the strongly-linked community: $weighted")
    assert(weighted(10L) == weighted(11L))
    assert(weighted(1L) != weighted(10L))
  }

  test("weighted run rejects non-positive weights loudly") {
    val sp = spark; import sp.implicits._
    val bad = Seq((1L, 2L, 0.0)).toDF("a", "b", "w")
    val ex = intercept[Exception] {
      LabelPropagation.run(bad, "a", "b", rounds = 1, weightCol = Some("w")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("deterministic under repartitioning") {
    val sp = spark; import sp.implicits._
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (10L, 11L), (11L, 12L)
    ).toDF("a", "b")
    val a = labelsOf(LabelPropagation.run(edges, "a", "b", rounds = 3))
    val b = labelsOf(LabelPropagation.run(edges.repartition(7), "a", "b", rounds = 3))
    assert(a == b)
  }

  test("driver route equals the distributed route bit for bit (integer weights)") {
    val sp = spark; import sp.implicits._
    val ev = graft.Tables.events(spark, sf001)
    val pairs = CoPresence.pairs(ev, "user_id", "ts",
      windowSec = 600, minShared = 3, maxWindowActors = 100)
    def run(): Map[Long, Long] =
      labelsOf(LabelPropagation.run(pairs, "ua", "ub", rounds = 3,
        weightCol = Some("shared")))
    val viaDriver = run()
    spark.conf.set(LabelPropagation.DriverMaxEdgesKey, "0")
    val viaCluster = try run()
    finally spark.conf.unset(LabelPropagation.DriverMaxEdgesKey)
    assert(viaDriver.nonEmpty && viaDriver == viaCluster)
    // fractional weights must NOT take the driver route (double-sum
    // order differs there): same graph, weights scaled to fractions —
    // the run still completes and matches its own distributed result
    val frac = pairs.withColumn("fw", col("shared") / 4.0)
    val f1 = labelsOf(LabelPropagation.run(frac, "ua", "ub", rounds = 3,
      weightCol = Some("fw")))
    assert(f1.nonEmpty)
  }

  test("exact and LSH pair graphs give identical communities on the harness embeddings") {
    val emb = graft.Tables.embeddings(spark, sf001)
    import graft.functions.{VectorFunctions => VF}
    val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    val exact = a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", VF.cosine(col("ea"), col("eb")))
      .filter(col("cos") > 0.35)
      .select("vec_a", "vec_b")
    val lsh = graft.ann.Ann.lshNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.35, nBits = 8, tables = 8, dim = 64, maxBucketSize = 10000)
      .select("vec_a", "vec_b")
    val le = labelsOf(LabelPropagation.run(exact, "vec_a", "vec_b", rounds = 3))
    val ll = labelsOf(LabelPropagation.run(lsh, "vec_a", "vec_b", rounds = 3))
    // the LSH graph is a SUBGRAPH (banded recall loss), and LPA is not
    // monotone in edges — exact partition equality is not the contract.
    // Contract: Rand agreement (fraction of node pairs on which the two
    // partitions agree: same-community in both, or split in both) stays
    // high on the shared nodes.
    val shared = (le.keySet intersect ll.keySet).toSeq.sorted
    assert(shared.size > 50)
    var agree = 0L; var total = 0L
    for (i <- shared.indices; j <- (i + 1) until shared.size) {
      val (x, y) = (shared(i), shared(j))
      val same = (le(x) == le(y)) == (ll(x) == ll(y))
      if (same) agree += 1
      total += 1
    }
    val rand = agree.toDouble / total
    assert(rand > 0.95, s"Rand agreement $rand (exact vs LSH communities)")
  }
}
