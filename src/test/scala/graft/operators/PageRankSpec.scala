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
}
