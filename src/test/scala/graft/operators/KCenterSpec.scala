package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Greedy k-center selection: independent objective re-check (every
  * pick is a true argmax of the running min 4dp distance), radius
  * semantics, duplicate-point exclusion, layout invariance, k >= n. */
class KCenterSpec extends SparkSpec {

  private def emb = graft.Tables.load(spark, sf001, "embeddings")

  private def cosDist4(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val c = dot / (math.sqrt(na) * math.sqrt(nb))
    BigDecimal(1.0 - c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def collectVecs(): Map[Long, Array[Double]] =
    emb.select(col("vec_id"), col("embedding")).collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)
    }.toMap

  test("every pick is the argmax of the running min distance; radius matches") {
    val k = 6
    val got = KCenter.select(emb, "vec_id", "embedding", k)
      .orderBy(col("rnk")).collect()
    assert(got.length == k)
    val vecs = collectVecs()
    val ids = got.map(_.getLong(1))
    assert(ids.head == vecs.keys.min, "first center is the smallest id")
    assert(ids.distinct.length == k, "picks are distinct")

    // replay the greedy independently (plain driver math, no Spark)
    var centers = Vector(ids.head)
    for (r <- 1 until k) {
      val mind = vecs.keys.filterNot(centers.contains).map { id =>
        id -> centers.map(c => cosDist4(vecs(id), vecs(c))).min
      }
      val (bestId, bestD) = mind.toSeq.sortBy { case (id, d) => (-d, id) }.head
      assert(ids(r) == bestId, s"pick ${r + 1} is the argmax (ties on id)")
      // radius reported for the PREVIOUS pick = that argmax's distance
      assert(math.abs(got(r - 1).getDouble(2) - bestD) < 1e-9,
        s"radius after pick $r is the next argmax's min distance")
      centers = centers :+ bestId
    }
    // final radius: max over all points of min distance to all k centers
    val finalRadius = vecs.keys.map { id =>
      centers.map(c => cosDist4(vecs(id), vecs(c))).min
    }.max
    assert(math.abs(got.last.getDouble(2) - finalRadius) < 1e-9)
    // monotone nonincreasing objective
    got.map(_.getDouble(2)).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-12, "coverage radius never grows")
    }
  }

  test("exact duplicates of a center are never re-selected") {
    val sp = spark; import sp.implicits._
    // 3 distinct directions, each duplicated; k=3 must pick 3 directions
    val pts = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)),
      (2L, Seq(0f, 1f)), (3L, Seq(0f, 1f)),
      (4L, Seq(0.7f, 0.7f)), (5L, Seq(0.7f, 0.7f))
    ).toDF("vec_id", "embedding")
    val got = KCenter.select(pts, "vec_id", "embedding", 3)
      .orderBy(col("rnk")).collect()
    val dirs = got.map(_.getLong(1)).map(id => id / 2).toSet
    assert(dirs.size == 3, s"three distinct directions selected, got $dirs")
    assert(got.last.getDouble(2) == 0.0, "duplicates covered at radius 0")
  }

  test("k >= n returns n rows ending at radius 0; layout-invariant") {
    val sp = spark; import sp.implicits._
    val pts = Seq(
      (10L, Seq(1f, 0f, 0f)), (11L, Seq(0f, 1f, 0f)), (12L, Seq(0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val got = KCenter.select(pts, "vec_id", "embedding", 99)
      .orderBy(col("rnk")).collect()
    assert(got.length == 3)
    assert(got.last.getDouble(2) == 0.0)

    // layout invariance on the real corpus
    val a = KCenter.select(emb, "vec_id", "embedding", 5)
      .orderBy(col("rnk")).collect().toSeq
    val b = KCenter.select(emb.repartition(7, col("vec_id")),
        "vec_id", "embedding", 5)
      .orderBy(col("rnk")).collect().toSeq
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) ==
      b.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
  }
}
