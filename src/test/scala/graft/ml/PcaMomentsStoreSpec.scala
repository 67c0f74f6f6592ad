package graft.ml

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaMomentsStoreSpec extends SparkSpec {

  private def vecs(ids: Range, shift: Double) = {
    val sp = spark; import sp.implicits._
    ids.map { i =>
      val t = (i % 16) - 8.0
      (i.toLong, Seq((t + shift).toFloat, (0.5 * t).toFloat, (0.1 * (i % 5)).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("create + append equals a one-pass fit on the union (1e-9)") {
    val dir = Files.createTempDirectory("pcastore").toString
    val b1 = vecs(0 until 80, 0.0)
    val b2 = vecs(80 until 200, 1.5)
    PcaMomentsStore.create(spark, b1, "embedding", dim = 3, path = dir)
    PcaMomentsStore.append(spark, b2, "embedding", path = dir)
    val inc = PcaMomentsStore.read(spark, dir)
    val full = Pca.fitStats(b1.unionByName(b2), "embedding", 3)
    assert(inc.n == full.n)
    inc.sums.zip(full.sums).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    inc.prods.zip(full.prods).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // derived covariance agrees too
    val ci = inc.covMatrix; val cf = full.covMatrix
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(ci(i)(j) - cf(i)(j)) < 1e-9)
  }

  test("model from the store projects like a fresh fit; Mahalanobis served from moments") {
    val dir = Files.createTempDirectory("pcastore2").toString
    val b1 = vecs(0 until 100, 0.0)
    val b2 = vecs(100 until 160, 0.0)
    PcaMomentsStore.create(spark, b1, "embedding", dim = 3, path = dir)
    PcaMomentsStore.append(spark, b2, "embedding", path = dir)
    val all = b1.unionByName(b2)
    val fromStore = PcaMomentsStore.model(spark, dir, k = 3)
    val fresh = Pca.fit(all, "embedding", dim = 3, k = 3)
    // same spectrum (eigenvector sign may flip; compare variances)
    fromStore.variances.zip(fresh.variances).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6 * math.max(1.0, b), s"$a vs $b")
    }
    val maha = Pca.mahalanobis(all, "embedding", fromStore)
      .agg(max(col("maha"))).head().getDouble(0)
    assert(maha.isFinite && maha > 0)
  }

  test("append rejects dimension drift loudly") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("pcastore3").toString
    PcaMomentsStore.create(spark, vecs(0 until 10, 0.0), "embedding", 3, dir)
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      PcaMomentsStore.append(spark, bad, "embedding", dir)
    }
    assert(ex.getMessage != null)
  }
}
