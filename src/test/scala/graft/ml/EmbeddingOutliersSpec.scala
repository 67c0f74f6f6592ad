package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingOutliersSpec extends SparkSpec {

  private def fixture = {
    val sp = spark; import sp.implicits._
    // label 0 clusters near (1,0); vec 4 points the opposite way
    Seq(
      (1L, 0, Seq(1.0f, 0.0f)),
      (2L, 0, Seq(0.9f, 0.1f)),
      (3L, 0, Seq(1.0f, 0.1f)),
      (4L, 0, Seq(-1.0f, 0.0f)),
      (10L, 1, Seq(0.0f, 1.0f)),
      (11L, 1, Seq(0.1f, 0.9f))
    ).toDF("vec_id", "label", "embedding")
  }

  test("centroids are the exact per-dimension means, in dimension order") {
    val c = EmbeddingOutliers.centroids(fixture, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val c0 = c(0)
    assert(math.abs(c0.head - (1.0f + 0.9f + 1.0f - 1.0f) / 4.0) < 1e-7)
    assert(math.abs(c0(1) - (0.0f + 0.1f + 0.1f + 0.0f) / 4.0) < 1e-7)
    assert(c(1).size == 2)
  }

  test("the planted off-cluster vector is the rank-1 outlier of its label") {
    val out = EmbeddingOutliers.outliers(fixture, "label", "vec_id", "embedding", k = 2)
    val rows = out.collect().map(r => (r.getInt(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(rows((0, 1)) == 4L, "vec 4 points away from the label-0 centroid")
    // exactly k rows per label (or all of them when the label is smaller)
    val counts = out.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(0) == 2 && counts(1) == 2)
  }

  test("cos is a true cosine: bounded and 1.0 for a vector equal to its centroid") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, 7, Seq(3.0f, 4.0f)), (2L, 7, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "label", "embedding")
    val sc = EmbeddingOutliers.scored(df, "label", "embedding")
    val vals = sc.select("cos").collect().map(_.getDouble(0))
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-12))
    val all = EmbeddingOutliers.scored(fixture, "label", "embedding")
      .select("cos").collect().map(_.getDouble(0))
    assert(all.forall(v => v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9))
  }

  test("harness embeddings: 10 labels x 5 ranks, ranks dense from 1") {
    val emb = graft.Tables.embeddings(spark, sf001)
    val out = EmbeddingOutliers.outliers(emb, "label", "vec_id", "embedding", k = 5)
    val byLabel = out.groupBy("label")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .collect()
    assert(byLabel.nonEmpty)
    byLabel.foreach { r =>
      assert(r.getAs[Long]("n") <= 5)
      assert(r.getAs[Int]("lo") == 1)
    }
  }
}
