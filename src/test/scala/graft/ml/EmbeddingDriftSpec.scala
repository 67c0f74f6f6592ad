package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingDriftSpec extends SparkSpec {

  private def version(rows: (Long, Int, Seq[Double])*) = {
    val sp = spark; import sp.implicits._
    rows.toDF("vec_id", "label", "embedding")
  }

  test("identical versions drift zero") {
    val a = version((1L, 0, Seq(1.0, 0.0)), (2L, 0, Seq(0.0, 1.0)), (3L, 1, Seq(2.0, 2.0)))
    val r = EmbeddingDrift.report(a, a, "label", "embedding")
      .collect().map(x => x.getInt(0) -> x.getDouble(3)).toMap
    assert(r.values.forall(_ == 0.0))
    assert(r.keySet == Set(0, 1))
  }

  test("a uniform scale shows up as centroid shift and norm change, by the book") {
    val a = version((1L, 0, Seq(3.0, 4.0)), (2L, 0, Seq(3.0, 4.0)))
    val b = version((1L, 0, Seq(6.0, 8.0)), (2L, 0, Seq(6.0, 8.0)))
    val r = EmbeddingDrift.report(a, b, "label", "embedding").head()
    // centroid (3,4) -> (6,8): shift = |(3,4)| = 5; norms 5 -> 10
    assert(math.abs(r.getDouble(3) - 5.0) < 1e-9)
    assert(math.abs(r.getDouble(4) - 5.0) < 1e-9)
    assert(math.abs(r.getDouble(5) - 10.0) < 1e-9)
  }

  test("labels only in one version are excluded (set diffs are SnapshotDiff's job)") {
    val a = version((1L, 0, Seq(1.0, 0.0)), (2L, 7, Seq(0.0, 1.0)))
    val b = version((1L, 0, Seq(1.0, 0.0)))
    val labels = EmbeddingDrift.report(a, b, "label", "embedding")
      .select("label").collect().map(_.getInt(0)).toSet
    assert(labels == Set(0))
  }
}
