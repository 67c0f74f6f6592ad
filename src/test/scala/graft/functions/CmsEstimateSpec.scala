package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** cms_estimate probes the binary built by Spark's count_min_sketch
  * aggregate. The CMS contract: estimate is NEVER below the true
  * count, and (with the configured confidence) at most eps*N above.
  */
class CmsEstimateSpec extends SparkSpec {

  test("estimates bound true counts from the aggregated sketch") {
    val sp = spark; import sp.implicits._
    // known multiset: "a" x100, "b" x10, "c" x1, over 111 adds
    val items = (Seq.fill(100)("a") ++ Seq.fill(10)("b") ++ Seq("c")).toDF("w")
    val sketch = items.agg(count_min_sketch($"w", lit(0.001), lit(0.999), lit(7)).as("sk"))

    val probes = Seq("a", "b", "c", "absent").toDF("w")
    val out = probes.join(broadcast(sketch))
      .select($"w", CmsEstimate($"sk", $"w").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val exact = Map("a" -> 100L, "b" -> 10L, "c" -> 1L, "absent" -> 0L)
    val slack = math.ceil(0.001 * 111).toLong
    exact.foreach { case (w, n) =>
      assert(out(w) >= n, s"$w: estimate ${out(w)} below true $n")
      assert(out(w) <= n + slack, s"$w: estimate ${out(w)} above $n + $slack")
    }
  }

  test("registered SQL function resolves and matches the Column API") {
    val sp = spark; import sp.implicits._
    graft.plans.GraftExtensions.ensureRegistered(spark)
    Seq.fill(42)("x").toDF("w").createOrReplaceTempView("cms_in")
    val est = spark.sql(
      """SELECT cms_estimate(sk, 'x') AS est FROM
        |  (SELECT count_min_sketch(w, 0.01d, 0.99d, 1) AS sk FROM cms_in)""".stripMargin)
      .first().getLong(0)
    assert(est === 42L)
  }

  test("type mismatch is rejected at analysis") {
    val sp = spark; import sp.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(CmsEstimate($"a", $"b")).collect()
    }
  }
}
