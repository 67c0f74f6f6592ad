package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorKernelSpec extends SparkSpec {

  test("dot / l2 / cosine match hand-computed values") {
    val sp = spark; import sp.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, -5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot($"a", $"b").as("d"),
      VectorFunctions.l2Norm($"a").as("na"),
      VectorFunctions.l2Distance($"a", $"b").as("dist"),
      VectorFunctions.cosine($"a", $"b").as("cos")).first()
    assert(r.getAs[Double]("d") === 1.0 * 4 - 2 * 5 + 3 * 6) // 12
    assert(math.abs(r.getAs[Double]("na") - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("dist") - math.sqrt(9.0 + 49.0 + 9.0)) < 1e-12)
    val expCos = 12.0 / (math.sqrt(14.0) * math.sqrt(16.0 + 25.0 + 36.0))
    assert(math.abs(r.getAs[Double]("cos") - expCos) < 1e-12)
  }

  test("zero vector cosine is null; null array propagates null") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      (null.asInstanceOf[Array[Float]], Array(1.0f, 2.0f))).toDF("a", "b")
    val rows = df.select(VectorFunctions.cosine($"a", $"b").as("c")).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("mismatched lengths fail loud (a truncated dot is plausible-looking garbage)") {
    val sp = spark; import sp.implicits._
    val df = Seq((Array(1.0f, 2.0f, 99.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorFunctions.dot($"a", $"b")).first()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("vector lengths differ")), e.toString)
  }

  test("double arrays are accepted too") {
    val sp = spark; import sp.implicits._
    val df = Seq((Array(1.5, 2.5), Array(2.0, 4.0))).toDF("a", "b")
    assert(df.select(VectorFunctions.dot($"a", $"b")).first().getDouble(0) === 13.0)
  }

  test("kernel agrees with the HOF formulation on real embeddings (codegen vs lambda)") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet").limit(50)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val diff = emb.select(
        abs(VectorFunctions.dot(col("embedding"), col("embedding")) - hof).as("d"))
      .agg(max("d")).first().getDouble(0)
    assert(diff === 0.0, "kernel must be bit-identical to sequential HOF accumulation")
  }
}
