package graft.ann

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class ScalarQuantSpec extends SparkSpec {

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("quantize: tinyint codes, bounded reconstruction error, zero-vector guard") {
    val sp = spark; import sp.implicits._
    val q = ScalarQuant.quantize(emb, "embedding")
    val qt = q.schema("qvec").dataType
    assert(qt === ArrayType(ByteType, containsNull = false) ||
      qt === ArrayType(ByteType, containsNull = true), s"codes must be tinyint, got $qt")

    // |x_i - q_i * scale| <= scale/2 for every element; codes in [-127, 127]
    val err = q.select(
      aggregate(
        zip_with($"embedding".cast("array<double>"),
          ScalarQuant.dequantize($"qvec", $"qscale"),
          (x, d) => abs(x - d) - $"qscale" * 0.5 - lit(1e-12)),
        lit(0.0), (acc, v) => greatest(acc, v)).as("excess"),
      array_max(transform($"qvec", c => abs(c.cast("int")))).as("maxcode"))
      .agg(max($"excess").as("worst"), max($"maxcode").as("code"))
      .first()
    assert(err.getAs[Double]("worst") <= 0.0, s"reconstruction error above scale/2: $err")
    assert(err.getAs[Int]("code") <= 127)

    // zero vector: zero codes, zero scale, no ANSI division failure
    val z = ScalarQuant.quantize(
      Seq((1L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding"), "embedding")
      .select($"qscale", $"qvec").first()
    assert(z.getAs[Double]("qscale") === 0.0)
    assert(z.getAs[Seq[Byte]]("qvec") === Seq[Byte](0, 0, 0))

    // null vector fails loud (repo convention), not a silent null qvec
    val nullVec = Seq((1L, Option.empty[Seq[Float]]), (2L, Option(Seq(1f, 2f))))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      ScalarQuant.quantize(nullVec, "embedding").collect()
    }
    assert(e.getMessage.contains("null vector") ||
      String.valueOf(e.getCause).contains("null vector"), s"unexpected: $e")
  }

  test("topK over codes: high recall vs exact brute force, plan stays narrow until the window") {
    val sp = spark; import sp.implicits._
    val queries = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("qid"), $"embedding".as("qvec0"))
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec0", 5)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = ScalarQuant.topK(emb, queries, "vec_id", "embedding", "qid", "qvec0", 5)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 recall@5 too low: $recall")
  }
}
