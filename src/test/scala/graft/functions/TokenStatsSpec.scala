package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{TextFunctions => TF}

class TokenStatsSpec extends SparkSpec {

  test("TokenStatsExpr == explode+groupBy formulation on the real corpus") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(length(trim(col("text"))) > 0)
    val kernel = docs
      .withColumn("ts", TokenStatsExpr.of(TF.wsTokens(lower(col("text")))))
      .select(col("doc_id"),
        col("ts").getField("n_tokens").as("n_tokens"),
        col("ts").getField("n_distinct").as("n_distinct"),
        col("ts").getField("top_count").as("top_count"))
    val agg = docs
      .select(col("doc_id"), explode(TF.wsTokens(lower(col("text")))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_count"))
    assert(kernel.exceptAll(agg).isEmpty && agg.exceptAll(kernel).isEmpty)
    assert(kernel.count() === docs.count())
  }

  test("TokenStatsExpr edges: empty array, all-same, all-distinct, null elements") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Seq[String]()),
      (2L, Seq("a", "a", "a", "a")),
      (3L, Seq("a", "b", "c", "d")),
      (4L, Seq("x", null, "x", null)))
      .toDF("id", "toks")
    val out = df.select(col("id"), TokenStatsExpr.of(col("toks")).as("ts"))
      .select(col("id"), col("ts.n_tokens"), col("ts.n_distinct"), col("ts.top_count"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === (0L, 0L, 0L))
    assert(out(2L) === (4L, 1L, 4L))
    assert(out(3L) === (4L, 4L, 1L))
    assert(out(4L) === (4L, 2L, 2L)) // nulls collapse to one sentinel value
  }
}
