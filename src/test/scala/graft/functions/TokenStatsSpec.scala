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
        col("ts").getField("top_count").as("top_count"),
        col("ts").getField("singleton_count").as("singleton_count"))
    val agg = docs
      .select(col("doc_id"), explode(TF.wsTokens(lower(col("text")))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_count"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("singleton_count"))
    assert(kernel.exceptAll(agg).isEmpty && agg.exceptAll(kernel).isEmpty)
    assert(kernel.count() === docs.count())
  }

  test("NGramStatsExpr == TokenStatsExpr over materialized n-gram strings (real corpus)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(length(trim(col("text"))) > 0)
    for (n <- Seq(1, 2, 3)) {
      val kernel = docs.select(col("doc_id"),
        NGramStatsExpr.of(TF.wsTokens(lower(col("text"))), n).as("s"))
      val strings = docs.select(col("doc_id"),
        TokenStatsExpr.of(TF.wordNGrams(col("text"), n)).as("s"))
      assert(kernel.exceptAll(strings).isEmpty && strings.exceptAll(kernel).isEmpty,
        s"n=$n mismatch")
    }
  }

  test("NGramStatsExpr edges: fewer tokens than n, repeated windows") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Seq("a", "b")),             // k = 0 windows for n = 3
      (2L, Seq("a", "b", "a", "b", "a"))) // bigrams: ab, ba, ab, ba -> 2 distinct, top 2
      .toDF("id", "toks")
    val byId = df.select(col("id"), NGramStatsExpr.of(col("toks"), 3).as("s3"),
        NGramStatsExpr.of(col("toks"), 2).as("s2"))
      .collect()
      .map(r => r.getLong(0) -> (r.getStruct(1).toSeq, r.getStruct(2).toSeq)).toMap
    assert(byId(1L)._1 === Seq(0L, 0L, 0L, 0L))
    assert(byId(2L)._2 === Seq(4L, 2L, 2L, 0L))
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
      .select(col("id"), col("ts.n_tokens"), col("ts.n_distinct"), col("ts.top_count"),
        col("ts.singleton_count"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out(1L) === (0L, 0L, 0L, 0L))
    assert(out(2L) === (4L, 1L, 4L, 0L))
    assert(out(3L) === (4L, 4L, 1L, 4L))
    assert(out(4L) === (4L, 2L, 2L, 0L)) // nulls collapse to one sentinel value
  }
}
