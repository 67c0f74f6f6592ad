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

  test("TokenEntropyExpr: matches the exact groupBy entropy and handles edges") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Seq[String]()),                         // no tokens -> 0
      (2L, Seq("a")),                              // single -> 0
      (3L, Seq("a", "a", "a")),                    // uniform repeat -> 0
      (4L, Seq("a", "b", "c", "d")),               // all distinct -> ln 4
      (5L, Seq("a", "a", "b", "b")),               // two pairs -> ln 2
      (6L, Seq("x", null, "x", null, "y")))        // nulls = one sentinel token
      .toDF("id", "toks")
    val out = df.select(col("id"), TokenEntropyExpr.of(col("toks")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.0 && out(2L) == 0.0)
    assert(math.abs(out(3L)) < 1e-12)
    assert(math.abs(out(4L) - math.log(4.0)) < 1e-12)
    assert(math.abs(out(5L) - math.log(2.0)) < 1e-12)
    // {x:2, null:2, y:1}: H = ln 5 - (2ln2 + 2ln2)/5
    assert(math.abs(out(6L) - (math.log(5.0) - 4 * math.log(2.0) / 5)) < 1e-12)
  }

  test("TokenEntropyExpr agrees with the shuffle formulation on harness documents") {
    import graft.functions.{TextFunctions => TF}
    val docs = graft.Tables.documents(spark, sf001)
      .filter(length(trim(col("text"))) > 0)
    val kernel = docs.select(col("doc_id"),
      TokenEntropyExpr.of(TF.wsTokens(lower(col("text")))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = docs
      .select(col("doc_id"), explode(TF.wsTokens(lower(col("text")))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((log(sum(col("c")) * lit(1.0)) -
        sum(col("c") * log(col("c") * lit(1.0))) / sum(col("c"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kernel.keySet == exact.keySet)
    kernel.foreach { case (id, h) =>
      assert(math.abs(h - exact(id)) < 1e-9, s"doc $id: kernel $h vs exact ${exact(id)}")
    }
  }
}
