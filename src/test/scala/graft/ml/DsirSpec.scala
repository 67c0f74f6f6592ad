package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  // target talks about cats; the pool mixes cat-like and finance docs
  private def corpora = {
    val sp = spark; import sp.implicits._
    val target = Seq(
      (100L, "cat purr cat whiskers"),
      (101L, "cat naps in the sun"),
      (102L, "whiskers and purr")
    ).toDF("doc_id", "text")
    val pool = Seq(
      (1L, "cat purr whiskers cat"),       // target-like
      (2L, "stock market bond yield"),     // off-target
      (3L, "the cat naps"),                // mildly target-like
      (4L, "bond market yield curve fed"), // off-target
      (5L, "   ")                          // empty
    ).toDF("doc_id", "text")
    (target, pool)
  }

  test("logWeights: target-like docs outrank off-target ones; empty doc gets 0") {
    val (target, pool) = corpora
    val ratio = Dsir.ratioTable(target, pool, "text")
    val w = Dsir.logWeights(pool, "doc_id", "text", ratio)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(w(5L) == ((0L, 0.0)))
    assert(w(1L)._2 > w(3L)._2, "pure cat doc above mildly-cat doc")
    assert(w(3L)._2 > w(2L)._2, "any cat evidence above finance")
    assert(w(2L)._2 < 0 && w(4L)._2 < 0, "off-target weights negative")
    assert(w(1L)._1 == 4L)
  }

  test("ratio table value matches the closed form") {
    val (target, pool) = corpora
    val ratio = Dsir.ratioTable(target, pool, "text")
    // joint vocab: target {cat,purr,whiskers,naps,in,the,sun,and} pool adds
    // {stock,market,bond,yield,curve,fed} = 14; tot_t=12, tot_p=16;
    // "cat" occurs 3x in each corpus
    val v = ratio.table.count()
    assert(v == 14)
    val catRow = ratio.table.filter(col("token") === "cat").head().getDouble(1)
    val expected = math.log((3 + 1.0) / (12 + 14)) - math.log((3 + 1.0) / (16 + 14))
    assert(math.abs(catRow - expected) < 1e-12)
  }

  test("resample: deterministic, k-bounded, and repeatable") {
    val (target, pool) = corpora
    val ratio = Dsir.ratioTable(target, pool, "text")
    val a = Dsir.resample(pool, "doc_id", "text", ratio, k = 3).collect().map(_.getLong(0)).toSeq
    val b = Dsir.resample(pool, "doc_id", "text", ratio, k = 3).collect().map(_.getLong(0)).toSeq
    assert(a == b, "same salt, same draw")
    assert(a.size == 3)
    val c = Dsir.resample(pool, "doc_id", "text", ratio, k = 3, salt = ":other")
      .collect().map(_.getLong(0)).toSeq
    assert(c.size == 3) // a different salt is a valid (possibly equal) draw
  }

  test("hashed route agrees with the exact route on ranking (harness data)") {
    val docs = graft.Tables.documents(spark, sf001)
    val target = docs.filter(col("source") === "src0")
    val pool = docs.filter(col("source") =!= "src0")
    val exact = Dsir.logWeights(pool, "doc_id", "text",
      Dsir.ratioTable(target, pool, "text"))
    val hashed = Dsir.logWeights(pool, "doc_id", "text",
      Dsir.hashedRatioTable(target, pool, "text", bits = 13),
      tokenizer = Dsir.bucketizer(13))
    val joined = exact.select(col("doc_id"), col("log_w").as("we"))
      .join(hashed.select(col("doc_id"), col("log_w").as("wh")), "doc_id")
    val n = joined.count()
    assert(n > 20)
    // Pearson correlation of the two weight columns: collisions blur but
    // must not destroy the signal at 13 bits on a tiny-vocab corpus
    // occupied-bucket smoothing: with a vocabulary far below 2^13 the
    // routes coincide up to (rare) collisions
    val corr = joined.agg(org.apache.spark.sql.functions.corr(col("we"), col("wh")))
      .head().getDouble(0)
    assert(corr > 0.95, s"exact-vs-hashed weight correlation $corr")
  }

  test("hashed ratio table width is bounded by 2^bits regardless of corpus") {
    val docs = graft.Tables.documents(spark, sf001)
    val target = docs.filter(col("source") === "src0")
    val pool = docs.filter(col("source") =!= "src0")
    val t = Dsir.hashedRatioTable(target, pool, "text", bits = 6).table
    assert(t.count() <= 64)
  }
}
