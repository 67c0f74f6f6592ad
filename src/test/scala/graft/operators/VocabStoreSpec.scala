package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class VocabStoreSpec extends SparkSpec {

  private def asMap(df: DataFrame): Map[String, (Long, Long)] =
    df.select(col("w"), col("n"), col("df")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def scratch(rows: Seq[(Long, String)]): Map[String, (Long, Long)] = {
    val sp = spark; import sp.implicits._
    asMap(VocabStore.fromScratch(rows.toDF("doc_id", "w"), "doc_id", "w"))
  }

  // postings with repeated terms per doc (df < n must hold somewhere)
  private def mkPostings(rnd: scala.util.Random, docs: Range)
      : Seq[(Long, String)] = {
    val words = Seq("the", "cat", "sat", "mat", "dog", "ran", "far")
    docs.flatMap { d =>
      (0 until 3 + rnd.nextInt(5)).map(_ => (d.toLong, words(rnd.nextInt(7))))
    }
  }

  test("create+append equals from-scratch stats exactly; df sums across doc-disjoint batches") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(79L)
    val base = mkPostings(rnd, 0 until 40)
    val delta = mkPostings(rnd, 40 until 55)
    val path = java.nio.file.Files.createTempDirectory("vocabstore").toString + "/st"
    VocabStore.create(spark, base.toDF("doc_id", "w"), "doc_id", "w", path)
    VocabStore.append(spark, delta.toDF("doc_id", "w"), "doc_id", "w", path)
    val served = asMap(VocabStore.read(spark, path))
    assert(served == scratch(base ++ delta))
    // the fixture exercises the n/df distinction
    assert(served.exists { case (_, (n, df)) => n > df })
  }

  test("remove subtracts whole documents exactly; replay no-op; foreign postings fail loud") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(89L)
    val keep = mkPostings(rnd, 0 until 40)
    val drop = mkPostings(rnd, 40 until 55)
    val path = java.nio.file.Files.createTempDirectory("vocabdrop").toString + "/st"
    VocabStore.create(spark, (keep ++ drop).toDF("doc_id", "w"), "doc_id", "w", path)
    VocabStore.removeBatch(spark, drop.toDF("doc_id", "w"), "doc_id", "w",
      path, removeId = 0L)
    assert(asMap(VocabStore.read(spark, path)) == scratch(keep),
      "post-removal stats must equal a from-scratch build on the kept docs")
    // replayed removal id: no-op (would otherwise double-subtract)
    VocabStore.removeBatch(spark, drop.toDF("doc_id", "w"), "doc_id", "w",
      path, removeId = 0L)
    assert(asMap(VocabStore.read(spark, path)) == scratch(keep))
    // removing never-absorbed postings fails loud without publishing
    val ex = intercept[IllegalArgumentException] {
      VocabStore.remove(spark, (keep ++ keep).toDF("doc_id", "w"),
        "doc_id", "w", path)
    }
    assert(ex.getMessage.contains("never absorbed"))
    assert(asMap(VocabStore.read(spark, path)) == scratch(keep))
  }

  test("appendBatch guards redelivery (this monoid is NOT idempotent); stream drive == from-scratch") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(83L)
    val seed = mkPostings(rnd, 0 until 30)
    val b1 = mkPostings(rnd, 100 until 110)
    val b2 = mkPostings(rnd, 200 until 215)
    val root = java.nio.file.Files.createTempDirectory("vocabstream").toString
    val path = s"$root/st"
    VocabStore.create(spark, seed.toDF("doc_id", "w"), "doc_id", "w", path)
    VocabStore.appendBatch(spark, b1.toDF("doc_id", "w"), "doc_id", "w", path, 0L)
    val once = asMap(VocabStore.read(spark, path))
    VocabStore.appendBatch(spark, b1.toDF("doc_id", "w"), "doc_id", "w", path, 0L)
    assert(asMap(VocabStore.read(spark, path)) == once,
      "redelivered batch must not double n/df")
    VocabStore.appendBatch(spark, b2.toDF("doc_id", "w"), "doc_id", "w", path, 1L)
    assert(asMap(VocabStore.read(spark, path)) == scratch(seed ++ b1 ++ b2))

    // file-stream drive over a fresh store
    val path2 = s"$root/st2"
    VocabStore.create(spark, seed.toDF("doc_id", "w"), "doc_id", "w", path2)
    val inDir = s"$root/in"
    b1.toDF("doc_id", "w").write.parquet(s"$inDir/b1")
    b2.toDF("doc_id", "w").write.parquet(s"$inDir/b2")
    val q = graft.streaming.StreamingVocab.stream(
      spark, s"$inDir/*", b1.toDF("doc_id", "w").schema,
      "doc_id", "w", path2, s"$root/ckpt")
    q.awaitTermination()
    assert(asMap(VocabStore.read(spark, path2)) == scratch(seed ++ b1 ++ b2))
  }
}
