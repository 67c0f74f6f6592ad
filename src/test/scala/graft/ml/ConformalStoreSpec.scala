package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConformalStoreSpec extends SparkSpec {

  private def oneShot(scores: Seq[Double], q: Double): Double = {
    val sp = spark; import sp.implicits._
    scores.toDF("score").agg(percentile(col("score"), lit(q)))
      .head.getDouble(0)
  }

  test("create+append threshold equals the one-shot quantile bit-for-bit") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(61L)
    // the corpus quality-score shape: bounded distinct support
    val all = (0 until 500).map(_ => math.min(rnd.nextInt(900) / 600.0, 1.0))
    val (base, delta) = all.splitAt(350)
    val path = java.nio.file.Files.createTempDirectory("confstore").toString + "/st"
    ConformalStore.create(spark, base.toDF("score"), "score", path)
    ConformalStore.append(spark, delta.toDF("score"), "score", path)
    for (q <- Seq(0.1, 0.2, 0.5, 0.9)) {
      val served = ConformalStore.threshold(spark, path, q)
      assert(served == oneShot(all, q), s"q=$q")
    }
    // the store is histogram-sized, not corpus-sized
    assert(ConformalStore.read(spark, path).count() == all.distinct.size)
    // a second append keeps folding exactly
    ConformalStore.append(spark, delta.toDF("score"), "score", path)
    assert(ConformalStore.threshold(spark, path, 0.2) ==
      oneShot(all ++ delta, 0.2))
  }

  test("remove subtracts exactly; replayed removeBatch no-op; foreign rows fail loud") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(97L)
    val keep = (0 until 300).map(_ => rnd.nextInt(300) / 100.0)
    val drop = (0 until 120).map(_ => rnd.nextInt(300) / 100.0)
    val path = java.nio.file.Files.createTempDirectory("confdrop").toString + "/st"
    ConformalStore.create(spark, (keep ++ drop).toDF("score"), "score", path)
    ConformalStore.removeBatch(spark, drop.toDF("score"), "score", path, 0L)
    for (q <- Seq(0.2, 0.5, 0.9))
      assert(ConformalStore.threshold(spark, path, q) == oneShot(keep, q), s"q=$q")
    // replayed removal id: no-op (would otherwise double-subtract)
    ConformalStore.removeBatch(spark, drop.toDF("score"), "score", path, 0L)
    assert(ConformalStore.threshold(spark, path, 0.2) == oneShot(keep, 0.2))
    // appends still fold after a removal; the batch guard survives it
    val more = (0 until 50).map(_ => rnd.nextInt(300) / 100.0)
    ConformalStore.appendBatch(spark, more.toDF("score"), "score", path, 0L)
    assert(ConformalStore.threshold(spark, path, 0.2) ==
      oneShot(keep ++ more, 0.2))
    // removing rows never absorbed fails loud without publishing
    val ex = intercept[IllegalArgumentException] {
      ConformalStore.remove(spark,
        (keep ++ more ++ more).toDF("score"), "score", path)
    }
    assert(ex.getMessage.contains("never absorbed"))
    assert(ConformalStore.threshold(spark, path, 0.2) ==
      oneShot(keep ++ more, 0.2))
  }

  test("appendBatch redelivery never double-counts; stream drive == one-shot") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(67L)
    def mk(n: Int) = (0 until n).map(_ => rnd.nextInt(200) / 100.0)
    val seed = mk(150); val b1 = mk(60); val b2 = mk(40)
    val root = java.nio.file.Files.createTempDirectory("confstream").toString
    val path = s"$root/st"
    ConformalStore.create(spark, seed.toDF("score"), "score", path)
    def histMap() = ConformalStore.read(spark, path).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    ConformalStore.appendBatch(spark, b1.toDF("score"), "score", path, 0L)
    val once = histMap()
    ConformalStore.appendBatch(spark, b1.toDF("score"), "score", path, 0L)
    assert(histMap() == once, "redelivered batch must not double-count")
    ConformalStore.appendBatch(spark, b2.toDF("score"), "score", path, 1L)
    ConformalStore.appendBatch(spark, b2.toDF("score"), "score", path, 1L)
    assert(ConformalStore.threshold(spark, path, 0.2) ==
      oneShot(seed ++ b1 ++ b2, 0.2))

    // file-stream drive over a fresh store: drained batches == one
    // batch build over everything delivered
    val path2 = s"$root/st2"
    ConformalStore.create(spark, seed.toDF("score"), "score", path2)
    val inDir = s"$root/in"
    b1.toDF("score").write.parquet(s"$inDir/b1")
    b2.toDF("score").write.parquet(s"$inDir/b2")
    val q = graft.streaming.StreamingConformal.stream(
      spark, s"$inDir/*", b1.toDF("score").schema, "score", path2,
      s"$root/ckpt")
    q.awaitTermination()
    assert(ConformalStore.threshold(spark, path2, 0.2) ==
      oneShot(seed ++ b1 ++ b2, 0.2))
  }
}
