package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SampleStoreSpec extends SparkSpec {

  private def asSet(df: DataFrame): Set[(String, Long)] =
    df.select(col("stratum"), col("key")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  private def scratch(rows: Seq[(String, Long)], k: Int): Set[(String, Long)] = {
    val sp = spark; import sp.implicits._
    asSet(SampleStore.fromScratch(rows.toDF("lang", "doc_id"),
      "lang", "doc_id", ":t", k))
  }

  test("create+append equals from-scratch exactly; small strata keep all rows") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(71L)
    val langs = Seq("en", "de", "fr", "tiny")
    val all = (0 until 600).map(i =>
      (if (i < 3) "tiny" else langs(rnd.nextInt(3)), i.toLong))
    val (base, delta) = all.splitAt(450)
    val path = java.nio.file.Files.createTempDirectory("samplestore").toString + "/st"
    SampleStore.create(spark, base.toDF("lang", "doc_id"),
      "lang", "doc_id", ":t", k = 16, path = path)
    SampleStore.append(spark, delta.toDF("lang", "doc_id"),
      "lang", "doc_id", path)
    val served = asSet(SampleStore.read(spark, path))
    assert(served == scratch(all, 16))
    // a stratum smaller than k keeps every row
    assert(served.count(_._1 == "tiny") == 3)
    // per-stratum caps hold
    served.groupBy(_._1).foreach { case (s, rows) => assert(rows.size <= 16, s) }
    // the monoid is idempotent: re-appending the same batch through
    // the RAW append changes nothing
    SampleStore.append(spark, delta.toDF("lang", "doc_id"),
      "lang", "doc_id", path)
    assert(asSet(SampleStore.read(spark, path)) == scratch(all, 16))
  }

  test("appendBatch skips replayed ids; stream drive == from-scratch") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(73L)
    def mk(n: Int, from: Int) = (0 until n).map(i =>
      (Seq("en", "de")(rnd.nextInt(2)), (from + i).toLong))
    val seed = mk(200, 0); val b1 = mk(80, 1000); val b2 = mk(60, 2000)
    val root = java.nio.file.Files.createTempDirectory("samplestream").toString
    val path = s"$root/st"
    SampleStore.create(spark, seed.toDF("lang", "doc_id"),
      "lang", "doc_id", ":t", 16, path)
    SampleStore.appendBatch(spark, b1.toDF("lang", "doc_id"),
      "lang", "doc_id", path, 0L)
    val once = asSet(SampleStore.read(spark, path))
    SampleStore.appendBatch(spark, b1.toDF("lang", "doc_id"),
      "lang", "doc_id", path, 0L)
    assert(asSet(SampleStore.read(spark, path)) == once)
    SampleStore.appendBatch(spark, b2.toDF("lang", "doc_id"),
      "lang", "doc_id", path, 1L)
    assert(asSet(SampleStore.read(spark, path)) ==
      scratch(seed ++ b1 ++ b2, 16))

    // file-stream drive over a fresh store
    val path2 = s"$root/st2"
    SampleStore.create(spark, seed.toDF("lang", "doc_id"),
      "lang", "doc_id", ":t", 16, path2)
    val inDir = s"$root/in"
    b1.toDF("lang", "doc_id").write.parquet(s"$inDir/b1")
    b2.toDF("lang", "doc_id").write.parquet(s"$inDir/b2")
    val q = graft.streaming.StreamingSample.stream(
      spark, s"$inDir/*", b1.toDF("lang", "doc_id").schema,
      "lang", "doc_id", path2, s"$root/ckpt")
    q.awaitTermination()
    assert(asSet(SampleStore.read(spark, path2)) ==
      scratch(seed ++ b1 ++ b2, 16))
  }
}
