package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.DatasetDigest

class StreamingDigestSpec extends SparkSpec {

  test("incremental fold equals the batch digest of the union; replays are idempotent") {
    val sp = spark; import sp.implicits._
    val state = java.nio.file.Files.createTempDirectory("sdg").toString + "/digest"

    val b0 = (1L to 100L).map(i => (i, s"d $i")).toDF("doc_id", "text")
    val b1 = (101L to 250L).map(i => (i, s"d $i")).toDF("doc_id", "text")

    val d0 = StreamingDigest.process(spark, b0, state, batchId = 0)
    assert(d0 === DatasetDigest.digest(b0))

    val d1 = StreamingDigest.process(spark, b1, state, batchId = 1)
    assert(d1 === DatasetDigest.digest(b0.unionByName(b1)),
      "incremental fold must equal the union digest")

    // at-least-once replay of batch 1: fold skipped, state unchanged
    val replay = StreamingDigest.process(spark, b1, state, batchId = 1)
    assert(replay === d1, "replayed batch must not double-fold")

    // the accumulated value verifies a complete downstream copy and
    // catches a corrupted one
    val copy = b0.unionByName(b1)
    assert(DatasetDigest.digest(copy) === d1)
    val corrupted = copy.withColumn("text",
      when($"doc_id" === 42, "tampered").otherwise($"text"))
    assert(DatasetDigest.digest(corrupted) !== d1)
  }

  test("crash between delete and rename: reader recovers the staged state") {
    val sp = spark; import sp.implicits._
    val state = java.nio.file.Files.createTempDirectory("sdg_crash").toString + "/digest"
    val b0 = (1L to 50L).map(i => (i, s"x $i")).toDF("doc_id", "text")
    val d0 = StreamingDigest.process(spark, b0, state, batchId = 0)

    // simulate the crash window: main deleted, complete staging present
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val main = new org.apache.hadoop.fs.Path(state)
    val staging = new org.apache.hadoop.fs.Path(state + ".staging")
    val out = fs.create(staging, true)
    out.write(s"0:$d0".getBytes("UTF-8")); out.close()
    fs.delete(main, false)

    // next batch must fold on top of the recovered value, not restart at 0
    val b1 = (51L to 80L).map(i => (i, s"x $i")).toDF("doc_id", "text")
    val d1 = StreamingDigest.process(spark, b1, state, batchId = 1)
    assert(d1 === DatasetDigest.digest(b0.unionByName(b1)),
      "reader must recover the staged state after a delete/rename crash")
  }

  test("end-to-end stream over a parquet drop directory") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sdg_stream").toString
    val in = dir + "/in"; val state = dir + "/digest"; val ckpt = dir + "/ckpt"
    val docs = (1L to 120L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    docs.write.parquet(in)

    val q = StreamingDigest.start(spark, in, state, ckpt, docs.schema)
    q.awaitTermination(60000)

    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val s = scala.io.Source.fromInputStream(
      fs.open(new org.apache.hadoop.fs.Path(state)))
    val stored = try s.mkString.trim.split(":")(1).toLong finally s.close()
    assert(stored === DatasetDigest.digest(docs),
      "streamed digest must equal the batch digest of the drop dir")
  }
}
