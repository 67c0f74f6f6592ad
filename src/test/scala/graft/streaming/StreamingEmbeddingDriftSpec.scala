package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingEmbeddingDriftSpec extends SparkSpec {

  private def baseline = {
    val sp = spark; import sp.implicits._
    Seq(
      (1L, 0, Seq(1.0f, 0.0f)), (2L, 0, Seq(0.9f, 0.1f)),
      (10L, 1, Seq(0.0f, 1.0f)), (11L, 1, Seq(0.1f, 0.9f))
    ).toDF("vec_id", "label", "embedding")
  }

  test("process: a shifted label alerts, a faithful label stays quiet") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("edrift").toString
    val batch = Seq(
      (100L, 0, Seq(0.95f, 0.05f)), // label 0 faithful
      (110L, 1, Seq(1.0f, -0.5f)),  // label 1 centroid moved wholesale
      (111L, 1, Seq(0.9f, -0.4f))
    ).toDF("vec_id", "label", "embedding")
    StreamingEmbeddingDrift.process(baseline, batch, "label", "embedding",
      maxShift = 0.5, alertDir = s"$dir/alerts", batchId = 1L,
      reportDir = Some(s"$dir/reports"))
    val alerts = spark.read.parquet(s"$dir/alerts")
      .collect().map(r => r.getAs[Int]("label")).toSet
    assert(alerts == Set(1), s"alerts=$alerts")
    val report = spark.read.parquet(s"$dir/reports")
    assert(report.count() == 2) // both labels reported
    assert(report.filter(col("batch_id") === 1L).count() == 2)
  }

  test("stream drive: two file batches gate independently against the frozen baseline") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("edrifts").toString
    val in = s"$dir/in"
    new java.io.File(in).mkdirs()
    Seq((200L, 0, Seq(0.95f, 0.05f))).toDF("vec_id", "label", "embedding")
      .write.parquet(s"$in/b1") // faithful
    Seq((201L, 0, Seq(-1.0f, 0.0f))).toDF("vec_id", "label", "embedding")
      .write.parquet(s"$in/b2") // flipped
    val q = StreamingEmbeddingDrift.stream(spark, s"$in/*/",
      baseline.schema, baseline, "label", "embedding",
      maxShift = 0.5, alertDir = s"$dir/alerts", checkpointDir = s"$dir/ckpt")
    q.awaitTermination(60000)
    val alerts = spark.read.parquet(s"$dir/alerts")
    assert(alerts.count() == 1)
    assert(alerts.head().getAs[Int]("label") == 0)
  }
}
