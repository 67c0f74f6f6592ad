package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.ml.NaiveBayes
import org.apache.spark.sql.functions._

class StreamingClassifierGateSpec extends SparkSpec {

  private def model = {
    val sp = spark; import sp.implicits._
    val train = Seq(
      (1L, "good", "clean prose with verbs and structure here"),
      (2L, "good", "clean structure and prose with meaning"),
      (3L, "spam", "buy buy cheap cheap click click"),
      (4L, "spam", "cheap click buy now now now")
    ).toDF("doc_id", "label", "text")
    NaiveBayes.train(train, "label", "text")
  }

  test("scoredWithMargin: margin is best-minus-second and positive") {
    val sp = spark; import sp.implicits._
    val batch = Seq((10L, "clean prose with structure"), (11L, "buy cheap click"))
      .toDF("doc_id", "text")
    val s = StreamingClassifierGate.scoredWithMargin(model, batch, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(3))).toMap
    assert(s(10L)._1 == "good")
    assert(s(11L)._1 == "spam")
    assert(s(10L)._2 > 0 && s(11L)._2 > 0)
  }

  test("process routes admitted vs quarantined with reasons") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("gate").toString
    val batch = Seq(
      (10L, "clean prose with structure and verbs"), // good, margin ~5.9
      (11L, "buy cheap click click"),                // spam -> class_not_allowed
      (12L, "clean prose")                           // good but margin ~2.1 < 2.5
    ).toDF("doc_id", "text")
    StreamingClassifierGate.process(batch, model, "doc_id", "text",
      allowed = Set("good"), minMargin = 2.5,
      keepDir = s"$dir/keep", quarantineDir = s"$dir/quarantine")
    val keep = spark.read.parquet(s"$dir/keep")
    val quar = spark.read.parquet(s"$dir/quarantine")
    assert(keep.select("doc_id").collect().map(_.getLong(0)).toSet == Set(10L))
    val reasons = quar.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
    assert(reasons(11L) == "class_not_allowed")
    assert(reasons(12L) == "low_margin")
  }

  test("null-id rows are quarantined as unscored, never silently lost") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("gatenull").toString
    // a null id never equi-joins back from the scorer: predicted/margin
    // stay null, and an un-coalesced admit predicate would drop the row
    // from BOTH sinks — the no-silent-drop contract requires quarantine
    val batch = Seq[(java.lang.Long, String)](
      (10L, "clean prose with structure and verbs"),
      (null, "clean prose with structure and verbs")
    ).toDF("doc_id", "text")
    StreamingClassifierGate.process(batch, model, "doc_id", "text",
      allowed = Set("good"), minMargin = 0.0,
      keepDir = s"$dir/keep", quarantineDir = s"$dir/quarantine")
    val keep = spark.read.parquet(s"$dir/keep")
    val quar = spark.read.parquet(s"$dir/quarantine")
    assert(keep.count() + quar.count() == 2, "a row was silently dropped")
    assert(keep.select("doc_id").collect().map(_.getLong(0)).toSet == Set(10L))
    val qRows = quar.collect()
    assert(qRows.length == 1 && qRows(0).isNullAt(qRows(0).fieldIndex("doc_id")))
    assert(qRows(0).getAs[String]("reason") == "unscored")
  }

  test("file-stream drive: two batches gate identically to one batch run") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("gates").toString
    val in = s"$dir/in"
    new java.io.File(in).mkdirs()
    val b1 = Seq((20L, "clean structure and prose"), (21L, "cheap click buy"))
      .toDF("doc_id", "text")
    val b2 = Seq((22L, "prose with clean verbs"), (23L, "click click cheap"))
      .toDF("doc_id", "text")
    b1.write.parquet(s"$in/b1")
    b2.write.parquet(s"$in/b2")
    val m = model
    val q = StreamingClassifierGate.stream(spark, s"$in/*/",
      b1.schema, m, "doc_id", "text",
      allowed = Set("good"), minMargin = 0.0,
      keepDir = s"$dir/keep", quarantineDir = s"$dir/quarantine",
      checkpointDir = s"$dir/ckpt")
    q.awaitTermination(60000)
    val kept = spark.read.parquet(s"$dir/keep")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rej = spark.read.parquet(s"$dir/quarantine")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(20L, 22L), s"kept=$kept")
    assert(rej == Set(21L, 23L), s"rej=$rej")
  }

  test("learning loop: labelled stream feeds the model store; the refreshed model gates") {
    import org.apache.spark.sql.streaming.Trigger
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("gatelearn").toString
    val in = s"$dir/in"
    new java.io.File(in).mkdirs()
    // two labelled training batches arrive as files
    Seq((1L, "good", "clean prose with verbs"), (2L, "spam", "buy cheap click"))
      .toDF("doc_id", "label", "text").write.parquet(s"$in/b1")
    Seq((3L, "good", "structure and meaning in prose"), (4L, "spam", "click now cheap buy"))
      .toDF("doc_id", "label", "text").write.parquet(s"$in/b2")
    graft.ml.NbModelStore.create(spark,
      Seq.empty[(Long, String, String)].toDF("doc_id", "label", "text"),
      "label", "text", s"$dir/model")
    val schema = spark.read.parquet(s"$in/b1").schema
    val q = spark.readStream.schema(schema).parquet(s"$in/*/")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ml.NbModelStore.append(spark, batch, "label", "text", s"$dir/model")
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // the streamed-in store now equals batch training on all 4 docs
    val m = graft.ml.NbModelStore.model(spark, s"$dir/model")
    val gate = Seq((10L, "clean prose"), (11L, "cheap click")).toDF("doc_id", "text")
    StreamingClassifierGate.process(gate, m, "doc_id", "text",
      allowed = Set("good"), minMargin = 0.0,
      keepDir = s"$dir/keep", quarantineDir = s"$dir/quarantine")
    val kept = spark.read.parquet(s"$dir/keep")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L))
  }
}
