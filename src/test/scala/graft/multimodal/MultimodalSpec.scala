package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def media = MediaOps.syntheticMedia(spark, 30)

  test("media schema: blobs + typed metadata; metadata filters don't touch bytes") {
    val m = media
    assert(m.schema("bytes").dataType.typeName === "binary")
    val images = m.filter(col("kind") === "image" && col("meta.width") >= 960)
    assert(images.count() > 0)
  }

  test("decode via mapPartitions: one feature row per media row, deterministic") {
    val feats1 = MediaOps.decode(media, new MediaOps.FakeDecoder(16)).collect()
    val feats2 = MediaOps.decode(media.repartition(7), new MediaOps.FakeDecoder(16)).collect()
    assert(feats1.length === 30)
    val m1 = feats1.map(f => f.media_id -> f.content_hash).toMap
    val m2 = feats2.map(f => f.media_id -> f.content_hash).toMap
    assert(m1 === m2, "decode must be partitioning-invariant")
    feats1.foreach { f =>
      assert(f.embedding.length === 16)
      assert(f.n_bytes >= 64)
    }
  }

  test("decoded features feed the ANN path (binary -> embedding -> top-k)") {
    val sp = spark; import sp.implicits._
    val feats = MediaOps.decode(media, new MediaOps.FakeDecoder(16)).toDF()
    val queries = feats.limit(3)
      .select(col("media_id").as("qid"), col("embedding").as("qvec"))
    val top = graft.ann.Ann.bruteForceTopK(feats, queries,
      "media_id", "embedding", "qid", "qvec", 3)
    val rank1 = top.filter(col("rnk") === 1).collect()
    assert(rank1.forall(r => r.getAs[Long]("query_id") === r.getAs[Long]("neighbor_id")))
  }

  test("resize plan preserves aspect ratio and never upscales") {
    val planned = MediaOps.resizePlan(media.filter(col("kind") === "image"), 320, 320)
      .select(col("meta.width"), col("meta.height"), col("target_width"), col("target_height"))
      .collect()
    planned.foreach { r =>
      val (w, h, tw, th) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(tw <= 320 && th <= 320)
      assert(tw <= w && th <= h)
      // aspect preserved within rounding
      assert(math.abs(tw.toDouble / th - w.toDouble / h) < 0.02)
    }
  }

  test("frame-sample plan emits duration/step+1 rows per video") {
    val videos = media.filter(col("kind") === "video")
    val frames = MediaOps.frameSamplePlan(media, 500L)
    val counts = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    videos.select(col("media_id"), col("meta.duration_ms")).collect().foreach { r =>
      val expect = r.getLong(1) / 500L + 1
      assert(counts(r.getLong(0)) === expect)
    }
  }

  test("RealDecoder is an explicit stub (documents the codec boundary)") {
    intercept[NotImplementedError] {
      new MediaOps.RealDecoder().features(1L, "image", Array[Byte](1, 2))
    }
  }
}
