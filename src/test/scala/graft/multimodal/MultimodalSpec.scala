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

  /** A 6x4 image, top half black, bottom half white, encoded by the
    * JDK's own writer for `format` (png/bmp). */
  private def tinyImage(format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 6)
      img.setRGB(x, y, if (y < 2) 0x000000 else 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"JDK cannot write $format")
    out.toByteArray
  }

  /** 16-bit LE mono PCM WAV: n samples alternating min/max amplitude. */
  private def tinyWav(n: Int): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s: Short = if (i % 2 == 0) Short.MinValue else Short.MaxValue
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("RealDecoder decodes PNG/BMP through the mapPartitions path; embedding is pixel-derived") {
    val sp = spark; import sp.implicits._
    val png = tinyImage("png")
    val bmp = tinyImage("bmp")
    val df = Seq((1L, "image", png), (2L, "image", bmp))
      .toDF("media_id", "kind", "bytes")
    val feats = MediaOps.decode(df, new MediaOps.RealDecoder(16))
      .collect().sortBy(_.media_id)

    // content hash is the real md5 of the container bytes
    val md5 = java.security.MessageDigest.getInstance("MD5")
    assert(feats(0).content_hash === md5.digest(png).map(b => f"$b%02x").mkString)

    // half the pixels are black (bucket 0), half white (bucket 15)
    feats.foreach { f =>
      assert(math.abs(f.embedding.sum - 1f) < 1e-6)
      assert(math.abs(f.embedding(0) - 0.5f) < 1e-6, f.embedding.mkString(","))
      assert(math.abs(f.embedding(15) - 0.5f) < 1e-6)
    }
    // same pixels, different container: same embedding, different hash
    assert(feats(0).embedding.sameElements(feats(1).embedding))
    assert(feats(0).content_hash !== feats(1).content_hash)
  }

  test("RealDecoder decodes WAV; amplitude histogram is normalized and split across extremes") {
    val sp = spark; import sp.implicits._
    val df = Seq((3L, "audio", tinyWav(64))).toDF("media_id", "kind", "bytes")
    val f = MediaOps.decode(df, new MediaOps.RealDecoder(16)).collect().head
    assert(math.abs(f.embedding.sum - 1f) < 1e-6)
    assert(math.abs(f.embedding(0) - 0.5f) < 1e-6)   // Short.MinValue bucket
    assert(math.abs(f.embedding(15) - 0.5f) < 1e-6)  // Short.MaxValue bucket
  }

  test("RealDecoder honors container byte order: big-endian AIFF == little-endian WAV") {
    val sp = spark; import sp.implicits._
    val n = 64
    val fmtBE = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val pcmBE = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s: Short = if (i % 2 == 0) Short.MinValue else Short.MaxValue
      pcmBE(2 * i) = ((s >> 8) & 0xFF).toByte
      pcmBE(2 * i + 1) = (s & 0xFF).toByte
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcmBE), fmtBE, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    val df = Seq((6L, "audio", out.toByteArray)).toDF("media_id", "kind", "bytes")
    val f = MediaOps.decode(df, new MediaOps.RealDecoder(16)).collect().head
    // same alternating-extremes signal as the WAV test: half min, half max
    assert(math.abs(f.embedding(0) - 0.5f) < 1e-6, f.embedding.mkString(","))
    assert(math.abs(f.embedding(15) - 0.5f) < 1e-6)
  }

  test("RealDecoder fails loud on video and on undecodable image bytes") {
    val dec = new MediaOps.RealDecoder(16)
    intercept[UnsupportedOperationException] {
      dec.features(4L, "video", Array[Byte](1, 2, 3))
    }
    intercept[IllegalArgumentException] {
      dec.features(5L, "image", Array[Byte](1, 2, 3))
    }
  }
}
