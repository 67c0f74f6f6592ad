package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ImageDedupSpec extends SparkSpec {

  private def pngBytes(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("avgHash: bits are the above-mean feature buckets") {
    val sp = spark; import sp.implicits._
    // emb = [0, 0, 1, 1]: mean 0.5 -> bits 2 and 3 -> fp = 0b1100 = 12
    val fp = Seq(Tuple1(Seq(0.0, 0.0, 1.0, 1.0))).toDF("emb")
      .select(ImageDedup.avgHash($"emb", 4).as("fp")).first().getLong(0)
    assert(fp === 12L)
  }

  test("banded near-dup pairs equal the all-pairs Hamming result (pigeonhole exactness)") {
    val sp = spark; import sp.implicits._
    // deterministic fake features over real docs
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val hx = md5($"text".cast("binary"))
    val features = docs.select($"doc_id",
      array((0 until 16).map(d =>
        conv(substring(hx, 2 * d + 1, 2), 16, 10).cast("long")
          .cast("double") / 256.0): _*).as("emb"))

    val banded = ImageDedup.nearDupPairs(features, "doc_id", "emb",
        maxHamming = 1, maxBucketSize = 1000000, chunks = 2, chunkBits = 8)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val fp = features.select($"doc_id", ImageDedup.avgHash($"emb", 16).as("fp"))
    val all = fp.as("a").crossJoin(fp.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id") &&
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= 1)
      .select(col("a.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(banded === all, "banded join must find exactly the all-pairs result")
    assert(banded.nonEmpty, "fixture should contain at least one near-dup pair")
  }

  test("RealDecoder pixel features: re-encoded/perturbed image pairs found, distinct images not") {
    val sp = spark; import sp.implicits._
    val w = 32; val h = 32
    // smooth gradient base image; near-dup = 3 pixels nudged slightly;
    // distinct = a different pattern entirely
    def grad(x: Int, y: Int): Int = {
      val l = (x * 8 + y * 4) % 256
      (l << 16) | (l << 8) | l
    }
    val base = pngBytes(w, h)(grad)
    val nearDup = pngBytes(w, h) { (x, y) =>
      if (x == 5 && y < 3) { val l = ((x * 8 + y * 4) % 256 + 6) % 256; (l << 16) | (l << 8) | l }
      else grad(x, y)
    }
    val distinct = pngBytes(w, h) { (x, y) =>
      val l = (x * y * 37 + 11) % 256
      (l << 16) | (l << 8) | l
    }
    val media = Seq(
      (1L, "image", base), (2L, "image", nearDup), (3L, "image", distinct)
    ).toDF("media_id", "kind", "bytes")
      .withColumn("meta", lit(null).cast(MediaOps.metadataType))

    val pairs = ImageDedup.pairsForMedia(media, new MediaOps.RealDecoder(64),
        maxHamming = 3, chunks = 4, chunkBits = 16)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      "perturbed re-encode of the same image must pair with the original")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "an unrelated image must not pair")
  }
}
