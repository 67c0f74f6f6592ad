package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample dataflows.
  *
  * The decode kernel is an injected interface: `RealDecoder` decodes
  * the formats the JDK ships codecs for (PNG/BMP/GIF/JPEG via
  * javax.imageio, WAV/AU/AIFF via javax.sound.sampled) and fails loud
  * on the rest (video needs external codecs this container lacks);
  * `FakeDecoder` is the deterministic byte-derived fake for pipeline
  * tests that must not depend on pixel semantics. Everything
  * Spark-side is real and tested: the schema, the mapPartitions batch
  * shape (one decoder instance per partition, streamed rows, no
  * collect), partition sizing for ~MB-scale blobs, and the downstream
  * feature columns.
  *
  * At 100 TB the layout rules are: blobs live in their own column
  * (parquet keeps them off the scan path unless projected), metadata
  * in a sibling struct so filters (kind/width/duration) push down
  * without touching bytes, and decode runs partition-local with
  * `spark.sql.files.maxPartitionBytes` sized so a partition's blobs
  * fit in executor memory.
  */
object MediaOps {

  val metadataType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", metadataType)))

  /** Decoded-feature row produced by the decode stage. `content_hash`
    * is lowercase-hex md5 of the blob bytes — a hash any engine can
    * recompute (DuckDB `md5()` natively), so the decode path is
    * end-to-end oracle-checkable, not just deterministic. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      content_hash: String,
      embedding: Array[Float])

  /** The decode kernel boundary. One instance per partition — this is
    * where a real implementation would hold codec contexts. */
  trait Decoder extends Serializable {
    def features(mediaId: Long, kind: String, bytes: Array[Byte]): MediaFeatures
  }

  /** Codec-backed decoder for the formats the JDK itself ships codecs
    * for — no external libraries:
    *   - image: PNG/BMP/GIF/JPEG via `javax.imageio` — embedding is a
    *     `dim`-bucket luminance histogram over the decoded pixels,
    *     L1-normalized (deterministic in the pixel data, invariant to
    *     how the bytes were container-encoded);
    *   - audio: WAV/AU/AIFF via `javax.sound.sampled` — embedding is a
    *     `dim`-bucket histogram of normalized PCM amplitude;
    *   - video: no JDK codec exists — fails loud (a silently zeroed
    *     embedding would look plausible downstream).
    * Undecodable/corrupt bytes also fail loud, same rationale. One
    * instance per partition (the `decode` mapPartitions contract);
    * codec state is transient and per-call. */
  final class RealDecoder(dim: Int = 16) extends Decoder {
    @transient private lazy val md5 =
      java.security.MessageDigest.getInstance("MD5")

    def features(mediaId: Long, kind: String, bytes: Array[Byte]): MediaFeatures = {
      val hex = md5.digest(bytes).map(b => f"$b%02x").mkString
      val emb = kind match {
        case "image" => imageHistogram(mediaId, bytes)
        case "audio" => audioHistogram(mediaId, bytes)
        case other => throw new UnsupportedOperationException(
          s"media $mediaId: no JDK codec for kind '$other' (video needs an external decoder)")
      }
      MediaFeatures(mediaId, kind, bytes.length.toLong, hex, emb)
    }

    private def imageHistogram(mediaId: Long, bytes: Array[Byte]): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null)
        throw new IllegalArgumentException(
          s"media $mediaId: bytes are not a JDK-decodable image (png/bmp/gif/jpeg)")
      val hist = new Array[Float](dim)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
            0.114 * (rgb & 0xFF)
          val b = math.min((lum * dim / 256.0).toInt, dim - 1)
          hist(b) += 1f
          x += 1
        }
        y += 1
      }
      l1Normalize(hist, (w.toLong * h).toFloat)
    }

    private def audioHistogram(mediaId: Long, bytes: Array[Byte]): Array[Float] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16)
          throw new IllegalArgumentException(
            s"media $mediaId: only 16-bit PCM supported, got $fmt")
        // WAV is little-endian; AU/AIFF are big-endian by spec —
        // honor the container's declared byte order
        val big = fmt.isBigEndian
        val raw = in.readAllBytes()
        val hist = new Array[Float](dim)
        val n = raw.length / 2
        var i = 0
        while (i < n) {
          val s =
            if (big) ((raw(2 * i) << 8) | (raw(2 * i + 1) & 0xFF)).toShort
            else ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xFF)).toShort
          // normalize [-32768, 32767] -> [0, dim)
          val b = math.min(((s.toInt + 32768) * dim / 65536), dim - 1)
          hist(b) += 1f
          i += 1
        }
        l1Normalize(hist, n.toFloat)
      } finally in.close()
    }

    private def l1Normalize(hist: Array[Float], n: Float): Array[Float] = {
      require(n > 0, "empty media payload")
      var i = 0
      while (i < hist.length) { hist(i) /= n; i += 1 }
      hist
    }
  }

  /** Deterministic fake: features derived purely from the bytes, so
    * pipelines are testable end-to-end without codecs. The hash is
    * md5 (not a bespoke polynomial) so an external oracle can verify
    * the decode output; the fake embedding is seeded from the digest. */
  final class FakeDecoder(dim: Int = 16) extends Decoder {
    // one digest instance per decoder (= per partition), reset by each
    // digest() call; transient because codec-ish state never serializes
    @transient private lazy val md5 =
      java.security.MessageDigest.getInstance("MD5")
    def features(mediaId: Long, kind: String, bytes: Array[Byte]): MediaFeatures = {
      val digest = md5.digest(bytes)
      val hex = digest.map(b => f"$b%02x").mkString
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (digest(i) & 0xFFL); i += 1 }
      val emb = Array.tabulate(dim) { d =>
        val x = h ^ (d.toLong * 0x9E3779B97F4A7C15L)
        ((x % 1000L) / 1000.0f)
      }
      MediaFeatures(mediaId, kind, bytes.length.toLong, hex, emb)
    }
  }

  /** Decode stage: partition-local mapPartitions over (media_id, kind,
    * bytes) — the Scala-native analogue of a mapInPandas batch UDF:
    * streamed iterator in, streamed iterator out, one decoder per
    * partition, never a driver collect. */
  def decode(media: DataFrame, decoder: Decoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          decoder.features(id, kind, Option(bytes).getOrElse(Array.emptyByteArray))
        }
      }
  }

  /** Resize planning: pure metadata transform (aspect-preserving fit
    * into maxW x maxH). The byte-level resample belongs to the decode
    * kernel; the plan columns are what the pipeline schedules on. */
  def resizePlan(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    media.withColumn("target_width", ceil(w * scale).cast("int"))
      .withColumn("target_height", ceil(h * scale).cast("int"))
  }

  /** Frame sampling: one output row per sampled frame index, derived
    * from duration metadata — a generate/explode dataflow (no decode
    * needed to *plan* the sampling; the decoder later seeks by index). */
  def frameSamplePlan(video: DataFrame, everyMs: Long): DataFrame =
    video.filter(col("kind") === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0L), coalesce(col("meta.duration_ms"), lit(0L)), lit(everyMs))))
      .select(col("media_id"), col("frame_ms"))

  /** Wrap a text table as a media table (bytes = the UTF-8 text, kind
    * assigned round-robin, no metadata) — the oracle-checkable media
    * fixture: an external engine recomputes md5 over the same text
    * bytes, so the whole mapPartitions decode path gets a hard
    * end-to-end hash check instead of a determinism-only one. */
  def mediaFromText(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      lit(null).cast(metadataType).as("meta"))

  final case class MediaMeta(
      format: String,
      width: Option[Int],
      height: Option[Int],
      channels: Option[Int],
      sample_rate: Option[Int],
      duration_ms: Option[Long])

  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)

  /** Deterministic synthetic media table (for demos/tests): blob bytes
    * and metadata derived from the id. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val kinds = Seq("image", "audio", "video")
    (0 until n).map { i =>
      val kind = kinds(i % 3)
      val bytes = Array.tabulate(64 + (i % 64))(j => ((i * 131 + j * 7) % 256).toByte)
      val meta = kind match {
        case "image" => MediaMeta("png", Some(640 + (i % 4) * 320), Some(480 + (i % 3) * 240),
          Some(3), None, None)
        case "audio" => MediaMeta("wav", None, None, Some(2), Some(44100), Some(1000L + i * 250L))
        case _ => MediaMeta("mp4", Some(1920), Some(1080), Some(3), None, Some(2000L + i * 500L))
      }
      MediaRow(i.toLong, kind, bytes, meta)
    }.toDF()
  }
}
