package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stratified media-mix sampler: stratum labeling, deterministic
  * acceptance, balance direction, and determinism across runs. */
class MediaMixSpec extends SparkSpec {

  private def media = {
    val sp = spark; import sp.implicits._
    // 3 kinds x skewed sizes: image small (60 of bucket 0), audio
    // split, video all bucket 1
    (0 until 120).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val size = kind match {
        case "image" => 100L
        case "audio" => if (i < 60) 100L else 300L
        case _ => 300L
      }
      (i.toLong, kind, size)
    }.toDF("media_id", "kind", "n_bytes")
  }

  test("stratum: kind x floor(size/bucket) label") {
    val got = media.select(
        MediaMix.stratum(col("kind"), col("n_bytes"), 256L).as("s"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(got == Set("image:0", "audio:0", "audio:1", "video:1"))
  }

  test("balanceStrata: every stratum downsampled toward the smallest; deterministic") {
    val kept = MediaMix.balanceStrata(media, "kind", "n_bytes", 256L, "media_id")
    val report = MediaMix.mixReport(kept, "media_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = media.withColumn("s",
        MediaMix.stratum(col("kind"), col("n_bytes"), 256L))
      .groupBy(col("s")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val smallest = full.values.min
    // hash-gated acceptance: kept <= full per stratum, expected size ~
    // the smallest stratum; the smallest stratum keeps a rate-1 pass
    report.foreach { case (s, n) => assert(n <= full(s), s"stratum $s grew") }
    val smallestStratum = full.minBy(_._2)._1
    assert(report(smallestStratum) == smallest,
      "the smallest stratum is the target: rate 1, everything kept")
    // deterministic: the exact same kept set on a second run
    val a = kept.select(col("media_id")).collect().map(_.getLong(0)).toSet
    val b = MediaMix.balanceStrata(media, "kind", "n_bytes", 256L, "media_id")
      .select(col("media_id")).collect().map(_.getLong(0)).toSet
    assert(a == b)
  }
}
