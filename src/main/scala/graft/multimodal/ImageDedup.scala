package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.SimHash

/** Perceptual near-duplicate detection for media blobs — the bridge
  * between the multimodal columns (graft.multimodal.MediaOps) and the
  * dedup family: decode -> feature histogram -> perceptual hash ->
  * Hamming-banded pair join. The LLM-corpus use case is image dedup
  * (the same image re-encoded, resized, or slightly edited re-enters
  * the crawl thousands of times; exact byte hashing misses all of it),
  * and the same chain covers audio via the amplitude histogram.
  * (Reference scope: nvd2mysqlloader has no media surface — part of
  * the mandated multimodal + dedup extension sets.)
  *
  * The hash is average-hash over the decoder's feature histogram: bit
  * d = (emb[d] > mean(emb)). Perceptual because the underlying
  * histogram is: re-encoding or resizing an image moves luminance
  * buckets only slightly, so hashes of near-identical images differ in
  * few bits, while unrelated images differ in ~half. Pair generation
  * reuses the SimHash pigeonhole machinery (`chunks > maxHamming`
  * blocks of the hash, bucket join per block, bit_count verify) — the
  * same bounded-join scale shape as text SimHash, never all-pairs.
  *
  * Everything before the pair join is a narrow projection (decode is
  * partition-local mapPartitions; the hash is one HOF expression), so
  * the only shuffle is the banded bucket join on (blk, key).
  */
object ImageDedup {

  /** Average-hash of a float-array feature column: bit d set iff
    * emb[d] * dim > sum(emb) — the mean compare multiplied through so
    * no division enters the float path. With dyadic-rational features
    * and power-of-two dim (the q134 oracle's k/256 construction) every
    * operation is exact, so the bits are engine-portable; for real
    * decoder histograms the bits are deterministic per engine, which is
    * all dedup needs. Uses the first `bits` entries; the feature dim
    * must be >= bits. */
  def avgHash(emb: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")
    val s = aggregate(emb, lit(0.0d), (acc, x) => acc + x.cast("double"))
    val dim = size(emb)
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, d) => acc.bitwiseOR(
        when(element_at(emb, d + 1).cast("double") * dim.cast("double") > s,
          call_function("shiftleft", lit(1L), d.cast("int"))).otherwise(lit(0L))))
  }

  /** Near-duplicate media pairs from a DECODED features frame
    * (`idCol`, `embCol` array<float>): perceptual hash + pigeonhole
    * Hamming join. Exact within `maxHamming` when no bucket drops
    * (see SimHash.pairsFromFingerprints). `bits` must equal
    * chunks * chunkBits so every block carries signal. */
  def nearDupPairs(
      features: DataFrame,
      idCol: String,
      embCol: String,
      maxHamming: Int = 1,
      maxBucketSize: Int = 100000,
      chunks: Int = 2,
      chunkBits: Int = 8): DataFrame = {
    // caching (and release) of the fingerprints is owned by
    // pairsFromFingerprints — a caller-side persist leaked per call
    val fp = graft.operators.Partitioning.spread(features).select(
      col(idCol).as("doc"),
      avgHash(col(embCol), chunks * chunkBits).as("fp"))
    SimHash.pairsFromFingerprints(fp, maxHamming, maxBucketSize, chunks, chunkBits)
  }

  /** End-to-end: media table -> decode (partition-local) -> perceptual
    * near-dup pairs. `decoder` picks the feature semantics: RealDecoder
    * = pixel/amplitude histograms (true perceptual dedup),
    * FakeDecoder = byte-derived features (pipeline testing). */
  def pairsForMedia(
      media: DataFrame,
      decoder: MediaOps.Decoder,
      maxHamming: Int = 1,
      maxBucketSize: Int = 100000,
      chunks: Int = 2,
      chunkBits: Int = 8): DataFrame =
    nearDupPairs(
      MediaOps.decode(media, decoder).toDF(),
      "media_id", "embedding", maxHamming, maxBucketSize, chunks, chunkBits)
}
