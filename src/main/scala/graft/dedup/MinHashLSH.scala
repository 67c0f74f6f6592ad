package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** MinHash + banded LSH near-duplicate detection over a text corpus.
  *
  * Pipeline (all set-based, two shuffles total):
  *   1. per document: distinct word n-gram shingles (no shuffle),
  *   2. per document: k-minhash signature — base = xxhash64(shingle),
  *      h_i(x) = (a_i * base + b_i) mod p, sig_i = min over shingles.
  *      Computed entirely inside one `transform`/`array_min` expression
  *      tree: O(k * |shingles|) work per row, zero shuffle,
  *   3. band the signature (b bands of r rows, k = b*r), explode to
  *      (band_id, band_hash, doc_id) and self-join on the band bucket
  *      — the ONLY data-sized shuffle, and it moves (doc_id, 16-byte
  *      bucket) pairs, not documents,
  *   4. candidate pairs (doc_a < doc_b) deduped across bands,
  *   5. optional exact-Jaccard verification on the candidates only.
  *
  * At 100 TB this is the textbook scale path: the quadratic all-pairs
  * comparison is replaced by per-bucket micro-joins; bucket skew (a
  * degenerate band value shared by a huge doc group) is bounded by
  * `maxBucketSize`, which drops pathological buckets the way a df-cut
  * drops stop-shingles.
  *
  * Hash-family constants derive from a fixed seed so results are
  * deterministic across runs and partitionings.
  */
object MinHashLSH {

  /** k-element minhash signature column over a PRE-HASHED shingle
    * column (array<long>, e.g. `transform(shingles, xxhash64)`).
    * The hash family is h_i(x) = xxh64(x, seed_i) — avalanche-uniform
    * re-mixing per function index, no overflow under ANSI arithmetic.
    * Computed by the one-pass codegen'd MinHashSignature expression
    * (k interpreted array_min(transform(...)) HOFs were ~10x slower). */
  def signatureOfHashes(hashed: Column, k: Int, seed: Long = 42L): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashed), k, seed))
  }

  /** Candidate near-duplicate pairs (doc_a < doc_b) via banded LSH.
    *
    * @param docs    input with an id column and a text column
    * @param numHashes k, signature length (= bands * rowsPerBand)
    * @param bands   number of LSH bands
    * @param shingleN word n-gram size
    * @param maxBucketSize drop buckets larger than this (skew guard)
    */
  def candidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 128,
      bands: Int = 16,
      shingleN: Int = 3,
      maxBucketSize: Int = 1000,
      seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands

    // Signatures are CACHED: the banded frame feeds a self-join (two
    // separate subplans) and the skew-guard, so without the cache the
    // shingle+minhash kernel would run once per plan reference. The
    // cache holds (id, 64 longs) — signature bytes, not documents.
    val sigs = graft.operators.Partitioning.spread(docs)
      .select(
        col(idCol).as("doc"),
        ShingleHashes.of(TextFunctions.wsTokens(lower(col(textCol))), shingleN).as("hsh"))
      .select(col("doc"), signatureOfHashes(col("hsh"), numHashes, seed).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val bandedSigs = banded(sigs, bands, r)
    val sized = dropOversizedBuckets(bandedSigs, maxBucketSize)

    val a = sized.as("a")
    val b = sized.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
  }

  /** The per-document array of (band, bucket) structs — [[banded]]
    * before the explode; exposed so the stores' driver-resolved
    * micro-serve collects bands in the SAME projection as shingles and
    * signature (bucket derivation stays bit-identical to the exploded
    * form by construction). */
  def bandedArray(sig: Column, bands: Int, r: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      bnd => struct(
        bnd.as("band"),
        hash(bnd, slice(sig, bnd * r + 1, lit(r))).as("bucket")))

  /** Band a (doc, sig) frame to (doc, band, bucket) — `r` signature
    * lanes hashed per band. */
  def banded(sigs: DataFrame, bands: Int, r: Int): DataFrame =
    sigs.select(col("doc"), explode(bandedArray(col("sig"), bands, r)).as("bb"))
      .select(col("doc"), col("bb.band"), col("bb.bucket"))

  /** Skew guard: drop degenerate buckets before a bucket join. A
    * partial-aggregated count keeps only OVERSIZED buckets (few, by
    * definition pathological) so the anti-join broadcasts — unlike a
    * count() window over (band, bucket), which is a full shuffle+sort
    * of every posting. */
  def dropOversizedBuckets(bandedDf: DataFrame, maxBucketSize: Int): DataFrame =
    dropOversizedBuckets(bandedDf, Seq("band", "bucket"), maxBucketSize)

  /** Generic form over arbitrary blocking-key columns — shared by every
    * bucket-join blocker (banded MinHash, SimHash pigeonhole chunks). */
  def dropOversizedBuckets(
      blocked: DataFrame,
      keyCols: Seq[String],
      maxBucketSize: Int): DataFrame =
    blocked.join(broadcast(oversizedBuckets(blocked, keyCols, maxBucketSize)),
      keyCols, "left_anti")

  /** The oversized blocking-key set itself — exposed so callers that
    * guard SEVERAL frames against the SAME population (e.g. the
    * streaming near-dup join: incoming side and state∪incoming side)
    * can compute the drop set once and anti-join each frame against
    * it, instead of deriving per-frame sets that disagree. */
  def oversizedBuckets(
      blocked: DataFrame,
      keyCols: Seq[String],
      maxBucketSize: Int): DataFrame =
    blocked.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > maxBucketSize)
      .select(keyCols.map(col): _*)

  /** Exact shingle Jaccard for a pair frame (doc_a, doc_b) — the
    * verification step after LSH candidate generation. Jaccard is
    * computed over hashed shingles (same 64-bit chain-hash kernel the
    * candidate path uses; equal mod hash collisions), cached and
    * spread so the kernel runs once per document even though the frame
    * joins into both pair sides.
    *
    * @param minJaccard threshold applied to the RAW ratio (before the
    *                   6-decimal display rounding — a rounded filter
    *                   would admit boundary pairs the exact predicate
    *                   rejects); <= 0 keeps every verified pair */
  def verifyJaccard(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      minJaccard: Double = 0.0): DataFrame = {
    val sh = graft.operators.Partitioning.spread(docs).select(
      col(idCol).as("__id"),
      ShingleHashes.of(TextFunctions.wsTokens(lower(col(textCol))), shingleN).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    verifyJaccardHashed(pairs, sh, minJaccard)
  }

  /** [[verifyJaccard]] over a PRE-HASHED shingle frame (__id, __sh:
    * array<long>) — the route for callers that already materialized
    * shingles (the [[LshStore]] keeps them on disk so verification
    * never re-reads document text). */
  def verifyJaccardHashed(
      pairs: DataFrame,
      shingleFrame: DataFrame,
      minJaccard: Double = 0.0): DataFrame =
    pairs
      .join(shingleFrame.withColumnRenamed("__id", "doc_a").withColumnRenamed("__sh", "sh_a"), Seq("doc_a"))
      .join(shingleFrame.withColumnRenamed("__id", "doc_b").withColumnRenamed("__sh", "sh_b"), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
}
