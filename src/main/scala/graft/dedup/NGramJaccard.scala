package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Exact n-gram Jaccard duplicate pairs via a shingle inverted index.
  *
  * Instead of the quadratic all-pairs cross join, build
  * (shingle -> posting list) and generate pairs only for documents
  * that co-occur under at least one shingle; count co-occurrences to
  * get |A ∩ B| directly, then Jaccard = inter / (|A| + |B| - inter).
  *
  * Scale properties: the shuffle moves (shingle_hash, doc_id) pairs —
  * already a fraction of corpus size — and the pair explosion is
  * bounded by a document-frequency cut (`maxDf`): shingles occurring
  * in more than maxDf documents are stop-shingles and carry almost no
  * similarity signal while dominating the join cost; dropping them is
  * the standard df-cut. With the cut disabled (maxDf = MaxValue) the
  * result is exact.
  */
object NGramJaccard {

  def pairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      minJaccard: Double = 0.5,
      maxDf: Int = Int.MaxValue): DataFrame = {
    val (core, release) = intersections(docs, idCol, textCol, shingleN, maxDf)
    // eagerly materialize the (dup-density-sized) thresholded pairs so
    // the shingle cache can be RELEASED — a lazy return pinned one
    // (id, array<long>) cache per call for the session (guide §5; the
    // SemanticContamination.lshReport convention)
    val out = core
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .localCheckpoint()
    release()
    out
  }

  /** Asymmetric CONTAINMENT pairs: inter / min(|A|, |B|) — "the
    * smaller document's shingles are (mostly) inside the larger one".
    * The contamination / train-test-overlap detector: a benchmark item
    * quoted inside a long web document has tiny Jaccard (the union is
    * dominated by the big doc) but containment ~1. Same inverted-index
    * machinery and scale shape as `pairs`. */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      minContainment: Double = 0.8,
      maxDf: Int = Int.MaxValue): DataFrame = {
    val (core, release) = intersections(docs, idCol, textCol, shingleN, maxDf)
    // materialize-then-release, as in [[pairs]]
    val out = core
      .withColumn("containment",
        col("inter").cast("double") / least(col("sz_a"), col("sz_b")))
      .filter(col("containment") >= minContainment)
      .select(col("doc_a"), col("doc_b"),
        round(col("containment"), 6).as("containment"))
      .localCheckpoint()
    release()
    out
  }

  /** (doc, shs) cached shingle-hash arrays for the PAIR paths — see
    * the cache rationale inside `intersections` (both join sides read
    * it within one plan). Lifecycle: released by the pair-path callers
    * once their thresholded result is materialized (the
    * intersections release handle). */
  private def shingleFrame(
      docs: DataFrame, idCol: String, textCol: String, shingleN: Int): DataFrame =
    graft.operators.Partitioning.spread(docs)
      .select(col(idCol).as("doc"),
        ShingleHashes.of(TextFunctions.wsTokens(lower(col(textCol))), shingleN).as("shs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Per-document shingle NOVELTY: the fraction of a document's
    * distinct shingles that occur in no other document — a curation
    * signal (near-1 = fresh content, near-0 = boilerplate / heavily
    * templated). Same postings as `pairs`, but LINEAR: the per-shingle
    * document frequency comes from a count over a window partitioned
    * by shingle hash — one shuffle, the shingle kernel runs once, and
    * (unlike the pair paths) NOTHING is persisted, so long-lived
    * sessions calling this over many corpora accumulate no cached
    * frames. No pair explosion — this is the cheap query of the
    * family at scale. */
  def noveltyStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3): DataFrame = {
    val postings = graft.operators.Partitioning.spread(docs)
      .select(col(idCol).as("doc"),
        explode(ShingleHashes.of(
          TextFunctions.wsTokens(lower(col(textCol))), shingleN)).as("sh"))
    val perShingle = org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))
    postings.withColumn("df", count(lit(1)).over(perShingle))
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc").as(idCol), col("n_shingles"), col("n_unique"),
        round(col("n_unique") * lit(1.0) / col("n_shingles"), 6).as("novelty"))
  }

  /** Shared core: (doc_a, doc_b, sz_a, sz_b, inter) for every pair
    * co-occurring under at least one (df-cut-surviving) shingle, plus
    * the release handle for the shingle cache underneath it (callers
    * materialize their thresholded result, then release). */
  private def intersections(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      maxDf: Int): (DataFrame, () => Unit) = {

    // (doc, shingle_hash) postings; 64-bit hashes, not strings, cross
    // the shuffle. Collision probability at 100 TB corpus cardinality
    // (~2^40 shingles) is ~2^-24 per pair — acceptable for dedup.
    // ShingleHashes emits per-doc-distinct hashes in one pass (the
    // string-shingle HOF pipeline re-evaluated per plan reference was
    // the q61 bottleneck), so the exploded postings are already
    // distinct — no extra shuffle needed.
    // |A| is just size(shingle array) — computed BEFORE the explode and
    // carried through the postings, so no separate doc-size table and
    // no size re-joins.
    //
    // The shingle arrays are CACHED before the self-join: the two join
    // sides are separate subplans to Spark (exchange reuse disappears
    // as soon as AQE broadcasts one side), and the explode's inferred
    // non-empty filter is pushed into the scan, so without the cache
    // the hash kernel runs up to 3x per row per side. Cached it runs
    // once per document; the cache holds (id, array<long>) — a few
    // percent of corpus size, spilling to disk if needed.
    val docShingles = shingleFrame(docs, idCol, textCol, shingleN)

    val postings = docShingles
      .select(col("doc"), size(col("shs")).as("sz"), explode(col("shs")).as("sh"))

    val filtered =
      if (maxDf == Int.MaxValue) postings
      else {
        val df = postings.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        postings.join(df.filter(col("df") <= maxDf), Seq("sh"), "left_semi")
      }

    val a = filtered.select(col("doc").as("doc_a"), col("sz").as("sz_a"), col("sh"))
    val b = filtered.select(col("doc").as("doc_b"), col("sz").as("sz_b"), col("sh"))
    val core = a.join(b, a("sh") === b("sh") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("inter"))
    (core, () => { docShingles.unpersist(); () })
  }
}
