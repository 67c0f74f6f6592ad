package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate / exact nearest-neighbor search over an embedding
  * column (`array<float>`).
  *
  * Two strategies:
  *  - `bruteForceTopK`: broadcast the (small) query set against the
  *    corpus — exact, one pass over the data, no corpus shuffle. The
  *    correct baseline whenever |queries| is broadcast-sized; at 100 TB
  *    the corpus side stays partition-local.
  *  - `lshTopK`: random-hyperplane (signed random projection) LSH —
  *    each vector gets a `nBits` signature; query and corpus join on
  *    the bucket (plus multi-probe: all buckets within hamming
  *    distance 1), then exact cosine re-ranks within buckets. Trades
  *    recall for a corpus-side shuffle keyed by 32-bit buckets.
  *
  * Hyperplanes are generated from a fixed seed => deterministic,
  * and shipped as literal arrays (they are nBits x dim doubles — tiny).
  */
object Ann {

  /** Exact top-k by cosine: queries must be small (broadcast side). */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      queryVecCol: String,
      k: Int): DataFrame = {
    // norms once per row (not per pair): 1 vector pass per candidate;
    // spread() so a single-split scan doesn't serialize the dot kernels
    val corpusN = graft.operators.Partitioning.spread(corpus)
      .withColumn("__cn", l2Norm(col(vecCol)))
    val queriesN = queries.withColumn("__qn", l2Norm(col(queryVecCol)))
    val joined = corpusN.crossJoin(broadcast(queriesN))
      .withColumn("cos", cosineWithNorms(
        dot(col(vecCol), col(queryVecCol)), col("__cn"), col("__qn")))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("cos").desc, col(idCol))
    joined
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(queryIdCol).as("query_id"), col(idCol).as("neighbor_id"),
        col("cos"), col("rnk"))
  }

  /** All-pairs near-duplicate candidates via OR-amplified SRP LSH:
    * L independent signature tables of nBits each; a pair is a
    * candidate if it collides in ANY table; exact cosine then filters
    * by threshold. The scale path for q64's quadratic formulation.
    * Recall for cos >= 0.95 at (nBits=8, tables=8) is ~0.99
    * (1-(1-(1-theta/pi)^b)^L); raise tables for higher recall.
    *
    * Scale shape (same as the MinHash text path): the LSH shuffle
    * carries (id, table, bucket) POSTINGS only — vectors are fetched
    * by a hash join at verify time, once per side, never replicated
    * L times through the bucket shuffle. Cosine runs once per DISTINCT
    * candidate pair (not once per colliding table), and degenerate
    * buckets are dropped under `maxBucketSize` before the self-join
    * (pigeonhole recall note: a pair whose every colliding table
    * bucket is dropped is lost).
    */
  def lshNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nBits: Int = 8,
      tables: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      maxBucketSize: Int = 10000): DataFrame =
    lshNearDupPairsReleasable(corpus, idCol, vecCol, threshold, nBits,
      tables, dim, seed, maxBucketSize)._1

  /** `lshNearDupPairs` plus a release handle: `release()` unpersists
    * the internal postings cache (the one the skew guard and both
    * self-join sides share). One-shot callers can ignore it (session
    * LRU / clearCache reclaims, as the bench harness does); LOOPING
    * callers — a streaming drain per micro-batch — must call it after
    * materializing everything derived from the pairs, or cached
    * postings over ever-growing history accumulate without bound. */
  def lshNearDupPairsReleasable(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nBits: Int = 8,
      tables: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      maxBucketSize: Int = 10000): (DataFrame, () => Unit) = {
    val spreadC = graft.operators.Partitioning.spread(corpus)
    // vectors + norms, joined per matched id at verify time. NOT
    // cached: each verify side re-reads the (column-pruned) scan —
    // one norm kernel per row per side — which is also the only shape
    // that exists at 100 TB, where the vector column outsizes any
    // cache; the expensive kernels (L x nBits signatures) are cached
    // below.
    val vecs = spreadC.select(col(idCol).as("__id"), col(vecCol).as("__vec"),
      l2Norm(col(vecCol)).as("__n"))
    // CACHED *before* the skew guard: the guard's bucket-count subplan
    // and the self-join's two subplans all read the postings — without
    // the cache underneath them the L x nBits signature kernel would
    // run once per reference instead of once per row. spread()
    // parallelizes the kernels when the scan is a single split.
    val rawPostings = spreadC.select(col(idCol).as("__id"),
        posexplode(srpSignatures(col(vecCol), nBits, dim, seed, tables)))
      .select(col("__id"), col("pos").as("tbl"), col("col").as("bkt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // tiny by definition; eagerly checkpointed so the two self-join
    // sides reuse it instead of re-counting
    val oversized = graft.dedup.MinHashLSH
      .oversizedBuckets(rawPostings, Seq("tbl", "bkt"), maxBucketSize)
    val postings = rawPostings.join(broadcast(oversized), Seq("tbl", "bkt"), "left_anti")
    val cand = postings.as("a").join(postings.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("vec_a"), col("b.__id").as("vec_b"))
      .distinct()
    val pairs = cand
      .join(vecs.select(col("__id").as("vec_a"), col("__vec").as("va"), col("__n").as("na")),
        Seq("vec_a"))
      .join(vecs.select(col("__id").as("vec_b"), col("__vec").as("vb"), col("__n").as("nb")),
        Seq("vec_b"))
      .withColumn("cos_raw", cosineWithNorms(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos_raw") > threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos_raw"), 4).as("cos"))
    (pairs, () => { rawPostings.unpersist(); () })
  }

  /** Deterministic pseudo-random hyperplanes: nBits x dim standard
    * normals (unbounded; only the SIGN of the projection matters). */
  private[ann] def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** Signed-random-projection signature (int bucket of nBits bits). */
  def srpSignature(vec: org.apache.spark.sql.Column, nBits: Int, dim: Int, seed: Long = 42L)
      : org.apache.spark.sql.Column = {
    val planes = hyperplanes(nBits, dim, seed)
    (0 until nBits).map { b =>
      val plane = array(planes(b).toIndexedSeq.map(lit(_)): _*)
      when(dot(vec, plane) >= 0.0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** All `tables` per-table SRP signatures in one fused kernel:
    * element t equals srpSignature(vec, nBits, dim, seed + t) bit for
    * bit (SrpSignaturesSpec pins the equality, incl. null/length
    * edges). The composed form costs ~tables x nBits x dim literal
    * expression nodes per signing site — real analyzer/codegen time —
    * and re-reads each vector element tables x nBits times; the kernel
    * is one plan node and one vector hoist per row. Production signing
    * sites use this; the q65b/q241-style contract oracles keep the
    * composed form so the two derivations stay independent. */
  def srpSignatures(vec: org.apache.spark.sql.Column, nBits: Int, dim: Int,
      seed: Long, tables: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      SrpSignatures(ColumnBridge.expression(vec), nBits, dim, seed, tables))
  }

  /** LSH-bucketed ANN: join on SRP bucket with multi-probe (hamming
    * radius 1), exact cosine re-rank inside buckets. Recall < 1;
    * increase nBits for precision / probes for recall. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      nBits: Int = 12,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {

    val corpusSig = graft.operators.Partitioning.spread(corpus)
      .withColumn("bucket",
        srpSignatures(col(vecCol), nBits, dim, seed, tables = 1).getItem(0))
      .withColumn("__cn", l2Norm(col(vecCol)))

    // Multi-probe: each query probes its own bucket and every bucket
    // at hamming distance 1 (nBits+1 probes).
    val probes = queries
      .withColumn("__qn", l2Norm(col(queryVecCol)))
      .withColumn("sig",
        srpSignatures(col(queryVecCol), nBits, dim, seed, tables = 1).getItem(0))
      .withColumn("bucket", explode(array(
        (Seq(col("sig")) ++ (0 until nBits).map(b => col("sig").bitwiseXOR(lit(1 << b)))): _*)))

    val joined = corpusSig.join(probes, Seq("bucket"))
      .withColumn("cos", cosineWithNorms(
        dot(col(vecCol), col(queryVecCol)), col("__cn"), col("__qn")))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("cos").desc, col(idCol))
    joined
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(queryIdCol).as("query_id"), col(idCol).as("neighbor_id"),
        col("cos"), col("rnk"))
  }
}
