package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.functions.VectorFunctions

/** Cross-corpus SEMANTIC decontamination: flag training vectors whose
  * embedding is near (cosine > tau) ANY benchmark/eval vector — the
  * embedding-space complement of the n-gram overlap screen
  * ([[Decontamination]]): paraphrased or re-worded benchmark items
  * share no 3-shingles but sit on top of each other in embedding
  * space.
  *
  * Two routes over the same report schema
  * `(idCol, n_eval_hits, max_cos)`:
  *
  *  - [[exactReport]] — the ORACLE route: every (train, eval) pair
  *    scored. Quadratic by contract (like the dedup families' exact
  *    twins); the eval side is benchmarks — orders of magnitude
  *    smaller than the corpus — so the practical shape is a broadcast
  *    of eval against one train scan, which is exactly what Catalyst
  *    picks when eval fits.
  *  - [[lshReport]] — the 100 TB route: both sides signed with the
  *    SAME SRP hyperplanes ([[Ann.srpSignature]], shared seed), joined
  *    per (table, bucket) ACROSS sides only — candidates are bucket
  *    collisions, never all pairs — then exact-cosine verified. Same
  *    verify predicate as the exact route, so false positives die;
  *    recall is the SRP collision bound (the banded-LSH contract the
  *    ANN family's specs pin).
  */
object SemanticContamination {

  /** All-pairs exact screen (oracle route). */
  def exactReport(train: DataFrame, eval: DataFrame, idCol: String,
      vecCol: String, tau: Double): DataFrame = {
    val t = graft.operators.Partitioning.spread(train)
      .select(col(idCol), col(vecCol).as("__tv"),
        VectorFunctions.l2Norm(col(vecCol)).as("__tn"))
    val e = eval.select(col(idCol).as("__eid"), col(vecCol).as("__ev"),
      VectorFunctions.l2Norm(col(vecCol)).as("__en"))
    t.join(e,
        VectorFunctions.cosineWithNorms(
          VectorFunctions.dot(col("__tv"), col("__ev")),
          col("__tn"), col("__en")) > tau)
      .withColumn("__cos", VectorFunctions.cosineWithNorms(
        VectorFunctions.dot(col("__tv"), col("__ev")), col("__tn"), col("__en")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("__cos")).as("max_cos"))
  }

  /** Banded SRP-LSH screen (scale route): candidates are cross-side
    * bucket collisions under `tables` independent signatures. */
  def lshReport(train: DataFrame, eval: DataFrame, idCol: String,
      vecCol: String, tau: Double, nBits: Int = 8, tables: Int = 8,
      dim: Int = 64, seed: Long = 42L, maxBucketSize: Int = 10000): DataFrame = {
    // id-only postings and candidates (the Ann convention: vectors are
    // re-read column-pruned at verify time, never shuffled with buckets)
    def postings(df: DataFrame, as: String): DataFrame =
      graft.operators.Partitioning.spread(df)
        .select(col(idCol).as(as),
          posexplode(Ann.srpSignatures(col(vecCol), nBits, dim, seed, tables)))
        .select(col(as), col("pos").as("tbl"), col("col").as("bkt"))
    // CACHED before the skew guard (the Ann.exactPairs shape): the
    // guard's bucket-count subplan and the candidate join both read the
    // train postings — without the cache underneath them the
    // tables x nBits signature kernel runs once per reference instead
    // of once per row. The cache holds (id, tbl, bkt) triples, never
    // vectors.
    val tp = postings(train, "__tid")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ep = postings(eval, "__eid")
    // skew guard on the train side (the big one): drop degenerate
    // buckets the same way the in-corpus LSH does
    val oversized = MinHashLSH.oversizedBuckets(
      tp.select(col("__tid").as("__id"), col("tbl"), col("bkt")),
      Seq("tbl", "bkt"), maxBucketSize)
    val tpKept = tp.join(broadcast(oversized), Seq("tbl", "bkt"), "left_anti")
    val cand = tpKept.join(ep, Seq("tbl", "bkt"))
      .select(col("__tid"), col("__eid")).distinct()
    val tv = train.select(col(idCol).as("__tid"), col(vecCol).as("__tv"))
    val ev = eval.select(col(idCol).as("__eid"), col(vecCol).as("__ev"))
    val report = cand.join(tv, "__tid").join(ev, "__eid")
      .withColumn("__cos", VectorFunctions.cosine(col("__tv"), col("__ev")))
      .filter(col("__cos") > tau)
      .groupBy(col("__tid").as(idCol))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("__cos")).as("max_cos"))
    // eagerly materialize (dup-density-sized, never corpus-sized) so the
    // postings cache can be RELEASED before returning — a lazy return
    // would pin a corpus-sized (id,tbl,bkt) cache per call for the
    // session lifetime (guide §5: unpersist when done; the
    // LshStore.nearDupsDistributed checkpoint-then-unpersist convention)
    val out = report.localCheckpoint()
    tp.unpersist()
    out
  }

  /** The contamination rollup served from an ALREADY-VERIFIED pair
    * graph (a [[graft.operators.PairGraphStore]] edge frame): keep
    * cross-side edges (exactly one endpoint satisfies `isEval`),
    * aggregate per train-side id. No signature pass, no verify join —
    * the whole screen is one filter + one aggregation over an edge
    * frame that is dup-density-sized, not corpus-sized.
    *
    * Row parity with [[lshReport]]: the stored whole-corpus graph's
    * cross-side restriction has the same candidate set (a cross pair
    * collides in the self-join iff it collides cross-side — same
    * hyperplanes, same tables) and the same verify predicate; max over
    * the stored 4dp-rounded cosine equals the rounded max (round is
    * monotone). The one divergence window is the oversized-bucket
    * guard (full-population counts here vs train-side counts there) —
    * empty at any corpus without degenerate buckets;
    * SemanticContaminationSpec pins the equality on harness data. */
  def reportFromPairs(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      cosCol: String,
      isEval: Column => Column,
      idAlias: String): DataFrame = {
    val a = col(aCol)
    val b = col(bCol)
    edges.filter(isEval(a) =!= isEval(b))
      .select(when(isEval(a), b).otherwise(a).as(idAlias), col(cosCol).as("__cos"))
      .groupBy(col(idAlias))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("__cos")).as("max_cos"))
  }
}
