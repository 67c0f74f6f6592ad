package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the skewed (large) side's key into
  * `salt` sub-keys and explode the build (small-ish but not
  * broadcastable) side across all salt values, so one hot key's rows
  * spread over `salt` reducers instead of one.
  *
  * This is the manual fallback for when AQE's skew-join split can't
  * help (e.g. the skew is in a single key of a shuffled hash join
  * whose partitions can't be subdivided because the key is the whole
  * partition). Cost model: build side is replicated `salt`x — use
  * only when |build| * salt << |probe|'s hot-key mass.
  */
object SaltedJoin {

  /** @param spreadIdentical also mix the physical position
    *   (partition id + per-partition index) into the salt so IDENTICAL
    *   duplicate tuples (the degenerate hot-key shape) still spread
    *   across buckets. ONLY safe when `probe` is a deterministic-order
    *   source (a file scan, not the output of a shuffle): position is
    *   recomputed on task retry, and on a post-shuffle input the fetch
    *   order — hence the salt, hence the reducer a row routes to — can
    *   differ between the original and the retried attempt, which
    *   loses/duplicates rows exactly like rand() would. The default
    *   content-derived salt is deterministic under ANY retry; its one
    *   cost is that fully-identical tuples share a bucket (a perf,
    *   never a correctness, concern).
    */
  def inner(
      probe: DataFrame,  // large, skewed side
      build: DataFrame,  // replicated side
      key: String,
      salt: Int,
      spreadIdentical: Boolean = false): DataFrame = {

    require(salt > 0, "salt must be positive")
    require(!probe.columns.contains("__salt") && !build.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    // Deterministic salt, NOT rand() and NOT position-based (unless
    // explicitly opted into): re-computation under task retry must
    // land in the same bucket, so the salt is a pure function of row
    // content. Distinct rows of a hot key spread uniformly; the build
    // side carries every salt value per key, so matching semantics are
    // independent of WHICH bucket a row lands in — determinism matters
    // only so retried map tasks route rows to the same reducers.
    val salted = probe.withColumn("__salt",
      saltColumn(probe.columns, salt, spreadIdentical))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** The probe-side salt expression (exposed for the determinism
    * spec): content-hash pmod salt, optionally mixed with physical
    * position when `spreadIdentical` (see the contract on `inner`). */
  private[graft] def saltColumn(
      columns: Seq[String],
      salt: Int,
      spreadIdentical: Boolean): org.apache.spark.sql.Column = {
    val contentHash = xxhash64(struct(columns.map(col).toIndexedSeq: _*))
    if (spreadIdentical)
      pmod(xxhash64(contentHash, spark_partition_id(), monotonically_increasing_id()),
        lit(salt))
    else pmod(contentHash, lit(salt))
  }
}
