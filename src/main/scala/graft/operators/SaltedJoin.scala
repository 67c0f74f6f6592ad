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

  def inner(
      probe: DataFrame,  // large, skewed side
      build: DataFrame,  // replicated side
      key: String,
      salt: Int): DataFrame = {

    require(salt > 0, "salt must be positive")
    require(!probe.columns.contains("__salt") && !build.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    // Deterministic salt, NOT rand(): re-computation under task retry
    // must land in the same bucket. Mixing in the partition id and the
    // per-partition row index means IDENTICAL duplicate rows (the
    // classic hot-key shape: millions of equal tuples) still spread —
    // a pure row-content hash would put them all in one bucket. Both
    // inputs are deterministic given a deterministic upstream order,
    // so retries recompute the same value.
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.map(col).toIndexedSeq: _*),
        spark_partition_id(), monotonically_increasing_id()), lit(salt)))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
