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
    // deterministic salt from a stable hash of the row, NOT rand():
    // re-computation under task retry must land in the same bucket
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.map(col).toIndexedSeq: _*)), lit(salt)))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
