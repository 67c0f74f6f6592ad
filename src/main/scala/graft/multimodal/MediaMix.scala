package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.DomainMix

/** Stratified media-mix sampling — [[graft.operators.DomainMix]]'s
  * hash-gated downsampler lifted to COMPOSITE media strata: a
  * multimodal corpus is balanced over (kind × size/duration bucket)
  * cells, not a single categorical column, so a mix target like
  * "equal mass of short/medium/long audio and video" is one call.
  * Same scale shape as the q102 family: one tiny stratum aggregate
  * broadcast back, corpus scanned once, acceptance =
  * md5-uniform(id) < rate(stratum) — deterministic across runs,
  * engines, partitionings; no RNG state, no global sort.
  * (Reference scope: no media surface in nvd2mysqlloader — mandated
  * multimodal extension; the sampling mold is q102/q150's.)
  */
object MediaMix {

  /** Composite stratum label `kind:bucket` where bucket =
    * floor(size / bucketWidth) — duration_ms, n_bytes, frame counts
    * all work as the size axis. */
  def stratum(kind: Column, size: Column, bucketWidth: Long): Column =
    concat(kind, lit(":"),
      floor(size / lit(bucketWidth)).cast("long").cast("string"))

  /** Balance every (kind × size-bucket) stratum down to the smallest
    * stratum's expected size. Output keeps the input columns plus the
    * `__stratum` label the report aggregates on. */
  def balanceStrata(
      media: DataFrame,
      kindCol: String,
      sizeCol: String,
      bucketWidth: Long,
      idCol: String,
      salt: String = ":mix"): DataFrame =
    DomainMix.balanceToSmallest(
      media.withColumn("__stratum",
        stratum(col(kindCol), col(sizeCol), bucketWidth)),
      "__stratum", idCol, salt)

  /** The mix report a curation pass reads: per stratum, kept count
    * and the smallest kept id (a deterministic spot-check anchor). */
  def mixReport(kept: DataFrame, idCol: String): DataFrame =
    kept.groupBy(col("__stratum").as("stratum"))
      .agg(count(lit(1)).as("n_kept"), min(col(idCol)).as("first_id"))
}
