package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic domain-mix resampling for training corpora: bring
  * per-group (language / source / domain) row counts to target
  * proportions by hash-gated downsampling — the mixing step behind
  * Pile/DoReMi-style training mixes, without RNG state.
  *
  * Acceptance is `uniform(id) < rate(group)` where the uniform is
  * md5-derived from the row id (reproducible across runs, engines and
  * partitionings — the same trick as the stratified/weighted samplers)
  * and the per-group rate comes from one tiny aggregate of group
  * counts (broadcast back; the corpus is scanned once and never
  * shuffled — filter + map-side join only). Expected kept size per
  * group is rate * n; exact-count quotas would need a global per-group
  * sort, which this deliberately avoids at 100 TB.
  */
object DomainMix {

  /** md5-derived uniform in [0, 1): first 15 hex chars (60 bits) of
    * md5(id || salt) over 2^60. */
  def uniform(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 15), 16, 10)
      .cast("long") / lit(1152921504606846976.0) // 2^60

  /** Downsample every group toward the SMALLEST group's size (the
    * uniform-mix special case: rate_g = min_n / n_g). */
  def balanceToSmallest(
      docs: DataFrame, groupCol: String, idCol: String,
      salt: String = ":mix"): DataFrame = {
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val target = counts.agg(min(col("__n")).as("__m"))
    val rated = counts.crossJoin(broadcast(target))
      .select(col(groupCol), (col("__m") * lit(1.0) / col("__n")).as("__rate"))
    accept(docs, rated, groupCol, idCol, salt)
  }

  /** Downsample toward explicit relative weights: group g's expected
    * share of the kept corpus is weight_g / sum(weights). Groups whose
    * target exceeds their size keep everything (rate caps at 1 —
    * upsampling is a repeat-epoch decision, not a sampler's).
    * Groups ABSENT from `weights` are EXCLUDED from the output
    * entirely (weight 0): the map defines the whole mix, so list
    * every group you want kept. */
  def toWeights(
      docs: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Double], salt: String = ":mix"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0), "positive weights required")
    val spark = docs.sparkSession
    import spark.implicits._
    val wsum = weights.values.sum
    // toDF types the key as string; cast it to the docs column's type
    // explicitly so the join never leans on implicit coercion (which
    // can silently mismatch e.g. integer group ids under ANSI rules)
    val gType = docs.schema(groupCol).dataType
    val w = weights.toSeq.toDF(groupCol, "__w")
      .select(col(groupCol).cast(gType).as(groupCol), col("__w"))
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .join(broadcast(w), Seq(groupCol), "inner")
    // scale so the most-constrained group binds: the largest feasible
    // kept-corpus size K satisfies K * w_g / wsum <= n_g for all g
    val kBound = counts.agg(min(col("__n") * lit(wsum) / col("__w")).as("__k"))
    val rated = counts.crossJoin(broadcast(kBound))
      .select(col(groupCol),
        least(lit(1.0), col("__k") * (col("__w") / lit(wsum)) / col("__n")).as("__rate"))
    accept(docs, rated, groupCol, idCol, salt)
  }

  private def accept(
      docs: DataFrame, rated: DataFrame, groupCol: String, idCol: String,
      salt: String): DataFrame =
    docs.join(broadcast(rated), Seq(groupCol))
      .filter(uniform(col(idCol), salt) < col("__rate"))
      .drop("__rate")
}
