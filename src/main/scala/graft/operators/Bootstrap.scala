package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson-bootstrap confidence intervals — metric uncertainty for
  * corpus reports (is src3's quality REALLY below src7's, or is the
  * gap sampling noise?). The classical bootstrap resamples n rows with
  * replacement per replicate — a shuffle of n×B rows. The POISSON
  * bootstrap (Hanley & MacGibbon 2006; the standard at-scale form,
  * e.g. Chamandy et al., "Estimating Uncertainty for Massive Data
  * Streams", Google 2012) gives each row an independent Poisson(1)
  * weight per replicate instead: one linear pass, map-side partial
  * aggregation reduces the exploded (row × replicate) stream to
  * B×groups partials inside the scan tasks, and no corpus-sized
  * shuffle exists at any B.
  *
  * Determinism (the q133/q204 hash idiom): replicate weights derive
  * from u = md5(id:replicate:salt)/2^60 through the Poisson(1)
  * inverse CDF as a literal threshold chain — reproducible across
  * layouts, retries, and engines (the thresholds are decimal literals
  * both engines parse to identical doubles; u is hash-exact). The CDF
  * chain truncates at w = 9 (P ≈ 1.1e-6 per cell, absorbed into the
  * top weight — both engines apply the same truncation, so the
  * estimate is deterministic, not approximate-vs-the-oracle).
  */
object Bootstrap {

  /** Cumulative Poisson(1) probabilities F(0)..F(8), 10dp literals. */
  private val CumP1: Seq[Double] = Seq(
    0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
    0.9963401532, 0.9994058152, 0.9999167589, 0.9999897508,
    0.9999988746)

  /** Poisson(1) weight from a uniform via the inverse CDF. */
  private def poissonWeight(u: Column): Column =
    CumP1.zipWithIndex.foldRight(lit(9): Column) {
      case ((f, k), acc) => when(u < f, k).otherwise(acc)
    }

  /** Per-group mean of `valueCol` with a two-sided bootstrap CI.
    *
    * @param replicates B — 200 gives a stable 95% band
    * @return one row per group: (groupCols..., n, mean,
    *         lo, hi) — `mean` the plain sample mean, [lo, hi] the
    *         (alpha/2, 1-alpha/2) interpolated percentiles of the B
    *         Poisson-replicate means, all rounded to 6dp.
    */
  def meanCi(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      replicates: Int = 200,
      alpha: Double = 0.05,
      salt: String = "boot"): DataFrame = {
    require(replicates >= 2, s"need >= 2 replicates, got $replicates")
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    val gcols = groupCols.map(col)
    val base = df.select(gcols :+ col(idCol).cast("long").as("__id")
      :+ col(valueCol).cast("double").as("__x"): _*)

    // one row per (input row, replicate); the groupBy below
    // partial-aggregates this stream map-side — B×groups rows shuffle
    val exploded = base
      .withColumn("__b", explode(lit((0 until replicates).toArray)))
      .withColumn("__u",
        conv(substring(md5(concat_ws(":", col("__id"), col("__b"),
          lit(salt))), 1, 15), 16, 10).cast("long")
          / lit(1152921504606846976.0)) // 2^60
      .withColumn("__w", poissonWeight(col("__u")).cast("double"))
    val repMeans = exploded
      .groupBy(gcols :+ col("__b"): _*)
      .agg((sum(col("__w") * col("__x")) / sum(col("__w"))).as("__m"))
    val ci = repMeans
      .groupBy(gcols: _*)
      .agg(
        percentile(col("__m"), lit(alpha / 2)).as("__lo"),
        percentile(col("__m"), lit(1 - alpha / 2)).as("__hi"))
    val stats = base.groupBy(gcols: _*)
      .agg(count(lit(1)).as("n"), avg(col("__x")).as("__mean"))
    stats.join(ci, groupCols)
      .select(gcols ++ Seq(col("n"),
        round(col("__mean"), 6).as("mean"),
        round(col("__lo"), 6).as("lo"),
        round(col("__hi"), 6).as("hi")): _*)
  }

  /** Bootstrap CI for the DIFFERENCE of two group means — the paired
    * comparison behind "is source A's quality really below B's, or
    * noise?": replicate r's statistic is mean_A(r) − mean_B(r) under
    * the SHARED per-(row, replicate) weights (the hash keys on the row
    * id only, so the same draw drives both sides), and `significant`
    * is the CI-excludes-zero verdict at the given alpha.
    *
    * @return one row: (group_a, group_b, n_a, n_b, diff, lo, hi,
    *         significant) — `diff` the plain mean difference, 6dp. */
  def meanDiffCi(
      df: DataFrame,
      groupCol: String,
      groupA: String,
      groupB: String,
      idCol: String,
      valueCol: String,
      replicates: Int = 200,
      alpha: Double = 0.05,
      salt: String = "boot"): DataFrame = {
    require(groupA != groupB, "comparing a group to itself")
    val two = df.filter(col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).as("__g"), col(idCol).cast("long").as("__id"),
        col(valueCol).cast("double").as("__x"))
    val exploded = two
      .withColumn("__b", explode(lit((0 until replicates).toArray)))
      .withColumn("__u",
        conv(substring(md5(concat_ws(":", col("__id"), col("__b"),
          lit(salt))), 1, 15), 16, 10).cast("long")
          / lit(1152921504606846976.0))
      .withColumn("__w", poissonWeight(col("__u")).cast("double"))
    val repDiffs = exploded
      .groupBy(col("__b"))
      .agg((sum(when(col("__g") === groupA, col("__w") * col("__x")))
          / sum(when(col("__g") === groupA, col("__w")))
        - sum(when(col("__g") === groupB, col("__w") * col("__x")))
          / sum(when(col("__g") === groupB, col("__w")))).as("__d"))
    val ci = repDiffs.agg(
      percentile(col("__d"), lit(alpha / 2)).as("__lo"),
      percentile(col("__d"), lit(1 - alpha / 2)).as("__hi"))
    val stats = two.groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), avg(col("__x")).as("__m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    require(stats.contains(groupA) && stats.contains(groupB),
      s"groups absent from the data: ${Seq(groupA, groupB).filterNot(stats.contains)}")
    ci.select(
      lit(groupA).as("group_a"), lit(groupB).as("group_b"),
      lit(stats(groupA)._1).as("n_a"), lit(stats(groupB)._1).as("n_b"),
      round(lit(stats(groupA)._2 - stats(groupB)._2), 6).as("diff"),
      round(col("__lo"), 6).as("lo"),
      round(col("__hi"), 6).as("hi"),
      (round(col("__lo"), 6) > 0.0 || round(col("__hi"), 6) < 0.0)
        .as("significant"))
  }
}
