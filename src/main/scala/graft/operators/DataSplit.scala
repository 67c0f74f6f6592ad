package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test split assignment — the
  * reproducible partition every training pipeline needs: each row's
  * split is a pure function of (id, salt), so re-runs, task retries,
  * incremental additions, and different cluster layouts all assign
  * identically, and a document NEVER migrates between splits when the
  * corpus grows (hash-range assignment is stable under insertion,
  * unlike randomSplit or any count-based slicing). (Reference scope:
  * absent — mandated sampling/export extension set, next to
  * CorpusShuffle and the q85 samplers.)
  *
  * Assignment: u = hv / 2^60 with hv the md5-derived 60-bit row key
  * (the repo's portable-hash pattern), split = the first named cut
  * whose cumulative fraction exceeds u. Uniform hashing makes the
  * realized proportions concentrate around the requested fractions
  * within every stratum (binomial ±O(sqrt(n)) — no explicit
  * stratification machinery needed, and fractions hold per language /
  * source / domain simultaneously for free). One narrow projection —
  * no shuffle, no RNG state.
  */
object DataSplit {

  /** Adds `split` per the cumulative fractions of `cuts` (name ->
    * fraction; fractions must sum to 1 within 1e-9). */
  def assign(
      df: DataFrame,
      idCol: String,
      cuts: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    require(cuts.nonEmpty, "cuts must be non-empty")
    require(cuts.forall(_._2 > 0), s"fractions must be positive: $cuts")
    require(math.abs(cuts.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${cuts.map(_._2).sum}")
    val hv = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + salt))), 1, 15), 16, 10).cast("long")
    val u = hv.cast("double") / lit(1152921504606846976.0) // 2^60
    val cum = cuts.scanLeft(0.0)(_ + _._2).tail
    val expr0: Column = lit(cuts.last._1) // numeric tail guard
    val split = cuts.init.zip(cum.init).foldRight(expr0) {
      case (((name, _), bound), acc) => when(u < bound, name).otherwise(acc)
    }
    df.withColumn("split", split)
  }
}
