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
    * fraction; names distinct, fractions positive and summing to 1
    * within 1e-9). Cumulative bounds are summed in DECIMAL-string
    * space (BigDecimal of each fraction's toString) so 0.9 + 0.05
    * yields the double an engine parses from the literal "0.95" — a
    * plain double sum is 1 ulp above it, and an oracle comparing
    * against the literal would disagree on the ~1e-16-wide boundary
    * gap. A null id fails loud per row (it has no stable hash; the
    * silent alternative routes every null into the LAST cut, skewing
    * whatever split happens to be final). */
  def assign(
      df: DataFrame,
      idCol: String,
      cuts: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    require(cuts.nonEmpty, "cuts must be non-empty")
    require(cuts.map(_._1).distinct.size == cuts.size,
      s"cut names must be distinct: ${cuts.map(_._1)}")
    require(cuts.forall(_._2 > 0), s"fractions must be positive: $cuts")
    require(math.abs(cuts.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${cuts.map(_._2).sum}")
    val id = when(col(idCol).isNull,
        raise_error(lit(s"DataSplit: null id in '$idCol' has no stable split")))
      .otherwise(col(idCol))
    val u = DomainMix.uniform(id, ":" + salt)
    val cum = cuts
      .scanLeft(BigDecimal(0))((acc, c) => acc + BigDecimal(c._2.toString))
      .tail.map(_.toDouble)
    val expr0: Column = lit(cuts.last._1) // numeric tail guard
    val split = cuts.init.zip(cum.init).foldRight(expr0) {
      case (((name, _), bound), acc) => when(u < bound, name).otherwise(acc)
    }
    df.withColumn("split", split)
  }
}
