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

  /** Split assignment at NEAR-DUP-CLUSTER granularity — the leakage
    * guard: all members of a connected component of the near-dup pair
    * graph share one split (the hash coin is flipped on the CLUSTER
    * ROOT id, not the doc id), so no near-dup pair can straddle
    * train/test. Published motivation: Lee et al. 2022 §6.2 measure
    * train/validation near-dup leakage in standard corpora inflating
    * eval scores; the fix is exactly this — component-level split
    * assignment. Docs in no pair are their own singleton cluster
    * (root = own id), so the assignment degrades to [[assign]] on an
    * edge-free corpus.
    *
    * Scale shape: the pair graph is the (sparse) output of an upstream
    * bucketed dedup pass, components come from
    * [[graft.dedup.ConnectedComponents.runAdaptive]] (iterative
    * min-label propagation over edges, adaptive driver union-find
    * below a bounded edge count), and the join back to docs is a
    * broadcast at realistic cluster-to-corpus ratios. Stability caveat
    * vs [[assign]]: a NEW near-dup edge can merge two clusters and
    * re-root one side — membership changes move docs between splits
    * exactly when the leakage guard requires them to.
    *
    * @param pairs near-dup pairs (aCol, bCol) — ids in `idCol`'s space
    * @return `df` plus `root` (long) and `split` columns
    */
  def leakageFreeAssign(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      cuts: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    val comps = graft.dedup.ConnectedComponents
      .runAdaptive(pairs, aCol, bCol)
      .select(col("member").cast("long").as("__member"),
        col("cluster_root").cast("long").as("__croot"))
    val withRoot = df
      .join(comps, df(idCol).cast("long") === col("__member"), "left")
      .withColumn("root", coalesce(col("__croot"), col(idCol).cast("long")))
      .drop("__member", "__croot")
    assign(withRoot, "root", cuts, salt)
  }
}
