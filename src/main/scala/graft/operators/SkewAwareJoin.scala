package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The wiring between the skew DIAGNOSTIC (SkewReport) and the skew
  * MITIGATIONS (plain shuffle join / AQE skew split / SaltedJoin): a
  * measured decision instead of a guessed one. (Reference scope:
  * absent — operational extension surface; completes the
  * SkewReport/SaltedJoin pair the way `ConnectedComponents.runAdaptive`
  * completes union-find vs label-propagation.)
  *
  * Policy (ratio = hottest key's load over the mean per-key load, from
  * `SkewReport.topKeys`):
  *   - ratio <= plainThreshold: uniform enough — any strategy works,
  *     pick the plain join (salting would only add explode cost);
  *   - ratio <= saltThreshold: moderate skew — a sort-merge join under
  *     AQE handles it (`spark.sql.adaptive.skewJoin` splits oversized
  *     partitions at runtime and replicates the matching build side),
  *     so the plan stays plain and the decision carries the conf keys
  *     an operator should confirm are on;
  *   - above: extreme single-key concentration — AQE can only split
  *     what lands in separate map outputs and a hash join's hot
  *     partition may not subdivide; salt explicitly, with the salt
  *     factor sized to the measured ratio (enough sub-keys to bring
  *     the hot key's per-reducer load back to ~mean), capped so the
  *     build-side replication cost stays bounded.
  *
  * The measurement is one bounded job (topKeys is k rows — same
  * control-plane-collect convention as `runAdaptive`'s edge count),
  * run at plan-construction time.
  */
object SkewAwareJoin {

  /** AQE confs a `Aqe` decision expects on (Spark defaults: enabled). */
  val AqeConfs: Seq[String] = Seq(
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.skewJoin.enabled")

  sealed trait Strategy
  case object Plain extends Strategy
  case object Aqe extends Strategy
  final case class Salted(salt: Int) extends Strategy

  final case class Decision(strategy: Strategy, maxRatio: Double)

  /** Pick a strategy from a `SkewReport.topKeys` frame (its
    * `ratio_to_mean` column). An EMPTY report (empty probe) is ratio 0
    * — plain. */
  def decide(
      topKeys: DataFrame,
      plainThreshold: Double = 4.0,
      saltThreshold: Double = 16.0,
      maxSalt: Int = 64): Decision = {
    require(plainThreshold >= 1.0 && saltThreshold >= plainThreshold,
      s"need 1 <= plainThreshold <= saltThreshold, got $plainThreshold/$saltThreshold")
    val r = topKeys.agg(max(col("ratio_to_mean"))).first()
    val maxRatio = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    val strat =
      if (maxRatio <= plainThreshold) Plain
      else if (maxRatio <= saltThreshold) Aqe
      else Salted(math.min(maxSalt.toLong, math.ceil(maxRatio).toLong).toInt)
    Decision(strat, maxRatio)
  }

  /** Join `probe` (large, possibly skewed) with `build` on `key`,
    * measuring first and mitigating only when the measurement says so.
    * All three strategies produce IDENTICAL rows — the decision moves
    * shuffle load, never semantics. Returns the joined frame and the
    * decision (callers log it / assert on it). */
  def innerDecided(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      plainThreshold: Double = 4.0,
      saltThreshold: Double = 16.0,
      maxSalt: Int = 64): (DataFrame, Decision) = {
    val d = decide(SkewReport.topKeys(probe, key),
      plainThreshold, saltThreshold, maxSalt)
    val joined = d.strategy match {
      case Salted(n) => SaltedJoin.inner(probe, build, key, n)
      case _ => probe.join(build, Seq(key))
    }
    (joined, d)
  }

  /** `innerDecided` without the decision — the drop-in join call. */
  def inner(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      plainThreshold: Double = 4.0,
      saltThreshold: Double = 16.0,
      maxSalt: Int = 64): DataFrame =
    innerDecided(probe, build, key, plainThreshold, saltThreshold, maxSalt)._1
}
