package graft.nvd

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CVSS v2 base-score computation from the vector string
  * (`AV:N/AC:L/Au:N/C:P/I:P/A:P`) — the score family the reference
  * actually stores (nvd2mysqlloader.py flattens `baseMetricV2`
  * fields verbatim; the feed carries both the vector and the
  * pre-computed score, so computing it validates the archive).
  * Spec section: CVSS v2 guide, equation 3.2.1:
  *
  *   Impact         = 10.41 · (1 − (1−C)(1−I)(1−A))
  *   Exploitability = 20 · AV · AC · Au
  *   f(Impact)      = 0 if Impact = 0 else 1.176
  *   BaseScore      = round₁(((0.6·I) + (0.4·E) − 1.5) · f(I))
  *
  * Same cross-engine determinism rules as [[CvssV3]]: fixed
  * association order, no pow(), explicit one-decimal rounding through
  * an integer snap, null (not a wrong score) on unknown/absent
  * metrics. v2 metrics are Scope-free so, unlike v3, every metric
  * participates in the null web and no extra guard is needed.
  */
object CvssV2 {

  /** One metric out of a v2 vector (metrics are 1-2 letters; values
    * single letters). v2 vectors have no `CVSS:` prefix but accept one
    * defensively; anchored start-or-slash like the v3 parser. */
  def vectorMetric(vs: Column, name: String): Column =
    regexp_extract(vs, "(?:^|/)" + name + ":([A-Z])", 1)

  /** Weight chain: unknown/absent letter -> null. */
  private def w(c: Column, pairs: (String, Double)*): Column =
    pairs.tail.foldLeft(when(c === pairs.head._1, lit(pairs.head._2))) {
      case (acc, (l, v)) => acc.when(c === l, lit(v))
    }

  /** Base score from already-extracted metric letters (stage the
    * letters through a projection for a small plan — the same pattern
    * as [[CvssV3.baseScoreOfLetters]]). */
  def baseScoreOfLetters(avL: Column, acL: Column, auL: Column,
      cL: Column, iL: Column, aL: Column): Column = {
    val av = w(avL, "L" -> 0.395, "A" -> 0.646, "N" -> 1.0)
    val ac = w(acL, "H" -> 0.35, "M" -> 0.61, "L" -> 0.71)
    val au = w(auL, "M" -> 0.45, "S" -> 0.56, "N" -> 0.704)
    def cia(c: Column) = w(c, "N" -> 0.0, "P" -> 0.275, "C" -> 0.66)
    val impact = lit(10.41) *
      (lit(1.0) - (lit(1.0) - cia(cL)) * (lit(1.0) - cia(iL)) * (lit(1.0) - cia(aL)))
    val expl = lit(20.0) * av * ac * au
    val raw = (lit(0.6) * impact + lit(0.4) * expl - lit(1.5)) * lit(1.176)
    when(impact.isNull || expl.isNull, lit(null).cast("double"))
      .when(impact === 0.0, lit(0.0))
      .otherwise(round1(raw))
  }

  /** Base score straight from the vector string (large inlined tree —
    * fine for one-off columns; stage letters for query plans). */
  def baseScoreOfVector(vs: Column): Column =
    baseScoreOfLetters(vectorMetric(vs, "AV"), vectorMetric(vs, "AC"),
      vectorMetric(vs, "Au"), vectorMetric(vs, "C"), vectorMetric(vs, "I"),
      vectorMetric(vs, "A"))

  /** Multi-letter metric out of a v2 vector — temporal/environmental
    * metric VALUES are 1-3 letters (POC, OF, ND, UC, LM, ...), unlike
    * the single-letter base metrics. Same start-or-slash anchor, so
    * `C:` never matches inside `RC:` or `CDP:`. */
  def vectorMetricML(vs: Column, name: String): Column =
    regexp_extract(vs, "(?:^|/)" + name + ":([A-Z]+)", 1)

  /** Absent ('') or ND -> 1.0 (a DEFINED weight in the temporal and
    * environmental equations); unknown letters -> null. */
  private def wnd(c: Column, pairs: (String, Double)*): Column =
    pairs.foldLeft(when(c === "" || c === "ND", lit(1.0))) {
      case (acc, (l, v)) => acc.when(c === l, lit(v))
    }

  /** Temporal score (v2 guide 3.2.2):
    *   TemporalScore = round₁(BaseScore · E · RL · RC)
    * from an already-computed base score and extracted E/RL/RC values
    * (multi-letter — use [[vectorMetricML]]). Null base or unknown
    * letter -> null. */
  def temporalScoreOf(base: Column, eV: Column, rlV: Column, rcV: Column): Column = {
    val e = wnd(eV, "U" -> 0.85, "POC" -> 0.9, "F" -> 0.95, "H" -> 1.0)
    val rl = wnd(rlV, "OF" -> 0.87, "TF" -> 0.90, "W" -> 0.95, "U" -> 1.0)
    val rc = wnd(rcV, "UC" -> 0.90, "UR" -> 0.95, "C" -> 1.0)
    when(base.isNull || e.isNull || rl.isNull || rc.isNull,
      lit(null).cast("double"))
      .otherwise(round1(base * e * rl * rc))
  }

  /** Environmental score (v2 guide 3.2.3), from base letters plus
    * temporal (E/RL/RC) and environmental (CDP/TD/CR/IR/AR) values:
    *
    *   AdjImpact   = min(10, 10.41·(1 − (1−C·CR)(1−I·IR)(1−A·AR)))
    *   AdjBase     = round₁(((0.6·AdjImpact) + (0.4·Expl) − 1.5) · f)
    *   AdjTemporal = round₁(AdjBase · E · RL · RC)
    *   EnvScore    = round₁((AdjTemporal + (10 − AdjTemporal)·CDP) · TD)
    *
    * Intermediate one-decimal rounding at each named score mirrors the
    * NVD calculator's staging (each of AdjBase/AdjTemporal is a score
    * the spec defines as rounded). The `least` for min(10, ·) is
    * null-guarded explicitly — Spark's `least` SKIPS nulls, which
    * would turn an unknown letter into a confident 10.0. */
  def environmentalScoreOfLetters(
      avL: Column, acL: Column, auL: Column,
      cL: Column, iL: Column, aL: Column,
      eV: Column, rlV: Column, rcV: Column,
      cdpV: Column, tdV: Column,
      crV: Column, irV: Column, arV: Column): Column = {
    val av = w(avL, "L" -> 0.395, "A" -> 0.646, "N" -> 1.0)
    val ac = w(acL, "H" -> 0.35, "M" -> 0.61, "L" -> 0.71)
    val au = w(auL, "M" -> 0.45, "S" -> 0.56, "N" -> 0.704)
    def cia(c: Column) = w(c, "N" -> 0.0, "P" -> 0.275, "C" -> 0.66)
    def req(c: Column) = wnd(c, "L" -> 0.5, "M" -> 1.0, "H" -> 1.51)
    val cdp = pairsWithNd(cdpV, 0.0,
      "N" -> 0.0, "L" -> 0.1, "LM" -> 0.3, "MH" -> 0.4, "H" -> 0.5)
    val td = wnd(tdV, "N" -> 0.0, "L" -> 0.25, "M" -> 0.75, "H" -> 1.0)
    val adjImpactRaw = lit(10.41) * (lit(1.0) -
      (lit(1.0) - cia(cL) * req(crV)) *
        (lit(1.0) - cia(iL) * req(irV)) *
        (lit(1.0) - cia(aL) * req(arV)))
    val adjImpact = when(adjImpactRaw.isNull, lit(null).cast("double"))
      .otherwise(least(lit(10.0), adjImpactRaw))
    val expl = lit(20.0) * av * ac * au
    val adjBaseRaw = (lit(0.6) * adjImpact + lit(0.4) * expl - lit(1.5)) * lit(1.176)
    val adjBase = when(adjImpact.isNull || expl.isNull, lit(null).cast("double"))
      .when(adjImpact === 0.0, lit(0.0))
      .otherwise(round1(adjBaseRaw))
    val adjTemporal = temporalScoreOf(adjBase, eV, rlV, rcV)
    when(adjTemporal.isNull || cdp.isNull || td.isNull,
      lit(null).cast("double"))
      .otherwise(round1((adjTemporal + (lit(10.0) - adjTemporal) * cdp) * td))
  }

  /** Like [[wnd]] but ND maps to `ndValue` (CDP's "not defined" is 0,
    * not 1). */
  private def pairsWithNd(c: Column, ndValue: Double, pairs: (String, Double)*): Column =
    pairs.foldLeft(when(c === "" || c === "ND", lit(ndValue))) {
      case (acc, (l, v)) => acc.when(c === l, lit(v))
    }

  /** v2 severity rating (NVD convention): 0.0-3.9 LOW, 4.0-6.9 MEDIUM,
    * 7.0-10.0 HIGH. Null score stays null. */
  def severityOf(score: Column): Column =
    when(score.isNull, lit(null).cast("string"))
      .when(score < 4.0, "LOW")
      .when(score < 7.0, "MEDIUM")
      .otherwise("HIGH")

  /** v2 uses ROUND-HALF-UP to one decimal (not v3.1's Roundup): an
    * integer snap at 1e-5 absorbs float noise, then floor(x*10+0.5)/10
    * is half-up in a form both engines compute identically. */
  def round1(x: Column): Column = {
    val snapped = round(x * lit(100000.0)) / lit(100000.0)
    floor(snapped * lit(10.0) + lit(0.5)) / lit(10.0)
  }
}
