package graft.nvd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CVSS v3.x helpers. The reference never extracts v3 — its own DDL
  * laments the gap (/root/reference/nvd.sql:34-38) — so this is the
  * additive query surface a 2026-era NVD user expects on top of the
  * reference's v2-only columns.
  */
object CvssV3 {

  /** CVSS v3.1 qualitative severity rating scale (spec section 5):
    * 0.0 NONE, 0.1–3.9 LOW, 4.0–6.9 MEDIUM, 7.0–8.9 HIGH,
    * 9.0–10.0 CRITICAL. Feed items usually carry `baseSeverity`
    * explicitly; this derives it when only the score is present.
    * A null score yields null, NOT 'CRITICAL': every `when` predicate
    * on a null operand is null (= skipped), so without the explicit
    * guard a null would fall through to `otherwise`.
    */
  def severityOf(score: Column): Column =
    when(score.isNull, lit(null).cast("string"))
      .when(score <= 0.0, "NONE")
      .when(score < 4.0, "LOW")
      .when(score < 7.0, "MEDIUM")
      .when(score < 9.0, "HIGH")
      .otherwise("CRITICAL")

  /** One metric letter out of a CVSS v3.x vector string
    * (`CVSS:3.1/AV:N/AC:L/...`). Anchored on start-or-slash so the
    * `S:` of the `CVSS:` prefix can never match the Scope metric;
    * absent metric -> '' (regexp_extract's no-match), which the weight
    * chains below turn into null. */
  def vectorMetric(vs: Column, name: String): Column =
    regexp_extract(vs, "(?:^|/)" + name + ":([A-Z])", 1)

  /** vectorString -> struct of the eight base-metric letters. */
  def vectorParsed(vs: Column): Column = struct(
    vectorMetric(vs, "AV").as("av"), vectorMetric(vs, "AC").as("ac"),
    vectorMetric(vs, "PR").as("pr"), vectorMetric(vs, "UI").as("ui"),
    vectorMetric(vs, "S").as("s"), vectorMetric(vs, "C").as("c"),
    vectorMetric(vs, "I").as("i"), vectorMetric(vs, "A").as("a"))

  /** CVSS v3.1 base score computed FROM the vector string (spec
    * section 7.1) — pure codegen'd expressions end to end: metric
    * regexes -> weight when-chains -> the ISS/Impact/Exploitability
    * algebra -> the spec's Roundup. The 15th power in the
    * changed-scope Impact is an explicit square-and-multiply chain
    * (y^8*y^4*y^2*y) rather than pow(): libm pow differs across
    * engines by an ulp, the multiply chain is IEEE-deterministic, so
    * an oracle replicating the same chain matches bit for bit.
    * Unknown/absent metric letters yield null, not a wrong score.
    *
    * Every `m(name)` reference inlines its own regexp_extract, so this
    * single-Column form builds a LARGE tree (fine for one-off use; the
    * runtime cost dedups under codegen subexpression elimination, but
    * analysis + janino compile scale with tree size). Query code that
    * also needs the letters or a temporal score should stage through
    * [[baseScoreOfLetters]] over a projection of [[vectorMetric]]
    * columns instead: letters referenced as attributes are cheap, and
    * CollapseProject keeps non-cheap producer expressions (the regexes)
    * un-reinlined when consumed more than once. */
  def baseScoreOfVector(vs: Column): Column =
    baseScoreOfLetters(vectorMetric(vs, "AV"), vectorMetric(vs, "AC"),
      vectorMetric(vs, "PR"), vectorMetric(vs, "UI"), vectorMetric(vs, "S"),
      vectorMetric(vs, "C"), vectorMetric(vs, "I"), vectorMetric(vs, "A"))

  /** Base score from already-extracted metric letters (pass attribute
    * references from a prior projection to keep the tree small —
    * scaladoc on [[baseScoreOfVector]]). Arithmetic is identical to
    * the vector-string form, association for association. */
  def baseScoreOfLetters(avL: Column, acL: Column, prL: Column,
      uiL: Column, sL: Column, cL: Column, iL: Column, aL: Column): Column = {
    val byName = Map("AV" -> avL, "AC" -> acL, "PR" -> prL, "UI" -> uiL,
      "S" -> sL, "C" -> cL, "I" -> iL, "A" -> aL)
    def m(name: String) = byName(name)
    def w(c: Column, pairs: (String, Double)*): Column =
      pairs.tail.foldLeft(when(c === pairs.head._1, lit(pairs.head._2))) {
        case (acc, (l, v)) => acc.when(c === l, lit(v))
      }
    val scopeChanged = m("S") === "C"
    val av = w(m("AV"), "N" -> 0.85, "A" -> 0.62, "L" -> 0.55, "P" -> 0.2)
    val ac = w(m("AC"), "L" -> 0.77, "H" -> 0.44)
    // PR weights depend on Scope (spec table 7.4)
    val pr = when(scopeChanged, w(m("PR"), "N" -> 0.85, "L" -> 0.68, "H" -> 0.5))
      .otherwise(w(m("PR"), "N" -> 0.85, "L" -> 0.62, "H" -> 0.27))
    val ui = w(m("UI"), "N" -> 0.85, "R" -> 0.62)
    def cia(name: String) = w(m(name), "H" -> 0.56, "L" -> 0.22, "N" -> 0.0)
    val iss = lit(1.0) - (lit(1.0) - cia("C")) * (lit(1.0) - cia("I")) * (lit(1.0) - cia("A"))
    val y = iss - lit(0.02)
    val y2 = y * y
    val y4 = y2 * y2
    val y8 = y4 * y4
    val impact = when(scopeChanged,
        lit(7.52) * (iss - lit(0.029)) - lit(3.25) * (y8 * y4 * y2 * y))
      .otherwise(lit(6.42) * iss)
    val expl = lit(8.22) * av * ac * pr * ui
    val sum = impact + expl
    // explicit null guards: `least` returns the least NON-null
    // operand, so a missing metric's null sum would otherwise come
    // back as the 10.0 cap — and Scope is the one metric that never
    // enters the null web (it is only ever compared, and '' === 'C' is
    // false, not null), so a vector with S missing or unrecognized
    // would silently score as Scope:Unchanged without its own check
    when(sum.isNull || !m("S").isin("U", "C"), lit(null).cast("double"))
      .when(impact <= 0.0, lit(0.0))
      .otherwise(roundup1(
        when(scopeChanged, least(lit(1.08) * sum, lit(10.0)))
          .otherwise(least(sum, lit(10.0)))))
  }

  /** CVSS v3.1 TEMPORAL score (spec section 7.2): the base score
    * degraded by Exploit Code Maturity (E), Remediation Level (RL) and
    * Report Confidence (RC) — `Roundup(base × E × RL × RC)`. Metrics
    * may be absent from the vector entirely; absent or X ("not
    * defined") weighs 1.0 per the spec, so a bare base vector's
    * temporal score equals its base score. A null base score stays
    * null. */
  def temporalScoreOfVector(vs: Column): Column =
    temporalScoreOf(baseScoreOfVector(vs), vectorMetric(vs, "E"),
      vectorMetric(vs, "RL"), vectorMetric(vs, "RC"))

  /** Temporal score from an already-computed base score and extracted
    * E/RL/RC letters. The vector-string form references the ENTIRE
    * base-score subtree three times (null guard + product); staging
    * base/letters through a projection keeps those references as
    * attributes and the tree ~10x smaller. */
  def temporalScoreOf(base: Column, eL: Column, rlL: Column,
      rcL: Column): Column = {
    // absent ('') or X -> 1.0 (NOT null): "not defined" is a defined
    // weight in the temporal equation, unlike base metrics
    def w(letter: Column, pairs: (String, Double)*): Column =
      pairs.foldLeft(when(letter === "" || letter === "X", lit(1.0))) {
        case (acc, (l, v)) => acc.when(letter === l, lit(v))
      }
    val e = w(eL, "U" -> 0.91, "P" -> 0.94, "F" -> 0.97, "H" -> 1.0)
    val rl = w(rlL, "O" -> 0.95, "T" -> 0.96, "W" -> 0.97, "U" -> 1.0)
    val rc = w(rcL, "U" -> 0.92, "R" -> 0.96, "C" -> 1.0)
    when(base.isNull || e.isNull || rl.isNull || rc.isNull,
      lit(null).cast("double"))
      .otherwise(roundup1(base * e * rl * rc))
  }

  /** CVSS v3.1 ENVIRONMENTAL score (spec section 7.3) — the consumer's
    * view of a vulnerability: every base metric can be OVERRIDDEN by
    * its Modified twin (absent or X falls back to the base letter),
    * the C/I/A impact weights are re-scaled by the CR/IR/AR security
    * requirements (absent/X/M → 1.0, H → 1.5, L → 0.5), MISS is
    * capped at 0.915, the changed-scope Modified Impact uses the
    * 3.1-specific (MISS × 0.9731 − 0.02)^13 term — built as a
    * square-and-multiply chain (z^8·z^4·z) for the same
    * IEEE-determinism reason as the base score's y^15 — and the
    * result degrades by E/RL/RC inside the spec's DOUBLE Roundup:
    * Roundup(Roundup(min(scoped sum, 10)) × E × RL × RC). Modified
    * Scope decides BOTH the 1.08 factor and the MPR weight table.
    * Null discipline matches [[baseScoreOfLetters]]: an unrecognized
    * effective letter nulls the score; effective Scope must be U/C. */
  def environmentalScoreOf(
      avL: Column, acL: Column, prL: Column, uiL: Column, sL: Column,
      cL: Column, iL: Column, aL: Column,
      mavL: Column, macL: Column, mprL: Column, muiL: Column, msL: Column,
      mcL: Column, miL: Column, maL: Column,
      crL: Column, irL: Column, arL: Column,
      eL: Column, rlL: Column, rcL: Column): Column = {
    def eff(mod: Column, base: Column): Column =
      when(mod === "" || mod === "X", base).otherwise(mod)
    def w(c: Column, pairs: (String, Double)*): Column =
      pairs.tail.foldLeft(when(c === pairs.head._1, lit(pairs.head._2))) {
        case (acc, (l, v)) => acc.when(c === l, lit(v))
      }
    val msEff = eff(msL, sL)
    val scopeChanged = msEff === "C"
    val av = w(eff(mavL, avL), "N" -> 0.85, "A" -> 0.62, "L" -> 0.55, "P" -> 0.2)
    val ac = w(eff(macL, acL), "L" -> 0.77, "H" -> 0.44)
    val pr = when(scopeChanged,
        w(eff(mprL, prL), "N" -> 0.85, "L" -> 0.68, "H" -> 0.5))
      .otherwise(w(eff(mprL, prL), "N" -> 0.85, "L" -> 0.62, "H" -> 0.27))
    val ui = w(eff(muiL, uiL), "N" -> 0.85, "R" -> 0.62)
    def req(c: Column): Column =
      when(c === "" || c === "X" || c === "M", lit(1.0))
        .when(c === "H", lit(1.5)).when(c === "L", lit(0.5))
    def cia(c: Column): Column =
      w(c, "H" -> 0.56, "L" -> 0.22, "N" -> 0.0)
    val miss = least(
      lit(1.0) - (lit(1.0) - req(crL) * cia(eff(mcL, cL)))
        * (lit(1.0) - req(irL) * cia(eff(miL, iL)))
        * (lit(1.0) - req(arL) * cia(eff(maL, aL))),
      lit(0.915))
    val z = miss * lit(0.9731) - lit(0.02)
    val z2 = z * z
    val z4 = z2 * z2
    val z8 = z4 * z4
    val mImpact = when(scopeChanged,
        lit(7.52) * (miss - lit(0.029)) - lit(3.25) * (z8 * z4 * z))
      .otherwise(lit(6.42) * miss)
    val mExpl = lit(8.22) * av * ac * pr * ui
    def tw(letter: Column, pairs: (String, Double)*): Column =
      pairs.foldLeft(when(letter === "" || letter === "X", lit(1.0))) {
        case (acc, (l, v)) => acc.when(letter === l, lit(v))
      }
    val e = tw(eL, "U" -> 0.91, "P" -> 0.94, "F" -> 0.97, "H" -> 1.0)
    val rl = tw(rlL, "O" -> 0.95, "T" -> 0.96, "W" -> 0.97, "U" -> 1.0)
    val rc = tw(rcL, "U" -> 0.92, "R" -> 0.96, "C" -> 1.0)
    val sum = mImpact + mExpl
    when(sum.isNull || e.isNull || rl.isNull || rc.isNull ||
        !msEff.isin("U", "C"), lit(null).cast("double"))
      .when(mImpact <= 0.0, lit(0.0))
      .otherwise(roundup1(roundup1(
        when(scopeChanged, least(lit(1.08) * sum, lit(10.0)))
          .otherwise(least(sum, lit(10.0)))) * e * rl * rc))
  }

  /** [[environmentalScoreOf]] STAGED through projections — same
    * arithmetic, same operation order, same null web, but every
    * intermediate referenced more than once (effective Scope, MISS,
    * the z square-multiply chain, Modified Impact, the capped sum,
    * both Roundup integer snaps, the E/RL/RC weights) becomes a
    * column instead of an inlined copy. The single-Column form's tree
    * is multiplicative — roundup1(roundup1(x)·e·rl·rc) alone inlines
    * x four times, and x itself re-inlines MISS and the z-chain —
    * which made q115b's analyzed plan ~500 KB and its per-run cost
    * planning, not execution. CollapseProject keeps a non-cheap
    * producer referenced twice staged, so the optimized tree stays
    * linear. CvssV3Spec pins value equality with the Column form on
    * the identity/re-weighting/scope-flip/null grid. */
  def environmentalScoreStaged(
      df: DataFrame,
      avL: Column, acL: Column, prL: Column, uiL: Column, sL: Column,
      cL: Column, iL: Column, aL: Column,
      mavL: Column, macL: Column, mprL: Column, muiL: Column, msL: Column,
      mcL: Column, miL: Column, maL: Column,
      crL: Column, irL: Column, arL: Column,
      eL: Column, rlL: Column, rcL: Column,
      out: String): DataFrame = {
    def eff(mod: Column, base: Column): Column =
      when(mod === "" || mod === "X", base).otherwise(mod)
    def w(c: Column, pairs: (String, Double)*): Column =
      pairs.tail.foldLeft(when(c === pairs.head._1, lit(pairs.head._2))) {
        case (acc, (l, v)) => acc.when(c === l, lit(v))
      }
    def req(c: Column): Column =
      when(c === "" || c === "X" || c === "M", lit(1.0))
        .when(c === "H", lit(1.5)).when(c === "L", lit(0.5))
    def cia(c: Column): Column =
      w(c, "H" -> 0.56, "L" -> 0.22, "N" -> 0.0)
    def tw(letter: Column, pairs: (String, Double)*): Column =
      pairs.foldLeft(when(letter === "" || letter === "X", lit(1.0))) {
        case (acc, (l, v)) => acc.when(letter === l, lit(v))
      }
    val P = s"__${out}_"
    def c(n: String) = col(P + n)
    val staged = df
      .withColumns(Map(
        P + "ems" -> eff(msL, sL),
        P + "miss" -> least(
          lit(1.0) - (lit(1.0) - req(crL) * cia(eff(mcL, cL)))
            * (lit(1.0) - req(irL) * cia(eff(miL, iL)))
            * (lit(1.0) - req(arL) * cia(eff(maL, aL))),
          lit(0.915)),
        P + "e" -> tw(eL, "U" -> 0.91, "P" -> 0.94, "F" -> 0.97, "H" -> 1.0),
        P + "rl" -> tw(rlL, "O" -> 0.95, "T" -> 0.96, "W" -> 0.97, "U" -> 1.0),
        P + "rc" -> tw(rcL, "U" -> 0.92, "R" -> 0.96, "C" -> 1.0)))
      .withColumns(Map(
        P + "z" -> (c("miss") * lit(0.9731) - lit(0.02)),
        P + "mexpl" -> (lit(8.22)
          * w(eff(mavL, avL), "N" -> 0.85, "A" -> 0.62, "L" -> 0.55, "P" -> 0.2)
          * w(eff(macL, acL), "L" -> 0.77, "H" -> 0.44)
          * when(c("ems") === "C",
              w(eff(mprL, prL), "N" -> 0.85, "L" -> 0.68, "H" -> 0.5))
            .otherwise(w(eff(mprL, prL), "N" -> 0.85, "L" -> 0.62, "H" -> 0.27))
          * w(eff(muiL, uiL), "N" -> 0.85, "R" -> 0.62))))
      .withColumn(P + "z2", c("z") * c("z"))
      .withColumn(P + "z4", c("z2") * c("z2"))
      .withColumn(P + "z8", c("z4") * c("z4"))
      .withColumn(P + "mimpact", when(c("ems") === "C",
          lit(7.52) * (c("miss") - lit(0.029))
            - lit(3.25) * (c("z8") * c("z4") * c("z")))
        .otherwise(lit(6.42) * c("miss")))
      .withColumn(P + "sum", c("mimpact") + c("mexpl"))
      .withColumn(P + "capped", when(c("ems") === "C",
          least(lit(1.08) * c("sum"), lit(10.0)))
        .otherwise(least(c("sum"), lit(10.0))))
      .withColumn(P + "eri", round(c("capped") * lit(100000.0)))
      .withColumn(P + "er1", when(c("eri") % 10000 === 0, c("eri") / lit(100000.0))
        .otherwise((floor(c("eri") / lit(10000.0)) + lit(1)) / lit(10.0)))
      .withColumn(P + "eri2", round(c("er1") * c("e") * c("rl") * c("rc") * lit(100000.0)))
      .withColumn(out,
        when(c("sum").isNull || c("e").isNull || c("rl").isNull ||
            c("rc").isNull || !c("ems").isin("U", "C"),
          lit(null).cast("double"))
          .when(c("mimpact") <= 0.0, lit(0.0))
          .otherwise(
            when(c("eri2") % 10000 === 0, c("eri2") / lit(100000.0))
              .otherwise((floor(c("eri2") / lit(10000.0)) + lit(1)) / lit(10.0))))
    staged.drop(staged.columns.filter(_.startsWith(P)): _*)
  }

  /** The spec's Roundup (v3.1 appendix A): smallest one-decimal value
    * >= x, through an integer snap at 1e-5 so float noise below that
    * cannot shift the result — the exact fix 3.1 made over 3.0's naive
    * ceil. */
  def roundup1(x: Column): Column = {
    val i = round(x * lit(100000.0))
    when(i % 10000 === 0, i / lit(100000.0))
      .otherwise((floor(i / lit(10000.0)) + lit(1)) / lit(10.0))
  }
}
