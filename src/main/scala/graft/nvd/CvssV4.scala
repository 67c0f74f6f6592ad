package graft.nvd

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CVSS v4.0 (FIRST.org, published November 2023) — the fourth
  * scoring-surface generation on top of the reference's v2-only
  * columns (CvssV2 → CvssV3 base/temporal/environmental → this):
  * vector-string parsing for the full v4 metric set, metric-group
  * nomenclature (CVSS-B / -BT / -BE / -BTE, spec section 1.3), the
  * qualitative severity scale (section 6), and the EQ1–EQ6
  * MacroVector derivation (section 8.2) — the equivalence-class
  * digest v4 scoring keys on, and the analytical column a fleet-wide
  * vulnerability rollup groups by ("how many CVSS-B 000000-class
  * findings landed this week").
  *
  * Deliberate scope boundary: v4's NUMERIC score is not a closed-form
  * formula like v3.1's — it is a lookup of the MacroVector in the
  * spec's ~270-entry table plus severity-distance interpolation
  * (section 8.3). That table is DATA, not algebra; shipping a
  * from-memory copy would risk silently wrong scores that a
  * self-replicating oracle could never catch, so this module derives
  * everything UP TO the table boundary and consumes feed-carried
  * `baseScore`/`baseSeverity` for the numeric side (NVD v4 items
  * carry both, exactly as v3 items do — the practical NVD-user
  * surface is parse + validate + MacroVector + severity).
  */
object CvssV4 {

  /** One metric value out of a CVSS v4.0 vector string
    * (`CVSS:4.0/AV:N/AC:L/AT:N/...`). Metric names are 2–3 chars
    * (AV..SA, E, CR/IR/AR, MAV..MSA), values single letters.
    * Anchored start-or-slash, same guard as [[CvssV3.vectorMetric]];
    * absent -> ''. */
  def vectorMetric(vs: Column, name: String): Column =
    regexp_extract(vs, "(?:^|/)" + name + ":([A-Z])", 1)

  /** The eleven base metrics as a struct of letters. */
  def baseParsed(vs: Column): Column = struct(
    vectorMetric(vs, "AV").as("av"), vectorMetric(vs, "AC").as("ac"),
    vectorMetric(vs, "AT").as("at"), vectorMetric(vs, "PR").as("pr"),
    vectorMetric(vs, "UI").as("ui"),
    vectorMetric(vs, "VC").as("vc"), vectorMetric(vs, "VI").as("vi"),
    vectorMetric(vs, "VA").as("va"),
    vectorMetric(vs, "SC").as("sc"), vectorMetric(vs, "SI").as("si"),
    vectorMetric(vs, "SA").as("sa"))

  /** Spec section 1.3 nomenclature — which metric groups the vector
    * actually carries: threat = E present, environmental = any
    * CR/IR/AR/M* present. A consumer comparing CVSS-B numbers against
    * CVSS-BTE numbers is comparing different quantities; this column
    * is the guard. */
  def nomenclatureOf(vs: Column): Column = {
    val threat = vectorMetric(vs, "E") =!= ""
    val envNames = Seq("CR", "IR", "AR", "MAV", "MAC", "MAT", "MPR",
      "MUI", "MVC", "MVI", "MVA", "MSC", "MSI", "MSA")
    val env = envNames.map(n => vectorMetric(vs, n) =!= "")
      .reduce(_ || _)
    when(threat && env, "CVSS-BTE")
      .when(threat, "CVSS-BT")
      .when(env, "CVSS-BE")
      .otherwise("CVSS-B")
  }

  /** Qualitative severity (section 6) — same thresholds as v3.x:
    * 0.0 NONE, 0.1–3.9 LOW, 4.0–6.9 MEDIUM, 7.0–8.9 HIGH,
    * 9.0–10.0 CRITICAL; null score stays null. */
  def severityOf(score: Column): Column = CvssV3.severityOf(score)

  /** EQ1 (section 8.2, AV/PR/UI): 0 = all three at their maximum
    * (AV:N ∧ PR:N ∧ UI:N); 1 = at least one at maximum but not all
    * three, and AV is not Physical; 2 = AV:P, or none at maximum. */
  def eq1(av: Column, pr: Column, ui: Column): Column = {
    val allN = av === "N" && pr === "N" && ui === "N"
    val anyN = av === "N" || pr === "N" || ui === "N"
    when(allN, 0).when(anyN && !allN && av =!= "P", 1).otherwise(2)
  }

  /** EQ2 (AC/AT): 0 = AC:L ∧ AT:N; 1 otherwise. */
  def eq2(ac: Column, at: Column): Column =
    when(ac === "L" && at === "N", 0).otherwise(1)

  /** EQ3 (VC/VI/VA): 0 = VC:H ∧ VI:H; 1 = not both but at least one
    * of VC/VI/VA High; 2 = none High. */
  def eq3(vc: Column, vi: Column, va: Column): Column = {
    val both = vc === "H" && vi === "H"
    val any = vc === "H" || vi === "H" || va === "H"
    when(both, 0).when(!both && any, 1).otherwise(2)
  }

  /** EQ4 (MSI/MSA/SC/SI/SA): 0 = a Safety outcome (MSI:S ∨ MSA:S);
    * 1 = no Safety and at least one of SC/SI/SA High; 2 = neither.
    * Without environmental metrics MSI/MSA are absent/X — never S —
    * so the base-only form keys on SC/SI/SA alone. */
  def eq4(msi: Column, msa: Column, sc: Column, si: Column, sa: Column): Column = {
    val safety = msi === "S" || msa === "S"
    val anyH = sc === "H" || si === "H" || sa === "H"
    when(safety, 0).when(!safety && anyH, 1).otherwise(2)
  }

  /** EQ5 (E): 0 = Attacked; 1 = PoC; 2 = Unreported. Absent or X
    * defaults to Attacked (the spec's worst-case default — a CVSS-B
    * vector scores as if actively exploited). */
  def eq5(e: Column): Column =
    when(e === "P", 1).when(e === "U", 2).otherwise(0)

  /** EQ6 (CR/IR/AR × VC/VI/VA): 0 = some High requirement meets a
    * High impact ((CR:H ∧ VC:H) ∨ (IR:H ∧ VI:H) ∨ (AR:H ∧ VA:H));
    * 1 otherwise. Absent/X requirements default to High. */
  def eq6(cr: Column, ir: Column, ar: Column,
      vc: Column, vi: Column, va: Column): Column = {
    def high(req: Column) = req === "H" || req === "" || req === "X"
    when((high(cr) && vc === "H") || (high(ir) && vi === "H") ||
      (high(ar) && va === "H"), 0).otherwise(1)
  }

  /** The six-digit MacroVector (section 8.2) from a vector string —
    * null when any base metric is absent or carries an unrecognized
    * letter (the CvssV3 null discipline: never a plausible-looking
    * wrong digest). Threat/environmental metrics default per spec
    * (E→A, CR/IR/AR→H, M*→X) so a CVSS-B vector gets its worst-case
    * macrovector. */
  def macroVectorOf(vs: Column): Column = {
    val av = vectorMetric(vs, "AV"); val ac = vectorMetric(vs, "AC")
    val at = vectorMetric(vs, "AT"); val pr = vectorMetric(vs, "PR")
    val ui = vectorMetric(vs, "UI")
    val vc = vectorMetric(vs, "VC"); val vi = vectorMetric(vs, "VI")
    val va = vectorMetric(vs, "VA")
    val sc = vectorMetric(vs, "SC"); val si = vectorMetric(vs, "SI")
    val sa = vectorMetric(vs, "SA")
    val valid =
      av.isin("N", "A", "L", "P") && ac.isin("L", "H") &&
        at.isin("N", "P") && pr.isin("N", "L", "H") &&
        ui.isin("N", "P", "A") &&
        vc.isin("H", "L", "N") && vi.isin("H", "L", "N") &&
        va.isin("H", "L", "N") &&
        sc.isin("H", "L", "N") && si.isin("H", "L", "N") &&
        sa.isin("H", "L", "N")
    val digits = concat(
      eq1(av, pr, ui).cast("string"),
      eq2(ac, at).cast("string"),
      eq3(vc, vi, va).cast("string"),
      eq4(vectorMetric(vs, "MSI"), vectorMetric(vs, "MSA"), sc, si, sa)
        .cast("string"),
      eq5(vectorMetric(vs, "E")).cast("string"),
      eq6(vectorMetric(vs, "CR"), vectorMetric(vs, "IR"),
        vectorMetric(vs, "AR"), vc, vi, va).cast("string"))
    when(valid, digits).otherwise(lit(null).cast("string"))
  }
}
