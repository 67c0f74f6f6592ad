package graft.nvd

import org.apache.spark.sql.Column
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
}
