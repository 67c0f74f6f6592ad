package graft.nvd

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CVSS v4.0 parsing / MacroVector / nomenclature semantics against
  * hand-derived vectors (spec sections 1.3, 6, 8.2). */
class CvssV4Spec extends SparkSpec {

  private def mv(vectors: (String, String)*): Map[String, String] = {
    val sp = spark; import sp.implicits._
    vectors.toSeq.toDF("name", "vs")
      .select(col("name"), CvssV4.macroVectorOf(col("vs")).as("mv"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
  }

  test("macrovector: EQ rules on hand-derived vectors") {
    val base = "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:H/SI:H/SA:H"
    val got = mv(
      // all-maximum base: EQ1 0 (AV,PR,UI all N), EQ2 0, EQ3 0 (VC,VI H),
      // EQ4 1 (subsequent H, no Safety), EQ5 0 (E defaults Attacked),
      // EQ6 0 (CR defaults H and VC:H)
      "worst" -> base,
      // physical AV forces EQ1 2 even with PR:N/UI:N
      "phys" -> "CVSS:4.0/AV:P/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:N/SI:N/SA:N",
      // no impacts at all: EQ3 2, EQ4 2, EQ6 1
      "noimp" -> "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:N/VI:N/VA:N/SC:N/SI:N/SA:N",
      // partial: one of AV/PR/UI at max (not all) -> EQ1 1, AT:P ->
      // EQ2 1, only VA high -> EQ3 1, E:U -> EQ5 2; CR:L suppresses
      // the VC axis but AR defaults High and VA:H -> EQ6 0
      "mid" -> "CVSS:4.0/AV:N/AC:L/AT:P/PR:L/UI:P/VC:N/VI:N/VA:H/SC:N/SI:N/SA:N/E:U/CR:L",
      // Safety override: MSI:S forces EQ4 0 with no subsequent impact
      "safety" -> "CVSS:4.0/AV:L/AC:H/AT:N/PR:H/UI:A/VC:L/VI:L/VA:L/SC:N/SI:N/SA:N/MSI:S",
      // requirements LOW on every axis -> EQ6 1 despite VC:H
      "lowreq" -> "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:N/VA:N/SC:N/SI:N/SA:N/CR:L/IR:L/AR:L",
      // a missing base metric (no SA) nulls the digest
      "invalid" -> "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:H/SI:H")
    assert(got("worst") == "000100")
    assert(got("phys") == "200200")
    assert(got("noimp") == "002201")
    assert(got("mid") == "111220")
    assert(got("safety") == "212001")
    assert(got("lowreq") == "001201")
    assert(got("invalid") == null)
  }

  test("nomenclature: threat/environmental presence classification") {
    val sp = spark; import sp.implicits._
    val got = Seq(
      ("b", "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:N/SI:N/SA:N"),
      ("bt", "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:N/SI:N/SA:N/E:P"),
      ("be", "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:N/SI:N/SA:N/MAV:L"),
      ("bte", "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:N/SI:N/SA:N/E:A/CR:M")
    ).toDF("name", "vs")
      .select(col("name"), CvssV4.nomenclatureOf(col("vs")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("b" -> "CVSS-B", "bt" -> "CVSS-BT",
      "be" -> "CVSS-BE", "bte" -> "CVSS-BTE"))
  }

  test("severity thresholds incl. boundaries and null") {
    val sp = spark; import sp.implicits._
    val got = Seq(Some(0.0), Some(0.1), Some(3.9), Some(4.0), Some(6.9),
        Some(7.0), Some(8.9), Some(9.0), Some(10.0), None)
      .toDF("s")
      .select(CvssV4.severityOf(col("s")).as("sev"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("NONE", "LOW", "LOW", "MEDIUM", "MEDIUM",
      "HIGH", "HIGH", "CRITICAL", "CRITICAL", null))
  }
}
