package graft.nvd

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CVSS v3.1 vector-string parsing and base-score computation against
  * published scores (the spec's own rating examples / ubiquitous
  * real-feed vectors).
  */
class CvssV3Spec extends SparkSpec {

  private def scoreOf(vectors: String*): Seq[java.lang.Double] = {
    val sp = spark; import sp.implicits._
    vectors.toDF("vs")
      .select(CvssV3.baseScoreOfVector(col("vs")).as("s"))
      .collect().map(r => if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0)))
      .toSeq
  }

  test("base scores match published values") {
    assert(scoreOf(
      "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H", // the classic 9.8
      "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:C/C:H/I:H/A:H", // worst case
      "CVSS:3.1/AV:N/AC:L/PR:N/UI:R/S:C/C:L/I:L/A:N", // textbook XSS
      "CVSS:3.1/AV:N/AC:L/PR:L/UI:N/S:U/C:L/I:L/A:N",
      "CVSS:3.1/AV:L/AC:H/PR:H/UI:R/S:U/C:N/I:N/A:N", // no impact
      "CVSS:3.1/AV:L/AC:L/PR:L/UI:N/S:U/C:H/I:H/A:H"  // local privesc
    ) === Seq(9.8, 10.0, 6.1, 5.4, 0.0, 7.8))
  }

  test("v3.0 prefix parses identically; missing metrics yield null") {
    assert(scoreOf("CVSS:3.0/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H") === Seq(9.8))
    assert(scoreOf("CVSS:3.1/AV:N/AC:L") === Seq(null))
    assert(scoreOf("") === Seq(null))
    // Scope never enters the null web through the weight chains ('' or
    // an unknown letter just compares false to 'C'), so it needs its
    // own validity check — missing/invalid S must NOT score as
    // Scope:Unchanged
    assert(scoreOf(
      "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/C:H/I:H/A:H",
      "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:X/C:H/I:H/A:H") === Seq(null, null))
  }

  test("temporal score: degraded by E/RL/RC; absent or X weighs 1.0") {
    val sp = spark; import sp.implicits._
    def temporal(vs: String*): Seq[Double] = vs.toDF("vs")
      .select(CvssV3.temporalScoreOfVector(col("vs")).as("t"))
      .collect().map(_.getDouble(0)).toSeq
    val base = "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H" // 9.8
    assert(temporal(
      base + "/E:F/RL:O/RC:C", // 9.8*0.97*0.95 = 9.0307 -> 9.1
      base + "/E:X/RL:X/RC:X", // not-defined = 1.0
      base                      // absent = 1.0
    ) === Seq(9.1, 9.8, 9.8))
  }

  test("vectorParsed extracts the eight letters; CVSS: prefix never matches Scope") {
    val sp = spark; import sp.implicits._
    val r = Seq("CVSS:3.1/AV:A/AC:H/PR:L/UI:R/S:C/C:L/I:N/A:H").toDF("vs")
      .select(CvssV3.vectorParsed(col("vs")).as("p"))
      .select("p.av", "p.ac", "p.pr", "p.ui", "p.s", "p.c", "p.i", "p.a")
      .first()
    assert(r.toSeq === Seq("A", "H", "L", "R", "C", "L", "N", "H"))
  }

  test("environmental score: identity, requirement re-weighting, scope flip") {
    val sp = spark; import sp.implicits._
    def env(vs: String*): Seq[java.lang.Double] = {
      val names = Seq("AV", "AC", "PR", "UI", "S", "C", "I", "A",
        "MAV", "MAC", "MPR", "MUI", "MS", "MC", "MI", "MA",
        "CR", "IR", "AR", "E", "RL", "RC")
      val ls = names.map(n => CvssV3.vectorMetric(col("vs"), n))
      vs.toDF("vs")
        .select(CvssV3.environmentalScoreOf(
          ls(0), ls(1), ls(2), ls(3), ls(4), ls(5), ls(6), ls(7),
          ls(8), ls(9), ls(10), ls(11), ls(12), ls(13), ls(14), ls(15),
          ls(16), ls(17), ls(18), ls(19), ls(20), ls(21)).as("e"))
        .collect().map(r =>
          if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0)))
        .toSeq
    }
    val base = "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H" // 9.8
    // no modifications, X requirements: environmental == temporal
    assert(env(base, base + "/E:F/RL:O/RC:C",
      base + "/CR:X/IR:X/AR:X/MAV:X/MS:X") === Seq(9.8, 9.1, 9.8))
    // low security requirements re-weight the impact DOWN:
    // MISS = 1 - (1 - 0.5*0.56)^3 = 0.626752, impact 4.02375,
    // expl 3.88701 -> Roundup(7.91076) = 8.0
    assert(env(base + "/CR:L/IR:L/AR:L") === Seq(8.0))
    // Modified Scope flips the formula family (1.08 cap + the
    // (MISS*0.9731-0.02)^13 term): the 9.8 S:U vector saturates
    assert(env(base + "/MS:C") === Seq(10.0))
    // a missing base metric not supplied by its Modified twin -> null
    assert(env("CVSS:3.1/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H") === Seq(null))
  }

  test("environmentalScoreStaged equals the single-Column form value for value") {
    val sp = spark; import sp.implicits._
    val names = Seq("AV", "AC", "PR", "UI", "S", "C", "I", "A",
      "MAV", "MAC", "MPR", "MUI", "MS", "MC", "MI", "MA",
      "CR", "IR", "AR", "E", "RL", "RC")
    val base = "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H"
    val vectors = Seq(
      base, base + "/E:F/RL:O/RC:C", base + "/CR:X/IR:X/AR:X/MAV:X/MS:X",
      base + "/CR:L/IR:L/AR:L", base + "/MS:C",
      base + "/MS:C/MC:L/MI:N/MA:L/CR:H/E:P/RL:T/RC:U",
      base + "/MAV:P/MAC:H/MPR:H/MUI:R/MC:N/MI:N/MA:N", // mimpact <= 0 -> 0.0
      "CVSS:3.1/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H")        // null score
    val df = vectors.toDF("vs")
    val ls = names.map(n => CvssV3.vectorMetric(col("vs"), n))
    val col1 = df.select(col("vs"), CvssV3.environmentalScoreOf(
      ls(0), ls(1), ls(2), ls(3), ls(4), ls(5), ls(6), ls(7),
      ls(8), ls(9), ls(10), ls(11), ls(12), ls(13), ls(14), ls(15),
      ls(16), ls(17), ls(18), ls(19), ls(20), ls(21)).as("e"))
    val col2 = CvssV3.environmentalScoreStaged(df,
      ls(0), ls(1), ls(2), ls(3), ls(4), ls(5), ls(6), ls(7),
      ls(8), ls(9), ls(10), ls(11), ls(12), ls(13), ls(14), ls(15),
      ls(16), ls(17), ls(18), ls(19), ls(20), ls(21), out = "e")
      .select(col("vs"), col("e"))
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null
        else java.lang.Double.valueOf(r.getDouble(1)))).toMap
    assert(m(col1) === m(col2))
    // the staged frame exposes ONLY the requested output column
    assert(col2.columns.toSeq === Seq("vs", "e"))
  }

  test("roundup1 is the spec's integer-snapped ceiling") {
    val sp = spark; import sp.implicits._
    val vals = Seq(4.0, 4.02, 4.000001, 8.6 - 1e-9, 0.0).toDF("x")
      .select(CvssV3.roundup1(col("x")).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    // 4.000001 snaps DOWN to 4.0 (noise below 1e-5); 4.02 rounds up to
    // 4.1; 8.6-1e-9 snaps to 8.6 exactly
    assert(vals === Seq(4.0, 4.1, 4.0, 8.6, 0.0))
  }
}
