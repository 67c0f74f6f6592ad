package graft.nvd

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CvssV2Spec extends SparkSpec {

  private def score(vs: String): Option[Double] = {
    val sp = spark; import sp.implicits._
    Option(Seq(vs).toDF("v").select(CvssV2.baseScoreOfVector($"v")).first().get(0))
      .map(_.asInstanceOf[Double])
  }

  test("baseScoreOfVector reproduces the spec's published v2 scores") {
    // classic NVD examples (CVSS v2 guide / NVD calculator values)
    assert(score("AV:N/AC:L/Au:N/C:P/I:P/A:P") === Some(7.5))
    assert(score("AV:N/AC:L/Au:N/C:C/I:C/A:C") === Some(10.0))
    assert(score("AV:L/AC:H/Au:N/C:C/I:C/A:C") === Some(6.2))
    assert(score("AV:N/AC:M/Au:N/C:P/I:N/A:N") === Some(4.3))
    assert(score("AV:L/AC:L/Au:N/C:N/I:N/A:P") === Some(2.1))
  }

  test("zero impact scores 0.0; unknown or absent metrics yield null, not a wrong score") {
    assert(score("AV:N/AC:L/Au:N/C:N/I:N/A:N") === Some(0.0))
    assert(score("AV:X/AC:L/Au:N/C:P/I:P/A:P") === None, "unknown letter")
    assert(score("AC:L/Au:N/C:P/I:P/A:P") === None, "missing AV")
    // the 1-letter metrics must not match inside AV:/AC:/Au: prefixes
    assert(score("AV:N/AC:L/Au:N/C:P/I:P") === None, "missing A is not satisfied by AV/AC/Au")
  }

  test("severity bands (NVD convention)") {
    val sp = spark; import sp.implicits._
    val r = Seq(0.0, 3.9, 4.0, 6.9, 7.0, 10.0).toDF("s")
      .select(CvssV2.severityOf($"s")).collect().map(_.getString(0)).toSeq
    assert(r === Seq("LOW", "LOW", "MEDIUM", "MEDIUM", "HIGH", "HIGH"))
  }

  private def tempEnv(vs: String): (Option[Double], Option[Double]) = {
    val sp = spark; import sp.implicits._
    val base = Seq("AV", "AC", "Au", "C", "I", "A")
    val multi = Seq("E", "RL", "RC", "CDP", "TD", "CR", "IR", "AR")
    val r = Seq(vs).toDF("v")
      .select(org.apache.spark.sql.functions.col("v") +:
        (base.map(n => CvssV2.vectorMetric($"v", n).as("__" + n)) ++
          multi.map(n => CvssV2.vectorMetricML($"v", n).as("__" + n))): _*)
      .select(
        CvssV2.temporalScoreOf(
          CvssV2.baseScoreOfLetters($"__AV", $"__AC", $"__Au", $"__C", $"__I", $"__A"),
          $"__E", $"__RL", $"__RC").as("t"),
        CvssV2.environmentalScoreOfLetters(
          $"__AV", $"__AC", $"__Au", $"__C", $"__I", $"__A",
          $"__E", $"__RL", $"__RC", $"__CDP", $"__TD", $"__CR", $"__IR", $"__AR").as("e"))
      .first()
    (Option(r.get(0)).map(_.asInstanceOf[Double]),
      Option(r.get(1)).map(_.asInstanceOf[Double]))
  }

  test("temporal: published example, ND/absent multipliers are 1.0, unknown letter is null") {
    // CVSS v2 guide example (CVE-2002-0392 temporal): base 7.8,
    // E:F/RL:OF/RC:C -> 7.8 * 0.95 * 0.87 * 1.0 = 6.4
    val (t, _) = tempEnv("AV:N/AC:L/Au:N/C:N/I:N/A:C/E:F/RL:OF/RC:C")
    assert(t === Some(6.4))
    // ND and absent both mean x1.0: temporal == base
    assert(tempEnv("AV:N/AC:L/Au:N/C:P/I:P/A:P/E:ND/RL:ND/RC:ND")._1 === Some(7.5))
    assert(tempEnv("AV:N/AC:L/Au:N/C:P/I:P/A:P")._1 === Some(7.5))
    // unknown temporal letter -> null, not a silently-unadjusted score
    assert(tempEnv("AV:N/AC:L/Au:N/C:P/I:P/A:P/E:Q")._1 === None)
  }

  test("environmental: TD:N zeroes, full-ND collapses to temporal, CR scales impact, null guard on min(10,.)") {
    // TD:N -> environmental 0 regardless of everything else
    assert(tempEnv("AV:N/AC:L/Au:N/C:C/I:C/A:C/CDP:H/TD:N")._2 === Some(0.0))
    // all env metrics ND: AdjImpact == Impact, CDP 0, TD 1 -> env == temporal
    val (t2, e2) = tempEnv("AV:N/AC:L/Au:N/C:P/I:P/A:P/E:F/RL:OF/RC:C")
    assert(e2 === t2)
    // hand-computed through the documented staging: AdjImpact =
    // 10.41*0.66 = 6.8706, Expl = 9.9968, AdjBase = round1(6.62108 *
    // 1.176) = 7.8, AdjTemporal = round1(7.8*0.95*0.87) = 6.4,
    // Env = round1(6.4 + 3.6*0.5) = 8.2
    val (_, eH) = tempEnv("AV:N/AC:L/Au:N/C:N/I:N/A:C/E:F/RL:OF/RC:C/CDP:H/TD:H/CR:M/IR:M/AR:M")
    assert(eH === Some(8.2))
    // CR:H raises the C contribution (1.51x): env strictly above the CR:L form
    val (_, eL) = tempEnv("AV:N/AC:L/Au:N/C:C/I:N/A:N/CDP:N/TD:H/CR:L")
    val (_, eHH) = tempEnv("AV:N/AC:L/Au:N/C:C/I:N/A:N/CDP:N/TD:H/CR:H")
    assert(eL.get < eHH.get)
    // unknown CDP letter -> null (the least(10,.) guard must not
    // swallow the null into a confident score)
    assert(tempEnv("AV:N/AC:L/Au:N/C:P/I:P/A:P/CDP:Q")._2 === None)
  }
}
