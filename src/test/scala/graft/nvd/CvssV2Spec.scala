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
}
