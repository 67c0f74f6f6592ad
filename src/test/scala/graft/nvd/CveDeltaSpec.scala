package graft.nvd

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CveDeltaSpec extends SparkSpec {

  test("diff classifies added/removed/modified/unchanged with field attribution") {
    val sp = spark; import sp.implicits._
    val old = Seq(
      ("CVE-1", 5.0, "a"), ("CVE-2", 6.0, "b"), ("CVE-3", 7.0, "c"))
      .toDF("cve_id", "score", "summary")
    val nu = Seq(
      ("CVE-2", 6.0, "b"),       // unchanged
      ("CVE-3", 9.8, "c2"),      // both fields change
      ("CVE-4", 1.0, "d"))       // added
    .toDF("cve_id", "score", "summary")
    val d = CveDelta.diff(old, nu, "cve_id", Seq("score", "summary"))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getSeq[String](2).toSet))).toMap
    assert(d("CVE-1") === (("removed", Set.empty[String])))
    assert(d("CVE-2") === (("unchanged", Set.empty[String])))
    assert(d("CVE-3") === (("modified", Set("score", "summary"))))
    assert(d("CVE-4") === (("added", Set.empty[String])))
  }

  test("null-safe comparison: null -> value is a change, null -> null is not") {
    val sp = spark; import sp.implicits._
    val old = Seq(("CVE-1", Option.empty[Double]), ("CVE-2", Option.empty[Double]))
      .toDF("cve_id", "score")
    val nu = Seq(("CVE-1", Option(3.0)), ("CVE-2", Option.empty[Double]))
      .toDF("cve_id", "score")
    val d = CveDelta.diff(old, nu, "cve_id", Seq("score"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d("CVE-1") === "modified")
    assert(d("CVE-2") === "unchanged")
  }
}
