package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {

  test("diff statuses: added/removed/changed/unchanged, null payload transitions") {
    val sp = spark; import sp.implicits._
    val before = Seq(
      (1L, Some("a"), Some("x")),
      (2L, Some("b"), Some("y")),
      (3L, Some("c"), Option.empty[String]),
      (4L, Some("d"), Some("z")))
      .toDF("id", "p1", "p2")
    val after = Seq(
      (1L, Some("a"), Some("x")),    // unchanged
      (2L, Some("B"), Some("y")),    // changed (p1)
      (3L, Some("c"), Some("now")),  // changed (null -> value)
      (5L, Some("e"), Some("w")))    // added; 4 removed
      .toDF("id", "p1", "p2")
    val byId = SnapshotDiff.diff(before, after, "id", Seq("p1", "p2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId === Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("column-boundary safety: shifting content between columns registers as changed") {
    val sp = spark; import sp.implicits._
    val before = Seq((1L, "a b", "")).toDF("id", "p1", "p2")
    val after = Seq((1L, "a", "b")).toDF("id", "p1", "p2")
    val st = SnapshotDiff.diff(before, after, "id", Seq("p1", "p2"))
      .first().getString(1)
    assert(st === "changed")
  }

  test("summary counts match diff on the real corpus; identity diff is all-unchanged") {
    val sp = spark; import sp.implicits._
    val docs = graft.Tables.documents(spark, sf001).select($"doc_id", $"text")
    val same = SnapshotDiff.summary(docs, docs, "doc_id", Seq("text")).collect()
    assert(same.length === 1 && same.head.getString(0) === "unchanged"
      && same.head.getLong(1) === docs.count())

    val after = docs.filter($"doc_id" % 2 === 0)
    val counts = SnapshotDiff.summary(docs, after, "doc_id", Seq("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("removed") === docs.filter($"doc_id" % 2 =!= 0).count())
    assert(counts("unchanged") === after.count())
    assert(!counts.contains("added") && !counts.contains("changed"))
  }
}
