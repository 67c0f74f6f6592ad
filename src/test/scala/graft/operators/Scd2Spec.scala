package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2Spec extends SparkSpec {

  private def hist(rows: Seq[(Long, String, Long, Option[Long])]) = {
    val sp = spark; import sp.implicits._
    rows.toDF("id", "v", "valid_from", "valid_to")
  }

  test("merge transitions: unchanged stays open, change closes+reopens, delete closes, add opens") {
    val sp = spark; import sp.implicits._
    val h0 = Scd2.init(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), 0L)
    val snap1 = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("id", "v") // 3 deleted
    val h1 = Scd2.merge(h0, snap1, "id", Seq("v"), 1L)

    val rows = h1.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(rows === Set(
      (1L, "a", 0L, -1L),   // unchanged, original valid_from kept
      (2L, "b", 0L, 1L),    // closed old state
      (2L, "B2", 1L, -1L),  // new open state
      (3L, "c", 0L, 1L),    // deletion closes
      (4L, "d", 1L, -1L)))  // insertion opens

    // second merge folds another change; closed rows pass through
    val snap2 = Seq((1L, "a"), (2L, "B2"), (4L, "D3")).toDF("id", "v")
    val h2 = Scd2.merge(h1, snap2, "id", Seq("v"), 2L)
    val rows2 = h2.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(rows2 === Set(
      (1L, "a", 0L, -1L),
      (2L, "b", 0L, 1L), (2L, "B2", 1L, -1L),
      (3L, "c", 0L, 1L),
      (4L, "d", 1L, 2L), (4L, "D3", 2L, -1L)))
  }

  test("idempotence: re-merging the same snapshot at the same version is a no-op") {
    val sp = spark; import sp.implicits._
    val h0 = Scd2.init(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    val snap = Seq((1L, "a"), (2L, "b2")).toDF("id", "v")
    val h1 = Scd2.merge(h0, snap, "id", Seq("v"), 1L)
    val h1again = Scd2.merge(h1, snap, "id", Seq("v"), 1L)
    assert(h1again.exceptAll(h1).isEmpty && h1.exceptAll(h1again).isEmpty)
  }

  test("asOf time travel reconstructs each version exactly") {
    val sp = spark; import sp.implicits._
    val s0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val s1 = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("id", "v")
    val h = Scd2.merge(Scd2.init(s0, 0L), s1, "id", Seq("v"), 1L)
    assert(Scd2.asOf(h, 0L).exceptAll(s0).isEmpty && s0.exceptAll(Scd2.asOf(h, 0L)).isEmpty)
    assert(Scd2.asOf(h, 1L).exceptAll(s1).isEmpty && s1.exceptAll(Scd2.asOf(h, 1L)).isEmpty)
  }

  test("null payload transitions register as changes") {
    val sp = spark; import sp.implicits._
    val h0 = Scd2.init(Seq((1L, Option.empty[String])).toDF("id", "v"), 0L)
    val h1 = Scd2.merge(h0, Seq((1L, Some("x"))).toDF("id", "v"), "id", Seq("v"), 1L)
    val open = h1.filter(col("valid_to").isNull).collect()
    assert(open.length === 1 && open.head.getString(1) === "x")
    assert(h1.filter(col("valid_to") === 1L).count() === 1)
  }
}
