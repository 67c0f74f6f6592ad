package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("backward as-of join: latest right row at or before each left time") {
    val sp = spark; import sp.implicits._
    val left = Seq(
      (1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"),
      (2L, 100L, "p3")).toDF("k", "t", "pid")
    val right = Seq(
      (1L, 10L, "q@10"), (1L, 15L, "q@15"), (1L, 1L, "q@1"),
      (3L, 50L, "q-other")).toDF("k", "rt", "quote")
    val out = AsOfJoin.asofBackward(left, right, Seq("k"), "t", "rt", Seq("quote"))
      .collect().map(r => (r.getAs[String]("pid"), r.getAs[String]("quote"))).toMap
    assert(out("p0") === "q@1")   // strictly-before match
    assert(out("p1") === "q@10")  // tie: <= semantics, equal timestamp matches
    assert(out("p2") === "q@15")  // latest among several
    assert(out("p3") === null)    // key with no right rows => null
  }

  test("native AsOfJoinExec matches the composed form on the unit fixture") {
    val sp = spark; import sp.implicits._
    val left = Seq(
      (1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"),
      (2L, 100L, "p3")).toDF("k", "t", "pid")
    val right = Seq(
      (1L, 10L, "q@10"), (1L, 15L, "q@15"), (1L, 1L, "q@1"),
      (3L, 50L, "q-other")).toDF("k", "rt", "quote")
    val out = AsOfJoin.asofBackwardExec(left, right, Seq("k"), "t", "rt", Seq("quote"))
      .collect().map(r => (r.getAs[String]("pid"), r.getAs[String]("quote"))).toMap
    assert(out === Map("p0" -> "q@1", "p1" -> "q@10", "p2" -> "q@15", "p3" -> null))
    // the custom operator actually planned (not a fallback)
    val phys = AsOfJoin.asofBackwardExec(left, right, Seq("k"), "t", "rt", Seq("quote"))
      .queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), phys)
  }

  test("native AsOfJoinExec == composed form on events data (self-join attributes)") {
    val ev = graft.Tables.events(spark, sf001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"))
    val composed = AsOfJoin.asofBackward(purchases, clicks,
      Seq("user_id"), "ts", "cts", Seq("click_id"))
      .collect().map(r => (r.getLong(0), Option(r.get(3)))).toMap
    val native = AsOfJoin.asofBackwardExec(purchases, clicks,
      Seq("user_id"), "ts", "cts", Seq("click_id"))
      .collect().map(r => (r.getLong(0), Option(r.get(3)))).toMap
    assert(native === composed)
    assert(native.nonEmpty)
  }

  test("native as-of join: NON-NULLABLE right payload still yields NULL on no-match") {
    val sp = spark; import sp.implicits._
    // count() produces a non-nullable column — the unmatched-left
    // placeholder must surface as NULL, not 0 (regression: nullability
    // was taken from the input attr, skipping the null check)
    val left = Seq((1L, 10L, "hit"), (2L, 10L, "miss")).toDF("k", "t", "pid")
    val right = Seq((1L, 5L, "x"), (1L, 6L, "y")).toDF("k", "rt", "v")
      .groupBy($"k").agg(max($"rt").as("rt"), count(lit(1)).as("n"))
      .select($"k", $"rt", $"n")
    val out = AsOfJoin.asofBackwardExec(left, right, Seq("k"), "t", "rt", Seq("n"))
      .collect().map(r => (r.getAs[String]("pid"), Option(r.get(3)))).toMap
    assert(out("hit") === Some(2L))
    assert(out("miss") === None)
  }

  test("NULL right time never matches (both forms)") {
    val sp = spark; import sp.implicits._
    val left = Seq((1L, 10L, "p")).toDF("k", "t", "pid")
    val right = Seq((1L, Option(5L), "real"), (1L, Option.empty[Long], "ghost"))
      .toDF("k", "rt", "quote")
    for (form <- Seq(
        AsOfJoin.asofBackward(left, right, Seq("k"), "t", "rt", Seq("quote")),
        AsOfJoin.asofBackwardExec(left, right, Seq("k"), "t", "rt", Seq("quote")))) {
      val out = form.collect().map(r => r.getAs[String]("quote"))
      assert(out.toSeq === Seq("real"))
    }
    // ONLY a null-time right row => no match at all
    val rightOnlyNull = Seq((1L, Option.empty[Long], "ghost")).toDF("k", "rt", "quote")
    for (form <- Seq(
        AsOfJoin.asofBackward(left, rightOnlyNull, Seq("k"), "t", "rt", Seq("quote")),
        AsOfJoin.asofBackwardExec(left, rightOnlyNull, Seq("k"), "t", "rt", Seq("quote")))) {
      assert(form.collect().map(r => r.getAs[String]("quote")).toSeq === Seq(null))
    }
  }

  test("native as-of join: null keys never match") {
    val sp = spark; import sp.implicits._
    val left = Seq((Option(1L), 10L, "a"), (Option.empty[Long], 10L, "b"))
      .toDF("k", "t", "pid")
    val right = Seq((Option(1L), 5L, "r1"), (Option.empty[Long], 5L, "rnull"))
      .toDF("k", "rt", "quote")
    val out = AsOfJoin.asofBackwardExec(left, right, Seq("k"), "t", "rt", Seq("quote"))
      .collect().map(r => (r.getAs[String]("pid"), r.getAs[String]("quote"))).toMap
    assert(out("a") === "r1")
    assert(out("b") === null)
  }

  test("native as-of join equals composed form on randomized keys/times") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    val left = (0 until 2000).map(i =>
      (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong)).toDF("lid", "k", "t")
    // distinct (k, rt) pairs so ties can't make "latest right row" ambiguous
    val right = rnd.shuffle((0 until 30000).toList).take(1500)
      .map(x => (x.toLong % 20, (x / 20).toLong, s"p$x")).distinct
      .toDF("k", "rt", "payload")
    val composed = AsOfJoin.asofBackward(left, right, Seq("k"), "t", "rt", Seq("payload"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("payload")).toMap
    val native = AsOfJoin.asofBackwardExec(left, right, Seq("k"), "t", "rt", Seq("payload"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("payload")).toMap
    assert(native.size === 2000)
    assert(native === composed)
  }

  test("as-of join preserves left row count exactly") {
    val ev = graft.Tables.events(spark, sf001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"))
    val n = purchases.count()
    val joined = AsOfJoin.asofBackward(purchases, clicks, Seq("user_id"), "ts", "cts", Seq("click_id"))
    assert(joined.count() === n)
  }
}
