package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class PrefixSumSpec extends SparkSpec {

  test("runningTotal == single-partition window (long values, many buckets)") {
    val sp = spark; import sp.implicits._
    // deterministic pseudo-random values over a shuffled key order,
    // spread across several input partitions
    val df = (0 until 5000)
      .map(i => ((i * 2654435761L) % 10007, (i % 97).toLong))
      .toDF("k", "v")
      .repartition(8)
    val naive = df.withColumn("cum",
      sum($"v").over(Window.orderBy($"k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val dist = PrefixSum.runningTotal(df, "k", Nil, $"v", "cum", buckets = 16)
    assert(dist.exceptAll(naive).isEmpty && naive.exceptAll(dist).isEmpty)
    assert(dist.count() === 5000L)
  }

  test("runningTotal doubles + null values match window semantics") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Option.empty[Double]), // leading null -> null cum until first value
      (2L, Some(1.5)), (3L, Some(2.25)), (4L, None), (5L, Some(4.0)))
      .toDF("k", "v")
    val naive = df.withColumn("cum",
      sum($"v").over(Window.orderBy($"k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val dist = PrefixSum.runningTotal(df, "k", Nil, $"v", "cum", buckets = 3)
    assert(dist.exceptAll(naive).isEmpty && naive.exceptAll(dist).isEmpty)
  }

  test("runningTotal with tie-break column is the window's total order") {
    val sp = spark; import sp.implicits._
    // duplicate order keys disambiguated by id — a true total order
    val df = (0 until 600).map(i => (i % 7, i.toLong, 1L)).toDF("k", "id", "v")
    val naive = df.withColumn("cum",
      sum($"v").over(Window.orderBy($"k", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val dist = PrefixSum.runningTotal(df, "k", Seq($"id"), $"v", "cum", buckets = 4)
    assert(dist.exceptAll(naive).isEmpty && naive.exceptAll(dist).isEmpty)
  }

  test("runningTotal edges: empty input, single bucket") {
    val sp = spark; import sp.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(PrefixSum.runningTotal(empty, "k", Nil, $"v", "cum").count() === 0L)
    val one = Seq((1L, 10L), (2L, 5L)).toDF("k", "v")
    val out = PrefixSum.runningTotal(one, "k", Nil, $"v", "cum", buckets = 1)
      .orderBy($"k").select($"cum").as[Long].collect()
    assert(out.toSeq === Seq(10L, 15L))
  }

  test("runningTotal plan: no single-partition window over the data") {
    val sp = spark; import sp.implicits._
    val df = (0 until 2000).map(i => (i.toLong, 1L)).toDF("k", "v")
    val dist = PrefixSum.runningTotal(df, "k", Nil, $"v", "cum", buckets = 8)
    val plan = dist.queryExecution.executedPlan.toString
    // the window must be partitioned by the range bucket, never global
    assert(plan.contains("__bucket"))
    assert(!plan.contains("SinglePartition"))
  }
}
