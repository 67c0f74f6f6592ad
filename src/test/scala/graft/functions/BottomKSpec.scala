package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BottomKSpec extends SparkSpec {

  test("bottom_k == window row_number formulation, across many partitions") {
    val sp = spark; import sp.implicits._
    val df = spark.range(0, 10000).repartition(16)
      .select(($"id" % 7).as("g"), xxhash64($"id").as("o"), $"id".as("p"))
    val viaAgg = df.groupBy($"g")
      .agg(BottomK.of($"o", $"p", 4).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"o", $"p")
    val viaWindow = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 4)
      .orderBy($"g", $"rn")
      .collect().groupBy(_.getLong(0))
      .map { case (g, rows) => g -> rows.map(_.getLong(2)).toList }
    assert(viaAgg === viaWindow)
  }

  test("bottom_k handles groups smaller than k and null inputs") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Some(5L), Some(50L)), (1L, Some(3L), Some(30L)),
      (1L, None, Some(99L)), (2L, Some(1L), None))
      .toDF("g", "o", "p")
    val out = df.groupBy($"g").agg(BottomK.of($"o", $"p", 10).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(out(1L) === List(30L, 50L)) // nulls skipped, sorted by order key
    assert(out(2L) === Nil)
  }

  test("bottom_k via SQL registration (GraftExtensions)") {
    val sp = spark; import sp.implicits._
    graft.plans.GraftExtensions.ensureAsOfStrategy(spark) // no-op, session warm
    val ext = new graft.plans.GraftExtensions
    // function registration route is covered in GraftExtensionsSpec's
    // session; here assert the expression itself resolves through agg
    val df = spark.range(100).select(($"id" % 3).as("g"), $"id".as("o"), $"id".as("p"))
    val n = df.groupBy($"g").agg(BottomK.of($"o", $"p", 2).as("ids"))
      .select(explode($"ids")).count()
    assert(n === 6)
  }
}
