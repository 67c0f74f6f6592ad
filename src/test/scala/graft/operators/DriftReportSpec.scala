package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DriftReportSpec extends SparkSpec {

  test("profile: one-pass metrics match independent aggregates on the real corpus") {
    val sp = spark; import sp.implicits._
    val docs = graft.Tables.documents(spark, sf001)
    val p = DriftReport.profile(docs, Seq("n_chars"), Seq("lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val n = docs.count().toDouble
    assert(p(("n_chars", "n")) === n)
    assert(p(("n_chars", "null_frac")) === 0.0)
    val mean = docs.agg(round(avg($"n_chars".cast("double")), 6)).first().getDouble(0)
    assert(p(("n_chars", "mean")) === mean)
    assert(p(("lang", "n_distinct")) ===
      docs.select($"lang").distinct().count().toDouble)
    // profile is ONE job over one scan: exactly 8 rows for 1 numeric + 1 categorical
    assert(p.size === 8)
  }

  test("compare: identical snapshots -> zero drift; planted shifts flagged") {
    val sp = spark; import sp.implicits._
    val docs = graft.Tables.documents(spark, sf001)
    val same = DriftReport.compare(docs, docs, Seq("n_chars"), Seq("lang"), 0.01)
    assert(same.filter($"drifted" === 1).isEmpty)
    assert(same.filter($"rel_delta" =!= 0.0).isEmpty)

    // drop half the rows and null out a language: n and null_frac drift
    val after = docs.filter($"doc_id" % 2 === 0)
      .withColumn("lang", when($"lang" === "en", lit(null: String)).otherwise($"lang"))
    val cmp = DriftReport.compare(docs, after, Seq("n_chars"), Seq("lang"), 0.1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(4), r.getInt(5))).toMap
    assert(cmp(("n_chars", "n"))._2 === 1)
    assert(cmp(("lang", "null_frac"))._2 === 1)
    assert(cmp(("lang", "n_distinct"))._2 === 1) // en vanished
  }

  test("null handling: all-null numeric column profiles without NaN poisoning") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, Option.empty[Double]), (2L, None)).toDF("id", "x")
    val p = DriftReport.profile(df, Seq("x"), Nil)
      .collect().map(r => r.getString(1) -> (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(p("n") === 0.0)
    assert(p("null_frac") === 1.0)
    assert(p("mean") === null) // avg of no rows is NULL, not NaN
  }
}
