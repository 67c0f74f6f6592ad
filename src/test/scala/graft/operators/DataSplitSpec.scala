package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DataSplitSpec extends SparkSpec {

  test("assign: proportions concentrate, assignment stable under corpus growth and layout") {
    val sp = spark; import sp.implicits._
    val cuts = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val docs = (1L to 10000L).toDF("doc_id")

    val a = DataSplit.assign(docs, "doc_id", cuts)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    // realized proportions within a binomial band
    val n = a.size.toDouble
    cuts.foreach { case (name, f) =>
      val got = a.values.count(_ == name) / n
      assert(math.abs(got - f) < 4 * math.sqrt(f * (1 - f) / n),
        s"$name: got $got, want ~$f")
    }

    // growth stability: the first 10k docs keep their split when the
    // corpus doubles (hash-range assignment never migrates rows)
    val grown = DataSplit.assign((1L to 20000L).toDF("doc_id").repartition(11),
        "doc_id", cuts)
      .filter($"doc_id" <= 10000).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(grown === a, "existing docs must not migrate when the corpus grows")

    // a different salt is a different (still complete) partition
    val b = DataSplit.assign(docs, "doc_id", cuts, salt = "other")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(b !== a)

    // invalid cut sets fail loud
    intercept[IllegalArgumentException](
      DataSplit.assign(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4)))
    intercept[IllegalArgumentException](
      DataSplit.assign(docs, "doc_id", Seq.empty))
    intercept[IllegalArgumentException](
      DataSplit.assign(docs, "doc_id", Seq("a" -> 0.5, "a" -> 0.4, "b" -> 0.1)))

    // null ids fail loud at evaluation (no stable split exists)
    val withNull = Seq(Some(1L), None).toDF("doc_id")
    intercept[Exception] {
      DataSplit.assign(withNull, "doc_id", cuts).collect()
    }
  }
}
