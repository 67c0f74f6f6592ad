package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DomainMixSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("balanceToSmallest: every group lands near the smallest group's size; deterministic") {
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = counts.values.min.toDouble
    val kept = DomainMix.balanceToSmallest(docs, "lang", "doc_id")
    val keptCounts = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    keptCounts.foreach { case (lang, n) =>
      // expectation is minN per group; hash-gating is binomial — allow
      // a wide band (4 sigma at n~70 is ~±25)
      assert(math.abs(n - minN) <= 30, s"$lang kept $n, expected ~$minN")
    }
    // the smallest group keeps everything (rate = 1)
    val smallest = counts.minBy(_._2)._1
    assert(keptCounts(smallest) === counts(smallest))
    // deterministic: same selection under a different partitioning
    val again = DomainMix.balanceToSmallest(docs.repartition(13), "lang", "doc_id")
    assert(kept.select("doc_id").exceptAll(again.select("doc_id")).isEmpty)
  }

  test("toWeights: kept shares track the requested mix; rate caps at 1") {
    val kept = DomainMix.toWeights(docs, "lang", "doc_id",
      Map("en" -> 1.0, "fr" -> 1.0, "de" -> 1.0, "es" -> 1.0, "zh" -> 1.0))
    val keptCounts = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // equal weights == balanceToSmallest semantics: every group ~ min
    val minN = docs.groupBy("lang").count().agg(min("count")).first().getLong(0).toDouble
    keptCounts.foreach { case (lang, n) =>
      assert(math.abs(n - minN) <= 30, s"$lang kept $n, expected ~$minN")
    }

    // skewed mix: en dominant — en keeps (near) everything, others shrink
    val skewed = DomainMix.toWeights(docs, "lang", "doc_id",
      Map("en" -> 10.0, "fr" -> 1.0, "de" -> 1.0, "es" -> 1.0, "zh" -> 1.0))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(skewed("en") === full("en"), "binding group keeps everything")
    assert(skewed("fr") < full("fr"))
  }

  test("toWeights excludes groups absent from the weights map (the map IS the mix)") {
    val kept = DomainMix.toWeights(docs, "lang", "doc_id",
      Map("en" -> 1.0, "fr" -> 1.0))
    val langs = kept.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs === Set("en", "fr"), s"unlisted groups must be excluded, got $langs")
  }

  test("repetitionGate passes empty/whitespace-only docs (nothing to repeat)") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "", "en", "s"),
      (2L, "   ", "en", "s"),
      (3L, ("spam " * 20).trim, "en", "s"),
      (4L, "a perfectly normal varied sentence here", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val kept = graft.pipeline.CorpusPipeline.repetitionGate(df, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 4L), s"got $kept")
  }

  test("toWeights rejects empty or non-positive weights") {
    intercept[IllegalArgumentException](
      DomainMix.toWeights(docs, "lang", "doc_id", Map.empty))
    intercept[IllegalArgumentException](
      DomainMix.toWeights(docs, "lang", "doc_id", Map("en" -> 0.0)))
  }
}
