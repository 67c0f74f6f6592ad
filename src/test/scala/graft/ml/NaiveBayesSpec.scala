package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSpec {
  import NaiveBayes._

  private def fixture = {
    val sp = spark; import sp.implicits._
    Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog and the cat"),
      (3L, "en", "a dog in the house"),
      (4L, "fr", "le chat et le chien"),
      (5L, "fr", "le chien dans la maison"),
      (6L, "fr", "la maison et le chat")
    ).toDF("doc_id", "lang", "text")
  }

  test("train: smoothed log-probs and priors are the closed-form values") {
    val m = train(fixture, "lang", "text")
    val stats = m.classStats.collect().map(r =>
      r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // 3 docs per class of 6 total
    assert(math.abs(stats("en")._1 - math.log(0.5)) < 1e-12)
    assert(math.abs(stats("fr")._1 - math.log(0.5)) < 1e-12)
    // en tokens: 6+5+5=16 total; joint vocab: count distinct across both
    val v = m.tokenLogProb.select("token").distinct().count()
    val theCnt = m.tokenLogProb
      .filter(col("token") === "the" && col("label") === "en")
      .select("log_prob").head().getDouble(0)
    assert(math.abs(theCnt - math.log(6.0 / (16 + v))) < 1e-12,
      s"p(the|en) should be (5+1)/(16+|V|=$v)")
    assert(math.abs(stats("en")._2 - math.log(1.0 / (16 + v))) < 1e-12)
  }

  test("predict: class-marker tokens dominate; OOV-only doc falls back to prior tie-break") {
    val sp = spark; import sp.implicits._
    val m = train(fixture, "lang", "text")
    val test = Seq(
      (10L, "the cat and the dog"),   // en markers
      (11L, "le chien et la maison"), // fr markers
      (12L, "zzz qqq www"),           // fully OOV -> prior-only -> tie -> label desc
      (13L, "   ")                    // empty -> prior-only too
    ).toDF("doc_id", "text")
    val pred = predict(m, test, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(10L) == "en")
    assert(pred(11L) == "fr")
    // equal priors: deterministic (score desc, label desc) tie-break
    assert(pred(12L) == "fr")
    assert(pred(13L) == "fr")
  }

  test("scores: every doc scores every class exactly once") {
    val sp = spark; import sp.implicits._
    val m = train(fixture, "lang", "text")
    val test = Seq((20L, "the cat"), (21L, "")).toDF("doc_id", "text")
    val s = scores(m, test, "doc_id", "text")
    assert(s.count() == 4)
    assert(s.groupBy("doc_id").count().filter(col("count") =!= 2).count() == 0)
  }

  test("a token-free class keeps its prior and stays predictable") {
    val sp = spark; import sp.implicits._
    // class "empty" has priors rows (3 docs) but zero token counts —
    // an inner classTot join would silently drop it from the model
    val docs = Seq(
      (1L, "empty", ""), (2L, "empty", "   "), (3L, "empty", "\t"),
      (4L, "en", "hello world hello")
    ).toDF("doc_id", "lang", "text")
    val m = train(docs, "lang", "text")
    val stats = m.classStats.collect().map(r =>
      r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(stats.keySet == Set("empty", "en"), s"classes: ${stats.keySet}")
    // prior survives at ln(3/4); unseen smoothing is ln(1/(0+|V|)), |V|=2
    assert(math.abs(stats("empty")._1 - math.log(3.0 / 4.0)) < 1e-12)
    assert(math.abs(stats("empty")._2 - math.log(1.0 / 2.0)) < 1e-12)
    // an OOV doc is prior-only and the majority (token-free) class wins
    val pred = predict(m, Seq((10L, "zzz qqq")).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(pred.length == 1 && pred(0).getString(1) == "empty")
  }

  test("confusion on the harness data is a total partition of the holdout") {
    val docs = graft.Tables.documents(spark, sf001)
    val holdout = docs.filter(col("doc_id") % 5 === 0)
    val m = train(docs.filter(col("doc_id") % 5 =!= 0), "lang", "text")
    val cm = confusion(m, holdout, "doc_id", "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // every holdout doc is classified exactly once...
    assert(cm.values.sum == holdout.count())
    // ...into a training label. (The harness text is random words with
    // no lang correlation, so ACCURACY is chance by construction — the
    // oracle checks the model's arithmetic, not the corpus's signal.)
    val trainLabels = docs.filter(col("doc_id") % 5 =!= 0)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(cm.keySet.map(_._2).subsetOf(trainLabels))
  }
}
