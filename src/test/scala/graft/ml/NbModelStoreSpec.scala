package graft.ml

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class NbModelStoreSpec extends SparkSpec {

  private def batch1 = {
    val sp = spark; import sp.implicits._
    Seq(
      (1L, "en", "the cat sat"), (2L, "en", "the dog barks"),
      (3L, "fr", "le chat dort")
    ).toDF("doc_id", "lang", "text")
  }
  private def batch2 = {
    val sp = spark; import sp.implicits._
    Seq(
      (4L, "fr", "le chien et le chat"), (5L, "en", "a cat and a dog"),
      (6L, "de", "der hund und die katze")
    ).toDF("doc_id", "lang", "text")
  }

  private def modelRows(m: NaiveBayes.Model): (Set[(String, String, Double)], Set[(String, Double, Double)]) = (
    m.tokenLogProb.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet,
    m.classStats.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet)

  test("create + append equals batch training on the union, bit for bit") {
    val dir = Files.createTempDirectory("nbstore").toString
    NbModelStore.create(spark, batch1, "lang", "text", dir)
    NbModelStore.append(spark, batch2, "lang", "text", dir)
    val incremental = modelRows(NbModelStore.model(spark, dir))
    val full = modelRows(NaiveBayes.train(batch1.unionByName(batch2), "lang", "text"))
    assert(incremental._1 == full._1, "token log-probs differ")
    assert(incremental._2 == full._2, "class stats differ")
  }

  test("append introduces a NEW class correctly (de arrives in batch 2)") {
    val dir = Files.createTempDirectory("nbstore2").toString
    NbModelStore.create(spark, batch1, "lang", "text", dir)
    NbModelStore.append(spark, batch2, "lang", "text", dir)
    val m = NbModelStore.model(spark, dir)
    val labels = m.classStats.collect().map(_.getString(0)).toSet
    assert(labels == Set("en", "fr", "de"))
  }

  test("served predictions from the store match the batch model") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("nbstore3").toString
    NbModelStore.create(spark, batch1, "lang", "text", dir)
    NbModelStore.append(spark, batch2, "lang", "text", dir)
    val test = Seq((10L, "the cat and dog"), (11L, "le chat"), (12L, "der hund"))
      .toDF("doc_id", "text")
    def preds(m: NaiveBayes.Model): Map[Long, String] =
      NaiveBayes.predict(m, test, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fromStore = preds(NbModelStore.model(spark, dir))
    val fromBatch = preds(NaiveBayes.train(batch1.unionByName(batch2), "lang", "text"))
    assert(fromStore == fromBatch)
    assert(fromStore(10L) == "en" && fromStore(11L) == "fr" && fromStore(12L) == "de")
  }

  test("two appends accumulate (second append of the same delta doubles its counts)") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("nbstore4").toString
    NbModelStore.create(spark, batch1, "lang", "text", dir)
    NbModelStore.append(spark, batch2, "lang", "text", dir)
    NbModelStore.append(spark, batch2, "lang", "text", dir)
    val counts = spark.read.parquet(s"$dir/counts")
    val katze = counts.filter(org.apache.spark.sql.functions.col("token") === "katze")
      .select("n").head().getLong(0)
    assert(katze == 2L)
  }
}
