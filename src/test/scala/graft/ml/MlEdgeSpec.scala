package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior of the learned-curation operators: empty
  * corpora, single rows, all-identical inputs — the shapes a pipeline
  * hits on day one (empty delta, one-document source) that must
  * degrade to empty/identity results, not throw. */
class MlEdgeSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "label", "text")
  }

  test("NB: empty training corpus yields an empty model; prediction over it is empty") {
    val empty = docs()
    val m = NaiveBayes.train(empty, "label", "text")
    assert(m.tokenLogProb.count() == 0 && m.classStats.count() == 0)
    val test = docs((1L, "x", "some text"))
    assert(NaiveBayes.predict(m, test.drop("label"), "doc_id", "text").count() == 0)
  }

  test("NB: single-class corpus predicts that class for everything") {
    val m = NaiveBayes.train(docs((1L, "only", "alpha beta")), "label", "text")
    val p = NaiveBayes.predict(m,
      docs((9L, "zz", "gamma delta")).drop("label"), "doc_id", "text")
    assert(p.collect().map(_.getString(1)).toSeq == Seq("only"))
  }

  test("DSIR: empty target still weights (pure pool smoothing); empty pool weights nothing") {
    val sp = spark; import sp.implicits._
    val pool = Seq((1L, "a b c"), (2L, "a a")).toDF("doc_id", "text")
    val emptyT = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val ratio = Dsir.ratioTable(emptyT, pool, "text")
    val w = Dsir.logWeights(pool, "doc_id", "text", ratio)
    assert(w.count() == 2)
    // with nt = 0 everywhere the ratio is a constant per token family;
    // weights are finite
    w.collect().foreach(r => assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    val w2 = Dsir.logWeights(emptyT, "doc_id", "text", ratio)
    assert(w2.count() == 0)
  }

  test("LPA: empty edges yield empty communities; a single self-contained pair works") {
    val sp = spark; import sp.implicits._
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.operators.LabelPropagation.run(none, "a", "b", rounds = 2).count() == 0)
    val pair = Seq((7L, 9L)).toDF("a", "b")
    val out = graft.operators.LabelPropagation.run(pair, "a", "b", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(7L -> 7L, 9L -> 7L))
  }

  test("EmbeddingOutliers: k larger than the group returns the whole group ranked") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, 0, Seq(1.0f, 0.0f)), (2L, 0, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val out = EmbeddingOutliers.outliers(df, "label", "vec_id", "embedding", k = 10)
    assert(out.count() == 2)
    assert(out.select(max("rank")).head().getInt(0) == 2)
  }

  test("PCA: identical vectors give a zero covariance matrix and zero Mahalanobis") {
    val sp = spark; import sp.implicits._
    val df = (1 to 5).map(i => (i.toLong, Seq(2.0f, -1.0f))).toDF("vec_id", "embedding")
    val st = Pca.fitStats(df, "embedding", 2)
    val c = st.covMatrix
    assert(c.flatten.forall(v => math.abs(v) < 1e-12))
    val m = Pca.fit(df, "embedding", 2, 2)
    // all variances ~0: every direction falls below the floor
    val ex = intercept[IllegalArgumentException] {
      Pca.mahalanobis(df, "embedding", m, minVar = 1e-9)
    }
    assert(ex.getMessage.contains("below minVar"))
  }

  test("SemanticContamination: empty eval flags nothing; disjoint spaces flag nothing") {
    val sp = spark; import sp.implicits._
    val train = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val emptyE = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(graft.dedup.SemanticContamination
      .exactReport(train, emptyE, "vec_id", "embedding", 0.5).count() == 0)
    val orth = Seq((9L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    assert(graft.dedup.SemanticContamination
      .exactReport(train, orth, "vec_id", "embedding", 0.5).count() == 0)
  }

  test("EmbeddingDrift: one empty side reports no common labels") {
    val sp = spark; import sp.implicits._
    val a = Seq((1L, 0, Seq(1.0f, 0.0f))).toDF("vec_id", "label", "embedding")
    val b = Seq.empty[(Long, Int, Seq[Float])].toDF("vec_id", "label", "embedding")
    assert(EmbeddingDrift.report(a, b, "label", "embedding").count() == 0)
  }
}
