package graft.ml

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property-based checks of the learned-curation operators' defining
  * invariants over generated corpora (raw ScalaCheck generators with
  * fixed seeds — OperatorPropertySpec's convention).
  */
class MlPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(9410L + i)))

  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  test("NB: scores are partitioning-invariant and every doc gets every class exactly once") {
    val sp = spark; import sp.implicits._
    val docs = samples(textGen, 40).zipWithIndex
      .map { case (t, i) => (i.toLong, if (i % 2 == 0) "a" else "b", t) }
      .toDF("doc_id", "label", "text")
    val m = NaiveBayes.train(docs, "label", "text")
    val s1 = NaiveBayes.scores(m, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val m2 = NaiveBayes.train(docs.repartition(7), "label", "text")
    val s2 = NaiveBayes.scores(m2, docs.repartition(3), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(s1.keySet == s2.keySet)
    // integer counts -> identical logs regardless of partitioning; the
    // per-(doc,class) SUM order can differ, so compare to 1e-9
    s1.foreach { case (k, v) => assert(math.abs(v - s2(k)) < 1e-9, s"$k: $v vs ${s2(k)}") }
    assert(s1.count(_._1._2 == "a") == 40 && s1.size == 80)
    assert(s1.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("NB: confusion matrix counts partition the holdout exactly") {
    val sp = spark; import sp.implicits._
    val docs = samples(textGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, s"c${i % 3}", t) }
      .toDF("doc_id", "label", "text")
    val train = docs.filter(col("doc_id") % 4 =!= 0)
    val hold = docs.filter(col("doc_id") % 4 === 0)
    val m = NaiveBayes.train(train, "label", "text")
    val cm = NaiveBayes.confusion(m, hold, "doc_id", "text", "label")
    assert(cm.agg(sum("n")).head().getLong(0) == hold.count())
  }

  test("DSIR: log-weights are additive over document concatenation") {
    val sp = spark; import sp.implicits._
    val halves = samples(for { a <- textGen; b <- textGen } yield (a, b), 20)
      .zipWithIndex.filter { case ((a, b), _) => a.trim.nonEmpty && b.trim.nonEmpty }
    val target = Seq((900L, "target words target corpus words")).toDF("doc_id", "text")
    // pool contains each half AND the concatenation
    val pool = halves.flatMap { case ((a, b), i) =>
      Seq((i * 3L, a), (i * 3L + 1, b), (i * 3L + 2, a + " " + b))
    }.toDF("doc_id", "text")
    val ratio = Dsir.ratioTable(target, pool, "text")
    val w = Dsir.logWeights(pool, "doc_id", "text", ratio)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    halves.foreach { case (_, i) =>
      val (wa, wb, wab) = (w(i * 3L), w(i * 3L + 1), w(i * 3L + 2))
      assert(math.abs(wa + wb - wab) < 1e-9,
        s"additivity: $wa + $wb != $wab (case $i)")
    }
  }

  test("entropy bounds: 0 <= H <= ln(n_tokens), zero iff all tokens equal") {
    val sp = spark; import sp.implicits._
    import graft.functions.{TextFunctions => TF}
    val docs = (samples(textGen, 40).zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      Seq((1000L, "same same same same"), (1001L, "x")))
      .toDF("doc_id", "text")
    val tc = docs.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(TF.wsTokens(lower(col("text")))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
    val h = tc.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n"),
        (log(sum(col("cnt")) * lit(1.0)) -
          sum(col("cnt") * log(col("cnt") * lit(1.0))) / sum(col("cnt"))).as("ent"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    h.foreach { case (id, (n, ent)) =>
      assert(ent >= -1e-12, s"doc $id entropy $ent")
      assert(ent <= math.log(n.toDouble) + 1e-12, s"doc $id entropy $ent > ln($n)")
    }
    assert(math.abs(h(1000L)._2) < 1e-12, "uniform-repeat doc must have zero entropy")
    assert(math.abs(h(1001L)._2) < 1e-12, "single-token doc must have zero entropy")
  }

  test("LPA: pre-symmetrized edges with symmetrize=false equal the symmetrized run") {
    val sp = spark; import sp.implicits._
    val edges = samples(for {
      a <- Gen.chooseNum(0L, 30L); b <- Gen.chooseNum(0L, 30L) if a != b
    } yield (a, b), 50).toDF("a", "b")
    val both = edges.union(edges.select(col("b"), col("a")).toDF("a", "b"))
    val r1 = graft.operators.LabelPropagation.run(edges, "a", "b", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r2 = graft.operators.LabelPropagation
      .run(both, "a", "b", rounds = 3, symmetrize = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r2)
  }
}
