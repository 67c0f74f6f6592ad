package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property-based checks of the codegen kernel ALGEBRA — the defining
  * identities each kernel must satisfy regardless of input, evaluated
  * in one Spark job per property over a generated batch (raw
  * ScalaCheck generators, fixed seeds — same convention as
  * CveFlattenPropertySpec).
  */
class KernelPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1042L + i)))

  private val tokensGen: Gen[List[String]] =
    Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)))

  private def sig(tokens: org.apache.spark.sql.Column) =
    graft.dedup.MinHashLSH.signatureOfHashes(
      transform(tokens, t => xxhash64(t)), 32)

  test("MinHash signature: sig(A ∪ B) is the elementwise min of sig(A), sig(B)") {
    val sp = spark; import sp.implicits._
    // the defining property of k-min hashing — what makes signatures
    // mergeable and the banding argument sound; checked black-box
    // against the production expression on 40 generated pairs
    val pairs = samples(for { a <- tokensGen; b <- tokensGen } yield (a, b), 40)
    val df = pairs.toDF("a", "b")
      .select(sig(col("a")).as("sa"), sig(col("b")).as("sb"),
        sig(concat(col("a"), col("b"))).as("sab"))
      .withColumn("ok", col("sab") === zip_with(col("sa"), col("sb"),
        (x, y) => least(x, y)))
    assert(df.filter(!col("ok")).count() === 0)
  }

  test("MinHash + SimHash signatures are multiset-order invariant") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    val toks = samples(tokensGen, 40)
    val df = toks.map(t => (t, rnd.shuffle(t))).toDF("a", "b")
      .select(
        (sig(col("a")) === sig(col("b"))).as("mh_ok"),
        (graft.dedup.SimHash.simhash(col("a")) ===
          graft.dedup.SimHash.simhash(col("b"))).as("sh_ok"))
    assert(df.filter(!col("mh_ok") || !col("sh_ok")).count() === 0)
  }

  test("ZOrder zValue is a bijection on the masked domain (deinterleave reconstructs)") {
    val sp = spark; import sp.implicits._
    val xy = samples(for {
      x <- Gen.chooseNum(0L, 1023L); y <- Gen.chooseNum(0L, 1023L)
    } yield (x, y), 60)
    val rows = xy.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.layout.ZOrder.zValue(Seq(col("x"), col("y")), 10).as("z"))
      .collect()
    rows.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val rx = (0 until 10).map(j => ((z >> (2 * j)) & 1L) << j).sum
      val ry = (0 until 10).map(j => ((z >> (2 * j + 1)) & 1L) << j).sum
      assert(rx === x && ry === y, s"deinterleave($z) = ($rx,$ry) != ($x,$y)")
    }
  }

  test("vector kernels: dot symmetric, norm nonneg, self-cosine 1 on nonzero vectors") {
    val sp = spark; import sp.implicits._
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-100, 100).map(_ / 10.0f))
      .suchThat(_.exists(_ != 0.0f)).map(_.toArray)
    val vs = samples(for { a <- vecGen; b <- vecGen } yield (a, b), 40)
    val df = vs.toDF("a", "b").select(
      (VectorFunctions.dot(col("a"), col("b")) ===
        VectorFunctions.dot(col("b"), col("a"))).as("sym"),
      (VectorFunctions.l2Norm(col("a")) >= 0.0).as("nn"),
      (abs(VectorFunctions.cosine(col("a"), col("a")) - 1.0) < 1e-6).as("self"))
    assert(df.filter(!col("sym") || !col("nn") || !col("self")).count() === 0)
  }

  test("winnow fingerprints are a subset of the doc's k-gram chain hashes; dup text shares all") {
    val sp = spark; import sp.implicits._
    val toks = samples(tokensGen.suchThat(_.size >= 8), 30)
    val df = toks.map(t => Tuple1(t)).toDF("t")
      .select(
        graft.dedup.WinnowFingerprints.of(col("t"), 4, 4).as("fp"),
        graft.dedup.WinnowFingerprints.of(concat(col("t"), col("t")), 4, 4).as("fp2"))
      // a doc's fingerprints survive into any superstring that
      // preserves its windows: doubling the token stream keeps every
      // original window, so fp ⊆ fp2 must hold for the FIRST copy's
      // interior selections — weaker but always-true form: fp2
      // contains at least one of fp's hashes (w+k-1 overlap guarantee)
      .withColumn("ok", arrays_overlap(col("fp"), col("fp2")))
    assert(df.filter(!col("ok")).count() === 0)
  }
}
