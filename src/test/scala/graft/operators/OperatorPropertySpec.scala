package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ann.ScalarQuant

/** Property-based checks of the round-7 operators' defining
  * invariants, evaluated over generated batches (raw ScalaCheck
  * generators with fixed seeds — same convention as
  * KernelPropertySpec).
  */
class OperatorPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7042L + i)))

  private val textGen: Gen[String] =
    Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
        1 -> Gen.oneOf('é', 'ß', '中', '.'))).map(_.mkString))

  test("Chunker: lossless reconstruction and full-size non-last chunks for arbitrary inputs") {
    val sp = spark; import sp.implicits._
    val cases = samples(for {
      t <- textGen
      size <- Gen.chooseNum(2, 64)
      overlap <- Gen.chooseNum(0, size - 1)
    } yield (t, size, overlap), 60)

    cases.zipWithIndex.groupBy { case ((_, s, o), _) => (s, o) }.foreach {
      case ((size, overlap), group) =>
        val docs = group.map { case ((t, _, _), i) => (i.toLong, t) }.toDF("doc_id", "text")
        val stride = size - overlap
        val chunks = Chunker.chunk(docs, chunkSize = size, overlap = overlap)
          .collect()
          .groupBy(_.getAs[Long]("doc_id"))
        group.foreach { case ((t, _, _), i) =>
          val rows = chunks(i.toLong).sortBy(_.getAs[Long]("chunk_idx"))
          // (1) every non-last chunk is exactly chunkSize characters
          rows.init.foreach(r =>
            assert(r.getAs[String]("chunk_text").length === size,
              s"non-last chunk short for len=${t.length} size=$size overlap=$overlap"))
          // (2) first `stride` chars of each chunk + last chunk rebuild the doc
          val rebuilt = rows.init.map(_.getAs[String]("chunk_text").take(stride)).mkString +
            rows.last.getAs[String]("chunk_text")
          assert(rebuilt === t, s"reconstruction failed at size=$size overlap=$overlap")
          // (3) n_chunks agrees with the row count
          assert(rows.length.toLong === rows.head.getAs[Long]("n_chunks"))
        }
    }
  }

  test("CorpusShuffle: input-order invariance, position contiguity, exact partition of ids") {
    val sp = spark; import sp.implicits._
    val idSets = samples(Gen.chooseNum(50, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 1000000L)).map(_.distinct)), 6)
    idSets.zipWithIndex.foreach { case (ids, i) =>
      val seed = s"p$i"
      val a = CorpusShuffle.assign(ids.toDF("doc_id"), "doc_id", 5, seed).collect()
        .map(r => (r.getLong(0), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
      val b = CorpusShuffle.assign(
          scala.util.Random.shuffle(ids).toDF("doc_id").repartition(7), "doc_id", 5, seed)
        .collect().map(r => (r.getLong(0), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
      assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq,
        "assignment must not depend on input order or physical layout")
      assert(a.map(_._1).toSet === ids.toSet, "every id appears exactly once")
      a.groupBy(_._2).values.foreach(rows =>
        assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq))
    }
  }

  test("ScalarQuant: codes are direction-only (power-of-two scale invariant) and bounded") {
    val sp = spark; import sp.implicits._
    val vecGen = Gen.chooseNum(2, 32).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000, 1000).map(_ / 16f)))
    val vecs = samples(vecGen, 50).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    // scaling by a power of two is exact in IEEE floats, so the code
    // arrays must be bit-identical: SQ8 codes encode direction only
    val base = ScalarQuant.quantize(vecs.toDF("vec_id", "embedding"), "embedding")
      .select($"vec_id", $"qvec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1).toList).toMap
    val scaled = ScalarQuant.quantize(
        vecs.map { case (i, v) => (i, v.map(_ * 4f)) }.toDF("vec_id", "embedding"), "embedding")
      .select($"vec_id", $"qvec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1).toList).toMap
    assert(base === scaled, "codes must be invariant under exact positive scaling")
    base.values.foreach(codes =>
      assert(codes.forall(c => c >= -127 && c <= 127), s"code out of range: $codes"))
  }
}
