package graft.ann

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfOpqSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("exhaustive setting degenerates to brute force through the rotation") {
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val model = IvfOpq.train(emb, "vec_id", "embedding",
      dim = 64, nlist = 16, m = 8, k = 16)
    val bf = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 5)
      .select("query_id", "neighbor_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val full = IvfOpq.topK(IvfOpq.index(emb, "embedding", model), queries,
        "vec_id", "embedding", "qid", "qvec", model,
        k = 5, nprobe = 16, shortlist = n)
      .select("query_id", "neighbor_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(full === bf, "nprobe = nlist + unbounded shortlist must equal brute force")
  }

  test("pruned setting: recall floor with self-neighbor guarantee") {
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val model = IvfOpq.train(emb, "vec_id", "embedding",
      dim = 64, nlist = 16, m = 8, k = 16)
    val bf = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 5)
      .select("query_id", "neighbor_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val got = IvfOpq.topK(IvfOpq.index(emb, "embedding", model), queries,
        "vec_id", "embedding", "qid", "qvec", model,
        k = 5, nprobe = 4, shortlist = 100)
      .select("query_id", "neighbor_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val recall = (bf intersect got).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF-OPQ recall@5 degenerate: $recall")
    // a query vector IS in the corpus: its own cell is always the
    // nearest probe and its ADC distance ~0 — self must be found
    assert((0L until 10L).forall(q => got.contains((q, q))), "self-neighbor lost")
  }

  test("anisotropic corpus: IVF-OPQ recall at least matches plain IVF-PQ") {
    val rnd = new scala.util.Random(13)
    val mix = Array.fill(64, 8)(rnd.nextGaussian())
    val rows = (0 until 400).map { i =>
      val z = Array.fill(8)(rnd.nextGaussian())
      val x = mix.map(row => row.zip(z).map { case (a, b) => a * b }.sum
        + rnd.nextGaussian() * 0.01)
      (i.toLong, x.map(_.toFloat).toSeq)
    }
    val sp = spark; import sp.implicits._
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val bf = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", "qid", "qvec", 5)
      .select("query_id", "neighbor_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    def recall(ids: Set[(Long, Long)]) = (bf intersect ids).size.toDouble / bf.size

    val plain = IvfPq.train(corpus, "vec_id", "embedding", dim = 64, nlist = 8, m = 8, k = 16)
    val rPlain = recall(IvfPq.topK(IvfPq.index(corpus, "embedding", plain), queries,
        "vec_id", "embedding", "qid", "qvec", plain, k = 5, nprobe = 2, shortlist = 20)
      .select("query_id", "neighbor_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet)
    val opq = IvfOpq.train(corpus, "vec_id", "embedding", dim = 64, nlist = 8, m = 8, k = 16)
    val rOpq = recall(IvfOpq.topK(IvfOpq.index(corpus, "embedding", opq), queries,
        "vec_id", "embedding", "qid", "qvec", opq, k = 5, nprobe = 2, shortlist = 20)
      .select("query_id", "neighbor_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet)
    assert(rOpq >= rPlain - 0.05,
      s"IVF-OPQ recall $rOpq fell materially below plain IVF-PQ $rPlain")
    assert(rOpq >= 0.6, s"IVF-OPQ recall floor on low-rank data: $rOpq")
  }
}
