package graft.ann

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OpqSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("eigenvalue allocation balances subspace variance products") {
    // strongly skewed spectrum: naive contiguous slicing would give
    // subspace 0 the four largest eigenvalues
    val v = Array(100.0, 50.0, 10.0, 5.0, 1.0, 0.5, 0.1, 0.05)
    val order = Opq.eigenvalueAllocation(v, m = 2)
    assert(order.sorted.sameElements(0 until 8))
    val products = order.grouped(4).map(_.map(i => math.log(v(i))).sum).toArray
    // balanced: the two log-products are far closer than the naive
    // contiguous split's (log-product gap there is ~11.4)
    assert(math.abs(products(0) - products(1)) < 5.0,
      s"allocation unbalanced: ${products.mkString(",")}")
  }

  test("rotation is orthonormal: encode+rerank at full shortlist equals brute force") {
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val model = Opq.train(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    // rotation rows orthonormal (eigenbasis permutation)
    val r = model.rotation
    for (i <- r.indices; j <- i until r.length) {
      val dot = r(i).zip(r(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"rotation rows $i,$j dot=$dot")
    }
    val bf = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 5)
      .select("query_id", "neighbor_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val full = Opq.adcTopK(Opq.encode(emb, "embedding", model), queries,
        "vec_id", "embedding", "qid", "qvec", model, k = 5, shortlist = n)
      .select("query_id", "neighbor_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(full === bf, "shortlist = corpus must equal brute force")
  }

  test("anisotropic corpus: OPQ beats plain PQ at equal code budget") {
    // planted LOW-RANK data — the case OPQ exists for: vectors live on
    // an 8-dim latent subspace expanded through a fixed dense 64x8
    // mixing matrix, so every raw dimension is correlated with every
    // other and plain PQ's contiguous subspaces each quantize the SAME
    // latent directions redundantly. The eigenbasis concentrates the
    // signal into 8 rotated dims and the allocation deals them across
    // subspaces.
    val rnd = new scala.util.Random(11)
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

    def recall(ids: Set[(Long, Long)]): Double =
      (bf intersect ids).size.toDouble / bf.size

    val pq = Pq.train(corpus, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    val pqIds = Pq.adcTopK(Pq.encode(corpus, "embedding", pq), queries,
        "vec_id", "embedding", "qid", "qvec", pq, k = 5, shortlist = 20)
      .select("query_id", "neighbor_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val opq = Opq.train(corpus, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    val opqIds = Opq.adcTopK(Opq.encode(corpus, "embedding", opq), queries,
        "vec_id", "embedding", "qid", "qvec", opq, k = 5, shortlist = 20)
      .select("query_id", "neighbor_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet

    val (rPq, rOpq) = (recall(pqIds), recall(opqIds))
    assert(rOpq > rPq, s"OPQ recall $rOpq must beat plain PQ $rPq on low-rank data")
    assert(rOpq >= 0.8, s"OPQ recall floor: $rOpq")
  }

  test("harness embeddings: OPQ recall at least matches PQ's floor") {
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val bf = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 5)
      .select("query_id", "neighbor_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val model = Opq.train(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    val got = Opq.adcTopK(Opq.encode(emb, "embedding", model), queries,
        "vec_id", "embedding", "qid", "qvec", model, k = 5, shortlist = 50)
      .select("query_id", "neighbor_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val recall = (bf intersect got).size.toDouble / bf.size
    assert(recall >= 0.5, s"OPQ recall@5 with shortlist=50 degenerate: $recall")
  }
}
