package graft.ann

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfPqSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("exhaustive setting degenerates to exact brute force") {
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val model = IvfPq.train(emb, "vec_id", "embedding", dim = 64, nlist = 8, m = 8, k = 16)
    val indexed = IvfPq.index(emb, "embedding", model)

    val bf = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = IvfPq.topK(indexed, queries, "vec_id", "embedding", "qid", "qvec",
        model, k = 5, nprobe = model.ivf.nlist, shortlist = n)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === bf, "nprobe = nlist + shortlist = corpus must equal brute force")
  }

  test("pruned probe keeps a recall floor and always finds the self-neighbor") {
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val model = IvfPq.train(emb, "vec_id", "embedding", dim = 64, nlist = 8, m = 8, k = 16)
    val indexed = IvfPq.index(emb, "embedding", model)

    val bf = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = IvfPq.topK(indexed, queries, "vec_id", "embedding", "qid", "qvec",
        model, k = 5, nprobe = 4, shortlist = 50)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect approx).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF-PQ recall@5 (nprobe=4/8, shortlist=50) degenerate: $recall")
    // a query's own vector is in its nearest cell with ADC distance ~0:
    // the self-pair must always survive
    (0L until 10L).foreach(q => assert(approx.contains((q, q)), s"query $q lost itself"))
  }
}
