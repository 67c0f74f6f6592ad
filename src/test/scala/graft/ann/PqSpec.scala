package graft.ann

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PqSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("PQ encode: m codes per row, all within codebook range, deterministic") {
    val model = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    assert(model.m === 8 && model.subDim === 8)
    val codes = Pq.encode(emb, "embedding", model)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    val codes2 = Pq.encode(emb, "embedding", model)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes === codes2)
  }

  test("PQ ADC + re-rank: recall floor at small shortlist; exact at full shortlist") {
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val model = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    val encoded = Pq.encode(emb, "embedding", model)

    val bf = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // full shortlist => re-rank covers the corpus => exactly brute force
    val full = Pq.adcTopK(encoded, queries, "vec_id", "embedding", "qid", "qvec",
        model, k = 5, shortlist = n)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === bf, "shortlist = corpus must equal brute force")

    // small shortlist: approximate, but self-neighbors and a recall
    // floor must hold
    val short = Pq.adcTopK(encoded, queries, "vec_id", "embedding", "qid", "qvec",
        model, k = 5, shortlist = 50)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect short).size.toDouble / bf.size
    assert(recall >= 0.5, s"PQ ADC recall@5 with shortlist=50 degenerate: $recall")
  }
}
