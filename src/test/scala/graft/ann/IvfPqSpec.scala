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

  test("raw-codebook mode (residual=false): exhaustive still exact, pruned keeps the floor") {
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val model = IvfPq.train(emb, "vec_id", "embedding", dim = 64, nlist = 8, m = 8, k = 16,
      residual = false)
    assert(!model.residual)
    val indexed = IvfPq.index(emb, "embedding", model)
    val bf = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = IvfPq.topK(indexed, queries, "vec_id", "embedding", "qid", "qvec",
        model, k = 5, nprobe = model.ivf.nlist, shortlist = n)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === bf)
    val approx = IvfPq.topK(indexed, queries, "vec_id", "embedding", "qid", "qvec",
        model, k = 5, nprobe = 4, shortlist = 50)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((bf intersect approx).size.toDouble / bf.size >= 0.5)
  }

  test("residual codebooks quantize tighter: ADC shortlist recall not worse than raw on a tiny shortlist") {
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val bf = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(residual: Boolean): Double = {
      val model = IvfPq.train(emb, "vec_id", "embedding", dim = 64, nlist = 8, m = 8, k = 16,
        residual = residual)
      val approx = IvfPq.topK(IvfPq.index(emb, "embedding", model), queries,
          "vec_id", "embedding", "qid", "qvec",
          model, k = 5, nprobe = 8, shortlist = 10)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf intersect approx).size.toDouble / bf.size
    }
    val (res, raw) = (recall(residual = true), recall(residual = false))
    // full probe + shortlist 10: ranking quality is pure ADC fidelity.
    // Residual quantization error is strictly smaller in aggregate; on
    // this corpus it must at least not LOSE recall vs raw codebooks.
    // The ABSOLUTE recall at shortlist 10 is bounded by the L2-vs-
    // cosine metric gap (ADC tables are squared-L2, ground truth is
    // cosine; the corpus is not normalized), not by quantization — so
    // the floor below is a degenerate-behavior guard, not a quality
    // bar (the recall-floor tests above use realistic shortlists).
    assert(res >= raw, s"residual recall $res < raw recall $raw")
    assert(res >= 0.3, s"residual ADC recall degenerate: $res")
  }
}
