package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Serving-layer search operators: RRF fusion, MMR re-rank, snippets,
  * percolation (batch + streaming routes). */
class SearchOpsSpec extends SparkSpec {

  test("RrfFusion: integer-scaled scores, per-leg ranks, id tie-break") {
    val s = spark
    import s.implicits._
    val b = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rnk")
    val c = Seq((3L, 1), (4L, 2)).toDF("id", "rnk")
    val out = RrfFusion.fuse(Seq("bm25" -> b, "cos" -> c), "id", k = 60, topN = 10)
      .orderBy($"rnk").collect()

    def contrib(r: Int): Long = math.floor(1000000.0 / (60 + r) + 0.5).toLong
    // id 3 hits both legs; ids 2 and 4 tie at contrib(2) -> id order
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 1L, 2L, 4L))
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).getAs[Long]("rrf_score") == contrib(3) + contrib(1))
    assert(byId(1L).getAs[Long]("rrf_score") == contrib(1))
    assert(byId(2L).getAs[Long]("rrf_score") == contrib(2))
    assert(byId(4L).getAs[Long]("rrf_score") == contrib(2))
    assert(byId(3L).getAs[Long]("bm25_rnk") == 3L && byId(3L).getAs[Long]("cos_rnk") == 1L)
    assert(byId(1L).getAs[Long]("cos_rnk") == 0L) // absent leg = 0
  }

  test("RrfFusion: single leg preserves the leg's order") {
    val s = spark
    import s.implicits._
    val leg = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rnk")
    val out = RrfFusion.fuse(Seq("only" -> leg), "id", topN = 3)
      .orderBy($"rnk").select($"id").as[Long].collect()
    assert(out.toSeq == Seq(10L, 20L, 30L))
  }

  test("Snippets.firstMatch: window clamps at both text edges") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta vector gamma delta epsilon zeta"),
      (2L, "vector at start"),
      (3L, "no match here"),
      (4L, "x y z q vector")).toDF("doc_id", "text")
    val out = Snippets.firstMatch(docs, "doc_id", "text", "vector", window = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.keySet == Set(1L, 2L, 4L))
    assert(out(1L) == (3L, "alpha beta vector gamma delta epsilon"))
    assert(out(2L) == (1L, "vector at start"))
    assert(out(4L) == (5L, "y z q vector"))
  }

  private def registry = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Seq("vector", "stream")),
      (2L, Seq("hash", "table")),
      (3L, Seq("zzznotaterm"))).toDF("query_id", "terms")
  }

  test("Percolator: batch postings route == streaming-safe row route") {
    val docs = graft.Tables.load(spark, sf001, "documents")
    val a = Percolator.matchDocs(docs, "doc_id", "text", registry)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Percolator.matchStream(docs, "doc_id", "text", registry)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    assert(a.nonEmpty, "corpus should match some stored query")
    assert(!a.exists(_._2 == 3L), "impossible term must match nothing")
  }

  test("Percolator: streaming alerts fire per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val alerts = Percolator.matchStream(docs, "doc_id", "text", registry)
    val q = alerts.writeStream.format("memory")
      .queryName("perc_alerts").outputMode("append").start()
    try {
      in.addData((100L, "a Vector STREAM pipeline"), (101L, "hash join only"))
      q.processAllAvailable()
      in.addData((102L, "the hash table resize"))
      q.processAllAvailable()
      val got = spark.table("perc_alerts").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((100L, 1L), (102L, 2L)))
    } finally q.stop()
  }

  test("MmrRerank: greedy objective holds step-by-step (independent recheck)") {
    val emb = graft.Tables.load(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cands = graft.ann.Ann.bruteForceTopK(
        emb, queries, "vec_id", "embedding", "qid", "qvec", 30)
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding")),
        Seq("neighbor_id"))
      .select(col("neighbor_id").as("vec_id"), col("embedding"),
        col("cos").as("rel"))
    val lambda = 0.7
    val picks = MmrRerank.rerank(cands, "vec_id", "embedding", "rel",
        lambda = lambda, k = 8)
      .orderBy(col("rnk")).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))

    // independent model of the same candidates (own cosine code)
    val base = cands.collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      (r.getLong(0), if (n == 0) v else v.map(_ / n), r.getDouble(2))
    }
    def cosOf(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum

    val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
    for ((pickId, pickScore) <- picks) {
      val objective = base.filterNot(c => selected.contains(c._1)).map {
        case (id, v, rel) =>
          val red = if (selected.isEmpty) 0.0
          else selected.map(sid => cosOf(v, base.find(_._1 == sid).get._2)).max
          id -> (lambda * rel - (1 - lambda) * red)
      }.toMap
      val bestVal = objective.values.max
      assert(math.abs(objective(pickId) - bestVal) < 1e-9,
        s"pick $pickId is not argmax at step ${selected.size + 1}")
      assert(math.abs(pickScore - bestVal) < 1e-9)
      selected += pickId
    }
    // first pick must be the relevance argmax (redundancy term empty)
    assert(picks.head._1 == base.maxBy(c => (c._3, -c._1))._1)
  }

  test("MmrRerank: lambda=1 reduces to pure relevance order") {
    val s = spark
    import s.implicits._
    val cands = Seq(
      (1L, Seq(1.0f, 0.0f), 0.9),
      (2L, Seq(1.0f, 0.01f), 0.8),
      (3L, Seq(0.0f, 1.0f), 0.7)).toDF("id", "vec", "rel")
    val out = MmrRerank.rerank(cands, "id", "vec", "rel", lambda = 1.0, k = 3)
      .orderBy($"rnk").select($"id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }
}
