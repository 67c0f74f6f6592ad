package graft

import org.apache.spark.sql.functions._

/** Recall probe for the graph-ANN family: measures beam-walk recall@5
  * against brute force on the FULL and the KEPT (takedown) corpus at a
  * grid of (graphK, beam, hops) — the margin evidence behind q238/q239/
  * q240's served settings (see COVERAGE.md). */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val emb = Tables.load(spark, dir, "embeddings")
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    def recall(corpus: org.apache.spark.sql.DataFrame,
        graphK: Int, beam: Int, hops: Int): Double = {
      val graph = ann.GraphAnn.buildKnnGraph(corpus, "vec_id", "embedding", graphK)
      val got = ann.GraphAnn.topK(graph, corpus, qs, "vec_id", "embedding",
          "qid", "qvec", k = 5, beam = beam, maxHops = hops)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = ann.Ann.bruteForceTopK(corpus, qs, "vec_id", "embedding",
          "qid", "qvec", 5)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & want).size.toDouble / want.size
    }

    def recallApprox(graphK: Int, nBits: Int, tables: Int,
        beam: Int, hops: Int): Double = {
      val graph = ann.GraphAnn.buildKnnGraphApprox(emb, "vec_id", "embedding",
        graphK, nBits = nBits, tables = tables)
      val got = ann.GraphAnn.topK(graph, emb, qs, "vec_id", "embedding",
          "qid", "qvec", k = 5, beam = beam, maxHops = hops)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = ann.Ann.bruteForceTopK(emb, qs, "vec_id", "embedding",
          "qid", "qvec", 5)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & want).size.toDouble / want.size
    }
    if (args.length > 1 && args(1) == "walk") {
      // split the q238 cost: build vs walk, with job counts
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
      (1 to 2).foreach { i =>
        var t0 = System.nanoTime(); var j0 = jobs.get()
        val graph = ann.GraphAnn.buildKnnGraph(emb, "vec_id", "embedding", 10)
          .localCheckpoint()
        println(f"PROBE build$i ${(System.nanoTime() - t0) / 1e9}%.2f s jobs=${jobs.get() - j0}")
        t0 = System.nanoTime(); j0 = jobs.get()
        val n = ann.GraphAnn.topK(graph, emb, qs, "vec_id", "embedding",
          "qid", "qvec", k = 5, beam = 16, maxHops = 10).collect().length
        println(f"PROBE walk$i  ${(System.nanoTime() - t0) / 1e9}%.2f s jobs=${jobs.get() - j0} rows=$n")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "approx") {
      for (graphK <- Seq(10, 16); nBits <- Seq(4, 6, 8); tables <- Seq(8, 16))
        println(f"PROBE approx k=$graphK%-3d nBits=$nBits%-2d tables=$tables%-3d " +
          f"recall=${recallApprox(graphK, nBits, tables, beam = 16, hops = 10)}%.3f")
      spark.stop(); return
    }
    for (corpusTag <- Seq("full", "kept")) {
      val corpus = if (corpusTag == "full") emb
        else emb.filter(col("vec_id") % 7 =!= 0)
      for (graphK <- Seq(10, 16, 24); beam <- Seq(8, 16, 32); hops <- Seq(8, 12))
        println(f"PROBE $corpusTag%s k=$graphK%-3d beam=$beam%-3d hops=$hops%-3d recall=${recall(corpus, graphK, beam, hops)}%.3f")
    }
    spark.stop()
  }
}
