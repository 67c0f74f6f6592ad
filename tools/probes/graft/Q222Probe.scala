package graft

import org.apache.spark.sql.functions._

/** One-off phase probe for q222's steady replay (optimization r16). */
object Q222Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    SparkEntry.queries("q02_count_distinct")(spark, sf).count()
    try SparkEntry.queries("q222_unified_forget")(spark, sf).count()
    catch { case _: Throwable => }
    spark.catalog.clearCache()

    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(sf.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val base = System.getProperty("java.io.tmpdir")
    (1 to 2).foreach { i =>
      val docs = Tables.documents(spark, sf)
      val lsh = time(s"run$i lsh-ensure") {
        graft.dedup.LshStore.ensure(docs, "doc_id", "text",
          spark, s"$base/graft_lsh_uf_v1_$key")
      }
      val ps = time(s"run$i postings-ensure") {
        graft.operators.PostingsStore.ensure(docs, "doc_id", "text",
          spark, s"$base/graft_postings_uf_v1_$key")
      }
      val g = time(s"run$i pairgraph-ensure") {
        graft.operators.PairGraphStore.ensure(
          graft.dedup.NGramJaccard.pairs(docs, "doc_id", "text", shingleN = 3,
            minJaccard = 0.5),
          "doc_a", "doc_b", Some("jaccard"), spark,
          s"$base/graft_pairgraph_uf_v1_$key")
      }
      val countsPath = s"$base/graft_coprestore_uf_v1_$key"
      val egPath = s"$base/graft_pairgraph_ufe_v1_$key"
      val feed = time(s"run$i feed-build") {
        docs.filter(pmod($"doc_id", lit(10)) === 1)
            .select(lit("doc").as("kind"), $"doc_id".cast("long").as("id"))
          .unionByName(Tables.events(spark, sf).select($"user_id").distinct()
            .filter(pmod($"user_id", lit(9)) === 0)
            .select(lit("actor").as("kind"), $"user_id".cast("long").as("id")))
      }
      time(s"run$i forget-docs-leg") {
        val canonDocs = feed.filter($"kind" === "doc").select($"id")
          .localCheckpoint()
        time(s"run$i   lsh.remove") { lsh.remove(canonDocs) }
        time(s"run$i   ps.remove") { ps.remove(canonDocs) }
        time(s"run$i   full-process-after-removes") {
          graft.streaming.StreamingTakedown.process(canonDocs, lsh, g, 4,
            postings = Some(ps))
        }
        time(s"run$i   autocompact-lsh") {
          graft.dedup.LshStore.autoCompact(lsh, 0.25) }
        time(s"run$i   autocompact-ps") {
          graft.operators.PostingsStore.autoCompact(ps, 0.25) }
        time(s"run$i   autocompact-graph") {
          graft.operators.PairGraphStore.autoCompact(g, 0.25) }
      }
      time(s"run$i forget-actors-leg") {
        val actors = feed.filter($"kind" === "actor").select($"id")
        graft.streaming.StreamingEventsGraph.processTakedown(actors,
          countsPath, egPath,
          events = Some(Tables.events(spark, sf).select($"user_id", $"ts")))
      }
      time(s"run$i bm25-search") {
        ps.bm25Search(Seq("vector", "stream", "window"), k = 20).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
