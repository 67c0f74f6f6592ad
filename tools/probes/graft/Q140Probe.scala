package graft

import org.apache.spark.sql.functions._

/** One-off phase probe for the q140/q212/q226 steady serves
  * (optimization round 16). */
object Q140Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    SparkEntry.queries("q02_count_distinct")(spark, sf).count()
    // converge stores (Bench warmup parity)
    Seq("q212_neardup_takedown", "q140_neardup_incremental").foreach { n =>
      try SparkEntry.queries(n)(spark, sf).count()
      catch { case _: Throwable => }
    }
    spark.catalog.clearCache()

    (1 to 2).foreach { i =>
      time(s"run$i q140 full") {
        SparkEntry.queries("q140_neardup_incremental")(spark, sf).count()
      }
      spark.catalog.clearCache()
      time(s"run$i q212 full") {
        SparkEntry.queries("q212_neardup_takedown")(spark, sf).count()
      }
      spark.catalog.clearCache()
      time(s"run$i q226 full") {
        SparkEntry.queries("q226_ktruss_events")(spark, sf).count()
      }
      spark.catalog.clearCache()
    }

    // q140 phases
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(pmod($"doc_id", lit(4)) =!= 0)
    val delta = docs.filter(pmod($"doc_id", lit(4)) === 0)
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(sf.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_lshstore_$key"
    val h = graft.dedup.LshStore.ensure(corpus, "doc_id", "text", spark, path)
    (1 to 2).foreach { i =>
      val gate = time(s"run$i q140 gate-count") {
        delta.select($"doc_id").count()
      }
      println(s"PROBE delta rows $gate")
      val base = time(s"run$i q140 base-kernel") {
        val b = graft.operators.Partitioning.spread(delta)
          .select($"doc_id".as("doc"),
            graft.dedup.ShingleHashes.of(
              graft.functions.TextFunctions.wsTokens(lower($"text")), 3).as("hsh"))
          .select($"doc", $"hsh",
            graft.dedup.MinHashLSH.signatureOfHashes($"hsh", 128, 42L).as("sig"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        b.count(); b
      }
      val deltaB = time(s"run$i q140 banded") {
        val d = graft.dedup.MinHashLSH.banded(
            base.select($"doc", $"sig"), 32, 4)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        d.count(); d
      }
      val cand = time(s"run$i q140 candidates") {
        val c0 = h.candidatePairsOfDelta(deltaB)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"PROBE cand rows ${c0.count()}"); c0
      }
      time(s"run$i q140 serve-via-api") {
        h.nearDupsOfDelta(delta, "text", minJaccard = 0.8).count()
      }
      base.unpersist(); deltaB.unpersist(); cand.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
