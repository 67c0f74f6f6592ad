package graft

import org.apache.spark.sql.functions._

/** One-off phase probe for q226 (optimization r16). */
object Q226Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    SparkEntry.queries("q02_count_distinct")(spark, sf).count()
    try SparkEntry.queries("q226_ktruss_events")(spark, sf).count()
    catch { case e: Throwable => println("warm fail " + e) }
    spark.catalog.clearCache()
    (1 to 2).foreach { i =>
      time(s"run$i q226 full") {
        SparkEntry.queries("q226_ktruss_events")(spark, sf).count()
      }
      spark.catalog.clearCache()
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(sf.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val storePath =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_events600_v1_$key"
      val store = graft.operators.PairGraphStore.open(spark, storePath)
      val edges = time(s"run$i edges-checkpoint") {
        graft.operators.Partitioning.checkpointCompact(
          store.edges.select($"ua", $"ub"))
      }
      val isDelta = pmod($"ua" * 31 + $"ub", lit(5)) === 0
      val base = edges.filter(!isDelta)
      val delta = edges.filter(isDelta)
      val oldTruss = time(s"run$i kTruss") {
        val t = graft.operators.Truss.kTruss(base, "ua", "ub", k = 3)
        t.count(); t
      }
      time(s"run$i maintain") {
        graft.operators.Truss.maintainAfterInsert(
          oldTruss, base, delta, "ua", "ub", k = 3).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
