package graft

import org.apache.spark.sql.functions._

/** One-off phase probe for q212's steady serve (optimization r16). */
object Q212Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    SparkEntry.queries("q02_count_distinct")(spark, sf).count()
    try SparkEntry.queries("q212_neardup_takedown")(spark, sf).count()
    catch { case _: Throwable => }
    spark.catalog.clearCache()

    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(pmod($"doc_id", lit(4)) =!= 0)
    val delta = docs.filter(pmod($"doc_id", lit(4)) === 0)
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(sf.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_lshdrop_v1_$key"
    (1 to 2).foreach { i =>
      val h = time(s"run$i ensure") {
        graft.dedup.LshStore.ensure(corpus, "doc_id", "text", spark, path)
      }
      time(s"run$i remove") {
        h.remove(corpus.filter(pmod($"doc_id", lit(7)) === 0).select($"doc_id"))
      }
      val served = time(s"run$i serve") {
        val df = h.nearDupsOfDelta(delta, "text", minJaccard = 0.8)
        df.count(); df
      }
      println("PROBE route " + (if (served.queryExecution.analyzed
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
        "DRIVER" else "DISTRIBUTED"))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
