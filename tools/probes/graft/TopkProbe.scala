package graft
import org.apache.spark.sql.functions._
object TopkProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val dir = "/root/testdata/sf0.1"
    val emb = Tables.load(spark, dir, "embeddings")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def run(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 4).foreach { i =>
        val j0 = jobs.get(); val t0 = System.nanoTime()
        val n = f.collect().length
        println(f"PROBE $tag run$i ${(System.nanoTime()-t0)/1e9}%.3f s jobs=${jobs.get()-j0} rows=$n")
      }
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfstore_$key"
    run("ivf_topk") {
      graft.ann.IvfStore.ensure(emb, "vec_id", "embedding", spark, path, nlist = 16)
        .topK(qs, "qid", "qvec", k = 5, nprobe = 4)
    }
    run("ivf_adc") {
      graft.ann.IvfStore.ensure(emb, "vec_id", "embedding", spark, path, nlist = 16)
        .topKAdc(qs, "qid", "qvec", k = 5, nprobe = 4, shortlist = 100)
    }
    val pathO = s"${System.getProperty("java.io.tmpdir")}/graft_ivfopqstore_$key"
    if (graft.ann.IvfStore.exists(spark, pathO))
      run("opq_adc") {
        graft.ann.IvfStore.ensure(emb, "vec_id", "embedding", spark, pathO, nlist = 16, opq = true)
          .topKAdc(qs, "qid", "qvec", k = 5, nprobe = 4, shortlist = 100)
      }
    spark.stop()
  }
}
