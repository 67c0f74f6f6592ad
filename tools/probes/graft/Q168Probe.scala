package graft

import org.apache.spark.sql.functions._

/** One-off phase probe for q168b latency (optimization round 16). */
object Q168Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warmup parity with Bench
    SparkEntry.queries("q02_count_distinct")(spark, sf).count()
    (1 to 2).foreach { i =>
      val emb = Tables.embeddings(spark, sf)
      val train = emb.filter($"vec_id" % 17 =!= 0)
      val eval = emb.filter($"vec_id" % 17 === 0)
      time(s"run$i full q168b") {
        SparkEntry.queries("q168b_semantic_contamination_lsh")(spark, sf).count()
      }
      spark.catalog.clearCache()
      time(s"run$i plan-only") {
        graft.dedup.SemanticContamination.lshReport(
          train, eval, "vec_id", "embedding", tau = 0.35, nBits = 8,
          tables = 8, dim = 64, maxBucketSize = 10000)
          .queryExecution.executedPlan
      }
      spark.catalog.clearCache()
      // phase: train postings persist+count
      val tp = time(s"run$i tp-build") {
        val p = graft.operators.Partitioning.spread(train)
          .select($"vec_id".as("__tid"),
            explode(array((0 until 8).map(t =>
              struct(lit(t).as("tbl"),
                graft.ann.Ann.srpSignature($"embedding", 8, 64, 42L + t).as("bkt"))): _*)).as("tb"))
          .select($"__tid", $"tb.tbl", $"tb.bkt")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count(); p
      }
      val ov = time(s"run$i oversized") {
        val o = graft.dedup.MinHashLSH.oversizedBuckets(
          tp.select($"__tid".as("__id"), $"tbl", $"bkt"), Seq("tbl", "bkt"), 10000)
        o.count(); o
      }
      val ep = graft.operators.Partitioning.spread(eval)
        .select($"vec_id".as("__eid"),
          explode(array((0 until 8).map(t =>
            struct(lit(t).as("tbl"),
              graft.ann.Ann.srpSignature($"embedding", 8, 64, 42L + t).as("bkt"))): _*)).as("tb"))
        .select($"__eid", $"tb.tbl", $"tb.bkt")
      val cand = time(s"run$i candidates") {
        val c0 = tp.join(broadcast(ov), Seq("tbl", "bkt"), "left_anti")
          .join(ep, Seq("tbl", "bkt"))
          .select($"__tid", $"__eid").distinct()
        c0.count(); c0
      }
      time(s"run$i verify+agg") {
        val tv = train.select($"vec_id".as("__tid"), $"embedding".as("__tv"))
        val ev2 = eval.select($"vec_id".as("__eid"), $"embedding".as("__ev"))
        cand.join(tv, "__tid").join(ev2, "__eid")
          .withColumn("__cos", graft.functions.VectorFunctions.cosine($"__tv", $"__ev"))
          .filter($"__cos" > 0.35)
          .groupBy($"__tid".as("vec_id"))
          .agg(count(lit(1)).as("n_eval_hits"), max($"__cos").as("max_cos"))
          .count()
      }
      tp.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
