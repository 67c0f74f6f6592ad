package graft

/** Plan auditor: prints the formatted physical plan for selected
  * queries so scan pushdown, broadcast choices, top-k operators, and
  * whole-stage-codegen spans can be inspected (and regressions
  * spotted) without a UI. Usage: runMain graft.Plans [sfDir] [names...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q07_point_lookup", "q10_join_broadcast_dims",
        "q11_join_fact_fact", "q20_window_rank", "q23_latest_event_per_user",
        "q30_global_topk", "q64_embedding_neardup")
    val spark = GraftSession.local(8)
    try {
      names.foreach { n =>
        println(s"\n========== $n ==========")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
    } finally spark.stop()
  }
}
