package graft

/** One-off A/B probe for session-level conf candidates over a sample
  * of tail queries (optimization r16). Each variant gets a fresh
  * session; timings are min-of-2 like Bench. */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sample = Seq(
      "q50_string_funcs", "q54_text_search", "q61_dedup_ngram_jaccard",
      "q63_dedup_simhash", "q66_dedup_winnow", "q80_token_stats",
      "q89_tfidf_topk", "q94_event_value_deciles", "q98_cohort_retention",
      "q111_unigram_logprob", "q121_edit_distance_pairs",
      "q123_bigram_logprob", "q134_image_phash_pairs", "q138_repeated_spans",
      "q158b_nb_class_metrics", "q167_mahalanobis_outliers",
      "q170_pmi_collocations", "q177_rbo_quality_entropy",
      "q179_event_transitions", "q204_stratified_subsample")
    val variants: Seq[(String, Map[String, String])] = Seq(
      "baseline" -> Map.empty,
      "pfirst=false" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false"),
      "pfirst=false+adv64m" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m"))
    variants.foreach { case (name, confs) =>
      val b = GraftSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
      confs.foreach { case (k, v) => b.config(k, v) }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      graft.plans.GraftExtensions.ensureRegistered(spark)
      try SparkEntry.queries("q02_count_distinct")(spark, sf).count()
      catch { case _: Throwable => }
      val total = sample.map { q =>
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, sf).count()
          spark.catalog.clearCache()
          (System.nanoTime() - t0) / 1e9
        }
        times.min
      }.sum
      println(f"PROBE variant=$name total=$total%.2f s")
      spark.stop()
    }
  }
}
