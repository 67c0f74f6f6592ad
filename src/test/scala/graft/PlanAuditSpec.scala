package graft

/** Plan-regression gate: every query in `SparkEntry.queries` must
  * plan successfully at sf0.001 and stay free of unexpected
  * cartesian / nested-loop joins. The whitelist names the queries
  * whose SEMANTICS are all-pairs (exact contract formulations whose
  * oracle is the quadratic pair set, cross-join-by-design) — a new
  * query accidentally planning a CartesianProduct fails here before
  * it ever reaches the bench.
  */
class PlanAuditSpec extends SparkSpec {

  // all-pairs BY CONTRACT: the exact pair-set formulations (their LSH
  // twins are the scale routes) and the broadcast query-set ANN scorers
  private val allPairsByDesign = Set(
    "q64_embedding_neardup", "q65b_neardup_lsh_contract",
    "q69_embedding_clusters", "q69c_embedding_clusters_contract",
    "q101_semantic_dedup", "q70_ann_bruteforce", "q118_ann_int8",
    "q71b_ann_lsh_exhaustive", "q72_ann_ivf", "q72b_ann_ivf_exhaustive",
    "q73_ann_pq", "q73b_ann_pq_exhaustive", "q74_ann_ivfpq",
    "q74b_ann_ivfpq_exhaustive", "q71_ann_lsh",
    // q232: q70's broadcast query-set scorer over the ALLOWED-filtered
    // corpus — the exhaustive oracle route of filtered vector search
    // (q232b, the store route, plans candidate equi-joins and is not
    // whitelisted)
    "q232_ann_filtered",
    // q232c: the realistic-probe CONTRACT twin — its output frame IS
    // q232's exhaustive brute-force ranking (all-pairs by the same
    // design), with the served-route comparison joined on as the
    // probe_ok verdict; the served route itself plans equi-joins
    "q232c_ann_filtered_contract",
    // q241b: the same mold for the filtered graph walk — output rows
    // are the exhaustive filtered brute ranking; the walk under test
    // and the visited-set re-rank plan equi-joins
    "q241b_ann_graph_filtered_contract",
    // q184c/q184d: the q65b mold on the incremental store route —
    // rows are the exact delta-touching cosine pair set (quadratic by
    // contract); the store serve under test plans bucket equi-joins
    "q184c_neardup_incremental_vec_contract",
    "q184d_neardup_small_delta_vec_contract",
    // OPQ = the q73 ADC shape after an orthonormal rotation: every
    // corpus row scores against the broadcast per-query ADC tables
    "q181_ann_opq", "q181b_ann_opq_exhaustive",
    // exact cosine pair graph as LPA's oracle route (q162b is the
    // LSH-bucketed scale twin)
    "q162_lpa_communities",
    // exact train x eval screen as semantic decontamination's oracle
    // route (q168b is the cross-side SRP scale twin; the eval side is
    // benchmark-small by construction, so the plan is a broadcast)
    "q168_semantic_contamination",
    // exact cosine pair graph as the assortativity oracle route (the
    // LSH graph composes identically at scale)
    "q175_degree_assortativity")

  // SCALAR-BROADCAST idiom: a one-row global aggregate (corpus total,
  // avgdl, merged HLL/CMS sketch, timeline bounds, PageRank's N)
  // crossJoin'd into the frame — plans as a BroadcastNestedLoopJoin
  // with a SINGLE build row, which is the intended shape, not a scale
  // hazard. Only add here when the joined side is provably one row.
  private val scalarBroadcast = Set(
    "q102_domain_mix",
    // q244: the same DomainMix one-row smallest-stratum target cross,
    // over composite media strata
    "q244_media_mix_stratified",
    "q111_unigram_logprob",
    "q123_bigram_logprob", "q124_bm25_search", "q124b_bm25_search_store",
    // q124c: MaxScore's θ_lb (k-th best seed score) is a one-row
    // aggregate crossJoined into the candidate cut; the BM25 corpus
    // stats are the same idiom. q142/q142b: the single query VECTOR
    // (vec_id = 0) broadcast against the corpus for the cosine leg,
    // plus the lexical leg's one-row corpus stats.
    "q124c_bm25_maxscore",
    // q221: the same BM25 (N, avgdl) scalar broadcast as q124b, over
    // the post-takedown store
    "q221_search_takedown",
    // q233: q124b's one-row corpus-stats cross on the FILTERED serve —
    // stats stay corpus-global by the filtered-search contract, so the
    // scalar broadcast is identical; the allowed filter itself is an
    // equi-semi-join
    "q233_bm25_filtered",
    // q222: q221's BM25 scalar broadcast through the unified forget
    // stream (the serve leg is the same bm25Search plan)
    "q222_unified_forget",
    "q142_hybrid_rrf", "q142b_hybrid_rrf_store",
    // q146: the max-ts anchor; q147: the audit's two one-row count
    // frames (hits × total) joined into the RI ratio row
    "q146_decayed_user_value", "q147_quality_audit",
    // q237: the one-row cross-split leak count (0 by construction)
    // crossJoined into the per-split report — the q147 audit idiom
    "q237_leakage_split",
    "q125_skew_report",
    "q128_pagerank_neardup", "q130_pagerank_weighted",
    // q193b: PageRank.run's one-row node-count frame (q128's idiom)
    // on the contract's inline leg; the store serve leg divides by a
    // driver scalar and stays cross-free (as does q193). q195: the
    // one-row seed-count frame crossJoined into the teleport vector.
    "q193b_pagerank_store_contract", "q195_ppr_seeded",
    // q203/q206: the one-row conformal threshold (inline / served
    // from the ConformalStore histogram) crossJoined onto the
    // serving split
    "q203_conformal_gate", "q206_conformal_incremental",
    "q217_conformal_takedown",
    "q19_hll_mergeable", "q35_gapfill_hourly", "q132_linear_interpolate",
    "q86_cms_heavy_hitters", "q89_tfidf_topk",
    // q164: the one-row regression-moment frame crossJoined with the
    // one-row distinct-type count
    "q164_zipf_fit",
    // q170: the one-row unigram and bigram totals crossJoined into the
    // PMI formula
    "q170_pmi_collocations",
    // q172: the two one-row version totals crossJoined into the PSI
    // proportions
    "q172_psi_quality")

  // SMALL-BROADCAST THETA JOIN by design: a deliberately tiny probe
  // frame (bounded by construction, NOT one row) joined on a range /
  // inequality predicate — no equi-key exists, so BNLJ over a
  // broadcast build of known-small cardinality is the correct plan.
  // Distinct from `scalarBroadcast` (provably one row) so each
  // whitelist's invariant stays checkable against its members.
  private val smallBroadcastTheta = Set(
    "q110_cpe_version_range",
    // q161b: prefix unions over the |sources|-row HLL sketch table —
    // a <= theta join on a frame bounded by the source count
    "q161b_vocab_novelty_hll",
    // q177: the top-100 shared-docs frame theta-joined against the
    // 100-row RBO weight spine (d >= m), plus the one-row totals cross
    "q177_rbo_quality_entropy",
    // q182: the same RBO weight-spine shape over the two serving
    // rankings (<= 20-row shared frame x 20-row spine; the hybrid leg
    // also carries q142's bounded RRF window + one-row totals cross)
    "q182_rbo_search_rankings")

  // BOUNDED CROSS by semantics: every row is deliberately paired with
  // every member of a tiny bounded frame because that IS the
  // computation — NB scores each doc against each CLASS (|C| rows,
  // broadcast), and the DSIR family crossJoins its one-row totals/OOV
  // constants (scalar-broadcast shape) into vocabulary-sized frames.
  private val boundedCross = Set(
    "q158_nb_confusion", "q159_dsir_weights", "q159b_dsir_resample",
    "q159c_dsir_hashed",
    // q159d runs all three DSIR routes (exact + hashed + the inline
    // quotient re-derivation), each with its one-row totals cross
    "q159d_dsir_hashed_contract",
    // q158b derives from q158's scores (same doc x class cross);
    // q173's full contingency crosses the vocab with the |C|-row class
    // totals + the one-row grand total
    "q158b_nb_class_metrics", "q173_token_chi2")

  test("every query plans at sf0.001; cartesian joins only where the semantics demand them") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    val failures = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf001).queryExecution.executedPlan.toString
        val crossy = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        if (crossy && !allPairsByDesign.contains(name) &&
          !scalarBroadcast.contains(name) &&
          !smallBroadcastTheta.contains(name) &&
          !boundedCross.contains(name)) offenders += name
      } catch {
        case e: Exception => failures += s"$name: ${String.valueOf(e.getMessage).take(200)}"
      }
    }
    assert(failures.isEmpty, s"queries failed to plan:\n${failures.mkString("\n")}")
    assert(offenders.isEmpty,
      s"unexpected cartesian/nested-loop plans (add to whitelist ONLY if all-pairs is the semantics):\n${offenders.mkString("\n")}")
  }
}
