package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge frame — document centrality
  * in a similarity graph is a data-selection signal (a highly central
  * near-dup cluster member is redundant; an isolated doc is novel),
  * and the fixed-unroll form keeps the computation an oracle-checkable
  * dataflow. (Reference scope: absent — graph extension surface next
  * to ConnectedComponents.)
  *
  *   pr_0(v)   = 1 / N
  *   pr_t+1(v) = (1-d)/N + d * Σ_{(u,v) ∈ E} pr_t(u) / deg(u)
  *
  * over the directed edge set (pass both directions for an undirected
  * graph); N = number of distinct endpoints. Dangling nodes (no
  * out-edges) can't occur when both directions are present — for
  * directed inputs their mass simply leaks, the standard simplified
  * variant.
  *
  * Scale shape per iteration: one join of the rank vector (N rows)
  * with the edge list on src + one groupBy dst — the textbook
  * message-passing round, all shuffles keyed on node id; `iterations`
  * is a compile-time unroll (no driver-side convergence loop, no
  * collect). For a web-scale graph you would checkpoint the rank
  * vector between rounds; at the corpus-similarity scale this engine
  * targets the lineage stays shallow (a handful of rounds).
  */
object PageRank {

  /** (node, pr) after `iterations` rounds at damping `d`. With a
    * `weightCol`, a node's rank splits across its out-edges in
    * proportion to edge weight (pr·w/Σw_out) instead of uniformly —
    * similarity-weighted centrality when edges carry Jaccard/cosine;
    * weights must be positive. The unweighted path divides by the
    * out-degree count directly (pr·1.0/deg is bit-identical to pr/deg
    * — multiplying by exactly 1.0 is an IEEE identity — so both paths
    * share one loop). */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 3,
      damping: Double = 0.85,
      weightCol: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    // weights must be strictly positive: a zero/negative/null weight
    // would make wout 0 (pr/0 = NaN, which sum() spreads to every
    // reachable node) or silently drop the edge — fail loud per row
    val wExpr = weightCol
      .map(c => when(col(c).isNull || col(c).cast("double") <= 0.0,
          raise_error(concat(lit(s"PageRank: non-positive weight in '$c': "),
            coalesce(col(c).cast("string"), lit("null")))))
        .otherwise(col(c).cast("double")))
      .getOrElse(lit(1.0))
    // loop-invariant frames are materialized ONCE: without the
    // checkpoint every iteration re-executes the caller's whole
    // edge-building plan (e.g. a shingle inverted index) three times
    // per round through e/nodes/deg, and the rank lineage compounds it
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"), wExpr.as("w"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val deg = weightCol match {
      case None => e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      case Some(_) => e.groupBy(col("src")).agg(sum(col("w")).as("deg"))
    }
    val n = broadcast(nodes.agg(count(lit(1)).as("__n")))
    var pr = nodes.crossJoin(n)
      .select(col("node"), (lit(1.0) / col("__n").cast("double")).as("pr"))
    for (_ <- 1 to iterations) {
      val contrib = pr.join(e, pr("node") === e("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"),
          (col("pr") * col("w") / col("deg").cast("double")).as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__in"))
      pr = nodes.crossJoin(n)
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          ((lit(1.0) - damping) / col("__n").cast("double") +
            lit(damping) * coalesce(col("__in"), lit(0.0))).as("pr"))
    }
    pr
  }

  /** N-FREE PageRank iterates — the representation that makes the
    * computation incrementally maintainable (see
    * `PairGraphStore.appendAndMaintainRanks`):
    *
    *   g_0(v)   = 1
    *   g_t(v)   = (1-d) + d * Σ_{(u,v) ∈ E} g_{t-1}(u) · w(u,v) / deg(u)
    *
    * so that pr_t(v) = g_t(v) / N. Because [[run]]'s recurrence is
    * homogeneous of degree 1 in the uniform init 1/N and the constant
    * (1-d)/N, dividing by N commutes with every round — and g itself
    * never mentions N. That is the load-bearing property at ingest
    * time: appending NEW NODES changes N (which under [[run]] perturbs
    * every node's rank through the init and the teleport constant) but
    * leaves every stored g value of an edge-unaffected node EXACTLY
    * valid — the serve layer re-divides by the grown N and only the
    * delta's T-hop out-neighborhood needs recomputing.
    *
    * Returns (node, gs: array<double>) where gs(t-1) = g_t — ALL
    * iterates persist, because maintenance round t needs the
    * patch-boundary's g_{t-1}, not just the final value.
    *
    * Determinism: per-node in-sums fold contributions in SORTED src
    * order (collect_list → array_sort → left fold) instead of a
    * partition-order `sum`, and the weighted out-degree folds the same
    * way — so two runs, or a patch recompute against a from-scratch
    * run, produce BIT-IDENTICAL doubles (float addition is not
    * associative; a plain sum's partition order is not reproducible).
    * The per-node contribution array is bounded by the max in-degree —
    * fine for similarity graphs whose degree the LSH bucket guards cap;
    * a web-scale power-law graph would swap the fold for a fixed-arity
    * deterministic tree sum at the cost of one more shuffle. */
  def gIterates(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 3,
      damping: Double = 0.85,
      weightCol: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val wExpr = weightCol
      .map(c => when(col(c).isNull || col(c).cast("double") <= 0.0,
          raise_error(concat(lit(s"PageRank: non-positive weight in '$c': "),
            coalesce(col(c).cast("string"), lit("null")))))
        .otherwise(col(c).cast("double")))
      .getOrElse(lit(1.0))
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), wExpr.as("w"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val deg = degrees(e, weightCol.isDefined)
    var state = nodes.withColumn("gs", array().cast("array<double>"))
    for (t <- 1 to iterations) {
      val gPrev = state.select(col("node").as("src"),
        (if (t == 1) lit(1.0) else element_at(col("gs"), t - 1)).as("__g"))
      state = state
        .join(inFold(e, deg, gPrev), Seq("node"), "left")
        .withColumn("gs", concat(col("gs"),
          array(lit(1.0 - damping) + lit(damping) * coalesce(col("__in"), lit(0.0)))))
        .drop("__in")
    }
    state
  }

  /** PERSONALIZED PageRank — random walk with restart to a SEED set
    * (trust propagation from a curated core, related-document
    * expansion from a query set, influence from flagged users):
    *
    *   p_0(v)   = [v ∈ S] / |S|
    *   p_t+1(v) = (1-d)·[v ∈ S]/|S| + d · Σ_{(u,v) ∈ E} p_t(u)·w(u,v)/deg(u)
    *
    * — [[run]] with the uniform teleport replaced by the seed
    * indicator. Same fixed-unroll dataflow (one rank-vector join + one
    * groupBy per round, `iterations` a compile-time unroll), same
    * positive-weight contract; nodes never reached from a seed hold
    * rank 0 rows (mass leaks only through directed dangling nodes, as
    * in [[run]]). Seeds not present in the edge set still teleport to
    * themselves — they hold (1-d)/|S| from round 1 on. */
  def personalized(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      iterations: Int = 3,
      damping: Double = 0.85,
      weightCol: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val wExpr = weightCol
      .map(c => when(col(c).isNull || col(c).cast("double") <= 0.0,
          raise_error(concat(lit(s"PageRank: non-positive weight in '$c': "),
            coalesce(col(c).cast("string"), lit("null")))))
        .otherwise(col(c).cast("double")))
      .getOrElse(lit(1.0))
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), wExpr.as("w"))
      .localCheckpoint()
    val s = seeds.select(col(seeds.columns.head).cast("long").as("node"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .union(s.select(col("node"))).distinct()
      .localCheckpoint()
    val deg = degrees(e, weightCol.isDefined)
    val nSeeds = broadcast(s.agg(count(lit(1)).as("__s")))
    // teleport vector: [v ∈ S]/|S| — reused as init and per-round base
    val tele = nodes.crossJoin(nSeeds)
      .join(s.withColumn("__isSeed", lit(1)), Seq("node"), "left")
      .select(col("node"),
        (coalesce(col("__isSeed"), lit(0)).cast("double") /
          col("__s").cast("double")).as("__t"))
      .localCheckpoint()
    var pr = tele.select(col("node"), col("__t").as("pr"))
    for (_ <- 1 to iterations) {
      val contrib = pr.join(e, pr("node") === e("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"),
          (col("pr") * col("w") / col("deg").cast("double")).as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__in"))
      pr = tele
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) * col("__t") +
            lit(damping) * coalesce(col("__in"), lit(0.0))).as("pr"))
    }
    pr
  }

  /** Out-degree (or weighted out-mass) per src, order-canonical for
    * the weighted case: the fold over (dst, w) pairs sorted by dst is
    * the same double no matter how edges partition. */
  private[operators] def degrees(e: DataFrame, weighted: Boolean): DataFrame =
    if (!weighted) e.groupBy(col("src")).agg(count(lit(1)).cast("double").as("deg"))
    else e.groupBy(col("src"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("dst").as("d"), col("w").as("x")))),
        lit(0.0), (acc, p) => acc + p.getField("x")).as("deg"))

  /** Σ_{(u,v) ∈ E} g(u)·w/deg(u) per dst, folded in sorted (src,
    * contribution) order — deterministic across plans and runs. */
  private[operators] def inFold(e: DataFrame, deg: DataFrame,
      gPrev: DataFrame): DataFrame =
    e.join(gPrev, Seq("src"))
      .join(deg, Seq("src"))
      .select(col("dst").as("node"),
        struct(col("src").as("s"),
          (col("__g") * col("w") / col("deg")).as("c")).as("__p"))
      .groupBy(col("node"))
      .agg(aggregate(array_sort(collect_list(col("__p"))),
        lit(0.0), (acc, p) => acc + p.getField("c")).as("__in"))
}
