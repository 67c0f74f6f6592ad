package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round synchronous label propagation over an edge frame —
  * community detection on the near-dup similarity graph. Where
  * ConnectedComponents answers "which docs are transitively linked at
  * all", LPA answers the finer "which docs form a densely-linked
  * community": a bridge edge joins two components but rarely flips a
  * whole community's majority vote. (Reference scope: absent — graph
  * extension surface next to ConnectedComponents/PageRank.)
  *
  * Update rule, per round, per node: adopt the label with the highest
  * vote among the node's neighbors PLUS itself (the self-vote keeps
  * singleton-degree oscillation down), ties to the SMALLEST label —
  * fully deterministic, and integer arithmetic end to end, so the
  * oracle can replay every round bit for bit (no FP anywhere).
  *
  *   lbl_0(v)   = v
  *   lbl_t+1(v) = argmax_l |{u ∈ N(v) ∪ {v} : lbl_t(u) = l}|
  *                (ties: min l)
  *
  * Scale shape per round: one join of the label vector with the edge
  * list + two keyed aggregations (vote count, argmax) — the same
  * message-passing round as PageRank, all shuffles keyed on node id,
  * nothing on the driver. `rounds` is a fixed unroll; loop-invariant
  * frames are localCheckpoint'd once so the caller's edge-building
  * plan (LSH buckets, cosine verify) is not re-executed per round.
  */
object LabelPropagation {

  /** (node, community) after `rounds` synchronous votes. Pass
    * one-directional pairs with `symmetrize = true` (the default) for
    * an undirected graph; nodes are the edge endpoints (union isolated
    * nodes in as self-loop-free extra labels downstream if needed). */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      rounds: Int = 3,
      symmetrize: Boolean = true,
      weightCol: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // weighted variant: a neighbor's vote counts its edge weight
    // (similarity-weighted communities when edges carry cosine /
    // Jaccard); the self-vote always weighs 1.0. Weights must be
    // positive — fail loud per row, a zero/negative vote silently
    // reverses the argmax.
    val wExpr = weightCol
      .map(c => when(col(c).isNull || col(c).cast("double") <= 0.0,
          raise_error(concat(lit(s"LabelPropagation: non-positive weight in '$c': "),
            coalesce(col(c).cast("string"), lit("null")))))
        .otherwise(col(c).cast("double")))
      .getOrElse(lit(1.0))
    val e0 = edges.select(
      col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"),
      wExpr.as("w"))
    val eSym = if (symmetrize)
      e0.union(e0.select(col("v").as("u"), col("u").as("v"), col("w"))) else e0
    // materialize once: every round re-reads the edge frame
    val e = eSym.localCheckpoint()
    // self-vote weight = the node's strongest incident edge (exactly
    // 1.0 in the unweighted case, so the unweighted semantics are
    // unchanged): strong enough to damp pair oscillation, never strong
    // enough to freeze a node whose edges all weigh < 1
    val selfW = e.groupBy(col("u").as("node")).agg(max(col("w")).as("sw"))
      .localCheckpoint()
    var labels = selfW.select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to rounds) {
      // node u hears the labels of its neighbors v (weighted), plus
      // its own at the self weight
      val votes = e.join(labels.withColumnRenamed("node", "v"), "v")
        .select(col("u").as("node"), col("lbl"), col("w"))
        .unionByName(labels.join(selfW, "node")
          .select(col("node"), col("lbl"), col("sw").as("w")))
      // argmax by (weight desc, label asc) without a window: min over
      // the lexicographic struct (-w, lbl)
      labels = votes.groupBy(col("node"), col("lbl"))
        .agg(sum(col("w")).as("cnt"))
        .groupBy(col("node"))
        .agg(min(struct((-col("cnt")).as("nc"), col("lbl").as("l"))).as("m"))
        .select(col("node"), col("m.l").as("lbl"))
    }
    labels.select(col("node"), col("lbl").as("community"))
  }

  /** Community summary `(community, size)` — the compact artifact. */
  def communitySizes(labels: DataFrame): DataFrame =
    labels.groupBy(col("community")).agg(count(lit(1)).as("size"))
}
