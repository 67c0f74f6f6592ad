package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step
  * that turns PAIRS into dedup CLUSTERS (one keeper per component).
  *
  * Algorithm: min-label propagation. Every node starts labeled with
  * itself; each round every node takes the min label among itself and
  * its neighbors; converge when no label changes. Rounds needed =
  * graph diameter — near-dup components are dense clique-ish blobs,
  * so 2-3 rounds in practice; `maxIter` bounds pathological chains.
  *
  * Scale shape: each round is one join of the (u, label) frame against
  * the symmetrized edge list plus a min-aggregate — all set-based,
  * partial+final. Labels are `localCheckpoint`ed each round: iterative
  * plans otherwise stack lineage exponentially and re-execute prior
  * rounds. The convergence check rides on the same frame (count of
  * changed labels), one extra action per round.
  */
object ConnectedComponents {

  /** @param edges pair frame with two node columns (e.g. doc_a, doc_b)
    * @return (member, cluster_root) — every node that appears in at
    *         least one edge, labeled with its component's minimum id */
  def run(
      edges: DataFrame,
      uCol: String,
      vCol: String,
      maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val sym = edges.select(col(uCol).as("u"), col(vCol).as("v"))
      .union(edges.select(col(vCol).as("u"), col(uCol).as("v")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select($"u").distinct().withColumn("lbl", $"u")
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym.as("e")
        .join(labels.as("l"), col("e.v") === col("l.u"))
        .groupBy(col("e.u").as("u"))
        .agg(min(col("l.lbl")).as("nbr_lbl"))
      val next = labels.as("l")
        .join(nbrMin.as("n"), col("l.u") === col("n.u"), "left")
        .select(col("l.u").as("u"),
          least(col("l.lbl"), coalesce(col("n.nbr_lbl"), col("l.lbl"))).as("lbl"),
          col("l.lbl").as("prev"))
        .localCheckpoint()
      changed = next.filter($"lbl" =!= $"prev").count()
      labels = next.select($"u", $"lbl")
      i += 1
    }
    // Exiting at maxIter with the LAST round still changing is
    // ambiguous: that round may have been the one that finished the
    // job. Run one confirmation round; only a further change means
    // components wider than maxIter exist — then fail loud rather
    // than silently return wrong roots.
    if (changed > 0) {
      val confirm = sym.as("e")
        .join(labels.as("l"), col("e.v") === col("l.u"))
        .groupBy(col("e.u").as("u"))
        .agg(min(col("l.lbl")).as("nbr_lbl"))
        .join(labels, Seq("u"))
        .filter(col("nbr_lbl") < col("lbl"))
        .count()
      if (confirm > 0)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIter rounds " +
            s"($confirm labels would still change) — raise maxIter (graph diameter exceeds it)")
    }
    labels.select($"u".as("member"), $"lbl".as("cluster_root"))
  }
}
