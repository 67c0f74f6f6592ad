package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** Greedy k-center (farthest-point / Gonzalez 1985) coreset selection
  * over an embedding column — the classic 2-approximation to the
  * k-center objective, used in data curation to pick a maximally
  * diverse representative subset (coreset selection, active-learning
  * seed sets, dedup-aware eval panels). (Reference scope:
  * nvd2mysqlloader has no selection surface — part of the mandated
  * training-data extension set.)
  *
  * Unlike MMR ([[MmrRerank]], driver-side over a bounded candidate
  * page), greedy k-center is the DISTRIBUTED selection shape: the
  * selection pool is the whole corpus, so the state that must scale is
  * per-row (each point's running min distance to the selected set) and
  * the per-round work is one narrow map (fold the newest center into
  * the running min — one codegen'd dot kernel against a broadcast
  * literal) plus one top-1 aggregate (TakeOrderedAndProject). k rounds
  * = k linear passes, no pairwise materialization anywhere; state is
  * localCheckpoint'd per round so lineage stays flat (the PageRank
  * loop-invariant idiom).
  *
  * Determinism contract (the q64/q169 convention): per-pair cosine
  * DISTANCES are quantized to 4dp before any comparison, so the argmax
  * margin is either 0 (resolved by the smaller-id tie-break, identical
  * on any engine) or >= 1e-4 (far above cross-engine float epsilon) —
  * which is what makes the greedy trajectory reproducible in SQL as a
  * fixed-k unrolled pick chain (the q143 MMR oracle mold).
  */
object KCenter {

  /** Select `k` centers greedily: center 1 is the smallest-id point
    * (the deterministic stand-in for Gonzalez's arbitrary seed), each
    * later center the point maximizing its min 4dp cosine distance to
    * the already-selected set (ties on smaller id; selected points are
    * excluded explicitly, not just via their 0 self-distance, so exact
    * duplicates of a center can never re-select it).
    *
    * @return (rnk, <idCol>, radius) — `min(k, n)` rows in pick order;
    *         `radius` is the k-center objective AFTER the pick: the
    *         max over ALL points of the min 4dp cosine distance to
    *         centers 1..rnk. Monotone nonincreasing in rnk.
    */
  def select(
      points: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = points.sparkSession

    // cut the caller's plan once; the state frame is rescanned k times
    val base = Partitioning.spread(points)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .localCheckpoint()

    val firstRows = base.orderBy(col("id")).limit(1).collect()
    if (firstRows.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Double)].toDF("rnk", idCol, "radius")
    }
    val first = firstRows(0)

    def vecOf(r: Row): Array[Double] = r.getSeq[Any](1).toArray.map {
      case f: Float => f.toDouble
      case d: Double => d
      case other => throw new IllegalArgumentException(
        s"KCenter: vector elements must be float/double, got ${other.getClass}")
    }

    // 4dp cosine distance to one center (broadcast as an array literal
    // — the dot kernel stays inside whole-stage codegen)
    def distTo(c: Array[Double]): Column =
      round(lit(1.0) - VF.cosine(col("v"), typedLit(c.toSeq)), 4)

    var picked = Vector((first.getLong(0), vecOf(first)))
    var state = base
      .withColumn("mind", distTo(picked.head._2))
      .localCheckpoint()

    val out = Vector.newBuilder[(Long, Long, Double)]
    var done = false
    while (picked.size < k && !done) {
      val pickedIds = picked.map(_._1)
      val top = state
        .filter(!col("id").isin(pickedIds: _*))
        .orderBy(col("mind").desc, col("id"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true // k >= n: pool exhausted
      else {
        val t = top(0)
        // the argmax's mind IS the objective after the PREVIOUS pick
        out += ((picked.size.toLong, pickedIds.last, t.getDouble(2)))
        picked = picked :+ ((t.getLong(0), vecOf(t)))
        state = state
          .withColumn("mind", least(col("mind"), distTo(picked.last._2)))
          .localCheckpoint()
      }
    }
    // objective after the final pick needs one extra max aggregate
    val lastRadius = state.agg(max(col("mind"))).collect()(0).getDouble(0)
    out += ((picked.size.toLong, picked.last._1, lastRadius))

    import spark.implicits._
    out.result().toDF("rnk", idCol, "radius")
  }
}
