package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop WEIGHTED shortest distances — [[BfsDistances]]'s
  * min-plus twin: the cheapest path cost from any seed using at most
  * `maxHops` edges (similarity-weighted proximity when edge weight is
  * a dissimilarity like 1 − jaccard). (Reference scope: absent —
  * graph extension surface.)
  *
  *   d_0(v) = 0 for seeds, ∞ (absent) otherwise
  *   d_t(v) = min(d_{t−1}(v), min_{(u,v) ∈ E} d_{t−1}(u) + w(u,v))
  *
  * Bellman-Ford limited to `maxHops` relaxation rounds, with the
  * classic FRONTIER optimization: only nodes whose distance improved
  * last round re-relax, so each round's join is improved-set-sized,
  * not distance-table-sized, and the loop stops early once no node
  * improves. Weights must be non-negative (min-plus with negative
  * weights inside a hop bound is still well-defined, but the frontier
  * cut assumes relaxations never resurrect settled rows — enforce the
  * non-negative contract loudly).
  *
  * Determinism: `min` is order-independent, and a path's cost
  * accumulates left-to-right along the recurrence — both engines
  * replay the identical association, so results are exact across
  * plans (no sum-order machinery needed, unlike PageRank).
  */
object MinPlusDistances {

  private def cps(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.ColumnBridge.checkpointStatsReset(df)

  /** HOP-INDEXED iterates — the incrementally-maintainable
    * representation (see `PairGraphStore.appendAndMaintainDistances`):
    * (node, ds: array<double>[maxHops]) where ds(t−1) = min path cost
    * using at most t edges, Double.PositiveInfinity before the node is
    * first reached; a node appears once reachable within maxHops (or
    * is a seed). ds is non-increasing in t; ds(maxHops−1) equals
    * [[fromSeeds]]'s dist. Maintenance needs every hop's value, not
    * just the last: a fresh edge opens paths whose pre-edge prefix
    * consumed part of the hop budget. */
  def iterates(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      seeds: DataFrame,
      maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        when(col(weightCol).isNull || col(weightCol).cast("double") < 0.0,
          raise_error(concat(
            lit(s"MinPlusDistances: negative/null weight in '$weightCol': "),
            coalesce(col(weightCol).cast("string"), lit("null")))))
          .otherwise(col(weightCol).cast("double")).as("w"))
      .localCheckpoint()
    var dist = cps(seeds.select(seeds.columns.head)
      .toDF("node").select(col("node").cast("long").as("node"))
      .distinct()
      .withColumn("d", lit(0.0)))
    var frontier = dist
    val rounds = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (t <- 1 to maxHops) {
      if (!frontier.isEmpty) {
        val cand = e
          .join(frontier.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node"), (col("d") + col("w")).as("d"))
          .groupBy(col("node")).agg(min(col("d")).as("d"))
        val improved = cps(cand
          .join(dist.withColumnRenamed("d", "__old"), Seq("node"), "left")
          .filter(col("__old").isNull || col("d") < col("__old"))
          .select(col("node"), col("d")))
        dist = cps(dist.join(improved.select(col("node")), Seq("node"), "left_anti")
          .unionByName(improved))
        frontier = improved
      }
      // toDF: fresh attribute ids per snapshot — stalled rounds reuse
      // the same frame and a self-join on shared ids would not resolve
      rounds += dist.toDF("node", s"__d$t")
    }
    // assemble (node, ds): outer-join the hop snapshots; a node absent
    // at hop t was not yet reached — PositiveInfinity
    var out = rounds.head
    for (t <- 2 to maxHops) out = out.join(rounds(t - 1), Seq("node"), "full_outer")
    out.select(col("node"),
      array((1 to maxHops).map(t =>
        coalesce(col(s"__d$t"), lit(Double.PositiveInfinity))): _*).as("ds"))
  }

  /** (node, dist) for every node reachable from `seeds` within
    * `maxHops` edges; dist = min path cost. Seeds are at 0.0 (also
    * when absent from the edge set). */
  def fromSeeds(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      seeds: DataFrame,
      maxHops: Int = 4): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        when(col(weightCol).isNull || col(weightCol).cast("double") < 0.0,
          raise_error(concat(
            lit(s"MinPlusDistances: negative/null weight in '$weightCol': "),
            coalesce(col(weightCol).cast("string"), lit("null")))))
          .otherwise(col(weightCol).cast("double")).as("w"))
      .localCheckpoint()
    var dist = cps(seeds.select(seeds.columns.head)
      .toDF("node").select(col("node").cast("long").as("node"))
      .distinct()
      .withColumn("d", lit(0.0)))
    var frontier = dist
    var t = 1
    while (t <= maxHops && !frontier.isEmpty) {
      val cand = e
        .join(frontier.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), (col("d") + col("w")).as("d"))
        .groupBy(col("node")).agg(min(col("d")).as("d"))
      // improved = strictly better than (or new to) the settled table
      val improved = cps(cand
        .join(dist.withColumnRenamed("d", "__old"), Seq("node"), "left")
        .filter(col("__old").isNull || col("d") < col("__old"))
        .select(col("node"), col("d")))
      dist = cps(dist.join(improved.select(col("node")), Seq("node"), "left_anti")
        .unionByName(improved))
      frontier = improved
      t += 1
    }
    dist
  }
}
