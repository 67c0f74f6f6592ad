package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distances — "how far is every document from a
  * seed set" over a similarity graph: blast-radius of a contaminated
  * cluster, curation distance from a trusted core, influence rings
  * around flagged users. (Reference scope: absent — graph extension
  * surface next to [[PageRank]]/[[KCore]].)
  *
  * dist(v) = min hops from ANY seed to v along the directed edge set
  * (pass both directions for an undirected graph), capped at
  * `maxHops`; nodes unreached within the cap are ABSENT from the
  * result (the SQL-twin convention — a LEFT join against it reads
  * "beyond the horizon").
  *
  * Scale shape: synchronous frontier expansion — round t joins the
  * CURRENT frontier (nodes first reached at t-1) with the edge list
  * and anti-joins everything already distanced, so each round's
  * shuffle is frontier-neighborhood-sized, never graph-sized; rounds
  * are bounded by `maxHops` and stop early on an empty frontier (one
  * driver-side isEmpty per round — a bounded control-plane check,
  * the CC/KCore loop convention). Distances are INTEGERS, so results
  * are plan- and partition-order independent — this family needs no
  * determinism machinery.
  */
object BfsDistances {

  private def cps(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.ColumnBridge.checkpointStatsReset(df)

  /** (node, dist) for every node within `maxHops` of `seeds`.
    * `seeds` is a one-column frame of node ids (dist 0 rows; ids not
    * present in the edge set are still emitted at dist 0 — a seed is
    * trivially at distance 0 from itself). */
  def fromSeeds(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      maxHops: Int = 4): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .localCheckpoint()
    var dist = cps(seeds.select(seeds.columns.head)
      .toDF("node").select(col("node").cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(0)))
    var frontier = dist.select(col("node"))
    var t = 1
    while (t <= maxHops && !frontier.isEmpty) {
      val next = cps(e
        .join(frontier.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .select(col("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti"))
      dist = cps(dist.unionByName(next.withColumn("dist", lit(t))))
      frontier = next
      t += 1
    }
    dist
  }
}
