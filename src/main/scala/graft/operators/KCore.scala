package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition: the maximal subgraph in which every node has
  * degree >= k — the robust "dense cluster" extractor on similarity
  * graphs (a template family survives high k; a chain of borderline
  * near-dups does not, even when connected components lumps both
  * together).
  *
  * Iterative peeling to a fixpoint: repeatedly remove nodes with
  * current degree < k. Each round is one degree aggregation + one
  * semi-join — shuffles keyed on node id — and the loop is
  * driver-coordinated on a single COUNT per round (the same
  * bounded-iteration pattern as ConnectedComponents' distributed
  * route; the iteration count is bounded by the peeling depth, which
  * is tiny on real similarity graphs). Edge frames are
  * localCheckpoint'd per round so lineage stays flat.
  */
object KCore {

  /** Nodes of the k-core with their in-core degree:
    * `(node, core_degree)`. Empty when the core is empty. */
  def run(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e0 = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .distinct()
    var cur = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    // one count per round: the previous round's size carries over
    var curCount = cur.count()
    var rounds = 0
    var done = curCount == 0
    while (!done && rounds < maxRounds) {
      val deg = cur.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select(col("node"))
      val next = cur
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint()
      val after = next.count()
      done = after == curCount
      cur = next
      curCount = after
      rounds += 1
    }
    // fail loud, never silently under-peel: a path/chain graph needs
    // ~n/2 rounds at k=2, so a fixed budget CAN run out — returning the
    // partially-peeled edge set would report non-core nodes as core
    // members with no signal. Callers with deep graphs raise maxRounds.
    require(done,
      s"k-core did not converge in $maxRounds rounds ($curCount edges still " +
        s"peeling at k=$k) — raise maxRounds")
    cur.groupBy(col("a").as("node")).agg(count(lit(1)).as("core_degree"))
  }

  /** Core number per node (the largest k whose k-core contains it),
    * by running the peel at each k from 1 up to `maxK` — the simple
    * exact formulation; each level reuses the previous level's
    * surviving edge set, so total cost is the peeling work, not
    * maxK x full graphs. `(node, core_number)`. */
  def coreNumbers(edges: DataFrame, srcCol: String, dstCol: String,
      maxK: Int): DataFrame = {
    require(maxK >= 1, s"maxK must be >= 1, got $maxK")
    val spark = edges.sparkSession
    var acc: Option[DataFrame] = None
    var remaining = edges.select(
      col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
    var level = 1
    var exhausted = false
    while (level <= maxK && !exhausted) {
      val core = run(remaining, "u", "v", level)
        .select(col("node"), lit(level).as("core_number"))
        .localCheckpoint()
      if (core.isEmpty) exhausted = true
      else {
        acc = Some(acc.fold(core)(prev =>
          // later levels overwrite earlier: keep the max level per node
          prev.unionByName(core)))
        // restrict the edge set to this core's nodes before the next level
        val nodes = core.select(col("node"))
        remaining = remaining
          .join(nodes.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
          .join(nodes.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
      }
      level += 1
    }
    acc.map(_.groupBy(col("node")).agg(max(col("core_number")).as("core_number")))
      .getOrElse(spark.emptyDataFrame
        .withColumn("node", lit(0L)).withColumn("core_number", lit(0))
        .limit(0))
  }
}
