package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss — the EDGE-cohesion analogue of [[KCore]], completing the
  * cohesion family (k-core peels nodes on degree, truss peels edges on
  * triangle support): the k-truss is the maximal subgraph in which
  * every edge participates in at least k−2 triangles WITHIN the
  * subgraph. Near-dup semantics: a truss edge is a similarity claim
  * corroborated by k−2 mutual witnesses, so trusses cut the spurious
  * bridges LSH sometimes draws between clusters that k-core (which
  * only counts degree) keeps. (Reference scope: absent — graph
  * extension surface; Cohen 2008, "Trusses: cohesive subgraphs for
  * social network analysis".)
  *
  * Semantics: iterate "compute per-edge support in the CURRENT
  * subgraph → drop edges with support < k−2" to the fixpoint. The
  * fixpoint is the standard maximal k-truss (order of removals never
  * matters — support only decreases as edges leave).
  *
  * Adaptive like [[KCore]]/[[graft.dedup.ConnectedComponents]]: below
  * `driverMaxEdges` the peel runs driver-local (the distributed loop
  * is dozens of micro-jobs whose scheduling overhead dwarfs
  * harness-scale graphs); above it, a distributed fixpoint whose
  * per-round support computation is the degree-ordered oriented wedge
  * join [[Triangles]] uses — each round one equi-join cascade, rounds
  * bounded by the peel depth, every loop frame checkpointed with
  * origin stats dropped (the BigInteger planning guard). */
object Truss {

  private def cps(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.ColumnBridge.checkpointStatsReset(df)

  /** Edges of the maximal k-truss, canonical (a < b) orientation.
    * k >= 2; the 2-truss is the (deduplicated, self-loop-free) graph
    * itself. */
  def kTruss(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      driverMaxEdges: Long = 512L * 1024): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val e0 = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .distinct()
      .localCheckpoint()
    if (k == 2) return e0
    if (e0.count() <= driverMaxEdges) kTrussDriver(e0, k)
    else kTrussDistributed(e0, k)
  }

  /** Driver-local peel (bounded by `driverMaxEdges`): adjacency sets +
    * a worklist of edges whose support dropped below k−2 — the literal
    * textbook algorithm, O(Σ min(deg)) per full support pass. */
  private def kTrussDriver(e0: DataFrame, k: Int): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    val pairs = e0.collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    def link(x: Long, y: Long): Unit =
      adj.getOrElseUpdate(x, scala.collection.mutable.Set[Long]()) += y
    pairs.foreach { case (a, b) => link(a, b); link(b, a) }
    val alive = scala.collection.mutable.Set[(Long, Long)](pairs.toIndexedSeq: _*)
    def support(a: Long, b: Long): Int = {
      val (s, l) = if (adj(a).size <= adj(b).size) (adj(a), adj(b)) else (adj(b), adj(a))
      s.count(w => w != a && w != b && l.contains(w))
    }
    val queue = scala.collection.mutable.Queue[(Long, Long)](pairs.toIndexedSeq: _*)
    val queued = scala.collection.mutable.Set[(Long, Long)](pairs.toIndexedSeq: _*)
    while (queue.nonEmpty) {
      val e = queue.dequeue(); queued -= e
      if (alive.contains(e) && support(e._1, e._2) < k - 2) {
        val (a, b) = e
        // removing (a,b) lowers the support of every edge in a
        // triangle with it — requeue those for re-check
        val (s, l) = if (adj(a).size <= adj(b).size) (adj(a), adj(b)) else (adj(b), adj(a))
        val wits = s.filter(w => w != a && w != b && l.contains(w)).toSeq
        alive -= e; adj(a) -= b; adj(b) -= a
        wits.foreach { w =>
          Seq((math.min(a, w), math.max(a, w)), (math.min(b, w), math.max(b, w)))
            .foreach { t =>
              if (alive.contains(t) && !queued.contains(t)) {
                queue.enqueue(t); queued += t
              }
            }
        }
      }
    }
    alive.toSeq.sorted.toDF("a", "b")
  }

  /** Distributed fixpoint: per-round support via the degree-ordered
    * oriented wedge join, then a broadcast-free semi/anti filter.
    * Each round drops at least one edge or terminates, and dropping
    * only ever lowers support — the fixpoint equals the driver
    * route's (TrussSpec forces this path and pins the equality). */
  private def kTrussDistributed(e0: DataFrame, k: Int): DataFrame = {
    var e = e0
    var stable = false
    while (!stable) {
      val sup = edgeSupport(e)
      val keep = cps(e.join(sup,
          e("a") === sup("sa") && e("b") === sup("sb"), "left")
        .filter(coalesce(col("n"), lit(0L)) >= (k - 2).toLong)
        .select(e("a"), e("b")))
      val before = e.count(); val after = keep.count()
      stable = after == before
      e = keep
    }
    e
  }

  /** (sa, sb, n): triangle count per canonical edge in the current
    * subgraph — every triangle (x < y < z by the degree order)
    * credits its three edges. */
  private def edgeSupport(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    val oriented = sym
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .filter(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")))
      .select(col("a").as("src"), col("b").as("dst"))
    val w1 = oriented.select(col("src"), col("dst").as("x"))
    val w2 = oriented.select(col("src"), col("dst").as("y"))
    val triangles = w1.join(w2, "src").filter(col("x") < col("y"))
      .join(e, col("x") === e("a") && col("y") === e("b"))
      .select(col("src"), col("x"), col("y"))
    triangles.select(
        explode(array(
          struct(least(col("src"), col("x")).as("sa"), greatest(col("src"), col("x")).as("sb")),
          struct(least(col("src"), col("y")).as("sa"), greatest(col("src"), col("y")).as("sb")),
          struct(col("x").as("sa"), col("y").as("sb")))).as("t"))
      .select(col("t.sa").as("sa"), col("t.sb").as("sb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("n"))
  }
}
