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

  /** localCheckpoint + plan-statistics reset (see
    * ColumnBridge.checkpointStatsReset): without the reset each
    * round's join tree multiplies the previous round's BigInt size
    * estimate and deep iterations choke the driver on BigInteger
    * planning arithmetic. */
  private def cps(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.ColumnBridge.checkpointStatsReset(df)

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
      .transform(cps)

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
        .transform(cps)
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

  /** Alternating large-star/small-star connected components (Kiveris
    * et al., "Connected Components in MapReduce and Beyond") — the
    * chain-robust variant. Min-label propagation (`run`) needs
    * O(diameter) rounds, right for the clique-ish blobs near-dup
    * graphs form (2-3 rounds) but wrong for pathological chains; star
    * alternation contracts every component to a star pointing at its
    * minimum in O(log n) rounds regardless of diameter.
    *
    * Per round over a canonically-directed edge set (larger -> smaller,
    * self-loops dropped):
    *   large-star: every node links its LARGER neighbors to the
    *     minimum of its neighborhood (and itself);
    *   small-star: every node links its smaller neighbors (and itself)
    *     to the minimum of its smaller neighborhood.
    * Both steps preserve connectivity and never move an edge's
    * endpoints out of its component; the fixed point is one star per
    * component rooted at the component minimum. Same output contract
    * as `run`, same fail-loud guarantee past `maxIter`.
    */
  def runStar(
      edges: DataFrame,
      uCol: String,
      vCol: String,
      maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // every node that appears in at least one edge (run() parity:
    // self-loop-only nodes still get a (member, member) row)
    val allNodes = edges.select(col(uCol).as("n"))
      .union(edges.select(col(vCol).as("n")))
      .distinct().transform(cps)

    var e = edges.select(col(uCol).as("a"), col(vCol).as("b"))
      .filter($"a" =!= $"b")
      .select(greatest($"a", $"b").as("u"), least($"a", $"b").as("v"))
      .distinct().transform(cps)
    var eCount = e.count()

    var converged = eCount == 0
    var i = 0
    while (!converged && i < maxIter) {
      // LARGE-STAR over the symmetrized neighborhood: m = min(Γ(u) ∪ u),
      // every v ∈ Γ(u) with v > u re-links to m. Output stays
      // canonical: v > u >= m.
      val sym = e.union(e.select($"v".as("u"), $"u".as("v")))
      val minsL = sym.groupBy($"u").agg(least(min($"v"), first($"u")).as("m"))
      val large = sym.join(minsL, Seq("u"))
        .filter($"v" > $"u" && $"v" =!= $"m")
        .select($"v".as("u"), $"m".as("v"))
        .distinct()
      // SMALL-STAR over smaller neighborhoods only (edges already
      // point large -> small): m = min(Γ⁻(u)), every smaller neighbor
      // (and u itself) re-links to m.
      val minsS = large.groupBy($"u").agg(min($"v").as("m"))
      val next = large.join(minsS, Seq("u"))
        .filter($"v" =!= $"m")
        .select($"v".as("u"), $"m".as("v"))
        .union(minsS.select($"u", $"m".as("v")))
        .distinct().transform(cps)
      val nextCount = next.count()
      // fixed point: the edge set is unchanged (set equality — counts
      // first, then a one-sided except, sufficient for equal-size sets
      // of distinct rows)
      converged = nextCount == eCount && next.except(e).isEmpty
      e = next
      eCount = nextCount
      i += 1
    }
    if (!converged && eCount > 0)
      throw new IllegalStateException(
        s"star-contraction components did not converge in $maxIter rounds — raise maxIter")

    // fixed point is a star per component: u -> root for every
    // non-root; roots (and self-loop-only nodes) label themselves
    allNodes.join(e.select($"u".as("n"), $"v".as("root")), Seq("n"), "left")
      .select($"n".as("member"), coalesce($"root", $"n").as("cluster_root"))
  }

  /** Spark conf key tuning `runAdaptive`'s driver-path edge bound per
    * deployment (driver heap ≠ one-size-fits-all); an explicit
    * `driverMaxEdges` argument still wins.
    *
    * Default = 512k edges, from the measured GraphScaleProbe crossover
    * (COVERAGE.md round-9 deep tier, 48g driver, 32 cores): driver
    * union-find wins at 155k edges (1.5 s vs star contraction's
    * 4.2 s) and loses at 2.72M (22.9 s vs 7.8 s); linear
    * interpolation of both curves crosses at ~540k. Memory is not the
    * binding constraint at this size (512k edges ≈ 8 MB collected) —
    * wall time is. */
  val DriverMaxEdgesConf = "spark.graft.cc.driverMaxEdges"
  val DriverMaxEdgesDefault: Long = 1L << 19

  /** Scale-adaptive entry point: near-dup edge graphs are SPARSE
    * (edges ≈ duplicate count, a sliver of the corpus), and the
    * iterative paths pay 2 Spark jobs per round regardless of size —
    * measured ~4.7 s for an 85-edge graph at 32 shuffle partitions,
    * pure scheduling overhead. Below the driver-edge bound (explicit
    * `driverMaxEdges` arg, else `spark.graft.cc.driverMaxEdges` conf,
    * else 512k edges ≈ 8 MB — the same bounded-collect contract as
    * the k-means training sample) the component structure is solved
    * driver-side with union-find in one collect; above it, the
    * distributed large/small-star contraction runs. Output contract
    * identical: one (member, cluster_root=component min) row per
    * distinct node appearing in the edge frame, typed as the WIDER of
    * the two id columns (int u joined with long v must not truncate
    * v-side ids). Requires integral id columns on the driver path (all
    * call sites use long ids); other types fall through to the
    * distributed path.
    *
    * NOTE: unlike the lazy `run`, this is an ACTION — the edge plan
    * executes (localCheckpoint + count, plus the collect on the small
    * path) when runAdaptive is called, not when the returned frame is
    * first used. */
  def runAdaptive(
      edges: DataFrame,
      uCol: String,
      vCol: String,
      driverMaxEdges: Long = -1L,
      maxIter: Int = 25): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val bound =
      if (driverMaxEdges >= 0) driverMaxEdges
      else edges.sparkSession.conf
        .get(DriverMaxEdgesConf, DriverMaxEdgesDefault.toString).toLong
    val idTypes = Seq(uCol, vCol).map(c => edges.schema(c).dataType)
    val integral = idTypes.forall(t => t == LongType || t == IntegerType)
    // one cheap job; callers' edge frames are the output of heavy
    // LSH/verify plans, so force a localCheckpoint first to avoid
    // recomputing that plan for the count AND again for the solve
    if (!integral) return run(edges, uCol, vCol, maxIter)
    val outType = if (idTypes.contains(LongType)) LongType else IntegerType
    val pinned = edges.select(col(uCol).cast("long").as("u"), col(vCol).cast("long").as("v"))
      .transform(cps)
    if (pinned.count() > bound) {
      // star contraction, not min-label propagation: the round-9 probe
      // measured star faster at BOTH distributed tiers (4.2 s vs 4.6 s
      // at 155k edges, 7.8 s vs 10.7 s at 2.72M) on the clique-ish
      // near-dup graph that favors label-prop, and star's O(log n)
      // round bound is diameter-independent — the safer 100x default.
      runStar(pinned, "u", "v", maxIter)
        .select(col("member").cast(outType).as("member"),
          col("cluster_root").cast(outType).as("cluster_root"))
    } else {
      val pairs = pinned.collect().map(r => (r.getLong(0), r.getLong(1)))
      // union-find with path compression; roots canonicalized to the
      // component minimum afterwards
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      pairs.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      val members = parent.keys.toArray
      val minOfRoot = scala.collection.mutable.HashMap.empty[Long, Long]
      members.foreach { m =>
        val r = find(m)
        minOfRoot(r) = math.min(minOfRoot.getOrElse(r, m), m)
      }
      val out = members.map(m => (m, minOfRoot(find(m))))
      val spark = edges.sparkSession
      import spark.implicits._
      out.toSeq.toDF("member", "cluster_root")
        .select(col("member").cast(outType).as("member"),
          col("cluster_root").cast(outType).as("cluster_root"))
    }
  }
}
