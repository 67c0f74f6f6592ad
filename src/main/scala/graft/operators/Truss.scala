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
      driverMaxEdges: Long = 512L * 1024,
      assumeCanonical: Boolean = false): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    // assumeCanonical: the caller GUARANTEES a<b orientation, no self
    // loops, no duplicates (the PairGraphStore edge contract) — skips
    // the canonicalization shuffle + checkpoint (a whole exchange per
    // call on a store-served frame that is already materialized). The
    // truss is the unique maximal fixpoint of its input edge set, so
    // both paths produce identical rows on canonical input.
    val e0 =
      if (assumeCanonical)
        edges.select(col(srcCol).cast("long").as("a"),
          col(dstCol).cast("long").as("b"))
      else edges
        .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
        .filter(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
        .distinct()
        .localCheckpoint()
    if (k == 2) return if (assumeCanonical) e0.distinct() else e0
    if (e0.count() <= driverMaxEdges) kTrussDriver(e0, k)
    else kTrussDistributed(e0, k)
  }

  /** Node bound for the bitset driver peel: adjacency as one bit row
    * per node costs n²/8 bytes (16,384 nodes = 32 MB) — above it the
    * boxed-set formulation takes over. Harness-scale co-presence /
    * near-dup graphs are DENSE (avg degree >100), where per-edge
    * support via word-AND popcount beats per-element hash probes by
    * ~two orders of magnitude. */
  private val MaxBitsetNodes: Int = 1 << 14

  /** Dense-int edge index: ids sorted (so dense order preserves the
    * canonical a<b orientation), edges encoded (x<<32|y) and sorted
    * for binarySearch lookup. Shared by both bitset peels. */
  private final class DenseGraph(pairs: Array[(Long, Long)]) {
    val ids: Array[Long] = {
      val s = new java.util.TreeSet[java.lang.Long]()
      pairs.foreach { p => s.add(p._1); s.add(p._2) }
      val out = new Array[Long](s.size)
      val it = s.iterator(); var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
    val n: Int = ids.length
    private def ix(v: Long): Int = java.util.Arrays.binarySearch(ids, v)
    val m: Int = pairs.length
    // edges sorted by encoded (x, y); x<y because ids are rank-mapped
    val enc: Array[Long] = {
      val e = new Array[Long](m)
      var i = 0
      while (i < m) {
        val x = ix(pairs(i)._1); val y = ix(pairs(i)._2)
        e(i) = (x.toLong << 32) | (y.toLong & 0xffffffffL)
        i += 1
      }
      java.util.Arrays.sort(e); e
    }
    def ea(e: Int): Int = (enc(e) >>> 32).toInt
    def eb(e: Int): Int = (enc(e) & 0xffffffffL).toInt
    def edgeIdx(x: Int, y: Int): Int = {
      val (lo, hi) = if (x < y) (x, y) else (y, x)
      java.util.Arrays.binarySearch(enc, (lo.toLong << 32) | (hi.toLong & 0xffffffffL))
    }
    def lookup(a: Long, b: Long): Int = {
      val x = ix(a); val y = ix(b)
      if (x < 0 || y < 0) -1 else edgeIdx(x, y)
    }
    val words: Int = (n + 63) >>> 6
    /** flat adjacency bit rows over ALL edges (callers mutate or not). */
    def adjacency(): Array[Long] = {
      val adj = new Array[Long](n * words)
      var e = 0
      while (e < m) {
        val a = ea(e); val b = eb(e)
        adj(a * words + (b >>> 6)) |= 1L << (b & 63)
        adj(b * words + (a >>> 6)) |= 1L << (a & 63)
        e += 1
      }
      adj
    }
    def decode(e: Int): (Long, Long) = (ids(ea(e)), ids(eb(e)))
  }

  /** Driver-local peel (bounded by `driverMaxEdges`): a worklist of
    * edges whose support dropped below k−2 — the literal textbook
    * algorithm. Dense graphs under [[MaxBitsetNodes]] run the bitset
    * formulation (support = popcount of the two endpoints' adjacency
    * word-AND; removal clears two bits); larger node sets keep the
    * original boxed-set formulation. Both compute the same unique
    * maximal fixpoint (removal order never matters — TrussSpec pins
    * both against an independent simultaneous-sweep reference). */
  private def kTrussDriver(e0: DataFrame, k: Int): DataFrame =
    kTrussDriverImpl(e0, k, MaxBitsetNodes)

  private[operators] def kTrussDriverImpl(
      e0: DataFrame, k: Int, maxBitsetNodes: Int): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    val pairs = e0.collect().map(r => (r.getLong(0), r.getLong(1)))
    val distinctNodes = {
      val s = scala.collection.mutable.HashSet.empty[Long]
      pairs.foreach { p => s += p._1; s += p._2 }; s.size
    }
    if (distinctNodes <= maxBitsetNodes && pairs.nonEmpty) {
      val g = new DenseGraph(pairs)
      val w = g.words
      val adj = g.adjacency()
      val alive = Array.fill(g.m)(true)
      val queued = Array.fill(g.m)(true)
      val queue = new java.util.ArrayDeque[Integer](g.m)
      var i = 0
      while (i < g.m) { queue.add(i); i += 1 }
      val buf = new Array[Long](w)
      while (!queue.isEmpty) {
        val e = queue.poll().intValue(); queued(e) = false
        if (alive(e)) {
          val a = g.ea(e); val b = g.eb(e)
          var sup = 0
          var j = 0
          while (j < w) {
            val x = adj(a * w + j) & adj(b * w + j)
            buf(j) = x; sup += java.lang.Long.bitCount(x); j += 1
          }
          if (sup < k - 2) {
            alive(e) = false
            adj(a * w + (b >>> 6)) &= ~(1L << (b & 63))
            adj(b * w + (a >>> 6)) &= ~(1L << (a & 63))
            j = 0
            while (j < w) {
              var bits = buf(j)
              while (bits != 0L) {
                val wd = (j << 6) + java.lang.Long.numberOfTrailingZeros(bits)
                bits &= bits - 1
                val t1 = g.edgeIdx(a, wd); val t2 = g.edgeIdx(b, wd)
                if (t1 >= 0 && alive(t1) && !queued(t1)) { queue.add(t1); queued(t1) = true }
                if (t2 >= 0 && alive(t2) && !queued(t2)) { queue.add(t2); queued(t2) = true }
              }
              j += 1
            }
          }
        }
      }
      val out = (0 until g.m).iterator.filter(alive).map(g.decode).toSeq.sorted
      return out.toDF("a", "b")
    }
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

  /** Maintain the maximal k-truss edge set under an EDGE-INSERTION
    * batch — the edge-cohesion analogue of
    * [[KCore.maintainAfterInsert]], localizing work to the delta's
    * triangle neighborhood instead of re-peeling the graph (the
    * dynamic-graph direction of Huang et al., SIGMOD 2014, "Querying
    * k-truss community in large and dynamic graphs"). Insertion facts
    * used:
    *   - the k-truss only GROWS when edges arrive (a subgraph in which
    *     every edge has ≥ k−2 in-subgraph triangles stays valid under
    *     any superset), so `oldTruss` edges never leave;
    *   - every edge of T_new \ T_old is TRIANGLE-CONNECTED to a delta
    *     edge through new-truss triangles. Proof: let S be the
    *     new-truss edges NOT triangle-reachable from the delta. Each
    *     S edge's ≥ k−2 supporting triangles avoid delta edges and
    *     reachable edges (either would make it reachable), so they lie
    *     entirely within T_old ∪ S — an all-supported subgraph of the
    *     OLD graph, forcing S ⊆ T_old by T_old's maximality, i.e.
    *     S = ∅.
    *
    * So: (1) close the candidate set from the delta edges over
    * triangle adjacency across NON-truss edges (triangles tested in
    * the full grown graph — a superset of what is needed, sound);
    * (2) peel candidates against support counted within
    * T_old ∪ alive-candidates (old-truss edges are frozen support —
    * they cannot leave); survivors are exactly T_new \ T_old: the peel
    * fixpoint is the maximal all-supported candidate subset, and both
    * inclusions follow from the truss's maximality. Result:
    * `kTruss(oldEdges ∪ delta, k)`, which [[TrussSpec]] pins on
    * planted and randomized graphs over both routes.
    *
    * Adaptive like [[kTruss]]: below `driverMaxEdges` one driver-local
    * pass (closure BFS + worklist peel with support decrements);
    * above it, join-cascade rounds whose frames are candidate-sized,
    * not graph-sized. Replay-tolerant: an already-present delta edge
    * seeds a closure whose peel promotes nothing new (the stored
    * truss is already the fixpoint), so re-running a crashed batch
    * converges — what [[PairGraphStore.Handle.appendAndMaintainTruss]]
    * relies on. */
  def maintainAfterInsert(
      oldTruss: DataFrame,
      oldEdges: DataFrame,
      delta: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      driverMaxEdges: Long = 512L * 1024,
      assumeCanonical: Boolean = false): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    // assumeCanonical: see [[kTruss]] — skips two canonicalization
    // shuffles + checkpoints when the caller's frames carry the store
    // edge contract (a<b, distinct, no self loops) and are already
    // materialized (checkpointed/compacted); the maintain fixpoint is
    // set-determined, so rows are identical.
    def canon(df: DataFrame): DataFrame =
      if (assumeCanonical)
        df.select(col(srcCol).cast("long").as("a"),
          col(dstCol).cast("long").as("b"))
      else cps(df
        .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
        .filter(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
        .distinct())
    val dC = canon(delta)
    val oldC = canon(oldEdges)
    if (k == 2) return oldC.unionByName(dC).distinct()
    val tOld = cps(oldTruss
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b")))
    if (oldC.count() + dC.count() <= driverMaxEdges)
      maintainLocal(tOld, oldC, dC, k, MaxBitsetNodes)
    else maintainDistributed(tOld, oldC, dC, k)
  }

  /** Driver-local maintain: adjacency over the grown graph, candidate
    * closure as a BFS over triangle adjacency seeded at the delta,
    * then the textbook worklist peel restricted to candidates with
    * old-truss edges as frozen support. Work tracks the delta's
    * triangle neighborhood, not the graph. */
  private[operators] def maintainLocal(
      tOld: DataFrame, oldC: DataFrame, dC: DataFrame, k: Int,
      maxBitsetNodes: Int): DataFrame = {
    val spark = tOld.sparkSession
    import spark.implicits._
    import scala.collection.mutable
    def pair(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val oldPairs = oldC.collect().map(pair)
    val dPairs = dC.collect().map(pair)
    val grownNodes = {
      val s = mutable.HashSet.empty[Long]
      oldPairs.foreach { p => s += p._1; s += p._2 }
      dPairs.foreach { p => s += p._1; s += p._2 }
      s.size
    }
    // bitset formulation for dense driver-bounded graphs — identical
    // closure + peel over word-AND witnesses (see kTrussDriverImpl)
    if (grownNodes <= maxBitsetNodes && (oldPairs.nonEmpty || dPairs.nonEmpty)) {
      val grown = {
        val s = mutable.LinkedHashSet.empty[(Long, Long)]
        oldPairs.foreach(s += _); dPairs.foreach(s += _)
        s.toArray
      }
      val g = new DenseGraph(grown)
      val w = g.words
      val adj = g.adjacency() // STATIC: the peel uses flags, not removal
      val inTruss = new Array[Boolean](g.m)
      tOld.collect().foreach { r =>
        val e = g.lookup(r.getLong(0), r.getLong(1))
        if (e >= 0) inTruss(e) = true
      }
      val cand = new Array[Boolean](g.m)
      val aliveF = new Array[Boolean](g.m)
      val support = new Array[Int](g.m)
      val buf = new Array[Long](w)
      def witsInto(a: Int, b: Int): Unit = {
        var j = 0
        while (j < w) { buf(j) = adj(a * w + j) & adj(b * w + j); j += 1 }
      }
      // 1. candidate closure from the delta over triangle adjacency
      val queue = new java.util.ArrayDeque[Integer]()
      dPairs.foreach { p =>
        val e = g.lookup(p._1, p._2)
        if (e >= 0 && !inTruss(e) && !cand(e)) { cand(e) = true; queue.add(e) }
      }
      while (!queue.isEmpty) {
        val e = queue.poll().intValue()
        val a = g.ea(e); val b = g.eb(e)
        witsInto(a, b)
        var j = 0
        while (j < w) {
          var bits = buf(j)
          while (bits != 0L) {
            val wd = (j << 6) + java.lang.Long.numberOfTrailingZeros(bits)
            bits &= bits - 1
            val e1 = g.edgeIdx(a, wd); val e2 = g.edgeIdx(b, wd)
            if (e1 >= 0 && !inTruss(e1) && !cand(e1)) { cand(e1) = true; queue.add(e1) }
            if (e2 >= 0 && !inTruss(e2) && !cand(e2)) { cand(e2) = true; queue.add(e2) }
          }
          j += 1
        }
      }
      // 2. peel candidates; support = triangles whose other two edges
      // are in (old truss ∪ alive candidates)
      var i = 0
      while (i < g.m) { aliveF(i) = cand(i); i += 1 }
      def present(e: Int): Boolean = inTruss(e) || aliveF(e)
      val dead = new java.util.ArrayDeque[Integer]()
      i = 0
      while (i < g.m) {
        if (cand(i)) {
          val a = g.ea(i); val b = g.eb(i)
          witsInto(a, b)
          var sup = 0
          var j = 0
          while (j < w) {
            var bits = buf(j)
            while (bits != 0L) {
              val wd = (j << 6) + java.lang.Long.numberOfTrailingZeros(bits)
              bits &= bits - 1
              val e1 = g.edgeIdx(a, wd); val e2 = g.edgeIdx(b, wd)
              if (e1 >= 0 && e2 >= 0 && present(e1) && present(e2)) sup += 1
            }
            j += 1
          }
          support(i) = sup
          if (sup < k - 2) dead.add(i)
        }
        i += 1
      }
      while (!dead.isEmpty) {
        val e = dead.poll().intValue()
        if (aliveF(e)) {
          aliveF(e) = false
          val a = g.ea(e); val b = g.eb(e)
          witsInto(a, b)
          var j = 0
          while (j < w) {
            var bits = buf(j)
            while (bits != 0L) {
              val wd = (j << 6) + java.lang.Long.numberOfTrailingZeros(bits)
              bits &= bits - 1
              val e1 = g.edgeIdx(a, wd); val e2 = g.edgeIdx(b, wd)
              if (e1 >= 0 && e2 >= 0 && present(e1) && present(e2)) {
                if (aliveF(e1)) {
                  support(e1) -= 1
                  if (support(e1) == k - 3) dead.add(e1)
                }
                if (aliveF(e2)) {
                  support(e2) -= 1
                  if (support(e2) == k - 3) dead.add(e2)
                }
              }
            }
            j += 1
          }
        }
      }
      val out = (0 until g.m).iterator
        .filter(e => inTruss(e) || aliveF(e)).map(g.decode).toSeq.sorted
      return out.toDF("a", "b")
    }
    val adj = mutable.HashMap.empty[Long, mutable.HashSet[Long]]
    val all = mutable.HashSet.empty[(Long, Long)]
    def addEdge(a: Long, b: Long): Unit = if (all.add((a, b))) {
      adj.getOrElseUpdate(a, mutable.HashSet.empty) += b
      adj.getOrElseUpdate(b, mutable.HashSet.empty) += a
    }
    oldPairs.foreach { case (a, b) => addEdge(a, b) }
    dPairs.foreach { case (a, b) => addEdge(a, b) }
    val inTruss = mutable.HashSet.empty[(Long, Long)]
    tOld.collect().foreach(r => inTruss += pair(r))
    def cn(x: Long, y: Long): (Long, Long) = (math.min(x, y), math.max(x, y))
    // common neighbors of an edge's endpoints (triangles in the grown graph)
    def wits(a: Long, b: Long): Iterator[Long] = {
      val (s, l) = if (adj(a).size <= adj(b).size) (adj(a), adj(b)) else (adj(b), adj(a))
      s.iterator.filter(w => w != a && w != b && l.contains(w))
    }
    // 1. candidate closure from the delta over triangle adjacency
    val cand = mutable.HashSet.empty[(Long, Long)]
    val queue = mutable.ArrayDeque.empty[(Long, Long)]
    dPairs.foreach { e => if (!inTruss.contains(e) && cand.add(e)) queue += e }
    while (queue.nonEmpty) {
      val (a, b) = queue.removeHead()
      wits(a, b).foreach { w =>
        Seq(cn(a, w), cn(b, w)).foreach { e =>
          if (!inTruss.contains(e) && cand.add(e)) queue += e
        }
      }
    }
    // 2. peel candidates; support = triangles whose other two edges are
    // in (old truss ∪ alive candidates)
    val alive = mutable.HashSet.empty[(Long, Long)] ++ cand
    def present(e: (Long, Long)): Boolean = inTruss.contains(e) || alive.contains(e)
    val support = mutable.HashMap.empty[(Long, Long), Int]
    cand.foreach { case e @ (a, b) =>
      support(e) = wits(a, b).count(w => present(cn(a, w)) && present(cn(b, w)))
    }
    val dead = mutable.ArrayDeque.empty[(Long, Long)]
    cand.foreach(e => if (support(e) < k - 2) dead += e)
    while (dead.nonEmpty) {
      val e @ (a, b) = dead.removeHead()
      if (alive.remove(e))
        wits(a, b).foreach { w =>
          val e1 = cn(a, w); val e2 = cn(b, w)
          if (present(e1) && present(e2))
            Seq(e1, e2).foreach { f =>
              if (alive.contains(f)) {
                support(f) -= 1
                if (support(f) == k - 3) dead += f
              }
            }
        }
    }
    (inTruss.iterator ++ alive.iterator).toSeq.sorted.toDF("a", "b")
  }

  /** Maintain the maximal k-truss under an EDGE-DELETION batch — the
    * decremental direction: deletions only ever SHRINK the truss
    * (T_new ⊆ T_old ∖ D), and every edge that LEAVES is
    * triangle-connected to a deleted edge within the old truss.
    * Proof: let S = (T_old ∖ D) ∖ T_new be the evicted survivors not
    * triangle-reachable from D inside T_old. Un-evicted edges
    * (T_new) plus unreachable-evicted edges (S) support each other:
    * an S edge had ≥ k−2 triangles in T_old; a triangle lost only if
    * it used a D edge (making the S edge reachable — contradiction)
    * or an evicted reachable edge (same, transitively). So T_new ∪ S
    * is all-supported in the kept graph, forcing S ⊆ T_new by
    * maximality — S = ∅.
    *
    * So: close candidates from the deleted edges over triangle
    * adjacency within T_old (kept side), peel candidates against
    * support counted within (non-candidate kept truss edges frozen ∪
    * alive candidates); survivors stay, the rest leave. Result equals
    * `kTruss(oldEdges ∖ deleted, k)` (TrussSpec, both routes).
    * Replay-tolerant: re-deleting absent edges seeds an empty closure.
    * Driver-local below `driverMaxEdges`, join cascades above. */
  def maintainAfterDelete(
      oldTruss: DataFrame,
      oldEdges: DataFrame,
      deleted: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      driverMaxEdges: Long = 512L * 1024): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    def canon(df: DataFrame): DataFrame = df
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .distinct()
    val oldC = cps(canon(oldEdges))
    val delC = cps(canon(deleted))
    val tOld = cps(oldTruss
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b")))
    val tKept = cps(tOld.join(delC, Seq("a", "b"), "left_anti"))
    if (k == 2) return tKept
    if (oldC.count() <= driverMaxEdges)
      return maintainDeleteLocal(tOld, tKept, delC, k)
    // candidates: kept-truss edges triangle-connected to a deleted
    // edge WITHIN the old truss (closure over old-truss triangles)
    val tOldSym = cps(tOld.select(col("a").as("u"), col("b").as("w"))
      .union(tOld.select(col("b").as("u"), col("a").as("w"))))
    var cand = cps(tKept.limit(0))
    var frontier = cps(delC.join(tOld, Seq("a", "b"), "left_semi"))
    var fCount = frontier.count()
    while (fCount > 0) {
      val fSym = frontier.select(col("a").as("u"), col("b").as("v"))
        .union(frontier.select(col("b").as("u"), col("a").as("v")))
      val tri = fSym.join(tOldSym, Seq("u"))
        .filter(col("w") =!= col("v"))
        .join(tOld.select(col("a").as("__ca"), col("b").as("__cb")),
          least(col("v"), col("w")) === col("__ca") &&
            greatest(col("v"), col("w")) === col("__cb"), "left_semi")
      val nxt = tri.select(
          least(col("u"), col("w")).as("a"), greatest(col("u"), col("w")).as("b"))
        .distinct()
        .join(tKept, Seq("a", "b"), "left_semi")
        .join(cand, Seq("a", "b"), "left_anti")
        .join(frontier, Seq("a", "b"), "left_anti")
        .transform(cps)
      cand = cand.unionByName(nxt).transform(cps)
      frontier = nxt
      fCount = frontier.count()
    }
    // peel candidates against support within (frozen kept-truss ∪
    // alive candidates) — the frozen side are kept-truss edges NOT in
    // the candidate set (they provably stay; their support never
    // involved a deleted or reachable edge)
    val frozen = cps(tKept.join(cand, Seq("a", "b"), "left_anti"))
    var alive = cand
    var aliveCount = alive.count()
    var peeling = aliveCount > 0
    while (peeling) {
      val present = cps(frozen.unionByName(alive))
      val presentSym = present.select(col("a").as("u"), col("b").as("w"))
        .union(present.select(col("b").as("u"), col("a").as("w")))
      val sup = alive.join(presentSym.withColumnRenamed("u", "a"), Seq("a"))
        .filter(col("w") =!= col("b"))
        .join(present.select(col("a").as("__pa"), col("b").as("__pb")),
          least(col("b"), col("w")) === col("__pa") &&
            greatest(col("b"), col("w")) === col("__pb"), "left_semi")
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      val next = alive.join(sup, Seq("a", "b"), "left")
        .filter(coalesce(col("n"), lit(0L)) >= (k - 2).toLong)
        .select(col("a"), col("b"))
        .transform(cps)
      val nextCount = next.count()
      peeling = nextCount != aliveCount && nextCount > 0
      alive = next
      aliveCount = nextCount
    }
    frozen.unionByName(alive)
  }

  /** Driver-local decremental maintain: closure BFS over old-truss
    * triangle adjacency from the deleted edges, then the worklist
    * peel restricted to candidates with frozen kept-truss support. */
  private def maintainDeleteLocal(
      tOld: DataFrame, tKept: DataFrame, delC: DataFrame, k: Int): DataFrame = {
    val spark = tOld.sparkSession
    import spark.implicits._
    import scala.collection.mutable
    def pair(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val oldT = tOld.collect().map(pair).toSet
    val keptT = mutable.HashSet.empty[(Long, Long)] ++ tKept.collect().map(pair)
    val delP = delC.collect().map(pair).filter(oldT.contains)
    // adjacency of the OLD truss (closure runs inside it)
    val adj = mutable.HashMap.empty[Long, mutable.HashSet[Long]]
    oldT.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.HashSet.empty) += b
      adj.getOrElseUpdate(b, mutable.HashSet.empty) += a
    }
    def cn(x: Long, y: Long) = (math.min(x, y), math.max(x, y))
    def wits(a: Long, b: Long): Iterator[Long] = {
      val (s, l) = if (adj(a).size <= adj(b).size) (adj(a), adj(b)) else (adj(b), adj(a))
      s.iterator.filter(w => w != a && w != b && l.contains(w))
    }
    val cand = mutable.HashSet.empty[(Long, Long)]
    val queue = mutable.ArrayDeque.empty[(Long, Long)]
    delP.foreach { e => queue += e }
    val seen = mutable.HashSet.empty[(Long, Long)] ++ delP
    while (queue.nonEmpty) {
      val (a, b) = queue.removeHead()
      wits(a, b).foreach { w =>
        Seq(cn(a, w), cn(b, w)).foreach { e =>
          if (oldT.contains(e) && seen.add(e)) {
            if (keptT.contains(e)) cand += e
            queue += e
          }
        }
      }
    }
    // peel candidates; kept-truss non-candidates are frozen support.
    // Adjacency now over KEPT truss edges only
    val kAdj = mutable.HashMap.empty[Long, mutable.HashSet[Long]]
    keptT.foreach { case (a, b) =>
      kAdj.getOrElseUpdate(a, mutable.HashSet.empty) += b
      kAdj.getOrElseUpdate(b, mutable.HashSet.empty) += a
    }
    val alive = mutable.HashSet.empty[(Long, Long)] ++ cand
    def present(e: (Long, Long)): Boolean =
      (keptT.contains(e) && !cand.contains(e)) || alive.contains(e)
    def kwits(a: Long, b: Long): Iterator[Long] = {
      val sa = kAdj.getOrElse(a, mutable.HashSet.empty)
      val sb = kAdj.getOrElse(b, mutable.HashSet.empty)
      val (s, l) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
      s.iterator.filter(w => w != a && w != b && l.contains(w))
    }
    val support = mutable.HashMap.empty[(Long, Long), Int]
    cand.foreach { case e @ (a, b) =>
      support(e) = kwits(a, b).count(w => present(cn(a, w)) && present(cn(b, w)))
    }
    val dead = mutable.ArrayDeque.empty[(Long, Long)]
    cand.foreach(e => if (support(e) < k - 2) dead += e)
    while (dead.nonEmpty) {
      val e @ (a, b) = dead.removeHead()
      if (alive.remove(e))
        kwits(a, b).foreach { w =>
          val e1 = cn(a, w); val e2 = cn(b, w)
          if (present(e1) && present(e2))
            Seq(e1, e2).foreach { f =>
              if (alive.contains(f)) {
                support(f) -= 1
                if (support(f) == k - 3) dead += f
              }
            }
        }
    }
    (keptT.iterator.filter(e => !cand.contains(e)) ++ alive.iterator)
      .toSeq.sorted.toDF("a", "b")
  }

  /** Distributed maintain: the same closure + restricted peel as
    * join cascades. Every frame is candidate-neighborhood-sized; the
    * grown graph appears only as the join's probe side. */
  private def maintainDistributed(
      tOld: DataFrame, oldC: DataFrame, dC: DataFrame, k: Int): DataFrame = {
    val all = cps(oldC.unionByName(dC).distinct())
    val allSym = cps(all.select(col("a").as("u"), col("b").as("w"))
      .union(all.select(col("b").as("u"), col("a").as("w"))))
    // 1. candidate closure rounds
    var cand = cps(dC.join(tOld, Seq("a", "b"), "left_anti"))
    var frontier = cand
    var fCount = frontier.count()
    while (fCount > 0) {
      val fSym = frontier.select(col("a").as("u"), col("b").as("v"))
        .union(frontier.select(col("b").as("u"), col("a").as("v")))
      // triangles (u, v, w) through a frontier edge: w adjacent to u,
      // closing edge (v, w) present in the grown graph
      val tri = fSym.join(allSym, Seq("u"))
        .filter(col("w") =!= col("v"))
        .join(all.select(col("a").as("__ca"), col("b").as("__cb")),
          least(col("v"), col("w")) === col("__ca") &&
            greatest(col("v"), col("w")) === col("__cb"), "left_semi")
      val nxt = tri.select(
          least(col("u"), col("w")).as("a"), greatest(col("u"), col("w")).as("b"))
        .distinct()
        .join(tOld, Seq("a", "b"), "left_anti")
        .join(cand, Seq("a", "b"), "left_anti")
        .transform(cps)
      cand = cand.unionByName(nxt).transform(cps)
      frontier = nxt
      fCount = frontier.count()
    }
    // 2. peel candidates against support within tOld ∪ alive
    var alive = cand
    var aliveCount = alive.count()
    var peeling = aliveCount > 0
    while (peeling) {
      val present = cps(tOld.unionByName(alive))
      val presentSym = present.select(col("a").as("u"), col("b").as("w"))
        .union(present.select(col("b").as("u"), col("a").as("w")))
      val sup = alive.join(presentSym.withColumnRenamed("u", "a"), Seq("a"))
        .filter(col("w") =!= col("b"))
        .join(present.select(col("a").as("__pa"), col("b").as("__pb")),
          least(col("b"), col("w")) === col("__pa") &&
            greatest(col("b"), col("w")) === col("__pb"), "left_semi")
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      val next = alive.join(sup, Seq("a", "b"), "left")
        .filter(coalesce(col("n"), lit(0L)) >= (k - 2).toLong)
        .select(col("a"), col("b"))
        .transform(cps)
      val nextCount = next.count()
      peeling = nextCount != aliveCount && nextCount > 0
      alive = next
      aliveCount = nextCount
    }
    tOld.unionByName(alive)
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
