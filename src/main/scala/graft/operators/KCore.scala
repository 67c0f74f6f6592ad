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

  /** localCheckpoint + plan-statistics reset. Checkpointing alone
    * truncates lineage but PRESERVES the origin plan's size estimate;
    * each peel round's join tree then MULTIPLIES the previous round's
    * BigInt estimate, and a deep peel chokes the driver on BigInteger
    * arithmetic during planning (measured: the maintenance spec sat at
    * 100% driver CPU inside multiplyToomCook3). */
  private def cps(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.ColumnBridge.checkpointStatsReset(df)

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
      .transform(cps)
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
        .transform(cps)
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
        .transform(cps)
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

  /** Maintain core numbers under an EDGE-INSERTION batch — the
    * incremental pattern of Sarıyüce et al. (VLDB 2013, "Streaming
    * algorithms for k-core decomposition"): instead of re-peeling the
    * whole graph per refresh, localize the work to the delta's
    * neighborhood. Insertion facts used:
    *   - core numbers never DECREASE when edges arrive;
    *   - inserting one edge changes only nodes whose core number
    *     equals k = min(core(u), core(v)), and only those reachable
    *     from that endpoint through nodes of core exactly k (the
    *     traversal theorem); each such node rises by at most 1.
    *
    * Batched formulation, sound by construction and driven to the true
    * fixpoint by an outer loop:
    *   1. seeds: per delta edge, the endpoint(s) sitting at the edge's
    *      min current core (plus every node promoted by the previous
    *      wave, at its new level);
    *   2. closure: expand each seed over neighbors with the SAME
    *      current core — the candidate set, per level;
    *   3. promotion test: peel the candidates at level k against
    *      target k+1, counting as support (a) fellow candidates still
    *      alive and (b) neighbors whose current core is already
    *      >= k+1 (their cores only rise, so they are provably in the
    *      new (k+1)-core). Survivors form a witness subgraph of the
    *      (k+1)-core — promotion is sound;
    *   4. repeat from 1 until no promotion fires (cascades across
    *      levels settle; cores only move up, so this terminates).
    *
    * Every step is keyed on node id (joins + aggregations over the
    * delta NEIGHBORHOOD, not the graph), so maintain cost tracks the
    * delta while from-scratch [[coreNumbers]] tracks the corpus —
    * the 100 TB refresh shape for a pair-graph store
    * ([[PairGraphStore]]) that ingests new documents' verified edges.
    *
    * `oldCores` must be [[coreNumbers]]' output (capped at `maxK`) on
    * `oldEdges`; the result equals `coreNumbers(oldEdges ∪ delta)`
    * at the same cap ([[KCoreSpec]] proves equality on planted and
    * randomized graphs, on both routes).
    *
    * Adaptive, like [[graft.dedup.ConnectedComponents.runAdaptive]]:
    * below `driverMaxEdges` the whole maintain runs as ONE driver-local
    * pass (edge-by-edge traversal + bucket peel — the literal Sarıyüce
    * algorithm, O(affected region) per inserted edge), because a
    * distributed maintain is a few dozen MICRO-jobs whose scheduling
    * overhead dwarfs the data; above it the wave-synchronous
    * distributed formulation runs. The crossover mirrors the CC
    * measurement (512k edges). */
  def maintainAfterInsert(
      oldCores: DataFrame,
      oldEdges: DataFrame,
      delta: DataFrame,
      srcCol: String,
      dstCol: String,
      maxK: Int,
      maxRounds: Int = 100,
      driverMaxEdges: Long = 512L * 1024): DataFrame = {
    require(maxK >= 1, s"maxK must be >= 1, got $maxK")
    def canon(df: DataFrame): DataFrame = df
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .distinct()
    val dCanon = cps(canon(delta))
    val oldCanon = cps(canon(oldEdges))
    if (oldCanon.count() + dCanon.count() <= driverMaxEdges)
      return maintainLocal(oldCores, oldCanon, dCanon, maxK)
    val allCanon = oldCanon.unionByName(dCanon).distinct()
    val nbr = allCanon
      .union(allCanon.select(col("b").as("a"), col("a").as("b")))
      .toDF("u", "v")
      .transform(cps)
    // current estimate: old cores, 0 for nodes the old graph never saw
    var cores = nbr.select(col("u").as("node")).distinct()
      .join(oldCores.select(col("node"),
        col("core_number").cast("int").as("k0")), Seq("node"), "left")
      .select(col("node"), coalesce(col("k0"), lit(0)).as("k"))
      .transform(cps)
    var promotedLast: Option[DataFrame] = None
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      // 1. seeds (node, lvl): delta endpoints at the edge's min
      // current core, re-derived against the CURRENT estimate each
      // wave, plus last wave's promotions at their new level
      val dk = dCanon
        .join(cores.select(col("node").as("a"), col("k").as("ka")), Seq("a"))
        .join(cores.select(col("node").as("b"), col("k").as("kb")), Seq("b"))
        .withColumn("lvl", least(col("ka"), col("kb")))
      val seedEdges = dk.filter(col("ka") === col("lvl"))
        .select(col("a").as("node"), col("lvl"))
        .unionByName(dk.filter(col("kb") === col("lvl"))
          .select(col("b").as("node"), col("lvl")))
      val seeds = promotedLast.fold(seedEdges)(seedEdges.unionByName)
        .filter(col("lvl") < maxK) // a promotion past the cap is out of contract
        .distinct()
      // 2. closure over same-core neighbors, all levels at once
      var cand = cps(seeds)
      var frontier = cand
      var fCount = frontier.count()
      while (fCount > 0) {
        val nxt = nbr
          .join(frontier.withColumnRenamed("node", "u"), Seq("u"))
          .select(col("v").as("node"), col("lvl"))
          .distinct()
          .join(cores, Seq("node"))
          .filter(col("k") === col("lvl"))
          .select(col("node"), col("lvl"))
          .join(cand, Seq("node", "lvl"), "left_anti")
          .transform(cps)
        cand = cand.unionByName(nxt).transform(cps)
        frontier = nxt
        fCount = frontier.count()
      }
      // 3. peel candidates at level k against target k+1
      var alive = cand
      var aliveCount = alive.count()
      var peeling = aliveCount > 0
      while (peeling) {
        val support = nbr
          .join(alive.withColumnRenamed("node", "u"), Seq("u"))
          .join(cores.select(col("node").as("v"), col("k").as("kv")), Seq("v"))
          .join(alive.select(col("node").as("v"), col("lvl"), lit(1).as("__av")),
            Seq("v", "lvl"), "left")
          .filter(col("__av").isNotNull || col("kv") >= col("lvl") + 1)
          .groupBy(col("u").as("node"), col("lvl"))
          .agg(count(lit(1)).as("s"))
        val next = alive
          .join(support, Seq("node", "lvl"), "left")
          .filter(coalesce(col("s"), lit(0L)) >= col("lvl") + 1)
          .select(col("node"), col("lvl"))
          .transform(cps)
        val nextCount = next.count()
        peeling = nextCount != aliveCount && nextCount > 0
        alive = next
        aliveCount = nextCount
      }
      // 4. promote survivors, re-seed from them. Only GENUINE raises
      // count as progress: a survivor seeded at lvl = its-core − 1
      // (the cascade re-seed below) "promotes" to its current core —
      // a no-op that must not keep the wave loop spinning.
      val promo = alive
        .join(cores, Seq("node"))
        .filter(col("lvl") + 1 > col("k"))
        .select(col("node"), (col("lvl") + 1).as("nk"))
        .transform(cps)
      val promoCount = promo.count()
      if (promoCount == 0) done = true
      else {
        cores = cores.join(promo, Seq("node"), "left")
          .select(col("node"),
            greatest(col("k"), coalesce(col("nk"), lit(0))).as("k"))
          .transform(cps)
        // re-seed a promoted node at its NEW level (it may cascade
        // further up) AND its old one: the promotion added support for
        // same-old-core neighbors, whose closure starts from here
        promotedLast = Some(
          promo.select(col("node"), col("nk").as("lvl"))
            .unionByName(promo.select(col("node"), (col("nk") - 1).as("lvl"))))
      }
      rounds += 1
    }
    require(done,
      s"incremental k-core did not settle in $maxRounds waves — raise maxRounds")
    cores.filter(col("k") >= 1).select(col("node"), col("k").as("core_number"))
  }

  /** Maintain core numbers under an EDGE-DELETION batch — the
    * decremental direction, via the frontier H-INDEX iteration (the
    * operator of Lü et al. 2016, "The H-index of a network node and
    * its relation to degree and coreness"): deletions only ever LOWER
    * core numbers, so the old cores are a pointwise UPPER BOUND on
    * the new ones, and iterating
    *
    *   c(v) ← min(c(v), H({c(u) : u ∈ N_kept(v)}))
    *
    * (H = the largest h with ≥ h neighbors valued ≥ h) from
    * init = min(old core, kept degree) converges EXACTLY to the kept
    * graph's core numbers:
    *   - invariant c ≥ core_new: v keeps ≥ core(v) same-core
    *     neighbors, whose values stay ≥ their cores inductively;
    *   - the limit is a fixpoint, so every S_k = {v : c(v) ≥ k} has
    *     min in-S_k degree ≥ k — a k-core witness, forcing c ≤ core;
    *   - monotone + integer + bounded below ⇒ termination.
    * Each round recomputes ONLY nodes with a changed neighbor (the
    * deleted edges' endpoints seed the frontier), so maintain cost
    * tracks the affected region — the insertion theorem's locality,
    * decremental side. (The same iteration cannot maintain
    * INSERTIONS: old cores are no upper bound there —
    * [[maintainAfterInsert]] keeps the traversal formulation.)
    *
    * `oldCores` must be [[coreNumbers]]' output (capped at `maxK`) on
    * `oldEdges`; the result equals `coreNumbers(oldEdges ∖ deleted)`
    * at the same cap (KCoreSpec: planted and randomized splits, both
    * routes). Deleting edges never present is a no-op for them —
    * replays converge. Adaptive at the usual 512k crossover. */
  def maintainAfterDelete(
      oldCores: DataFrame,
      oldEdges: DataFrame,
      deleted: DataFrame,
      srcCol: String,
      dstCol: String,
      maxK: Int,
      maxRounds: Int = 200,
      driverMaxEdges: Long = 512L * 1024): DataFrame = {
    require(maxK >= 1, s"maxK must be >= 1, got $maxK")
    def canon(df: DataFrame): DataFrame = df
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .distinct()
    val oldCanon = cps(canon(oldEdges))
    val delCanon = cps(canon(deleted))
    val kept = cps(oldCanon.join(delCanon, Seq("a", "b"), "left_anti"))
    if (oldCanon.count() <= driverMaxEdges)
      return maintainDeleteLocal(oldCores, kept, delCanon, maxK)
    val nbr = kept.union(kept.select(col("b").as("a"), col("a").as("b")))
      .toDF("u", "v").transform(cps)
    val deg = nbr.groupBy(col("u").as("node")).agg(count(lit(1)).as("d"))
    // init: min(old core, kept degree); isolated nodes drop out with
    // the deg inner join (their new core is 0 = absent, the
    // coreNumbers convention)
    var cores = deg
      .join(oldCores.select(col("node"),
        col("core_number").cast("int").as("k0")), Seq("node"), "left")
      .select(col("node"),
        least(coalesce(col("k0"), lit(maxK)), col("d").cast("int")).as("k"))
      .transform(cps)
    // frontier: nodes that lost an edge AND their neighbors — the
    // init step already lowered endpoint values through the degree
    // cap, and that drop must alert the neighborhood like any other
    val endpoints = delCanon.select(col("a").as("node"))
      .unionByName(delCanon.select(col("b").as("node")))
      .distinct()
    var frontier = endpoints
      .unionByName(nbr
        .join(endpoints.withColumnRenamed("node", "u"), Seq("u"))
        .select(col("v").as("node")))
      .distinct().transform(cps)
    var rounds = 0
    var fCount = frontier.count()
    while (fCount > 0 && rounds < maxRounds) {
      // H-index over neighbor values, recomputed for frontier nodes:
      // sort a node's neighbor values descending; H = max i with
      // v_i >= i (positional comparison over the sorted list)
      val hvals = nbr
        .join(frontier.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(cores.select(col("node").as("v"), col("k").as("kv")), Seq("v"))
        .groupBy(col("u").as("node"))
        .agg(collect_list(col("kv")).as("ks"))
        .select(col("node"), aggregate(
          zip_with(
            sort_array(col("ks"), asc = false),
            sequence(lit(1), size(col("ks"))),
            (kv, i) => when(kv >= i, lit(1)).otherwise(lit(0))),
          lit(0), (acc, x) => acc + x).as("h"))
      val next = cores
        .join(hvals, Seq("node"), "left")
        .select(col("node"),
          least(col("k"), coalesce(col("h"), col("k"))).as("k"))
        .transform(cps)
      val changed = next.join(cores.withColumnRenamed("k", "__old"), Seq("node"))
        .filter(col("k") < col("__old"))
        .select(col("node"))
        .transform(cps)
      // next frontier: neighbors of changed nodes (their H may drop)
      frontier = nbr
        .join(changed.withColumnRenamed("node", "u"), Seq("u"))
        .select(col("v").as("node")).distinct()
        .transform(cps)
      cores = next
      fCount = frontier.count()
      rounds += 1
    }
    require(fCount == 0,
      s"decremental k-core did not settle in $maxRounds rounds — raise maxRounds")
    cores.filter(col("k") >= 1).select(col("node"), col("k").as("core_number"))
  }

  /** Driver-local decremental maintain: the same frontier h-index
    * iteration over in-memory adjacency (worklist of nodes whose
    * neighborhood changed). */
  private def maintainDeleteLocal(
      oldCores: DataFrame,
      kept: DataFrame,
      delCanon: DataFrame,
      maxK: Int): DataFrame = {
    val spark = oldCores.sparkSession
    import scala.collection.mutable
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    kept.collect().foreach { r =>
      val a = r.getLong(0); val b = r.getLong(1)
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
      adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += a
    }
    val core = mutable.HashMap.empty[Long, Int]
    oldCores
      .select(col("node").cast("long").as("n"), col("core_number").cast("int").as("c"))
      .collect().foreach(r => core(r.getLong(0)) = r.getInt(1))
    val c = mutable.HashMap.empty[Long, Int]
    adj.keysIterator.foreach { v =>
      c(v) = math.min(core.getOrElse(v, maxK), adj(v).size)
    }
    def h(v: Long): Int = {
      val vals = adj(v).iterator.map(u => c(u)).toArray.sortInPlace()(Ordering[Int].reverse)
      var i = 0
      while (i < vals.length && vals(i) >= i + 1) i += 1
      i
    }
    val queue = mutable.ArrayDeque.empty[Long]
    val queued = mutable.HashSet.empty[Long]
    // endpoints AND their neighbors: the init's degree cap already
    // lowered endpoint values, which must alert the neighborhood
    delCanon.collect().foreach { r =>
      Seq(r.getLong(0), r.getLong(1)).foreach { v =>
        if (adj.contains(v)) {
          if (queued.add(v)) queue += v
          adj(v).foreach(u => if (queued.add(u)) queue += u)
        }
      }
    }
    while (queue.nonEmpty) {
      val v = queue.removeHead(); queued -= v
      val nv = math.min(c(v), h(v))
      if (nv < c(v)) {
        c(v) = nv
        adj(v).foreach(u => if (queued.add(u)) queue += u)
      }
    }
    import spark.implicits._
    c.iterator.filter(_._2 >= 1).map { case (n, k) => (n, k) }.toSeq
      .toDF("node", "core_number")
  }

  /** Driver-local maintain — the sequential traversal algorithm
    * verbatim: per inserted edge, a BFS over nodes at the edge's min
    * current core (the traversal theorem's candidate set) and a
    * bucket peel of the candidates against k+1, decrementing support
    * on removal. Work per edge is proportional to the AFFECTED REGION,
    * so a small append into a large collected graph costs its
    * neighborhood, not the graph; cascades across levels are handled
    * by processing edges sequentially (each insertion sees the cores
    * the previous one produced). */
  private def maintainLocal(
      oldCores: DataFrame,
      oldCanon: DataFrame,
      dCanon: DataFrame,
      maxK: Int): DataFrame = {
    val spark = oldCores.sparkSession
    import scala.collection.mutable
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    val present = mutable.HashSet.empty[(Long, Long)]
    def addEdge(a: Long, b: Long): Boolean =
      if (present.add((a, b))) {
        adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
        adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += a
        true
      } else false
    oldCanon.collect().foreach(r => addEdge(r.getLong(0), r.getLong(1)))
    val core = mutable.HashMap.empty[Long, Int].withDefaultValue(0)
    oldCores
      .select(col("node").cast("long").as("n"), col("core_number").cast("int").as("c"))
      .collect().foreach(r => core(r.getLong(0)) = r.getInt(1))
    // deterministic insertion order (the final cores are order-
    // independent — k-core is unique — but determinism keeps any
    // intermediate-state debugging reproducible). The traversal runs
    // for ALREADY-PRESENT delta edges too: with correct cores the
    // peel promotes nobody (a no-op), and with STALE cores — a
    // caller that crashed between appending edges and persisting
    // cores, then replayed the batch — it drives them to the true
    // fixpoint; this is what makes [[graft.operators.PairGraphStore]]
    // streaming maintenance replay-idempotent.
    val deltas = dCanon.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    for ((a, b) <- deltas) {
      addEdge(a, b)
      val k = math.min(core(a), core(b))
      if (k < maxK) {
        // candidates: BFS from the min-core endpoint(s) over core == k
        val cand = mutable.HashSet.empty[Long]
        val stack = mutable.ArrayDeque.empty[Long]
        if (core(a) == k) { cand += a; stack += a }
        if (core(b) == k && cand.add(b)) stack += b
        while (stack.nonEmpty) {
          val x = stack.removeLast()
          adj(x).foreach(y => if (core(y) == k && cand.add(y)) stack += y)
        }
        // peel against k+1: support = neighbors provably in the new
        // (k+1)-core (current core >= k+1) plus alive fellow candidates
        val support = mutable.HashMap.empty[Long, Int]
        cand.foreach { x =>
          support(x) = adj(x).count(y => core(y) >= k + 1 || cand.contains(y))
        }
        val alive = mutable.HashSet.empty[Long] ++ cand
        val dead = mutable.ArrayDeque.empty[Long]
        cand.foreach(x => if (support(x) < k + 1) dead += x)
        while (dead.nonEmpty) {
          val x = dead.removeLast()
          if (alive.remove(x))
            adj(x).foreach { y =>
              if (alive.contains(y)) {
                support(y) -= 1
                if (support(y) < k + 1) dead += y
              }
            }
        }
        alive.foreach(x => core(x) = k + 1)
      }
    }
    import spark.implicits._
    core.iterator.filter(_._2 >= 1).map { case (n, c) => (n, c) }.toSeq
      .toDF("node", "core_number")
  }
}
