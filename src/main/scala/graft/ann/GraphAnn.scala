package graft.ann

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}
import graft.operators.{KeyPrune, Partitioning, SwapDir}

/** Graph-based ANN — greedy beam search over a kNN neighborhood graph,
  * the DiskANN/HNSW family (Subramanya et al. NeurIPS 2019; Malkov &
  * Yashunin TPAMI 2020): the family that serves a query by WALKING a
  * precomputed proximity graph from a fixed entry point instead of
  * probing hash buckets (SRP/LSH) or centroid cells (IVF). Completes
  * the engine's ANN inventory — brute / LSH / IVF / PQ / OPQ hybrids
  * all exist; the navigable-graph family did not. (Reference scope:
  * nvd2mysqlloader has no vector surface — mandated ANN extension
  * set.)
  *
  * Search shape per hop (the batched "ef-search" generalization):
  * every query expands its current top-`beam` unexpanded nodes at
  * once — one pruned adjacency read for the hop's frontier-node SET,
  * one candidate-pruned vector read to score the newly discovered
  * nodes, visited set grows monotonically, stop when every query's
  * top-`beam` is fully expanded (or `maxHops`). All tie-breaks are on
  * node id, the entry point is fixed (smallest id), and the graph
  * build is seeded-free/deterministic — so the walk, and therefore
  * the result, is reproducible across layouts and engines.
  *
  * Scale shape: per hop the adjacency read is pruned to the frontier's
  * node set and the vector read to the hop's fresh candidates (both
  * via [[KeyPrune]] — literal pushdown under the cap, broadcast
  * semi-join above it), so a serve touches O(hops × beam × degree)
  * graph rows regardless of corpus size — the DiskANN on-disk-graph
  * argument. State (the per-query visited set) is bounded by the same
  * product and localCheckpoint'd per hop. The EXACT kNN build is
  * all-pairs (the q64 convention — correct at oracle scale and the
  * exhaustive-twin route); [[buildKnnGraphApprox]] is the 100 TB build
  * path (kNN among SRP-LSH candidate pairs — bucket-local candidate
  * generation, no quadratic step), which changes the graph, not the
  * serve.
  */
object GraphAnn {

  /** Exact kNN graph: for each node its `k` nearest by 4dp-quantized
    * cosine (ties on smaller id — the repo's determinism convention,
    * shared with the approx build so the two rank identically), as
    * directed (src, dst) edges. Top-k per node runs as the
    * partial-aggregating [[graft.functions.BottomK]] UDAF — every map
    * task keeps at most k candidates per src, so the quadratic pair
    * stream never SHUFFLES (a `row_number` window would move all n²
    * scored pairs; measured 5x slower at sf0.1). `withRing` unions the
    * deterministic successor ring in id order (each node points at the
    * next-larger id, the largest back at the smallest) — the
    * strong-connectivity backbone that keeps greedy search from
    * stranding in a clique the entry point cannot reach (the role of
    * DiskANN's medoid-rooted RobustPrune paths / HNSW's upper layers,
    * in the cheapest deterministic form). */
  def buildKnnGraph(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      withRing: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = Partitioning.spread(vectors)
      .select(col(idCol).cast("long").as("src"), col(vecCol).as("va"),
        VF.l2Norm(col(vecCol)).as("na"))
    val b = vectors.select(col(idCol).cast("long").as("dst"),
      col(vecCol).as("vb"), VF.l2Norm(col(vecCol)).as("nb"))
    val knn = a.join(b, col("src") =!= col("dst"))
      .withColumn("cos",
        VF.cosineWithNorms(VF.dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos").isNotNull)
      .groupBy(col("src"))
      .agg(graft.functions.BottomK.of(
        -round(col("cos") * 1e4).cast("long"), col("dst"), k).as("__dsts"))
      .select(col("src"), explode(col("__dsts")).as("dst"))
    if (!withRing) knn
    else knn.union(ringEdges(vectors, idCol)).distinct()
  }

  /** Successor ring in global id order, WITHOUT a single-partition
    * window (the naive `Window.orderBy(src)` form moves every id to
    * one task — an 8-byte-per-row projection, harmless at harness
    * scale, but a genuine single-task global sort at billions of
    * ids): range-partition by id, `lead` within each partition, then
    * stitch the partition boundaries — last id of each non-empty
    * range links to the next range's first id, the global last back
    * to the global first. The boundary frame is partition-count-sized
    * (driver-safe by construction) and the result is the SAME ring
    * for any layout: range partitioning is a global sort split into
    * contiguous runs, so per-partition lead + boundary stitch equals
    * the global lead edge for edge. */
  private def ringEdges(vectors: DataFrame, idCol: String): DataFrame = {
    val spark = vectors.sparkSession
    val parted = vectors.select(col(idCol).cast("long").as("src"))
      .repartitionByRange(col("src"))
      .withColumn("__p", spark_partition_id())
      .localCheckpoint() // two consumers (lead + bounds) of one shuffle
    val w = Window.partitionBy(col("__p")).orderBy(col("src"))
    val bounds = parted.groupBy(col("__p"))
      .agg(min(col("src")).as("f"), max(col("src")).as("l"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    if (bounds.isEmpty) return parted.select(col("src"), col("src").as("dst"))
      .limit(0)
    val succ: Seq[(Long, Long)] =
      bounds.sliding(2).collect { case Array((_, _, la), (_, fb, _)) =>
        la -> fb }.toSeq :+ (bounds.last._3 -> bounds.head._2)
    import spark.implicits._
    val succDf = succ.toDF("src", "__succ")
    parted
      .withColumn("dst", lead(col("src"), 1).over(w))
      .join(broadcast(succDf), Seq("src"), "left")
      .select(col("src"), coalesce(col("dst"), col("__succ")).as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  /** The 100 TB build path: kNN edges chosen among SRP-LSH candidate
    * pairs ([[Ann.lshNearDupPairsReleasable]] with the threshold open)
    * instead of all pairs — candidate generation is bucket-join-local,
    * cosine runs once per DISTINCT candidate pair, and the per-node
    * top-k is the same partial-aggregating BottomK over the (sparse)
    * candidate edges as the exact build's. The graph
    * differs from the exact build where LSH misses a true neighbor
    * (GraphAnnSpec measures the served recall through it); the serve
    * contract is unchanged.
    *
    * Family sizing: candidate richness per node tracks the expected
    * bucket population n/2^nBits — pick nBits ≈ log2(n / wanted
    * candidates-per-table) and spend `tables` for recall (the harness
    * corpus at n=500 serves recall 0.94-0.98 across the nBits=4 row
    * of the [[graft.GraphAnnProbe]] grid; nBits=8 is the
    * million-vector sizing and reads 0.68 on 500). */
  def buildKnnGraphApprox(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nBits: Int = 8,
      tables: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      withRing: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val (pairs, release) = Ann.lshNearDupPairsReleasable(
      vectors, idCol, vecCol, threshold = -2.0, nBits, tables, dim, seed)
    val sym = pairs
      .select(col("vec_a").as("src"), col("vec_b").as("dst"), col("cos"))
      .unionByName(pairs
        .select(col("vec_b").as("src"), col("vec_a").as("dst"), col("cos")))
    // same 4dp BottomK ranking as the exact build (pairs' cos is
    // already 4dp-rounded, so the quantization is a no-op here)
    val knn = sym
      .groupBy(col("src"))
      .agg(graft.functions.BottomK.of(
        -round(col("cos") * 1e4).cast("long"), col("dst"), k).as("__dsts"))
      .select(col("src"), explode(col("__dsts")).as("dst"))
    val out = (if (!withRing) knn
      else knn.union(ringEdges(vectors, idCol)).distinct())
      .localCheckpoint() // materialize before releasing the postings cache
    release()
    out
  }

  /** All-pairs directed id graph — the provably-exhaustive serve
    * twin's input: hop 1 from ANY entry discovers every node, so the
    * beam walk degenerates to brute force for any beam (no kNN
    * ranking pass needed — only the id pairs matter). */
  def completeGraph(vectors: DataFrame, idCol: String): DataFrame = {
    val ids = vectors.select(col(idCol).cast("long").as("src"))
    ids.join(ids.select(col("src").as("dst")), col("src") =!= col("dst"))
  }

  /** Batched greedy beam search over `graph` from the smallest-id
    * entry point. Output: (query_id, neighbor_id, cos, rnk) — top-`k`
    * VISITED nodes per query by (cos desc, id).
    *
    * On a COMPLETE graph (`buildKnnGraph(k = n-1)`) hop 1 discovers
    * every node, so the result provably equals brute force for any
    * beam — the exhaustive-twin argument (q71b's, through the walk). */
  def topK(
      graph: DataFrame,
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      k: Int,
      beam: Int,
      maxHops: Int): DataFrame =
    topKImpl(graph, vectors, queries, idCol, vecCol, qidCol, qvecCol,
      k, beam, maxHops, None)

  /** FILTERED graph-ANN (the quintet's fifth route): top-`k` within a
    * metadata-allowed id set. The walk NAVIGATES unfiltered —
    * disallowed nodes stay valid waypoints, the filtered-DiskANN
    * insight: filtering the traversal would disconnect the graph
    * exactly when the filter is selective — and the allowed predicate
    * lands as a semi-join on the VISITED frame before the final rank,
    * so `rnk` counts allowed neighbors only and the (possibly
    * corpus-sized) allowed frame is never collected. */
  def topKFiltered(
      graph: DataFrame,
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      allowed: DataFrame,
      allowedCol: String,
      k: Int,
      beam: Int,
      maxHops: Int): DataFrame =
    topKImpl(graph, vectors, queries, idCol, vecCol, qidCol, qvecCol,
      k, beam, maxHops,
      Some(allowed.select(col(allowedCol).cast("long").as("node"))))

  private def topKImpl(
      graph: DataFrame,
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      k: Int,
      beam: Int,
      maxHops: Int,
      allowed: Option[DataFrame]): DataFrame = {
    // cut the build plans ONCE: the walk re-reads both frames every
    // hop, and an un-checkpointed graph argument would re-run its
    // (possibly quadratic) build per hop
    val adj = graph.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .localCheckpoint()
    val vecs = vectors.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("v"), VF.l2Norm(col(vecCol)).as("n"))
      .localCheckpoint()
    val entry = vecs.agg(min(col("id"))).collect()(0).getLong(0)
    beamSearch(adj, vecs, queries, qidCol, qvecCol, k, beam, maxHops,
      entry, allowed)
  }

  /** Micro-serve caps (the SrpStore v5 idiom): query batches at or
    * under `MaxDriverQueries` walk DRIVER-SIDE — two pruned-read jobs
    * per hop (frontier adjacency, fresh-candidate vectors) instead of
    * the distributed walk's ~20 (window + checkpoint + anti-join
    * stages per hop, measured 227 jobs / ~9 s for a 10-query serve at
    * sf0.1). Results are BIT-IDENTICAL: driver cosine replays the
    * kernel's left-to-right double accumulation on the same stored
    * norms, and expansion/termination/tie-break rules are the same
    * code shape. Blowing `MaxDriverFrontier` (hop literal) or
    * `MaxDriverVectors` (cached vector rows) mid-walk falls back to
    * the distributed route from scratch — caps are CONSTANT in corpus
    * size, so the micro route never collects corpus-sized state. */
  private val MaxDriverQueries = 64
  private val MaxDriverFrontier = 2048
  private val MaxDriverVectors = 100000

  /** Largest id set fetched as an `isin` literal predicate (converts
    * to InSet and reaches the parquet scan as a row-group skip). A
    * hop against a high-degree / complete-graph store can discover
    * far more fresh nodes than this — building a 100k-element In
    * expression is slow at PLAN time even though execution is fine —
    * so larger fetches route through [[KeyPrune.restrict]]'s
    * broadcast semi-join like the distributed path. */
  private[ann] val MaxInLiteralIds = 4096

  /** The micro-walk's per-fetch vector read, pruned to the missing id
    * set by whichever route is cheap at the set's size (see
    * [[MaxInLiteralIds]]). Both routes return the same rows — the
    * semi-join is a set-membership restriction, exactly the InSet
    * semantics. */
  private[ann] def prunedVecRead(
      vecs: DataFrame,
      missing: Seq[Long],
      spark: SparkSession,
      maxLiteral: Int = MaxInLiteralIds): DataFrame =
    if (missing.size <= maxLiteral)
      vecs.filter(col("id").isin(missing: _*))
    else {
      import spark.implicits._
      KeyPrune.restrict(vecs, missing.toDF("id"), Seq("id"))
    }

  /** The shared walk — also the store's serve path, which passes its
    * sorted on-disk frames so the per-hop [[KeyPrune]] predicates
    * reach the parquet scans as row-group skips. */
  private[ann] def beamSearch(
      adj: DataFrame,
      vecs: DataFrame,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int,
      beam: Int,
      maxHops: Int,
      entry: Long,
      allowed: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && beam >= 1 && maxHops >= 1,
      s"k/beam/maxHops must be >= 1, got ($k, $beam, $maxHops)")
    val spark = adj.sparkSession
    val qs = queries.select(col(qidCol).cast("long").as("qid"),
        col(qvecCol).as("qv"), VF.l2Norm(col(qvecCol)).as("qn"))
      .localCheckpoint()
    val qSample = qs.limit(MaxDriverQueries + 1).collect()
    if (qSample.length <= MaxDriverQueries) {
      driverWalk(adj, vecs, qSample, spark, k, beam, maxHops, entry,
          allowed) match {
        case Some(out) => return out
        case None => // a cap blew mid-walk: distributed from scratch
      }
    }
    distributedWalk(adj, vecs, qs, k, beam, maxHops, entry, allowed)
  }

  /** Kernel-order dot: left-to-right double accumulation, identical
    * to [[graft.functions.DotProduct]]'s generated loop. */
  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def vecD(raw: Seq[Any]): Array[Double] = {
    val out = new Array[Double](raw.length)
    var i = 0
    raw.foreach { x =>
      out(i) = x match {
        case f: Float => f.toDouble
        case d: Double => d
        case other => throw new IllegalArgumentException(
          s"GraphAnn: vector element ${other.getClass}")
      }
      i += 1
    }
    out
  }

  /** The driver-resolved micro walk. None = a cap blew; caller falls
    * back to the distributed route. */
  private def driverWalk(
      adj: DataFrame,
      vecs: DataFrame,
      qRows: Array[org.apache.spark.sql.Row],
      spark: SparkSession,
      k: Int,
      beam: Int,
      maxHops: Int,
      entry: Long,
      allowed: Option[DataFrame]): Option[DataFrame] = {
    import scala.collection.mutable
    val qids = qRows.map(_.getLong(0))
    val qvecs = qRows.map(r => vecD(r.getSeq[Any](1)))
    val qns = qRows.map(_.getDouble(2))
    val nq = qids.length

    // fetched corpus vectors: id -> (vec, norm); grows monotonically
    val fetched = mutable.LongMap.empty[(Array[Double], Double)]
    def fetchVectors(ids: Seq[Long]): Boolean = {
      val missing = ids.filterNot(fetched.contains)
      if (missing.isEmpty) return true
      if (fetched.size + missing.size > MaxDriverVectors) return false
      prunedVecRead(vecs, missing, spark).collect()
        .foreach(r => fetched(r.getLong(0)) =
          (vecD(r.getSeq[Any](1)), r.getDouble(2)))
      true
    }

    // per query: node -> cos, plus the expanded set
    val state = Array.fill(nq)(mutable.LongMap.empty[Double])
    val expanded = Array.fill(nq)(mutable.Set.empty[Long])
    def score(qi: Int, node: Long): Unit =
      fetched.get(node).foreach { case (v, n) =>
        // zero-norm vectors are unservable (null cos) on both routes
        if (n != 0.0 && qns(qi) != 0.0)
          state(qi)(node) = dotD(v, qvecs(qi)) / (n * qns(qi))
      }
    if (!fetchVectors(Seq(entry))) return None
    (0 until nq).foreach(score(_, entry))

    var hop = 0
    var done = false
    while (hop < maxHops && !done) {
      val frontiers: Array[Seq[Long]] = state.indices.map { qi =>
        state(qi).toSeq
          .sortBy { case (node, cos) => (-cos, node) }
          .take(beam)
          .collect { case (node, _) if !expanded(qi)(node) => node }
      }.toArray
      val frontierNodes = frontiers.flatten.distinct
      if (frontierNodes.isEmpty) done = true
      else if (frontierNodes.length > MaxDriverFrontier) return None
      else {
        val adjRows = adj.filter(col("src").isin(frontierNodes: _*))
          .collect()
        val bySrc = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
        adjRows.foreach { r =>
          bySrc.getOrElseUpdate(r.getLong(0), mutable.ArrayBuffer.empty) +=
            r.getLong(1)
        }
        val freshPerQ: Array[Seq[Long]] = state.indices.map { qi =>
          frontiers(qi).flatMap(nd => bySrc.getOrElse(nd, Nil))
            .distinct.filterNot(state(qi).contains)
        }.toArray
        if (!fetchVectors(freshPerQ.flatten.distinct.toSeq)) return None
        state.indices.foreach { qi =>
          frontiers(qi).foreach(expanded(qi) += _)
          freshPerQ(qi).foreach(score(qi, _))
        }
        hop += 1
      }
    }

    import spark.implicits._
    allowed match {
      case None =>
        val out = state.indices.flatMap { qi =>
          state(qi).toSeq
            .sortBy { case (node, cos) => (-cos, node) }
            .take(k)
            .zipWithIndex
            .map { case ((node, cos), i) => (qids(qi), node, cos, i + 1) }
        }
        Some(out.toDF("query_id", "neighbor_id", "cos", "rnk"))
      case Some(a) =>
        // the allowed frame may be corpus-sized: semi-join the SMALL
        // visited frame against it (never collected), then rank so
        // rnk counts allowed neighbors only
        val visited = state.indices.flatMap { qi =>
          state(qi).toSeq.map { case (node, cos) => (qids(qi), node, cos) }
        }.toDF("query_id", "neighbor_id", "cos")
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))
        Some(visited
          .join(a.select(col("node").as("neighbor_id")),
            Seq("neighbor_id"), "left_semi")
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= k)
          .select(col("query_id"), col("neighbor_id"), col("cos"), col("rnk")))
    }
  }

  private[ann] def distributedWalk(
      adj: DataFrame,
      vecs: DataFrame,
      qs: DataFrame,
      k: Int,
      beam: Int,
      maxHops: Int,
      entry: Long,
      allowed: Option[DataFrame] = None): DataFrame = {
    def scoreAgainstQueries(cands: DataFrame): DataFrame = {
      // prune the vector read to the candidate ids BEFORE the join —
      // on the store's id-sorted layout this is the row-group skip
      val pruned = KeyPrune.restrict(vecs,
        cands.select(col("node").as("id")), Seq("id"))
      cands.join(pruned, cands("node") === pruned("id"))
        .join(qs, "qid")
        .select(col("qid"), col("node"),
          VF.cosineWithNorms(VF.dot(col("v"), col("qv")), col("n"), col("qn"))
            .as("cos"))
        // zero-norm vectors are unservable on both routes
        .filter(col("cos").isNotNull)
    }

    // visited state: (qid, node, cos, expanded)
    var state = scoreAgainstQueries(
        qs.select(col("qid"), lit(entry).as("node")))
      .withColumn("expanded", lit(false))
      .localCheckpoint()

    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("node"))
    var hop = 0
    var done = false
    while (hop < maxHops && !done) {
      val frontier = state
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= beam && !col("expanded"))
        .select(col("qid"), col("node"))
        .localCheckpoint()
      if (frontier.limit(1).collect().isEmpty) done = true
      else {
        // one pruned adjacency read for the hop's frontier-node set
        val adjHop = KeyPrune.restrict(adj,
          frontier.select(col("node").as("src")), Seq("src"))
        val fresh = frontier
          .join(adjHop, frontier("node") === adjHop("src"))
          .select(col("qid"), col("dst").as("node"))
          .distinct()
          .join(state.select(col("qid"), col("node")),
            Seq("qid", "node"), "left_anti")
        val marked = state
          .join(frontier.withColumn("__f", lit(true)), Seq("qid", "node"), "left")
          .withColumn("expanded", col("expanded") || col("__f").isNotNull)
          .drop("__f")
        state = marked
          .unionByName(scoreAgainstQueries(fresh)
            .withColumn("expanded", lit(false)))
          .localCheckpoint()
        hop += 1
      }
    }
    val finalState = allowed.fold(state)(a =>
      state.join(a.select(col("node")), Seq("node"), "left_semi"))
    finalState
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid").as("query_id"), col("node").as("neighbor_id"),
        col("cos"), col("rnk"))
  }

  // ---------------------------------------------------------------
  // Persisted store — adjacency sorted by src and vectors sorted by
  // id in 8 MB row groups (the SrpStore/PostingsStore layout), so the
  // per-hop KeyPrune predicates skip row groups on disk. Takedown is
  // merge-on-read (tombstone ledger filtered into the vector side at
  // serve; compact rebuilds the graph over the kept corpus and clears
  // the ledger). Append (incremental graph growth — the NN-descent
  // insert) is the one deferred maintenance op; a grown corpus today
  // re-creates, which is correct and costs one build.
  // ---------------------------------------------------------------

  private val Version = 1
  private val RowGroupBytes: Long = 8L * 1024 * 1024

  /** Sentinel `k` selecting a COMPLETE-graph store: adjacency =
    * [[completeGraph]], so hop 1 discovers every node and any serve —
    * filtered or not — provably equals brute force (the q232b
    * degenerate-family argument through the persisted layout). The
    * oracle-scale twin configuration; a real corpus uses a kNN k. */
  val CompleteK: Int = Int.MaxValue

  final case class Handle(
      spark: SparkSession,
      path: String,
      entry: Long,
      vecElem: String,
      dim: Int) {

    private def vecsSchema =
      s"id BIGINT, v ARRAY<$vecElem> NOT NULL, n DOUBLE"
    private def adjSchema = "src BIGINT, dst BIGINT"

    private def fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def adjDf = spark.read.schema(adjSchema)
      .parquet(s"$path/adj")
    private def vecsDf = spark.read.schema(vecsSchema)
      .parquet(s"$path/vectors")
    private def tombstonesDf: Option[DataFrame] =
      if (fs.exists(new Path(path, "_tombstones")))
        Some(spark.read.schema("id BIGINT").parquet(s"$path/_tombstones"))
      else None

    /** Serve reads the meta ENTRY and the tombstone ledger at call
      * time (one small-file read each), so a handle held across
      * another handle's [[remove]]/[[compact]] serves the new
      * generation — the Srp/Lsh generation-checked-reads direction in
      * its cheapest form for this store's tiny meta. */
    def topK(
        queries: DataFrame,
        qidCol: String,
        qvecCol: String,
        k: Int,
        beam: Int = 8,
        maxHops: Int = 8): DataFrame =
      serve(queries, qidCol, qvecCol, k, beam, maxHops, None)

    /** Filtered serve — [[GraphAnn.topKFiltered]] through the store:
      * unfiltered navigation, allowed semi-join on the visited frame
      * before the rank (rnk counts allowed neighbors only). */
    def topKFiltered(
        queries: DataFrame,
        qidCol: String,
        qvecCol: String,
        allowed: DataFrame,
        allowedCol: String,
        k: Int,
        beam: Int = 8,
        maxHops: Int = 8): DataFrame =
      serve(queries, qidCol, qvecCol, k, beam, maxHops,
        Some(allowed.select(col(allowedCol).cast("long").as("node"))))

    private def serve(
        queries: DataFrame,
        qidCol: String,
        qvecCol: String,
        k: Int,
        beam: Int,
        maxHops: Int,
        allowed: Option[DataFrame]): DataFrame = {
      val metaEntry = readMeta(fs, path).entry
      val vecs = tombstonesDf.fold(vecsDf)(t =>
        vecsDf.join(broadcast(t), Seq("id"), "left_anti"))
      // remove() swaps the ledger in BEFORE the meta rewrite; a crash
      // between the two leaves meta.entry pointing at a tombstoned
      // node, which the walk would filter out of the vector frame —
      // every serve silently empty until the next mutation. Heal here:
      // if the entry is in the ledger (one tiny-file lookup, only when
      // a ledger exists), fall back to the smallest live id.
      val liveEntry = tombstonesDf match {
        case Some(t) if !t.filter(col("id") === metaEntry)
            .limit(1).collect().isEmpty =>
          val m = vecs.agg(min(col("id"))).collect()(0)
          require(!m.isNullAt(0),
            s"GraphAnn.serve: every vector at $path is tombstoned")
          m.getLong(0)
        case _ => metaEntry
      }
      beamSearch(adjDf, vecs, queries, qidCol, qvecCol,
        k, beam, maxHops, liveEntry, allowed)
    }

    /** Incremental graph growth — the HNSW/DiskANN search-based
      * insert: each NEW vector's out-edges are the top-`meta.k` nodes
      * the CURRENT graph's beam search finds for it, plus reciprocal
      * back-edges (a node with no in-edges would be unreachable), plus
      * a chain through the sorted new ids linked into the stored ring
      * (the spanning backbone extended). Merge-on-read: the delta
      * lands as NEW sorted files in the same vectors/ and adj/ dirs —
      * the per-file sorted layout keeps KeyPrune's row-group skips —
      * and degree grows by at most |delta| back-edges per node until
      * [[compact]] rebuilds at exact degree.
      *
      * Replay safety (the SrpStore per-table-probe pattern): vector
      * and adjacency presence are probed independently, so a crash
      * between the two writes heals on re-append (the landed table is
      * skipped, the missing one written — new ids are edgeless and
      * therefore unservable in the window); a fully-landed replay is
      * a no-op; PARTIAL id overlap with the store fails loud (an
      * ambiguous half-replayed batch must not be guessed at). A crash
      * before the meta rewrite leaves the entry stale-HIGH, which
      * never affects correctness (any stored node is a valid entry);
      * the next mutation's meta write heals it. Both presence probes
      * see LIVE vectors only, and a delta carrying tombstoned or
      * duplicate ids fails loud — re-introducing a removed id into
      * merge-on-read state is ambiguous; compact() first. */
    def append(
        delta: DataFrame,
        idCol: String,
        vecCol: String,
        beam: Int = 16,
        maxHops: Int = 10): Handle = {
      val m = readMeta(fs, path)
      require(m.k != CompleteK,
        s"append to a complete-graph store at $path: re-create instead")
      val d = delta.select(col(idCol).cast("long").as("id"),
          col(vecCol).as("v"))
        .localCheckpoint()
      val newIds = d.select(col("id")).distinct().localCheckpoint()
      val nNew = newIds.count()
      if (nNew == 0) return this
      // a batch carrying the same id twice would land duplicate vector
      // rows (and double ring edges) — the store's unique-id invariant
      require(d.count() == nNew,
        s"GraphAnn.append: delta contains duplicate ids at $path - " +
          s"dropDuplicates the batch before appending")
      // the replay probe must see LIVE vectors only: a tombstoned id
      // counted as "already stored" would make a re-append of a
      // removed id look like a fully-landed replay — both writes
      // skipped, the vector silently invisible, and the entry possibly
      // re-pointed at a tombstoned node. Re-appending removed ids is
      // ambiguous merge-on-read state; fail loud, compact() first.
      tombstonesDf.foreach { t =>
        val nTomb = t.join(broadcast(newIds), Seq("id"), "left_semi").count()
        require(nTomb == 0L,
          s"GraphAnn.append: $nTomb of $nNew delta ids are tombstoned " +
            s"at $path - compact() before re-appending removed ids")
      }
      val liveVecs = tombstonesDf.fold(vecsDf)(t =>
        vecsDf.join(broadcast(t), Seq("id"), "left_anti"))
      val vecsHave = liveVecs.join(broadcast(newIds), Seq("id"), "left_semi")
        .select(col("id")).distinct().count()
      require(vecsHave == 0L || vecsHave == nNew,
        s"GraphAnn.append: $vecsHave of $nNew delta ids already stored " +
          s"at $path - a partially-overlapping batch is ambiguous")
      if (vecsHave == 0L)
        d.withColumn("n", VF.l2Norm(col("v")))
          .repartition(1).sortWithinPartitions(col("id"))
          .write.mode("append").option("parquet.block.size", RowGroupBytes)
          .parquet(s"$path/vectors")

      val adjHave = adjDf
        .join(broadcast(newIds.select(col("id").as("src"))),
          Seq("src"), "left_semi")
        .select(col("src")).distinct().count()
      require(adjHave == 0L || adjHave == nNew,
        s"GraphAnn.append: $adjHave of $nNew delta ids already have " +
          s"adjacency at $path - a partially-overlapping batch is ambiguous")
      if (adjHave == 0L) {
        // search the CURRENT graph for each new vector's neighbors —
        // new ids have no in-edges yet, so the search sees old nodes
        // only, even when the vector write already landed (replay)
        val searched = serve(d.select(col("id").as("qid"),
            col("v").as("qv")), "qid", "qv",
            k = m.k, beam = beam, maxHops = maxHops, None)
          .localCheckpoint()
        val out = searched
          .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
        val back = searched
          .select(col("neighbor_id").as("src"), col("query_id").as("dst"))
        // link the ring into the largest LIVE stored id — an edge into
        // a tombstoned node is dead weight the walk can never use
        val oldMax = liveVecs.join(broadcast(newIds), Seq("id"), "left_anti")
          .agg(max(col("id"))).collect()(0).getLong(0)
        val bounds = newIds.agg(min(col("id")), max(col("id"))).collect()(0)
        val links = d.sparkSession.createDataFrame(
          java.util.Arrays.asList(
            org.apache.spark.sql.Row(oldMax, bounds.getLong(0)),
            org.apache.spark.sql.Row(bounds.getLong(1), m.entry)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("src",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("dst",
              org.apache.spark.sql.types.LongType, nullable = false))))
        out.unionByName(back)
          .unionByName(ringEdges(d, "id"))
          .unionByName(links)
          .filter(col("src") =!= col("dst"))
          .distinct()
          .repartition(1).sortWithinPartitions(col("src"), col("dst"))
          .write.mode("append").option("parquet.block.size", RowGroupBytes)
          .parquet(s"$path/adj")
      }

      val newMin = newIds.agg(min(col("id"))).collect()(0).getLong(0)
      // the new entry is computed over LIVE ids only: m.entry can be a
      // tombstoned node after a remove() crash window, and min-ing it
      // in would perpetuate an unservable entry point
      val baseEntry =
        if (tombstonesDf.isEmpty) m.entry
        else liveVecs.join(broadcast(newIds), Seq("id"), "left_anti")
          .agg(min(col("id"))).collect()(0).getLong(0)
      val entry2 = math.min(baseEntry, newMin)
      // an adjacency write this call means merge-on-read state that
      // only compact() can restore to exact degree; a fully-landed
      // replay (no writes) leaves the flag as it was
      writeMeta(fs, new Path(path),
        m.copy(entry = entry2, dirty = m.dirty || adjHave == 0L))
      copy(entry = entry2)
    }

    /** Takedown: merge `ids` into the tombstone ledger (atomic dir
      * swap) and re-point the entry at the smallest KEPT id. The graph
      * is untouched (merge-on-read): removed nodes are filtered from
      * the vector side, so they are never scored, never enter the
      * frontier, and never serve — a removed node's edges become dead
      * weight that [[compact]] purges. Paths THROUGH removed nodes are
      * lost until compact (recall, never correctness — the ring
      * backbone still spans the kept ids that follow each gap).
      * Replay-idempotent: the ledger is a set union. The ledger swap
      * lands BEFORE the meta rewrite; a crash between the two leaves
      * meta.entry tombstoned, which serve() heals at read time by
      * falling back to the smallest live id.
      *
      * ORDERING CONTRACT: a takedown must arrive AFTER the ingest of
      * that id. An id with no stored vector is a no-op by design —
      * nothing is hidden at serve, nothing purged at compact — which
      * is what lets a replayed mutate-then-compact pipeline converge
      * to a metadata read instead of re-ledgering ids its own compact
      * already purged (and paying a full rebuild per replay). The
      * flip side: remove-before-append is NOT held back (the later
      * append serves the content); callers with out-of-order streams
      * must gate takedowns on ingest — a takedown feed naming ids a
      * separate ingest stream has not landed yet must be re-driven
      * after the ingest catches up. */
    def remove(ids: DataFrame, idCol: String): Handle = {
      val incoming = ids.select(col(idCol).cast("long").as("id")).distinct()
      // tombstoning an id with no stored vector is a no-op (nothing to
      // hide at serve, nothing for compact to purge): prune to PRESENT
      // ids, and when none of them is new — the steady replay of an
      // already-purged takedown — skip the ledger and meta writes
      // entirely instead of re-signing an unchanged store.
      val present = incoming
        .join(vecsDf.select(col("id")), Seq("id"), "left_semi")
        .localCheckpoint()
      val anyFresh = !tombstonesDf.fold(present)(t =>
        present.join(t, Seq("id"), "left_anti")).limit(1).collect().isEmpty
      if (!anyFresh) return this
      val merged = tombstonesDf.fold(present)(t =>
        t.unionByName(present).distinct())
      val staging = new Path(path + "/.tombstones.staging")
      if (fs.exists(staging)) fs.delete(staging, true)
      merged.repartition(1).write.parquet(staging.toString)
      SwapDir.swap(fs, staging, new Path(path, "_tombstones"))

      val kept = vecsDf.join(
        broadcast(spark.read.schema("id BIGINT").parquet(s"$path/_tombstones")),
        Seq("id"), "left_anti")
      val keptMin = kept.agg(min(col("id"))).collect()(0)
      require(!keptMin.isNullAt(0),
        s"GraphAnn.remove would tombstone every vector at $path")
      writeMeta(fs, new Path(path),
        readMeta(fs, path).copy(entry = keptMin.getLong(0)))
      copy(entry = keptMin.getLong(0))
    }

    /** Rebuild the graph over the KEPT vectors and clear the ledger —
      * the purge step restoring full navigability (and the serve-path
      * equality with a fresh build on the kept corpus, which
      * GraphAnnSpec pins). Atomic: staged rebuild, one swap. */
    def compact(): Handle = {
      val m = readMeta(fs, path)
      // nothing to purge (no ledger) and the adjacency is still a
      // pristine create()/compact() output (no merge-on-read append
      // landed since — meta.dirty): the rebuild would reproduce the
      // store from the same deterministic inputs; skip it. The steady
      // replay of a mutate-then-compact pipeline costs a meta read,
      // not a full kNN-graph rebuild.
      val hasTombs = tombstonesDf.exists(t => !t.limit(1).collect().isEmpty)
      if (!hasTombs && !m.dirty) return this
      val keptVecs = tombstonesDf.fold(vecsDf)(t =>
        vecsDf.join(broadcast(t), Seq("id"), "left_anti"))
        .select(col("id"), col("v"))
        .localCheckpoint()
      val tmp = path + ".compacting"
      val h = create(keptVecs, "id", "v", spark, tmp, m.k, m.ring, m.approx)
      SwapDir.swap(fs, new Path(tmp), new Path(path))
      h.copy(path = path)
    }

  }

  /** Build the store at `path` (atomic via staging + [[SwapDir]]):
    * exact kNN graph + ring over `vectors`, adjacency sorted by src,
    * vectors (with norms) sorted by id. */
  def create(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      spark: SparkSession,
      path: String,
      k: Int,
      withRing: Boolean = true,
      approx: Boolean = false): Handle = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(path + ".staging")
    if (fs.exists(staging)) fs.delete(staging, true)

    val vecElem = vectors.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(et, _) => et.simpleString
      case other => throw new IllegalArgumentException(
        s"GraphAnn: $vecCol must be an array column, got $other")
    }
    val dim = vectors.select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)

    val graph =
      if (k == CompleteK) completeGraph(vectors, idCol)
      else if (approx) buildKnnGraphApprox(vectors, idCol, vecCol, k,
        withRing = withRing)
      else buildKnnGraph(vectors, idCol, vecCol, k, withRing)
    graph.repartition(1).sortWithinPartitions(col("src"), col("dst"))
      .write.option("parquet.block.size", RowGroupBytes)
      .parquet(s"$staging/adj")
    vectors.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        VF.l2Norm(col(vecCol)).as("n"))
      .repartition(1).sortWithinPartitions(col("id"))
      .write.option("parquet.block.size", RowGroupBytes)
      .parquet(s"$staging/vectors")

    val entry = vectors.agg(min(col(idCol).cast("long"))).collect()(0).getLong(0)
    writeMeta(fs, staging, Meta(k, withRing, entry, vecElem, dim, approx))

    SwapDir.swap(fs, staging, new Path(path))
    Handle(spark, path, entry, vecElem, dim)
  }

  private[ann] final case class Meta(
      k: Int,
      ring: Boolean,
      entry: Long,
      vecElem: String,
      dim: Int,
      approx: Boolean,
      // adjacency carries merge-on-read APPENDED edges (search-based
      // insert output, not a create() build): compact() must rebuild.
      // false right after create()/compact(); legacy metas without the
      // field read as true (one conservative rebuild, then tracked).
      dirty: Boolean = false)

  private def writeMeta(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: Path,
      m: Meta): Unit = {
    val meta =
      s"$Version\n${m.k}\n${m.ring}\n${m.entry}\n${m.vecElem}\n${m.dim}\n${m.approx}\n${m.dirty}\n"
    val out = fs.create(new Path(dir, "_graft_meta"), true)
    out.write(meta.getBytes("UTF-8")); out.close()
  }

  private def readMeta(fs: org.apache.hadoop.fs.FileSystem, path: String): Meta = {
    val in = fs.open(new Path(path, "_graft_meta"))
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    in.close()
    require(lines.head.toInt == Version,
      s"GraphAnn store version ${lines.head} != $Version at $path")
    Meta(lines(1).toInt, lines(2).toBoolean, lines(3).toLong,
      lines(4), lines(5).toInt, lines(6).toBoolean,
      dirty = if (lines.length > 7) lines(7).toBoolean else true)
  }

  /** Open an EXISTING store (meta read + heal) — the streaming-ingest
    * entry point, where the store is pre-created and the caller has no
    * corpus frame to offer [[ensure]]'s create-if-absent. */
  def open(spark: SparkSession, path: String): Handle = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    val m = readMeta(fs, path)
    Handle(spark, path, m.entry, m.vecElem, m.dim)
  }

  /** Open if present (reading meta), else [[create]]. */
  def ensure(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      spark: SparkSession,
      path: String,
      k: Int,
      withRing: Boolean = true,
      approx: Boolean = false): Handle = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    val metaPath = new Path(path, "_graft_meta")
    if (!fs.exists(metaPath))
      return create(vectors, idCol, vecCol, spark, path, k, withRing, approx)
    val m = readMeta(fs, path)
    require(m.k == k && m.ring == withRing && m.approx == approx,
      s"GraphAnn store at $path was built with (k=${m.k}, ring=${m.ring}, " +
        s"approx=${m.approx}); asked for (k=$k, ring=$withRing, approx=$approx)")
    Handle(spark, path, m.entry, m.vecElem, m.dim)
  }
}
