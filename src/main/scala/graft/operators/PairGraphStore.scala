package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted similarity pair-graph — the VERIFIED near-dup edge frame
  * (id pairs + weight), built once and served to every graph consumer:
  * label propagation, k-core, PageRank, connected-component /
  * semantic-dedup keeper election, contamination rollups. (Reference
  * scope: nvd2mysqlloader has no graph surface — this is the shared
  * substrate of the mandated dedup/graph extension set, the
  * graph-side analogue of [[PostingsStore]] / [[graft.dedup.LshStore]].)
  *
  * Why it exists: every LSH-graph analytic starts from the same
  * expensive build — sign the corpus (L×nBits kernels per row), bucket
  * self-join, exact-similarity verify. Without a store, EACH query
  * repeats that build; with it, the edge build runs once per corpus
  * and every downstream metric is a read of an edge frame that is
  * dup-density-sized, not corpus-sized. At 100 TB the signature pass
  * dominates every graph metric — amortizing it across consumers is
  * the difference between one corpus scan and N.
  *
  * Layout under `path`:
  *   - `edges/…parquet` — the edge frame EXACTLY as built (canonical
  *     src < dst rows from the upstream generator, optional weight),
  *     range-partitioned + sorted by (src, dst) so per-node /
  *     per-range reads skip row groups;
  *   - `_graft_meta` — srcCol/dstCol/weightCol/version.
  *
  * Fidelity contract: the store persists the generator's frame
  * UNCHANGED (doubles round-trip parquet exactly), so a consumer
  * reading `edges` computes bit-identical results to the inline route
  * — which is what lets store-served queries keep the inline queries'
  * oracles and spec contracts ([[PairGraphStoreSpec]] asserts the
  * round-trip and the consumer-equality).
  *
  * `append` folds a DELTA edge batch in (new documents' verified
  * pairs); [[KCore.maintainAfterInsert]] consumes exactly that shape
  * to update core numbers at delta cost instead of re-peeling the
  * graph.
  */
object PairGraphStore {

  private val Version = 1

  /** Directory-partition count for node-keyed side states (cores,
    * community labels): pb = pmod(node, StatePartitions). Small enough
    * that a full build writes a handful of files per partition, large
    * enough that a delta-neighborhood maintenance batch usually
    * rewrites a strict subset. */
  val StatePartitions = 32

  /** localCheckpoint with origin statistics dropped — iterative
    * maintenance loops must not compound LogicalRDD sizeInBytes
    * (the BigInteger planning blowup, see ColumnBridge). */
  private def cps(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.ColumnBridge.checkpointStatsReset(df)

  final case class Handle(
      spark: SparkSession,
      path: String,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String]) {

    /** The stored edge frame, original column names — the SERVE view:
      * physical rows minus the revocation ledger ([[removeEdges…]]),
      * so every consumer (ensure*, maintainers, inline analytics)
      * sees revoked edges as gone. [[PairGraphStore.compact]] purges
      * the physical rows and the ledger together. */
    def edges: DataFrame = {
      // existence probe only (metadata, no job): stores that never saw
      // a revocation serve the raw parquet plan unchanged
      val p = new Path(s"$path/removededges")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) physicalEdges
      else physicalEdges.join(broadcast(removedEdges
          .withColumnRenamed("a", srcCol).withColumnRenamed("b", dstCol)),
        Seq(srcCol, dstCol), "left_anti")
    }

    private[graft] def physicalEdges: DataFrame =
      spark.read.parquet(s"$path/edges")

    /** Revoked canonical pairs (a, b) — empty when no revocation has
      * run. */
    def removedEdges: DataFrame = {
      val p = new Path(s"$path/removededges")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        spark.read.schema("a LONG, b LONG").parquet(s"$path/removededges")
      else spark.range(0).select(col("id").as("a"), col("id").as("b"))
    }

    /** Purge `pairs` from the revocation ledger so their PHYSICAL
      * rows serve again — the legitimate re-add path for a COUNTED
      * re-cross (a revoked co-presence pair whose shared-window count
      * re-grew past the edge threshold after a takedown), unlike a
      * raw [[append]] of a revoked pair, which stays out of contract
      * and fails loud. The stored physical row resurfaces AS-IS:
      * weighted stores keep the pre-revocation weight (append never
      * updates weights either — compact+append to change one).
      * Side-state staleness is the caller's composition concern,
      * exactly as for append ([[appendAndMaintainCommunities]] calls
      * this itself for its delta's revoked pairs, then re-propagates
      * the affected components over the restored serve view).
      * Crash-safe: the ledger rewrite goes through [[SwapDir.swap]];
      * a replay finds the pairs already un-revoked and no-ops. */
    def readmit(pairs: DataFrame): Handle = {
      val p = new Path(s"$path/removededges")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) return this
      val pc = pairs
        .select(col(pairs.columns(0)).cast("long").as("a"),
          col(pairs.columns(1)).cast("long").as("b"))
        .distinct()
      val remaining = removedEdges
        .join(broadcast(pc), Seq("a", "b"), "left_anti")
        .localCheckpoint() // materialize BEFORE touching the files it reads
      if (remaining.isEmpty) fs.delete(p, true)
      else {
        val staging = new Path(s"$path/removededges.staging")
        fs.delete(staging, true)
        remaining.coalesce(1).write.mode(SaveMode.Overwrite)
          .parquet(staging.toString)
        SwapDir.swap(fs, staging, p)
      }
      this
    }

    /** Edge count from the parquet footers — a metadata read. */
    def edgeCount: Long = edges.count()

    /** Fold a delta edge batch in. Delta rows must be canonical
      * (src < dst, the shape every generator in this repo produces);
      * duplicates — within the batch or against the stored pair set —
      * are DEDUPED here rather than documented away (a re-appended
      * pair used to silently double its edge rows): within-batch
      * duplicates collapse to one row (weighted stores keep the max
      * weight — deterministic), and already-stored pairs are dropped
      * via a src-pruned probe of the stored edges + a broadcast
      * anti-join, both delta-sized. Replaying a crashed batch is
      * therefore a no-op at this layer too, not only through
      * [[appendAndMaintainCores]]. */
    def append(delta: DataFrame): Handle = {
      if (delta.isEmpty) return this
      // a revoked pair still has a physical row: the dedup below would
      // treat a re-append as fresh and double the row while the ledger
      // keeps hiding it. Fail loud; compact purges the ledger and
      // makes the pair appendable again.
      val clash = delta
        .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
        .join(broadcast(removedEdges), Seq("a", "b"), "left_semi")
      require(clash.isEmpty,
        "append: batch contains revoked pairs - re-adding a removed " +
          "edge is out of contract until compact purges the ledger")
      val cols = srcCol +: dstCol +: weightCol.toSeq
      val sel = delta.select(cols.map(col): _*)
      val dd = weightCol.fold(sel.distinct())(w =>
        sel.groupBy(col(srcCol), col(dstCol)).agg(max(col(w)).as(w)))
        .localCheckpoint()
      // stored-side probe narrowed by the delta's src values (the
      // (src, dst)-sorted layout row-group-skips), then shrunk to the
      // (small) overlap so both joins stay broadcast
      val already = KeyPrune.restrict(
          edges.select(col(srcCol), col(dstCol)), dd, Seq(srcCol))
        .join(broadcast(dd.select(col(srcCol), col(dstCol))),
          Seq(srcCol, dstCol), "left_semi")
      val fresh = dd.join(broadcast(already), Seq(srcCol, dstCol), "left_anti")
      if (!fresh.isEmpty)
        fresh
          .sortWithinPartitions(col(srcCol), col(dstCol))
          .write.mode(SaveMode.Append).parquet(s"$path/edges")
      this
    }

    // ---- partitioned node-state plumbing ---------------------------
    // Node-keyed side states (core numbers, community labels) are
    // directory-partitioned by pb = pmod(node, StatePartitions) so a
    // maintenance batch can overwrite ONLY the partitions holding
    // changed nodes (dynamic partition overwrite, the IncrementalAgg
    // idiom) instead of rewriting a node-cardinality-sized table per
    // micro-batch — at billions of nodes the full rewrite would
    // dominate every batch.

    private def stateMeta(fs: org.apache.hadoop.fs.FileSystem,
        metaP: Path): Option[String] =
      if (!fs.exists(metaP)) None
      else {
        val in = fs.open(metaP)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
        finally in.close()
      }

    private def withPb(state: DataFrame, nodeCol: String): DataFrame =
      state.withColumn("pb",
        pmod(col(nodeCol).cast("long"), lit(StatePartitions.toLong)).cast("int"))

    /** Full state publish: staged + swapped (readers never see a
      * half-written state), pb-partitioned for later pruned writes. */
    // ---- applied-batch markers (the PostingsStore stats idiom) ------
    // A maintainer's replay previously RECOMPUTED its whole affected
    // region just to prove the no-op — correct, but a re-delivered
    // batch at the corpus-wide demonstrator shapes costs seconds. A
    // marker named by the batch's order-independent identity, written
    // LAST (after the ledger/append and the state write), records
    // "this exact batch is fully committed into this state": a replay
    // that finds it can serve the stored state outright — the state
    // has been kept current by every later maintain, and re-applying
    // an already-committed batch is a semantic no-op. Any FULL state
    // rebuild (writeStateFull / compact) swaps the state dir and the
    // markers with it, so a stale marker cannot outlive its state.
    // Append-direction skips are additionally gated on "no revocation
    // ledger": re-adding revoked pairs is out of contract and must
    // keep failing loud in the append path, not silently skip.

    /** Order-independent batch identity: bit-xor of xxhash64 over the
      * canonical rows' `cols`. None for an empty batch (no marker —
      * the bodies handle empties). ASSUMPTION (documented, accepted):
      * xor-of-hashes is weaker than a content hash — two different
      * batches whose row-hash multisets xor to the same value alias
      * and the second would skip its maintenance. Probability ~2^-64
      * per batch pair with no adversarial inputs here; an
      * order-independent polynomial hash would harden it at the same
      * cost if that ever changes. */
    private def batchSig(canon: DataFrame, cols: Seq[String]): Option[String] = {
      val r = canon.agg(expr(s"bit_xor(xxhash64(${cols.mkString(", ")}))")).head()
      if (r.isNullAt(0)) None
      else Some(java.lang.Long.toHexString(r.getLong(0)))
    }

    /** [[batchSig]] over the store-canonical append delta — weight
      * INCLUDED when the store carries one (same pairs at different
      * weights are different batches; skipping the second would strand
      * the max-weight merge). */
    private def appendBatchSig(delta: DataFrame): Option[String] = {
      val cols = Seq(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b")) ++
        weightCol.map(w => col(w).cast("double").as("w"))
      batchSig(delta.select(cols: _*).distinct(),
        Seq("a", "b") ++ weightCol.map(_ => "w"))
    }

    private def appliedMarker(stateDir: String, kind: String,
        sig: Option[String]): Option[Path] =
      sig.map(s => new Path(s"$stateDir/_applied_${kind}_$s"))

    private def markerPresent(p: Option[Path]): Boolean = p.exists(m =>
      m.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(m))

    private def writeMarker(p: Option[Path]): Unit = p.foreach { m =>
      m.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .create(m, true).close()
    }

    /** Replay short-circuit for the all-states removal composition
      * (StreamingGraphMaintenance.processAllRemove): true when EVERY
      * listed maintainer's "rm" marker for this batch is present. Each
      * marker is written LAST in its maintainer (after the state
      * overwrite and the revoke), and lives INSIDE the state dir (so a
      * rebuilt/deleted state loses its markers) — markers-all-present
      * therefore proves the whole composition landed, and a replayed
      * batch skips four canonicalize+signature+ensure passes for one
      * distinct+agg job. Any missing marker (first run, crash window,
      * fresh state) keeps the full per-maintainer path, whose own
      * markers re-check per state. */
    private[graft] def allRemovalMarkersPresent(
        deleted: DataFrame, withTruss: Boolean): Boolean = {
      val delCanon = deleted
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b").distinct()
      val sig = batchSig(delCanon, Seq("a", "b"))
      if (sig.isEmpty) return false
      val dirs = Seq(labelsDir, coresDir, ranksDir) ++
        (if (withTruss) Seq(trussDir) else Nil)
      dirs.forall(d => markerPresent(appliedMarker(d, "rm", sig)))
    }

    /** Append-direction skip gate: no revocation ledger (see above). */
    private def noRevocationLedger: Boolean = {
      val p = new Path(s"$path/removededges")
      !p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }

    private def writeStateFull(dir: String, metaName: String,
        metaBody: String, state: DataFrame, nodeCol: String,
        fs: org.apache.hadoop.fs.FileSystem): Unit = {
      val staging = dir + ".staging"
      fs.delete(new Path(staging), true)
      withPb(state, nodeCol)
        .repartition(StatePartitions, col("pb"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("pb").parquet(s"$staging/data")
      val out = fs.create(new Path(s"$staging/$metaName"), true)
      try out.write(metaBody.getBytes("UTF-8")) finally out.close()
      SwapDir.swap(fs, new Path(staging), new Path(dir))
    }

    /** Overwrite ONLY the state partitions containing `changedNodes`;
      * untouched partitions' files stay byte-identical (spec'd via
      * file-identity). The write is not atomic ACROSS partitions — a
      * crash can leave a mix of old and new partitions, which the
      * maintenance replay contract absorbs: re-running the batch
      * reads estimates between the old and new fixpoints and the
      * traversal drives them to the same converged state (the
      * stale-cores crash-window argument, see
      * [[appendAndMaintainCores]]). */
    private def overwriteChangedState(dir: String, state: DataFrame,
        nodeCol: String, changedNodes: DataFrame): Unit = {
      // bounded collect: at most StatePartitions distinct values —
      // evaluated BEFORE the write touches any file (changedNodes may
      // lazily read the state being overwritten)
      val pbs = withPb(changedNodes, nodeCol).select(col("pb")).distinct()
        .collect().map(_.getInt(0))
      if (pbs.isEmpty) return
      // materialized before any file is touched (the frame may lazily
      // read the state being overwritten), and because the EMPTIED
      // partitions must be known: dynamic overwrite only replaces
      // partitions it writes rows for, so a partition whose rows all
      // disappeared (e.g. a node isolated by a revocation) would keep
      // its stale file — those are deleted explicitly below
      val st = withPb(state, nodeCol)
        .filter(col("pb").isin(pbs.map(Integer.valueOf).toIndexedSeq: _*))
        .localCheckpoint()
      val nonEmpty = st.select(col("pb")).distinct().collect()
        .map(_.getInt(0)).toSet
      if (nonEmpty.nonEmpty)
        st.repartition(math.max(1, nonEmpty.size), col("pb"))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("pb").parquet(s"$dir/data")
      val fs = new Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      pbs.filterNot(nonEmpty).foreach(pb =>
        fs.delete(new Path(s"$dir/data/pb=$pb"), true))
    }

    // ---- core-numbers side state -----------------------------------

    private def coresDir = s"$path/graphcores"

    private def coresMetaBody(maxK: Int) =
      s"maxK=$maxK\nlayout=pb$StatePartitions"

    /** Core numbers of the stored graph (capped at `maxK`), computed
      * ONCE and persisted behind the crash-safe swap; later calls
      * read the parquet. A state written at a different cap (or an
      * older, unpartitioned layout) is rebuilt. */
    def ensureCores(maxK: Int): DataFrame = {
      val fs = new Path(coresDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      SwapDir.heal(fs, new Path(coresDir))
      val current = stateMeta(fs, new Path(s"$coresDir/_graft_cores_meta"))
        .contains(coresMetaBody(maxK))
      if (!current)
        writeStateFull(coresDir, "_graft_cores_meta", coresMetaBody(maxK),
          KCore.coreNumbers(edges, srcCol, dstCol, maxK), "node", fs)
      spark.read.parquet(s"$coresDir/data").drop("pb")
    }

    /** The streaming-grade ingest step: fold a (possibly replayed)
      * delta edge batch in AND maintain the persisted core numbers at
      * delta cost — [[KCore.maintainAfterInsert]] against the stored
      * state instead of a from-scratch re-peel per refresh.
      *
      * Replay idempotence (the foreachBatch contract): the delta is
      * deduped against the stored edges before appending, and the
      * maintenance traversal tolerates already-present edges (with
      * correct cores it promotes nobody; with stale cores — a crash
      * between the edge append and the cores swap — it drives them
      * to the true fixpoint). Any prefix of {append, maintain, swap}
      * may crash and the batch re-run converges to the same state. */
    def appendAndMaintainCores(delta: DataFrame, maxK: Int): DataFrame = {
      val old = ensureCores(maxK)
      val marker = appliedMarker(coresDir, "add", appendBatchSig(delta))
      if (noRevocationLedger && markerPresent(marker)) return old
      // distinct: a duplicated canonical pair in the delta would
      // otherwise double its edge rows on append
      val canonDelta = delta
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b")
        .distinct()
      val stored = edges
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b")
      val fresh = canonDelta.join(stored, Seq("a", "b"), "left_anti")
      // maintain BEFORE appending: maintainAfterInsert unions old
      // edges with the delta itself, and runs the traversal for
      // already-present delta edges too, so both orders converge —
      // this one keeps the no-crash path reading each frame once
      val maintained = KCore.maintainAfterInsert(
        old, stored, canonDelta, "a", "b", maxK)
        .localCheckpoint()
      if (!fresh.isEmpty) {
        val freshNamed = fresh.toDF(srcCol, dstCol)
        val withW = weightCol.fold(freshNamed)(w =>
          // weight recovered from the delta rows (anti-join dropped
          // it); re-aggregated per pair because a duplicated delta
          // pair — the exact thing the distinct above collapsed —
          // would otherwise re-multiply through this join (and two
          // duplicates with different weights would land twice)
          freshNamed.join(
            delta.select(col(srcCol), col(dstCol), col(w)),
            Seq(srcCol, dstCol), "left")
            .groupBy(col(srcCol), col(dstCol)).agg(max(col(w)).as(w)))
        append(withW)
      }
      // partition-pruned state write: the maintenance theorem bounds
      // changed cores to the delta neighborhood — overwrite only the
      // partitions holding a changed (or new) node; untouched
      // partitions keep their files
      val changed = maintained
        .join(old.select(col("node"), col("core_number").as("__oldk")),
          Seq("node"), "left")
        .filter(col("__oldk").isNull || col("__oldk") =!= col("core_number"))
        .select(col("node"))
      overwriteChangedState(coresDir, maintained, "node", changed)
      writeMarker(marker)
      maintained
    }

    // ---- community-labels side state -------------------------------

    private def labelsDir = s"$path/graphlabels"

    private def labelsMetaBody(rounds: Int, weighted: Boolean) =
      s"rounds=$rounds\nweighted=$weighted\nlayout=pb$StatePartitions"

    /** (node, community, comp) of an edge frame: fixed-round LPA
      * labels plus the connected-component id (min member id — the
      * [[graft.dedup.ConnectedComponents]] convention) maintenance
      * uses to scope re-propagation. Both algorithms are
      * COMPONENT-LOCAL and deterministic: a node's label depends only
      * on its component's edge set, which is what makes "re-run only
      * the touched components" exactly equal to a from-scratch run
      * over the whole graph. */
    private def labelsOf(e: DataFrame, rounds: Int, weighted: Boolean)
        : DataFrame = {
      val w = if (weighted) weightCol else None
      val labels = LabelPropagation.run(
        e, srcCol, dstCol, rounds, symmetrize = true, weightCol = w)
      val comps = graft.dedup.ConnectedComponents
        .runAdaptive(e, srcCol, dstCol)
      labels.join(comps.withColumnRenamed("member", "node"), Seq("node"))
        .select(col("node"), col("community"), col("cluster_root").as("comp"))
    }

    /** Community labels of the stored graph (`rounds` synchronous LPA
      * votes; `weighted` votes carry the store's weight column),
      * computed ONCE and persisted behind the crash-safe swap; later
      * calls read the parquet. A state written at different
      * parameters (or an older layout) is rebuilt. */
    def ensureCommunities(rounds: Int = 3, weighted: Boolean = false)
        : DataFrame = {
      require(!weighted || weightCol.nonEmpty,
        s"store at $path has no weight column for weighted communities")
      val fs = new Path(labelsDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      SwapDir.heal(fs, new Path(labelsDir))
      val current = stateMeta(fs, new Path(s"$labelsDir/_graft_labels_meta"))
        .contains(labelsMetaBody(rounds, weighted))
      if (!current)
        writeStateFull(labelsDir, "_graft_labels_meta",
          labelsMetaBody(rounds, weighted),
          labelsOf(edges, rounds, weighted), "node", fs)
      spark.read.parquet(s"$labelsDir/data").drop("pb")
    }

    /** Fold a (possibly replayed) delta edge batch in AND maintain the
      * persisted community labels at DELTA-NEIGHBORHOOD cost: LPA and
      * component ids are component-local, so only components touched
      * by a delta edge (transitively — delta edges can chain
      * components together through new nodes) can change, and
      * re-propagating exactly those components' subgraph reproduces a
      * from-scratch [[LabelPropagation.run]] over the whole grown
      * graph row for row (PairGraphStoreSpec pins the equality on
      * planted merges and randomized splits). Untouched components'
      * labels are read back unchanged and their state partitions are
      * not rewritten.
      *
      * Replay idempotence: the delta is deduped against stored edges
      * before appending; the affected-component computation uses only
      * (old state, delta) and the re-propagation runs over
      * stored ∪ fresh edges — so a crash between the label write and
      * the edge append (either order: labels are maintained and
      * checkpointed BEFORE the append, written after) replays to the
      * same converged state. A crash mid partition-overwrite leaves
      * mixed labels the replay simply recomputes (affected components
      * are re-derived from the delta, not from the damaged rows —
      * comp ids of unaffected components are never touched). */
    def appendAndMaintainCommunities(
        delta: DataFrame,
        rounds: Int = 3,
        weighted: Boolean = false): DataFrame = {
      val old = ensureCommunities(rounds, weighted)
      if (delta.isEmpty) return old
      val marker = appliedMarker(labelsDir, "add", appendBatchSig(delta))
      if (noRevocationLedger && markerPresent(marker)) return old
      // canonical delta, long-typed, deduped (weighted stores keep a
      // deterministic max weight — same policy as append)
      val wSeq = weightCol.toSeq
      val dSel = delta.select(
        (Seq(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
          ++ wSeq.map(col)): _*)
      val dEdges = (if (wSeq.isEmpty) dSel.distinct()
        else dSel.groupBy(col("a"), col("b")).agg(max(col(wSeq.head)).as(wSeq.head)))
        .localCheckpoint()
      // delta pairs sitting on the revocation ledger are COUNTED
      // re-crossings (the co-presence composition: a takedown revoked
      // the pair, later absorbs re-grew its count past the threshold)
      // — a legitimate re-add, so un-revoke them here instead of
      // letting append() fail loud and wedge the stream on replay;
      // the re-propagation below then sees the restored edges
      if (!noRevocationLedger) {
        val rc = dEdges.select(col("a"), col("b"))
          .join(broadcast(removedEdges), Seq("a", "b"), "left_semi")
          .localCheckpoint()
        if (!rc.isEmpty) readmit(rc)
      }
      // delta edges in COMPONENT-KEY space: an endpoint maps to its
      // old component id, or to itself when the store has never seen
      // it (a new node id cannot collide with an old component id —
      // component ids ARE old node ids)
      val oldComps = old.select(col("node"), col("comp"))
      val dk = dEdges
        .join(oldComps.select(col("node").as("a"), col("comp").as("__ca")),
          Seq("a"), "left")
        .join(oldComps.select(col("node").as("b"), col("comp").as("__cb")),
          Seq("b"), "left")
        .select(coalesce(col("__ca"), col("a")).as("ka"),
          coalesce(col("__cb"), col("b")).as("kb"))
      // every key in this (delta-sized) graph is delta-touched by
      // construction; runAdaptive picks driver union-find below the
      // measured crossover, wave-distributed above
      val keyGroups = graft.dedup.ConnectedComponents
        .runAdaptive(dk, "ka", "kb")
      val affectedComps = keyGroups.select(col("member").as("comp")).distinct()
      val affectedNodes = old
        .join(affectedComps, Seq("comp"), "left_semi")
        .select(col("node"))
        .unionByName(dEdges.select(col("a").as("node")))
        .unionByName(dEdges.select(col("b").as("node")))
        .distinct()
        .localCheckpoint()
      // the affected subgraph: stored edges with an affected endpoint
      // (both endpoints of a stored edge share a component, so the
      // src side decides) plus the fresh delta edges
      val storedE = edges.select(
        (Seq(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
          ++ wSeq.map(col)): _*)
      val subStored = storedE
        .join(affectedNodes.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
      val already = storedE.select(col("a"), col("b"))
        .join(broadcast(dEdges.select(col("a"), col("b"))), Seq("a", "b"), "left_semi")
      val freshE = dEdges.join(broadcast(already), Seq("a", "b"), "left_anti")
        .localCheckpoint()
      val outCols = srcCol +: dstCol +: wSeq
      val newLabels = labelsOf(
        subStored.unionByName(freshE).toDF(outCols: _*), rounds, weighted)
      val maintained = old.join(affectedNodes, Seq("node"), "left_anti")
        .unionByName(newLabels)
        .localCheckpoint()
      if (!freshE.isEmpty) append(freshE.toDF(outCols: _*))
      // partition-pruned labels write: only affected nodes' partitions
      overwriteChangedState(labelsDir, maintained, "node", affectedNodes)
      writeMarker(marker)
      maintained
    }

    // ---- pagerank side state ---------------------------------------

    private def ranksDir = s"$path/graphranks"

    private def ranksMetaBody(iterations: Int, damping: Double,
        weighted: Boolean) =
      s"iterations=$iterations\ndamping=$damping\nweighted=$weighted\n" +
        s"layout=pb$StatePartitions"

    /** Both directions of the stored canonical pairs in long space —
      * the directed frame [[PageRank]] expects for an undirected
      * graph. */
    private def symmetrized(e: DataFrame): DataFrame = {
      val wSeq = weightCol.toSeq
      val base = e.select(
        (Seq(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
          ++ wSeq.map(col)): _*)
      base.select((Seq(col("a").as("src"), col("b").as("dst"))
          ++ wSeq.map(col)): _*)
        .unionByName(base.select((Seq(col("b").as("src"), col("a").as("dst"))
          ++ wSeq.map(col)): _*))
    }

    private def ranksOf(e: DataFrame, iterations: Int, damping: Double,
        weighted: Boolean): DataFrame =
      PageRank.gIterates(symmetrized(e), "src", "dst", iterations, damping,
        if (weighted) weightCol else None)

    /** The stored graph's N-FREE PageRank iterates (node, gs) — see
      * [[PageRank.gIterates]]: pr_t(v) = gs(t-1)(v) / N — computed
      * ONCE and persisted behind the crash-safe swap; later calls
      * read the parquet. A state written at different parameters (or
      * an older layout) is rebuilt.
      *
      * Why iterates and not ranks: g never mentions the node count,
      * so appended NEW NODES — which perturb every pr value through
      * the 1/N init and teleport constant — leave every stored g of
      * an edge-unaffected node exactly valid. The serve layer
      * ([[pageRanks]]) divides by the CURRENT N; maintenance
      * ([[appendAndMaintainRanks]]) recomputes only the delta's
      * iterations-hop neighborhood. */
    def ensureRanks(iterations: Int = 3, damping: Double = 0.85,
        weighted: Boolean = false): DataFrame = {
      require(!weighted || weightCol.nonEmpty,
        s"store at $path has no weight column for weighted ranks")
      val fs = new Path(ranksDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      SwapDir.heal(fs, new Path(ranksDir))
      val current = stateMeta(fs, new Path(s"$ranksDir/_graft_ranks_meta"))
        .contains(ranksMetaBody(iterations, damping, weighted))
      if (!current)
        writeStateFull(ranksDir, "_graft_ranks_meta",
          ranksMetaBody(iterations, damping, weighted),
          ranksOf(edges, iterations, damping, weighted), "node", fs)
      spark.read.parquet(s"$ranksDir/data").drop("pb")
    }

    /** (node, pr) of the stored graph served from the persisted
      * iterates: pr = g_T / N with N read from the state's own row
      * count (every node holds a row). Agreement with the inline
      * [[PageRank.run]] route is pinned by PairGraphStoreSpec at
      * 1e-12 relative (the two associate the 1/N division
      * differently; the values are the same reals). */
    def pageRanks(iterations: Int = 3, damping: Double = 0.85,
        weighted: Boolean = false): DataFrame = {
      val st = ensureRanks(iterations, damping, weighted).localCheckpoint()
      val n = st.count()
      st.select(col("node"),
        (element_at(col("gs"), iterations) / n.toDouble).as("pr"))
    }

    /** Fold a (possibly replayed) delta edge batch in AND maintain
      * the persisted PageRank iterates at DELTA-NEIGHBORHOOD cost.
      *
      * The maintenance theorem: out-degrees change exactly at delta
      * endpoints D, and g_t(v) depends on (g_{t-1}, deg) of v's
      * in-neighbors — so with A_0 = D and A_t = A_{t-1} ∪ N(A_{t-1})
      * (neighborhood in the GROWN graph), every node outside A_T
      * keeps its stored iterates bit-for-bit, new nodes included
      * (g_0 = 1 regardless of N — the N-free representation is what
      * makes node arrivals local). The patch A_T recomputes its
      * iterates round by round, reading boundary g values from the
      * stored state and boundary degrees from the stored edges; the
      * deterministic sorted folds ([[PageRank.gIterates]]) make the
      * patched values BIT-IDENTICAL to a from-scratch run over the
      * grown graph — PairGraphStoreSpec asserts exact double equality
      * on planted and randomized splits.
      *
      * Cost shape: T delta-neighborhood joins (frontier expansion) +
      * T patch-sized contribution folds; the corpus-sized state is
      * read lazily and only changed nodes' pb-partitions are
      * rewritten. Replay-idempotent: the delta dedups against stored
      * edges, the affected set derives from (delta, old state) only,
      * and a replayed batch recomputes the same patch to the same
      * values. */
    def appendAndMaintainRanks(
        delta: DataFrame,
        iterations: Int = 3,
        damping: Double = 0.85,
        weighted: Boolean = false): DataFrame = {
      val old = ensureRanks(iterations, damping, weighted)
      if (delta.isEmpty) return old
      val marker = appliedMarker(ranksDir, "add", appendBatchSig(delta))
      if (noRevocationLedger && markerPresent(marker)) return old
      val wSeq = (if (weighted) weightCol else None).toSeq
      val wAll = weightCol.toSeq
      // canonical delta, long-typed, deduped (weighted stores keep a
      // deterministic max weight — same policy as append)
      val dSel = delta.select(
        (Seq(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
          ++ wAll.map(col)): _*)
      val dEdges = (if (wAll.isEmpty) dSel.distinct()
        else dSel.groupBy(col("a"), col("b")).agg(max(col(wAll.head)).as(wAll.head)))
        .localCheckpoint()
      // fresh = not yet stored (replay dedup); the grown edge set the
      // maintained state must reflect is stored ∪ fresh — a replayed
      // batch (fresh empty) still recomputes the patch, which heals a
      // crash window where edges landed but the ranks write did not
      val storedC = edges.select(
        (Seq(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
          ++ wAll.map(col)): _*)
      val already = storedC.select(col("a"), col("b"))
        .join(broadcast(dEdges.select(col("a"), col("b"))), Seq("a", "b"), "left_semi")
      val freshE = dEdges.join(broadcast(already), Seq("a", "b"), "left_anti")
        .localCheckpoint()
      val grown = storedC.unionByName(freshE)
      val grownSym = {
        val pick = Seq(col("a"), col("b")) ++ wSeq.map(col)
        val base = grown.select(pick: _*)
        base.select((Seq(col("a").as("src"), col("b").as("dst"))
            ++ wSeq.map(col)): _*)
          .unionByName(base.select((Seq(col("b").as("src"), col("a").as("dst"))
            ++ wSeq.map(col)): _*))
      }.localCheckpoint()
      // affected set: T frontier expansions from the delta endpoints
      var affected = dEdges.select(col("a").as("node"))
        .unionByName(dEdges.select(col("b").as("node")))
        .distinct().localCheckpoint()
      for (_ <- 1 to iterations) {
        affected = cps(affected
          .unionByName(grownSym
            .join(affected.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
            .select(col("dst").as("node")))
          .distinct())
      }
      // the patch's in-edges, their sources' degrees, and the
      // boundary's stored iterates
      val hoodE = grownSym
        .join(affected.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint()
      val inSrc = hoodE.select(col("src").as("node")).distinct()
      val degP = PageRank.degrees(
        grownSym.join(inSrc.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
          .select(col("src"), col("dst"),
            (if (wSeq.isEmpty) lit(1.0) else col(wSeq.head).cast("double")).as("w")),
        weighted).localCheckpoint()
      // boundary nodes are never new (new nodes are delta endpoints
      // ⊆ affected), so their stored gs rows always exist
      val boundary = old
        .join(inSrc, Seq("node"), "left_semi")
        .join(affected, Seq("node"), "left_anti")
        .localCheckpoint()
      val hoodW = hoodE.select(col("src"), col("dst"),
        (if (wSeq.isEmpty) lit(1.0) else col(wSeq.head).cast("double")).as("w"))
      var patch = affected.withColumn("gs", array().cast("array<double>"))
      for (t <- 1 to iterations) {
        val gPrev = patch.select(col("node").as("src"),
            (if (t == 1) lit(1.0) else element_at(col("gs"), t - 1)).as("__g"))
          .unionByName(boundary.select(col("node").as("src"),
            (if (t == 1) lit(1.0) else element_at(col("gs"), t - 1)).as("__g")))
        patch = patch
          .join(PageRank.inFold(hoodW, degP, gPrev), Seq("node"), "left")
          .withColumn("gs", concat(col("gs"),
            array(lit(1.0 - damping) + lit(damping) * coalesce(col("__in"), lit(0.0)))))
          .drop("__in")
      }
      patch = cps(patch)
      val maintained = old.join(affected, Seq("node"), "left_anti")
        .unionByName(patch)
        .localCheckpoint()
      if (!freshE.isEmpty) append(freshE.toDF((srcCol +: dstCol +: wAll): _*))
      // partition-pruned write: only the patch's partitions
      overwriteChangedState(ranksDir, maintained, "node", affected)
      writeMarker(marker)
      maintained
    }

    // ---- seed-distance side state ----------------------------------

    private def distsDir(tag: String) = s"$path/graphdists_$tag"

    private def distsMetaBody(maxHops: Int, costMode: String) =
      s"maxHops=$maxHops\ncost=$costMode\nlayout=pb$StatePartitions"

    /** Edge cost under `costMode`: `unit` (hop counting — the BFS
      * twin), `weight` (the stored weight IS a cost), `oneMinusWeight`
      * (similarity weight in [0,1] → dissimilarity cost). */
    private def costExpr(costMode: String): org.apache.spark.sql.Column = {
      def w = col(weightCol.getOrElse(throw new IllegalArgumentException(
        s"store at $path has no weight column for costMode=$costMode")))
        .cast("double")
      costMode match {
        case "unit" => lit(1.0)
        case "weight" => w
        case "oneMinusWeight" => lit(1.0) - w
        case other => throw new IllegalArgumentException(
          s"unknown costMode: $other")
      }
    }

    /** Both directions of an (a, b[, weight]) canonical frame as
      * (src, dst, w) with w = the mode's edge cost. */
    private def symCost(canon: DataFrame, costMode: String): DataFrame = {
      val c = costExpr(costMode)
      canon.select(col("a").as("src"), col("b").as("dst"), c.as("w"))
        .unionByName(canon.select(col("b").as("src"), col("a").as("dst"), c.as("w")))
    }

    private def canonAll(df: DataFrame): DataFrame = df.select(
      (Seq(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
        ++ weightCol.toSeq.map(col)): _*)

    /** Hop-indexed seed distances of the stored graph —
      * [[MinPlusDistances.iterates]] (node, ds) persisted behind the
      * crash-safe swap. `tag` names the seed set (the caller's
      * contract: one tag ⇔ one seed frame — the meta cannot
      * fingerprint a DataFrame); states at a different maxHops /
      * costMode / layout rebuild. */
    def ensureDistances(tag: String, seeds: DataFrame, maxHops: Int = 4,
        costMode: String = "unit"): DataFrame = {
      require(tag.matches("[A-Za-z0-9_-]+"), s"tag must be a path-safe slug: $tag")
      val dir = distsDir(tag)
      val fs = new Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      SwapDir.heal(fs, new Path(dir))
      val current = stateMeta(fs, new Path(s"$dir/_graft_dists_meta"))
        .contains(distsMetaBody(maxHops, costMode))
      if (!current)
        writeStateFull(dir, "_graft_dists_meta",
          distsMetaBody(maxHops, costMode),
          MinPlusDistances.iterates(symCost(canonAll(edges), costMode),
            "src", "dst", "w", seeds, maxHops), "node", fs)
      spark.read.parquet(s"$dir/data").drop("pb")
    }

    /** Fold a (possibly replayed) delta edge batch in AND maintain the
      * persisted hop-indexed distances at IMPROVEMENT-FRONTIER cost.
      *
      * Edge insertions only ever LOWER a hop-bounded distance, so the
      * maintained values are min(stored, improvements), and every
      * improving ≤t-hop path decomposes as either (prefix already
      * improved at t−1) + any grown edge — covered by relaxing the
      * improvement frontier — or (prefix entirely pre-delta, cost =
      * stored d_{t−1}) + a FRESH edge — covered by relaxing the stored
      * hop-(t−1) values across the fresh edges only. Each round's work
      * is improvement-frontier-sized (plus one fresh-edge-sized read
      * of stored rows); the min-plus arithmetic is deterministic, so
      * maintained values are BIT-identical to a from-scratch
      * [[MinPlusDistances.iterates]] over the grown graph
      * (PairGraphStoreSpec). Replay-idempotent: a re-delivered batch
      * finds nothing to improve (stored already ≤ every candidate) and
      * rewrites no partitions. */
    def appendAndMaintainDistances(delta: DataFrame, tag: String,
        seeds: DataFrame, maxHops: Int = 4,
        costMode: String = "unit"): DataFrame = {
      val old = ensureDistances(tag, seeds, maxHops, costMode)
      if (delta.isEmpty) return old
      val marker = appliedMarker(distsDir(tag), "add", appendBatchSig(delta))
      if (noRevocationLedger && markerPresent(marker)) return old
      val wAll = weightCol.toSeq
      val dSel = canonAll(delta)
      val dEdges = (if (wAll.isEmpty) dSel.distinct()
        else dSel.groupBy(col("a"), col("b")).agg(max(col(wAll.head)).as(wAll.head)))
        .localCheckpoint()
      val storedC = canonAll(edges)
      val already = storedC.select(col("a"), col("b"))
        .join(broadcast(dEdges.select(col("a"), col("b"))), Seq("a", "b"), "left_semi")
      val freshE = dEdges.join(broadcast(already), Seq("a", "b"), "left_anti")
        .localCheckpoint()
      val grownSym = symCost(storedC.unionByName(freshE), costMode).localCheckpoint()
      val freshSym = symCost(freshE, costMode).localCheckpoint()
      val seedD = seeds.select(seeds.columns.head).toDF("node")
        .select(col("node").cast("long").as("node")).distinct()
        .withColumn("__v", lit(0.0)).localCheckpoint()
      val oldCk = old.localCheckpoint()
      // per-hop improvement frontiers (hop 0 has none: seeds are fixed)
      var imp = seedD.limit(0)
      val impByHop = scala.collection.mutable.ArrayBuffer[DataFrame]()
      for (t <- 1 to maxHops) {
        // stored hop-(t−1) values: seeds at 0 for t = 1
        val prevStored = if (t == 1) seedD
          else oldCk.select(col("node"),
              element_at(col("ds"), t - 1).as("__v"))
            .filter(col("__v") < lit(Double.PositiveInfinity))
        val candA = grownSym
          .join(imp.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node"), (col("__v") + col("w")).as("__v"))
        val candB = freshSym
          .join(prevStored.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node"), (col("__v") + col("w")).as("__v"))
        // an improvement at t−1 is also a ≤t-hop path — carry it
        val cand = candA.unionByName(candB).unionByName(imp)
          .groupBy(col("node")).agg(min(col("__v")).as("__v"))
        val baseline = oldCk.select(col("node"),
          element_at(col("ds"), t).as("__old"))
        imp = cps(cand.join(baseline, Seq("node"), "left")
          .filter(col("__old").isNull || col("__v") < col("__old"))
          .select(col("node"), col("__v")))
        impByHop += imp
      }
      val changed = cps(impByHop.map(_.select(col("node")))
        .reduce(_ unionByName _).distinct())
      // rebuild full ds arrays for changed nodes: min(stored, imp_t)
      var rows = changed
      for (t <- 1 to maxHops)
        rows = rows.join(impByHop(t - 1).toDF("node", s"__i$t"), Seq("node"), "left")
      val patched = rows.join(oldCk, Seq("node"), "left")
        .select(col("node"),
          array((1 to maxHops).map(t =>
            least(
              coalesce(element_at(col("ds"), t), lit(Double.PositiveInfinity)),
              coalesce(col(s"__i$t"), lit(Double.PositiveInfinity)))): _*).as("ds"))
      val maintained = oldCk.join(changed, Seq("node"), "left_anti")
        .unionByName(patched)
        .localCheckpoint()
      if (!freshE.isEmpty) append(freshE.toDF((srcCol +: dstCol +: wAll): _*))
      overwriteChangedState(distsDir(tag), maintained, "node", changed)
      writeMarker(marker)
      maintained
    }

    // ---- k-truss side state ----------------------------------------
    // Edge-keyed (the other states are node-keyed): a truss membership
    // is a property of the EDGE. Partitioned by the canonical lower
    // endpoint — pb = pmod(a, StatePartitions) — so a maintenance
    // batch overwrites only the partitions holding NEW truss edges
    // (insertions never evict an edge from the truss).

    private def trussDir = s"$path/graphtruss"

    private def trussMetaBody(k: Int) =
      s"k=$k\nlayout=pb$StatePartitions"

    /** Canonical k-truss edge set (a, b) of the stored graph, computed
      * once and persisted behind the crash-safe swap; later calls read
      * the parquet. A state written at a different k (or layout)
      * rebuilds. */
    def ensureTruss(k: Int): DataFrame = {
      val fs = new Path(trussDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      SwapDir.heal(fs, new Path(trussDir))
      val current = stateMeta(fs, new Path(s"$trussDir/_graft_truss_meta"))
        .contains(trussMetaBody(k))
      if (!current)
        writeStateFull(trussDir, "_graft_truss_meta", trussMetaBody(k),
          Truss.kTruss(edges, srcCol, dstCol, k), "a", fs)
      // explicit schema: a sparse graph's truss can be EMPTY, and an
      // all-empty partitioned dir (_SUCCESS only) cannot infer one
      spark.read.schema("a LONG, b LONG, pb INT")
        .parquet(s"$trussDir/data").drop("pb")
    }

    /** Fold a (possibly replayed) delta edge batch in AND maintain the
      * persisted k-truss at delta-neighborhood cost
      * ([[Truss.maintainAfterInsert]]). Replay-idempotent the same way
      * as cores: the delta dedups against stored edges before
      * appending, and a replayed batch's maintenance finds the stored
      * truss already at the fixpoint — zero changed edges, zero
      * partitions rewritten. The partition-pruned write relies on
      * insertion monotonicity: changed rows = maintained \ old, all
      * NEW truss edges. */
    def appendAndMaintainTruss(delta: DataFrame, k: Int): DataFrame = {
      val old = ensureTruss(k)
      val marker = appliedMarker(trussDir, "add", appendBatchSig(delta))
      if (noRevocationLedger && markerPresent(marker)) return old
      val canonDelta = delta
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b")
        .distinct()
      val stored = edges
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b")
      val fresh = canonDelta.join(stored, Seq("a", "b"), "left_anti")
      val maintained = Truss.maintainAfterInsert(
        old, stored, canonDelta, "a", "b", k)
        .localCheckpoint()
      if (!fresh.isEmpty) {
        val freshNamed = fresh.toDF(srcCol, dstCol)
        val withW = weightCol.fold(freshNamed)(w =>
          freshNamed.join(
            delta.select(col(srcCol), col(dstCol), col(w)),
            Seq(srcCol, dstCol), "left")
            .groupBy(col(srcCol), col(dstCol)).agg(max(col(w)).as(w)))
        append(withW)
      }
      val changed = maintained.join(old, Seq("a", "b"), "left_anti")
        .select(col("a"))
      overwriteChangedState(trussDir, maintained, "a", changed)
      writeMarker(marker)
      maintained
    }

    // ---- edge revocation (the deletion direction) --------------------

    /** Tombstone `deleted` pairs (revocation-ledger write; only pairs
      * actually present land in the ledger — replays tombstone
      * nothing) and INVALIDATE the side states that have NO
      * decremental maintainer — by default labels and distances
      * re-derive from the kept view on their next ensure (honest
      * rebuild). Labels DO have a decremental maintainer
      * ([[removeEdgesAndMaintainCommunities]]), which passes
      * `invalidateLabels = false` because it overwrites exactly the
      * affected partitions itself. Cores, truss and ranks are
      * maintained at affected-region cost by their own
      * `removeEdgesAndMaintain*`; cross-state staleness is the
      * caller's composition concern, exactly as on the insertion side
      * (use the streaming processAll shape to keep every state
      * current together). Returns the canonical revoked-now frame
      * (present pairs). */
    private def revoke(
        deleted: DataFrame,
        invalidateLabels: Boolean = true,
        keepDistTag: Option[String] = None): DataFrame = {
      val delCanon = deleted
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b").distinct()
      val stored = edges
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b")
      val present = KeyPrune.restrict(stored, delCanon, Seq("a"))
        .join(broadcast(delCanon), Seq("a", "b"), "left_semi")
        .localCheckpoint()
      if (!present.isEmpty) {
        present.coalesce(1)
          .write.mode(SaveMode.Append).parquet(s"$path/removededges")
        val fs = new Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (invalidateLabels) fs.delete(new Path(labelsDir), true)
        // tag-named distance states: drop every graphdists_* dir —
        // except the one a distance maintainer is itself patching
        // (other tags still invalidate: one maintain call fixes one
        // seed set's state, the rest re-derive on their next ensure)
        if (fs.exists(new Path(path)))
          fs.listStatus(new Path(path)).foreach { st =>
            if (st.isDirectory && st.getPath.getName.startsWith("graphdists_")
                && !keepDistTag.map(t => s"graphdists_$t")
                  .contains(st.getPath.getName))
              fs.delete(st.getPath, true)
          }
      }
      present
    }

    /** Revoke an edge batch AND maintain the persisted hop-indexed
      * seed distances for `tag` at AFFECTED-REGION cost — the deletion
      * twin of [[appendAndMaintainDistances]]. Deletions only remove
      * paths, so stored iterates become LOWER bounds; the region whose
      * values can rise is bounded by kept-hop radius: any old ≤t-hop
      * seed path through a deleted edge, decomposed at its LAST
      * deleted edge, ends in a kept-only suffix of ≤ t−1 hops from a
      * deleted endpoint — so only nodes within maxHops−1 KEPT hops of
      * a deleted endpoint can change. Those nodes' iterates are
      * re-relaxed over the kept graph with the recurrence's inputs
      * split at the region boundary: values INSIDE the region come
      * from the recomputation, values OUTSIDE from the stored state —
      * exact there, because an outside node admits no ≤maxHops path
      * through a deleted edge at all (path costs are edge sums, so
      * exactness does not depend on inside nodes' values). Min-plus
      * arithmetic is order-independent, so the maintained iterates are
      * BIT-identical to a from-scratch [[MinPlusDistances.iterates]]
      * over the kept graph (PairGraphStoreSpec pins planted
      * detour-removals and randomized splits). Nodes the deletion
      * unreaches drop from the state; only changed nodes' partitions
      * rewrite.
      *
      * Crash windows: the cores/ranks/labels deletion argument —
      * maintenance computes against the kept view and materializes
      * before the ledger write; replays recompute the same region to
      * the same fixpoint and rewrite no partitions. Other distance
      * tags' states invalidate inside [[revoke]] (this maintainer
      * patches only its own tag). */
    def removeEdgesAndMaintainDistances(
        deleted: DataFrame,
        tag: String,
        seeds: DataFrame,
        maxHops: Int = 4,
        costMode: String = "unit"): DataFrame = {
      val old = ensureDistances(tag, seeds, maxHops, costMode)
      if (deleted.isEmpty) return old
      val delCanon = deleted
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b").distinct().localCheckpoint()
      val marker = appliedMarker(distsDir(tag), "rm",
        batchSig(delCanon, Seq("a", "b")))
      if (markerPresent(marker)) return old
      val storedC = canonAll(edges)
      val keptC = storedC
        .join(broadcast(delCanon.select(col("a"), col("b"))),
          Seq("a", "b"), "left_anti")
        .localCheckpoint()
      val keptSym = symCost(keptC, costMode).localCheckpoint()
      // affected region: <= maxHops-1 kept hops around deleted endpoints
      var aff = cps(delCanon.select(col("a").as("node"))
        .unionByName(delCanon.select(col("b").as("node"))).distinct())
      var frontier = aff
      for (_ <- 1 until maxHops) {
        frontier = cps(keptSym
          .join(frontier.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node")).distinct()
          .join(aff, Seq("node"), "left_anti"))
        aff = cps(aff.unionByName(frontier))
      }
      val oldCk = old.localCheckpoint()
      val outside = oldCk.join(aff, Seq("node"), "left_anti").localCheckpoint()
      val seedD = seeds.select(seeds.columns.head).toDF("node")
        .select(col("node").cast("long").as("node")).distinct()
        .withColumn("__v", lit(0.0)).localCheckpoint()
      val intoA = keptSym
        .join(aff.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint()
      // hop-indexed re-relaxation of the region: d'_t(v in A) =
      // min(d'_{t-1}(v), min over kept (u,v) of prev(u) + w) with
      // prev(u) = recomputed inside A, stored outside
      var insidePrev = seedD.join(aff, Seq("node"), "left_semi")
      val hopVals = scala.collection.mutable.ArrayBuffer[DataFrame]()
      for (t <- 1 to maxHops) {
        val outsidePrev =
          if (t == 1) seedD.join(aff, Seq("node"), "left_anti")
          else outside.select(col("node"),
              element_at(col("ds"), t - 1).as("__v"))
            .filter(col("__v") < lit(Double.PositiveInfinity))
        val cand = intoA
          .join(insidePrev.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node"), (col("__v") + col("w")).as("__v"))
          .unionByName(intoA
            .join(outsidePrev.withColumnRenamed("node", "src"), Seq("src"))
            .select(col("dst").as("node"), (col("__v") + col("w")).as("__v")))
          .unionByName(insidePrev)
          .groupBy(col("node")).agg(min(col("__v")).as("__v"))
        insidePrev = cps(cand)
        hopVals += insidePrev.toDF("node", s"__v$t")
      }
      // assemble region rows; a node absent at every hop was never
      // reached over the kept graph and drops (matching from-scratch)
      var rows = hopVals.head
      for (t <- 2 to maxHops)
        rows = rows.join(hopVals(t - 1), Seq("node"), "full_outer")
      val patched = rows.select(col("node"),
        array((1 to maxHops).map(t =>
          coalesce(col(s"__v$t"), lit(Double.PositiveInfinity))): _*).as("ds"))
      val maintained = outside.unionByName(patched).localCheckpoint()
      revoke(delCanon.toDF(srcCol, dstCol), keepDistTag = Some(tag))
      val changed = maintained.select(col("node"), col("ds").as("__nd"))
        .join(oldCk.select(col("node"), col("ds").as("__od")),
          Seq("node"), "full_outer")
        .filter(col("__nd").isNull || col("__od").isNull ||
          col("__nd") =!= col("__od"))
        .select(col("node"))
      overwriteChangedState(distsDir(tag), maintained, "node", changed)
      writeMarker(marker)
      maintained
    }

    /** Revoke an edge batch AND maintain the persisted community
      * labels at affected-COMPONENT cost — the deletion twin of
      * [[appendAndMaintainCommunities]]. LPA labels and component ids
      * are component-local and deterministic, and a deletion can only
      * change labels INSIDE the deleted edges' old components: the
      * kept graph's components partition each old component (every
      * proper split piece contains a deleted-edge endpoint — a piece
      * with no endpoint would still have all its incident edges kept
      * and so not be a proper piece), so re-running CC + LPA over
      * exactly the touched old components' KEPT subgraph reproduces a
      * from-scratch run over the whole kept graph row for row
      * (PairGraphStoreSpec pins it on planted splits and randomized
      * splits). Untouched components' labels are read back unchanged
      * and their state partitions keep their files; nodes the
      * deletion isolates drop from the state (they leave the graph,
      * matching from-scratch).
      *
      * Crash windows (the cores/ranks deletion argument): maintenance
      * is computed against the kept view (stored minus the batch) and
      * materialized BEFORE the ledger write, so tombstones-landed/
      * labels-stale replays recompute the same affected region — the
      * kept view and the endpoints' stored components are unchanged —
      * and drive the state to the same fixpoint; a fully-replayed
      * batch recomputes the (already converged) region and rewrites
      * no partitions. The mid-partition-write mix is absorbed by the
      * [[overwriteChangedState]] contract. */
    def removeEdgesAndMaintainCommunities(
        deleted: DataFrame,
        rounds: Int = 3,
        weighted: Boolean = false): DataFrame = {
      val old = ensureCommunities(rounds, weighted)
      if (deleted.isEmpty) return old
      val delCanon = deleted
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b").distinct().localCheckpoint()
      val marker = appliedMarker(labelsDir, "rm",
        batchSig(delCanon, Seq("a", "b")))
      if (markerPresent(marker)) return old
      val wSeq = weightCol.toSeq
      val outCols = srcCol +: dstCol +: wSeq
      val storedE = edges.select(
        (Seq(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
          ++ wSeq.map(col)): _*)
      val keptE = storedE
        .join(broadcast(delCanon.select(col("a"), col("b"))),
          Seq("a", "b"), "left_anti")
      // old components of the deleted endpoints — endpoints never
      // stored (bogus revocations) have no component and touch nothing
      val oldComps = old.select(col("node"), col("comp"))
      val affectedComps = delCanon.select(col("a").as("node"))
        .unionByName(delCanon.select(col("b").as("node")))
        .distinct()
        .join(oldComps, Seq("node"))
        .select(col("comp")).distinct()
      val affectedNodes = old.join(affectedComps, Seq("comp"), "left_semi")
        .select(col("node"))
        .localCheckpoint()
      // both endpoints of a kept edge share an old component, so the
      // src side decides membership in the affected subgraph
      val subKept = keptE
        .join(affectedNodes.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
      val newLabels = labelsOf(subKept.toDF(outCols: _*), rounds, weighted)
      val maintained = old.join(affectedNodes, Seq("node"), "left_anti")
        .unionByName(newLabels)
        .localCheckpoint()
      revoke(delCanon.toDF(srcCol, dstCol), invalidateLabels = false)
      val changed = maintained
        .select(col("node"), col("community").as("__nc"), col("comp").as("__np"))
        .join(old.select(col("node"), col("community").as("__oc"),
          col("comp").as("__op")), Seq("node"), "full_outer")
        .filter(col("__oc").isNull || col("__nc").isNull ||
          col("__oc") =!= col("__nc") || col("__op") =!= col("__np"))
        .select(col("node"))
      overwriteChangedState(labelsDir, maintained, "node", changed)
      writeMarker(marker)
      maintained
    }

    /** Revoke an edge batch AND maintain the persisted core numbers at
      * affected-region cost ([[KCore.maintainAfterDelete]] — the
      * frontier h-index iteration). Maintenance is computed against
      * the PRE-revocation view and materialized before the ledger
      * write; crash windows replay: tombstones-landed/state-stale
      * re-runs the iteration from the stored cores (still an upper
      * bound) to the same fixpoint, and a fully-replayed batch finds
      * the stored cores already at the fixpoint and rewrites NO
      * partitions. Demoted AND disappeared (isolated) nodes' pb
      * partitions rewrite; untouched partitions keep their files. */
    def removeEdgesAndMaintainCores(deleted: DataFrame, maxK: Int): DataFrame = {
      val old = ensureCores(maxK)
      val delCanon = deleted
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b").distinct().localCheckpoint()
      val marker = appliedMarker(coresDir, "rm",
        batchSig(delCanon, Seq("a", "b")))
      if (markerPresent(marker)) return old
      val stored = edges
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b")
      val maintained = KCore.maintainAfterDelete(
        old, stored, delCanon, "a", "b", maxK)
        .localCheckpoint()
      revoke(delCanon.toDF(srcCol, dstCol))
      val changed = maintained
        .join(old.select(col("node"), col("core_number").as("__oldk")),
          Seq("node"), "full_outer")
        .filter(col("__oldk").isNull || col("core_number").isNull ||
          col("__oldk") =!= col("core_number"))
        .select(col("node"))
      overwriteChangedState(coresDir, maintained, "node", changed)
      writeMarker(marker)
      maintained
    }

    /** Revoke an edge batch AND maintain the persisted N-free
      * PageRank iterates — the deletion twin of
      * [[appendAndMaintainRanks]], reusing its patch argument: g_t(v)
      * depends only on v's ≤ t-hop in-neighborhood, and every
      * PRE-deletion path from a changed edge to a node decomposes
      * into kept segments joined at deleted-edge ENDPOINTS (old edges
      * = kept ∪ this batch), so expanding T frontiers from ALL
      * deleted endpoints over the KEPT graph covers every node whose
      * stored iterates can differ — and the same expansion replays
      * identically after the ledger landed (the kept view and the
      * seeds are unchanged), which heals the tombstones-landed/
      * ranks-stale crash window. Nodes isolated by the deletion drop
      * from the state (they leave the graph, matching from-scratch);
      * the patch recomputes against the kept graph with boundary g
      * values from the stored state, bit-identical to from-scratch by
      * the sorted-fold determinism. Only affected pb-partitions
      * rewrite. */
    def removeEdgesAndMaintainRanks(
        deleted: DataFrame,
        iterations: Int = 3,
        damping: Double = 0.85,
        weighted: Boolean = false): DataFrame = {
      val old = ensureRanks(iterations, damping, weighted)
      val wSeq = (if (weighted) weightCol else None).toSeq
      val wAll = weightCol.toSeq
      val delCanon = deleted
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b").distinct().localCheckpoint()
      if (delCanon.isEmpty) return old
      val marker = appliedMarker(ranksDir, "rm",
        batchSig(delCanon, Seq("a", "b")))
      if (markerPresent(marker)) return old
      val storedC = edges.select(
        (Seq(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
          ++ wAll.map(col)): _*)
      val keptC = storedC
        .join(broadcast(delCanon), Seq("a", "b"), "left_anti")
        .localCheckpoint()
      val keptSym = {
        val pick = Seq(col("a"), col("b")) ++ wSeq.map(col)
        val base = keptC.select(pick: _*)
        base.select((Seq(col("a").as("src"), col("b").as("dst"))
            ++ wSeq.map(col)): _*)
          .unionByName(base.select((Seq(col("b").as("src"), col("a").as("dst"))
            ++ wSeq.map(col)): _*))
      }.localCheckpoint()
      var affected = delCanon.select(col("a").as("node"))
        .unionByName(delCanon.select(col("b").as("node")))
        .distinct().localCheckpoint()
      for (_ <- 1 to iterations) {
        affected = cps(affected
          .unionByName(keptSym
            .join(affected.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
            .select(col("dst").as("node")))
          .distinct())
      }
      val hoodE = keptSym
        .join(affected.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint()
      val inSrc = hoodE.select(col("src").as("node")).distinct()
      val degP = PageRank.degrees(
        keptSym.join(inSrc.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
          .select(col("src"), col("dst"),
            (if (wSeq.isEmpty) lit(1.0) else col(wSeq.head).cast("double")).as("w")),
        weighted).localCheckpoint()
      val boundary = old
        .join(inSrc, Seq("node"), "left_semi")
        .join(affected, Seq("node"), "left_anti")
        .localCheckpoint()
      val hoodW = hoodE.select(col("src"), col("dst"),
        (if (wSeq.isEmpty) lit(1.0) else col(wSeq.head).cast("double")).as("w"))
      var patch = affected.withColumn("gs", array().cast("array<double>"))
      for (t <- 1 to iterations) {
        val gPrev = patch.select(col("node").as("src"),
            (if (t == 1) lit(1.0) else element_at(col("gs"), t - 1)).as("__g"))
          .unionByName(boundary.select(col("node").as("src"),
            (if (t == 1) lit(1.0) else element_at(col("gs"), t - 1)).as("__g")))
        patch = patch
          .join(PageRank.inFold(hoodW, degP, gPrev), Seq("node"), "left")
          .withColumn("gs", concat(col("gs"),
            array(lit(1.0 - damping) + lit(damping) * coalesce(col("__in"), lit(0.0)))))
          .drop("__in")
      }
      patch = cps(patch)
      // nodes isolated by the deletion leave the graph — and the state
      val keptNodes = keptSym.select(col("src").as("node")).distinct()
      val patchLive = patch.join(keptNodes, Seq("node"), "left_semi")
      val maintained = old.join(affected, Seq("node"), "left_anti")
        .unionByName(patchLive)
        .localCheckpoint()
      revoke(delCanon.toDF(srcCol, dstCol))
      overwriteChangedState(ranksDir, maintained, "node", affected)
      writeMarker(marker)
      maintained
    }

    /** Revoke an edge batch AND maintain the persisted k-truss
      * ([[Truss.maintainAfterDelete]] — closure from the deleted
      * edges within the old truss, peel against frozen survivors).
      * Same replay posture as cores; evicted edges' pb partitions
      * rewrite, untouched partitions keep their files. */
    def removeEdgesAndMaintainTruss(deleted: DataFrame, k: Int): DataFrame = {
      val old = ensureTruss(k)
      val delCanon = deleted
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b").distinct().localCheckpoint()
      val marker = appliedMarker(trussDir, "rm",
        batchSig(delCanon, Seq("a", "b")))
      if (markerPresent(marker)) return old
      val stored = edges
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b")
      val maintained = Truss.maintainAfterDelete(
        old, stored, delCanon, "a", "b", k)
        .localCheckpoint()
      revoke(delCanon.toDF(srcCol, dstCol))
      // deletions only shrink the truss: changed = evicted edges
      val changed = old.join(maintained, Seq("a", "b"), "left_anti")
        .select(col("a"))
      overwriteChangedState(trussDir, maintained, "a", changed)
      writeMarker(marker)
      maintained
    }
  }

  /** Persist a verified edge frame at `path` (staged + swapped: a
    * reader never sees a half-written graph). `numFiles` bounds the
    * output file count; the range partitioning on (src, dst) gives
    * parquet tight min/max stats per row group for per-node reads. */
  def build(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String],
      path: String,
      numFiles: Int = 8): Handle = {
    val spark = edges.sparkSession
    val staging = path + ".staging"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)

    val cols = srcCol +: dstCol +: weightCol.toSeq
    val canon = edges.select(cols.map(col): _*)
    // empty bootstrap (a store the stream grows from zero): an empty
    // write plan can emit ZERO part files, leaving a schema-less dir
    // the read-back cannot infer — force one schema-bearing file
    (if (canon.isEmpty) Partitioning.emptyOnePartition(spark, canon.schema)
     else canon.repartitionByRange(numFiles, col(srcCol), col(dstCol))
       .sortWithinPartitions(col(srcCol), col(dstCol)))
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/edges")
    writeMeta(spark, s"$staging/_graft_meta", srcCol, dstCol, weightCol)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    Handle(spark, path, srcCol, dstCol, weightCol)
  }

  /** Rewrite the edge dir at a target file count — small-files hygiene
    * after many [[Handle.append]]s; restores the (src, dst) row-group
    * sort appends interleave. Crash-safe whole-store swap. */
  def compact(handle: Handle, targetFiles: Int = 8): Handle = {
    import handle.{path, spark}
    val staging = path + ".staging"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)

    handle.edges
      .repartitionByRange(targetFiles, col(handle.srcCol), col(handle.dstCol))
      .sortWithinPartitions(col(handle.srcCol), col(handle.dstCol))
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/edges")
    writeMeta(spark, s"$staging/_graft_meta",
      handle.srcCol, handle.dstCol, handle.weightCol)
    // maintained side states (labels/cores/ranks/truss/distances) stay
    // VALID across compaction — the serve view is unchanged, only the
    // revoked physical rows and the ledger leave — so they ride the
    // swap instead of being dropped for a full re-derive on next
    // ensure. Markers ride too: a replayed removal batch whose rows
    // were purged finds its present-set empty and no-ops; a replayed
    // insert batch of later-revoked-then-compacted pairs must keep
    // skipping (re-adding them would resurrect the takedown). A crash
    // between these moves and the swap strands states in staging: the
    // next ensure rebuilds them from the kept view (same values, full
    // cost) — never stale data.
    fs.listStatus(new Path(path)).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n != "edges" && n != "removededges" &&
          !n.startsWith("."))
        fs.rename(st.getPath, new Path(staging, n))
    }
    SwapDir.swap(fs, new Path(staging), new Path(path))
    handle
  }

  /** Merge-on-read pressure: revoked pairs over PHYSICAL edge rows —
    * None when no ledger exists (existence probe only). */
  def revokedRatio(handle: Handle): Option[Double] = {
    val p = new Path(s"${handle.path}/removededges")
    val fs = p.getFileSystem(
      handle.spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(handle.removedEdges.count().toDouble /
      math.max(1L, handle.physicalEdges.count()).toDouble)
  }

  /** Size-ratio compaction trigger (the LshStore.autoCompact policy):
    * every consumer's edge view pays the revocation anti-join until
    * compact purges — past `maxRatio` the store compacts, side states
    * riding the swap unchanged. */
  def autoCompact(handle: Handle, maxRatio: Double = 0.25,
      targetFiles: Int = 8): Handle =
    revokedRatio(handle) match {
      case Some(r) if r > maxRatio => compact(handle, targetFiles)
      case _ => handle
    }

  /** Open an existing store (heals an interrupted swap first). */
  def open(spark: SparkSession, path: String): Handle = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    val meta = readMeta(spark, s"$path/_graft_meta")
    val v = meta.getOrElse("version", "?")
    require(v == Version.toString,
      s"pair-graph store at $path has version $v, expected $Version")
    Handle(spark, path, meta("srcCol"), meta("dstCol"),
      meta.get("weightCol").filter(_.nonEmpty))
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    fs.exists(new Path(s"$path/_graft_meta"))
  }

  /** Open the store at `path`, building it from `edges` first if
    * absent — the serve-side entry point. `edges` is by-name: an
    * existing store never runs the (expensive) generator plan. */
  def ensure(
      edges: => DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String],
      spark: SparkSession,
      path: String): Handle =
    if (exists(spark, path)) {
      val meta = readMeta(spark, s"$path/_graft_meta")
      if (meta.getOrElse("version", "?") != Version.toString)
        build(edges, srcCol, dstCol, weightCol, path)
      else {
        val h = open(spark, path)
        require(h.srcCol == srcCol && h.dstCol == dstCol,
          s"pair-graph store at $path holds (${h.srcCol}, ${h.dstCol}), " +
            s"asked for ($srcCol, $dstCol)")
        h
      }
    } else build(edges, srcCol, dstCol, weightCol, path)

  private def writeMeta(spark: SparkSession, file: String,
      srcCol: String, dstCol: String, weightCol: Option[String]): Unit = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      (s"version=$Version\nsrcCol=$srcCol\ndstCol=$dstCol\n" +
        s"weightCol=${weightCol.getOrElse("")}\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, file: String): Map[String, String] = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"not a pair-graph store (missing ${p})")
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }
      .toMap
  }
}
