package graft.ann

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.SwapDir

/** Persisted SRP-LSH signature index for EMBEDDINGS — the vector
  * analogue of [[graft.dedup.LshStore]] (which persists MinHash
  * signatures for text): per-vector signed-random-projection bucket
  * postings and the vectors themselves (with precomputed norms) kept
  * on disk, so near-duplicating a batch of NEW vectors against a
  * grown corpus costs one signature pass over the DELTA plus a
  * bucket join — the corpus is never re-signed and its vectors are
  * read only for the candidate-pruned verify.
  *
  * Layout under `path`:
  *   - `postings/…parquet` — (id, tbl, bkt): L×1 rows per vector,
  *     the candidate-generation input (16 bytes per posting —
  *     signature-sized regardless of vector dimension);
  *   - `vectors/…parquet` — (id, vec, norm): the verify side table,
  *     sorted by id so candidate-pruned reads skip row groups (the
  *     IvfStore convention — the store doubles as the vector serving
  *     copy);
  *   - `_graft_meta` — nBits/tables/dim/seed/maxBucketSize/threshold.
  *
  * Determinism: the hyperplane family is seeded
  * ([[Ann.hyperplanes]]), so a delta signed today collides into
  * exactly the buckets the corpus was signed into at build time —
  * the incremental pair set equals the full self-join's restricted
  * to delta-touching pairs (SrpStoreSpec proves the equality on
  * the harness corpus), which is what lets the downstream
  * [[graft.operators.PairGraphStore]] maintenance consume the delta
  * pairs as if the whole graph had been rebuilt.
  */
object SrpStore {

  // v2: adds the `bucketcounts` side table — per-(table, bucket)
  // posting counts, merged ADDITIVELY at append — so the oversized-
  // bucket guard reads a bucket-cardinality-sized table plus a
  // delta-sized aggregate instead of re-counting the corpus postings
  // on every delta batch.
  // v3: postings laid out sorted by (tbl, bkt) in 8 MB row groups (the
  // PostingsStore idiom) and the serve path prunes the corpus side
  // with the DELTA's bucket set ([[graft.operators.KeyPrune]]) before
  // the candidate join — the last corpus-sized per-delta read is gone:
  // a batch reads the postings rows of the buckets it touches, not the
  // corpus's. Appends are additionally replay-idempotent at POSTINGS
  // granularity (not just vectors), closing the counts-over-statement
  // crash window.
  // v4: meta carries `maxBucketN`, an UPPER BOUND on any stored
  // bucket's posting count (exact at build/compact, raised additively
  // at append) — when bound + the delta's own max cannot exceed
  // maxBucketSize, the micro-serve skips the guard read outright:
  // provably no bucket can drop. A crash between the counts append
  // and the meta rewrite leaves the bound stale-LOW, which can only
  // SKIP a drop — wider candidates the exact-cosine verify still
  // filters: the same direction as the counts-under-statement append
  // contract.
  // v5: meta carries `vecElem` (float|double) so every accessor reads
  // with an EXPLICIT schema — a fresh handle's first postings/vectors
  // access used to run a parquet schema-inference job each (2 of the
  // 5 serve-path jobs on a per-call handle, measured).
  private val Version = 5

  /** Row-group size for the postings layout: small groups mean a
    * bucket-pruned read skips at fine granularity (same constant as
    * [[graft.operators.PostingsStore.RowGroupBytes]]). */
  val RowGroupBytes: Long = 8L * 1024 * 1024

  /** SRP family parameters — fixed at build time; a delta must be
    * signed with the SAME family or its buckets never collide with
    * the corpus. `threshold` is the verify cosine floor the store's
    * pair outputs carry. */
  final case class Config(
      nBits: Int = 8,
      tables: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      maxBucketSize: Int = 10000,
      threshold: Double = 0.35)

  final case class Handle(
      spark: SparkSession,
      path: String,
      idCol: String,
      vecCol: String,
      cfg: Config,
      initialBucketBound: Long = Long.MaxValue,
      vecElem: String = "") {

    /** Upper bound on any stored bucket's posting count (meta
      * `maxBucketN`) — exact after build/compact, raised additively by
      * [[append]]; lets the micro-serve skip the guard read when no
      * bucket can possibly exceed `maxBucketSize`. `Long.MaxValue` =
      * unknown (always read). */
    @transient private var bucketBound: Long = initialBucketBound

    // GENERATION-CHECKED READS (round 15, replacing the former
    // single-live-handle contract comment with a mechanism — the
    // IvfStore registry's (path, meta-mtime) key applied per read):
    // every mutating path finishes by rewriting `_graft_meta`, so the
    // meta mtime IS the store generation; each accessor stats it (one
    // driver-side getFileStatus) and drops the cached frames + re-reads
    // the bound when it moved. A second live handle on the same path
    // therefore serves the new generation on its NEXT read after
    // another handle's append/remove/compact — no FileNotFoundException
    // on swapped-away files, no stale rows, no stale maxBucketN. The
    // one residual window: a crash BETWEEN a mutation's data writes and
    // its meta touch leaves other handles unrefreshed until the next
    // mutation — under-stated bound + missed tombstones only, the
    // widen-candidates / replay-convergent direction every crash
    // window here already takes.
    // Per-handle cached table frames (the LshStore.Handle convention):
    // each spark.read.parquet re-lists the directory and re-reads a
    // footer at plan time — measurable per-serve-call driver overhead
    // on a micro delta.
    @transient private var postingsDf: DataFrame = _
    @transient private var vectorsDf: DataFrame = _
    @transient private var bucketCountsDf: DataFrame = _
    @transient private var removedDf: DataFrame = _
    @transient private var cachedGen: Long = -1L
    private def invalidateReads(): Unit = {
      postingsDf = null; vectorsDf = null
      bucketCountsDf = null; removedDf = null
      cachedGen = -1L
    }

    /** Drop caches and re-read the bound when the store generation
      * (meta mtime) moved since they were built — called by every
      * accessor. */
    private def freshen(): Unit = {
      val p = new Path(s"$path/_graft_meta")
      val m = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).getModificationTime
      if (m != cachedGen) {
        postingsDf = null; vectorsDf = null
        bucketCountsDf = null; removedDf = null
        bucketBound = readMeta(spark, s"$path/_graft_meta")
          .get("maxBucketN").map(_.toLong).getOrElse(Long.MaxValue)
        cachedGen = m
      }
    }

    /** Invalidate the cached reads — called by the mutating paths AND
      * by [[SrpStore.compact]], whose atomic swap replaces the files a
      * pre-compact handle's caches still list. */
    private[SrpStore] def invalidate(): Unit = invalidateReads()

    def postings: DataFrame = {
      freshen()
      if (postingsDf == null)
        postingsDf = spark.read.schema("id LONG, tbl INT, bkt INT")
          .parquet(s"$path/postings")
      postingsDf
    }
    def vectors: DataFrame = {
      freshen()
      if (vectorsDf == null)
        vectorsDf =
          if (vecElem == "float" || vecElem == "double")
            spark.read.schema(s"id LONG, vec ARRAY<$vecElem>, norm DOUBLE")
              .parquet(s"$path/vectors")
          else spark.read.parquet(s"$path/vectors") // pre-v5 meta: infer
      vectorsDf
    }

    /** Tombstoned vector ids ([[remove]]'s merge-on-read ledger) —
      * empty when no takedown has run. */
    def removedIds: DataFrame = {
      freshen()
      if (removedDf == null) {
        val p = new Path(s"$path/removed")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        removedDf =
          if (fs.exists(p)) spark.read.schema("id LONG").parquet(s"$path/removed")
          else spark.range(0).select(col("id"))
      }
      removedDf
    }

    /** Exclude tombstoned rows from a frame carrying `c` as the vector
      * id — the merge-on-read filter every serve path applies. The
      * ledger is takedown-sized, so the anti-join broadcasts. */
    private def live(df: DataFrame, c: String): DataFrame =
      df.join(broadcast(removedIds.withColumnRenamed("id", c)), Seq(c), "left_anti")

    /** (tbl, bkt, n) stored posting counts — the guard's input. May
      * carry several rows per bucket after appends (additive; the
      * guard sums); compact collapses them. */
    def bucketCounts: DataFrame = {
      freshen()
      if (bucketCountsDf == null)
        bucketCountsDf = spark.read.schema("tbl INT, bkt INT, n LONG")
          .parquet(s"$path/bucketcounts")
      bucketCountsDf
    }

    /** Verified near-dup pairs of an incoming batch against the
      * stored corpus AND within the batch — `(vec_a, vec_b, cos)`,
      * vec_a < vec_b canonical, exact cosine > threshold, cos
      * rounded to 4 (the [[Ann.lshNearDupPairs]] output contract, so
      * the frame feeds [[graft.operators.PairGraphStore]] directly).
      * Old-old pairs are NOT re-reported: the corpus side joins only
      * against delta buckets. The oversized-bucket guard is computed
      * over the UNION population and applied to both sides, matching
      * the full-build semantics. */
    def nearDupsOfDelta(delta: DataFrame): DataFrame = {
      // micro-vs-bulk probe: one NARROW (id-only) job. A micro delta's
      // bucket set sits under both the literal cap and the coverage
      // gate by construction, so every downstream frame is delta-sized
      // — keep the kernel pass on the scan's natural partitioning (at
      // ~20 rows the 32-way spread exchange costs more than the SRP
      // kernels it parallelizes — the r12 micro-serve floor). Bulk
      // deltas keep the spread for kernel width.
      val micro =
        delta.select(col(idCol)).count() * cfg.tables <=
          graft.operators.KeyPrune.MaxChunkedKeys.toLong
      // DRIVER-RESOLVED micro-serve (the LshStore.microNearDups design
      // — see its call site for the full argument): candidates + exact
      // cosine resolved on the driver in two delta-bounded jobs + one
      // pruned corpus read, bit-identical output (same bucket
      // expressions collected, [[graft.functions.ExactMath]] for the
      // dot/round arithmetic), hard caps falling back to the
      // distributed route, skipped when a tombstone ledger exists.
      if (micro &&
          delta.schema(idCol).dataType ==
            org.apache.spark.sql.types.LongType && !removedLedgerPresent)
        microNearDups(delta) match {
          case Some(res) => return res
          case None => () // a cap tripped — serve distributed
        }
      val src =
        if (micro) delta else graft.operators.Partitioning.spread(delta)
      // ONE delta scan feeds both sides: (id, vec, norm) persists once,
      // postings derive from the cached vectors (v3 ran postingsOf and
      // vectorsOf as two separate scans + kernel passes over the delta)
      val base = src
        .select(col(idCol).as("id"), col(vecCol).as("vec"),
          VectorFunctions.l2Norm(col(vecCol)).as("norm"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dPost = base
        .select(col("id"),
          posexplode(Ann.srpSignatures(col("vec"), cfg.nBits, cfg.dim,
            cfg.seed, cfg.tables)))
        .select(col("id"), col("pos").as("tbl"), col("col").as("bkt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = candidatePairsOfDelta(dPost)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // verify side read candidate-pruned too: the id-sorted vector
      // table skips every row group outside the candidate endpoints.
      // Literal-or-nothing: the verify join already restricts rows, so
      // only a storage-level skip (small candidate set) can pay.
      val vPrune = graft.operators.KeyPrune.plan(
        cand.select(col("vec_a").as("id"))
          .unionByName(cand.select(col("vec_b").as("id"))), Seq("id"),
        semiJoinFallback = false)
      val allVecs = live(vPrune(vectors), "id").unionByName(base)
      val pairs = cand
        .join(allVecs.select(col("id").as("vec_a"), col("vec").as("__va"),
          col("norm").as("__na")), Seq("vec_a"))
        .join(allVecs.select(col("id").as("vec_b"), col("vec").as("__vb"),
          col("norm").as("__nb")), Seq("vec_b"))
        .withColumn("__cos", VectorFunctions.cosineWithNorms(
          VectorFunctions.dot(col("__va"), col("__vb")),
          col("__na"), col("__nb")))
        .filter(col("__cos") > cfg.threshold)
        .select(col("vec_a"), col("vec_b"), round(col("__cos"), 4).as("cos"))
        // eager checkpoint, then drop the caches: a LOOPING caller
        // (the streaming ingest, one call per micro-batch) would
        // otherwise accumulate cached delta postings without bound —
        // the Ann.lshNearDupPairsReleasable lesson, handled internally
        // here since the result is delta-sized
        .localCheckpoint()
      cand.unpersist()
      dPost.unpersist()
      base.unpersist()
      pairs
    }

    private def removedLedgerPresent: Boolean = {
      val p = new Path(s"$path/removed")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }

    /** [[nearDupsOfDelta]] resolved on the driver; None when a cap
      * trips (the caller then serves distributed). */
    private def microNearDups(delta: DataFrame): Option[DataFrame] = {
      import scala.collection.mutable
      import org.apache.spark.sql.types._
      // only the two element types the codegen kernels accept — and
      // the stored table must agree with the delta (same family)
      val deltaElem = delta.schema(vecCol).dataType match {
        case ArrayType(t @ (FloatType | DoubleType), _) => t
        case _ => return None
      }
      val storedElem = vectors.schema("vec").dataType match {
        case ArrayType(t @ (FloatType | DoubleType), _) => t
        case _ => return None
      }
      val outSchema = StructType(Seq(
        StructField("vec_a", LongType), StructField("vec_b", LongType),
        StructField("cos", DoubleType)))
      def local(rows: Seq[org.apache.spark.sql.Row]): DataFrame =
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          outSchema)
      // (double)-normalized copy: the kernels cast each float element
      // to double before multiplying, so pre-widening is bit-identical
      def widen(r: org.apache.spark.sql.Row, i: Int, t: DataType): Array[Double] =
        t match {
          case FloatType => r.getSeq[Float](i).iterator.map(_.toDouble).toArray
          case _ => r.getSeq[Double](i).toArray
        }
      // job 1: one fused pass — vector, norm, and the per-table
      // (tbl, bkt) array in the same projection postingsOf explodes
      val prep = delta
        .select(col(idCol).as("id"), col(vecCol).as("vec"),
          VectorFunctions.l2Norm(col(vecCol)).as("norm"),
          Ann.srpSignatures(col(vecCol), cfg.nBits, cfg.dim, cfg.seed,
            cfg.tables).as("tb"))
        .collect()
      if (prep.isEmpty) return Some(local(Nil))
      val vecs = mutable.HashMap.empty[Long, (Array[Double], Double)]
      val deltaBuckets =
        mutable.HashMap.empty[(Int, Int), mutable.ArrayBuffer[Long]]
      prep.foreach { r =>
        val id = r.getLong(0)
        vecs(id) = (widen(r, 1, deltaElem), r.getDouble(2))
        r.getSeq[Int](3).iterator.zipWithIndex.foreach { case (bkt, tbl) =>
          deltaBuckets.getOrElseUpdate((tbl, bkt),
            mutable.ArrayBuffer.empty[Long]) += id
        }
      }
      val deltaMax = deltaBuckets.valuesIterator.map(_.size).max.toLong
      val keepKeys: Set[(Int, Int)] =
        if (bucketBound != Long.MaxValue &&
            bucketBound <= cfg.maxBucketSize - deltaMax)
          deltaBuckets.keySet.toSet
        else {
          val storedN = graft.operators.KeyPrune.collectChunked(
              bucketCounts, Seq("tbl", "bkt"),
              deltaBuckets.keys.toSeq.map(k => Seq(k._1, k._2)))
            .groupBy(r => (r.getInt(0), r.getInt(1)))
            .map { case (k, rs) => k -> rs.iterator.map(_.getLong(2)).sum }
          deltaBuckets.keysIterator.filter(k =>
            storedN.getOrElse(k, 0L) + deltaBuckets(k).size
              <= cfg.maxBucketSize).toSet
        }
      if (keepKeys.isEmpty) return Some(local(Nil))
      // job 2: literal-pruned corpus postings (chunked past the
      // single-predicate cap; guard-bounded, the cap is a backstop)
      val corpusRows = graft.operators.KeyPrune.collectChunked(
        postings, Seq("tbl", "bkt"),
        keepKeys.toSeq.map(k => Seq(k._1, k._2)))
      if (corpusRows.length > graft.dedup.LshStore.MaxDriverCorpusRows)
        return None
      val corpusBuckets =
        mutable.HashMap.empty[(Int, Int), mutable.ArrayBuffer[Long]]
      corpusRows.foreach { r =>
        corpusBuckets.getOrElseUpdate((r.getInt(1), r.getInt(2)),
          mutable.ArrayBuffer.empty[Long]) += r.getLong(0)
      }
      val pairs = mutable.HashSet.empty[(Long, Long)]
      keepKeys.foreach { k =>
        val d = deltaBuckets(k)
        val c = corpusBuckets.getOrElse(k, mutable.ArrayBuffer.empty[Long])
        d.foreach { y =>
          def add(x: Long): Unit =
            if (x != y) pairs += ((math.min(x, y), math.max(x, y)))
          c.foreach(add)
          d.foreach(add)
        }
      }
      if (pairs.size > graft.dedup.LshStore.MaxDriverPairs) return None
      if (pairs.isEmpty) return Some(local(Nil))
      // job 3 (only when corpus vectors are endpoints): candidate-id
      // pruned vector read
      val corpusOnly = pairs.iterator
        .flatMap(p => Iterator(p._1, p._2))
        .filterNot(vecs.contains).toSet
      if (corpusOnly.size > graft.operators.KeyPrune.MaxChunkedKeys)
        return None
      if (corpusOnly.nonEmpty)
        graft.operators.KeyPrune.collectChunked(
            vectors, Seq("id"), corpusOnly.toSeq.map(Seq(_)))
          .foreach(r =>
            vecs(r.getLong(0)) = (widen(r, 1, storedElem), r.getDouble(2)))
      // exact cosine: the codegen dot's left-to-right accumulation,
      // null-on-zero-norm (excluded by the strict threshold filter),
      // Spark Round — verifying exactly what the distributed route does
      val out = pairs.toSeq.flatMap { case (a, b) =>
        (vecs.get(a), vecs.get(b)) match {
          case (Some((va, na)), Some((vb, nb))) if na != 0.0 && nb != 0.0 =>
            val cos = graft.functions.ExactMath.dotDouble(
              scala.collection.immutable.ArraySeq.unsafeWrapArray(va),
              scala.collection.immutable.ArraySeq.unsafeWrapArray(vb)) /
              (na * nb)
            if (cos > cfg.threshold)
              Some(org.apache.spark.sql.Row(a, b,
                graft.functions.ExactMath.round(cos, 4)))
            else None
          case _ => None
        }
      }
      Some(local(out))
    }

    /** Delta postings through the store's seeded family — the
      * [[candidatePairsOfDelta]] input (exposed at package level so
      * SrpStoreSpec can drive the candidate stage directly and assert
      * the corpus-side prune on its executed plan). */
    private[graft] def deltaPostings(delta: DataFrame): DataFrame =
      postingsOf(delta, idCol, vecCol, cfg)

    /** The guarded candidate bucket join of [[nearDupsOfDelta]],
      * factored out pre-verify. One delta-bounded job resolves the
      * delta's bucket set (at most tables·2^nBits tuples — always
      * literal for the default family) into a prune applied to BOTH
      * corpus-side reads: only rows in a delta-touched bucket can ever
      * join, so the corpus read costs what the delta touches, not what
      * the corpus holds — the (tbl, bkt)-sorted row groups skip
      * everything else. The union-population guard runs WITHOUT
      * re-counting corpus postings: stored per-bucket counts (pruned
      * to delta buckets — others never join) + the delta's own counts,
      * summed — identical drop set to counting the union directly over
      * the joinable buckets (SrpStoreSpec pins it). */
    private[graft] def candidatePairsOfDelta(dPost: DataFrame): DataFrame = {
      // coverage gate: the bucket space is tables·2^nBits by
      // construction — a bulk delta touching more than half of it
      // makes the prune pure overhead (the candidate equi-join
      // restricts to the same rows), so it degrades to identity
      val space = cfg.tables.toLong * (1L << cfg.nBits)
      val cap = math.min(
        graft.operators.KeyPrune.MaxLiteralKeys.toLong, space / 2).toInt
      // ONE delta-bounded job: distinct buckets WITH per-bucket counts,
      // capped at the route cap + 1 — under it the route is literal and
      // the union-population guard resolves DRIVER-side (the LshStore
      // micro-route shape: v3 ran a union-counts shuffle + a broadcast
      // exchange per serve call for a drop set bounded by the delta's
      // bucket count anyway)
      val sample = dPost
        .groupBy(col("tbl"), col("bkt")).agg(count(lit(1)).as("n"))
        .limit(cap + 1).collect()
      if (sample.isEmpty)
        return dPost.limit(0)
          .select(col("id").as("vec_a"), col("id").as("vec_b"))
      if (sample.length <= cap) {
        // union-population guard on the driver; skipped outright when
        // the store-wide bound proves no bucket can exceed the cap
        // (the LshStore micro-route shape)
        val deltaMax = sample.iterator.map(_.getLong(2)).max
        val keep: IndexedSeq[org.apache.spark.sql.Row] =
          if (bucketBound != Long.MaxValue &&
              bucketBound <= cfg.maxBucketSize - deltaMax)
            sample.toIndexedSeq
          else {
            val pred = graft.operators.KeyPrune.literalPredicate(
              Seq("tbl", "bkt"),
              sample.toIndexedSeq.map(r => Seq(r.get(0), r.get(1))))
            // raw additive rows summed driver-side — no shuffle stage
            val storedN = bucketCounts.filter(pred).collect()
              .groupBy(r => (r.get(0), r.get(1)))
              .map { case (k, rs) => k -> rs.iterator.map(_.getLong(2)).sum }
            sample.toIndexedSeq.filter(r =>
              storedN.getOrElse((r.get(0), r.get(1)), 0L) + r.getLong(2)
                <= cfg.maxBucketSize)
          }
        if (keep.isEmpty)
          return dPost.limit(0)
            .select(col("id").as("vec_a"), col("id").as("vec_b"))
        val keepPred = graft.operators.KeyPrune.literalPredicate(
          Seq("tbl", "bkt"), keep.map(r => Seq(r.get(0), r.get(1))))
        val dP =
          if (keep.length == sample.length) dPost else dPost.filter(keepPred)
        val a = live(postings.filter(keepPred), "id").unionByName(dP).as("a")
        val b = dP.as("b")
        return a.join(b,
            col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt") &&
            col("a.id") =!= col("b.id"))
          .select(least(col("a.id"), col("b.id")).as("vec_a"),
            greatest(col("a.id"), col("b.id")).as("vec_b"))
          .distinct()
      }
      // BULK route — the v3 distributed shape
      val prune = graft.operators.KeyPrune.plan(dPost, Seq("tbl", "bkt"),
        noPruneAbove = _ => space / 2)
      // bulk path (no literal prune): spread the row-group-granular
      // postings read back to full width (the LshStore bulk-path note)
      val corpusP = live(graft.operators.Partitioning
        .spreadIfLarge(prune(postings), literal = prune.isLiteral), "id")
      val allPost = corpusP.unionByName(dPost)
      val unionCounts = prune(bucketCounts)
        .unionByName(dPost.groupBy(col("tbl"), col("bkt"))
          .agg(count(lit(1)).as("n")))
        .groupBy(col("tbl"), col("bkt")).agg(sum(col("n")).as("n"))
      val drop = broadcast(
        unionCounts.filter(col("n") > cfg.maxBucketSize)
          .select(col("tbl"), col("bkt")))
      val a = allPost.join(drop, Seq("tbl", "bkt"), "left_anti").as("a")
      val b = dPost.join(drop, Seq("tbl", "bkt"), "left_anti").as("b")
      a.join(b,
          col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt") &&
          col("a.id") =!= col("b.id"))
        .select(least(col("a.id"), col("b.id")).as("vec_a"),
          greatest(col("a.id"), col("b.id")).as("vec_b"))
        .distinct()
    }

    /** Fold new vectors into the index — the ingest path after
      * [[nearDupsOfDelta]]. REPLAY-SAFE at PER-TABLE granularity:
      * already-stored ids are anti-joined away against VECTORS (the
      * last write — a fully-landed batch replays as a no-op), and the
      * postings/bucketcounts pair is additionally guarded against ids
      * whose postings already landed, so a crash in ANY window —
      * including after the counts append but before the vectors write
      * — replays without double-writing postings or counts. Counts can
      * therefore only ever be UNDER-stated (a crash between the
      * postings and counts writes skips the counts on replay): the
      * guard then drops strictly fewer buckets than the true union
      * would, which only ADDS candidate pairs the exact-cosine verify
      * still filters — never a lost pair. (v2 keyed the dedup on
      * vectors alone; a counts-written/vectors-missing crash window
      * could OVER-state counts on replay and guard-drop buckets the
      * true population would keep.) */
    def append(delta: DataFrame): Handle = {
      // a tombstoned id still has physical rows, so re-appending it
      // would be skipped by the dedup below while every read excludes
      // it - silently absent. Fail loud instead; compact clears the
      // ledger and makes the id appendable again.
      val clash = delta.select(col(idCol).cast("long").as("id"))
        .join(broadcast(removedIds), Seq("id"), "left_semi")
      require(clash.isEmpty,
        "append: batch contains tombstoned ids - re-adding a removed " +
          "vector is out of contract until compact purges the ledger")
      val fresh = delta
        .join(vectors.select(col("id").as(idCol)), Seq(idCol), "left_anti")
        .localCheckpoint()
      if (fresh.isEmpty) return this
      // replay guard for the signature-side writes: a narrow id-column
      // probe of the postings, restricted to this batch's ids
      val alreadyPosted = postings
        .join(broadcast(fresh.select(col(idCol).as("id"))), Seq("id"), "left_semi")
        .select(col("id").as(idCol)).distinct().localCheckpoint()
      val toSign = fresh.join(alreadyPosted, Seq(idCol), "left_anti")
      if (!toSign.isEmpty) {
        val fPost = postingsOf(toSign, idCol, vecCol, cfg)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        fPost
          .sortWithinPartitions(col("tbl"), col("bkt"))
          .write.mode(SaveMode.Append)
          .option("parquet.block.size", RowGroupBytes)
          .parquet(s"$path/postings")
        // counts merge additively (the guard sums per bucket); ordered
        // AFTER the postings write so any crash between them leaves
        // counts under-stated only (see above)
        val counts = fPost
          .groupBy(col("tbl"), col("bkt")).agg(count(lit(1)).as("n"))
          .localCheckpoint()
        counts.coalesce(1)
          .write.mode(SaveMode.Append).parquet(s"$path/bucketcounts")
        // raise the store-wide bucket bound additively and persist it
        // — ordered AFTER the counts write, so a crash between them
        // leaves the bound stale-LOW (skipped drop, wider candidates:
        // the contract's direction)
        val dMax = counts.agg(max(col("n"))).collect()(0).getLong(0)
        if (bucketBound != Long.MaxValue)
          bucketBound = bucketBound + dMax
        fPost.unpersist()
      }
      vectorsOf(fresh, idCol, vecCol)
        .sortWithinPartitions(col("id"))
        .write.mode(SaveMode.Append).parquet(s"$path/vectors")
      // meta rewrite LAST — its mtime is the store generation other
      // handles' reads key on (a crash before it leaves them stale in
      // the under-stated-bound direction only)
      writeMeta(spark, s"$path/_graft_meta", idCol, vecCol, cfg, bucketBound,
        vecElem)
      invalidateReads()
      this
    }

    /** Take vectors DOWN — the index right-to-forget: a merge-on-read
      * tombstone ledger (`removed/`) that every serve path anti-joins
      * (takedown-sized, broadcast), plus an ADDITIVE bucket-count
      * decrement so the oversized-bucket guard keeps judging the KEPT
      * population (counts rows already merge by summation; the
      * removed ids' buckets re-derive from their STORED vectors —
      * an id-pruned, takedown-sized read — never by re-signing the
      * corpus). Serve results equal a store built from the kept
      * corpus (SrpStoreSpec); [[compact]] physically drops tombstoned
      * rows and clears the ledger.
      *
      * Crash/replay: already-tombstoned ids are excluded up front, so
      * a replayed takedown is a no-op; the count decrement lands
      * BEFORE the tombstones, so the one crash window (counts
      * decremented, tombstones unwritten, replay decrements again)
      * leaves counts UNDER-stated only — the guard then drops fewer
      * buckets than the kept population would, which only widens
      * candidates the exact-cosine verify filters (the append
      * contract's direction). Ids never stored tombstone harmlessly
      * (no rows to exclude, no counts to decrement). */
    def remove(ids: DataFrame): Handle = {
      val rid = ids.select(col(ids.columns.head).cast("long").as("id"))
        .distinct()
        .join(broadcast(removedIds), Seq("id"), "left_anti")
        .localCheckpoint()
      if (rid.isEmpty) return this
      // the ids' postings re-derive from their stored vectors
      val vPrune = graft.operators.KeyPrune.plan(rid, Seq("id"),
        semiJoinFallback = false)
      val gone = vPrune(vectors)
        .join(broadcast(rid), Seq("id"), "left_semi")
        .localCheckpoint()
      if (!gone.isEmpty)
        postingsOf(gone, "id", "vec", cfg)
          .groupBy(col("tbl"), col("bkt"))
          .agg((-count(lit(1))).as("n"))
          .coalesce(1)
          .write.mode(SaveMode.Append).parquet(s"$path/bucketcounts")
      rid.coalesce(1).write.mode(SaveMode.Append).parquet(s"$path/removed")
      // decrements only lower true counts: the stored bound stays a
      // valid upper bound. Meta rewrite LAST — moves the generation
      // other handles' reads key on (a crash before it leaves them
      // missing tombstones until the next mutation; the replayed
      // takedown converges)
      writeMeta(spark, s"$path/_graft_meta", idCol, vecCol, cfg, bucketBound,
        vecElem)
      invalidateReads()
      this
    }

    /** ANN top-k served FROM the store: sign only the query batch,
      * probe its buckets (plus every bucket at hamming distance <=
      * `probeHamming` per table), read corpus postings bucket-pruned,
      * then exact-cosine re-rank on the candidate-pruned vector rows
      * — the corpus is never re-signed per query batch (the
      * [[graft.ann.Ann.lshTopK]] inline route signs it every call).
      *
      * Contract: for a store built with `tables = 1` and the same
      * (nBits, dim, seed), `topK(..., probeHamming = 1)` returns
      * EXACTLY [[Ann.lshTopK]]'s rows — same candidate set (one table,
      * own bucket + nBits hamming-1 probes), same cosine, same
      * (cos desc, id) tie-break (SrpStoreSpec pins the equality). With
      * `tables > 1` the candidate set is the OR over tables — a
      * higher-recall family, same output shape.
      *
      * Output: (query_id, neighbor_id, cos, rnk), rnk <= k. */
    def topK(
        queries: DataFrame,
        queryIdCol: String,
        queryVecCol: String,
        k: Int,
        probeHamming: Int = 1): DataFrame = {
      require(probeHamming >= 0 && probeHamming <= 1,
        s"probeHamming must be 0 or 1, got $probeHamming")
      // DRIVER-RESOLVED micro-serve (the microNearDups design): a
      // query batch whose probe-bucket set fits the literal cap
      // resolves candidates + exact cosine on the driver in three
      // pruned jobs (fused query prep, literal-pruned postings,
      // candidate-pruned vectors) instead of ~6 micro-jobs of fixed
      // local floor — bit-identical rows (signatures and norms come
      // from the SAME Spark expressions, dot/rank arithmetic via
      // [[graft.functions.ExactMath]]), hard caps falling back to the
      // distributed route, skipped when a tombstone ledger exists.
      if (queries.schema(queryIdCol).dataType ==
          org.apache.spark.sql.types.LongType && !removedLedgerPresent)
        microTopK(queries, queryIdCol, queryVecCol, k, probeHamming) match {
          case Some(res) => return res
          case None => () // a cap tripped — serve distributed
        }
      topKDistributed(queries, queryIdCol, queryVecCol, k, probeHamming, None)
    }

    /** The shared distributed serve route of [[topK]] and
      * [[topKFiltered]] (the IvfStore.topKAdcImpl pattern — one copy,
      * so the filtered route cannot drift): signature-probe, pruned
      * postings read, bucket join, optional allowed semi-join, exact
      * re-rank on candidate-pruned vectors. */
    private def topKDistributed(
        queries: DataFrame,
        queryIdCol: String,
        queryVecCol: String,
        k: Int,
        probeHamming: Int,
        allowedIds: Option[DataFrame]): DataFrame = {
      // per-table signatures computed once per query row (one fused
      // kernel), THEN exploded into probe buckets (sig + single-bit
      // flips)
      val probeStructs = (0 until cfg.tables).flatMap { t =>
        val s = col("__sigs").getItem(t)
        struct(lit(t).as("tbl"), s.as("bkt")) +:
          (if (probeHamming >= 1)
            (0 until cfg.nBits).map(b =>
              struct(lit(t).as("tbl"), s.bitwiseXOR(lit(1 << b)).as("bkt")))
          else Seq.empty)
      }
      val probes = queries.select(col(queryIdCol),
          Ann.srpSignatures(col(queryVecCol), cfg.nBits, cfg.dim, cfg.seed,
            cfg.tables).as("__sigs"))
        .select(col(queryIdCol), explode(array(probeStructs: _*)).as("tb"))
        .select(col(queryIdCol), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
      // query-batch-bounded key set prunes the postings read; the
      // bucket join then yields one candidate row per (query, id)
      val prune = graft.operators.KeyPrune.plan(probes, Seq("tbl", "bkt"),
        noPruneAbove = _ => cfg.tables.toLong * (1L << cfg.nBits) / 2)
      val candRaw = live(prune(postings), "id")
        .join(probes, Seq("tbl", "bkt"))
        .select(col(queryIdCol), col("id"))
        .distinct()
      // the allowed semi-join lands BEFORE the checkpoint, so the
      // vector prune below sees only surviving ids; `allowed` may be
      // corpus-sized — semi-joined, never collected
      val candIds = allowedIds.fold(candRaw)(a =>
          candRaw.join(a, Seq("id"), "left_semi"))
        // eager + reusable: the id prune below collects from it, then
        // the re-rank joins it — without this the bucket join runs twice
        .localCheckpoint()
      // exact re-rank: the id-sorted vector table read CANDIDATE-pruned
      // (row-group skip / semi-join on the candidate id set), stored
      // norms reused
      val vPrune = graft.operators.KeyPrune.plan(
        candIds.select(col("id")), Seq("id"), semiJoinFallback = false)
      val qn = queries.select(col(queryIdCol), col(queryVecCol),
        VectorFunctions.l2Norm(col(queryVecCol)).as("__qn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(queryIdCol)).orderBy(col("cos").desc, col("id"))
      candIds
        .join(vPrune(vectors), Seq("id"))
        .join(broadcast(qn), Seq(queryIdCol))
        .withColumn("cos", VectorFunctions.cosineWithNorms(
          VectorFunctions.dot(col("vec"), col(queryVecCol)),
          col("norm"), col("__qn")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select(col(queryIdCol).as("query_id"), col("id").as("neighbor_id"),
          col("cos"), col("rnk"))
    }

    /** [[topK]] restricted to an ALLOWED id set — filtered vector
      * search, the production "ANN + metadata predicate" shape: the
      * caller resolves its predicate to an id frame (e.g. documents
      * with lang = 'en'), and ranking happens AMONG those ids only
      * (rnk <= k counts allowed neighbors — a post-filter of plain
      * topK would return fewer than k). The filter lands on the
      * CANDIDATE set before the exact re-rank, so the vector read is
      * pruned by the FILTERED candidates; `allowed` may be
      * corpus-sized (first column = corpus id; semi-joined, never
      * collected — at 100 TB the predicate side stays distributed).
      * Same probe approximation as [[topK]]; at the degenerate
      * (nBits = 1, tables = 1) family the probes cover the whole
      * space and the result is EXACTLY the exhaustive filtered top-k
      * (SrpStoreSpec pins it; q232/q232b share one oracle). Served
      * distributed (no driver micro route: the allowed-membership
      * probe would add the job the micro path saves). */
    def topKFiltered(
        queries: DataFrame,
        queryIdCol: String,
        queryVecCol: String,
        k: Int,
        allowed: DataFrame,
        probeHamming: Int = 1): DataFrame = {
      require(probeHamming >= 0 && probeHamming <= 1,
        s"probeHamming must be 0 or 1, got $probeHamming")
      val allowedIds = allowed.select(
        col(allowed.columns.head).cast("long").as("id"))
      topKDistributed(queries, queryIdCol, queryVecCol, k, probeHamming,
        Some(allowedIds))
    }

    /** [[topK]] resolved on the driver; None when a cap trips (the
      * caller then serves distributed). */
    private def microTopK(
        queries: DataFrame,
        queryIdCol: String,
        queryVecCol: String,
        k: Int,
        probeHamming: Int): Option[DataFrame] = {
      import scala.collection.mutable
      import org.apache.spark.sql.types._
      val qElem = queries.schema(queryVecCol).dataType match {
        case ArrayType(t @ (FloatType | DoubleType), _) => t
        case _ => return None
      }
      val storedElem = vectors.schema("vec").dataType match {
        case ArrayType(t @ (FloatType | DoubleType), _) => t
        case _ => return None
      }
      val perQuery =
        cfg.tables * (1 + (if (probeHamming >= 1) cfg.nBits else 0))
      val cap = graft.operators.KeyPrune.MaxChunkedKeys.toLong
      def widen(r: org.apache.spark.sql.Row, i: Int, t: DataType): Array[Double] =
        t match {
          case FloatType => r.getSeq[Float](i).iterator.map(_.toDouble).toArray
          case _ => r.getSeq[Double](i).toArray
        }
      // job 1: one fused pass — query vector, norm, and the per-table
      // signature through the SAME Spark expressions the distributed
      // route evaluates (bit-identical buckets and norms). Collected
      // WITHOUT a count pre-gate: topK batches are request-sized by
      // the serving contract (unlike ingest deltas, which nearDups
      // count-gates), so the cap check runs post-collect — one job
      // saved on every serve call.
      val prep = queries
        .select(col(queryIdCol).as("id"), col(queryVecCol).as("vec"),
          VectorFunctions.l2Norm(col(queryVecCol)).as("norm"),
          Ann.srpSignatures(col(queryVecCol), cfg.nBits, cfg.dim, cfg.seed,
            cfg.tables).as("tb"))
        .collect()
      if (prep.length.toLong * perQuery > cap) return None
      val outSchema = StructType(Seq(
        StructField("query_id", LongType), StructField("neighbor_id", LongType),
        StructField("cos", DoubleType), StructField("rnk", IntegerType)))
      def local(rows: Seq[org.apache.spark.sql.Row]): DataFrame =
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          outSchema)
      if (prep.isEmpty) return Some(local(Nil))
      // driver probe expansion: own bucket + single-bit flips — the
      // same integer arithmetic as the distributed probeStructs
      val qVecs = mutable.HashMap.empty[Long, (Array[Double], Double)]
      val qProbes = mutable.HashMap.empty[Long, Array[(Int, Int)]]
      prep.foreach { r =>
        val id = r.getLong(0)
        qVecs(id) = (widen(r, 1, qElem), r.getDouble(2))
        qProbes(id) = r.getSeq[Int](3).iterator.zipWithIndex.flatMap {
          case (s, t) =>
            Iterator((t, s)) ++ (if (probeHamming >= 1)
              (0 until cfg.nBits).iterator.map(b => (t, s ^ (1 << b)))
            else Iterator.empty)
        }.toArray
      }
      val probeKeys = qProbes.valuesIterator.flatten.toSet
      // job 2: literal-pruned corpus postings (chunked past the
      // single-predicate cap)
      val postRows = graft.operators.KeyPrune.collectChunked(
        postings, Seq("tbl", "bkt"),
        probeKeys.toSeq.map(k0 => Seq(k0._1, k0._2)))
      if (postRows.length > graft.dedup.LshStore.MaxDriverCorpusRows)
        return None
      val byBucket = mutable.HashMap.empty[(Int, Int), mutable.ArrayBuffer[Long]]
      postRows.foreach { r =>
        val key = (r.getInt(1), r.getInt(2))
        if (probeKeys.contains(key))
          byBucket.getOrElseUpdate(key, mutable.ArrayBuffer.empty[Long]) +=
            r.getLong(0)
      }
      // candidate (query, id) set — the distributed route's distinct
      val cands = mutable.HashMap.empty[Long, mutable.HashSet[Long]]
      qProbes.foreach { case (q, keys) =>
        val s = cands.getOrElseUpdate(q, mutable.HashSet.empty[Long])
        keys.foreach(k0 => byBucket.get(k0).foreach(ids => s ++= ids))
      }
      val candIds = cands.valuesIterator.flatten.toSet
      if (candIds.isEmpty) return Some(local(Nil))
      if (candIds.size > graft.operators.KeyPrune.MaxChunkedKeys) return None
      // job 3: candidate-pruned vector rows (id-sorted table row-group
      // skips outside the candidate set; chunked past the cap)
      val vecRows = mutable.HashMap.empty[Long, (Array[Double], Double)]
      graft.operators.KeyPrune.collectChunked(
          vectors, Seq("id"), candIds.toSeq.map(Seq(_)))
        .foreach(r =>
          vecRows(r.getLong(0)) = (widen(r, 1, storedElem), r.getDouble(2)))
      // exact re-rank: the codegen dot's accumulation via ExactMath,
      // cosineWithNorms' null-on-zero-norm, (cos desc NULLS LAST, id)
      // — exactly the distributed window's ordering
      val out = cands.toSeq.flatMap { case (q, ids) =>
        val (qv, qn) = qVecs(q)
        val scored = ids.toSeq.map { id =>
          val (cv, cn) = vecRows(id)
          val cos: java.lang.Double =
            if (cn == 0.0 || qn == 0.0) null
            else java.lang.Double.valueOf(graft.functions.ExactMath.dotDouble(
              scala.collection.immutable.ArraySeq.unsafeWrapArray(cv),
              scala.collection.immutable.ArraySeq.unsafeWrapArray(qv)) /
              (cn * qn))
          (id, cos)
        }
        scored.sortWith { case ((ia, ca), (ib, cb)) =>
          if (ca == null && cb == null) ia < ib
          else if (ca == null) false // nulls last under desc
          else if (cb == null) true
          else if (ca.doubleValue != cb.doubleValue)
            ca.doubleValue > cb.doubleValue
          else ia < ib
        }.take(k).zipWithIndex.map { case ((id, cos), i) =>
          org.apache.spark.sql.Row(q, id, cos, i + 1)
        }
      }
      Some(local(out))
    }
  }

  /** (id, tbl, bkt) SRP bucket postings — spread so a single-split
    * scan cannot serialize the L×nBits signature kernels. */
  private def postingsOf(df: DataFrame, idCol: String, vecCol: String,
      cfg: Config): DataFrame =
    graft.operators.Partitioning.spread(df)
      .select(col(idCol).as("id"),
        posexplode(Ann.srpSignatures(col(vecCol), cfg.nBits, cfg.dim,
          cfg.seed, cfg.tables)))
      .select(col("id"), col("pos").as("tbl"), col("col").as("bkt"))

  /** (id, vec, norm) verify rows — norms once per vector at write
    * time, never per candidate pair at serve time. */
  private def vectorsOf(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    graft.operators.Partitioning.spread(df)
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        VectorFunctions.l2Norm(col(vecCol)).as("norm"))

  /** The meta `vecElem` tag of a corpus frame ("" = unsupported
    * element type: accessors fall back to schema inference). */
  private def elemName(df: DataFrame, vecCol: String): String =
    df.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => "float"
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, _) => "double"
      case _ => ""
    }

  /** Sign + persist the corpus at `path` (staged + swapped).
    * `numFiles` sets the postings range-partition count — more files
    * means finer (tbl, bkt) ranges per row group, hence finer
    * delta-bucket skip granularity (at 100 TB the 8 MB row-group cap
    * provides the granularity; at test scale raise numFiles). */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      cfg: Config = Config(),
      numFiles: Int = 8): Handle = {
    val spark = corpus.sparkSession
    val staging = path + ".staging"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)

    // (tbl, bkt)-range-partitioned + sorted in 8 MB row groups: the
    // layout that lets the delta-bucket prune (nearDupsOfDelta, topK)
    // skip everything outside the touched buckets
    postingsOf(corpus, idCol, vecCol, cfg)
      .repartitionByRange(numFiles, col("tbl"), col("bkt"))
      .sortWithinPartitions(col("tbl"), col("bkt"))
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", RowGroupBytes)
      .parquet(s"$staging/postings")
    vectorsOf(corpus, idCol, vecCol)
      .sortWithinPartitions(col("id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/vectors")
    spark.read.parquet(s"$staging/postings")
      .groupBy(col("tbl"), col("bkt")).agg(count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/bucketcounts")
    val bound = maxBucketN(spark, s"$staging/bucketcounts")
    val elem = elemName(corpus, vecCol)
    writeMeta(spark, s"$staging/_graft_meta", idCol, vecCol, cfg, bound, elem)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    Handle(spark, path, idCol, vecCol, cfg, bound, elem)
  }

  /** Exact max per-bucket count of a freshly written counts table —
    * the meta `maxBucketN` seed (one tiny single-file job at
    * build/compact time). */
  private def maxBucketN(spark: SparkSession, countsPath: String): Long = {
    val r = spark.read.parquet(countsPath).agg(max(col("n"))).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Small-files hygiene after many appends; no re-sign. */
  /** Merge-on-read pressure: tombstoned ids over PHYSICAL vector
    * rows — None when no ledger exists (existence probe only). */
  def tombstoneRatio(handle: Handle): Option[Double] = {
    val p = new Path(s"${handle.path}/removed")
    val fs = p.getFileSystem(
      handle.spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(handle.removedIds.count().toDouble /
      math.max(1L, handle.vectors.count()).toDouble)
  }

  /** Size-ratio compaction trigger (the LshStore.autoCompact policy):
    * tombstones cost every serve an anti-join AND keep the guard
    * counts merely additive — past `maxRatio` the store compacts;
    * serve results identical before/after (SrpStoreSpec's compact
    * equality). */
  def autoCompact(handle: Handle, maxRatio: Double = 0.25,
      targetFiles: Int = 8): Handle =
    tombstoneRatio(handle) match {
      case Some(r) if r > maxRatio => compact(handle, targetFiles)
      case _ => handle
    }

  def compact(handle: Handle, targetFiles: Int = 8): Handle = {
    import handle.{cfg, idCol, path, spark, vecCol}
    val staging = path + ".staging"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)

    // distinct defensively (append's per-table replay guard should
    // already keep postings exactly-once); restores the (tbl, bkt)
    // sort that interleaved appends erode. Tombstoned rows drop HERE:
    // the staging dir carries no removed/ ledger, so the swap both
    // purges the rows and clears the ledger atomically
    val removed = handle.removedIds
    handle.postings
      .join(broadcast(removed), Seq("id"), "left_anti")
      .distinct()
      .repartitionByRange(targetFiles, col("tbl"), col("bkt"))
      .sortWithinPartitions(col("tbl"), col("bkt"))
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", RowGroupBytes)
      .parquet(s"$staging/postings")
    // recount from the deduplicated postings: collapses additive rows
    // AND heals any at-least-once inflation from crash-replayed appends
    spark.read.parquet(s"$staging/postings")
      .groupBy(col("tbl"), col("bkt")).agg(count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/bucketcounts")
    handle.vectors
      .join(broadcast(removed), Seq("id"), "left_anti")
      .repartitionByRange(targetFiles, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/vectors")
    val bound = maxBucketN(spark, s"$staging/bucketcounts")
    val elem =
      if (handle.vecElem.nonEmpty) handle.vecElem
      else elemName(handle.vectors, "vec")
    writeMeta(spark, s"$staging/_graft_meta", idCol, vecCol, cfg, bound, elem)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    // the swap replaced every file the input handle's caches list
    handle.invalidate()
    Handle(spark, path, idCol, vecCol, cfg, bound, elem)
  }

  def open(spark: SparkSession, path: String): Handle = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    val meta = readMeta(spark, s"$path/_graft_meta")
    val v = meta.getOrElse("version", "?")
    require(v == Version.toString,
      s"SRP store at $path has version $v, expected $Version")
    Handle(spark, path, meta("idCol"), meta("vecCol"),
      Config(
        nBits = meta("nBits").toInt,
        tables = meta("tables").toInt,
        dim = meta("dim").toInt,
        seed = meta("seed").toLong,
        maxBucketSize = meta("maxBucketSize").toInt,
        threshold = meta("threshold").toDouble),
      meta.get("maxBucketN").map(_.toLong).getOrElse(Long.MaxValue),
      meta.getOrElse("vecElem", ""))
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    fs.exists(new Path(s"$path/_graft_meta"))
  }

  /** Open-or-build entry point (`corpus` by-name: an existing store
    * never runs the signing plan). */
  def ensure(
      corpus: => DataFrame,
      idCol: String,
      vecCol: String,
      spark: SparkSession,
      path: String,
      cfg: Config = Config()): Handle =
    if (exists(spark, path)) {
      val meta = readMeta(spark, s"$path/_graft_meta")
      if (meta.getOrElse("version", "?") != Version.toString) {
        // layout changed since this store was published (e.g. v1 had
        // no bucketcounts): rebuild in place behind the atomic swap
        build(corpus, idCol, vecCol, path, cfg)
      } else {
        val h = open(spark, path)
        require(h.idCol == idCol && h.vecCol == vecCol,
          s"SRP store at $path holds (${h.idCol}, ${h.vecCol}), " +
            s"asked for ($idCol, $vecCol)")
        h
      }
    } else build(corpus, idCol, vecCol, path, cfg)

  private def writeMeta(spark: SparkSession, file: String,
      idCol: String, vecCol: String, cfg: Config, maxBucketN: Long,
      vecElem: String): Unit = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      (s"version=$Version\nidCol=$idCol\nvecCol=$vecCol\n" +
        s"nBits=${cfg.nBits}\ntables=${cfg.tables}\ndim=${cfg.dim}\n" +
        s"seed=${cfg.seed}\nmaxBucketSize=${cfg.maxBucketSize}\n" +
        s"threshold=${cfg.threshold}\nmaxBucketN=$maxBucketN\n" +
        s"vecElem=$vecElem\n")
        .getBytes("UTF-8"))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, file: String): Map[String, String] = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"not an SRP store (missing ${p})")
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }
      .toMap
  }
}
