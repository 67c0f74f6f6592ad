package graft.dedup

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.SwapDir

/** Persisted MinHash-LSH index — the incremental-ingest shape of
  * [[MinHashLSH]]: signatures and hashed shingles are computed ONCE
  * per document and kept on disk, so deduplicating a new batch
  * against a grown corpus costs one signature pass over the DELTA
  * plus a bucket join — never a re-shingle of the corpus. (Reference
  * scope: nvd2mysqlloader deduplicates nothing — part of the mandated
  * training-data dedup extension set; the store is the dedup-side
  * analogue of [[graft.operators.PostingsStore]].)
  *
  * Layout under `path`:
  *   - `sigs/…parquet` — (doc, sig: array<long>[numHashes]); the
  *     append-time source of truth for banding. Signature-sized:
  *     numHashes longs per doc regardless of document length.
  *   - `banded/…parquet` — (doc, band, bucket) banded signatures,
  *     sorted by (band, bucket) in 8 MB row groups; the candidate-
  *     generation table, read delta-bucket-pruned at serve time.
  *   - `shingles/…parquet` — (doc, hsh: array<long>) distinct hashed
  *     shingles, the exact-Jaccard verification input; sorted by doc
  *     so candidate-pruned reads skip row groups.
  *   - `_graft_meta` — numHashes/bands/shingleN/seed/idCol/version.
  *
  * Why persist both: candidate generation touches only `sigs`
  * (numHashes longs per doc); verification touches `shingles` only
  * for the candidate pairs (a join-pruned read). Document TEXT is
  * never read again after build/append — at 100 TB the corpus text
  * stays cold while the index serves every incoming batch.
  *
  * Determinism: the hash family is seeded, so a delta signatured
  * today collides into exactly the buckets the corpus was banded
  * into at build time — recall of the incremental join equals the
  * full self-join's by construction ([[LshStoreSpec]] proves the
  * equivalence).
  */
object LshStore {

  // v2: adds the `bandcounts` side table — per-(band, bucket) banded
  // signature counts, merged additively at append — the oversized-
  // bucket guard reads it plus a delta-sized aggregate instead of
  // re-banding (a second full pass over) the corpus signatures on
  // every delta batch.
  // v3: adds the `banded/` table — (doc, band, bucket) banded
  // signatures persisted sorted by (band, bucket) in 8 MB row groups —
  // and the serve path prunes the corpus side with the DELTA's bucket
  // set ([[graft.operators.KeyPrune]]) before the candidate join: v2
  // still re-banded the whole corpus signature table per delta call;
  // v3 reads only the banded rows of delta-touched buckets, and the
  // exact-Jaccard verify reads only candidate docs' shingle row
  // groups. Appends become replay-idempotent at per-table granularity
  // (the SrpStore v3 pattern) instead of a disjointness contract.
  // v4: meta carries `maxBucketN`, an UPPER BOUND on any stored
  // bucket's banded-row count (exact at build/compact, raised
  // additively at append) — when bound + the delta's own max cannot
  // exceed maxBucketSize, the micro-serve skips the guard read
  // outright: provably no bucket can drop. A crash between the counts
  // append and the meta rewrite leaves the bound stale-LOW, which can
  // only SKIP a drop — wider candidates the exact-Jaccard verify
  // still filters: the same direction as the counts-under-statement
  // append contract.
  private val Version = 4

  /** Row-group size for the banded/shingle layout: small groups mean
    * a pruned read skips at fine granularity (the
    * [[graft.operators.PostingsStore.RowGroupBytes]] constant). */
  val RowGroupBytes: Long = 8L * 1024 * 1024

  /** Driver-resolution backstops for the micro-serve path: a collect
    * that could exceed these falls back to the distributed route
    * (guard-bounded in practice — a kept bucket holds at most
    * maxBucketSize rows). 2^17 rows is ~2 MB of (id, band, bucket)
    * postings / ~15 MB of pair tuples — driver-trivial; the caps
    * bound pathological bucket skew, not normal large micro-batches
    * (which the chunked literal route now serves — see
    * [[graft.operators.KeyPrune.MaxChunkedKeys]]). */
  val MaxDriverCorpusRows: Int = 1 << 17
  val MaxDriverPairs: Int = 1 << 17

  /** Char bound for the bulk micro-serve's DELTA collect: job 1
    * collects every delta row WITH its hashed-shingle array, and
    * shingle count scales with document LENGTH, not row count — a
    * row-count cap alone admits an arbitrarily large collect (131 k
    * rows of 10 MB documents is a terabyte). One hash per word
    * shingle is at most one per 2 chars, so 2^25 total chars bounds
    * the collect at ~2^24 boxed longs (~400 MB worst-case, ~10x less
    * on natural text). Probed with one narrow sum(length) job over
    * the already-row-capped delta; past the cap the serve stays
    * distributed. */
  val MaxDriverDeltaChars: Long = 1L << 25

  /** Footer-gate bound for the SIDE tables the bulk micro-serve reads
    * whole (band counts incl. decrement rows, tombstone ledger): plain
    * (int, int, long) triples, ~40 MB of boxed rows at the cap —
    * driver-trivial; the banded table itself stays under the tighter
    * [[MaxDriverCorpusRows]] since its rows carry the candidate sets. */
  val MaxDriverStoreRows: Int = 1 << 19

  /** Total row count of a parquet directory from its file FOOTERS — a
    * driver-only metadata read, NO Spark job (each footer is one
    * ~100-byte tail read). None as soon as `cap` is exceeded, so a
    * corpus-scale store answers from its first footer and the caller
    * keeps the distributed route. Powers the store-bounded bulk
    * micro-serve gate. */
  private def footerRowsUnder(
      spark: SparkSession, dir: String, cap: Long): Option[Long] = {
    val p = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Some(0L)
    var total = 0L
    val files = fs.listStatus(p)
    var i = 0
    while (i < files.length) {
      val st = files(i)
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
        try total += rd.getRecordCount finally rd.close()
        if (total > cap) return None
      }
      i += 1
    }
    Some(total)
  }

  /** LSH family parameters — fixed at build time and stored in the
    * meta file; a delta must be signatured with the SAME family or
    * its buckets would never collide with the corpus. */
  final case class Config(
      numHashes: Int = 128,
      bands: Int = 32,
      shingleN: Int = 3,
      seed: Long = 42L,
      maxBucketSize: Int = 1000) {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    def rowsPerBand: Int = numHashes / bands
  }

  final case class Handle(
      spark: SparkSession,
      path: String,
      idCol: String,
      cfg: Config,
      initialBucketBound: Long = Long.MaxValue) {

    /** Upper bound on any stored bucket's banded-row count (meta
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
    // Per-handle cached table frames: each spark.read.parquet call
    // re-lists the directory and re-reads a footer at plan time —
    // measurable per-serve-call driver overhead on a micro delta.
    @transient private var sigsDf: DataFrame = _
    @transient private var shinglesDf: DataFrame = _
    @transient private var bandedDf: DataFrame = _
    @transient private var bandCountsDf: DataFrame = _
    @transient private var removedDf: DataFrame = _
    @transient private var cachedGen: Long = -1L
    private def invalidateReads(): Unit = {
      sigsDf = null; shinglesDf = null; bandedDf = null
      bandCountsDf = null; removedDf = null
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
        sigsDf = null; shinglesDf = null; bandedDf = null
        bandCountsDf = null; removedDf = null
        bucketBound = readMeta(spark, s"$path/_graft_meta")
          .get("maxBucketN").map(_.toLong).getOrElse(Long.MaxValue)
        cachedGen = m
      }
    }

    /** Invalidate the cached reads — called by the mutating paths AND
      * by [[LshStore.compact]], whose atomic swap replaces the files a
      * pre-compact handle's caches still list. */
    private[LshStore] def invalidate(): Unit = invalidateReads()

    def sigs: DataFrame = {
      freshen()
      if (sigsDf == null) sigsDf = spark.read.parquet(s"$path/sigs")
      sigsDf
    }
    def shingles: DataFrame = {
      freshen()
      if (shinglesDf == null) shinglesDf = spark.read.parquet(s"$path/shingles")
      shinglesDf
    }

    /** Tombstoned doc ids ([[remove]]'s merge-on-read ledger) — empty
      * when no takedown has run. The raw table accessors above expose
      * PHYSICAL rows (tombstoned included, until [[LshStore.compact]]
      * purges); the serve paths filter. */
    def removedIds: DataFrame = {
      freshen()
      if (removedDf == null) {
        val p = new Path(s"$path/removed")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        removedDf =
          if (fs.exists(p)) spark.read.schema("doc LONG").parquet(s"$path/removed")
          else spark.range(0).select(col("id").as("doc"))
      }
      removedDf
    }

    /** Exclude tombstoned rows from a frame carrying `c` as the doc id
      * (ledger is takedown-sized — the anti-join broadcasts). */
    private def live(df: DataFrame, c: String): DataFrame =
      df.join(broadcast(removedIds.withColumnRenamed("doc", c)), Seq(c), "left_anti")

    /** (doc, band, bucket) banded signatures, persisted sorted by
      * (band, bucket) — the candidate-generation table; a delta-bucket
      * prune reads only the touched buckets' row groups. */
    def banded: DataFrame = {
      freshen()
      if (bandedDf == null) bandedDf = spark.read.parquet(s"$path/banded")
      bandedDf
    }

    /** (band, bucket, n) stored banded-signature counts — the guard's
      * input; possibly several additive rows per bucket after appends
      * (the guard sums; compact collapses). */
    def bandCounts: DataFrame = {
      freshen()
      if (bandCountsDf == null)
        bandCountsDf = spark.read.parquet(s"$path/bandcounts")
      bandCountsDf
    }

    /** Near-duplicate pairs of an incoming batch against the stored
      * corpus AND within the batch itself — (doc_a, doc_b, jaccard),
      * doc_a < doc_b, at least one side from `delta`, exact Jaccard
      * >= `minJaccard`. Old-old pairs are NOT re-reported: the corpus
      * side joins only against delta buckets.
      *
      * Cost shape: one signature pass over the delta (the corpus
      * reads signature rows, not text), a bucket join that moves
      * (doc, 16-byte bucket) pairs, and a verification join that
      * reads shingle rows for candidate docs only. The oversized-
      * bucket guard is computed over the UNION population and applied
      * to both join sides, so a bucket that only became degenerate
      * with the delta's arrival is dropped consistently. */
    def nearDupsOfDelta(
        delta: DataFrame,
        textCol: String,
        minJaccard: Double = 0.8): DataFrame = {
      // micro-vs-bulk probe: one NARROW (id-column-only) job. A micro
      // delta's bucket set is literal by construction (|delta|·bands
      // under the cap) and every downstream frame is delta-sized, so
      // the kernel pass stays on the scan's natural partitioning — at
      // ~50 rows the 32-way spread exchange plus 32-task shuffle
      // stages cost more than the kernels they parallelize (the r12
      // 2.4–3.4 s micro-serve floor). Bulk deltas keep the spread:
      // there the shingle kernel over a single-row-group scan is the
      // bottleneck, not stage count.
      val deltaRows = delta.select(col(idCol)).count()
      val micro =
        deltaRows * cfg.bands <= graft.operators.KeyPrune.MaxChunkedKeys
      // STORE-BOUNDED bulk micro-serve (r16): a delta past the chunked
      // cap still resolves on the driver when the WHOLE index is
      // footer-bounded — whole-table reads replace the distributed
      // route's gate jobs + semi-join prunes. At 100 TB the footer
      // gate fails on the first file and nothing changes.
      val bulkMicro =
        !micro && deltaRows <= MaxDriverCorpusRows && storeDriverBounded &&
          deltaCharsUnder(delta, textCol)
      // DRIVER-RESOLVED micro-serve: every frame the distributed route
      // would shuffle is provably bounded (delta rows by the micro
      // gate, corpus rows by the guard, pairs/ids by explicit caps
      // with a distributed fallback), so resolve candidates + exact
      // Jaccard on the driver in TWO delta-bounded jobs + one pruned
      // corpus read — the distributed route's ~6 micro-jobs of fixed
      // stage overhead (2.4-3.4 s at sf0.1 in r12) collapse to the
      // reads themselves. Output is bit-identical: same bucket
      // derivation (collected from the same expressions), same
      // left-to-right arithmetic, Spark's own Round evaluated
      // driver-side ([[graft.functions.ExactMath]]). A tombstone
      // ledger is handled driver-side when bounded (set subtraction =
      // the distributed live() anti-join); an unbounded ledger keeps
      // the distributed route.
      if ((micro || bulkMicro) && ledgerDriverBounded &&
          delta.schema(idCol).dataType ==
            org.apache.spark.sql.types.LongType)
        microNearDups(delta, textCol, minJaccard, None, bulkFull = bulkMicro) match {
          case Some(res) => return res
          case None => () // a cap tripped — serve distributed
        }
      nearDupsDistributed(delta, textCol, minJaccard, micro, None)
    }

    /** [[nearDupsOfDelta]] restricted to an ALLOWED id set — the
      * text-side completion of the filtered-serving quartet (SRP
      * topKFiltered, BM25 bm25SearchFiltered, IVF topKAdcFiltered):
      * a pair surfaces only when BOTH endpoints are allowed (a pair
      * with a disallowed side is invisible in the caller's view —
      * filtered-search semantics, not takedown: the stored corpus and
      * its statistics are untouched). The semi-join lands on the
      * CANDIDATE pairs before verification, so the shingle verify
      * read is pruned by the FILTERED candidates; `allowed` may be
      * corpus-sized (first column = doc id; semi-joined, never
      * collected — at 100 TB the predicate side stays distributed).
      * A micro delta keeps the DRIVER micro-serve: allowed membership
      * is resolved by semi-joining the allowed frame against the
      * broadcast candidate-endpoint set — one bounded extra job, the
      * ledger-probe shape — so filtered micro-batches serve at micro
      * cost; bulk deltas take the shared distributed route with the
      * same candidate-pair semi-join. An empty `allowed` yields an
      * empty frame, not an error. */
    def nearDupsOfDeltaFiltered(
        delta: DataFrame,
        textCol: String,
        minJaccard: Double,
        allowed: DataFrame): DataFrame = {
      val allowedIds = allowed.select(
        col(allowed.columns.head).cast("long").as("__aid"))
      val deltaRows = delta.select(col(idCol)).count()
      val micro =
        deltaRows * cfg.bands <= graft.operators.KeyPrune.MaxChunkedKeys
      val bulkMicro =
        !micro && deltaRows <= MaxDriverCorpusRows && storeDriverBounded &&
          deltaCharsUnder(delta, textCol)
      // the driver micro-serve works filtered too: the allowed
      // restriction is resolved with ONE extra bounded job — the
      // corpus-sized allowed frame is probed by the (pair-bounded)
      // candidate endpoint set, never collected wholesale
      if ((micro || bulkMicro) && ledgerDriverBounded &&
          delta.schema(idCol).dataType ==
            org.apache.spark.sql.types.LongType)
        microNearDups(delta, textCol, minJaccard, Some(allowedIds),
            bulkFull = bulkMicro) match {
          case Some(res) => return res
          case None => () // a cap tripped — serve distributed
        }
      nearDupsDistributed(delta, textCol, minJaccard, micro, Some(allowedIds))
    }

    /** The shared distributed serve of [[nearDupsOfDelta]] and
      * [[nearDupsOfDeltaFiltered]] — one copy so the filtered route
      * cannot drift. `micro` keeps a small delta's kernel pass on the
      * scan's natural partitioning (the spread exchange costs more
      * than it parallelizes there). */
    private def nearDupsDistributed(
        delta: DataFrame,
        textCol: String,
        minJaccard: Double,
        micro: Boolean,
        allowedIds: Option[DataFrame]): DataFrame = {
      val src =
        if (micro) delta else graft.operators.Partitioning.spread(delta)
      // ONE fused kernel pass: shingle hashes and the signature in the
      // same projection (v3 ran shinglesOf and signaturesOf as two
      // separate shingle passes over the delta text)
      val base = src
        .select(
          col(idCol).as("doc"),
          ShingleHashes.of(
            TextFunctions.wsTokens(lower(col(textCol))), cfg.shingleN).as("hsh"))
        .select(col("doc"), col("hsh"),
          MinHashLSH.signatureOfHashes(col("hsh"), cfg.numHashes, cfg.seed).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dSh = base.select(col("doc").as("__id"), col("hsh").as("__sh"))
      val deltaB = MinHashLSH.banded(
          base.select(col("doc"), col("sig")), cfg.bands, cfg.rowsPerBand)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val candRaw = candidatePairsOfDelta(deltaB)
      // the allowed semi-join lands on the candidate PAIRS (both
      // endpoints) before the verify, so the shingle read below is
      // pruned by the surviving candidates only
      val cand = allowedIds.fold(candRaw)(a =>
          candRaw
            .join(a.withColumnRenamed("__aid", "doc_a"), Seq("doc_a"), "left_semi")
            .join(a.withColumnRenamed("__aid", "doc_b"), Seq("doc_b"), "left_semi"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // exact-Jaccard verify reads the __id-sorted shingle table
      // candidate-pruned as well — corpus shingle row groups outside
      // the candidate endpoints are never touched
      // Literal-or-nothing: the verify join already restricts rows, so
      // only a storage-level skip (small candidate set) can pay.
      val shPrune = graft.operators.KeyPrune.plan(
        cand.select(col("doc_a").as("__id"))
          .unionByName(cand.select(col("doc_b").as("__id"))), Seq("__id"),
        semiJoinFallback = false)
      // eager checkpoint, then drop the caches: a looping caller (one
      // call per micro-batch) must not accumulate cached delta frames
      // without bound — the SrpStore.nearDupsOfDelta convention
      val pairs = MinHashLSH.verifyJaccardHashed(
          cand, live(shPrune(shingles), "__id").unionByName(dSh), minJaccard)
        .localCheckpoint()
      cand.unpersist(); deltaB.unpersist(); base.unpersist()
      pairs
    }

    private def removedLedgerPresent: Boolean = {
      val p = new Path(s"$path/removed")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }

    /** Store-bounded micro-serve gate (r16): true when the ENTIRE
      * persisted index (banded postings, band counts, tombstone
      * ledger) is driver-bounded by parquet footer counts — a
      * metadata-only driver read, no job. Then a BULK delta (whose
      * bucket set is past the chunked-literal cap) can still resolve
      * on the driver with whole-table reads instead of ~10 chunked
      * literal jobs. At corpus scale the first footer blows the cap
      * and the serve stays distributed. Cached per store generation. */
    @transient private var storeBoundedGen: Long = -2L
    @transient private var storeBoundedVal: Boolean = false
    private def storeDriverBounded: Boolean = {
      freshen()
      if (cachedGen != storeBoundedGen) {
        storeBoundedVal =
          footerRowsUnder(spark, s"$path/banded", MaxDriverCorpusRows).isDefined &&
          footerRowsUnder(spark, s"$path/bandcounts", MaxDriverStoreRows).isDefined &&
          footerRowsUnder(spark, s"$path/removed", MaxDriverStoreRows).isDefined
        storeBoundedGen = cachedGen
      }
      storeBoundedVal
    }

    /** Bulk micro-serve byte guard: total delta text chars under
      * [[MaxDriverDeltaChars]] (the shingle arrays job 1 collects
      * scale with length, not rows). Only probed once the row-count
      * gate has already passed, so the scan is delta-bounded. */
    private def deltaCharsUnder(delta: DataFrame, textCol: String): Boolean = {
      val s = delta.agg(sum(length(col(textCol)).cast("long"))).collect()(0)
      (if (s.isNullAt(0)) 0L else s.getLong(0)) <= MaxDriverDeltaChars
    }

    /** The tombstone ledger is micro-serve-compatible when absent or
      * driver-bounded (it is collected and applied as a set subtraction
      * — the distributed route's live() anti-join, driver-side). */
    private def ledgerDriverBounded: Boolean =
      !removedLedgerPresent ||
        footerRowsUnder(spark, s"$path/removed", MaxDriverStoreRows).isDefined

    /** [[nearDupsOfDelta]] resolved on the driver — see the call site
      * for the contract. Returns None when a bound cap trips (the
      * caller then serves the same delta distributed). */
    private def microNearDups(
        delta: DataFrame,
        textCol: String,
        minJaccard: Double,
        allowedIds: Option[DataFrame] = None,
        bulkFull: Boolean = false): Option[DataFrame] = {
      import scala.collection.mutable
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("doc_b",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("jaccard",
          org.apache.spark.sql.types.DoubleType)))
      def local(rows: Seq[org.apache.spark.sql.Row]): DataFrame =
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          outSchema)
      // the store-side reads are independent of the delta prep:
      // OVERLAP them (guide §2.6 — concurrent jobs back-fill a mostly
      // idle local[N]; each job is the same bounded read as before and
      // the assembly below consumes them in the same order, so results
      // are identical). Frames are built on THIS thread (freshen()
      // mutates handle caches); only the collects run concurrently.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val removedF: Future[Set[Long]] =
        if (!removedLedgerPresent) Future.successful(Set.empty)
        else {
          val df = removedIds
          Future(df.collect().iterator.map(_.getLong(0)).toSet)
        }
      // the counts read is skipped entirely when the stored bound can
      // prove no bucket drops; deltaMax >= 1 always, so prefetch only
      // when even deltaMax = 1 could not take that shortcut
      val countsF: Option[Future[Array[org.apache.spark.sql.Row]]] =
        if (bulkFull &&
            (bucketBound == Long.MaxValue ||
              bucketBound > cfg.maxBucketSize - 1)) {
          val df = bandCounts
          Some(Future(df.collect()))
        } else None
      val bandedF: Option[Future[Array[org.apache.spark.sql.Row]]] =
        if (bulkFull) { val df = banded; Some(Future(df.collect())) }
        else None
      // job 1: ONE fused pass over the delta — shingle hashes,
      // signature, and the banded (band, bucket) array in the same
      // projection the distributed route would explode. A BULK delta
      // spreads first (the distributed route's own rule): its kernel
      // pass over a single-row-group scan is compute-bound, and one
      // task would serialize ~|delta| x numHashes minhash kernels; a
      // micro delta keeps the scan's natural partitioning (the spread
      // exchange costs more than the ~50 kernels it parallelizes).
      val prepSrc =
        if (bulkFull) graft.operators.Partitioning.spread(delta) else delta
      val prep = prepSrc
        .select(
          col(idCol).as("doc"),
          ShingleHashes.of(
            TextFunctions.wsTokens(lower(col(textCol))), cfg.shingleN).as("hsh"))
        .select(col("doc"), col("hsh"),
          MinHashLSH.signatureOfHashes(col("hsh"), cfg.numHashes, cfg.seed)
            .as("sig"))
        .select(col("doc"), col("hsh"),
          MinHashLSH.bandedArray(col("sig"), cfg.bands, cfg.rowsPerBand)
            .as("bb"))
        .collect()
      if (prep.isEmpty) return Some(local(Nil))
      val docShingles = mutable.HashMap.empty[Long, Array[Long]]
      val deltaBuckets =
        mutable.HashMap.empty[(Int, Int), mutable.ArrayBuffer[Long]]
      prep.foreach { r =>
        val doc = r.getLong(0)
        docShingles(doc) = r.getSeq[Long](1).toArray
        r.getSeq[org.apache.spark.sql.Row](2).foreach { bb =>
          deltaBuckets.getOrElseUpdate((bb.getInt(0), bb.getInt(1)),
            mutable.ArrayBuffer.empty[Long]) += doc
        }
      }
      // tombstone ledger, driver-resolved: the distributed route
      // live()-anti-joins it; here removed corpus ids are excluded
      // from the bucket lists the same way (boundedness is the
      // caller's ledgerDriverBounded gate)
      val removed: Set[Long] = Await.result(removedF, Duration.Inf)
      // union-population guard, driver-side (bound skip / pruned read
      // — the candidatePairsOfDelta micro-route semantics verbatim).
      // bulkFull reads the counts table WHOLE (footer-bounded) instead
      // of ~10 chunked literal jobs, then restricts to delta buckets —
      // the same rows the chunked read returns.
      val deltaMax = deltaBuckets.valuesIterator.map(_.size).max.toLong
      val keepKeys: Set[(Int, Int)] =
        if (bucketBound != Long.MaxValue &&
            bucketBound <= cfg.maxBucketSize - deltaMax)
          deltaBuckets.keySet.toSet
        else {
          val countRows =
            if (bulkFull) countsF.map(Await.result(_, Duration.Inf))
              .getOrElse(bandCounts.collect())
              .filter(r => deltaBuckets.contains((r.getInt(0), r.getInt(1))))
            else graft.operators.KeyPrune.collectChunked(
              bandCounts, Seq("band", "bucket"),
              deltaBuckets.keys.toSeq.map(k => Seq(k._1, k._2)))
          val storedN = countRows
            .groupBy(r => (r.getInt(0), r.getInt(1)))
            .map { case (k, rs) => k -> rs.iterator.map(_.getLong(2)).sum }
          deltaBuckets.keysIterator.filter(k =>
            storedN.getOrElse(k, 0L) + deltaBuckets(k).size
              <= cfg.maxBucketSize).toSet
        }
      if (keepKeys.isEmpty) return Some(local(Nil))
      // job 2: the corpus banded read, collected. Chunked literal prune
      // on a micro delta; ONE whole-table read (footer-bounded) +
      // driver restriction on a bulk one. (Plain collect, NOT
      // limit().collect(): CollectLimit executes incrementally over
      // partition ranges — several jobs where one parallel pass
      // suffices.)
      val corpusRows =
        if (bulkFull) Await.result(bandedF.get, Duration.Inf)
          .filter(r => keepKeys.contains((r.getInt(1), r.getInt(2))))
        else graft.operators.KeyPrune.collectChunked(
          banded, Seq("band", "bucket"),
          keepKeys.toSeq.map(k => Seq(k._1, k._2)))
      if (corpusRows.length > MaxDriverCorpusRows) return None
      val corpusBuckets =
        mutable.HashMap.empty[(Int, Int), mutable.ArrayBuffer[Long]]
      corpusRows.foreach { r =>
        val doc = r.getLong(0)
        if (!removed.contains(doc))
          corpusBuckets.getOrElseUpdate((r.getInt(1), r.getInt(2)),
            mutable.ArrayBuffer.empty[Long]) += doc
      }
      // candidate pairs: delta × (corpus ∪ delta) within each kept
      // bucket, canonical doc_a < doc_b (the bucket-join shape)
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
      if (pairs.size > MaxDriverPairs) return None
      // the allowed restriction lands on the candidate pairs BEFORE
      // the verify reads (the distributed route's ordering), resolved
      // with ONE bounded job: the corpus-sized allowed frame is
      // semi-joined against the broadcast endpoint set (pair-bounded),
      // so only the HIT endpoints ever reach the driver
      allowedIds.foreach { a =>
        if (pairs.nonEmpty) {
          val eps = pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
          val epDf = local(eps.toSeq.map(e =>
            org.apache.spark.sql.Row(e, e, 0.0)))
            .select(col("doc_a").as("__aid"))
          val hit = a.join(broadcast(epDf), Seq("__aid"), "left_semi")
            .collect().map(_.getLong(0)).toSet
          pairs.filterInPlace(p => hit(p._1) && hit(p._2))
        }
      }
      if (pairs.isEmpty) return Some(local(Nil))
      // job 3 (only when corpus docs are endpoints): the candidate-id
      // pruned shingle read, collected
      val corpusOnly = pairs.iterator
        .flatMap(p => Iterator(p._1, p._2))
        .filterNot(docShingles.contains).toSet
      if (corpusOnly.size > graft.operators.KeyPrune.MaxChunkedKeys)
        return None
      if (corpusOnly.nonEmpty)
        graft.operators.KeyPrune.collectChunked(
            shingles, Seq("__id"), corpusOnly.toSeq.map(Seq(_)))
          .foreach(r => docShingles(r.getLong(0)) = r.getSeq[Long](1).toArray)
      // exact Jaccard over hashed shingles — same arithmetic order as
      // verifyJaccardHashed (intersect count, then one double division,
      // raw-ratio threshold, Spark Round)
      val out = pairs.toSeq.flatMap { case (a, b) =>
        (docShingles.get(a), docShingles.get(b)) match {
          case (Some(sa), Some(sb)) =>
            val sbSet = sb.toSet
            var inter = 0
            sa.foreach(h => if (sbSet.contains(h)) inter += 1)
            val interD = inter.toDouble
            val jac = interD / (sa.length + sb.length - interD)
            if (jac >= minJaccard)
              Some(org.apache.spark.sql.Row(a, b,
                graft.functions.ExactMath.round(jac, 6)))
            else None
          // an endpoint without a stored shingle row drops, matching
          // the distributed inner verify join
          case _ => None
        }
      }
      Some(local(out))
    }

    /** The delta's banded signatures through the store's seeded family
      * — the [[candidatePairsOfDelta]] input (exposed at package level
      * so LshStoreSpec can drive the candidate stage directly and
      * assert the corpus-side prune on its executed plan). */
    private[graft] def deltaBanded(delta: DataFrame, textCol: String): DataFrame =
      MinHashLSH.banded(
        signaturesOf(delta, idCol, textCol, cfg), cfg.bands, cfg.rowsPerBand)

    /** Delta signatures through the store's family — crash-window
      * simulation hook for LshStoreSpec. */
    private[graft] def deltaSignatures(delta: DataFrame, textCol: String): DataFrame =
      signaturesOf(delta, idCol, textCol, cfg)

    /** The guarded candidate bucket join of [[nearDupsOfDelta]],
      * factored out pre-verify. One delta-bounded job resolves the
      * delta's bucket set into a prune applied to both corpus-side
      * reads: only banded rows in a delta-touched bucket can join, so
      * the corpus read costs what the delta touches — the
      * (band, bucket)-sorted row groups skip the rest. (v2 re-banded
      * the ENTIRE corpus signature table here, a corpus-sized pass per
      * delta batch.) The union-population guard runs from the
      * persisted counts (pruned to delta buckets — others never join)
      * + the delta's own delta-sized aggregate: same drop set as
      * counting the union directly over the joinable buckets. */
    private[graft] def candidatePairsOfDelta(deltaB: DataFrame): DataFrame = {
      val cap = graft.operators.KeyPrune.MaxLiteralKeys
      // ONE delta-bounded job resolves the delta's distinct bucket set
      // WITH per-bucket counts, capped at the literal cap + 1: under
      // the cap it decides the literal route AND feeds the oversized-
      // bucket guard DRIVER-side — the v3 path ran the union-counts
      // shuffle + a broadcast-exchange build per serve call to decide
      // a drop set that is bounded by the delta's bucket count anyway.
      val sample = deltaB
        .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("n"))
        .limit(cap + 1).collect()
      if (sample.isEmpty)
        return deltaB.limit(0)
          .select(col("doc").as("doc_a"), col("doc").as("doc_b"))
      if (sample.length <= cap) {
        // LITERAL micro-route. Union-population guard on the driver:
        // stored counts restricted to delta buckets (a literal-pruned
        // read of the bucket-cardinality-sized side table — other
        // buckets never join) + the delta's own counts, summed; a
        // bucket whose union count exceeds the cap is excluded from
        // the PREDICATE itself, so the guarded read never even scans
        // its row groups — same drop set as v3's distributed anti-join.
        // When the store-wide bound proves NO bucket can exceed the
        // cap (bound + delta max <= cap), the read is skipped outright.
        val deltaMax = sample.iterator.map(_.getLong(2)).max
        val keep: IndexedSeq[org.apache.spark.sql.Row] =
          if (bucketBound != Long.MaxValue &&
              bucketBound <= cfg.maxBucketSize - deltaMax)
            sample.toIndexedSeq
          else {
            val pred = graft.operators.KeyPrune.literalPredicate(
              Seq("band", "bucket"),
              sample.toIndexedSeq.map(r => Seq(r.get(0), r.get(1))))
            // raw additive rows summed driver-side (<= |delta buckets|
            // × appends rows) — no shuffle stage for the guard
            val storedN = bandCounts.filter(pred).collect()
              .groupBy(r => (r.get(0), r.get(1)))
              .map { case (k, rs) => k -> rs.iterator.map(_.getLong(2)).sum }
            sample.toIndexedSeq.filter(r =>
              storedN.getOrElse((r.get(0), r.get(1)), 0L) + r.getLong(2)
                <= cfg.maxBucketSize)
          }
        if (keep.isEmpty)
          return deltaB.limit(0)
            .select(col("doc").as("doc_a"), col("doc").as("doc_b"))
        val keepPred = graft.operators.KeyPrune.literalPredicate(
          Seq("band", "bucket"), keep.map(r => Seq(r.get(0), r.get(1))))
        val dB =
          if (keep.length == sample.length) deltaB else deltaB.filter(keepPred)
        val a = live(banded.filter(keepPred), "doc").unionByName(dB).as("a")
        val b = dB.as("b")
        return a.join(b,
            col("a.band") === col("b.band") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.doc") =!= col("b.doc"))
          .select(
            least(col("a.doc"), col("b.doc")).as("doc_a"),
            greatest(col("a.doc"), col("b.doc")).as("doc_b"))
          .distinct()
      }
      // BULK route (delta bucket set above the literal cap): the v3
      // distributed shape. Coverage gate: when the delta's bucket set
      // approaches the STORED bucket cardinality, pruning the corpus
      // side is pure overhead — the candidate equi-join restricts to
      // the same rows (the stored-cardinality job only runs here,
      // never on the micro route).
      val prune = graft.operators.KeyPrune.plan(deltaB, Seq("band", "bucket"),
        noPruneAbove = _ => math.max(
          graft.operators.KeyPrune.MaxLiteralKeys.toLong + 1,
          bandCounts.count() / 2))
      // no literal prune here: the banded read is a handful of 8 MB
      // row groups — a 4-split scan probing the broadcast delta
      // starves local[32]; spread it back to full width
      val corpusB = live(graft.operators.Partitioning
        .spreadIfLarge(prune(banded), literal = prune.isLiteral), "doc")
      val allB = corpusB.unionByName(deltaB)
      val unionCounts = prune(bandCounts)
        .unionByName(deltaB.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("n")))
        .groupBy(col("band"), col("bucket")).agg(sum(col("n")).as("n"))
      val drop = broadcast(
        unionCounts.filter(col("n") > cfg.maxBucketSize)
          .select(col("band"), col("bucket")))
      val a = allB.join(drop, Seq("band", "bucket"), "left_anti").as("a")
      val b = deltaB.join(drop, Seq("band", "bucket"), "left_anti").as("b")
      a.join(b,
          col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc") =!= col("b.doc"))
        .select(
          least(col("a.doc"), col("b.doc")).as("doc_a"),
          greatest(col("a.doc"), col("b.doc")).as("doc_b"))
        .distinct()
    }

    /** Take documents DOWN — the text-index right-to-forget
      * ([[graft.ann.SrpStore.remove]]'s design verbatim): a
      * merge-on-read tombstone ledger every serve path anti-joins,
      * plus an ADDITIVE band-count decrement so the oversized-bucket
      * guard keeps judging the KEPT population — the removed ids'
      * banded rows re-derive from their STORED signatures (an
      * id-bounded columnar read; the corpus is never re-shingled).
      * Serve results equal a store built from the kept corpus
      * (LshStoreSpec); [[LshStore.compact]] physically purges rows
      * and clears the ledger in one atomic swap.
      *
      * Crash/replay: already-tombstoned ids are excluded up front
      * (replayed takedown = no-op); the count decrement lands BEFORE
      * the tombstones, so the one crash window leaves counts
      * UNDER-stated only — wider candidates, exact-Jaccard verify
      * (the append contract's direction). Ids never stored tombstone
      * harmlessly. */
    def remove(ids: DataFrame): Handle = {
      val rid = ids.select(col(ids.columns.head).cast("long").as("doc"))
        .distinct()
        .join(broadcast(removedIds), Seq("doc"), "left_anti")
        .localCheckpoint()
      if (rid.isEmpty) return this
      val goneSigs = sigs
        .join(broadcast(rid), Seq("doc"), "left_semi")
        .localCheckpoint()
      if (!goneSigs.isEmpty)
        MinHashLSH.banded(goneSigs, cfg.bands, cfg.rowsPerBand)
          .groupBy(col("band"), col("bucket"))
          .agg((-count(lit(1))).as("n"))
          .coalesce(1)
          .write.mode(SaveMode.Append).parquet(s"$path/bandcounts")
      rid.coalesce(1).write.mode(SaveMode.Append).parquet(s"$path/removed")
      // decrements only lower true counts: the stored bound stays a
      // valid upper bound. Meta rewrite LAST — moves the generation
      // other handles' reads key on (a crash before it leaves them
      // missing tombstones until the next mutation; the replayed
      // takedown converges)
      writeMeta(spark, s"$path/_graft_meta", idCol, cfg, bucketBound)
      invalidateReads()
      this
    }

    /** Fold new documents into the index — the ingest path after
      * [[nearDupsOfDelta]] decided what to keep. REPLAY-SAFE at
      * per-table granularity (the SrpStore v3 pattern, replacing v2's
      * disjointness contract): already-stored ids are anti-joined away
      * against SHINGLES (the last write — a fully-landed batch replays
      * as a no-op), and the sigs / banded+bandcounts writes are each
      * guarded by their own already-present probe, so a crash in ANY
      * window replays to the converged state. Counts can only ever be
      * UNDER-stated (a crash between the banded and counts writes
      * skips the counts on replay), which only widens the candidate
      * set the exact-Jaccard verify still filters — never a lost
      * pair. */
    def append(delta: DataFrame, textCol: String): Handle = {
      // a tombstoned id still has physical rows: the dedup below would
      // skip it while every read excludes it - silently absent. Fail
      // loud; compact clears the ledger and makes it appendable again.
      val clash = delta.select(col(idCol).cast("long").as("doc"))
        .join(broadcast(removedIds), Seq("doc"), "left_semi")
      require(clash.isEmpty,
        "append: batch contains tombstoned ids - re-adding a removed " +
          "document is out of contract until compact purges the ledger")
      val fresh = delta
        .join(shingles.select(col("__id").as(idCol)), Seq(idCol), "left_anti")
        .localCheckpoint()
      if (fresh.isEmpty) return this
      val freshIds = fresh.select(col(idCol).as("doc"))
      // narrow id-column probes of the stored tables, restricted to
      // this batch's ids — both empty on the no-crash path
      val alreadySigned = sigs
        .join(broadcast(freshIds), Seq("doc"), "left_semi")
        .select(col("doc")).distinct().localCheckpoint()
      val alreadyBanded = banded
        .join(broadcast(freshIds), Seq("doc"), "left_semi")
        .select(col("doc")).distinct().localCheckpoint()
      val dSig = signaturesOf(fresh, idCol, textCol, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sigNew = dSig.join(broadcast(alreadySigned), Seq("doc"), "left_anti")
      if (!sigNew.isEmpty)
        sigNew.write.mode(SaveMode.Append).parquet(s"$path/sigs")
      val bandNew = MinHashLSH.banded(
          dSig.join(broadcast(alreadyBanded), Seq("doc"), "left_anti"),
          cfg.bands, cfg.rowsPerBand)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      if (!bandNew.isEmpty) {
        bandNew
          .sortWithinPartitions(col("band"), col("bucket"))
          .write.mode(SaveMode.Append)
          .option("parquet.block.size", RowGroupBytes)
          .parquet(s"$path/banded")
        // counts merge additively, ordered AFTER the banded write so
        // any crash between them under-states only
        val counts = bandNew
          .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("n"))
          .localCheckpoint()
        counts.coalesce(1)
          .write.mode(SaveMode.Append).parquet(s"$path/bandcounts")
        // raise the store-wide bucket bound additively (old bound +
        // this batch's max is an upper bound on any merged bucket) and
        // persist it — ordered AFTER the counts write, so a crash
        // between them leaves the bound stale-LOW: a skipped drop,
        // wider candidates, the contract's direction
        val dMax = counts.agg(max(col("n"))).collect()(0).getLong(0)
        if (bucketBound != Long.MaxValue)
          bucketBound = bucketBound + dMax
      }
      shinglesOf(fresh, idCol, textCol, cfg)
        .sortWithinPartitions(col("__id"))
        .write.mode(SaveMode.Append)
        .option("parquet.block.size", RowGroupBytes)
        .parquet(s"$path/shingles")
      bandNew.unpersist()
      dSig.unpersist()
      // meta rewrite LAST — its mtime is the store generation other
      // handles' reads key on (a crash before it leaves them stale in
      // the under-stated-bound direction only)
      writeMeta(spark, s"$path/_graft_meta", idCol, cfg, bucketBound)
      invalidateReads()
      this
    }
  }

  /** (doc, sig) signatures of a corpus — the [[MinHashLSH]] kernel,
    * spread so dense single-row-group parquet cannot serialize it. */
  private def signaturesOf(
      docs: DataFrame, idCol: String, textCol: String, cfg: Config): DataFrame =
    graft.operators.Partitioning.spread(docs)
      .select(
        col(idCol).as("doc"),
        ShingleHashes.of(TextFunctions.wsTokens(lower(col(textCol))), cfg.shingleN).as("hsh"))
      .select(col("doc"),
        MinHashLSH.signatureOfHashes(col("hsh"), cfg.numHashes, cfg.seed).as("sig"))

  /** (__id, __sh) distinct hashed shingles — verification side table,
    * named for [[MinHashLSH.verifyJaccardHashed]]. */
  private def shinglesOf(
      docs: DataFrame, idCol: String, textCol: String, cfg: Config): DataFrame =
    graft.operators.Partitioning.spread(docs)
      .select(
        col(idCol).as("__id"),
        ShingleHashes.of(TextFunctions.wsTokens(lower(col(textCol))), cfg.shingleN).as("__sh"))

  /** Signature + shingle the corpus and publish the index at `path`
    * (staged + swapped: readers never see a half-written index). */
  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      cfg: Config = Config(),
      numFiles: Int = 8): Handle = {
    val spark = docs.sparkSession
    val staging = path + ".staging"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)

    signaturesOf(docs, idCol, textCol, cfg)
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/sigs")
    shinglesOf(docs, idCol, textCol, cfg)
      .repartitionByRange(8, col("__id"))
      .sortWithinPartitions(col("__id"))
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", RowGroupBytes)
      .parquet(s"$staging/shingles")
    // banded table derived from the STAGED sigs (columnar read, no
    // re-shingle), (band, bucket)-sorted so delta-bucket prunes skip
    // row groups; counts derived from the staged banded table
    MinHashLSH.banded(spark.read.parquet(s"$staging/sigs"),
        cfg.bands, cfg.rowsPerBand)
      .repartitionByRange(numFiles, col("band"), col("bucket"))
      .sortWithinPartitions(col("band"), col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", RowGroupBytes)
      .parquet(s"$staging/banded")
    spark.read.parquet(s"$staging/banded")
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/bandcounts")
    val bound = maxBucketN(spark, s"$staging/bandcounts")
    writeMeta(spark, s"$staging/_graft_meta", idCol, cfg, bound)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    Handle(spark, path, idCol, cfg, bound)
  }

  /** Exact max per-bucket count of a freshly written counts table —
    * the meta `maxBucketN` seed (one tiny single-file job at
    * build/compact time). */
  private def maxBucketN(spark: SparkSession, countsPath: String): Long = {
    val r = spark.read.parquet(countsPath).agg(max(col("n"))).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Rewrite the index at a target file count — small-files hygiene
    * after many [[Handle.append]]s. Signatures and shingles coalesce
    * from their own rows (no re-signaturing); crash-safe via the same
    * staged whole-store swap as [[build]]. */
  /** Merge-on-read pressure: tombstoned ids over PHYSICAL doc rows —
    * None when no ledger exists (a driver existence probe, no jobs);
    * two footer-metadata count jobs otherwise. */
  def tombstoneRatio(handle: Handle): Option[Double] = {
    val p = new Path(s"${handle.path}/removed")
    val fs = p.getFileSystem(
      handle.spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(handle.removedIds.count().toDouble /
      math.max(1L, handle.sigs.count()).toDouble)
  }

  /** Size-ratio compaction trigger — the maintenance-window policy
    * under a sustained takedown stream: every serve pays the
    * tombstone anti-join until compact purges, so once the ledger
    * outgrows `maxRatio` of the physical rows the store compacts
    * (serve results identical before/after — compact is the specced
    * purge; [[tombstoneRatio]] costs nothing when no ledger exists).
    * Returns the (possibly new-generation) handle. */
  def autoCompact(handle: Handle, maxRatio: Double = 0.25,
      targetFiles: Int = 8): Handle =
    tombstoneRatio(handle) match {
      case Some(r) if r > maxRatio => compact(handle, targetFiles)
      case _ => handle
    }

  def compact(handle: Handle, targetFiles: Int = 8): Handle = {
    import handle.{cfg, idCol, path, spark}
    val staging = path + ".staging"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)

    // tombstoned rows drop HERE: the staging dir carries no removed/
    // ledger, so the swap purges rows and clears the ledger atomically
    // (banded + counts re-derive from the already-filtered sigs)
    val removed = handle.removedIds
    handle.sigs
      .join(broadcast(removed), Seq("doc"), "left_anti")
      .coalesce(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/sigs")
    // banded re-derived from the compacted sigs (heals any
    // at-least-once banded rows a crashed append left) and re-sorted;
    // counts recounted from it
    MinHashLSH.banded(spark.read.parquet(s"$staging/sigs"),
        cfg.bands, cfg.rowsPerBand)
      .repartitionByRange(targetFiles, col("band"), col("bucket"))
      .sortWithinPartitions(col("band"), col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", RowGroupBytes)
      .parquet(s"$staging/banded")
    spark.read.parquet(s"$staging/banded")
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/bandcounts")
    handle.shingles
      .join(broadcast(removed.withColumnRenamed("doc", "__id")), Seq("__id"), "left_anti")
      .repartitionByRange(targetFiles, col("__id"))
      .sortWithinPartitions(col("__id"))
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", RowGroupBytes)
      .parquet(s"$staging/shingles")
    val bound = maxBucketN(spark, s"$staging/bandcounts")
    writeMeta(spark, s"$staging/_graft_meta", idCol, cfg, bound)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    // the swap replaced every file the input handle's caches list
    handle.invalidate()
    Handle(spark, path, idCol, cfg, bound)
  }

  /** Open an existing index (heals an interrupted swap first). */
  def open(spark: SparkSession, path: String): Handle = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    val meta = readMeta(spark, s"$path/_graft_meta")
    val v = meta.getOrElse("version", "?")
    require(v == Version.toString,
      s"LSH store at $path has version $v, expected $Version")
    Handle(spark, path, meta("idCol"),
      Config(
        numHashes = meta("numHashes").toInt,
        bands = meta("bands").toInt,
        shingleN = meta("shingleN").toInt,
        seed = meta("seed").toLong,
        maxBucketSize = meta("maxBucketSize").toInt),
      meta.get("maxBucketN").map(_.toLong).getOrElse(Long.MaxValue))
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    fs.exists(new Path(s"$path/_graft_meta"))
  }

  /** Open the index at `path`, building it from `docs` first if
    * absent or laid out by an older version. */
  def ensure(
      docs: => DataFrame,
      idCol: String,
      textCol: String,
      spark: SparkSession,
      path: String,
      cfg: Config = Config()): Handle =
    if (exists(spark, path)) {
      val meta = readMeta(spark, s"$path/_graft_meta")
      if (meta.getOrElse("version", "?") != Version.toString)
        build(docs, idCol, textCol, path, cfg)
      else {
        val h = open(spark, path)
        require(h.idCol == idCol,
          s"LSH store at $path was built with idCol=${h.idCol}, asked for $idCol")
        h
      }
    } else build(docs, idCol, textCol, path, cfg)

  private def writeMeta(
      spark: SparkSession, file: String, idCol: String, cfg: Config,
      maxBucketN: Long): Unit = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      (s"version=$Version\nidCol=$idCol\nnumHashes=${cfg.numHashes}\n" +
        s"bands=${cfg.bands}\nshingleN=${cfg.shingleN}\nseed=${cfg.seed}\n" +
        s"maxBucketSize=${cfg.maxBucketSize}\nmaxBucketN=$maxBucketN\n")
        .getBytes("UTF-8"))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, file: String): Map[String, String] = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"not an LSH store (missing ${p})")
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }
      .toMap
  }
}
