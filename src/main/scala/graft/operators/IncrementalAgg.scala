package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (batch materialized view): keep a
  * keyed table of MERGEABLE partial aggregates, fold each new delta in
  * with a partial-on-partial merge, and never re-scan history.
  *
  * At 100 TB the full recompute of `history.groupBy(k).agg(...)` scans
  * everything on every refresh; the incremental loop scans ONLY the
  * delta:
  *
  *   partials(delta)            — one pass over the delta, partial+final
  *   merge(state, partials)     — groupBy over state ∪ partials, where
  *                                state has one row per key (MV-sized,
  *                                not history-sized)
  *   mergeIntoStore(...)        — same fold against a parquet store,
  *                                rewriting ONLY the partitions the
  *                                delta touched (partition-pruned state
  *                                read, staged write + crash-resumable
  *                                per-partition SwapDir publish)
  *
  * Mergeability is the whole trick: `cnt` and `sum` merge by sum,
  * `min`/`max` by min/max — so partials of partials are partials, the
  * same algebra partial+final aggregation uses inside one Spark job,
  * applied ACROSS jobs. Non-mergeable aggregates (exact median, exact
  * distinct) have no such form — use their sketch counterparts (HLL:
  * q19's `hll_sketch_agg`/`hll_union_agg` precompute-and-merge, GK
  * percentiles), which merge for the same reason.
  *
  * Column convention: a measure `m` over source column `c` produces
  * `cnt_m` / `sum_m` / `min_m` / `max_m` partial columns; `merge`
  * dispatches on the prefix. Derived values (avg = sum/cnt) belong in
  * a SELECT over the MV, never in the stored state.
  */
object IncrementalAgg {

  /** One mergeable measure over a source column. */
  final case class Measure(name: String, source: Column)

  /** What `heal`/the implicit entry recovery actually did — the fold
    * is additive, so the caller MUST be able to tell "your crashed
    * delta is now fully applied, do NOT retry it" apart from "the
    * store was never touched, retry the delta". */
  sealed trait HealOutcome
  /** Nothing pending: the store was never touched by the crashed fold
    * (or there was no crash). A delta retry folds cleanly. */
  case object Clean extends HealOutcome
  /** A crashed mid-publish fold was COMPLETED: its delta is now fully
    * applied. `batchId` is the id the crashed fold recorded (None if
    * it supplied none) — retrying that same batch would double-count. */
  final case class CompletedPublish(batchId: Option[String]) extends HealOutcome

  /** Fold `delta` into per-key partial-aggregate rows (one pass,
    * partial+final inside the job). */
  def partials(delta: DataFrame, keys: Seq[String], measures: Seq[Measure]): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty, "need keys and measures")
    val aggs = measures.flatMap { m =>
      Seq(
        count(m.source).as(s"cnt_${m.name}"),
        sum(m.source).as(s"sum_${m.name}"),
        min(m.source).as(s"min_${m.name}"),
        max(m.source).as(s"max_${m.name}"))
    }
    delta.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two partial frames (state ∪ delta-partials → one row per
    * key). Both must carry the `partials` column convention; the
    * merge is the partial algebra itself: sums of cnt/sum, min of
    * min, max of max. */
  def merge(state: DataFrame, deltaPartials: DataFrame, keys: Seq[String]): DataFrame = {
    require(state.columns.sorted.sameElements(deltaPartials.columns.sorted),
      s"state/delta schema mismatch: ${state.columns.mkString(",")} vs ${deltaPartials.columns.mkString(",")}")
    val measureCols = state.columns.filterNot(keys.contains)
    val aggs = measureCols.toSeq.map { c =>
      val fn = c.split("_", 2)(0) match {
        case "cnt" | "sum" => sum(_: Column)
        case "min" => min(_: Column)
        case "max" => max(_: Column)
        case other => throw new IllegalArgumentException(
          s"column '$c' does not follow the cnt_/sum_/min_/max_ convention ($other)")
      }
      fn(col(c)).as(c)
    }
    state.select(deltaPartials.columns.map(col).toIndexedSeq: _*)
      .unionByName(deltaPartials)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a delta into a parquet MV store partitioned by
    * `partitionKey` (must be one of `keys`). Reads back ONLY the
    * state partitions the delta touched (partition-pruned by an IN
    * filter on the collected — bounded, MV-partition-count-sized —
    * touched-value set), merges, and publishes only those partitions.
    * Untouched history is never read and never rewritten. First call
    * bootstraps the store.
    *
    * Publish protocol (the fold is additive, NOT idempotent, so a
    * half-applied fold must be completable, never re-applied):
    * merged partitions are written to a hidden staging dir, a pending
    * marker is created, each staged `k=v` dir is SwapDir-swapped into
    * the store, then the marker is removed. A crash mid-swap leaves
    * marker + the not-yet-swapped staging children; the next call
    * finishes those swaps before folding anything new (a swapped
    * child has been renamed OUT of staging, so completion never
    * re-applies a partition). A crash before the marker exists means
    * the store was never touched — staging is discarded and the
    * caller's delta retry re-folds cleanly. Session config is never
    * mutated (no partitionOverwriteMode games).
    *
    * Retry protocol: pass a stable `batchId` per delta. It is recorded
    * in the pending marker, so when entry recovery completes a crashed
    * publish OF THE SAME batch, the fold is skipped (returns
    * `CompletedPublish`) instead of double-counting; `heal` reports
    * the same outcome for external retry logic. Without a batchId the
    * caller must consult `heal()`'s outcome before retrying a delta.
    *
    * SINGLE WRITER ONLY. Concurrent folds into one store are not
    * coordinated — entry recovery would discard or half-adopt the
    * other writer's live staging. A lease file (`.merging.lock`)
    * makes the second writer FAIL FAST instead of corrupting state;
    * a crashed writer's lease expires after
    * `spark.graft.mv.lockLeaseMs` (default 1h — raise it if a single
    * fold can legitimately run longer).
    */
  def mergeIntoStore(
      spark: SparkSession,
      storePath: String,
      delta: DataFrame,
      keys: Seq[String],
      measures: Seq[Measure],
      partitionKey: String,
      batchId: Option[String] = None): HealOutcome = {
    require(keys.contains(partitionKey), s"$partitionKey must be a grouping key")
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(
      root.getParent, "." + root.getName + ".merging")
    val marker = new org.apache.hadoop.fs.Path(
      root.getParent, "." + root.getName + ".merging.pending")
    val leaseMs = spark.conf.getOption("spark.graft.mv.lockLeaseMs")
      .map(_.toLong).getOrElse(3600L * 1000)
    val lock = acquireLock(fs, root, leaseMs)
    try {
      val recovered = completePendingPublish(fs, staging, marker, root)
      recovered match {
        case CompletedPublish(Some(bid)) if batchId.contains(bid) =>
          // this exact delta was already fully applied by the crashed
          // fold — re-folding it would double-count
          return recovered
        case CompletedPublish(recordedBid)
            if batchId.isEmpty || recordedBid.isEmpty =>
          // a crashed publish was just completed but one side has no
          // batch id, so we CANNOT prove the supplied delta is not that
          // same batch — if it is, the fold below double-counts. The
          // safe protocol is heal()-then-decide; make the unsafe path
          // at least observable.
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"mergeIntoStore($storePath): recovery completed a crashed publish " +
              s"(recorded batchId=$recordedBid, supplied batchId=$batchId) and the fold " +
              "is proceeding anyway — if this delta IS the crashed batch it will be " +
              "double-counted. Pass a stable batchId, or call heal() and check the " +
              "outcome before retrying.")
        case _ => ()
      }

    val deltaPartials = partials(delta, keys, measures)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // explicit path check: catching AnalysisException here would
      // also swallow transient/corrupt-store read failures and fold
      // the delta as a BOOTSTRAP, silently replacing merged partitions
      // with delta-only state
      if (!fs.exists(root)) {
        // bootstrap: stage then one rename, so a crashed first write
        // never leaves a half-committed dir that a rerun mistakes for
        // existing state
        deltaPartials.write.mode("overwrite")
          .partitionBy(partitionKey).parquet(staging.toString)
        if (!fs.rename(staging, root))
          throw new java.io.IOException(s"failed to publish bootstrap $staging to $root")
        return recovered
      }
      // touched partitions only: collect is bounded by the number of
      // MV partitions in ONE delta (e.g. days in a daily batch)
      val touched = deltaPartials.select(partitionKey).distinct()
        .collect().map(_.get(0))
      // isin(null) never matches, so a null partition key in the delta
      // needs an explicit isNull disjunct or the stored
      // __HIVE_DEFAULT_PARTITION__ state would be replaced by
      // delta-only partials
      val touchedNonNull = touched.filter(_ != null)
      val inTouched = col(partitionKey).isin(touchedNonNull.toIndexedSeq: _*)
      val touchFilter =
        if (touched.contains(null)) inTouched || col(partitionKey).isNull else inTouched
      // the store is a single-level partitionBy layout: depth 1 = one
      // listing per fold, not one per partition
      SwapDir.healAll(fs, root, maxDepth = 1)
      val state = spark.read.parquet(storePath).filter(touchFilter)
      val merged = merge(state, deltaPartials, keys)
      if (fs.exists(staging)) fs.delete(staging, true)
      merged.write.mode("overwrite")
        .partitionBy(partitionKey).parquet(staging.toString)
      writeMarker(fs, marker, batchId)
      swapStagedPartitions(fs, staging, root)
      // staging BEFORE marker: a crash between the two deletes must
      // leave (marker, no staging) = "publish completed", never
      // (staging, no marker) = "store never touched" — the latter
      // would classify a fully-applied fold as Clean and a delta
      // retry would double-count
      fs.delete(staging, true)
      fs.delete(marker, false)
      recovered
    } finally deltaPartials.unpersist()
    } finally releaseLock(fs, lock)
  }

  private def writeMarker(
      fs: org.apache.hadoop.fs.FileSystem,
      marker: org.apache.hadoop.fs.Path,
      batchId: Option[String]): Unit = {
    val out = fs.create(marker, true)
    try out.write(batchId.getOrElse("").getBytes("UTF-8"))
    finally out.close()
  }

  private def readMarkerBatchId(
      fs: org.apache.hadoop.fs.FileSystem,
      marker: org.apache.hadoop.fs.Path): Option[String] = {
    val in = fs.open(marker)
    try {
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      val s = new String(bytes, "UTF-8")
      if (s.isEmpty) None else Some(s)
    } finally in.close()
  }

  /** Acquire the single-writer lease, failing fast on a live one. A
    * lease left by a crashed writer expires after `leaseMs` (its
    * content is the acquisition epoch-millis) and is stolen. */
  private def acquireLock(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      leaseMs: Long): org.apache.hadoop.fs.Path = {
    val lock = new org.apache.hadoop.fs.Path(
      root.getParent, "." + root.getName + ".merging.lock")
    if (fs.exists(lock)) {
      val age = System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime
      if (age < leaseMs)
        throw new java.io.IOException(
          s"another fold holds $lock (age ${age}ms < lease ${leaseMs}ms); " +
            "mergeIntoStore is single-writer — serialize folds, or raise " +
            "spark.graft.mv.lockLeaseMs if a crashed writer left this lease")
      fs.delete(lock, false) // expired: the writer is dead
    }
    // not atomic on stores without create-exclusive semantics; the
    // lease is a fail-fast guard for the documented single-writer
    // contract, not a distributed mutex
    val out = fs.create(lock, false)
    try out.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
    finally out.close()
    lock
  }

  private def releaseLock(
      fs: org.apache.hadoop.fs.FileSystem,
      lock: org.apache.hadoop.fs.Path): Unit =
    try fs.delete(lock, false)
    catch { case _: java.io.IOException => () }

  /** Repair a store whose last fold crashed mid-publish (also runs
    * implicitly at the start of every `mergeIntoStore`). Safe to call
    * any time — a clean store is a no-op returning `Clean`. Returns
    * `CompletedPublish` when a crashed fold's publish was finished
    * here: that fold's delta IS applied and must not be retried. */
  def heal(spark: SparkSession, storePath: String): HealOutcome = {
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(
      root.getParent, "." + root.getName + ".merging")
    val marker = new org.apache.hadoop.fs.Path(
      root.getParent, "." + root.getName + ".merging.pending")
    // heal mutates the same staging/marker/root state as a fold, so it
    // takes the SAME lease: healing while a live writer is between its
    // staging write and its marker would delete that writer's staging
    val leaseMs = spark.conf.getOption("spark.graft.mv.lockLeaseMs")
      .map(_.toLong).getOrElse(3600L * 1000)
    val lock = acquireLock(fs, root, leaseMs)
    try {
      val outcome = completePendingPublish(fs, staging, marker, root)
      if (fs.exists(root)) SwapDir.healAll(fs, root, maxDepth = 1)
      outcome
    } finally releaseLock(fs, lock)
  }

  /** Swap every staged `k=v` partition dir into the store root. Names
    * are copied verbatim (Spark already escaped the values when it
    * wrote staging, including null → __HIVE_DEFAULT_PARTITION__), so
    * no value→path re-encoding can drift. */
  private def swapStagedPartitions(
      fs: org.apache.hadoop.fs.FileSystem,
      staging: org.apache.hadoop.fs.Path,
      root: org.apache.hadoop.fs.Path): Unit =
    fs.listStatus(staging).foreach { st =>
      if (st.isDirectory && st.getPath.getName.contains("="))
        SwapDir.swap(fs, st.getPath, new org.apache.hadoop.fs.Path(root, st.getPath.getName))
    }

  /** Finish (or discard) the publish a previous crashed fold left
    * behind. Marker present → the fold was mid-publish: swap the
    * remaining staged partitions (already-swapped ones are gone from
    * staging) and report `CompletedPublish` with the batch id the
    * marker recorded. No marker → the store was never touched: drop
    * the stale staging and report `Clean` — the caller's delta retry
    * folds cleanly. */
  private def completePendingPublish(
      fs: org.apache.hadoop.fs.FileSystem,
      staging: org.apache.hadoop.fs.Path,
      marker: org.apache.hadoop.fs.Path,
      root: org.apache.hadoop.fs.Path): HealOutcome =
    if (fs.exists(marker)) {
      val bid = readMarkerBatchId(fs, marker)
      if (fs.exists(staging)) {
        swapStagedPartitions(fs, staging, root)
        fs.delete(staging, true) // staging first — see mergeIntoStore
      }
      fs.delete(marker, false)
      CompletedPublish(bid)
    } else {
      if (fs.exists(staging)) fs.delete(staging, true)
      Clean
    }
}
