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
    */
  def mergeIntoStore(
      spark: SparkSession,
      storePath: String,
      delta: DataFrame,
      keys: Seq[String],
      measures: Seq[Measure],
      partitionKey: String): Unit = {
    require(keys.contains(partitionKey), s"$partitionKey must be a grouping key")
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(
      root.getParent, "." + root.getName + ".merging")
    val marker = new org.apache.hadoop.fs.Path(
      root.getParent, "." + root.getName + ".merging.pending")
    completePendingPublish(fs, staging, marker, root)

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
        return
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
      SwapDir.healAll(fs, root)
      val state = spark.read.parquet(storePath).filter(touchFilter)
      val merged = merge(state, deltaPartials, keys)
      if (fs.exists(staging)) fs.delete(staging, true)
      merged.write.mode("overwrite")
        .partitionBy(partitionKey).parquet(staging.toString)
      fs.create(marker, true).close()
      swapStagedPartitions(fs, staging, root)
      fs.delete(marker, false)
      fs.delete(staging, true)
    } finally deltaPartials.unpersist()
  }

  /** Repair a store whose last fold crashed mid-publish (also runs
    * implicitly at the start of every `mergeIntoStore`). Safe to call
    * any time — a clean store is a no-op. */
  def heal(spark: SparkSession, storePath: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(
      root.getParent, "." + root.getName + ".merging")
    val marker = new org.apache.hadoop.fs.Path(
      root.getParent, "." + root.getName + ".merging.pending")
    completePendingPublish(fs, staging, marker, root)
    if (fs.exists(root)) SwapDir.healAll(fs, root)
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
    * staging). No marker → the store was never touched: drop the
    * stale staging so the caller's delta retry folds cleanly. */
  private def completePendingPublish(
      fs: org.apache.hadoop.fs.FileSystem,
      staging: org.apache.hadoop.fs.Path,
      marker: org.apache.hadoop.fs.Path,
      root: org.apache.hadoop.fs.Path): Unit =
    if (fs.exists(marker)) {
      if (fs.exists(staging)) swapStagedPartitions(fs, staging, root)
      fs.delete(marker, false)
      if (fs.exists(staging)) fs.delete(staging, true)
    } else if (fs.exists(staging)) {
      fs.delete(staging, true)
    }
}
