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
  *                                delta touched (dynamic partition
  *                                overwrite + partition-pruned state read)
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
    * touched-value set), merges, and rewrites only those partitions
    * (dynamic partition overwrite). Untouched history is never read
    * and never rewritten. First call bootstraps the store. */
  def mergeIntoStore(
      spark: SparkSession,
      storePath: String,
      delta: DataFrame,
      keys: Seq[String],
      measures: Seq[Measure],
      partitionKey: String): Unit = {
    require(keys.contains(partitionKey), s"$partitionKey must be a grouping key")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val deltaPartials = partials(delta, keys, measures)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // explicit path check: catching AnalysisException here would
      // also swallow transient/corrupt-store read failures and fold
      // the delta as a BOOTSTRAP, silently replacing merged partitions
      // with delta-only state
      val hadoopPath = new org.apache.hadoop.fs.Path(storePath)
      val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val exists = fs.exists(hadoopPath)
      val merged = if (!exists) deltaPartials else {
        // touched partitions only: collect is bounded by the number of
        // MV partitions in ONE delta (e.g. days in a daily batch)
        val touched = deltaPartials.select(partitionKey).distinct()
          .collect().map(_.get(0))
        val state = spark.read.parquet(storePath)
          .filter(col(partitionKey).isin(touched.toIndexedSeq: _*))
        merge(state, deltaPartials, keys)
      }
      merged.write.mode("overwrite")
        .partitionBy(partitionKey)
        .parquet(storePath)
    } finally deltaPartials.unpersist()
  }
}
