package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism floor for compute-heavy narrow stages.
  *
  * Parquet parallelism is bounded by row-group count, not size: a
  * 5k-row corpus written as one row group scans as ONE task, and any
  * per-row-expensive work that Catalyst collapses into the scan stage
  * (a thresholded-levenshtein filter under a broadcast join, a
  * window-hash explode) runs single-threaded no matter how many cores
  * the cluster has — AQE cannot help, it only re-plans BETWEEN
  * stages. Measured on q121: 14.8 s from a 1-row-group file vs 1.15 s
  * from the same 5k docs in 32 files.
  *
  * The fix is an explicit spread BEFORE the expensive expression — a
  * round-robin shuffle of the narrow input (ids + text), linear and
  * tiny relative to the compute it unlocks. At real scale the input
  * has plenty of splits and this is a no-op: the shuffle is only
  * inserted when the planned parallelism is actually below the floor.
  */
object Spread {

  /** `df` with at least `min` partitions (session default parallelism
    * when 0). No-op — no shuffle added to the plan — when the frame
    * already plans that wide. */
  def ensureMinPartitions(df: DataFrame, min: Int = 0): DataFrame = {
    val target =
      if (min > 0) min else df.sparkSession.sparkContext.defaultParallelism
    // planned (not executed) partition count: builds the RDD lineage,
    // runs no job
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
