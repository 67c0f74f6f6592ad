package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition-layout helpers. */
object Partitioning {

  /** Ensure at least `defaultParallelism` partitions before a
    * compute-heavy stage (hash kernels, signature generation).
    *
    * Single-file / single-row-group parquet inputs scan as ONE task —
    * parquet only splits at row-group boundaries — which serializes
    * every downstream per-row kernel onto one core. On a real cluster
    * inputs arrive in thousands of splits and this is a no-op (never
    * reduces partitioning); the repartition only fires when the scan
    * is narrower than the cluster, and then it moves raw input once to
    * unlock N-way parallelism for the expensive stage.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
