package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partition-layout helpers. */
object Partitioning {

  /** A ONE-partition empty frame with `schema`: writing an empty
    * query plan can emit ZERO part files (leaving a dir schema
    * inference cannot read back), but a 1-slice empty RDD scan has no
    * exchange to collapse and always writes one schema-bearing file —
    * the empty-bootstrap shape for persisted stores. */
  def emptyOnePartition(
      spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[org.apache.spark.sql.Row], 1),
      schema)

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

  /** Conf key for [[checkpointCompact]]'s slice sizing (rows per read
    * slice). Cluster deployments tune via --conf; the default keeps a
    * 100 TB edge frame at thousands of slices while collapsing a
    * 100 k-row one to a single task per downstream stage. */
  val CompactRowsPerPartitionKey = "spark.graft.checkpointCompact.rowsPerPartition"

  /** localCheckpoint + coalesce-to-measured-size: materialize `df`,
    * then collapse the checkpointed RDD to
    * `ceil(rows / rowsPerPartition)` read slices when that is narrower
    * than the parent width. Iterative message-passing operators (LPA,
    * PageRank-style rounds) re-read their edge checkpoint every round;
    * when the frame is tiny relative to the session's shuffle width
    * (a 90 k-edge community graph under `shuffle.partitions` sized for
    * corpus scans), every round otherwise pays a full-width task wave
    * per stage for microseconds of per-task work. Coalesce is a
    * NARROW rearrangement of already-materialized partitions — no
    * shuffle, no recompute — and at production edge counts the target
    * exceeds the parent width, making this a no-op (never widens).
    * Row VALUES are untouched, so results are partition-invariant for
    * the deterministic aggregations these operators run. */
  def checkpointCompact(df: DataFrame): DataFrame = {
    val chk = df.localCheckpoint()
    coalesceToRows(chk, chk.count())
  }

  /** The coalesce half of [[checkpointCompact]], for callers that
    * already materialized and counted the frame. Narrow, never widens. */
  def coalesceToRows(materialized: DataFrame, rows: Long): DataFrame = {
    val rowsPerPartition = materialized.sparkSession.conf
      .getOption(CompactRowsPerPartitionKey).map(_.toLong).getOrElse(1000000L)
    val target = math.max(1L, (rows + rowsPerPartition - 1) / rowsPerPartition)
    if (target < materialized.rdd.getNumPartitions)
      materialized.coalesce(target.toInt)
    else materialized
  }

  /** [[spread]] gated on the optimizer's SIZE estimate — the
    * store-serving bulk-path variant: a row-group-granular store read
    * that is NOT literal-pruned scans in a handful of splits, which
    * starves a wide host when the table is big — but when the table
    * (or a literal-pruned read of it) is small, the repartition
    * exchange costs more than the narrow scan it widens. `sizeInBytes`
    * is a driver-side metadata estimate (no job). */
  def spreadIfLarge(df: DataFrame, literal: Boolean,
      minBytes: Long = 16L * 1024 * 1024): DataFrame =
    if (literal) df
    else {
      val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (est > BigInt(minBytes)) spread(df) else df
    }
}
