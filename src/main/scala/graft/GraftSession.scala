package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Designed for a 1000-executor cluster but testable on local[N]:
  * everything scale-sensitive (shuffle partitions, AQE, broadcast
  * threshold) is expressed as a config default, not hard-coded logic,
  * so a cluster deployment overrides via spark-submit --conf.
  */
object GraftSession {
  /** Apply engine defaults to a builder; call .master(...) yourself. */
  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      // local[32] default; real clusters override with cores*executors*2-3
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      // AQE: runtime coalescing of small shuffle partitions + skew-join
      // splitting — the safety net that makes one static partition count
      // survive a 100x scale change.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Runtime row-level join pruning: build a bloom filter from the
      // selective side of a shuffle join and push it into the other
      // side's scan — at 100 TB this is the difference between
      // scanning a fact table and scanning the ~1% of it that joins.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Some testdata generations ship events.ts as parquet
      // TIMESTAMP(NANOS); Spark has no nanosecond timestamp type, so
      // read those as raw nanos (LongType) — Tables.events truncates
      // to micros, the identical truncation DuckDB applies. This conf
      // only touches NANOS columns; micros files are unaffected, and
      // Tables.events branches on the loaded dtype either way.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Write micros (not INT96) so external readers (DuckDB/Arrow)
      // see the same instants we computed.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder().master(s"local[$cpus]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // the graft SQL surface (kernel + composition functions, as-of
    // strategy) is part of the engine, not an opt-in: install on every
    // locally built session (idempotent)
    graft.plans.GraftExtensions.ensureRegistered(s)
    s
  }
}
