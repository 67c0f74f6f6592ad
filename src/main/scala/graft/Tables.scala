package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness testdata tables (TESTDATA.md / FIXTURES.md §4).
  *
  * All loads are plain parquet scans — columnar, vectorized, with
  * predicate pushdown and column pruning left to Catalyst. The only
  * special case is `events`, whose `ts` column has shipped in two
  * physical encodings across testdata generations: parquet
  * TIMESTAMP(NANOS) (Spark reads it as raw int64 via
  * spark.sql.legacy.parquet.nanosAsLong, we truncate to micros — the
  * same truncation DuckDB applies) and TIMESTAMP(MICROS) (arrives as
  * TimestampType or TimestampNTZType depending on isAdjustedToUTC).
  * The loader branches on the *loaded* dtype so either encoding — and
  * the next regen — produces the same session-UTC TimestampType column.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case _ => spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** events with ts as a proper TimestampType (micros, UTC),
    * whatever the parquet physical encoding of ts is.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsFrom(spark, s"$sfDir/events.parquet")

  /** Schema-adaptive events load from an explicit parquet path. */
  def eventsFrom(spark: SparkSession, path: String): DataFrame = {
    // Runtime-settable legacy conf; also set in GraftSession defaults.
    // Only affects TIMESTAMP(NANOS) columns (read as raw int64); a
    // micros file is untouched by it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)
    raw.schema("ts").dataType match {
      case LongType =>
        // TIMESTAMP(NANOS) file: int64 nanos -> truncate to micros.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType =>
        raw // already an instant at micros precision
      case TimestampNTZType =>
        // Wall-clock micros: interpret in the session zone (UTC for
        // GraftSession) — the same instants DuckDB reads.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported parquet-loaded type $other (expected int64 nanos or timestamp)")
    }
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
