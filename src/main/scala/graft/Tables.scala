package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness testdata tables (TESTDATA.md / FIXTURES.md §4).
  *
  * All loads are plain parquet scans — columnar, vectorized, with
  * predicate pushdown and column pruning left to Catalyst. The only
  * special case is `events`, whose `ts` column is parquet
  * TIMESTAMP(NANOS): Spark's TimestampType is microsecond-precision,
  * so we read the raw int64 nanos (spark.sql.legacy.parquet.nanosAsLong)
  * and truncate with integer division — the same nanos->micros
  * truncation DuckDB applies, keeping the oracle comparable.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case _ => spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** events with ts as a proper TimestampType (micros, UTC). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Runtime-settable legacy conf; also set in GraftSession defaults.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
