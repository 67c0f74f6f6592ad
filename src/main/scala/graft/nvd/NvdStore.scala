package graft.nvd

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's primary store for the flattened CVE table: Parquet,
  * partitioned by publish year (SURVEY §4 — the layout equivalent of
  * the reference's `dates` index on `published_datetime`:
  * date-range queries prune whole partition directories, and point
  * lookups on `cve_id` are served by parquet min/max + dictionary
  * filters within each year file).
  *
  * At cluster scale the same layout holds: one year ≈ one directory,
  * files sized by `maxRecordsPerFile`, and the upsert path rewrites
  * only the years present in the incoming batch (partition overwrite
  * mode = dynamic), never the whole table — the Spark-native
  * equivalent of keyed REPLACE (reference K1).
  */
object NvdStore {

  val yearCol = "publish_year"

  /** Filesystem-agnostic existence check (local, HDFS, S3A...) — a
    * bare java.io.File only understands local paths. */
  private[nvd] def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def withYear(df: DataFrame): DataFrame =
    df.withColumn(yearCol,
      coalesce(substring(col("published_datetime"), 1, 4), lit("0000")))

  /** Full (re)write of the store. */
  def write(df: DataFrame, path: String): Unit =
    withYear(df).write
      .mode(SaveMode.Overwrite)
      .partitionBy(yearCol)
      .parquet(path)

  /** Upsert a deduped batch: merge with existing rows for the touched
    * years only, last write (the batch) wins, rewrite just those
    * partitions. Uses dynamic partition overwrite so untouched years'
    * directories are left in place.
    */
  def upsert(spark: SparkSession, batch: DataFrame, path: String): Unit = {
    val withY = withYear(batch).cache()
    try {
      if (!pathExists(spark, path)) {
        withY.write.mode(SaveMode.Overwrite).partitionBy(yearCol).parquet(path)
      } else {
        val years = withY.select(yearCol).distinct().collect().map(_.getString(0))
        val existing = spark.read.parquet(path)
          .filter(col(yearCol).isin(years.toIndexedSeq: _*))
          // incoming batch wins over stored rows for the same cve_id
          .join(withY.select("cve_id"), Seq("cve_id"), "left_anti")
        val merged = existing.unionByName(withY)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged.write.mode(SaveMode.Overwrite).partitionBy(yearCol).parquet(path)
      }
    } finally withY.unpersist()
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The reference's one read query (A1): COUNT(DISTINCT cve_id). */
  def cveTally(df: DataFrame): Long =
    df.agg(countDistinct(col("cve_id"))).first().getLong(0)
}
