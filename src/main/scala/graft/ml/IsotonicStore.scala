package graft.ml

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintainable isotonic-calibration state —
  * the fourth leg of the incremental-model family (NB counts, DSIR
  * counts, PCA moments, now calibration bins): the per-bin `(n, pos)`
  * sufficient statistics are INTEGER monoids, so a corpus drop updates
  * the store with one delta-sized aggregation plus an O(nBins) add —
  * and unlike the moments store there is no float-merge caveat at all:
  * appended state is EXACTLY the state a from-scratch build over the
  * union produces, bit for bit, and so is the PAV fit derived from it.
  *
  * Layout: a ≤ nBins-row parquet (bin, n, pos) behind the atomic-swap
  * convention + a meta file pinning nBins (a store must be probed with
  * the binning it was built with). Additive appends assume the
  * exactly-once delivery the rest of the model-store family assumes —
  * a replayed batch double-counts; callers with at-least-once sources
  * dedup upstream (the foreachBatch anti-join idiom).
  */
object IsotonicStore {

  private def dir(path: String) = s"$path/bins"
  private def metaFile(path: String) = s"$path/_graft_iso_meta"

  private def writeBins(spark: SparkSession, bins: DataFrame, path: String,
      nBins: Int): Unit = {
    import graft.operators.SwapDir
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = dir(path) + ".staging"
    fs.delete(new Path(staging), true)
    bins.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging)
    SwapDir.swap(fs, new Path(staging), new Path(dir(path)))
    val out = fs.create(new Path(metaFile(path)), true)
    try out.write(s"nBins=$nBins".getBytes("UTF-8")) finally out.close()
  }

  private def readMeta(spark: SparkSession, path: String): Int = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(metaFile(path)))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    body.stripPrefix("nBins=").toInt
  }

  /** Initialize (overwrite) from a first batch. */
  def create(spark: SparkSession, batch: DataFrame, scoreCol: String,
      labelCol: String, nBins: Int, path: String): Unit =
    writeBins(spark, Isotonic.binStats(batch, scoreCol, labelCol, nBins),
      path, nBins)

  /** The stored (bin, n, pos) statistics. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import graft.operators.SwapDir
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(dir(path)))
    spark.read.parquet(dir(path))
  }

  /** Fold a delta batch in: one delta-sized aggregation + an O(nBins)
    * integer merge + one tiny atomic write. */
  def append(spark: SparkSession, batch: DataFrame, scoreCol: String,
      labelCol: String, path: String): Unit = {
    val nBins = readMeta(spark, path)
    val merged = read(spark, path)
      .unionByName(Isotonic.binStats(batch, scoreCol, labelCol, nBins))
      .groupBy(col("bin"))
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))
    writeBins(spark, merged, path, nBins)
  }

  /** The calibration table (bin, n, pos, rate, cal) served from the
    * stored statistics — PAV over ≤ nBins integer rows, no corpus
    * read. Identical to `Isotonic.calibrateBins` over every document
    * the store has absorbed. */
  def calibration(spark: SparkSession, path: String): DataFrame =
    Isotonic.calibrationOf(spark, read(spark, path))
}
