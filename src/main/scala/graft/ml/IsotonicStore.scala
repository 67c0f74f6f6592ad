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
  * the binning it was built with). Plain [[append]] assumes
  * exactly-once delivery like the rest of the model-store family;
  * [[appendBatch]] upgrades that to exactly-once UNDER at-least-once
  * redelivery by recording the batch id atomically with the swapped
  * statistics — the streaming-ingest entry point
  * ([[graft.streaming.StreamingCalibration]]).
  */
object IsotonicStore {

  private def dir(path: String) = s"$path/bins"

  /** The meta rides INSIDE the swapped bins directory (underscore
    * files are invisible to the parquet reader — the PostingsStore
    * marker idiom), so `lastBatch` is atomic with the statistics it
    * describes: there is no crash window in which the data advanced
    * but the marker did not, which is what makes [[appendBatch]]
    * EXACTLY-once under at-least-once redelivery. */
  private def metaFile(path: String) = s"${dir(path)}/_graft_iso_meta"

  private def writeBins(spark: SparkSession, bins: DataFrame, path: String,
      nBins: Int, lastBatch: Long, lastRemove: Long = -1L): Unit = {
    import graft.operators.SwapDir
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = dir(path) + ".staging"
    fs.delete(new Path(staging), true)
    bins.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging)
    val out = fs.create(new Path(s"$staging/_graft_iso_meta"), true)
    try out.write(
      s"nBins=$nBins\nlastBatch=$lastBatch\nlastRemove=$lastRemove"
        .getBytes("UTF-8"))
    finally out.close()
    SwapDir.swap(fs, new Path(staging), new Path(dir(path)))
  }

  private def readMeta(spark: SparkSession, path: String): (Int, Long, Long) = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(metaFile(path)))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    val kv = body.split("\n").map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
    (kv("nBins").toInt, kv.getOrElse("lastBatch", "-1").toLong,
      kv.getOrElse("lastRemove", "-1").toLong)
  }

  /** Initialize (overwrite) from a first batch. */
  def create(spark: SparkSession, batch: DataFrame, scoreCol: String,
      labelCol: String, nBins: Int, path: String): Unit =
    writeBins(spark, Isotonic.binStats(batch, scoreCol, labelCol, nBins),
      path, nBins, lastBatch = -1L)

  /** True when a store exists at `path` (healed if a crash left a
    * staged swap). */
  def exists(spark: SparkSession, path: String): Boolean = {
    import graft.operators.SwapDir
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(dir(path)))
    fs.exists(new Path(metaFile(path)))
  }

  /** The stored (bin, n, pos) statistics. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import graft.operators.SwapDir
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(dir(path)))
    spark.read.parquet(dir(path))
  }

  /** Fold a delta batch in: one delta-sized aggregation + an O(nBins)
    * integer merge + one tiny atomic write. Assumes exactly-once
    * delivery — use [[appendBatch]] from at-least-once sources. */
  def append(spark: SparkSession, batch: DataFrame, scoreCol: String,
      labelCol: String, path: String): Unit = {
    val (nBins, lastBatch, lastRemove) = readMeta(spark, path)
    val merged = read(spark, path)
      .unionByName(Isotonic.binStats(batch, scoreCol, labelCol, nBins))
      .groupBy(col("bin"))
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))
    writeBins(spark, merged, path, nBins, lastBatch, lastRemove)
  }

  /** [[append]] made EXACTLY-once for foreachBatch's at-least-once
    * contract: monotone `batchId`s are recorded atomically WITH the
    * merged statistics (the meta rides inside the swapped directory),
    * so a redelivered batch — including one whose previous attempt
    * crashed anywhere around the swap — is either fully absorbed
    * already (id ≤ stored lastBatch ⇒ no-op) or not absorbed at all
    * (the swap never published ⇒ re-merge). Integer statistics can
    * therefore never double-count. */
  def appendBatch(spark: SparkSession, batch: DataFrame, scoreCol: String,
      labelCol: String, path: String, batchId: Long): Unit = {
    val (nBins, lastBatch, lastRemove) = readMeta(spark, path)
    if (batchId <= lastBatch) return
    val merged = read(spark, path)
      .unionByName(Isotonic.binStats(batch, scoreCol, labelCol, nBins))
      .groupBy(col("bin"))
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))
    writeBins(spark, merged, path, nBins, batchId, lastRemove)
  }

  /** Subtract a batch OUT of the store — the takedown/right-to-forget
    * shape: integer statistics make removal as exact as absorption, so
    * the post-removal calibration is BIT-identical to a from-scratch
    * fit over the kept corpus. The batch must re-derive rows the store
    * absorbed (same score/label derivation over the dropped documents);
    * removing rows never absorbed drives a count negative and FAILS
    * LOUD rather than serving a silently-wrong model. Bins emptied by
    * the removal drop from the store (binStats never emits n=0 rows, so
    * the representations stay identical). Assumes exactly-once — use
    * [[removeBatch]] from at-least-once sources. */
  def remove(spark: SparkSession, batch: DataFrame, scoreCol: String,
      labelCol: String, path: String): Unit = {
    val (nBins, lastBatch, lastRemove) = readMeta(spark, path)
    writeBins(spark, removed(spark, batch, scoreCol, labelCol, path, nBins),
      path, nBins, lastBatch, lastRemove)
  }

  /** [[remove]] made EXACTLY-once under at-least-once redelivery via
    * its own monotone id ledger (removals and appends are independent
    * streams; each guards its own ids). */
  def removeBatch(spark: SparkSession, batch: DataFrame, scoreCol: String,
      labelCol: String, path: String, removeId: Long): Unit = {
    val (nBins, lastBatch, lastRemove) = readMeta(spark, path)
    if (removeId <= lastRemove) return
    writeBins(spark, removed(spark, batch, scoreCol, labelCol, path, nBins),
      path, nBins, lastBatch, removeId)
  }

  private def removed(spark: SparkSession, batch: DataFrame, scoreCol: String,
      labelCol: String, path: String, nBins: Int): DataFrame = {
    val merged = read(spark, path)
      .unionByName(Isotonic.binStats(batch, scoreCol, labelCol, nBins)
        .select(col("bin"), (-col("n")).as("n"), (-col("pos")).as("pos")))
      .groupBy(col("bin"))
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))
      .localCheckpoint()
    val bad = merged.filter(col("n") < 0 || col("pos") < 0 ||
      col("pos") > col("n")).count()
    require(bad == 0,
      s"remove: $bad bins would go negative/inconsistent - the batch " +
        "contains rows this store never absorbed")
    merged.filter(col("n") > 0)
  }

  /** The calibration table (bin, n, pos, rate, cal) served from the
    * stored statistics — PAV over ≤ nBins integer rows, no corpus
    * read. Identical to `Isotonic.calibrateBins` over every document
    * the store has absorbed. */
  def calibration(spark: SparkSession, path: String): DataFrame =
    Isotonic.calibrationOf(spark, read(spark, path))
}
