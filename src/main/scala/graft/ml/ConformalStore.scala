package graft.ml

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintainable split-conformal calibration
  * state — the fifth leg of the incremental-model family (NB counts,
  * DSIR counts, PCA moments, isotonic bins, now conformal scores): the
  * calibration split's score HISTOGRAM `(score, n)` is an INTEGER
  * monoid, so a refresh folds a delta batch in with one delta-sized
  * aggregation plus a histogram-sized merge, and the served acceptance
  * threshold — the exact interpolated q-quantile — is BIT-identical to
  * the one-shot quantile over every row the store has absorbed:
  * Spark's `percentile` aggregate reduces raw rows into exactly this
  * value→count map before sorting and interpolating, so handing it the
  * stored histogram through the frequency argument replays the same
  * arithmetic on the same map.
  *
  * Exactness holds when the score expression has bounded distinct
  * support (the corpus quality scores here take a few hundred values —
  * the histogram is hundreds of rows, never corpus-sized); a
  * continuous score should be quantized first ([[IsotonicStore]]'s
  * binning), trading the bit-exact threshold for a bounded store.
  *
  * Layout mirrors [[IsotonicStore]]: one small parquet behind the
  * atomic-swap convention with the meta riding INSIDE the swapped
  * directory, so [[appendBatch]]'s monotone batch id is atomic with
  * the statistics it describes — exactly-once under at-least-once
  * redelivery with no upstream dedup
  * ([[graft.streaming.StreamingConformal]] is the foreachBatch drive).
  */
object ConformalStore {

  private def dir(path: String) = s"$path/hist"

  private def metaFile(path: String) = s"${dir(path)}/_graft_conf_meta"

  private def hist(batch: DataFrame, scoreCol: String): DataFrame =
    batch.groupBy(col(scoreCol).cast("double").as("score"))
      .agg(count(lit(1)).as("n"))

  private def writeHist(spark: SparkSession, h: DataFrame, path: String,
      lastBatch: Long, lastRemove: Long = -1L): Unit = {
    import graft.operators.SwapDir
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = dir(path) + ".staging"
    fs.delete(new Path(staging), true)
    h.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging)
    val out = fs.create(new Path(s"$staging/_graft_conf_meta"), true)
    try out.write(s"lastBatch=$lastBatch\nlastRemove=$lastRemove"
      .getBytes("UTF-8"))
    finally out.close()
    SwapDir.swap(fs, new Path(staging), new Path(dir(path)))
  }

  private def readMeta(spark: SparkSession, path: String): (Long, Long) = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(metaFile(path)))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    val kv = body.split("\n").map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
    (kv.getOrElse("lastBatch", "-1").toLong,
      kv.getOrElse("lastRemove", "-1").toLong)
  }

  /** Initialize (overwrite) from a first calibration batch. */
  def create(spark: SparkSession, batch: DataFrame, scoreCol: String,
      path: String): Unit =
    writeHist(spark, hist(batch, scoreCol), path, lastBatch = -1L)

  /** True when a store exists at `path` (healed if a crash left a
    * staged swap). */
  def exists(spark: SparkSession, path: String): Boolean = {
    import graft.operators.SwapDir
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(dir(path)))
    fs.exists(new Path(metaFile(path)))
  }

  /** The stored (score, n) histogram. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import graft.operators.SwapDir
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(dir(path)))
    spark.read.parquet(dir(path))
  }

  /** Fold a delta calibration batch in: one delta-sized aggregation +
    * a histogram-sized integer merge + one tiny atomic write. Assumes
    * exactly-once delivery — use [[appendBatch]] from at-least-once
    * sources. */
  def append(spark: SparkSession, batch: DataFrame, scoreCol: String,
      path: String): Unit = {
    val (lastBatch, lastRemove) = readMeta(spark, path)
    val merged = read(spark, path)
      .unionByName(hist(batch, scoreCol))
      .groupBy(col("score")).agg(sum(col("n")).as("n"))
    writeHist(spark, merged, path, lastBatch, lastRemove)
  }

  /** [[append]] made EXACTLY-once for foreachBatch's at-least-once
    * contract (the [[IsotonicStore.appendBatch]] argument verbatim):
    * the monotone batch id is recorded atomically WITH the merged
    * histogram, so a redelivered batch is either fully absorbed
    * (no-op) or not absorbed at all (re-merge) — integer counts can
    * never double. */
  def appendBatch(spark: SparkSession, batch: DataFrame, scoreCol: String,
      path: String, batchId: Long): Unit = {
    val (lastBatch, lastRemove) = readMeta(spark, path)
    if (batchId <= lastBatch) return
    val merged = read(spark, path)
      .unionByName(hist(batch, scoreCol))
      .groupBy(col("score")).agg(sum(col("n")).as("n"))
    writeHist(spark, merged, path, batchId, lastRemove)
  }

  /** Subtract a calibration batch OUT of the histogram — the takedown
    * shape ([[IsotonicStore.remove]]'s contract): integer counts make
    * removal as exact as absorption, so the post-removal threshold is
    * BIT-identical to the one-shot quantile over the kept rows. Rows
    * the store never absorbed drive a count negative and FAIL LOUD
    * pre-publish; emptied score rows drop. Assumes exactly-once — use
    * [[removeBatch]] from at-least-once sources. */
  def remove(spark: SparkSession, batch: DataFrame, scoreCol: String,
      path: String): Unit = {
    val (lastBatch, lastRemove) = readMeta(spark, path)
    writeHist(spark, removed(spark, batch, scoreCol, path), path,
      lastBatch, lastRemove)
  }

  /** [[remove]] made EXACTLY-once under at-least-once redelivery via
    * the removal stream's own monotone id ledger. */
  def removeBatch(spark: SparkSession, batch: DataFrame, scoreCol: String,
      path: String, removeId: Long): Unit = {
    val (lastBatch, lastRemove) = readMeta(spark, path)
    if (removeId <= lastRemove) return
    writeHist(spark, removed(spark, batch, scoreCol, path), path,
      lastBatch, removeId)
  }

  private def removed(spark: SparkSession, batch: DataFrame,
      scoreCol: String, path: String): DataFrame = {
    val merged = read(spark, path)
      .unionByName(hist(batch, scoreCol)
        .select(col("score"), (-col("n")).as("n")))
      .groupBy(col("score")).agg(sum(col("n")).as("n"))
      .localCheckpoint()
    val bad = merged.filter(col("n") < 0).count()
    require(bad == 0,
      s"remove: $bad score rows would go negative - the batch contains " +
        "rows this store never absorbed")
    merged.filter(col("n") > 0)
  }

  /** The exact interpolated `q`-quantile of every score the store has
    * absorbed, served from the histogram — reads ≤ distinct-score
    * rows, never the corpus, and equals the one-shot
    * `percentile(score, q)` over the raw rows bit for bit. */
  def threshold(spark: SparkSession, path: String, q: Double): Double =
    read(spark, path)
      .agg(percentile(col("score"), lit(q), col("n")).as("tau"))
      .head().getDouble(0)
}
