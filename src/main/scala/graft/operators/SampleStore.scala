package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintainable stratified sample — a
  * deterministic bottom-k sketch per stratum (Cohen & Kaplan 2007,
  * "Summarizing data using bottom-k sketches"): each stratum keeps the
  * k rows whose salted-md5 hash orders smallest (key as tie-break —
  * the q133/q204 hash-order idiom, reproducible across engines and
  * layouts with no RNG state). Bottom-k under a fixed total order is a
  * MERGEABLE monoid — bottomK(A ∪ B) = bottomK(bottomK(A) ∪
  * bottomK(B)) — and absorbing the same rows twice is a no-op
  * (bottomK(S ∪ S) = bottomK(S)), so the maintained sample is exactly
  * the sample a from-scratch pass over every absorbed row produces,
  * and the store is replay-tolerant even BELOW the batch-id guard.
  *
  * This is the "maintained eval slice" shape: a fixed-size,
  * uniform-without-replacement held-out set per language/source that
  * stays valid as the corpus streams in, without ever re-reading it.
  * (A fixed FRACTION per stratum — q204's ceil(10%) — is not
  * maintainable from a bounded state: growth can promote rows the
  * bounded state discarded; fixed-size is the streaming contract.)
  *
  * The delta reduces to ≤ k rows per stratum BEFORE merging (its own
  * bottom-k), so the merge window runs over ≤ 2k rows per stratum —
  * corpus-sized work happens once, at [[create]]. Scale note: the
  * md5-string order keeps the oracle cross-engine exact; a Long order
  * key would let [[graft.functions.BottomK]] replace the create-time
  * window with a partial+final aggregate (k-bounded shuffle).
  *
  * Layout mirrors [[graft.ml.ConformalStore]]: one small parquet
  * behind the atomic swap, meta (salt, k, batch id) riding inside the
  * swapped dir — exactly-once under at-least-once redelivery
  * ([[graft.streaming.StreamingSample]] is the foreachBatch drive).
  */
object SampleStore {

  private def dir(path: String) = s"$path/sample"

  private def metaFile(path: String) = s"${dir(path)}/_graft_sample_meta"

  /** Bottom-k rows per stratum of `df` under the salted hash order:
    * (stratum, key, hk). The distinct() makes the rank run over the
    * (stratum, key) SET — the monoid is a set union, not a bag union:
    * without it, a replayed delta row already absorbed into the stored
    * sample would appear TWICE in the merge, and both copies would
    * survive the rank filter, crowding a legitimate row out of the k
    * (caught by the spec's idempotence case). */
  private def bottomK(df: DataFrame, strataCol: String, keyCol: String,
      salt: String, k: Int): DataFrame = {
    val h = df.select(
        col(strataCol).cast("string").as("stratum"),
        col(keyCol).cast("long").as("key"))
      .distinct()
      .withColumn("hk", md5(concat(col("key").cast("string"), lit(salt))))
    val w = Window.partitionBy(col("stratum")).orderBy(col("hk"), col("key"))
    h.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  private def writeSample(spark: SparkSession, rows: DataFrame, path: String,
      salt: String, k: Int, lastBatch: Long): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = dir(path) + ".staging"
    fs.delete(new Path(staging), true)
    rows.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging)
    val out = fs.create(new Path(s"$staging/_graft_sample_meta"), true)
    try out.write(s"salt=$salt\nk=$k\nlastBatch=$lastBatch".getBytes("UTF-8"))
    finally out.close()
    SwapDir.swap(fs, new Path(staging), new Path(dir(path)))
  }

  private def readMeta(spark: SparkSession, path: String): (String, Int, Long) = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(metaFile(path)))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    val kv = body.split("\n").map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
    (kv("salt"), kv("k").toInt, kv.getOrElse("lastBatch", "-1").toLong)
  }

  /** Initialize (overwrite) from a first corpus pass. */
  def create(spark: SparkSession, df: DataFrame, strataCol: String,
      keyCol: String, salt: String, k: Int, path: String): Unit =
    writeSample(spark, bottomK(df, strataCol, keyCol, salt, k), path,
      salt, k, lastBatch = -1L)

  /** True when a store exists at `path` (healed if a crash left a
    * staged swap). */
  def exists(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(dir(path)))
    fs.exists(new Path(metaFile(path)))
  }

  /** The maintained sample: (stratum, key, hk), ≤ k rows per stratum. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(dir(path)))
    spark.read.parquet(dir(path))
  }

  /** Fold a delta batch in: the delta reduces to its own bottom-k per
    * stratum, merges with the stored rows, and the union re-ranks over
    * ≤ 2k rows per stratum. Idempotent by the monoid itself; use
    * [[appendBatch]] from at-least-once sources to skip replayed
    * work. */
  def append(spark: SparkSession, batch: DataFrame, strataCol: String,
      keyCol: String, path: String): Unit = {
    val (salt, k, lastBatch) = readMeta(spark, path)
    val merged = bottomK(
      read(spark, path)
        .unionByName(bottomK(batch, strataCol, keyCol, salt, k)
          .select(col("stratum"), col("key"), col("hk"))),
      "stratum", "key", salt, k)
    writeSample(spark, merged, path, salt, k, lastBatch)
  }

  /** [[append]] with the family's monotone-batch-id guard (the id is
    * atomic with the swapped rows). The sample monoid is idempotent
    * anyway — the guard only saves the replayed batch's work. */
  def appendBatch(spark: SparkSession, batch: DataFrame, strataCol: String,
      keyCol: String, path: String, batchId: Long): Unit = {
    val (salt, k, lastBatch) = readMeta(spark, path)
    if (batchId <= lastBatch) return
    val merged = bottomK(
      read(spark, path)
        .unionByName(bottomK(batch, strataCol, keyCol, salt, k)
          .select(col("stratum"), col("key"), col("hk"))),
      "stratum", "key", salt, k)
    writeSample(spark, merged, path, salt, k, batchId)
  }

  /** From-scratch reference over a full frame — what the maintained
    * sample must equal (exposed so specs and oracles share one
    * definition). */
  def fromScratch(df: DataFrame, strataCol: String, keyCol: String,
      salt: String, k: Int): DataFrame =
    bottomK(df, strataCol, keyCol, salt, k)
}
