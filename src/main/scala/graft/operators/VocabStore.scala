package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintainable vocabulary statistics — the
  * term-level analogue of the model-store family: per term, the total
  * occurrence count `n` and the document frequency `df` are INTEGER
  * monoids over DOC-DISJOINT batches, so a corpus refresh folds a
  * delta's postings in with one delta-sized aggregation plus a
  * vocabulary-sized merge, and the maintained statistics are exactly
  * the statistics a from-scratch pass over every absorbed document
  * produces. This is the tokenizer-refresh / OOV-monitor shape: vocab
  * heavy-hitters, df for tf-idf, novelty against the stored term set —
  * all served without re-tokenizing the corpus.
  *
  * The caller tokenizes (the store takes an (id, term) postings frame
  * — tokenization policy stays at the query layer); the store
  * aggregates. CONTRACT: batches partition the corpus by document —
  * `df` sums distinct-doc counts per batch, which is exact only when
  * no document appears in two absorbed batches. Unlike the bottom-k
  * sample the monoid is NOT idempotent, so the [[appendBatch]] id
  * guard is load-bearing for redelivery, not merely a work-saver.
  *
  * Layout mirrors [[graft.ml.ConformalStore]]: the stats parquet
  * behind the atomic swap with the meta (batch id) riding inside the
  * swapped dir; [[graft.streaming.StreamingVocab]] is the foreachBatch
  * drive. The store is vocabulary-sized (that is the point — a
  * tokenizer's term table), written sorted by term so range reads
  * prune. */
object VocabStore {

  private def dir(path: String) = s"$path/vocab"

  private def metaFile(path: String) = s"${dir(path)}/_graft_vocab_meta"

  /** (w, n, df) of one doc-disjoint postings batch. */
  private def stats(postings: DataFrame, idCol: String, termCol: String)
      : DataFrame =
    postings.select(col(idCol).as("__id"), col(termCol).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"), countDistinct(col("__id")).as("df"))

  private def writeStats(spark: SparkSession, rows: DataFrame, path: String,
      lastBatch: Long, lastRemove: Long = -1L): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = dir(path) + ".staging"
    fs.delete(new Path(staging), true)
    rows.sort(col("w")).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(staging)
    val out = fs.create(new Path(s"$staging/_graft_vocab_meta"), true)
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

  /** Initialize (overwrite) from a first postings batch. */
  def create(spark: SparkSession, postings: DataFrame, idCol: String,
      termCol: String, path: String): Unit =
    writeStats(spark, stats(postings, idCol, termCol), path, lastBatch = -1L)

  /** True when a store exists at `path` (healed if a crash left a
    * staged swap). */
  def exists(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(dir(path)))
    fs.exists(new Path(metaFile(path)))
  }

  /** The stored (w, n, df) statistics. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(dir(path)))
    spark.read.parquet(dir(path))
  }

  /** Fold a doc-disjoint postings batch in: one delta-sized
    * aggregation + a vocabulary-sized integer merge + one atomic
    * write. Assumes exactly-once delivery — use [[appendBatch]] from
    * at-least-once sources (this monoid is NOT idempotent). */
  def append(spark: SparkSession, postings: DataFrame, idCol: String,
      termCol: String, path: String): Unit = {
    val (lastBatch, lastRemove) = readMeta(spark, path)
    val merged = read(spark, path)
      .unionByName(stats(postings, idCol, termCol))
      .groupBy(col("w"))
      .agg(sum(col("n")).as("n"), sum(col("df")).as("df"))
    writeStats(spark, merged, path, lastBatch, lastRemove)
  }

  /** [[append]] made EXACTLY-once for foreachBatch's at-least-once
    * contract: the monotone batch id is atomic with the merged
    * statistics, so a redelivered batch — whose re-absorption WOULD
    * double n and df here — is either fully absorbed (no-op) or not
    * absorbed at all (re-merge). */
  def appendBatch(spark: SparkSession, postings: DataFrame, idCol: String,
      termCol: String, path: String, batchId: Long): Unit = {
    val (lastBatch, lastRemove) = readMeta(spark, path)
    if (batchId <= lastBatch) return
    val merged = read(spark, path)
      .unionByName(stats(postings, idCol, termCol))
      .groupBy(col("w"))
      .agg(sum(col("n")).as("n"), sum(col("df")).as("df"))
    writeStats(spark, merged, path, batchId, lastRemove)
  }

  /** Subtract a source's postings OUT of the store — the takedown
    * direction ([[graft.ml.IsotonicStore.remove]]'s contract): the
    * batch must re-derive postings of WHOLE absorbed documents (doc
    * frequency subtracts per distinct id, so removing half a
    * document's terms would corrupt df silently — removing documents
    * the store never absorbed instead drives a count negative and
    * FAILS LOUD, pre-publish). Terms emptied by the removal drop from
    * the vocabulary. Assumes exactly-once — use [[removeBatch]] from
    * at-least-once sources. */
  def remove(spark: SparkSession, postings: DataFrame, idCol: String,
      termCol: String, path: String): Unit = {
    val (lastBatch, lastRemove) = readMeta(spark, path)
    writeStats(spark, removedStats(spark, postings, idCol, termCol, path),
      path, lastBatch, lastRemove)
  }

  /** [[remove]] made EXACTLY-once under at-least-once redelivery via
    * the removal stream's own monotone id ledger. */
  def removeBatch(spark: SparkSession, postings: DataFrame, idCol: String,
      termCol: String, path: String, removeId: Long): Unit = {
    val (lastBatch, lastRemove) = readMeta(spark, path)
    if (removeId <= lastRemove) return
    writeStats(spark, removedStats(spark, postings, idCol, termCol, path),
      path, lastBatch, removeId)
  }

  private def removedStats(spark: SparkSession, postings: DataFrame,
      idCol: String, termCol: String, path: String): DataFrame = {
    val merged = read(spark, path)
      .unionByName(stats(postings, idCol, termCol)
        .select(col("w"), (-col("n")).as("n"), (-col("df")).as("df")))
      .groupBy(col("w"))
      .agg(sum(col("n")).as("n"), sum(col("df")).as("df"))
      .localCheckpoint()
    val bad = merged.filter(col("n") < 0 || col("df") < 0 ||
      (col("n") === 0 && col("df") > 0) || col("df") > col("n")).count()
    require(bad == 0,
      s"remove: $bad terms would go negative/inconsistent - the batch " +
        "contains postings this store never absorbed")
    merged.filter(col("n") > 0)
  }

  /** From-scratch reference over a full postings frame — what the
    * maintained statistics must equal (shared by specs and oracles). */
  def fromScratch(postings: DataFrame, idCol: String, termCol: String)
      : DataFrame =
    stats(postings, idCol, termCol)
}
