package graft.ml

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintainable Naive Bayes model store —
  * the model behind a long-running classifier gate
  * ([[graft.streaming.StreamingClassifierGate]]) that keeps learning
  * as labelled documents arrive, without ever re-reading history.
  *
  * The store persists SUFFICIENT STATISTICS, not derived weights:
  * NB's statistics are counts, and counts form a monoid — per-class
  * token counts `(label, token, n)` and per-class document counts
  * `(label, docs)` merge by addition. So:
  *
  *  - [[append]] aggregates ONLY the new batch (one explode + groupBy
  *    over the delta), unions it with the stored counts, re-sums —
  *    a shuffle sized by vocab + delta, never by history text — and
  *    swaps the store atomically ([[graft.operators.SwapDir]], the
  *    postings-store convention: a crash mid-append leaves the
  *    previous model readable).
  *  - [[model]] derives the log-probability frames from the stored
  *    counts via [[NaiveBayes.modelFromStats]] — the same expression
  *    tree batch training uses — so an incrementally-built store
  *    yields a model IDENTICAL to batch-training on the concatenated
  *    corpus (counts are integers; the log math is shared).
  *    NbModelStoreSpec asserts that equality.
  *
  * At 100 TB the difference is the whole game: batch re-training
  * re-tokenizes the full corpus per refresh; the store's refresh cost
  * is the DELTA plus a vocab-sized merge.
  */
object NbModelStore {

  private def countsDir(path: String) = s"$path/counts"
  private def docsDir(path: String) = s"$path/docs"

  /** Initialize (overwrite) the store from a labelled corpus. */
  def create(spark: SparkSession, batch: DataFrame, labelCol: String,
      textCol: String, path: String): Unit = {
    val (counts, docs) = NaiveBayes.tokenStats(batch, labelCol, textCol)
    counts.write.mode(SaveMode.Overwrite).parquet(countsDir(path))
    docs.write.mode(SaveMode.Overwrite).parquet(docsDir(path))
  }

  /** Merge a labelled delta into the store (atomic swap per table). */
  def append(spark: SparkSession, batch: DataFrame, labelCol: String,
      textCol: String, path: String): Unit = {
    import graft.operators.SwapDir
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(countsDir(path)))
    SwapDir.heal(fs, new Path(docsDir(path)))
    val (dCounts, dDocs) = NaiveBayes.tokenStats(batch, labelCol, textCol)
    val counts = spark.read.parquet(countsDir(path))
      .unionByName(dCounts)
      .groupBy(col("label"), col("token")).agg(sum(col("n")).as("n"))
    val docs = spark.read.parquet(docsDir(path))
      .unionByName(dDocs)
      .groupBy(col("label")).agg(sum(col("docs")).as("docs"))
    val stagingC = countsDir(path) + ".staging"
    val stagingD = docsDir(path) + ".staging"
    counts.write.mode(SaveMode.Overwrite).parquet(stagingC)
    docs.write.mode(SaveMode.Overwrite).parquet(stagingD)
    SwapDir.swap(fs, new Path(stagingC), new Path(countsDir(path)))
    SwapDir.swap(fs, new Path(stagingD), new Path(docsDir(path)))
  }

  /** Derive the serving model from the stored statistics. */
  def model(spark: SparkSession, path: String): NaiveBayes.Model = {
    import graft.operators.SwapDir
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(countsDir(path)))
    SwapDir.heal(fs, new Path(docsDir(path)))
    NaiveBayes.modelFromStats(
      spark.read.parquet(countsDir(path)),
      spark.read.parquet(docsDir(path)))
  }
}
