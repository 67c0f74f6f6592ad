package graft.layout

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction for parquet directories.
  *
  * Continuous ingest (micro-batches, partition-scoped upserts, delta
  * folds) accretes many small files; at 100 TB the cost is real —
  * footer/open overhead per file, task-per-file scheduling, NameNode/
  * listing pressure — and it compounds every batch. Compaction
  * rewrites a directory into ~targetBytes files and swaps the result
  * in crash-safely (`operators.SwapDir`: the old data is the only
  * copy until the new one is fully written, and a crash mid-swap is
  * healed on the next read/compact).
  *
  * Row-content preserving, layout-destroying: a Z-ordered directory
  * should be re-clustered with `ZOrder.writeClustered` instead, which
  * already writes one file per z-range. `compactPartitions` applies
  * the same treatment per partition directory of a partitioned table
  * root (each partition swap is independent — a crash affects at most
  * one partition, and `SwapDir.healAll` on the root repairs it).
  */
object Compaction {

  /** Bytes currently under `dir` (data files only, hidden files and
    * _SUCCESS markers excluded — what a scan would read). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else
      fs.listStatus(p).filter(st => st.isFile && isData(st.getPath.getName))
        .map(_.getLen).sum
  }

  /** Number of data files under `dir`. */
  def dataFiles(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(st => st.isFile && isData(st.getPath.getName))
  }

  private def isData(name: String) =
    !name.startsWith(".") && !name.startsWith("_")

  /** Rewrite `dir` into ceil(bytes / targetBytes) files (min 1) and
    * swap the rewrite in. No-op (returns false) when the directory
    * already has that few files — compaction must be safe to run on
    * a schedule without churning already-compact data. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L << 20): Boolean = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.operators.SwapDir.heal(fs, p)
    val bytes = dataBytes(spark, dir)
    if (bytes == 0L) return false
    val want = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (dataFiles(spark, dir) <= want) return false
    val staging = new Path(p.getParent, "." + p.getName + ".compacting")
    if (fs.exists(staging)) fs.delete(staging, true)
    // coalesce, not repartition: a narrow merge of read splits — no
    // shuffle; parquet re-encode is the only cost
    spark.read.parquet(dir)
      .coalesce(want)
      .write.mode("overwrite").parquet(staging.toString)
    graft.operators.SwapDir.swap(fs, staging, p)
    true
  }

  /** Compact every leaf partition directory under a partitioned table
    * root (`k=v` layout, arbitrary nesting). Returns the number of
    * partitions actually rewritten. */
  def compactPartitions(spark: SparkSession, root: String,
      targetBytes: Long = 128L << 20): Int = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return 0
    graft.operators.SwapDir.healAll(fs, rootPath)
    def leaves(p: Path): Seq[Path] = {
      val kids = fs.listStatus(p).filter(_.isDirectory)
        .filter(st => isData(st.getPath.getName))
      if (kids.isEmpty) Seq(p)
      else kids.toIndexedSeq.flatMap(st => leaves(st.getPath))
    }
    val parts = leaves(rootPath).filterNot(_ == rootPath)
    parts.count(part => compact(spark, part.toString, targetBytes))
  }
}
