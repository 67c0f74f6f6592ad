package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.DatasetDigest

/** Incremental corpus digest — continuous export integrity: fold each
  * micro-batch's order-invariant XOR digest (`operators.DatasetDigest`)
  * into a running 64-bit state, so at any point the accumulated value
  * equals the digest of everything ingested so far and can be compared
  * against a downstream copy (shard export, mirror, format migration)
  * without scanning history. XOR's associativity is exactly what makes
  * the incremental fold equal the batch digest:
  * digest(A ∪ B) = digest(A) XOR digest(B) for disjoint batches.
  *
  * State is a single long in a tiny text file, updated by staged
  * rename with READ-SIDE recovery: the writer stages the new value,
  * deletes the main file, renames staging over it — and the reader
  * accepts whichever of (main, staging) parses with the HIGHER
  * batchId. The two crash windows both resolve: crash mid-staging
  * leaves a corrupt staging but an intact main (delete only happens
  * after a successful staging close); crash between delete and rename
  * leaves no main but a COMPLETE staging, which the reader recovers.
  * A bare delete-then-rename without the read-side recovery would
  * silently restart from zero in that second window (the exact hazard
  * `operators.SwapDir` documents for directories). At-least-once
  * REPLAY of the same batch would double-fold — `process` is keyed by
  * batchId and skips an id it has already folded.
  */
object StreamingDigest {

  /** One micro-batch fold; exposed for direct use and tests. Returns
    * the digest after folding (unchanged if batchId was already seen).
    */
  def process(
      spark: SparkSession,
      batch: DataFrame,
      stateFile: String,
      batchId: Long,
      cols: Seq[String] = Seq.empty): Long = {
    val fs = new Path(stateFile).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(stateFile)
    val staging = new Path(stateFile + ".staging")
    val (seen, current) = readState(fs, p, staging)
    if (batchId <= seen) current // replayed batch: already folded
    else {
      val folded = current ^ DatasetDigest.digest(batch, cols)
      val out = fs.create(staging, true)
      try out.write(s"$batchId:$folded".getBytes("UTF-8")) finally out.close()
      fs.delete(p, false)
      if (!fs.rename(staging, p))
        throw new java.io.IOException(s"digest state rename failed: $stateFile")
      folded
    }
  }

  /** Best (batchId, digest) among main and staging — whichever parses
    * with the higher batchId wins (read-side half of the crash-safe
    * protocol; see object scaladoc). */
  private def readState(
      fs: org.apache.hadoop.fs.FileSystem,
      main: Path,
      staging: Path): (Long, Long) = {
    def tryRead(p: Path): Option[(Long, Long)] =
      if (!fs.exists(p)) None
      else try {
        val s = scala.io.Source.fromInputStream(fs.open(p))
        val Array(b, d) = try s.mkString.trim.split(":") finally s.close()
        Some((b.toLong, java.lang.Long.parseLong(d)))
      } catch { case _: Exception => None } // partial write: ignore
    (tryRead(main) ++ tryRead(staging)).toSeq
      .sortBy(-_._1).headOption.getOrElse((-1L, 0L))
  }

  /** Start the stream: parquet source -> per-batch digest fold. */
  def start(
      spark: SparkSession,
      streamDir: String,
      stateFile: String,
      checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType,
      cols: Seq[String] = Seq.empty): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(streamDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        process(spark, batch, stateFile, batchId, cols); ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
