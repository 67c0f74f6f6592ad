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
  * State is a single long in a tiny text file, updated with the same
  * staged-rename protocol the other streaming states use (write
  * staging, rename over — a crashed batch leaves the previous state
  * intact; Structured Streaming replays the batch and the fold is
  * redone from the surviving value). At-least-once REPLAY of the same
  * batch would double-fold — `process` is therefore keyed by batchId
  * and skips an id it has already folded, the standard idempotent
  * foreachBatch discipline.
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
    val (seen, current) =
      if (fs.exists(p)) {
        val s = scala.io.Source.fromInputStream(fs.open(p))
        val Array(b, d) = try s.mkString.trim.split(":") finally s.close()
        (b.toLong, java.lang.Long.parseLong(d))
      } else (-1L, 0L)
    if (batchId <= seen) current // replayed batch: already folded
    else {
      val folded = current ^ DatasetDigest.digest(batch, cols)
      val staging = new Path(stateFile + ".staging")
      val out = fs.create(staging, true)
      try out.write(s"$batchId:$folded".getBytes("UTF-8")) finally out.close()
      // rename-over: a crash before this point leaves the old state
      fs.delete(p, false)
      if (!fs.rename(staging, p))
        throw new java.io.IOException(s"digest state rename failed: $stateFile")
      folded
    }
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
