package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental top-k similarity over an unbounded embedding stream:
  * maintain, per query vector, the exact global top-k neighbors seen
  * so far — without ever re-scoring the history.
  *
  * Each micro-batch scores ONLY its own vectors against the (small,
  * broadcast) query set, unions with the k-bounded state, re-ranks,
  * and writes the new state back. State size is |queries| x k rows
  * regardless of stream length, so the per-batch cost is
  * O(batch x queries) — the streaming form of brute-force ANN, and
  * the exactness argument is the monotone top-k merge: top_k(A ∪ B) =
  * top_k(top_k(A) ∪ top_k(B)).
  *
  * The state parquet is read and rewritten in the same batch, so the
  * write goes to a staging dir and is swapped in with renames (same
  * pattern as NvdStore.upsert).
  */
object StreamingSimilarity {

  def start(
      spark: SparkSession,
      queries: DataFrame, // (qid, qvec) — broadcast-sized
      streamDir: String,
      stateDir: String,
      checkpointDir: String,
      k: Int,
      schema: org.apache.spark.sql.types.StructType): StreamingQuery = {

    // no cache: the query frame is tiny and a cached frame would stay
    // pinned for the session after the stream terminates
    val q = queries.select(col("qid"), col("qvec"))

    spark.readStream.schema(schema).parquet(streamDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val scored = graft.ann.Ann.bruteForceTopK(
            batch, q, "vec_id", "embedding", "qid", "qvec", k)
          .select(col("query_id"), col("neighbor_id"), col("cos"))
        val fs = new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
        graft.operators.SwapDir.heal(fs, new Path(stateDir))
        val prev =
          if (fs.exists(new Path(stateDir)))
            spark.read.parquet(stateDir).select(col("query_id"), col("neighbor_id"), col("cos"))
          else scored.limit(0)
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))
        val merged = prev.unionByName(scored)
          .dropDuplicates("query_id", "neighbor_id") // re-delivery guard
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= k)
        val staging = new Path(stateDir + ".staging-" + java.util.UUID.randomUUID())
        merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
        graft.operators.SwapDir.swap(fs, staging, new Path(stateDir))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
