package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ann.GraphAnn

/** Streaming ingest for the navigable-graph ANN index: micro-batches
  * of new vectors arrive as files and fold into a pre-created
  * [[GraphAnn]] store via the search-based insert — each batch beam-
  * searches the CURRENT graph for its neighbors, lands merge-on-read
  * adjacency/vector files, and is immediately servable (reachable
  * through its reciprocal back-edges). The §2.9 twin of the batch
  * append, completing the family's lifecycle: build → serve (plain +
  * filtered) → streaming growth → takedown ([[StreamingForget]]'s
  * vector leg) → compact.
  *
  * Replay safety rides [[GraphAnn.Handle.append]]'s per-table probes
  * verbatim (foreachBatch is at-least-once, and a checkpointed file
  * source redelivers IDENTICAL batches): a fully-landed redelivery is
  * a no-op on both tables; a crash between the vector and adjacency
  * writes heals on redelivery (the landed table skipped, the missing
  * one written — the window's new ids are edgeless and therefore
  * unservable, never wrong); a PARTIALLY-overlapping batch — which a
  * checkpointed source cannot produce — fails loud rather than guess.
  * Periodic [[GraphAnn.Handle.compact]] (the hygiene step, caller's
  * cadence) re-bounds degree and restores exact-kNN navigability.
  */
object StreamingVectorIngest {

  /** One micro-batch step; exposed for direct use and tests. */
  def process(batch: DataFrame, path: String, idCol: String,
      vecCol: String): Unit = {
    if (!batch.isEmpty) {
      GraphAnn.open(batch.sparkSession, path).append(batch, idCol, vecCol)
      ()
    }
  }

  /** File-source drive: watch `inDir` for parquet batches of
    * (idCol LONG, vecCol ARRAY<FLOAT>) rows. `maxFilesPerBatch`
    * defaults to one file per micro-batch so batch boundaries equal
    * the producer's file boundaries — the unit the crash-heal contract
    * reasons about (a half-landed batch is re-offered as EXACTLY the
    * same id set). */
  def stream(
      spark: SparkSession,
      inDir: String,
      checkpointDir: String,
      path: String,
      idCol: String,
      vecCol: String,
      maxFilesPerBatch: Int = 1): StreamingQuery =
    spark.readStream
      .schema(s"$idCol BIGINT, $vecCol ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", maxFilesPerBatch)
      .parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        process(batch, path, idCol, vecCol)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
