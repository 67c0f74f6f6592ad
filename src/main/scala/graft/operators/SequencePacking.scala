package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data prep: the concat-then-chunk
  * layout (GPT-style) — documents are concatenated in a deterministic
  * order and split into fixed-length token windows; each document
  * knows its token offset and which chunks it spans.
  *
  * Scale shape: packing is computed per SHARD (`groupCol` — language,
  * source, or a hash bucket), which is both how training shards are
  * actually built and what keeps the plan distributed: the running
  * token sum is a window partitioned by shard, so no global
  * single-partition sort ever exists. Chunk ids are shard-local
  * (shard, chunk) pairs. Everything is integer arithmetic over a
  * deterministic (groupCol, idCol) order — reproducible across runs,
  * partitionings, and engines.
  */
object SequencePacking {

  /** Annotate each document with its packed layout: `start_off` (token
    * offset of the doc inside its shard's concatenation), `chunk_first`
    * / `chunk_last` (the seqLen-sized windows the doc lands in), and
    * `n_chunks_spanned`. Zero-token docs are dropped (they occupy no
    * space in the stream). */
  def concatChunk(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      tokenCount: Column,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", tokenCount.cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("__end", sum(col("n_tokens")).over(w))
      .withColumn("start_off", col("__end") - col("n_tokens"))
      // `div` (integral), not `/` (double): offsets must stay exact
      // past 2^53 tokens
      .withColumn("chunk_first", expr(s"start_off div $seqLen"))
      .withColumn("chunk_last", expr(s"(__end - 1) div $seqLen"))
      .withColumn("n_chunks_spanned", col("chunk_last") - col("chunk_first") + 1)
      .drop("__end")
  }
}
