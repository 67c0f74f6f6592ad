package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size overlapping document chunking — the RAG / context-window
  * prep step: split each document into `chunkSize`-character windows
  * that overlap by `overlap` characters, each chunk carrying a stable
  * (doc_id, chunk_idx) identity and its character offset, so chunks can
  * be embedded/indexed independently and traced back to their source
  * span. Complements `SequencePacking.concatChunk` (reference:
  * nvd2mysqlloader has no corpus surface; this is part of the mandated
  * training-data extension set): packing concatenates docs into fixed
  * token windows for training, chunking splits docs into overlapping
  * windows for retrieval.
  *
  * Chunk i covers characters `[i*stride, i*stride + chunkSize)` with
  * `stride = chunkSize - overlap`; the last chunk may be shorter.
  * `nChunks = 1 + ceil((len - chunkSize) / stride)` for docs longer
  * than one chunk, else 1 — an empty document still yields one (empty)
  * chunk so every doc_id survives into the chunk table.
  *
  * Scale: a single narrow projection + generator (sequence ->
  * posexplode) — no shuffle, no UDFs; the fanout per document is
  * bounded by `len/stride`, so output size tracks corpus character
  * count, and the explode inherits the scan's partitioning. All
  * arithmetic is integer (ANSI-safe, oracle-replicable).
  */
object Chunker {

  /** Adds `chunk_idx`, `chunk_start` (0-based char offset), `n_chunks`,
    * `chunk_text` — one output row per chunk, other columns preserved.
    */
  def chunk(
      docs: DataFrame,
      textCol: String = "text",
      chunkSize: Int = 512,
      overlap: Int = 64): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    // null text counts as empty: without the coalesce a null length
    // nulls n_chunks, explode emits zero rows, and the doc_id silently
    // vanishes — breaking the every-doc-survives invariant below
    val text = coalesce(col(textCol), lit(""))
    val len = length(text).cast("long")
    // ceil((len - chunkSize) / stride) in exact integer arithmetic;
    // operands are non-negative in the > chunkSize branch so the
    // truncating cast IS floor, and +stride-1 turns floor into ceil
    val nChunks = when(len <= chunkSize, lit(1L))
      .otherwise(lit(1L) +
        ((len - chunkSize + (stride - 1)) / lit(stride)).cast("long"))
    docs
      .withColumn("n_chunks", nChunks)
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("chunk_start", col("chunk_idx") * stride)
      .withColumn("chunk_text",
        text.substr((col("chunk_start") + 1).cast("int"), lit(chunkSize)))
  }
}
