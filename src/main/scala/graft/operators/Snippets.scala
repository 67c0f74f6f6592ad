package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Search-result snippet extraction: for each document containing a
  * term, the token window around the FIRST occurrence — the "hit
  * highlighting" step a search serving layer runs over its top-k.
  *
  * Plan shape: one narrow projection per document (tokenize, first
  * position, slice) — no shuffle, no join, codegen'd built-ins only
  * (`split`/`array_position`/`slice`/`array_join`). At 100 TB this
  * runs AFTER retrieval, over the top-k hit set, so the scan is
  * bounded by the result size, not the corpus.
  *
  * Tokenization matches the inverted-index family (InvertedIndex,
  * PostingsStore): lowercase, trim, split on runs of whitespace —
  * so `first_pos` agrees with the postings' 1-based positions.
  */
object Snippets {

  /** (idCol, first_pos, snippet) for docs containing `term`. */
  def firstMatch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      term: String,
      window: Int = 3): DataFrame = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    docs
      .filter(length(trim(col(textCol))) > 0)
      .withColumn("__t", toks)
      // array_position = 1-based first index, 0 when absent
      .withColumn("__p", array_position(col("__t"), term))
      .filter(col("__p") > 0)
      .withColumn("__start", greatest(lit(1L), col("__p") - window))
      .withColumn("__end", least(size(col("__t")).cast("long"), col("__p") + window))
      .select(
        col(idCol),
        col("__p").as("first_pos"),
        array_join(
          slice(col("__t"), col("__start").cast("int"),
            (col("__end") - col("__start") + 1L).cast("int")),
          " ").as("snippet"))
  }
}
