package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Percolation / stored-query alerting: a (small) registry of saved
  * conjunctive term queries is matched against documents — the inverse
  * of search, where the QUERIES are the indexed side and each incoming
  * document is probed against all of them. The streaming shape of
  * "alert me when a doc mentioning all of X, Y arrives".
  *
  * Two routes, one semantics:
  *  - `matchDocs` (batch): explode doc tokens once, broadcast-join the
  *    exploded query terms, count matched terms per (doc, query), keep
  *    full conjunctions. The shuffle is keyed by (doc, query) hits
  *    only — documents that share no term with any stored query never
  *    leave the scan. The right plan when the corpus is the big side.
  *  - `matchStream` (streaming/row-at-a-time): stateless per-row
  *    `forall` containment against the broadcast query registry — no
  *    aggregation state, so it runs in append mode with watermark-free
  *    semantics. The right plan when docs arrive one at a time.
  *
  * Both tokenize like the inverted-index family: lowercase, trim,
  * whitespace split, distinct.
  */
object Percolator {

  private def tokens(textCol: String) =
    array_distinct(split(trim(lower(col(textCol))), "\\s+"))

  /** Batch: (idCol, query_id) for every stored query whose terms ALL
    * occur in the document. `queries` carries (query_id, terms). */
  def matchDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame): DataFrame = {
    val qt = queries.select(
      col("query_id"),
      size(col("terms")).cast("long").as("__n_terms"),
      explode(col("terms")).as("term"))
    val toks = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), explode(tokens(textCol)).as("term"))
    toks
      .join(broadcast(qt), Seq("term"))
      // tokens are distinct per doc, so count(*) = matched terms
      .groupBy(col(idCol), col("query_id"), col("__n_terms"))
      .agg(count(lit(1)).as("__m"))
      .filter(col("__m") === col("__n_terms"))
      .select(col(idCol), col("query_id"))
  }

  /** Streaming-safe stateless route: per-row containment check against
    * the broadcast registry. Works identically on batch frames. */
  def matchStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame): DataFrame =
    docs
      .filter(length(trim(col(textCol))) > 0)
      .withColumn("__toks", tokens(textCol))
      .crossJoin(broadcast(queries.select(col("query_id"), col("terms"))))
      .filter(forall(col("terms"), t => array_contains(col("__toks"), t)))
      .select(col(idCol), col("query_id"))
}
