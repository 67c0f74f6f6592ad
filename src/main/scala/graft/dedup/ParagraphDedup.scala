package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paragraph-level exact dedup across a corpus (the Dolma-style
  * sub-document pass): split every document into paragraphs, keep each
  * distinct paragraph's FIRST occurrence only — ordered by
  * (doc id, position), so the winner is deterministic and a paragraph
  * repeated WITHIN one document also collapses — and reassemble
  * documents from their surviving paragraphs in original order.
  * Boilerplate that repeats across a crawl (headers, footers, cookie
  * banners) disappears from every document but the first, which
  * document-level dedup cannot do.
  *
  * Scale shape: one shuffle partitioned by paragraph digest for the
  * first-occurrence window, one groupBy doc to reassemble — linear in
  * corpus size, no pair explosion. The window moves paragraph text
  * once; moving only (id, pos, digest) and re-joining the text by
  * (id, pos) halves that shuffle's width at the cost of a second join
  * — the digest-only refinement to reach for when paragraphs are long.
  */
object ParagraphDedup {

  /** Returns (idCol, textCol, n_paras_kept): the corpus with repeated
    * paragraphs removed. A document whose every paragraph was seen
    * earlier comes back with empty text and n_paras_kept = 0. */
  def dedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n\n"): DataFrame = {
    val paras = docs.select(col(idCol),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).as(Seq("pos", "para")))
    val firstOccurrence = Window.partitionBy(md5(col("para")))
      .orderBy(col(idCol), col("pos"))
    val kept = paras
      .withColumn("__rn", row_number().over(firstOccurrence))
      .filter(col("__rn") === 1)
    val reassembled = kept.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_paras_kept"),
        // array_sort on (pos, para) structs orders by pos — paragraphs
        // rejoin in their original in-document order
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("para")))),
          x => x.getField("para")), sep).as(textCol))
    docs.select(col(idCol))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col(textCol), lit("")).as(textCol),
        coalesce(col("n_paras_kept"), lit(0L)).as("n_paras_kept"))
  }
}
