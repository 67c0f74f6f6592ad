package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Exact n-gram Jaccard duplicate pairs via a shingle inverted index.
  *
  * Instead of the quadratic all-pairs cross join, build
  * (shingle -> posting list) and generate pairs only for documents
  * that co-occur under at least one shingle; count co-occurrences to
  * get |A ∩ B| directly, then Jaccard = inter / (|A| + |B| - inter).
  *
  * Scale properties: the shuffle moves (shingle_hash, doc_id) pairs —
  * already a fraction of corpus size — and the pair explosion is
  * bounded by a document-frequency cut (`maxDf`): shingles occurring
  * in more than maxDf documents are stop-shingles and carry almost no
  * similarity signal while dominating the join cost; dropping them is
  * the standard df-cut. With the cut disabled (maxDf = MaxValue) the
  * result is exact.
  */
object NGramJaccard {

  def pairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      minJaccard: Double = 0.5,
      maxDf: Int = Int.MaxValue): DataFrame = {

    // (doc, shingle_hash) postings; 64-bit hashes, not strings, cross
    // the shuffle. Collision probability at 100 TB corpus cardinality
    // (~2^40 shingles) is ~2^-24 per pair — acceptable for dedup.
    // ShingleHashes emits per-doc-distinct hashes in one pass (the
    // string-shingle HOF pipeline re-evaluated per plan reference was
    // the q61 bottleneck), so the exploded postings are already
    // distinct — no extra shuffle needed.
    val postings = docs
      .select(col(idCol).as("doc"),
        explode(ShingleHashes.of(TextFunctions.wsTokens(lower(col(textCol))), shingleN)).as("sh"))

    val docSize = postings.groupBy(col("doc")).agg(count(lit(1)).as("sz"))

    val filtered =
      if (maxDf == Int.MaxValue) postings
      else {
        val df = postings.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        postings.join(df.filter(col("df") <= maxDf), Seq("sh"), "left_semi")
      }

    val a = filtered.as("a")
    val b = filtered.as("b")
    val inter = a.join(b, col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("inter"))

    inter
      .join(docSize.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sz_a"), Seq("doc_a"))
      .join(docSize.withColumnRenamed("doc", "doc_b").withColumnRenamed("sz", "sz_b"), Seq("doc_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
