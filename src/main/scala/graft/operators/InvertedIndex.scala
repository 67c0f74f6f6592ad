package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Positional inverted index over a document corpus — the text-search
  * primitive: `postings` materializes (term, doc_id, pos) rows, and
  * the two query shapes every search layer needs run as plain
  * relational plans over it: exact consecutive-phrase match (positional
  * joins on a per-term anchor) and all-terms conjunction (one
  * aggregation with a distinct-term count). (Reference scope:
  * nvd2mysqlloader greps nothing — part of the mandated text-analysis
  * extension set; the corpus queries q54/q89 cover substring and
  * TF-IDF ranking, this adds position-aware search.)
  *
  * Scale: `postings` is one generator projection (posexplode — no
  * shuffle). `phraseSearch` filters the postings to each phrase term
  * BEFORE joining, keyed on (doc_id, anchor) where anchor =
  * pos - offset aligns all words of one occurrence to the same key —
  * so only the phrase terms' postings ever reach the join shuffle.
  * Inline over raw documents the term filter applies right after the
  * generator (the corpus is still scanned once per term); the 100 TB
  * shape MATERIALIZES the postings bucketed by term —
  * [[PostingsStore]] — where the same filter becomes partition
  * pruning + parquet row-group skipping and each term reads only its
  * own slice. `allTermsSearch` is a single groupBy over the
  * IN-filtered postings — one scan regardless of term count.
  *
  * Every search shape is implemented ONCE against a term-postings
  * provider (`*Impl`); the inline form (scan + filter) and the
  * store-backed form (pruned read) plug in their own provider, so the
  * two routes are the same arithmetic by construction and the store
  * twins hash-match the inline queries.
  */
object InvertedIndex {

  /** Query terms must be single tokens: a term containing whitespace
    * (or an empty string) can never match a whitespace-split posting,
    * so the search would silently return empty instead of failing. */
  private[operators] def validTerms(fn: String, terms: Seq[String]): Unit = {
    require(terms.nonEmpty, s"$fn: terms must be non-empty")
    terms.foreach(t => require(t.nonEmpty && !t.exists(_.isWhitespace),
      s"$fn: '$t' is not a single token — split the query into words"))
  }

  /** (term, doc_id, pos) postings; whitespace tokens of the lowercased
    * text, pos 1-based. Empty/whitespace-only docs contribute none. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        posexplode(TF.wsTokens(lower(col(textCol)))).as(Seq("pos0", "term")))
      .select(col("term"), col(idCol), (col("pos0") + 1).cast("long").as("pos"))

  /** Per-doc token lengths (idCol, __dl) — the BM25 side table. A
    * narrow per-row projection (token count == postings count for the
    * same non-empty docs), not a corpus-wide explode + re-aggregate. */
  private[operators] def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), TF.wordCount(col(textCol)).cast("long").as("__dl"))

  // ---- shared search implementations ---------------------------------
  // `termPost(t)` must return the postings rows of lowercase term `t`
  // as (idCol, pos); `termsPost(ts)` the union for a term set as
  // (term, idCol, pos). Providers: inline = filter-after-generator,
  // store = bucket-pruned parquet read.

  private[operators] def phraseImpl(
      idCol: String,
      phrase: Seq[String],
      termPost: String => DataFrame): DataFrame = {
    validTerms("phraseSearch", phrase)
    phrase.zipWithIndex
      .map { case (w, i) =>
        termPost(w.toLowerCase)
          .select(col(idCol), (col("pos") - i).as("anchor"))
      }
      .reduce((a, b) => a.join(b, Seq(idCol, "anchor")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"), min(col("anchor")).as("first_pos"))
  }

  private[operators] def proximityImpl(
      idCol: String,
      termA: String,
      termB: String,
      slop: Int,
      termPost: String => DataFrame): DataFrame = {
    validTerms("proximitySearch", Seq(termA, termB))
    require(slop >= 1, s"slop must be >= 1, got $slop")
    // identical terms would join a postings set with itself and count
    // every co-occurrence twice ((pa,pb) and (pb,pa))
    require(termA.toLowerCase != termB.toLowerCase,
      s"proximitySearch: terms must differ, got '$termA' twice")
    val a = termPost(termA.toLowerCase).select(col(idCol), col("pos").as("__pa"))
    val bb = termPost(termB.toLowerCase).select(col(idCol), col("pos").as("__pb"))
    a.join(bb, Seq(idCol))
      .filter(col("__pa") =!= col("__pb") &&
        abs(col("__pa") - col("__pb")) <= slop)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("__pa") - col("__pb"))).as("min_distance"))
  }

  private[operators] def allTermsImpl(
      idCol: String,
      terms: Seq[String],
      termsPost: Seq[String] => DataFrame): DataFrame = {
    validTerms("allTermsSearch", terms)
    val lower = terms.map(_.toLowerCase).distinct
    termsPost(lower)
      .groupBy(col(idCol))
      .agg(countDistinct(col("term")).as("n_terms"),
        count(lit(1)).as("n_hits"))
      .filter(col("n_terms") === lower.length)
      .select(col(idCol), col("n_hits"))
  }

  /** [[allTermsImpl]] served from PRE-AGGREGATED `(term, id, __tf)`
    * rows (one row per term-doc pair, no positions): the distinct-term
    * count collapses to a plain row count — (term, id) is unique by
    * construction — and total hits to Σ tf. Identical output to the
    * occurrence-row form; reads a frame that is term-doc-sized, not
    * occurrence-sized. */
  private[operators] def allTermsFromTf(
      idCol: String,
      terms: Seq[String],
      tfRows: DataFrame): DataFrame = {
    validTerms("allTermsSearch", terms)
    val lower = terms.map(_.toLowerCase).distinct
    tfRows
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("__tf")).as("n_hits"))
      .filter(col("n_terms") === lower.length)
      .select(col(idCol), col("n_hits"))
  }

  /** BM25 (Robertson/Okapi, the Lucene `+1` IDF variant so every
    * score is positive):
    *   score(d, q) = Σ_{t∈q} ln(1 + (N - df + 0.5)/(df + 0.5))
    *       · tf·(k1+1) / (tf + k1·(1 − b + b·len(d)/avglen))
    * Corpus statistics (N, avglen, per-term df) are tiny aggregates
    * broadcast back; per-doc term frequencies come from one groupBy of
    * the term-filtered postings. Output: (doc_id, score, rnk) for the
    * top `k`, ranked on the 4dp-rounded score (doc_id tie-break) so
    * the ordering is reproducible across engines. */
  private[operators] def bm25Impl(
      idCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double,
      b: Double,
      termsPost: Seq[String] => DataFrame,
      docLen: DataFrame,
      dfStats: Option[Seq[String] => DataFrame] = None,
      tfRows: Option[Seq[String] => DataFrame] = None,
      corpusStats: Option[(Long, Double)] = None): DataFrame = {
    validTerms("bm25Search", terms)
    val query = terms.map(_.toLowerCase).distinct
    // (N, avgdl): a driver-side literal pair when the caller carries
    // the corpus statistics (the PostingsStore v6 meta — no doclen
    // aggregate per query), else one aggregate of the doclen frame.
    // Identical values either way: dl is integer-valued, so the
    // double average equals sumDl/n bit for bit.
    val corpus = corpusStats match {
      case Some((n, avgdl)) => docLen.sparkSession.range(1)
        .select(lit(n).as("__n"), lit(avgdl).as("__avgdl"))
      case None => docLen.agg(count(lit(1)).as("__n"),
        avg(col("__dl").cast("double")).as("__avgdl"))
    }
    // per-(term, doc) frequencies: pre-aggregated store rows when the
    // layout carries them (term-doc-sized read, no positions, no
    // aggregation stage), else one groupBy of the occurrence postings
    val tf = tfRows match {
      case Some(provider) => provider(query)
        .select(col("term"), col(idCol), col("__tf"))
      case None => termsPost(query)
        .groupBy(col("term"), col(idCol)).agg(count(lit(1)).as("__tf"))
    }
    // df: from the store's collection statistics when available (one
    // pruned vocabulary read, no extra aggregation stage), else
    // derived from tf — identical values either way, since stats df
    // IS countDistinct(id) of the same postings
    val df = dfStats match {
      case Some(stats) => stats(query).select(col("term"), col("df").as("__df"))
      case None => tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    }
    val scored = tf.join(broadcast(df), Seq("term"))
      .join(docLen, Seq(idCol))
      .crossJoin(broadcast(corpus))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__s", col("__idf") * col("__tf") * (k1 + 1) /
        (col("__tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col(idCol))
      .agg(round(sum(col("__s")), 4).as("score"))
    // TakeOrderedAndProject bounds the sort to k rows (a bare global
    // window here would single-partition the whole scored set); the
    // row_number window then ranks only the k survivors
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col(idCol))
    scored.orderBy(col("score").desc, col(idCol)).limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
  }

  // ---- inline forms (scan + filter providers) -------------------------

  /** Docs containing the words of `phrase` consecutively, with the
    * match count and first match position (1-based). Repeated words in
    * the phrase are handled naturally by the positional join. */
  def phraseSearch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]): DataFrame = {
    val post = postings(docs, idCol, textCol)
    phraseImpl(idCol, phrase, t => post.filter(col("term") === t))
  }

  /** Unordered proximity search: docs where `termA` and `termB` occur
    * within `slop` words of each other, with the co-occurrence count
    * and the closest distance. The join is per-document on the two
    * terms' postings (tiny frames after the term filters); the slop
    * predicate is a band on the position difference. slop = 1 with
    * ordered positions is phrase adjacency — use [[phraseSearch]] for
    * exact phrases. */
  def proximitySearch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      termA: String,
      termB: String,
      slop: Int): DataFrame = {
    val post = postings(docs, idCol, textCol)
    proximityImpl(idCol, termA, termB, slop, t => post.filter(col("term") === t))
  }

  /** BM25-ranked retrieval over the inline postings. */
  def bm25Search(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val post = postings(docs, idCol, textCol)
    bm25Impl(idCol, terms, k, k1, b,
      ts => post.filter(col("term").isin(ts: _*)),
      docLengths(docs, idCol, textCol))
  }

  /** Docs containing ALL of `terms` (any positions): one aggregation
    * over the IN-filtered postings with a distinct-term count. */
  def allTermsSearch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String]): DataFrame = {
    val post = postings(docs, idCol, textCol)
    allTermsImpl(idCol, terms, ts => post.filter(col("term").isin(ts: _*)))
  }
}
