package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline scalar functions for large-scale corpus processing:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything here is composed from built-in Catalyst expressions
  * (codegen'd, no UDFs) and — where an oracle matters — restricted to
  * operations with identical semantics in ANSI SQL engines (replace /
  * split / length arithmetic), so the DuckDB oracle can evaluate the
  * exact same formula.
  */
object TextFunctions {

  /** Whitespace tokens (split on runs of whitespace, trimmed ends). */
  def wsTokens(text: Column): Column =
    split(trim(text), "\\s+")

  def wordCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(wsTokens(text)))

  /** BPE-ish subword proxy: letter runs, digit runs, or single
    * non-space symbols — the standard pre-tokenizer shape. */
  val bpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeIshTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeIshPattern))

  /** Non-overlapping occurrence count of literal `needle`, via
    * replace-length arithmetic (portable to any SQL engine). */
  def countOccurrences(text: Column, needle: String): Column =
    (length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(needle), ""))) / needle.length

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny and fixed: the point is the dataflow
    * shape (score -> argmax), not linguistic accuracy. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "fr" -> Seq(" le ", " la ", " et "),
    "de" -> Seq(" der ", " die ", " und "),
    "es" -> Seq(" el ", " los ", " y "),
    "zh" -> Seq("的", "是", "了"))

  /** Heuristic language score for one language: total marker hits in
    * the space-padded text. */
  def langScore(text: Column, lang: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    langMarkers.toMap.apply(lang)
      .map(m => countOccurrences(padded, m))
      .reduce(_ + _)
  }

  /** argmax language with fixed priority order on ties ('und' when all
    * scores are zero). */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(text, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), els) =>
      when(s > 0 && s === best, lit(l)).otherwise(els)
    }
  }

  // Ratio denominators are guarded: Spark 4 runs ANSI mode by default,
  // where x / 0 THROWS (even for doubles) — an empty or whitespace-only
  // document must score 0, not kill the job.
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text))

  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^.,;:!?'\"]", "")).cast("double") / length(text))

  def avgWordLen(text: Column): Column =
    when(wordCount(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "\\s+", "")).cast("double") / wordCount(text))

  def stopwordRatio(text: Column): Column = {
    val stops = Seq(" the ", " a ", " and ", " of ", " to ", " in ")
    val padded = concat(lit(" "), regexp_replace(text, "\\s+", " "), lit(" "))
    when(wordCount(text) === 0, 0.0).otherwise(
      stops.map(s => countOccurrences(padded, s)).reduce(_ + _).cast("double") / wordCount(text))
  }

  /** Composite document-quality score in [0,1]: favors mid-length
    * documents with high alpha ratio, low punctuation density, and a
    * plausible average word length. Weights are fixed constants. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(wordCount(text).cast("double") / 100.0, lit(1.0))
    val alpha = alphaRatio(text)
    val punct = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 10.0)
    val awl = avgWordLen(text)
    val awlScore = when(awl.between(3.0, 10.0), 1.0).otherwise(0.5)
    round(lenScore * 0.3 + alpha * 0.3 + punct * 0.2 + awlScore * 0.2, 6)
  }

  /** Normalization fingerprint (the classic "fingerprint" clustering
    * key): lowercase, split, dedupe, sort, rejoin, md5. Two documents
    * with the same word set share a fingerprint. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(split(lower(trim(text)), "\\s+"))), " "))

  /** Positional word n-grams (NON-distinct, one entry per position) —
    * the frequency-carrying counterpart of [[wordShingles]], the input
    * unit for within-document repetition statistics (top-n-gram share,
    * duplicate-n-gram mass). Lowercased like the dedup family. Fewer
    * than n words -> empty array. */
  def wordNGrams(text: Column, n: Int): Column = {
    val toks = wsTokens(lower(text))
    val k = size(toks) - (n - 1)
    when(length(trim(text)) === 0 || k <= 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), k - 1),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /** Word n-gram shingles (distinct), the input unit for Jaccard /
    * MinHash dedup. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = wsTokens(lower(text))
    val k = size(toks) - (n - 1)
    when(k <= 0, array(array_join(toks, " ")))
      .otherwise(array_distinct(transform(
        sequence(lit(0), k - 1),
        i => array_join(slice(toks, i + 1, lit(n)), " "))))
  }
}
