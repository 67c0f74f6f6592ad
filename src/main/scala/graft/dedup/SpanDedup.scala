package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Repeated-SPAN detection and removal — exact substring-level dedup
  * inside a corpus, the training-data curation step that document- or
  * paragraph-level dedup misses (boilerplate headers, license blocks,
  * templated sentences repeated across thousands of otherwise-unique
  * pages). Published motivation: Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better" (ExactSubstr, 50-token
  * threshold, suffix arrays). (Reference scope: nvd2mysqlloader has no
  * dedup surface — part of the mandated dedup extension set.)
  *
  * The suffix-array construction of the paper is a single-machine
  * shape; the standard distributed equivalent (MassiveText/Gopher's
  * 13-gram dedup) is ROLLING TOKEN WINDOWS: a length-`windowTokens`
  * substring repeats iff every maximal repeated substring of at least
  * that length contributes a repeated window, so marking duplicated
  * windows and merging overlapping marks recovers the repeated spans
  * (granularity `windowTokens`, the price of distribution).
  *
  * Plan shape at 100 TB — three linear shuffles, no quadratics:
  *   1. per-doc window hashes: one narrow projection (tokens ->
  *      transform/slice/xxhash64 -> posexplode), rows ≈ corpus tokens,
  *      64-bit keys only — document text never shuffles;
  *   2. duplicated-hash set: groupBy(hash) count>1 (map-side partial
  *      aggregation does the heavy lifting — singleton hashes, the
  *      overwhelming majority, die in the map stage);
  *   3. mark + merge: join windows to the duplicated set (hash keys),
  *      then one window function per doc (gaps-and-islands) merges
  *      overlapping marks into spans.
  * Within-doc repetition counts: two occurrences of a window in the
  * SAME document are duplication (the paper's semantics) and both get
  * marked.
  */
object SpanDedup {

  /** Token spans (start inclusive, end exclusive, 0-based token
    * coordinates over the lowercased whitespace tokenization) that
    * occur more than once corpus-wide. One row per (doc, merged span):
    * (idCol, span_start, span_end, n_windows). */
  def repeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 8): DataFrame =
    mergeMarked(markedWindows(docs, idCol, textCol, windowTokens),
      idCol, windowTokens)

  /** Merge marked window positions (idCol, pos) into maximal spans —
    * gaps-and-islands: marks closer than a window length overlap (or
    * touch) the previous span — same island; further apart starts a
    * new island. Runs per doc over positions already shuffled there.
    * Shared by the batch route and the streaming twin. */
  private[graft] def mergeMarked(
      marked: DataFrame,
      idCol: String,
      windowTokens: Int): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val islands = marked
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= windowTokens, lit(0))
          .otherwise(lit(1)))
      .withColumn("island",
        sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
    islands.groupBy(col(idCol), col("island"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + windowTokens).as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("island")
      .select(col(idCol), col("span_start"), col("span_end"), col("n_windows"))
  }

  /** Documents with every repeated span cut out (conservative
    * cleaning: ALL occurrences drop, not all-but-one — keeper
    * election across documents requires a global ordering the caller
    * may not want; compose with document-level dedup for that).
    * Output: (idCol, textCol cleaned, n_dropped_tokens). The cleaned
    * text is the kept tokens of the lowercased whitespace
    * tokenization re-joined on single spaces (case and run-length of
    * whitespace are already normalized away by detection). Spans
    * arrive per doc as an array (bounded: spans per doc ≤
    * tokens/window); the cut is evaluated row-local — no extra
    * shuffle beyond the detection's own. */
  def stripRepeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 8): DataFrame = {
    val spans = repeatedSpans(docs, idCol, textCol, windowTokens)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    val toks = tokens(col(textCol))
    val keptIdx = filter(
      sequence(lit(0), size(toks) - 1),
      i => !exists(col("__spans"),
        s => i >= s.getField("span_start") && i < s.getField("span_end")))
    docs
      .join(spans, Seq(idCol), "left")
      .select(
        col(idCol),
        when(col("__spans").isNull, concat_ws(" ", toks))
          .otherwise(concat_ws(" ",
            transform(keptIdx, i => element_at(toks, i + 1))))
          .as(textCol),
        coalesce(
          aggregate(col("__spans"), lit(0L),
            (acc, s) => acc +
              (s.getField("span_end") - s.getField("span_start")).cast("long")),
          lit(0L)).as("n_dropped_tokens"))
  }

  /** (idCol, pos, whash) — every rolling window's 64-bit content hash
    * JOINED to the corpus-wide duplicated-hash set. Exposed for
    * diagnostics/specs. */
  private[dedup] def markedWindows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int): DataFrame = {
    require(windowTokens >= 2, s"windowTokens must be >= 2, got $windowTokens")
    val wins = windowHashes(docs, idCol, textCol, windowTokens)
    val dup = wins.groupBy(col("whash"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select(col("whash"))
    wins.join(dup, Seq("whash"), "left_semi")
  }

  private def tokens(text: Column): Column =
    TextFunctions.wsTokens(lower(text))

  /** One row per rolling window: (idCol, pos, whash). Narrow until the
    * posexplode; only (id, int, long) rows ever shuffle. */
  private[graft] def windowHashes(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int): DataFrame =
    // tokenize+hash+explode collapse into the scan stage: floor its
    // parallelism (see Spread — a 1-row-group corpus would hash every
    // window in one task)
    graft.operators.Spread.ensureMinPartitions(docs)
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      // sequence(0, n) runs DESCENDING when n < 0 — docs shorter than
      // one window have no windows and must not reach the sequence
      .filter(size(col("__t")) >= windowTokens)
      .select(col(idCol),
        posexplode(
          transform(
            sequence(lit(0), size(col("__t")) - windowTokens),
            // single-space join: tokens are whitespace-split so the
            // separator cannot occur inside one -- "ab c" vs "a bc"
            // must hash differently (an empty join would conflate them)
            i => xxhash64(concat_ws(" ",
              slice(col("__t"), i + 1, lit(windowTokens))))))
          .as(Seq("pos", "whash")))
}
