package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.operators.BloomPrune

/** Train/eval decontamination — the overlap screen an LLM corpus runs
  * against its benchmark suites before training (the GPT-3 appendix-C
  * / Dolma shape): per training document, the fraction of its distinct
  * word n-gram shingles that appear anywhere in the eval corpus; docs
  * above a threshold are quarantined as contaminated.
  *
  * Two routes over the same report schema
  * `(id, n_shingles, n_hits, overlap_frac, contaminated)`:
  *
  *  - [[overlapReport]] — EXACT. Training shingles semi-join the eval
  *    shingle set. The semi-join rides [[BloomPrune.semiJoin]]: the
  *    eval set folds into one broadcast-class bloom sketch that drops
  *    non-matching shingles AT THE SCAN, so the only rows that reach
  *    the exact join (and its shuffle) are probable hits — on a clean
  *    100 TB corpus, a few percent. False positives die in the exact
  *    join; the output is exactly the naive semi-join's.
  *  - [[bloomOverlapReport]] — bloom-ONLY. No exact join at all: hits
  *    are counted straight off the membership test, so the training
  *    side never shuffles text or shingles — its one shuffle carries
  *    `(id, hit-count)` pairs. Overlap fractions are inflated by the
  *    false-positive rate (never deflated: blooms have no false
  *    negatives), so its flag set is a SUPERSET of the exact route's
  *    — the screening semantics (route flagged docs to exact review)
  *    at full-corpus scale.
  *
  * The eval side is assumed orders of magnitude smaller than the
  * training side (benchmarks vs corpus) — the sketch aggregate and
  * the keys-only exact join are both sized by IT, never by the corpus.
  */
object Decontamination {

  /** Exact per-document eval-overlap report. Shingling matches the
    * dedup family (`TF.wordShingles`: lowercased, distinct,
    * whole-text fallback below n words). Documents with zero shingles
    * cannot occur (the fallback emits one), so the ratio is total. */
  def overlapReport(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      tau: Double,
      expectedEvalShingles: Long = 1000000L): DataFrame = {
    val trPost = train.select(col(idCol),
      explode(TF.wordShingles(col(textCol), shingleN)).as("s"))
    val evPost = eval
      .select(explode(TF.wordShingles(col(textCol), shingleN)).as("s"))
      .distinct()
    // per-doc total = array size (wordShingles is distinct with a
    // non-empty fallback, so |array| == the exploded row count): one
    // projection instead of a second corpus-wide explode + shuffle agg
    val tot = train.select(col(idCol),
      size(TF.wordShingles(col(textCol), shingleN)).cast("long").as("n_shingles"))
    val hits = BloomPrune
      .semiJoin(trPost, evPost, "s", "s", expectedEvalShingles)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    report(tot, hits, idCol, tau)
  }

  /** Bloom-only screening report: same schema, overlap counted from
    * the membership test alone (superset flags, inflation <= fpp). */
  def bloomOverlapReport(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      tau: Double,
      expectedEvalShingles: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val trPost = train.select(col(idCol),
      explode(TF.wordShingles(col(textCol), shingleN)).as("s"))
    val evPost = eval
      .select(explode(TF.wordShingles(col(textCol), shingleN)).as("s"))
      .distinct()
    // same dead-explode elimination as [[overlapReport]]
    val tot = train.select(col(idCol),
      size(TF.wordShingles(col(textCol), shingleN)).cast("long").as("n_shingles"))
    val hits = BloomPrune
      .prune(trPost, "s", evPost, "s", expectedEvalShingles, fpp)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    report(tot, hits, idCol, tau)
  }

  /** Decontamination served from a PERSISTED hashed-shingle frame —
    * [[LshStore]]'s `shingles` table, one `(__id, __sh)` row per doc
    * with the doc's distinct chain hashes: both the train and the
    * eval side read stored 64-bit hashes, so the screen runs with
    * ZERO corpus tokenization (the exact route's two corpus-wide
    * shingle explodes were its dominant cost). Chain-hash equality ≡
    * raw-shingle equality modulo 64-bit collisions
    * ([[ShingleHashes]]'s injectivity argument), so this is the
    * rows-only twin of [[overlapReport]]; DecontaminationSpec pins
    * column-for-column equality on the harness corpus. Same
    * bloom-pruned semi-join shape: the eval hash set folds into one
    * broadcast sketch, the training side shuffles (id, hit) pairs. */
  def overlapReportFromHashes(
      shingleRows: DataFrame,
      isEval: Column => Column,
      idAlias: String,
      tau: Double,
      expectedEvalShingles: Long = 1000000L): DataFrame = {
    val post = shingleRows
      .select(col("__id").as(idAlias), explode(col("__sh")).as("__h"))
    val ev = post.filter(isEval(col(idAlias))).select(col("__h")).distinct()
    val tr = post.filter(!isEval(col(idAlias)))
    // per-doc total = |__sh| (stored distinct hashes): a projection of
    // the un-exploded rows, not a re-explode + shuffle agg
    val tot = shingleRows.filter(!isEval(col("__id")))
      .select(col("__id").as(idAlias),
        size(col("__sh")).cast("long").as("n_shingles"))
    val hits = BloomPrune.semiJoin(tr, ev, "__h", "__h", expectedEvalShingles)
      .groupBy(col(idAlias)).agg(count(lit(1)).as("n_hits"))
    report(tot, hits, idAlias, tau)
  }

  private def report(
      tot: DataFrame, hits: DataFrame, idCol: String, tau: Double): DataFrame =
    tot.join(hits, Seq(idCol), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("__frac",
        col("n_hits").cast("double") / col("n_shingles").cast("double"))
      .select(col(idCol), col("n_shingles"), col("n_hits"),
        round(col("__frac"), 6).as("overlap_frac"),
        when(col("__frac") >= tau, 1).otherwise(0).as("contaminated"))
}
