package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023):
  * pick the pool documents whose token distribution looks like a
  * small high-quality TARGET corpus, by importance-weighting each
  * document with the log-likelihood ratio of its unigrams under the
  * target vs the raw pool, then sampling proportionally to the weight.
  *
  * Everything is two aggregation passes plus one scoring join —
  * no iteration, no driver state:
  *
  *  - [[ratioTable]]: token counts of target and pool (one groupBy
  *    each), add-one smoothing over the JOINT vocabulary, one row per
  *    token: `log_ratio = ln p_target(tok) - ln p_pool(tok)`. The
  *    table is vocabulary-sized; AQE broadcasts it when small and
  *    shuffle-hash-joins on token when a 100 TB pool's vocabulary is
  *    not broadcastable.
  *  - [[logWeights]]: per-doc `log_w = sum cnt * log_ratio` — explode,
  *    one keyed shuffle, join, sum. Log space throughout: raw
  *    importance weights exp(log_w) over/underflow double for long
  *    documents, so no exp() is ever taken.
  *  - [[resample]]: Efraimidis–Spirakis / Gumbel top-k with the
  *    repo's deterministic md5-uniform (same construction as the
  *    weighted sampler, q85b): key = ln(-ln u) - log_w, keep the k
  *    smallest. P(selected) is proportional to exp(log_w) and the
  *    draw is reproducible across runs, engines, and partitionings —
  *    the oracle replicates it term for term. Top-k is
  *    TakeOrderedAndProject: per-partition heads + driver merge of k
  *    rows, never a global sort.
  *
  * [[hashedRatioTable]] is the paper's actual scale trick: features
  *  are token hash BUCKETS, so the ratio table has a FIXED width (2^b
  *  rows) no matter how large the corpus vocabulary grows — always
  *  broadcastable, and collisions only blur weights (quality), never
  *  correctness. Spark's xxhash64 has no DuckDB equivalent, so the
  *  hashed route is contract-checked (rank agreement with the exact
  *  route) rather than oracle-hashed.
  */
object Dsir {

  /** (id-ish keep cols..., token, cnt) unigram multiplicities. */
  private def tokenCounts(df: DataFrame, textCol: String, keep: Column*): DataFrame =
    df.filter(length(trim(col(textCol))) > 0)
      .select(keep :+ explode(TF.wsTokens(lower(col(textCol)))).as("token"): _*)
      .filter(col("token") =!= "")
      .groupBy(keep :+ col("token"): _*)
      .agg(count(lit(1)).as("cnt"))

  private[ml] def corpusCounts(df: DataFrame, textCol: String, as: String): DataFrame =
    df.filter(length(trim(col(textCol))) > 0)
      .select(explode(TF.wsTokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as(as))

  /** Smoothed per-token log importance ratio over the joint vocabulary:
    * one row per token in target ∪ pool, plus the constants needed to
    * score out-of-vocabulary tokens (`logRatioOov`, attached as a
    * 1-row cross-joinable frame `oov`). */
  final case class Ratio(table: DataFrame, oov: DataFrame)

  /** Shared ratio math over (key, nt, np) count frames: add-one
    * smoothing with |V| = the number of OCCUPIED keys. Using the
    * occupied count (not the raw bucket space) matters for the hashed
    * route: smoothing over 2^bits would add a doc-LENGTH-dependent
    * drift between the exact and hashed weights whenever the bucket
    * space dwarfs the vocabulary (tot_t and tot_p shift by different
    * log factors per token); over occupied keys the two routes agree
    * exactly until collisions actually happen. */
  private[ml] def ratioFromCounts(t: DataFrame, p: DataFrame, keyCol: String): Ratio = {
    // materialized ONCE (vocab-bounded): totals, table and oov all
    // derive from it — without the checkpoint each re-runs both
    // corpus-count aggregations
    val joint = t.join(p, Seq(keyCol), "full_outer")
      .select(col(keyCol).as("token"),
        coalesce(col("nt"), lit(0L)).as("nt"),
        coalesce(col("np"), lit(0L)).as("np"))
      .localCheckpoint()
    val totals = joint.agg(
      sum(col("nt")).as("tot_t"), sum(col("np")).as("tot_p"),
      count(lit(1)).as("v"))
    val table = joint.crossJoin(broadcast(totals))
      .select(col("token"),
        (log((col("nt") + lit(1.0)) / (col("tot_t") + col("v"))) -
          log((col("np") + lit(1.0)) / (col("tot_p") + col("v")))).as("log_ratio"))
    val oov = totals.select(
      (log(lit(1.0) / (col("tot_t") + col("v"))) -
        log(lit(1.0) / (col("tot_p") + col("v")))).as("log_ratio_oov"))
    Ratio(table, oov)
  }

  def ratioTable(target: DataFrame, pool: DataFrame, textCol: String): Ratio =
    ratioFromCounts(
      corpusCounts(target, textCol, "nt"),
      corpusCounts(pool, textCol, "np"), "token")

  /** Fixed-width variant: tokens -> xxhash64 buckets (2^bits). The
    * table never outgrows 2^bits rows — broadcast-safe at any corpus
    * size; collisions only blur weights, and the occupied-bucket
    * smoothing makes the route coincide with [[ratioTable]] when the
    * vocabulary maps injectively. Score with
    * `tokenizer = bucketizer(bits)`. */
  def hashedRatioTable(target: DataFrame, pool: DataFrame, textCol: String,
      bits: Int = 13): Ratio = {
    require(bits >= 1 && bits <= 26, s"bits out of range: $bits")
    def bucketCounts(df: DataFrame, as: String): DataFrame =
      df.filter(length(trim(col(textCol))) > 0)
        .select(explode(TF.wsTokens(lower(col(textCol)))).as("token"))
        .filter(col("token") =!= "")
        .select(bucketizer(bits)(col("token")).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(as))
    ratioFromCounts(bucketCounts(target, "nt"), bucketCounts(pool, "np"), "bucket")
  }

  /** The token->bucket map of the hashed route, for [[logWeights]]'
    * `tokenizer` argument. */
  def bucketizer(bits: Int): Column => Column =
    tok => pmod(xxhash64(tok), lit(1L << bits))

  /** Per-document report `(idCol, n_toks, log_w)` over the pool.
    * `tokenizer` maps the token column to the ratio table's key —
    * identity for the exact route, the bucket hash for the hashed
    * route. */
  def logWeights(pool: DataFrame, idCol: String, textCol: String, ratio: Ratio,
      tokenizer: Column => Column = identity): DataFrame = {
    val docToks = tokenCounts(pool, textCol, col(idCol))
      .select(col(idCol), tokenizer(col("token")).as("token"), col("cnt"))
      .groupBy(col(idCol), col("token")).agg(sum(col("cnt")).as("cnt"))
    val scored = docToks
      .join(ratio.table, Seq("token"), "left")
      .crossJoin(broadcast(ratio.oov))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_toks"),
        sum(col("cnt") * coalesce(col("log_ratio"), col("log_ratio_oov"))).as("log_w"))
    // empty/whitespace-only docs never entered docToks: weight 0
    pool.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("log_w"), lit(0.0)).as("log_w"))
  }

  /** Gumbel top-k importance resample of the pool: k docs, selection
    * probability proportional to exp(log_w), deterministic in `salt`. */
  def resample(pool: DataFrame, idCol: String, textCol: String, ratio: Ratio,
      k: Int, salt: String = ":dsir",
      tokenizer: Column => Column = identity): DataFrame = {
    // md5-uniform in the OPEN interval (0,1): (hv+1)/(2^60+2), so both
    // ln(u) and ln(-ln u) are finite for every possible hash value
    val hv = conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 15), 16, 10)
      .cast("long")
    val u = (hv.cast("double") + 1.0) / lit(1152921504606846978.0) // 2^60 + 2
    logWeights(pool, idCol, textCol, ratio, tokenizer)
      .withColumn("__key", log(-log(u)) - col("log_w"))
      .orderBy(col("__key"), col(idCol))
      .limit(k)
      .drop("__key")
  }
}
