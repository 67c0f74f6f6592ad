package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Distributed multinomial Naive Bayes over word unigrams — the
  * closed-form stand-in for the fastText-style quality / domain
  * classifiers an LLM curation pipeline trains (CCNet's wiki-vs-web
  * filter, source taggers). NB is chosen deliberately: training is
  * ONE aggregation pass (per-class token counts + add-one smoothing),
  * so the "fit" is an ordinary Spark job with no driver-side iteration
  * or parameter server, and every number is exactly reproducible by an
  * ANSI SQL oracle.
  *
  * Dataflow (all relational, zero UDFs, zero collects):
  *  - train: explode unigram tokens (the dedup family's lowercased
  *    whitespace tokenizer) -> groupBy (label, token) count -> join
  *    per-class totals + |V| -> log p(tok|c) = ln((n+1)/(tot_c+|V|)).
  *    The model IS a DataFrame — persistable, joinable, broadcastable.
  *  - predict: per-doc token multiplicities (one keyed shuffle),
  *    restricted to the training vocabulary (sklearn semantics: the
  *    vectorizer is fit on train), cross the |C| classes (tiny
  *    broadcast), left-join token log-probs (AQE broadcasts the model
  *    when it fits, shuffle-hash-joins on token when a 100 TB corpus
  *    vocabulary doesn't), sum cnt*logp per (doc, class), add the
  *    prior, argmax with a deterministic (score desc, label desc)
  *    tie-break so prior-only documents classify identically in every
  *    engine.
  *
  * At scale the cost is explode + two keyed shuffles x |C| classes —
  * |C| is a small constant, so the plan is a constant factor over the
  * token scan; nothing is quadratic and nothing lands on the driver.
  */
object NaiveBayes {

  /** Trained model: `tokenLogProb (token, label, log_prob)` — its
    * distinct tokens are the vocabulary — and `classStats (label,
    * log_prior, log_unseen)` for smoothing tokens unseen in a class. */
  final case class Model(tokenLogProb: DataFrame, classStats: DataFrame) {
    def labels: DataFrame = classStats.select("label")
  }

  /** Per-row (keep..., token) unigrams with multiplicity preserved;
    * empty / whitespace-only texts contribute nothing. */
  private def tokens(df: DataFrame, textCol: String, keep: Column*): DataFrame =
    df.filter(length(trim(col(textCol))) > 0)
      .select(keep :+ explode(TF.wsTokens(lower(col(textCol)))).as("token"): _*)
      .filter(col("token") =!= "")

  /** Sufficient statistics of a labelled corpus: per-(class, token)
    * counts `(label, token, n)` and per-class document counts
    * `(label, docs)`. Counts form a monoid (merge = sum) — the basis
    * of [[NbModelStore]]'s incremental maintenance. */
  def tokenStats(docs: DataFrame, labelCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val toks = tokens(docs, textCol, col(labelCol).as("label"))
    // per-(class, token) counts — THE shuffle of training, keyed by the
    // pair. Materialized ONCE (vocab x |C|-bounded, corpus-independent
    // size): totals, |V|, log-probs and class stats all derive from it,
    // and without the checkpoint each would re-run the corpus explode
    val counts = toks.groupBy(col("label"), col("token")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val priors = docs.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("docs"))
    (counts, priors)
  }

  /** Closed-form model from sufficient statistics — shared by batch
    * [[train]] and the persisted store's [[NbModelStore.model]], so an
    * incrementally-merged store yields the bit-identical model. */
  def modelFromStats(counts: DataFrame, priors: DataFrame): Model = {
    val classTot = counts.groupBy(col("label")).agg(sum(col("n")).as("tot"))
    // |V| (distinct tokens across classes) as a 1-row frame, kept
    // relational so the whole fit is one lazy plan
    val vocabN = counts.select(col("token")).distinct().agg(count(lit(1)).as("v"))
    // classTot LEFT-joined with tot coalesced to 0: a class whose
    // training documents are all empty/whitespace has a priors row but
    // no token counts — an inner join would silently drop it from the
    // model (unpredictable forever) while its doc count still deflates
    // every other class's log_prior. With tot=0 it keeps its prior and
    // smooths every token at log_unseen = ln(1/(0+|V|)).
    val classStats = priors
      .crossJoin(broadcast(priors.agg(sum(col("docs")).as("all_docs"))))
      .join(classTot, Seq("label"), "left")
      .withColumn("tot", coalesce(col("tot"), lit(0L)))
      .crossJoin(broadcast(vocabN))
      .select(col("label"),
        log(col("docs").cast("double") / col("all_docs")).as("log_prior"),
        log(lit(1.0) / (col("tot") + col("v"))).as("log_unseen"))
    val tokenLogProb = counts.join(classTot, "label").crossJoin(broadcast(vocabN))
      .select(col("token"), col("label"),
        log((col("n") + lit(1.0)) / (col("tot") + col("v"))).as("log_prob"))
    Model(tokenLogProb, classStats)
  }

  /** Fit by one aggregation pass over `docs(labelCol, textCol)`. */
  def train(docs: DataFrame, labelCol: String, textCol: String): Model = {
    val (counts, priors) = tokenStats(docs, labelCol, textCol)
    modelFromStats(counts, priors)
  }

  /** Per-document class scores: `(idCol, label, score)`, |C| rows per
    * document. Prior-only for documents with no in-vocabulary token. */
  def scores(model: Model, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val vocab = model.tokenLogProb.select(col("token")).distinct()
    val docToks = tokens(docs, textCol, col(idCol))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("cnt"))
      .join(vocab, "token") // fit-on-train semantics: OOV tokens carry no evidence
    // evidence per (doc, class): cross the class list (broadcast |C|),
    // smooth in-vocab-but-unseen-in-class tokens with log_unseen
    val perClass = docToks
      .crossJoin(broadcast(model.classStats.select(col("label"), col("log_unseen"))))
      .join(model.tokenLogProb, Seq("token", "label"), "left")
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("cnt") * coalesce(col("log_prob"), col("log_unseen"))).as("evidence"))
    // every doc scores every class, prior-only when no evidence row
    docs.select(col(idCol)).distinct()
      .crossJoin(broadcast(model.classStats.select(col("label"), col("log_prior"))))
      .join(perClass, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        (col("log_prior") + coalesce(col("evidence"), lit(0.0))).as("score"))
  }

  /** Argmax prediction `(idCol, predicted, score)` with the
    * deterministic (score desc, label desc) tie-break. */
  def predict(model: Model, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("label").desc)
    scores(model, docs, idCol, textCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("label").as("predicted"), col("score"))
  }

  /** Confusion matrix `(labelCol, predicted, n)` of the model on a
    * labelled holdout — the compact evaluation artifact. */
  def confusion(model: Model, holdout: DataFrame, idCol: String,
      textCol: String, labelCol: String): DataFrame =
    predict(model, holdout, idCol, textCol)
      .join(holdout.select(col(idCol), col(labelCol)), idCol)
      .groupBy(col(labelCol), col("predicted"))
      .agg(count(lit(1)).as("n"))
}
