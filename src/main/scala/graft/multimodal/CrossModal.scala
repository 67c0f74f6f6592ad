package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** Cross-modal consistency and retrieval over PAIRED modality
  * embeddings — the screening/diagnostic layer a multimodal training
  * pipeline runs between decode ([[MediaOps]]) and selection: does
  * each item's image/audio embedding agree with its caption
  * embedding (CLIP-style alignment), and does image→caption retrieval
  * find the item's own caption (the recall@k diagnostic behind
  * contrastive-pair curation)?
  *
  * Scale shape: consistency is a per-row zip of two embedding columns
  * (one scan, codegen'd [[graft.functions.DotProduct]] kernels, no
  * shuffle but the report rollup); retrieval at corpus scale routes
  * the caption side through the existing ANN serving stores
  * (SrpStore/GraphAnn/IvfStore) — this file adds only the REPORT
  * semantics over a served top-k frame, never an all-pairs step.
  * (Reference scope: nvd2mysqlloader has no media surface — mandated
  * multimodal extension set; q95/q134 siblings.)
  */
object CrossModal {

  /** Per-item cross-modal consistency: `(idCol, kindCol, consistency)`
    * where consistency = cosine(embA, embB) — null when either
    * modality embedding has zero norm (unservable, the ANN-family
    * convention). */
  def consistency(
      paired: DataFrame,
      idCol: String,
      kindCol: String,
      embACol: String,
      embBCol: String): DataFrame =
    paired.select(col(idCol), col(kindCol),
      VF.cosineWithNorms(
        VF.dot(col(embACol), col(embBCol)),
        VF.l2Norm(col(embACol)), VF.l2Norm(col(embBCol))).as("consistency"))

  /** Per-kind alignment report — the curation screen: item count,
    * mean/min consistency (6dp, rounded once after the aggregate),
    * and how many items fall below `tau` (the candidates a curation
    * pass would drop or re-caption). One rollup over the
    * [[consistency]] frame. */
  def consistencyReport(
      paired: DataFrame,
      idCol: String,
      kindCol: String,
      embACol: String,
      embBCol: String,
      tau: Double): DataFrame =
    consistency(paired, idCol, kindCol, embACol, embBCol)
      .groupBy(col(kindCol))
      .agg(count(lit(1)).as("n_media"),
        round(avg(col("consistency")), 6).as("mean_consistency"),
        round(min(col("consistency")), 6).as("min_consistency"),
        sum(when(col("consistency") < tau, 1L).otherwise(0L)).as("n_below_tau"))

  /** Own-match annotation over a SERVED retrieval top-k frame
    * (`query_id, neighbor_id, cos, rnk` — the shared serving-store
    * output contract): flags the rows where retrieval returned the
    * query's own counterpart, the per-row form of recall@k. Pure
    * column add — the serving store did the heavy lifting. */
  def ownMatch(topK: DataFrame): DataFrame =
    topK.withColumn("own_match", col("neighbor_id") === col("query_id"))

  /** Recall@k summary of a served top-k frame: the fraction of
    * queries whose own counterpart appears within rank k — ONE number
    * the pipeline gates on. */
  def recallAtK(topK: DataFrame, k: Int): DataFrame =
    ownMatch(topK)
      .groupBy(col("query_id"))
      .agg(max(when(col("own_match") && col("rnk") <= k, 1L).otherwise(0L))
        .as("__hit"))
      .agg(count(lit(1)).as("n_queries"),
        round(avg(col("__hit")), 6).as("recall_at_k"))
}
