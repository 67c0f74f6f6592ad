package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): embedding-similarity pairs are edges, connected
  * components are semantic duplicate groups, and exactly ONE
  * representative per group survives — deterministically the smallest
  * id, so reruns and engines agree.
  *
  * Scale shape: the pair graph comes from whatever candidate generator
  * fits the corpus (exact cosine pairs for oracle checks, SRP-LSH /
  * ANN buckets at 100 TB — never all-pairs), and components solve via
  * the adaptive CC (bounded driver union-find below the conf'd edge
  * bound, distributed propagation above). The corpus-side join is a
  * left join against a components frame that is duplicate-GROUP sized,
  * not corpus sized.
  */
object SemanticDedup {

  /** Annotate every corpus row with its semantic-duplicate keeper:
    * output = corpus `idCol` + `keeper` (the component minimum, or the
    * row's own id when it is in no pair) + `kept` (id == keeper).
    * Filter `kept` to materialize the deduplicated corpus; keep the
    * full frame for attrition reporting. */
  def keepers(
      corpus: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val comp = ConnectedComponents.runAdaptive(pairs, aCol, bCol)
      .select(col("member").as(idCol), col("cluster_root"))
    corpus.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_root"), col(idCol)).as("keeper"))
      .withColumn("kept", col(idCol) === col("keeper"))
  }

  /** Keeper election with a QUALITY prior: within each duplicate
    * component the keeper is the highest-`priorityCol` member
    * (smallest id on ties), not the smallest id — what a curation
    * pipeline actually wants when near-duplicates differ in quality
    * score, length, or source trust. `priorityCol` may be any
    * orderable type (numeric, string); components whose members are
    * all null-priority fall back to the smallest id (null-safe
    * compare). Same output contract as [[keepers]]:
    * (idCol, keeper, kept). Cost: the same component build plus two
    * component-keyed aggregations — no new shuffle shape. */
  def keepersBy(
      corpus: DataFrame,
      idCol: String,
      priorityCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val comp = ConnectedComponents.runAdaptive(pairs, aCol, bCol)
      .select(col("member").as(idCol), col("cluster_root"))
    val labeled = corpus.select(col(idCol), col(priorityCol))
      .join(comp, Seq(idCol), "left")
      .withColumn("__comp", coalesce(col("cluster_root"), col(idCol)))
    val best = labeled.groupBy(col("__comp"))
      .agg(max(col(priorityCol)).as("__bp"))
    val keeperPerComp = labeled.join(best, Seq("__comp"))
      // null-safe: an all-null-priority component still elects min id
      .filter(col(priorityCol) <=> col("__bp"))
      .groupBy(col("__comp")).agg(min(col(idCol)).as("keeper"))
    labeled.join(keeperPerComp, Seq("__comp"))
      .select(col(idCol), col("keeper"),
        (col(idCol) === col("keeper")).as("kept"))
  }
}
