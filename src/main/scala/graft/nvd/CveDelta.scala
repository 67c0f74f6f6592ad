package graft.nvd

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot delta report: classify every CVE across two flattened-feed
  * snapshots as added / removed / modified / unchanged, with the
  * changed columns named per row — the item-level form of the
  * reference's freshness question (its meta-file sha diff,
  * nvd2mysqlloader.py:399-417, answers "did the FEED change"; this
  * answers "which CVEs changed, and in what field").
  *
  * Scale shape: one full-outer join shuffled on the key; the change
  * classification is row-local null-safe comparisons (`<=>`), so the
  * whole report is a single exchange per side regardless of how many
  * columns are compared.
  */
object CveDelta {

  /** (key, status, changed_fields) for every key in either snapshot.
    * `changed_fields` is empty for added/removed/unchanged rows and
    * names the differing `compareCols` for modified rows. */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      key: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one column to compare")
    val o = oldSnap.select((key +: compareCols).map(c => col(c).as("o_" + c)): _*)
    val n = newSnap.select((key +: compareCols).map(c => col(c).as("n_" + c)): _*)
    val joined = o.join(n, col("o_" + key) === col("n_" + key), "full_outer")
    val changedFields = filter(
      array(compareCols.map(c =>
        when(!(col("o_" + c) <=> col("n_" + c)), lit(c))): _*),
      x => x.isNotNull)
    joined.select(
      coalesce(col("o_" + key), col("n_" + key)).as(key),
      when(col("o_" + key).isNull, "added")
        .when(col("n_" + key).isNull, "removed")
        .when(size(changedFields) > 0, "modified")
        .otherwise("unchanged").as("status"),
      // one-sided rows compare a value against nothing — force empty
      // rather than reporting every column "changed"
      when(col("o_" + key).isNotNull && col("n_" + key).isNotNull, changedFields)
        .otherwise(array().cast("array<string>")).as("changed_fields"))
  }
}
