package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Digest-level diff of two keyed corpus snapshots -- the change
  * audit a versioned 100 TB datastore runs between releases ("what
  * did this regen touch?") and the input to incremental downstream
  * rebuilds (only `added`/`changed` keys need re-deriving; `removed`
  * keys need tombstoning).
  *
  * Scale shape: each side reduces to `(key, 16-byte digest)` IN THE
  * SCAN, so the one full-outer shuffle moves fixed-width rows, never
  * payloads -- the diff costs two scans plus a join on the key,
  * regardless of document size. Status is decided row-locally after
  * the join.
  */
object SnapshotDiff {

  /** Per-key status frame `(idCol, status)` with status one of
    * `added` (in `after` only), `removed` (in `before` only),
    * `changed` (both, digest differs), `unchanged`.
    *
    * Content identity is the tuple of `payloadCols`: each column
    * hashes to a fixed-width md5 token (so values cannot collide
    * across column boundaries), NULL maps to a non-hex sentinel
    * distinct from every hash, and the digest is the md5 of the
    * token concatenation.
    */
  def diff(
      before: DataFrame,
      after: DataFrame,
      idCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "snapshot diff needs at least one payload column")
    def digested(df: DataFrame, out: String) = df.select(
      col(idCol),
      md5(concat_ws("", payloadCols.map(c =>
        when(col(c).isNull, lit("~")).otherwise(md5(col(c).cast("string")))): _*))
        .as(out))
    digested(before, "__da")
      .join(digested(after, "__db"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__da").isNull, "added")
          .when(col("__db").isNull, "removed")
          .when(col("__da") === col("__db"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** One-row-per-status counts of [[diff]]. */
  def summary(
      before: DataFrame,
      after: DataFrame,
      idCol: String,
      payloadCols: Seq[String]): DataFrame =
    diff(before, after, idCol, payloadCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
