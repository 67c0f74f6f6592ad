package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD type-2 history merge -- versioned row history with validity
  * intervals, the warehouse-standard way to keep every past state of
  * a dimension (or of per-document metadata in a corpus store)
  * queryable: each key carries rows `(payload..., valid_from,
  * valid_to)` where `valid_to IS NULL` marks the currently-open
  * state.
  *
  * `merge(history, snapshot, version)` folds a new full snapshot in:
  *
  *  - open row whose payload equals the snapshot's -> stays open
  *    (no churn rows for unchanged keys);
  *  - open row whose payload differs -> closed at `version`, and a
  *    new open row with the snapshot payload starts at `version`;
  *  - open row whose key left the snapshot -> closed at `version`
  *    (deletion is a closed interval, not a lost row);
  *  - snapshot key with no open row -> new open row at `version`;
  *  - already-closed rows pass through untouched.
  *
  * Scale shape: closed history never joins anything (a partition-
  * prunable `valid_to IS NOT NULL` passthrough); the open slice
  * full-outer joins the snapshot on the key -- ONE shuffle keyed on
  * the id, payload carried once per side, change detection on
  * md5 digests computed in the scan (same identity rules as
  * [[SnapshotDiff]]). Idempotent: re-merging the same snapshot at
  * the same version is a no-op.
  */
object Scd2 {

  private def digest(payloadCols: Seq[String]) =
    md5(concat_ws("", payloadCols.map(c =>
      when(col(c).isNull, lit("~")).otherwise(md5(col(c).cast("string")))): _*))

  /** Open a fresh history from an initial snapshot at `version`:
    * every row open, `valid_from = version`. */
  def init(snapshot: DataFrame, version: Long): DataFrame =
    snapshot
      .withColumn("valid_from", lit(version))
      .withColumn("valid_to", lit(null).cast("long"))

  /** Fold `snapshot` (the complete state at `version`) into
    * `history` (a frame produced by [[init]]/[[merge]]: snapshot
    * columns + `valid_from`/`valid_to`). */
  def merge(
      history: DataFrame,
      snapshot: DataFrame,
      idCol: String,
      payloadCols: Seq[String],
      version: Long): DataFrame = {
    require(payloadCols.nonEmpty, "scd2 merge needs at least one payload column")
    val closed = history.filter(col("valid_to").isNotNull)
    val open = history.filter(col("valid_to").isNull)

    val snapCols = snapshot.columns.toSeq
    val o = open.select(
      (col(idCol).as("__id") +: col("valid_from").as("__vf") +:
        snapCols.filterNot(_ == idCol).map(c => col(c).as(s"__o_$c"))) :+
        digest(payloadCols).as("__od"): _*)
    val s = snapshot.select(
      (col(idCol).as("__sid") +:
        snapCols.filterNot(_ == idCol).map(c => col(c).as(s"__s_$c"))) :+
        digest(payloadCols).as("__sd"): _*)
    val j = o.join(s, col("__id") === col("__sid"), "full_outer")

    // open rows surviving this merge:
    //  - unchanged keys keep their original valid_from,
    //  - changed/new keys start at `version` with the snapshot payload
    val stillOpen = j.filter(col("__sid").isNotNull && col("__od") === col("__sd"))
      .select((col("__id").as(idCol) +:
        snapCols.filterNot(_ == idCol).map(c => col(s"__o_$c").as(c))) ++
        Seq(col("__vf").as("valid_from"), lit(null).cast("long").as("valid_to")): _*)
    val newOpen = j.filter(col("__id").isNull ||
        (col("__sid").isNotNull && col("__od") =!= col("__sd")))
      .select((col("__sid").as(idCol) +:
        snapCols.filterNot(_ == idCol).map(c => col(s"__s_$c").as(c))) ++
        Seq(lit(version).as("valid_from"), lit(null).cast("long").as("valid_to")): _*)
    // rows closed by this merge: payload changed or key deleted
    val nowClosed = j.filter(col("__id").isNotNull &&
        (col("__sid").isNull || col("__od") =!= col("__sd")))
      .select((col("__id").as(idCol) +:
        snapCols.filterNot(_ == idCol).map(c => col(s"__o_$c").as(c))) ++
        Seq(col("__vf").as("valid_from"), lit(version).as("valid_to")): _*)

    closed.select(stillOpen.columns.map(col): _*)
      .unionByName(nowClosed)
      .unionByName(stillOpen)
      .unionByName(newOpen)
  }

  /** The state of a history frame as of `version` (time travel):
    * rows whose interval covers it. */
  def asOf(history: DataFrame, version: Long): DataFrame =
    history.filter(col("valid_from") <= version &&
      (col("valid_to").isNull || col("valid_to") > version))
      .drop("valid_from", "valid_to")
}
