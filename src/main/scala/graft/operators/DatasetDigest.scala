package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-invariant content digest of a DataFrame — the integrity
  * check for data movement: a shard export, a format round-trip, or a
  * store rewrite must carry EXACTLY the rows of its source, and
  * comparing two 64-bit digests answers that without sorting or
  * joining either side. (Reference scope: the reference's .meta
  * sha256 checks file bytes; this is the engine-native row-content
  * form — layout-independent where a file hash is layout-bound.)
  *
  * digest = bit_xor over rows of a 60-bit md5-derived row hash.
  * XOR is commutative/associative, so the digest is independent of
  * row order, partitioning, and file layout, and it distributes: the
  * XOR of per-shard digests equals the whole-corpus digest (an empty
  * frame digests to 0, XOR's identity — consistent with
  * "no rows, no content"). One partial+final aggregate, no shuffle
  * beyond the single combine.
  *
  * Caveats (documented trade): XOR cancels DUPLICATE rows in pairs —
  * two sources differing by an even number of copies of the same row
  * collide. Run after exact dedup (or include a uniquifying id in
  * `cols`) when multiplicity matters. Null columns fold as the empty
  * string inside a `|`-separated render; the render escapes the
  * ESCAPE CHARACTER first and then the separator (`\` -> `\\`,
  * `|` -> `\|`) — escaping only the separator would let a trailing
  * backslash forge a field boundary (("\\", "|") and ("|\\", "")
  * would render identically).
  */
object DatasetDigest {

  /** Single definition of the 60-bit row hash (md5-prefix BIGINT —
    * the repo's portable-hash pattern) over the `|`-joined escaped
    * render of `cols`; literal `replace` (not regex) on both engines.
    */
  private def rowHashSql(cols: Seq[String]): String = {
    // identifier quoting must escape embedded backticks, or a column
    // literally named with ` breaks out of the quoted identifier
    val rendered = cols.map(_.replace("`", "``")).map(c =>
      s"replace(replace(coalesce(cast(`$c` AS string), ''), '\\\\', '\\\\\\\\'), '|', '\\\\|')")
    s"cast(conv(substring(md5(concat_ws('|', ${rendered.mkString(", ")})), 1, 15), 16, 10) AS long)"
  }

  /** The order/layout-invariant digest of `df` over `cols` (all
    * columns if empty). Returns a single long (0 for an empty frame).
    */
  def digest(df: DataFrame, cols: Seq[String] = Seq.empty): Long = {
    val use = if (cols.nonEmpty) cols else df.columns.toSeq
    df.agg(coalesce(
      expr(s"bit_xor(${rowHashSql(use)})"), lit(0L)).as("d"))
      .first().getLong(0)
  }

  /** Per-group digests as a DataFrame (group cols + `digest`). */
  def digestBy(df: DataFrame, groupCols: Seq[String], cols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"bit_xor(${rowHashSql(cols)})").as("digest"))
}
