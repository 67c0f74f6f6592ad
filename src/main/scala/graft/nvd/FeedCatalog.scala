package graft.nvd

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feed enumeration + `.meta` sidecar parsing + the incremental
  * freshness gate — the control-plane of the reference pipeline
  * (nvd2mysqlloader.py:46-99, 126-165) re-expressed set-based.
  */
object FeedCatalog {

  /** One NVD feed: logical name, rank for last-write-wins ordering. The
    * reference processes years ascending then `modified` then `recent`
    * (nvd2mysqlloader.py:154-158) and later feeds REPLACE earlier rows;
    * we carry that order as an explicit column instead of relying on
    * execution order (SURVEY T3/W1).
    */
  final case class Feed(modifier: String, rank: Int)

  /** Feeds for a full (`-a`) load: 2002..thisYear then modified, recent. */
  def fullLoad(thisYear: Int): Seq[Feed] = {
    val years = (2002 to thisYear).map(_.toString)
    (years ++ Seq("modified", "recent")).zipWithIndex.map { case (m, i) => Feed(m, i) }
  }

  /** Feeds for the default incremental refresh. */
  def incremental: Seq[Feed] =
    Seq(Feed("modified", 0), Feed("recent", 1))

  /** URL / filename templating (reference :151,163,519-520): replace
    * the literal token "year" in the template with the modifier. */
  def expand(template: String, modifier: String): String =
    template.replace("year", modifier)

  /** Parse a `.meta` sidecar (5 CRLF `key:value` lines) into a Map.
    *
    * The reference parses these with `str.lstrip("<key>:")`, which
    * strips a CHARACTER SET, not a prefix — its own docstring sample
    * sha256 `64310FE...` loses the leading `6`
    * (nvd2mysqlloader.py:56-63, SURVEY F7). We split on the first ':'
    * instead; values may themselves contain ':' (the ISO timestamp),
    * so limit=2.
    */
  def parseMeta(content: String): Map[String, String] =
    content.split("\r?\n").toSeq
      .filter(_.contains(":"))
      .map { line =>
        val Array(k, v) = line.split(":", 2)
        k.trim -> v.trim
      }.toMap

  final case class FeedMeta(
      downloadName: String,
      lastModifiedDate: String,
      size: Long,
      zipSize: Long,
      gzSize: Long,
      sha256: String)

  def toFeedMeta(downloadName: String, content: String): FeedMeta = {
    val m = parseMeta(content)
    FeedMeta(
      downloadName,
      m.getOrElse("lastModifiedDate", ""),
      m.get("size").map(_.toLong).getOrElse(0L),
      m.get("zipSize").map(_.toLong).getOrElse(0L),
      m.get("gzSize").map(_.toLong).getOrElse(0L),
      m.getOrElse("sha256", ""))
  }

  /** Sentinel returned by the reference when a feed has never been
    * loaded (nvd2mysqlloader.py:85-89) — lexicographically below any
    * real NVD timestamp, so everything downloads on first run. */
  val neverLoadedSentinel = "2019-00-01T00:00:00-04:00"

  /** The incremental-freshness gate (SURVEY J2): given upstream metas
    * and the stored `update_history`, return the feeds whose upstream
    * `lastModifiedDate` is strictly newer than the last recorded load.
    *
    * `history` schema: (download_name, lastModifiedDate, downloadedDate, ...).
    * Latest row per feed via max_by (single partial+final agg, no
    * window sort); the comparison is kept as the reference's
    * lexicographic string-compare on ISO-8601+offset strings — correct
    * while the feed publishes a constant UTC offset — with the
    * timestamp-cast comparison available via `strict = false`.
    */
  def staleFeeds(metas: DataFrame, history: DataFrame, strict: Boolean = true): DataFrame = {
    val latest = history
      .groupBy(col("download_name"))
      .agg(max_by(col("lastModifiedDate"), col("downloadedDate")).as("stored_lmd"))
    // strict mode keeps the reference's literal sentinel (month 00 —
    // fine for a string compare); the timestamp mode needs a PARSEABLE
    // epoch-like floor, or never-loaded feeds would throw under ANSI
    // (to_timestamp of month 00) / silently never download without it
    val sentinel = if (strict) neverLoadedSentinel else "1970-01-01T00:00:00-04:00"
    val joined = metas.join(latest, Seq("download_name"), "left")
      .withColumn("stored_lmd", coalesce(col("stored_lmd"), lit(sentinel)))
    val fresh =
      if (strict) col("lastModifiedDate") > col("stored_lmd")
      else to_timestamp(col("lastModifiedDate"), "yyyy-MM-dd'T'HH:mm:ssXXX") >
        to_timestamp(col("stored_lmd"), "yyyy-MM-dd'T'HH:mm:ssXXX")
    joined.filter(fresh).drop("stored_lmd")
  }

  /** update_history provenance rows (reference K3, :439-447). */
  def historyRows(spark: SparkSession, metas: Seq[FeedMeta], downloadedDate: String): DataFrame = {
    import spark.implicits._
    metas.map(m => (m.downloadName, m.lastModifiedDate, downloadedDate,
        m.size, m.zipSize, m.gzSize, m.sha256))
      .toDF("download_name", "lastModifiedDate", "downloadedDate",
        "size", "zipSize", "gzSize", "sha256")
  }
}
