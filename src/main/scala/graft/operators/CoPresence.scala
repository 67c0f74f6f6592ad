package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-presence graph construction from an event stream: users (or any
  * actor column) active in the same time window become edge
  * candidates; edge weight = number of shared windows. The standard
  * events-to-graph bridge (collusion/abuse detection, recommendation
  * neighborhoods) — downstream the graph family (LPA communities,
  * k-core, triangles) applies as-is.
  *
  * Shape is the LSH-bucket discipline, deliberately: presence is
  * DISTINCT (window, actor) — one row per actor per window however
  * many events they emit — and candidates come from a per-window
  * self-join, so cost is Σ per-window-actors², never all actor pairs.
  * A hot window (a flash event where "everyone" is present) is the
  * exact analogue of a degenerate LSH bucket: `maxWindowActors` drops
  * such windows from PAIRING (documented skew cut, same contract as
  * MinHashLSH.maxBucketSize) — they carry no pairwise signal and
  * would otherwise dominate the shuffle quadratically.
  */
object CoPresence {

  /** Weighted co-presence edges `(ua, ub, shared)` with ua < ub,
    * `shared >= minShared`. `windowSec` buckets event time by
    * `floor(epoch_seconds / windowSec)` (floor-of-floor equals the
    * direct bucket for positive epochs, so second-truncated and
    * fractional-second engines agree). */
  def pairs(
      events: DataFrame,
      actorCol: String,
      tsCol: String,
      windowSec: Int,
      minShared: Int = 1,
      maxWindowActors: Int = 10000): DataFrame = {
    require(windowSec > 0 && minShared >= 1 && maxWindowActors >= 2)
    val presence = events
      .select(floor(unix_timestamp(col(tsCol)) / windowSec).as("w"),
        col(actorCol).as("actor"))
      .distinct()
      .localCheckpoint() // both join sides + the guard read it
    val hot = presence.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxWindowActors)
      .select(col("w"))
    val kept = presence.join(broadcast(hot), Seq("w"), "left_anti")
    kept.as("a").join(kept.as("b"),
        col("a.w") === col("b.w") && col("a.actor") < col("b.actor"))
      .groupBy(col("a.actor").as("ua"), col("b.actor").as("ub"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** The windows [[pairs]] GUARD-DROPS for this event set — (w) rows
    * with more than `maxWindowActors` distinct actors. Exposed so a
    * persisted counts state ([[CoPresenceStore]]) can RECORD which
    * windows carried no pairwise signal: an actor takedown cannot
    * un-suppress such a window from bounded state (the suppressed
    * pairs were never counted), so the store fails loud instead of
    * serving silently-incomplete counts. */
  def hotWindows(
      events: DataFrame,
      actorCol: String,
      tsCol: String,
      windowSec: Int,
      maxWindowActors: Int): DataFrame =
    events
      .select(floor(unix_timestamp(col(tsCol)) / windowSec).as("w"),
        col(actorCol).as("actor"))
      .distinct()
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxWindowActors)
      .select(col("w"))
}
