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
    val spark = events.sparkSession
    // checkpoint FIRST: the routing histogram, the driver collect, the
    // hot-window guard and both self-join sides all read presence — on
    // the distributed fall-through the events-scan+distinct plan would
    // otherwise re-execute inside each of them (guide §5: cut lineage
    // once where an intermediate is reused)
    val presence = events
      .select(floor(unix_timestamp(col(tsCol)) / windowSec).as("w"),
        col(actorCol).as("actor"))
      .distinct()
      .localCheckpoint()

    // Route decision from the per-window histogram (one scalar agg):
    // when the guarded candidate count Σ n·(n−1)/2 and the presence
    // row count are both driver-bounded, resolve the pairing on the
    // driver — a small behavioral graph otherwise pays ~6 full-width
    // shuffle stages for integer counting that fits in one core's L2.
    // The bound is conf'd; corpus-scale inputs fall through to the
    // distributed self-join unchanged. (The ConnectedComponents
    // driverMaxEdges / Truss driver-peel precedent.)
    val maxCand = spark.conf.getOption(DriverMaxCandidatesKey)
      .map(_.toLong).getOrElse(8L * 1024 * 1024)
    if (presence.schema("actor").dataType ==
        org.apache.spark.sql.types.LongType) {
      // doubles for the gate math only (an extreme histogram must not
      // ANSI-overflow the decision that would have routed it away)
      val st = presence.groupBy(col("w")).agg(count(lit(1)).as("n"))
        .agg(
          sum(when(col("n") <= maxWindowActors,
            col("n").cast("double") * (col("n") - 1) / 2.0)
            .otherwise(0.0)).as("cand"),
          sum(col("n").cast("double")).as("rows"))
        .collect()(0)
      val cand = if (st.isNullAt(0)) 0.0 else st.getDouble(0)
      val nRows = if (st.isNullAt(1)) 0.0 else st.getDouble(1)
      if (cand <= maxCand.toDouble && nRows <= maxCand.toDouble)
        return driverPairs(spark, presence, minShared, maxWindowActors)
    }

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

  /** Conf key bounding [[pairs]]'s driver route (max guarded candidate
    * pairs AND max presence rows collected). */
  val DriverMaxCandidatesKey = "spark.graft.copresence.driverMaxCandidates"

  /** Driver-resolved pairing: collect the (window, actor) presence,
    * count shared windows per (ua < ub) pair in one hash pass. Hot
    * windows (> maxWindowActors) contribute no pairs — the same guard
    * as the distributed route, applied after the collect. Integer
    * counting: bit-identical to the self-join + count aggregate. */
  private def driverPairs(
      spark: org.apache.spark.sql.SparkSession,
      presence: DataFrame,
      minShared: Int,
      maxWindowActors: Int): DataFrame = {
    val rows = presence.collect()
    val byWindow = new scala.collection.mutable.HashMap[Long,
      scala.collection.mutable.ArrayBuffer[Long]]()
    rows.foreach { r =>
      byWindow.getOrElseUpdate(r.getLong(0),
        new scala.collection.mutable.ArrayBuffer[Long]()) += r.getLong(1)
    }
    val counts = new scala.collection.mutable.HashMap[(Long, Long), Long]()
    byWindow.valuesIterator.foreach { acts =>
      if (acts.length <= maxWindowActors) {
        val sorted = acts.sorted
        var i = 0
        while (i < sorted.length) {
          var j = i + 1
          while (j < sorted.length) {
            val k = (sorted(i), sorted(j))
            counts.update(k, counts.getOrElse(k, 0L) + 1L)
            j += 1
          }
          i += 1
        }
      }
    }
    val out = counts.iterator
      .filter(_._2 >= minShared)
      .map { case ((a, b), n) => org.apache.spark.sql.Row(a, b, n) }
      .toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, math.max(1, out.size / 1000000 + 1)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ua",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("ub",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("shared",
          org.apache.spark.sql.types.LongType, nullable = false))))
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
