package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transforms over the events schema (event_id, ts, user_id,
  * event_type, value, props) — watermarked windowed aggregates,
  * session windows, and custom keyed state via flatMapGroupsWithState.
  *
  * Each takes/returns DataFrames so the identical dataflow runs in
  * batch (tested against the q90/q91 batch twins) and as a
  * readStream/writeStream pipeline (exercised in StreamingSpec with a
  * file source + memory sink).
  */
object EventStreams {

  /** Tumbling hourly counts/sums per event type, 2h watermark for late
    * data. Output matches q90_tumbling_hourly's schema. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("double")), 4).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("hour_start"),
        col("event_type"), col("n"), col("total_value"))

  /** 30-minute-gap session windows per user (q91's streaming twin). */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n_events"))

  /** Stream-static enrichment join: attach a slowly-changing dimension
    * (user tier, document source metadata, cost-center map …) to every
    * stream row. The static side is planned per micro-batch — Spark
    * broadcasts it into each batch's join, so the stream side never
    * shuffles and no streaming state accrues at all (unlike
    * stream-stream joins there is nothing to watermark: the static
    * side is complete by definition). Re-reading the dim picks up dim
    * updates at micro-batch granularity — the cheap version of SCD
    * handling; inner semantics drop stream rows without a dim match,
    * left semantics keep them with nulls.
    *
    * At 100 TB/day the stream side is the big one; this stays one
    * pass + broadcast as long as the dim is broadcast-sized.
    * Dims beyond that: pre-bucket both sides on the key. */
  def enrichWithDim(
      events: DataFrame,
      dim: DataFrame,
      key: String,
      joinType: String = "inner"): DataFrame =
    events.join(broadcast(dim), Seq(key), joinType)

  /** Streaming exact dedup for a training-data ingest: drop re-deliveries
    * of the same content (or event id) while only keeping per-key state
    * until the watermark passes — the bounded-state form a 100 TB/day
    * stream needs (`dropDuplicates` without a watermark grows state
    * forever). Key is typically a content digest: md5(text) for document
    * streams, event_id for event streams.
    */
  def dedupWithinWatermark(
      stream: DataFrame,
      timeCol: String,
      lateness: String,
      keyCols: Seq[String]): DataFrame =
    stream
      .withWatermark(timeCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Watermarked stream-stream interval join — the streaming twin of
    * q96_interval_join (each view attributed to the same user's click
    * at most `window` earlier). Both sides carry watermarks and the
    * join predicate bounds `vts` inside (cts, cts + window], which is
    * exactly what lets Spark evict both sides' join state as the
    * watermark advances — without the time bound a stream-stream join
    * buffers every row ever seen.
    *
    * Inner join deliberately: outer stream-stream joins emit their
    * null-padded side only after watermark expiry, which a final
    * micro-batch never reaches for the newest rows — the inner form
    * emits matches immediately and loses nothing.
    *
    * Works unchanged on batch DataFrames (watermark is a no-op), so
    * the spec can assert stream output == batch output on the same
    * inputs.
    */
  def clickViewAttribution(
      clicks: DataFrame,
      views: DataFrame,
      lateness: String = "2 hours",
      window: String = "30 minutes"): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user_id"), col("ts").as("cts"),
        col("event_id").as("click_id"))
      .withWatermark("cts", lateness)
    val v = views
      .select(col("user_id"), col("ts").as("vts"), col("event_id").as("view_id"))
      .withWatermark("vts", lateness)
    v.join(c,
        col("user_id") === col("c_user_id") &&
        col("vts") > col("cts") &&
        col("vts") <= col("cts") + expr(s"INTERVAL $window"))
      .select(col("user_id"), col("click_id"), col("view_id"))
  }

  final case class UserEvent(user_id: Long, event_id: Long, tsMicros: Long, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state: running per-user event count + value sum,
    * emitted on every update — the mapGroupsWithState escape hatch for
    * state machines the built-in windows can't express.
    *
    * State is BOUNDED: users idle longer than `idleTimeout` are
    * evicted (processing-time timeout). Without it every user_id ever
    * seen keeps a state entry forever — the same unbounded-state
    * hazard dedupWithinWatermark's doc warns about. */
  def runningUserTotals(
      events: Dataset[UserEvent],
      idleTimeout: String = "30 days"): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
            var n = prev.n_events
            var tot = prev.total_value
            rows.foreach { e => n += 1; tot += e.value }
            val next = UserRunning(userId, n, tot)
            state.update(next)
            state.setTimeoutDuration(idleTimeout)
            Iterator.single(next)
          }
      }
  }
}
