package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Event-stream query surface over `events` (ns-precision parquet):
  * tumbling windows, sessionization, pivot, as-of join — the batch
  * forms of the streaming operators (their Structured Streaming
  * twins are exercised in StreamingSpec; the dataflow is identical,
  * which is the point of Spark's unified batch/stream model).
  *
  * Timestamps never appear raw in outputs: the two engines surface
  * ns-parquet at different precisions, so buckets are emitted as
  * epoch-second longs.
  */
object EventQueries extends QueryDsl {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Shared gapped-timeline scaffold (q35 zero-fill, q132
    * interpolation): the complete hourly timeline x event-type grid
    * left-joined with per-(hour, type) aggregates of `perHour`. The
    * timeline is calendar-bounded (a 1-row min/max aggregate +
    * sequence), never data-bounded; the type dim broadcasts. */
  private def hourlyGrid(c: Ctx): org.apache.spark.sql.DataFrame = {
    import c.t
    val ev = t("events").select(
      expr("unix_micros(ts) div 3600000000").as("hr"), $"event_type", $"value")
    // unused aggregate columns prune away per consumer (q35 keeps n,
    // q132 keeps __avg), so sharing both costs neither query anything
    val cells = ev.groupBy($"hr", $"event_type")
      .agg(count(lit(1)).as("n"), avg($"value".cast("double")).as("__avg"))
    val hours = ev.agg(min($"hr").as("h0"), max($"hr").as("h1"))
      .select(explode(sequence($"h0", $"h1")).as("hr"))
    val types = ev.select($"event_type").distinct()
    hours.crossJoin(broadcast(types))
      .join(cells, Seq("hr", "event_type"), "left")
  }

  /** Paired cross-modal embedding fixture (q244-q246, the q134 move):
    * media embedding = md5(text) bytes / 256 (16-dim), caption
    * embedding = (3·media_byte + md5('cap:'||text) byte) / 1024 —
    * correlated through the shared term, perturbed by the caption
    * hash, every element a dyadic rational so both engines compute
    * EXACT dots. Kind follows the q95 fixture (id mod 3). */
  private def crossModalEmbeddings(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val hi = md5($"text".cast("binary"))
    val hc = md5(concat(lit("cap:"), $"text").cast("binary"))
    def byteAt(h: org.apache.spark.sql.Column, d: Int) =
      conv(substring(h, 2 * d + 1, 2), 16, 10).cast("long").cast("double")
    docs.select(
      $"doc_id".as("media_id"),
      when(pmod($"doc_id", lit(3)) === 0, "image")
        .when(pmod($"doc_id", lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      array((0 until 16).map(d => byteAt(hi, d) / 256.0): _*).as("img_emb"),
      array((0 until 16).map(d =>
        (lit(3.0) * byteAt(hi, d) + byteAt(hc, d)) / 1024.0): _*).as("cap_emb"))
  }

  /** DuckDB twin of [[hourlyGrid]]'s timeline CTEs — `hours(hr)` and
    * `types(event_type)`; queries append their own cell aggregate. */
  private val hourlyGridCtes =
    """bounds AS (
      |  SELECT min(epoch_us(ts) // 3600000000) AS h0,
      |         max(epoch_us(ts) // 3600000000) AS h1 FROM events
      |), hours AS (
      |  SELECT unnest(range(h0, h1 + 1)) AS hr FROM bounds
      |), types AS (SELECT DISTINCT event_type FROM events
      |)""".stripMargin

  def all: Seq[Q] = Seq(

    // Incremental materialized-view maintenance (operators.
    // IncrementalAgg): the daily per-type aggregate is maintained as
    // MERGEABLE partials (cnt/sum/min/max), folding three disjoint
    // deterministic deltas (event_id mod 3 — stands in for arrival
    // batches) pairwise into the running state; derived avg computed
    // at read time. The oracle is the full single-pass recompute —
    // merged-partial state must equal it exactly. At 100 TB the fold
    // scans only each delta; history is never re-read (store-level
    // partition pruning + dynamic overwrite in IncrementalAggSpec).
    q("q34_incremental_mv",
      """SELECT epoch_us(ts) // 86400000000 AS event_day, event_type,
        |  count(value) AS n,
        |  round(sum(value), 4) AS total_value,
        |  round(min(value), 4) AS min_value,
        |  round(max(value), 4) AS max_value
        |FROM events GROUP BY 1, 2""".stripMargin) { c =>
      import c.t
      import graft.operators.IncrementalAgg
      val keys = Seq("event_day", "event_type")
      val ev = t("events").select(
        expr("unix_micros(ts) div 86400000000").as("event_day"),
        $"event_type", $"value", $"event_id")
      val state = (0 until 3)
        .map(i => IncrementalAgg.partials(
          ev.filter(pmod($"event_id", lit(3)) === i).drop("event_id"),
          keys, Seq(IncrementalAgg.Measure("value", col("value")))))
        .reduce((s, p) => IncrementalAgg.merge(s, p, keys))
      // derived metrics (avg = sum/cnt) belong in a SELECT over the
      // MV, never in stored state — and not in a hash-compared output
      // either: the division amplifies the fold's ulp-level sum
      // difference across rounding boundaries
      state.select($"event_day", $"event_type",
        $"cnt_value".as("n"),
        round($"sum_value", 4).as("total_value"),
        round($"min_value", 4).as("min_value"),
        round($"max_value", 4).as("max_value"))
    },

    // Time-series densification (gap fill): the complete hourly
    // timeline x event-type grid with zero-filled silent hours —
    // what downstream anomaly detection / charting needs, and what a
    // plain groupBy can't produce (absent groups yield no row at
    // all). Spark side generates the timeline with sequence()+explode
    // from the min/max bounds (a 1-row control-plane aggregate — the
    // timeline is bounded by calendar length, never by data volume),
    // broadcasts the tiny type dim against it, and left-joins the
    // real hourly counts. DuckDB mirrors it with range()+unnest.
    q("q35_gapfill_hourly",
      s"""WITH $hourlyGridCtes, counts AS (
        |  SELECT epoch_us(ts) // 3600000000 AS hr, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT t.event_type, h.hr * 3600 AS hour_start, coalesce(c.n, 0) AS n
        |FROM hours h CROSS JOIN types t
        |LEFT JOIN counts c ON c.hr = h.hr AND c.event_type = t.event_type""".stripMargin) { c =>
      hourlyGrid(c)
        .select($"event_type", ($"hr" * 3600).as("hour_start"),
          coalesce($"n", lit(0L)).as("n"))
    },

    q("q90_tumbling_hourly",
      """SELECT cast(floor(epoch(ts) / 3600) * 3600 AS bigint) AS hour_start,
        |  event_type, count(*) AS n,
        |  round(sum(cast(value AS double)), 4) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin) { c =>
      import c.t
      // the batch twin of a streaming tumbling-window aggregate
      t("events")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          round(sum($"value".cast("double")), 4).as("total_value"))
        .select(unix_timestamp($"window.start").as("hour_start"),
          $"event_type", $"n", $"total_value")
    },

    // Sliding (hopping) windows: 1h length, 30m hop — every event lands
    // in exactly two windows; the oracle expands both window starts
    // arithmetically.
    q("q90b_sliding_windows",
      """WITH exp AS (
        |  SELECT event_type,
        |    unnest([cast(floor(epoch(ts)/1800)*1800 AS bigint),
        |            cast(floor(epoch(ts)/1800)*1800 - 1800 AS bigint)]) AS win_start
        |  FROM events)
        |SELECT win_start, event_type, count(*) AS n
        |FROM exp GROUP BY 1, 2""".stripMargin) { c =>
      import c.t
      t("events")
        .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp($"window.start").as("win_start"), $"event_type", $"n")
    },

    q("q91_sessionization",
      """WITH flagged AS (
        |  SELECT user_id,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
        |         WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |)
        |SELECT user_id, cast(sum(new_session) AS bigint) AS n_sessions, count(*) AS n_events
        |FROM flagged GROUP BY user_id""".stripMargin) { c =>
      import c.t
      // session_window: dynamic-gap windows, the batch twin of
      // streaming state timeouts (SURVEY §2.9 extension)
      t("events")
        .groupBy($"user_id", session_window($"ts", "30 minutes"))
        .agg(count(lit(1)).as("ev"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"), sum($"ev").as("n_events"))
    },

    q("q92_pivot_event_types",
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events WHERE user_id <= 50 GROUP BY user_id""".stripMargin) { c =>
      import c.t
      t("events").filter($"user_id" <= 50)
        .groupBy($"user_id")
        .pivot("event_type", eventTypes)
        .count()
        .na.fill(0, eventTypes)
    },

    q("q93_asof_join",
      """SELECT a.event_id, a.user_id, b.event_id AS click_id,
        |  round(cast(b.value AS double), 4) AS click_value
        |FROM (SELECT *, epoch_us(ts) AS tus FROM events WHERE event_type = 'purchase') a
        |ASOF LEFT JOIN (SELECT *, epoch_us(ts) AS tus FROM events WHERE event_type = 'click') b
        |  ON a.user_id = b.user_id AND b.tus <= a.tus""".stripMargin) { c =>
      import c.t
      val ev = t("events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("cts"), $"event_id".as("click_id"),
          $"value".cast("double").as("click_value"))
      // native custom-operator route (AsOfJoinPlan -> AsOfJoinExec
      // streaming merge); the composed union+window form is
      // AsOfJoin.asofBackward, equivalence asserted in AsOfJoinSpec
      AsOfJoin.asofBackwardExec(purchases, clicks,
          keyCols = Seq("user_id"), leftTimeCol = "ts", rightTimeCol = "cts",
          rightValueCols = Seq("click_id", "click_value"))
        .select($"event_id", $"user_id", $"click_id",
          round($"click_value", 4).as("click_value"))
    },

    // Interval (time-band) join: click -> views within the next 30
    // minutes. Scale shape: the natural equi-key (user_id) is low
    // cardinality — a hot user is a skew magnet at 100x — so the join
    // key is the composite (user_id, 30-min time bucket). A click in
    // bucket cb only matches views in buckets {cb, cb+1}, so each view
    // is emitted into two buckets (its own and the previous) and the
    // exact band predicate runs as a post-join filter on long-µs
    // values (no per-row timestamp/INTERVAL arithmetic). Each
    // qualifying pair joins exactly once: the view's two emitted
    // buckets are distinct and only one equals the click's bucket.
    // Per-key fanout is bounded by a user's activity inside a single
    // 30-minute window, not their lifetime history.
    q("q96_interval_join",
      """SELECT b.user_id, b.event_id AS click_id, a.event_id AS view_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.event_type = 'click'
        |  AND a.event_type = 'view'
        |  AND epoch_us(a.ts) > epoch_us(b.ts)
        |  AND epoch_us(a.ts) <= epoch_us(b.ts) + 1800000000""".stripMargin) { c =>
      import c.t
      val winUs = 1800000000L // 30 minutes in microseconds
      val ev = t("events").filter($"event_type".isin("click", "view"))
        .select($"user_id", $"event_type", unix_micros($"ts").as("tus"), $"event_id")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"tus".as("ctus"), $"event_id".as("click_id"),
          expr(s"tus div ${winUs}L").as("bkt"))
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"tus".as("vtus"), $"event_id".as("view_id"),
          explode(array(expr(s"tus div ${winUs}L"), expr(s"tus div ${winUs}L - 1L"))).as("bkt"))
      clicks.join(views, Seq("user_id", "bkt"))
        .filter($"vtus" > $"ctus" && $"vtus" <= $"ctus" + winUs)
        .select($"user_id", $"click_id", $"view_id")
    },

    // multimodal plumbing surfaced as a query: binary blobs ->
    // partition-local decode (one kernel instance per partition, rows
    // streamed through mapPartitions) -> features. Oracle-backed: the
    // media fixture wraps the documents table (bytes = UTF-8 text) and
    // the fake kernel hashes with md5, which DuckDB recomputes
    // natively — the decode dataflow gets a hard end-to-end hash check.
    q("q95_media_features",
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS content_hash
        |FROM documents""".stripMargin) { c =>
      import c.t
      val media = graft.multimodal.MediaOps.mediaFromText(t("documents"), "doc_id", "text")
      graft.multimodal.MediaOps.decode(media, new graft.multimodal.MediaOps.FakeDecoder(16))
        .toDF()
        .select($"media_id", $"kind", $"n_bytes", $"content_hash")
    },

    // Perceptual near-dup media pairs (multimodal x dedup bridge):
    // byte-derived 16-bucket features in the FakeDecoder mold but
    // constructed oracle-exact — emb[d] = byte d of md5 / 256, a
    // dyadic rational, so the average-hash mean compare is exact on
    // both engines — then ImageDedup's pigeonhole Hamming join
    // (2 chunks x 8 bits, maxHamming 1 < chunks => the banded join is
    // EXACT, verified here by the oracle's all-pairs form). The Spark
    // side never goes all-pairs: same bounded bucket-join shape as
    // text SimHash. RealDecoder pixel-feature dedup is specced on
    // generated PNGs in ImageDedupSpec (no image fixtures in the
    // harness tables).
    q("q134_image_phash_pairs",
      """WITH e AS (SELECT doc_id,
        |  [('0x' || substr(md5(text), 2*d+1, 2))::BIGINT / (256.0)::DOUBLE
        |   for d in range(0, 16)] AS emb
        |  FROM documents),
        |p AS (SELECT doc_id,
        |  list_sum([CASE WHEN emb[d+1] * (16.0)::DOUBLE > list_sum(emb)
        |    THEN (1::BIGINT << d) ELSE 0::BIGINT END for d in range(0, 16)]) AS fp
        |  FROM e)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
        |FROM p a JOIN p b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 1""".stripMargin) { c =>
      import c.t
      val hx = md5($"text".cast("binary"))
      val features = t("documents").select(
        $"doc_id",
        array((0 until 16).map(d =>
          conv(substring(hx, 2 * d + 1, 2), 16, 10).cast("long")
            .cast("double") / 256.0): _*).as("emb"))
      graft.multimodal.ImageDedup
        .nearDupPairs(features, "doc_id", "emb",
          maxHamming = 1, maxBucketSize = 1000000, chunks = 2, chunkBits = 8)
        .withColumn("hamming", $"hamming".cast("long"))
    },

    // Stratified media-mix sampling: the q102 hash-gated downsampler
    // over COMPOSITE (kind x size-bucket) strata — "equal mass per
    // modality and size class", the mix decision a multimodal corpus
    // needs where text corpora stratify on language alone. Media
    // fixture = the q95 text-wrap (kind from id mod 3, size = UTF-8
    // byte length standing in for duration); acceptance is the shared
    // md5-uniform, so DuckDB replays the whole sampler term for term.
    q("q244_media_mix_stratified",
      """WITH m AS (SELECT doc_id AS media_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    octet_length(encode(text)) AS n_bytes
        |  FROM documents),
        |s AS (SELECT media_id,
        |    kind || ':' || cast(n_bytes // 256 AS varchar) AS stratum FROM m),
        |counts AS (SELECT stratum, count(*) AS n FROM s GROUP BY 1),
        |tgt AS (SELECT min(n) AS mn FROM counts),
        |rated AS (SELECT stratum, (SELECT mn FROM tgt) * 1.0 / n AS rate FROM counts),
        |kept AS (SELECT s.media_id, s.stratum FROM s JOIN rated r ON s.stratum = r.stratum
        |  WHERE ('0x' || substr(md5(cast(s.media_id AS varchar) || ':mix'), 1, 15))::BIGINT
        |    / 1152921504606846976.0 < r.rate)
        |SELECT stratum, count(*) AS n_kept, min(media_id) AS first_id
        |FROM kept GROUP BY stratum""".stripMargin) { c =>
      import c.t
      val media = graft.multimodal.MediaOps
        .mediaFromText(t("documents"), "doc_id", "text")
        .withColumn("n_bytes", octet_length($"bytes"))
      val kept = graft.multimodal.MediaMix.balanceStrata(
        media, "kind", "n_bytes", bucketWidth = 256L, idCol = "media_id")
      graft.multimodal.MediaMix.mixReport(kept, "media_id")
    },

    // Caption<->image alignment screen (the CLIP-consistency gate a
    // contrastive-pair curation pass runs): per kind, how well does
    // each item's media embedding agree with its caption embedding?
    // Oracle-exact by construction (the q134 move): media emb[d] =
    // byte d of md5(text)/256, caption emb[d] = (3*media[d]*256 +
    // byte d of md5('cap:'||text))/1024 — correlated by the shared
    // 3/4 term, perturbed by the caption hash. All values are dyadic
    // rationals, so dots are EXACT integers scaled by 2^-k (any
    // summation order), norms/division round identically on both
    // engines, and the per-kind rollup hash-matches at 6dp.
    q("q245_crossmodal_consistency",
      """WITH m AS (SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    md5(text) AS hi, md5('cap:' || text) AS hc FROM documents),
        |e AS (SELECT doc_id, kind,
        |    [('0x' || substr(hi, 2*d+1, 2))::BIGINT / (256.0)::DOUBLE for d in range(0, 16)] AS ia,
        |    [((3.0)::DOUBLE * ('0x' || substr(hi, 2*d+1, 2))::BIGINT
        |      + ('0x' || substr(hc, 2*d+1, 2))::BIGINT) / (1024.0)::DOUBLE for d in range(0, 16)] AS ca
        |  FROM m),
        |sc AS (SELECT kind, list_cosine_similarity(ia, ca) AS cos FROM e)
        |SELECT kind, cast(count(*) AS BIGINT) AS n_media,
        |  round(avg(cos), 6) AS mean_consistency,
        |  round(min(cos), 6) AS min_consistency,
        |  cast(sum(CASE WHEN cos < 0.98 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_tau
        |FROM sc GROUP BY kind""".stripMargin) { c =>
      import c.t
      graft.multimodal.CrossModal.consistencyReport(
        crossModalEmbeddings(t("documents")),
        "media_id", "kind", "img_emb", "cap_emb", tau = 0.98)
    },

    // Image -> caption RETRIEVAL served through the vector-store
    // stack (the recall@k diagnostic behind contrastive curation):
    // the caption embeddings are indexed in an SrpStore at the
    // DEGENERATE family (nBits=1, tables=1 — hamming-1 probes cover
    // the 2-bucket space, so the serve PROVABLY equals brute force:
    // the q71b/q232b argument), image embeddings of media_id < 10
    // query it for their top-5 captions, and own_match flags the rows
    // where retrieval found the item's own caption. Cross-modal in
    // the serving sense: one modality's embedding queries an index
    // built over the OTHER modality's.
    q("q246_crossmodal_retrieval",
      """WITH m AS (SELECT doc_id, md5(text) AS hi, md5('cap:' || text) AS hc FROM documents),
        |img AS (SELECT doc_id,
        |    [('0x' || substr(hi, 2*d+1, 2))::BIGINT / (256.0)::DOUBLE for d in range(0, 16)] AS e
        |  FROM m),
        |cap AS (SELECT doc_id,
        |    [((3.0)::DOUBLE * ('0x' || substr(hi, 2*d+1, 2))::BIGINT
        |      + ('0x' || substr(hc, 2*d+1, 2))::BIGINT) / (1024.0)::DOUBLE for d in range(0, 16)] AS e
        |  FROM m),
        |q AS (SELECT doc_id, e FROM img WHERE doc_id < 10),
        |scored AS (SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
        |    list_cosine_similarity(q.e, c.e) AS cos FROM q, cap c
        |  WHERE isfinite(list_cosine_similarity(q.e, c.e))),
        |ranked AS (SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(cos, 4) AS cos, rnk,
        |  (neighbor_id = query_id) AS own_match
        |FROM ranked WHERE rnk <= 5""".stripMargin) { c =>
      import c.t
      val both = crossModalEmbeddings(t("documents"))
      val queries = both.filter($"media_id" < 10)
        .select($"media_id".as("qid"), $"img_emb".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_srpcap_v1_$key"
      val cfg = graft.ann.SrpStore.Config(nBits = 1, tables = 1, dim = 16,
        seed = 42L)
      val served = graft.ann.SrpStore.ensure(
          both.select($"media_id", $"cap_emb"), "media_id", "cap_emb",
          c.spark, path, cfg)
        .topK(queries, "qid", "qvec", k = 5)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
      graft.multimodal.CrossModal.ownMatch(served)
    },

    // Funnel: click -> view -> purchase progression per user, counted
    // by deepest ordered stage reached. Times compared at microsecond
    // precision on BOTH engines (epoch_us truncates DuckDB's native
    // nanos exactly like the Spark-side nanos->micros read).
    q("q97_funnel",
      """WITH pu AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS tc,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS tv,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp
        |  FROM events GROUP BY user_id)
        |SELECT CASE
        |    WHEN tc IS NOT NULL AND tv IS NOT NULL AND tp IS NOT NULL
        |         AND tc <= tv AND tv <= tp THEN 3
        |    WHEN tc IS NOT NULL AND tv IS NOT NULL AND tc <= tv THEN 2
        |    WHEN tc IS NOT NULL THEN 1
        |    ELSE 0 END AS funnel_stage,
        |  count(*) AS n_users
        |FROM pu GROUP BY 1""".stripMargin) { c =>
      import c.t
      val pu = t("events").groupBy($"user_id").agg(
        min(when($"event_type" === "click", unix_micros($"ts"))).as("tc"),
        min(when($"event_type" === "view", unix_micros($"ts"))).as("tv"),
        min(when($"event_type" === "purchase", unix_micros($"ts"))).as("tp"))
      pu.select(
          when($"tc".isNotNull && $"tv".isNotNull && $"tp".isNotNull &&
            $"tc" <= $"tv" && $"tv" <= $"tp", 3)
            .when($"tc".isNotNull && $"tv".isNotNull && $"tc" <= $"tv", 2)
            .when($"tc".isNotNull, 1)
            .otherwise(0).as("funnel_stage"))
        .groupBy($"funnel_stage").agg(count(lit(1)).as("n_users"))
    },

    // Cohort retention: users bucketed by first-seen day, activity
    // counted per (cohort_day, day_offset) — integer-µs day arithmetic
    // on both engines.
    q("q98_cohort_retention",
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events
        |), first AS (
        |  SELECT user_id, min(d) AS d0 FROM act GROUP BY user_id)
        |SELECT d0 AS cohort_day, d - d0 AS day_offset, count(*) AS n_active
        |FROM act JOIN first USING (user_id)
        |GROUP BY 1, 2""".stripMargin) { c =>
      import c.t
      val act = t("events")
        .select($"user_id", expr("unix_micros(ts) div 86400000000").as("d"))
        .distinct()
      val first = act.groupBy($"user_id").agg(min($"d").as("d0"))
      act.join(first, Seq("user_id"))
        .groupBy($"d0".as("cohort_day"), ($"d" - $"d0").as("day_offset"))
        .agg(count(lit(1)).as("n_active"))
    },

    q("q94_event_value_deciles",
      """SELECT event_type, ntile, count(*) AS n,
        |  round(min(cast(value AS double)), 4) AS lo,
        |  round(max(cast(value AS double)), 4) AS hi
        |FROM (SELECT event_type, value,
        |        ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS ntile
        |      FROM events)
        |GROUP BY event_type, ntile""".stripMargin) { c =>
      import c.t
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"value", $"event_id")
      t("events")
        .withColumn("ntile", ntile(10).over(w))
        .groupBy($"event_type", $"ntile")
        .agg(count(lit(1)).as("n"),
          round(min($"value".cast("double")), 4).as("lo"),
          round(max($"value".cast("double")), 4).as("hi"))
    },

    // Linear interpolation over the gapped hourly series — the
    // time-series densification q35 zero-fill doesn't cover: missing
    // hours take the straight line between their known neighbors
    // (edge gaps hold the nearest known value). Window pair per
    // direction (last/first with IGNORE NULLS over the q35 timeline),
    // identical association on both engines, round(4) absorbs
    // avg-order noise.
    q("q132_linear_interpolate",
      s"""WITH $hourlyGridCtes, vals AS (
        |  SELECT epoch_us(ts) // 3600000000 AS hr, event_type,
        |         round(avg(cast(value AS double)) * 1000000.0) / 1000000.0 AS v
        |  FROM events GROUP BY 1, 2
        |), grid AS (
        |  SELECT t.event_type, h.hr, v.v
        |  FROM hours h CROSS JOIN types t
        |  LEFT JOIN vals v ON v.hr = h.hr AND v.event_type = t.event_type
        |), ctx AS (
        |  SELECT event_type, hr, v,
        |    last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        |    first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hr
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY hr
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        |  FROM grid)
        |SELECT event_type, hr * 3600 AS hour_start,
        |  round((CASE WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NOT NULL AND nv IS NOT NULL
        |      THEN pv + (nv - pv) * (hr - ph) / (nh - ph)
        |    WHEN pv IS NOT NULL THEN pv
        |    ELSE nv END) * 10000.0) / 10000.0 AS v_interp,
        |  (v IS NOT NULL) AS is_actual
        |FROM ctx""".stripMargin) { c =>
      val w = org.apache.spark.sql.expressions.Window
      val back = w.partitionBy($"event_type").orderBy($"hr")
        .rowsBetween(w.unboundedPreceding, w.currentRow)
      val fwd = w.partitionBy($"event_type").orderBy($"hr")
        .rowsBetween(w.currentRow, w.unboundedFollowing)
      // avg SNAPPED to 6 decimals before interpolating (integer-snap
      // form, same reason as the output: plain round(x, N) diverges
      // cross-engine at half-boundaries): both engines then start from
      // identical doubles, so the interpolation arithmetic cannot
      // diverge (the q34 divided-aggregate lesson)
      hourlyGrid(c)
        .withColumn("v", round($"__avg" * 1000000.0) / 1000000.0)
        .withColumn("pv", last($"v", ignoreNulls = true).over(back))
        .withColumn("ph", last(when($"v".isNotNull, $"hr"), ignoreNulls = true).over(back))
        .withColumn("nv", first($"v", ignoreNulls = true).over(fwd))
        .withColumn("nh", first(when($"v".isNotNull, $"hr"), ignoreNulls = true).over(fwd))
        .select($"event_type", ($"hr" * 3600).as("hour_start"),
          // integer snap, not round(,4): Spark's decimal rounding goes
          // through the double's shortest string while DuckDB rounds
          // the binary value — at a .xxxx5 boundary they disagree; the
          // *1e4-round-/1e4 form rounds the same binary double in both
          (round(when($"v".isNotNull, $"v")
            .when($"pv".isNotNull && $"nv".isNotNull,
              $"pv" + ($"nv" - $"pv") * ($"hr" - $"ph") / ($"nh" - $"ph"))
            .when($"pv".isNotNull, $"pv")
            .otherwise($"nv") * 10000.0) / 10000.0).as("v_interp"),
          $"v".isNotNull.as("is_actual"))
    },

    // Key-skew diagnostics (operators.SkewReport): the measurement
    // that decides between plain shuffle join, SaltedJoin, or AQE
    // skew thresholds — top heavy keys with share and ratio to the
    // mean per-key load. One count aggregation + a tiny broadcast
    // global aggregate + TakeOrdered; nothing corpus-sized sorts.
    q("q125_skew_report",
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |t AS (SELECT sum(cnt) AS rows_, count(*) AS keys_ FROM c)
        |SELECT user_id, cnt, round(cnt / cast(rows_ AS double), 6) AS share,
        |  round(cast(cnt AS double) * keys_ / cast(rows_ AS double), 6) AS ratio_to_mean
        |FROM c, t ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin) { c =>
      import c.t
      graft.operators.SkewReport.topKeys(t("events"), "user_id", k = 10)
    },

    // The diagnostic WIRED to the mitigation (SkewAwareJoin): a
    // planted-skew probe (70% of orders pile onto key 0, ~68x the mean
    // per-key load) joined to a 97-row dim. The measured ratio routes
    // the plan through SaltedJoin (ratio > saltThreshold; factor =
    // ceil(ratio) capped at maxSalt) — the oracle computes the same
    // join plainly, proving the strategy moves shuffle load without
    // touching semantics. SkewAwareJoinSpec asserts the plan actually
    // switches (plain / AQE / salted) at the thresholds.
    q("q135_skew_aware_join",
      """WITH probe AS (SELECT CASE WHEN o_orderkey % 10 < 7 THEN 0
        |    ELSE o_orderkey % 97 END AS skey, o_orderkey FROM orders),
        |build AS (SELECT unnest(range(0, 97)) AS skey)
        |SELECT skey % 5 AS grp, count(*)::BIGINT AS n_rows,
        |  sum(o_orderkey)::BIGINT AS sum_keys
        |FROM probe JOIN build USING (skey)
        |GROUP BY 1""".stripMargin) { c =>
      import c.t
      val probe = t("orders").select(
        when($"o_orderkey" % 10 < 7, 0L).otherwise($"o_orderkey" % 97).as("skey"),
        $"o_orderkey")
      val build = c.spark.range(0, 97).select($"id".as("skey"))
      val (joined, decision) = graft.operators.SkewAwareJoin
        .innerDecided(probe, build, "skey")
      assert(decision.strategy.isInstanceOf[graft.operators.SkewAwareJoin.Salted],
        s"planted 68x skew must route through the salted join, got $decision")
      joined.groupBy(($"skey" % 5).as("grp"))
        .agg(count(lit(1)).as("n_rows"), sum($"o_orderkey").as("sum_keys"))
    },

    // Time-decayed per-user engagement (the recency-weighted feature a
    // ranking/feed pipeline maintains): each event contributes
    // value · 2^(−whole hours of age), age anchored at the table's max
    // ts (a one-row scalar broadcast). 2^(−integer) is EXACT in binary
    // floating point, so the per-event contribution carries no libm
    // rounding ambiguity between engines — only the 4dp-rounded sum
    // crosses the oracle boundary. One scan + one groupBy.
    q("q146_decayed_user_value",
      """WITH b AS (SELECT max(ts) AS tmax FROM events),
        |d AS (SELECT user_id,
        |    value * power(2.0, -floor(date_diff('second', ts, tmax) / 3600.0)) AS dv
        |  FROM events, b)
        |SELECT user_id, round(sum(dv), 4) AS decayed_value,
        |  count(*)::BIGINT AS n_events
        |FROM d GROUP BY user_id""".stripMargin) { c =>
      val ev = c.t("events")
      val bounds = ev.agg(max($"ts").as("tmax"))
      ev.crossJoin(broadcast(bounds))
        .withColumn("dv", $"value" * pow(lit(2.0),
          -floor((unix_timestamp($"tmax") - unix_timestamp($"ts")).cast("double") / 3600.0)))
        .groupBy($"user_id")
        .agg(round(sum($"dv"), 4).as("decayed_value"),
          count(lit(1)).as("n_events"))
    })
}
