package graft.ann

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SrpStoreSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("srpstore").toString + "/store"

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("vec_a"), col("vec_b"), col("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("incremental pair set equals the full self-join restricted to delta-touching pairs") {
    val corpus = emb.filter(col("vec_id") % 4 =!= 0)
    val delta = emb.filter(col("vec_id") % 4 === 0)
    val h = SrpStore.build(corpus, "vec_id", "embedding", tmp())
    val got = pairSet(h.nearDupsOfDelta(delta))
    // the full-corpus build with the SAME seeded family, restricted to
    // pairs with at least one delta endpoint
    val full = pairSet(Ann.lshNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.35, nBits = 8, tables = 8, dim = 64, maxBucketSize = 10000)
      .filter(col("vec_a") % 4 === 0 || col("vec_b") % 4 === 0))
    assert(got == full, s"missing=${(full -- got).take(5)} extra=${(got -- full).take(5)}")
    assert(got.nonEmpty)
  }

  test("append is replay-safe: re-appending the same delta changes nothing") {
    val corpus = emb.filter(col("vec_id") % 4 =!= 0)
    val delta = emb.filter(col("vec_id") % 4 === 0)
    val h = SrpStore.build(corpus, "vec_id", "embedding", tmp())
    h.append(delta)
    val vecs = h.vectors.count()
    val posts = h.postings.count()
    assert(vecs == emb.count())
    h.append(delta) // redelivered micro-batch
    assert(h.vectors.count() == vecs, "replay must not duplicate vectors")
    assert(h.postings.count() == posts, "replay must not duplicate postings")
    // a delta already absorbed produces no NEW corpus-vs-delta report
    // beyond what the first pass reported (same pairs re-derived)
    val again = pairSet(h.nearDupsOfDelta(delta.limit(0)))
    assert(again.isEmpty)
  }

  test("persisted bucket counts reproduce the union-population guard exactly") {
    // a coarse family (4 buckets/table) so buckets genuinely overflow
    // a small cap — the guard must DROP the same buckets it would
    // have dropped counting the union postings directly
    val cfg = SrpStore.Config(nBits = 2, tables = 4, dim = 64,
      seed = 42L, maxBucketSize = 120, threshold = 0.35)
    val corpus = emb.filter(col("vec_id") % 4 =!= 0)
    val delta = emb.filter(col("vec_id") % 4 === 0)
    val h = SrpStore.build(corpus, "vec_id", "embedding", tmp(), cfg)
    val got = pairSet(h.nearDupsOfDelta(delta))

    // reference: drop set from a DIRECT count over the union postings
    def post(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id").as("id"),
        explode(array((0 until cfg.tables).map(t =>
          struct(lit(t).as("tbl"),
            Ann.srpSignature(col("embedding"), cfg.nBits, cfg.dim, cfg.seed + t)
              .as("bkt"))): _*)).as("tb"))
        .select(col("id"), col("tb.tbl"), col("tb.bkt"))
    val cPost = post(corpus)
    val dPost = post(delta)
    val union = cPost.unionByName(dPost)
    val drop = union.groupBy(col("tbl"), col("bkt"))
      .agg(count(lit(1)).as("n")).filter(col("n") > cfg.maxBucketSize)
      .select(col("tbl"), col("bkt"))
    assert(drop.count() > 0, "fixture must actually drop buckets")
    val a = union.join(drop, Seq("tbl", "bkt"), "left_anti").as("a")
    val b = dPost.join(drop, Seq("tbl", "bkt"), "left_anti").as("b")
    val cand = a.join(b,
        col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt") &&
        col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("vec_a"),
        greatest(col("a.id"), col("b.id")).as("vec_b")).distinct()
    val vecs = emb.select(col("vec_id"), col("embedding"))
    val want = pairSet(cand
      .join(vecs.select(col("vec_id").as("vec_a"), col("embedding").as("va")), Seq("vec_a"))
      .join(vecs.select(col("vec_id").as("vec_b"), col("embedding").as("vb")), Seq("vec_b"))
      .withColumn("c", graft.functions.VectorFunctions.cosine(col("va"), col("vb")))
      .filter(col("c") > cfg.threshold)
      .select(col("vec_a"), col("vec_b"), round(col("c"), 4).as("cos")))
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("appended counts stay additive: a later delta sees the absorbed corpus") {
    val cfg = SrpStore.Config()
    val third = emb.filter(col("vec_id") % 3 === 2)
    val h = SrpStore.build(emb.filter(col("vec_id") % 3 === 0),
      "vec_id", "embedding", tmp(), cfg)
    h.append(emb.filter(col("vec_id") % 3 === 1))
    val got = pairSet(h.nearDupsOfDelta(third))
    // fresh store over the absorbed corpus must serve identically
    val fresh = SrpStore.build(emb.filter(col("vec_id") % 3 =!= 2),
      "vec_id", "embedding", tmp(), cfg)
    assert(got == pairSet(fresh.nearDupsOfDelta(third)))
    // compact collapses additive count rows to one per bucket
    val before = h.bucketCounts.count()
    SrpStore.compact(h)
    val after = h.bucketCounts
    assert(after.count() <= before)
    assert(after.groupBy(col("tbl"), col("bkt")).count()
      .filter(col("count") > 1).isEmpty)
  }

  private def findScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      findScans(a.executedPlan)
    case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      findScans(q.plan)
    case other => (other.children ++ other.subqueries).flatMap(findScans)
  }

  test("v3 serve path: the corpus postings read is delta-bucket-pruned") {
    val corpus = emb.filter(col("vec_id") % 4 =!= 0)
    // a tiny delta touches few buckets — the strong (literal-predicate)
    // prune route, the one that row-group-skips at 100 TB
    val delta = emb.filter(col("vec_id") % 4 === 0).limit(3).localCheckpoint()
    // 128 files => ~16 bkt ranges per table: row-group-skip granularity
    // at harness scale (the 8 MB cap provides it at 100 TB)
    val h = SrpStore.build(corpus, "vec_id", "embedding", tmp(), numFiles = 128)
    val dPost = h.deltaPostings(delta).localCheckpoint()
    val cand = h.candidatePairsOfDelta(dPost)
    cand.count() // finalize the adaptive plan before reading it
    val scans = findScans(cand.queryExecution.executedPlan)
      .filter(_.schema.fieldNames.contains("id")) // the postings table
    assert(scans.nonEmpty, "no postings file scan in the candidate plan")
    scans.foreach { s =>
      assert(s.toString.matches("(?s).*PushedFilters: \\[In\\(bkt.*") &&
          s.dataFilters.exists(_.references.exists(_.name == "tbl")),
        s"postings scan must push the delta-bucket predicate:\n$s")
    }
    val total = h.postings.count()
    val readRows = scans.map(_.metrics("numOutputRows").value).sum
    assert(readRows < total,
      s"pruned postings read returned $readRows of $total corpus rows")
  }

  test("q184b shape: the %100==8 micro-delta takes the LITERAL prune route, equal to full") {
    val corpus = emb.filter(col("vec_id") % 4 =!= 0)
    val delta = emb.filter(col("vec_id") % 100 === 8).localCheckpoint()
    val h = SrpStore.build(corpus, "vec_id", "embedding", tmp(), numFiles = 128)
    val dPost = h.deltaPostings(delta).localCheckpoint()
    // the twin's bucket set (<= 8 tables x |delta|) sits far under the
    // literal cap AND under the coverage gate (space/2 = 1024)
    assert(graft.operators.KeyPrune.plan(dPost, Seq("tbl", "bkt")).isLiteral,
      "the q184b delta's bucket set must resolve to the literal route")
    val cand = h.candidatePairsOfDelta(dPost)
    cand.count()
    val scans = findScans(cand.queryExecution.executedPlan)
      .filter(_.schema.fieldNames.contains("id"))
    assert(scans.nonEmpty, "no postings file scan in the candidate plan")
    scans.foreach { s =>
      assert(s.toString.matches("(?s).*PushedFilters: \\[In\\(bkt.*") &&
          s.dataFilters.exists(_.references.exists(_.name == "tbl")),
        s"q184b-shape scan must push the literal bucket predicate:\n$s")
    }
    val readRows = scans.map(_.metrics("numOutputRows").value).sum
    assert(readRows < h.postings.count(),
      s"literal-pruned postings read returned $readRows rows - no skip happened")
    // end-to-end pair set equals the full build over corpus+delta
    // restricted to delta-touching pairs (the q184b entry's contract)
    val union = corpus.unionByName(delta)
    val full = pairSet(Ann.lshNearDupPairs(union, "vec_id", "embedding",
      threshold = 0.35, nBits = 8, tables = 8, dim = 64, maxBucketSize = 10000)
      .filter(col("vec_a") % 100 === 8 || col("vec_b") % 100 === 8))
    assert(pairSet(h.nearDupsOfDelta(delta)) == full)
  }

  test("append replay heals the counts-written/vectors-missing crash window") {
    val corpus = emb.filter(col("vec_id") % 4 =!= 0)
    val delta = emb.filter(col("vec_id") % 4 === 0)
    val path = tmp()
    val h = SrpStore.build(corpus, "vec_id", "embedding", path)
    // simulate a crash AFTER the postings + bucketcounts appends but
    // BEFORE the vectors write — the exact window where a vectors-keyed
    // dedup would re-append both and OVER-state the guard counts
    val fPost = h.deltaPostings(delta)
    fPost
      .sortWithinPartitions(col("tbl"), col("bkt"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$path/postings")
    fPost.groupBy(col("tbl"), col("bkt")).agg(count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$path/bucketcounts")
    h.append(delta) // the replayed micro-batch
    assert(h.vectors.count() == emb.count(), "replay must complete the vectors")
    assert(h.postings.count() == h.postings.distinct().count(),
      "replay must not double postings rows")
    // guard counts must equal a cleanly-built union store's — never more
    val ref = SrpStore.build(emb, "vec_id", "embedding", tmp())
    val got = h.bucketCounts.groupBy(col("tbl"), col("bkt"))
      .agg(sum(col("n")).as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val want = ref.bucketCounts.groupBy(col("tbl"), col("bkt"))
      .agg(sum(col("n")).as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // this window fully landed postings + counts pre-crash, so the
    // replay must skip both: counts come out EXACTLY clean-build equal
    // (in particular never over-stated — the v2 bug direction)
    assert(got == want, s"bucket counts diverge after replay: " +
      s"over=${got.filter { case (k, n) => n > want.getOrElse(k, 0L) }.take(5)} " +
      s"under=${want.filter { case (k, n) => n > got.getOrElse(k, 0L) }.take(5)}")
    // and the healed store serves a later delta exactly like a fresh one
    val probe = emb.limit(0)
    assert(pairSet(h.nearDupsOfDelta(probe)) == pairSet(ref.nearDupsOfDelta(probe)))
  }

  test("topK with tables=1 equals Ann.lshTopK exactly (same family, probes, tie-break)") {
    val cfg = SrpStore.Config(nBits = 12, tables = 1, dim = 64, seed = 42L)
    val h = SrpStore.build(emb, "vec_id", "embedding", tmp(), cfg)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = h.topK(queries, "qid", "qvec", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val want = Ann.lshTopK(emb, queries, "vec_id", "embedding", "qid", "qvec",
        k = 5, nBits = 12, dim = 64, seed = 42L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(got.nonEmpty)
    // multi-table store: candidates are an OR over tables — top-k per
    // query still exact-ranked, never fewer hits than the 1-table family
    val h8 = SrpStore.build(emb, "vec_id", "embedding", tmp(),
      SrpStore.Config(nBits = 12, tables = 4, dim = 64, seed = 42L))
    val wide = h8.topK(queries, "qid", "qvec", k = 5)
    assert(wide.count() >= got.size)
    // a query batch past the literal cap (200 x 13 probe buckets >
    // 2048) falls back to the DISTRIBUTED route — same rows as the
    // inline family, so micro and distributed agree query for query
    val big = emb.filter(col("vec_id") < 200)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val gotBig = h.topK(big, "qid", "qvec", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val wantBig = Ann.lshTopK(emb, big, "vec_id", "embedding", "qid", "qvec",
        k = 5, nBits = 12, dim = 64, seed = 42L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(gotBig == wantBig)
    assert(gotBig.size > got.size)
  }

  test("topKFiltered: degenerate family equals exhaustive filtered; realistic is a subset rank") {
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val allowed = emb.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // degenerate family: hamming-1 probes cover the whole 2-bucket
    // space, so filtered candidates == the allowed corpus -> EXACTLY
    // the exhaustive filtered top-k (the q232/q232b shared oracle)
    val hDeg = SrpStore.build(emb, "vec_id", "embedding", tmp(),
      SrpStore.Config(nBits = 1, tables = 1, dim = 64, seed = 42L))
    val got = rows(hDeg.topKFiltered(queries, "qid", "qvec", 5, allowed))
    val want = rows(Ann.bruteForceTopK(
      emb.join(allowed, Seq("vec_id"), "left_semi"), queries,
      "vec_id", "embedding", "qid", "qvec", 5))
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(got.nonEmpty)
    // realistic family: every returned neighbor is allowed, ranks are
    // dense from 1, and per query the hits are exactly the exhaustive
    // filtered ranking RESTRICTED to the probed candidate set (the
    // approximation only prunes candidates, never reorders)
    val h = SrpStore.build(emb, "vec_id", "embedding", tmp(),
      SrpStore.Config(nBits = 12, tables = 1, dim = 64, seed = 42L))
    val real = h.topKFiltered(queries, "qid", "qvec", 5, allowed)
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    val byQ = real.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .groupBy(_._1)
    byQ.values.foreach { hits =>
      assert(hits.forall(h0 => allowedSet.contains(h0._2)))
      assert(hits.map(_._3).sorted.toSeq == (1 to hits.length))
    }
    // an empty allowed set returns zero rows, not an error
    assert(h.topKFiltered(queries, "qid", "qvec", 5,
      emb.filter(lit(false)).select(col("vec_id"))).isEmpty)
  }

  test("remove: serve paths equal a kept-corpus store; replay no-op; compact purges") {
    val sp = spark; import sp.implicits._
    val keep = emb.filter(col("vec_id") % 7 =!= 0)
    val gone = emb.filter(col("vec_id") % 7 === 0)
    val h = SrpStore.build(emb, "vec_id", "embedding", tmp())
    val kept = SrpStore.build(keep, "vec_id", "embedding", tmp())
    h.remove(gone.select(col("vec_id")))
    // near-dup serve over a fresh delta equals the kept-corpus store's
    val delta = emb.filter(col("vec_id") % 4 === 0 && col("vec_id") % 7 =!= 0)
      .withColumn("vec_id", col("vec_id") + 100000)
    assert(pairSet(h.nearDupsOfDelta(delta)) ==
      pairSet(kept.nearDupsOfDelta(delta)))
    // topK never returns a tombstoned neighbor and equals kept-build
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def rows(x: org.apache.spark.sql.DataFrame) = x.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val got = rows(h.topK(queries, "qid", "qvec", k = 5))
    assert(got == rows(kept.topK(queries, "qid", "qvec", k = 5)))
    assert(!got.exists(_._2 % 7 == 0))
    // replayed takedown changes nothing (ledger already carries the ids)
    val ledger = h.removedIds.count()
    h.remove(gone.select(col("vec_id")))
    assert(h.removedIds.count() == ledger)
    // re-appending a tombstoned id fails loud pre-write
    val ex = intercept[IllegalArgumentException] { h.append(gone.limit(1)) }
    assert(ex.getMessage.contains("tombstoned"))
    // compact physically drops rows, clears the ledger, keeps results
    val c = SrpStore.compact(h, targetFiles = 2)
    assert(c.removedIds.isEmpty)
    assert(c.vectors.count() == keep.count())
    assert(rows(c.topK(queries, "qid", "qvec", k = 5)) == got)
    // the purged id is appendable again
    c.append(gone.limit(1))
    assert(c.vectors.count() == keep.count() + 1)
  }

  test("autoCompact: trigger fires at the tombstone ratio, serve identical before/after") {
    val h = SrpStore.build(emb, "vec_id", "embedding", tmp())
    val probe = emb.filter(col("vec_id") % 5 === 1)
      .withColumn("vec_id", col("vec_id") + 100000).localCheckpoint()
    assert(SrpStore.tombstoneRatio(h).isEmpty)
    assert(SrpStore.autoCompact(h) eq h)
    h.remove(emb.filter(pmod(col("vec_id"), lit(20)) === 0).select(col("vec_id")))
    val r1 = SrpStore.tombstoneRatio(h)
    assert(r1.exists(r => r > 0 && r <= 0.25), s"ratio $r1")
    assert(SrpStore.autoCompact(h) eq h)
    h.remove(emb.filter(pmod(col("vec_id"), lit(3)) === 0).select(col("vec_id")))
    val before = pairSet(h.nearDupsOfDelta(probe))
    assert(SrpStore.tombstoneRatio(h).exists(_ > 0.25))
    val c = SrpStore.autoCompact(h)
    assert(SrpStore.tombstoneRatio(c).isEmpty, "compaction must clear the ledger")
    assert(pairSet(c.nearDupsOfDelta(probe)) == before)
    assert(before.nonEmpty, "the probe must find planted near-dups")
  }

  test("open/ensure round trip preserves the family config; compact keeps the pair set") {
    val corpus = emb.filter(col("vec_id") % 4 =!= 0)
    val delta = emb.filter(col("vec_id") % 4 === 0)
    val path = tmp()
    var calls = 0
    def gen: DataFrame = { calls += 1; corpus }
    val cfg = SrpStore.Config(nBits = 8, tables = 8, dim = 64,
      seed = 42L, maxBucketSize = 10000, threshold = 0.35)
    SrpStore.ensure(gen, "vec_id", "embedding", spark, path, cfg)
    assert(calls == 1)
    val reopened = SrpStore.ensure(gen, "vec_id", "embedding", spark, path, cfg)
    assert(calls == 1, "existing store must not re-run the corpus plan")
    assert(reopened.cfg == cfg)
    val before = pairSet(reopened.nearDupsOfDelta(delta))
    reopened.append(delta)
    val compacted = SrpStore.compact(reopened, targetFiles = 2)
    // after compaction the absorbed corpus serves a NEW delta the same
    // way a freshly-built store over the union would
    val next = emb.limit(0)
    assert(pairSet(compacted.nearDupsOfDelta(next)).isEmpty)
    assert(compacted.vectors.count() == emb.count())
    assert(before.nonEmpty)
  }

  test("a second live handle serves the new generation after another handle's mutation") {
    val path = tmp()
    val corpus = emb.filter(col("vec_id") % 4 =!= 0)
    val delta = emb.filter(col("vec_id") % 4 === 0)
    SrpStore.build(corpus, "vec_id", "embedding", path)
    val mutator = SrpStore.open(spark, path)
    val reader = SrpStore.open(spark, path)
    // populate the reader's caches on the old generation
    assert(reader.vectors.count() == corpus.count())
    // append through the OTHER handle: the reader's next read must see
    // the appended vectors (generation-checked reads, not stale caches)
    mutator.append(delta)
    assert(reader.vectors.count() == emb.count(),
      "reader handle served stale rows after another handle's append")
    // takedown through the other handle: the reader's serve excludes
    // the tombstoned ids on its next read
    val goneIds = emb.filter(col("vec_id") % 7 === 0)
    mutator.remove(goneIds.select(col("vec_id")))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val servedIds = reader.topK(q, "qid", "qvec", k = 5)
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet
    assert(servedIds.forall(_ % 7 != 0),
      "reader handle served tombstoned neighbors after another handle's remove")
    // compact through the other handle (atomic swap replaces every
    // file): the reader's next read serves the compacted generation —
    // no FileNotFoundException, counts match the kept corpus
    SrpStore.compact(mutator, targetFiles = 2)
    assert(reader.vectors.count() == emb.filter(col("vec_id") % 7 =!= 0).count(),
      "reader handle must follow the compact swap on its next read")
    assert(reader.removedIds.count() == 0L, "compact clears the ledger")
  }
}
