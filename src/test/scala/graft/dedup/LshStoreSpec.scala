package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LshStoreSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("store").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("incremental near-dup equals the full self-join restricted to delta pairs") {
    val path = tmp("lshstore")
    val corpus = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    val h = LshStore.build(corpus, "doc_id", "text", path)

    val incremental = h.nearDupsOfDelta(delta, "text", minJaccard = 0.8)

    // reference: the ONE-SHOT pipeline over the whole corpus (q62's
    // formulation, same family), keeping only pairs touching the delta
    val full = MinHashLSH.verifyJaccard(
      MinHashLSH.candidatePairs(docs, "doc_id", "text",
        numHashes = 128, bands = 32, shingleN = 3),
      docs, "doc_id", "text", shingleN = 3, minJaccard = 0.8)
      .filter(col("doc_a") % 4 === 0 || col("doc_b") % 4 === 0)

    assert(rows(incremental) === rows(full))
    assert(incremental.count() > 0, "planted near-dups must cross the split")
    // no corpus-corpus pair is re-reported
    assert(incremental
      .filter(col("doc_a") % 4 =!= 0 && col("doc_b") % 4 =!= 0).count() === 0)
  }

  test("union-population guard: a bucket pushed over the cap BY the delta drops consistently") {
    val sp = spark; import sp.implicits._
    // 8 identical stored docs sit UNDER a cap of 10; 4 more identical
    // delta docs push every one of their band buckets to 12 — the
    // persisted-counts guard must count the UNION and drop them (the
    // contract the v1 re-banding guard satisfied), so no pair of the
    // degenerate family surfaces; an unrelated small pair still does
    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    val pairText = "one two three four five six seven eight nine ten"
    val stored = ((1L to 8L).map(i => (i, dupText)) :+ (100L, pairText))
      .toDF("doc_id", "text")
    val delta = ((11L to 14L).map(i => (i, dupText)) :+ (101L, pairText))
      .toDF("doc_id", "text")
    val cfg = LshStore.Config(maxBucketSize = 10)
    val h = LshStore.build(stored, "doc_id", "text", tmp("lshguard"), cfg)
    val got = h.nearDupsOfDelta(delta, "text", minJaccard = 0.8)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 101L)),
      s"degenerate-family pairs must be guard-dropped; got $got")
    // sanity: with a high cap the family's delta-touching pairs surface
    val h2 = LshStore.build(stored, "doc_id", "text", tmp("lshguard2"),
      LshStore.Config(maxBucketSize = 1000))
    val open = h2.nearDupsOfDelta(delta, "text", minJaccard = 0.8).count()
    assert(open > 1)
  }

  test("append folds a delta in; later deltas dedup against the grown corpus") {
    val path = tmp("lshstore_append")
    val part1 = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val part2 = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
    val part3 = docs.filter(pmod(col("doc_id"), lit(3)) === 2)

    val h = LshStore.build(part1, "doc_id", "text", path).append(part2, "text")
    // appended store serves exactly what a from-scratch build serves
    val fromScratch = LshStore.build(
      part1.unionByName(part2), "doc_id", "text", tmp("lshstore_ref"))
    assert(rows(h.sigs) === rows(fromScratch.sigs))
    assert(rows(h.nearDupsOfDelta(part3, "text", 0.8)) ===
      rows(fromScratch.nearDupsOfDelta(part3, "text", 0.8)))

    // empty delta: no-op append, empty dedup result
    val none = docs.filter(col("doc_id") < 0)
    assert(h.append(none, "text").sigs.count() === h.sigs.count())
    assert(h.nearDupsOfDelta(none, "text", 0.8).count() === 0)
  }

  test("compact shrinks an appended index; dedup results unchanged") {
    val path = tmp("lshstore_compact")
    val parts = (0 until 3).map(i => docs.filter(pmod(col("doc_id"), lit(4)) === i))
    val delta = docs.filter(pmod(col("doc_id"), lit(4)) === 3)
    var h = LshStore.build(parts.head, "doc_id", "text", path)
    parts.tail.foreach(p => h.append(p, "text"))

    val before = h.sigs.inputFiles.length + h.shingles.inputFiles.length
    val pre = rows(h.nearDupsOfDelta(delta, "text", 0.8))
    val c = LshStore.compact(h, targetFiles = 2)
    assert(c.sigs.inputFiles.length + c.shingles.inputFiles.length < before)
    assert(rows(c.nearDupsOfDelta(delta, "text", 0.8)) === pre)
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

  test("v3 serve path: the corpus banded read is delta-bucket-pruned, not a re-band") {
    val corpus = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
      .limit(3).localCheckpoint()
    // 128 files => ~4 bucket ranges per band: row-group-skip
    // granularity at harness scale (the 8 MB cap provides it at 100 TB)
    val h = LshStore.build(corpus, "doc_id", "text", tmp("lshplan"),
      numFiles = 128)
    val deltaB = h.deltaBanded(delta, "text").localCheckpoint()
    val cand = h.candidatePairsOfDelta(deltaB)
    cand.count() // finalize the adaptive plan before reading it
    val scans = findScans(cand.queryExecution.executedPlan)
      .filter(_.schema.fieldNames.contains("doc")) // the banded table
    assert(scans.nonEmpty, "no banded file scan in the candidate plan")
    scans.foreach { s =>
      // the bucket predicate must land FIRST in the pushed-filter list
      // (IsNotNull alone does not satisfy this) — the list string is
      // truncated for large key sets, so pin the leading In(bucket and
      // check the band conjunct on the structured dataFilters
      assert(s.toString.matches("(?s).*PushedFilters: \\[In\\(bucket.*"),
        s"banded scan must push the literal bucket predicate first:\n$s")
      assert(s.dataFilters.exists(_.references.exists(_.name == "band")),
        s"banded scan's data filters must constrain band:\n$s")
    }
    val total = h.banded.count()
    val readRows = scans.map(_.metrics("numOutputRows").value).sum
    assert(readRows < total,
      s"pruned banded read returned $readRows of $total corpus rows")
    // and the corpus SIGNATURE table is never touched at serve time —
    // v2's per-call re-band is gone
    assert(!findScans(cand.queryExecution.executedPlan)
      .exists(_.schema.fieldNames.contains("sig")),
      "serve path must not re-band the corpus signature table")
  }

  test("q140b shape: the %100==8 micro-delta takes the LITERAL prune route, equal to full") {
    // the bench twin's exact delta predicate: ~1-2% of the corpus,
    // disjoint from the stored side (8 = 0 mod 4) — small enough that
    // its bucket set folds into a static pushdown predicate
    val corpus = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(100)) === 8)
      .localCheckpoint()
    val h = LshStore.build(corpus, "doc_id", "text", tmp("lshq140b"),
      numFiles = 128)
    val deltaB = h.deltaBanded(delta, "text").localCheckpoint()
    // the twin's bucket set sits under the literal cap by construction
    // (32 bands x |delta| << 4096): KeyPrune itself must say literal
    assert(graft.operators.KeyPrune.plan(deltaB, Seq("band", "bucket")).isLiteral,
      "the q140b delta's bucket set must resolve to the literal route")
    val cand = h.candidatePairsOfDelta(deltaB)
    cand.count()
    val scans = findScans(cand.queryExecution.executedPlan)
      .filter(_.schema.fieldNames.contains("doc"))
    assert(scans.nonEmpty, "no banded file scan in the candidate plan")
    scans.foreach { s =>
      assert(s.toString.matches("(?s).*PushedFilters: \\[In\\(bucket.*"),
        s"q140b-shape scan must push the literal bucket predicate first:\n$s")
      assert(s.dataFilters.exists(_.references.exists(_.name == "band")),
        s"q140b-shape scan's data filters must constrain band:\n$s")
    }
    val readRows = scans.map(_.metrics("numOutputRows").value).sum
    assert(readRows < h.banded.count(),
      s"literal-pruned banded read returned $readRows rows - no skip happened")
    // end-to-end rows equal the one-shot pipeline over corpus+delta
    // restricted to delta-touching pairs (the q140b oracle's shape)
    val union = corpus.unionByName(delta)
    val full = MinHashLSH.verifyJaccard(
      MinHashLSH.candidatePairs(union, "doc_id", "text",
        numHashes = 128, bands = 32, shingleN = 3),
      union, "doc_id", "text", shingleN = 3, minJaccard = 0.8)
      .filter(col("doc_a") % 100 === 8 || col("doc_b") % 100 === 8)
    assert(rows(h.nearDupsOfDelta(delta, "text", minJaccard = 0.8)) === rows(full))
  }

  test("append is replay-safe: redelivery and partial-crash windows converge") {
    val path = tmp("lshreplay")
    val corpus = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    val h = LshStore.build(corpus, "doc_id", "text", path)
    h.append(delta, "text")
    val counts = (h.sigs.count(), h.banded.count(), h.shingles.count())
    h.append(delta, "text") // full redelivery: a no-op
    assert((h.sigs.count(), h.banded.count(), h.shingles.count()) == counts,
      "replaying a fully-landed batch must change nothing")

    // crash window: sigs + banded + bandcounts landed, shingles did NOT
    val path2 = tmp("lshcrash")
    val h2 = LshStore.build(corpus, "doc_id", "text", path2)
    val dSig = h2.deltaSignatures(delta, "text").localCheckpoint()
    dSig.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(s"$path2/sigs")
    val dB = h2.deltaBanded(delta, "text").localCheckpoint()
    dB.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(s"$path2/banded")
    dB.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(s"$path2/bandcounts")
    h2.append(delta, "text") // the replayed micro-batch
    val ref = LshStore.build(docs, "doc_id", "text", tmp("lshref"))
    assert(h2.shingles.count() == ref.shingles.count(), "replay must complete shingles")
    assert(h2.sigs.count() == ref.sigs.count(), "replay must not double sigs")
    assert(h2.banded.count() == ref.banded.count(), "replay must not double banded")
    val gotCounts = h2.bandCounts.groupBy(col("band"), col("bucket"))
      .agg(sum(col("n")).as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val wantCounts = ref.bandCounts.groupBy(col("band"), col("bucket"))
      .agg(sum(col("n")).as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(gotCounts == wantCounts, "guard counts must heal to clean-build values")
    // the healed store serves a later delta exactly like a fresh build
    val none = docs.filter(col("doc_id") < 0)
    assert(rows(h2.nearDupsOfDelta(none, "text", 0.8)) ===
      rows(ref.nearDupsOfDelta(none, "text", 0.8)))
  }

  test("remove: serve equals a kept-corpus store; replay no-op; compact purges") {
    val keep = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val gone = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val h = LshStore.build(docs, "doc_id", "text", tmp("lshdrop"))
    val kept = LshStore.build(keep, "doc_id", "text", tmp("lshkept"))
    h.remove(gone.select(col("doc_id")))
    // near-dup serve over a fresh delta equals the kept-corpus store's
    val delta = docs.filter(pmod(col("doc_id"), lit(4)) === 0 &&
        pmod(col("doc_id"), lit(7)) =!= 0)
      .withColumn("doc_id", col("doc_id") + 100000)
    val got = rows(h.nearDupsOfDelta(delta, "text", minJaccard = 0.8))
    assert(got == rows(kept.nearDupsOfDelta(delta, "text", minJaccard = 0.8)))
    assert(got.nonEmpty, "planted near-dups must survive the takedown fixture")
    assert(!got.exists(r => r.head.asInstanceOf[Long] % 7 == 0 &&
      r.head.asInstanceOf[Long] < 100000))
    // replayed takedown changes nothing
    val ledger = h.removedIds.count()
    h.remove(gone.select(col("doc_id")))
    assert(h.removedIds.count() == ledger)
    // re-appending a tombstoned id fails loud
    val ex = intercept[IllegalArgumentException] { h.append(gone.limit(1), "text") }
    assert(ex.getMessage.contains("tombstoned"))
    // compact physically purges rows, clears the ledger, keeps results
    val c = LshStore.compact(h, targetFiles = 2)
    assert(c.removedIds.isEmpty)
    assert(c.sigs.count() == keep.count())
    assert(c.shingles.count() == keep.count())
    assert(rows(c.nearDupsOfDelta(delta, "text", minJaccard = 0.8)) == got)
    // the purged id is appendable again
    c.append(gone.limit(1), "text")
    assert(c.sigs.count() == keep.count() + 1)
  }

  test("open/ensure round trip preserves the LSH family; idCol mismatch fails loud") {
    val path = tmp("lshstore_meta")
    val cfg = LshStore.Config(numHashes = 64, bands = 16, shingleN = 2, seed = 7L)
    LshStore.build(docs, "doc_id", "text", path, cfg)

    val h = LshStore.open(spark, path)
    assert(h.cfg === cfg && h.idCol === "doc_id")

    // ensure() on an existing store opens instead of re-signaturing
    val poisoned = docs.withColumn("text",
      raise_error(lit("ensure() must not re-signature an existing store")).cast("string"))
    assert(LshStore.ensure(poisoned, "doc_id", "text", spark, path, cfg).cfg === cfg)

    val e = intercept[IllegalArgumentException] {
      LshStore.ensure(docs, "vec_id", "text", spark, path, cfg)
    }
    assert(e.getMessage.contains("idCol"))
  }

  test("autoCompact: trigger fires at the tombstone ratio, serve identical before/after") {
    val h = LshStore.build(docs, "doc_id", "text", tmp("lshauto"))
    // a fresh-id delta probe (the SrpStore remove-test shape): serves
    // must agree across the compaction boundary
    val probe = docs.filter(pmod(col("doc_id"), lit(5)) === 1)
      .withColumn("doc_id", col("doc_id") + 100000).localCheckpoint()
    assert(LshStore.tombstoneRatio(h).isEmpty)
    assert(LshStore.autoCompact(h) eq h)
    h.remove(docs.filter(pmod(col("doc_id"), lit(20)) === 0).select(col("doc_id")))
    val r1 = LshStore.tombstoneRatio(h)
    assert(r1.exists(r => r > 0 && r <= 0.25), s"ratio $r1")
    assert(LshStore.autoCompact(h) eq h)
    assert(LshStore.tombstoneRatio(h).nonEmpty, "ledger must survive a no-op")
    h.remove(docs.filter(pmod(col("doc_id"), lit(3)) === 0).select(col("doc_id")))
    val before = rows(h.nearDupsOfDelta(probe, "text", minJaccard = 0.8))
    assert(LshStore.tombstoneRatio(h).exists(_ > 0.25))
    val c = LshStore.autoCompact(h)
    assert(LshStore.tombstoneRatio(c).isEmpty, "compaction must clear the ledger")
    assert(rows(c.nearDupsOfDelta(probe, "text", minJaccard = 0.8)) == before)
    assert(before.nonEmpty, "the probe must find planted near-dups")
  }

  test("collectChunked past the single-predicate cap equals the unchunked read") {
    import graft.operators.KeyPrune
    val df = spark.range(20000)
      .select(col("id"), (col("id") % 7).as("v"))
      .localCheckpoint()
    // 6000 distinct single-col keys: above MaxLiteralKeys (4096),
    // under MaxChunkedKeys (16384) -> two sequential literal chunks
    val keys = (0L until 20000L by 3L).map(Seq[Any](_))
    assert(keys.size > KeyPrune.MaxLiteralKeys &&
      keys.size <= KeyPrune.MaxChunkedKeys)
    val got = KeyPrune.collectChunked(df, Seq("id"), keys)
      .map(_.toSeq).toSet
    val want = df.filter(col("id") % 3 === 0).collect().map(_.toSeq).toSet
    assert(got == want && got.size == keys.size)
    // two-col keys chunk the same way (the (band, bucket) shape)
    val df2 = spark.range(20000)
      .select((col("id") % 40).cast("int").as("band"),
        (col("id") % 500).cast("int").as("bucket"), col("id"))
      .localCheckpoint()
    val keys2 = (for (b <- 0 until 40; k <- 0 until 125)
      yield Seq[Any](b, k)).toSeq // 5000 tuples > cap
    assert(keys2.size > KeyPrune.MaxLiteralKeys)
    val got2 = KeyPrune.collectChunked(df2, Seq("band", "bucket"), keys2)
      .map(_.toSeq).toSet
    val want2 = df2.filter(col("bucket") < 125).collect().map(_.toSeq).toSet
    assert(got2 == want2 && got2.nonEmpty)
  }

  test("chunk-range delta (past the literal cap) stays on the driver micro-serve, equal to full") {
    import graft.operators.KeyPrune
    val corpus = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .localCheckpoint()
    // the fixture must land BETWEEN the caps: one literal predicate
    // cannot hold the bucket set, the chunked route can
    val nKeys = delta.count() * 32
    assert(nKeys > KeyPrune.MaxLiteralKeys && nKeys <= KeyPrune.MaxChunkedKeys,
      s"fixture must exercise the chunk range, got $nKeys keys")
    val h = LshStore.build(corpus, "doc_id", "text", tmp("lshchunk"),
      numFiles = 128)
    val got = h.nearDupsOfDelta(delta, "text", minJaccard = 0.8)
    // the driver micro-route returns a LOCAL relation; the distributed
    // fallback returns a checkpointed RDD plan — assert the route
    assert(got.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      "chunk-range delta must resolve on the driver, not fall back")
    val union = corpus.unionByName(delta)
    val full = MinHashLSH.verifyJaccard(
      MinHashLSH.candidatePairs(union, "doc_id", "text",
        numHashes = 128, bands = 32, shingleN = 3),
      union, "doc_id", "text", shingleN = 3, minJaccard = 0.8)
      .filter(col("doc_a") % 3 === 0 || col("doc_b") % 3 === 0)
    assert(rows(got) === rows(full))
    assert(got.count() > 0, "planted near-dups must cross the split")
  }

  test("BULK delta (past the chunked cap) on a footer-bounded store takes the driver micro-serve, equal to full") {
    import graft.operators.KeyPrune
    // widen the harness corpus so the delta's bucket set blows past
    // the chunked cap (the q140 bulk-demonstrator shape) while the
    // store itself stays footer-bounded
    val wide = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      .unionByName(docs.select((col("doc_id") + 200000L).as("doc_id"), col("text")))
      .unionByName(docs.select((col("doc_id") + 300000L).as("doc_id"), col("text")))
      .localCheckpoint()
    val corpus = wide.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val delta = wide.filter(pmod(col("doc_id"), lit(3)) === 0).localCheckpoint()
    val nKeys = delta.count() * 32
    assert(nKeys > KeyPrune.MaxChunkedKeys,
      s"fixture must exercise the bulk range, got $nKeys keys")
    assert(corpus.count() * 32 <= LshStore.MaxDriverCorpusRows,
      "fixture store must stay footer-bounded")
    val h = LshStore.build(corpus, "doc_id", "text", tmp("lshbulk"),
      numFiles = 16)
    val got = h.nearDupsOfDelta(delta, "text", minJaccard = 0.8)
    assert(got.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      "bulk delta on a bounded store must resolve on the driver")
    val full = MinHashLSH.verifyJaccard(
      MinHashLSH.candidatePairs(wide, "doc_id", "text",
        numHashes = 128, bands = 32, shingleN = 3),
      wide, "doc_id", "text", shingleN = 3, minJaccard = 0.8)
      .filter(col("doc_a") % 3 === 0 || col("doc_b") % 3 === 0)
    assert(rows(got) === rows(full))
    assert(got.count() > 0, "planted near-dups must cross the split")
  }

  test("micro-serve handles the tombstone ledger: equal to the kept-corpus build (the q212 shape)") {
    val corpus = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    val h = LshStore.build(corpus, "doc_id", "text", tmp("lshledger"))
    h.remove(corpus.filter(pmod(col("doc_id"), lit(7)) === 0)
      .select(col("doc_id")))
    val got = h.nearDupsOfDelta(delta, "text", minJaccard = 0.8)
    // the ledgered store previously forced the distributed route; now
    // the driver micro-serve applies the ledger as a set subtraction
    assert(got.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      "ledgered micro delta must resolve on the driver")
    val kept = corpus.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val union = kept.unionByName(delta)
    val full = MinHashLSH.verifyJaccard(
      MinHashLSH.candidatePairs(union, "doc_id", "text",
        numHashes = 128, bands = 32, shingleN = 3),
      union, "doc_id", "text", shingleN = 3, minJaccard = 0.8)
      .filter(col("doc_a") % 4 === 0 || col("doc_b") % 4 === 0)
    assert(rows(got) === rows(full))
    assert(got.count() > 0, "planted near-dups must survive the takedown")
  }

  test("filtered near-dup: both-endpoints-allowed restriction of the unfiltered result") {
    val corpus = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    val h = LshStore.build(corpus, "doc_id", "text", tmp("lshfilter"))
    val allowed = docs.filter(col("lang") =!= "zh").select(col("doc_id"))
    val unfiltered = h.nearDupsOfDelta(delta, "text", minJaccard = 0.8)
    val filtered =
      h.nearDupsOfDeltaFiltered(delta, "text", minJaccard = 0.8, allowed)
    val ok = docs.filter(col("lang") =!= "zh")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val expect = unfiltered.collect()
      .filter(r => ok(r.getLong(0)) && ok(r.getLong(1)))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = filtered.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expect)
    assert(got.nonEmpty, "the allowed set must keep some planted pairs")
    assert(got.size < unfiltered.count(),
      "the predicate must actually filter (else the test is vacuous)")
  }

  test("filtered near-dup: empty allowed set yields an empty frame, not an error") {
    val corpus = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    val h = LshStore.build(corpus, "doc_id", "text", tmp("lshfilterempty"))
    val empty = docs.filter(lit(false)).select(col("doc_id"))
    assert(h.nearDupsOfDeltaFiltered(delta, "text", 0.8, empty).count() === 0L)
  }

  test("a second live handle serves the new generation after another handle's mutation") {
    val path = tmp("lshgen")
    val corpus = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    LshStore.build(corpus, "doc_id", "text", path)
    val mutator = LshStore.open(spark, path)
    val reader = LshStore.open(spark, path)
    // populate the reader's caches on the old generation
    assert(reader.shingles.count() == corpus.count())
    // append through the OTHER handle: the reader's next read sees it
    mutator.append(delta, "text")
    assert(reader.shingles.count() == docs.count(),
      "reader handle served stale rows after another handle's append")
    // takedown through the other handle: the reader's serve excludes
    // tombstoned endpoints on its next call
    mutator.remove(corpus.filter(pmod(col("doc_id"), lit(7)) === 0)
      .select(col("doc_id")))
    val served = reader.nearDupsOfDelta(delta, "text", minJaccard = 0.8)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(served.forall(id => id % 4 == 0 || id % 7 != 0),
      "reader handle served tombstoned endpoints after another handle's remove")
    // compact through the other handle (atomic swap replaces every
    // file): the reader's next read serves the compacted generation
    LshStore.compact(mutator, targetFiles = 2)
    assert(reader.shingles.count() ==
      docs.filter(pmod(col("doc_id"), lit(4)) === 0 ||
        pmod(col("doc_id"), lit(7)) =!= 0).count(),
      "reader handle must follow the compact swap on its next read")
    assert(reader.removedIds.count() == 0L, "compact clears the ledger")
  }
}
