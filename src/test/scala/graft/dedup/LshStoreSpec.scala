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
}
