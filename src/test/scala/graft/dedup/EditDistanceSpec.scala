package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EditDistanceSpec extends SparkSpec {

  test("pairs: band pruning loses nothing vs the unpruned cross join (incl. bucket boundaries)") {
    val sp = spark; import sp.implicits._
    // strings straddling bucket boundaries for maxDist=3 (width 4):
    // lengths 3|4 and 7|8 sit in adjacent buckets but within the band
    val docs = Seq(
      (1L, "abc"), (2L, "abcd"), (3L, "abcde"),
      (4L, "abcdefg"), (5L, "abcdefgh"), (6L, "zzzzzzzz"),
      (7L, "abc")).toDF("doc_id", "text")

    val banded = EditDistance.pairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("dist"))).toSet

    val crossRef = docs.as("a").join(docs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.text"), col("b.text")).cast("long").as("d"))
      .filter(col("d") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(banded === crossRef, "band join must find exactly the cross-join pairs")
    assert(banded.contains((1L, 7L, 0L)), "identical docs at distance 0")
    assert(banded.contains((4L, 5L, 1L)), "adjacent-bucket pair must survive")
    assert(!banded.exists { case (a, b, _) => (a, b) == (5L, 6L) },
      "same-length far strings filtered by the DP")
  }

  test("pairs: each pair produced exactly once, maxDist=0 means exact duplicates") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "same"), (2L, "same"), (3L, "diff")).toDF("doc_id", "text")
    val out = EditDistance.pairs(docs, "doc_id", "text", maxDist = 0).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 1L && out.head.getLong(1) === 2L &&
      out.head.getAs[Long]("dist") === 0L)
    // no cartesian in the plan: candidates come from the bucket equi-join
    val plan = EditDistance.pairs(docs, "doc_id", "text", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"expected an equi-join plan:\n$plan")
  }

  test("pairs: histogram prefilter loses nothing on randomized corpora (incl. empty strings)") {
    val sp = spark; import sp.implicits._
    // adversarial shape for the histogram bound: tiny alphabet (diffs
    // cancel across bins), duplicated lengths, empty and 1-char strings
    val rng = new scala.util.Random(20260813)
    val alpha = "abAB !"
    val strs = (1L to 60L).map { i =>
      val n = rng.nextInt(12) // 0..11 chars
      i -> (0 until n).map(_ => alpha(rng.nextInt(alpha.length))).mkString
    }
    val docs = strs.toDF("doc_id", "text")
    for (maxDist <- Seq(0, 1, 3)) {
      val banded = EditDistance.pairs(docs, "doc_id", "text", maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("dist"))).toSet
      val brute = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"),
          levenshtein(col("a.text"), col("b.text")).cast("long").as("d"))
        .filter(col("d") <= maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(banded === brute, s"maxDist=$maxDist")
    }
  }

  test("CharHistogram kernel: one-pass counts match per-codepoint counting, incl. edges") {
    val sp = spark; import sp.implicits._
    val texts = Seq(
      (1L, "abc abc"), (2L, ""), (3L, "Ω≈ç√∫ 漢字"), (4L, "😀 emoji"),
      (5L, null.asInstanceOf[String]))
    val df = texts.toDF("id", "text")
    val got = df.select(col("id"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.dedup.CharHistogram(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("text")))).as("h"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Int](1))).toMap
    texts.foreach { case (id, s) =>
      if (s == null) assert(got(id) == null)
      else {
        val want = new Array[Int](32)
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i); want(cp % 32) += 1; i += Character.charCount(cp)
        }
        assert(got(id).toArray.toSeq == want.toSeq, s"id=$id")
        assert(got(id).sum == s.codePointCount(0, s.length), s"id=$id total")
      }
    }
  }

  test("lshPairs: the LSH route recovers the exact near-dup pairs on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val exact = EditDistance.pairs(docs, "doc_id", "text", maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("dist"))).toSet
    val lsh = EditDistance.lshPairs(docs, "doc_id", "text", maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("dist"))).toSet
    // LSH is a subset of exact (DP verify removes false positives) and
    // at 32 bands of 4 hashes recall on near-identical docs is ~1
    assert(lsh.subsetOf(exact), "verified LSH pairs must all be true near-dups")
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.9, s"LSH recall too low: $recall (${lsh.size}/${exact.size})")
    }
  }
}
