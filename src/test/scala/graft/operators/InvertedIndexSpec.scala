package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class InvertedIndexSpec extends SparkSpec {

  test("phraseSearch: consecutive-only matches, overlaps, repeated words, counts and positions") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),          // single match at 2
      (2L, "quick brown quick brown fox"),  // two matches (1, 3)
      (3L, "brown quick"),                  // reversed order: no match
      (4L, "quick x brown"),                // gap: no match
      (5L, "go go go"),                     // repeated-word phrase test
      (6L, "")                              // empty doc: no postings
    ).toDF("doc_id", "text")

    val m = InvertedIndex.phraseSearch(docs, "doc_id", "text", Seq("quick", "brown"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos"))).toMap
    assert(m === Map(1L -> (1L, 2L), 2L -> (2L, 1L)))

    // overlapping occurrences of a repeated-word phrase: "go go" in
    // "go go go" matches at anchors 1 and 2
    val g = InvertedIndex.phraseSearch(docs, "doc_id", "text", Seq("go", "go"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_matches")).toMap
    assert(g === Map(5L -> 2L))

    // case-insensitive on both sides
    val ci = InvertedIndex.phraseSearch(docs, "doc_id", "text", Seq("QUICK", "Brown"))
      .count()
    assert(ci === 2)
  }

  test("allTermsSearch: conjunction semantics and hit counting") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "a b c a"),  // has a,b,c; 4 hits for {a,b,c}... a twice
      (2L, "a b"),      // missing c
      (3L, "c c c a b") // all three, 5 hits
    ).toDF("doc_id", "text")
    val r = InvertedIndex.allTermsSearch(docs, "doc_id", "text", Seq("a", "b", "c"))
      .collect().map(x => x.getLong(0) -> x.getAs[Long]("n_hits")).toMap
    assert(r === Map(1L -> 4L, 3L -> 5L))
    // duplicate query terms must not change the required distinct count
    val dup = InvertedIndex.allTermsSearch(docs, "doc_id", "text", Seq("a", "A", "b", "c"))
      .collect().map(_.getLong(0)).toSet
    assert(dup === Set(1L, 3L))
  }

  test("bm25Search: rare terms outweigh common ones, tf saturates, top-k plan bounded") {
    val sp = spark; import sp.implicits._
    // 'rare' appears in 1 of 6 docs, 'common' in 5 — doc 1 (rare hit)
    // must outrank doc 2 (common hit) despite equal tf
    val docs = Seq(
      (1L, "rare filler filler filler"),
      (2L, "common filler filler filler"),
      (3L, "common x y z"), (4L, "common a b c"),
      (5L, "common d e f"), (6L, "common g h i")
    ).toDF("doc_id", "text")
    val r = InvertedIndex.bm25Search(docs, "doc_id", "text", Seq("rare", "common"), k = 6)
      .collect().map(x => x.getLong(0) -> x.getAs[Double]("score")).toMap
    assert(r(1L) > r(2L), s"rare-term doc must outrank common-term doc: $r")

    // tf saturation: doubling tf must gain less than the first hit (k1 bound)
    val sat = Seq((1L, "t filler"), (2L, "t t filler")).toDF("doc_id", "text")
    val s = InvertedIndex.bm25Search(sat, "doc_id", "text", Seq("t"), k = 2)
      .collect().map(x => x.getLong(0) -> x.getAs[Double]("score")).toMap
    assert(s(2L) > s(1L) && s(2L) < 2 * s(1L), s"tf must saturate: $s")

    // the global sort is a TakeOrdered, not a full exchange+sort
    val plan = InvertedIndex.bm25Search(docs, "doc_id", "text", Seq("rare"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected bounded top-k:\n$plan")
  }

  test("proximitySearch: slop window, unordered, multiple co-occurrences") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "x a y b z"),        // |2-4| = 2: within slop 2
      (2L, "b x x x a"),        // reversed order, distance 4: only slop >= 4
      (3L, "a x x x x x b"),    // distance 6: outside slop 4
      (4L, "a b x a")           // pairs (1,2)=1 and (4,2)=2
    ).toDF("doc_id", "text")
    val r2 = InvertedIndex.proximitySearch(docs, "doc_id", "text", "a", "b", slop = 2)
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_pairs"), r.getAs[Long]("min_distance"))).toMap
    assert(r2 === Map(1L -> (1L, 2L), 4L -> (2L, 1L)))
    val r4 = InvertedIndex.proximitySearch(docs, "doc_id", "text", "a", "b", slop = 4)
      .collect().map(_.getLong(0)).toSet
    assert(r4 === Set(1L, 2L, 4L), "unordered: reversed order within slop matches")
    // identical terms (after case folding) would double-count pairs
    intercept[IllegalArgumentException](
      InvertedIndex.proximitySearch(docs, "doc_id", "text", "a", "A", slop = 2))
  }

  test("postings: 1-based positions, lowercased terms, empty docs contribute nothing") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, " Hello  world "), (2L, "   ")).toDF("doc_id", "text")
    val p = InvertedIndex.postings(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("pos"))).toSet
    assert(p === Set(("hello", 1L, 1L), ("world", 1L, 2L)))
  }
}
