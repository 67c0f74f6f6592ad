package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // ten filler tokens so surrounding context is unique per doc
  private def filler(tag: String): String =
    (1 to 10).map(i => s"u$tag$i").mkString(" ")

  test("a shared 8-token block across two docs becomes one span in each") {
    val block = "the quick brown fox jumps over the lazy" // 8 tokens
    val d = df(
      1L -> s"${filler("a")} $block ${filler("b")}",
      2L -> s"${filler("c")} $block ${filler("d")}",
      3L -> filler("e"))
    val spans = SpanDedup.repeatedSpans(d, "doc_id", "text", windowTokens = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    // block occupies tokens 10..18 (exclusive) in both docs; exactly
    // one 8-window matches -> span [10, 18), 1 window
    assert(spans === Set((1L, 10, 18, 1L), (2L, 10, 18, 1L)))
  }

  test("longer shared runs merge into one maximal span; unrelated docs stay clean") {
    val run = (1 to 20).map(i => s"shared$i").mkString(" ") // 20 tokens
    val d = df(
      1L -> s"${filler("a")} $run ${filler("b")}",
      2L -> s"$run ${filler("c")}",
      3L -> filler("d"))
    val spans = SpanDedup.repeatedSpans(d, "doc_id", "text", windowTokens = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    // 20-token run = 13 consecutive windows -> ONE merged span of 20
    // tokens per doc (offsets differ: doc 1 starts at 10, doc 2 at 0)
    assert(spans === Set((1L, 10, 30, 13L), (2L, 0, 20, 13L)))
  }

  test("within-doc repetition is duplication too") {
    val block = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val d = df(1L -> s"$block ${filler("mid")} $block")
    val spans = SpanDedup.repeatedSpans(d, "doc_id", "text", windowTokens = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans === Set((1L, 0, 8), (1L, 18, 26)))
  }

  test("stripRepeatedSpans cuts every occurrence and counts dropped tokens") {
    val block = "one two three four five six seven eight"
    val d = df(
      1L -> s"${filler("a")} $block",
      2L -> s"$block ${filler("b")}",
      3L -> "untouched text stays put")
    val out = SpanDedup.stripRepeatedSpans(d, "doc_id", "text", windowTokens = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === ((filler("a"), 8L)))
    assert(out(2L) === ((filler("b"), 8L)))
    // untouched docs come back whitespace/case-normalized, nothing dropped
    assert(out(3L) === (("untouched text stays put", 0L)))
  }

  test("tokenization is case-insensitive and whitespace-collapsing") {
    val d = df(
      1L -> "The  Quick\tBrown Fox Jumps Over The Lazy dog end1",
      2L -> "the quick brown fox jumps over the lazy dog end2")
    val spans = SpanDedup.repeatedSpans(d, "doc_id", "text", windowTokens = 8)
    // 'the quick brown fox jumps over the lazy' + 'quick ... dog':
    // 9 shared leading tokens -> one merged span [0, 9) x 2 windows
    val rows = spans.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(rows === Set((1L, 0, 9, 2L), (2L, 0, 9, 2L)))
  }

  test("docs shorter than one window never error and never match") {
    val d = df(1L -> "tiny doc", 2L -> "tiny doc", 3L -> "")
    assert(SpanDedup.repeatedSpans(d, "doc_id", "text", windowTokens = 8).count() === 0)
    val stripped = SpanDedup.stripRepeatedSpans(d, "doc_id", "text", windowTokens = 8)
    assert(stripped.filter(col("n_dropped_tokens") =!= 0L).count() === 0)
  }

  test("q138 oracle parity shape on real documents (spans exist, plan has no cartesian)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val spans = SpanDedup.repeatedSpans(docs, "doc_id", "text", windowTokens = 8)
    val plan = spans.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(spans.count() > 0)
  }
}
