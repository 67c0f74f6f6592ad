package graft.dedup

import graft.SparkSpec

class ParagraphDedupSpec extends SparkSpec {

  test("cross-doc and within-doc repeated paragraphs collapse; reassembly preserves order") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "intro one\n\nshared footer\n\nbody one"),
      (2L, "intro two\n\nshared footer\n\nbody two"), // footer seen in doc 1
      (3L, "dup para\n\ndup para"),                   // within-doc repeat
      (4L, "shared footer"))                          // nothing new left
      .toDF("doc_id", "text")
    val out = ParagraphDedup.dedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("intro one\n\nshared footer\n\nbody one", 3L)))
    assert(out(2L) === (("intro two\n\nbody two", 2L)))
    assert(out(3L) === (("dup para", 1L)))
    assert(out(4L) === (("", 0L)))
  }

  test("custom separator and empty input") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "a|b|a"), (2L, "b|c")).toDF("doc_id", "text")
    val out = ParagraphDedup.dedup(docs, "doc_id", "text", sep = "|")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "a|b")
    assert(out(2L) === "c")
    assert(ParagraphDedup.dedup(docs.limit(0), "doc_id", "text").count() === 0)
  }
}
