package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {

  private def one(text: String) = {
    val sp = spark; import sp.implicits._
    Seq(Tuple1(text)).toDF("text")
  }

  test("wordCount: empty, blank, single, multi-space") {
    val sp = spark; import sp.implicits._
    val df = Seq("", "   ", "one", "one two", "a  b\t c\nd").toDF("text")
    val counts = df.select(TextFunctions.wordCount(col("text"))).collect().map(_.getInt(0))
    assert(counts.toSeq === Seq(0, 0, 1, 2, 4))
  }

  test("bpe-ish token count splits letter runs, digit runs, symbols") {
    val r = one("ab12!c d3.14").select(TextFunctions.bpeIshTokenCount(col("text"))).first()
    // ab | 12 | ! | c | d | 3 | . | 14  => 8
    assert(r.getInt(0) === 8)
  }

  test("wordShingles: short doc collapses to single whole-text shingle") {
    val r = one("just two").select(TextFunctions.wordShingles(col("text"), 3)).first()
    assert(r.getSeq[String](0) === Seq("just two"))
  }

  test("wordShingles: distinct trigram shingles in order") {
    val r = one("a b c d a b c d").select(TextFunctions.wordShingles(col("text"), 3)).first()
    assert(r.getSeq[String](0) === Seq("a b c", "b c d", "c d a", "d a b"))
  }

  test("langId picks marker-dominant language; und when no markers") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      "the cat and the dog of the house",
      "le chat et la maison et le chien",
      "der Hund und die Katze und der Vogel",
      "el gato y los perros y el pajaro",
      "xyzzy qwerty asdf").toDF("text")
    val langs = df.select(TextFunctions.langId(col("text"))).collect().map(_.getString(0))
    assert(langs.toSeq === Seq("en", "fr", "de", "es", "und"))
  }

  test("fingerprint is invariant to word order and duplication") {
    val sp = spark; import sp.implicits._
    val df = Seq("the quick brown fox", "fox brown THE quick the", "other words").toDF("text")
    val fps = df.select(TextFunctions.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("qualityScore stays in [0,1] on the real corpus") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val mm = docs.select(TextFunctions.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).first()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }
}
