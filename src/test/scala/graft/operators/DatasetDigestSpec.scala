package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DatasetDigestSpec extends SparkSpec {

  test("digest: order/layout invariant, shard-distributive, content sensitive") {
    val sp = spark; import sp.implicits._
    val docs = (1L to 300L).map(i => (i, s"text $i")).toDF("doc_id", "text")

    val base = DatasetDigest.digest(docs)
    assert(DatasetDigest.digest(docs.repartition(13)) === base,
      "digest must not depend on partitioning")
    assert(DatasetDigest.digest(docs.orderBy($"doc_id".desc)) === base,
      "digest must not depend on order")

    // distributes over a disjoint split: XOR of part digests == whole
    val a = DatasetDigest.digest(docs.filter($"doc_id" <= 100))
    val b = DatasetDigest.digest(docs.filter($"doc_id" > 100))
    assert((a ^ b) === base, "shard digests must XOR to the corpus digest")

    // one changed row flips the digest
    val tweaked = docs.withColumn("text",
      when($"doc_id" === 7, "TEXT 7").otherwise($"text"))
    assert(DatasetDigest.digest(tweaked) !== base)

    // empty frame digests to 0 (XOR identity)
    assert(DatasetDigest.digest(docs.filter($"doc_id" < 0)) === 0L)
  }

  test("digest: escape prevents field-boundary forgery; paired duplicates cancel as documented") {
    val sp = spark; import sp.implicits._
    // ("a|b", "c") must differ from ("a", "b|c") — the escape keeps
    // field boundaries honest
    val x = DatasetDigest.digest(Seq(("a|b", "c")).toDF("u", "v"))
    val y = DatasetDigest.digest(Seq(("a", "b|c")).toDF("u", "v"))
    assert(x !== y)
    // ...including when a trailing backslash tries to neutralize the
    // escaped separator: ("\", "|") vs ("|\", "") collide if only the
    // separator is escaped (the escape char must be escaped FIRST)
    val bs1 = DatasetDigest.digest(Seq(("\\", "|")).toDF("u", "v"))
    val bs2 = DatasetDigest.digest(Seq(("|\\", "")).toDF("u", "v"))
    assert(bs1 !== bs2, "backslash must not forge a field boundary")

    // the documented multiplicity caveat: an even number of copies of
    // the same row cancels — include a unique id when that matters
    val twice = Seq(("dup", 1), ("dup", 1)).toDF("t", "k")
    assert(DatasetDigest.digest(twice) === 0L)

    // a column name carrying a backtick must not break (or escape) the
    // generated identifier quoting
    val weird = Seq(("x", 1), ("y", 2)).toDF("a`b", "k")
    assert(DatasetDigest.digest(weird, Seq("a`b", "k")) !== 0L)
    assert(DatasetDigest.digest(weird.repartition(3), Seq("a`b", "k")) ===
      DatasetDigest.digest(weird, Seq("a`b", "k")))
  }

  test("writeShards round trip: shard dirs reassemble to the source digest") {
    val sp = spark; import sp.implicits._
    val docs = (1L to 200L).map(i => (i, s"payload $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("digest_shards").toString
    CorpusShuffle.writeShards(docs, "doc_id", 4, "dg", dir)
    val readBack = spark.read.parquet(dir).select("doc_id", "text")
    assert(DatasetDigest.digest(readBack, Seq("doc_id", "text")) ===
      DatasetDigest.digest(docs, Seq("doc_id", "text")),
      "export must carry exactly the source rows")
  }
}
