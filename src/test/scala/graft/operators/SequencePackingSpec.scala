package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SequencePackingSpec extends SparkSpec {

  test("concatChunk: contiguous offsets per shard, correct chunk spans, zero-token docs dropped") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 500L), ("a", 4L, 0L),
      ("b", 5L, 1200L)).toDF("shard", "id", "toks")
    val out = SequencePacking.concatChunk(docs, "shard", "id", col("toks"), seqLen = 512)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("start_off"), r.getAs[Long]("chunk_first"),
          r.getAs[Long]("chunk_last"), r.getAs[Long]("n_chunks_spanned"))).toMap

    assert(!out.contains(4L), "zero-token docs occupy no stream space")
    assert(out(1L) === (0L, 0L, 0L, 1L))          // [0, 300)   in chunk 0
    assert(out(2L) === (300L, 0L, 1L, 2L))        // [300, 600) spans 0-1
    assert(out(3L) === (600L, 1L, 2L, 2L))        // [600, 1100) spans 1-2
    assert(out(5L) === (0L, 0L, 2L, 3L))          // shard b restarts at 0

    // offsets are contiguous: each doc starts where the previous ended
    val a = SequencePacking.concatChunk(docs, "shard", "id", col("toks"), 512)
      .filter(col("shard") === "a").orderBy("id").collect()
    a.sliding(2).foreach { case Array(p, n) =>
      assert(n.getAs[Long]("start_off") ===
        p.getAs[Long]("start_off") + p.getAs[Long]("n_tokens"))
    }
  }

  test("concatChunk is partitioning-invariant and rejects non-positive seqLen") {
    val sp = spark; import sp.implicits._
    val docs = (1L to 100L).map(i => (s"s${i % 3}", i, 37L + i % 11)).toDF("shard", "id", "toks")
    val one = SequencePacking.concatChunk(docs, "shard", "id", col("toks"), 128)
    val two = SequencePacking.concatChunk(docs.repartition(17), "shard", "id", col("toks"), 128)
    assert(one.exceptAll(two).isEmpty && two.exceptAll(one).isEmpty)
    intercept[IllegalArgumentException](
      SequencePacking.concatChunk(docs, "shard", "id", col("toks"), 0))
  }
}
