package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ChunkerSpec extends SparkSpec {

  test("chunk: stable ids, offsets, overlap and lossless reconstruction") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz"), // 26 chars -> 3 chunks at 10/2
      (2L, "short"),                      // single chunk
      (3L, ""),                           // empty doc still yields one chunk
      (4L, null.asInstanceOf[String])     // null text counts as empty
    ).toDF("doc_id", "text")
    val out = Chunker.chunk(docs, chunkSize = 10, overlap = 2)
      .orderBy($"doc_id", $"chunk_idx").collect()

    val d1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    // stride 8: ceil((26-10)/8)=2 -> 3 chunks at offsets 0,8,16
    assert(d1.map(_.getAs[Long]("chunk_start")).toSeq === Seq(0L, 8L, 16L))
    assert(d1.map(_.getAs[String]("chunk_text")).toSeq ===
      Seq("abcdefghij", "ijklmnopqr", "qrstuvwxyz"))
    assert(d1.forall(_.getAs[Long]("n_chunks") == 3L))
    // consecutive chunks share exactly `overlap` characters
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[String]("chunk_text").takeRight(2) ===
        b.getAs[String]("chunk_text").take(2))
    }
    // reconstruction: first `stride` chars of each chunk + last chunk
    val rebuilt = d1.init.map(_.getAs[String]("chunk_text").take(8)).mkString +
      d1.last.getAs[String]("chunk_text")
    assert(rebuilt === "abcdefghijklmnopqrstuvwxyz")

    val d2 = out.filter(_.getAs[Long]("doc_id") == 2L)
    assert(d2.length === 1 && d2.head.getAs[String]("chunk_text") === "short")
    val d3 = out.filter(_.getAs[Long]("doc_id") == 3L)
    assert(d3.length === 1 && d3.head.getAs[String]("chunk_text") === "")
    // every doc_id survives into the chunk table — including null text
    val d4 = out.filter(_.getAs[Long]("doc_id") == 4L)
    assert(d4.length === 1 && d4.head.getAs[String]("chunk_text") === "")
  }

  test("chunk: last-chunk boundary cases and full coverage at scale sizes") {
    val sp = spark; import sp.implicits._
    // len exactly chunkSize, one past, and len == k*stride + chunkSize
    val docs = Seq(128, 129, 96 * 3 + 128, 553).zipWithIndex
      .map { case (n, i) => (i.toLong, "x" * n) }.toDF("doc_id", "text")
    val out = Chunker.chunk(docs, chunkSize = 128, overlap = 32)
      .groupBy($"doc_id")
      .agg(max($"chunk_start" + length($"chunk_text")).as("covered"),
        max(length($"text")).as("len"), count(lit(1)).as("n"),
        max($"n_chunks").as("n_chunks"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("covered") === r.getAs[Int]("len").toLong,
        s"chunks must cover the doc: $r")
      assert(r.getAs[Long]("n") === r.getAs[Long]("n_chunks"))
    }
    // no shuffle in the plan: chunking is a narrow generator projection
    val plan = Chunker.chunk(docs, chunkSize = 128, overlap = 32)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }
}
