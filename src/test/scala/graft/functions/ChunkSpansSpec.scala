package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ChunkSpansSpec extends SparkSpec {

  test("chunk_spans generator matches the Chunker operator on the real corpus") {
    val sp = spark; import sp.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    docs.createOrReplaceTempView("cs_docs")

    val viaGenerator = spark.sql(
      """SELECT doc_id, c.chunk_idx, c.chunk_start, c.chunk_text
        |FROM cs_docs LATERAL VIEW chunk_spans(text, 128, 32) c
        |""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet

    val viaOperator = graft.operators.Chunker.chunk(docs, chunkSize = 128, overlap = 32)
      .select($"doc_id", $"chunk_idx", $"chunk_start", $"chunk_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet

    assert(viaGenerator === viaOperator,
      "generator and operator must produce identical chunk tables")
    assert(viaGenerator.nonEmpty)
  }

  test("chunk_spans: null text yields one empty chunk; invalid constants fail analysis") {
    val sp = spark; import sp.implicits._
    Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .createOrReplaceTempView("cs_null")
    val r = spark.sql(
      "SELECT c.* FROM cs_null LATERAL VIEW chunk_spans(text, 10, 2) c").collect()
    assert(r.length === 1 && r.head.getString(2) === "")

    intercept[Exception] {
      spark.sql("SELECT chunk_spans('abc', 0, 0)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT chunk_spans('abc', 10, 10)").collect()
    }
  }
}
