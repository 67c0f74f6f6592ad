package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-modal consistency/retrieval semantics: cosine correctness on
  * known vectors, zero-norm null, report aggregation, own-match and
  * recall@k over a served frame, and the store-served retrieval route
  * equal to brute force at the degenerate family. */
class CrossModalSpec extends SparkSpec {

  private def paired = {
    val sp = spark; import sp.implicits._
    Seq(
      // identical modalities -> consistency 1
      (0L, "image", Seq(1.0, 0.0, 0.0), Seq(2.0, 0.0, 0.0)),
      // orthogonal -> 0
      (1L, "image", Seq(1.0, 0.0, 0.0), Seq(0.0, 3.0, 0.0)),
      // opposite -> -1
      (2L, "audio", Seq(0.0, 1.0, 0.0), Seq(0.0, -1.0, 0.0)),
      // zero-norm caption -> null (unservable)
      (3L, "audio", Seq(1.0, 1.0, 0.0), Seq(0.0, 0.0, 0.0))
    ).toDF("media_id", "kind", "img_emb", "cap_emb")
  }

  test("consistency: cosine per pair, null on zero norm") {
    val got = CrossModal.consistency(paired, "media_id", "kind",
        "img_emb", "cap_emb")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(math.rint(r.getDouble(2) * 1e6) / 1e6)))
      .toMap
    assert(got(0L).contains(1.0))
    assert(got(1L).contains(0.0))
    assert(got(2L).contains(-1.0))
    assert(got(3L).isEmpty, "zero-norm modality must be null, not 0 or NaN")
  }

  test("consistencyReport: per-kind rollup counts flags below tau") {
    val rows = CrossModal.consistencyReport(paired, "media_id", "kind",
        "img_emb", "cap_emb", tau = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getLong(4))).toMap
    // image: cos {1, 0} -> n=2, min=0, one below 0.5
    assert(rows("image") == ((2L, 0.0, 1L)))
    // audio: cos {-1, null} -> n=2 rows, min=-1, one below tau (null
    // doesn't count — an unservable row is a decode problem, not a
    // misalignment)
    assert(rows("audio") == ((2L, -1.0, 1L)))
  }

  test("ownMatch + recallAtK over a served top-k frame") {
    val sp = spark; import sp.implicits._
    val served = Seq(
      (0L, 0L, 0.99, 1), (0L, 7L, 0.90, 2),  // own at rank 1
      (1L, 5L, 0.80, 1), (1L, 1L, 0.70, 2),  // own at rank 2
      (2L, 9L, 0.60, 1), (2L, 4L, 0.50, 2)   // own missing
    ).toDF("query_id", "neighbor_id", "cos", "rnk")
    val om = CrossModal.ownMatch(served)
      .filter($"own_match").select($"query_id", $"rnk")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(om == Set((0L, 1), (1L, 2)))
    val r1 = CrossModal.recallAtK(served, 1).collect()(0)
    assert(r1.getLong(0) == 3L && math.abs(r1.getDouble(1) - 1.0 / 3) < 1e-6)
    val r2 = CrossModal.recallAtK(served, 2).collect()(0)
    assert(math.abs(r2.getDouble(1) - 2.0 / 3) < 1e-6)
  }

  test("store-served cross-modal retrieval equals brute force (degenerate family)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val hi = md5(col("text").cast("binary"))
    val hc = md5(concat(lit("cap:"), col("text")).cast("binary"))
    def byteAt(h: org.apache.spark.sql.Column, d: Int) =
      conv(substring(h, 2 * d + 1, 2), 16, 10).cast("long").cast("double")
    val both = docs.select(col("doc_id").as("media_id"),
      array((0 until 16).map(d => byteAt(hi, d) / 256.0): _*).as("img_emb"),
      array((0 until 16).map(d =>
        (lit(3.0) * byteAt(hi, d) + byteAt(hc, d)) / 1024.0): _*).as("cap_emb"))
    val queries = both.filter(col("media_id") < 5)
      .select(col("media_id").as("qid"), col("img_emb").as("qvec"))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_xmodal_spec_${System.nanoTime()}"
    val cfg = graft.ann.SrpStore.Config(nBits = 1, tables = 1, dim = 16, seed = 42L)
    val served = graft.ann.SrpStore.ensure(
        both.select(col("media_id"), col("cap_emb")), "media_id", "cap_emb",
        spark, path, cfg)
      .topK(queries, "qid", "qvec", k = 5)
    val brute = graft.ann.Ann.bruteForceTopK(
      both.select(col("media_id"), col("cap_emb")), queries,
      "media_id", "cap_emb", "qid", "qvec", 5)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 4), col("rnk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    assert(canon(served) == canon(brute))
  }
}
