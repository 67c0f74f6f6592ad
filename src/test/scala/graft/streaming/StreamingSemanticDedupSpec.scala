package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming semantic dedup: SemanticDedup.keepers composed over
  * micro-batches against a persistent keeper state.
  */
class StreamingSemanticDedupSpec extends SparkSpec {

  private val D = 8
  private def vec(parts: (Int, Float)*): Array[Float] = {
    val a = new Array[Float](D)
    parts.foreach { case (i, v) => a(i) = v }
    a
  }
  private val eA = vec(0 -> 1.0f)
  private val eAish = vec(0 -> 1.0f, 1 -> 0.01f) // cos(eA, eAish) ≈ 0.99995
  private val eB = vec(1 -> 1.0f)
  private val eC = vec(2 -> 1.0f)

  test("two drains: in-batch keeper survives, history contamination rejects, replay ignored") {
    val sp = spark; import sp.implicits._
    val state = Files.createTempDirectory("semstate").toString + "/state"

    // batch 1: docs 1 and 2 are semantic dups (one component, keeper
    // 1); doc 3 is orthogonal; doc 3 is ALSO delivered twice within
    // the batch (at-least-once source) — exactly one copy may land in
    // state
    var admitted1: Seq[Long] = Nil
    StreamingSemanticDedup.process(spark,
      Seq((1L, eA), (2L, eAish), (3L, eB), (3L, eB)).toDF("doc_id", "embedding"),
      state, threshold = 0.9, dim = D,
      onAdmitted = ids => admitted1 = ids.as[Long].collect().sorted.toSeq)
    assert(admitted1 === Seq(1L, 3L))
    assert(spark.read.parquet(state).select("doc").as[Long].collect().sorted.toSeq
      === Seq(1L, 3L))

    // batch 2: doc 10 near-dups admitted 1 -> rejected; doc 0 ALSO
    // near-dups admitted 1 and its id is SMALLER than every admitted
    // member — contamination must beat the kept flag, or it would be
    // falsely admitted as its component's minimum; doc 11 is new; doc
    // 3 is a replayed id -> ignored, not re-admitted
    var admitted2: Seq[Long] = Nil
    StreamingSemanticDedup.process(spark,
      Seq((10L, eAish), (0L, eAish), (11L, eC), (3L, eB)).toDF("doc_id", "embedding"),
      state, threshold = 0.9, dim = D,
      onAdmitted = ids => admitted2 = ids.as[Long].collect().sorted.toSeq)
    assert(admitted2 === Seq(11L))
    assert(spark.read.parquet(state).select("doc").as[Long].collect().sorted.toSeq
      === Seq(1L, 3L, 11L))
    // no replay duplicates in state
    assert(spark.read.parquet(state).groupBy("doc").count()
      .filter(col("count") > 1).isEmpty)

    // compaction: appends leave many small files; compacting preserves
    // content and admission behavior
    def stateFiles = new java.io.File(state).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val before = stateFiles
    StreamingSemanticDedup.compactState(spark, state, targetFiles = 1)
    assert(stateFiles === 1 && before > 1)
    var admitted3: Seq[Long] = Nil
    StreamingSemanticDedup.process(spark,
      Seq((20L, eA)).toDF("doc_id", "embedding"),
      state, threshold = 0.9, dim = D,
      onAdmitted = ids => admitted3 = ids.as[Long].collect().sorted.toSeq)
    assert(admitted3 === Nil, "compacted state still rejects semantic dups")
    assert(spark.read.parquet(state).select("doc").as[Long].collect().sorted.toSeq
      === Seq(1L, 3L, 11L))
  }

  test("streaming drive: drop-dir drain admits through the same state") {
    val sp = spark; import sp.implicits._
    val root = Files.createTempDirectory("semstream")
    val streamDir = root.toString + "/in"
    val state = root.toString + "/state"
    val ckpt = root.toString + "/ckpt"

    val rows = Seq((1L, eA), (2L, eAish), (3L, eB)).toDF("doc_id", "embedding")
    rows.write.parquet(streamDir)
    val q = StreamingSemanticDedup.start(spark, streamDir, state, ckpt,
      rows.schema, threshold = 0.9, dim = D)
    q.awaitTermination(60000)
    assert(spark.read.parquet(state).select("doc").as[Long].collect().sorted.toSeq
      === Seq(1L, 3L))
  }
}
