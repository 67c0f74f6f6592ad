package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.ann.{Ann, SrpStore}
import graft.operators.{KCore, PairGraphStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end streaming semantic-ingestion contract: after any
  * sequence of micro-batches (including replays and crash windows),
  * the SRP index, the pair graph, and the maintained cores all equal
  * what a from-scratch batch build over the full corpus produces. */
class StreamingSemanticIngestSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("semingest").toString

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")
  private def corpus0 = emb.filter(col("vec_id") % 3 === 0)
  private def batch1 = emb.filter(col("vec_id") % 3 === 1)
  private def batch2 = emb.filter(col("vec_id") % 3 === 2)

  private def fullPairs: DataFrame =
    Ann.lshNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.35, nBits = 8, tables = 8, dim = 64, maxBucketSize = 10000)

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("vec_a"), col("vec_b"), col("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def setup(dir: String): (SrpStore.Handle, PairGraphStore.Handle) = {
    val srp = SrpStore.build(corpus0, "vec_id", "embedding", s"$dir/srp")
    val seedPairs = Ann.lshNearDupPairs(corpus0, "vec_id", "embedding",
      threshold = 0.35, nBits = 8, tables = 8, dim = 64, maxBucketSize = 10000)
    val graph = PairGraphStore.build(
      seedPairs, "vec_a", "vec_b", Some("cos"), s"$dir/graph")
    graph.ensureCores(3)
    (srp, graph)
  }

  private def check(graph: PairGraphStore.Handle): Unit = {
    assert(pairSet(graph.edges) == pairSet(fullPairs),
      "graph edges must equal the from-scratch full build")
    val wantCores = KCore.coreNumbers(fullPairs, "vec_a", "vec_b", 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val gotCores = graph.ensureCores(3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotCores == wantCores, "maintained cores must equal from-scratch")
  }

  test("two ingested batches equal a from-scratch build of the full corpus") {
    val dir = tmp()
    val (srp, graph) = setup(dir)
    StreamingSemanticIngest.process(batch1, srp, graph, maxK = 3)
    StreamingSemanticIngest.process(batch2, srp, graph, maxK = 3)
    check(graph)
    assert(srp.vectors.count() == emb.count())
  }

  test("replayed batch after full absorption is a no-op") {
    val dir = tmp()
    val (srp, graph) = setup(dir)
    StreamingSemanticIngest.process(batch1, srp, graph, maxK = 3)
    val edges = graph.edgeCount
    val vecs = srp.vectors.count()
    StreamingSemanticIngest.process(batch1, srp, graph, maxK = 3)
    assert(graph.edgeCount == edges && srp.vectors.count() == vecs)
  }

  test("crash window — pairs folded into the graph but SRP not appended: replay heals") {
    val dir = tmp()
    val (srp, graph) = setup(dir)
    // the crash: step 2 (graph fold) completed, step 3 (srp.append)
    // did not — the SRP store still thinks batch1 is unseen
    val pairs = srp.nearDupsOfDelta(batch1)
    graph.appendAndMaintainCores(pairs, maxK = 3)
    // redelivery runs the full step: same pairs re-derived (seeded
    // signatures), edge dedup + stale-tolerant maintenance converge,
    // the SRP append completes
    StreamingSemanticIngest.process(batch1, srp, graph, maxK = 3)
    StreamingSemanticIngest.process(batch2, srp, graph, maxK = 3)
    check(graph)
  }

  test("file-stream drive equals the direct process calls") {
    val dir = tmp()
    val in = s"$dir/in"
    new java.io.File(in).mkdirs()
    batch1.select(col("vec_id"), col("embedding")).write.parquet(s"$in/b1")
    batch2.select(col("vec_id"), col("embedding")).write.parquet(s"$in/b2")
    val (srp, graph) = setup(dir)
    val schema = spark.read.parquet(s"$in/b1").schema
    val q = StreamingSemanticIngest.stream(spark, s"$in/*/", schema,
      srp, graph, maxK = 3, checkpointDir = s"$dir/ckpt")
    q.awaitTermination(180000)
    check(graph)
  }
}
