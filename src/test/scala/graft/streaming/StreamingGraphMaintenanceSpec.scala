package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.operators.{KCore, PairGraphStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class StreamingGraphMaintenanceSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graphmaint").toString

  private def coresOf(edges: DataFrame, maxK: Int): Map[Long, Int] =
    KCore.coreNumbers(edges, "a", "b", maxK).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def storedCores(h: PairGraphStore.Handle, maxK: Int): Map[Long, Int] =
    h.ensureCores(maxK).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  // K4 (1-2-3-4) as the seed graph; batches grow a tail and then
  // close it into a cycle (the planted cascade from KCoreSpec)
  private def seed = {
    val sp = spark; import sp.implicits._
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
  }
  private def batch1 = {
    val sp = spark; import sp.implicits._
    Seq((1L, 5L), (5L, 6L)).toDF("a", "b")
  }
  private def batch2 = {
    val sp = spark; import sp.implicits._
    Seq((2L, 6L)).toDF("a", "b")
  }

  test("batch-by-batch maintenance equals from-scratch cores after each batch") {
    val dir = tmp()
    val h = PairGraphStore.build(seed, "a", "b", None, s"$dir/store")
    assert(storedCores(h, 5) == coresOf(seed, 5))
    val afterB1 = h.appendAndMaintainCores(batch1, maxK = 5).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(afterB1 == coresOf(seed.union(batch1), 5), s"b1: $afterB1")
    val afterB2 = h.appendAndMaintainCores(batch2, maxK = 5).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = coresOf(seed.union(batch1).union(batch2), 5)
    assert(afterB2 == want, s"b2: $afterB2 want $want")
    // tail closed into a cycle through the K4: 5 and 6 rose to 2
    assert(afterB2(5L) == 2 && afterB2(6L) == 2)
    // persisted state agrees with the returned frame
    assert(storedCores(h, 5) == afterB2)
    // edge set = union, no duplicates
    assert(h.edgeCount == 9)
  }

  test("replayed batch is idempotent: same edges, same cores") {
    val dir = tmp()
    val h = PairGraphStore.build(seed, "a", "b", None, s"$dir/store")
    h.appendAndMaintainCores(batch1, maxK = 5)
    val once = storedCores(h, 5)
    val onceEdges = h.edgeCount
    // foreachBatch redelivery after a crash: the SAME batch again
    h.appendAndMaintainCores(batch1, maxK = 5)
    assert(storedCores(h, 5) == once)
    assert(h.edgeCount == onceEdges, "replay must not duplicate edges")
  }

  test("crash window: edges appended but cores not swapped — replay heals") {
    val dir = tmp()
    val h = PairGraphStore.build(seed, "a", "b", None, s"$dir/store")
    h.ensureCores(5)
    // simulate the crash: the edge append landed, the cores swap did
    // not (stale cores state)
    h.append(batch1)
    assert(storedCores(h, 5) == coresOf(seed, 5), "cores are stale by design")
    // redelivery of the same batch drives cores to the true fixpoint
    val healed = h.appendAndMaintainCores(batch1, maxK = 5).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(healed == coresOf(seed.union(batch1), 5), s"healed: $healed")
    assert(h.edgeCount == 8, "no duplicate edges from the replay")
  }

  test("file-stream drive: drained batches equal one batch-mode build") {
    val dir = tmp()
    val in = s"$dir/in"
    new java.io.File(in).mkdirs()
    batch1.write.parquet(s"$in/b1")
    batch2.write.parquet(s"$in/b2")
    val h = PairGraphStore.build(seed, "a", "b", None, s"$dir/store")
    h.ensureCores(5)
    val q = StreamingGraphMaintenance.stream(spark, s"$in/*/",
      batch1.schema, h, maxK = 5, checkpointDir = s"$dir/ckpt")
    q.awaitTermination(120000)
    val want = coresOf(seed.union(batch1).union(batch2), 5)
    assert(storedCores(h, 5) == want)
    assert(h.edgeCount == 9)
  }

  test("weighted store: maintenance preserves delta weights on appended edges") {
    val sp = spark; import sp.implicits._
    val dir = tmp()
    val wSeed = Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (1L, 3L, 0.7))
      .toDF("a", "b", "w")
    val h = PairGraphStore.build(wSeed, "a", "b", Some("w"), s"$dir/store")
    val delta = Seq((3L, 4L, 0.6)).toDF("a", "b", "w")
    h.appendAndMaintainCores(delta, maxK = 3)
    val got = h.edges.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((3L, 4L)) == 0.6)
    assert(got.size == 4)
  }

  private def allStates(h: PairGraphStore.Handle, maxK: Int)
      : (Map[Long, Int], Map[Long, Long], Map[Long, Seq[Double]],
         Set[(Long, Long)]) = (
    storedCores(h, maxK),
    h.ensureCommunities(rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap,
    h.ensureRanks(iterations = 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap,
    h.ensureTruss(k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)

  private def fromScratchStates(edges: DataFrame, maxK: Int)
      : (Map[Long, Int], Map[Long, Long], Map[Long, Seq[Double]],
         Set[(Long, Long)]) = {
    val sp = spark
    val dir = tmp()
    val h = PairGraphStore.build(edges, "a", "b", None, s"$dir/store")
    allStates(h, maxK)
  }

  test("processAll maintains cores, communities, ranks and truss together; crash between maintainers heals") {
    val dir = tmp()
    val h = PairGraphStore.build(seed, "a", "b", None, s"$dir/store")
    // states ensured once up front (the production shape)
    allStates(h, 5)
    StreamingGraphMaintenance.processAll(batch1, h, maxK = 5, trussK = Some(3))
    assert(allStates(h, 5) == fromScratchStates(seed.union(batch1), 5), "after b1")
    // crash window: batch2's cores land (edges appended) but the
    // communities/ranks maintainers never ran — re-delivering the
    // batch through processAll drives ALL states to the fixpoint
    h.appendAndMaintainCores(batch2, maxK = 5)
    StreamingGraphMaintenance.processAll(batch2, h, maxK = 5, trussK = Some(3))
    val want = fromScratchStates(seed.union(batch1).union(batch2), 5)
    assert(allStates(h, 5) == want, "after crash + replay")
    // full re-delivery is a no-op
    StreamingGraphMaintenance.processAll(batch2, h, maxK = 5, trussK = Some(3))
    assert(allStates(h, 5) == want)
    assert(h.edgeCount == 9)
  }

  test("processAllRemove maintains cores, ranks and truss under revocation; crash heals") {
    val sp = spark; import sp.implicits._
    val dir = tmp()
    val h = PairGraphStore.build(seed.union(batch1).union(batch2),
      "a", "b", None, s"$dir/store")
    allStates(h, 5)
    def keptStates(edges: DataFrame) = fromScratchStates(edges, 5)
    // revoke batch2: every state equals from-scratch over the kept view
    StreamingGraphMaintenance.processAllRemove(batch2, h, maxK = 5,
      trussK = Some(3))
    assert(allStates(h, 5) == keptStates(seed.union(batch1)), "after revoke b2")
    // crash window: batch1's cores demoted but ranks/truss never ran —
    // re-delivering through processAllRemove drives ALL states there
    h.removeEdgesAndMaintainCores(batch1, maxK = 5)
    StreamingGraphMaintenance.processAllRemove(batch1, h, maxK = 5,
      trussK = Some(3))
    val want = keptStates(seed)
    assert(allStates(h, 5) == want, "after crash + replay")
    // full re-delivery is a no-op
    StreamingGraphMaintenance.processAllRemove(batch1, h, maxK = 5,
      trussK = Some(3))
    assert(allStates(h, 5) == want)
    assert(h.edgeCount == seed.count())
  }

  test("streamAllRemove file drive equals direct processAllRemove calls") {
    val sp = spark; import sp.implicits._
    val dir = tmp()
    val h = PairGraphStore.build(seed.union(batch1).union(batch2),
      "a", "b", None, s"$dir/store")
    allStates(h, 5)
    val inDir = s"$dir/in"
    batch1.write.parquet(s"$inDir/b1")
    batch2.write.parquet(s"$inDir/b2")
    val q = StreamingGraphMaintenance.streamAllRemove(
      spark, s"$inDir/*", batch1.schema, h, maxK = 5, iterations = 3,
      checkpointDir = s"$dir/ckpt", trussK = Some(3))
    q.awaitTermination()
    assert(allStates(h, 5) == fromScratchStates(seed, 5))
  }

  test("streamAll file drive equals direct processAll calls") {
    val sp = spark; import sp.implicits._
    val dir = tmp()
    val h = PairGraphStore.build(seed, "a", "b", None, s"$dir/store")
    allStates(h, 5)
    val inDir = s"$dir/in"
    batch1.write.parquet(s"$inDir/b1")
    batch2.write.parquet(s"$inDir/b2")
    val schema = batch1.schema
    val q = StreamingGraphMaintenance.streamAll(
      spark, s"$inDir/*", schema, h, maxK = 5, rounds = 3, iterations = 3,
      checkpointDir = s"$dir/ckpt", trussK = Some(3))
    q.awaitTermination()
    assert(allStates(h, 5) == fromScratchStates(seed.union(batch1).union(batch2), 5))
  }
}
