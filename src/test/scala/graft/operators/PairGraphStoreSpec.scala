package graft.operators

import java.nio.file.Files
import graft.SparkSpec
import graft.ann.Ann
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The pair-graph store's two contracts: (1) fidelity — the stored
  * edge frame IS the generator's frame, bit for bit; (2) consumer
  * equality — every graph metric computed from the store equals the
  * same metric computed inline, which is what lets the store-served
  * queries keep the inline queries' oracles and spec posture. */
class PairGraphStoreSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("pairgraph").toString + "/store"

  private def inlinePairs: DataFrame =
    Ann.lshNearDupPairs(graft.Tables.load(spark, sf001, "embeddings"),
      "vec_id", "embedding", threshold = 0.35, nBits = 8, tables = 8,
      dim = 64, maxBucketSize = 10000)

  private def asSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("round-trip fidelity: stored edges equal the generator frame exactly") {
    val path = tmp()
    val h = PairGraphStore.build(inlinePairs, "vec_a", "vec_b", Some("cos"), path)
    assert(asSet(h.edges.select(col("vec_a"), col("vec_b"), col("cos"))) ==
      asSet(inlinePairs.select(col("vec_a"), col("vec_b"), col("cos"))))
    // canonical orientation survives the round trip
    assert(h.edges.filter(col("vec_a") >= col("vec_b")).isEmpty)
    val reopened = PairGraphStore.open(spark, path)
    assert(reopened.srcCol == "vec_a" && reopened.dstCol == "vec_b" &&
      reopened.weightCol.contains("cos"))
  }

  test("consumer equality: LPA, weighted LPA and k-core match the inline route") {
    val path = tmp()
    val stored = PairGraphStore
      .build(inlinePairs, "vec_a", "vec_b", Some("cos"), path).edges
    val inline = inlinePairs.localCheckpoint()

    def lpa(e: DataFrame, w: Option[String]) =
      LabelPropagation.run(e, "vec_a", "vec_b", rounds = 3, weightCol = w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa(stored, None) == lpa(inline, None))
    assert(lpa(stored, Some("cos")) == lpa(inline, Some("cos")))

    def kcore(e: DataFrame) = KCore.run(e, "vec_a", "vec_b", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kcore(stored) == kcore(inline))
  }

  test("ensure builds once, then serves without running the generator") {
    val path = tmp()
    var generatorRuns = 0
    def gen: DataFrame = { generatorRuns += 1; inlinePairs }
    val h1 = PairGraphStore.ensure(gen, "vec_a", "vec_b", Some("cos"), spark, path)
    val n = h1.edgeCount
    assert(generatorRuns == 1 && n > 0)
    val h2 = PairGraphStore.ensure(gen, "vec_a", "vec_b", Some("cos"), spark, path)
    assert(generatorRuns == 1, "existing store must not re-run the generator")
    assert(h2.edgeCount == n)
  }

  test("append folds a delta in; compact preserves the edge set") {
    val sp = spark; import sp.implicits._
    val path = tmp()
    val base = Seq((1L, 2L, 0.9), (2L, 3L, 0.8)).toDF("vec_a", "vec_b", "cos")
    val delta = Seq((1L, 4L, 0.7)).toDF("vec_a", "vec_b", "cos")
    val h = PairGraphStore.build(base, "vec_a", "vec_b", Some("cos"), path)
    h.append(delta)
    assert(asSet(h.edges) ==
      Set((1L, 2L, 0.9), (2L, 3L, 0.8), (1L, 4L, 0.7)))
    PairGraphStore.compact(h, targetFiles = 2)
    assert(asSet(h.edges) ==
      Set((1L, 2L, 0.9), (2L, 3L, 0.8), (1L, 4L, 0.7)))
    // an empty delta is a no-op, not an error
    h.append(delta.limit(0))
    assert(h.edgeCount == 3)
  }

  test("unweighted store round-trips without a weight column") {
    val sp = spark; import sp.implicits._
    val path = tmp()
    val base = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    PairGraphStore.build(base, "a", "b", None, path)
    val h = PairGraphStore.open(spark, path)
    assert(h.weightCol.isEmpty)
    assert(h.edges.columns.toSeq == Seq("a", "b"))
    assert(h.edges.count() == 2)
  }
}
