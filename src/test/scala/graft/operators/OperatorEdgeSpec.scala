package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edge-shape hardening for the round-4 operators: empty inputs,
  * degenerate sets, and fold-order invariance — the shapes a long-
  * running pipeline hits eventually and a demo never does.
  */
class OperatorEdgeSpec extends SparkSpec {

  test("BloomPrune: empty build side yields an empty (not failing) semi-join") {
    val sp = spark; import sp.implicits._
    val probe = (1L to 100L).map(i => (i, s"p$i")).toDF("k", "v")
    val build = Seq.empty[Long].toDF("k")
    val out = BloomPrune.semiJoin(probe, build, "k", "k", expectedItems = 10L)
    assert(out.count() === 0)
  }

  test("BloomPrune: disjoint and identical key sets behave exactly like plain semi-join") {
    val sp = spark; import sp.implicits._
    val probe = (1L to 500L).toDF("k")
    val disjoint = (1000L to 1100L).toDF("k")
    assert(BloomPrune.semiJoin(probe, disjoint, "k", "k", 200L).count() === 0)
    val identical = (1L to 500L).toDF("k")
    assert(BloomPrune.semiJoin(probe, identical, "k", "k", 200L).count() === 500)
  }

  test("BloomPrune: no false negatives across random key sets (property)") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { _ =>
      val probeKeys = Seq.fill(2000)(rnd.nextLong() % 10000)
      val buildKeys = Seq.fill(300)(rnd.nextLong() % 10000)
      val probe = probeKeys.toDF("k")
      val build = buildKeys.toDF("k")
      val expected = probe.join(build.distinct(), Seq("k"), "left_semi").count()
      val got = BloomPrune.semiJoin(probe, build, "k", "k", 1000L).count()
      assert(got === expected)
    }
  }

  test("BloomPrune: mismatched key types fail loud (xxhash64 is type-sensitive)") {
    val sp = spark; import sp.implicits._
    val probe = (1 to 100).map(_.toLong).toDF("k")
    val build = (1 to 50).toDF("k") // int, not long
    val ex = intercept[IllegalArgumentException](
      BloomPrune.semiJoin(probe, build, "k", "k", 100L))
    assert(ex.getMessage.contains("type"))
  }

  test("IncrementalAgg: empty delta folds as a no-op; fold order never changes the state") {
    val sp = spark; import sp.implicits._
    val keys = Seq("k")
    val ms = Seq(IncrementalAgg.Measure("v", col("v")))
    val rows = (1 to 3000).map(i => (s"k${i % 7}", (i % 100).toDouble)).toDF("k", "v")
    val empty = Seq.empty[(String, Double)].toDF("k", "v")

    val base = IncrementalAgg.partials(rows, keys, ms)
    val withEmpty = IncrementalAgg.merge(base, IncrementalAgg.partials(empty, keys, ms), keys)
    assert(base.exceptAll(withEmpty).isEmpty && withEmpty.exceptAll(base).isEmpty)

    // integer-valued doubles => sums exact under any fold order, so
    // full frame equality holds across permuted fold orders
    val split = (0 until 4).map(i =>
      IncrementalAgg.partials(
        rows.withColumn("b", abs(hash(col("k"), col("v"))) % 4).filter(col("b") === i).drop("b"),
        keys, ms))
    val orderA = split.reduce((s, p) => IncrementalAgg.merge(s, p, keys))
    val orderB = split.reverse.reduce((s, p) => IncrementalAgg.merge(s, p, keys))
    assert(orderA.exceptAll(orderB).isEmpty && orderB.exceptAll(orderA).isEmpty)
  }

  test("ZOrder.writeClustered on an empty frame writes an empty, readable dir") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zoempty").toString + "/t"
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    graft.layout.ZOrder.writeClustered(empty, dir, Seq("x", "y"), bits = 8, numFiles = 4)
    assert(sp.read.parquet(dir).count() === 0)
  }

  test("Compaction on a missing or empty dir is a safe no-op") {
    val sp = spark
    val missing = java.nio.file.Files.createTempDirectory("cmissing").toString + "/nope"
    assert(!graft.layout.Compaction.compact(sp, missing))
    assert(graft.layout.Compaction.compactPartitions(sp, missing) === 0)
    assert(graft.layout.Compaction.dataBytes(sp, missing) === 0L)
  }

  test("Chunker/CorpusShuffle: invalid parameters fail loud at construction, empty frames pass") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunker.chunk(docs, chunkSize = 0))
    intercept[IllegalArgumentException](Chunker.chunk(docs, chunkSize = 10, overlap = 10))
    intercept[IllegalArgumentException](Chunker.chunk(docs, chunkSize = 10, overlap = -1))
    intercept[IllegalArgumentException](CorpusShuffle.assign(docs, "doc_id", 0, "s"))
    intercept[IllegalArgumentException](
      graft.dedup.EditDistance.lshPairs(docs, "doc_id", "text", maxDist = -1))
    intercept[IllegalArgumentException](
      InvertedIndex.phraseSearch(docs, "doc_id", "text", Seq("two words")))
    intercept[IllegalArgumentException](
      InvertedIndex.bm25Search(docs, "doc_id", "text", Seq("")))
    // empty input: both operators yield empty, well-typed output
    val none = docs.filter($"doc_id" < 0)
    assert(Chunker.chunk(none).count() === 0)
    assert(CorpusShuffle.assign(none, "doc_id", 4, "s").count() === 0)
    // SQ8 on an empty frame: no rows, schema still carries the codes
    val emptyQ = graft.ann.ScalarQuant.quantize(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"), "embedding")
    assert(emptyQ.count() === 0 && emptyQ.columns.contains("qvec"))
  }

  test("SkewReport: planted hot key dominates with the right share and mean ratio") {
    val sp = spark; import sp.implicits._
    // 90 rows on 'hot', 10 uniform keys with 1 row each: 100 rows, 11 keys
    val df = ((1 to 90).map(_ => "hot") ++ (1 to 10).map(i => s"k$i")).toDF("key")
    val top = SkewReport.topKeys(df, "key", k = 3).collect()
    assert(top.head.getString(0) === "hot")
    assert(top.head.getAs[Long]("cnt") === 90L)
    assert(top.head.getAs[Double]("share") === 0.9)
    assert(top.head.getAs[Double]("ratio_to_mean") === 9.9) // 90 * 11 / 100
    assert(top.length === 3 && top(1).getAs[Long]("cnt") === 1L)
  }
}
