package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SemanticDedupSpec extends SparkSpec {

  test("keepers: one survivor per component, smallest id, singletons keep themselves") {
    val sp = spark; import sp.implicits._
    val corpus = (1L to 10L).toDF("id")
    // components: {1,2,3} (chain), {7,8}; 4,5,6,9,10 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val out = SemanticDedup.keepers(corpus, "id", pairs, "a", "b").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) === (1L, true))
    assert(out(2L) === (1L, false))
    assert(out(3L) === (1L, false))
    assert(out(7L) === (7L, true))
    assert(out(8L) === (7L, false))
    Seq(4L, 5L, 6L, 9L, 10L).foreach(i => assert(out(i) === (i, true)))
    // exactly one keeper per component survives a kept-filter
    assert(out.count(_._2._2) === 7)
  }

  test("keepersBy: highest priority wins, min id on ties, nulls lose, all-null falls back to min id") {
    val sp = spark; import sp.implicits._
    val corpus = Seq(
      1L -> Some(0.1), 2L -> Some(0.9), 3L -> Some(0.5), // comp A: 2 wins
      4L -> Some(0.7), 5L -> Some(0.7),                  // comp B: tie -> 4
      6L -> None, 7L -> Some(0.2),                       // comp C: null loses -> 7
      8L -> None, 9L -> None,                            // comp D: all null -> min id 8
      10L -> Some(0.0)                                   // singleton keeps itself
    ).toDF("id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (6L, 7L), (8L, 9L)).toDF("a", "b")
    val out = SemanticDedup.keepersBy(corpus, "id", "q", pairs, "a", "b").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) === (2L, false) && out(2L) === (2L, true) && out(3L) === (2L, false))
    assert(out(4L) === (4L, true) && out(5L) === (4L, false))
    assert(out(6L) === (7L, false) && out(7L) === (7L, true))
    assert(out(8L) === (8L, true) && out(9L) === (8L, false))
    assert(out(10L) === (10L, true))
    assert(out.size === 10 && out.count(_._2._2) === 5)
  }

  test("keepers composes with an LSH pair graph end to end (planted near-dups collapse)") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val pairs = graft.ann.Ann.lshNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.35, nBits = 8, tables = 8, dim = 64, maxBucketSize = 10000)
      .select(col("vec_a").as("a"), col("vec_b").as("b"))
    val nPaired = pairs.select(explode(array(col("a"), col("b")))).distinct().count()
    val out = SemanticDedup.keepers(emb, "vec_id", pairs, "a", "b")
    assert(out.count() === emb.count(), "every corpus row annotated")
    val dropped = out.filter(!col("kept")).count()
    assert(dropped > 0 && dropped < nPaired,
      "components must drop some but not all paired members")
    // keeper of every dropped row is itself kept
    val keepers = out.filter(col("kept")).select(col("keeper").as("k"))
    assert(out.filter(!col("kept"))
      .join(keepers, col("keeper") === col("k"), "left_anti").count() === 0)
  }
}
