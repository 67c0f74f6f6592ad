package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemanticContaminationSpec extends SparkSpec {

  test("planted leak: an eval vector duplicated in train is flagged at cos ~ 1") {
    val sp = spark; import sp.implicits._
    val train = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.6f, 0.8f, 0.0f)) // the leak: equals eval 100
    ).toDF("vec_id", "embedding")
    val eval = Seq(
      (100L, Seq(0.6f, 0.8f, 0.0f)),
      (101L, Seq(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val exact = SemanticContamination.exactReport(train, eval, "vec_id", "embedding", 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(exact.keySet == Set(3L))
    assert(exact(3L)._1 == 1L)
    assert(math.abs(exact(3L)._2 - 1.0) < 1e-9)
    val lsh = SemanticContamination.lshReport(train, eval, "vec_id", "embedding",
      0.95, nBits = 4, tables = 8, dim = 3)
      .collect().map(_.getLong(0)).toSet
    assert(lsh == Set(3L), "identical vectors always collide in every SRP table")
  }

  test("LSH route: subset of exact on the harness; >=90% recall on planted high-sim leaks") {
    // same contract shape as AnnSpec's near-dup pairs: banded SRP
    // reliably catches HIGH-similarity collisions (real leakage);
    // marginal cos~tau pairs are collision-bounded by construction
    val emb = graft.Tables.embeddings(spark, sf001)
    val train = emb.filter(col("vec_id") % 17 =!= 0)
    val eval = emb.filter(col("vec_id") % 17 === 0)
    val exactAll = SemanticContamination.exactReport(train, eval, "vec_id", "embedding", 0.35)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val lsh = SemanticContamination.lshReport(train, eval, "vec_id", "embedding", 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(lsh.subsetOf(exactAll.keySet), "verify step must kill every false positive")
    assert(exactAll.nonEmpty)

    // planted leaks: 200 train vectors that are tiny perturbations of
    // eval vectors (cos ~ 0.99) — the case the screen exists for
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    val evalRows = eval.limit(50).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](r.fieldIndex("embedding")).toArray))
    val planted = (0 until 200).map { i =>
      val (eid, ev) = evalRows(i % evalRows.length)
      val v = ev.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f)
      (1000000L + i, v.toSeq)
    }
    val trainPlus = train.select(col("vec_id"), col("embedding"))
      .unionByName(planted.toDF("vec_id", "embedding"))
    val found = SemanticContamination.lshReport(trainPlus, eval, "vec_id", "embedding", 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recalled = (0 until 200).count(i => found.contains(1000000L + i))
    assert(recalled >= 180, s"planted-leak recall $recalled/200")
  }

  test("store-served rollup equals lshReport on the harness split") {
    // the whole-corpus pair graph restricted to cross-side edges must
    // reproduce the dedicated cross-side screen (same hyperplanes,
    // same verify predicate; rounded max is max of rounded — monotone)
    val emb = graft.Tables.embeddings(spark, sf001)
    val isEval = (id: org.apache.spark.sql.Column) => pmod(id, lit(17)) === 0
    val pairs = graft.ann.Ann.lshNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.35, nBits = 8, tables = 8, dim = 64, maxBucketSize = 10000)
    val fromStoreShape = SemanticContamination.reportFromPairs(
      pairs, "vec_a", "vec_b", "cos", isEval, "vec_id")
      .select(col("vec_id"), col("n_eval_hits"), round(col("max_cos"), 4).as("m"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = SemanticContamination.lshReport(
      emb.filter(col("vec_id") % 17 =!= 0), emb.filter(col("vec_id") % 17 === 0),
      "vec_id", "embedding", tau = 0.35)
      .select(col("vec_id"), col("n_eval_hits"), round(col("max_cos"), 4).as("m"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(fromStoreShape == direct)
    assert(direct.nonEmpty)
  }

  test("report schema and hit counting: multiple eval hits accumulate") {
    val sp = spark; import sp.implicits._
    val train = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val eval = Seq(
      (100L, Seq(1.0f, 0.1f)), (101L, Seq(1.0f, -0.1f)), (102L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val r = SemanticContamination.exactReport(train, eval, "vec_id", "embedding", 0.9)
      .head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
  }
}
