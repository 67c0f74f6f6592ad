package graft.ann

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AnnSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  private def queries = emb.filter(col("vec_id") < 20)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("brute-force top-k: self is always rank 1 with cosine 1.0") {
    val top = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 5)
    val rank1 = top.filter(col("rnk") === 1).collect()
    assert(rank1.length === 20)
    rank1.foreach { r =>
      assert(r.getAs[Long]("query_id") === r.getAs[Long]("neighbor_id"))
      assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-9)
    }
  }

  test("brute-force top-k returns exactly k rows per query, ranks 1..k") {
    val top = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 5)
    val byQ = top.groupBy("query_id").agg(count(lit(1)).as("n"),
      min("rnk").as("lo"), max("rnk").as("hi")).collect()
    byQ.foreach { r =>
      assert(r.getAs[Long]("n") === 5)
      assert(r.getAs[Int]("lo") === 1 && r.getAs[Int]("hi") === 5)
    }
  }

  test("LSH top-k finds the self-neighbor (bucket identity) and decent recall") {
    val bf = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 3)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 3,
        nBits = 12, dim = 64)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // self-pairs always survive (same bucket by construction)
    (0L until 20L).foreach(q => assert(lsh.contains((q, q))))
    // recall against exact top-3: approximate, but must be non-trivial
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall >= 0.3, s"LSH recall degenerate: $recall")
  }

  test("LSH near-dup pairs: >=90% recall on planted high-similarity duplicates") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / n)
    }
    // 200 random unit vectors + a slightly-noised copy of each (cos ~0.995)
    val base = (0 until 200).map(i => i.toLong -> unit(Array.fill(64)(rnd.nextGaussian().toFloat)))
    val rows = base.map { case (id, v) => (id, v) } ++ base.map { case (id, v) =>
      (id + 1000L, unit(v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val found = Ann.lshNearDupPairs(df, "vec_id", "embedding",
        threshold = 0.9, nBits = 8, tables = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalled = base.count { case (id, _) => found.contains((id, id + 1000L)) }
    assert(recalled >= 180, s"planted-dup recall too low: $recalled/200")
  }

  test("LSH pair graph -> connected components recovers planted duplicate clusters") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / n)
    }
    // 100 random unit vectors, each with TWO noised copies => planted
    // 3-member clusters {i, i+1000, i+2000}
    val base = (0 until 100).map(i => i.toLong -> unit(Array.fill(64)(rnd.nextGaussian().toFloat)))
    val rows = base.flatMap { case (id, v) =>
      Seq((id, v),
        (id + 1000L, unit(v.map(x => x + 0.05f * rnd.nextGaussian().toFloat))),
        (id + 2000L, unit(v.map(x => x + 0.05f * rnd.nextGaussian().toFloat))))
    }
    val df = rows.toDF("vec_id", "embedding")
    val pairs = Ann.lshNearDupPairs(df, "vec_id", "embedding",
        threshold = 0.9, nBits = 8, tables = 8, dim = 64)
      .select(col("vec_a").as("va"), col("vec_b").as("vb"))
    val cc = graft.dedup.ConnectedComponents.run(pairs, "va", "vb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a planted cluster is recovered when all 3 members share one root
    val recovered = base.count { case (id, _) =>
      (cc.get(id), cc.get(id + 1000L), cc.get(id + 2000L)) match {
        case (Some(a), Some(b), Some(c)) => a == b && b == c
        case _ => false
      }
    }
    assert(recovered >= 90, s"cluster recovery too low: $recovered/100")
  }

  test("SRP signature is deterministic across partitionings") {
    def sig(parts: Int) = emb.repartition(parts)
      .select(col("vec_id"), Ann.srpSignature(col("embedding"), 12, 64).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sig(1) === sig(5))
  }

  test("exhaustive setting (nBits=1 + radius-1 probe) == brute force — q71b's argument") {
    // bucket space is {0,1}; multi-probe expands each query to both
    // buckets, so every (query, corpus) pair meets exactly once and
    // the LSH plumbing must reproduce exact top-k bit for bit
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bf = rows(Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 5))
    val ex = rows(Ann.lshTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 5,
      nBits = 1, dim = 64))
    assert(ex === bf)
  }

  test("q65b collision contract holds: found iff signatures collide (surviving buckets)") {
    val contract = graft.queries.Registry
      .queries("q65b_neardup_lsh_contract")(spark, sf001)
    val bad = contract.filter(!col("lsh_ok")).count()
    assert(bad === 0, s"$bad exact pairs violate the found-iff-collides contract")
    // non-vacuous: the exact pair set at this threshold is non-empty
    assert(contract.count() > 0)
  }
}
