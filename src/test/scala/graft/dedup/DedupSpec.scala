package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

class DedupSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("MinHash LSH candidates achieve full recall vs exact Jaccard >= 0.8 pairs") {
    val exact = NGramJaccard.pairs(docs, "doc_id", "text", shingleN = 3, minJaccard = 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = MinHashLSH.candidatePairs(docs, "doc_id", "text", numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture corpus should contain near-duplicates")
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed high-similarity pairs: $missed")
  }

  test("MinHash signature is deterministic across partitionings") {
    def sigs(parts: Int) = docs.repartition(parts)
      .select(col("doc_id"), MinHashLSH.signatureOfHashes(
        transform(TextFunctions.wordShingles(col("text"), 3), s => xxhash64(s)), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1) === sigs(7))
  }

  test("NGramJaccard df-cut drops stop-shingle-only pairs, keeps real dupes") {
    val sp = spark; import sp.implicits._
    // doc 1/2: real near-dups; doc 3..12: share ONLY the stop shingle
    val base = "alpha beta gamma delta epsilon zeta"
    val rows = Seq(
      (1L, base + " one"), (2L, base + " two")) ++
      (3L to 12L).map(i => (i, s"common shingle here unique$i word$i tail$i"))
    val df = rows.toDF("doc_id", "text")
    val strict = NGramJaccard.pairs(df, "doc_id", "text", 3, 0.3)
    val cut = NGramJaccard.pairs(df, "doc_id", "text", 3, 0.3, maxDf = 5)
    val strictPairs = strict.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cutPairs = cut.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strictPairs.contains((1L, 2L)))
    assert(cutPairs.contains((1L, 2L)), "df-cut must keep genuinely similar pairs")
    // the 'common shingle here' shingle has df=10 > 5 => contributes no candidates
    assert(cutPairs.forall { case (a, b) => a <= 2 && b <= 2 })
  }

  test("noveltyStats: unique doc scores 1, exact duplicates score 0, partial overlap in between") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),  // all shingles unique
      (2L, "one two three four five six"),          // duplicated by 3
      (3L, "one two three four five six"),
      (4L, "one two three four shared tail words")) // overlaps 2/3's prefix
      .toDF("doc_id", "text")
    val out = NGramJaccard.noveltyStats(df, "doc_id", "text", 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L)._3 === 1.0)
    assert(out(2L)._3 === 0.0 && out(3L)._3 === 0.0,
      "every shingle of an exact duplicate occurs elsewhere")
    assert(out(4L)._3 > 0.0 && out(4L)._3 < 1.0)
    // n_unique consistent with the fraction
    out.values.foreach { case (n, u, f) =>
      assert(math.abs(f - u.toDouble / n) < 1e-6)
    }
  }

  test("containment catches a quoted benchmark item that Jaccard misses") {
    val sp = spark; import sp.implicits._
    // a short "benchmark item" quoted verbatim inside a much longer
    // document: the union is dominated by the long doc, so Jaccard is
    // tiny, but every shingle of the item appears in the host doc —
    // containment 1.0. This asymmetry is the whole reason the
    // contamination pass exists.
    val item = (1 to 12).map(i => s"bench$i").mkString(" ")
    val host = (1 to 300).map(i => s"filler$i").mkString(" ") + " " + item
    val corpus = Seq((1L, item), (2L, host)).toDF("doc_id", "text")

    val jac = NGramJaccard.pairs(corpus, "doc_id", "text",
        shingleN = 3, minJaccard = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val cont = NGramJaccard.containmentPairs(corpus, "doc_id", "text",
        shingleN = 3, minContainment = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    assert(jac((1L, 2L)) < 0.1, s"expected tiny jaccard, got ${jac((1L, 2L))}")
    assert(cont((1L, 2L)) === 1.0, s"expected containment 1.0, got ${cont.get((1L, 2L))}")
    // and a 0.8-Jaccard dedup threshold would NOT have caught it
    assert(jac((1L, 2L)) < 0.8)
  }

  test("SimHash pairs are within the declared hamming radius and symmetric-free") {
    val pairs = SimHash.candidatePairs(docs, "doc_id", "text", maxHamming = 3).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Int]("hamming") <= 3)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("SimHash oversized-bucket guard bounds degenerate chunks, keeps small-bucket pairs") {
    val sp = spark; import sp.implicits._
    // 50 near-empty docs fingerprint identically => every one of their 4
    // pigeonhole chunks is a 50-doc bucket (a quadratic join at scale).
    // Docs 1/2 are a genuine duplicate pair living in 2-doc buckets.
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon")) ++
      (100L to 149L).map(i => (i, "x"))
    val df = rows.toDF("doc_id", "text")
    val guarded = SimHash.candidatePairs(df, "doc_id", "text",
        maxHamming = 3, maxBucketSize = 20)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded === Set((1L, 2L)),
      "oversized buckets must be dropped; small buckets must survive")
    // without the guard the degenerate group contributes all C(50,2) pairs
    val unguarded = SimHash.candidatePairs(df, "doc_id", "text",
      maxHamming = 3, maxBucketSize = 1000000).count()
    assert(unguarded === 1L + 50L * 49L / 2L)
  }

  test("SimHash pigeonhole driver route equals the distributed join (randomized, skewed, shuffle-free)") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    // 40 clusters of 3-10 fingerprints within hamming <= 4 of a random
    // base (some pairs land inside the maxHamming=3 radius, some just
    // outside), plus 60 identical fingerprints whose every chunk bucket
    // is oversized (> 20) — the degenerate-skew drop case
    val rows0 = (0 until 40).flatMap { g =>
      val base = rnd.nextLong()
      (0 until (3 + rnd.nextInt(8))).map { m =>
        var f = base
        (0 until rnd.nextInt(5)).foreach(_ => f ^= 1L << rnd.nextInt(64))
        ((g * 100 + m).toLong, f)
      }
    } ++ (10000L until 10060L).map(i => (i, 0x5a5a5a5a5a5a5a5aL))
    val df = rows0.toDF("doc", "fp")
    def pairSet(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    sp.conf.set(SimHash.DriverMaxFingerprintsKey, "0") // force distributed
    val dist = try pairSet(
      SimHash.pairsFromFingerprints(df, maxHamming = 3, maxBucketSize = 20,
        chunks = 4, chunkBits = 16))
    finally sp.conf.unset(SimHash.DriverMaxFingerprintsKey)
    val drvDf = SimHash.pairsFromFingerprints(df, maxHamming = 3,
      maxBucketSize = 20, chunks = 4, chunkBits = 16)
    assert(!drvDf.queryExecution.executedPlan.toString.contains("Exchange"),
      "a bounded fingerprint set must take the shuffle-free driver route")
    val drv = pairSet(drvDf)
    assert(drv.nonEmpty, "the fixture must produce pairs")
    assert(drv === dist)
    // the degenerate group is dropped by BOTH routes
    assert(!drv.exists(p => p._1 >= 10000L))
  }

  test("SimHash fingerprint is deterministic and permutation-sensitive only via token multiset") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"),
      (3L, "fox brown quick the"), // same tokens, different order => same simhash (bag of tokens)
      (4L, "completely different words entirely")).toDF("id", "text")
    val fps = df.select(col("id"),
        SimHash.simhash(TextFunctions.wsTokens(lower(col("text")))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) === fps(3L))
    assert(fps(1L) !== fps(4L))
  }

  test("winnowing guarantee: docs sharing a >= w+k-1 token run share a fingerprint") {
    val sp = spark; import sp.implicits._
    // k=4, w=4 => any shared contiguous run of >= 7 tokens guarantees
    // a shared fingerprint. The shared run here is 12 tokens.
    val shared = "one two three four five six seven eight nine ten eleven twelve"
    val df = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"zeta eta theta $shared iota"),
      (3L, "totally unrelated text with no overlap at all whatsoever here"))
      .toDF("doc_id", "text")
    val pairs = WinnowFingerprints.candidatePairs(df, "doc_id", "text",
        k = 4, w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("winnowing fingerprints: deterministic, distinct, ~2/(w+1) density") {
    val sp = spark; import sp.implicits._
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
        WinnowFingerprints.of(TextFunctions.wsTokens(lower(col("text"))), 4, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fps(1L) === fps(2L)) // deterministic
    assert(fps(1L).distinct.length === fps(1L).length)
    val nGrams = 200 - 4 + 1
    // selected density: between 1/w and ~2/(w+1) of gram count
    assert(fps(1L).length >= nGrams / 4 / 2 && fps(1L).length <= nGrams)
  }

  test("connected components: chains, cliques, and isolated pairs resolve to min-id roots") {
    val sp = spark; import sp.implicits._
    // component {1,2,3,4} via a chain, {10,11,12} via a triangle, {20,21} a lone pair
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val cc = ConnectedComponents.run(edges, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("adaptive CC (driver union-find) equals distributed min-label on random graphs") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(23)
    (1 to 3).foreach { _ =>
      // random sparse graph incl. self-loops and duplicate edges
      val edges = (1 to 400).map(_ => (rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
        .toDF("doc_a", "doc_b")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = canon(ConnectedComponents.run(edges, "doc_a", "doc_b"))
      val local = canon(ConnectedComponents.runAdaptive(edges, "doc_a", "doc_b"))
      assert(local === dist)
      // above-threshold dispatch also agrees (forces the distributed path)
      val forced = canon(ConnectedComponents.runAdaptive(edges, "doc_a", "doc_b",
        driverMaxEdges = 1L))
      assert(forced === dist)
    }
  }

  test("adaptive CC: mixed int/long id columns widen to long — ids past Int range survive both paths") {
    val sp = spark; import sp.implicits._
    val big = Int.MaxValue.toLong + 5L
    val edges = Seq((1, big), (2, 2L)).toDF("u", "v") // IntegerType u, LongType v
    def canon(df: org.apache.spark.sql.DataFrame) = {
      assert(df.schema.fields.forall(_.dataType ==
        org.apache.spark.sql.types.LongType), "output must widen to the long side")
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val expected = Map(1L -> 1L, big -> 1L, 2L -> 2L)
    assert(canon(ConnectedComponents.runAdaptive(edges, "u", "v")) === expected)
    assert(canon(ConnectedComponents.runAdaptive(edges, "u", "v",
      driverMaxEdges = 0L)) === expected)
  }

  test("adaptive CC: driver-edge bound is conf-tunable; above it the plan is distributed, not a collected LocalRelation") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    def isLocal(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.isInstanceOf[LocalRelation]
    // default bound: tiny graph is solved driver-side → LocalRelation
    assert(isLocal(ConnectedComponents.runAdaptive(edges, "doc_a", "doc_b")))
    // conf forces the distributed path with NO code change at the call site
    sp.conf.set(ConnectedComponents.DriverMaxEdgesConf, "0")
    try {
      val dist = ConnectedComponents.runAdaptive(edges, "doc_a", "doc_b")
      assert(!isLocal(dist), "conf bound 0 must dispatch to the distributed solver")
      assert(dist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    } finally sp.conf.unset(ConnectedComponents.DriverMaxEdgesConf)
  }

  test("star-contraction CC equals min-label CC; handles chains past min-label's round budget") {
    val sp = spark; import sp.implicits._
    // same fixture as the min-label test, plus a self-loop-only node
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (30L, 30L)).toDF("doc_a", "doc_b")
    val star = ConnectedComponents.runStar(edges, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val label = ConnectedComponents.run(edges, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === label)

    // pseudo-random graph (deterministic LCG), both algorithms agree
    var seed = 12345L
    def next(mod: Int): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L
      math.floorMod(seed >>> 33, mod).toLong }
    val rnd = (1 to 300).map(_ => (next(120), next(120))).filter(p => p._1 != p._2)
    val rdf = rnd.toDF("doc_a", "doc_b")
    assert(ConnectedComponents.runStar(rdf, "doc_a", "doc_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      ConnectedComponents.run(rdf, "doc_a", "doc_b", maxIter = 200)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)

    // a 120-node path: diameter 119 exceeds min-label's default round
    // budget (fail-loud), while star contraction converges in O(log n)
    val chain = (0L until 119L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      ConnectedComponents.run(chain, "doc_a", "doc_b").collect()
    }
    val starChain = ConnectedComponents.runStar(chain, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(starChain.length === 120 && starChain.forall(_._2 === 0L))
  }

  test("union-find and star contraction agree on q69c's real LSH pair graph (the in-query cross-check moved here in r8)") {
    val sp = spark; import sp.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = graft.ann.Ann.lshNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.35, nBits = 8, tables = 8, dim = 64, maxBucketSize = 10000)
      .select($"vec_a".as("va"), $"vec_b".as("vb"))
      .localCheckpoint()
    val adaptive = ConnectedComponents.runAdaptive(pairs, "va", "vb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = ConnectedComponents.runStar(pairs, "va", "vb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(adaptive === star,
      "the two CC implementations must produce identical labelings on the production edge graph")
    assert(adaptive.nonEmpty, "fixture graph should not be empty")
  }

  test("exact dedup keeper selection: min doc_id per content group") {
    val sp = spark; import sp.implicits._
    val df = Seq((5L, "same text"), (2L, "same text"), (9L, "other")).toDF("doc_id", "text")
    val groups = df.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("keeper"), r.getAs[Long]("n"))).toSet
    assert(groups === Set((2L, 2L), (9L, 1L)))
  }
}
