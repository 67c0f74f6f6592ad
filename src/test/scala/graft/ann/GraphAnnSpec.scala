package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Graph-ANN beam search: exhaustive equality on the complete graph,
  * measured recall at the realistic family, ring-backbone
  * reachability, store==inline row equality, pruned store reads. */
class GraphAnnSpec extends SparkSpec {

  private def emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
  private def queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("neighbor_id"), round(col("cos"), 4), col("rnk"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

  test("complete graph: beam walk equals brute force for any beam") {
    val n = emb.count().toInt
    val complete = GraphAnn.buildKnnGraph(emb, "vec_id", "embedding",
      k = n - 1, withRing = false)
    val got = GraphAnn.topK(complete, emb, queries,
      "vec_id", "embedding", "qid", "qvec", k = 5, beam = 2, maxHops = 3)
    val want = Ann.bruteForceTopK(emb, queries,
      "vec_id", "embedding", "qid", "qvec", 5)
    assert(asTuples(got) == asTuples(want))
  }

  test("realistic family: recall@5 against brute force meets the floor") {
    val graph = GraphAnn.buildKnnGraph(emb, "vec_id", "embedding", k = 10)
    val got = GraphAnn.topK(graph, emb, queries,
        "vec_id", "embedding", "qid", "qvec", k = 5, beam = 8, maxHops = 8)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Ann.bruteForceTopK(emb, queries,
        "vec_id", "embedding", "qid", "qvec", 5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & want).size.toDouble / want.size
    info(s"graph-ANN recall@5 at (k=10, beam=8, hops=8): $recall")
    assert(recall >= 0.9, s"recall@5 $recall below floor")
  }

  test("ring backbone reaches a cluster the kNN edges never leave") {
    val sp = spark; import sp.implicits._
    // two orthogonal clusters; k=2 kNN edges stay inside each cluster
    val pts = Seq(
      (0L, Seq(1f, 0f, 0.00f)), (1L, Seq(1f, 0f, 0.01f)), (2L, Seq(1f, 0f, 0.02f)),
      (10L, Seq(0f, 1f, 0.00f)), (11L, Seq(0f, 1f, 0.01f)), (12L, Seq(0f, 1f, 0.02f))
    ).toDF("vec_id", "embedding")
    val q = Seq((100L, Seq(0f, 1f, 0.005f))).toDF("qid", "qvec")

    val noRing = GraphAnn.buildKnnGraph(pts, "vec_id", "embedding",
      k = 2, withRing = false)
    val strandedTop = GraphAnn.topK(noRing, pts, q,
        "vec_id", "embedding", "qid", "qvec", k = 1, beam = 3, maxHops = 10)
      .collect()(0).getLong(1)
    assert(strandedTop < 10L,
      "entry cluster only: greedy walk must strand without the ring")

    val ring = GraphAnn.buildKnnGraph(pts, "vec_id", "embedding",
      k = 2, withRing = true)
    val foundTop = GraphAnn.topK(ring, pts, q,
        "vec_id", "embedding", "qid", "qvec", k = 1, beam = 3, maxHops = 10)
      .collect()(0).getLong(1)
    assert(foundTop >= 10L, "ring backbone must reach the far cluster")
  }

  test("store serve equals the inline walk; adjacency read is pruned") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_spec_${System.nanoTime()}"
    val h = GraphAnn.create(emb, "vec_id", "embedding", spark, path, k = 10)
    val inline = GraphAnn.topK(
      GraphAnn.buildKnnGraph(emb, "vec_id", "embedding", k = 10),
      emb, queries, "vec_id", "embedding", "qid", "qvec",
      k = 5, beam = 8, maxHops = 8)
    val served = h.topK(queries, "qid", "qvec", k = 5, beam = 8, maxHops = 8)
    assert(asTuples(served) == asTuples(inline))

    // reopen via ensure: same handle params, no rebuild (meta mtime)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mtime = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(path, "_graft_meta")).getModificationTime
    val h2 = GraphAnn.ensure(emb, "vec_id", "embedding", spark, path, k = 10)
    assert(fs.getFileStatus(new org.apache.hadoop.fs.Path(path, "_graft_meta"))
      .getModificationTime == mtime, "ensure must not rebuild")
    assert(h2.entry == h.entry)
    // mismatched build params fail loud
    intercept[IllegalArgumentException] {
      GraphAnn.ensure(emb, "vec_id", "embedding", spark, path, k = 11)
    }

    // the per-hop adjacency scan carries a pushed-down src predicate
    val adj = spark.read.schema("src BIGINT, dst BIGINT").parquet(s"$path/adj")
    val pruned = graft.operators.KeyPrune.restrict(
      adj, queries.select(col("qid").as("src")), Seq("src"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("src"),
      s"expected a pushed src filter in:\n$plan")
  }

  test("driver micro-walk equals the distributed walk row for row") {
    val graph = GraphAnn.buildKnnGraph(emb, "vec_id", "embedding", k = 10)
    // beamSearch routes a 10-query batch onto the driver micro-walk;
    // pin it against the distributed route on the SAME frames
    val adj = graph.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    val vecs = emb.select(col("vec_id").cast("long").as("id"),
        col("embedding").as("v"),
        graft.functions.VectorFunctions.l2Norm(col("embedding")).as("n"))
      .localCheckpoint()
    val micro = GraphAnn.beamSearch(adj, vecs, queries, "qid", "qvec",
      k = 5, beam = 8, maxHops = 8, entry = 0L)
    val qs = queries.select(col("qid").cast("long").as("qid"),
      col("qvec").as("qv"),
      graft.functions.VectorFunctions.l2Norm(col("qvec")).as("qn"))
    val dist = GraphAnn.distributedWalk(adj, vecs, qs,
      k = 5, beam = 8, maxHops = 8, entry = 0L)
    // bit-identical, not just 4dp-equal: compare UNROUNDED cos
    val m = micro.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val d = dist.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(m == d)
  }

  test("approx (LSH-candidate) build: served recall meets the floor; store approx flag round-trips") {
    // nBits sized to the corpus (bucket population n/2^nBits — see the
    // buildKnnGraphApprox scaladoc); the GraphAnnProbe grid reads
    // 0.94-0.98 across the nBits=4 row on this corpus
    val g = GraphAnn.buildKnnGraphApprox(emb, "vec_id", "embedding", k = 10,
      nBits = 4, tables = 16)
    val got = GraphAnn.topK(g, emb, queries, "vec_id", "embedding",
        "qid", "qvec", k = 5, beam = 16, maxHops = 10)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Ann.bruteForceTopK(emb, queries,
        "vec_id", "embedding", "qid", "qvec", 5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & want).size.toDouble / want.size
    info(s"approx-build graph-ANN recall@5 at (k=10, beam=16, hops=10): $recall")
    assert(recall >= 0.9, s"recall@5 $recall below floor")

    // the store records the build family; a mismatched reopen fails loud
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_approx_${System.nanoTime()}"
    val h = GraphAnn.create(emb, "vec_id", "embedding", spark, path,
      k = 10, approx = true)
    val served = h.topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10)
    // same DEFAULT family as create's approx build
    val gDefault = GraphAnn.buildKnnGraphApprox(emb, "vec_id", "embedding", k = 10)
    val inline = GraphAnn.topK(gDefault, emb, queries, "vec_id", "embedding",
      "qid", "qvec", k = 5, beam = 16, maxHops = 10)
    assert(asTuples(served) == asTuples(inline),
      "approx-build store serves the same walk as the inline approx graph")
    intercept[IllegalArgumentException] {
      GraphAnn.ensure(emb, "vec_id", "embedding", spark, path, k = 10)
    }
  }

  test("filtered serve: complete store == filtered brute; realistic family pinned by floor + contract") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val allowed = docs.filter(col("lang") =!= "en") // a DIFFERENT set than q241's
      .select(col("doc_id").as("vec_id"))
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet

    def filteredBrute(k: Int) = Ann.bruteForceTopK(
        emb.join(allowed, Seq("vec_id"), "left_semi"), queries,
        "vec_id", "embedding", "qid", "qvec", k)

    // complete-graph store: provably exhaustive => equals filtered brute
    val cgPath = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_spec_cg_${System.nanoTime()}"
    val cg = GraphAnn.create(emb, "vec_id", "embedding", spark, cgPath,
      k = GraphAnn.CompleteK)
    val got = cg.topKFiltered(queries, "qid", "qvec", allowed, "vec_id",
      k = 5, beam = 2, maxHops = 2)
    assert(asTuples(got) == asTuples(filteredBrute(5)))

    // realistic family: membership + dense ranks + measured recall
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_spec_f_${System.nanoTime()}"
    val h = GraphAnn.create(emb, "vec_id", "embedding", spark, path, k = 10)
    val real = h.topKFiltered(queries, "qid", "qvec", allowed, "vec_id",
        k = 5, beam = 16, maxHops = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(real.forall { case (_, n, _) => allowedIds(n) },
      "every filtered result is allowed")
    real.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        s"ranks dense for query $q")
    }
    val want = filteredBrute(5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotSet = real.map { case (q, n, _) => (q, n) }.toSet
    val recall = (gotSet & want).size.toDouble / want.size
    info(s"filtered graph-ANN recall@5 at (k=10, beam=16, hops=10): $recall")
    assert(recall >= 0.8, s"filtered recall@5 $recall below floor")

    // empty allowed set => zero rows, no failure
    val sp = spark; import sp.implicits._
    val none = Seq.empty[Long].toDF("vec_id")
    assert(h.topKFiltered(queries, "qid", "qvec", none, "vec_id",
      k = 5, beam = 8, maxHops = 4).count() == 0L)
  }

  test("append: search-based insert reaches new nodes; replay + crash windows heal; compact == fresh") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_app_${System.nanoTime()}"
    val seed = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val h = GraphAnn.create(seed, "vec_id", "embedding", spark, path, k = 10)
    val h2 = h.append(delta, "vec_id", "embedding")
    assert(h2.entry == 0L, "entry re-points at the new minimum id")

    // every new node must be REACHABLE: querying a new vector's own
    // embedding must return itself at rank 1 (cos 1.0)
    val newQs = delta.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val self = h2.topK(newQs, "qid", "qvec", k = 1, beam = 16, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(self.forall { case (q, n) => q == n },
      s"new nodes must be reachable (self top-1): ${self.filterNot(p => p._1 == p._2).toSeq}")

    // grown-corpus recall vs brute force
    val got = h2.topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Ann.bruteForceTopK(emb, queries,
        "vec_id", "embedding", "qid", "qvec", 5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & want).size.toDouble / want.size
    info(s"post-append recall@5: $recall")
    assert(recall >= 0.9, s"post-append recall@5 $recall below floor")

    // full replay is a no-op: same serve, no duplicate vector rows
    val h3 = h2.append(delta, "vec_id", "embedding")
    val replayServe = h3.topK(queries, "qid", "qvec", k = 5,
      beam = 16, maxHops = 10)
    assert(asTuples(replayServe) ==
      asTuples(h2.topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10)))
    val vecRows = spark.read
      .schema(s"id BIGINT, v ARRAY<float>, n DOUBLE")
      .parquet(s"$path/vectors")
    assert(vecRows.count() == emb.count(), "no duplicate vector rows")
    assert(vecRows.groupBy(col("id")).count().filter(col("count") > 1).count() == 0L)

    // crash window: vectors landed, adjacency missing — simulate by
    // appending a SECOND slice's vectors only, then healing via append
    val path2 = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_app2_${System.nanoTime()}"
    val hB = GraphAnn.create(seed, "vec_id", "embedding", spark, path2, k = 10)
    delta.select(col("vec_id").cast("long").as("id"),
        col("embedding").as("v"))
      .withColumn("n", graft.functions.VectorFunctions.l2Norm(col("v")))
      .repartition(1).sortWithinPartitions(col("id"))
      .write.mode("append").parquet(s"$path2/vectors")
    val healed = hB.append(delta, "vec_id", "embedding")
    assert(asTuples(healed.topK(queries, "qid", "qvec", k = 5,
        beam = 16, maxHops = 10)) ==
      asTuples(h2.topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10)),
      "a vectors-landed/adj-missing crash heals to the clean-append serve")

    // partial id overlap fails loud (3 stored ids + 3 genuinely new)
    val mixed = emb.filter(col("vec_id") < 6)
      .withColumn("vec_id", when(col("vec_id") < 3, col("vec_id"))
        .otherwise(col("vec_id") + 100000L))
    intercept[IllegalArgumentException] {
      h3.append(mixed, "vec_id", "embedding")
    }

    // compact after append == fresh build on the grown corpus
    val hc = h3.compact()
    val freshPath = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_app_fresh_${System.nanoTime()}"
    val fresh = GraphAnn.create(emb, "vec_id", "embedding", spark,
      freshPath, k = 10)
    assert(asTuples(hc.topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10))
      == asTuples(fresh.topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10)))
  }

  test("takedown: removed never served, entry re-points, replay-idempotent, compact == fresh build") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_td_${System.nanoTime()}"
    val h = GraphAnn.create(emb, "vec_id", "embedding", spark, path, k = 10)
    val removed = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"))
    val removedIds = removed.collect().map(_.getLong(0)).toSet
    assert(removedIds.contains(0L), "the entry id is part of the takedown")

    val h2 = h.remove(removed, "vec_id")
    assert(h2.entry == (0L until 10L).find(i => !removedIds.contains(i)).get,
      "entry re-points at the smallest kept id")

    // removed ids never appear, even asking for the whole corpus
    val all = h2.topK(queries, "qid", "qvec", k = 100000,
        beam = 16, maxHops = 10)
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet
    assert((all & removedIds).isEmpty, "tombstoned ids must never serve")

    // replaying the SAME takedown is a no-op (ledger is a set union)
    val h3 = h2.remove(removed, "vec_id")
    val a = h2.topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10)
    val b = h3.topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10)
    assert(asTuples(a) == asTuples(b))

    // a handle opened BEFORE the takedown serves the new generation
    // (entry + ledger are read at call time)
    val stale = GraphAnn.Handle(spark, path, entry = 0L,
      vecElem = h.vecElem, dim = h.dim)
    val staleServe = stale.topK(queries, "qid", "qvec", k = 100000,
        beam = 16, maxHops = 10)
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet
    assert((staleServe & removedIds).isEmpty,
      "a pre-takedown handle must serve the post-takedown generation")

    // compact rebuilds over the kept corpus: serve == a fresh build
    // on the kept vectors, row for row (same deterministic inputs =>
    // same graph => same walk), and the ledger is gone
    val hc = h2.compact()
    val freshPath = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_fresh_${System.nanoTime()}"
    val fresh = GraphAnn.create(emb.filter(col("vec_id") % 7 =!= 0),
      "vec_id", "embedding", spark, freshPath, k = 10)
    val servedC = hc.topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10)
    val servedF = fresh.topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10)
    assert(asTuples(servedC) == asTuples(servedF))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "_tombstones")),
      "compact clears the tombstone ledger")

    // removing everything fails loud
    intercept[IllegalArgumentException] {
      fresh.remove(emb.select(col("vec_id")), "vec_id")
    }
  }

  test("append guards: tombstoned ids fail loud; duplicate delta ids fail loud") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_guard_${System.nanoTime()}"
    val seed = emb.filter(col("vec_id") % 5 =!= 0)
    val h = GraphAnn.create(seed, "vec_id", "embedding", spark, path, k = 10)

    // remove a slice, then try to re-append it: the live-vector probe
    // must NOT read the tombstoned rows as "already stored" (which
    // would skip both writes and leave the vector invisible) — it
    // fails loud instead, directing at compact()
    val slice = seed.filter(col("vec_id") % 3 === 1)
    val h2 = h.remove(slice.select(col("vec_id")), "vec_id")
    val ex = intercept[IllegalArgumentException] {
      h2.append(slice, "vec_id", "embedding")
    }
    assert(ex.getMessage.contains("tombstoned"))
    // ...and the store still serves (nothing was half-written)
    assert(h2.topK(queries, "qid", "qvec", k = 5).count() > 0)
    // after compact the same batch appends cleanly and serves itself
    val h3 = h2.compact().append(slice, "vec_id", "embedding")
    val selfQ = slice.limit(3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val self = h3.topK(selfQ, "qid", "qvec", k = 1, beam = 16, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(self.nonEmpty && self.forall { case (q, n) => q == n },
      "re-appended-after-compact ids serve themselves at rank 1")

    // a batch carrying the same id twice violates the unique-id
    // invariant (duplicate vector rows, double ring edges): fail loud
    val dup = emb.filter(col("vec_id") % 5 === 0).limit(4)
      .unionAll(emb.filter(col("vec_id") % 5 === 0).limit(2))
    val ex2 = intercept[IllegalArgumentException] {
      h3.append(dup, "vec_id", "embedding")
    }
    assert(ex2.getMessage.contains("duplicate"))
  }

  test("serve heals a tombstoned meta entry (remove-crash window)") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_heal_${System.nanoTime()}"
    val h = GraphAnn.create(emb, "vec_id", "embedding", spark, path, k = 10)
    // simulate the crash BETWEEN remove()'s ledger swap and its meta
    // rewrite: write a ledger containing the entry id, leave meta at 0
    val sp = spark; import sp.implicits._
    Seq(0L, 1L, 2L).toDF("id")
      .repartition(1).write.parquet(s"$path/_tombstones")
    assert(h.entry == 0L)
    val served = h.topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10)
    assert(served.count() > 0,
      "a tombstoned meta entry must not silently serve empty")
    val ids = served.select(col("neighbor_id")).collect()
      .map(_.getLong(0)).toSet
    assert((ids & Set(0L, 1L, 2L)).isEmpty, "tombstoned ids never serve")
  }

  test("prunedVecRead: literal and semi-join routes return identical rows") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_pvr_${System.nanoTime()}"
    val h = GraphAnn.create(emb, "vec_id", "embedding", spark, path, k = 10)
    val vecs = spark.read.schema("id BIGINT, v ARRAY<float>, n DOUBLE")
      .parquet(s"$path/vectors")
    val ids = (0L until 400L by 3L).toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("n")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val lit = GraphAnn.prunedVecRead(vecs, ids, spark)
    val semi = GraphAnn.prunedVecRead(vecs, ids, spark, maxLiteral = 16)
    assert(ids.length > 16 && ids.length <= GraphAnn.MaxInLiteralIds)
    assert(rows(lit) == rows(semi))
    assert(rows(lit).map(_._1) == ids.filter(_ < emb.count()).toSet)
  }

  test("steady replay: compact/remove of an already-converged store are physical no-ops") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_steady_${System.nanoTime()}"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def adjFiles() = fs.listStatus(new org.apache.hadoop.fs.Path(path, "adj"))
      .map(s => (s.getPath.getName, s.getModificationTime, s.getLen)).toSet

    val h = GraphAnn.create(emb, "vec_id", "embedding", spark, path, k = 10)
    val removed = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    val hc = h.remove(removed, "vec_id").compact()
    val files1 = adjFiles()
    val served1 = asTuples(hc.topK(queries.filter(col("qid") % 7 =!= 0),
      "qid", "qvec", k = 5, beam = 16, maxHops = 10))

    // the replayed mutate-then-compact pipeline: the ids are already
    // purged, so the remove must not write a ledger and the compact
    // must not rebuild — the adjacency files are untouched
    val h2 = hc.remove(removed, "vec_id")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "_tombstones")),
      "a takedown of already-purged ids must not re-create the ledger")
    val hc2 = h2.compact()
    assert(adjFiles() == files1, "no-op compact must leave the graph files untouched")
    val served2 = asTuples(hc2.topK(queries.filter(col("qid") % 7 =!= 0),
      "qid", "qvec", k = 5, beam = 16, maxHops = 10))
    assert(served1 == served2)

    // an append makes the adjacency merge-on-read again: the NEXT
    // compact must rebuild (dirty honored), and only that one
    val delta = emb.filter(col("vec_id") % 7 === 0).limit(5)
    val hc3 = hc2.append(delta, "vec_id", "embedding").compact()
    assert(adjFiles() != files1, "compact after append must rebuild")
    val files2 = adjFiles()
    assert(adjFiles() == files2 && hc3.compact() == hc3,
      "second compact after the rebuild is a no-op again")
  }
}
