package graft.ann

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfStoreSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("store").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def queries =
    emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("store topK equals the in-memory IVF route; probes prune partitions") {
    val path = tmp("ivfstore")
    val h = IvfStore.build(emb, "vec_id", "embedding", path, nlist = 16)

    // training is deterministic: an independent train on the same
    // corpus reproduces the stored model, so the two routes share it
    val model = Ivf.train(emb, "vec_id", "embedding", nlist = 16, iterations = 2)
    val inMem = Ivf.topK(Ivf.index(emb, "embedding", model), queries,
      "vec_id", "embedding", "qid", "qvec", model, k = 5, nprobe = 4)
    val store = h.topK(queries, "qid", "qvec", k = 5, nprobe = 4)
    assert(rows(store) === rows(inMem))
    assert(store.count() > 0)

    // the probed read is a PARTITION filter (cell directories), and
    // it touches a strict subset of the store's files. The plan is
    // adaptive (joins => exchanges), so walk through AQE wrappers and
    // query stages to reach the scan node.
    val probe = h.topK(queries.limit(1), "qid", "qvec", k = 5, nprobe = 2)
    probe.count()
    def findScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScans(q.plan)
      case other => (other.children ++ other.subqueries).flatMap(findScans)
    }
    val scan = findScans(probe.queryExecution.executedPlan)
      .find(_.schema.fieldNames.contains("__cn"))
      .getOrElse(sys.error("no vector scan in plan"))
    assert(scan.toString.matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      scan.toString)
    val all = h.vectors.inputFiles.length.toLong
    assert(scan.metrics("numFiles").value < all,
      s"probe read ${scan.metrics("numFiles").value} of $all files — no pruning")
  }

  test("ADC serve path equals the in-memory IVF-PQ route; exhaustive equals brute force") {
    val h = IvfStore.build(emb, "vec_id", "embedding", tmp("ivfadc"), nlist = 16)
    // the in-memory composed route under the SAME deterministic models
    val composed = IvfPq.Model(h.model, h.pq, residual = true)
    val wantPruned = rows(IvfPq.topK(
      IvfPq.index(emb, "embedding", composed), queries,
      "vec_id", "embedding", "qid", "qvec", composed,
      k = 5, nprobe = 4, shortlist = 50))
    val gotPruned = rows(h.topKAdc(queries, "qid", "qvec",
      k = 5, nprobe = 4, shortlist = 50))
    assert(gotPruned == wantPruned, "store ADC must equal the in-memory IVF-PQ route")
    // exhaustive setting degenerates to brute force THROUGH the store
    val n = emb.count().toInt
    val bf = rows(Ann.bruteForceTopK(emb, queries,
      "vec_id", "embedding", "qid", "qvec", 5)
      .select(col("query_id"), col("neighbor_id")))
    val full = rows(h.topKAdc(queries, "qid", "qvec",
      k = 5, nprobe = 16, shortlist = n)
      .select(col("query_id"), col("neighbor_id")))
    assert(full == bf)
  }

  test("topKAdcFiltered: exhaustive setting equals brute force over the allowed set") {
    val h = IvfStore.build(emb, "vec_id", "embedding", tmp("ivffilter"), nlist = 16)
    val allowed = emb.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
    val n = emb.count().toInt
    // exhaustive probes + over-corpus shortlist: exactly the filtered
    // brute-force ranking THROUGH the store (the q234/q232 oracle)
    val got = rows(h.topKAdcFiltered(queries, "qid", "qvec",
      k = 5, nprobe = 16, shortlist = n, allowed = allowed))
    val want = rows(Ann.bruteForceTopK(
      emb.join(allowed, Seq("vec_id"), "left_semi"), queries,
      "vec_id", "embedding", "qid", "qvec", 5))
    assert(got == want)
    assert(got.nonEmpty)
    // realistic probes: every hit allowed, ranks dense from 1
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    val real = h.topKAdcFiltered(queries, "qid", "qvec",
        k = 5, nprobe = 4, shortlist = 50, allowed = allowed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(real.forall(r => allowedSet.contains(r._2)))
    real.groupBy(_._1).values.foreach { hits =>
      assert(hits.map(_._3).sorted.toSeq == (1 to hits.length))
    }
    // empty allowed set: zero rows, not an error
    assert(h.topKAdcFiltered(queries, "qid", "qvec", k = 5, nprobe = 4,
      shortlist = 50, allowed = emb.filter(lit(false)).select(col("vec_id")))
      .isEmpty)
  }

  test("ADC plan: the candidate scan reads codes, never the vector column") {
    val h = IvfStore.build(emb, "vec_id", "embedding", tmp("ivfplan"), nlist = 16)
    val q = h.topKAdc(queries, "qid", "qvec", k = 5, nprobe = 4, shortlist = 50)
    q.count() // finalize the adaptive plan before reading it
    val plan = q.queryExecution.executedPlan.toString
    // two pruned reads of the vectors table: the ADC candidate scan
    // (codes, NO vector/norm — the 8-bytes-per-row claim, verified on
    // the plan's ReadSchema) and the shortlist re-rank (vector + norm)
    assert(plan.matches(
      "(?s).*ReadSchema: struct<vec_id:bigint,codes:array<int>>.*"),
      s"ADC scan must read (id, codes) only:\n$plan")
    assert(plan.matches(
      "(?s).*ReadSchema: struct<vec_id:bigint,embedding:array<float>,__cn:double>.*"),
      s"re-rank scan with vector + norm missing:\n$plan")
    // and the candidate read is CELL-pruned (partition filter on cell)
    assert(plan.matches("(?s).*PartitionFilters: \\[cell[^\\]]*\\].*"),
      s"ADC scan is not cell-pruned:\n$plan")
  }

  test("appended rows carry frozen-codebook codes: ADC serve equals a from-scratch union") {
    val base = emb.filter(col("vec_id") % 4 =!= 0)
    val delta = emb.filter(col("vec_id") % 4 === 0)
    val h = IvfStore.build(base, "vec_id", "embedding", tmp("ivfadcapp"), nlist = 16)
    h.append(delta)
    // frozen-model reference: same models, union corpus indexed in memory
    val composed = IvfPq.Model(h.model, h.pq, residual = true)
    val want = rows(IvfPq.topK(
      IvfPq.index(emb, "embedding", composed), queries,
      "vec_id", "embedding", "qid", "qvec", composed,
      k = 5, nprobe = 4, shortlist = 50))
    assert(rows(h.topKAdc(queries, "qid", "qvec",
      k = 5, nprobe = 4, shortlist = 50)) == want)
  }

  test("append assigns by the stored model: equals indexing the union under it") {
    val path = tmp("ivfstore_append")
    val half1 = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val half2 = emb.filter(pmod(col("vec_id"), lit(2)) === 1)

    val h = IvfStore.build(half1, "vec_id", "embedding", path, nlist = 8)
    h.append(half2)

    // reference: the SAME frozen model over the whole corpus in memory
    val model = Ivf.train(half1, "vec_id", "embedding", nlist = 8, iterations = 2)
    val ref = Ivf.topK(Ivf.index(emb, "embedding", model), queries,
      "vec_id", "embedding", "qid", "qvec", model, k = 5, nprobe = 3)
    assert(rows(h.topK(queries, "qid", "qvec", k = 5, nprobe = 3)) === rows(ref))

    // empty delta is a no-op
    assert(h.append(emb.filter(col("vec_id") < 0)).vectors.count() ===
      h.vectors.count())
  }

  test("compact shrinks an appended index; topK and pruning unchanged") {
    val path = tmp("ivfstore_compact")
    val parts = (0 until 4).map(i => emb.filter(pmod(col("vec_id"), lit(4)) === i))
    var h = IvfStore.build(parts.head, "vec_id", "embedding", path, nlist = 8)
    parts.tail.foreach(p => h.append(p))

    val before = h.vectors.inputFiles.length
    val pre = rows(h.topK(queries, "qid", "qvec", k = 5, nprobe = 3))
    val c = IvfStore.compact(h, filesPerCellGroup = 8)
    assert(c.vectors.inputFiles.length < before,
      s"compact left ${c.vectors.inputFiles.length} of $before files")
    assert(rows(c.topK(queries, "qid", "qvec", k = 5, nprobe = 3)) === pre)
  }

  test("remove: physical cell-pruned delete; exhaustive serve equals brute force over kept") {
    val sp = spark; import sp.implicits._
    val path = tmp("ivfdrop")
    val h = IvfStore.build(emb, "vec_id", "embedding", path, nlist = 16)
    def cellFiles() = {
      val fs = new java.io.File(s"$path/vectors")
      fs.listFiles().filter(_.isDirectory)
        .map(d => d.getName -> d.listFiles().map(f => (f.getName, f.lastModified())).toSet)
        .toMap
    }
    // single-id takedown first: exactly one cell rewrites, the rest
    // keep their files byte-identical
    val before1 = cellFiles()
    h.remove(emb.filter(col("vec_id") === 0).select(col("vec_id")))
    val after1 = cellFiles()
    val untouched1 = before1.keys.filter(d => after1.get(d).contains(before1(d)))
    assert(untouched1.size >= before1.size - 1,
      s"single-id takedown rewrote ${before1.size - untouched1.size} cells")
    assert(h.vectors.filter(col("vec_id") === 0).isEmpty)
    // bulk takedown: serve contract over the kept corpus
    val gone = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    h.remove(gone)
    // removed ids are physically gone
    assert(h.vectors.join(gone, Seq("vec_id"), "left_semi").isEmpty)
    // exhaustive setting (nprobe = nlist): exact-cosine top-k over the
    // KEPT vectors — brute force, independent of the trained models
    val got = rows(h.topK(queries, "qid", "qvec", k = 5, nprobe = 16))
    val kept = emb.filter(col("vec_id") % 7 =!= 0)
    val want = rows(Ann.bruteForceTopK(kept, queries,
      "vec_id", "embedding", "qid", "qvec", k = 5))
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    // replay is a no-op (ids already absent)
    h.remove(gone)
    assert(rows(h.topK(queries, "qid", "qvec", k = 5, nprobe = 16)) == want)
    // a removed id can be re-appended and then serves again
    val one = emb.filter(col("vec_id") === 7)
    h.append(one)
    assert(!h.vectors.filter(col("vec_id") === 7).isEmpty)
  }

  test("OPQ store: ADC serve equals the in-memory IVF-OPQ composition under shared stored models") {
    val h = IvfStore.build(emb, "vec_id", "embedding", tmp("ivfopq"),
      nlist = 16, opq = true)
    assert(h.opq.nonEmpty, "OPQ build must persist a rotation")
    // in-memory composition assembled FROM the store's frozen models —
    // rows must match exactly (same cells, same codes, same re-rank)
    val mem = IvfOpq.Model(h.opq.get.rotation, h.opq.get.shifts,
      IvfPq.Model(h.model, h.pq, residual = true))
    val want = rows(IvfOpq.topK(IvfOpq.index(emb, "embedding", mem), queries,
      "vec_id", "embedding", "qid", "qvec", mem,
      k = 5, nprobe = 4, shortlist = 50))
    assert(rows(h.topKAdc(queries, "qid", "qvec",
      k = 5, nprobe = 4, shortlist = 50)) == want)
    assert(want.nonEmpty)
  }

  test("OPQ store: open restores the rotation; frozen-rotation append equals union under stored models") {
    val path = tmp("ivfopq_app")
    val base = emb.filter(col("vec_id") % 4 =!= 0)
    val delta = emb.filter(col("vec_id") % 4 === 0)
    val built = IvfStore.build(base, "vec_id", "embedding", path,
      nlist = 16, opq = true)
    val h = IvfStore.open(spark, path)
    assert(h.opq.nonEmpty)
    assert(h.opq.get.rotation.map(_.toSeq).toSeq ==
      built.opq.get.rotation.map(_.toSeq).toSeq)
    assert(h.opq.get.shifts.toSeq == built.opq.get.shifts.toSeq)
    h.append(delta)
    // appended rows were rotated/assigned/encoded by the FROZEN stored
    // rotation + models: serving equals the in-memory composition over
    // the union corpus under those same models
    val mem = IvfOpq.Model(h.opq.get.rotation, h.opq.get.shifts,
      IvfPq.Model(h.model, h.pq, residual = true))
    val want = rows(IvfOpq.topK(IvfOpq.index(emb, "embedding", mem), queries,
      "vec_id", "embedding", "qid", "qvec", mem,
      k = 5, nprobe = 4, shortlist = 50))
    assert(rows(h.topKAdc(queries, "qid", "qvec",
      k = 5, nprobe = 4, shortlist = 50)) == want)
    // exhaustive setting through the rotated store stays brute-force
    // exact (the q74b/q181b argument carried through the persisted
    // rotation): equals plain brute force on raw vectors
    val brute = rows(Ann.bruteForceTopK(emb, queries,
      "vec_id", "embedding", "qid", "qvec", k = 5))
    assert(rows(h.topKAdc(queries, "qid", "qvec",
      k = 5, nprobe = 16, shortlist = Int.MaxValue)) == brute)
    // plain topK refuses an OPQ store instead of probing wrong cells
    val e = intercept[IllegalArgumentException] {
      h.topK(queries, "qid", "qvec", k = 5, nprobe = 4)
    }
    assert(e.getMessage.contains("topKAdc"))
  }

  test("build fails loud on a dim mismatch instead of training wrong-width codebooks") {
    val e = intercept[IllegalArgumentException] {
      IvfStore.build(emb, "vec_id", "embedding", tmp("ivfdim"),
        nlist = 8, dim = 32)
    }
    assert(e.getMessage.contains("dim"))
  }

  test("open/ensure round trip restores the model; mismatched columns fail loud") {
    val path = tmp("ivfstore_meta")
    val built = IvfStore.build(emb, "vec_id", "embedding", path, nlist = 8)

    val h = IvfStore.open(spark, path)
    assert(h.idCol === "vec_id" && h.vecCol === "embedding")
    assert(h.model.nlist === 8)
    assert(h.model.centroids.map(_._1).toSeq === built.model.centroids.map(_._1).toSeq)
    assert(h.model.centroids.map(_._2.toSeq).toSeq ===
      built.model.centroids.map(_._2.toSeq).toSeq)

    // ensure() on an existing store opens instead of retraining
    val poisoned = emb.withColumn("embedding",
      raise_error(lit("ensure() must not retrain an existing store"))
        .cast("array<double>"))
    assert(IvfStore.ensure(poisoned, "vec_id", "embedding", spark, path,
      nlist = 8).model.nlist === 8)

    val e = intercept[IllegalArgumentException] {
      IvfStore.ensure(emb, "doc_id", "embedding", spark, path, nlist = 8)
    }
    assert(e.getMessage.contains("idCol") || e.getMessage.contains("doc_id"))
  }
}
