package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PostingsStoreSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("store").toString

  test("store-backed searches return exactly the inline results") {
    val path = tmp("poststore")
    val h = PostingsStore.build(docs, "doc_id", "text", path, nBuckets = 16)

    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet

    assert(rows(h.phraseSearch(Seq("table", "hash"))) ===
      rows(InvertedIndex.phraseSearch(docs, "doc_id", "text", Seq("table", "hash"))))
    assert(rows(h.proximitySearch("vector", "table", slop = 5)) ===
      rows(InvertedIndex.proximitySearch(docs, "doc_id", "text", "vector", "table", 5)))
    assert(rows(h.allTermsSearch(Seq("vector", "stream", "window"))) ===
      rows(InvertedIndex.allTermsSearch(docs, "doc_id", "text",
        Seq("vector", "stream", "window"))))
    assert(rows(h.bm25Search(Seq("vector", "stream", "window"), k = 20)) ===
      rows(InvertedIndex.bm25Search(docs, "doc_id", "text",
        Seq("vector", "stream", "window"), k = 20)))
  }

  test("bm25SearchFiltered: corpus-global stats, allowed-only top-k, never under-returns") {
    val path = tmp("poststore_filter")
    val h = PostingsStore.build(docs, "doc_id", "text", path, nBuckets = 16)
    val terms = Seq("vector", "stream", "window")
    val allowed = docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"))
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    val got = h.bm25SearchFiltered(terms, k = 10, allowed).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // every hit allowed; ranks dense from 1
    assert(got.forall(r => allowedSet.contains(r._1)))
    assert(got.map(_._3).sorted.toSeq == (1L to got.length.toLong))
    // scores are the UNFILTERED scores of the same docs (corpus-global
    // IDF/avgdl — the filter restricts results, never re-weights), and
    // the filtered top-k is exactly the allowed prefix of the full
    // ranking: a plain-top-k post-filter would under-return whenever
    // a disallowed doc out-scores an allowed one
    val full = h.bm25Search(terms, k = 1000).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val fullScore = full.toMap
    assert(got.forall(r => fullScore(r._1) == r._2))
    val expect = full.filter(r => allowedSet.contains(r._1)).take(10).map(_._1).toSeq
    assert(got.map(_._1).toSeq == expect)
    assert(got.nonEmpty)
    // empty allowed set: zero rows, not an error
    assert(h.bm25SearchFiltered(terms, k = 10,
      docs.filter(lit(false)).select(col("doc_id"))).isEmpty)
  }

  test("term lookup prunes partitions (directory skip) and pushes the term filter") {
    val path = tmp("poststore_prune")
    val h = PostingsStore.build(docs, "doc_id", "text", path, nBuckets = 16)

    val probe = h.termPostings("table")
    val plan = probe.queryExecution.executedPlan.toString
    // the bucket predicate must reach the scan as a PARTITION filter
    // (constant-folded literal on the partition column) and the term
    // equality as a pushed parquet filter — row filtering alone would
    // mean the store is being rescanned like the inline form
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*term_bucket[^\\]]*\\].*"), plan)
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(term,table\\)[^\\]]*\\].*"), plan)
    assert(probe.count() > 0)

    // the pruned read touches a strict subset of the store's files:
    // inputFiles ignores partition pruning, so read the scan node's
    // post-execution numFiles metric instead
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.count()
      df.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numFiles").value
        }.getOrElse(sys.error("no FileSourceScanExec in plan"))
    }
    val allFiles = h.postings.inputFiles.length.toLong
    val probedFiles = scannedFiles(probe)
    assert(probedFiles < allFiles,
      s"term probe read $probedFiles of $allFiles files — no pruning happened")

    // multi-term lookup keeps the bucket predicate a partition filter
    val multi = h.termsPostings(Seq("vector", "stream", "window"))
    val mplan = multi.queryExecution.executedPlan.toString
    assert(mplan.matches("(?s).*PartitionFilters: \\[[^\\]]*term_bucket[^\\]]*\\].*"), mplan)
  }

  test("open/ensure round trip, meta validation, crash heal") {
    val path = tmp("poststore_meta")
    PostingsStore.build(docs, "doc_id", "text", path, nBuckets = 8)

    val h = PostingsStore.open(spark, path)
    assert(h.idCol === "doc_id" && h.nBuckets === 8)

    // ensure() on an existing store opens instead of rebuilding
    // (by-name docs arg: passing a poisoned frame proves no rebuild)
    val poisoned = docs.withColumn("text",
      raise_error(lit("ensure() must not re-tokenize an existing store")).cast("string"))
    val h2 = PostingsStore.ensure(poisoned, "doc_id", "text", spark, path)
    assert(h2.nBuckets === 8)

    // idCol mismatch fails loud instead of serving wrong columns
    val e = intercept[IllegalArgumentException] {
      PostingsStore.ensure(docs, "vec_id", "text", spark, path)
    }
    assert(e.getMessage.contains("idCol"))

    // a crashed swap (store moved aside, nothing in place) heals on open
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val aside = new org.apache.hadoop.fs.Path(
      dst.getParent, "." + dst.getName + ".swapold")
    assert(fs.rename(dst, aside))
    val healed = PostingsStore.open(spark, path)
    assert(healed.termPostings("table").count() > 0)
  }

  test("termstats agree with a recomputation from the postings; lookups prune") {
    val path = tmp("poststore_stats")
    val h = PostingsStore.build(docs, "doc_id", "text", path, nBuckets = 16)

    val fromStats = h.statsPostings(Seq("vector", "table"))
      .select("term", "df", "cf", "max_tf").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val fromPostings = h.termsPostings(Seq("vector", "table"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        max(col("tf")).as("max_tf"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(fromStats === fromPostings)
    assert(h.termDfs(Seq("vector", "definitely_not_a_term")).apply("definitely_not_a_term") === 0L)

    // the stats lookup prunes directories exactly like the postings one
    val plan = h.statsPostings(Seq("vector")).queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*term_bucket[^\\]]*\\].*"), plan)
  }

  test("df-ordered conjunction: skewed dfs take the rarest-first semi-join route, same rows") {
    val path = tmp("poststore_dford")
    // planted skew: 'needle' in 3 docs, 'the-ish' terms in all 40
    val rows = (0L until 40L).map { i =>
      val rare = if (i % 13 == 0) " needle" else ""
      (i, s"alpha beta gamma common$rare words alpha beta")
    }
    val s = spark
    import s.implicits._
    val d = rows.toDF("doc_id", "text")
    val h = PostingsStore.build(d, "doc_id", "text", path, nBuckets = 8)

    // df skew 40/4 >= DfSkewRatio — route must plant a semi-join
    val q = h.allTermsSearch(Seq("common", "needle"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    // identical rows to the inline (scan + tokenize) formulation
    val inline = InvertedIndex.allTermsSearch(d, "doc_id", "text", Seq("common", "needle"))
    assert(q.collect().map(_.toSeq).toSet === inline.collect().map(_.toSeq).toSet)
    assert(q.count() === 4) // docs 0, 13, 26, 39

    // flat dfs (both terms everywhere) stay on the single-aggregation
    // route — no join anywhere in the plan
    val flat = h.allTermsSearch(Seq("alpha", "beta"))
    assert(!flat.queryExecution.executedPlan.toString.contains("Join"))
    assert(flat.count() === 40)

    // a term with df=0 short-circuits to an empty frame of the same shape
    val none = h.allTermsSearch(Seq("common", "zzz_absent"))
    assert(none.columns.toSeq === Seq("doc_id", "n_hits"))
    assert(none.count() === 0)
  }

  test("MaxScore: high-df low-impact terms go non-essential; pruned top-k is exact") {
    val path = tmp("poststore_maxscore")
    // planted skew: 'needle' in 5 of 60 docs, 'common' in all of them
    // (varying tf so scores spread); docs WITHOUT needle must be
    // prunable — only needle's 5 docs can reach the top-3
    val s = spark
    import s.implicits._
    val d = (0L until 60L).map { i =>
      val rare = if (i % 12 == 0) " needle" else ""
      val pad = "filler " * (i % 7).toInt
      (i, s"${pad}common words common here$rare common")
    }.toDF("doc_id", "text")
    val h = PostingsStore.build(d, "doc_id", "text", path, nBuckets = 8)

    val plan = h.bm25MaxScorePlan(Seq("needle", "common"), k = 3)
    assert(plan.isDefined, "expected a MaxScore decomposition on 12x df skew")
    assert(plan.get.nonEssential === Seq("common"), plan.get.toString)
    assert(plan.get.essential === Seq("needle"))
    assert(plan.get.upperBounds("needle") > plan.get.upperBounds("common"))

    // pruned result identical to the unpruned store route and the
    // inline formulation
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq
    val pruned = h.bm25SearchPruned(Seq("needle", "common"), k = 3)
    assert(rows(pruned) === rows(h.bm25Search(Seq("needle", "common"), k = 3)))
    assert(rows(pruned) === rows(InvertedIndex.bm25Search(
      d, "doc_id", "text", Seq("needle", "common"), k = 3)))

    // flat dfs: the decomposition may still find a low-impact term
    // non-essential (impact differs through tf even at equal df) —
    // whatever it decides, the soundness invariant Σub(nonEss) < θ_lb
    // holds and the pruned result stays exact
    h.bm25MaxScorePlan(Seq("common", "words"), k = 3).foreach { p =>
      assert(p.nonEssential.map(p.upperBounds).sum < p.thetaLb, p.toString)
    }
    assert(rows(h.bm25SearchPruned(Seq("common", "words"), k = 3)) ===
      rows(h.bm25Search(Seq("common", "words"), k = 3)))

    // k exceeding the seed term's doc list → no threshold, no plan,
    // route falls back to the plain store search
    assert(h.bm25MaxScorePlan(Seq("needle", "common"), k = 10).isEmpty)
    assert(rows(h.bm25SearchPruned(Seq("needle", "common"), k = 10)) ===
      rows(h.bm25Search(Seq("needle", "common"), k = 10)))

    // absent terms drop out of the decomposition; all-absent falls
    // back to the plain (empty) route
    assert(h.bm25MaxScorePlan(Seq("needle", "zzz_absent"), k = 3).isEmpty)
    assert(h.bm25SearchPruned(Seq("zzz_absent"), k = 3).count() === 0)
  }

  test("ensure rebuilds a stale-version store in place") {
    val path = tmp("poststore_upgrade")
    PostingsStore.build(docs, "doc_id", "text", path, nBuckets = 8)
    // regress the published meta to v1 (the pre-termstats layout)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = new org.apache.hadoop.fs.Path(s"$path/_graft_meta")
    val out = fs.create(meta, true)
    out.write("version=1\nidCol=doc_id\nnBuckets=8\n".getBytes("UTF-8")); out.close()
    // open() refuses a stale store…
    assert(intercept[IllegalArgumentException] {
      PostingsStore.open(spark, path)
    }.getMessage.contains("version"))
    // …ensure() rebuilds it with the CALLER's layout config (the
    // stale store's is as outdated as its format) and the upgraded
    // store serves stats
    val h = PostingsStore.ensure(docs, "doc_id", "text", spark, path, nBuckets = 8)
    assert(h.termDfs(Seq("table")).apply("table") > 0L)
    assert(PostingsStore.open(spark, path).nBuckets === 8)
  }

  test("append folds new docs in: every search equals a from-scratch build of the union") {
    val incPath = tmp("poststore_inc")
    val fullPath = tmp("poststore_full")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)

    val h = PostingsStore.build(half1, "doc_id", "text", incPath, nBuckets = 16)
    PostingsStore.append(half2, "text", h)
    val full = PostingsStore.build(docs, "doc_id", "text", fullPath, nBuckets = 16)

    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    assert(rows(h.phraseSearch(Seq("table", "hash"))) ===
      rows(full.phraseSearch(Seq("table", "hash"))))
    assert(rows(h.proximitySearch("vector", "table", slop = 5)) ===
      rows(full.proximitySearch("vector", "table", slop = 5)))
    assert(rows(h.allTermsSearch(Seq("vector", "stream", "window"))) ===
      rows(full.allTermsSearch(Seq("vector", "stream", "window"))))
    assert(rows(h.bm25Search(Seq("vector", "stream", "window"), k = 20)) ===
      rows(full.bm25Search(Seq("vector", "stream", "window"), k = 20)))
    // merged statistics equal the union build's exactly (df/cf sum,
    // max_tf max — all exact under disjoint ids)
    assert(rows(h.termStats.select("term", "df", "cf", "max_tf")) ===
      rows(full.termStats.select("term", "df", "cf", "max_tf")))
    // appended postings stay pruned: partition filter still on the plan
    val plan = h.termPostings("table").queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*term_bucket[^\\]]*\\].*"), plan)

    // appending to an empty-corpus (flat) store falls back to a build
    val emptyPath = tmp("poststore_inc_empty")
    val he = PostingsStore.build(docs.filter(col("doc_id") < 0),
      "doc_id", "text", emptyPath, nBuckets = 8)
    val he2 = PostingsStore.append(half1, "text", he)
    assert(rows(he2.phraseSearch(Seq("table", "hash"))) ===
      rows(PostingsStore.build(half1, "doc_id", "text",
        tmp("poststore_inc_ref"), nBuckets = 8).phraseSearch(Seq("table", "hash"))))
  }

  test("append replay converges: full redelivery and the postings-landed crash window") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)

    // full redelivery of an absorbed batch is a no-op on every table
    val h = PostingsStore.build(half1, "doc_id", "text",
      tmp("poststore_replay"), nBuckets = 8)
    val h2 = PostingsStore.append(half2, "text", h)
    val counts = (h2.postings.count(), h2.termDocs.count(),
      h2.docLens.count(), h2.numDocs)
    val statsBefore = rows(h2.termStats.select("term", "df", "cf", "max_tf"))
    val h3 = PostingsStore.append(half2, "text", h2)
    assert((h3.postings.count(), h3.termDocs.count(),
      h3.docLens.count(), h3.numDocs) == counts,
      "replaying a fully-landed batch must change nothing")
    assert(rows(h3.termStats.select("term", "df", "cf", "max_tf")) == statsBefore,
      "replay must not re-merge statistics")

    // crash window: the batch's POSTINGS landed but termdocs, stats,
    // doclen, and meta did not — the exact window that used to leave
    // BM25/conjunction (termdocs) permanently diverged from
    // phrase/proximity (postings)
    val path2 = tmp("poststore_crash")
    val hc = PostingsStore.build(half1, "doc_id", "text", path2, nBuckets = 8)
    InvertedIndex.postings(half2, "doc_id", "text")
      .withColumn("term_bucket",
        pmod(xxhash64(col("term")), lit(8L)).cast("int"))
      .repartitionByRange(8, col("term_bucket"), col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"), col("pos"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("term_bucket").parquet(s"$path2/postings")
    val healed = PostingsStore.append(half2, "text", hc) // the replay
    val full = PostingsStore.build(docs, "doc_id", "text",
      tmp("poststore_crashref"), nBuckets = 8)
    assert(healed.postings.count() == full.postings.count(),
      "replay must not double the landed postings")
    assert(healed.numDocs == full.numDocs)
    assert(rows(healed.termStats.select("term", "df", "cf", "max_tf")) ===
      rows(full.termStats.select("term", "df", "cf", "max_tf")))
    assert(rows(healed.bm25Search(Seq("vector", "stream", "window"), k = 20)) ===
      rows(full.bm25Search(Seq("vector", "stream", "window"), k = 20)))
    assert(rows(healed.phraseSearch(Seq("table", "hash"))) ===
      rows(full.phraseSearch(Seq("table", "hash"))))
  }

  test("compact shrinks an appended store's file count; every search unchanged") {
    val path = tmp("poststore_compact")
    val parts = (0 until 4).map(i => docs.filter(col("doc_id") % 4 === i))
    var h = PostingsStore.build(parts.head, "doc_id", "text", path, nBuckets = 8)
    parts.tail.foreach(p => h = PostingsStore.append(p, "text", h))

    val before = h.postings.inputFiles.length
    def snapshot(s: PostingsStore.Handle) = Seq(
      s.phraseSearch(Seq("table", "hash")).collect().map(_.toSeq).toSet,
      s.bm25Search(Seq("vector", "stream", "window"), k = 20).collect().map(_.toSeq).toSet,
      s.termDfs(Seq("vector", "table")))
    val pre = snapshot(h)

    val c = PostingsStore.compact(h)
    assert(c.postings.inputFiles.length < before,
      s"compact left ${c.postings.inputFiles.length} of $before files")
    assert(snapshot(c) === pre)
    // the compacted layout still prunes
    val plan = c.termPostings("table").queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*term_bucket[^\\]]*\\].*"), plan)
  }

  test("empty corpus builds a readable (flat, nothing-to-prune) store") {
    val path = tmp("poststore_empty")
    val empty = docs.filter(col("doc_id") < 0)
    val h = PostingsStore.build(empty, "doc_id", "text", path, nBuckets = 4)
    assert(h.termPostings("anything").count() === 0)
    assert(h.docLens.count() === 0)
  }

  test("remove: every search equals a kept-corpus build; replay; fail-loud; compact") {
    val sp = spark
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    val keep = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val gone = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val h = PostingsStore.build(docs, "doc_id", "text", tmp("psrm"), nBuckets = 16)
    val ref = PostingsStore.build(keep, "doc_id", "text", tmp("psrmref"), nBuckets = 16)
    h.remove(gone.select(col("doc_id")))
    // every serve path equals the kept-corpus build — incl. BM25,
    // whose IDF reads the DECREMENTED df, and the kept corpus stats
    assert(h.corpusLenStats == ref.corpusLenStats,
      s"${h.corpusLenStats} vs ${ref.corpusLenStats}")
    val terms = Seq("vector", "stream", "window")
    assert(rows(h.bm25Search(terms, k = 20)) == rows(ref.bm25Search(terms, k = 20)))
    assert(rows(h.allTermsSearch(terms)) == rows(ref.allTermsSearch(terms)))
    assert(rows(h.phraseSearch(Seq("table", "hash")))
      == rows(ref.phraseSearch(Seq("table", "hash"))))
    assert(rows(h.proximitySearch("vector", "table", slop = 5))
      == rows(ref.proximitySearch("vector", "table", slop = 5)))
    // MaxScore stays SOUND on the stale (upper-bound) max_tf: the
    // pruned route still returns the exact kept-corpus top-k
    val rare = Seq("dup", "stream", "window")
    assert(rows(h.bm25SearchPruned(rare, k = 20))
      == rows(ref.bm25Search(rare, k = 20)))
    assert(h.bm25Search(terms, k = 20).count() > 0)
    // replayed takedown: ledger and stats unchanged
    val ledger = h.removedDocs.count()
    val stats = rows(h.statsPostings(terms))
    h.remove(gone.select(col("doc_id")))
    assert(h.removedDocs.count() == ledger)
    assert(rows(h.statsPostings(terms)) == stats)
    // re-appending a tombstoned id fails loud
    val ex = intercept[IllegalArgumentException] {
      PostingsStore.append(gone.limit(1), "text", h)
    }
    assert(ex.getMessage.contains("tombstoned"))
    // compact physically purges rows, clears ledger + deltas,
    // re-tightens max_tf to the kept corpus exactly
    val c = PostingsStore.compact(h)
    assert(c.removedDocs.isEmpty)
    assert(rows(c.termStats.select(col("term"), col("df"), col("cf"), col("max_tf")))
      == rows(ref.termStats.select(col("term"), col("df"), col("cf"), col("max_tf"))))
    assert(rows(c.bm25Search(terms, k = 20)) == rows(ref.bm25Search(terms, k = 20)))
    // the purged ids are appendable again: the union serves like a
    // from-scratch build of everything
    val c2 = PostingsStore.append(gone, "text", c)
    val full = PostingsStore.build(docs, "doc_id", "text", tmp("psrmfull"), nBuckets = 16)
    assert(rows(c2.bm25Search(terms, k = 20)) == rows(full.bm25Search(terms, k = 20)))
  }

  test("remove v8: ledger commits atomically with the decrements; overlapping batches stay exact") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    val h = PostingsStore.build(docs, "doc_id", "text", tmp("psatomic"),
      nBuckets = 16)
    val a = docs.filter(pmod(col("doc_id"), lit(10)) === 1).select(col("doc_id"))
    val aUnionB = docs.filter(pmod(col("doc_id"), lit(10)).isin(1, 2))
      .select(col("doc_id"))
    h.remove(a)
    // marker ⟺ ledgered: both live in the same swapped dir
    val fs = new org.apache.hadoop.fs.Path(h.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deltas = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"${h.path}/statsdeltas"))
      .map(_.getPath.getName)
    assert(deltas.exists(_.startsWith("_applied_rm_")), deltas.mkString(","))
    assert(deltas.contains("_removedids"), deltas.mkString(","))
    // an OVERLAPPING (non-identical) second batch decrements only the
    // fresh ids — the v7 crash window's double-decrement shape, now
    // impossible by construction: df/cf equal a kept-corpus build
    h.remove(aUnionB)
    val kept = docs.filter(!pmod(col("doc_id"), lit(10)).isin(1, 2))
    val ref = PostingsStore.build(kept, "doc_id", "text", tmp("psatomicref"),
      nBuckets = 16)
    val terms = Seq("vector", "stream", "window")
    assert(rows(h.bm25Search(terms, k = 20)) == rows(ref.bm25Search(terms, k = 20)))
    assert(h.numDocs == ref.numDocs)
    // replaying the overlap batch changes nothing
    h.remove(aUnionB)
    assert(rows(h.bm25Search(terms, k = 20)) == rows(ref.bm25Search(terms, k = 20)))
  }

  test("autoCompact: trigger fires at the tombstone ratio, serve identical before/after") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    val h = PostingsStore.build(docs, "doc_id", "text", tmp("psauto"),
      nBuckets = 16)
    val terms = Seq("vector", "stream", "window")
    // no ledger: the probe costs nothing and never compacts
    assert(PostingsStore.tombstoneRatio(h).isEmpty)
    assert(PostingsStore.autoCompact(h) eq h)
    // ~5% removed: under the default 25% ratio — no compaction, the
    // ledger stays (merge-on-read continues to serve)
    h.remove(docs.filter(pmod(col("doc_id"), lit(20)) === 0).select(col("doc_id")))
    val served = rows(h.bm25Search(terms, k = 20))
    val r1 = PostingsStore.tombstoneRatio(h)
    assert(r1.exists(r => r > 0 && r <= 0.25), s"ratio $r1")
    val same = PostingsStore.autoCompact(h)
    assert(same eq h)
    assert(PostingsStore.tombstoneRatio(h).nonEmpty, "ledger must survive a no-op")
    // past the ratio: compaction fires, the ledger clears, and the
    // serve is identical before/after (the compact contract)
    h.remove(docs.filter(pmod(col("doc_id"), lit(3)) === 0).select(col("doc_id")))
    val before = rows(h.bm25Search(terms, k = 20))
    assert(PostingsStore.tombstoneRatio(h).exists(_ > 0.25))
    val c = PostingsStore.autoCompact(h)
    assert(PostingsStore.tombstoneRatio(c).isEmpty, "compaction must clear the ledger")
    assert(rows(c.bm25Search(terms, k = 20)) == before)
    assert(before != served, "the second takedown must change results")
  }
}
