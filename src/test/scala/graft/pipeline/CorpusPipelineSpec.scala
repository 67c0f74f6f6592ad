package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec
import java.nio.file.Files

class CorpusPipelineSpec extends SparkSpec {

  test("curate: stage counts monotone, near-dups purged, output partitioned by lang") {
    val sp = spark; import sp.implicits._
    val docs = graft.Tables.documents(spark, sf001)
    // plant an exact dup and a near-dup of real rows so both dedup
    // stages demonstrably fire
    val base = docs.filter($"doc_id" === 1).select($"text").first().getString(0)
    val planted = Seq(
      (100001L, base, "en", "planted"),
      (100002L, base + " extra", "en", "planted"))
      .toDF("doc_id", "text", "lang", "source")
    val input = docs.select("doc_id", "text", "lang", "source").unionByName(planted)

    val out = Files.createTempDirectory("curated").toString + "/corpus"
    val r = CorpusPipeline.curate(input, out,
      CorpusPipeline.Options(minWords = 5, minQuality = 0.0))

    assert(r.input === docs.count() + 2)
    assert(r.afterClean <= r.input)
    assert(r.afterExactDedup < r.afterClean)  // exact dup planted => strict drop
    assert(r.afterNearDedup < r.afterExactDedup) // near dup planted => strict drop
    assert(r.sampled === r.afterNearDedup) // no sampling rates set

    // survivors contain no near-dup pair at the configured threshold
    val curated = spark.read.parquet(out)
    val residual = graft.dedup.NGramJaccard.pairs(
        curated, "doc_id", "text", shingleN = 3, minJaccard = 0.8).count()
    assert(residual === 0, s"curated corpus still has $residual near-dup pairs")

    // lang partitioning on disk
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("lang="))
    assert(dirs.nonEmpty)
  }

  test("curate with redactPii + compaction: PII never reaches the store, partitions compact") {
    val sp = spark; import sp.implicits._
    val docs = graft.Tables.documents(spark, sf001)
    // two docs differing ONLY in their planted PII: after redaction
    // they are byte-identical, so exact dedup must collapse them —
    // the reason the scrub runs before anything hashes text. The body
    // is synthetic (not derived from a corpus doc) so the near-dup
    // stage doesn't also purge the survivor against the real corpus.
    val body = (1 to 40).map(i => s"zzsynth$i").mkString(" ")
    val planted = Seq(
      (200001L, body + " reach me at alice@example.com", "en", "planted"),
      (200002L, body + " reach me at bob@other.org", "en", "planted"))
      .toDF("doc_id", "text", "lang", "source")
    val input = docs.select("doc_id", "text", "lang", "source").unionByName(planted)

    val out = Files.createTempDirectory("curated_pii").toString + "/corpus"
    val r = CorpusPipeline.curate(input, out,
      CorpusPipeline.Options(minWords = 5, minQuality = 0.0,
        redactPii = true, compactTargetBytes = Some(512L << 20)))

    val curated = spark.read.parquet(out)
    assert(curated.filter($"text".contains("@")).count() === 0,
      "PII survived into the curated store")
    // the two planted docs collapsed to one via post-redaction dedup
    assert(curated.filter($"doc_id".isin(200001L, 200002L)).count() === 1)
    assert(r.afterExactDedup < r.afterClean)
    // compaction: one file per lang partition at this tiny scale
    new java.io.File(out).listFiles().filter(_.getName.startsWith("lang=")).foreach { d =>
      val dataFiles = d.listFiles().count(f =>
        f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      assert(dataFiles === 1, s"${d.getName}: expected 1 compacted file, got $dataFiles")
    }
  }

  test("curate(reportCounts=false): no attrition fields, fewer jobs, same output") {
    val docs = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))

    def countJobs(body: => CorpusPipeline.Report): (CorpusPipeline.Report, Int) = {
      def jobsSoFar = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      val before = jobsSoFar
      val r = body
      (r, jobsSoFar - before)
    }

    val outA = Files.createTempDirectory("curated_counted").toString + "/corpus"
    val outB = Files.createTempDirectory("curated_silent").toString + "/corpus"
    val opts = CorpusPipeline.Options(minWords = 5, minQuality = 0.0)
    val (counted, jobsCounted) = countJobs(CorpusPipeline.curate(docs, outA, opts))
    val (silent, jobsSilent) =
      countJobs(CorpusPipeline.curate(docs, outB, opts.copy(reportCounts = false)))

    // the silent run reports nothing...
    assert(Seq(silent.input, silent.afterClean, silent.afterRepetitionGate,
      silent.afterExactDedup, silent.afterNearDedup, silent.sampled,
      silent.balanced).forall(_ === -1L))
    // ...launches strictly fewer jobs (one count action per stage saved)...
    assert(jobsSilent < jobsCounted,
      s"expected fewer jobs without counts: $jobsSilent vs $jobsCounted")
    // ...and writes the identical corpus
    val a = spark.read.parquet(outA)
    val b = spark.read.parquet(outB)
    assert(b.count() === a.count())
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("curate with tokenBudgetPerLang keeps the highest-quality docs under budget") {
    val docs = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val out = Files.createTempDirectory("curated_budget").toString + "/corpus"
    val budget = 2000L
    val r = CorpusPipeline.curate(docs, out,
      CorpusPipeline.Options(minWords = 5, minQuality = 0.0,
        tokenBudgetPerLang = Some(budget)))

    assert(r.budgeted > 0 && r.budgeted < r.balanced.max(r.sampled),
      s"budget must bind: ${r.budgeted} of ${r.sampled}")
    val kept = spark.read.parquet(out)
    assert(kept.count() === r.budgeted)
    // per language the kept token sum is within budget (the greedy-
    // by-quality selection semantics themselves are oracle-checked by
    // q112, which runs the same window)
    kept.select(col("lang"),
        graft.functions.TextFunctions.wordCount(col("text")).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("tot"))
      .collect().foreach(row =>
        assert(row.getLong(1) <= budget, s"${row.getString(0)} over budget: ${row.getLong(1)}"))
  }

  test("curate with paragraphDedup: shared boilerplate survives only in its first doc") {
    val sp = spark; import sp.implicits._
    val docs = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val footer = "subscribe to our newsletter for updates every single week"
    val bodyA = (1 to 30).map(i => s"aatext$i").mkString(" ")
    val bodyB = (1 to 30).map(i => s"bbtext$i").mkString(" ")
    val planted = Seq(
      (400001L, bodyA + "\n\n" + footer, "en", "planted"),
      (400002L, bodyB + "\n\n" + footer, "en", "planted"))
      .toDF("doc_id", "text", "lang", "source")
    val input = docs.unionByName(planted)

    val out = Files.createTempDirectory("curated_para").toString + "/corpus"
    CorpusPipeline.curate(input, out,
      CorpusPipeline.Options(minWords = 5, minQuality = 0.0, paragraphDedup = true))

    val kept = spark.read.parquet(out)
    val t1 = kept.filter(col("doc_id") === 400001L).select("text").collect()
    val t2 = kept.filter(col("doc_id") === 400002L).select("text").collect()
    assert(t1.nonEmpty && t1.head.getString(0).contains(footer),
      "first doc keeps the shared paragraph")
    assert(t2.nonEmpty && !t2.head.getString(0).contains(footer),
      "second doc loses the repeated paragraph")
    assert(t2.head.getString(0).contains("bbtext1"), "unique body survives")
  }

  test("curate with repetition gate, domain balance, and packing sidecar") {
    val sp = spark; import sp.implicits._
    val docs = graft.Tables.documents(spark, sf001)
    // plant a boilerplate doc the gate must drop: one token repeated
    val planted = Seq(
      (300001L, ("spam " * 40).trim, "en", "planted"))
      .toDF("doc_id", "text", "lang", "source")
    val input = docs.select("doc_id", "text", "lang", "source").unionByName(planted)

    val out = Files.createTempDirectory("curated_mix").toString + "/corpus"
    val r = CorpusPipeline.curate(input, out,
      CorpusPipeline.Options(minWords = 5, minQuality = 0.0,
        maxTopTokenFrac = Some(0.5), balanceDomains = true, packSeqLen = Some(256)))

    assert(r.afterRepetitionGate < r.afterClean, "gate must drop the planted boilerplate")
    assert(r.balanced <= r.sampled)
    val curated = spark.read.parquet(out)
    assert(curated.filter($"doc_id" === 300001L).count() === 0)
    // balanced: every lang within the binomial band of the smallest
    val counts = curated.groupBy("lang").count().collect()
      .map(rr => rr.getString(0) -> rr.getLong(1)).toMap
    val minN = counts.values.min
    counts.values.foreach(n => assert(n <= minN + 30, s"unbalanced langs: $counts"))

    // packing sidecar: readable, offsets contiguous within each lang
    val packing = spark.read.parquet(out + ".packing")
    assert(packing.count() === curated.count())
    packing.orderBy("lang", "doc_id").collect()
      .groupBy(_.getAs[String]("lang")).values.foreach { rows =>
        rows.sliding(2).foreach {
          case Array(p, n) =>
            assert(n.getAs[Long]("start_off") ===
              p.getAs[Long]("start_off") + p.getAs[Long]("n_tokens"))
          case _ => ()
        }
      }
  }

  test("ngram repetition gate: drops looped bigrams, keeps varied text, matches q148 predicate") {
    val sp = spark; import sp.implicits._
    val docs = graft.Tables.documents(spark, sf001)
      .select("doc_id", "text", "lang", "source")
    // looped bigram: "buy now buy now ..." — unigram gate at 0.5 would
    // PASS it (two tokens at 0.5 each), the bigram gate must drop it
    val planted = Seq(
      (400001L, ("buy now " * 30).trim, "en", "planted"),
      // trigram-repeater: a 6-word phrase looped — dup-trigram frac ~1
      (400002L, (("the quick brown fox jumps high " * 10).trim), "en", "planted"))
      .toDF("doc_id", "text", "lang", "source")
    val input = docs.unionByName(planted)

    val gated = CorpusPipeline.ngramRepetitionGate(
      input, Some(0.08), Some(0.10))
    assert(gated.filter($"doc_id" >= 400001L).count() === 0,
      "planted loops must be dropped")

    // the gate's keep set over eligible docs == q148's keep flag
    val q148 = graft.queries.Registry.queries("q148_repetition_filter")(spark, sf001)
    val keepIds = q148.filter($"keep" === 1).select($"doc_id")
    val gatedIds = CorpusPipeline.ngramRepetitionGate(
        docs.filter(graft.functions.TextFunctions.wordCount($"text") >= 3),
        Some(0.08), Some(0.10))
      .select($"doc_id")
    assert(gatedIds.exceptAll(keepIds).isEmpty && keepIds.exceptAll(gatedIds).isEmpty)

    // streaming twin uses the same gate through clean()
    val streamed = graft.streaming.StreamingCorpusPipeline.clean(
      input.withColumn("lang", lit("en")),
      graft.streaming.StreamingCorpusPipeline.Options(
        minWords = 5, minQuality = 0.0,
        maxTopBigramShare = Some(0.08), maxDupTrigramFrac = Some(0.10)))
    assert(streamed.filter($"doc_id" >= 400001L).count() === 0)
  }

  test("entropy gate: drops few-token-loop text the top-token rule misses; streaming twin agrees") {
    val sp = spark; import sp.implicits._
    val docs = graft.Tables.documents(spark, sf001)
      .select("doc_id", "text", "lang", "source")
    // spread repetition: 4 tokens looped — top-token frac is only 0.25
    // (a 0.3 unigram gate passes it) but entropy is ln(4) ~ 1.39,
    // far below natural text on a 30-word vocabulary
    val planted = Seq(
      (500001L, ("alpha beta gamma delta " * 15).trim, "en", "planted"))
      .toDF("doc_id", "text", "lang", "source")
    val input = docs.unionByName(planted)
    val gated = CorpusPipeline.entropyGate(input, minEntropy = 2.0)
    assert(gated.filter($"doc_id" === 500001L).count() === 0, "loop must drop")
    // natural harness docs survive a 2.0-nat floor overwhelmingly
    val kept = gated.count()
    assert(kept > docs.count() * 8 / 10, s"gate too aggressive: kept $kept")
    // the unigram repetition gate at 0.3 does NOT catch the planted doc
    val uniOnly = CorpusPipeline.repetitionGate(input, maxTopTokenFrac = 0.3)
    assert(uniOnly.filter($"doc_id" === 500001L).count() === 1)
    // streaming twin routes through the same gate
    val streamed = graft.streaming.StreamingCorpusPipeline.clean(
      input, graft.streaming.StreamingCorpusPipeline.Options(
        minWords = 5, minQuality = 0.0, minEntropy = Some(2.0)))
    assert(streamed.filter($"doc_id" === 500001L).count() === 0)
  }

  test("curate with chunk sidecar and shard export: retrieval + training layouts of what landed") {
    val sp = spark; import sp.implicits._
    val docs = graft.Tables.documents(spark, sf001)
      .select("doc_id", "text", "lang", "source")
    val out = Files.createTempDirectory("curated_layouts").toString + "/corpus"
    CorpusPipeline.curate(docs, out,
      CorpusPipeline.Options(minWords = 5, minQuality = 0.0,
        chunkSidecar = Some((128, 32)), shardExport = Some((4, "exp")),
        reportCounts = false))

    val curated = spark.read.parquet(out)

    // chunk sidecar covers every curated doc, ids trace back
    val chunks = spark.read.parquet(out + ".chunks")
    assert(chunks.select("doc_id").distinct().count() === curated.count())
    val perDoc = chunks.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.countDistinct($"chunk_idx").as("n"),
        org.apache.spark.sql.functions.max($"n_chunks").as("expected"))
      .filter($"n" =!= $"expected").count()
    assert(perDoc === 0, "every doc must carry exactly n_chunks chunk rows")

    // shard export: all docs present exactly once across 4 shard dirs,
    // and membership is reproducible (pure function of id + seed)
    val shards = spark.read.parquet(out + ".shards")
    assert(shards.count() === curated.count())
    assert(shards.select("shard").distinct().count() === 4)
    val again = graft.operators.CorpusShuffle.assign(curated, "doc_id", 4, "exp")
      .select($"doc_id", $"shard".as("shard2"))
    assert(shards.join(again, Seq("doc_id"))
      .filter($"shard" =!= $"shard2").count() === 0)
  }
}
