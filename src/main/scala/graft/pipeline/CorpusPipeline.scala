package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.{ConnectedComponents, MinHashLSH, NGramJaccard}
import graft.functions.{TextFunctions => TF}

/** End-to-end corpus curation: the assembled training-data pass that
  * the individual operators exist for, as one library call.
  *
  *   1. CLEAN — language known, token-count band, quality floor
  *      (filters push to the scan; no shuffle),
  *   1b. REPETITION GATE (optional) — drop docs whose most frequent
  *      token dominates (the Gopher boilerplate rule),
  *   2. EXACT DEDUP — md5 keeper per content group (digest groupBy),
  *   3. NEAR-DUP DEDUP — banded-MinHash candidates, exact-Jaccard
  *      verification, connected components over the verified pair
  *      graph, keep each cluster's minimum id,
  *   4. SAMPLE — deterministic per-language md5-threshold rates,
  *   4b. DOMAIN BALANCE (optional) — md5-gated downsampling of every
  *      language toward the smallest one (`operators.DomainMix`),
  *   5. WRITE — parquet partitioned by language; optionally a
  *      `.packing` sidecar with the concat-then-chunk sequence layout
  *      (`operators.SequencePacking`).
  *
  * Every stage is the same code the query surface exercises against
  * DuckDB oracles (q67/q60/q62/q68/q85); the pipeline report makes the
  * stage-by-stage attrition auditable.
  */
object CorpusPipeline {

  final case class Report(
      input: Long,
      afterClean: Long,
      afterRepetitionGate: Long,
      afterExactDedup: Long,
      afterNearDedup: Long,
      sampled: Long,
      balanced: Long,
      budgeted: Long = -1L)

  final case class Options(
      minWords: Int = 10,
      maxWords: Int = 5000,
      minQuality: Double = 0.3,
      nearDupJaccard: Double = 0.8,
      // per-language admission rate in [0,1]; default keeps everything
      sampleRates: Map[String, Double] = Map.empty,
      salt: String = ":graft",
      // PII scrub before anything hashes the text (q77's patterns):
      // dedup/fingerprints must see the REDACTED bytes, or two docs
      // differing only in PII stay distinct and the PII survives in
      // the keeper
      redactPii: Boolean = false,
      // post-write per-partition compaction target; None = skip
      compactTargetBytes: Option[Long] = None,
      // drop docs whose most frequent token exceeds this fraction
      // (Gopher-style boilerplate gate); None = skip
      maxTopTokenFrac: Option[Double] = None,
      // n-gram tier of the Gopher gate (q148): drop docs whose top
      // BIGRAM occupies more than this share of bigram positions /
      // whose repeated TRIGRAMS carry more than this fraction of
      // trigram occurrences. Row-local NGramStatsExpr kernel — the
      // gate stays a stateless zero-shuffle filter. None = skip.
      maxTopBigramShare: Option[Double] = None,
      maxDupTrigramFrac: Option[Double] = None,
      // drop docs whose unigram entropy falls below this floor
      // (templated/near-constant text the top-token rule can miss when
      // repetition spreads over a few tokens). TokenEntropyExpr kernel
      // — row-local, zero shuffle, same gate family as the above.
      // None = skip
      minEntropy: Option[Double] = None,
      // downsample every language toward the smallest one after
      // sampling (DomainMix.balanceToSmallest)
      balanceDomains: Boolean = false,
      // write `<outDir>.packing` with the concat-then-chunk layout at
      // this sequence length; None = skip
      packSeqLen: Option[Int] = None,
      // when false, skip the per-stage attrition counts (every Report
      // field is -1): a throughput-only run saves one count job per
      // stage; the stages themselves are unchanged
      reportCounts: Boolean = true,
      // per-language token budget: keep the highest-quality documents
      // (quality desc, doc_id tie-break) until the budget fills — the
      // q112 data-mixing primitive as a pipeline stage; None = skip
      tokenBudgetPerLang: Option[Long] = None,
      // paragraph-level exact dedup BEFORE cleaning (dedup.ParagraphDedup):
      // repeated paragraphs keep their first (doc, position) occurrence
      // corpus-wide; runs pre-clean so word counts / quality are computed
      // on the deduped text, and a doc emptied of paragraphs falls to the
      // minWords filter
      paragraphDedup: Boolean = false,
      // write `<outDir>.chunks` with (chunkSize, overlap) character
      // chunks of the WRITTEN corpus (operators.Chunker) — the
      // retrieval-side layout next to the training-side packing
      // sidecar; None = skip
      chunkSidecar: Option[(Int, Int)] = None,
      // write `<outDir>.shards` — seeded deterministic shuffle of the
      // WRITTEN corpus into (nShards, seed) balanced shard directories
      // (operators.CorpusShuffle), rows inside each shard in shuffled
      // order; None = skip
      shardExport: Option[(Int, String)] = None)

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Email/phone scrub (same Java∩RE2 patterns q77 oracle-checks). */
  def redact(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      regexp_replace(regexp_replace(col("text"),
        lit(emailRe), lit("<EMAIL>")),
        lit(phoneRe), lit("<PHONE>")))

  /** The stateless cleaning stage. Shared with the streaming twin
    * (`streaming.StreamingCorpusPipeline`) so batch and continuous
    * curation cannot silently diverge on admission predicates. Adds
    * `n_words` and `quality` columns that the caller drops before
    * the final write. */
  def clean(docs: DataFrame, minWords: Int, maxWords: Int, minQuality: Double): DataFrame =
    docs
      .withColumn("n_words", TF.wordCount(col("text")).cast("long"))
      .withColumn("quality", TF.qualityScore(col("text")))
      .filter(col("lang") =!= "und" &&
        col("n_words").between(minWords, maxWords) &&
        col("quality") >= minQuality)

  /** The Gopher-style boilerplate gate as a STATELESS filter (the
    * TokenStatsExpr kernel computes the top-token fraction row-locally
    * in the scan — zero shuffle), shared with the streaming twin.
    * Empty/whitespace-only docs pass (nothing to repeat) — guarded on
    * trimmed length, because `split` on empty text yields one
    * empty-string token, not zero tokens. */
  def repetitionGate(docs: DataFrame, maxTopTokenFrac: Double): DataFrame = {
    val ts = graft.functions.TokenStatsExpr.of(TF.wsTokens(lower(col("text"))))
    docs.withColumn("__ts", ts)
      .filter(length(trim(col("text"))) === 0 ||
        col("__ts").getField("top_count") * lit(1.0) /
          col("__ts").getField("n_tokens") <= maxTopTokenFrac)
      .drop("__ts")
  }

  /** The n-gram tier of the Gopher gate (q148's predicate as an
    * admission filter): top-bigram occupancy share and repeated-
    * trigram occurrence fraction, both row-local via the
    * NGramStatsExpr window-hash kernel — zero shuffle, shared with
    * the streaming twin. Docs with fewer windows than the n-gram
    * order pass (nothing to repeat; n_tokens = 0 guards the
    * division). Pass None to skip either predicate. */
  /** Entropy floor (q166's statistic as an admission predicate): drop
    * near-constant/templated documents whose token entropy falls below
    * the floor. Row-local TokenEntropyExpr kernel — stateless, zero
    * shuffle, shared with the streaming twin. Empty/whitespace docs
    * pass (minWords already polices emptiness). */
  def entropyGate(docs: DataFrame, minEntropy: Double): DataFrame =
    docs.filter(length(trim(col("text"))) === 0 ||
      graft.functions.TokenEntropyExpr.of(TF.wsTokens(lower(col("text")))) >= minEntropy)

  def ngramRepetitionGate(
      docs: DataFrame,
      maxTopBigramShare: Option[Double],
      maxDupTrigramFrac: Option[Double]): DataFrame = {
    val toks = TF.wsTokens(lower(col("text")))
    def share(stats: Column, num: Column, cap: Option[Double]): Column =
      cap.fold(lit(true)) { c =>
        stats.getField("n_tokens") === 0L ||
          num * lit(1.0) / stats.getField("n_tokens") <= c
      }
    val s2 = graft.functions.NGramStatsExpr.of(toks, 2)
    val s3 = graft.functions.NGramStatsExpr.of(toks, 3)
    docs.withColumn("__s2", s2).withColumn("__s3", s3)
      .filter(length(trim(col("text"))) === 0 ||
        (share(col("__s2"), col("__s2").getField("top_count"), maxTopBigramShare) &&
         share(col("__s3"),
           col("__s3").getField("n_tokens") - col("__s3").getField("singleton_count"),
           maxDupTrigramFrac)))
      .drop("__s2", "__s3")
  }

  def curate(docs: DataFrame, outDir: String, opts: Options = Options()): Report = {
    // attrition counts are the Report's semantics, but each one is a
    // job launch; reportCounts=false trades the audit trail for
    // throughput (fields come back -1). The persists stay either way —
    // they serve the multi-consumer stages, not the counts.
    def cnt(df: DataFrame): Long = if (opts.reportCounts) df.count() else -1L
    val input = cnt(docs)

    // 0. optional PII scrub — BEFORE any content hashing (see Options)
    val scrubbed = if (opts.redactPii) redact(docs) else docs

    // 0b. optional paragraph dedup (Dolma ordering: sub-document dedup
    // before quality filtering). The operator returns (id, text) only,
    // so passthrough columns rejoin by id.
    val paraDeduped =
      if (!opts.paragraphDedup) scrubbed
      else scrubbed.drop("text").join(
        graft.dedup.ParagraphDedup.dedup(scrubbed, "doc_id", "text")
          .drop("n_paras_kept"),
        Seq("doc_id"))

    // 1. clean
    val cleaned = clean(paraDeduped, opts.minWords, opts.maxWords, opts.minQuality)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val afterClean = cnt(cleaned)

    // 1b. optional repetition gate (Gopher boilerplate rule): the
    // q103 top-token statistic as an admission predicate — the
    // TokenStatsExpr kernel computes it row-locally in the scan, so
    // the gate is a stateless filter (zero shuffle), same as clean()
    val anyRepGate = opts.maxTopTokenFrac.isDefined ||
      opts.maxTopBigramShare.isDefined || opts.maxDupTrigramFrac.isDefined ||
      opts.minEntropy.isDefined
    val gated = if (!anyRepGate) cleaned else {
      val unigramGated =
        opts.maxTopTokenFrac.fold(cleaned)(repetitionGate(cleaned, _))
      val ngramGated =
        if (opts.maxTopBigramShare.isEmpty && opts.maxDupTrigramFrac.isEmpty) unigramGated
        else ngramRepetitionGate(unigramGated, opts.maxTopBigramShare, opts.maxDupTrigramFrac)
      val entropyGated = opts.minEntropy.fold(ngramGated)(entropyGate(ngramGated, _))
      entropyGated.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val afterRepetitionGate = if (anyRepGate) cnt(gated) else afterClean

    // 2. exact dedup: keeper = min doc_id per content digest
    val keepers = gated.groupBy(md5(col("text").cast("binary")))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    // no broadcast hint: the keeper set is O(corpus) rows — let the
    // planner shuffle (or AQE pick broadcast when it actually fits)
    val exact = gated.join(keepers, Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val afterExactDedup = cnt(exact)

    // 3. near-dup dedup: LSH candidates -> exact verify -> clusters ->
    //    keep each cluster's min id (members other than the root drop)
    val candidates = MinHashLSH.candidatePairs(exact, "doc_id", "text",
      numHashes = 128, bands = 32, shingleN = 3)
    val verified = MinHashLSH.verifyJaccard(candidates, exact, "doc_id", "text",
      shingleN = 3, minJaccard = opts.nearDupJaccard)
    val clusters = ConnectedComponents.runAdaptive(verified, "doc_a", "doc_b")
    val victims = clusters.filter(col("member") =!= col("cluster_root"))
      .select(col("member").as("doc_id"))
    val nearDeduped = exact.join(victims, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val afterNearDedup = cnt(nearDeduped)

    // 4. deterministic stratified sample (md5-prefix threshold)
    val sampled =
      if (opts.sampleRates.isEmpty) nearDeduped
      else {
        val cut = opts.sampleRates.foldLeft(lit("ffffffff")) { case (acc, (lang, rate)) =>
          val hex = f"${math.min((rate * (1L << 32)).toLong, 0xFFFFFFFFL)}%08x"
          when(col("lang") === lang, lit(hex)).otherwise(acc)
        }
        nearDeduped.filter(
          substring(md5(concat(col("doc_id").cast("string"), lit(opts.salt))), 1, 8) < cut)
      }
    val nSampled = cnt(sampled)

    // 4b. optional domain balance: every language toward the smallest
    val balancedFrame =
      if (opts.balanceDomains)
        graft.operators.DomainMix.balanceToSmallest(
          sampled, "lang", "doc_id", opts.salt + ":mix")
      else sampled
    val nBalanced = if (opts.balanceDomains) cnt(balancedFrame) else nSampled

    // 4c. optional per-language token budget (the q112 selection as a
    // stage): greedy by the round-6 quality clean() already computed,
    // doc_id tie-break, running token sum windowed PER LANGUAGE — no
    // global sort, same shard-local shape as the packing sidecar
    val budgetedFrame = opts.tokenBudgetPerLang match {
      case Some(b) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("quality").desc, col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        balancedFrame.withColumn("__cum", sum(col("n_words")).over(w))
          .filter(col("__cum") <= b).drop("__cum")
      case None => balancedFrame
    }
    val nBudgeted = if (opts.tokenBudgetPerLang.isDefined) cnt(budgetedFrame) else -1L

    // 5. write partitioned by language
    budgetedFrame.drop("n_words", "quality")
      .write.mode(SaveMode.Overwrite).partitionBy("lang").parquet(outDir)

    // 5b-5d read back the WRITTEN corpus (one shared frame) so the
    // sidecars can never drift from what actually landed on disk
    lazy val landed = docs.sparkSession.read.parquet(outDir)

    // 5b. optional packing sidecar: the concat-then-chunk sequence
    // layout
    opts.packSeqLen.foreach { len =>
      graft.operators.SequencePacking.concatChunk(
          landed, "lang", "doc_id",
          TF.wordCount(col("text")), len)
        .select(col("lang"), col("doc_id"), col("n_tokens"), col("start_off"),
          col("chunk_first"), col("chunk_last"), col("n_chunks_spanned"))
        .write.mode(SaveMode.Overwrite).parquet(outDir + ".packing")
    }

    // 5c. optional chunk sidecar: the retrieval-side twin of packing —
    // overlapping character windows of the written corpus, stable
    // (doc_id, chunk_idx) identity (same read-back-what-landed rule)
    opts.chunkSidecar.foreach { case (size, overlap) =>
      graft.operators.Chunker.chunk(landed, "text", size, overlap)
        .select(col("lang"), col("doc_id"), col("n_chunks"), col("chunk_idx"),
          col("chunk_start"), col("chunk_text"))
        .write.mode(SaveMode.Overwrite).parquet(outDir + ".chunks")
    }

    // 5d. optional shard export: the training-reader layout — seeded
    // deterministic shuffle into balanced shard directories, byte-
    // identical across re-runs (no rand())
    opts.shardExport.foreach { case (n, seed) =>
      graft.operators.CorpusShuffle.writeShards(
        landed, "doc_id", n, seed, outDir + ".shards")
    }

    // 6. optional small-files hygiene: each micro-partition rewritten
    // toward the target independently (crash bounded to one partition)
    opts.compactTargetBytes.foreach(t =>
      graft.layout.Compaction.compactPartitions(docs.sparkSession, outDir, t))

    Seq(cleaned, exact, nearDeduped).foreach(_.unpersist())
    if (anyRepGate) gated.unpersist()
    Report(input, afterClean, afterRepetitionGate, afterExactDedup,
      afterNearDedup, nSampled, nBalanced, nBudgeted)
  }
}

/** CLI: curate <sfDir>/documents.parquet into <outDir>.
  * Optional third arg enables sampling: "en=0.5,fr=0.25" (languages
  * not listed keep rate 1.0). No sampling by default — a curation run
  * must not silently discard data. */
object CorpusPipelineMain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val rates = args.drop(2).headOption.map { spec =>
      spec.split(",").map { kv =>
        val Array(l, r) = kv.split("=", 2)
        l.trim -> r.trim.toDouble
      }.toMap
    }.getOrElse(Map.empty[String, Double])
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    val r = CorpusPipeline.curate(docs, outDir,
      CorpusPipeline.Options(sampleRates = rates))
    println(s"""{"input":${r.input},"after_clean":${r.afterClean},""" +
      s""""after_repetition_gate":${r.afterRepetitionGate},""" +
      s""""after_exact_dedup":${r.afterExactDedup},""" +
      s""""after_near_dedup":${r.afterNearDedup},"sampled":${r.sampled},""" +
      s""""balanced":${r.balanced},"budgeted":${r.budgeted}}""")
    spark.stop()
  }
}
