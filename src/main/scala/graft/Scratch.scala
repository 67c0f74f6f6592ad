package graft

import org.apache.spark.sql.functions._

/** Scratch driver — exercises the public graft API end-to-end on the
  * harness testdata. Kept as a runMain target for manual smoke runs.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(8)
    import spark.implicits._
    try {
      val docs = Tables.documents(spark, sf)
      val emb = Tables.embeddings(spark, sf)
      val ev = Tables.events(spark, sf)
      val lineitem = Tables.lineitem(spark, sf)
      val orders = Tables.orders(spark, sf)

      println("== text functions ==")
      docs.select(
        $"doc_id",
        graft.functions.TextFunctions.wordCount($"text").as("words"),
        graft.functions.TextFunctions.langId($"text").as("lang_guess"),
        round(graft.functions.TextFunctions.qualityScore($"text"), 3).as("q"),
        graft.functions.TextFunctions.fingerprint($"text").as("fp"))
        .show(5, 60)

      println("== vector functions (self-cosine should be 1.0) ==")
      emb.select($"vec_id",
        round(graft.functions.VectorFunctions.cosine($"embedding", $"embedding"), 6).as("self_cos"),
        round(graft.functions.VectorFunctions.l2Norm($"embedding"), 4).as("norm"))
        .show(5)

      println("== simhash + hamming ==")
      docs.select($"doc_id",
        graft.dedup.SimHash.simhash(graft.functions.TextFunctions.wsTokens(lower($"text"))).as("fp"))
        .show(5)

      println("== minhash lsh candidate pairs ==")
      val pairs = graft.dedup.MinHashLSH.candidatePairs(docs, "doc_id", "text",
        numHashes = 32, bands = 8)
      println(s"lsh pairs: ${pairs.count()}")
      pairs.show(5)

      println("== ngram jaccard pairs ==")
      val jp = graft.dedup.NGramJaccard.pairs(docs, "doc_id", "text", minJaccard = 0.3)
      println(s"jaccard pairs: ${jp.count()}")
      jp.show(5)

      println("== ann brute force topk ==")
      val queries = emb.limit(3).select($"vec_id".as("qid"), $"embedding".as("qvec"))
      graft.ann.Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 3).show(12)

      println("== as-of join (events vs events) ==")
      val lastByUser = ev.groupBy($"user_id").agg(max($"ts").as("rts"), count(lit(1)).as("n"))
        .select($"user_id", $"rts", $"n")
      val probe = ev.select($"user_id", $"ts", $"event_id").limit(1000)
      val aoj = graft.operators.AsOfJoin.asofBackward(
        probe, lastByUser.withColumnRenamed("rts", "ts2").withColumnRenamed("ts", "ts2"),
        Seq("user_id"), "ts", "ts2", Seq("n"))
      println(s"asof rows: ${aoj.count()}")
      aoj.show(5)
      val aojRight = lastByUser.withColumnRenamed("rts", "ts2")
      val aojNative = graft.operators.AsOfJoin.asofBackwardExec(
        probe, aojRight, Seq("user_id"), "ts", "ts2", Seq("n"))
      // compare the joined payloads, not just counts — a count check
      // is vacuous for as-of (always one output row per left row)
      def keyed(df: org.apache.spark.sql.DataFrame) = df
        .select($"event_id", $"n").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      require(keyed(aojNative) == keyed(aoj), "native as-of payloads diverged from composed")
      println("asof native operator: OK")
      println("== CPE star from NVD fixtures ==")
      val flat = graft.nvd.CveFlatten.flattenFeed(spark,
        Seq(new java.io.File("src/test/resources/nvdfeed/2002.json").toURI.toString))
      val fact = graft.nvd.CpeParser.cve2cpe(flat)
      fact.show(5, 60)
      graft.nvd.CpeParser.cvesForProduct(fact, "bsdi", "bsd_os").show()

      println("== salted join on a hot key ==")
      val sjProbe = spark.range(20000).select(
        when($"id" % 10 === 0, "hot").otherwise(concat(lit("k"), $"id")).as("key"), $"id".as("v"))
      val build = spark.range(50).select(
        when($"id" === 0, "hot").otherwise(concat(lit("k"), $"id")).as("key"), $"id".as("payload"))
      val sj = graft.operators.SaltedJoin.inner(sjProbe, build, "key", salt = 8)
      println(s"salted join rows: ${sj.count()} (expect 2045: 2000 hot + 45 tail)")

      println("== bloom-pre-filtered semi-join ==")
      val urgent = orders.filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
      val bloomed = graft.operators.BloomPrune.semiJoin(
        lineitem, urgent, "l_orderkey", "o_orderkey", expectedItems = 100000L)
      val plainSemi = lineitem.join(urgent.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_semi")
      require(bloomed.count() == plainSemi.count(), "bloom semi-join diverged from plain")
      println(s"bloom semi-join rows: ${bloomed.count()} (== plain semi-join)")

      println("== z-order clustered write ==")
      val zDir = java.nio.file.Files.createTempDirectory("scratch_zo").toString
      graft.layout.ZOrder.writeClustered(lineitem, zDir,
        Seq("l_partkey", "l_suppkey"), bits = 10, numFiles = 8)
      require(spark.read.parquet(zDir).count() == lineitem.count(), "z-order write lost rows")
      println(s"z-order layout files written, rows preserved")

      println("== incremental MV fold ==")
      val mvKeys = Seq("l_returnflag", "l_linestatus")
      val mvMeasures = Seq(graft.operators.IncrementalAgg.Measure("qty", $"l_quantity"))
      val mvState = (0 until 2).map(i => graft.operators.IncrementalAgg.partials(
          lineitem.filter(pmod($"l_orderkey", lit(2)) === i), mvKeys, mvMeasures))
        .reduce((s, p) => graft.operators.IncrementalAgg.merge(s, p, mvKeys))
      val mvFull = graft.operators.IncrementalAgg.partials(lineitem, mvKeys, mvMeasures)
      require(mvState.select(sum("cnt_qty")).collect()(0).getLong(0) ==
        mvFull.select(sum("cnt_qty")).collect()(0).getLong(0), "MV fold lost rows")
      println(s"incremental MV state rows: ${mvState.count()}")

      println("== CVSS v3.1 vector scoring ==")
      val cvssRows = Seq(
        "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H",
        "CVSS:3.1/AV:N/AC:L/PR:N/UI:R/S:C/C:L/I:L/A:N").toDF("vs")
        .select($"vs", graft.nvd.CvssV3.baseScoreOfVector($"vs").as("score"))
        .collect().map(r => r.getString(0).takeRight(30) -> r.getDouble(1))
      require(cvssRows.map(_._2).toSeq == Seq(9.8, 6.1), s"CVSS scores off: ${cvssRows.toSeq}")
      println(s"cvss scores: ${cvssRows.map(_._2).mkString(", ")}")

      println("== CPE version-range containment ==")
      val vr = Seq(("1.2.10", "1.2.9", "1.2.11"), ("1.2.11", "1.2.9", "1.2.11"))
        .toDF("v", "lo", "hi")
        .select(graft.nvd.CpeParser.versionInRange(
          $"v", $"lo", lit(null), lit(null), $"hi").as("in"))
        .collect().map(_.getBoolean(0)).toSeq
      require(vr == Seq(true, false), s"version range off: $vr")
      println(s"version containment: $vr")

      println("== streaming semantic dedup (2 batches) ==")
      val semState = java.nio.file.Files.createTempDirectory("scratch_sem").toString + "/state"
      def v8(i: Int, x: Float) = { val a = new Array[Float](8); a(i) = 1f; a(1) = x; a }
      graft.streaming.StreamingSemanticDedup.process(spark,
        Seq((1L, v8(0, 0f)), (2L, v8(0, 0.01f)), (3L, v8(2, 0f)))
          .toDF("doc_id", "embedding"),
        semState, threshold = 0.9, dim = 8)
      graft.streaming.StreamingSemanticDedup.process(spark,
        Seq((10L, v8(0, 0.02f)), (11L, v8(4, 0f))).toDF("doc_id", "embedding"),
        semState, threshold = 0.9, dim = 8)
      val semAdmitted = spark.read.parquet(semState).select("doc")
        .collect().map(_.getLong(0)).sorted.toSeq
      require(semAdmitted == Seq(1L, 3L, 11L), s"semantic state off: $semAdmitted")
      println(s"semantic dedup admitted: $semAdmitted")

      println("== overlapping chunking ==")
      val chunked = graft.operators.Chunker.chunk(docs, chunkSize = 128, overlap = 32)
      val chunkAgg = chunked.agg(count(lit(1)), sum(when($"chunk_idx" === 0, 1).otherwise(0))).first()
      require(chunkAgg.getLong(1) == docs.count(), "every doc must have a chunk 0")
      println(s"chunks: ${chunkAgg.getLong(0)} over ${docs.count()} docs")

      println("== seeded corpus shuffle ==")
      val sharded = graft.operators.CorpusShuffle.assign(docs, "doc_id", 4, "scratch")
      require(sharded.select("shard").distinct().count() == 4, "expected 4 shards")
      require(sharded.count() == docs.count(), "shuffle must not lose docs")
      println(s"shards populated, ${sharded.count()} docs")

      println("== int8 scalar quantization ==")
      val sqQueries = emb.filter($"vec_id" < 5)
        .select($"vec_id".as("qid"), $"embedding".as("qv"))
      val sqTop = graft.ann.ScalarQuant.topK(
        emb, sqQueries, "vec_id", "embedding", "qid", "qv", 3)
      // tie-robust: a distinct embedding can quantize to codes
      // proportional to the query's (cos exactly 1.0) and win the
      // id tie-break — require the self-pair at cosine ~1 in the
      // top-k instead of demanding rank 1
      require(sqTop.filter($"query_id" === $"neighbor_id" && $"cos" > 0.9999).count() == 5,
        "each query's own vector must appear at quantized cosine ~1")
      println(s"sq8 top-3 rows: ${sqTop.count()}")

      println("== inverted-index search + BM25 ==")
      val phrase = graft.operators.InvertedIndex.phraseSearch(docs, "doc_id", "text", Seq("table", "hash"))
      val bm25 = graft.operators.InvertedIndex.bm25Search(docs, "doc_id", "text", Seq("vector", "stream"), k = 5)
      require(bm25.count() == 5, "bm25 top-5 must fill")
      println(s"phrase hits: ${phrase.count()} docs; bm25 top-5 ok")

      println("== edit-distance near-dups (band + LSH routes) ==")
      val edExact = graft.dedup.EditDistance.pairs(docs, "doc_id", "text", maxDist = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val edLsh = graft.dedup.EditDistance.lshPairs(docs, "doc_id", "text", maxDist = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      require(edLsh.subsetOf(edExact), "LSH route produced a false pair")
      println(s"edit-distance pairs: exact=${edExact.size} lsh=${edLsh.size}")

      println("== skew report ==")
      val skew = graft.operators.SkewReport.topKeys(ev, "user_id", 5).collect()
      require(skew.length == 5 && skew.head.getAs[Long]("cnt") >= skew.last.getAs[Long]("cnt"))
      println(s"top key carries ${skew.head.getAs[Double]("ratio_to_mean")}x the mean load")

      println("== SQL function registry (text + cvss) ==")
      val sqlRow = spark.sql(
        "SELECT token_count(' a b c ') AS tc, lang_id(' the cat and the dog of ') AS lid, " +
        "cvss3_severity(cvss3_base_score('CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H')) AS sev").first()
      require(sqlRow.getAs[Int]("tc") == 3 && sqlRow.getAs[String]("sev") == "CRITICAL",
        s"sql registry off: $sqlRow")
      println(s"sql registry: token_count=3, lang=${sqlRow.getAs[String]("lid")}, sev=CRITICAL")
      println("SCRATCH OK")
    } finally spark.stop()
  }
}
