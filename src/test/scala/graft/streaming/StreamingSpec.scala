package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import java.nio.file.Files

class StreamingSpec extends SparkSpec {

  test("streaming hourly agg over a file source equals the batch twin") {
    // stage events as parquet with micros ts (streams can't use the
    // nanos-as-long legacy read in the same way as Tables.events)
    val staged = Files.createTempDirectory("evstream").toString
    val batchEvents = graft.Tables.events(spark, sf001)
    batchEvents.write.mode("overwrite").parquet(staged)

    val stream = spark.readStream
      .schema(batchEvents.schema)
      .parquet(staged)
    val out = EventStreams.hourlyByType(stream)

    val q = out.writeStream
      .format("memory")
      .queryName("hourly_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // append-mode emits only watermark-closed windows; every emitted
    // row must match the batch computation exactly
    val streamed = spark.table("hourly_stream")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventStreams.hourlyByType(batchEvents)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch))
    // with AvailableNow over a static dir, all but the final (unclosed)
    // windows are emitted
    assert(streamed.size >= batch.size - 10)
  }

  test("NVD stream ingest: drop feed file, drain, store reflects it; second drain is a no-op") {
    val staging = Files.createTempDirectory("nvdstream").toString
    val store = Files.createTempDirectory("nvdstore").toString + "/store"
    val ckpt = Files.createTempDirectory("nvdckpt").toString

    Files.copy(
      java.nio.file.Paths.get("src/test/resources/nvdfeed/2002.json"),
      java.nio.file.Paths.get(staging, "2002.json"))

    val q1 = NvdStreamIngest.start(spark, staging, store, ckpt)
    q1.awaitTermination(120000)
    assert(graft.nvd.NvdStore.cveTally(graft.nvd.NvdStore.read(spark, store)) === 3)

    // second file amends one CVE and adds one
    Files.copy(
      java.nio.file.Paths.get("src/test/resources/nvdfeed/modified.json"),
      java.nio.file.Paths.get(staging, "modified.json"))
    val q2 = NvdStreamIngest.start(spark, staging, store, ckpt)
    q2.awaitTermination(120000)
    val stored = graft.nvd.NvdStore.read(spark, store)
    assert(graft.nvd.NvdStore.cveTally(stored) === 4)
    assert(stored.filter(col("cve_id") === "CVE-2002-0001")
      .first().getAs[Double]("score") === 10.0)

    // drain again with no new files: checkpoint makes it a no-op
    val q3 = NvdStreamIngest.start(spark, staging, store, ckpt)
    q3.awaitTermination(120000)
    assert(graft.nvd.NvdStore.cveTally(graft.nvd.NvdStore.read(spark, store)) === 4)
  }

  test("NVD zip-direct stream ingest: archives in, store updated, no staging step") {
    val zips = Files.createTempDirectory("nvdzips")
    val store = Files.createTempDirectory("nvdzstore").toString + "/store"
    val ckpt = Files.createTempDirectory("nvdzckpt").toString
    def dropZip(feed: String): Unit = {
      val tmp = Files.createTempFile("nvdstage", ".zip")
      val zout = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(tmp))
      try {
        zout.putNextEntry(new java.util.zip.ZipEntry(s"nvdcve-1.1-$feed.json"))
        zout.write(Files.readAllBytes(
          java.nio.file.Paths.get(s"src/test/resources/nvdfeed/$feed.json")))
        zout.closeEntry()
      } finally zout.close()
      Files.move(tmp, zips.resolve(s"nvdcve-1.1-$feed.json.zip"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    dropZip("2002")
    NvdStreamIngest.startFromZips(spark, zips.toString, store, ckpt).awaitTermination(120000)
    assert(graft.nvd.NvdStore.cveTally(graft.nvd.NvdStore.read(spark, store)) === 3)

    dropZip("modified") // amends CVE-2002-0001, adds one
    NvdStreamIngest.startFromZips(spark, zips.toString, store, ckpt).awaitTermination(120000)
    val stored = graft.nvd.NvdStore.read(spark, store)
    assert(graft.nvd.NvdStore.cveTally(stored) === 4)
    assert(stored.filter(col("cve_id") === "CVE-2002-0001")
      .first().getAs[Double]("score") === 10.0)
  }

  test("NVD stream ingest quarantines malformed feed files; healthy files in the same batch still load") {
    val staging = Files.createTempDirectory("nvdqstream").toString
    val store = Files.createTempDirectory("nvdqstore").toString + "/store"
    val ckpt = Files.createTempDirectory("nvdqckpt").toString
    val quarantine = Files.createTempDirectory("nvdqdir").toString + "/bad"

    Files.copy(
      java.nio.file.Paths.get("src/test/resources/nvdfeed/2002.json"),
      java.nio.file.Paths.get(staging, "2002.json"))
    Files.copy(
      java.nio.file.Paths.get("src/test/resources/nvdfeed/corrupt.json"),
      java.nio.file.Paths.get(staging, "corrupt.json"))

    NvdStreamIngest.start(spark, staging, store, ckpt,
      quarantineDir = Some(quarantine)).awaitTermination(120000)
    // healthy feed loaded in full, corrupt one contributed nothing
    assert(graft.nvd.NvdStore.cveTally(graft.nvd.NvdStore.read(spark, store)) === 3)
    // ...but left its audit row: file + raw-text sample
    val bad = spark.read.parquet(quarantine).collect()
    assert(bad.length === 1)
    assert(bad.head.getAs[String]("file").endsWith("corrupt.json"))
    assert(bad.head.getAs[String]("corrupt_sample").contains("CVE_data_type"))
  }

  test("NVD zip-direct stream ingest quarantines an archive whose document does not parse") {
    val zips = Files.createTempDirectory("nvdqzips")
    val store = Files.createTempDirectory("nvdqzstore").toString + "/store"
    val ckpt = Files.createTempDirectory("nvdqzckpt").toString
    val quarantine = Files.createTempDirectory("nvdqzdir").toString + "/bad"
    def dropZip(feed: String): Unit = {
      val tmp = Files.createTempFile("nvdqstage", ".zip")
      val zout = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(tmp))
      try {
        zout.putNextEntry(new java.util.zip.ZipEntry(s"nvdcve-1.1-$feed.json"))
        zout.write(Files.readAllBytes(
          java.nio.file.Paths.get(s"src/test/resources/nvdfeed/$feed.json")))
        zout.closeEntry()
      } finally zout.close()
      Files.move(tmp, zips.resolve(s"nvdcve-1.1-$feed.json.zip"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    dropZip("2002")
    dropZip("corrupt")
    NvdStreamIngest.startFromZips(spark, zips.toString, store, ckpt,
      quarantineDir = Some(quarantine)).awaitTermination(120000)
    assert(graft.nvd.NvdStore.cveTally(graft.nvd.NvdStore.read(spark, store)) === 3)
    val bad = spark.read.parquet(quarantine).collect()
    assert(bad.length === 1)
    assert(bad.head.getAs[String]("file").endsWith("corrupt.json"))
    assert(bad.head.getAs[String]("corrupt_sample").nonEmpty)

    // the batch audit twin over the same archives agrees
    val audit = graft.nvd.CveFlatten.feedAuditZips(spark, zips.toString)
      .collect().map(r => r.getAs[String]("entry") ->
        ((r.getAs[Boolean]("corrupt"), r.getAs[Long]("n_items")))).toMap
    assert(audit("nvdcve-1.1-2002.json") === ((false, 3L)))
    assert(audit("nvdcve-1.1-corrupt.json")._1 === true)
  }

  test("corrupt zip dropped MID-STREAM: quarantined, then the pipeline keeps ingesting") {
    val zips = Files.createTempDirectory("nvdmzips")
    val store = Files.createTempDirectory("nvdmzstore").toString + "/store"
    val ckpt = Files.createTempDirectory("nvdmzckpt").toString
    val quarantine = Files.createTempDirectory("nvdmzdir").toString + "/bad"
    def dropZip(feed: String): Unit = {
      val tmp = Files.createTempFile("nvdmstage", ".zip")
      val zout = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(tmp))
      try {
        zout.putNextEntry(new java.util.zip.ZipEntry(s"nvdcve-1.1-$feed.json"))
        zout.write(Files.readAllBytes(
          java.nio.file.Paths.get(s"src/test/resources/nvdfeed/$feed.json")))
        zout.closeEntry()
      } finally zout.close()
      Files.move(tmp, zips.resolve(s"nvdcve-1.1-$feed.json.zip"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def drain(): Unit = NvdStreamIngest.startFromZips(spark, zips.toString,
      store, ckpt, quarantineDir = Some(quarantine)).awaitTermination(120000)
    def tally(): Long = graft.nvd.NvdStore.cveTally(graft.nvd.NvdStore.read(spark, store))

    // 1: healthy archive establishes the store and the checkpoint
    dropZip("2002")
    drain()
    assert(tally() === 3)

    // 2: a corrupt archive arrives mid-stream — quarantined with an
    // audit row, store untouched, stream completes normally
    dropZip("corrupt")
    drain()
    assert(tally() === 3)
    val bad = spark.read.parquet(quarantine).collect()
    assert(bad.length === 1)
    assert(bad.head.getAs[String]("file").endsWith("corrupt.json"))
    assert(bad.head.getAs[String]("corrupt_sample").nonEmpty)

    // 3: the pipeline CONTINUES past the poison file — the next healthy
    // archive loads (amend + add), and quarantine gains nothing new
    dropZip("modified")
    drain()
    assert(tally() === 4)
    assert(graft.nvd.NvdStore.read(spark, store)
      .filter(col("cve_id") === "CVE-2002-0001").first().getAs[Double]("score") === 10.0)
    assert(spark.read.parquet(quarantine).count() === 1)
  }

  test("streaming span dedup: cross-drain repeated spans detected, one-drain equals batch, replays ignored") {
    val sp = spark; import sp.implicits._
    val drop = Files.createTempDirectory("spanstream").toString
    val state = Files.createTempDirectory("spanstate").toString + "/state"
    val ckpt = Files.createTempDirectory("spanckpt").toString
    val block = "the quick brown fox jumps over the lazy" // 8 tokens
    def filler(tag: String) = (1 to 10).map(i => s"u$tag$i").mkString(" ")
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema

    var drained = Vector.empty[(Long, Int, Int)]
    def drain(): Unit = {
      StreamingSpanDedup.start(spark, drop, state, ckpt, schema,
        onSpans = s => drained ++= s.collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      ).awaitTermination(120000)
    }

    // drain 1: two unique docs — nothing repeats
    Seq(1L -> s"${filler("a")} $block", 2L -> filler("b"))
      .toDF("doc_id", "text").write.mode("append").parquet(drop)
    drain()
    assert(drained.isEmpty)

    // drain 2: doc 3 repeats doc 1's block (history hit) at offset 10
    drained = Vector.empty
    Seq(3L -> s"${filler("c")} $block").toDF("doc_id", "text")
      .write.mode("append").parquet(drop)
    drain()
    assert(drained === Vector((3L, 10, 18)))

    // drain 3: doc 1 re-delivered — replay filter keeps it out of
    // self-match; a genuinely fresh doc 4 still detects
    drained = Vector.empty
    Seq(1L -> s"${filler("a")} $block", 4L -> s"$block ${filler("d")}")
      .toDF("doc_id", "text").write.mode("append").parquet(drop)
    drain()
    assert(drained === Vector((4L, 0, 8)))

    // one-drain stream over a corpus == the batch detection
    val corpus = Seq(
      11L -> s"${filler("x")} $block", 12L -> s"${filler("y")} $block",
      13L -> filler("z")).toDF("doc_id", "text")
    val drop2 = Files.createTempDirectory("spanstream2").toString
    val state2 = Files.createTempDirectory("spanstate2").toString + "/state"
    val ckpt2 = Files.createTempDirectory("spanckpt2").toString
    corpus.write.mode("append").parquet(drop2)
    var oneShot = Set.empty[(Long, Int, Int)]
    StreamingSpanDedup.start(spark, drop2, state2, ckpt2, schema,
      onSpans = s => oneShot ++= s.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    ).awaitTermination(120000)
    val batch = graft.dedup.SpanDedup.repeatedSpans(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(oneShot === batch)
    assert(oneShot === Set((11L, 10, 18), (12L, 10, 18)))
  }

  test("streaming search-index ingest: docs stream into a PostingsStore, searches stay exact") {
    import graft.operators.PostingsStore
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val storePath = Files.createTempDirectory("poststream").resolve("store").toString
    val dropDir = Files.createTempDirectory("poststream_in").toString
    val ckpt = Files.createTempDirectory("poststream_ck").toString

    // seed the index with the first half; stream the second half in
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val seeded = PostingsStore.build(half1, "doc_id", "text", storePath, nBuckets = 16)

    half2.write.mode("overwrite").parquet(dropDir)
    val q = spark.readStream.schema(docs.schema).parquet(dropDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        PostingsStore.append(batch, "text", seeded); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // the live index now answers every search exactly as a from-scratch
    // build of the full corpus would
    val full = PostingsStore.build(docs, "doc_id", "text",
      Files.createTempDirectory("poststream_ref").resolve("store").toString,
      nBuckets = 16)
    val live = PostingsStore.open(spark, storePath)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(live.bm25Search(Seq("vector", "stream", "window"), k = 20)) ===
      rows(full.bm25Search(Seq("vector", "stream", "window"), k = 20)))
    assert(rows(live.phraseSearch(Seq("table", "hash"))) ===
      rows(full.phraseSearch(Seq("table", "hash"))))
    assert(rows(live.termStats.select("term", "df", "cf", "max_tf")) ===
      rows(full.termStats.select("term", "df", "cf", "max_tf")))
  }

  test("stream-stream interval join equals the batch join (q96's twin)") {
    val staged = Files.createTempDirectory("ssjoin").toString
    val batchEvents = graft.Tables.events(spark, sf001)
    batchEvents.write.mode("overwrite").parquet(staged)

    def split(df: org.apache.spark.sql.DataFrame) =
      (df.filter(col("event_type") === "click"),
        df.filter(col("event_type") === "view"))

    val stream = spark.readStream.schema(batchEvents.schema).parquet(staged)
    val (sc, sv) = split(stream)
    val q = EventStreams.clickViewAttribution(sc, sv).writeStream
      .format("memory").queryName("ss_join")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val (bc, bv) = split(batchEvents)
    val batch = EventStreams.clickViewAttribution(bc, bv)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = spark.table("ss_join")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    // single-directory drain = no late rows dropped: exact equality
    assert(streamed === batch)
  }

  test("stream-static enrichment join equals the batch join; no streaming state") {
    val sp = spark; import sp.implicits._
    val staged = Files.createTempDirectory("enrich").toString
    val batchEvents = graft.Tables.events(spark, sf001)
    batchEvents.write.mode("overwrite").parquet(staged)

    // slowly-changing dim: deterministic user tiers
    val dim = batchEvents.select($"user_id").distinct()
      .withColumn("tier", when(pmod($"user_id", lit(3)) === 0, "gold")
        .when(pmod($"user_id", lit(3)) === 1, "silver").otherwise("bronze"))

    val stream = spark.readStream.schema(batchEvents.schema).parquet(staged)
    val q = EventStreams.enrichWithDim(stream, dim, "user_id")
      .groupBy($"tier").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("enrich_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val batch = EventStreams.enrichWithDim(batchEvents, dim, "user_id")
      .groupBy($"tier").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val streamed = spark.table("enrich_stream")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
    assert(streamed.keySet === Set("gold", "silver", "bronze"))
  }

  test("streaming drift gate: per-micro-batch profile vs reference, alerts on the shifted batch") {
    val sp = spark; import sp.implicits._
    val staged = Files.createTempDirectory("driftstream").toString
    val reference = graft.Tables.documents(spark, sf001)
      .select($"doc_id", $"n_chars", $"lang")
    // batch 1: a faithful slice of the corpus; batch 2: lengths
    // doubled and one language nulled — the drift the gate must catch
    reference.filter($"doc_id" % 2 === 0)
      .write.mode("overwrite").parquet(s"$staged/b=1")
    reference.filter($"doc_id" % 2 === 1)
      .withColumn("n_chars", $"n_chars" * 3)
      .withColumn("lang", when($"lang" === "en", lit(null: String)).otherwise($"lang"))
      .write.mode("overwrite").parquet(s"$staged/b=2")

    val alerts = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val stream = spark.readStream.schema(reference.schema).parquet(s"$staged/b=*")
    val q = stream.writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // the gate is ONE call: the batch-static compare of q155,
        // relative row-count drift ignored via a generous tolerance
        // on n (micro-batches are always smaller than the corpus)
        val drifted = graft.operators.DriftReport
          .compare(reference, batch, Seq("n_chars"), Seq("lang"), 0.25)
          .filter($"drifted" === 1 && $"metric" =!= "n")
          .collect()
        drifted.foreach(r => alerts.synchronized {
          alerts += ((id, r.getString(0), r.getString(1))); ()
        })
        ()
      }.start()
    q.awaitTermination(120000)

    val metricsHit = alerts.map { case (_, c, m) => s"$c.$m" }.toSet
    // the tripled lengths move the mean; the nulled lang moves its
    // null_frac — whatever the file-source batching, both must alert
    assert(metricsHit.contains("n_chars.mean"))
    assert(metricsHit.contains("lang.null_frac"))
  }

  test("streaming dedup within watermark: re-delivered rows collapse to one") {
    val sp = spark; import sp.implicits._
    val staged = Files.createTempDirectory("dedupstream").toString
    // duplicate every doc id: simulates at-least-once re-delivery
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", "alpha"),
      (1L, "2024-01-01 10:00:05", "alpha"),   // dup within lateness
      (2L, "2024-01-01 10:01:00", "beta"),
      (3L, "2024-01-01 10:02:00", "gamma"),
      (3L, "2024-01-01 10:02:01", "gamma"))
      .toDF("doc_id", "ts_s", "text")
      .select($"doc_id", $"ts_s".cast("timestamp").as("ts"), $"text")
    rows.write.mode("overwrite").parquet(staged)

    val stream = spark.readStream.schema(rows.schema).parquet(staged)
    val deduped = EventStreams.dedupWithinWatermark(stream, "ts", "10 minutes", Seq("doc_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val out = spark.table("dedup_stream").select("doc_id").as[Long].collect().sorted
    assert(out === Array(1L, 2L, 3L))
  }

  test("incremental streaming top-k similarity equals batch brute force after each drain") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val streamDir = Files.createTempDirectory("simstream").toString
    val stateDir = Files.createTempDirectory("simstate").toString + "/state"
    val ckpt = Files.createTempDirectory("simckpt").toString

    def stateTopK = spark.read.parquet(stateDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def batchTopK(corpus: org.apache.spark.sql.DataFrame) =
      graft.ann.Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", "qid", "qvec", 3)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // drain 1: first half of the corpus
    val half = emb.filter(col("vec_id") % 2 === 0)
    half.write.mode("overwrite").parquet(streamDir)
    StreamingSimilarity.start(spark, queries, streamDir, stateDir, ckpt, 3, emb.schema)
      .awaitTermination(120000)
    assert(stateTopK === batchTopK(half))

    // drain 2: second half arrives; state must now equal batch over ALL
    emb.filter(col("vec_id") % 2 === 1).write.mode("append").parquet(streamDir)
    StreamingSimilarity.start(spark, queries, streamDir, stateDir, ckpt, 3, emb.schema)
      .awaitTermination(120000)
    assert(stateTopK === batchTopK(emb))
  }

  test("streaming near-dup dedup: cross-batch near-duplicates are rejected, fresh docs admitted") {
    val sp = spark; import sp.implicits._
    val streamDir = Files.createTempDirectory("nddstream").toString
    val stateDir = Files.createTempDirectory("nddstate").toString + "/state"
    val ckpt = Files.createTempDirectory("nddckpt").toString
    val base = "the quick brown fox jumps over the lazy dog near the quiet river " +
      "while birds sing in the tall green trees of the old forest"

    val b1 = Seq(
      (1L, base),
      (2L, "completely different content about large scale data processing systems and engines"),
      (3L, "a third unrelated document mentioning neither animals nor rivers nor forests today"))
      .toDF("doc_id", "text")
    b1.write.mode("overwrite").parquet(streamDir)
    StreamingNearDupDedup.start(spark, streamDir, stateDir, ckpt, b1.schema)
      .awaitTermination(120000)
    def admitted = spark.read.parquet(stateDir).select("doc").as[Long].collect().toSet
    assert(admitted === Set(1L, 2L, 3L))

    // batch 2: doc 10 is a near-dup of doc 1 (one word appended:
    // jaccard ~22/23), doc 11 fresh
    Seq(
      (10L, base + " tonight"),
      (11L, "an entirely fresh document on streaming deduplication state stores and parquet swaps"))
      .toDF("doc_id", "text")
      .write.mode("append").parquet(streamDir)
    StreamingNearDupDedup.start(spark, streamDir, stateDir, ckpt, b1.schema)
      .awaitTermination(120000)
    assert(admitted === Set(1L, 2L, 3L, 11L))
  }

  test("flatMapGroupsWithState running totals accumulate per user") {
    val sp = spark; import sp.implicits._
    val events = Seq(
      EventStreams.UserEvent(1L, 1L, 1000L, 2.0),
      EventStreams.UserEvent(1L, 2L, 2000L, 3.0),
      EventStreams.UserEvent(2L, 3L, 1500L, 5.0)).toDS()
    // batch execution of the stateful op processes each group once
    val out = EventStreams.runningUserTotals(events)
      .collect().map(r => r.user_id -> ((r.n_events, r.total_value))).toMap
    assert(out(1L) === ((2L, 5.0)))
    assert(out(2L) === ((1L, 5.0)))
  }
}
