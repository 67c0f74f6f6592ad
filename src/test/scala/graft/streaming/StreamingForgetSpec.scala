package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.dedup.{LshStore, MinHashLSH}
import graft.functions.TextFunctions
import graft.operators.{CoPresence, CoPresenceStore, LabelPropagation, PairGraphStore, PostingsStore, VocabStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class StreamingForgetSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("forget").toString

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")
  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")
  private def events = graft.Tables.load(spark, sf001, "events")
    .select(col("user_id"), col("ts"))

  private val copCfg =
    CoPresenceStore.Config(windowSec = 600, minShared = 3, maxWindowActors = 100)

  private def pairsOf(corpus: DataFrame): DataFrame =
    MinHashLSH.verifyJaccard(
      MinHashLSH.candidatePairs(corpus, "doc_id", "text",
        numHashes = 128, bands = 32, shingleN = 3),
      corpus, "doc_id", "text", shingleN = 3, minJaccard = 0.8)
      .select(col("doc_a"), col("doc_b"))

  private def postingsOf(df: DataFrame): DataFrame =
    df.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(TextFunctions.wsTokens(lower(col("text")))).as("w"))

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def vocabMap(path: String): Map[String, (Long, Long)] =
    VocabStore.read(spark, path).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def labelsOf(graphPath: String): Map[Long, Long] =
    PairGraphStore.open(spark, graphPath).ensureCommunities(rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // doc probe disjoint from every removed id (the takedown-spec shape)
  private def probe = docs
    .filter(pmod(col("doc_id"), lit(4)) === 0 &&
      pmod(col("doc_id"), lit(10)) > 2)
    .withColumn("doc_id", col("doc_id") + 100000)

  private def feed(docMod: Int, actorMod: Int): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(10)) === docMod)
      .select(lit("doc").as("kind"), col("doc_id").cast("long").as("id"))
      .unionByName(events.select(col("user_id")).distinct()
        .filter(pmod(col("user_id"), lit(actorMod)) === 0)
        .select(lit("actor").as("kind"), col("user_id").cast("long").as("id")))

  /** Build every store of the composition under `dir`; returns the
    * (doc, actor) targets. */
  private def buildAll(dir: String): (StreamingForget.DocTargets,
      StreamingForget.ActorTargets) = {
    val lsh = LshStore.build(docs, "doc_id", "text", s"$dir/lsh")
    val ps = PostingsStore.build(docs, "doc_id", "text", s"$dir/postings",
      nBuckets = 16)
    val g = PairGraphStore.build(pairsOf(docs), "doc_a", "doc_b", None,
      s"$dir/graph")
    g.ensureCommunities(rounds = 3)
    VocabStore.create(spark, postingsOf(docs), "doc_id", "w", s"$dir/vocab")
    CoPresenceStore.create(spark, s"$dir/counts", copCfg)
    StreamingEventsGraph.process(events, 0L, s"$dir/counts", s"$dir/egraph")
    val vocabForget = (ids: DataFrame, bid: Long) =>
      VocabStore.removeBatch(spark,
        postingsOf(docs.join(ids.withColumnRenamed("id", "doc_id"),
          Seq("doc_id"), "left_semi")),
        "doc_id", "w", s"$dir/vocab", bid)
    // vector-index leg: the navigable-graph ANN store forgets the same
    // doc ids (vec_id-aligned corpus) through its set-union tombstone
    // ledger — idempotent under redelivery by construction
    graft.ann.GraphAnn.create(emb, "vec_id", "embedding",
      spark, s"$dir/gann", k = 8)
    val gannForget = (ids: DataFrame, _: Long) => {
      graft.ann.GraphAnn.ensure(emb, "vec_id", "embedding",
          spark, s"$dir/gann", k = 8)
        .remove(ids.withColumnRenamed("id", "vec_id"), "vec_id")
      ()
    }
    (StreamingForget.DocTargets(lsh, g, maxK = 4,
        postings = Some(ps), extra = Seq(vocabForget, gannForget)),
      StreamingForget.ActorTargets(s"$dir/counts", s"$dir/egraph",
        events = Some(events)))
  }

  /** Assert the five fingerprinted stores (lsh, postings, graph,
    * counts, events-graph) serve the kept corpus + kept events — the
    * marker-gate surface, usable with `extra = Nil`. */
  private def assertKeptCore(dir: String, doc: StreamingForget.DocTargets,
      docMods: Seq[Int], actorMod: Int): Unit = {
    val kept = docs.filter(!pmod(col("doc_id"), lit(10))
      .isin(docMods.map(Int.box): _*))
    val keptEv = events.filter(pmod(col("user_id"), lit(actorMod)) =!= 0)
    // text dedup index
    val keptLsh = LshStore.build(kept, "doc_id", "text", s"${tmp()}/lshref")
    val got = rows(doc.lsh.nearDupsOfDelta(probe, "text", minJaccard = 0.8))
    assert(got == rows(keptLsh.nearDupsOfDelta(probe, "text", minJaccard = 0.8)))
    assert(got.nonEmpty, "planted near-dups must survive the fixture")
    // search index (score-visible IDF)
    val keptPs = PostingsStore.build(kept, "doc_id", "text",
      s"${tmp()}/psref", nBuckets = 16)
    val terms = Seq("vector", "stream", "window")
    assert(rows(doc.postings.get.bm25Search(terms, k = 20))
      == rows(keptPs.bm25Search(terms, k = 20)))
    // similarity graph labels
    val keptG = PairGraphStore.build(pairsOf(kept), "doc_a", "doc_b", None,
      s"${tmp()}/gref")
    assert(doc.graph.ensureCommunities(rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
      == keptG.ensureCommunities(rounds = 3).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    // behavioral layer: counts + community labels over kept events
    val wantCounts = CoPresence.pairs(keptEv, "user_id", "ts",
        copCfg.windowSec, 1, copCfg.maxWindowActors)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(CoPresenceStore.read(spark, s"$dir/counts").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      == wantCounts)
    val keptPairs = CoPresence.pairs(keptEv, "user_id", "ts",
      copCfg.windowSec, copCfg.minShared, copCfg.maxWindowActors)
    val wantL = LabelPropagation.run(
        keptPairs.select(col("ua"), col("ub")), "ua", "ub", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labelsOf(s"$dir/egraph") == wantL)
    assert(wantL.nonEmpty, "the behavioral fixture must keep a graph")
  }

  /** [[assertKeptCore]] plus the extra-forgetter stores (vocab monoid,
    * GraphAnn vector index). */
  private def assertKept(dir: String, doc: StreamingForget.DocTargets,
      docMods: Seq[Int], actorMod: Int): Unit = {
    assertKeptCore(dir, doc, docMods, actorMod)
    val kept = docs.filter(!pmod(col("doc_id"), lit(10))
      .isin(docMods.map(Int.box): _*))
    // vocabulary monoid store
    val vref = s"${tmp()}/vocabref"
    VocabStore.create(spark, postingsOf(kept), "doc_id", "w", vref)
    assert(vocabMap(s"$dir/vocab") == vocabMap(vref))
    // vector index: forgotten ids never served, at any k
    val removedIds = emb.filter(pmod(col("vec_id"), lit(10))
        .isin(docMods.map(Int.box): _*))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val gannQs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val served = graft.ann.GraphAnn.ensure(emb, "vec_id", "embedding",
        spark, s"$dir/gann", k = 8)
      .topK(gannQs, "qid", "qvec", k = 100000, beam = 8, maxHops = 8)
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet
    assert((served & removedIds).isEmpty,
      "forgotten vector ids must never serve from the graph index")
    assert(served.nonEmpty, "the kept graph must still serve")
  }

  test("one (kind, id) feed forgets docs AND actors across every store; replay no-ops") {
    val dir = tmp()
    val (doc, actor) = buildAll(dir)
    StreamingForget.process(feed(1, 9), 1L, doc, actor)
    assertKept(dir, doc, Seq(1), 9)
    // full redelivery of the committed batch: every leg no-ops
    StreamingForget.process(feed(1, 9), 1L, doc, actor)
    assertKept(dir, doc, Seq(1), 9)
  }

  test("crash between the doc leg and the rest heals on replay") {
    val dir = tmp()
    val (doc, actor) = buildAll(dir)
    // simulate: the doc-side composition fully ran, then the process
    // died BEFORE the vocab forgetter and the actor leg
    val ids = feed(2, 9)
    StreamingTakedown.process(
      ids.filter(col("kind") === "doc").select(col("id")),
      doc.lsh, doc.graph, maxK = 4, postings = doc.postings)
    // the foreachBatch replay re-runs the WHOLE batch: idempotent doc
    // legs + the not-yet-run vocab/actor legs
    StreamingForget.process(ids, 1L, doc, actor)
    assertKept(dir, doc, Seq(2), 9)
  }

  test("file-stream drive forgets both kinds end to end; unknown kinds fail loud") {
    val dir = tmp()
    val (doc, actor) = buildAll(dir)
    val inDir = s"$dir/in"
    feed(3, 9).write.parquet(s"$inDir/b0")
    StreamingForget.stream(spark, s"$inDir/*", s"$dir/ckpt", doc, actor)
      .awaitTermination()
    assertKept(dir, doc, Seq(3), 9)
    val bad = spark.createDataFrame(Seq(("tenant", 5L))).toDF("kind", "id")
    val ex = intercept[IllegalArgumentException] {
      StreamingForget.process(bad, 9L, doc, actor)
    }
    assert(ex.getMessage.contains("unknown kind"))
  }

  test("sustained 20-batch mixed stream with mid-stream compaction converges") {
    val dir = tmp()
    val (doc0, actor) = buildAll(dir)
    // aggressive ratio so compaction fires MID-stream, several times —
    // the sustained-deletion shape: hygiene must not disturb
    // convergence or exactly-once ledgers
    val doc = doc0.copy(compactRatio = 0.05)
    var compactions = 0
    (0 until 20).foreach { b =>
      val batch = docs.filter(pmod(col("doc_id"), lit(40)) === b)
        .select(lit("doc").as("kind"), col("doc_id").cast("long").as("id"))
        .unionByName(events.select(col("user_id")).distinct()
          .filter(pmod(col("user_id"), lit(100)) === b)
          .select(lit("actor").as("kind"), col("user_id").cast("long").as("id")))
      val hadLedger = doc.lsh.removedIds.count() > 0
      StreamingForget.process(batch, b.toLong, doc, actor)
      // a cleared ledger right after a batch that grew it = compaction
      if (hadLedger && doc.lsh.removedIds.count() == 0) compactions += 1
    }
    assert(compactions >= 1,
      "compaction must fire mid-stream at this ratio, else the tier is vacuous")
    // final state == from-scratch over the kept corpus + kept events
    val kept = docs.filter(pmod(col("doc_id"), lit(40)) >= 20)
    val keptEv = events.filter(pmod(col("user_id"), lit(100)) >= 20)
    val keptLsh = LshStore.build(kept, "doc_id", "text", s"${tmp()}/lshref")
    assert(rows(doc.lsh.nearDupsOfDelta(probe, "text", minJaccard = 0.8))
      == rows(keptLsh.nearDupsOfDelta(probe, "text", minJaccard = 0.8)))
    val keptPs = PostingsStore.build(kept, "doc_id", "text",
      s"${tmp()}/psref", nBuckets = 16)
    assert(rows(doc.postings.get.bm25Search(Seq("vector", "stream", "window"), k = 20))
      == rows(keptPs.bm25Search(Seq("vector", "stream", "window"), k = 20)))
    val keptG = PairGraphStore.build(pairsOf(kept), "doc_a", "doc_b", None,
      s"${tmp()}/gref")
    assert(doc.graph.ensureCommunities(rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
      == keptG.ensureCommunities(rounds = 3).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val vref = s"${tmp()}/vocabref"
    VocabStore.create(spark, postingsOf(kept), "doc_id", "w", vref)
    assert(vocabMap(s"$dir/vocab") == vocabMap(vref))
    val wantCounts = CoPresence.pairs(keptEv, "user_id", "ts",
        copCfg.windowSec, 1, copCfg.maxWindowActors)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(CoPresenceStore.read(spark, s"$dir/counts").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      == wantCounts)
  }

  // ---- all-stores-applied marker (the composition-level replay gate) ----

  private def markerStatus(dir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/lsh/_forget_applied")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(fs.getFileStatus(p).getModificationTime) else None
  }

  test("marker: exact redelivery short-circuits; any store mutation re-arms") {
    val dir = tmp()
    val (doc0, actor) = buildAll(dir)
    val doc = doc0.copy(extra = Nil) // the gate only arms extra-free
    StreamingForget.process(feed(1, 9), 1L, doc, actor)
    assertKeptCore(dir, doc, Seq(1), 9)
    val m1 = markerStatus(dir)
    assert(m1.nonEmpty, "marker must land after a full fan-out")
    // exact redelivery: the marker matches, the fan-out is skipped —
    // the marker file is NOT rewritten (mtime pinned) and every store
    // still serves the kept corpus
    Thread.sleep(5)
    StreamingForget.process(feed(1, 9), 1L, doc, actor)
    assert(markerStatus(dir) == m1, "a matching marker must skip (no rewrite)")
    assertKeptCore(dir, doc, Seq(1), 9)
    // a store mutated AFTER the marker (here: one maintainer's own rm
    // marker lost — the rebuilt-state shape) breaks its fingerprint:
    // the replay must run in full (the maintainer reconverges and
    // re-marks) and the composition marker must be rewritten
    Thread.sleep(5)
    val labels = new org.apache.hadoop.fs.Path(s"$dir/graph/graphlabels")
    val gfs = labels.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rmMarker = gfs.listStatus(labels)
      .map(_.getPath).find(_.getName.startsWith("_applied_rm_"))
    assert(rmMarker.nonEmpty, "fixture must have left a labels rm marker")
    gfs.delete(rmMarker.get, false)
    StreamingForget.process(feed(1, 9), 1L, doc, actor)
    assert(markerStatus(dir) != m1, "a broken fingerprint must re-run and re-mark")
    assertKeptCore(dir, doc, Seq(1), 9)
    // a DIFFERENT batch never matches the stored marker
    Thread.sleep(5)
    val m2 = markerStatus(dir)
    StreamingForget.process(feed(2, 9), 2L, doc, actor)
    assert(markerStatus(dir) != m2)
    assertKeptCore(dir, doc, Seq(1, 2), 9)
  }

  test("marker: crash before the write (marker absent) replays in full") {
    val dir = tmp()
    val (doc0, actor) = buildAll(dir)
    val doc = doc0.copy(extra = Nil)
    StreamingForget.process(feed(1, 9), 1L, doc, actor)
    // simulate a crash in the window between the last leg and the
    // marker write: the legs landed, the marker did not
    val p = new org.apache.hadoop.fs.Path(s"$dir/lsh/_forget_applied")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
    StreamingForget.process(feed(1, 9), 1L, doc, actor)
    assert(markerStatus(dir).nonEmpty, "the replay must re-mark")
    assertKeptCore(dir, doc, Seq(1), 9)
  }

  test("marker: never armed with extra forgetters (caller-owned state)") {
    val dir = tmp()
    val (doc, actor) = buildAll(dir) // extra = vocab + gann forgetters
    StreamingForget.process(feed(1, 9), 1L, doc, actor)
    assert(markerStatus(dir).isEmpty,
      "extra-forgetter state cannot be fingerprinted; the gate must stay off")
    assertKept(dir, doc, Seq(1), 9)
  }
}
