package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.dedup.{LshStore, MinHashLSH}
import graft.operators.PairGraphStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class StreamingTakedownSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("takedown").toString

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")

  /** The corpus's verified near-dup pair frame — the store generator
    * AND the kept-reference generator (restricting the corpus
    * restricts the pair set to kept-endpoint pairs, the same rows
    * revoking incident edges leaves behind). */
  private def pairsOf(corpus: DataFrame): DataFrame =
    MinHashLSH.verifyJaccard(
      MinHashLSH.candidatePairs(corpus, "doc_id", "text",
        numHashes = 128, bands = 32, shingleN = 3),
      corpus, "doc_id", "text", shingleN = 3, minJaccard = 0.8)
      .select(col("doc_a"), col("doc_b"))

  private def allStates(g: PairGraphStore.Handle)
      : (Map[Long, Int], Map[Long, Long], Map[Long, Seq[Double]],
         Set[(Long, Long)]) = (
    g.ensureCores(maxK = 4).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap,
    g.ensureCommunities(rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap,
    g.ensureRanks(iterations = 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap,
    g.ensureTruss(k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)

  private def keptStates(corpus: DataFrame) = {
    val g = PairGraphStore.build(pairsOf(corpus), "doc_a", "doc_b", None,
      s"${tmp()}/graph")
    allStates(g)
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  // a probe delta disjoint from every id the fixtures remove — the
  // serve-equality witness (the LshStoreSpec remove pattern)
  private def probe = docs
    .filter(pmod(col("doc_id"), lit(4)) === 0 &&
      pmod(col("doc_id"), lit(10)) > 2)
    .withColumn("doc_id", col("doc_id") + 100000)

  private def gone(m: Int) =
    docs.filter(pmod(col("doc_id"), lit(10)) === m).select(col("doc_id"))

  private def keptAfter(ms: Int*) =
    docs.filter(!pmod(col("doc_id"), lit(10)).isin(ms.map(Int.box): _*))

  test("takedown batches drive text index, search index and graph states to the kept-corpus fixpoint") {
    val dir = tmp()
    val lsh = LshStore.build(docs, "doc_id", "text", s"$dir/lsh")
    val ps = graft.operators.PostingsStore.build(
      docs, "doc_id", "text", s"$dir/postings", nBuckets = 16)
    val g = PairGraphStore.build(pairsOf(docs), "doc_a", "doc_b", None,
      s"$dir/graph")
    allStates(g) // states ensured up front (the production shape)
    StreamingTakedown.process(gone(1), lsh, g, maxK = 4, trussK = Some(3),
      postings = Some(ps))
    StreamingTakedown.process(gone(2), lsh, g, maxK = 4, trussK = Some(3),
      postings = Some(ps))
    val kept = keptAfter(1, 2)
    assert(allStates(g) == keptStates(kept), "graph states after two batches")
    val keptLsh = LshStore.build(kept, "doc_id", "text", s"$dir/lshref")
    val got = rows(lsh.nearDupsOfDelta(probe, "text", minJaccard = 0.8))
    assert(got == rows(keptLsh.nearDupsOfDelta(probe, "text", minJaccard = 0.8)))
    assert(got.nonEmpty, "planted near-dups must survive the fixture")
    // the SEARCH leg serves the kept corpus too (score-visible IDF)
    val keptPs = graft.operators.PostingsStore.build(
      kept, "doc_id", "text", s"$dir/postingsref", nBuckets = 16)
    val terms = Seq("vector", "stream", "window")
    assert(rows(ps.bm25Search(terms, k = 20))
      == rows(keptPs.bm25Search(terms, k = 20)))
    // replayed batch: ledgers, states and serves all unchanged
    val ledger = lsh.removedIds.count()
    val psLedger = ps.removedDocs.count()
    StreamingTakedown.process(gone(2), lsh, g, maxK = 4, trussK = Some(3),
      postings = Some(ps))
    assert(lsh.removedIds.count() == ledger)
    assert(ps.removedDocs.count() == psLedger)
    assert(allStates(g) == keptStates(kept))
  }

  test("crash windows between the composition's steps heal on replay") {
    val dir = tmp()
    val lsh = LshStore.build(docs, "doc_id", "text", s"$dir/lsh")
    val g = PairGraphStore.build(pairsOf(docs), "doc_a", "doc_b", None,
      s"$dir/graph")
    allStates(g)
    // window A: the text tombstones landed, the graph never ran
    lsh.remove(gone(1))
    StreamingTakedown.process(gone(1), lsh, g, maxK = 4, trussK = Some(3))
    assert(allStates(g) == keptStates(keptAfter(1)), "after window A replay")
    // window B: the graph's FIRST maintainers ran (ledger landed,
    // cores maintained), ranks/truss and the text index never did —
    // the replay must re-derive the same incident batch from the
    // PHYSICAL rows (the serve view already excludes them) and drive
    // everything to the fixpoint
    val incident2 = StreamingTakedown.incidentEdges(g, gone(2))
    g.removeEdgesAndMaintainCommunities(incident2, rounds = 3)
    g.removeEdgesAndMaintainCores(incident2, maxK = 4)
    StreamingTakedown.process(gone(2), lsh, g, maxK = 4, trussK = Some(3))
    val kept = keptAfter(1, 2)
    assert(allStates(g) == keptStates(kept), "after window B replay")
    val keptLsh = LshStore.build(kept, "doc_id", "text", s"$dir/lshref")
    assert(rows(lsh.nearDupsOfDelta(probe, "text", minJaccard = 0.8))
      == rows(keptLsh.nearDupsOfDelta(probe, "text", minJaccard = 0.8)))
  }

  test("file-stream drive equals direct process calls") {
    val dir = tmp()
    val lsh = LshStore.build(docs, "doc_id", "text", s"$dir/lsh")
    val g = PairGraphStore.build(pairsOf(docs), "doc_a", "doc_b", None,
      s"$dir/graph")
    allStates(g)
    val inDir = s"$dir/in"
    gone(1).write.parquet(s"$inDir/b1")
    gone(2).write.parquet(s"$inDir/b2")
    StreamingTakedown.stream(spark, s"$inDir/*", gone(1).schema, lsh, g,
      maxK = 4, checkpointDir = s"$dir/ckpt", trussK = Some(3))
      .awaitTermination()
    assert(allStates(g) == keptStates(keptAfter(1, 2)))
  }
}
