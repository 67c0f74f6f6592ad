package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming corpus curation: clean -> near-dup admit (subsumes exact
  * dedup) -> lang-partitioned curated append, across drains against
  * one admission state.
  */
class StreamingCorpusPipelineSpec extends SparkSpec {

  test("two drains: cleaning filters, exact+near dups rejected cross-batch, store partitioned") {
    val sp = spark; import sp.implicits._
    val store = Files.createTempDirectory("ccstore").toString + "/store"
    val state = Files.createTempDirectory("ccstate").toString + "/state"

    val base = "the quick brown fox jumps over the lazy dog and then " +
      "wanders across the wide green field looking for something interesting to chase"

    val batch1 = Seq(
      (1L, base, "en"),
      (2L, "short junk", "en"), // fails minWords
      (3L, ("palabras suficientes para pasar el filtro de calidad y longitud " * 2).trim, "es"))
      .toDF("doc_id", "text", "lang")
    val r1 = StreamingCorpusPipeline.processBatch(spark, batch1, store, state)
    assert(r1 === StreamingCorpusPipeline.BatchReport(3, 2, 2))

    val batch2 = Seq(
      (10L, base, "en"),                                  // exact dup of admitted 1
      (11L, base + " extra", "en"),                       // near dup of admitted 1
      (12L, "a completely different document about winter storms " +
        "rolling over the northern mountains bringing heavy snow and " +
        "closing every road to the coastal villages for days", "en"),
      (1L, base, "en"))                                   // replayed id: ignored
      .toDF("doc_id", "text", "lang")
    val r2 = StreamingCorpusPipeline.processBatch(spark, batch2, store, state)
    assert(r2.input === 4 && r2.afterClean === 4)
    assert(r2.admitted === 1, "only the genuinely new doc is admitted")

    val stored = spark.read.parquet(store)
    assert(stored.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L, 12L))
    // partitioned by language on disk
    assert(new java.io.File(store, "lang=en").isDirectory)
    assert(new java.io.File(store, "lang=es").isDirectory)
    // no replay duplicates in the curated store
    assert(stored.groupBy("doc_id").count().filter(col("count") > 1).isEmpty)

    // state compaction: two appends -> many small files; compaction
    // shrinks the file count without changing admission behavior
    def stateFiles = new java.io.File(state).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val before = stateFiles
    StreamingNearDupDedup.compactState(spark, state, targetFiles = 1)
    assert(stateFiles === 1 && before > 1)
    val r3 = StreamingCorpusPipeline.processBatch(spark,
      Seq((20L, base, "en")).toDF("doc_id", "text", "lang"), store, state)
    assert(r3.admitted === 0, "compacted state still rejects near-dups")
    assert(spark.read.parquet(state).select("doc").as[Long].collect().sorted.toSeq ===
      Seq(1L, 3L, 12L))
  }

  test("crash between state append and store append heals on replay") {
    val sp = spark; import sp.implicits._
    val store = Files.createTempDirectory("ccstore").toString + "/store"
    val state = Files.createTempDirectory("ccstate").toString + "/state"

    val docA = "an entirely ordinary paragraph describing the seasonal " +
      "migration of shorebirds along the atlantic flyway with enough " +
      "words to clear the cleaning thresholds comfortably"
    val docB = "regional rail timetables shifted twice this spring as " +
      "crews replaced aging signal equipment between the harbor line " +
      "junction and the northern terminus of the valley route"

    // batch 1 commits normally: docA admitted to state AND store
    val batch1 = Seq((1L, docA, "en")).toDF("doc_id", "text", "lang")
    assert(StreamingCorpusPipeline.processBatch(spark, batch1, store, state).admitted === 1)

    // batch 2 CRASHES between the two appends: the signature state
    // gets docB, the curated store never does — simulated by running
    // the admission step alone (its default onAdmitted writes nothing)
    val batch2 = Seq((2L, docB, "en")).toDF("doc_id", "text", "lang")
    StreamingNearDupDedup.process(spark,
      StreamingCorpusPipeline.clean(batch2, StreamingCorpusPipeline.Options())
        .select($"doc_id", $"text"),
      state, minJaccard = 0.8)
    assert(spark.read.parquet(state).select("doc").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L), "crashed attempt DID append to state")
    assert(spark.read.parquet(store).select("doc_id").as[Long].collect().toSeq
      === Seq(1L), "crashed attempt did NOT reach the store")

    // replay of batch 2 (checkpoint never committed -> same rows):
    // the heal re-derives the missing store append; admission itself
    // sees the ids as already processed
    val r = StreamingCorpusPipeline.processBatch(spark, batch2, store, state)
    assert(r.healed === 1 && r.admitted === 0)
    assert(spark.read.parquet(store).select("doc_id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L), "store healed with the lost curated row")

    // second replay is a no-op: the heal is idempotent
    val r2 = StreamingCorpusPipeline.processBatch(spark, batch2, store, state)
    assert(r2.healed === 0 && r2.admitted === 0)
    assert(spark.read.parquet(store).count() === 2)
  }

  test("repetition gate drops boilerplate in the streaming clean stage (batch parity)") {
    val sp = spark; import sp.implicits._
    val store = Files.createTempDirectory("ccgstore").toString + "/store"
    val state = Files.createTempDirectory("ccgstate").toString + "/state"
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "wanders across the wide green field looking for something interesting to chase"
    val batch = Seq(
      (1L, good, "en"),
      (2L, ("spam " * 40).trim, "en")) // one token dominates
      .toDF("doc_id", "text", "lang")
    val opts = StreamingCorpusPipeline.Options(
      minWords = 5, minQuality = 0.0, maxTopTokenFrac = Some(0.5))
    val r = StreamingCorpusPipeline.processBatch(spark, batch, store, state, opts)
    assert(r.afterClean === 1, "gate must run inside the streaming clean stage")
    assert(spark.read.parquet(store).select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
  }
}
