package graft.ann

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SrpStoreSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("srpstore").toString + "/store"

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("vec_a"), col("vec_b"), col("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("incremental pair set equals the full self-join restricted to delta-touching pairs") {
    val corpus = emb.filter(col("vec_id") % 4 =!= 0)
    val delta = emb.filter(col("vec_id") % 4 === 0)
    val h = SrpStore.build(corpus, "vec_id", "embedding", tmp())
    val got = pairSet(h.nearDupsOfDelta(delta))
    // the full-corpus build with the SAME seeded family, restricted to
    // pairs with at least one delta endpoint
    val full = pairSet(Ann.lshNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.35, nBits = 8, tables = 8, dim = 64, maxBucketSize = 10000)
      .filter(col("vec_a") % 4 === 0 || col("vec_b") % 4 === 0))
    assert(got == full, s"missing=${(full -- got).take(5)} extra=${(got -- full).take(5)}")
    assert(got.nonEmpty)
  }

  test("append is replay-safe: re-appending the same delta changes nothing") {
    val corpus = emb.filter(col("vec_id") % 4 =!= 0)
    val delta = emb.filter(col("vec_id") % 4 === 0)
    val h = SrpStore.build(corpus, "vec_id", "embedding", tmp())
    h.append(delta)
    val vecs = h.vectors.count()
    val posts = h.postings.count()
    assert(vecs == emb.count())
    h.append(delta) // redelivered micro-batch
    assert(h.vectors.count() == vecs, "replay must not duplicate vectors")
    assert(h.postings.count() == posts, "replay must not duplicate postings")
    // a delta already absorbed produces no NEW corpus-vs-delta report
    // beyond what the first pass reported (same pairs re-derived)
    val again = pairSet(h.nearDupsOfDelta(delta.limit(0)))
    assert(again.isEmpty)
  }

  test("open/ensure round trip preserves the family config; compact keeps the pair set") {
    val corpus = emb.filter(col("vec_id") % 4 =!= 0)
    val delta = emb.filter(col("vec_id") % 4 === 0)
    val path = tmp()
    var calls = 0
    def gen: DataFrame = { calls += 1; corpus }
    val cfg = SrpStore.Config(nBits = 8, tables = 8, dim = 64,
      seed = 42L, maxBucketSize = 10000, threshold = 0.35)
    SrpStore.ensure(gen, "vec_id", "embedding", spark, path, cfg)
    assert(calls == 1)
    val reopened = SrpStore.ensure(gen, "vec_id", "embedding", spark, path, cfg)
    assert(calls == 1, "existing store must not re-run the corpus plan")
    assert(reopened.cfg == cfg)
    val before = pairSet(reopened.nearDupsOfDelta(delta))
    reopened.append(delta)
    val compacted = SrpStore.compact(reopened, targetFiles = 2)
    // after compaction the absorbed corpus serves a NEW delta the same
    // way a freshly-built store over the union would
    val next = emb.limit(0)
    assert(pairSet(compacted.nearDupsOfDelta(next)).isEmpty)
    assert(compacted.vectors.count() == emb.count())
    assert(before.nonEmpty)
  }
}
